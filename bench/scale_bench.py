"""Parameterized scale benchmark: BASELINE.md "to measure" configs.

Examples (run EXCLUSIVELY on the TPU):
  python bench/scale_bench.py --chrs 1 --mb 100 --perms 10000   # ~100k sites
  python bench/scale_bench.py --chrs 22 --mb 45 --perms 2000    # ~1M sites

Reports scan wall, permutation wall, point-rounds/s, and the steady
chunk rate (excluding setup).
"""

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chrs", type=int, default=1)
    ap.add_argument("--mb", type=float, default=100.0, help="Mb per chromosome")
    ap.add_argument("--density", type=float, default=1.0, help="SNPs per kb")
    ap.add_argument("--perms", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--sweeps", type=int, default=2, help="sweeps per chromosome")
    args = ap.parse_args()

    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)
    chrs, poss, freqs, ns = [], [], [], []
    for c in range(args.chrs):
        sim = simulate_dataset(
            seed=1000 + c, sample_size=50, snp_density=args.density,
            mb_length=args.mb, alpha=3e-5, n_sweeps=args.sweeps,
        )
        chrs.append(np.full(len(sim["pos"]), c))
        poss.append(sim["pos"])
        freqs.append(sim["freq"])
        ns.append(np.full(len(sim["pos"]), sim["n"]))
    data = build_snp_data(
        np.concatenate(chrs).astype(str),
        np.concatenate(poss),
        np.concatenate(freqs),
        np.concatenate(ns),
        np.zeros(sum(len(p) for p in poss), bool),
    )
    print(f"{data.n_snps} sites over {data.n_chromosomes} chromosomes")

    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)

    t0 = time.perf_counter()
    result = scan_genome(data, tables, cfg)
    t1 = time.perf_counter()
    result = scan_genome(data, tables, cfg)
    t2 = time.perf_counter()
    print(f"scan: {t1 - t0:.1f}s (warm {t2 - t1:.1f}s), "
          f"{result.n_points} points, max CLR {result.clr.max():.1f}")

    pc = PermuteConfig(
        n_permute=args.perms, chunk_replicates=args.chunk, seed=9
    )
    t0 = time.perf_counter()
    scan_permute(data, tables, result, cfg, pc)
    t1 = time.perf_counter()
    pr = int(result.permute_n.sum())
    finished = int(result.permute_finished.sum())
    print(
        f"perm: {t1 - t0:.1f}s, {pr} point-rounds "
        f"-> {pr / (t1 - t0):.0f} point-rounds/s wall; "
        f"{finished}/{result.n_points} points pruned; "
        f"max permute_n {int(result.permute_n.max())}"
    )
    # empirical p-values of the strongest points
    top = np.argsort(result.clr)[-4:][::-1]
    for i in top:
        p = max(result.permute_p[i] - 1, 1) / max(result.permute_n[i] - 1, 1)
        print(f"  point chr{result.chr_id[i]}:{result.sweep_pos[i]} "
              f"CLR {result.clr[i]:.1f} p<={p:.2e} "
              f"({result.permute_p[i]}/{result.permute_n[i]})")


if __name__ == "__main__":
    main()

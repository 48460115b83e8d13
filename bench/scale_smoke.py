"""Scale smoke test: 100k sites over 4 chromosomes, 100 permutations.

Validates shapes/memory/throughput of the histogram engine at 5x the bench
size and exercises multi-chromosome bucketing.  Run exclusively on the TPU.
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)
import numpy as np


def main():
    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)
    rng = np.random.default_rng(5)
    chrs, poss, freqs, ns = [], [], [], []
    for c in range(4):
        sim = simulate_dataset(
            seed=100 + c, sample_size=50, snp_density=1.0, mb_length=25.0,
            alpha=3e-5, n_sweeps=2,
        )
        chrs.append(np.full(len(sim["pos"]), c))
        poss.append(sim["pos"])
        freqs.append(sim["freq"])
        ns.append(np.full(len(sim["pos"]), sim["n"]))
    chrname = np.concatenate(chrs).astype(str)
    pos = np.concatenate(poss)
    freq = np.concatenate(freqs)
    nn = np.concatenate(ns)
    data = build_snp_data(
        chrname, pos, freq, nn, np.zeros(len(pos), bool)
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
    print(f"scan: {t1 - t0:.1f}s, {result.n_points} points, "
          f"max CLR {result.clr.max():.1f}")

    pc = PermuteConfig(n_permute=100, chunk_replicates=32, seed=9)
    t0 = time.perf_counter()
    scan_permute(data, tables, result, cfg, pc)
    t1 = time.perf_counter()
    pr = int(result.permute_n.sum())
    print(f"perm: {t1 - t0:.1f}s, {pr} point-rounds "
          f"-> {pr / (t1 - t0):.0f} point-rounds/s")
    finished = int(result.permute_finished.sum())
    print(f"finished (pruned) points: {finished}/{result.n_points}")


if __name__ == "__main__":
    main()

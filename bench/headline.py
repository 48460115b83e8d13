#!/usr/bin/env python
"""Headline benchmark configs from BASELINE.json, ours vs the reference C.

Configs (see BASELINE.md "To measure"):
  ms_neutral  ms-simulated neutral data, 1 replicate, n=20, ~1k segsites,
              100 permutations (ms-input path)
  ms_sweep    ms-simulated sweep scenario, 10 replicates, n=50, folded
  asc100k     one ~100k-site chromosome with K=2/M=20 ascertainment,
              10k permutations
  genome1m    whole genome ~1M sites over 22 chromosomes, K>=2 rare-allele
              filter, 100k permutations with exceedance pruning

Usage:  python bench/headline.py <config> [--ref-only|--ours-only]
Results are merged into bench/headline_results.json.

Ours runs in-process with the per-process device-init tax absorbed by a
trivial dispatch first (see bench/repro_cache2.py); phase walls therefore
measure the engine plus any residual cold compiles (persistent cache makes
those ~0.1s).  The reference C binary runs via subprocess; for configs
where its full permutation count is infeasible single-core, it runs a
reduced count and the point-rounds/s RATE is reported (the rate is
size-stable; see bench/baseline_c.json).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile-cache config)
import numpy as np

DATA = REPO / "bench" / "data"
RESULTS = REPO / "bench" / "headline_results.json"
REF_BIN = REPO / "bench" / "fscl_ref"
REF_MS_BIN = REPO / "bench" / "fscl_ref_ms"  # + working ms input (bench/refstubs/msparse.c + msinput_fixed.c)


# ---------------------------------------------------------------- data gen

def make_haps(rng, freq, n):
    """[n, S] uint8 haplotype matrix with column sums == freq."""
    ranks = np.argsort(rng.random((n, len(freq))), axis=0)
    return (ranks < freq[None, :]).astype(np.uint8)


def write_ms_file(path, blocks, nsam):
    """blocks: list of (positions_frac [S] float, haps [n, S] uint8)."""
    with open(path, "w") as f:
        f.write(f"ms {nsam} {len(blocks)} -s {len(blocks[0][0])}\n")
        f.write("27182 8182 845\n")
        for pos, haps in blocks:
            f.write("\n//\n")
            f.write(f"segsites: {len(pos)}\n")
            f.write("positions: "
                    + " ".join(f"{p:1.8f}" for p in pos) + "\n")
            for row in haps:
                f.write("".join("1" if v else "0" for v in row) + "\n")


def neutral_freqs(rng, S, n):
    p = 1.0 / np.arange(1, n)
    return rng.choice(np.arange(1, n), size=S, p=p / p.sum())


def gen_ms_neutral():
    path = DATA / "headline_ms_neutral.ms"
    if path.exists():
        return path
    rng = np.random.default_rng(11)
    n, S = 20, 1000
    pos = np.sort(rng.random(S))
    haps = make_haps(rng, neutral_freqs(rng, S, n), n)
    write_ms_file(path, [(pos, haps)], n)
    return path


def gen_ms_sweep():
    path = DATA / "headline_ms_sweep.ms"
    seg_bp = 5_000_000
    if path.exists():
        return path, seg_bp
    from fscl_tpu.sim.sample import (
        place_sweeps, sample_snps, standard_neutral_spectrum,
    )

    rng = np.random.default_rng(12)
    n, blocks = 50, []
    fsp = standard_neutral_spectrum(n)
    for b in range(10):
        spos, salpha = place_sweeps(1, seg_bp, 3e-5)
        pos_bp, freq = sample_snps(
            rng, 2500, seg_bp, spos, salpha, fsp, n
        )
        blocks.append((pos_bp / seg_bp, make_haps(rng, freq, n)))
    write_ms_file(path, blocks, n)
    return path, seg_bp


def gen_asc100k():
    path = DATA / "headline_asc100k.sf"
    if path.exists():
        return path
    from fscl_tpu.models.ascbias import ascprob_subsample
    from fscl_tpu.sim import simulate_dataset, write_snp_file

    # oversample so ~100k sites survive the K=2-of-20 ascertainment rule
    sim = simulate_dataset(
        seed=13, sample_size=50, snp_density=1.65, mb_length=100.0,
        alpha=3e-5, n_sweeps=2,
    )
    rng = np.random.default_rng(14)
    p = np.asarray(ascprob_subsample(sim["freq"], 20, 2, sim["n"]))
    keep = rng.random(len(sim["freq"])) < p
    write_snp_file(path, sim["pos"][keep], sim["freq"][keep], sim["n"])
    print(f"asc100k: {int(keep.sum())} sites ascertained "
          f"of {len(keep)} simulated", file=sys.stderr)
    return path


def gen_genome1m():
    path = DATA / "headline_genome1m.sf"
    if path.exists():
        return path
    from fscl_tpu.sim import simulate_dataset

    rows = []
    for c in range(22):
        sim = simulate_dataset(
            seed=200 + c, sample_size=50, snp_density=1.0, mb_length=45.5,
            alpha=3e-5, n_sweeps=1,
        )
        keep = sim["freq"] >= 2  # rare-allele filter K>=2
        rows.append((c + 1, sim["pos"][keep], sim["freq"][keep], sim["n"]))
    total = sum(len(r[1]) for r in rows)
    with open(path, "w") as f:
        for c, pos, freq, n in rows:
            for p_, q in zip(pos, freq):
                f.write(f"{c}\t{p_}\t{q}\t{n}\t0\n")
    print(f"genome1m: {total} sites over 22 chromosomes", file=sys.stderr)
    return path


# ---------------------------------------------------------------- runners

def absorb_device_tax():
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    print(f"device-init tax absorbed: {time.monotonic()-t0:.1f}s "
          f"({jax.devices()[0]})", file=sys.stderr)


def run_ours_cli(argv):
    """Run our CLI in-process; returns wall seconds."""
    from fscl_tpu import cli

    t0 = time.monotonic()
    cli.main(argv)
    return time.monotonic() - t0


def run_ref(argv, timeout=14400, binary=None):
    t0 = time.monotonic()
    subprocess.run([str(binary or REF_BIN)] + argv, check=True,
                   capture_output=True, timeout=timeout)
    return time.monotonic() - t0


def point_rounds_from_tsv(path, col=5):
    """Sum permute_n over output rows (schema scan-chromosome.c:731-734)."""
    tot = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) > col:
                tot += int(parts[col])
    return tot


def merge_results(name, entry):
    cur = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    cur.setdefault(name, {}).update(entry)
    RESULTS.write_text(json.dumps(cur, indent=2) + "\n")
    print(json.dumps({name: entry}, indent=2))


# ---------------------------------------------------------------- configs

def cfg_ms_neutral(args):
    path = gen_ms_neutral()
    out = {}
    if not args.ref_only:
        absorb_device_tax()
        ours_out = DATA / "headline_ms_neutral.ours.tsv"
        argv = ["-m", str(path), "--ms-segment-length", "1000000",
                "--compat-mirror-unfolded",  # reference bug #1 parity
                "-p", "100", "-o", str(ours_out), "-v", "2"]
        w1 = run_ours_cli(argv)
        w2 = run_ours_cli(argv)  # warm: all shapes compiled
        out.update(ours_wall_s=round(w2, 2), ours_wall_cold_s=round(w1, 2),
                   ours_point_rounds=point_rounds_from_tsv(ours_out))
    if not args.ours_only:
        ref_out = DATA / "headline_ms_neutral.ref.tsv"
        w = run_ref(["-m", str(path), "--ms-segment-length=1000000",
                     "-p", "100", "-o", str(ref_out), "-v", "0"],
                    binary=REF_MS_BIN)
        out.update(ref_wall_s=round(w, 2),
                   ref_point_rounds=point_rounds_from_tsv(ref_out))
    merge_results("ms_neutral", out)


def cfg_ms_sweep(args):
    path, seg_bp = gen_ms_sweep()
    out = {}
    if not args.ref_only:
        absorb_device_tax()
        ours_out = DATA / "headline_ms_sweep.ours.tsv"
        argv = ["-m", str(path), "--ms-segment-length", str(seg_bp),
                "--ms-folded", "-p", "100", "-o", str(ours_out), "-v", "2"]
        w1 = run_ours_cli(argv)
        w2 = run_ours_cli(argv)
        out.update(ours_wall_s=round(w2, 2), ours_wall_cold_s=round(w1, 2),
                   ours_point_rounds=point_rounds_from_tsv(ours_out))
    if not args.ours_only:
        ref_out = DATA / "headline_ms_sweep.ref.tsv"
        w = run_ref(["-m", str(path), f"--ms-segment-length={seg_bp}",
                     "--ms-folded", "-p", "100", "-o", str(ref_out),
                     "-v", "0"], binary=REF_MS_BIN)
        out.update(ref_wall_s=round(w, 2),
                   ref_point_rounds=point_rounds_from_tsv(ref_out))
    merge_results("ms_sweep", out)


def _run_ours_phased(path, n_permute, asc_depth=0, asc_min=1,
                     chunk_replicates=32, null_dist_save=10000):
    """Library-level run with phase walls (scan vs permutation)."""
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)
    absorb_device_tax()
    t0 = time.monotonic()
    data = load_snp_input(path)
    t_load = time.monotonic() - t0

    t0 = time.monotonic()
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
    )
    tables = build_tables(
        fsp, data.sample_depths, grid_points=2048,
        asc_depth=asc_depth, asc_min_freq=asc_min,
    )
    data.attach_model(tables)
    t_model = time.monotonic() - t0

    scan_cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    t0 = time.monotonic()
    result = scan_genome(data, tables, scan_cfg)
    t_scan_cold = time.monotonic() - t0
    t0 = time.monotonic()
    result = scan_genome(data, tables, scan_cfg)
    t_scan = time.monotonic() - t0

    pc = PermuteConfig(n_permute=n_permute, chunk_replicates=chunk_replicates,
                       seed=1, null_dist_save=null_dist_save)
    t0 = time.monotonic()
    scan_permute(data, tables, result, scan_cfg, pc)
    t_perm = time.monotonic() - t0
    pr = int(result.permute_n.sum())
    return dict(
        n_sites=int(data.n_snps),
        n_points=int(result.n_points),
        ours_load_s=round(t_load, 2),
        ours_model_s=round(t_model, 2),
        ours_scan_s=round(t_scan, 2),
        ours_scan_cold_s=round(t_scan_cold, 2),
        ours_perm_s=round(t_perm, 2),
        ours_point_rounds=pr,
        ours_point_rounds_per_s=round(pr / max(t_perm, 1e-9), 1),
        ours_max_clr=round(float(result.clr.max()), 2),
        ours_finished_points=int(result.permute_finished.sum()),
    )


def cfg_asc100k(args):
    path = gen_asc100k()
    out = {}
    if not args.ref_only:
        out.update(_run_ours_phased(path, 10_000, asc_depth=20, asc_min=2))
    if not args.ours_only:
        ref_out = DATA / "headline_asc100k.ref.tsv"
        n_ref = int(args.ref_permute or 100)
        w_scan = run_ref(["-f", str(path), "-o", str(ref_out),
                          "-d", "20", "--asc-minimum-freq=2", "-v", "0"])
        w = run_ref(["-f", str(path), "-o", str(ref_out),
                     "-d", "20", "--asc-minimum-freq=2",
                     "-p", str(n_ref), "-v", "0"])
        pr = point_rounds_from_tsv(ref_out)
        out.update(
            ref_scan_s=round(w_scan, 2), ref_n_permute=n_ref,
            ref_perm_s=round(w - w_scan, 2), ref_point_rounds=pr,
            ref_point_rounds_per_s=round(pr / max(w - w_scan, 1e-9), 2),
        )
    merge_results("asc100k", out)


def cfg_genome1m(args):
    path = gen_genome1m()
    out = {}
    if not args.ref_only:
        out.update(_run_ours_phased(path, 100_000))
    if not args.ours_only:
        ref_out = DATA / "headline_genome1m.ref.tsv"
        n_ref = int(args.ref_permute or 20)
        w_scan = run_ref(["-f", str(path), "-o", str(ref_out), "-v", "0"])
        w = run_ref(["-f", str(path), "-o", str(ref_out),
                     "-p", str(n_ref), "-v", "0"])
        pr = point_rounds_from_tsv(ref_out)
        out.update(
            ref_scan_s=round(w_scan, 2), ref_n_permute=n_ref,
            ref_perm_s=round(w - w_scan, 2), ref_point_rounds=pr,
            ref_point_rounds_per_s=round(pr / max(w - w_scan, 1e-9), 2),
        )
    merge_results("genome1m", out)


CONFIGS = dict(ms_neutral=cfg_ms_neutral, ms_sweep=cfg_ms_sweep,
               asc100k=cfg_asc100k, genome1m=cfg_genome1m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--ref-permute", type=int, default=0,
                    help="permutation count for the reference side "
                    "(rate extrapolates; default per config)")
    args = ap.parse_args()
    CONFIGS[args.config](args)


if __name__ == "__main__":
    main()

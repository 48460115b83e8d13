#!/usr/bin/env python
"""Benchmark harness: permutation-scan throughput vs the reference C binary.

Task (identical for both sides): a 20 Mb chromosome with 20k sites at depth
n=50 containing two planted sweeps, scanned at -g 1000 -G 100000 with 50
block-permutation rounds and the reference's >=20-exceedance pruning rule.

Metric: null-CLR **point-rounds per second** in the permutation phase — one
point-round is one full (position x alpha) max-CLR search over one coarse
interval against one permuted genome, i.e. the unit of work both engines
schedule.  Sum(permute_n) over scan points divided by permutation wall time.
This is robust to pruning-RNG differences between the two implementations
(both sides count the rounds they actually performed).

vs_baseline = ours / reference-C-single-core, measured on this machine by
bench/measure_reference.py and frozen in bench/baseline_c.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))


def _enable_compile_cache():
    """Persistent compilation cache: compiles through the axon TPU tunnel
    take minutes; with the cache they are ~0.1s on later runs.  The env var
    JAX_COMPILATION_CACHE_DIR alone is not honored in this environment —
    jax.config.update is required."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           str(REPO / ".jax_cache")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


_enable_compile_cache()

BENCH_SEED = 42
SAMPLE_N = 50
MB_LENGTH = 20.0
SNP_PER_KB = 1.0
ALPHA = 3e-5
N_SWEEPS = 2
N_PERMUTE = 50
FINE = 1000
COARSE = 100000
DATA = REPO / "bench" / "data" / "bench_20k.sf"


def ensure_data():
    DATA.parent.mkdir(parents=True, exist_ok=True)
    if DATA.exists():
        return
    from fscl_tpu.sim import simulate_dataset, write_snp_file

    sim = simulate_dataset(
        seed=BENCH_SEED,
        sample_size=SAMPLE_N,
        snp_density=SNP_PER_KB,
        mb_length=MB_LENGTH,
        alpha=ALPHA,
        n_sweeps=N_SWEEPS,
    )
    write_snp_file(DATA, sim["pos"], sim["freq"], sim["n"], folded=False)


def run_ours():
    import copy

    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)  # phase timings on stderr

    data = load_snp_input(DATA)
    # compat mode so both engines compute the same model on unfolded data
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=True,
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    scan_cfg = ScanConfig(small_grid_sp=FINE, large_grid_sp=COARSE)
    # production pipeline order: fused scan-stage programs (including the
    # dec-2 tie tables) compile in the background while the first pass
    # runs, so a cold cache pays concurrent compiles instead of serial
    # foreground ones (BENCH_r03's first pass had a 20.1 s cold tie stage)
    from fscl_tpu.engine import prewarm_scan

    prewarm_scan(data, tables, scan_cfg)

    # warmup pass: pays one-time jit compiles (minutes through the remote
    # TPU tunnel, highly load-variable) so the timed pass measures the
    # engine, not the tunnel's compile service.  The C baseline is likewise
    # timed without its gcc compile.
    t0 = time.monotonic()
    scan_genome(data, tables, scan_cfg)
    t_scan_cold = time.monotonic() - t0

    t0 = time.monotonic()
    result = scan_genome(data, tables, scan_cfg)
    t_scan = time.monotonic() - t0

    # chunk size is re-A/B'd each engine generation (32 vs one 50-chunk):
    # smaller chunks let the mid-run pruning pass shrink later dispatches,
    # one chunk amortizes the fixed per-chunk host overhead once
    chunk = int(os.environ.get("FSCL_BENCH_CHUNK", "32"))
    perm_cfg = PermuteConfig(n_permute=N_PERMUTE, chunk_replicates=chunk,
                             seed=1)
    # warmup = the FULL timed configuration: pruning-compacted chunks run
    # on smaller shapes than the first chunk, and a partial warmup would
    # leave those shapes to compile inside the timed pass
    warm = copy.deepcopy(result)
    t0 = time.monotonic()
    scan_permute(data, tables, warm, scan_cfg, copy.deepcopy(perm_cfg))
    t_perm_cold = time.monotonic() - t0

    t0 = time.monotonic()
    scan_permute(data, tables, result, scan_cfg, perm_cfg)
    t_perm = time.monotonic() - t0

    point_rounds = int(result.permute_n.sum())
    return dict(
        t_scan=t_scan,
        t_scan_cold=t_scan_cold,
        t_perm=t_perm,
        t_perm_cold=t_perm_cold,
        point_rounds=point_rounds,
        point_rounds_per_sec=point_rounds / t_perm,
        n_points=result.n_points,
        max_clr=float(result.clr.max()),
        chunk_replicates=chunk,
    )


def pallas_selfcheck():
    """On-hardware agreement check: Pallas prefix-sum kernel vs exact XLA.

    CI exercises the kernel only in interpret mode (tests/test_pallas_ps.py),
    so a Mosaic regression on real hardware would otherwise surface as a
    silently wrong benchmark.  Runs both kernel input modes (row-id compare
    and prebuilt int8 one-hot) against an exact int64 cumsum before any
    timing; a mismatch aborts the bench loudly.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fscl_tpu.ops.pallas_ps import onehot_prefix_sums, ps_supported

    if jax.default_backend() == "cpu":
        print("# pallas selfcheck skipped (cpu backend)", file=sys.stderr)
        return
    rng = np.random.default_rng(0)
    W, P, R = 1024, 2, 128
    L = P * R
    assert ps_supported(W, L)
    # row ids including out-of-range (>= R) padding sentinels
    rows = rng.integers(0, R + 2, size=(W, P), dtype=np.int32)
    rows_exp = jnp.asarray(np.repeat(rows, R, axis=1))
    got = np.asarray(
        onehot_prefix_sums(rows_exp, n_rows=R, out_dtype=jnp.int16)
    ).astype(np.int64)
    oh = (rows[:, :, None] == np.arange(R)).reshape(W, L)
    want = np.cumsum(oh.astype(np.int64), axis=0)
    np.testing.assert_array_equal(got, want)
    got2 = np.asarray(
        onehot_prefix_sums(jnp.asarray(oh.astype(np.int8)),
                           out_dtype=jnp.int32)
    )
    np.testing.assert_array_equal(got2, want)
    print("# pallas selfcheck ok", file=sys.stderr)


def main():
    ensure_data()
    pallas_selfcheck()
    ours = run_ours()

    baseline_file = REPO / "bench" / "baseline_c.json"
    vs = None
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        if base.get("point_rounds_per_sec"):
            vs = ours["point_rounds_per_sec"] / base["point_rounds_per_sec"]

    print(
        json.dumps(
            dict(
                metric=(
                    "null-CLR point-rounds/sec (20k-site chr, 1kb grid, "
                    "50 perms"
                    + (
                        f", NON-CANONICAL chunk={ours['chunk_replicates']}"
                        if ours["chunk_replicates"] != 32 else ""
                    )
                    + ")"
                ),
                value=round(ours["point_rounds_per_sec"], 3),
                unit="point-rounds/s",
                vs_baseline=round(vs, 3) if vs is not None else None,
            )
        )
    )
    print(
        f"# detail: scan {ours['t_scan']:.1f}s (cold {ours['t_scan_cold']:.1f}s), "
        f"perm {ours['t_perm']:.1f}s (warmup {ours['t_perm_cold']:.1f}s), "
        f"{ours['point_rounds']} point-rounds over {ours['n_points']} points, "
        f"max CLR {ours['max_clr']:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

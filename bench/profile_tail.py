"""Cost decomposition of a genome-scale pruning-tail permutation chunk.

Reproduces the tail state of the genome1m run (the single highest-CLR point
per chromosome survives, everything else finished) and runs the production
stacked driver (engine/permute.py _scan_permute_hist) with stage timing: the
driver's own MSG_DEBUG chunk logs plus instrumented sigma generation,
_stack_stat dispatches, and geometry rebuilds.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_tail.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


ACC: dict = {}


def _timed(name, fn, sync=None):
    def wrap(*a, **k):
        t0 = time.monotonic()
        r = fn(*a, **k)
        if sync is not None:
            sync(r)
        ACC[name] = ACC.get(name, 0.0) + (time.monotonic() - t0)
        ACC[name + "#"] = ACC.get(name + "#", 0) + 1
        return r

    return wrap


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    import fscl_tpu.engine.permute as P
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

    configure_logmsg(MSG_DEBUG1)
    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result = scan_genome(data, tables, cfg)

    # tail state: the single highest-CLR point per chromosome survives
    keep = np.array([
        np.where(result.chr_id == c)[0][
            np.argmax(result.clr[result.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    result.permute_finished[:] = True
    result.permute_finished[keep] = False
    print(f"tail: {len(keep)} immortal points")

    P.block_permutation_groups = _timed(
        "sigma_gen", P.block_permutation_groups,
        sync=lambda r: np.asarray(r[:1, :1]),
    )
    P._stack_stat = _timed(
        "stack_stat", P._stack_stat, sync=lambda r: np.asarray(r[:1, :1])
    )
    P._stack_stat_g = _timed(
        "stack_stat_g", P._stack_stat_g, sync=lambda r: np.asarray(r[:1, :1])
    )
    P._apply_round_updates = _timed("host_updates", P._apply_round_updates)
    # setup decomposition: geometry rebuilds (with device sync), the
    # per-chromosome geometry-build dispatches inside them, warm-pool
    # waits, and the hist-table pack
    P._StackGroup.rebuild = _timed(
        "st_rebuild", P._StackGroup.rebuild,
    )
    P.build_hist_points = _timed(
        "build_hist_pts", P.build_hist_points,
        sync=lambda r: np.asarray(r.bounds[:1, :1, :1]),
    )
    from fscl_tpu.utils.precompile import Precompiler

    Precompiler.wait = _timed("warm_wait", Precompiler.wait)
    from fscl_tpu.engine import scan as S

    S.make_scan_hist_tables = _timed(
        "hist_tables", S.make_scan_hist_tables
    )
    P.make_scan_hist_tables = S.make_scan_hist_tables

    n_perm = 4096
    pc = PermuteConfig(n_permute=n_perm, chunk_replicates=32, seed=1)
    t0 = time.monotonic()
    P.scan_permute(data, tables, result, cfg, pc)
    wall = time.monotonic() - t0
    pr = int(result.permute_n[keep].sum())
    print(f"tail run: {wall:.1f}s, {pr} point-rounds -> {pr/wall:.0f} pr/s")
    for k in sorted(ACC):
        if not k.endswith("#"):
            print(f"  {k:14s} {ACC[k]:6.2f}s  x{ACC[k+'#']}")
    print(f"  dispatch stats: {P.last_stats}")


if __name__ == "__main__":
    main()

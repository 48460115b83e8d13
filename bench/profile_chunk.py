"""Stage-accounted timing of the production hist permutation path.

Monkeypatches the chunk-loop stages (sigma generation, kernel dispatch,
bucket rebuilds, host updates) with sync-timing wrappers, then runs the
exact bench permutation configuration twice (cold, warm) and prints the
warm per-stage totals.  Forcing a sync after every stage breaks pipelining,
so the stage total exceeds the un-instrumented wall time — use it for
relative attribution, not absolute throughput.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_chunk.py
"""

import copy
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache + data)

import numpy as np

import fscl_tpu.engine.permute as P

ACC = {}


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
    _b.ensure_data()
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    data = load_snp_input(str(_b.DATA))
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=True,
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    scan_cfg = ScanConfig(small_grid_sp=_b.FINE, large_grid_sp=_b.COARSE)
    result = scan_genome(data, tables, scan_cfg)

    # --- instrument ---
    P.block_permutation_groups = _timed(
        "sigma_gen", P.block_permutation_groups,
        sync=lambda r: np.asarray(r[:1, :1]),
    )
    P._stack_stat = _timed(
        "dispatch", P._stack_stat, sync=lambda r: np.asarray(r[:1, :1])
    )
    P._apply_round_updates = _timed("host_updates", P._apply_round_updates)
    _orig_rebuild = P._StackGroup.rebuild

    def timed_rebuild(self, *a, **k):
        t0 = time.monotonic()
        _orig_rebuild(self, *a, **k)
        np.asarray(self.bounds[:1])
        ACC["geom_rebuild"] = ACC.get("geom_rebuild", 0.0) + (
            time.monotonic() - t0
        )
        ACC["geom_rebuild#"] = ACC.get("geom_rebuild#", 0) + 1

    P._StackGroup.rebuild = timed_rebuild
    import fscl_tpu.engine.scan as S
    S.make_scan_hist_tables = _timed("hist_tables", S.make_scan_hist_tables)

    perm_cfg = PermuteConfig(n_permute=_b.N_PERMUTE, chunk_replicates=32, seed=1)
    warm = copy.deepcopy(result)
    t0 = time.monotonic()
    scan_permute(data, tables, warm, scan_cfg,
                 PermuteConfig(n_permute=32, chunk_replicates=32, seed=1))
    print(f"cold perm: {time.monotonic()-t0:.1f}s  stages: "
          + " ".join(f"{k}={v:.2f}s(x{ACC[k+'#']})"
                     for k, v in sorted(ACC.items()) if not k.endswith("#")))
    ACC.clear()

    res2 = copy.deepcopy(result)
    t0 = time.monotonic()
    scan_permute(data, tables, res2, scan_cfg, perm_cfg)
    wall = time.monotonic() - t0
    pr = int(res2.permute_n.sum())
    print(f"warm perm: {wall:.2f}s, {pr} point-rounds -> {pr/wall:.0f}/s")
    staged = sum(v for k, v in ACC.items() if not k.endswith("#"))
    for k in sorted(ACC):
        if not k.endswith("#"):
            print(f"  {k:14s} {ACC[k]:6.2f}s  x{ACC[k+'#']}")
    print(f"  {'(unattributed)':14s} {wall-staged:6.2f}s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measured throughput of the lattice fallback permutation path.

The hist engine's applicability gate (ops/histclr.py hist_supported /
dataset_qbits) drops 4M+-site chromosomes and pathological densities onto
the exact lattice path.  VERDICT r4 weak #7: that fallback's cost was a
guess.  This measures it: the 20k bench dataset run with use_hist=False
(the identical dataset/geometry as bench.py, so the slowdown factor reads
directly against the canonical hist number), recorded in
headline_results.json under "lattice_fallback".

Run EXCLUSIVELY on the axon tunnel:  python bench/measure_fallback.py
"""

import copy
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (data + compile-cache config)

RESULTS = REPO / "bench" / "headline_results.json"


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()  # absorb device-init tax

    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.engine import permute as pm
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    _b.ensure_data()
    data = load_snp_input(_b.DATA)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(
        small_grid_sp=_b.FINE, large_grid_sp=_b.COARSE,
        use_hist=False,
    )
    result = scan_genome(data, tables, cfg)
    pc = PermuteConfig(n_permute=_b.N_PERMUTE, chunk_replicates=32, seed=1,
                       use_hist=False)

    warm = copy.deepcopy(result)
    t0 = time.monotonic()
    scan_permute(data, tables, warm, cfg, copy.deepcopy(pc))
    t_cold = time.monotonic() - t0
    assert pm.last_stats["lattice_dispatches"] \
        + pm.last_stats["lattice_sharded_dispatches"] > 0
    assert pm.last_stats["hist_unsharded_dispatches"] == 0

    t0 = time.monotonic()
    scan_permute(data, tables, result, cfg, pc)
    t_warm = time.monotonic() - t0
    pr = int(result.permute_n.sum())

    res = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    rec = {
        "config": "20k bench dataset, use_hist=False (lattice path)",
        "pr_per_s_warm": round(pr / t_warm, 1),
        "point_rounds": pr,
        "wall_warm_s": round(t_warm, 2),
        "wall_cold_s": round(t_cold, 2),
    }
    res["lattice_fallback"] = rec
    RESULTS.write_text(json.dumps(res, indent=1, sort_keys=True))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()

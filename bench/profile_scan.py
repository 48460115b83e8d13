"""Stage-level timing of the warm scan phase at bench shapes.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_scan.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache + data)

import numpy as np


def main():
    _b.ensure_data()
    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.engine.scan import (
        _ChromosomeBlock, _HistScanContext, chromosome_candidates,
        make_scan_hist_tables, refine_positions,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.lattice import LatticeTables

    data = load_snp_input(str(_b.DATA))
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=True,
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=_b.FINE, large_grid_sp=_b.COARSE)

    scan_genome(data, tables, cfg)  # warmup
    t0 = time.perf_counter()
    scan_genome(data, tables, cfg)
    print(f"scan warm total: {time.perf_counter()-t0:.2f}s")

    lattice = LatticeTables(tables.table, tables.grid_points)
    G = tables.grid_points
    t0 = time.perf_counter()
    hist_ht = make_scan_hist_tables(
        data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    np.asarray(hist_ht.t3[:1, :1])
    print(f"  hist tables: {time.perf_counter()-t0:.2f}s")

    cl = data.chr_limits[0]
    t0 = time.perf_counter()
    blk = _ChromosomeBlock(data, cl, lattice)
    hctx = _HistScanContext(hist_ht, data, cl, cfg)
    print(f"  contexts: {time.perf_counter()-t0:.2f}s")

    cand, valid, istart, iend = chromosome_candidates(cl, cfg)
    n_int, J = cand.shape
    print(f"  dense grid: {n_int} x {J}")

    t0 = time.perf_counter()
    clr, la = hctx.eval_max(cand.reshape(-1))
    t1 = time.perf_counter()
    print(f"  dense hist eval ({n_int*J} cand): {t1-t0:.2f}s")

    jbest = np.argmax(np.where(valid, clr.reshape(n_int, J), -np.inf), axis=1)
    best_pos = cand[np.arange(n_int), jbest]

    cand2 = refine_positions(best_pos, istart, iend, 128)
    t0 = time.perf_counter()
    clr2, la2 = hctx.eval_max(cand2.reshape(-1))
    t1 = time.perf_counter()
    print(f"  refine hist eval ({cand2.size} cand): {t1-t0:.2f}s")

    t0 = time.perf_counter()
    bc, bl, *_ = blk.eval_candidates(best_pos, cfg, G)
    t1 = time.perf_counter()
    print(f"  exact lattice re-eval ({len(best_pos)} cand): {t1-t0:.2f}s")


if __name__ == "__main__":
    main()

"""Stage-level scan profiling on the asc100k headline dataset (92k-site,
single chromosome) — chasing the superlinear scan wall (9.9s warm vs
~0.25s for a 25k-site chromosome).

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_scan_asc.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np


def sync(x):
    return np.asarray(x).reshape(-1)[:1]


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()  # absorb the per-process device-init tax

    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.engine.scan import (
        _ChromosomeBlock, _HistScanContext, chromosome_candidates,
        make_scan_hist_tables, refine_positions,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.histclr import build_hist_points, hist_clr
    from fscl_tpu.ops.lattice import LatticeTables

    data = load_snp_input(REPO / "bench" / "data" / "headline_asc100k.sf")
    print(f"{data.n_snps} sites, {data.n_chromosomes} chromosome(s)")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048,
                          asc_depth=20, asc_min_freq=2)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    lattice = LatticeTables(tables.table, tables.grid_points)
    G = tables.grid_points

    for it in range(2):
        t0 = time.perf_counter()
        scan_genome(data, tables, cfg, lattice=lattice)
        print(f"scan total [{it}]: {time.perf_counter()-t0:.2f}s")

    hist_ht = make_scan_hist_tables(
        data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    print(f"NC={hist_ht.n_cells} R={hist_ht.n_rows} A={hist_ht.n_alpha}")
    cl = data.chr_limits[0]
    t0 = time.perf_counter()
    blk = _ChromosomeBlock(data, cl, lattice)
    hctx = _HistScanContext(hist_ht, data, cl, cfg)
    sync(hctx.dev[1])
    print(f"contexts: {time.perf_counter()-t0:.2f}s  w_pad={blk.w_pad}")

    cand, valid, istart, iend = chromosome_candidates(cl, cfg)
    n_int, J = cand.shape
    print(f"dense grid: {n_int} x {J} = {n_int*J}")
    flat = cand.reshape(-1)

    for it in range(2):
        t0 = time.perf_counter()
        hp = build_hist_points(
            hist_ht, hctx.pos_np, flat, cfg.eval_range,
            cand_pad=1024, device_arrays=hctx.dev,
        )
        sync(hp.bounds)
        t1 = time.perf_counter()
        clr = hist_clr(
            hist_ht.t3, hp.bounds, hp.fbar, hctx.row_c,
            n_cells=hist_ht.n_cells, n_rows=hist_ht.n_rows,
            n_alpha=hist_ht.n_alpha, c_sub=64,
        )
        sync(clr)
        t2 = time.perf_counter()
        print(f"[{it}] build_hist_points: {t1-t0:.2f}s  hist_clr: {t2-t1:.2f}s")

    t0 = time.perf_counter()
    c2, l2 = hctx.eval_max(flat)
    print(f"dense eval_max: {time.perf_counter()-t0:.2f}s")

    jbest = np.argmax(np.where(valid, c2.reshape(n_int, J), -np.inf), axis=1)
    best_pos = cand[np.arange(n_int), jbest]
    cand2 = refine_positions(best_pos, istart, iend, 128)
    t0 = time.perf_counter()
    hctx.eval_max(cand2.reshape(-1))
    print(f"refine eval ({cand2.size}): {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    blk.eval_candidates(best_pos, cfg, G)
    print(f"exact lattice re-eval ({len(best_pos)}): "
          f"{time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()

"""Per-chromosome scan timing on the 4-chromosome scale dataset.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_scan_multichr.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np


def main():
    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import ScanConfig
    from fscl_tpu.engine.scan import (
        _ChromosomeBlock, _HistScanContext, chromosome_candidates,
        make_scan_hist_tables, refine_positions,
    )
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.lattice import LatticeTables
    from fscl_tpu.sim import simulate_dataset

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
    data = build_snp_data(
        np.concatenate(chrs).astype(str), np.concatenate(poss),
        np.concatenate(freqs), np.concatenate(ns),
        np.zeros(sum(len(p) for p in poss), bool),
    )
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    lattice = LatticeTables(tables.table, tables.grid_points)
    G = tables.grid_points

    t0 = time.perf_counter()
    hist_ht = make_scan_hist_tables(
        data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    print(f"hist tables: {time.perf_counter()-t0:.2f}s "
          f"NC={hist_ht.n_cells} R={hist_ht.n_rows}")

    for rep in range(2):
        for c, cl in enumerate(data.chr_limits):
            t0 = time.perf_counter()
            blk = _ChromosomeBlock(data, cl, lattice)
            hctx = _HistScanContext(hist_ht, data, cl, cfg)
            t1 = time.perf_counter()
            cand, valid, istart, iend = chromosome_candidates(cl, cfg)
            n_int, J = cand.shape
            clr, la = hctx.eval_max(cand.reshape(-1))
            t2 = time.perf_counter()
            clr = np.where(valid.reshape(-1), clr, -np.inf).reshape(n_int, J)
            jbest = np.argmax(clr, axis=1)
            r = np.arange(n_int)
            best_pos = cand[r, jbest]
            cand2 = refine_positions(best_pos, istart, iend, 128)
            clr2, la2 = hctx.eval_max(cand2.reshape(-1))
            t3 = time.perf_counter()
            blk.eval_candidates(best_pos, cfg, G)
            t4 = time.perf_counter()
            print(f"[rep{rep} chr{c}] n={cl.n_snps} ctx {t1-t0:.2f}s "
                  f"dense {t2-t1:.2f}s refine {t3-t2:.2f}s exact {t4-t3:.2f}s")


if __name__ == "__main__":
    main()

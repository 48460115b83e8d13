"""Per-chromosome scan stage timing on the genome1m headline dataset.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_scan_genome.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np


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
    from fscl_tpu.ops.lattice import LatticeTables

    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    lattice = LatticeTables(tables.table, tables.grid_points)
    G = tables.grid_points

    for it in range(2):
        t0 = time.perf_counter()
        scan_genome(data, tables, cfg, lattice=lattice)
        print(f"scan total [{it}]: {time.perf_counter()-t0:.2f}s", flush=True)

    hist_ht = make_scan_hist_tables(
        data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    r_tot = dict(blk=0.0, hctx=0.0, dense=0.0, refine=0.0, exact=0.0)
    for c, cl in enumerate(data.chr_limits[:8]):
        t0 = time.perf_counter()
        blk = _ChromosomeBlock(data, cl, lattice)
        t1 = time.perf_counter()
        hctx = _HistScanContext(hist_ht, data, cl, cfg)
        t2 = time.perf_counter()
        cand, valid, istart, iend = chromosome_candidates(cl, cfg)
        n_int, J = cand.shape
        clr, la = hctx.eval_max(cand.reshape(-1))
        t3 = time.perf_counter()
        clr = np.where(valid.reshape(-1), clr, -np.inf).reshape(n_int, J)
        jbest = np.argmax(clr, axis=1)
        rr = np.arange(n_int)
        best_pos = cand[rr, jbest]
        cand2 = refine_positions(best_pos, istart, iend, 128)
        clr2, la2 = hctx.eval_max(cand2.reshape(-1))
        t4 = time.perf_counter()
        blk.eval_candidates(best_pos, cfg, G)
        t5 = time.perf_counter()
        print(f"[chr{c}] n={cl.n_snps} blk {t1-t0:.2f} hctx {t2-t1:.2f} "
              f"dense {t3-t2:.2f} refine {t4-t3:.2f} exact {t5-t4:.2f}",
              flush=True)
        for k, v in zip(r_tot, (t1-t0, t2-t1, t3-t2, t4-t3, t5-t4)):
            r_tot[k] += v
    print("totals over 8 chrs:", {k: round(v, 2) for k, v in r_tot.items()})


if __name__ == "__main__":
    main()

"""Phase-level profiling of the permutation engines on the live device.

Run EXCLUSIVELY (no other process on the axon tunnel).  Times, in-process:
  - scan phase (warm, second call)
  - hist path: host boundary precompute, observed pass, per-dispatch
    steady-state throughput
  - legacy lattice path per-dispatch throughput for comparison
"""

import sys
import time
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (enables the compile cache)
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x)  # block_until_ready is a no-op through the tunnel


def main():
    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.engine.permute import (
        _ChrPermContext, _fine_cand, _hist_perm_batch,
        _permute_batch_chr, POINT_BUCKET, HIST_REP_SUB, REP_SUB,
    )
    from fscl_tpu.engine.scan import _pad_sites
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.histclr import build_hist_points, build_hist_tables
    from fscl_tpu.ops.lattice import LatticeTables
    from fscl_tpu.ops.permute import block_permutation_groups

    data = load_snp_input(str(REPO / "bench" / "data" / "bench_20k.sf"))
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)

    t0 = time.perf_counter()
    result = scan_genome(data, tables, cfg)
    t1 = time.perf_counter()
    result2 = scan_genome(data, tables, cfg)
    t2 = time.perf_counter()
    print(f"scan: first {t1-t0:.1f}s, second {t2-t1:.1f}s")

    cl = data.chr_limits[0]
    pts = np.arange(min(result.n_points, POINT_BUCKET))
    row = np.asarray(data.row)
    rows_used = np.unique(row)
    null_row = np.zeros(tables.table.shape[0])
    null_row[row] = np.asarray(data.null_logl)
    pos_np = np.asarray(data.pos)
    n = cl.n_snps
    w_pad = _pad_sites(n)

    t0 = time.perf_counter()
    ht = build_hist_tables(
        tables.table, tables.grid_points, null_row, rows_used,
        extent_bp=int(pos_np[-1] - pos_np[0]) + 1, n_alpha=128,
        decimate=4,
    )
    sync(ht.t3[0])
    t1 = time.perf_counter()
    Jf = 49
    hp = build_hist_points(
        ht, pos_np, _fine_cand(result, pts, Jf), cfg.eval_range, cand_pad=Jf,
    )
    sync(hp.bounds[0])
    t2 = time.perf_counter()
    print(f"hist tables {t1-t0:.1f}s  geometry precompute {t2-t1:.1f}s "
          f"(NC={ht.n_cells}, R={ht.n_rows}, C={hp.n_cand})")

    row_cg = jnp.asarray(ht.row_map[row].astype(np.int32))
    gpos = data.genome_pos()
    key = jax.random.key(3)
    sigma = block_permutation_groups(key, gpos, 1e6, HIST_REP_SUB)
    n_groups = -(-len(gpos) // 8)
    sigma = jnp.concatenate(
        [sigma, jnp.full((HIST_REP_SUB, w_pad // 8 + 2), n_groups,
                         sigma.dtype)], axis=1)

    def hist_call():
        return _hist_perm_batch(
            ht.t3, hp.bounds, hp.fbar, row_cg, sigma,
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=32, start=cl.start_index, n=n, w_pad=w_pad,
            n_pts=len(pts), Jf=Jf,
        )

    t0 = time.perf_counter()
    sync(hist_call())
    t1 = time.perf_counter()
    times = []
    for _ in range(3):
        ta = time.perf_counter()
        sync(hist_call())
        times.append(time.perf_counter() - ta)
    dt = min(times)
    prs = HIST_REP_SUB * len(pts) / dt
    print(f"hist dispatch: first {t1-t0:.1f}s, steady {dt:.3f}s "
          f"-> {prs:.0f} point-rounds/s")

    # legacy path for comparison
    lt = LatticeTables(tables.table, tables.grid_points)
    packs = (lt.pack_coarse, lt.pack_fine, lt.m_coarse_dev, lt.m_fine_dev)
    row_gen = jnp.asarray(row.astype(np.int32))
    null_gen = jnp.asarray(np.asarray(data.null_logl).astype(np.float32))
    ctx = _ChrPermContext(data, cl, cfg, result, pts, 49)
    cand, lo, hi, ist, ien, n_pts_pad, Jl = ctx.build_batch(
        result, pts, fixed_bucket=POINT_BUCKET
    )
    sig_l = sigma[:REP_SUB]

    def leg_call():
        return _permute_batch_chr(
            *packs, row_gen, null_gen, sig_l, ctx.pos_pad, cand, lo, hi,
            ist, ien, grid_points=tables.grid_points, chunk=ctx.chunk,
            start=ctx.start, n=ctx.n, w_pad=ctx.w_pad,
            eval_range=ctx.eval_range, n_pts=n_pts_pad, J=Jl,
        )

    t0 = time.perf_counter()
    sync(leg_call())
    t1 = time.perf_counter()
    times = []
    for _ in range(3):
        ta = time.perf_counter()
        sync(leg_call())
        times.append(time.perf_counter() - ta)
    dt = min(times)
    prs = REP_SUB * len(pts) / dt
    print(f"legacy dispatch: first {t1-t0:.1f}s, steady {dt:.3f}s "
          f"-> {prs:.0f} point-rounds/s")


if __name__ == "__main__":
    main()

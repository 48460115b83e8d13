#!/usr/bin/env python
"""Stage decomposition of _stack_stat at genome1m tail shapes.

NOTE: stage2/stage3 reproduce the ROUND-4 pipeline (transpose + pad +
mask); the production kernel dropped the pad/mask via the leading-junk
slab layout, so full_stat can now undercut stage3.

Builds the exact device inputs the 22-point tail dispatches (one stack
group, S_pad=24 x w_seg_p~36864 segments, sub_rep=16) and times four
nested prefixes of the kernel pipeline: (1) the permuted one-hot group
gather, (2) + transpose/mask to site-major, (3) + segmented Pallas
prefix sums, (4) the full statistic.  Differences attribute the wall.

Run EXCLUSIVELY on the axon tunnel:  python bench/micro_stack.py
"""

import functools
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    import fscl_tpu.engine.permute as P
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome
    from fscl_tpu.engine.scan import make_scan_hist_tables
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.histclr import (
        build_prefix_sums_seg, hist_clr_reps_ps,
        make_row_onehot_group_table,
    )
    from fscl_tpu.ops.permute import PERM_GROUP, block_permutation_groups

    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result = scan_genome(data, tables, cfg)
    pc = PermuteConfig(n_permute=1, seed=1)
    ht = make_scan_hist_tables(
        data, tables, n_alpha=pc.hist_alphas, decimate=pc.hist_decimate
    )
    row_cg = jnp.asarray(ht.row_map[np.asarray(data.row)].astype(np.int32))
    oh_table = make_row_onehot_group_table(row_cg, n_rows=ht.n_rows)
    gpos = data.genome_pos()
    n_groups = oh_table.shape[0] - 1

    # tail state: best point per chromosome; one stack group
    keep = np.array([
        np.where(result.chr_id == c)[0][
            np.argmax(result.clr[result.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    active = np.zeros(result.n_points, bool)
    active[keep] = True

    Jf = P.stat_positions(pc)
    # reuse the production stack construction
    by_len = {}
    from fscl_tpu.engine.scan import get_hist_device_arrays

    for c, cl in enumerate(data.chr_limits):
        if cl.n_snps == 0:
            continue
        w_seg_p = -(-(cl.n_snps + 2 * PERM_GROUP) // 4096) * 4096
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        pos_np = np.asarray(data.pos[sl])
        by_len.setdefault(w_seg_p, []).append(
            (c, cl.start_index, cl.n_snps, pos_np,
             get_hist_device_arrays(data, ht, pos_np, cl.start_index))
        )
    assert len(by_len) == 1, list(by_len)
    w_seg_p, segs = next(iter(by_len.items()))
    st = P._StackGroup(ht, w_seg_p, segs, cfg.eval_range, Jf)
    st.rebuild(result, {
        c: np.where((result.chr_id == c) & active)[0]
        for c, *_ in segs if ((result.chr_id == c) & active).any()
    })
    sub = st.sub_rep
    print(f"shapes: S_pad={st.n_seg_pad} w_seg_p={w_seg_p} "
          f"n_pts_pad={st.n_pts_pad} Jf={Jf} sub_rep={sub} "
          f"n_rows={ht.n_rows} NC={ht.n_cells} A={ht.n_alpha}")

    sigma = block_permutation_groups(key=jax.random.key(1), gpos=gpos,
                                     width_bp=1e6, n_replicates=sub)
    margin = 2 + max(
        seg[1] // PERM_GROUP + -(-(w_seg_p - 1) // PERM_GROUP) + 1
        - n_groups for seg in segs
    )
    margin = max(margin, 2)
    sigma8 = jnp.concatenate(
        [sigma, jnp.full((sub, margin), n_groups, sigma.dtype)], axis=1
    )

    S, G_loc = st.n_seg_pad, -(-(w_seg_p - 1) // PERM_GROUP)
    idx8 = st.seg_g0[:, None] + jnp.arange(G_loc, dtype=jnp.int32)[None, :]
    k = jnp.arange(w_seg_p, dtype=jnp.int32)[None, :]
    site_ok = (k >= st.seg_off[:, None] + 1) & (
        k <= st.seg_off[:, None] + st.seg_n[:, None]
    )

    @jax.jit
    def stage1(sig):  # gather only
        sel = sig.T[idx8]
        return oh_table[sel].sum(dtype=jnp.int32)

    @jax.jit
    def stage2(sig):  # gather + transpose/mask (materialized)
        sel = sig.T[idx8]
        oh = oh_table[sel]
        oh = oh.reshape(S, G_loc, sub, PERM_GROUP, ht.n_rows)
        oh = oh.transpose(0, 1, 3, 2, 4).reshape(
            S, G_loc * PERM_GROUP, sub, ht.n_rows
        )[:, : w_seg_p - 1]
        oh = jnp.pad(oh, ((0, 0), (1, 0), (0, 0), (0, 0)))
        oh = jnp.where(site_ok[:, :, None, None], oh, jnp.zeros((), oh.dtype))
        return oh.sum(dtype=jnp.int32)

    @jax.jit
    def stage3(sig):  # + segmented prefix
        sel = sig.T[idx8]
        oh = oh_table[sel]
        oh = oh.reshape(S, G_loc, sub, PERM_GROUP, ht.n_rows)
        oh = oh.transpose(0, 1, 3, 2, 4).reshape(
            S, G_loc * PERM_GROUP, sub, ht.n_rows
        )[:, : w_seg_p - 1]
        oh = jnp.pad(oh, ((0, 0), (1, 0), (0, 0), (0, 0)))
        oh = jnp.where(site_ok[:, :, None, None], oh, jnp.zeros((), oh.dtype))
        ps = build_prefix_sums_seg(
            oh.reshape(S * w_seg_p, sub * ht.n_rows), seg_len=w_seg_p
        )
        return ps[::4096].sum(dtype=jnp.int32)

    @jax.jit
    def stage4(sig):  # full statistic (one slice)
        return P._stack_stat(
            oh_table, sig, st.seg_g0, st.seg_off, st.seg_n,
            st.bounds, st.fbar, ht.t3,
            w_seg_p=w_seg_p, n_seg=S, n_rows=ht.n_rows,
            n_cells=ht.n_cells, n_alpha=ht.n_alpha, sub_rep=sub,
            n_slices=1, n_pts=st.n_pts_pad, Jf=Jf, mm_bf16=True,
        ).sum()

    for name, fn in [("gather", stage1), ("(+)transpose", stage2),
                     ("(+)prefix", stage3), ("full_stat", stage4)]:
        np.asarray(fn(sigma8))  # compile + warm
        t0 = time.monotonic()
        reps = 5
        for _ in range(reps):
            np.asarray(fn(sigma8))
        dt = (time.monotonic() - t0) / reps
        print(f"  {name:14s} {dt*1e3:8.1f} ms per {sub}-rep slice "
              f"({dt/sub*1e3:.2f} ms/rep)")


if __name__ == "__main__":
    main()

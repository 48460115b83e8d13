#!/usr/bin/env python
"""Post-thin-gather stage decomposition of _stack_stat at tail shapes.

After the thin index-row gather landed (make_row_index_group_table), the
warm 2048-replicate tail chunk still runs ~62 ms per 16-rep slice.  This
micro rebuilds the nested prefixes at the genome1m tail shapes with the
THIN table: (1) gather+transpose+expand, (2) + segmented prefix,
(3) full statistic — differences attribute the remaining wall between
expand, Pallas prefix, and the bounds-gather/contraction stage.

Run EXCLUSIVELY on the axon tunnel:  python bench/micro_thin.py
"""

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
    from fscl_tpu.ops.histclr import (
        build_prefix_sums_seg, make_row_index_group_table,
    )
    from fscl_tpu.ops.permute import PERM_GROUP

    S, G_loc, sub, n_rows = 24, 1152, 16, 48
    NC, A, n_pts, Jf = 189, 32, 32, 7
    w = G_loc * PERM_GROUP
    n_sig = 24305 + 8
    rng = np.random.default_rng(0)
    row_cg = jnp.asarray(
        rng.integers(0, n_rows, (n_sig - 9) * PERM_GROUP).astype(np.int32)
    )
    idx_table = make_row_index_group_table(row_cg, n_rows=n_rows)
    n_tab = idx_table.shape[0]
    sig = jnp.asarray(np.stack(
        [rng.permutation(n_tab) for _ in range(sub)]
    )).astype(jnp.int32)
    g0 = np.sort(
        rng.choice(n_tab - G_loc - 2, S, replace=False) + 1
    ).astype(np.int32)
    seg_g0 = jnp.asarray(g0)
    idx8 = seg_g0[:, None] + jnp.arange(G_loc, dtype=jnp.int32)[None, :] - 1
    idx8 = jnp.where(idx8 < 0, n_tab - 1, idx8)
    bounds = jnp.asarray(np.sort(
        rng.integers(0, S * w, (n_pts * Jf, 2, NC + 1))
    ).astype(np.int32))
    fbar = jnp.asarray(
        rng.random((n_pts * Jf, 2, NC)).astype(np.float32)
    )
    t3 = jnp.asarray(
        rng.standard_normal((2 * NC * n_rows, A)).astype(np.float32)
    )

    @jax.jit
    def stage1(sig):  # thin gather + transpose + expand
        sel = sig.T[idx8]
        gi = idx_table[sel].transpose(0, 1, 3, 2).reshape(S, w, sub)
        oh = (
            gi[..., None] == jnp.arange(n_rows, dtype=gi.dtype)
        ).astype(jnp.int8)
        return oh.sum(dtype=jnp.int32)

    @jax.jit
    def stage2(sig):  # + segmented prefix
        sel = sig.T[idx8]
        gi = idx_table[sel].transpose(0, 1, 3, 2).reshape(S, w, sub)
        oh = (
            gi[..., None] == jnp.arange(n_rows, dtype=gi.dtype)
        ).astype(jnp.int8)
        ps = build_prefix_sums_seg(
            oh.reshape(S * w, sub * n_rows), seg_len=w
        )
        return ps[::4096].sum(dtype=jnp.int32)

    @jax.jit
    def stage3(sig):  # full statistic (one slice)
        return P._stack_stat(
            idx_table, sig, seg_g0, seg_g0, seg_g0, bounds, fbar, t3,
            w_seg_p=w, n_seg=S, n_rows=n_rows, n_cells=NC, n_alpha=A,
            sub_rep=sub, n_slices=1, n_pts=n_pts, Jf=Jf, mm_bf16=True,
        ).sum()

    for name, fn in [("gather+expand", stage1), ("(+)prefix", stage2),
                     ("full_stat", stage3)]:
        np.asarray(fn(sig))
        t0 = time.monotonic()
        reps = 5
        for _ in range(reps):
            np.asarray(fn(sig))
        dt = (time.monotonic() - t0) / reps
        print(f"  {name:14s} {dt*1e3:8.1f} ms per {sub}-rep slice "
              f"({dt/sub*1e3:.2f} ms/rep)")


if __name__ == "__main__":
    main()

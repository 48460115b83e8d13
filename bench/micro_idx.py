#!/usr/bin/env python
"""A/B the permuted-stream gather: fat one-hot rows vs thin index rows.

The stacked permutation kernel's dominant stage is the group-level row
gather of the one-hot table ([G+1, PERM_GROUP*n_rows] i8, ~1.5 KB rows at
genome shapes — bench/micro_stack.py measured it at ~24 GB/s, far below
both HBM and the nominal row-gather rate).  Each one-hot row is fully
determined by PERM_GROUP small integers, so a [G+1, PERM_GROUP] i16
index-row gather moves 24x fewer bytes; the one-hot expansion is then an
on-chip broadcast compare.  This micro measures, at the genome1m tail
shapes, whether the gather cost is per-row (no win) or per-byte (big win),
and what the expand costs.

Run EXCLUSIVELY on the axon tunnel:  python bench/micro_idx.py
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

    S, G_loc, P, PG, n_rows = 24, 1152, 16, 32, 48
    n_sig = 24305
    rng = np.random.default_rng(0)
    row_cg = rng.integers(0, n_rows, n_sig * PG)
    oh_np = (row_cg[:, None] == np.arange(n_rows)).astype(np.int8)
    oh_table = jnp.asarray(
        np.concatenate(
            [oh_np.reshape(n_sig, PG * n_rows),
             np.zeros((1, PG * n_rows), np.int8)]
        )
    )
    idx_table = jnp.asarray(
        np.concatenate(
            [row_cg.reshape(n_sig, PG),
             np.full((1, PG), n_rows)]
        ).astype(np.int16)
    )
    sig = jnp.asarray(
        np.stack([rng.permutation(n_sig + 1) for _ in range(P)])
    ).astype(jnp.int32)
    g0 = np.sort(rng.choice(n_sig - G_loc, S, replace=False)).astype(np.int32)
    idx8 = jnp.asarray(g0)[:, None] + jnp.arange(G_loc, dtype=jnp.int32)[None, :]

    w = G_loc * PG

    @jax.jit
    def fat_gather(sig):
        sel = sig.T[idx8]
        return oh_table[sel].sum(dtype=jnp.int32)

    @jax.jit
    def thin_gather(sig):
        sel = sig.T[idx8]
        return idx_table[sel].sum(dtype=jnp.int32)

    @jax.jit
    def fat_to_site_major(sig):
        sel = sig.T[idx8]
        oh = oh_table[sel]
        oh = oh.reshape(S, G_loc, P, PG, n_rows)
        oh = oh.transpose(0, 1, 3, 2, 4).reshape(S, w, P, n_rows)
        return oh.sum(dtype=jnp.int32)

    @jax.jit
    def thin_expand_site_major(sig):
        sel = sig.T[idx8]
        gi = idx_table[sel]  # [S, G_loc, P, PG] i16
        gi = gi.transpose(0, 1, 3, 2).reshape(S, w, P)
        oh = (
            gi[..., None] == jnp.arange(n_rows, dtype=gi.dtype)
        ).astype(jnp.int8)  # [S, w, P, n_rows]
        return oh.sum(dtype=jnp.int32)

    for name, fn in [
        ("fat_gather  (1536B rows)", fat_gather),
        ("thin_gather (64B rows)", thin_gather),
        ("fat + transpose", fat_to_site_major),
        ("thin + transpose + expand", thin_expand_site_major),
    ]:
        np.asarray(fn(sig))
        t0 = time.monotonic()
        reps = 5
        for _ in range(reps):
            np.asarray(fn(sig))
        dt = (time.monotonic() - t0) / reps
        rows = S * G_loc * P
        print(f"  {name:28s} {dt*1e3:8.1f} ms  "
              f"({rows/dt/1e6:.0f}M rows/s)")


if __name__ == "__main__" and "--pg" not in sys.argv:
    main()


def pg_sweep():
    """Gather+transpose cost vs PERM_GROUP width at fixed site count."""
    import jax
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    S, P, n_rows = 24, 16, 48
    W = 36864  # sites per segment
    n_sites_total = 777_728
    rng = np.random.default_rng(0)
    import time as _t

    for PG in (32, 64, 128, 256):
        G_loc = W // PG
        n_sig = n_sites_total // PG
        row_cg = rng.integers(0, n_rows, n_sig * PG)
        oh_np = (row_cg[:, None] == np.arange(n_rows)).astype(np.int8)
        table = jnp.asarray(
            np.concatenate(
                [oh_np.reshape(n_sig, PG * n_rows),
                 np.zeros((1, PG * n_rows), np.int8)]
            )
        )
        sig = jnp.asarray(
            np.stack([rng.permutation(n_sig + 1) for _ in range(P)])
        ).astype(jnp.int32)
        g0 = np.sort(
            rng.choice(n_sig - G_loc, S, replace=False)
        ).astype(np.int32)
        idx8 = (
            jnp.asarray(g0)[:, None]
            + jnp.arange(G_loc, dtype=jnp.int32)[None, :]
        )

        @jax.jit
        def gt(sig, table=table, idx8=idx8, G_loc=G_loc, PG=PG):
            sel = sig.T[idx8]
            oh = table[sel]
            oh = oh.reshape(S, G_loc, P, PG, n_rows)
            oh = oh.transpose(0, 1, 3, 2, 4).reshape(
                S, G_loc * PG, P, n_rows
            )
            return oh.sum(dtype=jnp.int32)

        np.asarray(gt(sig))
        t0 = _t.monotonic()
        reps = 5
        for _ in range(reps):
            np.asarray(gt(sig))
        dt = (_t.monotonic() - t0) / reps
        rows = S * G_loc * P
        print(f"  PG={PG:4d}  row={PG*n_rows:6d}B  {dt*1e3:8.1f} ms  "
              f"({rows/dt/1e6:.0f}M rows/s, "
              f"{rows*PG*n_rows/dt/1e9:.0f} GB/s)")


if __name__ == "__main__" and "--pg" in sys.argv:
    pg_sweep()

"""Micro-profile of the hist_clr_reps prefix-sum stage at bench shapes.

jax.block_until_ready does NOT synchronize on the axon platform; every
timing forces a host readback of a scalar.
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

W = 20000
WP = 20480
P = 16
R = 8


def timeit(f, *a, reps=5):
    r = f(*a)
    np.asarray(jax.tree.leaves(r)[0])  # force completion
    t0 = time.monotonic()
    for _ in range(reps):
        r = f(*a)
    s = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.monotonic() - t0) / reps, s


def main():
    rng = np.random.default_rng(0)
    row_cg = jnp.asarray(rng.integers(0, 3, size=WP).astype(np.int32))
    sigma = jnp.asarray(
        np.stack([rng.permutation(W) for _ in range(P)]).astype(np.int32)
    )

    @jax.jit
    def stage_a(row_cg, sigma):
        idx = jax.lax.dynamic_slice(sigma, (0, 0), (P, W))
        rows = jnp.pad(row_cg[idx], ((0, 0), (0, WP - W)),
                       constant_values=R)
        return rows.sum()

    t, _ = timeit(stage_a, row_cg, sigma)
    print(f"a) row gather [P,W]: {t*1e3:.2f} ms")

    rows = jnp.asarray(rng.integers(0, 3, size=(P, WP)).astype(np.int32))

    @jax.jit
    def stage_b(rows):
        oh = rows[..., None] == jnp.arange(R, dtype=jnp.int32)
        oh = oh.astype(jnp.int32).transpose(1, 0, 2).reshape(WP, P * R)
        return oh.sum()

    t, _ = timeit(stage_b, rows)
    print(f"b) one-hot+transpose [W,{P*R}]: {t*1e3:.2f} ms")

    @jax.jit
    def stage_bc(rows):
        oh = rows[..., None] == jnp.arange(R, dtype=jnp.int32)
        oh = oh.astype(jnp.int32).transpose(1, 0, 2).reshape(WP, P * R)
        ps = jnp.concatenate(
            [jnp.zeros((1, P * R), jnp.int32), jnp.cumsum(oh, axis=0)],
            axis=0,
        ).astype(jnp.int16)
        return ps[-1].astype(jnp.int32).sum()

    t, _ = timeit(stage_bc, rows)
    print(f"b+c) one-hot+cumsum+int16: {t*1e3:.2f} ms")

    # cumsum alone on a pre-built int32 one-hot
    oh32 = jnp.asarray(
        (rng.integers(0, 2, size=(WP, P * R))).astype(np.int32))

    @jax.jit
    def stage_c(oh):
        return jnp.cumsum(oh, axis=0).astype(jnp.int16)[-1].astype(
            jnp.int32).sum()

    t, _ = timeit(stage_c, oh32)
    print(f"c) cumsum int32 [WP,{P*R}]: {t*1e3:.2f} ms")

    # cumsum in int16 end-to-end
    oh16 = oh32.astype(jnp.int16)

    @jax.jit
    def stage_c16(oh):
        return jnp.cumsum(oh, axis=0)[-1].astype(jnp.int32).sum()

    t, _ = timeit(stage_c16, oh16)
    print(f"c16) cumsum int16 [WP,{P*R}]: {t*1e3:.2f} ms")

    # full current pipeline (stage a through ps)
    @jax.jit
    def full(row_cg, sigma):
        idx = jax.lax.dynamic_slice(sigma, (0, 0), (P, W))
        row_rep = jnp.pad(row_cg[idx], ((0, 0), (0, WP - W)),
                          constant_values=R)
        oh = row_rep[..., None] == jnp.arange(R, dtype=jnp.int32)
        oh = oh.astype(jnp.int32).transpose(1, 0, 2).reshape(WP, P * R)
        ps = jnp.concatenate(
            [jnp.zeros((1, P * R), jnp.int32), jnp.cumsum(oh, axis=0)],
            axis=0,
        ).astype(jnp.int16)
        return ps[-1].astype(jnp.int32).sum()

    t, _ = timeit(full, row_cg, sigma)
    print(f"full a+b+c: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()

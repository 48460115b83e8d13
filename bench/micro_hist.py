"""Micro-benchmark for the hist permutation dispatch at bench shapes.

Times one _hist_perm_batch dispatch (16 replicates x 64 points x 49 fine
candidates) and its component stages to locate the bottleneck.  Run on the
real TPU:  python bench/micro_hist.py

jax.block_until_ready does NOT synchronize on the axon platform; every
timing forces a host readback of a small array.
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fscl_tpu.engine.permute as P
from fscl_tpu.ops import histclr as H

W = 20000
WP = 20480
G_FULL = 2048
DECIMATE = 4
R_ROWS = 8
A = 128
N_PTS = 64
J = 13
JF = 4 * (J - 1) + 1
REP = 16


def timeit(f, *a, reps=5, **k):
    r = f(*a, **k)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.monotonic()
    for _ in range(reps):
        r = f(*a, **k)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.monotonic() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    G = G_FULL // DECIMATE
    NC = min(G, int(np.log(20e6) / ((24.0 / (G_FULL - 1)) * DECIMATE)) + 2)
    print(f"shapes: W={W} NC={NC} R={R_ROWS} A={A} C={N_PTS*JF} P={REP}")

    t3 = jnp.asarray(
        rng.normal(size=(2 * NC * R_ROWS, A)).astype(np.float32))
    # plausible bounds: sorted prefix indices per (point, fine candidate)
    b = np.sort(rng.integers(0, W, size=(N_PTS * JF, 2, NC + 1)), axis=-1)
    bounds = jnp.asarray(b.astype(np.int32))
    fbar = jnp.asarray(rng.random((N_PTS * JF, 2, NC)).astype(np.float32))
    row_cg = jnp.asarray(rng.integers(0, 3, size=WP).astype(np.int32))
    # GROUP-level sigma (ops/permute.py PERM_GROUP): random permutation of
    # 8-site groups, sentinel-padded for the _perm_ps slice window
    Gn = W // 8
    sigma = jnp.asarray(np.concatenate([
        np.stack([rng.permutation(Gn) for _ in range(REP)]),
        np.full((REP, WP // 8 + 2 - Gn), Gn),
    ], axis=1).astype(np.int32))

    t = timeit(
        P._hist_perm_batch, t3, bounds, fbar, row_cg, sigma,
        n_cells=NC, n_rows=R_ROWS, n_alpha=A, c_sub=32,
        start=0, n=W, w_pad=WP, n_pts=N_PTS, Jf=JF,
    )
    pr = REP * N_PTS
    print(f"_hist_perm_batch {REP} reps x {N_PTS} pts: {t*1e3:.1f} ms "
          f"({pr/t:.0f} point-rounds/s)")

    # stage: ps build only (gather + one-hot + cumsum), forced materialization
    @jax.jit
    def ps_stage(row_cg, sigma):
        idx = jax.lax.dynamic_slice(sigma, (0, 0), (REP, W))
        rows = jnp.pad(row_cg[idx], ((0, 0), (0, WP - W)),
                       constant_values=R_ROWS)
        oh = rows[..., None] == jnp.arange(R_ROWS, dtype=jnp.int32)
        oh = oh.astype(jnp.int32).transpose(1, 0, 2).reshape(
            WP, REP * R_ROWS)
        ps = jnp.concatenate(
            [jnp.zeros((1, REP * R_ROWS), jnp.int32),
             jnp.cumsum(oh, axis=0)], axis=0).astype(jnp.int16)
        return ps

    @jax.jit
    def ps_consume(ps):
        return ps[::997].astype(jnp.int32).sum()

    ps = ps_stage(row_cg, sigma)
    t_ps = timeit(lambda: ps_consume(ps_stage(row_cg, sigma)))
    t_c = timeit(lambda: ps_consume(ps))
    print(f"ps build (materialized): {(t_ps - t_c)*1e3:.1f} ms")

    # stage: gather + weights + matmul given ps (the hist_clr_reps body)
    @jax.jit
    def body(ps, bounds, fbar, t3):
        C = bounds.shape[0]
        c_sub = 32
        n_chunks = -(-C // c_sub)
        b_c = bounds.reshape(n_chunks, c_sub, 2, NC + 1)
        f_c = fbar.reshape(n_chunks, c_sub, 2, NC)
        sign = jnp.array([-1, 1], jnp.int16)[None, :, None, None]
        t3r = t3.reshape(2 * NC, R_ROWS, A)

        def one_chunk(carry, args):
            bc, fc = args
            psb = ps[bc]
            h = ((psb[:, :, 1:, :] - psb[:, :, :-1, :]) * sign).astype(
                jnp.float32)
            w0 = jnp.sum(h * (1.0 - fc[..., None]), axis=1)
            w1 = jnp.sum(h * fc[..., None], axis=1)
            k = jnp.concatenate([w0, w1], axis=1).reshape(
                c_sub, 2 * NC, REP, R_ROWS)
            out = jax.lax.dot_general(
                k, t3r, dimension_numbers=(((1, 3), (0, 1)), ((), ())))
            return carry, 2.0 * out

        _, out = jax.lax.scan(one_chunk, None, (b_c, f_c))
        return out.max(axis=(0, 1))

    t_body = timeit(body, ps, bounds, fbar, t3)
    print(f"body (gather+weights+matmul): {t_body*1e3:.1f} ms")

    # stage: gather only
    @jax.jit
    def gather_only(ps, bounds):
        C = bounds.shape[0]
        c_sub = 32
        n_chunks = -(-C // c_sub)
        b_c = bounds.reshape(n_chunks, c_sub, 2, NC + 1)

        def one_chunk(carry, bc):
            psb = ps[bc]
            return carry, psb.astype(jnp.int32).sum(axis=(1, 2, 3))

        _, out = jax.lax.scan(one_chunk, None, b_c)
        return out.sum()

    t_g = timeit(gather_only, ps, bounds)
    rows = N_PTS * JF * 2 * (NC + 1)
    print(f"gather only: {t_g*1e3:.1f} ms ({rows/t_g/1e6:.0f}M rows/s, "
          f"width {REP*R_ROWS} int16)")

    # matmul only at full volume
    k = jnp.asarray(rng.normal(
        size=(N_PTS * JF * REP, 2 * NC * R_ROWS)).astype(np.float32))

    @jax.jit
    def mm(k, t3):
        return (k @ t3).max(axis=0)

    t_mm = timeit(mm, k, t3)
    fl = 2 * k.shape[0] * k.shape[1] * A
    print(f"matmul [{k.shape[0]},{k.shape[1]}]@[.,{A}]: {t_mm*1e3:.1f} ms "
          f"({fl/t_mm/1e12:.1f} TF/s)")

    kb = k.astype(jnp.bfloat16)
    t3b = t3.astype(jnp.bfloat16)

    @jax.jit
    def mmb(k, t3):
        return jax.lax.dot_general(
            k, t3, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).max(axis=0)

    t_mmb = timeit(mmb, kb, t3b)
    print(f"matmul bf16: {t_mmb*1e3:.1f} ms ({fl/t_mmb/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()

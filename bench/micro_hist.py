"""Micro-benchmark for the hist permutation dispatch at bench shapes.

Times one _hist_perm_batch dispatch (REP_SUB replicates x POINT_BUCKET
points) and its component costs (ps gather, matmul) to locate the
bottleneck.  Run on the real TPU:  python bench/micro_hist.py
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


def timeit(f, *a, reps=3, **k):
    r = f(*a, **k)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = f(*a, **k)
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    W = 20000
    w_pad = 20480
    G = 2048
    R_rows = 8
    NC = 1436
    A = 128
    n_pts = 64
    J = 13
    Jf = H and (8 * (J - 1) + 1)
    REP = 16

    t3 = jnp.asarray(rng.normal(size=(2 * NC * R_rows, A)).astype(np.float32))
    # plausible bounds: sorted prefix indices per (point, fine candidate)
    b = np.sort(rng.integers(0, W, size=(n_pts * Jf, 2, NC + 1)), axis=-1)
    bounds = jnp.asarray(b.astype(np.int32))
    fbar = jnp.asarray(rng.random((n_pts * Jf, 2, NC)).astype(np.float32))
    row_cg = jnp.asarray(rng.integers(0, 3, size=w_pad).astype(np.int32))
    sigma = jnp.asarray(
        np.stack([rng.permutation(W) for _ in range(REP)]).astype(np.int32)
    )

    t = timeit(
        P._hist_perm_batch, t3, bounds, fbar, row_cg, sigma,
        n_cells=NC, n_rows=R_rows, n_alpha=A, c_sub=64,
        start=0, n=W, w_pad=w_pad, n_pts=n_pts, J=J, Jf=Jf,
    )
    print(f"_hist_perm_batch {REP} reps x {n_pts} pts: {t*1e3:.0f} ms "
          f"({t/REP*1e3:.1f} ms/rep)")

    # component: ps gather at stage-A shape (C=n_pts*J) for ONE replicate
    ps = jnp.asarray(rng.normal(size=(w_pad + 1, R_rows)).astype(np.float32))
    bA = bounds.reshape(n_pts, Jf, 2, NC + 1)[:, ::8].reshape(
        n_pts * J, 2, NC + 1)

    @jax.jit
    def gather_only(ps, b):
        return ps[b].sum()

    t = timeit(gather_only, ps, bA)
    rows = n_pts * J * 2 * (NC + 1)
    print(f"ps gather C={n_pts*J}: {t*1e3:.1f} ms "
          f"({rows/t/1e6:.0f}M rows/s, width {R_rows})")

    # wide variant: replicates stacked into the row axis
    ps_wide = jnp.asarray(
        rng.normal(size=(w_pad + 1, R_rows * REP)).astype(np.float32))
    t = timeit(gather_only, ps_wide, bA)
    print(f"ps gather wide C={n_pts*J} width {R_rows*REP}: {t*1e3:.1f} ms "
          f"({rows/t/1e6:.0f}M rows/s) -> serves {REP} reps/row")

    # component: the matmul at stage A+B volume for one replicate
    k = jnp.asarray(
        rng.normal(size=(n_pts * (J + 17), 2 * NC * R_rows)).astype(np.float32))

    @jax.jit
    def mm(k, t3):
        return k @ t3

    t = timeit(mm, k, t3)
    fl = 2 * k.shape[0] * k.shape[1] * A
    print(f"matmul [{k.shape[0]},{k.shape[1]}]@[{k.shape[1]},{A}]: "
          f"{t*1e3:.1f} ms ({fl/t/1e12:.1f} TF/s)")

    # cumsum one-hot for one replicate
    @jax.jit
    def cs(row_cg, sig):
        idx = jax.lax.dynamic_slice(sig, (0,), (W,))
        rc = jnp.pad(row_cg[idx], (0, w_pad - W), constant_values=R_rows)
        oh = rc[:, None] == jnp.arange(R_rows, dtype=jnp.int32)[None, :]
        return jnp.cumsum(oh.astype(jnp.float32), axis=0)

    t = timeit(cs, row_cg, sigma[0])
    print(f"one-hot cumsum [W={W}, R={R_rows}]: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()

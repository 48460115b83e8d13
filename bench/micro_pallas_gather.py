"""Probe: VMEM-resident row gather inside a Pallas TPU kernel.

The hist kernel's dominant cost is an XLA gather of prefix-sum rows
(~225M rows/s, row-rate-bound).  ps fits in VMEM (5-10 MB); if Mosaic can
gather rows from VMEM materially faster, a fused Pallas kernel wins.

Run EXCLUSIVELY on the axon tunnel:  python bench/micro_pallas_gather.py
"""

import functools
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 20480
COLS = 128
N_IDX = 64 * 1024  # rows to gather
TILE = 1024  # indices per grid step


def kernel(idx_ref, ps_ref, out_ref):
    idx = idx_ref[:]  # [TILE] int32
    out_ref[:] = jnp.take(ps_ref[:], idx, axis=0)


@jax.jit
def pallas_gather(ps, idx):
    grid = N_IDX // TILE
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_IDX, COLS), ps.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,)),
            pl.BlockSpec((W + 1, COLS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, COLS), lambda i: (i, 0)),
    )(idx, ps)


@jax.jit
def xla_gather(ps, idx):
    return ps[idx]


def timeit(f, *a, reps=10):
    r = f(*a)
    np.asarray(r[:1, :1])
    t0 = time.monotonic()
    for _ in range(reps):
        r = f(*a)
    np.asarray(r[:1, :1])
    return (time.monotonic() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    for dt in (jnp.int16, jnp.float32):
        ps = jnp.asarray(
            rng.integers(0, 20000, size=(W + 1, COLS)).astype(
                np.int16 if dt == jnp.int16 else np.float32
            )
        )
        idx = jnp.asarray(
            np.sort(rng.integers(0, W + 1, size=N_IDX)).astype(np.int32)
        )
        try:
            tp = timeit(pallas_gather, ps, idx)
            ok = np.array_equal(
                np.asarray(pallas_gather(ps, idx)),
                np.asarray(xla_gather(ps, idx)),
            )
            print(f"{dt.__name__}: pallas {N_IDX/tp/1e6:.0f}M rows/s "
                  f"({tp*1e3:.2f} ms) correct={ok}")
        except Exception as e:
            print(f"{dt.__name__}: pallas FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
        tx = timeit(xla_gather, ps, idx)
        print(f"{dt.__name__}: xla {N_IDX/tx/1e6:.0f}M rows/s "
              f"({tx*1e3:.2f} ms)")


if __name__ == "__main__":
    main()

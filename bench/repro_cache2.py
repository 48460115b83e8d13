"""Is the axon first-run cost per-PROCESS or per-EXECUTABLE?

Times first-run of several distinct jitted programs in one process.
Run:  python bench/repro_cache2.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache config)

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    t1 = time.perf_counter()
    np.asarray(c(*args)).reshape(-1)[:1]
    t2 = time.perf_counter()
    np.asarray(c(*args)).reshape(-1)[:1]
    t3 = time.perf_counter()
    print(f"{name}: compile {t1-t0:.2f}s  run1 {t2-t1:.2f}s  "
          f"run2 {t3-t2:.2f}s", flush=True)


def main():
    t0 = time.perf_counter()
    print(f"devices: {jax.devices()[0]}  ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    a = jnp.full((256, 256), 1.0, jnp.float32)
    b = jnp.full((4096, 384), 2, jnp.int16)
    idx = jnp.zeros((1024,), jnp.int32)

    timed("f1 small-matmul", lambda x: (x @ x).sum(), a)
    timed("f2 gather-sum", lambda t, i: jnp.take(t, i, axis=0).sum(), b, idx)
    timed("f3 einsum-max",
          lambda t, i, x: jnp.einsum(
              "cwr,wa->car",
              jnp.take(t, i, axis=0).astype(jnp.float32).reshape(16, 64, -1),
              x[:64, :32]).max(), b, idx, a)
    timed("f4 scan-cumsum",
          lambda t: jax.lax.associative_scan(jnp.add, t.astype(jnp.int32),
                                             axis=0).sum(), b)


if __name__ == "__main__":
    main()

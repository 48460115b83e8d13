"""Minimal repro: is a persistent-cache HIT still slow through axon?

Jits one moderately-sized function (shape-matched to the dense scan stage),
logs compilation-cache events with timestamps, times first call.

Run:  python bench/repro_cache.py
"""

import logging
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache config)

import jax

jax.config.update("jax_explain_cache_misses", True)

logging.basicConfig(
    level=logging.DEBUG,
    format="%(relativeCreated)8.0fms %(name)s %(message)s",
    stream=sys.stderr,
)
for noisy in ("urllib3", "filelock", "asyncio"):
    logging.getLogger(noisy).setLevel(logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.getLogger("jax._src.dispatch").setLevel(logging.INFO)

import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.perf_counter()
    dev = jax.devices()[0]
    print(f"devices: {dev}  ({time.perf_counter()-t0:.1f}s)", flush=True)

    # shape-matched to hist_clr's inner matmul: [C, W, R] x [W, A]
    @jax.jit
    def f(t3, bounds, w):
        x = jnp.take(t3, bounds, axis=0)          # row gather
        y = jnp.einsum("cwr,wa->car", x.astype(jnp.float32)
                       .reshape(64, -1, t3.shape[1]), w)
        return y.max(axis=(1, 2))

    t3 = jnp.zeros((4096, 384), jnp.int16)
    bounds = jnp.zeros((64 * 96,), jnp.int32)
    w = jnp.zeros((96, 128), jnp.float32)

    t0 = time.perf_counter()
    lowered = f.lower(t3, bounds, w)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    r = compiled(t3, bounds, w)
    np.asarray(r)
    t3_ = time.perf_counter()
    r = compiled(t3, bounds, w)
    np.asarray(r)
    t4 = time.perf_counter()
    print(f"lower {t1-t0:.2f}s  compile {t2-t1:.2f}s  run1 {t3_-t2:.2f}s  "
          f"run2 {t4-t3_:.2f}s", flush=True)


if __name__ == "__main__":
    main()

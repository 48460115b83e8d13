"""Phase timing / tracing.

The reference's only observability is cr_logmsg progress lines and an unused
elapsed_time helper (SURVEY.md section 5).  Here: scoped phase timers that
report at MSG_DEBUG1, plus an opt-in hook into jax.profiler for device traces
(set FSCL_TPU_TRACE_DIR to capture a TensorBoard trace of a scan).
"""

from __future__ import annotations

import contextlib
import os
import time

from .logging import MSG_DEBUG1, logmsg

_phases: dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str):
    """Time a pipeline phase; accumulates into the module-level table."""
    trace_dir = os.environ.get("FSCL_TPU_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(trace_dir)
    t0 = time.monotonic()
    with ctx:
        yield
    dt = time.monotonic() - t0
    _phases[name] = _phases.get(name, 0.0) + dt
    logmsg(MSG_DEBUG1, "[timing] %s: %.2fs (cum %.2fs)", name, dt, _phases[name])


def phase_report() -> dict:
    return dict(_phases)

"""Background warming of the XLA compilation cache.

Every distinct dispatch shape of a jitted program is its own XLA
compilation, and compiling through the axon TPU tunnel costs seconds per
program.  Compiled on demand, the shape rungs of a pruning run (point-bucket
halvings, segment-ladder drops, chunk-boost increases — see
engine/permute.py) serialize minutes of compiles into the permutation wall:
the round-2 genome1m headline spent ~135 s this way.

The fix is to compile ahead of need, overlapped with device execution: a
small thread pool runs ``jitted.lower(shapes).compile()`` for PREDICTED
upcoming shapes.  Because JAX's persistent compilation cache keys on the
lowered HLO + compile options, the later foreground jit call at the same
shapes becomes a disk-cache hit (~0.1 s) instead of a fresh compile — the
dispatch path itself needs no changes, so results are bitwise identical
with or without warming.  Requires ``jax_compilation_cache_dir`` to be
set (``enable_compile_cache`` below, idempotent); without it, warming
degrades to a no-op cost-wise (the foreground compile proceeds as before).

The reference C has no analogue (a single ahead-of-time gcc build,
/root/reference/Makefile:7); this is a TPU/XLA-specific concern.
"""

from __future__ import annotations

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor

_CACHE_LOCK = threading.Lock()
_CACHE_ENABLED = False


def enable_compile_cache(path=None):
    """Idempotently point JAX's persistent compilation cache at ``path``.

    Default: ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.cache/fscl_tpu_xla``.
    Safe to call repeatedly and from any thread.
    """
    global _CACHE_ENABLED
    with _CACHE_LOCK:
        if _CACHE_ENABLED:
            return
        import jax

        existing = jax.config.jax_compilation_cache_dir
        if existing is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                path
                or os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    os.path.expanduser("~/.cache/fscl_tpu_xla"),
                ),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.1
            )
        _CACHE_ENABLED = True


class Precompiler:
    """Warm predicted program shapes on a background thread pool.

    ``submit(key, fn)`` schedules ``fn`` (a zero-arg callable performing
    ``jitted.lower(...).compile()``) once per key; ``ready(key)`` reports
    whether that compile has finished (failures count as ready — the
    foreground jit call then compiles synchronously, exactly the
    no-warming behavior).  ``stats`` accumulates compile counts/walls for
    the engine's dispatch accounting (engine/permute.py last_stats).
    """

    # process-wide set of keys whose warm compile already SUCCEEDED: the
    # persistent disk cache makes a re-warm a no-op cost-wise, but each
    # still burns ~0.1-1 s of lower()+cache-probe per key — repeat
    # scan_permute calls in one process (benchmarks, notebooks) would
    # resubmit the identical ladder every time
    _done_keys: set = set()
    _done_lock = threading.Lock()
    # process-wide registry of IN-FLIGHT warm futures: the pipeline runs
    # several Precompiler instances (prewarm_scan, prewarm_hist_permute,
    # the permutation driver's own), and a key already compiling in one
    # instance must neither be compiled again by another NOR foreground-
    # compiled by a dispatch — through the tunnel, every duplicate is a
    # full extra compile until the first finishes and populates the disk
    # cache.  Dispatch paths call known()/wait() to block on an in-flight
    # warm instead (engine/scan.py _dispatch, engine/permute.py
    # _stat_call).
    _global_futs: dict = {}

    def __init__(self, max_workers=3, name="fscl-warm"):
        # FSCL_NO_WARM=1 disables background compiles (A/B runs; emergency
        # switch if a backend mishandles concurrent compile requests)
        self._off = os.environ.get("FSCL_NO_WARM", "") == "1"
        if not self._off:
            enable_compile_cache()
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix=name
        )
        self._futs: dict = {}
        self._lock = threading.Lock()
        self.stats = {"warm_compiles": 0, "warm_s": 0.0, "warm_errors": 0}

    def submit(self, key, fn):
        if self._off:
            return
        with self._done_lock:
            if key in self._done_keys:
                return
            f = Precompiler._global_futs.get(key)
            if f is not None and not f.done():
                return  # in flight (possibly in another instance)
            fut = self._pool.submit(self._run, key, fn)
            Precompiler._global_futs[key] = fut
        with self._lock:
            self._futs[key] = fut

    def _run(self, key, fn):
        t0 = time.monotonic()
        ok = True
        try:
            fn()
        except Exception:  # foreground path will compile synchronously
            ok = False
            if os.environ.get("FSCL_WARM_DEBUG"):
                import traceback

                print(f"[warm-error] {key}", flush=True)
                traceback.print_exc()
        dt = time.monotonic() - t0
        if ok:
            with self._done_lock:
                self._done_keys.add(key)
        with self._lock:  # worker threads share the counters
            self.stats["warm_compiles" if ok else "warm_errors"] += 1
            self.stats["warm_s"] += dt

    def known(self, key):
        """True if the key's warm finished OR is in flight in ANY
        instance (wait() will then block on the in-flight compile)."""
        with self._done_lock:
            return (
                key in self._done_keys
                or key in Precompiler._global_futs
            )

    def ready(self, key):
        """True once key's warm compile finished (or failed, or was never
        submitted — callers treat unknown keys as not-worth-waiting)."""
        with self._done_lock:
            if key in self._done_keys:
                return True
            f = Precompiler._global_futs.get(key)
        return f is None or f.done()

    def wait(self, key, timeout=None):
        with self._done_lock:
            f = Precompiler._global_futs.get(key)
        if f is not None:
            try:
                f.result(timeout=timeout)
            except Exception:
                pass

    def close(self, join_timeout=0.0):
        """Cancel queued warms; optionally give in-flight compiles a
        bounded join.  The default does NOT join: close() sits on the
        permutation phase's timed path, and in-flight cache-hit re-warms
        would serialize into the wall (a measured 1.2 s on the 20k bench).
        Pass a timeout at interpreter-exit call sites if an abandoned
        tunnel compile must not outlive the process."""
        self._pool.shutdown(wait=False, cancel_futures=True)
        if join_timeout <= 0:
            return
        deadline = time.monotonic() + join_timeout
        with self._lock:
            futs = list(self._futs.values())
        for f in futs:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                f.result(timeout=remaining)
            except Exception:
                pass

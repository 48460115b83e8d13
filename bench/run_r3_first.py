#!/usr/bin/env python
"""First-run protocol measurement (VERDICT r2 items 4 and 8).

Definition of the canonical FIRST-RUN number: a fresh process with a COLD
persistent compilation cache (pointed at an empty directory), device-init
tax absorbed before any timed phase, genome1m at 100k permutations.
Everything the engine can overlap (background prewarm compiles during the
scan phase) is allowed — that is the production pipeline — but no compile
is served from a previous process's disk cache.

Records first_run_* keys into headline_results.json genome1m.
"""
import importlib.util
import json
import os
import pathlib
import sys
import tempfile

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="fscl_coldcache_"
)

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
import bench as _b  # noqa: F401  (reads the env var above)

spec = importlib.util.spec_from_file_location(
    "headline", REPO / "bench" / "headline.py"
)
H = importlib.util.module_from_spec(spec)
spec.loader.exec_module(H)

path = H.gen_genome1m()
out = H._run_ours_phased(path, 100_000)
rec = {
    "first_run_cache": "cold (empty persistent cache dir)",
    "first_run_perm_s": out["ours_perm_s"],
    "first_run_pr_per_s": out["ours_point_rounds_per_s"],
    "first_run_scan_s": out["ours_scan_cold_s"],
    "first_run_prewarm_s": out["ours_prewarm_s"],
    "first_run_model_s": out["ours_model_s"],
}
H.merge_results("genome1m", rec)
print(json.dumps(rec, indent=1))

"""Genome1m headline re-measure with the prewarmed pipeline.

Runs AFTER bench/run_r3_measurements.py in a fresh process: the persistent
compile cache is hot from that run, so this measures the production
steady-state (second-and-later runs on a machine; first runs additionally
pay background-compile latency, bounded by the r3 log).  Also records the
scan wall at the larger dense/exact chunk sizes.

Run EXCLUSIVELY on the axon tunnel:  python bench/run_r3b_genome1m.py
"""

import importlib.util
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

spec = importlib.util.spec_from_file_location(
    "headline", REPO / "bench" / "headline.py"
)
H = importlib.util.module_from_spec(spec)
spec.loader.exec_module(H)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    log(f"device-init tax: {time.monotonic()-t0:.0f}s")

    import fscl_tpu.engine.permute as P

    path = H.gen_genome1m()
    ours_out = H.DATA / "headline_genome1m.ours.tsv"
    ref_out = H.DATA / "headline_genome1m.ref.tsv"
    out = H._run_ours_phased(path, 100_000, out_tsv=ours_out)
    if ref_out.exists():
        out.update(H.compare_parity(ours_out, ref_out))
    out["perm_stats"] = {
        k: round(v, 2) if isinstance(v, float) else v
        for k, v in P.last_stats.items()
    }
    prev = json.loads((H.DATA.parent / "headline_results.json").read_text())
    g = prev.get("genome1m", {})
    out["first_run_perm_s"] = g.get("ours_perm_s")
    out["first_run_pr_per_s"] = g.get("ours_point_rounds_per_s")
    H.merge_results("genome1m", out)
    log(f"genome1m (warm cache, prewarmed): {json.dumps(out)}")

    # at-scale CLR parity under the forced neutral spectrum (reference
    # bug #8 blocks the estimated-background comparison; see headline.py)
    out2 = H.genome1m_neutral_parity()
    H.merge_results("genome1m", out2)
    log(f"neutral parity: {json.dumps(out2)}")


if __name__ == "__main__":
    main()

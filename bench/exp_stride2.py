#!/usr/bin/env python
"""A/B: recover dense_stride=2's scan speed at full selection fidelity.

VERDICT r4 item 4: stride 2 halves the dense selection stage's gather
volume (9.9 s vs 12.9 s genome1m warm scan) but round 4 measured 1-2
deficit intervals of 10,010 (max 0.87 CLR) vs the reference bisection,
so it shipped defaulted-off.  The prescription: at stride 2, widen the
branch pool (branch_k/branch_margin) and lower snp_probe_min_gain so the
halved dense grid cannot drop the true cell from the refine branches.

This harness scans genome1m under --force-neutral-spectrum (the at-scale
parity basis, see bench/headline.py genome1m_neutral_parity) for each
knob variant, times the WARM scan (second run in-process), and reports
deficit intervals vs the on-disk reference TSV.

Run EXCLUSIVELY on the axon tunnel:
  python bench/exp_stride2.py [variant ...]   (default: all)
"""

import dataclasses
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np

from headline import DATA, compare_parity, gen_genome1m  # noqa: E402

VARIANTS = {
    # name: ScanConfig overrides
    "s1": {},  # round-4 shipped default (stride 1) — the control
    "s2": {"dense_stride": 2},  # round-4 rejected config
    "s2wide": {"dense_stride": 2, "branch_k": 10, "branch_margin": 4.5,
               "snp_probe_min_gain": 0.15},
    "s2wider": {"dense_stride": 2, "branch_k": 14, "branch_margin": 6.0,
                "snp_probe_min_gain": 0.1, "hist_tie_margin": 3.0,
                "hist_tie_cap": 12},
}


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.io import load_snp_input, scan_output
    from fscl_tpu.models import background_fsp, build_tables

    names = sys.argv[1:] or list(VARIANTS)
    path = gen_genome1m()
    ref_out = DATA / "headline_genome1m_neutral.ref.tsv"
    assert ref_out.exists() and ref_out.stat().st_size, (
        "reference TSV missing — run bench/headline.py genome1m first"
    )
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        force_neutral_spectrum=True,
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)

    results = {}
    for name in names:
        cfg = ScanConfig(
            small_grid_sp=1000, large_grid_sp=100000, **VARIANTS[name]
        )
        scan_genome(data, tables, cfg)  # warm-up (compiles)
        t0 = time.monotonic()
        result = scan_genome(data, tables, cfg)
        wall = time.monotonic() - t0
        out = DATA / f"exp_stride2_{name}.tsv"
        scan_output(str(out), data, result)
        par = compare_parity(str(out), str(ref_out))
        rec = {
            "overrides": VARIANTS[name],
            "warm_scan_s": round(wall, 2),
            "deficit_intervals": par.get("parity_deficit_intervals"),
            "max_deficit": par.get("parity_max_deficit"),
            "parity_pass": par.get("parity_pass"),
        }
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    out_path = REPO / "bench" / "exp_stride2_results.json"
    out_path.write_text(json.dumps(results, indent=1, sort_keys=True))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 scan check on genome1m: wall time + neutral CLR parity.

Measures (1) the warm scan wall on the estimated-background config (the
headline scan number, VERDICT r2 item 3 target <= 12 s) and (2) the
neutral-spectrum parity vs the reference TSV already on disk (item 2
target: zero deficit intervals).
"""
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
import bench as _b  # noqa: F401
import numpy as np

from headline import DATA, absorb_device_tax, compare_parity, gen_genome1m

from fscl_tpu.engine import ScanConfig, scan_genome
from fscl_tpu.io import load_snp_input, scan_output
from fscl_tpu.models import background_fsp, build_tables

absorb_device_tax()
path = gen_genome1m()
out = {}

for mode in ("neutral", "estimated"):
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        force_neutral_spectrum=(mode == "neutral"),
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig()
    t0 = time.monotonic()
    result = scan_genome(data, tables, cfg)
    w_cold = time.monotonic() - t0
    t0 = time.monotonic()
    result = scan_genome(data, tables, cfg)
    w_warm = time.monotonic() - t0
    out[f"{mode}_scan_cold_s"] = round(w_cold, 2)
    out[f"{mode}_scan_warm_s"] = round(w_warm, 2)
    if mode == "neutral":
        tsv = DATA / "r3_genome1m_neutral.ours.tsv"
        scan_output(str(tsv), data, result, n_permute=0)
        ref = DATA / "headline_genome1m_neutral.ref.tsv"
        if ref.exists():
            out.update(
                {"neutral_" + k: v for k, v in
                 compare_parity(tsv, ref).items()}
            )
print(json.dumps(out, indent=1))

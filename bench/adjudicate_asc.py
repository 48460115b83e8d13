#!/usr/bin/env python
"""asc100k adjudication (VERDICT r2 item 1): scan-only, ours in
--compat-mirror-unfolded mode vs the reference TSV already on disk.

The asc100k dataset is all-unfolded; the reference's estimated background
is therefore mirrored (bug #1, background-fsp.c:226-233).  If the 2.6x
CLR deficit disappears when ours adopts the mirrored accumulation, the
divergence is adjudicated: same model basis -> same CLRs, and the default
mode's difference is the documented deliberate deviation.
"""
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
import bench as _b  # noqa: F401
import numpy as np

from headline import DATA, compare_parity, absorb_device_tax, gen_asc100k


def run(compat):
    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.io import load_snp_input, scan_output
    from fscl_tpu.models import background_fsp, build_tables

    path = gen_asc100k()
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=compat,
    )
    tables = build_tables(
        fsp, data.sample_depths, grid_points=2048, asc_depth=20,
        asc_min_freq=2,
    )
    data.attach_model(tables)
    t0 = time.monotonic()
    result = scan_genome(data, tables, ScanConfig())
    wall = time.monotonic() - t0
    mode = "compat" if compat else "default"
    out = DATA / f"adjudicate_asc.{mode}.tsv"
    scan_output(str(out), data, result, n_permute=0)
    return out, wall


if __name__ == "__main__":
    absorb_device_tax()
    ref = DATA / "headline_asc100k.ref.tsv"
    for compat in (True, False):
        out, wall = run(compat)
        par = compare_parity(out, ref)
        par["scan_wall_s"] = round(wall, 1)
        print(json.dumps({("compat" if compat else "default"): par},
                         indent=1))

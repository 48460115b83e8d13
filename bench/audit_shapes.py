"""Compiled-shape audit for one full pipeline run (VERDICT r1 item 10).

Counts every XLA compilation a scan+permute pipeline triggers (CPU backend —
the shape census is identical on TPU, where each compile costs minutes cold
through the tunnel).  Output: compile count per jitted function, so shape
proliferation regressions are visible before they hit the tunnel.

Usage:  python bench/audit_shapes.py [n_chr] [n_permute]
"""

import logging
import pathlib
import re
import sys
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

import numpy as np


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.names = Counter()

    def emit(self, record):
        m = re.search(r"Compiling (\S+)", record.getMessage())
        if m:
            self.names[m.group(1).split(".")[-1]] += 1


def main():
    n_chr = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_perm = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    counter = _CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)
    logging.getLogger("jax._src.dispatch").addHandler(counter)

    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset

    chrs, poss, freqs, ns = [], [], [], []
    for c in range(n_chr):
        sim = simulate_dataset(
            seed=100 + c, sample_size=40, snp_density=1.0, mb_length=8.0,
            alpha=3e-5, n_sweeps=1,
        )
        chrs.append(np.full(len(sim["pos"]), str(c + 1)))
        poss.append(sim["pos"])
        freqs.append(sim["freq"])
        ns.append(np.full(len(sim["pos"]), sim["n"]))
    data = build_snp_data(
        np.concatenate(chrs), np.concatenate(poss), np.concatenate(freqs),
        np.concatenate(ns), np.zeros(sum(map(len, poss)), bool),
    )
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)

    marks = {}

    def mark(stage):
        marks[stage] = sum(counter.names.values())

    mark("start")
    result = scan_genome(data, tables, cfg)
    mark("scan")
    scan_genome(data, tables, cfg)
    mark("scan_warm")
    scan_permute(
        data, tables, result, cfg,
        PermuteConfig(n_permute=n_perm, chunk_replicates=32, seed=1),
    )
    mark("permute")

    print(f"\n=== compile census: {n_chr} chr x ~8k sites, {n_perm} perms")
    print(f"scan compiles:        {marks['scan'] - marks['start']}")
    print(f"scan re-run compiles: {marks['scan_warm'] - marks['scan']}"
          " (MUST be 0)")
    print(f"permute compiles:     {marks['permute'] - marks['scan_warm']}")
    print("\nper-function totals:")
    for name, cnt in counter.names.most_common(30):
        print(f"  {cnt:4d}  {name}")


if __name__ == "__main__":
    main()

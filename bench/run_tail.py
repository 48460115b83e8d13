#!/usr/bin/env python
"""Genome1m deep-tail permutation throughput, steady-state protocol.

Round-neutral extraction of the tail stage of run_r4_genome1m.py: load +
model + scan (untimed), then the 22-immortal-point tail (one point per
chromosome survives, 4096 rounds) twice — cold wall first, warm wall
second (canonical tail_pr_per_s_warm).  Records the genome1m tail_* keys
in bench/headline_results.json.

Run EXCLUSIVELY on the axon tunnel:  python bench/run_tail.py
"""

import copy
import importlib.util
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


def _load_headline():
    spec = importlib.util.spec_from_file_location(
        "headline", REPO / "bench" / "headline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    H = _load_headline()
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()  # absorb the per-process device-init tax

    import os

    if os.environ.get("FSCL_TAIL_DEBUG"):
        from fscl_tpu.utils import MSG_DEBUG1, configure_logmsg

        configure_logmsg(MSG_DEBUG1)

    import fscl_tpu.engine.permute as P
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    path = H.gen_genome1m()
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result0 = scan_genome(data, tables, cfg)
    keep = np.array([
        np.where(result0.chr_id == c)[0][
            np.argmax(result0.clr[result0.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    pc = PermuteConfig(n_permute=4096, chunk_replicates=32, seed=1)
    walls = []
    for rep in range(2):
        tail = copy.deepcopy(result0)
        tail.permute_finished[:] = True
        tail.permute_finished[keep] = False
        t0 = time.monotonic()
        scan_permute(data, tables, tail, cfg, copy.deepcopy(pc))
        walls.append(time.monotonic() - t0)
        pr = int(tail.permute_n[keep].sum())
    print(
        f"tail({len(keep)} pts): cold {walls[0]:.1f}s warm {walls[1]:.1f}s, "
        f"{pr} pr -> {pr / walls[1]:.0f} pr/s; stats {P.last_stats}",
        file=sys.stderr,
    )
    H.merge_results("genome1m", {
        "tail_points": int(len(keep)), "tail_point_rounds": pr,
        "tail_pr_per_s_warm": round(pr / walls[1], 1),
        "tail_pr_per_s_cold": round(pr / walls[0], 1),
    })


if __name__ == "__main__":
    main()

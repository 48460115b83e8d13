"""Incremental-checkpoint overhead at genome scale (VERDICT r1 item 7).

Runs a genome1m permutation slice twice — without and with the incremental
Checkpointer enabled — and also accounts the in-run save time directly via a
timing wrapper.  Done-criterion: checkpoint overhead <5% of chunk wall with
10k points.

Run EXCLUSIVELY on the axon tunnel:  python bench/measure_ckpt.py
"""

import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


def main():
    import copy

    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    import fscl_tpu.engine.checkpoint as ck
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result0 = scan_genome(data, tables, cfg)
    n_perm = 256

    def run(ckpt_path):
        r = copy.deepcopy(result0)
        pc = PermuteConfig(
            n_permute=n_perm, chunk_replicates=32, seed=1,
            checkpoint_path=ckpt_path,
        )
        t0 = time.monotonic()
        scan_permute(data, tables, r, cfg, pc)
        return time.monotonic() - t0, int(r.permute_n.sum())

    # warm all shapes first
    run(None)
    w_off, pr = run(None)

    acc = {"t": 0.0, "n": 0}
    orig = ck.Checkpointer.save

    def timed_save(self, result, rounds_done):
        t0 = time.monotonic()
        orig(self, result, rounds_done)
        acc["t"] += time.monotonic() - t0
        acc["n"] += 1

    ck.Checkpointer.save = timed_save
    with tempfile.TemporaryDirectory() as d:
        path = str(pathlib.Path(d) / "gen.ckpt")
        w_on, _ = run(path)
        size = sum(
            p.stat().st_size for p in pathlib.Path(d).iterdir()
        )
    ck.Checkpointer.save = orig

    print(f"genome1m {n_perm} perms over {result0.n_points} points "
          f"({pr} point-rounds):")
    print(f"  wall without checkpoint: {w_off:.2f}s")
    print(f"  wall with checkpoint:    {w_on:.2f}s "
          f"({100 * (w_on - w_off) / w_off:+.1f}%)")
    print(f"  save time (direct):      {acc['t']:.2f}s over {acc['n']} "
          f"chunks = {100 * acc['t'] / w_on:.1f}% of wall")
    print(f"  checkpoint bytes:        {size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()

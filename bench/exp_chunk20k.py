#!/usr/bin/env python
"""A/B the 20k bench's permutation chunking (VERDICT r3 item 4).

The bench's permutation wall has a fixed-cost floor (sigma program, per-
chunk drains, host updates); chunk_replicates trades that floor against
pruning savings (a second chunk runs only surviving points).  Measures
point-rounds/s over several samples per setting on the live chip.

Run EXCLUSIVELY on the axon tunnel: python bench/exp_chunk20k.py
"""

import copy
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as B  # noqa: E402  (compile cache + dataset constants)


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    B.ensure_data()
    data = load_snp_input(B.DATA)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths,
        compat_mirror_unfolded=True,
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    scan_cfg = ScanConfig(small_grid_sp=B.FINE, large_grid_sp=B.COARSE)
    result0 = scan_genome(data, tables, scan_cfg)
    scan_genome(data, tables, scan_cfg)

    for chunk in (32, 48, 50, 64):
        pc = PermuteConfig(n_permute=B.N_PERMUTE, chunk_replicates=chunk,
                           seed=1)
        # warm pass for this chunking's shapes
        r = copy.deepcopy(result0)
        scan_permute(data, tables, r, scan_cfg, pc)
        best = 0.0
        for s in range(3):
            r = copy.deepcopy(result0)
            t0 = time.monotonic()
            scan_permute(data, tables, r, scan_cfg, pc)
            w = time.monotonic() - t0
            pr = int(r.permute_n.sum())
            best = max(best, pr / w)
            print(f"chunk={chunk} sample{s}: {pr} pr in {w:.3f}s "
                  f"= {pr/w:.0f} pr/s")
        print(f"chunk={chunk}: BEST {best:.0f} pr/s")


if __name__ == "__main__":
    main()

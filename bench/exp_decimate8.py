"""Experiment: scan selection on the 8x-decimated lattice with a raised
exact-re-eval margin vs the current decimate-4 default. Compares wall and
final outputs (post-exact CLR/pos) on the genome1m headline data.

Run EXCLUSIVELY on the axon tunnel:  python bench/exp_decimate8.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


def main():
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.lattice import LatticeTables

    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    lattice = LatticeTables(tables.table, tables.grid_points)

    results = {}
    for name, dec, margin in (("d4_m1", 4, 1.0), ("d8_m2", 8, 2.0)):
        cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000,
                         hist_decimate=dec, hist_tie_margin=margin)
        scan_genome(data, tables, cfg, lattice=lattice)  # warm shapes
        t0 = time.perf_counter()
        r = scan_genome(data, tables, cfg, lattice=lattice)
        w = time.perf_counter() - t0
        results[name] = r
        print(f"{name}: warm scan {w:.2f}s  max CLR {r.clr.max():.2f}",
              flush=True)

    a, b = results["d4_m1"], results["d8_m2"]
    dclr = np.abs(a.clr - b.clr)
    same_pos = (a.sweep_pos == b.sweep_pos).mean()
    print(f"|dCLR|: max {dclr.max():.3f} mean {dclr.mean():.4f}; "
          f"same winner pos: {100*same_pos:.1f}%")
    worst = np.argsort(dclr)[-5:]
    for i in worst:
        print(f"  pt {i}: d4 {a.clr[i]:.2f}@{a.sweep_pos[i]} "
              f"d8 {b.clr[i]:.2f}@{b.sweep_pos[i]}")


if __name__ == "__main__":
    main()

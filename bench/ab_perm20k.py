"""Repeated warm permutation walls at the 20k bench config (A/B helper).

Runs the bench scan once, then scan_permute N times warm and prints each
wall — run-to-run tunnel noise at the 0.1 s scale makes single bench.py
comparisons unreliable, so engine A/Bs compare the median of these walls.

Run EXCLUSIVELY on the axon tunnel:  python bench/ab_perm20k.py [N]
"""

import copy
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

sys.argv, argv = sys.argv[:1], sys.argv
N = int(argv[1]) if len(argv) > 1 else 7

import bench as B


def main():
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, prewarm_scan, scan_genome, scan_permute,
    )
    from fscl_tpu.engine.permute import prewarm_hist_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    path = B.DATA
    B.ensure_data()
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    scan_cfg = ScanConfig(small_grid_sp=B.FINE, large_grid_sp=B.COARSE)
    pc = PermuteConfig(n_permute=B.N_PERMUTE, chunk_replicates=32, seed=1)
    prewarm_scan(data, tables, scan_cfg)
    prewarm_hist_permute(data, tables, scan_cfg, pc)
    result = scan_genome(data, tables, scan_cfg)
    walls = []
    for i in range(N + 1):  # first is the warmup, dropped
        r = copy.deepcopy(result)
        t0 = time.monotonic()
        scan_permute(data, tables, r, scan_cfg, copy.deepcopy(pc))
        walls.append(time.monotonic() - t0)
    pr = int(r.permute_n.sum())
    warm = walls[1:]
    print(f"walls: {['%.3f' % w for w in walls]}")
    print(
        f"median {statistics.median(warm):.3f}s  min {min(warm):.3f}s  "
        f"pr {pr}  median_rate {pr / statistics.median(warm):.0f}/s  "
        f"best_rate {pr / min(warm):.0f}/s"
    )


if __name__ == "__main__":
    main()

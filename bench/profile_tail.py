"""Cost decomposition of a genome-scale pruning-tail permutation chunk.

Reproduces the tail state of the genome1m run (22 immortal points, one per
chromosome) and times each chunk component separately: sigma generation,
per-chromosome prefix-sum build (_perm_ps), statistic dispatches
(_hist_stat), and the drain readback.

Run EXCLUSIVELY on the axon tunnel:  python bench/profile_tail.py
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jnp.zeros(8).sum().item()

    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome
    from fscl_tpu.engine.permute import (
        _ChrHistBucket, _hist_stat, _perm_ps, HIST_REP_SUB,
    )
    from fscl_tpu.engine.scan import make_scan_hist_tables, _pad_sites
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.histclr import (
        make_hist_device_arrays, make_row_onehot_group_table,
    )
    from fscl_tpu.ops.permute import block_permutation_groups

    data = load_snp_input(REPO / "bench" / "data" / "headline_genome1m.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result = scan_genome(data, tables, cfg)
    pc = PermuteConfig(n_permute=100_000, chunk_replicates=32, seed=1)
    ht = make_scan_hist_tables(data, tables, pc.hist_alphas,
                               decimate=pc.hist_decimate)
    row_cg = jnp.asarray(ht.row_map[np.asarray(data.row)].astype(np.int32))
    oh_table = make_row_onehot_group_table(row_cg, n_rows=ht.n_rows)
    n_groups = oh_table.shape[0] - 1
    gpos = data.genome_pos()

    # tail state: the single highest-CLR point per chromosome survives
    pts = np.array([
        np.where(result.chr_id == c)[0][
            np.argmax(result.clr[result.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    print(f"tail: {len(pts)} immortal points, R rows {ht.n_rows}")

    J = pc.hist_positions
    R_chunk = 512  # what the boosted tail uses per chunk
    sub_b = 256    # per-dispatch replicate slice at bucket size 4
    sigma = None

    def sync(x):
        return np.asarray(x).reshape(-1)[:1]

    for it in range(3):
        t0 = time.perf_counter()
        sigma = block_permutation_groups(
            jax.random.key(1), gpos, 1e6, R_chunk, start=it * R_chunk
        )
        sigma = jnp.concatenate(
            [sigma, jnp.full((R_chunk, 8), n_groups, sigma.dtype)], axis=1
        )
        sync(sigma[:1, :4])
        t1 = time.perf_counter()

        # per chromosome: bucket geometry (cached in prod), ps + stat
        t_ps = t_stat = 0.0
        outs = []
        for c, cl in enumerate(data.chr_limits):
            sl = slice(cl.start_index, cl.start_index + cl.n_snps)
            pos_np = np.asarray(data.pos[sl])
            dev = make_hist_device_arrays(ht, pos_np)
            b = _ChrHistBucket(
                ht, pos_np, result, pts[pts == pts][c : c + 1], J,
                cfg.eval_range, device_arrays=dev, n_pts=4,
            )
            w_pad = _pad_sites(cl.n_snps)
            for r0 in range(0, R_chunk, sub_b):
                ta = time.perf_counter()
                ps = _perm_ps(oh_table, sigma[r0 : r0 + sub_b],
                              start=cl.start_index, n=cl.n_snps,
                              w_pad=w_pad)
                sync(ps[:1, :1]) if it == 0 else None
                tb = time.perf_counter()
                o = _hist_stat(
                    ht.t3, b.points.bounds, b.points.fbar, ps,
                    n_rep=sub_b, n_cells=ht.n_cells, n_rows=ht.n_rows,
                    n_alpha=ht.n_alpha, c_sub=32, n_pts=4, Jf=b.Jf,
                )
                outs.append(o)
                tc = time.perf_counter()
                t_ps += tb - ta
                t_stat += tc - tb
        t2 = time.perf_counter()
        cat = np.asarray(jnp.concatenate(outs, axis=1))
        t3 = time.perf_counter()
        print(f"[{it}] sigma {t1-t0:.2f}s  enqueue(ps {t_ps:.2f}s + "
              f"stat {t_stat:.2f}s)  drain {t3-t2:.2f}s  "
              f"total {t3-t0:.2f}s -> {len(pts)*R_chunk/(t3-t0):.0f} pr/s",
              flush=True)


if __name__ == "__main__":
    main()

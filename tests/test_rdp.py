"""Run-decomposed permuted prefix (RDP) path vs the sigma/prefix path.

The RDP kernel (ops/histclr.py rdp_clr_reps) assembles each replicate's
permuted one-hot prefix at the candidate bounds from two precomputed
tables (site prefix + per-run constants) instead of materializing the
permuted stream — the pruning-tail fast path (VERDICT r4 item 2).  Its
window counts are the same integers the stacked/sigma path computes, so
the statistic values must agree to f32 contraction noise and the full
driver's pruning decisions must agree exactly.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fscl_tpu.ops.histclr import (
    build_hist_points,
    build_site_prefix,
    hist_clr_reps,
    rdp_clr_reps,
)
from fscl_tpu.ops.permute import (
    PERM_GROUP,
    block_permutation_groups,
    block_permutation_runs,
    expand_group_sigma,
)

from tests.test_histclr import _hist_setup
from tests.test_ops import _mk_data


def test_runs_decomposition_matches_sigma():
    """block_permutation_runs rebuilds block_permutation_groups exactly."""
    key = jax.random.key(7)
    rng = np.random.default_rng(0)
    gpos = np.sort(rng.choice(5_000_000, 9_000, replace=False))
    sig = np.asarray(
        block_permutation_groups(key, gpos, 300_000, 4, start=3)
    )
    src, dst, sz = map(
        np.asarray, block_permutation_runs(key, gpos, 300_000, 4, start=3)
    )
    G = sig.shape[1]
    for r in range(4):
        rebuilt = np.full(G, -1, np.int32)
        for s, d, n in zip(src[r], dst[r], sz[r]):
            rebuilt[d : d + n] = np.arange(s, s + n)
        np.testing.assert_array_equal(rebuilt, sig[r])
        assert sz[r].sum() == G


def test_rdp_matches_sigma_prefix_path():
    """rdp_clr_reps == hist_clr_reps on the same permutation stream."""
    tables, pos, row, null = _mk_data(seed=11)
    ht = _hist_setup(tables, pos, row, null, n_alpha=16)
    W = len(pos)
    cand = np.linspace(int(pos[5]), int(pos[-5]), 9).astype(np.int64)
    hp = build_hist_points(ht, pos, cand, eval_range=150, cand_pad=3)
    row_c = ht.row_map[row].astype(np.int32)

    P = 4
    key = jax.random.key(3)
    sigma8 = block_permutation_groups(key, pos, 250_000, P, start=5)
    sig = np.asarray(expand_group_sigma(sigma8, W))
    row_rep = jnp.asarray(row_c[sig])  # [P, W] permuted row streams
    want = np.asarray(hist_clr_reps(
        ht.t3, hp.bounds, hp.fbar, row_rep,
        n_cells=ht.n_cells, n_rows=ht.n_rows,
        n_alpha=ht.n_alpha, c_sub=4,
    ))

    psite = build_site_prefix(jnp.asarray(row_c), n_rows=ht.n_rows)
    src, dst, sz = block_permutation_runs(key, pos, 250_000, P, start=5)
    got = np.asarray(rdp_clr_reps(
        ht.t3, hp.bounds, hp.fbar, psite, src, dst, sz,
        n_rep=P, n_cells=ht.n_cells, n_rows=ht.n_rows,
        n_alpha=ht.n_alpha, pg=PERM_GROUP,
        n_groups=int(sigma8.shape[1]), c_sub=4,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_rdp_driver_matches_stack_driver():
    """Full scan_permute: RDP tail path == stacked path, counts exactly."""
    import fscl_tpu.engine.permute as pm
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset, write_snp_file
    import tempfile
    import pathlib

    td = pathlib.Path(tempfile.mkdtemp())
    with open(td / "g.sf", "w") as f:
        for chrom, seed in (("1", 21), ("2", 22)):
            sim = simulate_dataset(
                seed=seed, sample_size=24, snp_density=1.0, mb_length=3.0,
                alpha=3e-5, n_sweeps=1,
            )
            for p, q in zip(sim["pos"], sim["freq"]):
                f.write(f"{chrom}\t{p}\t{q}\t{sim['n']}\t0\n")
    data = load_snp_input(td / "g.sf")
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=512)
    data.attach_model(tables)
    cfg = ScanConfig(eval_range=1500, small_grid_sp=25_000,
                     large_grid_sp=500_000)
    result = scan_genome(data, tables, cfg)
    pc = PermuteConfig(n_permute=96, chunk_replicates=16, seed=4)

    import unittest.mock as mock

    def run(force):
        r = copy.deepcopy(result)
        old = pm.RDP_FORCE
        pm.RDP_FORCE = force
        try:
            # RDP is a single-device path; force it (tests run on the
            # 8-virtual-device CPU mesh)
            with mock.patch.object(pm.jax, "device_count",
                                   return_value=1):
                scan_permute(data, tables, r, cfg, copy.deepcopy(pc))
        finally:
            pm.RDP_FORCE = old
        return r, dict(pm.last_stats)

    r_rdp, st_rdp = run("on")
    assert st_rdp["rdp_dispatches"] > 0, st_rdp
    r_stack, st_stack = run("off")
    assert st_stack["rdp_dispatches"] == 0
    assert st_stack["hist_unsharded_dispatches"] > 0

    np.testing.assert_array_equal(r_rdp.permute_p, r_stack.permute_p)
    np.testing.assert_array_equal(r_rdp.permute_n, r_stack.permute_n)
    np.testing.assert_allclose(
        r_rdp.stat_threshold, r_stack.stat_threshold, rtol=0, atol=0
    )
    for i in range(r_rdp.n_points):
        np.testing.assert_allclose(
            r_rdp.null_clr[i], r_stack.null_clr[i], rtol=1e-5, atol=1e-3
        )

"""Mixed/missing-depth datasets on the compressed histogram path.

The reference's headline feature "mixed sample depths per site"
(/root/reference/README.md:26; background-fsp.c:248-266 per-depth spectra;
sm-search.c:85-103 per-depth dispatch): real SNP data with missing genotypes
has dozens of distinct depths.  Above ROWS_MAX distinct (depth, folded,
freq) rows the hist engine SVD-compresses the row family to f32 weight
channels (ops/histclr.py _build_hist_tables_compressed); these tests pin the
compressed kernel against the exact lattice kernel and the full pipeline
against the lattice permutation path.
"""

import copy

import numpy as np
import jax.numpy as jnp
import pytest

from fscl_tpu.models import build_tables
from fscl_tpu.ops.histclr import (
    ROWS_MAX,
    build_hist_points,
    build_hist_tables,
    hist_clr,
)
from fscl_tpu.ops.lattice import build_lattice_pack, clr_lattice
from fscl_tpu.ops.windows import candidate_windows


def _mixed_tables(depths, grid_points=256):
    fsp_list = []
    for n in depths:
        f = 1.0 / np.arange(1, n)
        f = np.concatenate([[0.0], f / f.sum(), [0.0]])
        fsp_list.append(f)
    return build_tables(fsp_list, depths, grid_points=grid_points)


def _mixed_sites(tables, depths, n_sites, extent, seed=3):
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.choice(extent, size=n_sites, replace=False)).astype(
        np.int64
    )
    depth_p = rng.integers(0, len(depths), n_sites)
    folded = rng.random(n_sites) < 0.4
    n_arr = depths[depth_p]
    freq = np.where(
        folded,
        rng.integers(1, np.maximum(n_arr // 2, 1) + 1),
        rng.integers(1, n_arr),
    )
    row = tables.site_rows(depth_p, folded, freq)
    null = tables.null_logl(depth_p, folded, freq)
    return pos, row.astype(np.int64), null


def test_compressed_tables_built_above_rows_max():
    depths = np.arange(20, 45)
    tables = _mixed_tables(depths)
    pos, row, null = _mixed_sites(tables, depths, 2000, 2_000_000)
    rows_used = np.unique(row)
    assert len(rows_used) > ROWS_MAX
    nr = np.zeros(tables.table.shape[0])
    nr[row] = null
    ht = build_hist_tables(
        tables.table, tables.grid_points, nr, rows_used,
        extent_bp=int(pos[-1] - pos[0]) + 1, n_alpha=32,
        site_row_counts=np.bincount(row, minlength=tables.table.shape[0]),
    )
    assert ht.weights is not None
    # the channel count is far below the distinct-row count
    assert ht.n_rows <= 64 < len(rows_used)
    # reconstruction: weights @ pack row block reproduces (table - null)
    # at the packed alpha columns for a sample of rows
    assert ht.weights.shape == (len(rows_used) + 1, ht.n_rows)
    assert np.all(np.asarray(ht.weights)[-1] == 0.0)  # sentinel row


def test_compressed_hist_matches_lattice_kernel():
    """Compressed-mode hist CLR vs the exact per-site lattice kernel."""
    depths = np.arange(20, 45)
    tables = _mixed_tables(depths)
    G = tables.grid_points
    pos, row, null = _mixed_sites(tables, depths, 2000, 2_000_000)
    rows_used = np.unique(row)
    nr = np.zeros(tables.table.shape[0])
    nr[row] = null
    ht = build_hist_tables(
        tables.table, tables.grid_points, nr, rows_used,
        extent_bp=int(pos[-1] - pos[0]) + 1, n_alpha=32,
        site_row_counts=np.bincount(row, minlength=tables.table.shape[0]),
    )
    assert ht.weights is not None

    cand = np.array(
        [111_111, 777_777, 1_500_000, int(pos[40]), int(pos[0]) - 5]
    )
    _, lo, hi = candidate_windows(pos, cand, eval_range=300)
    hp = build_hist_points(ht, pos, cand, eval_range=300, cand_pad=8)
    row_c = ht.row_map[row]
    got = np.asarray(
        hist_clr(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_c.astype(np.int32)),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=4, weights=ht.weights,
        )
    )[: len(cand)]

    pack = jnp.asarray(build_lattice_pack(tables.table, ht.offsets))
    want = np.asarray(
        clr_lattice(
            pack,
            jnp.asarray(row),
            jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(null.astype(np.float32)),
            jnp.asarray(cand.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
            jnp.zeros(len(cand), jnp.int32),
            jnp.asarray(ht.offsets),
            grid_points=G, chunk=5, n_alpha=ht.n_alpha,
        )
    )
    # run-mean interpolation error (as in the exact-mode test at G=256)
    # plus ~1e-3/entry compression residual over <=601-site windows
    np.testing.assert_allclose(got, want, rtol=0.01, atol=1.0)


@pytest.fixture(scope="module")
def mixed_scanned():
    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.models import background_fsp
    from fscl_tpu.sim import simulate_dataset

    rng = np.random.default_rng(17)
    sim = simulate_dataset(
        seed=23, sample_size=50, snp_density=1.0, mb_length=4.0,
        alpha=3e-5, n_sweeps=1,
    )
    n0 = sim["n"]
    # missing genotypes: per-site depth 20..50, freq subsampled
    # hypergeometrically (what a VCF with missing calls yields)
    d = rng.integers(20, n0 + 1, len(sim["pos"]))
    f = rng.hypergeometric(sim["freq"], n0 - sim["freq"], d)
    folded = rng.random(len(d)) < 0.3
    f = np.where(folded, np.minimum(f, d - f), f)
    keep = (f >= 1) & (f <= d - 1)
    pos, f, d, folded = sim["pos"][keep], f[keep], d[keep], folded[keep]
    data = build_snp_data(
        np.full(len(pos), "1"), pos, f, d, folded
    )
    assert len(data.sample_depths) >= 20
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=512)
    data.attach_model(tables)
    cfg = ScanConfig(
        eval_range=1500, small_grid_sp=20_000, large_grid_sp=400_000,
        refine=False,
    )
    result = scan_genome(data, tables, cfg)
    return data, tables, cfg, result


def test_mixed_depth_scan_uses_hist_path(mixed_scanned):
    data, tables, cfg, result = mixed_scanned
    from fscl_tpu.engine.scan import make_scan_hist_tables

    ht = make_scan_hist_tables(data, tables, 128, decimate=1)
    assert ht is not None and ht.weights is not None
    assert len(np.unique(np.asarray(data.row))) > ROWS_MAX


def test_mixed_depth_permutation_hist_vs_lattice(mixed_scanned):
    """The compressed hist permutation agrees with the exact lattice path
    and actually runs on the hist engine."""
    import fscl_tpu.engine.permute as pm
    from fscl_tpu.engine import PermuteConfig, scan_permute

    data, tables, scan_cfg, result0 = mixed_scanned

    def run(use_hist):
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = False
        r.null_clr = [None] * r.n_points
        cfg = PermuteConfig(
            n_permute=48, seed=99, chunk_replicates=16, use_hist=use_hist,
        )
        scan_permute(data, tables, r, scan_cfg, cfg)
        return r

    r_hist = run(True)
    assert (
        pm.last_stats["hist_sharded_dispatches"]
        + pm.last_stats["hist_unsharded_dispatches"]
    ) > 0
    assert pm.last_stats["lattice_dispatches"] == 0
    r_lat = run(False)
    f_hist = r_hist.permute_p / np.maximum(r_hist.permute_n, 1)
    f_lat = r_lat.permute_p / np.maximum(r_lat.permute_n, 1)
    assert np.abs(f_hist - f_lat).mean() < 0.12
    best = np.argmax(r_hist.clr)
    assert r_hist.permute_p[best] <= 3 and r_lat.permute_p[best] <= 3


def test_mixed_depth_deterministic(mixed_scanned):
    import fscl_tpu.engine.permute as pm  # noqa: F401
    from fscl_tpu.engine import PermuteConfig, scan_permute

    data, tables, scan_cfg, result0 = mixed_scanned

    def run():
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = False
        r.null_clr = [None] * r.n_points
        scan_permute(
            data, tables, r, scan_cfg,
            PermuteConfig(n_permute=32, seed=5, chunk_replicates=16),
        )
        return r

    r1, r2 = run(), run()
    np.testing.assert_array_equal(r1.permute_p, r2.permute_p)
    np.testing.assert_array_equal(r1.permute_n, r2.permute_n)

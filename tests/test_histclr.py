"""Histogram/prefix CLR engine vs the exact lattice kernel."""

import numpy as np
import jax.numpy as jnp

from fscl_tpu.ops.histclr import (
    build_hist_points,
    build_hist_tables,
    dense_alpha_offsets,
    hist_clr,
    hist_supported,
)
from fscl_tpu.ops.lattice import build_lattice_pack, clr_lattice
from fscl_tpu.ops.windows import candidate_windows

from tests.test_ops import _mk_data


def _null_row(tables, row, null):
    nr = np.zeros(tables.table.shape[0])
    nr[row] = null
    return nr


def _hist_setup(tables, pos, row, null, n_alpha=32):
    rows_used = np.unique(row)
    nr = _null_row(tables, row, null)
    ht = build_hist_tables(
        tables.table, tables.grid_points, nr, rows_used,
        extent_bp=int(pos[-1] - pos[0]) + 1, n_alpha=n_alpha,
    )
    return ht


def test_hist_matches_lattice_kernel():
    tables, pos, row, null = _mk_data(seed=7)
    G = tables.grid_points
    ht = _hist_setup(tables, pos, row, null, n_alpha=32)
    cand = np.array([111_111, 777_777, 1_500_000, int(pos[40]), int(pos[0]) - 5])
    _, lo, hi = candidate_windows(pos, cand, eval_range=90)

    hp = build_hist_points(ht, pos, cand, eval_range=90, cand_pad=8)
    row_c = ht.row_map[row]
    got = np.asarray(
        hist_clr(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_c.astype(np.int32)),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=4,
        )
    )[: len(cand)]

    pack = jnp.asarray(build_lattice_pack(tables.table, ht.offsets))
    want = np.asarray(
        clr_lattice(
            pack,
            jnp.asarray(row),
            jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(null),
            jnp.asarray(cand.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
            jnp.zeros(len(cand), jnp.int32),
            jnp.asarray(ht.offsets),
            grid_points=G, chunk=5, n_alpha=ht.n_alpha,
        )
    )
    # run-mean interpolation differs from per-site lerp only at second order
    # in the cell width; at this test's coarse G=256 grid cells are 8x wider
    # than production (G=2048), so the bound here is loose — the G=1024 test
    # below shows the quadratic convergence
    np.testing.assert_allclose(got, want, rtol=0.01, atol=0.8)


def test_hist_matches_lattice_kernel_fine_grid():
    from fscl_tpu.models import build_tables

    rng = np.random.default_rng(13)
    n, n_sites = 12, 400
    pos = np.sort(rng.choice(2_000_000, n_sites, replace=False)).astype(np.int64)
    w = 1 / np.arange(1, n)
    freqs = rng.choice(np.arange(1, n), p=w / w.sum(), size=n_sites)
    folded = np.zeros(n_sites, bool)
    fsp = np.zeros(n + 1)
    fsp[1:n] = 1.0 / np.arange(1, n)
    fsp /= fsp.sum()
    tables = build_tables([fsp], [n], grid_points=1024)
    row = tables.site_rows(np.zeros(n_sites, int), folded, freqs)
    null = tables.null_logl(np.zeros(n_sites, int), folded, freqs).astype(
        np.float32
    )
    ht = _hist_setup(tables, pos, row, null, n_alpha=32)
    cand = np.array([333_333, 1_200_000, int(pos[200])])
    _, lo, hi = candidate_windows(pos, cand, eval_range=90)
    hp = build_hist_points(ht, pos, cand, eval_range=90, cand_pad=4)
    got = np.asarray(
        hist_clr(
            ht.t3, hp.bounds, hp.fbar,
            jnp.asarray(ht.row_map[row].astype(np.int32)),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=4,
        )
    )[: len(cand)]
    pack = jnp.asarray(build_lattice_pack(tables.table, ht.offsets))
    want = np.asarray(
        clr_lattice(
            pack,
            jnp.asarray(row), jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(null), jnp.asarray(cand.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)), jnp.asarray(hi.astype(np.int32)),
            jnp.zeros(len(cand), jnp.int32), jnp.asarray(ht.offsets),
            grid_points=1024, chunk=3, n_alpha=ht.n_alpha,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.08)


def test_hist_empty_window_and_padding():
    tables, pos, row, null = _mk_data(seed=9, n_sites=120)
    ht = _hist_setup(tables, pos, row, null, n_alpha=8)
    cand = np.array([500_000])
    hp = build_hist_points(ht, pos, cand, eval_range=50, cand_pad=8)
    row_c = ht.row_map[row]
    # pad the site axis: pad rows get id >= n_rows -> vanish from one-hot
    row_pad = np.full(200, ht.n_rows, dtype=np.int32)
    row_pad[: len(row_c)] = row_c
    out = np.asarray(
        hist_clr(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_pad),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=8,
        )
    )
    assert out.shape == (8, 8)
    assert np.all(np.isfinite(out[0]))
    # padded candidates have zero-width runs everywhere -> CLR exactly 0
    np.testing.assert_array_equal(out[1:], 0.0)


def test_hist_dense_alpha_max_dominates_staged_search():
    from fscl_tpu.ops.lattice import LatticeTables, two_stage_lattice_max

    tables, pos, row, null = _mk_data(seed=11)
    ht = _hist_setup(tables, pos, row, null, n_alpha=128)
    cand = np.arange(150_000, 1_900_000, 120_000)
    _, lo, hi = candidate_windows(pos, cand, eval_range=90)
    hp = build_hist_points(ht, pos, cand, eval_range=90, cand_pad=16)
    row_c = ht.row_map[row]
    dense = np.asarray(
        hist_clr(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_c.astype(np.int32)),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=16,
        )
    )[: len(cand)].max(axis=1)

    lt = LatticeTables(tables.table, tables.grid_points)
    staged, _ = two_stage_lattice_max(
        lt,
        jnp.asarray(row), jnp.asarray(pos.astype(np.int32)),
        jnp.asarray(null), jnp.asarray(cand.astype(np.int32)),
        jnp.asarray(lo.astype(np.int32)), jnp.asarray(hi.astype(np.int32)),
        chunk=4,
    )
    staged = np.asarray(staged)
    # dense 128-alpha grid reaches at least the staged zoom's maxima (its
    # pitch is ~2 cells at G=256, comparable to the staged final pitch)
    assert np.all(dense >= staged - 0.25)


def test_hist_supported_gate():
    assert hist_supported(50, 100_000)
    # mixed-depth row counts above ROWS_MAX are supported via compression
    assert hist_supported(4000, 100_000)
    assert not hist_supported(20_000, 100_000)
    assert not hist_supported(50, 10_000_000)


def test_hist_clr_reps_matches_per_replicate_hist_clr():
    """The replicate-stacked kernel equals hist_clr run per replicate, and
    the int32 prefix path (sites > 32767) equals the int16 path."""
    from fscl_tpu.ops.histclr import hist_clr_reps

    tables, pos, row, null = _mk_data(seed=11)
    ht = _hist_setup(tables, pos, row, null, n_alpha=16)
    cand = np.array([111_111, 777_777, 1_500_000, int(pos[40])])
    hp = build_hist_points(ht, pos, cand, eval_range=90, cand_pad=4)
    row_c = ht.row_map[row].astype(np.int32)

    rng = np.random.default_rng(3)
    P = 5
    row_rep = np.stack([rng.permutation(row_c) for _ in range(P)])
    got = np.asarray(
        hist_clr_reps(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_rep),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=4,
        )
    )[:, : len(cand)]
    want = np.stack([
        np.asarray(
            hist_clr(
                ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_rep[p]),
                n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
                c_sub=4,
            )
        )[: len(cand)]
        for p in range(P)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # int32 path: pad the site axis past the int16 threshold with
    # out-of-range rows (they vanish from the one-hot) — results identical
    W_big = 33000
    row_big = np.full((P, W_big), ht.n_rows, dtype=np.int32)
    row_big[:, : row_rep.shape[1]] = row_rep
    got_big = np.asarray(
        hist_clr_reps(
            ht.t3, hp.bounds, hp.fbar, jnp.asarray(row_big),
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=4,
        )
    )[:, : len(cand)]
    np.testing.assert_allclose(got_big, got, rtol=1e-5, atol=1e-4)

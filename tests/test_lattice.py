"""Lattice kernel correctness: must match the exact kernel at lattice alphas."""

import numpy as np
import jax.numpy as jnp

from fscl_tpu import LOG_AD_MIN
from fscl_tpu.ops.clr import clr_grid, two_stage_alpha_max
from fscl_tpu.ops.lattice import (
    LatticeTables,
    build_lattice_pack,
    clr_lattice,
    coarse_lattice_offsets,
    fine_lattice_offsets,
    lattice_step,
    two_stage_lattice_max,
)
from fscl_tpu.ops.windows import candidate_windows

from tests.test_ops import _mk_data


def _args(tables, pos, row, null, cand, lo, hi):
    return (
        jnp.asarray(row),
        jnp.asarray(pos.astype(np.int32)),
        jnp.asarray(null),
        jnp.asarray(cand.astype(np.int32)),
        jnp.asarray(lo.astype(np.int32)),
        jnp.asarray(hi.astype(np.int32)),
    )


def test_lattice_matches_exact_kernel():
    tables, pos, row, null = _mk_data(seed=2)
    G = tables.grid_points
    cand = np.array([111_111, 777_777, 1_500_000, int(pos[40])])
    ns, lo, hi = candidate_windows(pos, cand, eval_range=90)
    step = lattice_step(G)
    m = coarse_lattice_offsets(G)
    la = (LOG_AD_MIN + m * step).astype(np.float32)

    pack = jnp.asarray(build_lattice_pack(tables.table, m))
    got = np.asarray(
        clr_lattice(
            pack, *_args(tables, pos, row, null, cand, lo, hi),
            jnp.zeros(len(cand), jnp.int32), jnp.asarray(m),
            grid_points=G, chunk=3, n_alpha=len(m),
        )
    )
    want = np.asarray(
        clr_grid(
            jnp.asarray(tables.table.reshape(-1)),
            *_args(tables, pos, row, null, cand, lo, hi),
            jnp.asarray(la),
            grid_points=G, chunk=3,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_lattice_fine_stage_with_base_offset():
    tables, pos, row, null = _mk_data(seed=4)
    G = tables.grid_points
    cand = np.array([500_000, 900_000])
    ns, lo, hi = candidate_windows(pos, cand, eval_range=60)
    step = lattice_step(G)
    m_rel = fine_lattice_offsets(G)
    m_base = np.array([100, 180], dtype=np.int32)

    pack = jnp.asarray(build_lattice_pack(tables.table, m_rel))
    got = np.asarray(
        clr_lattice(
            pack, *_args(tables, pos, row, null, cand, lo, hi),
            jnp.asarray(m_base), jnp.asarray(m_rel),
            grid_points=G, chunk=2, n_alpha=len(m_rel),
        )
    )
    # exact kernel at the same absolute alphas, clamped like the pack build
    m_abs = np.clip(m_base[:, None] + m_rel[None, :], 0, G - 1)
    la = (LOG_AD_MIN + m_abs * step).astype(np.float32)
    want = np.asarray(
        clr_grid(
            jnp.asarray(tables.table.reshape(-1)),
            *_args(tables, pos, row, null, cand, lo, hi),
            jnp.asarray(la),
            grid_points=G, chunk=2, paired_alpha=True,
        )
    )
    # rows where m_base + m_rel clamps differ in mask semantics (x > MAX is
    # masked in the lattice kernel via unclamped offsets) — compare unclamped
    inside = (m_base[:, None] + m_rel[None, :] >= 0) & (
        m_base[:, None] + m_rel[None, :] <= G - 1
    )
    np.testing.assert_allclose(got[inside], want[inside], rtol=2e-4, atol=2e-3)


def test_two_stage_lattice_close_to_exact_two_stage():
    tables, pos, row, null = _mk_data(seed=5)
    G = tables.grid_points
    cand = np.arange(100_000, 1_900_000, 150_000)
    ns, lo, hi = candidate_windows(pos, cand, eval_range=90)
    lt = LatticeTables(tables.table, G)
    clr_l, la_l = two_stage_lattice_max(
        lt, *_args(tables, pos, row, null, cand, lo, hi), chunk=4
    )
    clr_e, la_e = two_stage_alpha_max(
        jnp.asarray(tables.table.reshape(-1)),
        *_args(tables, pos, row, null, cand, lo, hi),
        grid_points=G, chunk=4,
    )
    # same search strategy on a slightly different alpha sampling: maxima
    # must agree closely
    np.testing.assert_allclose(np.asarray(clr_l), np.asarray(clr_e), rtol=0.02, atol=0.05)

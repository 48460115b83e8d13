"""Lattice-batched CLR kernel — the fast path for scan and permutation.

Motivation (measured on v5e): XLA/Mosaic gathers issue at ~70M ops/s
regardless of index locality, so the naive kernel (one 2-element gather per
(site, position, alpha)) is gather-bound at CPU-like speed.  The fix is
exact, not approximate: **snap the alpha grid to the table's log_ad lattice**.
With lalpha = m * step, the interpolation cell index becomes

    i(x) = floor((logd - LOG_AD_MIN)/step) + m

i.e. the alpha offset m is an integer SHIFT of an alpha-independent index,
and the lerp fraction is alpha-independent.  Pre-shifting the table per
lattice offset (T3[r, i, a] = table[r, clip(i + m_a)]) turns the whole
(site, position, alpha-grid) evaluation into ONE wide gather per (site,
position): both lerp endpoints for ALL alpha values are fetched as one
contiguous [2*A] row.  Measured: ~70M wide-gathers/s -> effective site-alpha
evals scale with A for free.

The alpha values are therefore quantized to multiples of step = 24/(G-1)
(~0.012 at G=2048, i.e. ~1% in alpha) — far finer than the search grid pitch
(0.32); the reference's own alpha search only localizes to ~0.3.  The exact
arbitrary-alpha kernel (clr.py) remains for parity tests against the C
binary's reported alpha values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import LOG_AD_MAX, LOG_AD_MIN

N_COARSE = 11  # sm-search.c:276-282
N_FINE = 16  # 15 C fine points + re-evaluation of the winner


def lattice_step(grid_points):
    return (LOG_AD_MAX - LOG_AD_MIN) / (grid_points - 1)


def coarse_lattice_offsets(grid_points):
    """Integer lattice offsets approximating the C coarse alpha grid."""
    step = lattice_step(grid_points)
    coarse = np.linspace(LOG_AD_MIN, LOG_AD_MAX, N_COARSE)
    return np.round((coarse - LOG_AD_MIN) / step).astype(np.int32)


def fine_lattice_offsets(grid_points):
    """Relative lattice offsets covering the +-coarse_step fine bracket."""
    step = lattice_step(grid_points)
    fstep = 2.0 * (LOG_AD_MAX - LOG_AD_MIN) / (N_COARSE - 1) / 15.0
    unit = max(int(round(fstep / step)), 1)
    j = np.arange(N_FINE) - N_FINE // 2
    return (j * unit).astype(np.int32)


def ultra_lattice_offsets(grid_points):
    """Third-stage offsets: +-1 fine pitch at quarter resolution.

    The C's alpha search bottoms out at ~0.32 in log-alpha
    (sm-search.c:289-295); this extra zoom reaches ~0.08, so per-point maxima
    dominate the reference's rather than depending on grid phase."""
    step = lattice_step(grid_points)
    fstep = 2.0 * (LOG_AD_MAX - LOG_AD_MIN) / (N_COARSE - 1) / 15.0
    unit = max(int(round(fstep / step)) // 4, 1)
    j = np.arange(N_FINE) - N_FINE // 2
    return (j * unit).astype(np.int32)


def build_lattice_pack(table, offsets):
    """T3pair [R*G, 2A] f32: interleaved lerp pairs for each lattice offset.

    T3pair[r*G + i, 2a]   = table[r, clip(i + offsets[a])]
    T3pair[r*G + i, 2a+1] = table[r, clip(i + offsets[a] + 1)]
    Entries past the grid end are masked out at eval time (x > LOG_AD_MAX),
    entries below clamp to the left edge (evaluation at x < LOG_AD_MIN uses
    the x = LOG_AD_MIN value, like the C spline's interval clamp).
    """
    R, G = table.shape
    A = len(offsets)
    i = np.arange(G)[:, None]  # [G, 1]
    idx0 = np.clip(i + offsets[None, :], 0, G - 1)  # [G, A]
    idx1 = np.clip(i + offsets[None, :] + 1, 0, G - 1)
    out = np.empty((R, G, 2 * A), dtype=np.float32)
    out[:, :, 0::2] = table[:, idx0]
    out[:, :, 1::2] = table[:, idx1]
    return out.reshape(R * G, 2 * A)


@functools.partial(jax.jit, static_argnames=("grid_points", "chunk", "n_alpha"))
def clr_lattice(
    t3pair,
    row,
    pos,
    null,
    cand_pos,
    lo,
    hi,
    m_base,
    m_rel,
    *,
    grid_points,
    chunk=8,
    n_alpha=N_COARSE,
):
    """CLR for every (candidate, lattice-alpha) pair.

    t3pair: [R*G, 2A] from build_lattice_pack.
    m_base: [P] i32 per-candidate base lattice offset (0 for the coarse
            stage; the coarse winner for the fine stage).
    m_rel:  [A] i32 the offsets the pack was built with.
    Returns clr [P, A]; lalpha(p,a) = LOG_AD_MIN + (m_base + m_rel) * step.
    """
    W = pos.shape[0]
    P = cand_pos.shape[0]
    G = grid_points
    A = n_alpha
    inv_step = (G - 1) / (LOG_AD_MAX - LOG_AD_MIN)
    w_idx = jnp.arange(W, dtype=jnp.int32)

    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    cand_p = jnp.pad(cand_pos, (0, pad)).reshape(n_chunks, chunk)
    lo_p = jnp.pad(lo, (0, pad), constant_values=1).reshape(n_chunks, chunk)
    hi_p = jnp.pad(hi, (0, pad), constant_values=0).reshape(n_chunks, chunk)
    mb_p = jnp.pad(m_base, (0, pad)).reshape(n_chunks, chunk)

    row_base = row.astype(jnp.int32) * G  # [W]
    m_rel_f = m_rel.astype(jnp.float32)[None, None, :]  # [1, 1, A]

    def one_chunk(carry, args):
        cpos, clo, chi, cmb = args
        dist = jnp.abs(pos[None, :] - cpos[:, None])  # [C, W]
        logd = jnp.log(jnp.maximum(dist, 1).astype(jnp.float32))
        # x(a) = logd + LOG_AD_MIN + (m_base + m_rel_a)*step, so the exact
        # cell coordinate relative to the pack is u = logd/step + m_base,
        # shared across alpha (m_rel_a is baked into the pack columns).
        u = logd * inv_step + cmb[:, None].astype(jnp.float32)
        i0 = jnp.clip(u.astype(jnp.int32), 0, G - 1)
        frac = jnp.clip(u - i0.astype(jnp.float32), 0.0, 1.0)
        vals = jnp.take(t3pair, row_base[None, :] + i0, axis=0)  # [C, W, 2A]
        v0 = vals[:, :, 0::2]
        v1 = vals[:, :, 1::2]
        y = v0 + (v1 - v0) * frac[:, :, None]  # [C, W, A]
        in_win = (w_idx[None, :] >= clo[:, None]) & (w_idx[None, :] <= chi[:, None])
        # x <= LOG_AD_MAX  <=>  u + m_rel <= G - 1
        mask = in_win[:, :, None] & (u[:, :, None] + m_rel_f <= G - 1)
        contrib = jnp.where(mask, y - null[None, :, None], 0.0)
        return carry, 2.0 * jnp.sum(contrib, axis=1)

    _, out = jax.lax.scan(one_chunk, None, (cand_p, lo_p, hi_p, mb_p))
    return out.reshape(n_chunks * chunk, A)[:P]


class LatticeTables:
    """Device-resident lattice packs + offset vectors for the three stages."""

    def __init__(self, table_np, grid_points):
        self.grid_points = grid_points
        self.step = lattice_step(grid_points)
        self.m_coarse = coarse_lattice_offsets(grid_points)
        self.m_fine = fine_lattice_offsets(grid_points)
        self.m_ultra = ultra_lattice_offsets(grid_points)
        self.pack_coarse = jnp.asarray(build_lattice_pack(table_np, self.m_coarse))
        self.pack_fine = jnp.asarray(build_lattice_pack(table_np, self.m_fine))
        self.pack_ultra = jnp.asarray(build_lattice_pack(table_np, self.m_ultra))
        self.m_coarse_dev = jnp.asarray(self.m_coarse)
        self.m_fine_dev = jnp.asarray(self.m_fine)
        self.m_ultra_dev = jnp.asarray(self.m_ultra)


@functools.partial(jax.jit, static_argnames=("grid_points", "chunk"))
def _two_stage_impl(
    pack_coarse, pack_fine, m_coarse, m_fine, row, pos, null, cand, lo, hi,
    *, grid_points, chunk, pack_ultra=None, m_ultra=None,
):
    G = grid_points
    zeros = jnp.zeros(cand.shape[0], dtype=jnp.int32)
    p_idx = jnp.arange(cand.shape[0])
    clr_c = clr_lattice(
        pack_coarse, row, pos, null, cand, lo, hi, zeros, m_coarse,
        grid_points=G, chunk=chunk, n_alpha=m_coarse.shape[0],
    )  # [P, Ac]
    ic = jnp.argmax(clr_c, axis=1)
    m_best = m_coarse[ic]
    best = clr_c[p_idx, ic]

    def refine(pack, m_rel, m_best, best):
        clr_f = clr_lattice(
            pack, row, pos, null, cand, lo, hi, m_best, m_rel,
            grid_points=G, chunk=chunk, n_alpha=m_rel.shape[0],
        )
        i_f = jnp.argmax(clr_f, axis=1)
        best_f = clr_f[p_idx, i_f]
        use = best_f > best
        return (
            jnp.where(use, jnp.clip(m_best + m_rel[i_f], 0, G - 1), m_best),
            jnp.where(use, best_f, best),
        )

    m_best, best = refine(pack_fine, m_fine, m_best, best)
    if pack_ultra is not None:
        m_best, best = refine(pack_ultra, m_ultra, m_best, best)
    step = (LOG_AD_MAX - LOG_AD_MIN) / (G - 1)
    la = LOG_AD_MIN + m_best.astype(jnp.float32) * step
    return best, la


def two_stage_lattice_max(lt: LatticeTables, row, pos, null, cand, lo, hi, chunk=8):
    """Max CLR over the three-stage lattice alpha search; (clr, lalpha) [P]."""
    return _two_stage_impl(
        lt.pack_coarse, lt.pack_fine, lt.m_coarse_dev, lt.m_fine_dev,
        row, pos, null, cand, lo, hi,
        grid_points=lt.grid_points, chunk=chunk,
        pack_ultra=lt.pack_ultra, m_ultra=lt.m_ultra_dev,
    )


@functools.partial(jax.jit, static_argnames=("grid_points", "chunk"))
def _seeded_impl(
    pack_fine, pack_ultra, m_fine, m_ultra, row, pos, null, cand, lo, hi,
    m_seed, *, grid_points, chunk,
):
    G = grid_points
    p_idx = jnp.arange(cand.shape[0])
    m_best = jnp.clip(m_seed, 0, G - 1)
    best = jnp.full(cand.shape[0], -jnp.inf, jnp.float32)

    def refine(pack, m_rel, m_best, best):
        clr_f = clr_lattice(
            pack, row, pos, null, cand, lo, hi, m_best, m_rel,
            grid_points=G, chunk=chunk, n_alpha=m_rel.shape[0],
        )
        i_f = jnp.argmax(clr_f, axis=1)
        best_f = clr_f[p_idx, i_f]
        use = best_f > best
        return (
            jnp.where(use, jnp.clip(m_best + m_rel[i_f], 0, G - 1), m_best),
            jnp.where(use, best_f, best),
        )

    m_best, best = refine(pack_fine, m_fine, m_best, best)
    m_best, best = refine(pack_ultra, m_ultra, m_best, best)
    step = (LOG_AD_MAX - LOG_AD_MIN) / (G - 1)
    la = LOG_AD_MIN + m_best.astype(jnp.float32) * step
    return best, la


def seeded_lattice_max(lt: LatticeTables, row, pos, null, cand, lo, hi,
                       m_seed, chunk=8):
    """Fine+ultra lattice alpha zoom seeded at per-candidate lattice offsets.

    For candidates whose approximate argmax alpha is already known (the
    scan's dec-1 tie-resolution stage provides it to ~the selection grid
    pitch), the coarse alpha stage is redundant: the fine bracket covers
    +-8 fine pitches (~2.6 log-alpha units) around the seed, then ultra
    zooms to ~0.08.  One third less window-gather work than the
    three-stage search, with identical results whenever the true argmax
    lies within the fine bracket of the seed.
    """
    return _seeded_impl(
        lt.pack_fine, lt.pack_ultra, lt.m_fine_dev, lt.m_ultra_dev,
        row, pos, null, cand, lo, hi, m_seed,
        grid_points=lt.grid_points, chunk=chunk,
    )

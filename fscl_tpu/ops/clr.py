"""Batched composite-likelihood-ratio (CLR) evaluation — the hot kernel.

Reference semantics (/root/reference/sm-search.c:85-150, 269-300): for a
candidate sweep position and log-alpha, walk the site window outward from the
nearest SNP accumulating

    log P(freq_w | log_ad = log|pos_w - sweep_pos| + lalpha) - null_logl_w

stopping once log_ad > LOG_AD_MAX (sites beyond contribute exactly their null
likelihood); CLR = 2 * (sm_logl - null_logl) maximized over a two-stage
lalpha grid (11 coarse steps over [-20, 4], then 14 fine steps inside the
winning bracket, sm-search.c:276-295).

TPU-native redesign (SURVEY.md section 7): the data-dependent outward walk
becomes a dense masked evaluation.  Distances increase monotonically away
from the candidate, so the early-exit condition ``log_ad <= LOG_AD_MAX`` is
exactly a contiguous mask — a `where` instead of a `break`.  All (candidate
position x alpha) pairs evaluate in one fused batch: elementwise VPU work
plus one 2-element table gather per (site, candidate, alpha), reduced over
sites.  No scalar control flow, static shapes throughout.

Conventions kept from the reference:
  * distance 0 is treated as 1 bp (log_table[0] = 0 hack, sm-search.c:21-26);
    we clamp distance to >= 1 instead of bumping the sweep position off SNPs
    (scan-chromosome.c:66-71) — identical for the colliding SNP, and a <=1 bp
    shift of the evaluation point for the rest of the window.
  * the window is an inclusive site-index range [lo, hi] per candidate,
    computed by ops.windows.candidate_windows with the reference's
    chromosome-edge clamping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import LOG_AD_MAX, LOG_AD_MIN

# C alpha grid: step (MAX-MIN)/10, loop lalpha = MIN; lalpha <= MAX
# (sm-search.c:276-282) -> 11 coarse values.
N_COARSE = 11
# fine stage: 15 subdivisions of the winning +-step bracket, evaluated at
# left + k*fstep for k = 1..14 (sm-search.c:289-295).
N_FINE = 14


def coarse_alpha_grid() -> np.ndarray:
    return np.linspace(LOG_AD_MIN, LOG_AD_MAX, N_COARSE).astype(np.float32)


def fine_alpha_grids(best_la):
    """Per-candidate fine lalpha grids around the coarse winner.

    Mirrors sm-search.c:284-295: bracket = best +- coarse_step clamped to the
    domain, fstep = bracket_width / 15, values at left + k*fstep, k=1..14.
    best_la: [P] -> returns [P, N_FINE].
    """
    step = (LOG_AD_MAX - LOG_AD_MIN) / (N_COARSE - 1)
    left = jnp.maximum(best_la - step, LOG_AD_MIN)
    right = jnp.minimum(best_la + step, LOG_AD_MAX)
    fstep = (right - left) / 15.0
    k = jnp.arange(1, N_FINE + 1, dtype=jnp.float32)
    return left[:, None] + k[None, :] * fstep[:, None]


def _interp_rows(table, flat_base, x, log_ad_min, inv_step, grid_points):
    """Linear interpolation of table rows at x.

    table: [R, G] flattened to [R*G]; flat_base: row*G broadcastable to x's
    shape; x: query log_ad values.  Clamps to the grid ends (the C spline
    clamps its interval index the same way, sm-spline.c:52-54).
    """
    u = (x - log_ad_min) * inv_step
    i = jnp.clip(u.astype(jnp.int32), 0, grid_points - 2)
    frac = jnp.clip(u - i.astype(x.dtype), 0.0, 1.0)
    idx = flat_base + i
    v0 = jnp.take(table, idx, axis=0)
    v1 = jnp.take(table, idx + 1, axis=0)
    return v0 * (1.0 - frac) + v1 * frac


@functools.partial(
    jax.jit, static_argnames=("grid_points", "chunk", "paired_alpha")
)
def clr_grid(
    table_flat,
    row,
    pos,
    null,
    cand_pos,
    lo,
    hi,
    lalpha,
    *,
    grid_points,
    chunk=8,
    paired_alpha=False,
):
    """CLR for every (candidate, alpha) pair.

    Args:
      table_flat: [R*G] f32 flattened log-prob table.
      row:  [W] i32 per-site table row.
      pos:  [W] i32 sorted bp positions (padded sites excluded via lo/hi).
      null: [W] f32 per-site null log-likelihood.
      cand_pos: [P] i32 candidate sweep positions.
      lo, hi:   [P] i32 inclusive window bounds (site indices); lo > hi marks
                an invalid/padded candidate.
      lalpha: [A] f32 shared grid, or [P, A] per-candidate (paired_alpha).
    Returns:
      clr [P, A] f32 = 2 * sum_w masked (model - null) contributions.
    """
    W = pos.shape[0]
    P = cand_pos.shape[0]
    inv_step = (grid_points - 1) / (LOG_AD_MAX - LOG_AD_MIN)
    flat_base = row.astype(jnp.int32) * grid_points  # [W]
    w_idx = jnp.arange(W, dtype=jnp.int32)

    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    cand_p = jnp.pad(cand_pos, (0, pad))
    lo_p = jnp.pad(lo, (0, pad), constant_values=1)
    hi_p = jnp.pad(hi, (0, pad), constant_values=0)
    if paired_alpha:
        la_p = jnp.pad(lalpha, ((0, pad), (0, 0)))
        la_chunks = la_p.reshape(n_chunks, chunk, -1)
    else:
        la_chunks = jnp.broadcast_to(
            lalpha[None, None, :], (n_chunks, chunk, lalpha.shape[0])
        )

    def one_chunk(carry, args):
        cpos, clo, chi, cla = args  # [C], [C], [C], [C, A]
        dist = jnp.abs(pos[None, :] - cpos[:, None])  # [C, W] i32
        logd = jnp.log(jnp.maximum(dist, 1).astype(jnp.float32))
        x = logd[:, :, None] + cla[:, None, :]  # [C, W, A]
        in_win = (w_idx[None, :] >= clo[:, None]) & (
            w_idx[None, :] <= chi[:, None]
        )  # [C, W]
        mask = in_win[:, :, None] & (x <= LOG_AD_MAX)
        y = _interp_rows(
            table_flat,
            flat_base[None, :, None],
            x,
            LOG_AD_MIN,
            inv_step,
            grid_points,
        )
        contrib = jnp.where(mask, y - null[None, :, None], 0.0)
        return carry, 2.0 * jnp.sum(contrib, axis=1)  # [C, A]

    _, out = jax.lax.scan(
        one_chunk,
        None,
        (
            cand_p.reshape(n_chunks, chunk),
            lo_p.reshape(n_chunks, chunk),
            hi_p.reshape(n_chunks, chunk),
            la_chunks,
        ),
    )
    return out.reshape(n_chunks * chunk, -1)[:P]


@functools.partial(jax.jit, static_argnames=("grid_points", "chunk"))
def two_stage_alpha_max(
    table_flat, row, pos, null, cand_pos, lo, hi, *, grid_points, chunk=8
):
    """Max CLR over the reference's two-stage lalpha search, per candidate.

    Returns (clr [P], lalpha [P]) — the best CLR over 11 coarse + 14 fine
    lalpha values (sm-search.c:269-300 semantics, batched over candidates).
    """
    coarse = jnp.asarray(coarse_alpha_grid())
    clr_c = clr_grid(
        table_flat, row, pos, null, cand_pos, lo, hi, coarse,
        grid_points=grid_points, chunk=chunk,
    )  # [P, 11]
    i_best = jnp.argmax(clr_c, axis=1)
    la_best = coarse[i_best]
    fine = fine_alpha_grids(la_best)  # [P, 14]
    clr_f = clr_grid(
        table_flat, row, pos, null, cand_pos, lo, hi, fine,
        grid_points=grid_points, chunk=chunk, paired_alpha=True,
    )  # [P, 14]
    all_clr = jnp.concatenate([clr_c, clr_f], axis=1)
    all_la = jnp.concatenate(
        [jnp.broadcast_to(coarse[None, :], clr_c.shape), fine], axis=1
    )
    j = jnp.argmax(all_clr, axis=1)
    p_idx = jnp.arange(all_clr.shape[0])
    return all_clr[p_idx, j], all_la[p_idx, j]

"""Pallas TPU kernel: replicate-stacked one-hot prefix sums.

The histogram CLR engine (ops/histclr.py) spends a fixed ~2.4 ms per
permutation dispatch building

    ps[w, p*R + r] = #{w' <= w : row_p(w') == r}     [W, P*R] int

via XLA one-hot + cumsum (a log-depth scan with ~2*log2(W) materialized
[W, P*R] passes).  This kernel fuses the one-hot compare and the running
sum into one pass, doing the within-tile cumulative sum as ONE
lower-triangular f32 matmul on the MXU (for a [T, L] tile:
tril(ones(T, T)) @ onehot — exact in f32 for counts < 2^24) plus a carry
row kept in VMEM scratch across the sequential site grid.  HBM traffic is
the theoretical minimum: read the expanded row ids once, write the
prefix rows once.

Layout contract: the caller pre-expands row ids to one column per
(replicate, row) pair — rows_expanded[w, p*R + r] = row_p(w) — so the
kernel is a pure lane-local compare against (lane % R); no in-kernel
reshape or transpose (Mosaic handles those poorly).  Lanes (P*R) must be
a multiple of 128; sites W a multiple of the 512-row tile.  Wide lane
counts block over a second grid axis (TILE_L lanes per step), so any
width fits VMEM; output is int16 or int32 (int32 for chromosomes longer
than 32767 sites, where prefix values overflow int16).  The scan path's
single-replicate builds (8 lanes) stay on the XLA fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas needs a TPU-capable jaxlib; callers gate on ps_supported
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

TILE_W = 512  # sites per grid step (tril matmul is [512, 512] @ [512, L])
TILE_L = 2048  # lanes per grid step (bounds VMEM: ~1 MB oh + 4 MB f32 sum)


def ps_supported(w_pad, n_lanes):
    # w_pad < 2^24: the kernel accumulates counts in f32 (tril matmul +
    # f32 carry), exact only below 2^24 — longer chromosomes take the
    # exact XLA int32 cumsum fallback.
    return (
        _HAVE_PALLAS
        and w_pad % TILE_W == 0
        and w_pad < (1 << 24)
        and n_lanes % 128 == 0
        and (n_lanes <= TILE_L or n_lanes % TILE_L == 0)
    )


def _kernel(n_rows, out_dtype, tiles_per_seg, rows_ref, tril_ref, out_ref,
            carry_ref):
    j = pl.program_id(1)  # site-tile index (innermost grid axis)

    # segmented mode: the running sum resets at every segment boundary
    # (tiles_per_seg site-tiles per segment), so stacked chromosomes get
    # independent prefix streams from one kernel launch
    reset = (j == 0) if tiles_per_seg is None else (j % tiles_per_seg == 0)

    @pl.when(reset)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # matmul input precision: integer one-hot streams (0/1 values — exact
    # in bfloat16) run the tril contraction at the ~4x bf16 MXU rate; the
    # ACCUMULATION stays f32 (preferred_element_type), so counts are exact
    # below 2^24 exactly as before.  f32 weight streams (compressed mode)
    # keep f32 inputs — their values are not bf16-representable.
    # NOTE: a bf16-input variant of this contraction (exact for 0/1
    # one-hots with the f32 accumulation) was tried and REVERTED: it
    # measured neutral on the tunnel v5e (the kernel is memory-path
    # bound, bench/micro_thin.py) and Mosaic miscompiles the bf16 select
    # at some lane widths ("Invalid relayout ... vector<512x256xi1>").
    if n_rows is None:  # input is already a one-hot (i8) or f32 weights
        oh = rows_ref[...].astype(jnp.float32)
    else:
        lanes = rows_ref.shape[1]
        r_id = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_W, lanes), 1
        ) % n_rows
        oh = jnp.where(rows_ref[...] == r_id, 1.0, 0.0)
    cs = jax.lax.dot_general(
        tril_ref[...], oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if carry_ref.shape[0] == 2:
        # float mode: two-limb compensated (Kahan) carry — the sequential
        # tile-total additions would otherwise accumulate O(n_tiles * eps *
        # |prefix|) error on large-magnitude weight streams; the limbs keep
        # the carry error at ~1 ulp independent of segment length
        hi = carry_ref[0:1, :]
        lo = carry_ref[1:2, :]
        total = cs + hi + lo
        tot = cs[TILE_W - 1 : TILE_W, :]
        s = hi + tot
        bv = s - hi
        err = (hi - (s - bv)) + (tot - bv)
        carry_ref[0:1, :] = s
        carry_ref[1:2, :] = lo + err
    else:
        total = cs + carry_ref[...]
        carry_ref[...] = total[TILE_W - 1 : TILE_W, :]
    out_ref[...] = total.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "out_dtype", "reset_every",
                              "interpret")
)
def onehot_prefix_sums(rows_expanded, *, n_rows=None, out_dtype=jnp.int16,
                       reset_every=None, interpret=False):
    """Inclusive prefix sums of per-lane one-hots; [W, L] -> [W, L] int.

    With n_rows set, rows_expanded[w, p*R + r] holds row_p(w) as i32 (the
    caller repeats each replicate's row-id column R times) and lane l
    counts sites w' <= w with row == l % n_rows in replicate l // n_rows.
    With n_rows=None, rows_expanded is ALREADY the 0/1 one-hot (i8) — the
    permutation driver produces it directly as a group-table row gather,
    which runs at the TPU's row-gather rate instead of the ~3x slower
    per-element rate.  Exclusive-prefix callers prepend a zero row (as
    with the XLA cumsum path).

    reset_every: segmented mode — the running sum restarts every
    ``reset_every`` sites (must be a multiple of TILE_W), giving each
    stacked segment an independent prefix stream in one launch.
    """
    W, L = rows_expanded.shape
    assert W % TILE_W == 0 and L % 128 == 0
    tiles_per_seg = None
    if reset_every is not None:
        assert reset_every % TILE_W == 0 and W % reset_every == 0
        tiles_per_seg = reset_every // TILE_W
    tile_l = L if L <= TILE_L else TILE_L
    assert L % tile_l == 0
    carry_rows = 2 if jnp.issubdtype(jnp.dtype(out_dtype), np.floating) else 1
    tril = jnp.asarray(np.tril(np.ones((TILE_W, TILE_W), np.float32)))
    return pl.pallas_call(
        functools.partial(_kernel, n_rows, out_dtype, tiles_per_seg),
        out_shape=jax.ShapeDtypeStruct((W, L), out_dtype),
        # lanes on the OUTER axis, sites inner: the carry row persists
        # across the sequential site walk of each lane block
        grid=(L // tile_l, W // TILE_W),
        in_specs=[
            pl.BlockSpec((TILE_W, tile_l), lambda i, j: (j, i)),
            pl.BlockSpec((TILE_W, TILE_W), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_W, tile_l), lambda i, j: (j, i)),
        scratch_shapes=[pltpu.VMEM((carry_rows, tile_l), jnp.float32)],
        interpret=interpret,
    )(rows_expanded, tril)

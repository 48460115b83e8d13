"""Histogram/prefix-sum CLR engine — run-length formulation of the hot loop.

Motivation.  The lattice kernel (ops/lattice.py) issues one wide table gather
per (site, candidate); on this TPU gathers cap at ~286M rows/s, and the
permutation phase is gather-rate-bound.  But permutations shuffle only SNP
*attributes* — positions never move (scan-chromosome.c:336-389: the block
permutation swaps obs_freq/depth/folded/null, keeping pos fixed).  So all
distance-derived quantities are invariant across replicates and can be
precomputed once per candidate set:

For candidate c, the table coordinate of site w at lattice alpha offset q is

    t = u(c,w) + q,   u = log|pos_w - c| / step   (alpha-independent!)

Sites sorted by position map to *contiguous runs* per integer cell i of u on
each side of c.  The run boundaries B[c, side, i] (indices into the sorted
site array) and the per-run mean-position interpolation fractions fbar are
computed ONCE on the host (int64-exact prefix sums).  Each replicate then
needs only

  1. one cumulative sum of site-row one-hots  PS[w, r]        (VPU, cheap)
  2. one [R]-wide row gather per (candidate, cell)  PS[B]     (~8x fewer
     gathers than per-site when windows exceed ~2 cells/site)
  3. ONE dense matmul  [C, 2*NC*R] @ [2*NC*R, A]              (MXU)

which evaluates a *dense* grid of A alpha values at once — no multi-stage
alpha zoom.  The run-mean fraction makes the result near-exact: lerp is
linear, so sum-over-run of lerp(f_w) == count * lerp(mean f), and mean f from
the run's mean position differs from the true mean of log-distances only at
second order in the 1.2% cell width (error ~1e-2 CLR units; boundary-cell
assignment differences are harmless because lerp is continuous across cells).

Applicability gate: the per-replicate state is [W, R] for R distinct table
rows, so this path is used when R <= ~128 (single / few sample depths — the
common case) and W <= ~1M sites per chromosome; otherwise the lattice kernel
remains the fallback.

Reference semantics mirrored: window clamping (scan-chromosome.c:73-89),
distance clamp to >= 1 bp (sm-search.c:40-46 logt(0) := 0 convention),
active-site cutoff at x <= LOG_AD_MAX (sm-search.c:116-141), CLR =
2*(sm_logl - null_logl) over active sites (sm-search.c:269-300).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import LOG_AD_MAX, LOG_AD_MIN
from .pallas_ps import TILE_W, onehot_prefix_sums, ps_supported
from .windows import candidate_windows

DEFAULT_N_ALPHA = 128
ROWS_MAX = 128  # exact one-hot gate: above this the builder compresses
COMPRESS_ROWS_MAX = 8192  # hard cap for the SVD row-compression path
COMPRESS_TOL = 1e-3  # max-entry residual target for the rank choice
SITES_MAX = 4_000_000  # [W, R] state cap


def hist_supported(n_rows_used, n_sites):
    """Whether the histogram engine covers this dataset.

    Up to ROWS_MAX distinct (depth, folded, freq) rows run the exact int16
    one-hot formulation; above that — the reference's mixed/missing-depth
    headline case (README.md:26, background-fsp.c:248-266, sm-search.c:
    85-103), where real SNP data has dozens of distinct depths — rows are
    SVD-compressed to ~32 f32 weight channels (the sweep-model row family
    is numerically low-rank), so cost stays at single-depth scale however
    many depths the data holds.
    """
    return n_rows_used <= COMPRESS_ROWS_MAX and n_sites <= SITES_MAX


def dense_alpha_offsets(grid_points, n_alpha=DEFAULT_N_ALPHA):
    """Integer lattice offsets covering [LOG_AD_MIN, LOG_AD_MAX] densely."""
    return np.round(np.linspace(0, grid_points - 1, n_alpha)).astype(np.int32)


@dataclasses.dataclass
class HistTables:
    """Row-compacted table pack for one chromosome extent."""

    t3: jax.Array  # [2*NC*R, A] f32: (w0/w1, cell, row) -> alpha row
    rows_used: np.ndarray  # [R_used] original row ids (sorted)
    row_map: np.ndarray  # [n_rows_total] -> compact id (R_used for absent)
    n_cells: int  # NC
    n_rows: int  # R (padded compact row count, or weight-channel count)
    n_alpha: int
    grid_points: int  # lattice points actually packed (after decimation)
    step: float  # log_ad pitch between packed lattice points
    offsets: np.ndarray  # [A] absolute lattice offsets
    lalpha: np.ndarray  # [A] f32 log-alpha values
    # compressed (mixed-depth) mode: [R_used + 1, n_rows] f32 per-row weight
    # channels (SVD factors, site-mean-centered, + a count channel; last row
    # = all-zero padding sentinel).  None = exact one-hot mode.
    weights: jax.Array | None = None


def build_hist_tables(
    table_np, grid_points, null_row, rows_used, extent_bp,
    n_alpha=DEFAULT_N_ALPHA, row_pad=8, decimate=1,
    site_row_counts=None, compress=None,
):
    """Pack (table - null) rows for the histogram contraction.

    table_np: [n_rows_total, G]; null_row: [n_rows_total] per-row null logl
    (the null model depends only on (depth, folded, freq) = the row, see
    models/tables.py null_logl / scan-chromosome.c:23-37).

    decimate=s > 1 keeps every s-th lattice column: the log-distance cell
    count NC (and with it the per-replicate gather volume and the matmul
    width, the kernel's dominant costs) shrinks s-fold at the price of an
    O(cell_width^2) run-mean interpolation error (~0.2 CLR units at s=4,
    G=2048).  Valid wherever the engine applies the SAME functional to
    observed and permuted data (the permutation statistic, and scan stages
    whose winners are re-evaluated exactly).  The top (G-1) % s fine cells
    of the log_ad range are dropped (~0.04 log units at s=4): immaterial,
    the table plateaus to the background there (LOG_AD_MAX cutoff).

    compress (default: auto when len(rows_used) > ROWS_MAX): SVD-compress
    the row family to f32 weight channels — the mixed/missing-depth path;
    site_row_counts ([n_rows_total] site counts) weights the channel
    centering by the actual site mix.
    """
    if compress is None:
        compress = len(rows_used) > ROWS_MAX
    if compress:
        return _build_hist_tables_compressed(
            table_np, grid_points, null_row, rows_used, extent_bp,
            n_alpha=n_alpha, row_pad=row_pad, decimate=decimate,
            site_row_counts=site_row_counts,
        )
    s = max(int(decimate), 1)
    if s > 1:
        cols = np.arange(0, grid_points, s)
        table_np = np.asarray(table_np)[:, cols]
        step = (LOG_AD_MAX - LOG_AD_MIN) / (grid_points - 1) * s
        grid_points = len(cols)
    else:
        step = (LOG_AD_MAX - LOG_AD_MIN) / (grid_points - 1)
    G = grid_points
    inv_step = 1.0 / step
    NC = min(G, int(np.log(max(float(extent_bp), 2.0)) * inv_step) + 2)
    q = dense_alpha_offsets(G, n_alpha)
    A = len(q)
    rows_used = np.asarray(rows_used, dtype=np.int64)
    Ru = len(rows_used)
    R = -(-Ru // row_pad) * row_pad
    row_map = np.full(table_np.shape[0], R, dtype=np.int32)
    row_map[rows_used] = np.arange(Ru, dtype=np.int32)

    # pack built ON DEVICE: the [2*NC*R, A] tensor is ~100 MB and the host
    # link runs at ~1.5 MB/s — upload only the [Ru, G] table rows and the
    # small [NC, A] index/mask arrays
    i = np.arange(NC)[:, None]  # [NC, 1]
    idx0 = i + q[None, :]  # [NC, A]
    active = (idx0 <= G - 1).astype(np.float32)
    sub_d = jnp.asarray(table_np[rows_used].astype(np.float32))  # [Ru, G]
    nr_d = jnp.asarray(
        np.asarray(null_row, dtype=np.float64)[rows_used].astype(np.float32)
    )
    idx0_d = jnp.asarray(np.clip(idx0, 0, G - 1).astype(np.int32))
    idx1_d = jnp.asarray(np.clip(idx0 + 1, 0, G - 1).astype(np.int32))
    act_d = jnp.asarray(active)

    lalpha = (LOG_AD_MIN + q.astype(np.float64) * step).astype(np.float32)
    return HistTables(
        t3=_device_pack(sub_d, nr_d, idx0_d, idx1_d, act_d, row_pad=R),
        rows_used=rows_used,
        row_map=row_map,
        n_cells=NC,
        n_rows=R,
        n_alpha=A,
        grid_points=G,
        step=float(step),
        offsets=q,
        lalpha=lalpha,
    )


@functools.partial(jax.jit, static_argnames=("row_pad",))
def _device_pack(sub_d, nr_d, idx0_d, idx1_d, act_d, *, row_pad):
    """[2*NC*row_pad, A] pack = (table[r, cell+q] - null[r]) * active."""
    t0 = sub_d[:, idx0_d].transpose(1, 0, 2) - nr_d[None, :, None]
    t1 = sub_d[:, idx1_d].transpose(1, 0, 2) - nr_d[None, :, None]
    t0 = t0 * act_d[:, None, :]
    t1 = t1 * act_d[:, None, :]
    pad = ((0, 0), (0, 0), (0, row_pad - t0.shape[1]), (0, 0))
    out = jnp.pad(jnp.stack([t0, t1]), pad)
    nc, a = act_d.shape
    return out.reshape(2 * nc * row_pad, a)


def _build_hist_tables_compressed(
    table_np, grid_points, null_row, rows_used, extent_bp,
    n_alpha, row_pad, decimate, site_row_counts, tol=COMPRESS_TOL,
):
    """SVD row compression: the mixed/missing-depth fast path.

    The reference's headline "mixed sample depths per site" feature
    (README.md:26) gives real SNP data dozens of distinct depths; the
    exact one-hot formulation's cost scales with the distinct-row count R
    (prefix width, gather bytes, matmul K).  But the packed row family
    M[row, g] = log P(freq | log_ad) - null_logl(row) is NUMERICALLY
    LOW-RANK (depths derive from one spectrum by smooth hypergeometric
    downsampling, background-fsp.c:72-88): rank ~24-32 reproduces 1589
    rows (31 depths, folded+unfolded) to ~1e-5 max entry error.

    So factor M ~= Uw @ V (host SVD, f64) and replace each site's one-hot
    row indicator with its f32 weight vector Uw[row] — prefix sums of
    weights instead of counts; the downstream bounds-gather/contraction
    kernels are unchanged (t3 rows become V rows).  Channels are centered
    by the site-mix mean (prefix magnitudes then grow as sqrt(W), keeping
    pairwise f32 summation error ~0.03 CLR per window at 778k sites) with
    one count channel restoring the means exactly.  Cost becomes
    independent of the number of distinct depths.

    The compression error (~tol per entry) is selection-grade: scan
    winners are re-evaluated exactly by the lattice kernel, and the
    permutation test applies the identical compressed functional to
    observed thresholds and null replicates (a valid Monte-Carlo test,
    same argument as lattice decimation).
    """
    s = max(int(decimate), 1)
    cols = np.arange(0, grid_points, s)
    step = (LOG_AD_MAX - LOG_AD_MIN) / (grid_points - 1) * s
    G = len(cols)
    inv_step = 1.0 / step
    NC = min(G, int(np.log(max(float(extent_bp), 2.0)) * inv_step) + 2)
    q = dense_alpha_offsets(G, n_alpha)
    A = len(q)
    rows_used = np.asarray(rows_used, dtype=np.int64)
    Ru = len(rows_used)
    row_map = np.full(np.asarray(table_np).shape[0], Ru, dtype=np.int32)
    row_map[rows_used] = np.arange(Ru, dtype=np.int32)

    M = (
        np.asarray(table_np, dtype=np.float64)[rows_used][:, cols]
        - np.asarray(null_row, dtype=np.float64)[rows_used][:, None]
    )
    U, S, Vt = np.linalg.svd(M, full_matrices=False)
    r = None
    for cand_r in (8, 16, 24, 32, 48, 64, 96):
        if cand_r >= len(S):
            r = len(S)
            break
        resid = np.abs(M - (U[:, :cand_r] * S[:cand_r]) @ Vt[:cand_r]).max()
        if resid < tol:
            r = cand_r
            break
    r = r or 96
    Uw = U[:, :r] * S[:r]  # [Ru, r]
    V = Vt[:r]  # [r, G]

    if site_row_counts is not None:
        cnt = np.asarray(site_row_counts, dtype=np.float64)[rows_used]
    else:
        cnt = np.ones(Ru)
    mu = (cnt @ Uw) / max(cnt.sum(), 1.0)  # site-mix channel means
    Vhat = np.concatenate([V, (mu @ V)[None, :]], axis=0)  # [r+1, G]
    Wt = np.concatenate(
        [Uw - mu[None, :], np.ones((Ru, 1))], axis=1
    )  # [Ru, r+1]: centered channels + count channel

    R = -(-(r + 1) // row_pad) * row_pad
    Wt = np.pad(Wt, ((0, 1), (0, R - (r + 1))))  # + zero sentinel row
    Vhat = np.pad(Vhat, ((0, R - (r + 1)), (0, 0)))

    i = np.arange(NC)[:, None]
    idx0 = i + q[None, :]
    active = (idx0 <= G - 1).astype(np.float32)
    sub_d = jnp.asarray(Vhat.astype(np.float32))  # [R, G]
    nr_d = jnp.zeros(R, jnp.float32)  # null already inside M
    idx0_d = jnp.asarray(np.clip(idx0, 0, G - 1).astype(np.int32))
    idx1_d = jnp.asarray(np.clip(idx0 + 1, 0, G - 1).astype(np.int32))
    act_d = jnp.asarray(active)

    lalpha = (LOG_AD_MIN + q.astype(np.float64) * step).astype(np.float32)
    return HistTables(
        t3=_device_pack(sub_d, nr_d, idx0_d, idx1_d, act_d, row_pad=R),
        rows_used=rows_used,
        row_map=row_map,
        n_cells=NC,
        n_rows=R,
        n_alpha=A,
        grid_points=G,
        step=float(step),
        offsets=q,
        lalpha=lalpha,
        weights=jnp.asarray(Wt.astype(np.float32)),
    )


@dataclasses.dataclass
class HistPoints:
    """Precomputed run geometry for one fixed candidate set."""

    bounds: jax.Array  # [C, 2, NC+1] i32 prefix indices into the site array
    fbar: jax.Array  # [C, 2, NC] f32 per-run interpolation fraction
    n_cand: int  # C (padded)
    n_real: int  # real candidate count


# limb split for exact int32 position prefix sums on device: S = hi*2^20 + lo
_LIMB_BITS = 20


def build_pos_prefix(pos_np):
    """[W+1, 2] int32 limb pairs (hi, lo) of the exact position prefix sum.

    Both limbs share one row so the boundary-search consumer fetches them
    with ONE row gather per bound (element gathers run ~3x slower than row
    gathers on this TPU).  Supports sum(pos) < 2^51 (e.g. 4M sites at
    500 Mb positions)."""
    pos = np.asarray(pos_np, dtype=np.int64)
    ps = np.zeros(len(pos) + 1, dtype=np.int64)
    np.cumsum(pos, out=ps[1:])
    assert ps[-1] < (1 << (31 + _LIMB_BITS)), "position prefix overflows limbs"
    return jnp.asarray(
        np.stack(
            [
                (ps >> _LIMB_BITS).astype(np.int32),
                (ps & ((1 << _LIMB_BITS) - 1)).astype(np.int32),
            ],
            axis=1,
        )
    )


def _block_search(block_tab, qbits, q):
    """Exact vectorized searchsorted(pos, q, 'left') via block index table.

    block_tab[b] = [coarse_b, pos[coarse_b : coarse_b + K]] where coarse_b
    = #sites with pos < (b << qbits) — the coarse index AND its K-site
    position slab share one row, so the per-query fetch is ONE wide row
    gather (instead of log2(W) scattered gathers, or the element gather +
    row gather pair a separate index table costs).  Exactness needs every
    qbits block to hold <= K sites (the host builder guarantees it).
    """
    qb = jnp.clip(q >> qbits, 0, block_tab.shape[0] - 1)
    row = block_tab[qb]  # [..., 1 + K]
    coarse = row[..., 0]
    return coarse + jnp.sum(
        row[..., 1:] < q[..., None], axis=-1, dtype=jnp.int32
    )


_POINTS_CHUNK = 256  # candidate chunk: bounds the [chunk*NC, K] slab temp


@functools.partial(
    jax.jit, static_argnames=("n_cells", "qbits", "quantum")
)
def _device_points(pos_i32, ps_hl, d_ceil, block_tab,
                   cand, lo, hi, sp, *, n_cells, qbits, quantum=0, qoff=0):
    # qoff is TRACED (a per-chromosome value; a static arg would compile
    # one geometry program per distinct chromosome alignment)
    """Run boundaries + run-mean fractions, computed on device.

    All inputs are small uploads (the [W]-sized arrays are chromosome-
    resident anyway); the big [C, 2, NC+1] outputs never cross the host
    link.  Integer thresholds make the boundary search exact for integer
    positions:  pos > c - D_i  <=>  pos >= c - ceil(D_i) + 1  and
    pos >= c + D_i  <=>  pos >= c + ceil(D_i)  (both for integer and
    non-integer D_i).  Candidates process in _POINTS_CHUNK chunks so the
    slab-gather temporary stays bounded (its [*, K] layout tile-pads 8x).

    quantum > 0 (the permutation statistic's group-level path): every
    bound — including the window clamps — is snapped so that (bound +
    qoff) is a multiple of ``quantum`` sites (round-to-nearest for cell
    boundaries, inward for the window edges so bounds stay inside the
    chromosome).  qoff = chromosome start_index % quantum aligns the
    CHROMOSOME-LOCAL bounds to GENOME permutation-group boundaries, so
    the consumer reads prefix sums at group granularity — no site-level
    permuted stream at all (engine/permute.py _stack_stat_g).  Cell
    boundaries shift by <= quantum/2 sites, a tiny perturbation of the
    statistic that applies IDENTICALLY to observed thresholds and null
    replicates (the decimation/run-mean validity argument).  fbar is
    computed from the QUANTIZED bounds, so the run-mean lerp stays
    consistent with the actual run contents.
    """
    NC = n_cells
    C = cand.shape[0]
    n_chunks = -(-C // _POINTS_CHUNK)
    pad = n_chunks * _POINTS_CHUNK - C

    def pad1(x, fill=0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            n_chunks, _POINTS_CHUNK
        )

    def one_chunk(carry, args):
        cand_c, lo_c, hi_c, sp_c = args
        qL = cand_c[:, None] - d_ceil[None, :] + 1  # [chunk, NC]
        qR = cand_c[:, None] + d_ceil[None, :]
        BL = _block_search(block_tab, qbits, qL)
        BR = _block_search(block_tab, qbits, qR)
        if quantum:
            g = jnp.int32(quantum)
            o = jnp.int32(qoff)
            half = jnp.int32(quantum // 2)

            def ceil_q(x):
                return (x + o + g - 1) // g * g - o

            def floor_q(x):
                return (x + o) // g * g - o

            def round_q(x):
                return (x + o + half) // g * g - o

            lo_q = ceil_q(lo_c)  # inward
            hi1_q = floor_q(hi_c + 1)  # inward
            sp_q = jnp.clip(round_q(sp_c), lo_q, hi1_q)
            BL = jnp.clip(
                round_q(BL), lo_q[:, None], sp_q[:, None]
            ).astype(jnp.int32)
            BR = jnp.clip(
                round_q(BR), sp_q[:, None], hi1_q[:, None]
            ).astype(jnp.int32)
            sp_c = sp_q
        else:
            BL = jnp.clip(BL, lo_c[:, None], sp_c[:, None]).astype(
                jnp.int32
            )
            BR = jnp.clip(
                BR, sp_c[:, None], hi_c[:, None] + 1
            ).astype(jnp.int32)
        bounds = jnp.concatenate(
            [
                jnp.concatenate([sp_c[:, None], BL], axis=1)[:, None, :],
                jnp.concatenate([sp_c[:, None], BR], axis=1)[:, None, :],
            ],
            axis=1,
        )  # [chunk, 2, NC+1]
        hl = ps_hl[bounds]  # [chunk, 2, NC+1, 2] — ONE row gather per bound
        dh = hl[:, :, 1:, 0] - hl[:, :, :-1, 0]
        dl = hl[:, :, 1:, 1] - hl[:, :, :-1, 1]
        h = bounds[:, :, 1:] - bounds[:, :, :-1]
        sign = jnp.array([-1, 1], jnp.int32)[None, :, None]
        s = (dh.astype(jnp.float32) * float(1 << _LIMB_BITS)
             + dl.astype(jnp.float32)) * sign.astype(jnp.float32)
        h = h * sign
        pbar = s / jnp.maximum(h, 1).astype(jnp.float32)
        dbar = jnp.abs(pbar - cand_c[:, None, None].astype(jnp.float32))
        return carry, (bounds, h, dbar)

    _, (bounds, h, dbar) = jax.lax.scan(
        one_chunk, None, (pad1(cand), pad1(lo, 1), pad1(hi), pad1(sp, 1))
    )
    bounds = bounds.reshape(n_chunks * _POINTS_CHUNK, 2, NC + 1)[:C]
    h = h.reshape(n_chunks * _POINTS_CHUNK, 2, NC)[:C]
    dbar = dbar.reshape(n_chunks * _POINTS_CHUNK, 2, NC)[:C]
    return bounds, h, dbar


def build_hist_points(ht: HistTables, pos_np, cand_pos, eval_range,
                      cand_pad=64, device_arrays=None, quantum=0, qoff=0):
    """Run boundaries + mean-position fractions for a fixed candidate set.

    Host does only the O(C) window geometry (exact int64); the O(C * NC)
    boundary search and fraction math run on device (the host link is slow,
    ~1.5 MB/s — the [C, 2, NC] outputs stay device-resident).

    device_arrays: optional (pos_pad, ps_hl, d_ceil, ...) reused across
    buckets of the same chromosome (see make_hist_device_arrays).
    quantum: snap every bound to this site multiple (see _device_points;
    the group-level permutation statistic).
    """
    pos = np.asarray(pos_np, dtype=np.int64)
    cand = np.asarray(cand_pos, dtype=np.int64)
    Creal = len(cand)
    C = -(-max(Creal, 1) // cand_pad) * cand_pad
    NC = ht.n_cells
    inv_step = 1.0 / ht.step

    _, lo, hi = candidate_windows(pos, cand, eval_range)
    sp = np.clip(np.searchsorted(pos, cand, side="left"), lo, hi + 1)

    cand_p = np.pad(cand, (0, C - Creal))
    lo_p = np.pad(lo, (0, C - Creal), constant_values=1)
    hi_p = np.pad(hi, (0, C - Creal), constant_values=0)
    sp_p = np.pad(sp, (0, C - Creal), constant_values=1)

    if device_arrays is None:
        device_arrays = make_hist_device_arrays(ht, pos)

    bounds, h, dbar = _device_points(
        *device_arrays[:-1],
        jnp.asarray(cand_p.astype(np.int32)),
        jnp.asarray(lo_p.astype(np.int32)),
        jnp.asarray(hi_p.astype(np.int32)),
        jnp.asarray(sp_p.astype(np.int32)),
        n_cells=NC,
        qbits=device_arrays[-1],
        quantum=quantum,
        qoff=qoff,
    )
    logd = jnp.log(jnp.maximum(dbar, 1.0))
    icell = jnp.arange(NC, dtype=jnp.float32)[None, None, :]
    fbar = jnp.clip(logd * inv_step - icell, 0.0, 1.0)
    fbar = jnp.where(h > 0, fbar, 0.5).astype(jnp.float32)
    return HistPoints(bounds=bounds, fbar=fbar, n_cand=C, n_real=Creal)


_SLAB_K = 16  # sites per contiguous slab fetched by _block_search
_IDX_TAB_MAX = 4_000_000  # block-table size cap


def _choose_block_table(pos, qbits=None):
    """(qbits, idx_tab) with <= _SLAB_K sites per 2^qbits-bp block, or
    (None, None) when no table within _IDX_TAB_MAX entries achieves it.

    With ``qbits`` forced, builds the table at exactly that quantum (any
    quantum at or below a chromosome's natural choice keeps the <=_SLAB_K
    exactness guarantee) — drivers force one dataset-wide quantum so
    _device_points compiles ONCE instead of per chromosome (each distinct
    qbits is a separate XLA program; cold compiles through the tunnel cost
    minutes)."""
    pos = np.asarray(pos, dtype=np.int64)
    max_pos = int(pos[-1]) if len(pos) else 0
    rng = range(16, 0, -1) if qbits is None else (qbits,)
    for qb in rng:
        n_blk = (max_pos >> qb) + 2
        if n_blk > _IDX_TAB_MAX:
            return None, None
        idx_tab = np.searchsorted(
            pos, np.arange(n_blk, dtype=np.int64) << qb, side="left"
        )
        if np.diff(idx_tab).max(initial=0) <= _SLAB_K:
            return qb, idx_tab
    return None, None


def hist_geometry_ok(pos_np) -> bool:
    """Whether the block-search geometry supports this chromosome."""
    q, _ = _choose_block_table(np.asarray(pos_np, dtype=np.int64))
    return q is not None


def dataset_qbits(pos_by_chr):
    """One shared block quantum for every chromosome of a dataset.

    Each distinct qbits value makes _device_points a distinct XLA program;
    forcing the minimum of the per-chromosome natural choices keeps the
    exactness guarantee (smaller blocks hold fewer sites) while the whole
    dataset shares one compile.  Returns None when any chromosome has no
    feasible table (callers fall back to the lattice path).
    """
    q = 16
    for pos in pos_by_chr:
        qc, _ = _choose_block_table(np.asarray(pos, dtype=np.int64))
        if qc is None:
            return None
        q = min(q, qc)
    return q


def make_hist_device_arrays(ht: HistTables, pos_np, qbits=None):
    """Chromosome-resident device inputs for build_hist_points.

    Builds the block index table for _block_search: the largest block
    quantum (power of two) such that no 2^qbits-bp block holds more than
    _SLAB_K sites (or the caller's dataset-wide forced quantum).  For
    pathologically dense data the table is capped at _IDX_TAB_MAX entries
    (then blocks may exceed the slab and the builder raises — callers gate
    on hist_supported first).
    """
    pos = np.asarray(pos_np, dtype=np.int64)
    n = len(pos)
    d_ceil = np.ceil(
        np.exp(np.arange(1, ht.n_cells + 1, dtype=np.float64) * ht.step)
    ).astype(np.int64)

    # pad every per-chromosome array to 4096-site / 4096-block quanta:
    # each distinct input LENGTH is a distinct _device_points program, and
    # a genome's chromosomes differ by a few percent in site count — with
    # quantized shapes (and the dataset-wide qbits) they all share one
    # compile per stage instead of one per chromosome
    w_pad = max(-(-n // 4096) * 4096, 4096)
    pos_zero = np.zeros(w_pad, dtype=np.int64)
    pos_zero[:n] = pos  # zero tail: prefix differences in the pad are 0
    ps_hl = build_pos_prefix(pos_zero)

    qbits, idx_tab = _choose_block_table(pos, qbits=qbits)
    if qbits is None:
        raise ValueError(
            "site density too high for the block index table; "
            "disable the hist path for this dataset "
            "(check hist_geometry_ok first)"
        )
    nb_pad = max(-(-len(idx_tab) // 4096) * 4096, 4096)
    idx_tab = np.pad(idx_tab, (0, nb_pad - len(idx_tab)),
                     constant_values=n)
    # block table rows [coarse_b, pos[coarse_b : coarse_b+K]], built
    # device-side (the host link is slow); int32-max tail sentinels
    pos_sent = np.full(w_pad, np.iinfo(np.int32).max // 2, dtype=np.int32)
    pos_sent[:n] = pos
    pos_d = jnp.asarray(pos_sent)
    pos_ext = jnp.concatenate(
        [pos_d, jnp.full(_SLAB_K, np.iinfo(np.int32).max, jnp.int32)]
    )
    pos_win = jnp.stack(
        [pos_ext[k : k + w_pad + 1] for k in range(_SLAB_K)], axis=1
    )
    idx_d = jnp.asarray(idx_tab.astype(np.int32))
    block_tab = jnp.concatenate([idx_d[:, None], pos_win[idx_d]], axis=1)
    return (
        pos_d,
        ps_hl,
        jnp.asarray(
            np.minimum(d_ceil, np.iinfo(np.int32).max // 2).astype(np.int32)
        ),
        block_tab,
        int(qbits),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cells", "n_rows", "n_alpha", "c_sub", "ps_mod16", "mm_bf16",
    ),
)
def hist_clr(t3, bounds, fbar, row_compact,
             *, n_cells, n_rows, n_alpha, c_sub=64, weights=None,
             ps_mod16=False, mm_bf16=False):
    """CLR[c, a] for every (candidate, dense lattice alpha).

    row_compact: [Wpad] i32 compact row ids (>= n_rows for padding — such
    sites vanish from the one-hot).  bounds/fbar from build_hist_points.
    weights: compressed-mode [Ru+1, n_rows] f32 channel table (the row id
    then selects a weight vector instead of a one-hot).  Returns [C, A].

    ps_mod16: keep int16 prefix sums beyond W = 32767 by letting them wrap
    mod 2^16 — the kernel only ever consumes prefix DIFFERENCES within one
    candidate window, and two's-complement int16 subtraction recovers the
    exact difference whenever it fits in int16.  Callers must guarantee
    every per-(window, row) site count <= 32767 (the fused genome scan
    checks per-(chromosome, row) counts host-side); halves the
    bounds-gather traffic, the kernel's main cost, on fused site streams.
    """
    NC, R, A = n_cells, n_rows, n_alpha
    W = row_compact.shape[0]
    if weights is not None:
        wt = weights[row_compact]  # [W, R] f32; sentinel rows -> zeros
        ps = jnp.concatenate(
            [jnp.zeros((1, R), jnp.float32),
             jax.lax.associative_scan(jnp.add, wt, axis=0)], axis=0
        )  # pairwise: f32 error stays ulp-scale on centered channels
    else:
        # prefix sums in the narrowest exact integer type: int16 when
        # counts (<= W) fit — halves the bounds-gather traffic, the
        # kernel's main cost
        idt = (
            jnp.int16 if (W <= 32767 or ps_mod16) else jnp.int32
        )
        oh = (
            row_compact[:, None] == jnp.arange(R, dtype=jnp.int32)[None, :]
        )
        ps = jnp.concatenate(
            [jnp.zeros((1, R), jnp.int32),
             jnp.cumsum(oh.astype(jnp.int32), axis=0)], axis=0
        ).astype(idt)  # [W+1, R]

    C = bounds.shape[0]
    n_chunks = -(-C // c_sub)
    pad = n_chunks * c_sub - C
    if pad:
        # zero bounds rows -> empty runs -> CLR exactly 0, sliced off below
        bounds = jnp.pad(bounds, ((0, pad), (0, 0), (0, 0)))
        fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
    b_c = bounds.reshape(n_chunks, c_sub, 2, NC + 1)
    f_c = fbar.reshape(n_chunks, c_sub, 2, NC)
    sign = jnp.array([-1, 1], ps.dtype)[None, :, None, None]
    mmdt = jnp.bfloat16 if mm_bf16 else jnp.float32
    t3m = t3.astype(mmdt)

    def one_chunk(carry, args):
        bc, fc = args
        psb = ps[bc]  # [c_sub, 2, NC+1, R]
        h = ((psb[:, :, 1:, :] - psb[:, :, :-1, :]) * sign).astype(
            jnp.float32
        )
        w0 = jnp.sum(h * (1.0 - fc[..., None]), axis=1)  # [c_sub, NC, R]
        w1 = jnp.sum(h * fc[..., None], axis=1)
        k = jnp.concatenate([w0, w1], axis=1).reshape(
            c_sub, 2 * NC * R
        ).astype(mmdt)
        return carry, 2.0 * jax.lax.dot(
            k, t3m, preferred_element_type=jnp.float32
        )

    _, out = jax.lax.scan(one_chunk, None, (b_c, f_c))
    return out.reshape(n_chunks * c_sub, A)[:C]


@functools.partial(jax.jit, static_argnames=("n_rows",))
def make_row_onehot_table(row_compact, *, n_rows):
    """[Wg+1, n_rows] i8 one-hot of per-site compact row ids, device-built.

    Row Wg is the all-zero padding sentinel; ids >= n_rows also map to
    zero.  The permutation driver gathers this table at sigma to produce
    the one-hot stream directly — a width-R ROW gather, ~3x faster than
    the per-element row-id gather + compare it replaces.
    """
    oh = (
        row_compact[:, None] == jnp.arange(n_rows, dtype=jnp.int32)
    ).astype(jnp.int8)
    return jnp.pad(oh, ((0, 1), (0, 0)))


def make_row_onehot_group_table(row_compact, *, n_rows):
    """[G+1, PERM_GROUP*n_rows] i8 one-hot table packed PERM_GROUP sites
    per row (G = ceil(W / PERM_GROUP)).

    Block-permutation boundaries quantize to PERM_GROUP-site multiples
    (ops/permute.py), so the permuted one-hot stream is a GROUP-level row
    gather of this table — PERM_GROUP x fewer gather rows at the same
    total bytes (row gathers run at a fixed rows/s nearly independent of
    row width).  Row G is the all-zero padding sentinel; tail sites past
    W are zero.
    """
    from .permute import PERM_GROUP

    W = row_compact.shape[0]
    G = -(-W // PERM_GROUP) if W else 1
    oh = (
        row_compact[:, None] == jnp.arange(n_rows, dtype=jnp.int32)
    ).astype(jnp.int8)
    oh = jnp.pad(oh, ((0, G * PERM_GROUP - W), (0, 0)))
    return jnp.pad(
        oh.reshape(G, PERM_GROUP * n_rows), ((0, 1), (0, 0))
    )


def make_row_index_group_table(row_compact, *, n_rows):
    """[G+1, PERM_GROUP] i16 compact-row-INDEX table (thin gather form).

    Same information as make_row_onehot_group_table at n_rows x fewer
    bytes: each site's one-hot row is fully determined by its compact row
    id, so the permuted stream gather fetches PERM_GROUP i16 ids per
    group and expands to one-hot ON CHIP (a VPU broadcast compare).  The
    XLA row gather is simultaneously row-count-bound (~16M rows/s) and
    byte-bound (~26 GB/s measured, bench/micro_idx.py) — the fat one-hot
    rows sat on the byte ceiling; the thin rows clear it.  Value n_rows
    (the row_map absent/sentinel id, and the pad for tail sites past W)
    expands to an all-zero one-hot row, exactly like the fat table's
    zero padding.
    """
    from .permute import PERM_GROUP

    W = row_compact.shape[0]
    G = -(-W // PERM_GROUP) if W else 1
    idx = jnp.minimum(row_compact.astype(jnp.int32), n_rows)
    idx = jnp.pad(
        idx, (0, G * PERM_GROUP - W), constant_values=n_rows
    ).reshape(G, PERM_GROUP).astype(jnp.int16)
    return jnp.pad(
        idx, ((0, 1), (0, 0)), constant_values=np.int16(n_rows)
    )


def make_group_sum_table(row_compact, *, n_rows, pg):
    """[G+1, n_rows] int8 per-group row-count sums (counts <= pg <= 127).

    The group-level permutation statistic (engine/permute.py
    _stack_stat_g) gathers THIS table at sigma instead of the
    [G+1, pg*n_rows] one-hot table: same gather row count, pg x fewer
    bytes, and the gathered layout needs NO transpose before the
    segmented prefix (the pg axis is pre-reduced).  Row G is the
    all-zero sentinel.
    """
    W = row_compact.shape[0]
    G = -(-W // pg) if W else 1
    oh = (
        row_compact[:, None] == jnp.arange(n_rows, dtype=jnp.int32)
    ).astype(jnp.int32)
    oh = jnp.pad(oh, ((0, G * pg - W), (0, 0)))
    gs = oh.reshape(G, pg, n_rows).sum(axis=1).astype(jnp.int8)
    return jnp.pad(gs, ((0, 1), (0, 0)))


@jax.jit
def make_row_weight_group_table(row_compact, weights):
    """[G+1, PERM_GROUP*R] f32 weight table packed PERM_GROUP sites/row.

    The compressed-mode analogue of make_row_onehot_group_table: each
    site's one-hot indicator is replaced by its f32 weight-channel vector
    (SVD factors, ops/histclr.py _build_hist_tables_compressed), so the
    permutation driver's group-level row gather and segmented prefix sums
    work identically — at a width set by the compression rank, not the
    distinct-row count.  Row G is the all-zero padding sentinel.
    """
    from .permute import PERM_GROUP

    W = row_compact.shape[0]
    R = weights.shape[1]
    G = -(-W // PERM_GROUP) if W else 1
    wt = weights[row_compact]  # [W, R]; sentinel row ids -> zero rows
    wt = jnp.pad(wt, ((0, G * PERM_GROUP - W), (0, 0)))
    return jnp.pad(
        wt.reshape(G, PERM_GROUP * R), ((0, 1), (0, 0))
    )


def build_prefix_sums_oh(oh2d):
    """[W+1, L] prefix sums of a [W, L] i8 one-hot stream.

    int16 where counts fit (W <= 32767); the Pallas MXU kernel
    (ops/pallas_ps.py) does the running sum when the layout allows.
    """
    W, L = oh2d.shape
    idt = jnp.int16 if W <= 32767 else jnp.int32
    if jax.default_backend() != "cpu" and ps_supported(W, L):
        body = onehot_prefix_sums(oh2d, out_dtype=idt)
    else:
        body = jnp.cumsum(oh2d.astype(jnp.int32), axis=0).astype(idt)
    return jnp.concatenate([jnp.zeros((1, L), body.dtype), body], axis=0)


def build_prefix_sums_seg(oh2d, *, seg_len, out_dtype=None):
    """[S*seg_len, L] segmented inclusive prefix sums of an i8 one-hot.

    The running count resets at every segment boundary, so S stacked
    chromosomes share one flat site axis (engine/permute.py _stack_stat)
    while their prefix streams stay independent.  There is NO prepended
    zero row: callers reserve masked (all-zero) leading rows per segment,
    so the row at a segment's first real site already reads 0 from them.
    int16 where per-segment counts fit (seg_len <= 32767) — counts never
    cross segments, so the total length does not force int32.

    Float input (the compressed mixed-depth weight channels) keeps f32:
    the Pallas kernel uses a two-limb compensated carry, and the XLA
    fallback a pairwise associative scan — both keep the summation error
    ~ulp-scale on sqrt(W)-magnitude centered weight streams.

    out_dtype overrides the dtype choice: the default int16-when-
    seg_len-fits rule assumes 0/1 inputs (counts bounded by the segment
    length); GROUP-SUM inputs carry up to pg counts per row, so their
    prefixes are bounded by the underlying SITE count — callers pass
    int32 (or int16 under the mod-2^16 window-difference guarantee).
    """
    W, L = oh2d.shape
    assert W % seg_len == 0
    is_f = jnp.issubdtype(oh2d.dtype, jnp.floating)
    if (
        jax.default_backend() != "cpu"
        and ps_supported(W, L)
        and seg_len % TILE_W == 0
    ):
        odt = out_dtype or (jnp.float32 if is_f else (
            jnp.int16 if seg_len <= 32767 else jnp.int32
        ))
        return onehot_prefix_sums(oh2d, out_dtype=odt, reset_every=seg_len)
    S = W // seg_len
    if is_f:
        return jax.lax.associative_scan(
            jnp.add, oh2d.reshape(S, seg_len, L).astype(jnp.float32),
            axis=1,
        ).reshape(W, L)
    idt = out_dtype or (jnp.int16 if seg_len <= 32767 else jnp.int32)
    body = jnp.cumsum(
        oh2d.reshape(S, seg_len, L).astype(jnp.int32), axis=1
    ).astype(idt)
    return body.reshape(W, L)


def build_prefix_sums(row_rep, *, n_rows):
    """[W+1, P*R] one-hot prefix sums for replicate-stacked row ids.

    row_rep: [P, Wpad] i32 compact row ids per replicate (ids >= n_rows
    vanish from the one-hot).  int16 output where counts fit (W <= 32767)
    halves the bounds-gather traffic downstream.  On TPU with a lane-
    aligned width the fused Pallas kernel (ops/pallas_ps.py) builds the
    sums in one pass; the XLA fallback is identical.
    """
    R = n_rows
    P_rep, W = row_rep.shape
    idt = jnp.int16 if W <= 32767 else jnp.int32
    use_pallas = (
        jax.default_backend() != "cpu"
        and ps_supported(W, P_rep * R)
    )
    if use_pallas:
        rows_exp = jnp.repeat(row_rep.T, R, axis=1)  # [W, P*R]
        body = onehot_prefix_sums(rows_exp, n_rows=R, out_dtype=idt)
        return jnp.concatenate(
            [jnp.zeros((1, P_rep * R), body.dtype), body], axis=0
        )
    oh = (row_rep[..., None] == jnp.arange(R, dtype=jnp.int32))  # [P, W, R]
    oh = oh.astype(jnp.int32).transpose(1, 0, 2).reshape(W, P_rep * R)
    return jnp.concatenate(
        [jnp.zeros((1, P_rep * R), jnp.int32), jnp.cumsum(oh, axis=0)],
        axis=0,
    ).astype(idt)  # [W+1, P*R]


@functools.partial(
    jax.jit,
    static_argnames=("n_cells", "n_rows", "n_alpha", "c_sub"),
)
def hist_clr_reps(t3, bounds, fbar, row_rep,
                  *, n_cells, n_rows, n_alpha, c_sub=32):
    """CLR[p, c, a] for every (replicate, candidate, dense lattice alpha).

    The replicate-batched variant of hist_clr.  Run geometry (bounds/fbar)
    is replicate-invariant — block permutations shuffle attributes, never
    positions — so the replicate axis rides the GATHER WIDTH: prefix sums
    for all P replicates stack into [W+1, P*R] columns and one bounds
    gather serves every replicate.  Gathers on this TPU are row-rate-bound
    (~150M rows/s regardless of width up to several KB), so this is ~P x
    cheaper than per-replicate gathers; the contraction with the table pack
    becomes one [c_sub*P, 2*NC*R] MXU matmul per candidate chunk.

    row_rep: [P, Wpad] i32 compact row ids per replicate (>= n_rows rows
    vanish from the one-hot).  Returns [P, C, A] f32.
    """
    ps = build_prefix_sums(row_rep, n_rows=n_rows)
    return hist_clr_reps_ps(
        t3, bounds, fbar, ps, n_rep=row_rep.shape[0],
        n_cells=n_cells, n_rows=n_rows, n_alpha=n_alpha, c_sub=c_sub,
    )


def build_site_prefix(row_compact, *, n_rows):
    """[W+1, R] int32 prefix of the UNPERMUTED genome one-hot stream.

    The run-decomposed permuted-prefix path (rdp_clr_reps) assembles any
    replicate's permuted prefix from rows of this ONE precomputed table:
    built once per dataset, O(W*R) — never per replicate.
    """
    oh = (
        row_compact[:, None] == jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    )
    return jnp.concatenate(
        [jnp.zeros((1, n_rows), jnp.int32),
         jnp.cumsum(oh.astype(jnp.int32), axis=0)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_rep", "n_cells", "n_rows", "n_alpha", "pg",
                     "n_groups", "c_sub", "mm_bf16"),
)
def rdp_clr_reps(t3, bounds_gen, fbar, psite, src_starts,
                 dst_starts, sizes, *, n_rep, n_cells, n_rows, n_alpha,
                 pg, n_groups, c_sub=32, mm_bf16=False):
    """CLR[p, c, a] via the run-decomposed permuted prefix (RDP).

    The block permutation is a concatenation of B contiguous SOURCE runs
    (ops/permute.py block_permutation_runs): permuted output groups
    [dst_starts[k], dst_starts[k]+sizes[k]) take source groups
    [src_starts[k], ...).  The permuted one-hot prefix at genome site b
    therefore telescopes to

        A(b) = D[k(b)] + psite[src_group(b) * pg + b % pg]

    where k(b) is b's run, src_group(b) = sigma8[b // pg] (the group
    sigma IS the per-group source map), D[k] = (exclusive run-total
    prefix)[k] - psite[src_starts[k] * pg], and psite is the UNPERMUTED
    site prefix (build_site_prefix, computed once per dataset).  Per
    (bound, replicate) that is TWO row gathers against precomputed
    tables — no per-replicate O(W) one-hot stream, prefix pass, or bulk
    transpose.  Cost scales with bounds x replicates instead of genome
    sites x replicates — the pruning-tail regime's asymptotic win (the C
    rebuilds its permuted SNP array in O(sites) per replicate however
    few points survive, scan-chromosome.c:441-461).

    Layout discipline (the first cut of this kernel transposed the
    gathered [P, M, R] data into consumption order and spent ~95% of its
    wall relayouting): the SMALL index arrays are transposed instead —
    sigma8_t/run_of_t are [G, P] ROW-gathered at the bound groups, so
    the big D/psite gathers land directly in [M, P, R] consumption
    order.  The per-group run-id table run_of is built by a scatter +
    cumsum (exactly searchsorted(dst_starts, g, 'right') - 1, duplicates
    from empty runs telescope correctly) — no per-bound binary search.

    Window differences h equal the segmented-stream prefix differences
    exactly (same integers), so the downstream weighting/contraction —
    identical code to hist_clr_reps_ps — evaluates the SAME statistic as
    the stacked path (tests/test_rdp.py: driver counts match exactly).

    bounds_gen: [C, 2, NC+1] int32 GENOME-site bounds (chromosome-local
    bounds + chromosome start index; padding candidates all-zero rows ->
    h = 0 -> CLR exactly 0).  psite: [W+1, R] int32.  src/dst/sizes:
    [P, B] int32 group-level runs (the source-group map sigma8 is
    rebuilt from them here by the sigma materializer's scatter + cumsum,
    O(G) per replicate); n_groups = G.  Returns [P, C, A] f32.
    """
    NC, R, A = n_cells, n_rows, n_alpha
    P_rep = n_rep
    B = src_starts.shape[1]
    G = n_groups
    W1 = psite.shape[0]

    # per-run constants D[p, k] (exclusive prefix of run totals, minus the
    # run's source base): [P, B] row gathers + one tiny cumsum
    s_sites = jnp.clip(src_starts * pg, 0, W1 - 1)
    e_sites = jnp.clip((src_starts + sizes) * pg, 0, W1 - 1)
    pst_s = psite[s_sites]  # [P, B, R]
    run_tot = psite[e_sites] - pst_s
    rps = jnp.cumsum(run_tot, axis=1) - run_tot  # exclusive
    d_flat = (rps - pst_s).reshape(P_rep * B, R)

    # per-group tables [G, P]: run ids (scatter 1 at each run's dst
    # start + cumsum == searchsorted(dst_starts, g, 'right') - 1; empty
    # runs' duplicate starts telescope to the owning run) and the
    # source-group map (scatter of per-run shift deltas — exactly the
    # sigma materializer's construction, ops/permute.py _replicates)
    p_idx = jnp.arange(P_rep, dtype=jnp.int32)[:, None]
    ones = jnp.zeros((P_rep, G), jnp.int32).at[p_idx, dst_starts].add(
        1, mode="drop"
    )
    run_of_t = (jnp.cumsum(ones, axis=1) - 1).T  # [G, P]
    val = src_starts - dst_starts  # [P, B]
    dval = jnp.concatenate(
        [val[:, :1], jnp.diff(val, axis=1)], axis=1
    )
    base = jnp.zeros((P_rep, G), jnp.int32).at[p_idx, dst_starts].add(
        dval, mode="drop"
    )
    sigma8_t = (
        jnp.cumsum(base, axis=1)
        + jnp.arange(G, dtype=jnp.int32)[None, :]
    ).T  # [G, P]
    p_off = jnp.arange(P_rep, dtype=jnp.int32)[None, :] * B  # [1, P]

    c_sub = min(c_sub, max(2, 1024 // max(P_rep, 1)))
    C = bounds_gen.shape[0]
    n_chunks = -(-C // c_sub)
    pad = n_chunks * c_sub - C
    if pad:
        bounds_gen = jnp.pad(bounds_gen, ((0, pad), (0, 0), (0, 0)))
        fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
    b_c = bounds_gen.reshape(n_chunks, c_sub, 2, NC + 1)
    f_c = fbar.reshape(n_chunks, c_sub, 2, NC)
    sign = jnp.array([-1, 1], jnp.int32)[None, :, None, None, None]
    mmdt = jnp.bfloat16 if mm_bf16 else jnp.float32
    t3r = t3.reshape(2 * NC, R, A).astype(mmdt)

    def one_chunk(carry, args):
        bc, fc = args  # [c_sub, 2, NC+1], [c_sub, 2, NC]
        flat_b = bc.reshape(-1)  # [M] genome site indices
        g_b = jnp.clip(flat_b // pg, 0, G - 1)
        o_b = flat_b - g_b * pg
        src_g = sigma8_t[g_b]  # [M, P] row gather (small)
        k = run_of_t[g_b]  # [M, P] row gather (small)
        src_site = jnp.clip(src_g * pg + o_b[:, None], 0, W1 - 1)
        a = d_flat[k + p_off] + psite[src_site]  # [M, P, R] in order
        psb = a.reshape(c_sub, 2, NC + 1, P_rep, R)
        h = ((psb[:, :, 1:, :, :] - psb[:, :, :-1, :, :])
             * sign).astype(jnp.float32)  # [c_sub, 2, NC, P, R]
        w0 = jnp.sum(h * (1.0 - fc[..., None, None]), axis=1)
        w1 = jnp.sum(h * fc[..., None, None], axis=1)
        kmat = jnp.concatenate([w0, w1], axis=1).astype(mmdt)
        out = jax.lax.dot_general(
            kmat, t3r, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c_sub, P, A]
        return carry, 2.0 * out

    _, out = jax.lax.scan(one_chunk, None, (b_c, f_c))
    out = out.reshape(n_chunks * c_sub, P_rep, A)[:C]
    return out.transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("n_rep", "n_cells", "n_rows", "n_alpha", "c_sub",
                     "mm_bf16"),
)
def hist_clr_reps_ps(t3, bounds, fbar, ps,
                     *, n_rep, n_cells, n_rows, n_alpha, c_sub=32,
                     mm_bf16=False):
    """hist_clr_reps given prebuilt prefix sums ps [W+1, P*R].

    The permutation driver hoists build_prefix_sums out of the per-bucket
    dispatches: the sigma attribute gather plus the prefix pass cost ~5 ms
    per replicate slice and are identical for every point bucket of a
    chromosome.

    mm_bf16: run the (cell, row) contraction in bfloat16 with f32
    accumulation — ~2x MXU rate.  Inputs are counts (or weight sums) x
    log-prob diffs, so the ~0.4% bf16 input rounding costs O(1) CLR units
    on large windows; used ONLY for the permutation statistic, where the
    identical functional applies to observed thresholds and null
    replicates (valid Monte-Carlo test at any precision) — never for
    reported scan CLRs.
    """
    NC, R, A = n_cells, n_rows, n_alpha
    P_rep = n_rep
    idt = ps.dtype
    # bound the [c_sub, 2, NC+1, P*R] gather temporary: keep c_sub * P_rep
    # around 1k so large replicate batches (small-bucket pruning tails run
    # 256 reps/dispatch) don't blow HBM on the per-chunk slab
    c_sub = min(c_sub, max(2, 1024 // max(P_rep, 1)))

    C = bounds.shape[0]
    n_chunks = -(-C // c_sub)
    pad = n_chunks * c_sub - C
    if pad:
        bounds = jnp.pad(bounds, ((0, pad), (0, 0), (0, 0)))
        fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
    b_c = bounds.reshape(n_chunks, c_sub, 2, NC + 1)
    f_c = fbar.reshape(n_chunks, c_sub, 2, NC)
    sign = jnp.array([-1, 1], idt)[None, :, None, None]
    mmdt = jnp.bfloat16 if mm_bf16 else jnp.float32
    t3r = t3.reshape(2 * NC, R, A).astype(mmdt)

    def one_chunk(carry, args):
        bc, fc = args
        psb = ps[bc]  # [c_sub, 2, NC+1, P*R]
        h = ((psb[:, :, 1:, :] - psb[:, :, :-1, :]) * sign).astype(
            jnp.float32
        )
        w0 = jnp.sum(h * (1.0 - fc[..., None]), axis=1)  # [c_sub, NC, P*R]
        w1 = jnp.sum(h * fc[..., None], axis=1)
        k = jnp.concatenate([w0, w1], axis=1).reshape(
            c_sub, 2 * NC, P_rep, R
        ).astype(mmdt)
        # contract (cell, row) against the pack for every (candidate, rep)
        out = jax.lax.dot_general(
            k, t3r, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c_sub, P, A]
        return carry, 2.0 * out

    _, out = jax.lax.scan(one_chunk, None, (b_c, f_c))
    out = out.reshape(n_chunks * c_sub, P_rep, A)[:C]
    return out.transpose(1, 0, 2)

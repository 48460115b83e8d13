"""Block-permutation significance engine with adaptive pruning.

Reference: scan_permute / scan_permute_thread
(/root/reference/scan-chromosome.c:336-652).  The C runs barrier-synchronized
rounds: one thread builds a genome-wide block permutation of SNP attributes,
then a pthread work queue re-runs the position search over each surviving
scan point's coarse interval against the permuted SNPs; a point counts an
exceedance when the permuted max CLR >= its observed CLR, and once it has
>= 20 exceedances it finishes probabilistically (scan-chromosome.c:488-494).
The first 10,000 null CLRs per point are retained (CLR_NULL_DIST_SAVE).

TPU-native redesign (SURVEY.md section 7): permutation replicates are batched
in chunks of R; each chunk is ONE device program per chromosome —
``lax.map`` over replicates of the lattice-batched two-stage CLR search, with
the permuted attribute gather, the position zoom, and the window geometry all
on device.  The host only updates exceedance counts and pruning masks between
chunks (data-dependent termination stays on host, compute stays compiled).

Test statistic: per coarse interval, max CLR over a FIXED fine position grid
(default 49 points — denser than the ~12 positions the C bisection probes,
scan-chromosome.c:103-139) x the alpha grid.  A fixed dense grid (rather
than an adaptive zoom) keeps every gather index replicate-invariant, which
is what lets the histogram kernel stack all replicates into the gather
width (ops/histclr.py hist_clr_reps); it also removes the zoom's greedy
selection noise.  The identical functional is applied to the observed data
(the exceedance thresholds are re-derived at permutation setup) and to every
null replicate — a valid Monte-Carlo test.  ScanResult.clr keeps the densely
scanned *reported* value.
"""

from __future__ import annotations

import dataclasses
import functools
import signal

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.histclr import (
    HistPoints,
    build_hist_points,
    build_prefix_sums_oh,
    hist_clr_reps_ps,
    hist_supported,
    make_hist_device_arrays,
    make_row_onehot_group_table,
)
from ..ops.lattice import LatticeTables, _two_stage_impl
from ..ops.permute import (
    PERM_GROUP,
    block_permutation_groups,
    block_permutation_indices,
)
from ..ops.windows import candidate_windows
from ..utils import MSG_STATUS, MSG_WARN, cr_logmsg, logmsg
from .scan import _pad_pow2, _pad_sites

CLR_NULL_DIST_SAVE = 10000  # scan-chromosome.c:227
PRUNE_THRESHOLD = 20  # scan-chromosome.c:490
N_PERM_POS = 13  # coarse anchor count; the statistic's fine grid has
# STAT_DENSIFY*(N_PERM_POS-1)+1 positions per interval (49 by default,
# ~2 kb pitch on 100 kb intervals — denser than the C bisection's probes)
STAT_DENSIFY = 4
POINT_BUCKET = 64  # scan points per dispatch (lattice fallback path)
REP_SUB = 8  # replicates per dispatch (one compiled shape)
HIST_REP_SUB = 16  # replicates per dispatch on the histogram fast path
HIST_POINT_BUCKET = 256  # scan points per hist dispatch: larger buckets
# amortize the per-chromosome prefix-sum build and per-dispatch overheads;
# bounds/fbar stay ~18 MB at 256 points x 49 fine candidates
HIST_COMPACT = True  # rebuild point buckets as pruning empties them

# dispatch counters for the most recent scan_permute call — tests assert the
# intended path (e.g. the sharded branch) actually ran, so a config change
# that silently drops to a fallback fails loudly instead of going untested
last_stats: dict = {}


@dataclasses.dataclass
class PermuteConfig:
    n_permute: int = 0
    permute_nbp: float = 0.1  # kept for CLI compatibility; the block width
    # rule (scan_width_mb) dominates block sizes (see ops/permute.py)
    scan_width_mb: float = 1.0
    chunk_replicates: int = 16
    seed: int = 0xFD821A6  # the reference's hard-coded seed (fscl.c:134-137)
    null_dist_save: int = CLR_NULL_DIST_SAVE
    alpha_factor: float = 1.0  # accepted and unused, like the reference
    checkpoint_path: str | None = None  # .npz saved after each chunk; a
    # pre-existing file resumes the run (engine/checkpoint.py)
    # histogram fast path (ops/histclr.py): run-length CLR with dense alphas;
    # auto-disabled for many-depth data (rows > 128) or huge chromosomes
    use_hist: bool = True
    hist_positions: int = N_PERM_POS  # per-interval position subgrid
    hist_alphas: int = 128  # dense lattice alpha grid (pitch ~0.19 log-units)
    hist_decimate: int = 8  # lattice decimation for the null statistic:
    # gather volume and matmul width shrink this factor; the run-mean
    # interpolation error grows to ~1 CLR unit at 8 (identical functional
    # for observed thresholds and null replicates, so the test stays valid
    # at any decimation — the scan's reported CLR stays exact regardless);
    # capped so the decimated lattice step stays under ~0.1 log_ad units


def _stat_max(
    packs, row, null, pos_pad, cand, lo, hi, istart, iend,
    *, grid_points, chunk, n, eval_range, n_pts, J,
):
    """The permutation test statistic: per-interval max CLR over the fixed
    J-point fine position grid (the same functional the hist path computes
    with hist_clr_reps, minus its run-mean interpolation).

    cand/lo/hi: [n_pts*J] flattened fixed grid (already padded arrays are
    sliced by the caller); istart/iend: [n_pts] interval bounds.
    Returns [n_pts] maxima.
    """
    pack_coarse, pack_fine, m_coarse, m_fine = packs
    clr1, _ = _two_stage_impl(
        pack_coarse, pack_fine, m_coarse, m_fine,
        row, pos_pad, null, cand, lo, hi,
        grid_points=grid_points, chunk=chunk,
    )  # [n_pts*J]
    return clr1.reshape(n_pts, J).max(axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("grid_points", "chunk", "start", "n", "w_pad",
                     "eval_range", "n_pts", "J"),
)
def _permute_batch_chr(
    pack_coarse, pack_fine, m_coarse, m_fine,
    row_gen, null_gen, sigma, pos_pad, cand, lo, hi, istart, iend,
    *, grid_points, chunk, start, n, w_pad, eval_range, n_pts, J,
):
    """Statistic maxima per (replicate, interval); returns [R, n_pts]."""

    packs = (pack_coarse, pack_fine, m_coarse, m_fine)

    def one_rep(sig_r):
        idx = jax.lax.dynamic_slice(sig_r, (start,), (n,))
        row = jnp.pad(row_gen[idx], (0, w_pad - n))
        null = jnp.pad(null_gen[idx], (0, w_pad - n))
        return _stat_max(
            packs, row, null, pos_pad, cand, lo, hi, istart, iend,
            grid_points=grid_points, chunk=chunk, n=n,
            eval_range=eval_range, n_pts=n_pts, J=J,
        )

    return jax.lax.map(one_rep, sigma)


@functools.partial(
    jax.jit,
    static_argnames=("grid_points", "chunk", "n", "eval_range", "n_pts", "J"),
)
def _observed_stat_chr(
    pack_coarse, pack_fine, m_coarse, m_fine,
    row, null, pos_pad, cand, lo, hi, istart, iend,
    *, grid_points, chunk, n, eval_range, n_pts, J,
):
    packs = (pack_coarse, pack_fine, m_coarse, m_fine)
    return _stat_max(
        packs, row, null, pos_pad, cand, lo, hi, istart, iend,
        grid_points=grid_points, chunk=chunk, n=n,
        eval_range=eval_range, n_pts=n_pts, J=J,
    )


class _InterruptState:
    """SIGINT -> dump current results and continue (scan-chromosome.c:554-569).

    A second interrupt within 10 seconds aborts, like the reference.
    """

    def __init__(self, dump_fn):
        self.dump_fn = dump_fn
        self.requested = False
        self._last = None
        self._prev = None

    def __enter__(self):
        def handler(signum, frame):
            import time as _t

            now = _t.monotonic()
            if self._last is not None and now - self._last < 10.0:
                raise KeyboardInterrupt("second interrupt, aborting permutation")
            self._last = now
            self.requested = True

        try:
            self._prev = signal.signal(signal.SIGINT, handler)
        except ValueError:  # not main thread
            self._prev = None
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            signal.signal(signal.SIGINT, self._prev)
        return False

    def maybe_dump(self):
        if self.requested:
            self.requested = False
            if self.dump_fn:
                self.dump_fn()


def perm_positions(istart, iend, n_pos):
    """The fixed fine position grid for each interval's statistic."""
    f = np.linspace(0.0, 1.0, n_pos)
    return (istart[:, None] + f[None, :] * (iend - istart)[:, None]).astype(
        np.int64
    )


class _ChrPermContext:
    """Per-chromosome static device arrays for the permutation rounds."""

    def __init__(self, data, cl, scan_cfg, result, pts, n_pos):
        self.n_pos = n_pos
        n = cl.n_snps
        self.start = cl.start_index
        self.n = n
        self.w_pad = _pad_sites(n)
        pos_pad = np.full(
            self.w_pad, np.iinfo(np.int32).max // 2, dtype=np.int32
        )
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        pos_pad[:n] = data.pos[sl]
        self.pos_pad = jnp.asarray(pos_pad)
        self.pos_np = np.asarray(data.pos[sl])
        self.point_ids = pts
        self.eval_range = scan_cfg.eval_range
        self.chunk = scan_cfg.chunk
        self._cache = {}

    def build_batch(self, result, pts_subset, fixed_bucket=None):
        """(device arrays, n_pts_pad, J) for an active subset, bucketed.

        With ``fixed_bucket`` the batch is padded to exactly that many points
        so every call shares one compiled shape."""
        nA = len(pts_subset)
        n_pts_pad = fixed_bucket or _pad_pow2(nA, minimum=4)
        ist = np.zeros(n_pts_pad, dtype=np.int64)
        ien = np.zeros(n_pts_pad, dtype=np.int64)
        ist[:nA] = result.interval_start[pts_subset]
        ien[:nA] = result.interval_end[pts_subset]
        cand = perm_positions(ist, ien, self.n_pos)  # [n_pts_pad, J]
        J = cand.shape[1]
        flat = cand.reshape(-1)
        ns, lo, hi = candidate_windows(self.pos_np, flat, self.eval_range)
        # dummy points: invalid windows
        dummy = np.repeat(np.arange(n_pts_pad) >= nA, J)
        lo = np.where(dummy, 1, lo)
        hi = np.where(dummy, 0, hi)
        return (
            jnp.asarray(flat.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
            jnp.asarray(ist.astype(np.int32)),
            jnp.asarray(ien.astype(np.int32)),
            n_pts_pad,
            J,
        )


def _apply_round_updates(result, active, threshold, rng, cfg, act, null_max,
                         rounds_done, R):
    """Exceedance counting + probabilistic pruning for one round's results.

    Mirrors scan-chromosome.c:488-498: an exceedance when the permuted max
    CLR >= the observed statistic; once permute_p >= 20 the point finishes
    with probability permute_p/permute_n per additional exceedance; the first
    null_dist_save null CLRs are retained.
    """
    for a, pt in enumerate(act):
        if result.permute_finished[pt]:
            continue
        vals = null_max[:, a]
        res = result.null_clr[pt]
        take = max(0, cfg.null_dist_save - len(res))
        if take:
            res.extend(vals[:take].tolist())
        exceed = vals >= threshold[pt]
        for e in np.where(exceed)[0]:
            result.permute_p[pt] += 1
            result.permute_n[pt] = rounds_done + int(e) + 1
            if (
                result.permute_p[pt] >= PRUNE_THRESHOLD
                and result.permute_p[pt] / max(result.permute_n[pt], 1)
                >= rng.random()
            ):
                result.permute_finished[pt] = True
                break
        if not result.permute_finished[pt]:
            result.permute_n[pt] = rounds_done + R
        active[pt] = not result.permute_finished[pt]


def scan_permute(data, tables, result, scan_cfg, cfg: PermuteConfig,
                 dump_fn=None, lattice=None):
    """Run up to cfg.n_permute block-permutation rounds with pruning.

    Mutates ``result`` in place: permute_n / permute_p / permute_finished and
    the per-point null CLR reservoirs.
    """
    if cfg.n_permute <= 0:
        return result
    last_stats.clear()
    last_stats.update(
        hist_sharded_dispatches=0,
        hist_unsharded_dispatches=0,
        lattice_dispatches=0,
    )
    if cfg.use_hist:
        from ..ops.histclr import hist_geometry_ok

        rows_used = np.unique(np.asarray(data.row))
        max_n = max((cl.n_snps for cl in data.chr_limits), default=0)
        geom_ok = all(
            hist_geometry_ok(
                data.pos[cl.start_index : cl.start_index + cl.n_snps]
            )
            for cl in data.chr_limits if cl.n_snps > 0
        )
        if hist_supported(len(rows_used), max_n) and geom_ok:
            return _scan_permute_hist(
                data, tables, result, scan_cfg, cfg, rows_used, dump_fn
            )
        logmsg(
            MSG_STATUS,
            "histogram permutation path unsupported here "
            "(%d distinct rows, %d sites); using the lattice path",
            len(rows_used), max_n,
        )

    rng = np.random.default_rng(cfg.seed)
    key0 = jax.random.key(cfg.seed)
    lt = lattice or LatticeTables(tables.table, tables.grid_points)
    packs = (lt.pack_coarse, lt.pack_fine, lt.m_coarse_dev, lt.m_fine_dev)
    G = tables.grid_points

    row_gen = jnp.asarray(data.row.astype(np.int32))
    null_gen = jnp.asarray(data.null_logl.astype(np.float32))
    gpos = data.genome_pos()
    width_bp = cfg.scan_width_mb * 1e6

    K = result.n_points
    for i in range(K):
        if result.null_clr[i] is None:
            result.null_clr[i] = []

    chr_ctx = []
    threshold = np.zeros(K)
    for c, cl in enumerate(data.chr_limits):
        pts = np.where(result.chr_id == c)[0]
        if len(pts) == 0:
            continue
        ctx = _ChrPermContext(
            data, cl, scan_cfg, result, pts,
            STAT_DENSIFY * (cfg.hist_positions - 1) + 1,
        )
        chr_ctx.append(ctx)
        # observed thresholds under the identical statistic, in the same
        # fixed-size point buckets the permutation rounds use
        row_pad = jnp.pad(
            row_gen[ctx.start : ctx.start + ctx.n], (0, ctx.w_pad - ctx.n)
        )
        null_pad = jnp.pad(
            null_gen[ctx.start : ctx.start + ctx.n], (0, ctx.w_pad - ctx.n)
        )
        for g0 in range(0, len(pts), POINT_BUCKET):
            grp = pts[g0 : g0 + POINT_BUCKET]
            cand, lo, hi, ist, ien, n_pts_pad, J = ctx.build_batch(
                result, grp, fixed_bucket=POINT_BUCKET
            )
            obs = _observed_stat_chr(
                *packs, row_pad, null_pad, ctx.pos_pad, cand, lo, hi, ist,
                ien, grid_points=G, chunk=ctx.chunk, n=ctx.n,
                eval_range=ctx.eval_range, n_pts=n_pts_pad, J=J,
            )
            threshold[grp] = np.asarray(obs)[: len(grp)]

    rounds_done = 0
    ckpt = None
    if cfg.checkpoint_path:
        from .checkpoint import Checkpointer

        ckpt = Checkpointer(cfg.checkpoint_path, result, cfg.seed)
        rounds_done = ckpt.rounds_done
        if rounds_done:
            logmsg(
                MSG_STATUS,
                "Resumed permutation checkpoint at %d rounds", rounds_done,
            )
    active = ~result.permute_finished.copy()

    def _progress():
        cr_logmsg(
            MSG_STATUS,
            "Scanning snp block permutations... %7d (%d scan pts remaining)",
            rounds_done,
            int(active.sum()),
        )

    with _InterruptState(dump_fn) as intr:
        while active.any() and rounds_done < cfg.n_permute:
            R = min(cfg.chunk_replicates, cfg.n_permute - rounds_done)
            # replicate keys derive from absolute indices, so a resumed run
            # replays the identical permutation stream whatever the chunking
            sigma = block_permutation_indices(
                key0, gpos, width_bp, R, start=rounds_done
            )

            # pad the replicate axis to a multiple of REP_SUB by repeating
            # the last row (extra results are discarded) so every dispatch
            # has the one compiled shape (REP_SUB x POINT_BUCKET)
            R_pad = -(-R // REP_SUB) * REP_SUB
            sigma_p = (
                jnp.concatenate(
                    [sigma, jnp.tile(sigma[-1:], (R_pad - R, 1))], axis=0
                )
                if R_pad != R
                else sigma
            )

            for ctx in chr_ctx:
                act_all = ctx.point_ids[active[ctx.point_ids]]
                if len(act_all) == 0:
                    continue
                group_mats = []
                for g0 in range(0, len(act_all), POINT_BUCKET):
                    act = act_all[g0 : g0 + POINT_BUCKET]
                    cand, lo, hi, ist, ien, n_pts_pad, J = ctx.build_batch(
                        result, act, fixed_bucket=POINT_BUCKET
                    )
                    outs = []
                    for r0 in range(0, R_pad, REP_SUB):
                        last_stats["lattice_dispatches"] += 1
                        outs.append(
                            _permute_batch_chr(
                                *packs, row_gen, null_gen,
                                sigma_p[r0 : r0 + REP_SUB],
                                ctx.pos_pad, cand, lo, hi, ist, ien,
                                grid_points=G, chunk=ctx.chunk,
                                start=ctx.start, n=ctx.n, w_pad=ctx.w_pad,
                                eval_range=ctx.eval_range,
                                n_pts=n_pts_pad, J=J,
                            )
                        )
                    nm = np.concatenate([np.asarray(o) for o in outs], axis=0)
                    group_mats.append((act, nm[:R, : len(act)]))

                for act, null_max in group_mats:
                    _apply_round_updates(
                        result, active, threshold, rng, cfg, act, null_max,
                        rounds_done, R,
                    )

            rounds_done += R
            _progress()
            if ckpt is not None:
                ckpt.save(result, rounds_done)
            intr.maybe_dump()

    if ckpt is not None:
        ckpt.close()
    logmsg(
        MSG_STATUS,
        "Scanning snp block permutations... finished (%d rounds).",
        rounds_done,
    )
    bad = ~np.isfinite(result.clr)
    if bad.any():
        logmsg(MSG_WARN, "%d scan points with non-finite CLR", int(bad.sum()))
    return result




@functools.partial(jax.jit, static_argnames=("start", "n", "w_pad"))
def _perm_ps(oh8_table, sigma8, *, start, n, w_pad):
    """Permuted-attribute prefix sums [w_pad+1, P*R] for one chromosome.

    The permuted one-hot stream is a GROUP-level row gather of the packed
    genome table (make_row_onehot_group_table) at sigma8
    (block_permutation_groups): block boundaries quantize to
    PERM_GROUP-site multiples, so each gathered row is PERM_GROUP
    consecutive sites' one-hots — PERM_GROUP x fewer gather rows than the
    per-site gather it replaces, at the same total bytes.  The gather +
    prefix pass are identical for every point bucket — the driver runs
    this ONCE per (replicate slice, chromosome) and feeds every bucket's
    _hist_stat.  sigma8 must be sentinel-padded by the caller so the
    slice [start//G, start//G + w_pad//G + 1) stays in bounds.
    """
    from ..ops.permute import PERM_GROUP

    P_rep = sigma8.shape[0]
    GR = oh8_table.shape[1]
    R = GR // PERM_GROUP
    g0 = start // PERM_GROUP
    off = start - g0 * PERM_GROUP
    G_loc = w_pad // PERM_GROUP + 1
    idx8 = jax.lax.dynamic_slice(
        sigma8, (0, g0), (P_rep, G_loc)
    ).T  # [G_loc, P]
    oh = oh8_table[idx8]  # [G_loc, P, G*R] i8 row gather
    oh = oh.reshape(G_loc, P_rep, PERM_GROUP, R).transpose(0, 2, 1, 3)
    oh = oh.reshape(G_loc * PERM_GROUP, P_rep, R)[off : off + w_pad]
    # zero sites >= n: trailing groups can carry neighbor-chromosome or
    # sentinel-tail attributes
    mask = (jnp.arange(w_pad, dtype=jnp.int32) < n)[:, None, None]
    oh = jnp.where(mask, oh, jnp.int8(0))
    return build_prefix_sums_oh(oh.reshape(w_pad, P_rep * R))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rep", "n_cells", "n_rows", "n_alpha", "c_sub", "n_pts", "Jf",
    ),
)
def _hist_stat(t3, bounds, fbar, ps,
               *, n_rep, n_cells, n_rows, n_alpha, c_sub, n_pts, Jf):
    """Statistic maxima per (replicate, point); returns [R, n_pts].

    Statistic: max CLR over the FULL Jf-point fine position grid x the dense
    n_alpha lattice alpha grid of each interval.  Evaluating every fine
    position (rather than a coarse subgrid + per-replicate zoom) keeps the
    bounds gather indices replicate-invariant, which lets hist_clr_reps_ps
    stack all replicates into the gather width — the zoom's data-dependent
    indices would force per-replicate narrow gathers, which cost more than
    the extra positions.
    """
    clr = hist_clr_reps_ps(
        t3, bounds, fbar, ps, n_rep=n_rep,
        n_cells=n_cells, n_rows=n_rows, n_alpha=n_alpha, c_sub=c_sub,
    )  # [P, n_pts*Jf, A]
    return clr.reshape(n_rep, n_pts, Jf * n_alpha).max(axis=2)


def _hist_perm_batch(t3, bounds, fbar, row_cg, sigma8,
                     *, n_cells, n_rows, n_alpha, c_sub, start, n, w_pad,
                     n_pts, Jf):
    """_perm_ps + _hist_stat in one call (micro-benchmarks, single bucket).

    Takes per-site row ids (row_cg) and builds the packed group table
    itself; sigma8 is GROUP-level (block_permutation_groups) and must
    already carry the sentinel padding _perm_ps needs.  The production
    driver holds the table and calls _perm_ps directly.
    """
    ps = _perm_ps(
        make_row_onehot_group_table(row_cg, n_rows=n_rows), sigma8,
        start=start, n=n, w_pad=w_pad,
    )
    return _hist_stat(
        t3, bounds, fbar, ps, n_rep=sigma8.shape[0], n_cells=n_cells,
        n_rows=n_rows, n_alpha=n_alpha, c_sub=c_sub, n_pts=n_pts, Jf=Jf,
    )


def _bucket_size(n_active):
    """Smallest power-of-4 bucket >= n_active, capped at HIST_POINT_BUCKET.

    Kernel cost scales with the padded point count, so late pruning rounds
    (a handful of survivors) run in 4/16/64-point buckets instead of
    padding to 256; each distinct size is one extra compiled shape, cached
    persistently."""
    b = 4
    while b < min(n_active, HIST_POINT_BUCKET):
        b *= 4
    return b


def _bucket_cand(result, pts, n_pts, Jf):
    """[n_pts*Jf] fine-grid candidate positions for one point bucket."""
    ist = np.zeros(n_pts, dtype=np.int64)
    ien = np.zeros(n_pts, dtype=np.int64)
    ist[: len(pts)] = result.interval_start[pts]
    ien[: len(pts)] = result.interval_end[pts]
    f = np.linspace(0.0, 1.0, Jf)
    return (ist[:, None] + f[None, :] * (ien - ist)[:, None]).astype(
        np.int64
    ).reshape(-1)


class _ChrHistBucket:
    """One fixed bucket of scan points with precomputed fine-grid geometry."""

    def __init__(self, ht, pos_np, result, pts, J, eval_range,
                 device_arrays=None, n_pts=None, points=None):
        self.pts = pts
        n_pts = n_pts or HIST_POINT_BUCKET
        Jf = STAT_DENSIFY * (J - 1) + 1
        if points is None:
            points = build_hist_points(
                ht, pos_np, _bucket_cand(result, pts, n_pts, Jf),
                eval_range, cand_pad=Jf, device_arrays=device_arrays,
            )
        self.points = points
        self.n_pts = n_pts
        self.J = J
        self.Jf = Jf


def _bucket_groups(pts):
    """Split a point set into dispatch buckets.

    Full HIST_POINT_BUCKET groups, then the remainder at 64-point
    granularity with a power-of-4 tail — padding waste stays < 64 points
    while every shape comes from the small set {4, 16, 64, 256}.  The
    per-chromosome prefix-sum build is hoisted out of the bucket loop, so
    extra buckets cost only one statistic dispatch each."""
    groups = []
    n_full = len(pts) // HIST_POINT_BUCKET * HIST_POINT_BUCKET
    for g0 in range(0, n_full, HIST_POINT_BUCKET):
        groups.append(
            (pts[g0 : g0 + HIST_POINT_BUCKET], HIST_POINT_BUCKET)
        )
    rem = pts[n_full:]
    for g0 in range(0, len(rem), 64):
        grp = rem[g0 : g0 + 64]
        groups.append((grp, _bucket_size(len(grp))))
    return groups


def _build_buckets(ht, pos_np, result, groups, J, eval_range, dev_arrays):
    """All point buckets of one chromosome from ONE merged geometry build.

    build_hist_points is one device dispatch; per-bucket calls each pay the
    slow host link's round trip, so every bucket's candidates are
    concatenated into a single call and the device outputs sliced."""
    Jf = STAT_DENSIFY * (J - 1) + 1
    cands = [_bucket_cand(result, pts, n_pts, Jf) for pts, n_pts in groups]
    merged = build_hist_points(
        ht, pos_np, np.concatenate(cands) if cands else np.zeros(0, np.int64),
        eval_range, cand_pad=Jf, device_arrays=dev_arrays,
    )
    buckets = []
    off = 0
    for pts, n_pts in groups:
        sz = n_pts * Jf
        hp = HistPoints(
            bounds=merged.bounds[off : off + sz],
            fbar=merged.fbar[off : off + sz],
            n_cand=sz,
            n_real=len(pts) * Jf,
        )
        buckets.append(
            _ChrHistBucket(ht, pos_np, result, pts, J, eval_range,
                           n_pts=n_pts, points=hp)
        )
        off += sz
    return buckets


def _scan_permute_hist(data, tables, result, scan_cfg, cfg: PermuteConfig,
                       rows_used, dump_fn=None):
    """Histogram fast-path permutation driver (see ops/histclr.py).

    Statistic: per coarse interval, max CLR over a fixed hist_positions-point
    subgrid x a dense hist_alphas lattice alpha grid, applied identically to
    the observed data (thresholds) and every permuted replicate.  Point
    buckets are FIXED across rounds (run boundaries are precomputed per
    bucket); pruning skips a bucket once all its points finish.
    """
    rng = np.random.default_rng(cfg.seed)
    key0 = jax.random.key(cfg.seed)
    J = cfg.hist_positions

    import time as _time

    _tt = _time.monotonic()
    # decimation cap + per-dataset memo live in make_scan_hist_tables; when
    # the scan ran with the same (n_alpha, decimation) the table pack is
    # reused as-is
    from .scan import make_scan_hist_tables

    ht = make_scan_hist_tables(
        data, tables, n_alpha=cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    assert ht is not None  # caller gated on hist_supported + geometry
    row_cg = jnp.asarray(ht.row_map[np.asarray(data.row)].astype(np.int32))
    oh_table = make_row_onehot_group_table(row_cg, n_rows=ht.n_rows)
    gpos = data.genome_pos()
    width_bp = cfg.scan_width_mb * 1e6
    n_groups = oh_table.shape[0] - 1  # sentinel row index
    # sigma sentinel margin: _perm_ps slices [start//G, start//G + w_pad//G
    # + 1) — pad group columns so every chromosome's slice stays in bounds
    margin = 2 + max(
        (
            cl.start_index // PERM_GROUP
            + _pad_sites(cl.n_snps) // PERM_GROUP
            + 1
            - n_groups
            for cl in data.chr_limits
        ),
        default=2,
    )
    margin = max(margin, 2)

    def _pad_sigma(sig8):
        return jnp.concatenate(
            [
                sig8,
                jnp.full(
                    (sig8.shape[0], margin), n_groups, sig8.dtype
                ),
            ],
            axis=1,
        )

    K = result.n_points
    for i in range(K):
        if result.null_clr[i] is None:
            result.null_clr[i] = []

    # per-chromosome bucket contexts + observed thresholds
    from ..utils import MSG_DEBUG1 as MSG_DEBUG

    logmsg(MSG_DEBUG, "hist tables: %.1fs", _time.monotonic() - _tt)
    _t0 = _time.monotonic()
    threshold = np.zeros(K)
    chr_buckets = []  # (start, n, w_pad, [buckets])
    obs_sigma = _pad_sigma(jnp.arange(n_groups, dtype=jnp.int32)[None, :])
    obs_pending = []  # (bucket, device stat) — drained once, below
    for c, cl in enumerate(data.chr_limits):
        pts = np.where(result.chr_id == c)[0]
        if len(pts) == 0:
            continue
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        pos_np = np.asarray(data.pos[sl])
        n = cl.n_snps
        w_pad = _pad_sites(n)
        dev_arrays = make_hist_device_arrays(ht, pos_np)
        buckets = _build_buckets(
            ht, pos_np, result, _bucket_groups(pts), J,
            scan_cfg.eval_range, dev_arrays,
        )
        obs_ps = _perm_ps(
            oh_table, obs_sigma, start=cl.start_index, n=n, w_pad=w_pad,
        )
        for b in buckets:
            obs = _hist_stat(
                ht.t3, b.points.bounds, b.points.fbar, obs_ps, n_rep=1,
                n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
                c_sub=32, n_pts=b.n_pts, Jf=b.Jf,
            )
            obs_pending.append((b, obs))
        chr_buckets.append(
            [cl.start_index, n, w_pad, buckets, pos_np, dev_arrays]
        )
    if obs_pending:
        # one concatenated device vector -> ONE host readback (the slow
        # tunnel pays per round trip, not per byte, at these sizes)
        obs_cat = np.asarray(
            jnp.concatenate([o[0, : len(b.pts)] for b, o in obs_pending])
        )
        off = 0
        for b, _ in obs_pending:
            threshold[b.pts] = obs_cat[off : off + len(b.pts)]
            off += len(b.pts)
    logmsg(
        MSG_DEBUG, "hist permutation setup: %.1fs (%d buckets)",
        _time.monotonic() - _t0,
        sum(len(e[3]) for e in chr_buckets),
    )

    rounds_done = 0
    ckpt = None
    if cfg.checkpoint_path:
        from .checkpoint import Checkpointer

        ckpt = Checkpointer(cfg.checkpoint_path, result, cfg.seed)
        rounds_done = ckpt.rounds_done
        if rounds_done:
            logmsg(
                MSG_STATUS,
                "Resumed permutation checkpoint at %d rounds", rounds_done,
            )
    active = ~result.permute_finished.copy()

    # replicate sharding over the device mesh: the hist path has per-replicate
    # state and no cross-replicate communication, so replicates spread over
    # every device (ICI within a slice, DCN across hosts) with no collectives
    ndev = jax.device_count()
    mesh = None
    rep_step = HIST_REP_SUB
    if ndev > 1:
        from ..parallel import make_scan_mesh
        from ..parallel.shard import (
            gather_to_host, sharded_hist_permute, to_global,
        )

        mesh = make_scan_mesh()
        rep_step = HIST_REP_SUB * ndev
        logmsg(
            MSG_STATUS,
            "Permutation replicates sharded over %d devices (%d processes)",
            ndev, jax.process_count(),
        )

    def _progress():
        cr_logmsg(
            MSG_STATUS,
            "Scanning snp block permutations... %7d (%d scan pts remaining)",
            rounds_done,
            int(active.sum()),
        )

    # sigma is ALWAYS generated at one fixed replicate count (the full-chunk
    # padding): a short final chunk then reuses both the sigma program and
    # every dispatch shape (generating [R_small, N] would recompile the
    # whole permutation program for one chunk); extra rows cost ~nothing
    # and are never dispatched
    _rs = rep_step if mesh is not None else HIST_REP_SUB
    R_gen = -(-cfg.chunk_replicates // _rs) * _rs  # multiple of every
    # dispatch step, so all slice windows stay inside the generated rows

    # adaptive cadence: once pruning leaves few survivors, the per-chunk
    # fixed costs (sigma program, dispatch round-trips, host updates)
    # dominate, so the replicate count per chunk grows 16x/64x (the
    # per-dispatch replicate slice stays bounded by ps_rep_cap below, so a
    # boosted chunk is just MORE dispatches per fixed cost).  Boost levels
    # are quantized so each sigma shape compiles once; a memory cap bounds
    # sigma at ~4 GB (the tunnel pays ~20-25 ms latency per dispatch, so
    # genome-scale pruning tails — a handful of immortal points spread over
    # many chromosomes — are dispatch-latency-bound and want the largest
    # replicate slices HBM allows).  The boost depends only on the active
    # count, which is deterministic given the config, so runs stay
    # reproducible.
    boost_cap = max(1, 1_024_000_000 // max(n_groups, 1) // max(R_gen, 1))

    def _boost(n_act):
        b = 1
        if n_act <= HIST_POINT_BUCKET // 4:
            b = 16
        if n_act <= HIST_POINT_BUCKET // 16:
            b = 64
        while b > boost_cap:
            b //= 4
        return max(b, 1)

    with _InterruptState(dump_fn) as intr:
        while active.any() and rounds_done < cfg.n_permute:
            _tr = _time.monotonic()
            boost = _boost(int(active.sum()))
            R = min(cfg.chunk_replicates * boost,
                    cfg.n_permute - rounds_done)
            # shard only when the replicate padding stays reasonable (small
            # final chunks run unsharded rather than pad 8x)
            shard_now = mesh is not None and -(-R // rep_step) * rep_step <= 2 * R
            step_now = rep_step if shard_now else HIST_REP_SUB
            R_pad = -(-R // step_now) * step_now
            sigma_p = _pad_sigma(block_permutation_groups(
                key0, gpos, width_bp, R_gen * boost, start=rounds_done
            ))

            pending = []  # (bucket, [device stats]) — drained after ALL
            # dispatches are enqueued: buckets hold disjoint points, so the
            # results are identical to interleaved updates, but the host
            # pays ONE pipeline drain per chunk instead of one slow-tunnel
            # round trip per bucket
            for chrb in chr_buckets:
                start, n, w_pad, buckets, pos_np, dev_arrays = chrb
                # bucket compaction: pruning strands a few active points in
                # full-size buckets; rebuild (one device geometry dispatch)
                # only when the padded dispatch cost at least halves —
                # kernel cost scales with the padded point count, so late
                # rounds with a handful of survivors run in 4/16-point
                # buckets rather than padding to 64
                act_chr = np.concatenate(
                    [b.pts[active[b.pts]] for b in buckets]
                ) if HIST_COMPACT else None
                if act_chr is not None and len(act_chr) > 0:
                    groups = _bucket_groups(act_chr)
                    old_padded = sum(
                        b.n_pts for b in buckets if active[b.pts].any()
                    )
                    if 2 * sum(np_ for _, np_ in groups) <= old_padded:
                        buckets = _build_buckets(
                            ht, pos_np, result, groups, J,
                            scan_cfg.eval_range, dev_arrays,
                        )
                        chrb[3] = buckets
                live = [b for b in buckets if active[b.pts].any()]
                if not live:
                    continue
                # one replicate-slice width for the whole chromosome so ONE
                # prefix-sum build (sigma gather + one-hot cumsum, ~5 ms)
                # serves every bucket's statistic dispatch.  Kernel cost
                # scales with (reps x padded points), so small padded
                # bucket sets take proportionally more replicates per
                # dispatch (capped by the boost so slice shapes stay within
                # the generated sigma); the factor is a power of 4 so each
                # (rep, bucket) shape compiles once.
                max_pts = max(b.n_pts for b in live)
                # per-dispatch replicate slice: enough replicates to fill
                # the point padding, but bounded so the [w_pad+1, P*R]
                # int16 prefix buffer stays under ~1.6 GB (bigger slices
                # amortize the per-dispatch tunnel latency that dominates
                # pruning tails)
                ps_rep_cap = max(
                    1, 800_000_000 // max(w_pad * ht.n_rows, 1) // step_now
                )
                sub_b = step_now * min(
                    HIST_POINT_BUCKET // max_pts, boost, ps_rep_cap
                )
                pad_b = -(-R_pad // sub_b) * sub_b

                def chr_fn(sig, live=live, start=start, n=n, w_pad=w_pad):
                    ps = _perm_ps(oh_table, sig, start=start, n=n,
                                  w_pad=w_pad)
                    return tuple(
                        _hist_stat(
                            ht.t3, b.points.bounds, b.points.fbar, ps,
                            n_rep=sig.shape[0], n_cells=ht.n_cells,
                            n_rows=ht.n_rows, n_alpha=ht.n_alpha,
                            c_sub=32, n_pts=b.n_pts, Jf=b.Jf,
                        )
                        for b in live
                    )

                outs_slices = []
                for r0 in range(0, pad_b, sub_b):
                    if shard_now:
                        outs_slices.append(sharded_hist_permute(
                            mesh, chr_fn,
                            to_global(mesh, sigma_p[r0 : r0 + sub_b],
                                      jax.sharding.PartitionSpec(
                                          ("perm", "site"))),
                            n_out=len(live),
                        ))
                        last_stats["hist_sharded_dispatches"] += 1
                    else:
                        outs_slices.append(chr_fn(sigma_p[r0 : r0 + sub_b]))
                        last_stats["hist_unsharded_dispatches"] += 1
                for k, b in enumerate(live):
                    pending.append((b, [o[k] for o in outs_slices]))
            if pending:
                # concatenate every bucket's [R, n_active] block device-side
                # and read back ONCE per chunk
                cat = jnp.concatenate(
                    [
                        jnp.concatenate(outs, axis=0)[:R, : len(b.pts)]
                        for b, outs in pending
                    ],
                    axis=1,
                )
                nm_cat = (
                    gather_to_host(cat) if mesh is not None
                    else np.asarray(cat)
                )
                off = 0
                for b, _ in pending:
                    _apply_round_updates(
                        result, active, threshold, rng, cfg, b.pts,
                        nm_cat[:, off : off + len(b.pts)], rounds_done, R,
                    )
                    off += len(b.pts)

            rounds_done += R
            _progress()
            logmsg(
                MSG_DEBUG, "hist round chunk of %d: %.1fs", R,
                _time.monotonic() - _tr,
            )
            if ckpt is not None:
                ckpt.save(result, rounds_done)
            intr.maybe_dump()

    if ckpt is not None:
        ckpt.close()
    logmsg(
        MSG_STATUS,
        "Scanning snp block permutations... finished (%d rounds).",
        rounds_done,
    )
    return result

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

Test statistic: per coarse interval, max CLR over a FIXED position grid
(default 7 points — deliberately COARSE, see N_PERM_POS below: broad sweep
signals survive a coarse grid, spiky null maxima do not, and the measured
detection power at matched FPR is within ~1% of the C's adaptive-bisection
estimand, scan-chromosome.c:103-139) x a 32-probe alpha grid.  A fixed grid
(rather than an adaptive zoom) keeps every gather index replicate-invariant,
which is what lets the histogram kernel stack all replicates into the gather
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
    build_hist_points,
    build_prefix_sums_oh,
    build_prefix_sums_seg,
    hist_clr_reps_ps,
    hist_supported,
    make_row_index_group_table,
    make_row_onehot_group_table,
    make_row_weight_group_table,
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
N_PERM_POS = 7  # coarse anchor count; the statistic's fine grid has
# STAT_DENSIFY*(N_PERM_POS-1)+1 positions per interval (7 by default,
# ~16.7 kb pitch on 100 kb intervals).  DELIBERATELY COARSE (round 5):
# sweep signals are broad (footprint ~e^LOG_AD_MAX/alpha bp, hundreds of
# kb to Mb), so a coarse grid still captures the observed peak, while
# null-landscape maxima are spiky and a dense grid inflates them — the
# same asymmetry the C's greedy bisection exploits implicitly by
# undershooting noise maxima (scan-chromosome.c:103-139).  Measured
# (bench/power_recovery.py, 48 reps, matched empirical FPR): 49-point
# grid cost 6.5% detection power at the 0.05 operating point vs the C;
# 13 points cost 3.1%; 7 points cost 1.1% at 0.05 and GAINED 5.8% at
# 0.01 (PARITY.md round-5 power section).  The alpha-probe count was
# A/B'd separately and does not move power (128 vs 32 identical).
STAT_DENSIFY = 1
POINT_BUCKET = 64  # scan points per dispatch (lattice fallback path)
REP_SUB = 8  # replicates per dispatch (one compiled shape)
HIST_REP_SUB = 16  # replicates per dispatch on the histogram fast path
HIST_POINT_BUCKET = 256  # scan points per hist dispatch: larger buckets
# amortize the per-chromosome prefix-sum build and per-dispatch overheads;
# bounds/fbar stay ~18 MB at 256 points x 49 fine candidates
HIST_COMPACT = True  # rebuild point buckets as pruning empties them
# Run-decomposed permuted-prefix (RDP) tail path: when the active bound
# set is far smaller than the live genome, each replicate's permuted
# prefix is assembled at the bounds from two precomputed tables
# (ops/histclr.py rdp_clr_reps) instead of materializing the permuted
# one-hot stream — per-replicate cost scales with bounds, not sites.
# "auto" switches by the cost rule below; "on"/"off" force (tests, A/B).
RDP_FORCE = __import__("os").environ.get("FSCL_RDP", "auto")
# auto rule: RDP when RDP_BOUNDS_FACTOR * active-bound entries <
# live sites.  The factor is MEASURED, not modeled: on the genome1m
# 22-point tail (58.8k bound entries, 778k live sites) a same-session
# A/B clocked RDP at 91 ms per 16-replicate slice (~1.55 us per bound
# entry — the [M, P]-indexed narrow gathers run far below the wide-row
# gather rate) vs the stacked path's 51 ms (~66 ns per live site), so
# the crossover sits near entries ~= sites / 24.  RDP therefore takes
# over only for the last ~dozen immortal points, where the stacked
# path's O(live sites) per replicate is maximally wasteful.
RDP_BOUNDS_FACTOR = 24
# group-granular hist statistic (round 5, _stack_stat_g): bounds snap to
# permutation-group boundaries so every per-replicate structure lives at
# group resolution — PERM_GROUP x less gather/prefix traffic and NO
# transpose (the site-level pipeline's wall was 47% relayout,
# bench/micro_stack.py).  Exact one-hot mode only; env kill-switch.
# DEFAULT OFF: the snap is immaterial for FAR distance cells (thousands
# of sites) but moves up to PERM_GROUP/2 sites across NEAR-cell
# boundaries that legitimately hold 0-2 sites, materially perturbing the
# large-alpha statistic (measured exceedance-fraction shifts up to 0.5
# on an 18k-site config).  The test stays VALID (identical functional
# both sides) but the estimand degrades; kept as an opt-in experiment.
GROUP_STAT = __import__("os").environ.get("FSCL_GROUP_STAT", "0") == "1"
# the <= PERM_GROUP/2-site bound snap is negligible when windows hold
# tens of thousands of sites (genome/100k-scale data) but material on
# small chromosomes (a 16-site snap on a few-hundred-site window moves
# whole percent of the window): group mode engages only when every
# chromosome clears this site count, below it the exact site-level
# statistic runs
GROUP_STAT_MIN_SITES = 16384
# Per-chunk sigma footprint cap (elements): bounds chunk_replicates x boost
# so a single chunk's permutation stream stays inside the envelope the
# tunnel worker demonstrably survives.  2048-replicate chunks at genome
# scale (97k groups, ~800 MB sigma + its padded copy + the in-flight
# speculative sigma) killed the worker with FAILED_PRECONDITION the first
# time the boost-64 tier fired on 778k sites; 544-replicate chunks (53M
# elements) have run 100k-permutation genomes repeatedly.  Small genomes
# (few groups) keep the full boost ladder.
SIGMA_ELEM_CAP = 64_000_000
# Speculative next-chunk stat dispatch (pruning-tail boundary overlap):
# the next chunk's statistic dispatches are enqueued BEFORE the current
# chunk's blocking readback, so the device rolls straight into them
# during the drain/host-update window.  Kill-switch for A/B and tests;
# results are bitwise identical either way (replicate rows are pure
# functions of their absolute stream index).
STAT_SPEC = __import__("os").environ.get("FSCL_STAT_SPEC", "1") == "1"
# Thin permuted-stream gather (exact one-hot mode): gather i16 row-id
# rows (make_row_index_group_table) and expand to one-hot on chip instead
# of gathering the n_rows x fatter one-hot rows.  The XLA gather is
# byte-bound at ~26 GB/s (bench/micro_idx.py) — the fat rows were the
# permutation chunk's dominant cost at genome scale.  Bitwise-identical
# statistic; kill-switch for A/B.
THIN_OH = __import__("os").environ.get("FSCL_THIN_OH", "1") == "1"

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
    # auto-disabled for huge chromosomes (mixed-depth data compresses)
    use_hist: bool = True
    # bfloat16 statistic contraction (~2x MXU rate): the identical
    # functional applies to observed thresholds and null replicates, so
    # the Monte-Carlo test stays valid at any matmul precision; reported
    # scan CLRs always come from the exact f32 lattice kernel
    hist_bf16: bool = True
    hist_positions: int = N_PERM_POS  # per-interval position subgrid
    stat_densify: int | None = None  # fine-position densification of the
    # statistic's grid (None = module STAT_DENSIFY); the statistic has
    # stat_densify*(hist_positions-1)+1 positions per interval
    hist_alphas: int = 32  # lattice alpha probes for the statistic
    # (pitch ~0.77 log-units): the 128-vs-32 power A/B measured IDENTICAL
    # detection (alpha profiles are smooth, so a 4x coarser max changes
    # nothing statistically) and the statistic matmul is 4x narrower
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


def stat_positions(cfg: "PermuteConfig") -> int:
    """Jf: the statistic's fine position-grid size per interval."""
    return (cfg.stat_densify or STAT_DENSIFY) * (cfg.hist_positions - 1) + 1


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


def _record_thresholds(result, pts, threshold):
    """Store the observed permutation-statistic values on the result so the
    tail projection (engine/pvalues.py) uses the SAME threshold the
    exceedance counts compare against."""
    if getattr(result, "stat_threshold", None) is None:
        result.stat_threshold = np.full(result.n_points, np.nan)
    result.stat_threshold[pts] = threshold[pts]


def _apply_round_updates(result, active, threshold, rng, cfg, act, null_max,
                         rounds_done, R):
    """Exceedance counting + probabilistic pruning for one round's results.

    Mirrors scan-chromosome.c:488-498: an exceedance when the permuted max
    CLR >= the observed statistic; once permute_p >= 20 the point finishes
    with probability permute_p/permute_n per additional exceedance; the first
    null_dist_save null CLRs are retained.

    Vectorized over points except the per-exceedance pruning walk, which
    stays serial to consume the host RNG stream in exactly the reference
    order (one draw per exceedance past the threshold, points in ``act``
    order) — results are bitwise identical to the naive per-point loop
    (tests/test_permute_hist.py::test_round_updates_vectorized).
    """
    act = np.asarray(act)
    alive = ~result.permute_finished[act]
    a_alive = np.nonzero(alive)[0]
    if len(a_alive) == 0:
        return
    # null-CLR reservoirs: one vectorized full-check, per-point extends
    # only while below cap (late rounds skip the whole block)
    cap = cfg.null_dist_save
    lens = np.fromiter(
        (len(result.null_clr[act[a]]) for a in a_alive), np.int64,
        count=len(a_alive),
    )
    for a in a_alive[lens < cap]:
        pt = act[a]
        res = result.null_clr[pt]
        res.extend(null_max[: cap - len(res), a].tolist())
    # exceedance scan: ONE vectorized compare; only columns with any
    # exceedance run the serial pruning walk
    exceed_mat = null_max[:, a_alive] >= threshold[act[a_alive]][None, :]
    finished = np.zeros(len(act), dtype=bool)
    for j in np.nonzero(exceed_mat.any(axis=0))[0]:
        a = a_alive[j]
        pt = act[a]
        for e in np.nonzero(exceed_mat[:, j])[0]:
            result.permute_p[pt] += 1
            result.permute_n[pt] = rounds_done + int(e) + 1
            if (
                result.permute_p[pt] >= PRUNE_THRESHOLD
                and result.permute_p[pt] / max(result.permute_n[pt], 1)
                >= rng.random()
            ):
                finished[a] = True
                break
        if finished[a]:
            result.permute_finished[pt] = True
    survivors = act[a_alive[~finished[a_alive]]]
    result.permute_n[survivors] = rounds_done + R
    active[act[a_alive]] = ~finished[a_alive]


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
        hist_deferred_rebuilds=0,
        lattice_dispatches=0,
        lattice_sharded_dispatches=0,
        rdp_dispatches=0,
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
    from .scan import get_lattice_tables

    lt = lattice or get_lattice_tables(tables)
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
            stat_positions(cfg),
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
    _record_thresholds(result, np.arange(K), threshold)

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

    # replicate sharding over the device mesh, mirroring the hist path:
    # the lattice statistic is embarrassingly parallel over replicates
    ndev = jax.device_count()
    mesh = None
    rep_step = REP_SUB
    if ndev > 1:
        from ..parallel import make_scan_mesh
        from ..parallel.shard import gather_to_host, to_global

        mesh = make_scan_mesh()
        rep_step = REP_SUB * ndev
        logmsg(
            MSG_STATUS,
            "Lattice permutation replicates sharded over %d devices "
            "(%d processes)", ndev, jax.process_count(),
        )

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
            # shard only when the replicate padding stays reasonable
            shard_now = (
                mesh is not None
                and -(-R // rep_step) * rep_step <= 2 * R
            )
            step_now = rep_step if shard_now else REP_SUB
            R_pad = -(-R // step_now) * step_now
            sigma = block_permutation_indices(
                key0, gpos, width_bp, R_pad, start=rounds_done
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
                    for r0 in range(0, R_pad, step_now):

                        def stat_fn(sig_l, cand=cand, lo=lo, hi=hi,
                                    ist=ist, ien=ien, n_pts_pad=n_pts_pad,
                                    J=J, ctx=ctx):
                            return _permute_batch_chr(
                                *packs, row_gen, null_gen, sig_l,
                                ctx.pos_pad, cand, lo, hi, ist, ien,
                                grid_points=G, chunk=ctx.chunk,
                                start=ctx.start, n=ctx.n, w_pad=ctx.w_pad,
                                eval_range=ctx.eval_range,
                                n_pts=n_pts_pad, J=J,
                            )

                        if shard_now:
                            last_stats["lattice_sharded_dispatches"] += 1
                            f = _sharded_lattice_fn(
                                mesh, G, ctx.chunk, ctx.start, ctx.n,
                                ctx.w_pad, ctx.eval_range, n_pts_pad, J,
                            )
                            outs.append(f(
                                *packs, row_gen, null_gen,
                                to_global(
                                    mesh, sigma[r0 : r0 + step_now],
                                    jax.sharding.PartitionSpec(
                                        ("perm", "site")
                                    ),
                                ),
                                ctx.pos_pad, cand, lo, hi, ist, ien,
                            ))
                        else:
                            last_stats["lattice_dispatches"] += 1
                            outs.append(stat_fn(sigma[r0 : r0 + step_now]))
                    cat = (
                        jnp.concatenate(outs, axis=0) if len(outs) > 1
                        else outs[0]
                    )
                    nm = (
                        gather_to_host(cat) if mesh is not None
                        else np.asarray(cat)
                    )
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


def _fine_cand(result, pts, Jf):
    """[len(pts)*Jf] fine-grid candidate positions for a point set."""
    ist = result.interval_start[pts]
    ien = result.interval_end[pts]
    f = np.linspace(0.0, 1.0, Jf)
    return (ist[:, None] + f[None, :] * (ien - ist)[:, None]).astype(
        np.int64
    ).reshape(-1)


# segment-count padding ladder: one compiled program per rung, so the
# stacked dispatch shape changes only ~log-many times as pruning empties
# chromosomes (pure power-of-2 padding would waste up to 2x prefix-sum
# work at large segment counts; the 12/24/48/96 rungs cap waste at ~33%)
_SEG_LADDER = (1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def _ladder_pad(n):
    for v in _SEG_LADDER:
        if v >= n:
            return v
    return -(-n // 256) * 256


@functools.partial(
    jax.jit,
    static_argnames=(
        "w_seg_p", "n_seg", "n_rows", "n_cells", "n_alpha",
        "sub_rep", "n_slices", "n_pts", "Jf", "mm_bf16",
    ),
)
def _stack_stat(oh_table, sigma8, seg_g0, seg_off, seg_n, bounds, fbar, t3,
                *, w_seg_p, n_seg, n_rows, n_cells, n_alpha,
                sub_rep, n_slices, n_pts, Jf, mm_bf16=False):
    """Statistic maxima for stacked chromosome segments; [R, n_pts].

    All live chromosomes of one padded-length class stack onto a single
    flat site axis of n_seg segments x w_seg_p slots; the per-segment
    prefix sums (build_prefix_sums_seg) reset at segment boundaries, and
    candidate bounds index the flat axis directly (segment slot * w_seg_p
    + group-alignment offset + local site index).  One dispatch — with an
    inner lax.map over replicate slices — therefore covers every live
    chromosome and every surviving point for many replicates, replacing
    the per-chromosome, per-bucket dispatch loop whose ~20-25 ms tunnel
    latency each dominated genome-scale pruning tails (the reference's
    equivalent unit is one work-queue pull per point per round,
    scan-chromosome.c:469-487).

    Segment slot layout (round 5 — no mask, no pad): the slab gathers
    G_loc = w_seg_p / PERM_GROUP whole permuted groups starting ONE
    group before the chromosome's first (seg_g0 - 1; a negative index
    reads the sentinel column), so real local site k sits at flat row
    PERM_GROUP + off + k.  The leading rows (sentinel zeros + the
    alignment spill of the PREVIOUS chromosome's attributes) and any
    trailing spill contribute per-(segment, replicate, row) CONSTANTS to
    the prefix stream; the statistic consumes only prefix DIFFERENCES
    between bounds of one candidate, so they cancel EXACTLY (integer
    counts; ~ulp-level in the compressed f32 mode) — round 4 spent two
    full [S*w, P*R] relayout passes (a pad and a where) zeroing what
    cancellation already removes (47%% of the kernel wall,
    bench/micro_stack.py).  Bound index = slot*w_seg_p + PERM_GROUP - 1
    + off + b (the rebuild bakes the base in).  sigma8:
    [n_slices*sub_rep, n_sig] group-level permutation indices
    (sentinel-padded); seg_g0/seg_off/seg_n: [n_seg] per-segment start
    group, alignment offset, real site count (seg_off/seg_n are retained
    for shape/signature stability; the kernel no longer reads them).
    """
    del seg_off, seg_n  # constants cancel in bound differences
    G_loc = w_seg_p // PERM_GROUP
    n_sig = sigma8.shape[1]
    # thin form (make_row_index_group_table): i16 row-id rows expanded to
    # one-hot on chip — the gather moves n_rows x fewer bytes, clearing
    # the ~26 GB/s XLA gather byte ceiling (bench/micro_idx.py); exact
    # one-hot mode only (weight channels have no row identity)
    thin = oh_table.dtype == jnp.int16
    idx8 = (
        seg_g0[:, None]
        + jnp.arange(G_loc, dtype=jnp.int32)[None, :] - 1
    )
    idx8 = jnp.where(idx8 < 0, n_sig - 1, idx8)  # sentinel column

    def one_slice(sig):  # [sub_rep, n_sig]
        sel = sig.T[idx8]  # [S, G_loc, P] row gather of sigma columns
        if thin:
            gi = oh_table[sel]  # [S, G_loc, P, PERM_GROUP] i16 row gather
            gi = gi.transpose(0, 1, 3, 2).reshape(
                n_seg, w_seg_p, sub_rep
            )
            # broadcast-compare expansion; id n_rows (sentinel/pad) hits
            # no lane -> all-zero row, matching the fat table's padding
            oh = (
                gi[..., None]
                == jnp.arange(n_rows, dtype=gi.dtype)[None, None, None]
            ).astype(jnp.int8)
        else:
            oh = oh_table[sel]  # [S, G_loc, P, PERM_GROUP*R] i8 row gather
            oh = oh.reshape(n_seg, G_loc, sub_rep, PERM_GROUP, n_rows)
            oh = oh.transpose(0, 1, 3, 2, 4).reshape(
                n_seg, w_seg_p, sub_rep, n_rows
            )
        ps = build_prefix_sums_seg(
            oh.reshape(n_seg * w_seg_p, sub_rep * n_rows), seg_len=w_seg_p
        )
        clr = hist_clr_reps_ps(
            t3, bounds, fbar, ps, n_rep=sub_rep,
            n_cells=n_cells, n_rows=n_rows, n_alpha=n_alpha, c_sub=32,
            mm_bf16=mm_bf16,
        )  # [P, n_pts*Jf, A]
        return clr.reshape(sub_rep, n_pts, Jf * n_alpha).max(axis=2)

    out = jax.lax.map(
        one_slice, sigma8.reshape(n_slices, sub_rep, n_sig)
    )
    return out.reshape(n_slices * sub_rep, n_pts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "gw", "n_seg", "n_rows", "n_cells", "n_alpha",
        "sub_rep", "n_slices", "n_pts", "Jf", "mm_bf16",
    ),
)
def _stack_stat_g(gsum_table, sigma8, seg_g0, seg_gn, bounds_g, fbar, t3,
                  *, gw, n_seg, n_rows, n_cells, n_alpha,
                  sub_rep, n_slices, n_pts, Jf, mm_bf16=False):
    """Group-granular statistic maxima for stacked segments; [R, n_pts].

    The GROUP-level rewrite of _stack_stat (round 5): the site-level
    pipeline's wall was 47% transpose/mask and 34% one-hot gather
    (bench/micro_stack.py), all of it relayout traffic on a [sites,
    P*rows] stream whose only consumers are prefix DIFFERENCES at the
    candidate bounds.  With bounds snapped to permutation-group
    boundaries (ops/histclr.py _device_points quantum/qoff), the
    statistic needs prefixes only at group resolution, so each replicate
    gathers the [G+1, R] per-group row-SUM table (make_group_sum_table —
    PERM_GROUP x fewer bytes than the one-hot rows, and the gathered
    [S, gw, P, R] layout feeds the segmented prefix DIRECTLY, no
    transpose), runs a gw-length segmented prefix (PERM_GROUP x fewer
    rows), and reuses hist_clr_reps_ps unchanged on group-unit bounds.

    Window counts differ from the site-level statistic only by the
    <= PERM_GROUP/2-site boundary snap — the identical functional scores
    observed thresholds and null replicates, so the Monte-Carlo test is
    exact as always; the snap's detection-power impact is bounded by the
    position-grid ladder (PARITY.md round 5) since it perturbs windows
    by ~100x less than the 16.7 kb statistic pitch.

    Layout: per segment, gw flat group slots; slot row 0 is reserved
    always-zero (a bound of 0 reads an exact zero prefix); row j in
    [1, gw) holds genome group seg_g0 + j - 1 (rows past seg_gn read the
    sentinel).  bounds_g index the flat axis (slot * gw + j).  The
    leading-partial-group and previous-chromosome contributions are
    per-segment constants that cancel in the bound differences.
    """
    G_in = gsum_table.shape[0] - 1  # sentinel row index
    n_sig = sigma8.shape[1]
    j = jnp.arange(gw, dtype=jnp.int32)[None, :]
    idxg = seg_g0[:, None] + j - 1  # [S, gw]
    valid = (j >= 1) & (j <= seg_gn[:, None])
    idxg = jnp.where(valid, jnp.clip(idxg, 0, n_sig - 1), n_sig - 1)

    def one_slice(sig):  # [sub_rep, n_sig]
        sel = sig.T[idxg]  # [S, gw, P] gather of sigma columns
        sel = jnp.where(valid[:, :, None], sel, jnp.int32(G_in))
        gs = gsum_table[sel]  # [S, gw, P, R] i8 row gather
        ps = build_prefix_sums_seg(
            gs.reshape(n_seg * gw, sub_rep * n_rows), seg_len=gw,
            out_dtype=jnp.int32,
        )
        clr = hist_clr_reps_ps(
            t3, bounds_g, fbar, ps, n_rep=sub_rep,
            n_cells=n_cells, n_rows=n_rows, n_alpha=n_alpha, c_sub=32,
            mm_bf16=mm_bf16,
        )  # [P, n_pts*Jf, A]
        return clr.reshape(sub_rep, n_pts, Jf * n_alpha).max(axis=2)

    out = jax.lax.map(
        one_slice, sigma8.reshape(n_slices, sub_rep, n_sig)
    )
    return out.reshape(n_slices * sub_rep, n_pts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cells", "n_rows", "n_alpha", "pg", "n_groups", "sub_rep",
        "n_slices", "n_pts", "Jf", "mm_bf16",
    ),
)
def _rdp_stat(t3, bounds_gen, fbar, psite, src, dst, sz,
              *, n_cells, n_rows, n_alpha, pg, n_groups, sub_rep,
              n_slices, n_pts, Jf, mm_bf16=False):
    """Statistic maxima via the run-decomposed prefix; [R, n_pts].

    src/dst/sz: [n_slices*sub_rep, B] group-level runs (ops/permute.py
    block_permutation_runs — the SAME stream sigma materializes).
    bounds_gen: [n_pts*Jf, 2, NC+1] genome-site bounds.  Same statistic
    functional as _stack_stat (identical window counts -> identical
    contraction), dispatched as an inner lax.map over replicate slices.
    """
    from ..ops.histclr import rdp_clr_reps

    B = src.shape[1]

    def one_slice(args):
        s, d, z = args
        clr = rdp_clr_reps(
            t3, bounds_gen, fbar, psite, s, d, z,
            n_rep=sub_rep, n_cells=n_cells, n_rows=n_rows,
            n_alpha=n_alpha, pg=pg, n_groups=n_groups, c_sub=32,
            mm_bf16=mm_bf16,
        )  # [sub_rep, n_pts*Jf, A]
        return clr.reshape(sub_rep, n_pts, Jf * n_alpha).max(axis=2)

    out = jax.lax.map(
        one_slice,
        (
            src.reshape(n_slices, sub_rep, B),
            dst.reshape(n_slices, sub_rep, B),
            sz.reshape(n_slices, sub_rep, B),
        ),
    )
    return out.reshape(n_slices * sub_rep, n_pts)


@functools.lru_cache(maxsize=None)
def _sharded_stack_fn(mesh, w_seg_p, n_seg, n_rows, n_cells, n_alpha,
                      sub_rep, n_slices, n_pts, Jf, mm_bf16):
    """Jitted shard_map of _stack_stat: replicates shard over the mesh,
    geometry/tables replicate; zero collectives.  n_slices is the
    PER-DEVICE slice count (global sigma rows = n_slices*sub_rep*mesh.size).
    lru-cached on (mesh, dims) so repeat chunks reuse one traced callable
    and the prewarm path can .lower(...).compile() the exact executable
    the dispatch path runs (VERDICT r4 item 5)."""
    from jax.sharding import PartitionSpec as P

    rep = P()
    spec = P(("perm", "site"))

    def local(oh_table, sig, seg_g0, seg_off, seg_n, bounds, fbar, t3):
        return _stack_stat(
            oh_table, sig, seg_g0, seg_off, seg_n, bounds, fbar, t3,
            w_seg_p=w_seg_p, n_seg=n_seg, n_rows=n_rows, n_cells=n_cells,
            n_alpha=n_alpha, sub_rep=sub_rep, n_slices=n_slices,
            n_pts=n_pts, Jf=Jf, mm_bf16=mm_bf16,
        )

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, spec, rep, rep, rep, rep, rep, rep),
        out_specs=spec,
    ))


@functools.lru_cache(maxsize=None)
def _sharded_stack_g_fn(mesh, gw, n_seg, n_rows, n_cells, n_alpha,
                        sub_rep, n_slices, n_pts, Jf, mm_bf16):
    """Jitted shard_map of _stack_stat_g (group-granular statistic):
    replicates shard over the mesh, tables/geometry replicate."""
    from jax.sharding import PartitionSpec as P

    rep = P()
    spec = P(("perm", "site"))

    def local(gsum_table, sig, seg_g0, seg_gn, bounds_g, fbar, t3):
        return _stack_stat_g(
            gsum_table, sig, seg_g0, seg_gn, bounds_g, fbar, t3,
            gw=gw, n_seg=n_seg, n_rows=n_rows, n_cells=n_cells,
            n_alpha=n_alpha, sub_rep=sub_rep, n_slices=n_slices,
            n_pts=n_pts, Jf=Jf, mm_bf16=mm_bf16,
        )

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, spec, rep, rep, rep, rep, rep),
        out_specs=spec,
    ))


@functools.lru_cache(maxsize=None)
def _sharded_lattice_fn(mesh, grid_points, chunk, start, n, w_pad,
                        eval_range, n_pts, J):
    """Jitted shard_map of _permute_batch_chr (lattice fallback path):
    sigma shards over the flattened mesh, everything else replicates."""
    from jax.sharding import PartitionSpec as P

    rep = P()
    spec = P(("perm", "site"))

    def local(pack_coarse, pack_fine, m_coarse, m_fine,
              row_gen, null_gen, sigma, pos_pad, cand, lo, hi, ist, ien):
        return _permute_batch_chr(
            pack_coarse, pack_fine, m_coarse, m_fine,
            row_gen, null_gen, sigma, pos_pad, cand, lo, hi, ist, ien,
            grid_points=grid_points, chunk=chunk, start=start, n=n,
            w_pad=w_pad, eval_range=eval_range, n_pts=n_pts, J=J,
        )

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, spec,
                  rep, rep, rep, rep, rep, rep),
        out_specs=spec,
    ))


# effective device rates for dispatch budgeting: resolved once per
# process by utils/calibrate.py — env overrides > per-device-kind
# calibration cache > one-shot micro-measurement on unknown device kinds
# > the bench-TPU defaults (BASELINE.md kernel facts).  Used only to
# budget per-dispatch work below the tunnel watchdog; results are
# independent of the rates (only dispatch slicing changes).


def _budget_rates():
    from ..utils.calibrate import get_rates

    return get_rates()


def _sub_rep_for(ht, n_seg_pad, w_seg_p):
    """Largest replicate slice whose transient [S*w, P*R] buffers fit
    (compressed weight channels are f32, 2x the int16 one-hot bytes)."""
    ps_budget = _budget_rates()["ps_budget"]
    bpe = 4 if ht.weights is not None else 2
    p = HIST_REP_SUB * 2
    while p > 1 and (
        n_seg_pad * w_seg_p * p * ht.n_rows * bpe > ps_budget
    ):
        p //= 2
    return p


def _sub_rep_for_g(ht, n_seg_pad, gw):
    """Group-granular variant: the [S*gw, P*R] int32 prefix is PERM_GROUP
    x shorter than the site stream, so larger replicate slices fit."""
    ps_budget = _budget_rates()["ps_budget"]
    p = HIST_REP_SUB * 2
    while p > 1 and n_seg_pad * gw * p * ht.n_rows * 5 > ps_budget:
        p //= 2
    return p


def _slice_cost_for(ht, n_seg_pad, w_seg_p, n_pts_pad, Jf, sub_rep):
    """Rough per-replicate-slice wall estimate (dispatch budgeting).

    Pure function of the dispatch dims so the shape-warming predictor
    (utils/precompile.py) reproduces the driver's slice plan exactly."""
    r = _budget_rates()
    bpe = 4 if ht.weights is not None else 2
    ps_bytes = n_seg_pad * w_seg_p * sub_rep * ht.n_rows * (bpe + 3)
    rows = n_pts_pad * Jf * 2 * (ht.n_cells + 1)
    gbytes = rows * sub_rep * ht.n_rows * bpe
    flops = (
        n_pts_pad * Jf * ht.n_alpha * sub_rep
        * 2 * ht.n_cells * ht.n_rows * 2
    )
    return (
        ps_bytes / r["hbm_rate"]
        + max(rows / r["gather_rows_rate"], gbytes / r["hbm_rate"])
        + flops / r["mxu_rate"]
    )


def _plan_m(slice_cost_s):
    """Replicate slices fused per dispatch (power of 2, wall-targeted)."""
    target = _budget_rates()["dispatch_target_s"]
    m = max(1, int(target / max(slice_cost_s, 1e-4)))
    return 1 << (m.bit_length() - 1)


def _plan_ds(slices_total, m):
    """Binary decomposition of a chunk into per-dispatch slice counts.

    Shared by the dispatch loop and the shape predictor so the warmed
    programs are exactly the ones later dispatched."""
    ds, rem = [], slices_total
    while rem:
        d = min(m, rem)
        d = 1 << (d.bit_length() - 1)
        ds.append(d)
        rem -= d
    return ds


class _StackGroup:
    """Live chromosomes of one padded-length class, stacked for dispatch.

    Holds per-segment static geometry (group index, alignment offset, site
    count) plus the merged candidate run geometry (bounds/fbar) over every
    ACTIVE scan point of its chromosomes.  Geometry is rebuilt when the
    active set halves (compaction) or a rung of the segment ladder drops,
    so late pruning rounds run on small shapes.
    """

    def __init__(self, ht, w_seg_p, segs, eval_range, Jf, gmode=False):
        self.ht = ht
        self.w_seg_p = w_seg_p
        self.segs = segs  # [(chr_index, start, n, pos_np, dev_arrays)]
        self.eval_range = eval_range
        self.Jf = Jf
        self.gmode = gmode  # group-granular statistic (_stack_stat_g)
        # flat group slots per segment (row 0 reserved), padded to the
        # Pallas prefix tile so the segmented kernel applies
        self.gw = -(-(w_seg_p // PERM_GROUP + 2) // 512) * 512
        self.pts = None  # active point ids in geometry order
        self.n_pts_pad = 0
        self.n_seg_pad = 0
        self.bounds = self.fbar = None
        self.seg_g0 = self.seg_off = self.seg_n = self.seg_gn = None
        self.sub_rep = HIST_REP_SUB

    def rebuild(self, result, pts_by_chr):
        """Merged flat-axis geometry for the given active points.

        pts_by_chr: {chr_index: np.ndarray of point ids}.  One
        build_hist_points dispatch per live chromosome; bounds shift to
        the stacked flat axis (slot*w_seg_p + off + local).
        """
        ht, Jf = self.ht, self.Jf
        live = [s for s in self.segs if len(pts_by_chr.get(s[0], ())) > 0]
        S_pad = _ladder_pad(max(len(live), 1))
        # ONE candidate-pad class per rebuild (the stack-wide max): each
        # distinct padded candidate count is its own geometry-build XLA
        # program (_device_points), and per-chromosome pow2 pads scattered
        # a rebuild across several such programs — a genome-scale rebuild
        # paid a ~45 s serial compile rung mid-run for shapes used once
        n_cp_stack = _pad_pow2(
            max((len(pts_by_chr.get(s[0], ())) for s in live),
                default=1) or 1,
            minimum=4,
        )
        g0 = np.zeros(S_pad, np.int32)
        off = np.zeros(S_pad, np.int32)
        nn = np.zeros(S_pad, np.int32)
        gn = np.zeros(S_pad, np.int32)
        b_parts, f_parts, pts_all = [], [], []
        for slot, (c, start, n, pos_np, dev) in enumerate(live):
            g0[slot] = start // PERM_GROUP
            off[slot] = start - g0[slot] * PERM_GROUP
            nn[slot] = n
            gn[slot] = (off[slot] + n - 1) // PERM_GROUP + 1
            pts = pts_by_chr[c]
            # pad the candidate count to the stack-wide pow2 class so
            # geometry builds share ONE compiled shape per rebuild
            n_cp = n_cp_stack
            cand = np.pad(
                _fine_cand(result, pts, Jf), (0, (n_cp - len(pts)) * Jf)
            )
            if self.gmode:
                # bounds snapped to genome permutation-group boundaries
                # and expressed in flat GROUP units (slot*gw + j); the
                # per-segment constants cancel in the bound differences
                hp = build_hist_points(
                    ht, pos_np, cand, self.eval_range, cand_pad=Jf,
                    device_arrays=dev, quantum=PERM_GROUP,
                    qoff=int(off[slot]),
                )
                bq = hp.bounds[: len(pts) * Jf]
                b_parts.append(
                    (bq + jnp.int32(off[slot])) // PERM_GROUP
                    + jnp.int32(slot * self.gw)
                )
            else:
                hp = build_hist_points(
                    ht, pos_np, cand,
                    self.eval_range, cand_pad=Jf, device_arrays=dev,
                )
                # flat row of local site k is PERM_GROUP + off + k
                # (_stack_stat's no-mask slab layout); bound b reads the
                # inclusive prefix through site b-1
                base = (
                    slot * self.w_seg_p + PERM_GROUP - 1 + int(off[slot])
                )
                b_parts.append(
                    hp.bounds[: len(pts) * Jf] + jnp.int32(base)
                )
            f_parts.append(hp.fbar[: len(pts) * Jf])
            pts_all.append(pts)
        self.pts = (
            np.concatenate(pts_all) if pts_all else np.zeros(0, np.int64)
        )
        n_pts = len(self.pts)
        self.n_pts_pad = _pad_pow2(max(n_pts, 1), minimum=4)
        C_pad = self.n_pts_pad * Jf
        bounds = jnp.concatenate(b_parts) if b_parts else jnp.zeros(
            (0, 2, ht.n_cells + 1), jnp.int32
        )
        fbar = jnp.concatenate(f_parts) if f_parts else jnp.zeros(
            (0, 2, ht.n_cells), jnp.float32
        )
        pad = C_pad - bounds.shape[0]
        if pad:
            # zero bounds -> flat row 0 (a reserved masked slot) -> empty
            # runs -> CLR exactly 0 for padding candidates
            bounds = jnp.pad(bounds, ((0, pad), (0, 0), (0, 0)))
            fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
        self.bounds, self.fbar = bounds, fbar
        self.n_seg_pad = S_pad
        self.seg_g0 = jnp.asarray(g0)
        self.seg_off = jnp.asarray(off)
        self.seg_n = jnp.asarray(nn)
        self.seg_gn = jnp.asarray(gn)
        self.sub_rep = (
            _sub_rep_for_g(ht, S_pad, self.gw) if self.gmode
            else _sub_rep_for(ht, S_pad, self.w_seg_p)
        )

    def slice_cost_s(self):
        """Rough per-replicate-slice wall estimate (dispatch budgeting)."""
        if self.gmode:
            return _slice_cost_for(
                self.ht, self.n_seg_pad, 4 * self.gw, self.n_pts_pad,
                self.Jf, self.sub_rep,
            )
        return _slice_cost_for(
            self.ht, self.n_seg_pad, self.w_seg_p, self.n_pts_pad,
            self.Jf, self.sub_rep,
        )

    def predict_shape(self, result, active):
        """(n_seg_pad, n_pts_pad, sub_rep) a rebuild on ``active`` would
        produce — computed without building geometry, so the warming
        predictor can compile the next rung's programs while the current
        shapes keep the device busy."""
        if self.pts is None:
            return None
        on = self.pts[active[self.pts]]
        n_act = len(on)
        if n_act == 0:
            return None
        chrs, counts = np.unique(result.chr_id[on], return_counts=True)
        S_pad = _ladder_pad(max(len(chrs), 1))
        n_pts_pad = _pad_pow2(max(n_act, 1), minimum=4)
        n_cp = _pad_pow2(int(counts.max()), minimum=4)
        sub = (
            _sub_rep_for_g(self.ht, S_pad, self.gw) if self.gmode
            else _sub_rep_for(self.ht, S_pad, self.w_seg_p)
        )
        return (S_pad, n_pts_pad, sub, n_cp)


def _scan_permute_hist(data, tables, result, scan_cfg, cfg: PermuteConfig,
                       rows_used, dump_fn=None):
    """Histogram fast-path permutation driver (see ops/histclr.py).

    Statistic: per coarse interval, max CLR over a fixed Jf-point fine
    position grid x a dense hist_alphas lattice alpha grid, applied
    identically to the observed data (thresholds) and every permuted
    replicate — a valid Monte-Carlo test (same functional on both sides).

    Dispatch structure: live chromosomes stack into per-length
    _StackGroups; each group runs a whole chunk of replicates in a few
    scan-fused _stack_stat dispatches, so the genome-scale pruning tail
    (a handful of immortal points spread over many chromosomes,
    scan-chromosome.c:489-494) pays ~constant dispatch latency per chunk
    instead of one prefix-sum build + statistic round trip per chromosome
    per replicate slice.
    """
    rng = np.random.default_rng(cfg.seed)
    key0 = jax.random.key(cfg.seed)
    Jf = stat_positions(cfg)

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
    # group-granular statistic (round 5, _stack_stat_g): exact one-hot
    # mode only — compressed f32 weight channels have no integer group
    # sums.  The group path replaces the one-hot table with the
    # PERM_GROUP x smaller per-group sum table.
    gmode = (
        ht.weights is None and GROUP_STAT
        and min(
            (cl.n_snps for cl in data.chr_limits if cl.n_snps > 0),
            default=0,
        ) >= GROUP_STAT_MIN_SITES
    )
    if gmode:
        from ..ops.histclr import make_group_sum_table

        oh_table = make_group_sum_table(
            row_cg, n_rows=ht.n_rows, pg=PERM_GROUP
        )
    elif ht.weights is None:
        # exact one-hot mode: thin i16 row-id rows by default (expanded
        # on chip inside _stack_stat), fat i8 one-hot rows behind the
        # kill-switch for A/B
        oh_table = (
            make_row_index_group_table(row_cg, n_rows=ht.n_rows)
            if THIN_OH
            else make_row_onehot_group_table(row_cg, n_rows=ht.n_rows)
        )
    else:
        oh_table = make_row_weight_group_table(row_cg, ht.weights)
    gpos = data.genome_pos()
    width_bp = cfg.scan_width_mb * 1e6
    n_groups = oh_table.shape[0] - 1  # sentinel row index

    K = result.n_points
    for i in range(K):
        if result.null_clr[i] is None:
            result.null_clr[i] = []

    from ..utils import MSG_DEBUG1 as MSG_DEBUG

    # stack groups: chromosomes keyed by padded segment length (4096-bp
    # quanta bound the compiled-shape count; equal-length chromosomes
    # stack waste-free)
    by_len: dict = {}
    for c, cl in enumerate(data.chr_limits):
        if cl.n_snps == 0 or not (result.chr_id == c).any():
            continue
        w_seg_p = -(-(cl.n_snps + 2 * PERM_GROUP) // 4096) * 4096
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        pos_np = np.asarray(data.pos[sl])
        from .scan import get_hist_device_arrays

        by_len.setdefault(w_seg_p, []).append(
            (c, cl.start_index, cl.n_snps, pos_np,
             get_hist_device_arrays(data, ht, pos_np, cl.start_index))
        )
    stacks = [
        _StackGroup(ht, w, segs, scan_cfg.eval_range, Jf, gmode=gmode)
        for w, segs in sorted(by_len.items())
    ]
    logmsg(MSG_DEBUG, "hist tables: %.1fs", _time.monotonic() - _tt)

    # sigma sentinel margin: each segment's group slab reaches
    # g0 + w_seg_p/PERM_GROUP - 2 (site mode, which starts one group
    # early) or g0 + gw - 2 (group mode)
    margin = 2 + max(
        (
            seg[1] // PERM_GROUP
            + max(st.w_seg_p // PERM_GROUP, st.gw) - 1
            - n_groups
            for st in stacks
            for seg in st.segs
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

    def _active_by_chr(st, act):
        out = {}
        for c, *_ in st.segs:
            pts = np.where((result.chr_id == c) & act)[0]
            if len(pts):
                out[c] = pts
        return out

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
        from ..parallel.shard import gather_to_host, to_global

        mesh = make_scan_mesh()
        rep_step = HIST_REP_SUB * ndev
        logmsg(
            MSG_STATUS,
            "Permutation replicates sharded over %d devices (%d processes)",
            ndev, jax.process_count(),
        )

    # sigma is ALWAYS generated at a fixed per-boost replicate count: a
    # short final chunk then reuses both the sigma program and every
    # dispatch shape; extra rows cost ~nothing and their absolute-index
    # keys make any chunking replay the identical stream
    q_max = 2 * HIST_REP_SUB * (ndev if mesh is not None else 1)
    R_gen = -(-cfg.chunk_replicates // HIST_REP_SUB) * HIST_REP_SUB

    # adaptive cadence: once pruning leaves few survivors, the per-chunk
    # fixed costs (sigma program, dispatch round-trips, host updates)
    # dominate, so the replicate count per chunk grows 16x/64x.  The boost
    # depends only on the active count — deterministic given the config —
    # so runs stay reproducible; SIGMA_ELEM_CAP bounds the chunk's sigma
    # footprint to the proven tunnel envelope.
    boost_cap = max(1, SIGMA_ELEM_CAP // max(n_groups, 1) // max(R_gen, 1))

    def _boost(n_act, rounds_done=0):
        b = 1
        if (
            n_act <= HIST_POINT_BUCKET * 4
            and rounds_done >= 8 * cfg.chunk_replicates
        ):
            b = 4  # mid-run: a few hundred survivors took thousands of
            # rounds at 32 reps/chunk (~545 s of the round-3 genome1m
            # wall); 128-rep chunks amortize the per-chunk fixed costs
            # and overshoot dying points by ~64 rounds against their
            # thousands-of-rounds lifetimes.  The rounds_done gate keeps
            # short runs (e.g. 50-permutation benches, where pruning
            # inside the first chunks is the whole game) on fine chunks.
        if n_act <= HIST_POINT_BUCKET // 4:
            b = 16
        if n_act <= HIST_POINT_BUCKET // 8:
            b = 64  # the genome-scale pruning tail sits at ~20-30
            # immortal points for half the run (VERDICT r3 item 7); the
            # per-chunk fixed costs (sigma program, dispatch round trips,
            # host update) amortize 4x further at 2048-rep chunks
        if n_act <= HIST_POINT_BUCKET // 8 and rounds_done > 0:
            b = 128  # deep tail: at PERM_GROUP=32 the sigma cap admits
            # 4096-rep chunks, halving the drain/dispatch boundaries the
            # immortal-point phase pays (chunk walls are compute-bound
            # there; overshoot is bounded by one chunk against
            # thousands-of-rounds point lifetimes).  Gated on
            # rounds_done so the FIRST chunk of a tiny run still prunes
            # before committing 4096 rounds.
        while b > boost_cap:
            b //= 2  # clamp to the LARGEST tier inside the sigma cap
            # (dividing by 4 knocked the 128 tier below 64 and shrank
            # tail chunks, measured 1024-rep chunks on genome1m)
        return max(b, 1)

    # --- background shape warming (utils/precompile.py) -------------------
    # each (segment class, point rung, slice layout) is its own XLA
    # program; warming compiles PREDICTED rungs concurrently with device
    # execution so pruning-driven shape changes stop serializing compiles
    # into the permutation wall.  Dispatch still goes through the plain
    # jit path — warming only pre-populates the persistent compile cache,
    # so results are bitwise identical whether or not a warm landed.
    from ..utils.precompile import Precompiler

    warm = Precompiler()
    n_sig_pad = n_groups + margin
    _sds = jax.ShapeDtypeStruct
    _oh_sds = _sds(oh_table.shape, oh_table.dtype)
    _t3_sds = _sds(ht.t3.shape, ht.t3.dtype)
    # table/dataset statics captured in the compiled programs but NOT in
    # the dispatch dims: Precompiler._done_keys is process-wide, so a
    # second model/dataset in the same process with colliding dims must
    # not silently skip warms for programs never compiled (ADVICE r3)
    _geom_key = (ht.n_cells, ht.n_rows, ht.n_alpha, Jf, cfg.hist_bf16,
                 n_sig_pad, str(oh_table.dtype), gmode)

    def _stack_key(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
                   sharded=False):
        return ("stack", w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
                _geom_key) + (("sharded",) if sharded else ())

    def _warm_stack(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
                    sharded=False):
        key = _stack_key(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
                         sharded)

        gw = -(-(w_seg_p // PERM_GROUP + 2) // 512) * 512

        def fn():
            i32 = jnp.int32
            seg = _sds((n_seg_pad,), i32)
            b_sds = _sds((n_pts_pad * Jf, 2, ht.n_cells + 1), i32)
            f_sds = _sds((n_pts_pad * Jf, 2, ht.n_cells), jnp.float32)
            sig_sds = _sds(
                (n_slices * sub_rep * (mesh.size if sharded else 1),
                 n_sig_pad), jnp.int32,
            )
            if sharded:
                # warm the EXACT jitted shard_map callable the sharded
                # dispatch runs (lru-cached on (mesh, dims)): lowering with
                # the GLOBAL sigma shape compiles the SPMD executable into
                # the same jit cache the dispatch hits (VERDICT r4 item 5)
                if gmode:
                    f = _sharded_stack_g_fn(
                        mesh, gw, n_seg_pad, ht.n_rows, ht.n_cells,
                        ht.n_alpha, sub_rep, n_slices, n_pts_pad, Jf,
                        cfg.hist_bf16,
                    )
                    f.lower(
                        _oh_sds, sig_sds, seg, seg, b_sds, f_sds, _t3_sds,
                    ).compile()
                    return
                f = _sharded_stack_fn(
                    mesh, w_seg_p, n_seg_pad, ht.n_rows, ht.n_cells,
                    ht.n_alpha, sub_rep, n_slices, n_pts_pad, Jf,
                    cfg.hist_bf16,
                )
                f.lower(
                    _oh_sds, sig_sds, seg, seg, seg, b_sds, f_sds,
                    _t3_sds,
                ).compile()
                return
            if gmode:
                _stack_stat_g.lower(
                    _oh_sds, sig_sds, seg, seg, b_sds, f_sds, _t3_sds,
                    gw=gw, n_seg=n_seg_pad, n_rows=ht.n_rows,
                    n_cells=ht.n_cells, n_alpha=ht.n_alpha,
                    sub_rep=sub_rep, n_slices=n_slices, n_pts=n_pts_pad,
                    Jf=Jf, mm_bf16=cfg.hist_bf16,
                ).compile()
                return
            _stack_stat.lower(
                _oh_sds, sig_sds,
                seg, seg, seg, b_sds, f_sds,
                _t3_sds,
                w_seg_p=w_seg_p, n_seg=n_seg_pad, n_rows=ht.n_rows,
                n_cells=ht.n_cells, n_alpha=ht.n_alpha, sub_rep=sub_rep,
                n_slices=n_slices, n_pts=n_pts_pad, Jf=Jf,
                mm_bf16=cfg.hist_bf16,
            ).compile()

        warm.submit(key, fn)
        return key

    def _warm_sigma(n_rep):
        from ..ops.permute import (
            _group_first_positions, _replicates, effective_block_width,
            n_blocks_for,
        )

        key = ("sigma", n_rep, len(gpos), int(width_bp))

        def fn():
            g0, span = _group_first_positions(gpos)
            _replicates.lower(
                _sds(key0.shape, key0.dtype),
                _sds((), jnp.uint32),
                _sds(g0.shape, g0.dtype),
                n_blocks=n_blocks_for(span, width_bp),
                n_replicates=int(n_rep),
                width=effective_block_width(span, width_bp),
            ).compile()

        warm.submit(key, fn)
        return key

    def _plan_stack(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, R, nshard=1):
        """Per-dispatch slice counts this chunk would use at these dims."""
        q = sub_rep * nshard
        slices_total = (-(-R // q) * q) // q
        w_eff = (
            4 * (-(-(w_seg_p // PERM_GROUP + 2) // 512) * 512)
            if gmode else w_seg_p
        )
        m = _plan_m(
            _slice_cost_for(ht, n_seg_pad, w_eff, n_pts_pad, Jf, sub_rep)
        )
        return _plan_ds(slices_total, m)

    def _warm_rung(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, R, nshard=1):
        """Warm every program a chunk at these dims would dispatch; True
        once all are compiled (failures count — the jit path then
        compiles synchronously, the pre-warming behavior)."""
        keys = [
            _warm_stack(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, d,
                        sharded=nshard > 1)
            for d in set(_plan_stack(w_seg_p, n_seg_pad, n_pts_pad,
                                     sub_rep, R, nshard))
        ]
        return all(warm.ready(k) for k in keys)

    def _points_keys(st, n_cp):
        """Warm the geometry-build program (_device_points) for a
        candidate-pad class: rebuilds call it foreground, and each new
        class costs a fresh tunnel compile (the 26-43 s chunks in the
        round-3 genome1m log were exactly these).  Returns the keys."""
        from ..ops.histclr import _device_points

        C = n_cp * Jf
        keys = []
        for seg in st.segs:
            dev = seg[4]
            sig = tuple(
                (tuple(a.shape), str(a.dtype)) for a in dev[:-1]
            )
            quantum = PERM_GROUP if gmode else 0
            key = ("points", sig, C, dev[-1], ht.n_cells, quantum)

            def fn(dev=dev, C=C, quantum=quantum):
                sds = jax.ShapeDtypeStruct
                args = [sds(a.shape, a.dtype) for a in dev[:-1]]
                ci = sds((C,), jnp.int32)
                _device_points.lower(
                    *args, ci, ci, ci, ci,
                    n_cells=ht.n_cells, qbits=dev[-1], quantum=quantum,
                ).compile()

            warm.submit(key, fn)
            keys.append(key)
        return keys

    def _warm_points_for(st, n_cp):
        return all(warm.ready(k) for k in _points_keys(st, n_cp))

    def _stat_call(st, sig, n_slices):
        key = _stack_key(
            st.w_seg_p, st.n_seg_pad, st.n_pts_pad, st.sub_rep, n_slices
        )
        if warm.known(key):
            # an identical program is compiling on the warm pool (this
            # instance's or the pipeline prewarm's): block on it instead
            # of compiling the same HLO a second time through the tunnel
            warm.wait(key)
        if gmode:
            return _stack_stat_g(
                oh_table, sig, st.seg_g0, st.seg_gn,
                st.bounds, st.fbar, ht.t3,
                gw=st.gw, n_seg=st.n_seg_pad, n_rows=ht.n_rows,
                n_cells=ht.n_cells, n_alpha=ht.n_alpha,
                sub_rep=st.sub_rep, n_slices=n_slices,
                n_pts=st.n_pts_pad, Jf=Jf, mm_bf16=cfg.hist_bf16,
            )
        return _stack_stat(
            oh_table, sig, st.seg_g0, st.seg_off, st.seg_n,
            st.bounds, st.fbar, ht.t3,
            w_seg_p=st.w_seg_p, n_seg=st.n_seg_pad, n_rows=ht.n_rows,
            n_cells=ht.n_cells, n_alpha=ht.n_alpha,
            sub_rep=st.sub_rep, n_slices=n_slices,
            n_pts=st.n_pts_pad, Jf=Jf, mm_bf16=cfg.hist_bf16,
        )

    def _stat_call_sharded(st, sig_global, n_slices):
        """Sharded chunk dispatch through the lru-cached shard_map
        callable; n_slices is the per-device slice count."""
        key = _stack_key(
            st.w_seg_p, st.n_seg_pad, st.n_pts_pad, st.sub_rep, n_slices,
            sharded=True,
        )
        if warm.known(key):
            warm.wait(key)
        if gmode:
            f = _sharded_stack_g_fn(
                mesh, st.gw, st.n_seg_pad, ht.n_rows, ht.n_cells,
                ht.n_alpha, st.sub_rep, n_slices, st.n_pts_pad, Jf,
                cfg.hist_bf16,
            )
            return f(oh_table, sig_global, st.seg_g0, st.seg_gn,
                     st.bounds, st.fbar, ht.t3)
        f = _sharded_stack_fn(
            mesh, st.w_seg_p, st.n_seg_pad, ht.n_rows, ht.n_cells,
            ht.n_alpha, st.sub_rep, n_slices, st.n_pts_pad, Jf,
            cfg.hist_bf16,
        )
        return f(oh_table, sig_global, st.seg_g0, st.seg_off, st.seg_n,
                 st.bounds, st.fbar, ht.t3)

    # observed thresholds under the identical statistic: sigma = identity
    _t0 = _time.monotonic()
    threshold = np.zeros(K)
    obs_sigma = _pad_sigma(jnp.arange(n_groups, dtype=jnp.int32)[None, :])
    th_pending = []
    b0 = _boost(int(active.sum()), rounds_done)
    R0 = min(cfg.chunk_replicates * b0, max(cfg.n_permute - rounds_done, 1))
    for st in stacks:
        # geometry and thresholds only for points still ACTIVE: finished
        # points (checkpoint resume, pruning-tail reruns) never consume
        # their threshold, and building 10k-point geometry to serve a
        # 22-point tail made setup ~10x slower than needed
        pts_by = _active_by_chr(st, active)
        if pts_by:
            # the pipeline prewarm submitted these geometry programs;
            # block on any in flight rather than compiling duplicates
            n_cp0 = _pad_pow2(
                max(len(v) for v in pts_by.values()), minimum=4
            )
            for k in _points_keys(st, n_cp0):
                warm.wait(k)
        st.rebuild(result, pts_by)
        # warm the threshold + first-chunk programs (and the sigma
        # generator) on the background pool: thresholds for later stacks
        # compile in parallel with the first stack's, and the first
        # chunk's dispatches become cache hits.  Under a mesh the rung
        # warms compile the jitted shard_map executables when the chunk's
        # replicate padding rule says the dispatch will shard, and the
        # local programs otherwise — mirroring the dispatch loop's
        # shard_now decision exactly (VERDICT r4 item 5: pod runs used to
        # pay every one of these compiles foreground).
        shard0 = (
            mesh is not None and -(-R0 // rep_step) * rep_step <= 2 * R0
        )
        nshard0 = ndev if shard0 else 1
        _warm_stack(st.w_seg_p, st.n_seg_pad, st.n_pts_pad, 1, 1)
        _warm_rung(st.w_seg_p, st.n_seg_pad, st.n_pts_pad, st.sub_rep,
                   R0, nshard0)
        # pruning kills most points within the first few chunks
        # (>=20 exceedances come fast for null-like intervals), so
        # the first halving rungs of the point-bucket ladder WILL be
        # needed shortly — compile them now, in likely-use order,
        # while the early chunks run on the setup geometry
        p = st.n_pts_pad
        n_cp0 = -(-p // max(len(st.segs), 1))
        for _ in range(4):
            p = max(p // 2, 4)
            n_cp0 = max(n_cp0 // 2, 4)
            _warm_rung(st.w_seg_p, st.n_seg_pad, p, st.sub_rep, R0,
                       nshard0)
            _warm_points_for(st, _pad_pow2(n_cp0, minimum=4))
            if p == 4:
                break
    _warm_sigma(R_gen * b0 + q_max)
    for st in stacks:
        sub_save, st.sub_rep = st.sub_rep, 1
        th_pending.append((st, _stat_call(st, obs_sigma, 1)))
        st.sub_rep = sub_save
    th_dev = None
    th_stacks = []
    if th_pending:
        # one concatenated device vector, read back in ONE round trip (the
        # slow tunnel pays per trip, not per byte, at these sizes).  On the
        # single-device path the readback is DEFERRED and fused into the
        # first chunk's drain — the first chunk's dispatches don't depend
        # on thresholds (exceedance counting is host-side after its
        # readback), so the threshold pass overlaps the first chunk's
        # compute and costs no extra trip.
        th_dev = jnp.concatenate(
            [o[0, : len(st.pts)] for st, o in th_pending]
        )
        # snapshot the point order: a mid-loop geometry rebuild replaces
        # st.pts, but the deferred threshold vector is laid out in the
        # setup-time order
        th_stacks = [(st, st.pts.copy()) for st, _ in th_pending]

    def _drain_thresholds(host_vals):
        nonlocal th_dev
        off = 0
        for _, pts in th_stacks:
            threshold[pts] = host_vals[off : off + len(pts)]
            _record_thresholds(result, pts, threshold)
            off += len(pts)
        th_dev = None

    if th_dev is not None and mesh is not None:
        _drain_thresholds(np.asarray(th_dev))
    logmsg(
        MSG_DEBUG, "hist permutation setup: %.1fs (%d stack groups)",
        _time.monotonic() - _t0, len(stacks),
    )

    def _progress():
        cr_logmsg(
            MSG_STATUS,
            "Scanning snp block permutations... %7d (%d scan pts remaining)",
            rounds_done,
            int(active.sum()),
        )

    def _gen_sigma(boost_x, start_x):
        skey = ("sigma", R_gen * boost_x + q_max, len(gpos),
                int(width_bp))
        if warm.known(skey):
            warm.wait(skey)
        return _pad_sigma(block_permutation_groups(
            key0, gpos, width_bp, R_gen * boost_x + q_max,
            start=start_x,
        ))

    # ---- run-decomposed prefix (RDP) tail path --------------------------
    # When the surviving bound set is far smaller than the live genome,
    # chunks dispatch through rdp_clr_reps (two row gathers per (bound,
    # replicate) against precomputed tables) instead of building the
    # permuted one-hot stream — the per-replicate cost drops from
    # O(live sites) to O(active bounds).  Exact one-hot mode only
    # (compressed-table f32 prefixes have no integer run identity) and
    # single-device for now (mesh chunks keep the stacked path).
    rdp_ok = ht.weights is None and mesh is None and RDP_FORCE != "off"
    rdp_psite = None
    rdp_ctx = None  # (signature, pts, bounds_gen, fbar, n_pts_pad)
    chr_sites = {
        c: n for (c, start, n, pos_np, dev) in
        (seg for st in stacks for seg in st.segs)
    }

    def _rdp_auto_ok():
        n_act = int(active.sum())
        if n_act == 0:
            return False
        live = {int(c) for c in np.unique(result.chr_id[active])}
        live_sites = sum(chr_sites.get(c, 0) for c in live)
        bound_entries = n_act * Jf * 2 * (ht.n_cells + 1)
        return RDP_BOUNDS_FACTOR * bound_entries < live_sites

    def _rdp_rebuild():
        """Genome-site bound geometry for the active set; point order ==
        the stacked drain order (stacks, then segments, then ascending
        point ids) so _apply_round_updates consumes the host RNG stream
        identically on both paths."""
        parts_b, parts_f, pts_all = [], [], []
        n_cp_max = 1
        for st in stacks:
            for c, *_ in st.segs:
                n_here = int(((result.chr_id == c) & active).sum())
                n_cp_max = max(n_cp_max, n_here)
        n_cp = _pad_pow2(n_cp_max, minimum=4)
        for st in stacks:
            for c, start, n, pos_np, dev in st.segs:
                pts = np.where((result.chr_id == c) & active)[0]
                if len(pts) == 0:
                    continue
                cand = np.pad(
                    _fine_cand(result, pts, Jf),
                    (0, (n_cp - len(pts)) * Jf),
                )
                for k in _points_keys(st, n_cp):
                    warm.wait(k)
                # under the group statistic, quantize identically so the
                # RDP functional matches the stacked group functional
                hp = build_hist_points(
                    ht, pos_np, cand, scan_cfg.eval_range,
                    cand_pad=Jf, device_arrays=dev,
                    quantum=PERM_GROUP if gmode else 0,
                    qoff=int(start % PERM_GROUP) if gmode else 0,
                )
                parts_b.append(
                    hp.bounds[: len(pts) * Jf] + jnp.int32(start)
                )
                parts_f.append(hp.fbar[: len(pts) * Jf])
                pts_all.append(pts)
        pts = np.concatenate(pts_all)
        n_pts_pad = _pad_pow2(max(len(pts), 1), minimum=4)
        bounds = jnp.concatenate(parts_b)
        fbar = jnp.concatenate(parts_f)
        pad = n_pts_pad * Jf - bounds.shape[0]
        if pad:
            # zero bounds -> identical prefix rows -> h = 0 -> CLR 0
            bounds = jnp.pad(bounds, ((0, pad), (0, 0), (0, 0)))
            fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
        return pts, bounds, fbar, n_pts_pad

    def _rdp_chunk(boost_x, start_x, R):
        """One whole chunk through the RDP path; returns (pts, [R, n_pts])."""
        nonlocal rdp_psite, rdp_ctx
        if rdp_psite is None:
            from ..ops.histclr import build_site_prefix

            rdp_psite = build_site_prefix(row_cg, n_rows=ht.n_rows)
        sig = active.tobytes()
        if rdp_ctx is None or rdp_ctx[0] != sig:
            rdp_ctx = (sig,) + _rdp_rebuild()
        _, pts, bounds_gen, fbar, n_pts_pad = rdp_ctx
        from ..ops.permute import block_permutation_runs

        n_rep_gen = R_gen * boost_x + q_max
        src, dst, sz = block_permutation_runs(
            key0, gpos, width_bp, n_rep_gen, start=start_x
        )
        sub = HIST_REP_SUB
        n_slices = -(-R // sub)
        Rp = n_slices * sub
        out = _rdp_stat(
            ht.t3, bounds_gen, fbar, rdp_psite,
            src[:Rp], dst[:Rp], sz[:Rp],
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            pg=PERM_GROUP, n_groups=n_groups, sub_rep=sub,
            n_slices=n_slices, n_pts=n_pts_pad, Jf=Jf,
            mm_bf16=cfg.hist_bf16,
        )
        last_stats["rdp_dispatches"] += 1
        return pts, out

    def _dispatch_stacks(R, sigma_p, shard_now, nshard, allow_rebuild=True):
        """Enqueue one chunk's statistic dispatches; [(stack, [outs])].

        allow_rebuild=False skips the compaction check (speculative
        dispatches run on the shapes already built — the sanctioned
        deferred-rebuild behavior, whose per-point values are
        shape-independent)."""
        pending = []
        for st in stacks:
            if st.pts is None or not active[st.pts].any():
                continue
            if HIST_COMPACT and allow_rebuild:
                # geometry compaction: rebuild on the active set when
                # the padded point count at least halves or a rung of
                # the segment ladder drops — late pruning rounds then
                # run on small shapes instead of the setup-time padding.
                # DEFERRED until the new rung's programs are warm
                # (unsharded path): the old — already compiled — shapes
                # keep the device busy while the background pool
                # compiles the rung, so compaction never serializes a
                # compile into the chunk wall.  The chunk schedule
                # (boost, R) stays a pure function of the active count,
                # so permute_n accounting is unchanged by warm timing.
                pred = st.predict_shape(result, active)
                if pred is not None and (
                    2 * pred[1] <= st.n_pts_pad
                    or pred[0] < st.n_seg_pad
                ):
                    rung_warm = (
                        _warm_rung(
                            st.w_seg_p, pred[0], pred[1], pred[2],
                            R, nshard,
                        )
                        & _warm_points_for(st, pred[3])
                    )
                    # defer only GENTLE rungs: running a chunk on
                    # 8x-oversized stale geometry costs more than
                    # blocking on the new rung's compile
                    if (shard_now or rung_warm
                            or st.n_pts_pad >= 8 * pred[1]):
                        st.rebuild(
                            result, _active_by_chr(st, active)
                        )
                    else:
                        last_stats["hist_deferred_rebuilds"] += 1

            q = st.sub_rep * nshard
            ds = _plan_stack(st.w_seg_p, st.n_seg_pad, st.n_pts_pad,
                             st.sub_rep, R, nshard)
            outs_slices = []
            r0 = 0
            for d in ds:
                Rd = d * q
                sig = sigma_p[r0 : r0 + Rd]
                if shard_now:
                    outs_slices.append(_stat_call_sharded(
                        st,
                        to_global(
                            mesh, sig,
                            jax.sharding.PartitionSpec(
                                ("perm", "site")
                            ),
                        ),
                        d,
                    ))
                    last_stats["hist_sharded_dispatches"] += 1
                else:
                    outs_slices.append(_stat_call(st, sig, d))
                    last_stats["hist_unsharded_dispatches"] += 1
                r0 += Rd
            pending.append((st, outs_slices))
        return pending

    # speculative sigma for the NEXT chunk: (boost, start, device array)
    # enqueued right before the previous chunk's host drain, so the device
    # computes it during the readback + host-update window instead of
    # serializing it at the top of the next iteration.  Row r of the
    # replicate stream is a pure function of (key, start + r), so a chunk's
    # sigma depends only on (boost, rounds_done) — the speculation is exact
    # unless the drain changes the boost tier (rare; regenerated then).
    sigma_spec = None
    # speculative next-chunk STAT dispatches (pruning-tail regime): the
    # whole next chunk is enqueued BEFORE the current chunk's blocking
    # readback, so the device rolls straight into it during the drain +
    # host-update window instead of idling one tunnel round trip per
    # chunk boundary.  ((boost, start, R), pending).  Valid because each
    # replicate row is a pure function of (key, absolute index) and the
    # statistic a pure function of (sigma, geometry); a chunk speculated
    # on pre-drain geometry covers a SUPERSET of the surviving points, so
    # its values for survivors are identical (the deferred-rebuild
    # guarantee) even when the drain pruned points.  Consumed only when
    # the schedule matches the prediction exactly and no stack is due a
    # FORCED compaction (_spec_stale) — so geometry staleness cannot
    # compound past the dispatch loop's own deferral rules.
    stat_spec = None

    def _spec_stale():
        """True when consuming the in-flight speculative chunk would skip
        a compaction the dispatch loop refuses to defer (8x-oversized
        stale geometry)."""
        for st in stacks:
            if st.pts is None or not active[st.pts].any():
                continue
            pred = st.predict_shape(result, active)
            if pred is not None and st.n_pts_pad >= 8 * pred[1]:
                return True
        return False
    if active.any() and rounds_done < cfg.n_permute and mesh is None:
        b_first = _boost(int(active.sum()), rounds_done)
        if not (rdp_ok and (RDP_FORCE == "on" or _rdp_auto_ok())):
            sigma_spec = (
                b_first, rounds_done, _gen_sigma(b_first, rounds_done)
            )
    try:
        with _InterruptState(dump_fn) as intr:
            while active.any() and rounds_done < cfg.n_permute:
                _tr = _time.monotonic()
                boost = _boost(int(active.sum()), rounds_done)
                R = min(cfg.chunk_replicates * boost,
                        cfg.n_permute - rounds_done)
                use_rdp = rdp_ok and (
                    RDP_FORCE == "on" or _rdp_auto_ok()
                )
                if use_rdp:
                    pts, out_dev = _rdp_chunk(boost, rounds_done, R)
                    if th_dev is not None:
                        flat = np.asarray(
                            jnp.concatenate(
                                [th_dev,
                                 out_dev[:R, : len(pts)].reshape(-1)]
                            )
                        )
                        T = len(flat) - R * len(pts)
                        _drain_thresholds(flat[:T])
                        nm = flat[T:].reshape(R, len(pts))
                    else:
                        nm = np.asarray(out_dev)[:R, : len(pts)]
                    _apply_round_updates(
                        result, active, threshold, rng, cfg, pts, nm,
                        rounds_done, R,
                    )
                    rounds_done += R
                    _progress()
                    logmsg(
                        MSG_DEBUG, "rdp round chunk of %d: %.1fs", R,
                        _time.monotonic() - _tr,
                    )
                    if ckpt is not None:
                        ckpt.save(result, rounds_done)
                    intr.maybe_dump()
                    continue
                # shard only when the replicate padding stays reasonable (small
                # final chunks run unsharded rather than pad 8x)
                shard_now = (
                    mesh is not None
                    and -(-R // rep_step) * rep_step <= 2 * R
                )
                nshard = ndev if shard_now else 1
                if (stat_spec is not None
                        and stat_spec[0] == (boost, rounds_done, R)
                        and not _spec_stale()):
                    # whole chunk already in flight from the previous
                    # iteration's speculation; drain it below
                    pending = stat_spec[1]
                    sigma_spec = None
                    last_stats["hist_spec_chunks"] = (
                        last_stats.get("hist_spec_chunks", 0) + 1
                    )
                else:
                    if stat_spec is not None:
                        last_stats["hist_spec_misses"] = (
                            last_stats.get("hist_spec_misses", 0) + 1
                        )
                    if (sigma_spec is not None and sigma_spec[0] == boost
                            and sigma_spec[1] == rounds_done):
                        sigma_p = sigma_spec[2]
                    else:
                        sigma_p = _gen_sigma(boost, rounds_done)
                    sigma_spec = None
                    # (stack, [device stats]) — drained after ALL dispatches
                    # are enqueued: groups hold disjoint points, so the
                    # results are identical to interleaved updates, but the
                    # host pays ONE pipeline drain per chunk instead of one
                    # slow-tunnel round trip per group
                    pending = _dispatch_stacks(R, sigma_p, shard_now, nshard)
                stat_spec = None
                if rounds_done + R < cfg.n_permute:
                    # enqueue next chunk's sigma ahead of the drain (see
                    # sigma_spec above).  The next tier is PREDICTED with
                    # the pre-drain active count — exact unless the drain
                    # kills points across a tier boundary (then the top of
                    # the next iteration regenerates)
                    b_next = _boost(int(active.sum()), rounds_done + R)
                    sigma_spec = (
                        b_next, rounds_done + R,
                        _gen_sigma(b_next, rounds_done + R),
                    )
                    # pruning-tail boundary overlap: enqueue the whole next
                    # chunk too.  Only when unsharded and in the
                    # boosted-tier regime (few survivors — a mispredicted
                    # chunk there wastes little)
                    R_next = min(cfg.chunk_replicates * b_next,
                                 cfg.n_permute - (rounds_done + R))
                    if STAT_SPEC and mesh is None and b_next >= 16:
                        stat_spec = (
                            (b_next, rounds_done + R, R_next),
                            _dispatch_stacks(R_next, sigma_spec[2], False,
                                             1, allow_rebuild=False),
                        )
                if pending:
                    # concatenate every group's [R, n_active] block device-side
                    # and read back ONCE per chunk
                    cat = jnp.concatenate(
                        [
                            jnp.concatenate(outs, axis=0)[:R, : len(st.pts)]
                            for st, outs in pending
                        ],
                        axis=1,
                    )
                    if th_dev is not None and mesh is None:
                        # fused first-chunk drain: thresholds + chunk stats
                        # in one flat readback
                        flat = np.asarray(
                            jnp.concatenate([th_dev, cat.reshape(-1)])
                        )
                        T = len(flat) - cat.shape[0] * cat.shape[1]
                        _drain_thresholds(flat[:T])
                        nm_cat = flat[T:].reshape(cat.shape)
                    else:
                        nm_cat = (
                            gather_to_host(cat) if mesh is not None
                            else np.asarray(cat)
                        )
                    off = 0
                    for st, _ in pending:
                        _apply_round_updates(
                            result, active, threshold, rng, cfg, st.pts,
                            nm_cat[:, off : off + len(st.pts)], rounds_done, R,
                        )
                        off += len(st.pts)

                rounds_done += R
                _progress()

                # predictive warm for the next boost level: once the active
                # count is within reach of a boost threshold, compile the
                # bigger replicate layouts (and sigma program) ahead of the
                # jump so the transition chunk pays a cache hit, not a compile
                n_act_now = int(active.sum())
                b_next = _boost(
                    max(n_act_now // 4, 1),
                    rounds_done + cfg.chunk_replicates,
                )
                if b_next > boost and n_act_now:
                    R_next = min(cfg.chunk_replicates * b_next,
                                 max(cfg.n_permute - rounds_done, 1))
                    shard_next = (
                        mesh is not None
                        and -(-R_next // rep_step) * rep_step <= 2 * R_next
                    )
                    nshard_next = ndev if shard_next else 1
                    _warm_sigma(R_gen * b_next + q_max)
                    for st in stacks:
                        if st.pts is None or not active[st.pts].any():
                            continue
                        pred = st.predict_shape(result, active)
                        if pred is not None:
                            _warm_rung(st.w_seg_p, pred[0], pred[1],
                                       pred[2], R_next, nshard_next)
                            _warm_rung(st.w_seg_p, st.n_seg_pad,
                                       st.n_pts_pad, st.sub_rep, R_next,
                                       nshard_next)

                logmsg(
                    MSG_DEBUG, "hist round chunk of %d: %.1fs", R,
                    _time.monotonic() - _tr,
                )
                if ckpt is not None:
                    ckpt.save(result, rounds_done)
                intr.maybe_dump()

    finally:
        last_stats.update(warm.stats)
        warm.close()
    if th_dev is not None:
        # loop never drained (everything finished at entry, e.g. a resumed
        # checkpoint): read the thresholds back directly
        _drain_thresholds(np.asarray(th_dev))
    if ckpt is not None:
        ckpt.close()
    logmsg(
        MSG_STATUS,
        "Scanning snp block permutations... finished (%d rounds).",
        rounds_done,
    )
    return result


def prewarm_hist_permute(data, tables, scan_cfg, cfg: PermuteConfig):
    """Start background compiles of the permutation programs BEFORE the scan.

    Every dispatch shape of the histogram permutation driver is a pure
    function of the dataset geometry (chromosome lengths, coarse-interval
    counts) and the config — none of it needs scan results.  A pipeline
    that will permute (cfg.n_permute > 0) can therefore call this right
    after the model build: the setup/threshold/first-chunk/early-rung
    programs then compile on background threads WHILE the scan runs, and
    the permutation phase starts on a warm persistent cache instead of
    serializing ~30 s of compiles into its wall (utils/precompile.py).

    Returns the Precompiler (callers may ignore it; compiles continue in
    the background) or None when the hist path would not be taken.
    """
    from ..ops.histclr import hist_geometry_ok
    from ..utils.precompile import Precompiler
    from .scan import chromosome_candidates

    if cfg.n_permute <= 0 or not cfg.use_hist:
        return None
    rows_used = np.unique(np.asarray(data.row))
    max_n = max((cl.n_snps for cl in data.chr_limits), default=0)
    geom_ok = all(
        hist_geometry_ok(
            data.pos[cl.start_index : cl.start_index + cl.n_snps]
        )
        for cl in data.chr_limits if cl.n_snps > 0
    )
    if not (hist_supported(len(rows_used), max_n) and geom_ok):
        return None
    ndev = jax.device_count()
    mesh = None
    if ndev > 1:
        # sharded dispatches go through the lru-cached jitted shard_map
        # callables (_sharded_stack_fn) — warm those with GLOBAL shapes
        from ..parallel import make_scan_mesh

        mesh = make_scan_mesh()

    from .scan import make_scan_hist_tables

    ht = make_scan_hist_tables(
        data, tables, n_alpha=cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    if ht is None:
        return None
    Jf = stat_positions(cfg)
    n_rows = ht.n_rows
    W = int(data.n_snps)
    n_groups = -(-W // PERM_GROUP) if W else 1
    gmode = (
        ht.weights is None and GROUP_STAT
        and min(
            (cl.n_snps for cl in data.chr_limits if cl.n_snps > 0),
            default=0,
        ) >= GROUP_STAT_MIN_SITES
    )
    # mirror the dispatch loop's table selection exactly (thin i16 row-id
    # rows in exact mode by default; gmode group sums; f32 weight rows)
    if ht.weights is not None:
        oh_dt, oh_cols = jnp.float32, PERM_GROUP * n_rows
    elif gmode:
        oh_dt, oh_cols = jnp.int8, n_rows
    elif THIN_OH:
        oh_dt, oh_cols = jnp.int16, PERM_GROUP
    else:
        oh_dt, oh_cols = jnp.int8, PERM_GROUP * n_rows

    # mirror _scan_permute_hist's stack construction (shapes only)
    by_len: dict = {}
    for cl in data.chr_limits:
        if cl.n_snps == 0:
            continue
        w_seg_p = -(-(cl.n_snps + 2 * PERM_GROUP) // 4096) * 4096
        n_int = chromosome_candidates(cl, scan_cfg)[0].shape[0]
        by_len.setdefault(w_seg_p, []).append((cl, n_int))
    margin = 2
    for w_seg_p, segs in by_len.items():
        gw_m = -(-(w_seg_p // PERM_GROUP + 2) // 512) * 512
        for cl, _ in segs:
            margin = max(
                margin,
                2 + cl.start_index // PERM_GROUP
                + max(w_seg_p // PERM_GROUP, gw_m) - 1
                - n_groups,
            )
    n_sig_pad = n_groups + margin

    warm = Precompiler()
    _sds = jax.ShapeDtypeStruct
    # key scheme MUST match _scan_permute_hist's exactly: a finished
    # prewarm marks the driver's later submit() a no-op via _done_keys
    _geom_key = (ht.n_cells, n_rows, ht.n_alpha, Jf, cfg.hist_bf16,
                 n_sig_pad, str(jnp.dtype(oh_dt)), gmode)

    def _warm_stack(w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
                    sharded=False):
        gw = -(-(w_seg_p // PERM_GROUP + 2) // 512) * 512

        def fn():
            i32 = jnp.int32
            seg = _sds((n_seg_pad,), i32)
            oh_sds = _sds((n_groups + 1, oh_cols), oh_dt)
            b_sds = _sds((n_pts_pad * Jf, 2, ht.n_cells + 1), i32)
            f_sds = _sds((n_pts_pad * Jf, 2, ht.n_cells), jnp.float32)
            t3_sds = _sds(ht.t3.shape, ht.t3.dtype)
            sig_sds = _sds(
                (n_slices * sub_rep * (mesh.size if sharded else 1),
                 n_sig_pad), jnp.int32,
            )
            if sharded:
                if gmode:
                    f = _sharded_stack_g_fn(
                        mesh, gw, n_seg_pad, n_rows, ht.n_cells,
                        ht.n_alpha, sub_rep, n_slices, n_pts_pad, Jf,
                        cfg.hist_bf16,
                    )
                    f.lower(
                        oh_sds, sig_sds, seg, seg, b_sds, f_sds, t3_sds,
                    ).compile()
                    return
                f = _sharded_stack_fn(
                    mesh, w_seg_p, n_seg_pad, n_rows, ht.n_cells,
                    ht.n_alpha, sub_rep, n_slices, n_pts_pad, Jf,
                    cfg.hist_bf16,
                )
                f.lower(
                    oh_sds, sig_sds, seg, seg, seg, b_sds, f_sds, t3_sds,
                ).compile()
                return
            if gmode:
                _stack_stat_g.lower(
                    oh_sds, sig_sds, seg, seg, b_sds, f_sds, t3_sds,
                    gw=gw, n_seg=n_seg_pad, n_rows=n_rows,
                    n_cells=ht.n_cells, n_alpha=ht.n_alpha,
                    sub_rep=sub_rep, n_slices=n_slices, n_pts=n_pts_pad,
                    Jf=Jf, mm_bf16=cfg.hist_bf16,
                ).compile()
                return
            _stack_stat.lower(
                oh_sds, sig_sds,
                seg, seg, seg, b_sds, f_sds, t3_sds,
                w_seg_p=w_seg_p, n_seg=n_seg_pad, n_rows=n_rows,
                n_cells=ht.n_cells, n_alpha=ht.n_alpha, sub_rep=sub_rep,
                n_slices=n_slices, n_pts=n_pts_pad, Jf=Jf,
                mm_bf16=cfg.hist_bf16,
            ).compile()

        warm.submit(
            ("stack", w_seg_p, n_seg_pad, n_pts_pad, sub_rep, n_slices,
             _geom_key) + (("sharded",) if sharded else ()),
            fn,
        )

    # geometry-build programs (_device_points): the permutation setup and
    # every compaction rung call these foreground, and each (chromosome
    # shape class, candidate-pad class) pair is a distinct XLA program
    # whose tunnel compile costs tens of seconds — the round-2 first-run
    # log's 22-43 s mid-run chunks were exactly these (VERDICT r2 item 4)
    from ..ops.histclr import _SLAB_K, _device_points

    qb = getattr(data, "_hist_qbits", None)

    def _warm_points(w_pad, nb_pad, n_cp):
        C = n_cp * Jf
        # mirror the driver's ("points", shapes, C, qbits, n_cells) key:
        # the shape tuple is make_hist_device_arrays' output signature
        sig = (
            ((w_pad,), "int32"),
            ((w_pad + 1, 2), "int32"),
            ((ht.n_cells,), "int32"),
            ((nb_pad, 1 + _SLAB_K), "int32"),
        )
        quantum = PERM_GROUP if gmode else 0
        key = ("points", sig, C, qb, ht.n_cells, quantum)

        def fn():
            i32 = jnp.int32
            ci = _sds((C,), i32)
            _device_points.lower(
                _sds((w_pad,), i32),
                _sds((w_pad + 1, 2), i32),
                _sds((ht.n_cells,), i32),
                _sds((nb_pad, 1 + _SLAB_K), i32),
                ci, ci, ci, ci,
                n_cells=ht.n_cells, qbits=qb, quantum=quantum,
            ).compile()

        warm.submit(key, fn)

    def _warm_sigma_pre(n_rep):
        from ..ops.permute import (
            _replicates, effective_block_width, n_blocks_for,
        )

        gpos = data.genome_pos()
        span = int(gpos[-1]) - int(gpos[0]) if len(gpos) else 0
        G = -(-len(gpos) // PERM_GROUP) if len(gpos) else 1
        width_bp = cfg.scan_width_mb * 1e6

        def fn():
            _replicates.lower(
                _sds((), jax.random.key(0).dtype),
                _sds((), jnp.uint32),
                _sds((G,), jnp.int32),
                n_blocks=n_blocks_for(span, width_bp),
                n_replicates=int(n_rep),
                width=effective_block_width(span, width_bp),
            ).compile()

        warm.submit(("sigma", n_rep, len(gpos), int(width_bp)), fn)

    K = sum(n for _, segs in by_len.items() for _, n in segs)
    b0 = _boost_levels(K, n_groups, cfg)[0]
    R_gen = -(-cfg.chunk_replicates // HIST_REP_SUB) * HIST_REP_SUB
    R0 = min(cfg.chunk_replicates * b0, max(cfg.n_permute, 1))
    # mirror the driver's shard_now decision for the first chunk: warm
    # sharded executables only when the replicate padding rule says the
    # dispatch will actually shard
    rep_step = HIST_REP_SUB * (ndev if mesh is not None else 1)
    shard0 = mesh is not None and -(-R0 // rep_step) * rep_step <= 2 * R0
    nshard0 = ndev if shard0 else 1
    q_max_pre = 2 * HIST_REP_SUB * (ndev if mesh is not None else 1)
    _warm_sigma_pre(R_gen * b0 + q_max_pre)
    for w_seg_p, segs in sorted(by_len.items()):
        S_pad = _ladder_pad(len(segs))
        n_pts = sum(n for _, n in segs)
        n_pts_pad = _pad_pow2(max(n_pts, 1), minimum=4)
        gw_pre = -(-(w_seg_p // PERM_GROUP + 2) // 512) * 512
        sub_rep = (
            _sub_rep_for_g(ht, S_pad, gw_pre) if gmode
            else _sub_rep_for(ht, S_pad, w_seg_p)
        )
        _warm_stack(w_seg_p, S_pad, n_pts_pad, 1, 1)  # threshold pass
        geo = set()
        for cl, _ in segs:
            n = cl.n_snps
            pos_last = int(data.pos[cl.start_index + n - 1])
            w_pad = max(-(-n // 4096) * 4096, 4096)
            nb = (pos_last >> qb) + 2 if qb is not None else 0
            nb_pad = max(-(-nb // 4096) * 4096, 4096)
            geo.add((w_pad, nb_pad))
        n_cp = _pad_pow2(max((n for _, n in segs), default=1), minimum=4)
        p = n_pts_pad
        q0 = sub_rep * nshard0
        for rung in range(5):
            for d in set(_plan_ds(
                (-(-R0 // q0) * q0) // q0,
                _plan_m(_slice_cost_for(
                    ht, S_pad, 4 * gw_pre if gmode else w_seg_p, p, Jf,
                    sub_rep)),
            )):
                _warm_stack(w_seg_p, S_pad, p, sub_rep, d,
                            sharded=nshard0 > 1)
            if qb is not None:
                for w_pad, nb_pad in geo:
                    _warm_points(w_pad, nb_pad, n_cp)
            if p == 4:
                break
            p = max(p // 2, 4)
            n_cp = max(n_cp // 2, 4)
    return warm


def _boost_levels(n_act, n_groups, cfg):
    """(initial boost, cap) — the adaptive-cadence rule of the hist driver
    as a pure function, for shape prediction (prewarm_hist_permute).
    MUST mirror the driver's _boost at rounds_done=0 (prewarm predicts
    the SETUP shapes; the mid-run b=4 tier is gated on elapsed rounds and
    is warmed by the driver's predictive path instead)."""
    R_gen = -(-cfg.chunk_replicates // HIST_REP_SUB) * HIST_REP_SUB
    boost_cap = max(1, SIGMA_ELEM_CAP // max(n_groups, 1) // max(R_gen, 1))
    b = 1
    if n_act <= HIST_POINT_BUCKET // 4:
        b = 16
    if n_act <= HIST_POINT_BUCKET // 8:
        b = 64
    while b > boost_cap:
        b //= 2
    return max(b, 1), boost_cap

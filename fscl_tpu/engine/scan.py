"""Genome scan engine: coarse intervals, dense position search, refinement.

Reference: scan_chromosome (/root/reference/scan-chromosome.c:228-329).  The
C walks a pthread work queue of coarse intervals (default 100 kb); inside
each it evaluates the interval endpoints and greedily bisects to ``bp_resl``
(128 bp) resolution (scan-chromosome.c:103-139), maximizing CLR over alpha at
every probed position.

TPU-native redesign (SURVEY.md section 7): the greedy bisection becomes a
dense two-stage position search — every fine-grid position (default 1 kb
pitch, the reference's -g spacing) in every interval evaluates in one batch,
then the per-interval winner is refined on a +-(fine/2) sub-grid at bp_resl
pitch.  This evaluates strictly more positions than the bisection path, so
per-interval maxima dominate the reference's (the bisection is a greedy
approximation that can miss maxima).  Work queues become batch dimensions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.histclr import (
    build_hist_points,
    build_hist_tables,
    hist_clr,
    hist_supported,
    make_hist_device_arrays,
)
from ..ops.lattice import LatticeTables, two_stage_lattice_max
from ..ops.windows import candidate_windows
from ..utils import MSG_STATUS, cr_logmsg

# dispatch counters for the most recent scan_genome call (mirrors
# engine/permute.py last_stats): tests and the multichip dryrun assert the
# intended path (e.g. the mesh-sharded branch) actually ran
last_stats: dict = {}


@dataclasses.dataclass
class ScanConfig:
    eval_range: int = 81920  # +- SNPs per window (fscl.c:175)
    bp_resl: int = 128  # position refinement resolution (fscl.c:174)
    small_grid_sp: int = 1000  # fine grid pitch in bp (fscl.c:158)
    large_grid_sp: int = 100000  # coarse interval width in bp (fscl.c:159)
    chunk: int = 32  # candidate chunk in the exact CLR kernel: the
    # lattice kernel runs a lax.scan over candidate chunks, and the scan's
    # per-step overhead dominated the exact re-eval stage at 8 (the
    # genome1m profile showed ~0.45 s/chromosome, mostly step overhead);
    # 32 keeps per-step transients a few MB while cutting steps 4x
    hist_c_sub: int = 256  # dense-stage candidate chunk (ops/histclr.py
    # hist_clr lax.scan): 64 made the genome1m dense stage ~16k sequential
    # scan steps (~10 us/candidate, step-overhead-bound); 256 cuts steps
    # 4x and feeds the MXU full 256-row matmuls
    refine: bool = True  # bp_resl refinement pass
    # multi-branch refinement (round 3, VERDICT r2 item 2): the dense
    # stage's per-interval TOP-K fine-grid cells within ``branch_margin``
    # of the dense winner each get their own refine zoom, and the exact
    # re-eval covers every probed position within ``hist_tie_margin`` of
    # the final winner.  A single-branch zoom missed true maxima whenever
    # the hist selection error (~1 CLR at decimate 8) picked the wrong
    # 1 kb cell — the genome1m neutral parity showed deficits to 4.9 CLR
    # at 1.5% of intervals.  branch_margin must be >= hist_tie_margin so
    # every potential tie cell is actually probed at bp_resl.
    branch_k: int = 6
    branch_margin: float = 3.0
    # cap on (candidates x padded sites) per device dispatch: long single
    # dispatches (> ~20s) can trip TPU-runtime watchdogs, and every distinct
    # shape costs a (minutes-long, tunnel-remote) compile.  A small cap keeps
    # the candidate padding at one fixed bucket (4096) for ALL calls, so each
    # chromosome size compiles exactly once.
    dispatch_cap: int = 4096 * 24576
    # histogram fast path for the dense position stages (ops/histclr.py);
    # winners are always re-evaluated with the exact lattice kernel, so
    # reported CLR/alpha are unchanged up to near-tie argmax selection
    use_hist: bool = True
    hist_alphas: int = 128
    # probed positions within this margin of the selection winner enter
    # the decimate-1 tie-resolution stage (the dec-8 selection values
    # carry run-mean + decimation error that is usually ~1 CLR but tails
    # to several units when per-cell errors correlate across a window)
    hist_tie_margin: float = 2.0
    hist_tie_cap: int = 8  # tie-resolution candidates per interval
    # tie resolution: re-rank the tie pool on a near-undecimated lattice
    # (decimate 2: run-mean + tiny decimation error, ~0.05 CLR — 4x the
    # dec-1 error at half the bounds-gather rows), then the exact kernel
    # evaluates the survivors within exact_margin of the winner.  A tied
    # runner-up chosen wrongly costs at most the tie-resolution error plus
    # exact_margin, inside the 0.5-CLR parity band.
    tie_decimate: int = 2
    exact_margin: float = 0.25
    exact_cap: int = 2
    # refine probes +-refine_halfwidth steps per round; the pitch shrinks
    # 8x per round, so halfwidth 4 exactly covers the previous pitch
    # (+-pitch/2) with no gap while halving the refine stage's work
    refine_halfwidth: int = 4
    # the zoom continues one round BELOW bp_resl (to bp_resl/4, floor 16):
    # the CLR surface varies at sub-128-bp scale near informative sites
    # (a measured genome1m case moved 0.87 CLR across 66 bp), and the
    # reference's bisection probes land anywhere at bp_resl pitch — a
    # sub-resolution polish round keeps our probed maxima dominant
    refine_subresl: bool = True  # exact re-eval candidates per interval
    # SNP-anchored dense probes: at large alpha the CLR surface has
    # sub-kb-wide maxima pinned to individual sites (the reference's
    # bisection lands on them, scan-chromosome.c:66-71 bumps off exact
    # collisions); a bp-grid of any practical pitch misses them, so every
    # site whose table row can beat its null by more than
    # snp_probe_min_gain anywhere on the alpha grid is probed directly
    snp_probes: bool = True
    snp_probe_min_gain: float = 0.25
    hist_decimate: int = 8  # lattice decimation for the selection stages
    # (ops/histclr.py build_hist_tables), capped so the decimated step
    # stays under ~0.1 log_ad units; winners are re-evaluated exactly.
    # 8 matches the permutation statistic's decimation, so scan and
    # permutation share ONE table build; the larger selection error
    # (~1 CLR on sharp peaks) is covered by the multi-branch refine +
    # tie-margin exact re-eval rather than a finer selection lattice.


@dataclasses.dataclass
class ScanResult:
    """One entry per coarse interval (the reference's scan_pt_t array)."""

    chr_id: np.ndarray  # [K] i32
    sweep_pos: np.ndarray  # [K] i64
    clr: np.ndarray  # [K] f64
    lalpha: np.ndarray  # [K] f64
    nearest: np.ndarray  # [K] global site index
    window_start: np.ndarray  # [K] global site index
    window_end: np.ndarray  # [K] global site index
    interval_start: np.ndarray  # [K] bp (coarse interval, for permutation)
    interval_end: np.ndarray  # [K] bp
    permute_n: np.ndarray  # [K] i64
    permute_p: np.ndarray  # [K] i64
    permute_finished: np.ndarray  # [K] bool
    null_clr: list  # per point: list/array of saved null CLRs
    # observed value of the PERMUTATION statistic (the fixed-grid
    # functional, engine/permute.py) — the threshold the exceedance counts
    # compare against.  Tail projections must use this, not the reported
    # dense-scan `clr`: the two differ by the statistic's interpolation/
    # decimation offset, and projecting the exact CLR against nulls of the
    # decimated functional miscalibrates the tail (round-2 genome1m pcal).
    stat_threshold: np.ndarray = None  # [K] f64, NaN until permuted

    @property
    def n_points(self) -> int:
        return len(self.sweep_pos)


def _pad_pow2(n, minimum=256):
    p = minimum
    while p < n:
        p *= 2
    return p


def _pad_sites(n, quantum=4096):
    """Site-axis padding: multiples of ``quantum`` (pow2 padding wastes up
    to 2x gather work on the hot axis; a 4096 quantum keeps recompiles rare
    while capping waste at ~20%)."""
    return max(-(-n // quantum) * quantum, quantum)


def _pad_cand(n):
    """Exact-kernel candidate padding: pow2 up to 512 (few classes for
    small calls), then 256-multiples (pow2 wasted up to 40% of the
    per-site window work on ~700-1500-candidate exact stages)."""
    return _pad_pow2(n, 256) if n <= 512 else -(-n // 256) * 256


def chromosome_candidates(cl, cfg):
    """Fine-grid candidate positions for one chromosome.

    Intervals k start at start_pos + k*large_grid_sp while < bp_length
    (scan-chromosome.c:177-204); each contributes candidates at
    small_grid_sp pitch plus the clamped interval end.  Returns
    (cand [n_int, J], valid [n_int, J], istart [n_int], iend [n_int]).
    """
    coarse = cfg.large_grid_sp
    fine = cfg.small_grid_sp
    cpf = coarse // fine
    starts = np.arange(cl.start_pos, cl.bp_length, coarse, dtype=np.int64)
    if len(starts) == 0:
        starts = np.array([cl.start_pos], dtype=np.int64)
    ends = np.minimum(starts + coarse, cl.bp_length)
    J = cpf + 2
    j = np.arange(cpf + 1, dtype=np.int64)
    cand = np.empty((len(starts), J), dtype=np.int64)
    cand[:, : cpf + 1] = starts[:, None] + j[None, :] * fine
    cand[:, cpf + 1] = ends  # explicit (possibly clamped) interval end
    valid = cand <= ends[:, None]
    cand = np.minimum(cand, ends[:, None])
    return cand, valid, starts, ends


class _ChromosomeBlock:
    """Device-resident padded site arrays for one chromosome."""

    def __init__(self, data, cl, lattice_tables, mesh=None):
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        n = cl.n_snps
        w_pad = _pad_sites(n)
        self.n = n
        self.w_pad = w_pad
        self.pos_np = np.asarray(data.pos[sl])
        # per-chromosome device uploads memoized on the dataset (repeat
        # scans re-upload ~10 MB of identical arrays otherwise;
        # attach_model drops the cache with the rest of the device state)
        cache = getattr(data, "_blk_cache", None)
        if cache is None:
            cache = data._blk_cache = {}
        key = (cl.start_index, n)
        if key not in cache:
            pos = np.full(
                w_pad, np.iinfo(np.int32).max // 2, dtype=np.int32
            )
            pos[:n] = data.pos[sl]
            row = np.zeros(w_pad, dtype=np.int32)
            row[:n] = data.row[sl]
            null = np.zeros(w_pad, dtype=np.float32)
            null[:n] = data.null_logl[sl]
            cache[key] = (
                jnp.asarray(pos), jnp.asarray(row), jnp.asarray(null)
            )
        self.pos, self.row, self.null = cache[key]
        self.lt = lattice_tables
        self.mesh = mesh

    def eval_candidates_device(self, cand_flat, cfg, seed_la=None):
        """Enqueue the exact three-stage evaluation; returns a [2, P_pad]
        DEVICE array (clr, lalpha) when it fits in one dispatch, else None
        (callers fall back to the splitting host path).  Lets scan_genome
        pipeline every chromosome's exact stage behind one readback."""
        P_total = len(cand_flat)
        max_p = max(cfg.dispatch_cap // max(self.w_pad, 1), cfg.chunk)
        if P_total > max_p:
            return None
        clr, la, *_ = self._dispatch(cand_flat, cfg, seed_la=seed_la)
        return jnp.stack([clr, la])

    def _dispatch(self, cand_flat, cfg, row=None, null=None, seed_la=None):
        """One padded two_stage_lattice_max dispatch (device outputs).

        Power-of-2 candidate buckets (>= 256) bound the compiled-shape
        count while keeping small calls small: the winners-only exact
        re-eval passes ~n_int candidates, and padding those to a fixed
        4096 made the per-site lattice kernel 20x more expensive than
        needed (0.8s -> <0.1s on the 20k-site bench)."""
        ns, lo, hi = candidate_windows(self.pos_np, cand_flat, cfg.eval_range)
        P = len(cand_flat)
        p_pad = _pad_cand(P)
        if self.mesh is not None:
            p_pad = -(-p_pad // self.mesh.size) * self.mesh.size
        cand_d = np.zeros(p_pad, dtype=np.int32)
        cand_d[:P] = cand_flat
        lo_d = np.ones(p_pad, dtype=np.int32)
        hi_d = np.zeros(p_pad, dtype=np.int32)
        lo_d[:P] = lo
        hi_d[:P] = hi
        if self.mesh is not None:
            # candidates sharded over every mesh device — the TPU form of
            # the reference's pthread scan work queue (the seed is unused
            # here; the sharded program runs the full three-stage search,
            # which covers any seed's bracket)
            from ..parallel.shard import sharded_scan_eval

            last_stats["lattice_sharded_dispatches"] = (
                last_stats.get("lattice_sharded_dispatches", 0) + 1
            )
            clr, la = sharded_scan_eval(
                self.mesh, self.lt,
                self.row if row is None else row,
                self.pos,
                self.null if null is None else null,
                jnp.asarray(cand_d), jnp.asarray(lo_d), jnp.asarray(hi_d),
                chunk=cfg.chunk,
            )
        elif seed_la is not None:
            from .. import LOG_AD_MIN
            from ..ops.lattice import lattice_step, seeded_lattice_max

            step = lattice_step(self.lt.grid_points)
            m_seed = np.zeros(p_pad, dtype=np.int32)
            m_seed[:P] = np.round(
                (np.asarray(seed_la, dtype=np.float64) - LOG_AD_MIN) / step
            ).astype(np.int32)
            clr, la = seeded_lattice_max(
                self.lt,
                self.row if row is None else row,
                self.pos,
                self.null if null is None else null,
                jnp.asarray(cand_d),
                jnp.asarray(lo_d),
                jnp.asarray(hi_d),
                jnp.asarray(m_seed),
                chunk=cfg.chunk,
            )
        else:
            clr, la = two_stage_lattice_max(
                self.lt,
                self.row if row is None else row,
                self.pos,
                self.null if null is None else null,
                jnp.asarray(cand_d),
                jnp.asarray(lo_d),
                jnp.asarray(hi_d),
                chunk=cfg.chunk,
            )
        return clr, la, ns, lo, hi

    def eval_candidates(self, cand_flat, cfg, grid_points=None, row=None,
                        null=None, seed_la=None):
        """Three-stage alpha max CLR for a flat candidate array (host I/O).

        Splits into multiple dispatches when P x W exceeds cfg.dispatch_cap
        (long single dispatches can trip TPU-runtime watchdogs).
        """
        P_total = len(cand_flat)
        max_p = max(cfg.dispatch_cap // max(self.w_pad, 1), cfg.chunk)
        if P_total > max_p:
            outs = [
                self.eval_candidates(
                    cand_flat[i : i + max_p], cfg, row=row, null=null,
                    seed_la=(
                        None if seed_la is None else seed_la[i : i + max_p]
                    ),
                )
                for i in range(0, P_total, max_p)
            ]
            return tuple(
                np.concatenate([o[j] for o in outs]) for j in range(5)
            )
        clr, la, ns, lo, hi = self._dispatch(cand_flat, cfg, row=row,
                                             null=null, seed_la=seed_la)
        P = len(cand_flat)
        return np.asarray(clr)[:P], np.asarray(la)[:P], ns, lo, hi


class _HistScanContext:
    """Histogram-engine evaluation context for one chromosome's scan."""

    def __init__(self, ht, data, cl, cfg, mesh=None):
        sl = slice(cl.start_index, cl.start_index + cl.n_snps)
        self.ht = ht
        self.pos_np = np.asarray(data.pos[sl])
        self.row_c = jnp.asarray(
            ht.row_map[np.asarray(data.row[sl])].astype(np.int32)
        )
        self.dev = get_hist_device_arrays(
            data, ht, self.pos_np, cl.start_index
        )
        self.eval_range = cfg.eval_range
        self.c_sub = getattr(cfg, "hist_c_sub", 256)
        self.mesh = mesh

    def eval_max_device(self, cand_flat):
        """Enqueue the (max-CLR, lalpha) evaluation; returns a [2, P]
        DEVICE array so callers can pipeline many chromosomes' dispatches
        and drain them with ONE host readback (the remote link pays per
        round trip — per-chromosome syncs serialize device and host)."""
        ht = self.ht
        # candidate-count quantization: every distinct padded size is its
        # own XLA program for the geometry build AND the CLR kernel, and
        # the dense/refine flats vary per chromosome (SNP-probe counts,
        # kept-branch counts are data-dependent) — a coarse quantum for
        # large flats caps the compiled-shape count at ~20% padding waste
        pad = 2048 if len(cand_flat) <= 16384 else 8192
        hp = build_hist_points(
            ht, self.pos_np, cand_flat, self.eval_range,
            cand_pad=pad, device_arrays=self.dev,
        )
        if self.mesh is not None:
            from ..parallel.shard import sharded_hist_eval

            last_stats["hist_sharded_dispatches"] = (
                last_stats.get("hist_sharded_dispatches", 0) + 1
            )
            bounds, fbar = hp.bounds, hp.fbar
            pad = -(-bounds.shape[0] // self.mesh.size) * self.mesh.size
            if pad != bounds.shape[0]:
                pad -= bounds.shape[0]
                bounds = jnp.pad(bounds, ((0, pad), (0, 0), (0, 0)))
                fbar = jnp.pad(fbar, ((0, pad), (0, 0), (0, 0)))
            out = sharded_hist_eval(self.mesh, ht, bounds, fbar, self.row_c)
            return out[:, : len(cand_flat)]
        clr = hist_clr(
            ht.t3, hp.bounds, hp.fbar, self.row_c,
            n_cells=ht.n_cells, n_rows=ht.n_rows, n_alpha=ht.n_alpha,
            c_sub=self.c_sub, weights=ht.weights,
        )[: len(cand_flat)]
        a = jnp.argmax(clr, axis=1)
        best = jnp.take_along_axis(clr, a[:, None], axis=1)[:, 0]
        la = jnp.asarray(ht.lalpha)[a]
        return jnp.stack([best, la])

    def eval_max(self, cand_flat):
        """(max-CLR over the dense alpha grid, lalpha) per candidate.

        Selection-grade values (run-mean interpolation, ~1e-2 CLR); final
        winners get exact re-evaluation by the caller.
        """
        out = np.asarray(self.eval_max_device(cand_flat))
        return out[0], out[1]


def get_lattice_tables(tables):
    """Memoized LatticeTables for a model: the three lattice packs are
    ~50 MB of host build + device upload, identical for every scan/permute
    call on the same tables."""
    lt = getattr(tables, "_lattice", None)
    if lt is None:
        lt = tables._lattice = LatticeTables(
            tables.table, tables.grid_points
        )
    return lt


def get_hist_device_arrays(data, ht, pos_np, start_index):
    """Memoized make_hist_device_arrays for one chromosome of a dataset.

    Both the scan's _HistScanContext and the permutation driver's stack
    setup need the same chromosome-resident geometry arrays (position
    prefix, block table); building them twice paid a host searchsorted +
    device upload per chromosome per phase.  Cached on ``data`` keyed by
    the chromosome identity and the table geometry (attach_model drops
    the cache with the rest of the hist state)."""
    cache = getattr(data, "_hist_dev_cache", None)
    if cache is None:
        cache = data._hist_dev_cache = {}
    qb = getattr(data, "_hist_qbits", None)
    key = (start_index, len(pos_np), qb, ht.n_cells,
           round(float(ht.step), 12))
    if key not in cache:
        cache[key] = make_hist_device_arrays(ht, pos_np, qbits=qb)
    return cache[key]


def make_scan_hist_tables(data, tables, n_alpha=128, decimate=1):
    """Genome-wide HistTables for the scan's dense stages (or None).

    Decimation is capped so the decimated lattice step stays under ~0.1
    log_ad units (coarse test grids fall back to the exact lattice).
    The result is memoized on ``data`` keyed by (n_alpha, effective
    decimation) — scan and permutation share one table build per dataset
    (attach_model drops the cache when the model changes)."""
    from .. import LOG_AD_MAX, LOG_AD_MIN
    from ..ops.histclr import dataset_qbits

    base_step = (LOG_AD_MAX - LOG_AD_MIN) / max(tables.grid_points - 1, 1)
    decimate = max(1, min(int(decimate), int(0.1 / base_step)))
    cache = getattr(data, "_hist_tables_cache", None)
    if cache is None:
        cache = data._hist_tables_cache = {}
    key = (n_alpha, decimate)
    if key in cache:
        return cache[key]

    row = np.asarray(data.row)
    rows_used = np.unique(row)
    max_n = max((cl.n_snps for cl in data.chr_limits), default=0)
    ht = None
    extents = [
        int(data.pos[cl.start_index + cl.n_snps - 1] - data.pos[cl.start_index])
        for cl in data.chr_limits if cl.n_snps > 0
    ]
    # one dataset-wide block quantum: each distinct qbits is a separate
    # compile of the geometry program, so chromosomes share the minimum
    qb = dataset_qbits([
        data.pos[cl.start_index : cl.start_index + cl.n_snps]
        for cl in data.chr_limits if cl.n_snps > 0
    ])
    data._hist_qbits = qb
    if (
        hist_supported(len(rows_used), max_n)
        and extents
        and qb is not None
    ):
        null_row = np.zeros(tables.table.shape[0])
        null_row[row] = np.asarray(data.null_logl)
        ht = build_hist_tables(
            tables.table, tables.grid_points, null_row, rows_used,
            extent_bp=max(extents) + 1, n_alpha=n_alpha, decimate=decimate,
            site_row_counts=np.bincount(
                row, minlength=tables.table.shape[0]
            ),
        )
    cache[key] = ht
    return ht


def refine_positions(best_pos, istart, iend, pitch):
    """+-8 steps of ``pitch`` around per-interval winners, interval-clamped."""
    offs = np.arange(-8, 9, dtype=np.int64) * pitch
    cand = best_pos[:, None] + offs[None, :]
    cand = np.clip(cand, istart[:, None], iend[:, None])
    return cand


def _tie_candidates(st, cfg):
    """Exact re-eval set for one chromosome: flat (positions, owners).

    Per interval: the selection winner plus every PROBED position (branch
    bests and final-round refine probes) whose selection-grade CLR lies
    within ``hist_tie_margin`` of the winner's, deduplicated and capped at
    ``hist_tie_cap`` by CLR rank.  The exact kernel then takes the true
    max over this set, so selection error within the margin cannot cost a
    reported maximum.
    """
    pools = [(st.r, st.best_pos, st.best_clr)]
    if st.bkeep is not None:
        bi, bj = np.nonzero(st.bkeep)
        pools.append((bi, st.bpos[bi, bj], st.bclr[bi, bj]))
    if st.probe_owner is not None:
        pools.append((st.probe_owner, st.probe_pos, st.probe_clr))
    if st.snp_clr is not None:
        pools.append((st.snp_owner, st.snp_cand, st.snp_clr))
    owner = np.concatenate([p[0] for p in pools])
    pos = np.concatenate([p[1] for p in pools])
    clr = np.concatenate([p[2] for p in pools])
    near = clr >= st.best_clr[owner] - cfg.hist_tie_margin
    owner, pos, clr = owner[near], pos[near], clr[near]
    # dedup (owner, pos) keeping the best selection CLR for each
    o = np.lexsort((-clr, pos, owner))
    owner, pos, clr = owner[o], pos[o], clr[o]
    first = np.ones(len(owner), dtype=bool)
    first[1:] = (owner[1:] != owner[:-1]) | (pos[1:] != pos[:-1])
    owner, pos, clr = owner[first], pos[first], clr[first]
    # cap per interval by CLR rank (owner asc, clr desc -> rank = offset
    # from the owner group's first element)
    o = np.lexsort((-clr, owner))
    owner, pos = owner[o], pos[o]
    rank = np.arange(len(owner)) - np.searchsorted(owner, owner)
    keep = rank < cfg.hist_tie_cap
    return pos[keep], owner[keep]


def _exact_select(owner, clr1, margin, cap):
    """Per owner: keep the winner plus candidates within ``margin`` of it,
    capped at ``cap`` by rank; boolean mask over the flat pool."""
    o = np.lexsort((-clr1, owner))
    os_, cs = owner[o], clr1[o]
    start = np.searchsorted(os_, os_)
    rank = np.arange(len(o)) - start
    k = (cs >= cs[start] - margin) & (rank < cap)
    keep = np.zeros(len(owner), dtype=bool)
    keep[o[k]] = True
    return keep


def _drain(pending):
    """ONE host readback for a list of [2, P_i] device arrays.

    The remote device link pays per round trip; concatenating every
    chromosome's pending result device-side and reading back once lets the
    device pipeline all chromosomes' dispatches instead of sync-stepping.
    Multi-process runs allgather the sharded results so every host sees
    the identical values (parallel.shard.gather_to_host)."""
    from ..parallel.shard import gather_to_host

    if not pending:
        return []
    if len(pending) == 1:
        cat = gather_to_host(pending[0])
    else:
        cat = gather_to_host(jnp.concatenate(pending, axis=1))
    outs, off = [], 0
    for p in pending:
        n = p.shape[1]
        outs.append((cat[0, off : off + n], cat[1, off : off + n]))
        off += n
    return outs


class _ChrScanState:
    """Per-chromosome mutable state for the pipelined scan."""

    def __init__(self, c, cl, blk, hctx, cfg):
        self.c = c
        self.cl = cl
        self.blk = blk
        self.hctx = hctx
        self.cand, self.valid, self.istart, self.iend = (
            chromosome_candidates(cl, cfg)
        )
        self.n_int, self.J = self.cand.shape
        self.r = np.arange(self.n_int)
        self.best_pos = self.best_clr = self.best_la = None
        # per-branch refine state: [n_int, k] positions / selection-grade
        # CLR / lalpha, plus the kept-branch mask
        self.bpos = self.bclr = self.bla = self.bkeep = None
        # flat refine-round bookkeeping (kept branches only)
        self.flat_cand = self.flat_bi = self.flat_bj = None
        # final-round probes for tie collection: (interval, pos, clr)
        self.probe_owner = self.probe_pos = self.probe_clr = None
        # SNP-anchored dense probes (set by scan_genome when enabled)
        self.snp_cand = self.snp_owner = None
        self.snp_clr = self.snp_la = None
        self.cand_x = self.owner_x = None


def scan_genome(data, tables, cfg: ScanConfig, lattice=None) -> ScanResult:
    """Scan all chromosomes; returns one scan point per coarse interval.

    All chromosomes advance through each stage (dense grid, refine rounds,
    exact re-eval) together: a stage enqueues every chromosome's device
    dispatches, then drains them with one host readback — the device
    pipelines across chromosomes instead of sync-stepping each one."""
    import time as _time

    from ..utils import MSG_DEBUG1, logmsg

    _t0 = _time.monotonic()
    last_stats.clear()
    lattice = lattice or get_lattice_tables(tables)
    G = tables.grid_points

    # candidate sharding over the device mesh: the scan's dense selection,
    # refine, and exact re-eval stages are all candidate-major, so every
    # device takes a slice of candidates with site data replicated — the
    # reference's pthread work queue over coarse intervals
    # (scan-chromosome.c:162-216, 256-261) as an SPMD mesh program
    mesh = None
    if jax.device_count() > 1:
        from ..parallel import make_scan_mesh

        mesh = make_scan_mesh()

    out = {
        k: []
        for k in (
            "chr_id",
            "sweep_pos",
            "clr",
            "lalpha",
            "nearest",
            "window_start",
            "window_end",
            "interval_start",
            "interval_end",
        )
    }

    hist_ht = (
        make_scan_hist_tables(
            data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
        )
        if cfg.use_hist else None
    )

    states = []
    for c, cl in enumerate(data.chr_limits):
        blk = _ChromosomeBlock(data, cl, lattice, mesh=mesh)
        hctx = (
            _HistScanContext(hist_ht, data, cl, cfg, mesh=mesh)
            if hist_ht is not None else None
        )
        st = _ChrScanState(c, cl, blk, hctx, cfg)
        cr_logmsg(
            MSG_STATUS,
            "Scanning chromosome %s - %d intervals x %d candidates",
            cl.name,
            st.n_int,
            st.J,
        )
        states.append(st)

    def eval_stage(get_cand):
        """Evaluate get_cand(st) for every chromosome, pipelined on the
        hist path, per-chromosome on the lattice fallback."""
        flats = [get_cand(st) for st in states]
        if hist_ht is not None:
            pend = [
                st.hctx.eval_max_device(f) for st, f in zip(states, flats)
            ]
            return _drain(pend)
        return [
            st.blk.eval_candidates(f, cfg, G)[:2]
            for st, f in zip(states, flats)
        ]

    # SNP-anchored probe set per chromosome (hist path): the gain filter
    # keeps sites whose table row can beat their null anywhere on the
    # alpha grid — only those can host the sub-kb spike maxima the bp
    # grid misses (the rest are dominated by a neighboring grid probe)
    if hist_ht is not None and cfg.snp_probes:
        row_all = np.asarray(data.row)
        null_row = np.zeros(tables.table.shape[0])
        null_row[row_all] = np.asarray(data.null_logl)
        row_gain = tables.table.max(axis=1) - null_row
        for st in states:
            sl = slice(st.cl.start_index, st.cl.start_index + st.cl.n_snps)
            g = row_gain[row_all[sl]]
            keep = g > cfg.snp_probe_min_gain
            pos = st.blk.pos_np[keep].astype(np.int64)
            owner = np.searchsorted(st.istart, pos, side="right") - 1
            ok = (owner >= 0) & (pos <= st.iend[np.clip(owner, 0, None)])
            st.snp_cand = pos[ok]
            st.snp_owner = owner[ok]

    logmsg(MSG_DEBUG1, "scan setup: %.2fs", _time.monotonic() - _t0)
    _t0 = _time.monotonic()

    def _dense_cand(st):
        flat = st.cand.reshape(-1)
        if st.snp_cand is not None:
            flat = np.concatenate([flat, st.snp_cand])
        return flat

    # dense fine-grid stage (+ SNP-anchored probes in the same dispatch)
    for st, (clr_all, la_all) in zip(states, eval_stage(_dense_cand)):
        ng = st.n_int * st.J
        clr_all = np.asarray(clr_all)
        la_all = np.asarray(la_all)
        clr = np.where(
            st.valid.reshape(-1), clr_all[:ng], -np.inf
        ).reshape(st.n_int, st.J)
        la = la_all[:ng].reshape(st.n_int, st.J)
        jbest = np.argmax(clr, axis=1)
        st.best_pos = st.cand[st.r, jbest]
        st.best_clr = clr[st.r, jbest]
        st.best_la = la[st.r, jbest]
        # branch carry (VERDICT r2 item 2): top-k dense cells within
        # branch_margin of the dense winner each get a refine zoom — a
        # selection-stage error of up to branch_margin cannot drop the
        # true winning cell from the probe set
        k = max(1, min(cfg.branch_k, st.J))
        order = np.argsort(clr, axis=1)[:, -k:]  # ascending; last = winner
        st.bpos = st.cand[st.r[:, None], order]
        st.bclr = clr[st.r[:, None], order]
        st.bla = la[st.r[:, None], order]
        if st.snp_cand is not None:
            st.snp_clr = clr_all[ng : ng + len(st.snp_cand)]
            st.snp_la = la_all[ng : ng + len(st.snp_cand)]
            # top-2 SNP probes per interval join the branch pool (their
            # spikes are narrower than the refine cover, so they also get
            # the +-bp_resl zoom the reference's bisection applies)
            o = np.lexsort((-st.snp_clr, st.snp_owner))
            so, sp = st.snp_owner[o], st.snp_cand[o]
            sc, sl = st.snp_clr[o], st.snp_la[o]
            rank = np.arange(len(so)) - np.searchsorted(so, so)
            ext_pos = np.tile(st.best_pos[:, None], (1, 2))
            ext_clr = np.full((st.n_int, 2), -np.inf)
            ext_la = np.zeros((st.n_int, 2))
            for rk in (0, 1):
                m = rank == rk
                ext_pos[so[m], rk] = sp[m]
                ext_clr[so[m], rk] = sc[m]
                ext_la[so[m], rk] = sl[m]
            st.bpos = np.concatenate([st.bpos, ext_pos], axis=1)
            st.bclr = np.concatenate([st.bclr, ext_clr], axis=1)
            st.bla = np.concatenate([st.bla, ext_la], axis=1)
            st.best_clr = np.maximum(st.best_clr, st.bclr.max(axis=1))
        st.bkeep = st.bclr >= (st.best_clr - cfg.branch_margin)[:, None]
        st.bkeep[:, min(k, st.bkeep.shape[1]) - 1] = True

    logmsg(MSG_DEBUG1, "scan dense stage: %.2fs", _time.monotonic() - _t0)
    _t0 = _time.monotonic()

    if cfg.refine:
        # iterative zoom to bp_resl: re-center each kept branch on its
        # running winner and shrink the pitch ~8x per round — a batched
        # descent covering the dyadic positions the reference's greedy
        # bisection explores (scan-chromosome.c:103-139) and more.  Only
        # KEPT branches evaluate (flat candidate lists; clear-winner
        # intervals contribute one branch, so the stage costs ~1.2x the
        # single-branch zoom, not branch_k x).
        pitch = cfg.small_grid_sp
        offs_w = cfg.refine_halfwidth
        floor = (
            max(cfg.bp_resl // 4, 16) if cfg.refine_subresl
            else cfg.bp_resl
        )
        while pitch > floor:
            pitch = max(pitch // 8, floor)
            final_round = pitch <= floor

            def rcand(st, pitch=pitch):
                bi, bj = np.nonzero(st.bkeep)
                offs = np.arange(-offs_w, offs_w + 1, dtype=np.int64) * pitch
                c = st.bpos[bi, bj][:, None] + offs[None, :]
                c = np.clip(
                    c, st.istart[bi][:, None], st.iend[bi][:, None]
                )
                st.flat_bi, st.flat_bj = bi, bj
                st.flat_cand = c.reshape(-1)
                return st.flat_cand

            for st, (clr2, la2) in zip(states, eval_stage(rcand)):
                nb = len(st.flat_bi)
                no = 2 * offs_w + 1
                cand2 = st.flat_cand.reshape(nb, no)
                clr2 = np.asarray(clr2)[: nb * no].reshape(nb, no)
                la2 = np.asarray(la2)[: nb * no].reshape(nb, no)
                j2 = np.argmax(clr2, axis=1)
                rows = np.arange(nb)
                better = clr2[rows, j2] > st.bclr[st.flat_bi, st.flat_bj]
                st.bpos[st.flat_bi, st.flat_bj] = np.where(
                    better, cand2[rows, j2], st.bpos[st.flat_bi, st.flat_bj]
                )
                st.bla[st.flat_bi, st.flat_bj] = np.where(
                    better, la2[rows, j2], st.bla[st.flat_bi, st.flat_bj]
                )
                st.bclr[st.flat_bi, st.flat_bj] = np.maximum(
                    st.bclr[st.flat_bi, st.flat_bj], clr2[rows, j2]
                )
                if final_round:
                    # every probe of the final (bp_resl) round feeds the
                    # tie collection for the exact re-eval
                    st.probe_owner = np.repeat(st.flat_bi, no)
                    st.probe_pos = cand2.reshape(-1)
                    st.probe_clr = clr2.reshape(-1)

        for st in states:
            bb = np.argmax(
                np.where(st.bkeep, st.bclr, -np.inf), axis=1
            )
            st.best_pos = st.bpos[st.r, bb]
            st.best_clr = st.bclr[st.r, bb]
            st.best_la = st.bla[st.r, bb]

    logmsg(MSG_DEBUG1, "scan refine stage: %.2fs", _time.monotonic() - _t0)
    _t0 = _time.monotonic()

    if hist_ht is not None:
        # tie pool: every probed position within hist_tie_margin of the
        # selection winner (dense cells, SNP probes, refine probes)
        for st in states:
            st.cand_x, st.owner_x = _tie_candidates(st, cfg)
            st.seed_la = None

        # tie RESOLUTION on the (nearly) undecimated lattice: run-mean
        # error only (~8x smaller cells than the selection stages), so
        # the re-ranked pool collapses to ~1 exact candidate per interval
        # and supplies a per-candidate alpha seed for the exact kernel
        ht1 = (
            make_scan_hist_tables(
                data, tables, cfg.hist_alphas, decimate=cfg.tie_decimate
            )
            if cfg.tie_decimate < cfg.hist_decimate else None
        )
        if ht1 is not None and ht1 is not hist_ht:
            pend1 = []
            for st in states:
                c1 = _HistScanContext(ht1, data, st.cl, cfg, mesh=mesh)
                pend1.append(c1.eval_max_device(st.cand_x))
            for st, (c1, l1) in zip(states, _drain(pend1)):
                P = len(st.cand_x)
                c1 = np.asarray(c1)[:P]
                l1 = np.asarray(l1)[:P]
                keep = _exact_select(
                    st.owner_x, c1, cfg.exact_margin, cfg.exact_cap
                )
                st.cand_x = st.cand_x[keep]
                st.owner_x = st.owner_x[keep]
                st.seed_la = l1[keep]
            logmsg(
                MSG_DEBUG1, "scan tie-resolution stage: %.2fs",
                _time.monotonic() - _t0,
            )
            _t0 = _time.monotonic()

        # exact stage: report exact CLR/alpha from the per-site lattice
        # kernel at the surviving candidates (alpha search seeded from
        # the tie-resolution argmax where available — the coarse stage is
        # redundant within the fine bracket of the seed)
        pend, sync = [], {}
        for st in states:
            dev = st.blk.eval_candidates_device(
                st.cand_x, cfg, seed_la=st.seed_la
            )
            if dev is None:  # exceeds the dispatch cap; host-split path
                sync[st.c] = st.blk.eval_candidates(
                    st.cand_x, cfg, G, seed_la=st.seed_la
                )[:2]
                pend.append(jnp.zeros((2, 0), jnp.float32))
            else:
                pend.append(dev)
        for st, (ex_clr, ex_la) in zip(states, _drain(pend)):
            if st.c in sync:
                ex_clr, ex_la = sync[st.c]
            P = len(st.cand_x)
            ex_clr, ex_la = ex_clr[:P], ex_la[:P]
            st.best_clr = np.full(st.n_int, -np.inf)
            st.best_la = np.zeros(st.n_int)
            st.best_pos = np.zeros(st.n_int, dtype=st.cand_x.dtype)
            for k in np.argsort(ex_clr):  # last write wins = max
                st.best_clr[st.owner_x[k]] = ex_clr[k]
                st.best_la[st.owner_x[k]] = ex_la[k]
                st.best_pos[st.owner_x[k]] = st.cand_x[k]

        logmsg(
            MSG_DEBUG1, "scan exact stage: %.2fs (%d candidates)",
            _time.monotonic() - _t0,
            sum(len(st.cand_x) for st in states),
        )

    for st in states:
        ns, lo, hi = candidate_windows(
            st.blk.pos_np, st.best_pos, cfg.eval_range
        )
        cl = st.cl
        out["chr_id"].append(np.full(st.n_int, st.c, dtype=np.int32))
        out["sweep_pos"].append(st.best_pos)
        out["clr"].append(st.best_clr)
        out["lalpha"].append(st.best_la)
        out["nearest"].append(ns + cl.start_index)
        out["window_start"].append(lo + cl.start_index)
        out["window_end"].append(hi + cl.start_index)
        out["interval_start"].append(st.istart)
        out["interval_end"].append(st.iend)

    cat = {k: np.concatenate(v) for k, v in out.items()}
    K = len(cat["sweep_pos"])
    return ScanResult(
        chr_id=cat["chr_id"],
        sweep_pos=cat["sweep_pos"],
        clr=cat["clr"].astype(np.float64),
        lalpha=cat["lalpha"].astype(np.float64),
        nearest=cat["nearest"],
        window_start=cat["window_start"],
        window_end=cat["window_end"],
        interval_start=cat["interval_start"],
        interval_end=cat["interval_end"],
        permute_n=np.zeros(K, dtype=np.int64),
        permute_p=np.zeros(K, dtype=np.int64),
        permute_finished=np.zeros(K, dtype=bool),
        null_clr=[None] * K,
        stat_threshold=np.full(K, np.nan),
    )

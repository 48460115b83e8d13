"""Genome-wide block permutation of SNP attributes, on device.

Reference: snp_block_permute (/root/reference/scan-chromosome.c:336-389).
The C builds each null replicate by repeatedly swapping a destination run of
SNPs with a random source run whose length is a geometric draw (mean
1/permute_nbp ~ 10 SNPs) *extended until the run spans at least
scan_width_mb megabases* (so blocks are at least sweep-sized and local LD
structure is preserved); attribute fields move, positions stay fixed.

TPU-native redesign: a clean block permutation with the same statistical
intent and an exact bijection guarantee:
  * sites are binned into contiguous blocks of >= scan_width bp by a uniform
    random phase:  block(w) = floor((gpos_w + phase) / width),
  * the block order is shuffled with jax.random.permutation,
  * the site-level gather sigma is a *stable* argsort of the per-site shuffled
    block rank (stability preserves within-block order).
Each replicate uses an independent threefry key — reproducible, parallel, no
shared-state rand() races (the reference calls non-reentrant rand() from
multiple threads, scan-chromosome.c:350-351).  The geometric ~10-SNP length
jitter on top of the >=width extension is dropped: it is dominated by the
width rule and changes only block boundaries by O(10) sites.

Deviation from the C worth knowing: the C's random source runs mean a block
can land anywhere (including overlapping its origin); ours is a uniform
shuffle of disjoint blocks.  Both are measure-preserving block permutations
of attributes against fixed positions; p-values agree statistically (the C's
RNG stream is irreproducible across thread schedules anyway).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


PERM_GROUP = int(os.environ.get("FSCL_PERM_GROUP", "32"))
# sites per permutation group: block boundaries quantize to multiples of
# this, so sigma is GROUP-level — the permuted one-hot gather fetches
# PERM_GROUP-site-wide rows (PERM_GROUP x fewer rows at the same bytes;
# row gathers run at a fixed rows/s nearly independent of width up to
# several KB), and sigma arrays shrink the same factor.  Blocks span >=
# the scan width (~10^3 sites at genome densities), so shifting their
# boundaries by < PERM_GROUP sites is statistically immaterial (PARITY.md
# deviations; the C's own boundaries carry ~10-site geometric jitter,
# scan-chromosome.c:344-358).  Round 5 raised 8 -> 32 after the tail
# profile showed the permuted one-hot row gather as the dominant
# per-replicate cost (bench/profile_tail.py); the env override exists for
# A/B and for row widths that would exceed the full-rate gather band
# (PERM_GROUP * n_rows * 4B for compressed tables).  Fixed per process —
# never change it mid-run (sigma streams and compiled shapes depend on it).


def _one_replicate_runs(k, g0, n_blocks, width):
    """The run decomposition of one replicate's block shuffle.

    Returns (src_starts [n_blocks], dst_starts [n_blocks], sizes
    [n_blocks]) in GROUP units: output groups [dst_starts[j],
    dst_starts[j] + sizes[j]) take source groups [src_starts[j], ...).
    Shared by the sigma materializer and the run-decomposed prefix path
    (engine/permute.py RDP) so both see the IDENTICAL permutation stream.
    """
    k_phase, k_perm = jax.random.split(k)
    phase = jax.random.uniform(k_phase, (), minval=0.0, maxval=width)
    block = ((g0.astype(jnp.float32) + phase) / width).astype(jnp.int32)
    block = jnp.clip(block, 0, n_blocks - 2)  # [W], monotone
    block = block.at[-1].set(n_blocks - 1)  # pinned tail block
    # identity rejection: redraw until the shuffle moves something.
    # The reference's sequential swap runs never produce the identity
    # (scan-chromosome.c:336-389 always relocates the destination
    # run), and for short genomes with only 2-3 shuffleable blocks
    # the identity draw had probability 1/2-1/6, inflating every
    # p-value by that amount.  Excluding it biases the test by at
    # most 1/(B-1)! toward anti-conservatism — standard permutation
    # practice.  With a single shuffleable block no redraw can help;
    # the loop exits (degenerate span < one block width).
    B = n_blocks - 1
    ident = jnp.arange(B, dtype=jnp.int32)

    def draw(kp):
        return jax.random.permutation(kp, B).astype(jnp.int32)

    def cond(c):
        kp, o = c
        return jnp.all(o == ident) & (B > 1)

    def body(c):
        kp, _ = c
        kp2 = jax.random.fold_in(kp, 1)
        return kp2, draw(kp2)

    _, head = jax.lax.while_loop(cond, body, (k_perm, draw(k_perm)))
    order = jnp.concatenate(
        [head, jnp.full((1,), n_blocks - 1, jnp.int32)]
    )
    b_idx = jnp.arange(n_blocks, dtype=jnp.int32)
    starts = jnp.searchsorted(block, b_idx, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(block, b_idx, side="right").astype(jnp.int32)
    sz_shuf = (ends - starts)[order]
    dst_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sz_shuf)[:-1]]
    )  # exclusive prefix into the shuffled output layout
    return starts[order], dst_off, sz_shuf


def _replicate_keys(key, start, n_replicates):
    # replicate i's key depends only on its ABSOLUTE index start+i, never on
    # how the driver chunks replicates: checkpoint resume, adaptive chunk
    # boosting, and device sharding all replay the identical stream.
    idx = start + jnp.arange(n_replicates, dtype=jnp.uint32)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_replicates", "width")
)
def _replicates(key, start, g0, *, n_blocks, n_replicates, width):
    # g0 holds each GROUP's first-site genome position; the final entry may
    # be a partial tail group — it gets the dedicated pinned block id
    # n_blocks (appended, never shuffled), so group expansion stays within
    # the real site range.
    keys = _replicate_keys(key, start, n_replicates)
    W = g0.shape[0]
    w_idx = jnp.arange(W, dtype=jnp.int32)

    def one(k):
        src, dst_off, _ = _one_replicate_runs(k, g0, n_blocks, width)
        # direct construction (no O(W log W) argsort): output slot s holds
        # the (s - dst_off[j])-th site of block order[j], where j is s's
        # position in the shuffled block layout.  Identical to the stable
        # argsort of shuffled block ranks (blocks in `order`, within-block
        # site order preserved) at ~10x less work for the pruning-tail
        # chunks that generate hundreds of replicates per round.
        # val[j] := src[j] - dst_off[j] is a per-block step function of s,
        # so sigma = s + cumsum(scatter of val-deltas at the block
        # offsets) — O(W) elementwise with one B-sized scatter, no
        # per-site searchsorted and no O(W log W) argsort.  Duplicate
        # offsets (empty blocks) telescope to the last block's val,
        # exactly matching searchsorted-right semantics.
        val = src - dst_off  # [B] i32
        dval = jnp.diff(val, prepend=jnp.zeros(1, val.dtype))
        base = jnp.zeros(W, jnp.int32).at[dst_off].add(dval, mode="drop")
        return jnp.cumsum(base) + w_idx

    return jax.vmap(one)(keys)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_replicates", "width")
)
def _replicates_runs(key, start, g0, *, n_blocks, n_replicates, width):
    keys = _replicate_keys(key, start, n_replicates)
    return jax.vmap(
        lambda k: _one_replicate_runs(k, g0, n_blocks, width)
    )(keys)


def block_permutation_runs(key, gpos, width_bp, n_replicates, start=0):
    """Run decomposition (src_starts, dst_starts, sizes) [R, n_blocks] of
    the SAME permutation stream block_permutation_groups materializes.

    Group units; row r is a pure function of (key, start + r), identical
    to sigma8 row r: sigma8[r, dst_starts[j] + t] == src_starts[j] + t
    for t < sizes[j] (tested in tests/test_ops.py).  The run-decomposed
    prefix path consumes this instead of sigma when the active bound set
    is far smaller than the genome (engine/permute.py RDP).
    """
    g0, span = _group_first_positions(gpos)
    return _replicates_runs(
        key, jnp.uint32(start), g0,
        n_blocks=n_blocks_for(span, width_bp),
        n_replicates=int(n_replicates),
        width=effective_block_width(span, width_bp),
    )


# device copies of the caller's host gpos arrays (group first-site
# positions): the permutation drivers pass the same genome_pos() array every
# chunk, and the host link is slow (~1.5 MB/s) — re-uploading coordinates
# each chunk would dominate sigma generation.  Entries pair the device array
# with a WEAKREF to the host array: a hit requires the live referent to BE
# the key object, so a recycled id() (old array GC'd, new one at the same
# address) can never serve a stale device copy.
_gpos_cache: dict = {}


def _group_first_positions(gpos):
    """[G] first-site genome position of each PERM_GROUP-site group."""
    if isinstance(gpos, jax.Array):
        g0 = (gpos - gpos[0])[::PERM_GROUP]
        span = int(gpos[-1]) - int(gpos[0]) if gpos.shape[0] else 0
        return g0, span
    import weakref

    gpos = np.asarray(gpos)
    span = int(gpos[-1]) - int(gpos[0]) if gpos.shape[0] else 0
    ck = id(gpos)
    hit = _gpos_cache.get(ck)
    if hit is not None:
        ref, dev = hit
        if ref() is gpos:
            return dev, span
    if len(_gpos_cache) > 64:
        _gpos_cache.clear()
    dev = jnp.asarray(
        (gpos[::PERM_GROUP] - (gpos[0] if len(gpos) else 0)).astype(np.int32)
    )
    try:
        _gpos_cache[ck] = (weakref.ref(gpos), dev)
    except TypeError:  # non-weakrefable input (e.g. a list): skip caching
        pass
    return dev, span


def effective_block_width(span, width_bp):
    """Block span actually used by the sigma program.

    Round 3 history: a span/6 cap briefly shrank blocks on short genomes
    to avoid the 2-block identity draw, but sub-width blocks over-mix
    sweep-scale LD (measured anti-conservative p on the 5 Mb ms_sweep
    segments vs the reference).  The identity draw is now excluded by
    rejection inside _replicates instead, so blocks keep the full
    scan-width span the statistic intends (scan-chromosome.c:355-361).
    """
    del span
    return max(float(width_bp), 1.0)


def n_blocks_for(span, width_bp):
    """Shuffled-block count (+ pinned tail) the sigma program compiles for.

    Shared by block_permutation_groups and the shape-warming predictor
    (engine/permute.py _warm_sigma) so warmed programs match dispatches.
    """
    w = effective_block_width(span, width_bp)
    return max(int(span // w) + 2, 1) + 1


def block_permutation_groups(key, gpos, width_bp, n_replicates, start=0):
    """GROUP-level gather indices sigma8 [R, G], G = ceil(W / PERM_GROUP).

    Site-level semantics: sigma[w] = PERM_GROUP * sigma8[w // PERM_GROUP]
    + (w % PERM_GROUP) — every aligned PERM_GROUP-site run of outputs takes
    a consecutive run of inputs, because block boundaries are quantized to
    group multiples.  The final (possibly partial) group is pinned in
    place, so the expansion never exceeds the real site count.

    gpos: [W] genome-wide monotone bp coordinates (chromosome offsets
    added).  width_bp: minimum block span (scan_width_mb * 1e6).  start:
    absolute index of the first replicate; row r is a pure function of
    (key, start + r), so any chunking of the replicate stream reproduces
    it.
    """
    g0, span = _group_first_positions(gpos)
    return _replicates(
        key, jnp.uint32(start), g0,
        n_blocks=n_blocks_for(span, width_bp),
        n_replicates=int(n_replicates),
        width=effective_block_width(span, width_bp),
    )


def expand_group_sigma(sigma8, n_sites):
    """Site-level sigma [R, n_sites] from group-level sigma8 [R, G]."""
    R, G = sigma8.shape
    k = jnp.arange(PERM_GROUP, dtype=sigma8.dtype)
    full = (
        sigma8[:, :, None] * PERM_GROUP + k[None, None, :]
    ).reshape(R, G * PERM_GROUP)
    return full[:, :n_sites]


def block_permutation_indices(key, gpos, width_bp, n_replicates, start=0):
    """Site-level gather indices sigma [R, W]: permuted = attr[sigma[r]].

    Thin expansion of block_permutation_groups for consumers that gather
    per site (the lattice fallback path, tests); the histogram fast path
    consumes the group form directly.
    """
    n = gpos.shape[0] if hasattr(gpos, "shape") else len(gpos)
    return expand_group_sigma(
        block_permutation_groups(key, gpos, width_bp, n_replicates, start),
        int(n),
    )

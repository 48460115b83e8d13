"""Tests for the hot ops: window geometry, CLR kernel, block permutation."""

import numpy as np
import jax
import jax.numpy as jnp
from fscl_tpu import LOG_AD_MAX, LOG_AD_MIN
from fscl_tpu.models import build_tables
from fscl_tpu.ops import (
    block_permutation_indices,
    candidate_windows,
    clr_grid,
    coarse_alpha_grid,
    two_stage_alpha_max,
)
from fscl_tpu.ops.windows import nearest_snp_index


def _mk_data(seed=0, n_sites=400, n=12, span=2_000_000):
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.choice(span, size=n_sites, replace=False)).astype(np.int64)
    w = 1 / np.arange(1, n)
    w /= w.sum()
    freqs = rng.choice(np.arange(1, n), p=w, size=n_sites)
    folded = rng.random(n_sites) < 0.4
    freqs = np.where(folded, np.minimum(freqs, n - freqs), freqs)
    depth_p = np.zeros(n_sites, int)
    fsp = np.zeros(n + 1)
    hist = np.bincount(np.where(folded, freqs, freqs), minlength=n + 1).astype(float)
    fsp[1:n] = hist[1:n] + 1.0
    fsp /= fsp.sum()
    tables = build_tables([fsp], [n], grid_points=256)
    row = tables.site_rows(depth_p, folded, freqs)
    null = tables.null_logl(depth_p, folded, freqs).astype(np.float32)
    return tables, pos, row, null


def _oracle_clr(tables, pos, row, null, cand, lo, hi, la_vals):
    """Independent numpy f64 implementation of the C walk semantics."""
    G = tables.grid_points
    grid = tables.log_ad
    tbl = tables.table.astype(np.float64)
    out = np.zeros((len(cand), len(la_vals)))
    for pi, cp in enumerate(cand):
        for ai, la in enumerate(la_vals):
            tot = 0.0
            for w in range(lo[pi], hi[pi] + 1):
                d = max(abs(int(pos[w]) - int(cp)), 1)
                x = np.log(d) + la
                if x > LOG_AD_MAX:
                    continue
                y = np.interp(np.clip(x, grid[0], grid[-1]), grid, tbl[row[w]])
                tot += y - float(null[w])
            out[pi, ai] = 2.0 * tot
    return out


class TestWindows:
    def test_nearest_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        pos = np.sort(rng.choice(100000, 50, replace=False))
        cand = rng.integers(-10, 100100, size=200)
        ns = nearest_snp_index(pos, cand)
        for c, n_i in zip(cand, ns):
            d = np.abs(pos - c)
            # ties pick the right neighbor (strict <, scan-chromosome.c:53)
            best = np.where(d == d.min())[0].max()
            assert d[n_i] == d[best]

    def test_window_clamping(self):
        pos = np.arange(0, 1000, 10)  # 100 snps
        er = 10
        ns, lo, hi = candidate_windows(pos, np.array([0, 500, 995]), er)
        assert (lo[0], hi[0]) == (0, 20)  # left clamp keeps 2*er width
        assert (lo[1], hi[1]) == (ns[1] - er, ns[1] + er)
        assert (lo[2], hi[2]) == (99 - 20, 99)  # right clamp

    def test_window_small_chromosome(self):
        pos = np.arange(0, 50, 10)  # 5 snps < 2*er
        ns, lo, hi = candidate_windows(pos, np.array([25]), 10)
        assert (lo[0], hi[0]) == (0, 4)


class TestCLRKernel:
    def test_matches_oracle(self):
        tables, pos, row, null = _mk_data()
        cand = np.array([50_000, 777_777, 1_500_000, int(pos[10])])
        ns, lo, hi = candidate_windows(pos, cand, eval_range=80)
        la = np.array([-12.0, -6.0, -2.0, 0.5], dtype=np.float32)
        got = np.asarray(
            clr_grid(
                jnp.asarray(tables.table.reshape(-1)),
                jnp.asarray(row),
                jnp.asarray(pos.astype(np.int32)),
                jnp.asarray(null),
                jnp.asarray(cand.astype(np.int32)),
                jnp.asarray(lo.astype(np.int32)),
                jnp.asarray(hi.astype(np.int32)),
                jnp.asarray(la),
                grid_points=tables.grid_points,
                chunk=3,  # force ragged padding path
            )
        )
        want = _oracle_clr(tables, pos, row, null, cand, lo, hi, la)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_mask_outside_window_and_range(self):
        # single site far outside any alpha reach -> CLR exactly 0
        tables, pos, row, null = _mk_data(n_sites=50)
        cand = np.array([int(pos[25])])
        lo = np.array([30])  # window excludes the candidate's nearest sites
        hi = np.array([32])
        la = np.array([3.9], dtype=np.float32)  # e^(4-3.9) ~ 1.1 bp reach
        got = np.asarray(
            clr_grid(
                jnp.asarray(tables.table.reshape(-1)),
                jnp.asarray(row),
                jnp.asarray(pos.astype(np.int32)),
                jnp.asarray(null),
                jnp.asarray(cand.astype(np.int32)),
                jnp.asarray(lo.astype(np.int32)),
                jnp.asarray(hi.astype(np.int32)),
                jnp.asarray(la),
                grid_points=tables.grid_points,
            )
        )
        assert got[0, 0] == 0.0

    def test_two_stage_dominates_coarse(self):
        tables, pos, row, null = _mk_data(seed=3)
        cand = np.arange(100_000, 1_900_000, 200_000)
        ns, lo, hi = candidate_windows(pos, cand, eval_range=80)
        args = (
            jnp.asarray(tables.table.reshape(-1)),
            jnp.asarray(row),
            jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(null),
            jnp.asarray(cand.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
        )
        clr, la = two_stage_alpha_max(*args, grid_points=tables.grid_points)
        clr_c = clr_grid(
            *args, jnp.asarray(coarse_alpha_grid()),
            grid_points=tables.grid_points,
        )
        assert np.all(np.asarray(clr) >= np.asarray(clr_c).max(axis=1) - 1e-5)
        assert np.all(np.asarray(la) >= LOG_AD_MIN)
        assert np.all(np.asarray(la) <= LOG_AD_MAX)


class TestPermute:
    def test_is_permutation_and_reproducible(self):
        rng = np.random.default_rng(5)
        gpos = np.sort(rng.choice(10_000_000, 5000, replace=False))
        key = jax.random.key(7)
        sig = np.asarray(block_permutation_indices(key, gpos, 1_000_000, 4))
        assert sig.shape == (4, 5000)
        for r in range(4):
            assert np.array_equal(np.sort(sig[r]), np.arange(5000))
        sig2 = np.asarray(block_permutation_indices(key, gpos, 1_000_000, 4))
        np.testing.assert_array_equal(sig, sig2)
        assert not np.array_equal(sig[0], sig[1])

    def test_stream_invariant_to_chunking(self):
        # replicate r is a pure function of (key, start+r): any chunking of
        # the stream (resume, adaptive boosting, sharding) replays it exactly
        rng = np.random.default_rng(11)
        gpos = np.sort(rng.choice(5_000_000, 2000, replace=False))
        key = jax.random.key(42)
        full = np.asarray(block_permutation_indices(key, gpos, 500_000, 12))
        a = np.asarray(block_permutation_indices(key, gpos, 500_000, 5))
        b = np.asarray(
            block_permutation_indices(key, gpos, 500_000, 7, start=5)
        )
        np.testing.assert_array_equal(full, np.concatenate([a, b], axis=0))

    def test_blocks_are_contiguous_runs(self):
        # consecutive source indices inside a block stay consecutive
        gpos = np.arange(0, 10_000_000, 2000)
        sig = np.asarray(
            block_permutation_indices(jax.random.key(0), gpos, 1_000_000, 1)
        )[0]
        jumps = np.sum(np.diff(sig) != 1)
        # at most one jump per block boundary
        n_blocks = 10_000_000 // 1_000_000 + 2
        assert jumps <= n_blocks

    def test_block_span_at_least_width(self):
        gpos = np.sort(
            np.random.default_rng(0).choice(50_000_000, 20000, replace=False)
        )
        width = 1_000_000
        sig = np.asarray(
            block_permutation_indices(jax.random.key(3), gpos, width, 1)
        )[0]
        # recover blocks as maximal consecutive runs of sigma
        starts = np.where(np.diff(sig) != 1)[0] + 1
        bounds = np.concatenate([[0], starts, [len(sig)]])
        spans = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            src = sig[a:b]
            spans.append(gpos[src[-1]] - gpos[src[0]])
        spans = np.array(spans)
        # interior blocks span < width only if they are phase-truncated ends;
        # the bulk must be >= ~width minus one inter-site gap
        assert np.median(spans) > 0.5 * width

    def test_short_genome_keeps_mixing(self):
        # a genome SHORTER than the block width must not degenerate to the
        # identity permutation (a 2-block shuffle drew it with probability
        # 1/2, inflating every p-value by ~0.5): the identity draw is
        # excluded by rejection, mirroring the reference's swap process
        # which always relocates a run (scan-chromosome.c:336-389)
        gpos = np.sort(
            np.random.default_rng(2).choice(1_000_000, 1000, replace=False)
        )
        sig = np.asarray(
            block_permutation_indices(jax.random.key(9), gpos, 1_000_000, 64)
        )
        id_rows = (sig == np.arange(1000)[None, :]).all(axis=1).sum()
        assert id_rows == 0
        for r in range(0, 64, 16):  # still bijective
            assert np.array_equal(np.sort(sig[r]), np.arange(1000))

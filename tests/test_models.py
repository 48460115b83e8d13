"""Unit tests for the probability-model layer (models/).

Strategy (SURVEY.md section 4): golden/property tests of each numerical stage
against independent formulations (scipy.stats) and hand-computable cases.
"""

import numpy as np
import pytest
from scipy import stats
from scipy.special import comb

from fscl_tpu.models import (
    ascbias_adjust_background,
    ascbias_adjust_expect,
    ascprob_subsample,
    background_fsp,
    build_tables,
    compute_pbk,
    compute_pjh,
    estimate_background_fsp,
    hypergeometric_downsample,
    lchoose,
    log_fact,
    neutral_spectra,
    p_kescape_grid,
    post_sweep_spectra,
)
from fscl_tpu.models.sweep import log_ad_grid


class TestSpecial:
    def test_log_fact(self):
        assert log_fact(0) == 0.0
        assert log_fact(1) == 0.0
        import math

        np.testing.assert_allclose(log_fact(10), math.log(math.factorial(10)), rtol=1e-12)
        assert log_fact(-3) == -np.inf

    def test_lchoose_matches_comb(self):
        for n in [1, 5, 17, 100]:
            k = np.arange(n + 1)
            np.testing.assert_allclose(
                np.exp(lchoose(n, k)), comb(n, k), rtol=1e-10
            )

    def test_lchoose_invalid(self):
        assert lchoose(3, 5) == -np.inf
        assert lchoose(3, -1) == -np.inf
        assert lchoose(0, 0) == 0.0


class TestBackground:
    def test_neutral_spectrum_shape(self):
        # 10 segregating sites at depth 8, no invariant/fixed
        obs = np.array([1, 2, 3, 4, 1, 2, 1, 1, 5, 6])
        fsp = neutral_spectra(obs, np.zeros(10, int), np.array([8]))[0]
        assert fsp.shape == (9,)
        np.testing.assert_allclose(fsp.sum(), 1.0, rtol=1e-12)
        # 1/i shape in interior
        ratio = fsp[1] / fsp[2]
        np.testing.assert_allclose(ratio, 2.0, rtol=1e-12)
        assert fsp[0] == 0.0 and fsp[8] == 0.0

    def test_hypergeometric_downsample_matches_scipy(self):
        N, n = 12, 5
        rng = np.random.default_rng(0)
        fsp = rng.random(N + 1)
        fsp /= fsp.sum()
        ours = hypergeometric_downsample(fsp, n, N, include_invariant=True)
        # independent: d[k] = sum_m hypergeom(M=N, n=m, N=n).pmf(k) * fsp[m]
        ref = np.zeros(n + 1)
        for m in range(N + 1):
            ref += stats.hypergeom(N, m, n).pmf(np.arange(n + 1)) * fsp[m]
        ref /= ref.sum()
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_downsample_identity_at_same_depth(self):
        fsp = np.array([0.0, 0.5, 0.3, 0.2, 0.0])
        out = hypergeometric_downsample(fsp, 4, 4, include_invariant=False)
        np.testing.assert_allclose(out, fsp, atol=1e-12)

    def test_estimate_unfolded_matches_histogram(self):
        rng = np.random.default_rng(1)
        n = 20
        freqs = rng.integers(1, n, size=5000)
        fsp = estimate_background_fsp(
            freqs, np.zeros(5000, int), np.zeros(5000, bool), np.array([n])
        )[0]
        hist = np.bincount(freqs, minlength=n + 1).astype(float)
        hist[0] = hist[n] = 0
        hist /= hist.sum()
        np.testing.assert_allclose(fsp, hist, atol=1e-12)

    def test_estimate_folded_split_weights(self):
        # one folded site with minor count 2 of depth 10:
        # mass (10-2)/10 = 0.8 at bin 2 and 2/10 = 0.2 at bin 8
        fsp = estimate_background_fsp(
            np.array([2]), np.array([0]), np.array([True]), np.array([10])
        )[0]
        np.testing.assert_allclose(fsp[2], 0.8)
        np.testing.assert_allclose(fsp[8], 0.2)

    def test_multi_depth_downsampling(self):
        rng = np.random.default_rng(2)
        n_hi, n_lo = 30, 10
        freqs = rng.integers(1, n_hi, size=4000)
        depth_p = np.zeros(4000, int)
        fsps = estimate_background_fsp(
            freqs, depth_p, np.zeros(4000, bool), np.array([n_hi, n_lo])
        )
        assert fsps[0].shape == (n_hi + 1,)
        assert fsps[1].shape == (n_lo + 1,)
        np.testing.assert_allclose(fsps[1].sum(), 1.0, rtol=1e-12)
        assert fsps[1][0] == 0.0 and fsps[1][n_lo] == 0.0

    def test_background_fsp_loaded(self):
        spectra = {8: np.full(9, 1 / 9.0)}
        out = background_fsp(
            np.array([1]), np.array([0]), np.array([False]), np.array([8]),
            loaded_spectra=spectra,
        )
        np.testing.assert_allclose(out[0], 1 / 9.0)
        with pytest.raises(ValueError):
            background_fsp(
                np.array([1]), np.array([0]), np.array([False]), np.array([6]),
                loaded_spectra=spectra,
            )


class TestAscBias:
    def test_ascprob_bruteforce(self):
        # brute force: enumerate subsamples of size d from n with k derived;
        # ascertained iff both alleles appear >= min_obs times.
        n, d, min_obs = 10, 4, 1
        for k in range(n + 1):
            total = comb(n, d)
            good = 0.0
            for j in range(d + 1):  # j derived in the subsample
                if j >= min_obs and (d - j) >= min_obs:
                    good += comb(k, j) * comb(n - k, d - j)
            np.testing.assert_allclose(
                ascprob_subsample(k, d, min_obs, n), good / total, atol=1e-12
            )

    def test_ascprob_min_obs2(self):
        n, d, min_obs = 12, 5, 2
        for k in range(n + 1):
            total = comb(n, d)
            good = sum(
                comb(k, j) * comb(n - k, d - j)
                for j in range(d + 1)
                if j >= min_obs and (d - j) >= min_obs
            )
            np.testing.assert_allclose(
                ascprob_subsample(k, d, min_obs, n), good / total, atol=1e-12
            )

    def test_adjust_roundtrip(self):
        # observed = true * asc / Z  =>  adjust_background recovers true,
        # and adjust_expect maps true back to observed.
        n, d, min_obs = 14, 4, 1
        rng = np.random.default_rng(3)
        true = np.zeros(n + 1)
        true[1:n] = rng.random(n - 1)
        true /= true.sum()
        asc = ascprob_subsample(np.arange(n + 1), d, min_obs, n)
        observed = true * asc
        observed /= observed.sum()
        recovered = ascbias_adjust_background(observed, n, d, min_obs)
        np.testing.assert_allclose(recovered, true, rtol=1e-9)
        fwd = ascbias_adjust_expect(true, n, min_obs, d)
        np.testing.assert_allclose(fwd, observed, rtol=1e-9)


def _neutral_interior(n):
    fsp = np.zeros(n + 1)
    fsp[1:n] = 1.0 / np.arange(1, n)
    fsp /= fsp.sum()
    return fsp


class TestSweepModel:
    def test_pjh_is_distribution(self):
        n = 12
        fsp = _neutral_interior(n)
        pjh = compute_pjh(fsp, n)
        # each column h: distribution over j
        np.testing.assert_allclose(pjh.sum(axis=0), 1.0, rtol=1e-9)

    def test_pjh_matches_scipy(self):
        n = 9
        fsp = _neutral_interior(n)
        pjh = compute_pjh(fsp, n)
        for h in range(n + 1):
            ref = np.zeros(n + 1)
            for i in range(n + 1):
                ref += fsp[i] * stats.hypergeom(n, i, h).pmf(np.arange(n + 1))
            np.testing.assert_allclose(pjh[:, h], ref, atol=1e-12)

    def test_pbk_is_distribution(self):
        n = 12
        fsp = _neutral_interior(n)
        pbk = compute_pbk(compute_pjh(fsp, n), n)
        np.testing.assert_allclose(pbk[:, :n].sum(axis=0), 1.0, rtol=1e-9)

    def test_pescape_sums_to_one(self):
        n = 15
        la = log_ad_grid(64)
        pesc = p_kescape_grid(n, la)
        np.testing.assert_allclose(pesc.sum(axis=0), 1.0, rtol=1e-9)

    def test_large_ad_recovers_background(self):
        # ad -> infinity: everything escapes; spectrum -> background
        n = 10
        fsp = _neutral_interior(n)
        P, _ = post_sweep_spectra(fsp, n, np.array([LOG := 30.0]))
        expect = fsp.copy()
        expect[0] = expect[n] = 0
        expect /= expect.sum()
        np.testing.assert_allclose(P[:, 0], expect, atol=1e-8)

    def test_small_ad_sweeps_to_boundary(self):
        # ad -> 0: nothing escapes; with invariant bins kept, all mass at 0/n
        n = 10
        fsp = _neutral_interior(n)
        P, _ = post_sweep_spectra(fsp, n, np.array([-30.0]), include_invariant=True)
        np.testing.assert_allclose(P[0, 0] + P[n, 0], 1.0, atol=1e-6)

    def test_tables_pack_and_fold(self):
        n = 8
        fsp = _neutral_interior(n)
        t = build_tables([fsp], [n], grid_points=128)
        assert t.table.shape == (n + 1 + n // 2 + 1, 128)
        # folded row f = unfolded log(p[f] + p[n-f])
        y = t.table[: n + 1].astype(np.float64)
        fy = t.table[n + 1 :].astype(np.float64)
        for f in range(1, n // 2):  # interior bins (zero bins clamp to DBL_MIN)
            np.testing.assert_allclose(
                np.exp(fy[f]), np.exp(y[f]) + np.exp(y[n - f]), rtol=1e-5
            )
        np.testing.assert_allclose(fy[n // 2], y[n // 2], rtol=1e-6)

    def test_null_logl(self):
        n = 8
        fsp = _neutral_interior(n)
        t = build_tables([fsp], [n], grid_points=64)
        null = t.null_logl(
            np.array([0, 0, 0]),
            np.array([False, True, True]),
            np.array([2, 2, 4]),
        )
        np.testing.assert_allclose(null[0], np.log(fsp[2]))
        np.testing.assert_allclose(null[1], np.log(fsp[2] + fsp[6]))
        np.testing.assert_allclose(null[2], np.log(fsp[4]))

    def test_site_rows(self):
        n = 8
        fsp = _neutral_interior(n)
        t = build_tables([fsp, _neutral_interior(6)], [n, 6], grid_points=64)
        rows = t.site_rows(
            np.array([0, 0, 1]), np.array([False, True, False]), np.array([3, 2, 1])
        )
        assert rows[0] == 3
        assert rows[1] == (n + 1) + 2
        assert rows[2] == (n + 1) + (n // 2 + 1) + 1

"""p-value computation: empirical rule parity + chi-square tail projection.

The empirical rule mirrors scan_output (scan-chromosome.c:718-728); the
projection implements the README-promised (but unimplemented in C)
noncentral/scaled chi-square tail fit (README.md:9-13, SURVEY.md section 7).
"""

import numpy as np
import pytest

from fscl_tpu.engine.pvalues import (
    chi2_tail_projection,
    empirical_pvalues,
    fit_scaled_chi2,
)


def test_empirical_rule_matches_reference_formula():
    # scan-chromosome.c:724-728: p = (permute_p-1)/(permute_n-1), or
    # 1/permute_n when permute_p < 2
    p = empirical_pvalues([0, 1, 2, 20, 50], [100, 100, 100, 39, 50])
    assert p[0] == pytest.approx(1 / 100)
    assert p[1] == pytest.approx(1 / 100)
    assert p[2] == pytest.approx(1 / 99)
    assert p[3] == pytest.approx(19 / 38)
    assert p[4] == pytest.approx(1.0)


def test_fit_recovers_scaled_chi2_parameters():
    rng = np.random.default_rng(0)
    k_true, df_true = 1.7, 2.4
    x = k_true * rng.chisquare(df_true, size=20000)
    frac, k, df = fit_scaled_chi2(x)
    assert frac == pytest.approx(1.0, abs=1e-3)
    assert k == pytest.approx(k_true, rel=0.1)
    assert df == pytest.approx(df_true, rel=0.1)


def test_projection_calibrated_against_true_tail():
    # nulls drawn from a zero-inflated scaled chi-square; the projected
    # p-value at the empirical 99th percentile must be ~0.01
    rng = np.random.default_rng(1)
    mask = rng.random(50000) < 0.6
    x = np.where(mask, 2.0 * rng.chisquare(3.0, size=50000), 0.0)
    q99 = np.quantile(x, 0.99)
    p = chi2_tail_projection(q99, x)
    assert 0.003 < p < 0.03

    # far tail: projection extends beyond 1/n resolution and decreases
    p_far = chi2_tail_projection(4 * q99, x)
    assert 0 < p_far < 1e-5


def test_projection_degenerate_cases():
    # all-zero reservoir has no tail model: floored at 1/(n+1), never an
    # exact 0 (which would print as infinite significance)
    assert chi2_tail_projection(5.0, np.zeros(100)) == pytest.approx(1 / 101)
    assert chi2_tail_projection(0.0, np.zeros(100)) == 1.0
    assert chi2_tail_projection(1.0, []) == pytest.approx(1.0)
    # tiny positive sample falls back to k=df=1
    p = chi2_tail_projection(3.0, [0.5, 1.0, 0.2])
    assert 0.0 < p <= 1.0


def test_projection_calibrated_on_engine_nulldist():
    """Projected vs empirical p on a REAL permutation run's reservoirs.

    VERDICT r1 item 8: on points that reached the pruning threshold
    (permute_p >= 20, empirical p resolved), the chi-square tail
    projection must agree with the empirical p to within ~2x (median) —
    the practical bar for a moment fit on finite reservoirs.
    """
    import numpy as np

    from fscl_tpu.data import build_snp_data
    from fscl_tpu.engine import (
        PermuteConfig, ScanConfig, scan_genome, scan_permute,
    )
    from fscl_tpu.engine.pvalues import empirical_pvalues, projected_pvalues
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.sim import simulate_dataset

    sim = simulate_dataset(
        seed=61, sample_size=24, snp_density=1.0, mb_length=3.0,
        alpha=5e-5, n_sweeps=1,
    )
    n = len(sim["pos"])
    data = build_snp_data(
        np.full(n, "1"), sim["pos"], sim["freq"], np.full(n, sim["n"]),
        np.zeros(n, bool),
    )
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=512)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=10_000, large_grid_sp=300_000)
    result = scan_genome(data, tables, cfg)
    scan_permute(
        data, tables, result, cfg,
        PermuteConfig(n_permute=160, chunk_replicates=32, seed=3),
    )
    sel = result.permute_p >= 20
    assert sel.sum() >= 3  # neutral intervals hit the pruning threshold
    # the engine records the observed statistic thresholds so the tail
    # projection compares obs and nulls under the SAME functional
    assert np.isfinite(result.stat_threshold).all()
    emp = empirical_pvalues(result.permute_p, result.permute_n)[sel]
    proj = projected_pvalues(result)[sel]
    ok = np.isfinite(proj) & (proj > 0)
    assert ok.all()
    lr = np.abs(np.log10(proj / emp))
    assert np.median(lr) < 0.35, (proj, emp)
    assert lr.max() < 1.0, (proj, emp)


def test_anchored_projection_matches_empirical_when_resolved():
    """Where the reservoir resolves the p-value (>= anchor_rank nulls at or
    above obs), the projection IS the rank estimate — zero parametric
    error; beyond the anchor it decreases monotonically via the fitted
    tail ratio (round-3 anchored form)."""
    rng = np.random.default_rng(5)
    x = 1.5 * rng.chisquare(2.0, size=5000)
    obs = np.quantile(x, 0.99)  # ~50 nulls above: fully resolved
    r = int(np.sum(x >= obs))
    p = chi2_tail_projection(obs, x)
    assert p == pytest.approx((r + 1) / (len(x) + 1), rel=1e-9)

    # beyond resolution: anchored ratio, strictly decreasing, below anchor p
    obs_hi = np.sort(x)[-3] + 1.0
    p_hi = chi2_tail_projection(obs_hi, x)
    assert p_hi < 11 / (len(x) + 1)
    assert chi2_tail_projection(obs_hi + 5, x) < p_hi

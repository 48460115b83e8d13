"""p-value computation: empirical ratios + chi-square tail projection.

Empirical rule mirrors scan_output (/root/reference/scan-chromosome.c:718-728):
p = (permute_p - 1) / (permute_n - 1), or 1 / permute_n when permute_p < 2.

The reference README (README.md:9-13) additionally describes projecting the
tail by estimating the noncentrality of the chi-square distribution of the
CLR — described but NOT implemented in the C code (SURVEY.md section 7).  We
implement it: the saved null max-CLRs per scan point are a mixture of a point
mass near zero (no sweep-like fluctuation anywhere in the interval) and a
positive bulk; we fit a scaled chi-square k * chi2_df to the positive part by
moment matching and project p = P(positive) * P(k chi2_df >= obs).  This
gives usable p-values far beyond 1/n_permute resolution.
"""

from __future__ import annotations

import numpy as np
from scipy import stats


def empirical_pvalues(permute_p, permute_n):
    permute_p = np.asarray(permute_p, dtype=np.float64)
    permute_n = np.asarray(permute_n, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(
            permute_p < 2,
            1.0 / np.maximum(permute_n, 1.0),
            (permute_p - 1.0) / np.maximum(permute_n - 1.0, 1.0),
        )
    return p


def fit_scaled_chi2(null_clr, eps=1e-6):
    """Fit (frac_pos, scale k, df) of a scaled chi-square to null CLRs.

    Upper-quantile matched: k and df solve q75 and q95 of the positive
    part exactly, so the fitted curve is anchored in the region the tail
    projection extrapolates from (a plain moment fit is dominated by the
    bulk and was ~2x off in log10(p) at genome scale — round-2
    calibration measurement, BASELINE.md).  Falls back to the moment fit
    when the reservoir is too small or degenerate for quantiles.
    """
    x = np.asarray(null_clr, dtype=np.float64)
    x = x[np.isfinite(x)]
    if len(x) == 0:
        return 0.0, 1.0, 1.0
    pos = x[x > eps]
    frac = len(pos) / len(x)
    if len(pos) < 10:
        return frac, 1.0, 1.0
    m, v = pos.mean(), pos.var()
    if m <= 0 or v <= 0:
        return frac, 1.0, 1.0
    k = v / (2.0 * m)  # mean = k df, var = 2 k^2 df
    df = m / k
    q1, q2 = np.quantile(pos, [0.75, 0.95])
    if len(pos) >= 40 and q1 > eps and q2 > q1 * (1 + 1e-9):
        # ratio chi2.ppf(.95,df)/chi2.ppf(.75,df) decreases monotonically
        # in df; bisect df to match, then k sets the scale
        target = q2 / q1
        lo_df, hi_df = 1e-2, 1e3
        ratio = lambda d: stats.chi2.ppf(0.95, d) / stats.chi2.ppf(0.75, d)
        if ratio(hi_df) <= target <= ratio(lo_df):
            for _ in range(60):
                mid = np.sqrt(lo_df * hi_df)
                if ratio(mid) > target:
                    lo_df = mid
                else:
                    hi_df = mid
            df = np.sqrt(lo_df * hi_df)
            k = q1 / stats.chi2.ppf(0.75, df)
    return frac, k, max(df, 1e-3)


def chi2_tail_projection(obs_clr, null_clr, eps=1e-6):
    """Projected tail p-value for one scan point from its null reservoir.

    A fitted positive tail extrapolates below 1/n resolution (the point of
    the projection), but a reservoir with NO positive values carries no
    tail model at all — there the result is floored at 1/(n_null+1)
    instead of reporting an exact 0 (infinite significance) from a few
    uninformative permutations."""
    x = np.asarray(null_clr, dtype=np.float64)
    frac, k, df = fit_scaled_chi2(x, eps)
    if frac == 0.0:
        return 1.0 / (x.size + 1.0) if obs_clr > eps else 1.0
    tail = stats.chi2.sf(max(obs_clr, 0.0) / k, df)
    return float(frac * tail + (1.0 - frac) * (obs_clr <= eps))


def projected_pvalues(result):
    """Vector of projected p-values (NaN where no null reservoir exists)."""
    out = np.full(result.n_points, np.nan)
    for i in range(result.n_points):
        res = result.null_clr[i]
        if res:
            out[i] = chi2_tail_projection(result.clr[i], res)
    return out

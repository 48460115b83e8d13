"""End-to-end tests: simulate -> CLI scan -> outputs, including permutations."""

import numpy as np
import pytest

from fscl_tpu.cli import main
from fscl_tpu.sim import simulate_dataset, write_snp_file


@pytest.fixture(scope="module")
def sim_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    sim = simulate_dataset(
        seed=7, sample_size=40, snp_density=1.0, mb_length=4.0,
        alpha=3e-5, n_sweeps=1,
    )
    path = d / "sweep.sf"
    write_snp_file(path, sim["pos"], sim["freq"], sim["n"])
    return path, sim


def _read_tsv(path):
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(line.rstrip("\n").split("\t"))
    return rows


def test_scan_recovers_sweep(sim_file, tmp_path):
    path, sim = sim_file
    out = tmp_path / "scan.tsv"
    rc = main([
        "-f", str(path), "-o", str(out),
        "-g", "5000", "-G", "100000", "--eval-range", "2500",
        "--grid-points", "512", "-v", "1",
    ])
    assert rc == 0
    rows = _read_tsv(out)
    # schema: chr pos CLR alpha n_snps win_start win_end
    assert len(rows) == 40  # 4 Mb / 100 kb intervals
    assert all(len(r) == 7 for r in rows)
    clr = np.array([float(r[2]) for r in rows])
    pos = np.array([int(r[1]) for r in rows])
    best = np.argmax(clr)
    true_pos = sim["sweep_pos"][0]
    assert abs(pos[best] - true_pos) < 60_000
    # refined position lands on the bp_resl lattice of the fine grid
    assert clr[best] > 2 * np.median(clr) + 5


def test_scan_with_permutations(sim_file, tmp_path):
    path, sim = sim_file
    out = tmp_path / "perm.tsv"
    rc = main([
        "-f", str(path), "-o", str(out),
        "-g", "20000", "-G", "400000", "--eval-range", "1200",
        "--grid-points", "256", "-p", "40", "--chunk-replicates", "10",
        "-v", "1", "--seed", "123",
    ])
    assert rc == 0
    rows = _read_tsv(out)
    # schema: chr pos CLR alpha permute_p permute_n -log10(p) -log10(p_proj)
    assert all(len(r) == 8 for r in rows)
    clr = np.array([float(r[2]) for r in rows])
    pp = np.array([int(r[4]) for r in rows])
    pn = np.array([int(r[5]) for r in rows])
    mlogp = np.array([float(r[6]) for r in rows])
    assert (pn >= 1).all() and (pn <= 40).all()
    assert (pp <= pn).all()
    # the sweep point should be among the most significant; at 40
    # permutations the empirical -log10(p) granularity is coarse, so allow
    # a near-tie with a neighbor (the sweep elevates adjacent intervals too)
    best = np.argmax(clr)
    assert mlogp[best] >= np.sort(mlogp)[-2]
    # on a 4 Mb genome with 1 Mb blocks the sweep's own block occasionally
    # lands back on its interval, so a few exceedances are expected
    assert pp[best] <= 5
    # low-CLR points should record exceedances; >=20-exceedance pruning
    # engaged for at least one of them
    low = clr <= np.median(clr)
    assert (pp[low] > 0).mean() > 0.6
    assert ((pn < 40) & (pp >= 20)).any()
    # nulldist companion exists with one row per scan point
    nd = _read_tsv(str(out) + "-nulldist")
    assert len(nd) == len(rows) + 1  # header

def test_output_bs_roundtrip(sim_file, tmp_path):
    path, _ = sim_file
    bs = tmp_path / "bg.bs"
    out = tmp_path / "o.tsv"
    rc = main(["-f", str(path), "-o", str(out), "--output-bs", str(bs), "--no-scan"])
    assert rc == 0
    from fscl_tpu.io import load_spectra

    spectra = load_spectra(bs)
    assert 40 in spectra
    np.testing.assert_allclose(spectra[40].sum(), 1.0, atol=2e-5)
    # rerun the scan loading the spectrum back
    out2 = tmp_path / "o2.tsv"
    rc = main([
        "-f", str(path), "-o", str(out2), "-b", str(bs),
        "-g", "50000", "-G", "400000", "--eval-range", "1000",
        "--grid-points", "256", "-v", "1",
    ])
    assert rc == 0
    assert len(_read_tsv(out2)) == 10


def test_cli_validation_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["-o", "x"])  # no input
    with pytest.raises(SystemExit):
        main(["-f", "a", "-m", "b", "-o", "x"])  # both inputs
    with pytest.raises(SystemExit):
        main(["-f", "a"])  # no output
    with pytest.raises(SystemExit):
        main(["-f", "a", "-o", "x", "-d", "1"])  # bad asc depth
    with pytest.raises(SystemExit):
        main(["-f", "a", "-o", "x", "-g", "3000", "-G", "100000"])  # not divisible


def test_max_only(sim_file, tmp_path):
    path, sim = sim_file
    out = tmp_path / "max.tsv"
    rc = main([
        "-f", str(path), "-o", str(out), "--max-only",
        "-g", "20000", "-G", "400000", "--eval-range", "1000",
        "--grid-points", "256", "-v", "1", "--prepend-label", "rep0",
    ])
    assert rc == 0
    rows = _read_tsv(out)
    assert len(rows) == 1
    assert rows[0][0] == "rep0"
    assert len(rows[0]) == 8

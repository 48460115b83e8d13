"""CLI flag variants: --force-neutral-spectrum, --include-invariant,
--prepend-label, --no-refine, --checkpoint."""

import numpy as np
import pytest

from fscl_tpu.cli import main
from fscl_tpu.sim import simulate_dataset, write_snp_file


@pytest.fixture(scope="module")
def small_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliv")
    sim = simulate_dataset(
        seed=12, sample_size=16, snp_density=0.8, mb_length=2.0,
        alpha=3e-5, n_sweeps=1,
    )
    path = d / "s.sf"
    write_snp_file(path, sim["pos"], sim["freq"], sim["n"])
    return path


BASE = ["-g", "50000", "-G", "500000", "--eval-range", "500",
        "--grid-points", "256", "-v", "1"]


def _rows(path):
    return [l.rstrip("\n").split("\t") for l in open(path)]


def test_force_neutral_spectrum(small_file, tmp_path):
    out = tmp_path / "o.tsv"
    rc = main(["-f", str(small_file), "-o", str(out),
               "--force-neutral-spectrum", *BASE])
    assert rc == 0
    clr = np.array([float(r[2]) for r in _rows(out)])
    assert np.isfinite(clr).all()


def test_include_invariant(small_file, tmp_path):
    # add invariant and fixed rows; they are kept only with the flag
    inv = tmp_path / "inv.sf"
    with open(small_file) as f:
        content = f.read()
    content += "1\t500000\t0\t16\t0\n1\t600000\t16\t16\t0\n"
    inv.write_text(content)
    out = tmp_path / "o2.tsv"
    rc = main(["-f", str(inv), "-o", str(out), "--include-invariant", *BASE])
    assert rc == 0
    assert np.isfinite([float(r[2]) for r in _rows(out)]).all()


def test_prepend_label_and_no_refine(small_file, tmp_path):
    out = tmp_path / "o3.tsv"
    rc = main(["-f", str(small_file), "-o", str(out),
               "--prepend-label", "runX", "--no-refine", *BASE])
    assert rc == 0
    rows = _rows(out)
    assert all(r[0] == "runX" for r in rows)
    assert all(len(r) == 8 for r in rows)  # label + 7 standard columns


def test_checkpoint_flag(small_file, tmp_path):
    out = tmp_path / "o4.tsv"
    ck = tmp_path / "c.npz"
    rc = main(["-f", str(small_file), "-o", str(out),
               "-p", "8", "--chunk-replicates", "4",
               "--checkpoint", str(ck), *BASE])
    assert rc == 0
    assert ck.exists()
    # resume to more rounds: should load and continue without error
    rc = main(["-f", str(small_file), "-o", str(out),
               "-p", "16", "--chunk-replicates", "4",
               "--checkpoint", str(ck), *BASE])
    assert rc == 0
    pn = np.array([int(r[5]) for r in _rows(out)])
    assert pn.max() == 16

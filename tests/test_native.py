"""Tests for the optional C fast-path extension (skipped when not built)."""

import numpy as np
import pytest

fastio = pytest.importorskip("fscl_tpu.native.fastio")


def test_parse_snp_file_matches_python(tmp_path):
    from fscl_tpu.io.snp_reader import _parse_python

    f = tmp_path / "x.sf"
    f.write_text(
        "# comment line\n"
        "chr1\t100\t3\t20\t0\n"
        "chr1 250 5 20 1\n"
        "\n"
        "chromosome\n"
        "chr2\t17\t2\t18\t0\n"
        "bad line\n"
        "chr2\t99\t1\t18\t1\n"
    )
    c1, p1, q1, s1, f1 = fastio.parse_snp_file(f)
    c2, p2, q2, s2, f2 = _parse_python(f)
    assert list(c1) == list(c2) == ["chr1", "chr1", "chr2", "chr2"]
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(f1, f2)


def test_parse_snp_file_large_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 50000
    pos = np.sort(rng.choice(10**8, n, replace=False))
    freq = rng.integers(1, 30, n)
    f = tmp_path / "big.sf"
    with open(f, "w") as fh:
        for p, q in zip(pos, freq):
            fh.write(f"1\t{p}\t{q}\t30\t0\n")
    chrs, p1, q1, s1, f1 = fastio.parse_snp_file(f)
    assert len(chrs) == n
    np.testing.assert_array_equal(p1, pos)
    np.testing.assert_array_equal(q1, freq)
    assert (s1 == 30).all() and (f1 == 0).all()


def test_parse_ms_haplotypes():
    lines = [b"0101", b"1100", b"0011"]
    m = fastio.parse_ms_haplotypes(lines)
    np.testing.assert_array_equal(
        m, [[0, 1, 0, 1], [1, 1, 0, 0], [0, 0, 1, 1]]
    )
    with pytest.raises(ValueError):
        fastio.parse_ms_haplotypes([b"01", b"011"])


def test_reader_uses_fast_path(tmp_path):
    from fscl_tpu.io import load_snp_input

    f = tmp_path / "y.sf"
    f.write_text("1\t10\t2\t10\t0\n1\t20\t9\t10\t1\n1\t30\t1\t3\t0\n")
    d = load_snp_input(f, minimum_obs_depth=5)
    assert d.n_snps == 2
    # folded 9/10 folds to minor 1
    np.testing.assert_array_equal(d.obs_freq, [2, 1])

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


@pytest.fixture(scope="module")
def ms_file(tmp_path_factory):
    """Two-block ms file with enough sites for a permutation run."""
    rng = np.random.default_rng(7)
    lines = ["ms 16 2 -s 80", "1 2 3", ""]
    for _ in range(2):
        lines.append("//")
        lines.append("segsites: 80")
        pos = np.sort(rng.random(80))
        lines.append("positions: " + " ".join(f"{p:.6f}" for p in pos))
        for _ in range(16):
            lines.append("".join(rng.choice(["0", "1"], 80, p=[0.75, 0.25])))
        lines.append("")
    f = tmp_path_factory.mktemp("cliv-ms") / "sim.ms"
    f.write_text("\n".join(lines) + "\n")
    return f


MS_BASE = ["--ms-segment-length", "1000000", "-g", "100000",
           "-G", "1000000", "--grid-points", "256", "--eval-range", "100",
           "-v", "1"]


def test_ms_no_hist_takes_lattice_path(ms_file, tmp_path):
    """--no-hist must reach the permutation engine on -m input too
    (the reference's single pipeline honors every flag in both modes,
    fscl.c:281-314)."""
    from fscl_tpu.engine import permute as perm_mod

    out = tmp_path / "ms_nohist.tsv"
    rc = main(["-m", str(ms_file), "-o", str(out), "--no-hist",
               "-p", "8", "--chunk-replicates", "4", *MS_BASE])
    assert rc == 0
    assert perm_mod.last_stats["lattice_dispatches"] > 0
    assert perm_mod.last_stats["hist_unsharded_dispatches"] == 0

    out2 = tmp_path / "ms_hist.tsv"
    rc = main(["-m", str(ms_file), "-o", str(out2),
               "-p", "8", "--chunk-replicates", "4", *MS_BASE])
    assert rc == 0
    assert perm_mod.last_stats["lattice_dispatches"] == 0


def test_ms_checkpoint_flag(ms_file, tmp_path):
    """--checkpoint on -m input writes one resumable file per block."""
    out = tmp_path / "ms_ck.tsv"
    ck = tmp_path / "ck.npz"
    rc = main(["-m", str(ms_file), "-o", str(out),
               "-p", "8", "--chunk-replicates", "4",
               "--checkpoint", str(ck), *MS_BASE])
    assert rc == 0
    assert (tmp_path / "ck.npz.block0").exists()
    assert (tmp_path / "ck.npz.block1").exists()
    # resume to more rounds: loads per-block state and continues
    rc = main(["-m", str(ms_file), "-o", str(out),
               "-p", "16", "--chunk-replicates", "4",
               "--checkpoint", str(ck), *MS_BASE])
    assert rc == 0
    pn = np.array([int(r[5]) for r in _rows(out)])
    assert pn.max() == 16


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


def test_ms_nulldist_covers_every_block(ms_file, tmp_path):
    """-m input writes null-CLR reservoirs for EVERY block (VERDICT r4
    weak #8: blocks 1+ used to accumulate reservoirs that were silently
    dropped; the C writes nulldist only on SIGINT, so per-block output
    is a strict superset either way)."""
    out = tmp_path / "ms_nd.tsv"
    rc = main(["-m", str(ms_file), "-o", str(out),
               "-p", "8", "--chunk-replicates", "4", *MS_BASE])
    assert rc == 0
    main_rows = _rows(out)
    nd_lines = (tmp_path / "ms_nd.tsv-nulldist").read_text().splitlines()
    # one header + one reservoir row per scan point across ALL blocks
    assert len(nd_lines) == 1 + len(main_rows), (
        len(nd_lines), len(main_rows)
    )
    assert nd_lines[0].startswith("chr\tpos\tCLR")
    # every data row carries at least the 6 fixed columns plus >= 1 CLR
    for ln in nd_lines[1:]:
        assert len(ln.split("\t")) >= 7

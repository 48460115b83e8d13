"""Tests for the ms-output parser, adapters, and the ms CLI pipeline."""

import io
import textwrap

import numpy as np
from fscl_tpu.io.ms_parser import (
    MsParser,
    msblock_fsbranch_lengths,
    msblock_sfs,
    sfs_summaries,
    _parse_newick,
)

MS_SAMPLE = textwrap.dedent(
    """\
    ms 4 2 -s 5 -T
    27269 12761 30133

    //
    [3]((1:0.2,2:0.2):0.5,(3:0.3,4:0.3):0.4);
    [7](1:0.1,(2:0.4,(3:0.2,4:0.2):0.1):0.3);
    segsites: 5
    positions: 0.1000 0.2500 0.4000 0.6000 0.9000
    01010
    01100
    00100
    11011

    //
    segsites: 3
    prob: 0.75
    positions: 0.2 0.5 0.8
    010
    011
    110
    100
    """
)


class TestMsParser:
    def test_blocks(self):
        p = MsParser(io.StringIO(MS_SAMPLE))
        b1 = p.next_block()
        assert b1.n_poly == 5
        assert b1.n_haplotypes == 4
        assert len(b1.segments) == 2
        assert b1.segments[0].segment_size == 3
        np.testing.assert_allclose(b1.positions[0], 0.1)
        np.testing.assert_array_equal(b1.haplotypes[0], [0, 1, 0, 1, 0])
        b2 = p.next_block()
        assert b2.n_poly == 3
        assert b2.prob == 0.75
        assert len(b2.segments) == 0
        assert p.next_block() is None

    def test_newick(self):
        t = _parse_newick("((1:0.2,2:0.2):0.5,(3:0.3,4:0.3):0.4)")
        assert t.sample_index == -1
        assert t.left.left.sample_index == 0  # 1-based -> 0-based
        assert t.left.length == 0.5
        np.testing.assert_allclose(t.right.right.length, 0.3)

    def test_sfs(self):
        p = MsParser(io.StringIO(MS_SAMPLE))
        b1 = p.next_block()
        # column sums: [1,3,2,2,1] -> sfs[1]=2, sfs[2]=2, sfs[3]=1
        sfs = msblock_sfs(b1, 0, 4)
        np.testing.assert_array_equal(sfs, [0, 2, 2, 1, 0])
        # subsample rows 1..3
        sfs2 = msblock_sfs(b1, 1, 2)
        cols = b1.haplotypes[1:3].sum(axis=0).astype(np.int64)
        np.testing.assert_array_equal(sfs2, np.bincount(cols, minlength=3))

    def test_branch_length_sfs(self):
        p = MsParser(io.StringIO(MS_SAMPLE))
        b1 = p.next_block()
        bfs = msblock_fsbranch_lengths(b1, 0, 4)
        # tree 1 (size 3): four 1-leaf branches 0.2,0.2,0.3,0.3; two 2-leaf 0.5,0.4
        # tree 2 (size 7): leaves 0.1,0.4,0.2,0.2; 2-leaf 0.1; 3-leaf 0.3
        expect1 = 3 * np.array([0, 0.2 + 0.2 + 0.3 + 0.3, 0.5 + 0.4, 0, 0])
        expect2 = 7 * np.array([0, 0.1 + 0.4 + 0.2 + 0.2, 0.1, 0.3, 0])
        np.testing.assert_allclose(bfs, expect1 + expect2, rtol=1e-12)

    def test_sfs_summaries_neutral(self):
        # a flat 1/i spectrum should give Tajima's D near 0 in expectation
        n = 20
        i = np.arange(1, n)
        sfs = np.zeros(n + 1)
        sfs[1:n] = 1000.0 / i
        ss = sfs_summaries(sfs, n)
        assert ss.n == int(sfs[1:n].sum())
        np.testing.assert_allclose(ss.Tw, sfs[1:n].sum() / (1 / i).sum(), rtol=1e-9)
        assert abs(ss.Dt) < 0.05
        # theta_pi for 1/i spectrum also equals theta_W in expectation
        np.testing.assert_allclose(ss.Tpi, ss.Tw, rtol=0.05)


class TestMsInput:
    def test_ms_background_and_blocks(self, tmp_path):
        from fscl_tpu.io.ms_input import iter_ms_blocks, ms_background

        f = tmp_path / "x.ms"
        f.write_text(MS_SAMPLE)
        data = ms_background(str(f), 10000, False, 0, 0)
        # block 1: all 5 sites segregating; block 2: 3 sites
        assert data.n_snps == 8
        assert data.n_chromosomes == 1
        # second block offset by segment length
        assert data.pos.max() >= 10000
        blocks = list(iter_ms_blocks(str(f), 10000, False, 0, 0))
        assert len(blocks) == 2
        assert blocks[0].n_snps == 5
        assert blocks[1].n_snps == 3
        np.testing.assert_array_equal(blocks[1].obs_freq, [2, 3, 1])

    def test_folded_ms(self, tmp_path):
        from fscl_tpu.io.ms_input import iter_ms_blocks

        f = tmp_path / "x.ms"
        f.write_text(MS_SAMPLE)
        blocks = list(iter_ms_blocks(str(f), 10000, True, 0, 0))
        # folded to minor: block1 counts [1,3,2,2,1] of 4 -> [1,1,2,2,1]
        np.testing.assert_array_equal(blocks[0].obs_freq, [1, 1, 2, 2, 1])
        assert blocks[0].folded.all()

    def test_ms_cli_pipeline(self, tmp_path):
        """End-to-end -m path with --max-only over a generated ms file."""
        from fscl_tpu.cli import main

        rng = np.random.default_rng(0)
        lines = ["ms 12 3 -s 60", "1 2 3", ""]
        for _ in range(3):
            lines.append("//")
            lines.append("segsites: 60")
            pos = np.sort(rng.random(60))
            lines.append("positions: " + " ".join(f"{p:.5f}" for p in pos))
            for _ in range(12):
                lines.append("".join(rng.choice(["0", "1"], 60, p=[0.8, 0.2])))
            lines.append("")
        f = tmp_path / "sim.ms"
        f.write_text("\n".join(lines) + "\n")
        out = tmp_path / "ms_scan.tsv"
        rc = main([
            "-m", str(f), "--ms-segment-length", "1000000",
            "-o", str(out), "--max-only",
            "-g", "100000", "-G", "1000000", "--grid-points", "256",
            "--eval-range", "100", "-v", "1",
        ])
        assert rc == 0
        rows = [l.split("\t") for l in open(out)]
        assert len(rows) == 3  # one max line per replicate (appended!)

"""Tests: checkpoint/resume, ascbias-segments simulator, sharded engines."""

import io

import jax
import numpy as np
import pytest

from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
from fscl_tpu.models import background_fsp, build_tables
from fscl_tpu.sim import simulate_dataset, write_snp_file
from fscl_tpu.sim.ascbias_segments import draw_samples, extract_snps, neutral_block_source
from fscl_tpu.io.ms_parser import MsParser


@pytest.fixture(scope="module")
def small_scan(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    sim = simulate_dataset(
        seed=3, sample_size=20, snp_density=1.0, mb_length=2.0,
        alpha=3e-5, n_sweeps=1,
    )
    path = d / "s.sf"
    write_snp_file(path, sim["pos"], sim["freq"], sim["n"])

    from fscl_tpu.io import load_snp_input

    data = load_snp_input(path)
    fsp = background_fsp(data.obs_freq, data.depth_p, data.folded, data.sample_depths)
    tables = build_tables(fsp, data.sample_depths, grid_points=256)
    data.attach_model(tables)
    cfg = ScanConfig(
        eval_range=600, small_grid_sp=20000, large_grid_sp=200000, refine=False
    )
    result = scan_genome(data, tables, cfg)
    return data, tables, cfg, result


def _clone_result(result):
    import copy

    r = copy.deepcopy(result)
    r.permute_n[:] = 0
    r.permute_p[:] = 0
    r.permute_finished[:] = False
    r.null_clr = [None] * r.n_points
    return r


class TestCheckpoint:
    def test_resume_matches_uninterrupted(self, small_scan, tmp_path):
        data, tables, cfg, result = small_scan
        # uninterrupted 24 rounds
        full = _clone_result(result)
        scan_permute(
            data, tables, full, cfg,
            PermuteConfig(n_permute=24, chunk_replicates=8, seed=5),
        )
        # interrupted: 8 rounds, checkpoint, then resume to 24
        ck = str(tmp_path / "perm.ckpt.npz")
        part = _clone_result(result)
        scan_permute(
            data, tables, part, cfg,
            PermuteConfig(n_permute=8, chunk_replicates=8, seed=5, checkpoint_path=ck),
        )
        resumed = _clone_result(result)
        scan_permute(
            data, tables, resumed, cfg,
            PermuteConfig(n_permute=24, chunk_replicates=8, seed=5, checkpoint_path=ck),
        )
        # pruning RNG consumption differs between the two schedules, so
        # compare the permutation stream itself: null CLR reservoirs match
        # for points that were never pruned in either run
        never_pruned = ~(full.permute_finished | resumed.permute_finished)
        assert never_pruned.any()
        for i in np.where(never_pruned)[0]:
            np.testing.assert_allclose(
                sorted(full.null_clr[i]), sorted(resumed.null_clr[i]), rtol=1e-5
            )
            assert resumed.permute_n[i] == 24
        # stat_threshold must survive the resume for EVERY point — the
        # tail projection uses it, and points finished before the restart
        # are never recomputed (ADVICE r3): restored from the checkpoint
        assert np.isfinite(resumed.stat_threshold).all()
        np.testing.assert_allclose(
            resumed.stat_threshold, full.stat_threshold, rtol=1e-5
        )

    def test_checkpoint_rejects_mismatched_scan(self, small_scan, tmp_path):
        from fscl_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

        data, tables, cfg, result = small_scan
        ck = str(tmp_path / "x.npz")
        r1 = _clone_result(result)
        save_checkpoint(ck, r1, rounds_done=4, seed=1)
        r2 = _clone_result(result)
        r2.clr = r2.clr + 5.0
        with pytest.raises(ValueError):
            load_checkpoint(ck, r2)

    def test_incremental_roundtrip_and_torn_tail(self, small_scan, tmp_path):
        """Checkpointer deltas replay exactly; a torn final record is
        dropped (resume falls back to the last complete record)."""
        from fscl_tpu.engine.checkpoint import Checkpointer

        data, tables, cfg, result = small_scan
        ck = str(tmp_path / "inc.npz")
        r1 = _clone_result(result)
        c1 = Checkpointer(ck, r1, seed=5)
        r1.permute_n[:] = 8
        r1.permute_p[0] = 3
        r1.null_clr[0] = [1.0, 2.0]
        c1.save(r1, 8)
        r1.permute_n[:] = 16
        r1.null_clr[0].extend([3.5])
        r1.null_clr[1] = [0.25]
        c1.save(r1, 16)
        c1.close()

        r2 = _clone_result(result)
        c2 = Checkpointer(ck, r2, seed=5)
        assert c2.rounds_done == 16
        assert r2.null_clr[0] == [1.0, 2.0, 3.5]
        assert r2.null_clr[1] == [0.25]
        assert (r2.permute_n == 16).all() and r2.permute_p[0] == 3
        c2.close()

        # tear the last record: truncate 4 bytes off the log
        import os

        size = os.path.getsize(ck + ".log")
        with open(ck + ".log", "r+b") as fh:
            fh.truncate(size - 4)
        r3 = _clone_result(result)
        c3 = Checkpointer(ck, r3, seed=5)
        assert c3.rounds_done == 8
        assert r3.null_clr[0] == [1.0, 2.0]
        assert r3.null_clr[1] is None or r3.null_clr[1] == []
        c3.close()

    def test_incremental_resumes_legacy_snapshot(self, small_scan, tmp_path):
        from fscl_tpu.engine.checkpoint import Checkpointer, save_checkpoint

        data, tables, cfg, result = small_scan
        ck = str(tmp_path / "legacy.npz")
        r1 = _clone_result(result)
        r1.permute_n[:] = 12
        r1.null_clr[2] = [4.0]
        save_checkpoint(ck, r1, rounds_done=12, seed=5)
        r2 = _clone_result(result)
        c = Checkpointer(ck, r2, seed=5)
        assert c.rounds_done == 12
        assert r2.null_clr[2] == [4.0]
        assert (r2.permute_n == 12).all()
        c.close()

    def test_incremental_rejects_mismatched_scan(self, small_scan, tmp_path):
        from fscl_tpu.engine.checkpoint import Checkpointer

        data, tables, cfg, result = small_scan
        ck = str(tmp_path / "inc2.npz")
        r1 = _clone_result(result)
        Checkpointer(ck, r1, seed=5).close()
        r2 = _clone_result(result)
        r2.clr = r2.clr + 5.0
        with pytest.raises(ValueError):
            Checkpointer(ck, r2, seed=5)


class TestAscbiasSegments:
    def test_extract_snps_rule(self):
        from fscl_tpu.io.ms_parser import MsBlock

        haps = np.array(
            [
                [1, 0, 1, 1],
                [0, 0, 1, 1],
                [0, 1, 0, 1],  # rows 0-1 are the asc panel (asc_depth=2)
                [0, 1, 0, 0],
            ],
            dtype=np.uint8,
        )
        blk = MsBlock(
            segments=[], prob=0.0,
            positions=np.array([0.1, 0.2, 0.3, 0.4]), haplotypes=haps,
        )
        pos, alleles = extract_snps(blk, 0, 1000, asc_depth=2, double_hit=False)
        # panel counts per site: [1, 0, 2, 2] -> keep d in (0, 2) -> site 0 only
        np.testing.assert_array_equal(pos, [100])
        assert alleles.shape == (1, 4)

    def test_draw_samples_roundtrip(self):
        rng = np.random.default_rng(0)
        buf = io.StringIO()
        draw_samples(
            buf, n_repl=2, sample_size=10, mb_length=2, n_snps=50,
            asc_depth=4, double_hit=False, rho_mb=0.0, rho_std=0.0,
            block_source=neutral_block_source(rng), seed=1,
        )
        buf.seek(0)
        header = buf.readline()
        assert header.startswith("ms 10 2 -s 50")
        buf.readline()  # seeds
        p = MsParser(buf)
        b1 = p.next_block()
        b2 = p.next_block()
        assert b1.n_poly == 50 and b2.n_poly == 50
        assert b1.n_haplotypes == 10
        assert p.next_block() is None
        # ascertained data: every kept site is polymorphic in the panel
        d = b1.haplotypes[:4].sum(axis=0)
        assert ((d > 0) & (d < 4)).all()
        # positions sorted
        assert (np.diff(b1.positions) >= 0).all()


class TestShardedEngines:
    def test_sharded_scan_matches_single(self):
        import jax.numpy as jnp

        import __graft_entry__ as g
        from fscl_tpu.ops.lattice import LatticeTables, two_stage_lattice_max
        from fscl_tpu.parallel import make_scan_mesh, sharded_scan_eval

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        tables, pos, row, null, cand, lo, hi = g._example_problem(
            n_sites=512, n_cand=32, grid_points=256
        )
        lt = LatticeTables(tables.table, tables.grid_points)
        args = (jnp.asarray(row), jnp.asarray(pos), jnp.asarray(null))
        mesh = make_scan_mesh(n_perm=2, n_site=2, devices=jax.devices()[:4])
        clr_s, la_s = sharded_scan_eval(
            mesh, lt, *args, jnp.asarray(cand), jnp.asarray(lo), jnp.asarray(hi),
            chunk=8,
        )
        clr_1, la_1 = two_stage_lattice_max(
            lt, *args, jnp.asarray(cand), jnp.asarray(lo), jnp.asarray(hi),
            chunk=8,
        )
        np.testing.assert_allclose(np.asarray(clr_s), np.asarray(clr_1), rtol=1e-5)


def test_make_scan_mesh_default_perm_major():
    """Default factoring gives every device to the perm axis (mesh.py)."""
    import jax

    from fscl_tpu.parallel import make_scan_mesh

    mesh = make_scan_mesh()
    n = len(jax.devices())
    assert dict(mesh.shape) == {"perm": n, "site": 1}
    mesh2 = make_scan_mesh(n_site=2)
    assert dict(mesh2.shape) == {"perm": n // 2, "site": 2}


def test_gpos_cache_not_fooled_by_id_reuse():
    """A GC'd gpos array whose address is recycled must NOT serve a stale
    device copy (ops/permute.py _gpos_cache, VERDICT r1 hazard)."""
    import numpy as np

    from fscl_tpu.ops.permute import _group_first_positions, _gpos_cache

    _gpos_cache.clear()
    a = np.arange(0, 8000, 10, dtype=np.int64)
    dev_a, span_a = _group_first_positions(a)
    ck = id(a)
    assert ck in _gpos_cache
    # simulate id reuse: drop the referent, then poison the cache slot the
    # way a recycled address would look (dead weakref, stale device array)
    del a
    b = np.arange(0, 16000, 20, dtype=np.int64)

    class _DeadRef:
        def __call__(self):
            return None

    _gpos_cache[id(b)] = (_DeadRef(), dev_a)
    dev_b, span_b = _group_first_positions(b)
    assert span_b == 15980
    np.testing.assert_array_equal(
        np.asarray(dev_b),
        (b[::__import__("fscl_tpu.ops.permute", fromlist=["PERM_GROUP"])
         .PERM_GROUP] - b[0]).astype(np.int32)
    )
    _gpos_cache.clear()

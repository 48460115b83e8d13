"""Hist-engine applicability-gate boundaries (VERDICT r4 item 6).

The histogram fast path is gated by hist_supported (SITES_MAX site cap,
ops/histclr.py:61) and by the block-index-table geometry (dataset_qbits,
ops/histclr.py:494-509).  Past either boundary the drivers must fall back
to the exact lattice path — silently correct, not silently broken.  These
tests drive BOTH gates end-to-end through the production drivers and
compare the fallback's results against the hist path on the same data.

The SITES_MAX edge is exercised by shrinking the cap (a real 4M-site
chromosome is out of CI's budget; the gate compares n_sites <= SITES_MAX,
so the boundary logic is identical).  The geometry gate is exercised with
a realistic trigger: a long chromosome (position span forcing a coarse
block quantum) carrying one dense SNP cluster that overflows the
_SLAB_K-site block slab at that quantum.
"""

import copy

import numpy as np
import pytest

import fscl_tpu.ops.histclr as H
from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
from fscl_tpu.io import load_snp_input
from fscl_tpu.models import background_fsp, build_tables
from fscl_tpu.sim import simulate_dataset, write_snp_file


def _build(tmp_path, pos, freq, n):
    path = tmp_path / "g.sf"
    write_snp_file(path, pos, freq, n)
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=256)
    data.attach_model(tables)
    return data, tables


CFG = dict(eval_range=1500, small_grid_sp=25_000, large_grid_sp=500_000)


def _run(data, tables, use_hist=True):
    import fscl_tpu.engine.permute as pm

    cfg = ScanConfig(**CFG, use_hist=use_hist)
    result = scan_genome(data, tables, cfg)
    pc = PermuteConfig(n_permute=48, chunk_replicates=48, seed=9,
                       use_hist=use_hist)
    scan_permute(data, tables, result, cfg, pc)
    return result, dict(pm.last_stats)


@pytest.fixture(scope="module")
def sim():
    return simulate_dataset(
        seed=77, sample_size=24, snp_density=1.0, mb_length=3.0,
        alpha=3e-5, n_sweeps=1,
    )


def test_sites_cap_engages_lattice_fallback(tmp_path, sim, monkeypatch):
    """n_sites > SITES_MAX -> hist gate closes -> lattice path runs and
    agrees with the hist path on the same data."""
    data_h, tables_h = _build(tmp_path, sim["pos"], sim["freq"], sim["n"])
    r_hist, st_hist = _run(data_h, tables_h)
    assert st_hist["hist_unsharded_dispatches"] \
        + st_hist["hist_sharded_dispatches"] > 0

    monkeypatch.setattr(H, "SITES_MAX", len(sim["pos"]) - 1)
    assert not H.hist_supported(10, len(sim["pos"]))
    data_l, tables_l = _build(tmp_path, sim["pos"], sim["freq"], sim["n"])
    r_lat, st_lat = _run(data_l, tables_l)
    assert st_lat["hist_unsharded_dispatches"] == 0
    assert st_lat["hist_sharded_dispatches"] == 0
    assert st_lat["lattice_dispatches"] \
        + st_lat["lattice_sharded_dispatches"] > 0

    # reported scan values: both paths evaluate winners with the exact
    # lattice kernel but search different position pools (the hist path
    # adds SNP probes + bp_resl refinement), so the hist maxima dominate
    # up to the documented near-exact band; the sweep interval's broad
    # peak must agree tightly on both
    assert (r_hist.clr >= r_lat.clr - 0.5).all(), (r_hist.clr, r_lat.clr)
    i_pk = int(np.argmax(r_hist.clr))
    np.testing.assert_allclose(
        r_lat.clr[i_pk], r_hist.clr[i_pk], atol=0.5, rtol=1e-3
    )
    # both permutation paths are valid MC tests of slightly different
    # statistics; on shared sigma streams their empirical p-values must
    # agree to MC resolution, and the sweep interval must be extreme on both
    def p_emp(r):
        return np.where(
            r.permute_p < 2, 1.0 / np.maximum(r.permute_n, 1),
            (r.permute_p - 1) / np.maximum(r.permute_n - 1, 1),
        )

    # hist and lattice are slightly different statistics estimated with
    # 48 permutations each: near-threshold intervals can land far apart
    # in empirical p (a single point measured |dp|=0.43 when one side's
    # null sat exactly at its threshold), so gate the MEAN, and require
    # the unambiguous sweep interval to be the most significant on both
    assert np.abs(p_emp(r_lat) - p_emp(r_hist)).mean() <= 0.15
    i_sweep = int(np.argmax(r_hist.clr))
    assert p_emp(r_lat)[i_sweep] == p_emp(r_hist).min()


def test_dense_cluster_breaks_block_geometry(tmp_path, sim):
    """A >_SLAB_K-site cluster inside one minimum-quantum block on a long
    chromosome defeats dataset_qbits -> geometry gate closes -> lattice
    path runs end-to-end."""
    # span ~500 Mb forces qbits >= 7 (block table <= _IDX_TAB_MAX
    # entries); 24 sites inside 64 bp then overflow the 16-site slab
    rng = np.random.default_rng(5)
    pos = np.sort(rng.choice(500_000_000, 2000, replace=False)).astype(
        np.int64
    )
    cluster = 250_000_000 + np.arange(24) * 2
    pos = np.sort(np.concatenate([pos, cluster]))
    freq = rng.integers(1, sim["n"], size=len(pos))
    assert H.dataset_qbits([pos]) is None
    assert not H.hist_geometry_ok(pos)

    data, tables = _build(tmp_path, pos, freq, sim["n"])
    cfg = ScanConfig(eval_range=500, small_grid_sp=50_000_000,
                     large_grid_sp=250_000_000)
    import fscl_tpu.engine.permute as pm

    result = scan_genome(data, tables, cfg)
    assert np.isfinite(result.clr).all()
    scan_permute(
        data, tables, result, cfg,
        PermuteConfig(n_permute=16, chunk_replicates=16, seed=2),
    )
    st = dict(pm.last_stats)
    assert st["hist_unsharded_dispatches"] == 0
    assert st["hist_sharded_dispatches"] == 0
    assert st["lattice_dispatches"] + st["lattice_sharded_dispatches"] > 0
    assert (result.permute_n > 0).all()

"""Hist-path vs lattice-path permutation engines: statistical agreement."""

import copy

import numpy as np
import pytest

from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
from fscl_tpu.io import load_snp_input
from fscl_tpu.models import background_fsp, build_tables
from fscl_tpu.sim import simulate_dataset, write_snp_file


@pytest.fixture(scope="module")
def scanned(tmp_path_factory):
    d = tmp_path_factory.mktemp("ph")
    sim = simulate_dataset(
        seed=21, sample_size=30, snp_density=1.0, mb_length=4.0,
        alpha=3e-5, n_sweeps=1,
    )
    path = d / "s.sf"
    write_snp_file(path, sim["pos"], sim["freq"], sim["n"])
    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=256)
    data.attach_model(tables)
    cfg = ScanConfig(
        eval_range=1200, small_grid_sp=20_000, large_grid_sp=400_000,
        refine=False,
    )
    result = scan_genome(data, tables, cfg)
    return data, tables, cfg, result


def _run(scanned, use_hist, n_permute=48):
    data, tables, scan_cfg, result0 = scanned
    result = copy.deepcopy(result0)
    result.permute_n[:] = 0
    result.permute_p[:] = 0
    result.permute_finished[:] = False
    result.null_clr = [None] * result.n_points
    cfg = PermuteConfig(
        n_permute=n_permute, seed=99, chunk_replicates=16,
        use_hist=use_hist, scan_width_mb=1.0,
    )
    scan_permute(data, tables, result, scan_cfg, cfg)
    return result


def test_hist_and_lattice_paths_agree(scanned):
    r_hist = _run(scanned, True)
    r_lat = _run(scanned, False)
    # same permutation stream, slightly different statistics: exceedance
    # *fractions* must agree closely at every point
    f_hist = r_hist.permute_p / np.maximum(r_hist.permute_n, 1)
    f_lat = r_lat.permute_p / np.maximum(r_lat.permute_n, 1)
    assert np.abs(f_hist - f_lat).mean() < 0.12
    # the sweep interval stays the most significant on both paths
    best = np.argmax(r_hist.clr)
    assert r_hist.permute_p[best] <= 3 and r_lat.permute_p[best] <= 3
    # null reservoirs sample close distributions (quantile agreement);
    # restrict to points never pruned on either path, so both pools hold the
    # full reservoir per point — pruning schedules differ between paths and
    # would otherwise weight the pools differently
    both = np.where(~(r_hist.permute_finished | r_lat.permute_finished))[0]
    assert len(both) > 0
    pool_h = np.concatenate([r_hist.null_clr[i] for i in both])
    pool_l = np.concatenate([r_lat.null_clr[i] for i in both])
    qs = np.linspace(0.1, 0.9, 9)
    qh = np.quantile(pool_h, qs)
    ql = np.quantile(pool_l, qs)
    assert np.abs(qh - ql).max() < 0.15 * (np.abs(ql).max() + 1.0)


def test_hist_path_deterministic(scanned):
    r1 = _run(scanned, True, n_permute=32)
    r2 = _run(scanned, True, n_permute=32)
    np.testing.assert_array_equal(r1.permute_p, r2.permute_p)
    np.testing.assert_array_equal(r1.permute_n, r2.permute_n)
    np.testing.assert_array_equal(r1.permute_finished, r2.permute_finished)


def test_hist_sharded_matches_unsharded(scanned, monkeypatch):
    """Replicate sharding over the 8-device CPU mesh changes nothing."""
    import fscl_tpu.engine.permute as pm

    data, tables, scan_cfg, result0 = scanned

    def run(force_single):
        if force_single:
            monkeypatch.setattr(pm.jax, "device_count", lambda: 1)
        else:
            monkeypatch.undo()
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = False
        r.null_clr = [None] * r.n_points
        cfg = PermuteConfig(
            n_permute=128, seed=31, chunk_replicates=128, use_hist=True,
        )
        scan_permute(data, tables, r, scan_cfg, cfg)
        return r

    r_shard = run(False)  # 8 virtual devices: rep sharding engages
    r_single = run(True)
    np.testing.assert_array_equal(r_shard.permute_p, r_single.permute_p)
    np.testing.assert_array_equal(r_shard.permute_n, r_single.permute_n)
    for i in range(r_shard.n_points):
        np.testing.assert_allclose(
            r_shard.null_clr[i], r_single.null_clr[i], rtol=1e-5, atol=1e-4
        )


def test_bucket_compaction_preserves_results(scanned, monkeypatch):
    """Compacting point buckets as pruning empties them changes nothing:
    each point's statistic depends only on its own interval geometry."""
    import fscl_tpu.engine.permute as pm

    data, tables, scan_cfg, result0 = scanned

    def run():
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = False
        r.null_clr = [None] * r.n_points
        cfg = PermuteConfig(
            n_permute=64, seed=77, chunk_replicates=16, use_hist=True,
        )
        scan_permute(data, tables, r, scan_cfg, cfg)
        return r

    monkeypatch.setattr(pm, "HIST_POINT_BUCKET", 4)  # 10 points -> 3 buckets
    monkeypatch.setattr(pm, "HIST_COMPACT", False)
    r_plain = run()
    monkeypatch.setattr(pm, "HIST_COMPACT", True)
    r_comp = run()
    np.testing.assert_array_equal(r_plain.permute_p, r_comp.permute_p)
    np.testing.assert_array_equal(r_plain.permute_n, r_comp.permute_n)
    # pruning actually removed points mid-run, so compaction engaged
    assert r_plain.permute_finished.sum() > 0


def test_hist_gate_falls_back(scanned, monkeypatch):
    import fscl_tpu.engine.permute as pm

    calls = {"hist": 0}
    orig = pm._scan_permute_hist

    def spy(*a, **k):
        calls["hist"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pm, "_scan_permute_hist", spy)
    monkeypatch.setattr(pm, "hist_supported", lambda r, n: False)
    _run(scanned, True, n_permute=8)
    assert calls["hist"] == 0


def test_decimated_statistic_matches_exact(scanned):
    """Null-statistic decimation keeps exceedance fractions calibrated.

    The engine caps hist_decimate so the decimated lattice step stays under
    ~0.1 log_ad units; at G=1024 the cap allows 4x.  Identical permutation
    streams with the decimated vs exact lattice must produce closely
    agreeing per-point exceedance fractions (the thresholds are re-derived
    with the same functional on each side)."""
    data, tables_256, scan_cfg, _ = scanned
    from fscl_tpu.models import background_fsp, build_tables

    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=1024)
    data.attach_model(tables)
    try:
        result0 = scan_genome(data, tables, scan_cfg)

        def run(dec):
            r = copy.deepcopy(result0)
            cfg = PermuteConfig(
                n_permute=48, seed=5, chunk_replicates=16, use_hist=True,
                hist_decimate=dec,
            )
            scan_permute(data, tables, r, scan_cfg, cfg)
            return r

        r_dec = run(8)  # capped to 4 at G=1024
        r_exact = run(1)
        f_dec = r_dec.permute_p / np.maximum(r_dec.permute_n, 1)
        f_exact = r_exact.permute_p / np.maximum(r_exact.permute_n, 1)
        assert np.abs(f_dec - f_exact).mean() < 0.10
    finally:
        data.attach_model(tables_256)


def test_round_updates_vectorized():
    """_apply_round_updates must be bitwise identical to the naive
    per-point reference loop, INCLUDING the host RNG stream (draw order =
    one draw per exceedance past the threshold, points in act order)."""
    from fscl_tpu.engine.permute import (
        PRUNE_THRESHOLD, _apply_round_updates,
    )

    def naive(result, active, threshold, rng, cfg, act, null_max,
              rounds_done, R):
        for a, pt in enumerate(act):
            if result.permute_finished[pt]:
                continue
            vals = null_max[:, a]
            res = result.null_clr[pt]
            take = max(0, cfg.null_dist_save - len(res))
            if take:
                res.extend(vals[:take].tolist())
            exceed = vals >= threshold[pt]
            for e in np.where(exceed)[0]:
                result.permute_p[pt] += 1
                result.permute_n[pt] = rounds_done + int(e) + 1
                if (
                    result.permute_p[pt] >= PRUNE_THRESHOLD
                    and result.permute_p[pt] / max(result.permute_n[pt], 1)
                    >= rng.random()
                ):
                    result.permute_finished[pt] = True
                    break
            if not result.permute_finished[pt]:
                result.permute_n[pt] = rounds_done + R
            active[pt] = not result.permute_finished[pt]

    class _Res:
        pass

    class _Cfg:
        null_dist_save = 11  # small cap so fill transitions are covered

    def make(seed, K):
        r = _Res()
        g = np.random.default_rng(seed)
        r.permute_p = g.integers(0, 30, K).astype(np.int64)
        r.permute_n = g.integers(1, 200, K).astype(np.int64)
        r.permute_finished = g.random(K) < 0.2
        r.null_clr = [
            list(g.random(int(n)))
            for n in g.integers(0, _Cfg.null_dist_save + 2, K)
        ]
        return r

    g = np.random.default_rng(0)
    for trial in range(20):
        K, R = int(g.integers(3, 40)), int(g.integers(1, 64))
        act = np.sort(g.choice(K, size=int(g.integers(1, K + 1)),
                               replace=False))
        thr = g.random(K) * 2
        nm = g.random((R, len(act))) * 2.5  # many exceedances
        ra = make(trial, K)
        rb = make(trial, K)
        aa = ~ra.permute_finished.copy()
        ab = ~rb.permute_finished.copy()
        rd = int(g.integers(0, 5000))
        naive(ra, aa, thr, np.random.default_rng(99 + trial), _Cfg, act,
              nm, rd, R)
        _apply_round_updates(
            rb, ab, thr, np.random.default_rng(99 + trial), _Cfg, act,
            nm, rd, R,
        )
        np.testing.assert_array_equal(ra.permute_p, rb.permute_p)
        np.testing.assert_array_equal(ra.permute_n, rb.permute_n)
        np.testing.assert_array_equal(ra.permute_finished,
                                      rb.permute_finished)
        np.testing.assert_array_equal(aa, ab)
        for x, y in zip(ra.null_clr, rb.null_clr):
            np.testing.assert_array_equal(x, y)


def test_speculative_chunk_dispatch_matches(scanned, monkeypatch):
    """Pruning-tail boundary overlap: the speculatively pre-dispatched
    next chunk (engine/permute.py stat_spec) changes nothing — replicate
    rows are pure functions of their absolute stream index, so consuming
    the in-flight chunk is bitwise identical to re-dispatching it."""
    import fscl_tpu.engine.permute as pm

    data, tables, scan_cfg, result0 = scanned
    monkeypatch.setattr(pm.jax, "device_count", lambda: 1)
    # strongest point (immortal) + weakest point (pruned mid-run, so the
    # equality also covers consuming a chunk speculated before a death)
    top2 = np.array([np.argmax(result0.clr), np.argmin(result0.clr)])

    def run():
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = True
        r.permute_finished[top2] = False  # 2-point pruning tail
        r.null_clr = [None] * r.n_points
        cfg = PermuteConfig(
            n_permute=1536, seed=5, chunk_replicates=4, use_hist=True,
        )
        scan_permute(data, tables, r, scan_cfg, cfg)
        return r, dict(pm.last_stats)

    monkeypatch.setattr(pm, "STAT_SPEC", False)
    r_plain, s_plain = run()
    monkeypatch.setattr(pm, "STAT_SPEC", True)
    r_spec, s_spec = run()
    assert s_plain.get("hist_spec_chunks", 0) == 0
    assert s_spec.get("hist_spec_chunks", 0) >= 1  # overlap engaged
    assert r_spec.permute_finished[top2[1]]  # the weak point was pruned
    np.testing.assert_array_equal(r_plain.permute_p, r_spec.permute_p)
    np.testing.assert_array_equal(r_plain.permute_n, r_spec.permute_n)
    for i in top2:
        np.testing.assert_allclose(
            r_plain.null_clr[i], r_spec.null_clr[i], rtol=1e-6, atol=1e-5
        )


def test_thin_index_table_matches_fat_onehot(scanned, monkeypatch):
    """The thin i16 row-id stream table (expanded to one-hot on chip)
    is bitwise-equivalent to gathering the fat one-hot rows."""
    import fscl_tpu.engine.permute as pm

    data, tables, scan_cfg, result0 = scanned

    def run():
        r = copy.deepcopy(result0)
        r.permute_n[:] = 0
        r.permute_p[:] = 0
        r.permute_finished[:] = False
        r.null_clr = [None] * r.n_points
        cfg = PermuteConfig(
            n_permute=64, seed=13, chunk_replicates=16, use_hist=True,
        )
        scan_permute(data, tables, r, scan_cfg, cfg)
        return r

    monkeypatch.setattr(pm, "THIN_OH", False)
    r_fat = run()
    monkeypatch.setattr(pm, "THIN_OH", True)
    r_thin = run()
    np.testing.assert_array_equal(r_fat.permute_p, r_thin.permute_p)
    np.testing.assert_array_equal(r_fat.permute_n, r_thin.permute_n)
    np.testing.assert_allclose(
        r_fat.stat_threshold, r_thin.stat_threshold, rtol=0, atol=0
    )
    for i in range(r_fat.n_points):
        np.testing.assert_allclose(
            r_fat.null_clr[i], r_thin.null_clr[i], rtol=1e-6, atol=1e-5
        )

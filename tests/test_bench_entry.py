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


def test_main_cpu_fallback_emits_contract_json(monkeypatch, capsys):
    """When the tunnel is down, main() must still print ONE parseable JSON
    line with the driver-contract keys instead of crashing."""
    monkeypatch.setattr(bench, "tpu_available", lambda *a, **k: False)
    monkeypatch.setattr(bench, "measure_cpu_qps", lambda: 5.0)
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    line = [l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "maxsim_queries_per_sec"
    assert out["unit"] == "q/s"
    assert out["value"] == 5.0
    assert "cpu-fallback" in out["backend"]

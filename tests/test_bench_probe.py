"""bench.py backend-probe retry (VERDICT r4 item 2a): one wedged probe
attempt must not erase the round's TPU evidence — the probe retries with
backoff and only reports the device dead after every attempt fails."""

import subprocess
import sys
import types


def _load_bench():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_retries_past_one_hang():
    bench = _load_bench()
    calls = []

    def run():
        calls.append(1)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
        return types.SimpleNamespace(returncode=0, stdout="ok", stderr="")

    assert bench._probe_backend(backoff_s=0.0, _run=run) is None
    assert len(calls) == 2


def test_probe_retries_past_failure_rc():
    bench = _load_bench()
    calls = []

    def run():
        calls.append(1)
        if len(calls) < 3:
            return types.SimpleNamespace(returncode=1, stdout="",
                                         stderr="boom")
        return types.SimpleNamespace(returncode=0, stdout="ok", stderr="")

    assert bench._probe_backend(backoff_s=0.0, _run=run) is None
    assert len(calls) == 3


def test_probe_reports_all_attempts_dead():
    bench = _load_bench()

    def run():
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    err = bench._probe_backend(attempts=3, backoff_s=0.0, _run=run)
    assert err is not None and err.count("probe hung") == 3


def test_probe_real_subprocess_success():
    # the default runner path, with a trivially-succeeding command
    bench = _load_bench()

    def run():
        return subprocess.run([sys.executable, "-c", "print('ok')"],
                              capture_output=True, text=True, timeout=30)

    assert bench._probe_backend(_run=run) is None

"""bench.py dress-run preemption: the benchmark must never time the chip
while a live dress-rehearsal sampling client holds it.

`bench._preempt_dress_run` stops the client recorded in the pid file by
EXACT pid (never pattern-matched), expires the watchdog deadline file so
runs/dress_watchdog.sh exits instead of relaunching, and no-ops when the
pid is dead/absent or when LDMAE_BENCH_PREEMPT_DRESS=0. Paths are
overridable via env so this test cannot touch a real run.
"""

import importlib.util
import os
import signal
import subprocess
import time

import pytest


@pytest.fixture(scope="module")
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture()
def fake_run(tmp_path, monkeypatch):
    proc = subprocess.Popen(["sleep", "600"])
    pid_file = tmp_path / "dress.pid"
    pid_file.write_text(str(proc.pid))
    deadline_file = tmp_path / "deadline"
    deadline_file.write_text("9999999999")
    monkeypatch.setenv("LDMAE_DRESS_PID_FILE", str(pid_file))
    monkeypatch.setenv("LDMAE_DRESS_DEADLINE_FILE", str(deadline_file))
    monkeypatch.delenv("LDMAE_BENCH_PREEMPT_DRESS", raising=False)
    yield proc, pid_file, deadline_file
    if proc.poll() is None:
        proc.kill()
    proc.wait()


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_preempts_live_client_and_expires_deadline(benchmod, fake_run):
    proc, _, deadline_file = fake_run
    benchmod._preempt_dress_run()
    proc.wait(timeout=10)
    assert proc.returncode == -signal.SIGTERM
    assert int(deadline_file.read_text()) < time.time()


def test_noop_when_client_dead(benchmod, fake_run):
    proc, _, deadline_file = fake_run
    proc.kill()
    proc.wait()
    benchmod._preempt_dress_run()
    assert deadline_file.read_text() == "9999999999"


def test_noop_when_pid_file_missing(benchmod, fake_run, monkeypatch):
    _, pid_file, deadline_file = fake_run
    pid_file.unlink()
    benchmod._preempt_dress_run()
    assert deadline_file.read_text() == "9999999999"


def test_opt_out(benchmod, fake_run, monkeypatch):
    proc, _, deadline_file = fake_run
    monkeypatch.setenv("LDMAE_BENCH_PREEMPT_DRESS", "0")
    benchmod._preempt_dress_run()
    assert _alive(proc.pid)
    assert deadline_file.read_text() == "9999999999"

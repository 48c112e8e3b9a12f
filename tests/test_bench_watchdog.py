"""bench.py watchdog: hang-kill-retry semantics without touching a device.

The tunneled TPU's jax.devices() can block indefinitely (observed > 25 min)
instead of raising when the worker still holds a previous client's state, so
bench.py runs the benchmark in a child process under a per-try timeout. These
tests drive the watchdog with stub children via G8_BENCH_CHILD_CMD.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_watchdog(child_argv, env_extra, timeout=60):
    env = dict(os.environ)
    env.pop("G8_BENCH_CHILD", None)
    env.pop("G8_BENCH_NO_WATCHDOG", None)
    env["G8_BENCH_CHILD_CMD"] = "\x1f".join(child_argv)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=timeout)


def test_watchdog_forwards_success():
    res = _run_watchdog(
        [sys.executable, "-c", "print('{\"metric\": \"stub\"}')"],
        {"G8_BENCH_TRIES": "1", "G8_BENCH_TRY_TIMEOUT": "30"})
    assert res.returncode == 0
    assert res.stdout.strip() == '{"metric": "stub"}'


def test_watchdog_kills_hung_child_and_retries():
    t0 = time.perf_counter()
    res = _run_watchdog(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        {"G8_BENCH_TRIES": "2", "G8_BENCH_TRY_TIMEOUT": "2",
         "G8_BENCH_RETRY_SLEEP": "0.1"})
    dt = time.perf_counter() - t0
    assert res.returncode == 1
    # two hung attempts at 2 s each, not 600 s
    assert dt < 30
    assert res.stderr.count("hung >2s") == 2


def test_watchdog_retries_on_nonzero_exit_then_succeeds():
    # child fails until a marker file exists, then succeeds: attempt 0 creates
    # the marker and exits 1; attempt 1 sees it and prints the JSON line
    import tempfile
    marker = os.path.join(tempfile.mkdtemp(), "ok")
    prog = (
        "import os, sys\n"
        f"m = {marker!r}\n"
        "if os.path.exists(m):\n"
        "    print('{\"metric\": \"retry-ok\"}')\n"
        "else:\n"
        "    open(m, 'w').close()\n"
        "    sys.exit(3)\n")
    res = _run_watchdog(
        [sys.executable, "-c", prog],
        {"G8_BENCH_TRIES": "3", "G8_BENCH_TRY_TIMEOUT": "30",
         "G8_BENCH_RETRY_SLEEP": "0.1"})
    assert res.returncode == 0
    assert res.stdout.strip() == '{"metric": "retry-ok"}'
    assert "rc=3" in res.stderr

"""The bench runner must survive HUNG children, not just crashed ones.

The tunneled TPU's documented failure modes are (a) transient crashes —
covered by the retry loop since round 3 — and (b) fetches/compiles that
hang forever with no CPU use (measured 2026-08-21: a fdfd512 child blocked
16+ min at 2 s of CPU while the tunnel was down). A hung child used to
block the whole suite — including the driver's end-of-round run — because
retries only triggered on nonzero exit. bench.py now bounds each child
with FDTD2D_BENCH_TIMEOUT and kills + retries on expiry.

These tests drive the real parent/child subprocess machinery via the
hidden host-only `_hang` bench (sleeps without importing jax), so they are
fast and device-free.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_hung_child_is_killed_and_retried():
    env = {**os.environ, "FDTD2D_BENCH_TIMEOUT": "2"}
    proc = subprocess.run(
        [sys.executable, BENCH, "--only", "_hang"],
        env=env, capture_output=True, text=True, timeout=120)
    # three timed-out attempts, then give up; the missing headline is
    # reported loudly (rc 1) rather than letting the driver read a
    # different metric as the final line
    assert proc.stderr.count("timed out") == 3, proc.stderr
    assert "giving up" in proc.stderr, proc.stderr
    assert "headline" in proc.stderr, proc.stderr
    assert proc.returncode == 1, proc.stderr
    assert proc.stdout.strip() == "", proc.stdout


def test_unknown_bench_rejected():
    proc = subprocess.run(
        [sys.executable, BENCH, "--only", "nosuchbench"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 2
    assert "unknown bench" in proc.stderr


def test_suite_deadline_skips_remaining():
    env = {**os.environ, "FDTD2D_BENCH_TIMEOUT": "30",
           "FDTD2D_BENCH_SUITE_TIMEOUT": "2"}
    proc = subprocess.run(
        [sys.executable, BENCH, "--only", "_hang"],
        env=env, capture_output=True, text=True, timeout=120)
    # attempt 1 is capped by the 2 s suite deadline, later attempts skipped
    assert "deadline exceeded" in proc.stderr, proc.stderr
    assert proc.stderr.count("timed out") == 1, proc.stderr
    assert proc.returncode == 1, proc.stderr

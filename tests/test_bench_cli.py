"""bench.py argument-parsing guards (advisor r4 finding #1).

Run bench.py as a subprocess, never import it: importing arms its stall
watchdog thread, which would re-exec the *host* process (pytest) after
420 s without progress ticks. Both cases below exit inside argparse,
before any backend/tunnel touch, so they are fast and TPU-safe.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(*argv):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, BENCH, *argv], capture_output=True, text=True,
        timeout=120, env=env, cwd=REPO)


def test_help_parses_without_backend():
    r = _run("--help")
    assert r.returncode == 0, r.stderr
    assert "--steps-per-call" in r.stdout
    assert "--no-scan" in r.stdout


def test_scan_flags_mutually_exclusive():
    # --scan --no-scan used to silently resolve to scan; it must now be a
    # hard argparse error (mutually exclusive group, bench.py).
    r = _run("--scan", "--no-scan", "--steps", "1")
    assert r.returncode == 2
    assert "not allowed with" in r.stderr

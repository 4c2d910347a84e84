"""Regression tests for the two driver-facing artifacts at the repo root:
bench.py (throughput benchmark, one JSON line) and __graft_entry__.py
(single-chip compile check + multi-chip dryrun). A silent API break in
either would invalidate a whole benchmark round, so the suite pins them.

Both run as subprocesses: bench.py/__graft_entry__ force their own JAX
platform config, which must not collide with the suite's 8-virtual-CPU
in-process configuration (tests/conftest.py).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra, timeout=900):
    env = dict(os.environ, **env_extra)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_bench_small_cpu_prints_json_line():
    res = _run(["bench.py"], {"BENCH_SMALL": "1", "STCD_FORCE_CPU": "1"})
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    assert rec["metric"] == "segcd_small_cpu_pairs_per_sec"


@pytest.mark.slow
def test_graft_entry_single_chip_compile():
    res = _run(["__graft_entry__.py"], {"STCD_FORCE_CPU": "1"})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "entry compile: True" in res.stdout


@pytest.mark.slow
def test_graft_entry_multichip_dryrun():
    res = _run(["__graft_entry__.py", "--multichip", "8"], {}, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK: mesh=(8x1)" in res.stdout
    assert "mesh=(4x2)" in res.stdout and "== DP loss" in res.stdout

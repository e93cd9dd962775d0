"""Multi-host (multi-process) rehearsal — TODO #9 / SURVEY §2.3 launcher row.

Spawns real OS processes that rendezvous through jax.distributed
(tools/multihost_rehearsal.py); the data mesh axis spans the process
boundary, standing in for DCN on a multi-slice pod. Slow tier: each child
pays a full cold jit of the train step.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_rehearsal_two_processes():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_rehearsal.py"),
         "--procs", "2", "--port", "12877"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
        env={k: v for k, v in os.environ.items()
             if k != "SPIDER_TPU_TEST_ON_DEVICE"})
    assert r.returncode == 0, r.stdout + r.stderr
    result = [json.loads(line) for line in r.stdout.splitlines()
              if line.startswith("{")][-1]
    assert result["ok"] is True
    assert result["processes"] == 2
    assert result["losses"] == pytest.approx(
        result["single_process_reference"], rel=1e-5)

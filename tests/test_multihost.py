"""Multi-host (mock-DCN) smoke as a suite test (VERDICT r2 next-step #7).

Runs tools/multihost_smoke.py — 2 processes x 4 virtual CPU devices each,
jax.distributed bootstrap, global 8-device mesh, 3 full train iterations
with the env batch sharded across "hosts", host0-only checkpoint — in a
subprocess (it spawns its own workers) and asserts its invariants held.
Reference analog: the untested rl_games `--distributed` plumbing
(scripts/rl_games/train.py:100-107).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_mock_dcn_training():
    env = dict(os.environ)
    # the tool forces its own platform/device config in the workers
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=1200, cwd=ROOT, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "multihost_smoke OK" in r.stdout
    assert "rank-identical metrics" in r.stdout

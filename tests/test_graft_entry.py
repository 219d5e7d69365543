"""Driver-contract tests for __graft_entry__.py.

The driver calls ``dryrun_multichip(8)`` in a fresh process on a 1-TPU host;
the function must self-provision a fake 8-device CPU mesh (VERDICT.md round-1
item 1).  Run it the same way: a clean subprocess with no mesh-related env.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    env = dict(os.environ)
    # Simulate the bench host: no pre-provisioned fake devices.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=570, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok, loss=" in proc.stdout


def test_dryrun_multichip_inprocess_with_live_backend():
    # conftest already initialized an 8-fake-device CPU backend: the function
    # must use it rather than trying (and failing) to re-provision.  One
    # phase suffices for that property — the slow-marked subprocess test and
    # the driver (every round, MULTICHIP_r*.json) run all four; dp_fast is
    # the most representative (shard_map + Pallas-interpret + pmean-ed BN).
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8, phases=("dp_fast",))

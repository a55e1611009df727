"""Regression test for the driver's multi-chip dry-run hook.

Round-1 failure mode (MULTICHIP_r01.json): the driver process had already
initialized the single-device axon backend before calling
``dryrun_multichip(8)``; ``jax.config.update("jax_platforms", "cpu")`` raised
RuntimeError, the old code swallowed it, and the device-count assert fired.
The fix re-execs the dry run in a fresh subprocess with a forced N-device CPU
backend. This test reproduces the exact scenario: a process whose backend is
pinned to ONE CPU device calls dryrun_multichip(8) and must still pass.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SIM = """
import os, jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 1, jax.devices()  # backend now initialized, 1 dev
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("DRYRUN_AFTER_INIT_OK")
"""


def test_dryrun_after_backend_init():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Pin the simulated driver process to exactly one device.
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()
    env.pop("_GIE_DRYRUN_SUBPROCESS", None)
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_SIM],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DRYRUN_AFTER_INIT_OK" in proc.stdout

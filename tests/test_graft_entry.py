"""Driver-entry smoke tests (traceability without heavy compiles)."""
import sys

import pytest

import jax

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out["theta"].shape == (4, 1, 3, 3)
    assert out["consist_score"].shape == (4,)
    assert out["poi"].shape == (4, 52, 2)


def test_dryrun_multichip_importable():
    from __graft_entry__ import dryrun_multichip
    assert callable(dryrun_multichip)


@pytest.mark.full
def test_dryrun_multichip_driver_invocation():
    """Invoke dryrun_multichip(8) exactly the driver's way: a fresh process
    with NO conftest and no device-count XLA flags, where the default
    backend exposes a single device.  dryrun_multichip must self-provision
    its 8-device mesh (subprocess re-exec) rather than assert.

    (Regression: round 1's MULTICHIP check was rc=1 because the mesh
    forcing lived only in ``__main__``/conftest — VERDICT r1 item 1.)
    """
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # Pin the outer process to the (1-device) CPU backend so the test
    # doesn't grab the tunneled TPU; the <8-devices condition it creates is
    # identical to the driver's 1-chip TPU host.
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
        "print('DRIVER_DRYRUN_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       cwd="/root/repo", capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    assert "DRIVER_DRYRUN_OK" in r.stdout
    assert "dryrun shard_map DP ok" in r.stdout
    assert "dryrun GSPMD data x spatial ok" in r.stdout

"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect; pytest imports conftest first, which guarantees that.
Multi-chip sharding tests exercise a Mesh over these 8 virtual devices
(mirrors the driver's dryrun_multichip validation).
"""
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Tests must NOT share the CLIs' persistent .jax_cache (cli/engine.py
# auto-enables it): a cached XLA:CPU AOT executable compiled on a host with
# different CPU features replays with different codegen/reduction order and
# perturbs f32 tails past test tolerances (observed on
# test_serve_multichip).  A per-session tmpdir keeps caching-within-the-run
# (fast repeated jits) without cross-machine replay.
_test_cache = tempfile.mkdtemp(prefix="sfh_test_jax_cache_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _test_cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosting environment force-registers an experimental TPU platform plugin
# that overrides JAX_PLATFORMS; pin the config explicitly after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# set explicitly so cli/engine.py's `is None` check never falls back to the
# repo-level persistent cache
jax.config.update("jax_compilation_cache_dir", _test_cache)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

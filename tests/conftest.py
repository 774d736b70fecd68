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


# ---------------------------------------------------------------------------
# Test tiers.  The whole suite takes 40-70 min on a loaded 1-CPU host, so the
# heavy end-to-end modules are marked ``full`` and SKIPPED by default; the
# default run is the <10-min smoke tier.  Run everything with:
#
#     python -m pytest tests/ --full            (or SFH_FULL_TESTS=1)
#
# and only the full tier with ``-m full --full``.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="also run the heavy 'full'-tier tests (subprocess train runs, "
             "distributed smokes, soak tests; 40-70 min total)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "full: heavy end-to-end test, skipped unless --full or "
                   "SFH_FULL_TESTS=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("SFH_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="full tier: run with --full or SFH_FULL_TESTS=1")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)

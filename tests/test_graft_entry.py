"""Driver-entry smoke tests (traceability without heavy compiles)."""
import sys

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

"""Optimizer parity vs torch.optim (the reference's optimizers).

The reference trains with RMSprop(momentum=0.9) / SGD(momentum=0.9) /
Adam, L2 weight decay coupled into the gradient, and elementwise grad
clipping at 0.1 (``train.py:86-95, 236``).  Verify our optax chains step
identically on synthetic params/grads over multiple iterations.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sports_field_homography_tpu.train.optim import (
    ReduceLROnPlateau, current_learning_rate, make_optimizer,
    set_learning_rate)

LR = 0.01
WD = 1e-4
STEPS = 5


def run_ours(opt_name, params0, grads_seq, clip=0.1):
    opt = make_optimizer(opt_name, LR, WD, grad_clip_value=clip)
    params = {"w": jnp.asarray(params0)}
    state = opt.init(params)
    import optax
    for g in grads_seq:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["w"])


def run_torch(opt_name, params0, grads_seq, clip=0.1):
    p = torch.nn.Parameter(torch.from_numpy(params0.copy()))
    if opt_name == "RMSprop":
        opt = torch.optim.RMSprop([p], lr=LR, weight_decay=WD, momentum=0.9)
    elif opt_name == "SGD":
        opt = torch.optim.SGD([p], lr=LR, weight_decay=WD, momentum=0.9)
    else:
        opt = torch.optim.Adam([p], lr=LR, betas=(0.9, 0.999), weight_decay=WD)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_value_([p], clip)
        opt.step()
    return p.detach().numpy()


@pytest.mark.parametrize("opt_name", ["RMSprop", "SGD", "Adam"])
def test_step_parity_with_torch(opt_name):
    rng = np.random.RandomState(0)
    params0 = rng.randn(32).astype(np.float32)
    grads_seq = [rng.randn(32).astype(np.float32) * 0.3 for _ in range(STEPS)]
    ours = run_ours(opt_name, params0, grads_seq)
    ref = run_torch(opt_name, params0, grads_seq)
    # torch uses g/(sqrt(v)+eps), optax rsqrt(v+eps): identical to ~1e-6
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_grad_clip_applies_before_weight_decay():
    """Large grads must be clipped to 0.1 before the wd term is added,
    matching clip_grad_value_ before optimizer.step()."""
    params0 = np.ones(4, np.float32)
    big = np.full(4, 100.0, np.float32)
    ours = run_ours("SGD", params0, [big])
    ref = run_torch("SGD", params0, [big])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_injected_lr_change_matches_torch_schedule():
    """Changing the injected lr mid-run equals torch's param_group update."""
    import optax

    rng = np.random.RandomState(1)
    params0 = rng.randn(8).astype(np.float32)
    grads = [rng.randn(8).astype(np.float32) for _ in range(4)]

    opt = make_optimizer("SGD", LR, 0.0, grad_clip_value=None)
    params = {"w": jnp.asarray(params0)}
    state = opt.init(params)
    for i, g in enumerate(grads):
        if i == 2:
            state = set_learning_rate(state, LR * 0.1)
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    assert current_learning_rate(state) == pytest.approx(LR * 0.1)

    p = torch.nn.Parameter(torch.from_numpy(params0.copy()))
    topt = torch.optim.SGD([p], lr=LR, momentum=0.9)
    for i, g in enumerate(grads):
        if i == 2:
            for grp in topt.param_groups:
                grp["lr"] = LR * 0.1
        topt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), p.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_plateau_threshold_mode():
    """Relative threshold: tiny improvements still count as bad epochs."""
    s = ReduceLROnPlateau(lr=1.0, patience=1, factor=0.5, threshold=1e-2)
    assert s.step(100.0) == 1.0
    assert s.step(99.95) == 1.0      # <1% improvement: bad epoch 1
    assert s.step(99.90) == 0.5      # bad epoch 2 > patience: reduce

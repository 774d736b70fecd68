"""Optimizers (optax) + plateau LR schedule with torch-matching semantics.

The reference supports RMSprop(momentum=0.9) / SGD(momentum=0.9) / Adam,
all with L2 weight decay coupled into the gradient, elementwise gradient
value clipping at 0.1 and ``ReduceLROnPlateau(patience=3)`` stepped on the
validation reprojection-px metric (``train.py:86-98, 236, 261``).

optax chains are assembled in torch's order: clip -> +wd*p -> moment
machinery -> -lr.  The learning rate is injected as a mutable hyperparam so
the host-side plateau scheduler can change it between steps without
recompilation.
"""
from __future__ import annotations

import optax

__all__ = ["make_optimizer", "set_learning_rate", "current_learning_rate",
           "ReduceLROnPlateau"]


def make_optimizer(opt: str, lr: float, weight_decay: float = 0.0,
                   grad_clip_value: float = 0.1):
    """Build the optax optimizer named like the reference's ``--opt``."""

    def chain(lr_):
        parts = []
        if grad_clip_value is not None:
            parts.append(optax.clip(grad_clip_value))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        if opt == "RMSprop":
            # torch: sq = a*sq + (1-a)*g^2 (a=0.99), u = g/(sqrt(sq)+eps),
            # momentum buffer 0.9
            parts.append(optax.scale_by_rms(decay=0.99, eps=1e-8,
                                             eps_in_sqrt=False))
            parts.append(optax.trace(decay=0.9))
        elif opt == "SGD":
            parts.append(optax.trace(decay=0.9))
        elif opt == "Adam":
            parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        else:
            raise NotImplementedError(
                "optimizer {} does not support yet".format(opt))
        parts.append(optax.scale(-lr_))
        return optax.chain(*parts)

    return optax.inject_hyperparams(chain)(lr_=lr)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["lr_"] = lr
    return opt_state


def current_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["lr_"])


class ReduceLROnPlateau:
    """Host-side twin of ``torch.optim.lr_scheduler.ReduceLROnPlateau``.

    Defaults match torch: mode='min', factor=0.1, threshold=1e-4 (rel),
    cooldown=0, min_lr=0; the reference uses patience=3 (``train.py:98``).
    """

    def __init__(self, lr: float, patience: int = 3, factor: float = 0.1,
                 threshold: float = 1e-4, cooldown: int = 0,
                 min_lr: float = 0.0):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def step(self, metric: float) -> float:
        """Record a validation metric; returns the (possibly reduced) lr."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr

"""Optimizer, LR schedule, and train state — torch-parity optimization math.

Reference: AdamW / SGD with lr+weight_decay hparams (train/train.py:160-163)
and ``MultiStepLR(milestones=[6,12,20,30,35,40], gamma=0.1)`` stepped per
epoch (:168). Here the schedule is a step-indexed piecewise-constant optax
schedule (milestone epoch × steps_per_epoch boundaries).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


def multistep_lr(lr: float, milestones: Sequence[int], gamma: float,
                 steps_per_epoch: int) -> optax.Schedule:
    """torch MultiStepLR parity: lr * gamma^(milestones passed), per epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def make_optimizer(optimizer_name: str, lr: float | optax.Schedule,
                   weight_decay: float) -> optax.GradientTransformation:
    """Adam -> torch AdamW parity; SGD -> torch SGD (no momentum, L2 decay).

    The reference's 'Adam' choice actually builds torch.optim.AdamW
    (train/train.py:161 — decoupled weight decay), and its SGD passes only
    lr/weight_decay (momentum 0, decay as L2 into the gradient).
    """
    if optimizer_name == "Adam":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    if optimizer_name == "SGD":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(lr),
        )
    raise ValueError(f'Unknown optimizer: "{optimizer_name}"')


class EmbedTrainState(train_state.TrainState):
    """TrainState carrying BatchNorm running stats alongside params.

    ``variables`` as consumed by Backbone is reassembled as
    ``{'params': ..., 'batch_stats': ...}`` per sub-tree ('net' and optional
    'stem' — see models/backbone.py).
    """

    batch_stats: Any = struct.field(default=None)

    def backbone_variables(self) -> dict:
        out = {}
        for key, p in self.params.items():          # 'net' / 'stem'
            v = {"params": p}
            if self.batch_stats is not None and key in self.batch_stats:
                v["batch_stats"] = self.batch_stats[key]
            out[key] = v
        return out

    @classmethod
    def from_backbone(cls, backbone, variables: dict, tx) -> "EmbedTrainState":
        params = {k: v["params"] for k, v in variables.items()}
        batch_stats = {k: v["batch_stats"] for k, v in variables.items()
                       if "batch_stats" in v}
        return cls.create(apply_fn=None, params=params, tx=tx,
                          batch_stats=batch_stats or None)


def current_lr(schedule: optax.Schedule, step: int | jax.Array) -> jax.Array:
    return jnp.asarray(schedule(step))

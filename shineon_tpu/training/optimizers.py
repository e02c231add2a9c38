"""Optimizers: Adam + the reference's keep/decay linear LR schedule +
gradient accumulation.

Reference: models/base_model.py:165-184 (Adam, LambdaLR with
decay = 1 - max(0, epoch - keep_epochs)/(decay_epochs + 1)) and
--accumulated_batches -> Lightning accumulate_grad_batches (train.py:107).
Here the schedule is a pure function of the step (epoch = step //
steps_per_epoch, static shapes, no Python in the jitted path) and
accumulation is optax.MultiSteps.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def keep_decay_schedule(
    base_lr: float, keep_epochs: int, decay_epochs: int, steps_per_epoch: int
):
    """LR(step): constant for keep_epochs, then linear decay over decay_epochs."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        decrease = jnp.maximum(0, epoch - keep_epochs) / float(decay_epochs + 1)
        return base_lr * (1.0 - decrease)

    return schedule


def make_optimizer(
    lr: float,
    keep_epochs: int = 5,
    decay_epochs: int = 5,
    steps_per_epoch: int = 1,
    accumulate: int = 1,
) -> optax.GradientTransformation:
    schedule = keep_decay_schedule(lr, keep_epochs, decay_epochs, steps_per_epoch)
    tx = optax.adam(learning_rate=schedule)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx

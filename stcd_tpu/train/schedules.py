"""Learning-rate schedules as optax-compatible functions of the global step.

Parity targets:
- poly_schedule <- the Poly scheduler triplicated in train_sup.py:269-286 /
  train_pse_cd.py:385-402 / train_stcd.py:596-613. The reference steps the
  scheduler every iteration with ``step(epoch-1)`` so the effective factor
  is ``(1 - T/N)^0.9`` with T = global iteration, N = epochs*iters_per_epoch;
  warmup_epochs>0 gives a linear warmup on the first warmup_iters.
- get_scheduler policies <- models/networks.py:26-57 (linear/step/
  exponential, epoch-granularity).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def poly_schedule(base_lr: float, num_epochs: int, iters_per_epoch: int,
                  power: float = 0.9, warmup_epochs: int = 0) -> optax.Schedule:
    total = num_epochs * iters_per_epoch
    warmup_iters = warmup_epochs * iters_per_epoch

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        factor = jnp.power(jnp.maximum(1.0 - t / total, 0.0), power)
        if warmup_iters > 0:
            factor = jnp.where(t < warmup_iters, t / warmup_iters, factor)
        return base_lr * factor

    return schedule


def linear_decay_schedule(base_lr: float, max_epochs: int,
                          iters_per_epoch: int) -> optax.Schedule:
    """ref networks.py:40-43: factor = 1 - epoch/(max_epochs+1)."""

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / iters_per_epoch)
        return base_lr * (1.0 - epoch / float(max_epochs + 1))

    return schedule


def step_schedule(base_lr: float, lr_decay_iters: int, iters_per_epoch: int,
                  gamma: float = 0.5) -> optax.Schedule:
    """ref networks.py:44-47: StepLR(step_size=lr_decay_iters, gamma=0.5)."""

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / iters_per_epoch)
        return base_lr * jnp.power(gamma, jnp.floor(epoch / lr_decay_iters))

    return schedule


def exponential_schedule(base_lr: float, iters_per_epoch: int,
                         gamma: float = 0.95) -> optax.Schedule:
    """ref networks.py:48-49: ExponentialLR(0.95) per epoch."""

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / iters_per_epoch)
        return base_lr * jnp.power(gamma, epoch)

    return schedule


def get_scheduler(lr_policy, base_lr: float, iters_per_epoch: int,
                  max_epochs: int = 100, lr_decay_iters: int = 50) -> optax.Schedule:
    """Factory keyed like the reference (ref networks.py:26-57)."""
    if lr_policy == "linear":
        return linear_decay_schedule(base_lr, max_epochs, iters_per_epoch)
    if lr_policy == "step":
        return step_schedule(base_lr, lr_decay_iters, iters_per_epoch)
    if lr_policy == "exponential":
        return exponential_schedule(base_lr, iters_per_epoch)
    if lr_policy == "poly":
        return poly_schedule(base_lr, max_epochs, iters_per_epoch)
    if lr_policy is None:
        return lambda step: base_lr
    raise NotImplementedError(f"learning rate policy [{lr_policy}] is not implemented")

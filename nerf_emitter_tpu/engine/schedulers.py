"""LR schedules.

Re-design of nerfstudio/engine/schedulers.py:147-192
(ExponentialDecayStepScheduler): exponential decay from lr_init to lr_final
over max_steps, with an optional hard x`lr_lambda` drop at `step_pretrain`
(the takeover step — field/proposal LR fall x0.01 when the SDF phase starts,
reference method_configs.py:331-341). Expressed as optax schedule functions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def exponential_decay_schedule(
    lr_init: float,
    lr_final: Optional[float] = None,
    max_steps: int = 100000,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
    step_pretrain: Optional[int] = None,
    lr_lambda: float = 1.0,
):
    """Returns f(step) -> lr."""
    lr_fin = lr_init if lr_final is None else lr_final

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0.0, 1.0)
            )
        else:
            warm = jnp.asarray(lr_init)
        t = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        lr = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_fin) * t)
        lr = jnp.where(step < warmup_steps, warm, lr)
        if step_pretrain is not None:
            lr = jnp.where(step >= step_pretrain, lr * lr_lambda, lr)
        return lr

    return schedule


def proposal_anneal_schedule(anneal_steps: int = 1000, slope: float = 10.0):
    """Nerfacto proposal-weights annealing: bias(clip(step/N), slope)."""

    def schedule(step):
        x = jnp.clip(jnp.asarray(step, jnp.float32) / max(anneal_steps, 1), 0.0, 1.0)
        return slope * x / ((slope - 1.0) * x + 1.0)

    return schedule

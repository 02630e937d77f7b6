"""Per-group optimizers.

Re-design of nerfstudio/engine/optimizers.py (AdamOptimizerConfig with
max_norm/max_value grad clipping, :42-45,:122-147) on optax: one
`optax.multi_transform` whose labels are the top-level flax param
collections ("field", "proposal_*", "camera_opt", ...), each group an
adam chain with its own LR schedule and clipping. AMP GradScaler machinery
is unnecessary: compute runs bf16 with float32 master weights, no loss
scaling needed on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import optax

from .schedulers import exponential_decay_schedule


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    lr: float = 1e-2
    eps: float = 1e-15
    lr_final: Optional[float] = None
    max_steps: int = 100000
    warmup_steps: int = 0
    max_norm: Optional[float] = None
    max_value: Optional[float] = None
    step_pretrain: Optional[int] = None
    lr_lambda: float = 1.0
    weight_decay: float = 0.0

    def build(self) -> optax.GradientTransformation:
        schedule = exponential_decay_schedule(
            self.lr,
            self.lr_final,
            self.max_steps,
            self.warmup_steps,
            step_pretrain=self.step_pretrain,
            lr_lambda=self.lr_lambda,
        )
        parts = []
        if self.max_value is not None:
            parts.append(optax.clip(self.max_value))
        if self.max_norm is not None:
            parts.append(optax.clip_by_global_norm(self.max_norm))
        if self.weight_decay > 0:
            parts.append(optax.add_decayed_weights(self.weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=self.eps))
        parts.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*parts)


def build_optimizer(
    group_configs: dict[str, OptimizerGroupConfig],
    label_fn: Callable,
) -> optax.GradientTransformation:
    """group_configs: name -> config; label_fn(params) -> same-structure
    pytree of group names."""
    transforms = {name: cfg.build() for name, cfg in group_configs.items()}
    return optax.multi_transform(transforms, label_fn)


def label_params_by_prefix(params, default: str = "fields") -> dict:
    """Label top-level flax collections: proposal_* -> 'proposal_networks',
    camera_opt -> 'camera_opt', everything else -> 'fields'."""

    def label_of(name: str) -> str:
        if name.startswith("proposal"):
            return "proposal_networks"
        if name.startswith("camera_opt") or name.startswith("rotation_opt"):
            return "camera_opt"
        return default

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_of(str(path[1].key) if len(path) > 1 else ""), params
    )

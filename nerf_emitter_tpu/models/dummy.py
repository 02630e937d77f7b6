"""DummyModel: metrics-only placeholder for SDF-only baselines.

Re-design of nerfstudio/models/dummy_model.py (:36-119): the sdf-gt-envmap
baseline optimizes the SDF under a known envmap and needs no radiance
field; the model exists only so the pipeline/eval plumbing has something to
call. Here it returns zeros for radiance and computes eval metrics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..cameras.rays import RayBundle
from ..engine.train_loop import eval_image_metrics


class DummyModel(nn.Module):
    """Zero radiance everywhere; a single throwaway parameter keeps optax
    group machinery shape-compatible."""

    @nn.compact
    def __call__(self, ray_bundle: RayBundle, **kwargs) -> dict:
        _ = self.param("unused", lambda k: jnp.zeros((1,)))
        n = ray_bundle.origins.shape[:-1]
        return {
            "rgb": jnp.zeros((*n, 3)),
            "depth": jnp.zeros((*n, 1)),
            "accumulation": jnp.zeros((*n, 1)),
        }

    @staticmethod
    def get_image_metrics(pred: jax.Array, gt: jax.Array, is_hdr: bool = True) -> dict:
        return eval_image_metrics(pred, gt, is_hdr=is_hdr)

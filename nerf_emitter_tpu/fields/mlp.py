"""MXU-friendly MLP blocks.

Replaces tiny-cuda-nn's fully-fused CUDA MLP
(nerfstudio/field_components/mlp.py:68-140): on TPU, a batched bf16 matmul
chain IS the fused MLP — XLA fuses the elementwise activations into the MXU
epilogue; nothing to hand-schedule at these widths (64) beyond keeping the
batch dimension large and padding-friendly.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """Plain MLP: num_layers total Dense layers, hidden width layer_width.

    compute_dtype=bfloat16 keeps the matmuls on the MXU fast path; params
    stay float32 (master weights) and the output is cast back to float32.
    """

    out_dim: int
    num_layers: int = 3
    layer_width: int = 64
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.layer_width, dtype=self.compute_dtype, name=f"hidden_{i}")(x)
            x = self.activation(x)
        x = nn.Dense(self.out_dim, dtype=self.compute_dtype, name="out")(x)
        x = x.astype(jnp.float32)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x

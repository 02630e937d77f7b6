"""nerf_emitter_tpu: TPU-native inverse rendering with a NeRF as a non-distant emitter.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
gerwang/nerf-emitter (arXiv 2402.04829): HDR nerfacto radiance fields,
a differentiable SDF renderer with reparameterized silhouette gradients,
and the NeRF-as-emitter bridge — all as one sharded JAX program.
"""

__version__ = "0.1.0"

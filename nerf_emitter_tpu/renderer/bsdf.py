"""BSDFs: Lambertian diffuse + principled (GGX microfacet) with voxel-grid
spatially-varying parameters.

Re-design of the Mitsuba `diffuse`/`principled` BSDFs used by the reference
scene templates (diff-sdf assets/objects/{diffuse,principled}_mesh.xml,
SURVEY.md §2.3) as pure-JAX eval/sample/pdf functions over batched shading
frames. Albedo/roughness live in Grid3d volumes (the reference's
VolumeVariable textures).

Conventions: all directions point AWAY from the surface point; `wi` is the
(negated) viewing direction, `wo` the light direction; frames are world
space with shading normal n.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import normalize as _normalize

INV_PI = 1.0 / jnp.pi


def _orthonormal_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Branchless ONB (Duff et al.) for (..., 3) normals -> (t, b)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(n: jax.Array, local: jax.Array) -> jax.Array:
    t, b = _orthonormal_basis(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def cosine_sample_hemisphere(key: jax.Array, n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Cosine-weighted direction about n; returns (dir, pdf)."""
    u = jax.random.uniform(key, (*n.shape[:-1], 2))
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))],
        axis=-1,
    )
    d = to_world(n, local)
    pdf = jnp.maximum(local[..., 2], 1e-8) * INV_PI
    return d, pdf


# ---------------------------------------------------------------------------
# diffuse
# ---------------------------------------------------------------------------


def diffuse_eval(albedo: jax.Array, n: jax.Array, wo: jax.Array) -> jax.Array:
    """f_r * cos(theta_o): (..., 3). Zero below the horizon."""
    cos_o = jnp.sum(n * wo, axis=-1, keepdims=True)
    return albedo * INV_PI * jnp.maximum(cos_o, 0.0)


def diffuse_pdf(n: jax.Array, wo: jax.Array) -> jax.Array:
    return jnp.maximum(jnp.sum(n * wo, axis=-1), 0.0) * INV_PI


# ---------------------------------------------------------------------------
# GGX principled (isotropic, dielectric-ish: diffuse base + GGX specular)
# ---------------------------------------------------------------------------


def _ggx_d(n_dot_h: jax.Array, alpha: jax.Array) -> jax.Array:
    a2 = alpha * alpha
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-9)


def _smith_g1(n_dot_v: jax.Array, alpha: jax.Array) -> jax.Array:
    a2 = alpha * alpha
    return 2.0 * n_dot_v / jnp.maximum(
        n_dot_v + jnp.sqrt(a2 + (1.0 - a2) * n_dot_v * n_dot_v), 1e-9
    )


def _fresnel_schlick(cos_t: jax.Array, f0: float = 0.04) -> jax.Array:
    return f0 + (1.0 - f0) * (1.0 - jnp.clip(cos_t, 0.0, 1.0)) ** 5


def principled_eval(
    albedo: jax.Array,
    roughness: jax.Array,
    n: jax.Array,
    wi: jax.Array,
    wo: jax.Array,
) -> jax.Array:
    """(diffuse + GGX specular) * cos_o. albedo (...,3), roughness (...,1)."""
    cos_i = jnp.maximum(jnp.sum(n * wi, axis=-1, keepdims=True), 1e-6)
    cos_o = jnp.sum(n * wo, axis=-1, keepdims=True)
    valid = cos_o > 0.0
    cos_o_c = jnp.maximum(cos_o, 1e-6)

    h = wi + wo
    h = _normalize(h)
    n_dot_h = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    h_dot_o = jnp.maximum(jnp.sum(h * wo, axis=-1, keepdims=True), 0.0)

    alpha = jnp.clip(roughness, 0.02, 1.0) ** 2
    d = _ggx_d(n_dot_h, alpha)
    g = _smith_g1(cos_i, alpha) * _smith_g1(cos_o_c, alpha)
    f = _fresnel_schlick(h_dot_o)
    spec = d * g * f / jnp.maximum(4.0 * cos_i * cos_o_c, 1e-9)

    diff = albedo * INV_PI
    return jnp.where(valid, (diff + spec) * cos_o_c, 0.0)


def principled_pdf(
    roughness: jax.Array, n: jax.Array, wi: jax.Array, wo: jax.Array
) -> jax.Array:
    """MIS pdf of the 50/50 cosine+GGX sampling below."""
    cos_o = jnp.maximum(jnp.sum(n * wo, axis=-1), 0.0)
    pdf_diff = cos_o * INV_PI
    h = wi + wo
    h = _normalize(h)
    n_dot_h = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    h_dot_o = jnp.maximum(jnp.sum(h * wo, axis=-1), 1e-6)
    alpha = jnp.clip(roughness[..., 0], 0.02, 1.0) ** 2
    pdf_spec = _ggx_d(n_dot_h, alpha) * n_dot_h / (4.0 * h_dot_o)
    return 0.5 * pdf_diff + 0.5 * pdf_spec


def principled_sample(
    key: jax.Array,
    roughness: jax.Array,
    n: jax.Array,
    wi: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Sample wo by a 50/50 mixture of cosine and GGX-NDF sampling.
    Returns (wo, pdf)."""
    k1, k2, k3 = jax.random.split(key, 3)
    # cosine branch
    d_cos, _ = cosine_sample_hemisphere(k1, n)
    # GGX branch: sample half vector
    u = jax.random.uniform(k2, (*n.shape[:-1], 2))
    alpha = jnp.clip(roughness[..., 0], 0.02, 1.0) ** 2
    phi = 2.0 * jnp.pi * u[..., 1]
    cos_t2 = (1.0 - u[..., 0]) / (u[..., 0] * (alpha * alpha - 1.0) + 1.0)
    cos_t = jnp.sqrt(jnp.clip(cos_t2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t2, 0.0, 1.0))
    h_local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
    h = to_world(n, h_local)
    d_spec = 2.0 * jnp.sum(wi * h, axis=-1, keepdims=True) * h - wi

    pick_spec = jax.random.uniform(k3, n.shape[:-1]) < 0.5
    wo = jnp.where(pick_spec[..., None], d_spec, d_cos)
    pdf = principled_pdf(roughness, n, wi, wo)
    return wo, jnp.maximum(pdf, 1e-8)

"""Emitters: equirect environment map and vMF mixture.

Re-design of the diff-sdf emitter plugins (SURVEY.md §2.3):
- `dataset_env.xml` envmap emitter -> `EnvmapEmitter`: equirect radiance
  lookup + 2D-CDF importance sampling (eval/sample/pdf), differentiable wrt
  the texel values (the sdf-gt-envmap baseline optimizes nothing here but
  relighting swaps it).
- `vMF.py` von-Mises-Fisher mixture emitter -> `VMFMixture`: the path-
  guiding proposal with traversable position/weight/std params
  (vmf_guiding.py:52-57); used for one-sample-MIS emitter sampling with
  optional MIS compensation.
- The NeRF emitter itself is function composition at the integrator level
  (models/nerfacto.py radiance query), not a plugin.

Directions use the WORLD frame; the equirect parameterization is
(theta from +y pole, phi around y) matching cameras.EQUIRECTANGULAR.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..utils.math import normalize as _normalize


# ---------------------------------------------------------------------------
# equirect envmap
# ---------------------------------------------------------------------------


def dir_to_equirect(d: jax.Array) -> jax.Array:
    """(..., 3) unit dirs -> (u, v) in [0,1]^2 (u ~ phi, v ~ theta)."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))  # from +y
    phi = jnp.arctan2(d[..., 0], -d[..., 2])  # 0 at -z, matching camera
    u = phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    return jnp.stack([u, v], axis=-1)


def equirect_to_dir(uv: jax.Array) -> jax.Array:
    phi = (uv[..., 0] - 0.5) * 2.0 * jnp.pi
    theta = uv[..., 1] * jnp.pi
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], axis=-1
    )


@struct.dataclass
class EnvmapEmitter:
    """image: (H, W, 3) linear radiance; sampling tables precomputed."""

    image: jax.Array
    row_cdf: jax.Array  # (H,) cdf over rows (sin-weighted luminance)
    cond_cdf: jax.Array  # (H, W) cdf along each row

    @staticmethod
    def create(image: jax.Array) -> "EnvmapEmitter":
        h, w = image.shape[:2]
        lum = jnp.mean(image, axis=-1)  # (H, W)
        theta = (jnp.arange(h) + 0.5) / h * jnp.pi
        weights = lum * jnp.sin(theta)[:, None] + 1e-9
        row_w = jnp.sum(weights, axis=1)
        row_cdf = jnp.cumsum(row_w) / jnp.sum(row_w)
        cond_cdf = jnp.cumsum(weights, axis=1) / jnp.sum(weights, axis=1, keepdims=True)
        return EnvmapEmitter(image=image, row_cdf=row_cdf, cond_cdf=cond_cdf)

    def eval(self, d: jax.Array) -> jax.Array:
        """Radiance along (..., 3) world directions (bilinear lookup)."""
        h, w = self.image.shape[:2]
        uv = dir_to_equirect(d)
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.mod(x0.astype(jnp.int32), w)
        x1i = jnp.mod(x0i + 1, w)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        img = self.image
        c = (
            img[y0i, x0i] * (1 - fx) * (1 - fy)
            + img[y0i, x1i] * fx * (1 - fy)
            + img[y1i, x0i] * (1 - fx) * fy
            + img[y1i, x1i] * fx * fy
        )
        return c

    def pdf(self, d: jax.Array) -> jax.Array:
        """Solid-angle pdf of `sample` for (..., 3) dirs."""
        h, w = self.image.shape[:2]
        uv = dir_to_equirect(d)
        xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        row_pdf = self.row_cdf - jnp.concatenate([jnp.zeros(1), self.row_cdf[:-1]])
        cond_pdf = self.cond_cdf - jnp.concatenate(
            [jnp.zeros((h, 1)), self.cond_cdf[:, :-1]], axis=1
        )
        p_texel = row_pdf[yi] * cond_pdf[yi, xi]  # prob of texel
        theta = (yi.astype(jnp.float32) + 0.5) / h * jnp.pi
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        jac = (2.0 * jnp.pi / w) * (jnp.pi / h) * sin_t  # texel solid angle
        return p_texel / jac

    def sample(self, key: jax.Array, shape: tuple) -> tuple[jax.Array, jax.Array]:
        """Importance-sample directions; returns (dirs (*shape, 3), pdf)."""
        h, w = self.image.shape[:2]
        k1, k2, k3 = jax.random.split(key, 3)
        u_row = jax.random.uniform(k1, shape)
        yi = jnp.clip(jnp.searchsorted(self.row_cdf, u_row), 0, h - 1)
        u_col = jax.random.uniform(k2, shape)
        cdf_rows = self.cond_cdf[yi]  # (*shape, W)
        xi = jnp.clip(
            jnp.sum((cdf_rows < u_col[..., None]).astype(jnp.int32), axis=-1), 0, w - 1
        )
        jitter = jax.random.uniform(k3, (*shape, 2))
        uv = jnp.stack(
            [(xi + jitter[..., 0]) / w, (yi + jitter[..., 1]) / h], axis=-1
        )
        d = equirect_to_dir(uv)
        return d, self.pdf(d)


# ---------------------------------------------------------------------------
# vMF mixture (path-guiding proposal)
# ---------------------------------------------------------------------------


@struct.dataclass
class VMFMixture:
    """K lobes. Directions are sampled toward `positions` as seen from a
    shading point; std controls concentration (kappa ~ 1/std^2)."""

    positions: jax.Array  # (K, 3) world-space cluster centers
    weights: jax.Array  # (K,) mixture weights (unnormalized)
    stds: jax.Array  # (K,) angular std in radians

    def _lobe_dirs(self, x: jax.Array) -> jax.Array:
        """(N, 3) shading points -> (N, K, 3) unit dirs to each lobe."""
        v = self.positions[None, :, :] - x[:, None, :]
        return _normalize(v)

    def _kappas(self) -> jax.Array:
        return 1.0 / jnp.maximum(self.stds**2, 1e-6)

    def pdf(self, x: jax.Array, d: jax.Array) -> jax.Array:
        """Mixture pdf of (N, 3) dirs at (N, 3) points."""
        mu = self._lobe_dirs(x)  # (N, K, 3)
        kappa = self._kappas()[None, :]  # (1, K)
        cos = jnp.sum(mu * d[:, None, :], axis=-1)
        # vMF: kappa/(4 pi sinh(kappa)) exp(kappa cos) — computed stably:
        # log c = log kappa - log(2 pi) - kappa - log1p(-exp(-2 kappa))
        log_c = (
            jnp.log(kappa)
            - jnp.log(2.0 * jnp.pi)
            - jnp.log1p(-jnp.exp(-2.0 * kappa) + 1e-12)
        )
        lobe_pdf = jnp.exp(log_c + kappa * (cos - 1.0))
        w = self.weights / jnp.maximum(jnp.sum(self.weights), 1e-12)
        return jnp.sum(w[None, :] * lobe_pdf, axis=-1)

    def sample(self, key: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Sample one direction per point (N, 3); returns (dirs, pdf)."""
        n = x.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        w = self.weights / jnp.maximum(jnp.sum(self.weights), 1e-12)
        comp = jax.random.categorical(k1, jnp.log(w + 1e-12)[None, :].repeat(n, 0))
        mu = self._lobe_dirs(x)[jnp.arange(n), comp]  # (N, 3)
        kappa = self._kappas()[comp]
        # sample cos angle: W = 1 + log(u + (1-u) e^{-2 kappa}) / kappa
        u = jax.random.uniform(k2, (n,))
        cos_t = 1.0 + jnp.log(u + (1.0 - u) * jnp.exp(-2.0 * kappa) + 1e-38) / kappa
        cos_t = jnp.clip(cos_t, -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        phi = 2.0 * jnp.pi * jax.random.uniform(k3, (n,))
        from .bsdf import to_world

        local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], -1)
        d = to_world(mu, local)
        return d, jnp.maximum(self.pdf(x, d), 1e-9)

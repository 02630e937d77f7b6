"""Grid3d: trilinearly-interpolated voxel grids on [0,1]^3.

Re-design of the diff-sdf submodule's `shapes.Grid3d` (reconstructed in
SURVEY.md §2.3: trilinear SDF grid with `.eval(point)`) and its
SdfVariable/VolumeVariable voxel parameters. A grid is just a jnp array
(R, R, R, C) — fully differentiable wrt both values (gather transpose =
scatter-add) and query points (analytic trilinear gradient), so jax.grad
replaces Dr.Jit's AD.

TPU notes: the 8-corner gather per query is the same dataflow as the hash
encoding; XLA emits one fused gather. Upsampling (the reference's
render_upsample_iter schedule) is `jax.image.resize` trilinear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(values: jax.Array, points: jax.Array) -> jax.Array:
    """Trilinear sample. values: (Rx, Ry, Rz, C); points: (..., 3) in [0,1].

    Grid nodes sit at coordinates i/(R-1) (cell-vertex convention); points
    outside [0,1] are clamped (matching a clamp-to-edge volume texture).
    """
    rx, ry, rz, _ = values.shape
    res = jnp.asarray([rx - 1, ry - 1, rz - 1], jnp.float32)
    p = jnp.clip(points, 0.0, 1.0) * res
    p0 = jnp.clip(jnp.floor(p), 0.0, res - 1.0)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray([rx - 1, ry - 1, rz - 1], jnp.int32))

    def at(ix, iy, iz):
        return values[ix, iy, iz]

    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    c000 = at(i0[..., 0], i0[..., 1], i0[..., 2])
    c001 = at(i0[..., 0], i0[..., 1], i1[..., 2])
    c010 = at(i0[..., 0], i1[..., 1], i0[..., 2])
    c011 = at(i0[..., 0], i1[..., 1], i1[..., 2])
    c100 = at(i1[..., 0], i0[..., 1], i0[..., 2])
    c101 = at(i1[..., 0], i0[..., 1], i1[..., 2])
    c110 = at(i1[..., 0], i1[..., 1], i0[..., 2])
    c111 = at(i1[..., 0], i1[..., 1], i1[..., 2])

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sdf_eval(sdf: jax.Array, points: jax.Array) -> jax.Array:
    """SDF value at points: sdf (R, R, R) or (R, R, R, 1) -> (...)."""
    v = sdf if sdf.ndim == 4 else sdf[..., None]
    return grid_sample(v, points)[..., 0]


def sdf_eval_nearest(sdf: jax.Array, points: jax.Array) -> jax.Array:
    """Nearest-node SDF value — ONE flat gather per point instead of the
    8-corner trilinear (the TPU gather budget is the sphere tracer's
    bottleneck; see docs/DESIGN.md §2). Error bound: half the voxel
    diagonal for a unit-Lipschitz SDF."""
    g = sdf[..., 0] if sdf.ndim == 4 else sdf
    r = g.shape[0]
    p = jnp.clip(points, 0.0, 1.0) * (r - 1)
    i = jnp.clip(jnp.round(p), 0, r - 1).astype(jnp.int32)
    flat = (i[..., 0] * r + i[..., 1]) * r + i[..., 2]
    return jnp.take(g.reshape(-1), flat, axis=0)


def sdf_normal(sdf: jax.Array, points: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit surface normal = normalized spatial gradient of the SDF.

    NaN-safe normalization: at clamped/flat points the trilinear gradient is
    exactly zero, and `g / max(|g|, eps)` still produces NaN in the BACKWARD
    pass (the vjp of |g| at g=0 is 0/0, and 0-cotangent times NaN is NaN).
    rsqrt(max(g.g, eps)) routes the zero-gradient branch through `max`,
    which kills the cotangent instead.
    """
    g = sdf_gradient(sdf, points)
    n2 = jnp.sum(g * g, axis=-1, keepdims=True)
    return g * jax.lax.rsqrt(jnp.maximum(n2, eps))


def sdf_gradient(sdf: jax.Array, points: jax.Array) -> jax.Array:
    """Analytic gradient of the trilinear interpolant at points (..., 3)."""

    def f(p):
        return jnp.sum(sdf_eval(sdf, p))

    # forward-over-sum: each point only influences its own output, so the
    # gradient of the sum equals the per-point gradient.
    return jax.grad(f)(points)


def upsample_grid(values: jax.Array, new_res: int) -> jax.Array:
    """Node-aligned trilinear upsample (Rx,Ry,Rz,C) -> (new,new,new,C) — the
    voxel upsample schedule of the reference opt configs. Node-aligned
    (align_corners) so the interpolated field is unchanged at shared nodes
    (jax.image.resize is half-pixel-centered, which would shift the
    surface)."""
    xs = jnp.linspace(0.0, 1.0, new_res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    return grid_sample(values, pts).reshape(
        new_res, new_res, new_res, values.shape[-1]
    )


def sphere_sdf_grid(res: int, radius: float = 0.3, center=(0.5, 0.5, 0.5)) -> jax.Array:
    """Initial SDF voxel: sphere (the reference's mi_create_cube_sdf analogue
    for a sphere init)."""
    xs = jnp.linspace(0.0, 1.0, res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1)
    d = jnp.linalg.norm(pts - jnp.asarray(center), axis=-1) - radius
    return d[..., None]


def box_sdf_grid(res: int, half_extent: float = 0.3, center=(0.5, 0.5, 0.5)) -> jax.Array:
    xs = jnp.linspace(0.0, 1.0, res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1) - jnp.asarray(center)
    q = jnp.abs(pts) - half_extent
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return (outside + inside)[..., None]


def composite_sdf_grid(res: int, center=(0.5, 0.5, 0.5)) -> jax.Array:
    """Non-trivial ground-truth object for E2E recovery tests: a smooth
    union of a sphere and a tilted box, with a cylindrical bore. Sharp
    edges + a through-hole concavity exercise exactly what a sphere/box
    cannot: silhouette gradients at creases and occluded interior surfaces
    (the role of the reference's mesh-derived .vol test objects)."""
    xs = jnp.linspace(0.0, 1.0, res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1) - jnp.asarray(center)

    sph = jnp.linalg.norm(pts - jnp.asarray([-0.05, 0.02, 0.0]), axis=-1) - 0.15

    # box rotated 30 deg about y
    a = jnp.deg2rad(30.0)
    c, s = jnp.cos(a), jnp.sin(a)
    p = pts - jnp.asarray([0.07, -0.03, 0.0])
    pb = jnp.stack(
        [c * p[..., 0] + s * p[..., 2], p[..., 1],
         -s * p[..., 0] + c * p[..., 2]], -1,
    )
    q = jnp.abs(pb) - jnp.asarray([0.13, 0.10, 0.11])
    box = (
        jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        + jnp.minimum(jnp.max(q, axis=-1), 0.0)
    )

    k = 24.0  # smooth-union sharpness (1/k blend radius)
    union = -jnp.log(jnp.exp(-k * sph) + jnp.exp(-k * box)) / k

    # cylindrical bore along z through the sphere lobe
    cyl = (
        jnp.linalg.norm(pts[..., :2] - jnp.asarray([-0.05, 0.02]), axis=-1)
        - 0.055
    )
    d = jnp.maximum(union, -cyl)
    return d[..., None]

"""Mesh -> SDF voxel conversion CLI.

Re-design of nerfstudio/scripts/convert_mesh_to_sdf.py (:30-64, backed by
the submodule's mesh_to_sdf.create_sdf): voxelize a triangle mesh into a
signed distance grid. Unsigned distance via vmapped point-triangle
distance in JAX; sign via ray-parity (even-odd crossings along +x).

  python -m nerf_emitter_tpu.scripts.convert_mesh_to_sdf \
      mesh.obj --resolution 128 --out sdf.npy
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def point_triangle_distance_batch(pts, tri):
    """pts (P,3), tri (T,3,3) -> (P,) min distance over triangles (JAX)."""
    import jax
    import jax.numpy as jnp

    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    ab = b - a
    ac = c - a

    @jax.jit
    def min_dist(p):
        ap = p - a
        d1 = jnp.sum(ab * ap, -1)
        d2 = jnp.sum(ac * ap, -1)
        bp = p - b
        d3 = jnp.sum(ab * bp, -1)
        d4 = jnp.sum(ac * bp, -1)
        cp = p - c
        d5 = jnp.sum(ab * cp, -1)
        d6 = jnp.sum(ac * cp, -1)
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        denom = jnp.maximum(va + vb + vc, 1e-12)
        v = jnp.clip(vb / denom, 0.0, 1.0)
        w = jnp.clip(vc / denom, 0.0, 1.0)
        # interior closest point
        q_in = a + v[:, None] * ab + w[:, None] * ac
        # edge/vertex clamps
        t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-12), 0.0, 1.0)
        q_ab = a + t_ab[:, None] * ab
        t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-12), 0.0, 1.0)
        q_ac = a + t_ac[:, None] * ac
        bc = c - b
        t_bc = jnp.clip(
            jnp.sum(bc * (p - b), -1) / jnp.maximum(jnp.sum(bc * bc, -1), 1e-12),
            0.0, 1.0,
        )
        q_bc = b + t_bc[:, None] * bc
        cands = jnp.stack([q_in, q_ab, q_ac, q_bc], 0)  # (4, T, 3)
        d_all = jnp.min(jnp.linalg.norm(cands - p, axis=-1), axis=0)
        return jnp.min(d_all)

    import jax

    return jax.lax.map(min_dist, pts, batch_size=256)


def sign_by_parity(pts, verts, faces):
    """Even-odd ray crossing along +x (numpy, vectorized over triangles)."""
    tri = verts[faces]
    signs = np.ones(len(pts), np.float32)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    for i, p in enumerate(pts):
        # Moller-Trumbore along +x
        d = np.array([1.0, 0.0, 0.0])
        e1 = b - a
        e2 = c - a
        pv = np.cross(d, e2)
        det = np.einsum("td,td->t", e1, pv)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = p - a
        u = np.einsum("td,td->t", tv, pv) * inv
        qv = np.cross(tv, e1)
        v = (qv @ d) * inv
        t = np.einsum("td,td->t", e2, qv) * inv
        hits = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        if hits.sum() % 2 == 1:
            signs[i] = -1.0
    return signs


def main(argv=None):
    ap = argparse.ArgumentParser(prog="convert_mesh_to_sdf")
    ap.add_argument("mesh", type=Path)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--offset", type=float, default=0.0,
                    help="subtract from distances (dilate surface)")
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..exporter.marching_cubes import read_ply_or_obj

    verts, faces = read_ply_or_obj(args.mesh)
    r = args.resolution
    xs = np.linspace(0, 1, r, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    dist = np.asarray(
        point_triangle_distance_batch(jnp.asarray(pts), jnp.asarray(verts[faces]))
    )
    sign = sign_by_parity(pts, verts, faces)
    sdf = (sign * dist - args.offset).reshape(r, r, r, 1).astype(np.float32)

    from ..renderer.optimize import redistance

    sdf = np.asarray(redistance(jnp.asarray(sdf), n_iters=2 * r))
    np.save(args.out, sdf)
    print(f"wrote {args.out} ({r}^3)")


if __name__ == "__main__":
    main()

"""Chamfer-distance CLI: geometry accuracy metric between two meshes.

Re-design of nerfstudio/scripts/chamfer.py (:35-145, backed by the CUDA
chamferdist wheel): sample points on both meshes (area-weighted), compute
symmetric chamfer distance with a vmapped nearest-neighbor in JAX, with
the reference's clipping / largest-component options.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def sample_mesh_points(
    verts: np.ndarray, faces: np.ndarray, n_points: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform surface sampling."""
    rng = np.random.default_rng(seed)
    tri = verts[faces]  # (F, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    p = area / max(area.sum(), 1e-12)
    idx = rng.choice(len(faces), n_points, p=p)
    u = rng.random((n_points, 1))
    v = rng.random((n_points, 1))
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    t = tri[idx]
    return (t[:, 0] * (1 - u - v) + t[:, 1] * u + t[:, 2] * v).astype(np.float32)


def chamfer_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric mean squared chamfer distance between point sets."""
    import jax
    import jax.numpy as jnp

    aj, bj = jnp.asarray(a), jnp.asarray(b)

    @jax.jit
    def one_way(x, y):
        def min_d(q):
            return jnp.min(jnp.sum((y - q) ** 2, axis=-1))

        return jnp.mean(jax.lax.map(min_d, x, batch_size=chunk))

    return float(one_way(aj, bj) + one_way(bj, aj))


def largest_component(verts: np.ndarray, faces: np.ndarray):
    """Keep only the largest connected component (reference option)."""
    parent = np.arange(len(verts))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for tri in faces:
        a = find(tri[0])
        for k in (1, 2):
            b = find(tri[k])
            if a != b:
                parent[b] = a
    roots = np.array([find(i) for i in range(len(verts))])
    vals, counts = np.unique(roots, return_counts=True)
    keep_root = vals[np.argmax(counts)]
    keep = roots == keep_root
    remap = -np.ones(len(verts), np.int64)
    remap[keep] = np.arange(keep.sum())
    fmask = keep[faces].all(axis=1)
    return verts[keep], remap[faces[fmask]].astype(np.int32)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="chamfer")
    ap.add_argument("mesh_a", type=Path)
    ap.add_argument("mesh_b", type=Path)
    ap.add_argument("--n-points", type=int, default=2_500_000 // 10)
    ap.add_argument("--clip-min", type=float, nargs=3, default=None)
    ap.add_argument("--clip-max", type=float, nargs=3, default=None)
    ap.add_argument("--largest-component", action="store_true")
    ap.add_argument("--output-path", type=Path, default=None)
    args = ap.parse_args(argv)

    from ..exporter.marching_cubes import read_ply_or_obj

    out = {}
    pts = []
    for path in (args.mesh_a, args.mesh_b):
        v, f = read_ply_or_obj(path)
        if args.largest_component:
            v, f = largest_component(v, f)
        p = sample_mesh_points(v, f, args.n_points)
        if args.clip_min is not None:
            lo = np.asarray(args.clip_min)
            hi = np.asarray(args.clip_max)
            p = p[((p >= lo) & (p <= hi)).all(axis=1)]
        pts.append(p)

    out["chamfer"] = chamfer_distance(pts[0], pts[1])
    print(json.dumps(out))
    if args.output_path:
        args.output_path.write_text(json.dumps(out))


if __name__ == "__main__":
    main()

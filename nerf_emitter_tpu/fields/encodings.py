"""Input encodings: multi-resolution hash grid, spherical harmonics, NeRF
frequency encoding.

Re-design of the reference's encoding stack
(nerfstudio/field_components/encodings.py:250-330) whose fast path is
tiny-cuda-nn's CUDA hash grid. TPU-first design notes:

- The hash tables of all L levels live in ONE flat (sum_l T_l, F) array so a
  single batched gather serves every level; XLA lowers `take` to a dynamic
  gather HLO and its transpose to scatter-add for the backward — the same
  dataflow tcnn hand-writes in CUDA.
- Levels whose dense grid fits the table budget are stored densely
  (collision-free, like tcnn); only finer levels hash.
- Feature dim F=2 with L=16 levels -> a (N, 32) output that feeds straight
  into the bf16 MXU MLPs.

Backend story (the reference's dual tcnn/torch `implementation` flag,
encodings.py:272-312, realized as freq-vs-hash instead): the hash path is
served by THIS module's XLA gather. A Pallas hash kernel was evaluated
and rejected: TPUs have no vector-gather hardware path — Mosaic lowers
per-element dynamic VMEM indexing to scalar loads, which cannot beat the
XLA gather this module already emits (profiled gather-bound, ~1e8
elems/s). The TPU-native flagship is therefore `implementation='freq'`
(frequency encoding + wide MXU MLPs, served by ops/fused_field.py /
ops/mega_query.py); 'hash' remains the parameter-efficient fallback.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# large primes for spatial hashing (Mueller et al., instant-ngp)
_PRIMES = (1, 2654435761, 805459861)


def hash_level_resolutions(
    num_levels: int, min_res: int, max_res: int
) -> list[int]:
    """Per-level grid resolutions with geometric growth (instant-ngp eq. 2)."""
    if num_levels == 1:
        return [min_res]
    growth = math.exp((math.log(max_res) - math.log(min_res)) / (num_levels - 1))
    return [int(np.floor(min_res * growth**l)) for l in range(num_levels)]


class HashGridSpec:
    """Static geometry of a multi-res hash grid (hashable; safe under jit)."""

    def __init__(
        self,
        num_levels: int = 16,
        features_per_level: int = 2,
        log2_hashmap_size: int = 19,
        min_res: int = 16,
        max_res: int = 2048,
    ):
        self.num_levels = num_levels
        self.features_per_level = features_per_level
        self.table_size = 2**log2_hashmap_size
        self.resolutions = hash_level_resolutions(num_levels, min_res, max_res)
        # dense (collision-free) storage when the level's corner grid fits
        self.level_sizes = [
            min((r + 1) ** 3, self.table_size) for r in self.resolutions
        ]
        self.offsets = np.concatenate([[0], np.cumsum(self.level_sizes)]).tolist()
        self.total_size = self.offsets[-1]
        self.out_dim = num_levels * features_per_level

    def init_table(self, key: jax.Array, scale: float = 1e-4) -> jax.Array:
        return jax.random.uniform(
            key, (self.total_size, self.features_per_level), jnp.float32, -scale, scale
        )


def _level_indices(
    ijk: jax.Array, res: int, level_size: int, offset: int
) -> jax.Array:
    """Corner integer coords (..., 3) -> flat table indices (...,)."""
    if (res + 1) ** 3 <= level_size:
        # dense: x + (res+1) * (y + (res+1) * z)
        idx = ijk[..., 0] + (res + 1) * (ijk[..., 1] + (res + 1) * ijk[..., 2])
    else:
        h = ijk[..., 0] * jnp.uint32(_PRIMES[0])
        h = jnp.bitwise_xor(h, ijk[..., 1] * jnp.uint32(_PRIMES[1]))
        h = jnp.bitwise_xor(h, ijk[..., 2] * jnp.uint32(_PRIMES[2]))
        idx = jnp.remainder(h, jnp.uint32(level_size))
    return idx + offset


_CORNER_OFFSETS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def _corner_index_1d(
    bx, by, bz, cx: int, cy: int, cz: int, res: int, level_size: int, offset: int
):
    """Flat table index for one corner of one level; all inputs (N,) uint32."""
    ix = bx + jnp.uint32(cx)
    iy = by + jnp.uint32(cy)
    iz = bz + jnp.uint32(cz)
    if (res + 1) ** 3 <= level_size:
        idx = ix + jnp.uint32(res + 1) * (iy + jnp.uint32(res + 1) * iz)
    else:
        h = ix * jnp.uint32(_PRIMES[0])
        h = jnp.bitwise_xor(h, iy * jnp.uint32(_PRIMES[1]))
        h = jnp.bitwise_xor(h, iz * jnp.uint32(_PRIMES[2]))
        idx = jnp.remainder(h, jnp.uint32(level_size))
    return idx + jnp.uint32(offset)


@partial(jax.jit, static_argnames=("spec",))
def hash_encode(table: jax.Array, positions: jax.Array, spec: HashGridSpec) -> jax.Array:
    """positions in [0,1]^3, shape (N, 3) -> features (N, L*F).

    TPU layout note: at emitter-query scale N is millions; any tensor shaped
    (N, L, 8[, F]) gets tile-padded (minor dims -> (8, 128)) into tens of
    GB. So every large intermediate here is kept 1-D (N,) or (F, N) — the
    per-(level, corner) loop is unrolled (L*8 <= 128 gathers) and the table
    is gathered transposed so the lane dimension is N, not F.
    """
    pos = jnp.clip(positions, 0.0, 1.0)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]  # (N,) each

    table_t = table.T  # (F, T): gathers along the huge axis keep N in lanes

    outs = []
    for l in range(spec.num_levels):
        s = float(spec.resolutions[l])
        sx, sy, sz = x * s, y * s, z * s
        bx = jnp.floor(sx)
        by = jnp.floor(sy)
        bz = jnp.floor(sz)
        fx, fy, fz = sx - bx, sy - by, sz - bz
        bxu = bx.astype(jnp.uint32)
        byu = by.astype(jnp.uint32)
        bzu = bz.astype(jnp.uint32)

        acc = None
        for cx, cy, cz in _CORNER_OFFSETS:
            idx = _corner_index_1d(
                bxu, byu, bzu, cx, cy, cz,
                spec.resolutions[l], spec.level_sizes[l], spec.offsets[l],
            )
            w = (
                (fx if cx else 1.0 - fx)
                * (fy if cy else 1.0 - fy)
                * (fz if cz else 1.0 - fz)
            )  # (N,)
            feats = table_t[:, idx]  # (F, N)
            contrib = feats * w[None, :]
            acc = contrib if acc is None else acc + contrib
        outs.append(acc)  # (F, N)

    # (L*F, N) -> (N, L*F): one compact transpose at the end
    return jnp.concatenate(outs, axis=0).T


# ---------------------------------------------------------------------------
# spherical harmonics (direction encoding for the rgb head)
# ---------------------------------------------------------------------------


def sh_encode(directions: jax.Array, degree: int = 4) -> jax.Array:
    """Real SH basis up to `degree` bands (degree<=4 -> 16 comps).
    directions: unit vectors (..., 3).

    TPU layout note: components are assembled as (K, N) — batch on the
    LANE (minor) axis — then transposed once. Stacking (N, 1) columns on
    the minor axis instead makes XLA pad every column to the 128-lane tile
    (128x memory/bandwidth blowup, observed as 1.5 GB buffers per column
    at 6M samples); same trick as the hash encoder above."""
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    comps = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree > 3:
        comps += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    if degree > 4:
        raise NotImplementedError("SH degree > 4")
    flat = [c.reshape(-1) for c in comps]
    enc = jnp.stack(flat, axis=0)  # (K, N): batch on the lane axis
    return enc.T.reshape(*directions.shape[:-1], len(comps))


def sh_dim(degree: int) -> int:
    return degree**2


# ---------------------------------------------------------------------------
# NeRF frequency encoding (used by some baselines / distortion-free fields)
# ---------------------------------------------------------------------------


def nerf_encode(
    x: jax.Array,
    num_frequencies: int = 10,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 9.0,
    include_input: bool = True,
) -> jax.Array:
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    d = x.shape[-1]
    # assemble as (K, N) — batch on the lane axis — then transpose once;
    # an (..., D, Fq) intermediate puts Fq (~10) on the minor axis, which
    # TPU tiling pads to 128 lanes (12.8x bandwidth blowup). See sh_encode.
    xt = x.reshape(-1, d).T  # (D, N)
    scaled = (xt[:, None, :] * freqs[None, :, None]).reshape(
        d * len(freqs), -1
    )  # (D*Fq, N)
    parts = [jnp.sin(2.0 * jnp.pi * scaled), jnp.cos(2.0 * jnp.pi * scaled)]
    if include_input:
        parts = [xt] + parts
    enc = jnp.concatenate(parts, axis=0)  # (K, N)
    return enc.T.reshape(*x.shape[:-1], -1)


def nerf_encode_dim(in_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    return in_dim * (2 * num_frequencies + (1 if include_input else 0))

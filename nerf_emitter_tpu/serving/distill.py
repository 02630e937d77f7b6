"""Distilled light-field emitter cache: the whole NeRF emitter query in ONE
MLP evaluation per ray.

The takeover phase freezes the NeRF (reference `no_update_nerf` /
`detach_op`, mitsuba_sdf.py:214-239): every escaped SDF ray is answered by
a FIXED function radiance(ray). The reference serves that function by
re-running the full nerfacto evaluation per query (proposal MLPs, inverse
CDF resampling, 48-sample field MLP, compositing — base_model.py:292-313,
~13M MACs/ray); our megafused Pallas path (ops/mega_query.py) makes that
evaluation fast but is VPU-issue-bound in the inverse-CDF resample with a
measured floor of ~3-3.3M rays/s/chip (RESULTS_r02.md instruction-count
model).

TPU-first redesign: since the emitter is frozen, DISTILL it once at
takeover into a 5D light field over (object-box exit point, direction)
[Sitzmann et al. 2021, "Light Field Networks" — here fitting a frozen
teacher, not learning from images]. Serving is then a single
freq-encoded MLP (~1M MACs/ray, zero sampling, zero resample, zero scans)
— pure MXU work that XLA fuses by itself; no Pallas needed. The student:

    raw = MLP(freq(exit_pos), freq(dir), appearance_emb)     # HDR log space
    radiance = exp(raw) - EPS_LOG                            # exact at fit

- exit_pos = origin + near * dir AFTER the far-intersect collider and
  turntable rotation — the same canonicalization `make_nerf_emitter_fn`
  applies (pipelines/nerf_emitter.py:175-217), so two query rays on the
  same line distill to the same sample.
- appearance embedding (32-d) is looked up from the frozen NeRF params and
  appended to the input, so ONE student serves all camera indices.
- rotater rot_ids need no special handling: the student learns the
  world-frame light field, and the wrapper rotates rays into the world
  frame before the lookup, exactly like the full path.
- training data is free: teacher batches are fresh megakernel queries at
  ~2.3M rays/s, so the student never sees a sample twice (no overfitting
  term), and the whole fit is a few thousand fused teacher+student steps.

Error tolerance matches the `emitter_samples` argument
(pipelines/nerf_emitter.py:128-135): emitter radiance enters the SDF
render integrated over >=16 spp and the BSDF lobe, so per-ray cache error
behaves as extra estimator variance, not bias of the light transport —
the fidelity gate for flipping any default is the same takeover-quality
A/B harness as the sample-schedule lever.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..cameras.rays import RayBundle
from ..fields.encodings import nerf_encode
from ..ops.colliders import aabb_far_intersect_collider
from ..utils import coords

EPS_LOG = 1e-3  # log-space fit floor; subtracted back at serving time


class EmitterLightField(nn.Module):
    """Student MLP over (canonical exit point, direction, appearance emb).

    Output is RAW log-radiance (the fit target is log(teacher + EPS_LOG));
    `serve()` exponentiates. 256x6 bf16 matmuls are MXU-shaped; at 2^16-ray
    batches each layer is a (256, 65536) GEMM.
    """

    hidden: int = 256
    depth: int = 6  # number of hidden layers
    pos_freqs: int = 6
    dir_freqs: int = 4
    pos_center: tuple = (0.0, 0.0, 0.0)
    pos_scale: float = 1.0  # exit points divided by this before encoding

    @nn.compact
    def __call__(self, pos: jax.Array, d: jax.Array, emb: jax.Array) -> jax.Array:
        p = (pos - jnp.asarray(self.pos_center, jnp.float32)) / self.pos_scale
        h = jnp.concatenate(
            [
                # octave ladder 2^0..2^(F-1): inputs are pre-normalized to
                # ~[-1,1], so the field default max_freq_exp=9 would waste
                # most bands above the light field's angular bandwidth
                nerf_encode(p, self.pos_freqs, max_freq_exp=self.pos_freqs - 1.0),
                nerf_encode(d, self.dir_freqs, max_freq_exp=self.dir_freqs - 1.0),
                emb,
            ],
            axis=-1,
        ).astype(jnp.bfloat16)
        for i in range(self.depth):
            h = nn.Dense(self.hidden, dtype=jnp.bfloat16, name=f"hidden_{i}")(h)
            h = nn.relu(h)
        raw = nn.Dense(3, dtype=jnp.bfloat16, name="out")(h)
        return raw.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    steps: int = 2000
    batch: int = 1 << 14
    lr: float = 2e-3
    hidden: int = 256
    depth: int = 6
    holdout_batches: int = 8  # fidelity measurement after the fit
    scan_chunk: int = 50  # teacher+student steps chained per dispatch
    # fraction of training directions drawn from the vMF guiding mixture
    # (when one is passed): MIS weights the render integrand by exactly
    # these bright lobes, so they need LOWER relative cache error than the
    # uniform sphere provides
    guided_frac: float = 0.5


def _appearance_emb(nerf_params, camera_index, n: int) -> jax.Array:
    p = nerf_params["params"]["field"]
    if "appearance_embedding" not in p:
        return jnp.zeros((n, 0), jnp.float32)
    table = p["appearance_embedding"]["embedding"]
    cam = jnp.broadcast_to(camera_index, ()).astype(jnp.int32)
    return jnp.broadcast_to(table[cam][None, :], (n, table.shape[1]))


def _canonical_inputs(
    x_unit: jax.Array,
    d: jax.Array,
    *,
    scene_scale: float,
    object_aabb: jax.Array,
    far: float,
    rotater,
    rot_id,
):
    """The exact ray canonicalization of make_nerf_emitter_fn
    (pipelines/nerf_emitter.py:175-217): unit->world, far-intersect
    collider in the canonical frame, then the turntable rotation. Returns
    (exit_pos_world, dir_world)."""
    o_w = coords.unit_to_world(x_unit, scene_scale)
    n = o_w.shape[0]
    rays = RayBundle(
        origins=o_w,
        directions=d,
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.zeros((n, 1)),
        fars=jnp.full((n, 1), far),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )
    rays = aabb_far_intersect_collider(rays, object_aabb, far=far)
    o, dd, nears = rays.origins, rays.directions, rays.nears
    if rotater is not None and rot_id is not None:
        rid = jnp.broadcast_to(rot_id, (n,)).astype(jnp.int32)
        o = rotater.apply_points(rid, o)
        dd = rotater.apply_dirs(rid, dd)
    return o + nears * dd, dd


def make_student_emitter_fn_of(
    module: EmitterLightField,
    student_params,
    *,
    scene_scale: float,
    object_aabb: jax.Array,
    far: float = 1e3,
    rotater=None,
):
    """emitter_fn_of with the make_nerf_emitter_fn contract
    (pipelines/nerf_emitter.py:96-219) serving from the distilled light
    field. `params` (the NeRF pytree) is consulted only for the appearance
    embedding; the student weights are frozen constants of the closure
    (matching detach_nerf=True semantics: no parameter gradients, full
    geometry gradients for the reparam/warp adjoint)."""
    sp = jax.lax.stop_gradient(student_params)

    def emitter_fn_of(params, camera_index=None, rot_id=None):
        p = jax.lax.stop_gradient(params)

        def emitter_fn(x_unit: jax.Array, d: jax.Array) -> jax.Array:
            pos, dd = _canonical_inputs(
                x_unit, d, scene_scale=scene_scale, object_aabb=object_aabb,
                far=far, rotater=rotater, rot_id=rot_id,
            )
            cam = camera_index if camera_index is not None else 0
            emb = _appearance_emb(p, cam, pos.shape[0])
            raw = module.apply(sp, pos, dd, emb)
            return jnp.maximum(jnp.exp(raw) - EPS_LOG, 0.0)

        return emitter_fn

    return emitter_fn_of


def distill_emitter(
    key: jax.Array,
    nerf_params,
    teacher_emitter_fn_of,
    *,
    scene_scale: float,
    object_aabb: jax.Array,
    num_cameras: int,
    far: float = 1e3,
    rotater=None,
    n_rotations: int = 1,
    guiding=None,
    config: DistillConfig = DistillConfig(),
):
    """Fit the light-field student to the frozen teacher.

    teacher_emitter_fn_of is the full-path emitter_fn_of
    (make_nerf_emitter_fn(...)), queried INSIDE the jitted fit step with
    traced (camera_index, rot_id) so one compile covers every camera.
    Sampling: query origins uniform over the object box in unit coords
    (every takeover query originates on the SDF surface inside that box),
    directions uniform on the sphere — the superset of what BSDF/guiding
    sampling can ask for.

    Returns (module, params, fidelity) where fidelity holds held-out
    linear-space relRMS and log-space RMSE.
    """
    box = jnp.asarray(object_aabb, jnp.float32)
    lo_u = coords.world_to_unit(box[0], scene_scale)
    hi_u = coords.world_to_unit(box[1], scene_scale)
    center = (box[0] + box[1]) / 2.0
    half_diag = float(jnp.linalg.norm((box[1] - box[0]) / 2.0))
    module = EmitterLightField(
        hidden=config.hidden,
        depth=config.depth,
        pos_center=tuple(float(c) for c in center),
        pos_scale=max(half_diag * 1.5, 1e-3),
    )

    def sample_batch(k):
        ku, kd, kc, kr, kg, km = jax.random.split(k, 6)
        x_unit = jax.random.uniform(
            ku, (config.batch, 3), minval=lo_u, maxval=hi_u
        )
        d = jax.random.normal(kd, (config.batch, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        if guiding is not None and config.guided_frac > 0.0:
            # x_unit is the same frame the integrator hands to both
            # guiding.sample and emitter_fn (renderer/integrator.py
            # _emitter_sample)
            d_g, _ = guiding.sample(kg, x_unit)
            use_g = jax.random.uniform(km, (config.batch, 1)) < config.guided_frac
            d = jnp.where(use_g, d_g, d)
        cam = jax.random.randint(kc, (), 0, max(num_cameras, 1))
        rid = jax.random.randint(kr, (), 0, max(n_rotations, 1))
        return x_unit, d, cam, rid

    def teacher_student(params, k):
        x_unit, d, cam, rid = sample_batch(k)
        rot = rid if rotater is not None else None
        target = teacher_emitter_fn_of(nerf_params, camera_index=cam, rot_id=rot)(
            x_unit, d
        )
        target = jax.lax.stop_gradient(jnp.log(jnp.maximum(target, 0.0) + EPS_LOG))
        pos, dd = _canonical_inputs(
            x_unit, d, scene_scale=scene_scale, object_aabb=box, far=far,
            rotater=rotater, rot_id=rot,
        )
        emb = _appearance_emb(nerf_params, cam, pos.shape[0])
        raw = module.apply(params, pos, dd, emb)
        return raw, target

    k0, key = jax.random.split(key)
    x0, d0, c0, _ = sample_batch(k0)
    emb0 = _appearance_emb(nerf_params, c0, x0.shape[0])
    params = jax.jit(module.init)(key, x0, d0, emb0)

    tx = optax.adam(
        optax.cosine_decay_schedule(config.lr, max(config.steps, 1))
    )
    opt_state = tx.init(params)

    def loss_fn(params, k):
        raw, target = teacher_student(params, k)
        return jnp.mean((raw - target) ** 2)

    def one_step(carry, _):
        params, opt_state, k = carry
        k, ks = jax.random.split(k)
        loss, grads = jax.value_and_grad(loss_fn)(params, ks)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, k), loss

    @functools.partial(jax.jit, static_argnums=3)
    def fit_chunk(params, opt_state, k, n):
        (params, opt_state, k), losses = jax.lax.scan(
            one_step, (params, opt_state, k), None, length=n
        )
        return params, opt_state, k, losses

    losses = []
    done = 0
    while done < config.steps:
        n = min(config.scan_chunk, config.steps - done)
        params, opt_state, key, chunk_losses = fit_chunk(
            params, opt_state, key, n
        )
        losses.append(chunk_losses)
        done += n

    @jax.jit
    def holdout(params, k):
        raw, target = teacher_student(params, k)
        pred_lin = jnp.maximum(jnp.exp(raw) - EPS_LOG, 0.0)
        t_lin = jnp.maximum(jnp.exp(target) - EPS_LOG, 0.0)
        rel = (pred_lin - t_lin) / (t_lin + 1e-2)
        return jnp.mean(rel**2), jnp.mean((raw - target) ** 2)

    rels, logs = [], []
    for _ in range(config.holdout_batches):
        key, ks = jax.random.split(key)
        r, l = holdout(params, ks)
        rels.append(r)
        logs.append(l)
    fidelity = {
        "relrms_linear": float(jnp.sqrt(jnp.mean(jnp.stack(rels)))),
        "rmse_log": float(jnp.sqrt(jnp.mean(jnp.stack(logs)))),
        "final_fit_loss": float(jnp.concatenate(losses)[-1]),
    }
    return module, params, fidelity

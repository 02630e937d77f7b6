"""Capture-window coordination + quick-tier mesh smoke.

Round-2 postmortem: the driver's MULTICHIP capture aborted (XLA CPU
collective rendezvous, 40 s) because the background stage queue occupied
the 1-core host, and the quick test gate never exercised the mesh-sharded
takeover path at all. These tests cover both fixes and run in the quick
tier.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.utils import capture_lock


def _patch_paths(monkeypatch, tmp_path):
    monkeypatch.setattr(capture_lock, "PAUSE_FILE", tmp_path / "pause")
    monkeypatch.setattr(capture_lock, "HEARTBEAT_FILE", tmp_path / "beat")
    monkeypatch.setattr(capture_lock, "ACK_FILE", tmp_path / "ack")
    monkeypatch.setattr(capture_lock, "POLL", 0.05)
    monkeypatch.setattr(capture_lock, "HEARTBEAT_STALE", 0.2)


def test_capture_window_pauses_worker(monkeypatch, tmp_path):
    _patch_paths(monkeypatch, tmp_path)
    counter = {"n": 0}
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            capture_lock.checkpoint()
            counter["n"] += 1
            time.sleep(0.01)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        time.sleep(0.2)
        assert counter["n"] > 0
        with capture_lock.capture_window("test", max_wait=2.0):
            # the worker acked and is parked between dispatches
            assert capture_lock.ACK_FILE.exists()
            before = counter["n"]
            time.sleep(0.3)
            assert counter["n"] == before, "worker dispatched during capture"
        time.sleep(0.5)
        assert counter["n"] > before, "worker did not resume after capture"
    finally:
        stop.set()
        t.join(timeout=2)


def test_stale_pause_is_ignored_and_removed(monkeypatch, tmp_path):
    _patch_paths(monkeypatch, tmp_path)
    import os

    capture_lock.PAUSE_FILE.write_text("crashed capturer\n")
    old = time.time() - capture_lock.MAX_PAUSE_AGE - 10
    os.utime(capture_lock.PAUSE_FILE, (old, old))
    assert not capture_lock.pause_requested()
    assert not capture_lock.PAUSE_FILE.exists()


def test_capture_window_with_no_worker_is_fast(monkeypatch, tmp_path):
    _patch_paths(monkeypatch, tmp_path)
    t0 = time.time()
    with capture_lock.capture_window("test", max_wait=5.0):
        pass
    # never-written heartbeat == quiet host: must not wait out max_wait
    assert time.time() - t0 < 2.0
    assert not capture_lock.PAUSE_FILE.exists()


def test_takeover_step_mesh_smoke_2dev():
    """Quick-tier: the mesh-sharded takeover step (the code path of the
    round-2 MULTICHIP failure) compiles and runs on a tiny 2-device mesh.
    Parity with single-device stays in the slow tier
    (test_multichip.test_takeover_step_mesh_parity)."""
    from nerf_emitter_tpu.cameras.cameras import Cameras
    from nerf_emitter_tpu.engine.train_loop import TrainConfig, create_train_state
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel
    from nerf_emitter_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicated
    from nerf_emitter_tpu.pipelines.nerf_emitter import make_nerf_emitter_fn
    from nerf_emitter_tpu.pipelines.sdf_optimizer import (
        SdfOptState,
        TakeoverConfig,
        build_sdf_optimizer,
        make_sdf_train_step,
    )
    from nerf_emitter_tpu.renderer.integrator import RenderConfig
    from nerf_emitter_tpu.renderer.optimize import SdfOptConfig, VariableSpec
    from nerf_emitter_tpu.renderer.scene import SdfScene
    from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

    mesh = make_mesh(2)
    n_imgs, h, w = 2, 4, 4
    c2ws = []
    for i in range(n_imgs):
        th = 2 * np.pi * i / n_imgs
        eye = 1.3 * np.array([np.cos(th), 0.3, np.sin(th)], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2ws.append(np.stack([right, up, -fwd, eye], axis=1))
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n_imgs,), 5.0), fy=jnp.full((n_imgs,), 5.0),
        cx=jnp.full((n_imgs,), w / 2), cy=jnp.full((n_imgs,), h / 2),
        width=w, height=h,
    )
    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=4,
        num_proposal_samples=(8,),
        log2_hashmap_size=10,
        max_res=32,
        num_cameras=n_imgs,
        appearance_embedding_dim=4,
    )
    cfg = TrainConfig(num_rays_per_batch=16, near=0.05, far=4.0, max_steps=2)
    rays = cams.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=cfg.near, fars=cfg.far,
    )
    state, _ = create_train_state(model, cfg, rays, jax.random.PRNGKey(0))

    object_aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    emitter_fn = make_nerf_emitter_fn(model, 1.0, object_aabb)(state.params)
    opt_cfg = SdfOptConfig(
        name="smoke", bsdf_type=0, loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=3e-3),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        init_res=9, tex_res=4, render_upsample_iter=(), curvature_mult=0.0,
    )
    takeover = TakeoverConfig(spp=1, image_height=h, image_width=w,
                              scene_scale=1.0)
    scene = SdfScene.create(sdf_res=9, tex_res=4)
    tx = build_sdf_optimizer(opt_cfg)
    sdf_state = jax.device_put(
        SdfOptState(step=jnp.int32(0), scene=scene, opt_state=tx.init(scene)),
        replicated(mesh),
    )
    step = make_sdf_train_step(
        opt_cfg, takeover, tx, emitter_fn=emitter_fn,
        render_config=RenderConfig(trace=SphereTraceConfig(max_steps=4, t_max=3.0)),
        mesh=mesh, data_axis=DATA_AXIS,
    )
    gt = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)))
    masks = jnp.ones((1, h, w, 1))
    sdf_state, m = step(
        sdf_state, cams, jnp.zeros((1,), jnp.int32), gt, masks,
        jax.random.PRNGKey(3),
    )
    assert np.isfinite(float(m["loss"]))
    # estimator provenance tag (exact mode here)
    assert float(m["estimator_aggregate"]) == 0.0

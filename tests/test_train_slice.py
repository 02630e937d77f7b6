"""End-to-end smoke test: synthetic data -> dataparser -> datamanager ->
nerfacto train steps -> loss decreases -> eval render.

The reference's analogue is tests/test_train.py (2-iteration CPU smoke run
per method on a tiny scene).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.data.datamanager import build_dataset
from nerf_emitter_tpu.data.dataparsers.instant_ngp import (
    InstantNGPDataparserConfig,
    parse_instant_ngp,
)
from nerf_emitter_tpu.data.synthetic import make_synthetic_dataset
from nerf_emitter_tpu.engine.train_loop import (
    TrainConfig,
    create_train_state,
    eval_image_metrics,
    make_render_fn,
    make_train_step,
)
from nerf_emitter_tpu.models.nerfacto import NerfactoModel


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    make_synthetic_dataset(d, n_views=8, width=32, height=32)
    return d


def test_dataparser(scene):
    cfg = InstantNGPDataparserConfig(data=scene)
    out = parse_instant_ngp(cfg, "train")
    assert len(out.image_filenames) == 8  # fraction 0.9 of 8 -> ceil = 8
    assert out.camera_to_worlds.shape == (8, 3, 4)
    assert out.is_hdr  # .npy
    ds = build_dataset(out)
    assert ds.images.shape == (8, 32, 32, 3)
    # camera positions scaled by 1/3: radius 2.4 -> 0.8
    r = np.linalg.norm(np.asarray(ds.cameras.camera_to_worlds[:, :3, 3]), axis=-1)
    np.testing.assert_allclose(r, 0.8, atol=1e-5)


def test_train_slice_loss_decreases(scene):
    cfg = InstantNGPDataparserConfig(data=scene)
    out = parse_instant_ngp(cfg, "train")
    ds = build_dataset(out)

    model = NerfactoModel(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_nerf_samples=16,
        num_proposal_samples=(24, 12),
        log2_hashmap_size=14,
        max_res=256,
        num_cameras=8,
        appearance_embedding_dim=8,
        background_color="last_sample",
    )
    tconf = TrainConfig(
        num_rays_per_batch=256,
        near=0.05,
        far=3.0,
        max_steps=50,
        anneal_steps=20,
    )
    rays = ds.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=tconf.near, fars=tconf.far,
    )
    state, tx = create_train_state(model, tconf, rays, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, tconf, tx)

    key = jax.random.PRNGKey(42)
    first_losses, last_losses = [], []
    for i in range(40):
        state, metrics = step_fn(state, ds, key)
        if i < 5:
            first_losses.append(float(metrics["rgb_loss"]))
        if i >= 35:
            last_losses.append(float(metrics["rgb_loss"]))
    assert np.isfinite(last_losses).all()
    assert np.mean(last_losses) < np.mean(first_losses) * 0.7, (
        first_losses,
        last_losses,
    )

    # eval render path
    render = make_render_fn(model, tconf, chunk=256)
    img = render(state.params, ds.cameras, jnp.int32(0), 32, 32)
    assert img["rgb"].shape == (32, 32, 3)
    m = eval_image_metrics(img["rgb"], ds.images[0], is_hdr=True)
    assert np.isfinite(float(m["psnr"]))

"""Unit tests for hash encoding, SH encoding, fields, and model forward."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.fields.encodings import (
    HashGridSpec,
    hash_encode,
    nerf_encode,
    sh_encode,
)
from nerf_emitter_tpu.fields.nerfacto_field import HashMLPDensityField, NerfactoField
from nerf_emitter_tpu.models.nerfacto import NerfactoModel

AABB = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))


def _bundle(n_rays=4):
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((n_rays, 3)),
        directions=d,
        pixel_area=jnp.full((n_rays, 1), 1e-4),
        nears=jnp.full((n_rays, 1), 0.1),
        fars=jnp.full((n_rays, 1), 4.0),
        camera_indices=jnp.zeros((n_rays, 1), jnp.int32),
    )


def test_hash_encode_shapes_and_grad():
    spec = HashGridSpec(num_levels=4, log2_hashmap_size=12, min_res=4, max_res=32)
    table = spec.init_table(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(table, pos, spec)
    assert out.shape == (64, spec.out_dim)

    # gradient flows into the table (scatter-add transpose of gather)
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pos, spec) ** 2))(table)
    assert float(jnp.abs(g).sum()) > 0.0


def test_hash_encode_trilinear_continuity():
    """Encoding should be continuous: nearby points -> nearby features."""
    spec = HashGridSpec(num_levels=2, log2_hashmap_size=10, min_res=4, max_res=8)
    table = spec.init_table(jax.random.PRNGKey(0), scale=1.0)
    p = jnp.array([[0.31, 0.47, 0.55]])
    eps = 1e-4
    p2 = p + eps
    a = hash_encode(table, p, spec)
    b = hash_encode(table, p2, spec)
    assert float(jnp.abs(a - b).max()) < 0.05


def test_hash_encode_corner_exact():
    """At a grid corner the encoding equals the table entry (dense level)."""
    spec = HashGridSpec(num_levels=1, log2_hashmap_size=12, min_res=4, max_res=4)
    table = spec.init_table(jax.random.PRNGKey(0), scale=1.0)
    # corner (1,2,3) of a res-4 grid -> position (.25, .5, .75)
    pos = jnp.array([[0.25, 0.5, 0.75]])
    out = hash_encode(table, pos, spec)
    idx = 1 + 5 * (2 + 5 * 3)
    np.testing.assert_allclose(out[0], table[idx], atol=1e-5)


def test_sh_encode_dims_and_norm():
    d = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for deg in (1, 2, 3, 4):
        out = sh_encode(d, deg)
        assert out.shape == (32, deg**2)
    # band-0 is the constant
    np.testing.assert_allclose(sh_encode(d, 1)[:, 0], 0.2820948, rtol=1e-5)


def test_nerf_encode_dims():
    x = jnp.zeros((8, 3))
    out = nerf_encode(x, num_frequencies=4)
    assert out.shape == (8, 3 * (2 * 4 + 1))


def test_nerfacto_field_forward():
    field = NerfactoField(
        aabb=AABB, num_levels=4, log2_hashmap_size=12, max_res=64,
        num_cameras=4,
    )
    pos = jax.random.uniform(jax.random.PRNGKey(0), (8, 3), minval=-1.0, maxval=1.0)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    params = field.init(jax.random.PRNGKey(1), pos, dirs)
    out = field.apply(params, pos, dirs)
    assert out["density"].shape == (8,)
    assert out["rgb"].shape == (8, 3)
    assert bool(jnp.all(out["density"] >= 0))
    assert bool(jnp.all(out["rgb"] >= 0))  # HDR: safe_exp output


def test_field_disable_aabb_carveout():
    field = NerfactoField(
        aabb=AABB, num_levels=4, log2_hashmap_size=12, max_res=64, num_cameras=4
    )
    pos = jnp.array([[0.0, 0.0, 0.0], [1.2, 1.2, 1.2]])
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    params = field.init(jax.random.PRNGKey(1), pos, dirs)
    box = jnp.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    d_on, _ = field.apply(
        params, pos, disable_aabb=box, disable_aabb_on=True,
        method=NerfactoField.get_density,
    )
    d_off, _ = field.apply(
        params, pos, disable_aabb=box, disable_aabb_on=False,
        method=NerfactoField.get_density,
    )
    assert float(d_on[0]) == 0.0  # inside box zeroed
    assert float(d_on[1]) == float(d_off[1])  # outside unaffected
    assert float(d_off[0]) > 0.0


def test_density_field_forward():
    f = HashMLPDensityField(aabb=AABB, num_levels=2, log2_hashmap_size=10, max_res=32)
    pos = jax.random.uniform(jax.random.PRNGKey(0), (8, 3))
    params = f.init(jax.random.PRNGKey(1), pos)
    d = f.apply(params, pos)
    assert d.shape == (8,)
    assert bool(jnp.all(d >= 0))


def _tiny_model():
    return NerfactoModel(
        aabb=AABB,
        num_nerf_samples=8,
        num_proposal_samples=(16, 8),
        log2_hashmap_size=12,
        max_res=128,
        num_cameras=4,
    )


def test_model_forward_and_grad():
    model = _tiny_model()
    rb = _bundle(8)
    params = model.init(jax.random.PRNGKey(0), rb)
    out = model.apply(params, rb, train=False)
    assert out["rgb"].shape == (8, 3)
    assert out["depth"].shape == (8, 1)
    assert out["accumulation"].shape == (8, 1)

    def loss_fn(p):
        o = model.apply(
            p, rb, key=jax.random.PRNGKey(1), train=True, proposal_anneal=0.5
        )
        return jnp.mean(o["rgb"] ** 2)

    g = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_model_train_outputs_for_losses():
    model = _tiny_model()
    rb = _bundle(4)
    params = model.init(jax.random.PRNGKey(0), rb)
    out = model.apply(params, rb, key=jax.random.PRNGKey(1), train=True)
    assert len(out["weights_list"]) == 3
    assert len(out["spacing_bins_list"]) == 3
    from nerf_emitter_tpu.ops.losses import distortion_loss, interlevel_loss

    il = interlevel_loss(out["weights_list"], out["spacing_bins_list"])
    rs = out["ray_samples"]
    dl = distortion_loss(out["weights_list"][-1], rs.spacing_starts, rs.spacing_ends)
    assert np.isfinite(float(il)) and np.isfinite(float(dl))


def test_point_lights():
    model = _tiny_model()
    rb = _bundle(4)
    params = model.init(jax.random.PRNGKey(0), rb)
    out = model.apply(params, rb, method=NerfactoModel.point_lights)
    for k in ("rgb", "luminance", "depth", "brightness_grad"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    assert out["luminance"].shape == (4,)
    assert out["brightness_grad"].shape == (4,)


def test_freq_implementation_forward_and_grad():
    """The gather-free MXU field ('freq') — same API, no hash table."""
    model = NerfactoModel(
        aabb=AABB,
        num_nerf_samples=8,
        num_proposal_samples=(16, 8),
        num_cameras=4,
        implementation="freq",
        appearance_embedding_dim=8,
    )
    rb = _bundle(8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rb)
    assert "hash_table" not in str(jax.tree_util.tree_structure(params))
    out = model.apply(params, rb, train=False)
    assert out["rgb"].shape == (8, 3)

    def loss_fn(p):
        o = model.apply(p, rb, key=jax.random.PRNGKey(1), train=True)
        return jnp.mean(o["rgb"] ** 2)

    g = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_camera_pose_optimizer_grads():
    model = NerfactoModel(
        aabb=AABB, num_nerf_samples=8, num_proposal_samples=(12, 8),
        log2_hashmap_size=12, max_res=64, num_cameras=4,
        optimize_camera_poses=True,
    )
    rb = _bundle(8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rb)
    assert params["params"]["camera_opt_deltas"].shape == (4, 6)

    def loss_fn(p):
        o = model.apply(p, rb, key=jax.random.PRNGKey(1), train=True)
        return jnp.mean(o["rgb"] ** 2)

    g = jax.grad(loss_fn)(params)
    cam_g = g["params"]["camera_opt_deltas"]
    assert float(jnp.abs(cam_g).sum()) > 0  # poses receive gradient


def test_fused_field_matches_model_apply():
    """The fused Pallas emitter query (interpret mode on CPU) must match
    model.apply(hdr_radiance_only=True) on the freq implementation."""
    import numpy as np

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel
    from nerf_emitter_tpu.ops.fused_field import make_fused_radiance_query

    model = NerfactoModel(
        aabb=AABB, num_nerf_samples=6, num_proposal_samples=(12, 8),
        num_cameras=4, appearance_embedding_dim=8, implementation="freq",
    )
    n = 16
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((n, 3)), directions=d,
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 3.0),
        camera_indices=jnp.ones((n, 1), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(1), rays)
    ref = model.apply(
        params, rays, train=False, hdr_radiance_only=True,
    )["rgb"]
    # reference path uses per-ray camera indices; fused takes one scalar
    query = make_fused_radiance_query(model)
    out = query(params, rays, camera_index=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-4)

    # gradient w.r.t. ray origins flows through the custom_vjp recompute
    g = jax.grad(
        lambda o: jnp.sum(query(params, rays.replace(origins=o), camera_index=jnp.int32(1)))
    )(rays.origins)
    assert np.isfinite(np.asarray(g)).all()


def test_mega_query_matches_staged():
    """The two-megakernel serving path (interpret mode on CPU) must match
    the staged fused query, including ray counts that need tile padding."""
    import numpy as np

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel
    from nerf_emitter_tpu.ops.fused_field import make_fused_radiance_query
    from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

    model = NerfactoModel(
        aabb=AABB, num_nerf_samples=6, num_proposal_samples=(12, 8),
        num_cameras=4, appearance_embedding_dim=8, implementation="freq",
    )
    n = 150  # not a multiple of the 128-ray tile
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((n, 3)), directions=d,
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 3.0),
        camera_indices=jnp.ones((n, 1), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(1), rays)
    staged = make_fused_radiance_query(model)
    mega = make_mega_radiance_query(model)
    a = staged(params, rays, camera_index=jnp.int32(1))
    b = mega(params, rays, camera_index=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-2, atol=1e-3)

    # gradients flow through the staged-path recompute
    g = jax.grad(
        lambda o: jnp.sum(mega(params, rays.replace(origins=o), camera_index=jnp.int32(1)))
    )(rays.origins)
    assert np.isfinite(np.asarray(g)).all()


def test_mega_query_pipelined_matches_two_kernel():
    """The software-pipelined single megakernel must reproduce the
    two-kernel mega path EXACTLY (same per-tile math, emission order
    only), including the n=1-tile edge and tile padding."""
    import numpy as np

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel
    from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

    model = NerfactoModel(
        aabb=AABB, num_nerf_samples=6, num_proposal_samples=(12, 8),
        num_cameras=4, appearance_embedding_dim=8, implementation="freq",
    )
    key = jax.random.PRNGKey(0)
    for n in (100, 300):  # 1 tile (padded) and 3 tiles (padded)
        d = jax.random.normal(key, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = RayBundle(
            origins=jnp.zeros((n, 3)), directions=d,
            pixel_area=jnp.full((n, 1), 1e-4),
            nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 3.0),
            camera_indices=jnp.ones((n, 1), jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(1), rays)
        two = make_mega_radiance_query(model, pipelined=False)
        pipe = make_mega_radiance_query(model, pipelined=True)
        a = two(params, rays, camera_index=jnp.int32(1))
        b = pipe(params, rays, camera_index=jnp.int32(1))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_mega_query_pipelined_mxu_chunked_matches(monkeypatch):
    """Column-chunking B's hidden-layer matmuls inside the pipelined
    megakernel (NERF_EMITTER_MEGA_MXU_CHUNK>1, the finer MXU/VPU
    interleave) is bit-identical to the unchunked pipeline: column
    slicing commutes with the matmul."""
    import numpy as np

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel
    from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

    model = NerfactoModel(
        aabb=AABB, num_nerf_samples=6, num_proposal_samples=(12, 8),
        num_cameras=4, appearance_embedding_dim=8, implementation="freq",
    )
    n = 200
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((n, 3)), directions=d,
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.05), fars=jnp.full((n, 1), 3.0),
        camera_indices=jnp.ones((n, 1), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(1), rays)
    plain = make_mega_radiance_query(model, pipelined=True)
    a = plain(params, rays, camera_index=jnp.int32(1))
    monkeypatch.setenv("NERF_EMITTER_MEGA_MXU_CHUNK", "3")
    chunked = make_mega_radiance_query(model, pipelined=True)
    b = chunked(params, rays, camera_index=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

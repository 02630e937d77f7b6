"""Test config: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; bench.py runs on the real chip instead.

NOTE: the environment's sitecustomize registers the axon TPU backend and
overrides JAX_PLATFORMS, so the env var alone is NOT enough — we must set
the platform through jax.config before any device access, or every eager op
round-trips through the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# CPU compiles (warp jvp-through-fori_loop alone is minutes); cached
# executables make re-runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# The multi-minute integration pyramids (measured >=60 s each on the 1-core
# CI box, ~30 of the suite's ~40 min). `pytest -m "not slow"` is the quick
# gate (<10 min warm); the full suite stays the merge bar.
_SLOW_TESTS = {
    "test_hdr_to_sdf_checkpoint_chain",
    "test_resume_past_upsample",
    "test_resume_with_drifted_optimizer_structure",
    "test_aggregate_step_runs_and_descends",
    "test_aggregate_gradient_scale_matches_exact",
    "test_mean_start_step_gates_accumulation",
    "test_prod_recipe_improves_past_upsample",
    "test_sdf_inverse_rendering_recovers_shape",
    "test_mean_parameter_tracking_and_swap",
    "test_takeover_step_mesh_parity",
    "test_two_phase_sdf_nerfacto",
    "test_set_relight_emitter_public_api",
    "test_train_slice_loss_decreases",
    "test_sdf_step_with_occlusion_composites",
    "test_mega_query_matches_staged",
    "test_fused_field_matches_model_apply",
    "test_render_sdf_shape_gradient_direction",
    "test_render_albedo_gradient",
    "test_silhouette_gradient_matches_fd",
    "test_silhouette_gradient_symmetry_zero",
    "test_nerf_train_step_mesh_parity",
    "test_warp_gradients_finite_on_textured_scene",
    "test_model_forward_and_grad",
    "test_one_sample_mis_matches_deterministic_mis",
    "test_render_cli_interpolate_and_spiral",
    "test_eval_cli_relight_preserves_run_config",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration test (quick gate: -m 'not slow')",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

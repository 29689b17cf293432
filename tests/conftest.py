"""Test harness: run everything on CPU jax with 8 virtual devices so
multi-chip sharding logic (shard_map/psum) is exercised without a TPU pod.

Note: in some environments (e.g. the axon TPU tunnel) jax is already
imported at interpreter startup, so JAX_PLATFORMS in os.environ is too late;
``jax.config.update`` works regardless, and XLA_FLAGS still takes effect
because the CPU client is created lazily on first use.
"""

import os

# Default: CPU jax with 8 virtual devices. Set SFVP_TEST_PLATFORM=tpu to run
# the same suite unmodified on real hardware (e.g. a v5e-8 pod slice),
# per SURVEY.md §4 item 4.
_platform = os.environ.get("SFVP_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent XLA compilation cache: the suite compiles hundreds of small
# jits plus several interpret-mode Pallas oracles; repeat runs hit disk
# (first run pays full compile cost). SFVP_CACHE_DIR=off disables.
from sfvp_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


# ---- fast tier ----------------------------------------------------------
# The full suite is ~45 min (interpret-mode Pallas equivalence tests
# dominate); `pytest -m "not slow"` is the <5 min inner-loop tier. Tests
# are marked here by measured duration (>= ~10 s on the round-4 run,
# /tmp durations via `pytest --durations`) rather than inline decorators
# so the list is one place and easy to re-tune. Parameterized tests match
# by base name (all params share the mark).
_SLOW_TESTS = {
    "test_regen_kernel_many_lights_equivalence",
    "test_regen_kernel_bucketed_lights_equivalence",
    "test_brute_regen_texture_equivalence",
    "test_device_build_valid_and_equivalent",
    "test_karras_topology_equals_host_on_distinct_codes",
    "test_device_build_matches_host_topology",
    "test_fused_two_level_regen_nee_mis_matches_wavefront",
    "test_karras_collapse_leaf_sizes",
    "test_bvh_megakernel_texture_equivalence",
    "test_regen_kernel_dof_mis_combo_equivalence",
    "test_karras_duplicate_codes_valid",
    "test_instanced_renderer_first_class",
    "test_megakernel_second_frame_and_accum",
    "test_regen_megakernel_env_equivalence",
    "test_sharded_payload_path_matches_single",
    "test_regen_megakernel_env_nee_equivalence",
    "test_regen_kernel_row_offset",
    "test_regen_kernel_mis_equivalence",
    "test_regen_kernel_dof_equivalence",
    "test_regen_kernel_glossy_equivalence",
    "test_regen_kernel_nee_equivalence",
    "test_bvh_regen_dielectric_equivalence",
    "test_textured_packet_payload_equivalence",
    "test_packet2_streamed_matches_resident",
    "test_regen_kernel_dielectric_equivalence",
    "test_bvh_megakernel_env_equivalence",
    "test_sharded_instanced_equals_single",
    "test_bvh_megakernel_env_nee_equivalence",
    "test_bvh_megakernel_combined_nee_equivalence",
    "test_glass_payload_path_matches_jnp",
    "test_glass_with_nee_mis_finite_and_consistent",
    "test_two_level_smem_nodes_matches",
    "test_regen_megakernel_combined_nee_equivalence",
    "test_packet2_matches_brute",
    "test_bvh_regen_smem_boxes_matches",
    "test_sharded_env_and_dof_match_single",
    "test_fused_two_level_regen_smem_nodes_matches",
    "test_bvh_regen_swizzle_and_row_offset",
    "test_fused_two_level_regen_matches_wavefront",
    "test_regen_kernel_equivalence",
    "test_bvh_regen_glossy_equivalence",
    "test_two_level_packet_matches_flattened",
    "test_bvh_regen_rough_glossy_with_dielectric_equivalence",
    "test_megakernel_bitwise_equivalence",
    "test_bvh_regen_bucketed_lights_equivalence",
    "test_instanced_textures_through_tlas_kernel",
    "test_bvh_regen_mis_glossy_equivalence",
    "test_bvh_regen_many_lights_equivalence",
    "test_adaptive_instanced_warmup_matches_flattened",
    "test_packet_trace_smem_boxes_matches",
    "test_megakernel_row_offset",
    "test_bvh_regen_streamed_equivalence",
    "test_two_process_multihost_dryrun",
    "test_integrator_nee_with_occlusion_kernel",
    "test_packet2_tiny_leaf_queue_spills",
    "test_bvh_regen_mis_equivalence",
    "test_packet_trace_smem_matches_extract",
    "test_karras_ranges_cover_tree",
    "test_bvh_regen_nee_equivalence",
    "test_packet2_active_mask",
    "test_glossy_payload_path_matches_jnp",
    "test_two_level_render_step",
    "test_integrator_payload_path_matches_jnp",
    "test_bvh_regen_dof_equivalence",
    "test_glossy_nee_matches_bsdf_only",
    "test_packet_respects_tmax_and_active",
    "test_dispatch_env_fallbacks",
    "test_deferred_env_nee_equivalence",
    "test_deferred_env_nee_dispatch_debug",
    "test_sharded_deferred_env_nee_matches_single",
    "test_env_nee_unbiased_and_lower_variance",
    "test_bvh_megakernel_deferred_env_equivalence",
    "test_brute_megakernel_deferred_env_equivalence",
    "test_bvh_regen_equivalence_cosine_rr",
    "test_combined_area_and_env_nee",
    "test_rr_unbiased",
    "test_reorder_bfs_is_traversal_invariant",
    "test_mis_unbiased_against_bsdf_only",
    # test_bvh_regen_equivalence (~8 s) stays fast on purpose: the basic
    # fused-kernel-vs-wavefront oracle belongs in the inner loop
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cornell():
    from sfvp_tpu import load_obj

    return load_obj()


@pytest.fixture(scope="session")
def cornell_buffers(cornell):
    from sfvp_tpu import upload

    return upload(cornell)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)

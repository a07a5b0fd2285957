"""Test configuration: force CPU backend with a virtual 8-device mesh.

Sharding tests run against ``--xla_force_host_platform_device_count=8`` so the full
pjit/shard_map path is exercised without TPU hardware. Note: this environment pins
``JAX_PLATFORMS=axon`` (the TPU tunnel plugin) and ignores the env-var override, so
the CPU backend must be selected via ``jax.config.update`` before first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This machine exposes a single CPU core; XLA compiles dominate test time.
# The persistent compilation cache makes re-runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

if not os.environ.get("MEDMAMBA_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Quick test tier: `-m "not slow"` finishes in ~2-3 min on this 1-core host
# (the full suite takes ~20 min; interpret-mode Pallas and full-model XLA-CPU
# compiles dominate). Membership = every test measured >13 s wall on this
# host (pytest --durations, 2026-08-17). Quick-tier kernel coverage remains:
# oracle tests for seq/assoc and the reverse-direction pallas interpret test.
_SLOW = {
    "test_export_cli", "test_export_roundtrip_polymorphic_batch",
    "test_calibration_handles_remat_model",
    "test_dropout_rngs_change_output_in_train_mode",
    "test_graft_entry_dryrun", "test_tp_partitioned_params_step",
    "test_dp_train_step_on_mesh_matches_single_device",
    "test_pallas_kernel_shard_mapped_over_mesh",
    "test_pallas_kernel_shards_batch_over_model_axis_too",
    "test_training_determinism", "test_checkpoint_roundtrip",
    "test_train_loss_decreases_and_eval",
    "test_train_cli_imagefolder_end_to_end",
    "test_vssm_seg_forward",
    "test_logit_parity_full_T_model", "test_backbone_feature_parity_small",
    "test_training_trajectory_parity", "test_long_horizon_trajectory_parity",
    "test_tiny_forward_shapes_and_finite",
    "test_batchnorm_stats_update_in_train_mode",
    "test_remat_matches_no_remat", "test_scan_impls_agree_in_model",
    "test_odd_spatial_sizes",
    "test_train_step_batch_stats_unaffected_by_padding",
    "test_mobilenet_v2", "test_swin_tiny_forward",
    "test_swin_shifted_window_runs", "test_vit_tiny_forward",
    "test_pallas_batch_packing_matches_unpacked",
    "test_pallas_interpret_mode_on_cpu",
    "test_pallas_compact_boundary_matches_assoc",
    "test_pallas_tau_chunk_fast_path_exact_in_range",
    "test_grad_cam_tiny_model",
    "test_mobilenet_v2_logits_match_reference",
    "test_pallas_nseg2_boundary_variants_match_assoc",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: excluded from the quick tier (-m 'not slow')")


@pytest.fixture(autouse=True)
def _isolate_medmamba_env():
    """CLI mains set MEDMAMBA_* knobs process-wide (scan tau / clip); tests
    invoking them must not leak those into later tests -- MEDMAMBA_SCAN_TAU
    is read live at trace time. (MEDMAMBA_SCAN_CLIP is import-time-only, so
    the in-process kernel keeps the default clip either way.)"""
    saved = {k: v for k, v in os.environ.items() if k.startswith("MEDMAMBA_")}
    yield
    for k in [k for k in os.environ if k.startswith("MEDMAMBA_")]:
        if k not in saved:
            del os.environ[k]
    os.environ.update(saved)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in _SLOW or item.name in _SLOW:
            item.add_marker(pytest.mark.slow)

"""Test harness: force an 8-virtual-device CPU backend.

Multi-host/multi-chip logic is validated without a cluster via XLA's
forced host platform device count (SURVEY.md §4 item 3).  The platform
must be set through `jax.config` (not the env var) because the container
boot hook imports jax before pytest starts, latching JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running learning tests"
    )
    config.addinivalue_line(
        "markers",
        "nightly: interpret-mode kernel validation, minutes per test"
    )


# Smoke gate (VERDICT r3 #9): `pytest -m 'not slow and not nightly'` runs the fast
# correctness suite in <2 min; the full suite is unchanged.  Tests are
# marked from measured durations (>=4 s on the 8-virtual-device CPU
# backend) rather than per-file decorators so new tests default to the
# fast gate until proven slow.
_SLOW = {
    # moved out of the smoke gate 2026-08-22 (measured >=6 s each)
    "tests/test_planar_dynamics.py::test_dispatch_unbatched_is_engine",
    "tests/test_fused_sac.py::test_fused_chain_matches_train_step_scan",
    "tests/test_fused_sac.py::test_fused_chain_in_loop_matches_scan_loop",
    "tests/test_distributed.py::test_distributed_ppo_matches_single_shard_on_identical_data",
    "tests/test_alpha_ratchet.py::test_large_reward_scale_ratchets_alpha",
    # wall-clock throughput comparison: flaky under CPU contention,
    # keep out of the smoke gate
    "tests/test_native_mujoco.py::test_native_throughput_beats_gym_path",
    "tests/test_pgs_pallas.py::test_engine_step_unchanged_on_cpu",
    "tests/test_visual.py::test_sac_ae_curl_step",
    "tests/test_distributed.py::test_params_stay_replicated",
    "tests/test_exploration_wrappers.py::test_cnn_disc",
    "tests/test_host_loops.py::test_host_on_policy_ppo_trains",
    "tests/test_distributed.py::test_distributed_epoch_runs",
    "tests/test_distributed.py::test_distributed_gail_train_call_epoch",
    "tests/test_dmc.py::test_dmc_sac_ae_host_loop_trains",
    "tests/test_gcsl_dagger.py::test_dagger_aggregates_and_learns",
    "tests/test_gcsl_dagger.py::test_gcsl_epoch_runs",
    "tests/test_gcsl_dagger.py::test_gcsl_learns_reach",
    "tests/test_harness.py::test_run_dagger_end_to_end",
    "tests/test_harness.py::test_run_experiment_end_to_end",
    "tests/test_her.py::test_her_sac_learns_sparse_reach",
    "tests/test_host_env.py::test_host_loop_trains",
    "tests/test_host_loops.py::test_host_adv_irl_train_call",
    "tests/test_host_loops.py::test_host_her_fetch_trains",
    "tests/test_host_loops.py::test_host_mbpo_trains",
    "tests/test_il.py::test_gail_mechanics",
    "tests/test_il.py::test_gail_recovers_expert_behavior",
    "tests/test_il.py::test_gail_rnn_disc_epoch",
    "tests/test_il.py::test_visual_gail_cnn_disc_epoch",
    "tests/test_locomotion.py::test_reset_distribution_bounds",
    "tests/test_locomotion.py::test_step_matches_gymnasium",
    "tests/test_locomotion.py::test_vector_autoreset_and_registry",
    "tests/test_mbpo.py::test_bnn_learns_simple_dynamics",
    "tests/test_mbpo.py::test_mbpo_end_to_end_epoch",
    "tests/test_misc_components.py::test_gen_demos_cli",
    "tests/test_misc_components.py::test_rnn_disc_shapes",
    "tests/test_offpolicy_trainers.py::test_continuous_trainer_in_loop",
    "tests/test_offpolicy_trainers.py::test_discrete_trainer_in_loop",
    "tests/test_offpolicy_trainers.py::test_td3_delayed_update",
    "tests/test_pgs_pallas.py::test_kernel_matches_fallback",
    "tests/test_pgs_pallas.py::test_custom_vmap_entry_cpu_fallback",
    "tests/test_ppo.py::test_ppo_learns_pendulum",
    "tests/test_rigid_body.py::test_ant_grounded_contacts_and_cfrc",
    "tests/test_rigid_body.py::test_forward_dynamics_matches_mujoco",
    "tests/test_rigid_body.py::test_free_joint_models_match_mujoco",
    "tests/test_rigid_body.py::test_mass_matrix_and_bias",
    "tests/test_rigid_body.py::test_quaternion_rollout_tracks_mujoco",
    "tests/test_rigid_body.py::test_rollout_tracks_mujoco",
    "tests/test_sac_loop.py::test_loop_mechanics_one_epoch",
    "tests/test_sac_loop.py::test_sac_learns_pendulum",
    "tests/test_visual.py::test_color_jitter_pixels",
    "tests/test_visual.py::test_encoder_decoder_shapes",
    "tests/test_visual.py::test_encoder_policy_separation",
    "tests/test_visual.py::test_sac_ae_train_step",
}


# Nightly tier (VERDICT r4 weak #6): interpret-mode Pallas validation
# runs the Mosaic kernels through the emulator at ~1000x slowdown —
# correctness-critical but minutes per test (the rollout test alone is
# ~13 min).  Tier contract, measured 2026-08-22 on the 2-core host:
#   smoke   `-m "not slow and not nightly"`  (~2 min)
#   slow    `-m slow`                        (<15 min)
#   nightly `-m nightly`                     (~22 min)
# The full suite (no -m) runs everything and stays green.
_NIGHTLY = {
    # (the other nightly tests carry @pytest.mark.nightly in-file:
    # test_planar_dynamics.py kernel-step + rollout tests)
    "tests/test_pgs_pallas.py::test_engine_step_unchanged_on_cpu",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in _NIGHTLY:
            item.add_marker(pytest.mark.nightly)
        elif item.get_closest_marker("nightly") is not None:
            # per-param nightly marks (e.g. the ant/humanoid gymnasium
            # parity cases) must not ALSO inherit slow, or `-m slow`
            # would still select them
            continue
        elif base in _SLOW:
            item.add_marker(pytest.mark.slow)

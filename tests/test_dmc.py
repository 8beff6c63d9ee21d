"""DMC pixel bridge (envs/host_dmc.py): step contract + SAC-AE host
loop end-to-end on tiny frames.

The reference reaches DMC through dmc2gym
(run_scripts/sac_alpha_visual_exp_script.py); these tests validate the
rebuild's equivalent: uint8 stacked frames, [-1,1] action rescale to
the action spec, truncation-only dones, and the HostOffPolicyLoop
driving the jitted SAC-AE learner from a uint8 replay ring.
"""

import numpy as np
import pytest

dm_control = pytest.importorskip("dm_control")


def _make_env(**kw):
    import os
    os.environ.setdefault("MUJOCO_GL", "egl")
    from ilswiss_tpu.envs.host_dmc import DMCVectorEnv
    try:
        env = DMCVectorEnv(**kw)
        env.reset(seed=0)
    except Exception as e:  # no GL stack in this container
        pytest.skip(f"DMC rendering unavailable: {e}")
    return env


def test_dmc_pixel_contract():
    env = _make_env(num_envs=2, seed=0, domain_name="cartpole",
                    task_name="balance", height=32, width=32,
                    frame_stack=3)
    assert env.observation_size == (32, 32, 9)
    assert env.obs_dtype == np.uint8
    obs = env.reset(seed=1)
    assert obs.shape == (2, 32, 32, 9) and obs.dtype == np.uint8
    for _ in range(4):
        prev, true_next, rew, term, done, after = env.step(
            np.random.uniform(-1, 1, (2, env.action_size)))
    assert true_next.shape == (2, 32, 32, 9)
    assert rew.shape == (2,) and rew.min() >= 0.0  # DMC rewards in [0,1]
    # DMC has no environment terminals — only time-limit truncation
    assert not term.any()
    env.close()


def test_dmc_frame_stack_rolls():
    env = _make_env(num_envs=1, seed=0, domain_name="cartpole",
                    task_name="balance", height=24, width=24,
                    frame_stack=2)
    obs = env.reset(seed=2)
    # fresh reset: both stacked frames identical
    np.testing.assert_array_equal(obs[0, :, :, :3], obs[0, :, :, 3:])
    _, true_next, *_ = env.step(np.ones((1, env.action_size)))
    _, true_next2, *_ = env.step(np.ones((1, env.action_size)))
    # after two steps the newest frame sits in the last channels
    np.testing.assert_array_equal(
        true_next[0, :, :, 3:], true_next2[0, :, :, :3])
    env.close()


def test_dmc_sac_ae_host_loop_trains():
    from ilswiss_tpu.algorithms.sac_ae import SACAE, SACAEConfig
    from ilswiss_tpu.runtime.host_loop import (
        HostLoopConfig, HostOffPolicyLoop,
    )

    env = _make_env(num_envs=2, seed=0, domain_name="cartpole",
                    task_name="balance", height=32, width=32,
                    frame_stack=2, max_episode_steps=25)
    algo = SACAE(
        action_size=env.action_size,
        config=SACAEConfig(image_size=32, frame_channels=6,
                           feature_dim=16, num_conv_layers=2,
                           num_filters=8),
        net_size=32, num_hidden_layers=1,
    )
    loop = HostOffPolicyLoop(env, algo, HostLoopConfig(
        batch_size=8, replay_capacity=256,
        steps_between_train_calls=8, train_steps_per_call=2,
        min_steps_before_training=16, overlap_collection=False,
    ))
    runner = loop.init(seed=0)
    assert runner.replay.data["obs"].dtype == np.uint8
    runner = loop.warmup(runner)
    runner, metrics = loop.train_epoch(runner, 16)
    assert np.isfinite(metrics["qf1_loss"])
    stats = loop.evaluate(runner, num_episodes=2, seed=3)
    assert np.isfinite(stats["AverageReturn"])
    env.close()

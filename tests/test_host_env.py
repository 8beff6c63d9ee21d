"""Host MuJoCo bridge: GymVectorEnv + host actor-learner loop
(reference vecenvs/envpool equivalent for C-engine simulators)."""

import numpy as np
import pytest

import jax

from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.envs.host_mujoco import GYM_ENV_IDS, GymVectorEnv
from ilswiss_tpu.runtime.host_loop import HostLoopConfig, HostOffPolicyLoop


@pytest.fixture(scope="module")
def hopper_vec():
    env = GymVectorEnv("hopper", num_envs=4, seed=0)
    yield env
    env.close()


def test_env_registry_covers_reference_names():
    for name in ("hopper", "walker", "halfcheetah", "ant", "humanoid",
                 "swimmer", "invertedpendulum",
                 "inverteddoublependulum"):
        assert name in GYM_ENV_IDS


def test_reset_and_step_shapes(hopper_vec):
    obs = hopper_vec.reset(seed=0)
    assert obs.shape == (4, 11)
    acts = np.zeros((4, 3), np.float32)
    obs_prev, true_next, reward, terminal, done, obs_after = (
        hopper_vec.step(acts))
    np.testing.assert_allclose(obs_prev, obs)
    assert reward.shape == (4,)
    assert true_next.shape == (4, 11)


def test_action_scaling_to_env_bounds(hopper_vec):
    scaled = hopper_vec._scale(np.ones((4, 3), np.float32))
    np.testing.assert_allclose(
        scaled, np.broadcast_to(hopper_vec.action_high, (4, 3)))
    scaled = hopper_vec._scale(-np.ones((4, 3), np.float32))
    np.testing.assert_allclose(
        scaled, np.broadcast_to(hopper_vec.action_low, (4, 3)))


def test_autoreset_provides_true_next_obs():
    env = GymVectorEnv("hopper", num_envs=2, seed=0,
                       max_episode_steps=5)
    env.reset(seed=0)
    done_seen = False
    for _ in range(6):
        acts = np.random.uniform(-1, 1, (2, 3)).astype(np.float32)
        obs_prev, true_next, reward, terminal, done, obs_after = (
            env.step(acts))
        if done.any():
            done_seen = True
            i = int(np.nonzero(done)[0][0])
            # post-reset obs differs from the terminal obs
            assert not np.allclose(true_next[i], obs_after[i])
    env.close()
    assert done_seen


def test_deterministic_seeding():
    e1 = GymVectorEnv("hopper", num_envs=2, seed=7)
    e2 = GymVectorEnv("hopper", num_envs=2, seed=7)
    np.testing.assert_allclose(e1.reset(), e2.reset())
    e1.close()
    e2.close()


def test_host_loop_trains(hopper_vec):
    sac = SAC(11, 3, SACConfig(), net_size=32, num_hidden_layers=1)
    loop = HostOffPolicyLoop(hopper_vec, sac, HostLoopConfig(
        batch_size=32, replay_capacity=4096,
        steps_between_train_calls=64, train_steps_per_call=16,
        min_steps_before_training=64))
    runner = loop.init(seed=0)
    runner = loop.warmup(runner)
    runner, metrics = loop.train_epoch(runner, steps_per_epoch=128)
    assert np.isfinite(metrics["qf1_loss"])
    assert runner.total_env_steps >= 128
    stats = loop.evaluate(runner, num_episodes=2)
    assert np.isfinite(stats["AverageReturn"])

"""Host-env loops beyond plain off-policy: on-policy (PPO), AdvIRL
train_call dispatch, and the host-side demo-stats / absorbing wrappers
(reference adv_irl_exp_script.py + ppo_exp_script.py on MuJoCo envs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ilswiss_tpu.algorithms.adv_irl import AdvIRL, AdvIRLConfig
from ilswiss_tpu.algorithms.ppo import PPO, PPOConfig
from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.data.demo import (
    demo_obs_stats, demos_to_replay_state, scale_demos,
)
from ilswiss_tpu.envs.host_mujoco import (
    AbsorbingHostEnv, GymVectorEnv, MinmaxHostEnv, ScaledHostEnv,
)
from ilswiss_tpu.runtime.host_loop import (
    HostLoopConfig, HostOffPolicyLoop, HostOnPolicyLoop,
)


@pytest.fixture(scope="module")
def hopper_vec():
    env = GymVectorEnv("hopper", num_envs=4, seed=0)
    yield env
    env.close()


def _random_demos(obs_size=11, action_size=3, n=256):
    rng = np.random.RandomState(0)
    terminal = np.zeros(n)
    terminal[63] = 1.0  # one episode boundary
    return demos_to_replay_state(
        rng.randn(n, obs_size).astype(np.float32),
        rng.uniform(-1, 1, (n, action_size)).astype(np.float32),
        rng.randn(n).astype(np.float32),
        rng.randn(n, obs_size).astype(np.float32),
        terminal,
    )


# ---------------------------------------------------------------------
def test_host_on_policy_ppo_trains(hopper_vec):
    ppo = PPO(11, 3, PPOConfig(mini_batch_size=32, update_epoch=2),
              net_size=32, num_hidden_layers=1)
    loop = HostOnPolicyLoop(hopper_vec, ppo, rollout_length=16)
    runner = loop.init(seed=0)
    runner, metrics = loop.train_epoch(runner, steps_per_epoch=128)
    assert np.isfinite(metrics["pg_loss"])
    assert np.isfinite(metrics["vf_loss"])
    assert runner.total_env_steps >= 128
    stats = loop.evaluate(runner, num_episodes=2)
    assert np.isfinite(stats["AverageReturn"])


def test_host_on_policy_obs_norm(hopper_vec):
    ppo = PPO(11, 3, PPOConfig(mini_batch_size=32, update_epoch=1),
              net_size=32, num_hidden_layers=1)
    loop = HostOnPolicyLoop(hopper_vec, ppo, rollout_length=8,
                            normalize_obs=True)
    runner = loop.init(seed=0)
    runner, metrics = loop.train_epoch(runner, steps_per_epoch=64)
    assert np.isfinite(metrics["pg_loss"])
    # running moments absorbed the rollout
    assert float(runner.obs_rms.count) > 1.0


def test_host_adv_irl_train_call(hopper_vec):
    demos = _random_demos()
    sac = SAC(11, 3, SACConfig(), net_size=32, num_hidden_layers=1)
    algo = AdvIRL(11, 3, sac, demos, AdvIRLConfig(
        mode="gail", disc_optim_batch_size=32,
        policy_optim_batch_size=32, disc_hid_dim=32,
        disc_use_bn=False))
    loop = HostOffPolicyLoop(hopper_vec, algo, HostLoopConfig(
        batch_size=32, replay_capacity=4096,
        steps_between_train_calls=64, min_steps_before_training=64,
        no_terminal=True))
    runner = loop.init(seed=0)
    runner = loop.warmup(runner)
    # no_terminal: everything stored with terminal=0
    assert float(jnp.max(runner.replay.data["terminal"])) == 0.0
    runner, metrics = loop.train_epoch(runner, steps_per_epoch=128)
    assert np.isfinite(metrics["disc_ce_loss"])
    assert np.isfinite(metrics["disc_rew_mean"])
    assert 0.0 <= metrics["disc_acc"] <= 1.0


def test_host_her_fetch_trains():
    from ilswiss_tpu.algorithms.her import (
        HER, HERLoopConfig, HostHERLoop,
    )
    from ilswiss_tpu.algorithms.td3 import TD3, TD3Config
    from ilswiss_tpu.envs.host_mujoco import HostGoalVectorEnv

    env = HostGoalVectorEnv("fetch-reach", num_envs=2, seed=0,
                            max_episode_steps=10)
    assert env.goal_size == 3
    inner = TD3(env.observation_size + env.goal_size, env.action_size,
                TD3Config(q_target_min=-1.0 / (1.0 - 0.98),
                          q_target_max=0.0),
                net_size=32, num_hidden_layers=1)
    her = HER(inner)
    loop = HostHERLoop(env, her,
                       HERLoopConfig(batch_size=16,
                                     num_episode_slots=8),
                       grad_steps_per_segment=4, segment_steps=40)
    runner = loop.warmup(loop.init(seed=0))
    runner, metrics = loop.train_epoch(runner, steps_per_epoch=40)
    assert np.isfinite(metrics["qf1_loss"])
    stats = loop.evaluate(runner, num_episodes=2)
    assert "SuccessRate" in stats and 0.0 <= stats["SuccessRate"] <= 1.0
    # sparse fetch reward is in {-1, 0}
    r = np.asarray(runner.replay.data["reward"])
    assert set(np.unique(r)).issubset({-1.0, 0.0})
    env.close()


def test_host_goal_env_compute_reward():
    from ilswiss_tpu.envs.host_mujoco import HostGoalVectorEnv
    env = HostGoalVectorEnv("fetch-reach", num_envs=1, seed=0,
                            max_episode_steps=10)
    ag = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.04]])
    dg = jnp.zeros((2, 3))
    r = env.compute_reward(ag, dg)
    np.testing.assert_allclose(np.asarray(r), [0.0, 0.0])  # within thr
    far = jnp.asarray([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(env.compute_reward(far, jnp.zeros((1, 3)))), [-1.0])
    env.close()


def test_host_mbpo_trains(hopper_vec):
    from ilswiss_tpu.algorithms.bnn_trainer import BNNTrainerConfig
    from ilswiss_tpu.algorithms.mbpo import (
        HostMBPOLoop, MBPO, MBPOConfig,
    )
    from ilswiss_tpu.envs.terminals import get_terminal_func

    sac = SAC(11, 3, SACConfig(), net_size=32, num_hidden_layers=1)
    mbpo = MBPO(
        None, sac, get_terminal_func("hopper"),
        obs_size=11, action_size=3, num_envs=4,
        config=MBPOConfig(
            model_train_freq=32, rollout_batch_size=64,
            real_ratio=0.1, rollout_schedule=(0, 1, 1, 2),
            batch_size=32, replay_capacity=4096,
            min_steps_before_training=64, max_path_length=100),
        bnn_config=BNNTrainerConfig(
            num_nets=3, num_elites=2, hidden_sizes=(32,),
            batch_size=32, max_epochs=2, holdout_ratio=0.2),
    )
    loop = HostMBPOLoop(hopper_vec, mbpo, grad_steps_per_env_step=0.5)
    runner = loop.warmup(loop.init(seed=0))
    runner, metrics = loop.train_epoch(runner, epoch=5,
                                       steps_per_epoch=64)
    assert np.isfinite(metrics["qf1_loss"])
    assert int(jax.device_get(runner.model_replay.size)) > 0
    assert int(jax.device_get(runner.total_env_steps)) >= 96
    stats = loop.evaluate(runner, num_episodes=2)
    assert np.isfinite(stats["AverageReturn"])


# ---------------------------------------------------------------------
def test_scaled_host_env_round_trip():
    inner = GymVectorEnv("hopper", num_envs=2, seed=0)
    mean = np.arange(11, dtype=np.float32) * 0.1
    std = np.ones(11, np.float32) * 2.0
    env = ScaledHostEnv(inner, mean, std)
    raw = inner.reset(seed=0)
    scaled = env.reset(seed=0)
    np.testing.assert_allclose(scaled, (raw - mean) / (std + 1e-8),
                               rtol=1e-5)
    env.close()


def test_minmax_host_env():
    inner = GymVectorEnv("hopper", num_envs=2, seed=0)
    lo = -np.ones(11, np.float32)
    hi = np.ones(11, np.float32)
    env = MinmaxHostEnv(inner, lo, hi)
    raw = inner.reset(seed=0)
    scaled = env.reset(seed=0)
    np.testing.assert_allclose(scaled, (raw - lo) / (hi - lo + 1e-8),
                               rtol=1e-5)
    env.close()


def test_absorbing_host_env_flow():
    inner = GymVectorEnv("hopper", num_envs=2, seed=0,
                         max_episode_steps=400)
    env = AbsorbingHostEnv(inner)
    assert env.observation_size == 12
    obs = env.reset(seed=0)
    assert obs.shape == (2, 12)
    np.testing.assert_allclose(obs[:, -1], 0.0)

    rng = np.random.RandomState(0)
    entered = False
    for _ in range(300):
        act = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
        obs_prev, true_next, reward, terminal, done, obs_after = (
            env.step(act))
        if entered:
            # previous step entered absorbing: this is the self-loop row
            i = idx
            assert obs_prev[i, -1] == 1.0
            np.testing.assert_allclose(obs_prev[i, :-1], 0.0)
            assert reward[i] == 0.0
            assert terminal[i] and done[i]
            # stream rejoins a live obs
            assert obs_after[i, -1] == 0.0
            break
        hit = np.logical_and(true_next[:, -1] > 0.5, ~done)
        if hit.any():
            entered = True
            idx = int(np.nonzero(hit)[0][0])
            # entering absorbing: not an episode end yet, next obs is
            # the absorbing state
            assert not terminal[idx]
            assert obs_after[idx, -1] == 1.0
    env.close()
    assert entered, "no termination observed in 300 steps"


def test_demo_scaling_matches_stats():
    demos = _random_demos()
    stats = demo_obs_stats(demos)
    scaled = scale_demos(demos, stats["obs_mean"], stats["obs_std"])
    obs = np.asarray(scaled.data["obs"])
    np.testing.assert_allclose(obs.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(obs.std(axis=0), 1.0, atol=1e-4)

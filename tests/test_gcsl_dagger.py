"""GCSL and DAgger coverage (reference rlkit/torch/algorithms/{gcsl,dagger})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.bc import BC, BCConfig
from ilswiss_tpu.algorithms.dagger import DAggerLoop, DAggerLoopConfig
from ilswiss_tpu.algorithms.gcsl import GCSL, GCSLConfig, GCSLLoop
from ilswiss_tpu.algorithms.her import HERLoopConfig
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.envs.experts import pendulum_expert
from ilswiss_tpu.runtime.collector import collect_transitions
from ilswiss_tpu.runtime.evaluator import make_evaluator


def test_gcsl_act_uses_eval_horizon():
    """Pins the deployed-horizon behavior: act() conditions on the
    configured eval_horizon one-hot (default 0 = greedy), matching the
    GCSLConfig docstring — not on horizon = max."""
    gcsl = GCSL(obs_size=2, goal_size=2, action_size=1,
                config=GCSLConfig(mode="MSE", max_horizon=8,
                                  eval_horizon=3),
                net_size=16, num_hidden_layers=1)
    state = gcsl.init(jax.random.PRNGKey(0))
    obs = {"observation": jnp.ones((4, 2)),
           "desired_goal": jnp.zeros((4, 2))}
    a_act = gcsl.act(state, obs, jax.random.PRNGKey(1),
                     deterministic=True)
    # reproduce act() by hand with the horizon the config promises
    x = jnp.concatenate(
        [obs["observation"], obs["desired_goal"],
         jax.nn.one_hot(jnp.full((4,), 3), 8)], axis=-1)
    mean, _ = gcsl.policy.apply(state.policy_params, x)
    np.testing.assert_allclose(np.asarray(a_act),
                               np.asarray(jnp.tanh(mean)), rtol=1e-6)
    # and confirm a different horizon actually changes the input/output
    x_max = jnp.concatenate(
        [obs["observation"], obs["desired_goal"],
         jax.nn.one_hot(jnp.full((4,), 7), 8)], axis=-1)
    mean_max, _ = gcsl.policy.apply(state.policy_params, x_max)
    assert not np.allclose(np.asarray(mean), np.asarray(mean_max))


def test_gcsl_epoch_runs():
    vec = make_vec("reach2d", num_envs=4)
    gcsl = GCSL(
        obs_size=vec.env.observation_size, goal_size=vec.env.goal_size,
        action_size=vec.env.action_size,
        config=GCSLConfig(mode="MSE", max_horizon=50),
        net_size=32, num_hidden_layers=1,
    )
    loop = GCSLLoop(vec, gcsl,
                    HERLoopConfig(batch_size=64, num_episode_slots=64,
                                  grad_steps_per_iter=2))
    warmup, epoch = loop.build(steps_per_epoch=200)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    runner, metrics = epoch(runner)
    assert np.isfinite(float(metrics["gcsl_loss"]))


@pytest.mark.slow
def test_gcsl_learns_reach():
    vec = make_vec("reach2d", num_envs=16)
    gcsl = GCSL(
        obs_size=vec.env.observation_size, goal_size=vec.env.goal_size,
        action_size=vec.env.action_size,
        config=GCSLConfig(mode="MSE", max_horizon=50),
        net_size=64, num_hidden_layers=2,
    )
    loop = GCSLLoop(vec, gcsl,
                    HERLoopConfig(batch_size=128, num_episode_slots=512,
                                  grad_steps_per_iter=8))
    warmup, epoch = loop.build(steps_per_epoch=4000)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    ev = make_evaluator(
        vec, lambda s, o, k: gcsl.act(s, o, k, deterministic=True), 50)
    for _ in range(6):
        runner, _ = epoch(runner)
    ret = float(ev(runner.algo_state, jax.random.PRNGKey(9))["AverageReturn"])
    assert ret > -30, ret  # random ~ -48


def test_dagger_aggregates_and_learns():
    vec8 = make_vec("pendulum", num_envs=8)
    demos = collect_transitions(
        vec8, lambda o, k: pendulum_expert(o), 200, jax.random.PRNGKey(3))
    bc = BC(3, 1, BCConfig(mode="MSE"), net_size=32, num_hidden_layers=1)
    loop = DAggerLoop(
        vec8, bc, lambda obs: pendulum_expert(obs), demos,
        DAggerLoopConfig(batch_size=64, aggregate_capacity=8192,
                         grad_steps_per_iter=2),
    )
    runner = loop.init(jax.random.PRNGKey(0))
    n0 = int(runner.aggregate.size)
    assert n0 == int(demos.size)  # seeded with expert data
    pretrain, epoch = loop.build(steps_per_epoch=128,
                                 initial_train_steps=100)
    runner = pretrain(runner)
    runner, metrics = epoch(runner)
    assert int(runner.aggregate.size) > n0  # relabeled rollouts added
    assert np.isfinite(float(metrics["bc_loss"]))
    # relabeled actions are the expert's, not the learner's
    idx = n0 + 1
    stored_obs = runner.aggregate.data["obs"][idx][None]
    stored_act = runner.aggregate.data["action"][idx][None]
    np.testing.assert_allclose(
        np.asarray(pendulum_expert(stored_obs)),
        np.asarray(stored_act), atol=1e-5)

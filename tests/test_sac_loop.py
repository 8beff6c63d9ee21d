"""End-to-end gate: SAC(auto-alpha) learns Pendulum (SURVEY.md §7.2).

Fast smoke of the fused loop mechanics plus a short learning run on the
CPU backend.  The learning assertion is deliberately loose (beat the
random-policy floor by a wide margin), keeping the test quick while
catching sign/masking/target bugs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.runtime.evaluator import make_evaluator
from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop


def _build(num_envs=8, **sac_overrides):
    vec = make_vec("pendulum", num_envs=num_envs)
    sac = SAC(
        obs_size=vec.env.observation_size,
        action_size=vec.env.action_size,
        config=SACConfig(
            reward_scale=2.0, qf_lr=1e-3, **sac_overrides
        ),
        net_size=64, num_hidden_layers=2,
    )
    loop = OffPolicyLoop(
        vec, sac,
        OffPolicyConfig(
            batch_size=128, replay_capacity=20_000,
            min_steps_before_training=500,
        ),
    )
    return vec, sac, loop


def test_loop_mechanics_one_epoch():
    vec, sac, loop = _build(num_envs=4)
    warmup, train_epoch = loop.build(steps_per_epoch=64)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)
    assert int(runner.total_env_steps) >= 500 // 4 * 4
    runner, metrics = train_epoch(runner)
    assert np.isfinite(float(metrics["qf1_loss"]))
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["alpha"]))
    assert int(runner.total_env_steps) > 500


def test_eval_runs_and_is_finite():
    vec, sac, loop = _build(num_envs=4)
    runner = loop.init(jax.random.PRNGKey(0))
    ev = make_evaluator(
        vec, lambda s, o, k: sac.act(s, o, k, deterministic=True),
        max_path_length=200,
    )
    stats = ev(runner.algo_state, jax.random.PRNGKey(1))
    r = float(stats["AverageReturn"])
    assert np.isfinite(r)
    assert -2000 < r <= 0  # pendulum return range over 200 steps


@pytest.mark.slow
def test_sac_learns_pendulum():
    vec, sac, loop = _build(num_envs=8)
    warmup, train_epoch = loop.build(steps_per_epoch=2000)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)
    ev = make_evaluator(
        vec, lambda s, o, k: sac.act(s, o, k, deterministic=True),
        max_path_length=200,
    )
    before = float(ev(runner.algo_state, jax.random.PRNGKey(1))["AverageReturn"])
    for _ in range(8):  # 16k env steps, 16k grad steps
        runner, metrics = train_epoch(runner)
    after = float(ev(runner.algo_state, jax.random.PRNGKey(2))["AverageReturn"])
    # random policy ~= -1200; a learning SAC passes -700 easily by 16k steps
    assert after > -700, (before, after)
    assert after > before

"""PPO trainer + on-policy loop tests, incl. a CPU learning gate on
Pendulum (reference trains PPO per exp_specs/ppo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.ppo import PPO, PPOConfig
from ilswiss_tpu.envs import make_vec
from ilswiss_tpu.runtime.evaluator import make_evaluator
from ilswiss_tpu.runtime.onpolicy import OnPolicyConfig, OnPolicyLoop


def _build(num_envs=8, T=64, **cfg):
    cfg.setdefault("mini_batch_size", 64)
    cfg.setdefault("update_epoch", 4)
    vec = make_vec("pendulum", num_envs=num_envs)
    ppo = PPO(3, 1, PPOConfig(**cfg), net_size=64, num_hidden_layers=2)
    loop = OnPolicyLoop(vec, ppo, OnPolicyConfig(rollout_length=T))
    return vec, ppo, loop


def test_onpolicy_epoch_mechanics():
    vec, ppo, loop = _build(num_envs=4, T=32)
    warmup, epoch = loop.build(steps_per_epoch=4 * 32 * 2)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)
    runner, metrics = epoch(runner)
    assert np.isfinite(float(metrics["pg_loss"]))
    assert np.isfinite(float(metrics["vf_loss"]))
    assert int(runner.total_env_steps) == 4 * 32 * 2


def test_ratio_is_one_on_first_pass():
    # With update_epoch=1 and a single minibatch == full batch, the first
    # surrogate ratio is exp(logp - fixed_logp) == 1, so pg_loss ==
    # -mean(adv) ~= 0 under global advantage normalization.
    vec, ppo, loop = _build(num_envs=2, T=32,
                            update_epoch=1)
    runner = loop.init(jax.random.PRNGKey(0))
    # one manual iteration
    new_runner, metrics = jax.jit(loop._iter)(runner)
    assert abs(float(metrics["pg_loss"])) < 0.2


@pytest.mark.slow
def test_ppo_learns_pendulum():
    vec, ppo, loop = _build(num_envs=16, T=128, update_epoch=10)
    warmup, epoch = loop.build(steps_per_epoch=16 * 128 * 4)
    runner = loop.init(jax.random.PRNGKey(0))
    ev = make_evaluator(
        vec, lambda s, o, k: ppo.act(s, o, k, deterministic=True),
        max_path_length=200,
    )
    before = float(ev(runner.algo_state, jax.random.PRNGKey(1))["AverageReturn"])
    for _ in range(12):  # ~100k env steps
        runner, metrics = epoch(runner)
    after = float(ev(runner.algo_state, jax.random.PRNGKey(2))["AverageReturn"])
    assert after > before + 200, (before, after)

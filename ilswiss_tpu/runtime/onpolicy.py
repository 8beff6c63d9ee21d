"""Fused on-policy loop: rollout scan + PPO-style update in one jit.

Replaces the reference's on-policy dispatch
(TorchRLAlgorithm._do_training on_policy branch,
torch_rl_algorithm.py:28-34: `sample_all_trajs` -> trainer.train_step
-> `clear_buffer`).  The replay-buffer-as-rollout-store disappears: the
acting `lax.scan` *is* the rollout buffer — a fixed [T, B, ...] stack
handed straight to the trainer, cleared by construction every iteration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.envs.base import EnvState
from ilswiss_tpu.envs.vector import VectorEnv
from ilswiss_tpu.utils.running_stats import (
    normalize, running_mean_std_init, running_mean_std_update,
)


@dataclass(frozen=True)
class OnPolicyConfig:
    rollout_length: int = 128  # T env steps per update (per env)
    # Running observation normalization (the reference vec-env's
    # obs_rms, rlkit/envs/vecenvs.py:102-107,299-327): moments update
    # from each rollout, policy/value see normalized observations.
    normalize_obs: bool = False
    obs_clip: float = 10.0


@struct.dataclass
class OnPolicyRunnerState:
    rng: jax.Array
    env_state: EnvState
    algo_state: Any
    total_env_steps: jnp.ndarray
    obs_rms: Any = None


class OnPolicyLoop:
    """Works for any algo with `init`, `act`, and a rollout-consuming
    `train_step(state, rollout, key)` (PPO; later A2C/TRPO-style)."""

    def __init__(self, vec_env: VectorEnv, algo,
                 config: OnPolicyConfig = OnPolicyConfig()):
        self.vec_env = vec_env
        self.algo = algo
        self.config = config

    def init(self, key: jax.Array) -> OnPolicyRunnerState:
        k_env, k_algo = jax.random.split(key)
        obs_rms = (
            running_mean_std_init((self.vec_env.env.observation_size,))
            if self.config.normalize_obs else None
        )
        return OnPolicyRunnerState(
            rng=key,
            env_state=self.vec_env.reset(k_env),
            algo_state=self.algo.init(k_algo),
            total_env_steps=jnp.zeros((), jnp.int32),
            obs_rms=obs_rms,
        )

    def _norm(self, runner, obs):
        if runner.obs_rms is None:
            return obs
        return normalize(runner.obs_rms, obs, self.config.obs_clip)

    def _iter(self, runner: OnPolicyRunnerState):
        T = self.config.rollout_length

        def env_step(carry, key):
            env_state = carry
            action = self.algo.act(
                runner.algo_state, self._norm(runner, env_state.obs), key)
            new_state, tr = self.vec_env.step(env_state, action)
            return new_state, tr

        rng, k_roll, k_train = jax.random.split(runner.rng, 3)
        keys = jax.random.split(k_roll, T)
        env_state, trs = jax.lax.scan(env_step, runner.env_state, keys)

        obs_rms = runner.obs_rms
        if obs_rms is not None:
            obs_rms = running_mean_std_update(
                obs_rms, trs.obs.reshape(-1, trs.obs.shape[-1]),
                axis_name=getattr(self.algo, "axis_name", None),
            )
        rollout = {
            "obs": self._norm(runner.replace(obs_rms=obs_rms), trs.obs),
            "action": trs.action,
            "reward": trs.reward,
            "terminal": trs.terminal,
            "done": trs.done,
            "last_obs": self._norm(
                runner.replace(obs_rms=obs_rms), env_state.obs),
        }
        algo_state, metrics = self.algo.train_step(
            runner.algo_state, rollout, k_train
        )
        # rollout-level return diagnostics
        metrics["rollout_reward_mean"] = jnp.mean(trs.reward)
        steps = T * self.vec_env.num_envs
        return OnPolicyRunnerState(
            rng=rng,
            env_state=env_state,
            algo_state=algo_state,
            total_env_steps=runner.total_env_steps + steps,
            obs_rms=obs_rms,
        ), metrics

    def epoch_fns(self, steps_per_epoch: int) -> tuple[Callable, Callable]:
        iters = max(
            1, steps_per_epoch
            // (self.config.rollout_length * self.vec_env.num_envs)
        )

        def epoch_fn(runner):
            def body(r, _):
                return self._iter(r)
            runner, metrics = jax.lax.scan(body, runner, None, length=iters)
            return runner, jax.tree.map(jnp.mean, metrics)

        def warmup_fn(runner):  # on-policy has no warmup; parity shape
            return runner

        return warmup_fn, epoch_fn

    def build(self, steps_per_epoch: int):
        warmup_fn, epoch_fn = self.epoch_fns(steps_per_epoch)
        return (
            jax.jit(warmup_fn, donate_argnums=0),
            jax.jit(epoch_fn, donate_argnums=0),
        )

"""HER: hindsight experience replay over an inner off-policy trainer.

Rebuild of the reference HER stack (rlkit/torch/algorithms/her/): the
algorithm class itself only swaps in the relabeling buffer
(her/her.py:8-43); the per-trainer variants concat goals into the
network inputs (her/sac.py:80+, her/td3.py:96-100 `torch.cat([obs,
goals])`).  Here `HER` is a thin adapter giving any trainer
goal-concatenated views, and `HERLoop` is the off-policy loop over the
episodic hindsight buffer.

For the TD3 inner trainer, pass TD3Config(q_target_min=-1/(1-gamma),
q_target_max=0) to reproduce the reference's target clipping
(her/td3.py:79-86).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.data.her import HindsightReplayBuffer, HindsightReplayState
from ilswiss_tpu.envs.base import EnvState
from ilswiss_tpu.envs.vector import VectorEnv


def goal_concat(obs_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(
        [obs_dict["observation"], obs_dict["desired_goal"]], axis=-1
    )


class HER:
    """Adapter: inner trainer sees concat(observation, desired_goal)."""

    def __init__(self, policy_trainer):
        self.inner = policy_trainer

    def init(self, key: jax.Array):
        return self.inner.init(key)

    def act(self, state, obs_dict, key, deterministic: bool = False):
        return self.inner.act(
            state, goal_concat(obs_dict), key, deterministic=deterministic
        )

    def train_step(self, state, her_batch: Dict[str, jnp.ndarray], key):
        batch = {
            "obs": jnp.concatenate(
                [her_batch["observation"], her_batch["desired_goal"]],
                axis=-1,
            ),
            "action": her_batch["action"],
            "reward": her_batch["reward"],
            "terminal": her_batch["terminal"],
            # the relabeled goal applies to both ends of the transition
            # (relabel_replay_buffer.py:104-117)
            "next_obs": jnp.concatenate(
                [her_batch["next_observation"], her_batch["desired_goal"]],
                axis=-1,
            ),
        }
        return self.inner.train_step(state, batch, key)


@dataclass(frozen=True)
class HERLoopConfig:
    batch_size: int = 256
    num_episode_slots: int = 1024
    grad_steps_per_iter: int | None = None
    min_episodes_before_training: int = 2  # per env


@struct.dataclass
class HERRunnerState:
    rng: jax.Array
    env_state: EnvState
    replay: HindsightReplayState
    algo_state: Any
    total_env_steps: jnp.ndarray


class HERLoop:
    def __init__(self, vec_env: VectorEnv, her: HER,
                 config: HERLoopConfig = HERLoopConfig(),
                 relabel_type: str = "future", her_ratio: float = 0.8):
        self.vec_env = vec_env
        self.algo = her
        self.config = config
        self.buffer = HindsightReplayBuffer(
            vec_env.env, vec_env.num_envs,
            config.num_episode_slots, vec_env.env.max_episode_steps,
            relabel_type=relabel_type, her_ratio=her_ratio,
        )
        self.grad_steps_per_iter = (
            config.grad_steps_per_iter
            if config.grad_steps_per_iter is not None
            else vec_env.num_envs
        )

    def init(self, key: jax.Array) -> HERRunnerState:
        k_env, k_algo = jax.random.split(key)
        return HERRunnerState(
            rng=key,
            env_state=self.vec_env.reset(k_env),
            replay=self.buffer.init(),
            algo_state=self.algo.init(k_algo),
            total_env_steps=jnp.zeros((), jnp.int32),
        )

    def _collect(self, runner: HERRunnerState, random_actions: bool
                 ) -> HERRunnerState:
        rng, k_act = jax.random.split(runner.rng)
        if random_actions:
            action = jax.random.uniform(
                k_act,
                (self.vec_env.num_envs, self.vec_env.env.action_size),
                minval=-1.0, maxval=1.0,
            )
        else:
            action = self.algo.act(
                runner.algo_state, runner.env_state.obs, k_act
            )
        env_state, tr = self.vec_env.step(runner.env_state, action)
        return HERRunnerState(
            rng=rng,
            env_state=env_state,
            replay=self.buffer.add(runner.replay, tr),
            algo_state=runner.algo_state,
            total_env_steps=runner.total_env_steps + self.vec_env.num_envs,
        )

    def _train_iter(self, runner: HERRunnerState):
        runner = self._collect(runner, random_actions=False)

        def grad_step(carry, key):
            algo_state = carry
            k_s, k_t = jax.random.split(key)
            batch = self.buffer.sample(
                runner.replay, k_s, self.config.batch_size
            )
            algo_state, metrics = self.algo.train_step(
                algo_state, batch, k_t
            )
            return algo_state, metrics

        rng, k = jax.random.split(runner.rng)
        algo_state, metrics = jax.lax.scan(
            grad_step, runner.algo_state,
            jax.random.split(k, self.grad_steps_per_iter),
        )
        return runner.replace(
            rng=rng, algo_state=algo_state
        ), jax.tree.map(jnp.mean, metrics)

    def build(self, steps_per_epoch: int):
        num_envs = self.vec_env.num_envs
        # warm up until every env completed min_episodes episodes
        warmup_iters = (
            self.config.min_episodes_before_training
            * self.vec_env.env.max_episode_steps
        )
        epoch_iters = max(1, steps_per_epoch // num_envs)

        @jax.jit
        def warmup(runner):
            def body(r, _):
                return self._collect(r, random_actions=True), None
            runner, _ = jax.lax.scan(
                body, runner, None, length=warmup_iters
            )
            return runner

        @jax.jit
        def train_epoch(runner):
            def body(r, _):
                return self._train_iter(r)
            runner, metrics = jax.lax.scan(
                body, runner, None, length=epoch_iters
            )
            return runner, jax.tree.map(jnp.mean, metrics)

        return warmup, train_epoch

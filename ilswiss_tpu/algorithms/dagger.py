"""DAgger: dataset aggregation imitation learning.

Rebuild of the reference DAgger (rlkit/torch/algorithms/dagger/dagger.py,
subclassing BC): the learner's buffer is seeded with expert demos
(dagger.py:28-36), then each on-policy rollout is stored with actions
RELABELED by the queried expert (dagger.py:45-71), and BC training runs
on the aggregated buffer.  Initial epochs can train on expert data only
(dagger.py:38-43, `num_initial_train_steps`).

`expert_fn(obs) -> action` is the queried expert (a scripted controller
or frozen trained policy; the reference unscales/rescales around a
loaded expert — our envs take normalized actions throughout).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.algorithms.bc import BC
from ilswiss_tpu.data.replay import (
    ReplayState, replay_add, replay_init, replay_sample,
)
from ilswiss_tpu.envs.vector import VectorEnv


@dataclass(frozen=True)
class DAggerLoopConfig:
    batch_size: int = 256
    aggregate_capacity: int = 200_000
    grad_steps_per_iter: int | None = None


@struct.dataclass
class DAggerRunnerState:
    rng: jax.Array
    env_state: object
    aggregate: ReplayState
    algo_state: object
    total_env_steps: jnp.ndarray


class DAggerLoop:
    def __init__(self, vec_env: VectorEnv, bc: BC,
                 expert_fn: Callable, expert_replay: ReplayState,
                 config: DAggerLoopConfig = DAggerLoopConfig()):
        self.vec_env = vec_env
        self.algo = bc
        self.expert_fn = expert_fn
        self.expert_replay = expert_replay
        self.config = config
        self.grad_steps_per_iter = (
            config.grad_steps_per_iter or vec_env.num_envs
        )

    def init(self, key: jax.Array) -> DAggerRunnerState:
        k_env, k_algo = jax.random.split(key)
        env = self.vec_env.env
        agg = replay_init(
            self.config.aggregate_capacity, env.observation_size,
            env.action_size, write_batch=self.vec_env.num_envs,
        )
        # seed with expert demos (dagger.py:28-36): bulk-copy the demo
        # arrays into the front of the aggregate ring
        n = int(self.expert_replay.size)
        data = dict(agg.data)
        for k in data:
            data[k] = data[k].at[:n].set(self.expert_replay.data[k][:n])
        cap = data["reward"].shape[0]
        agg = agg.replace(
            data=data,
            ptr=jnp.asarray(n % cap, jnp.int32),
            size=jnp.asarray(n, jnp.int32),
        )
        return DAggerRunnerState(
            rng=key,
            env_state=self.vec_env.reset(k_env),
            aggregate=agg,
            algo_state=self.algo.init(k_algo),
            total_env_steps=jnp.zeros((), jnp.int32),
        )

    def _iter(self, runner: DAggerRunnerState):
        rng, k_act, k_train = jax.random.split(runner.rng, 3)
        obs = runner.env_state.obs
        # learner acts; expert relabels (dagger.py:45-71)
        action = self.algo.act(runner.algo_state, obs, k_act)
        env_state, tr = self.vec_env.step(runner.env_state, action)
        relabeled = tr.replace(action=self.expert_fn(tr.obs))
        aggregate = replay_add(runner.aggregate, relabeled)

        def grad_step(carry, key):
            algo_state = carry
            k_s, k_t = jax.random.split(key)
            batch = replay_sample(
                aggregate, k_s, self.config.batch_size)
            return self.algo.train_step(algo_state, batch, k_t)

        algo_state, metrics = jax.lax.scan(
            grad_step, runner.algo_state,
            jax.random.split(k_train, self.grad_steps_per_iter),
        )
        return DAggerRunnerState(
            rng=rng, env_state=env_state, aggregate=aggregate,
            algo_state=algo_state,
            total_env_steps=runner.total_env_steps + self.vec_env.num_envs,
        ), jax.tree.map(jnp.mean, metrics)

    def build(self, steps_per_epoch: int,
              initial_train_steps: int = 1000):
        epoch_iters = max(1, steps_per_epoch // self.vec_env.num_envs)

        @jax.jit
        def pretrain(runner: DAggerRunnerState):
            """Expert-only training before any rollouts (dagger.py:38-43)."""
            def grad_step(carry, key):
                algo_state = carry
                k_s, k_t = jax.random.split(key)
                batch = replay_sample(
                    runner.aggregate, k_s, self.config.batch_size)
                return self.algo.train_step(algo_state, batch, k_t)

            rng, k = jax.random.split(runner.rng)
            algo_state, _ = jax.lax.scan(
                grad_step, runner.algo_state,
                jax.random.split(k, initial_train_steps),
            )
            return runner.replace(rng=rng, algo_state=algo_state)

        @jax.jit
        def train_epoch(runner):
            def body(r, _):
                return self._iter(r)
            runner, metrics = jax.lax.scan(body, runner, None,
                                           length=epoch_iters)
            return runner, jax.tree.map(jnp.mean, metrics)

        return pretrain, train_epoch

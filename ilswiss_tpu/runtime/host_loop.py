"""Actor-learner split for host-simulated envs (MuJoCo et al.).

For envs that cannot run in XLA (MuJoCo's C engine — the reference's
whole benchmark suite), the loop splits: acting runs on the host CPU
JAX backend against thread-stepped gymnasium envs (envs/host_mujoco.py),
and learning runs as fused jitted scans on the TPU.  Transitions move
host->device once per collection segment (1000 steps by default — the
reference's num_steps_between_train_calls granularity), and params move
device->host once per segment, so per-step tunnel round-trips — the
cost that dominated the reference's pipe-based design — never happen.

Requires both platforms: set jax_platforms='axon,cpu' (or 'tpu,cpu')
before first jax use; falls back to single-platform CPU transparently.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ilswiss_tpu.data.replay import (
    ReplayState, replay_add, replay_init, replay_sample,
)
from ilswiss_tpu.envs.host_mujoco import GymVectorEnv
from ilswiss_tpu.envs.vector import Transition


@dataclass(frozen=True)
class HostLoopConfig:
    batch_size: int = 256
    replay_capacity: int = 1_000_000
    steps_between_train_calls: int = 1000
    train_steps_per_call: int = 1000
    min_steps_before_training: int = 1000


@struct.dataclass
class HostRunnerState:
    rng: jax.Array
    replay: ReplayState
    algo_state: Any
    total_env_steps: int = struct.field(pytree_node=False, default=0)


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


class HostOffPolicyLoop:
    def __init__(self, env: GymVectorEnv, algo,
                 config: HostLoopConfig = HostLoopConfig()):
        self.env = env
        self.algo = algo
        self.config = config
        self.cpu = _cpu_device()
        self._obs = None

        # acting compiled on the CPU backend (backend follows the
        # committed CPU inputs; all acting runs under default_device(cpu))
        self._act_cpu = jax.jit(lambda s, o, k: algo.act(s, o, k))
        self._act_det_cpu = jax.jit(
            lambda s, o, k: algo.act(s, o, k, deterministic=True)
        )

        # learner: ingest a [T, B] segment then K grad steps, one jit
        @partial(jax.jit, donate_argnums=0)
        def ingest_and_train(runner: HostRunnerState, segment
                             ) -> tuple[HostRunnerState, Dict]:
            def add_one(replay, tr):
                return replay_add(replay, tr), None

            replay, _ = jax.lax.scan(add_one, runner.replay, segment)

            def grad_step(carry, key):
                algo_state = carry
                k_s, k_t = jax.random.split(key)
                batch = replay_sample(replay, k_s, config.batch_size)
                algo_state, metrics = algo.train_step(
                    algo_state, batch, k_t)
                return algo_state, metrics

            rng, k = jax.random.split(runner.rng)
            algo_state, metrics = jax.lax.scan(
                grad_step, runner.algo_state,
                jax.random.split(k, config.train_steps_per_call),
            )
            return HostRunnerState(
                rng=rng, replay=replay, algo_state=algo_state,
                total_env_steps=runner.total_env_steps,
            ), jax.tree.map(jnp.mean, metrics)

        @partial(jax.jit, donate_argnums=0)
        def ingest_only(runner: HostRunnerState, segment) -> HostRunnerState:
            def add_one(replay, tr):
                return replay_add(replay, tr), None
            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            return runner.replace(replay=replay)

        self._ingest_and_train = ingest_and_train
        self._ingest_only = ingest_only

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> HostRunnerState:
        self._obs = self.env.reset(seed=seed)
        key = jax.random.PRNGKey(seed)
        _, k_algo = jax.random.split(key)
        return HostRunnerState(
            rng=key,
            replay=replay_init(
                self.config.replay_capacity, self.env.observation_size,
                self.env.action_size, write_batch=self.env.num_envs,
            ),
            algo_state=self.algo.init(k_algo),
            total_env_steps=0,
        )

    # ------------------------------------------------------------------
    def _collect_segment(self, runner: HostRunnerState, num_steps: int,
                         random_actions: bool) -> Transition:
        """Host rollout of num_steps//B iterations; returns [T, B] stack."""
        B = self.env.num_envs
        iters = max(1, num_steps // B)
        rows = []
        with jax.default_device(self.cpu):
            state_cpu = (
                None if random_actions
                else jax.device_put(runner.algo_state, self.cpu)
            )
            key = jax.random.fold_in(
                jax.device_put(runner.rng, self.cpu),
                runner.total_env_steps,
            )
            for t in range(iters):
                if random_actions:
                    action = np.random.uniform(
                        -1.0, 1.0, (B, self.env.action_size)
                    ).astype(np.float32)
                else:
                    key, k = jax.random.split(key)
                    action = np.asarray(
                        self._act_cpu(state_cpu, jnp.asarray(self._obs), k)
                    )
                obs_prev, true_next, reward, terminal, done, obs_after = (
                    self.env.step(action)
                )
                self._obs = obs_after
                rows.append((obs_prev, action, reward, true_next,
                             terminal, done))
        stack = lambda i: np.stack([r[i] for r in rows])
        return Transition(
            obs=jnp.asarray(stack(0)),
            action=jnp.asarray(stack(1)),
            reward=jnp.asarray(stack(2)),
            next_obs=jnp.asarray(stack(3)),
            terminal=jnp.asarray(stack(4)),
            done=jnp.asarray(stack(5)),
        )

    # ------------------------------------------------------------------
    def warmup(self, runner: HostRunnerState) -> HostRunnerState:
        seg = self._collect_segment(
            runner, self.config.min_steps_before_training,
            random_actions=True,
        )
        runner = self._ingest_only(runner, seg)
        return runner.replace(
            total_env_steps=runner.total_env_steps
            + int(seg.reward.shape[0] * seg.reward.shape[1])
        )

    def train_epoch(self, runner: HostRunnerState, steps_per_epoch: int
                    ) -> tuple[HostRunnerState, Dict[str, float]]:
        n_calls = max(
            1, steps_per_epoch // self.config.steps_between_train_calls
        )
        all_metrics = []
        for _ in range(n_calls):
            seg = self._collect_segment(
                runner, self.config.steps_between_train_calls,
                random_actions=False,
            )
            steps = int(seg.reward.shape[0] * seg.reward.shape[1])
            runner, metrics = self._ingest_and_train(runner, seg)
            runner = runner.replace(
                total_env_steps=runner.total_env_steps + steps
            )
            all_metrics.append(jax.device_get(metrics))
        return runner, {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }

    # ------------------------------------------------------------------
    def evaluate(self, runner: HostRunnerState, num_episodes: int,
                 seed: int = 0, eval_env: GymVectorEnv | None = None
                 ) -> Dict[str, float]:
        """Deterministic-policy eval on a host env (fresh episodes)."""
        env = eval_env or self.env
        B = env.num_envs
        returns, lengths = [], []
        ep_ret = np.zeros(B)
        ep_len = np.zeros(B)
        with jax.default_device(self.cpu):
            state_cpu = jax.device_put(runner.algo_state, self.cpu)
            key = jax.random.PRNGKey(seed)
            obs = env.reset(seed=seed + 10_000)
            while len(returns) < num_episodes:
                key, k = jax.random.split(key)
                action = np.asarray(
                    self._act_det_cpu(state_cpu, jnp.asarray(obs), k))
                _, _, reward, terminal, done, obs = env.step(action)
                ep_ret += reward
                ep_len += 1
                for i in np.nonzero(done)[0]:
                    returns.append(ep_ret[i])
                    lengths.append(ep_len[i])
                    ep_ret[i] = 0.0
                    ep_len[i] = 0.0
        if eval_env is None:
            # training env was hijacked for eval: restore its obs stream
            self._obs = obs
        returns = np.asarray(returns[:num_episodes])
        return {
            "AverageReturn": float(returns.mean()),
            "MaxReturn": float(returns.max()),
            "MinReturn": float(returns.min()),
            "StdReturn": float(returns.std()),
            "AvgPathLength": float(np.mean(lengths[:num_episodes])),
        }

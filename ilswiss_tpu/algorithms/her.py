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


@struct.dataclass
class HostHERRunnerState:
    rng: jax.Array
    replay: HindsightReplayState
    algo_state: Any
    total_env_steps: int = struct.field(pytree_node=False, default=0)


class HostHERLoop:
    """HER on host goal envs (gymnasium-robotics Fetch family — the
    reference's her_*_exp_script.py benchmarks): dict-obs segments are
    collected on host threads, while the episodic hindsight buffer,
    relabel sampling, and inner-trainer updates run jitted on device.
    Eval reports SuccessRate from the env's is_success info (reference
    eval_util.get_generic_path_information:33-59)."""

    def __init__(self, env, her: HER,
                 config: HERLoopConfig = HERLoopConfig(),
                 relabel_type: str = "future", her_ratio: float = 0.8,
                 grad_steps_per_segment: int | None = None,
                 segment_steps: int = 1000):
        from functools import partial

        import numpy as np  # noqa: F401  (host stacking below)

        from ilswiss_tpu.runtime.host_loop import _cpu_device

        self.env = env
        self.algo = her
        self.config = config
        self.segment_steps = segment_steps
        self.grad_steps_per_segment = (
            grad_steps_per_segment
            if grad_steps_per_segment is not None else segment_steps)
        self.buffer = HindsightReplayBuffer(
            env, env.num_envs, config.num_episode_slots,
            env.max_episode_steps,
            relabel_type=relabel_type, her_ratio=her_ratio,
        )
        self.cpu = _cpu_device()
        self._obs = None
        self._act_cpu = jax.jit(lambda s, o, k: her.act(s, o, k))
        self._act_det_cpu = jax.jit(
            lambda s, o, k: her.act(s, o, k, deterministic=True))

        @partial(jax.jit, donate_argnums=0)
        def ingest_and_train(runner: HostHERRunnerState, segment
                             ) -> tuple[HostHERRunnerState, Dict]:
            def add_one(replay, tr):
                return self.buffer.add(replay, tr), None

            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            rng, k = jax.random.split(runner.rng)

            def grad_step(algo_state, key):
                k_s, k_t = jax.random.split(key)
                batch = self.buffer.sample(
                    replay, k_s, self.config.batch_size)
                return self.algo.train_step(algo_state, batch, k_t)

            algo_state, metrics = jax.lax.scan(
                grad_step, runner.algo_state,
                jax.random.split(k, self.grad_steps_per_segment))
            return HostHERRunnerState(
                rng=rng, replay=replay, algo_state=algo_state,
                total_env_steps=runner.total_env_steps,
            ), jax.tree.map(jnp.mean, metrics)

        @partial(jax.jit, donate_argnums=0)
        def ingest_only(runner: HostHERRunnerState, segment):
            def add_one(replay, tr):
                return self.buffer.add(replay, tr), None
            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            return runner.replace(replay=replay)

        self._ingest_and_train = ingest_and_train
        self._ingest_only = ingest_only

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> HostHERRunnerState:
        self._obs = self.env.reset(seed=seed)
        key = jax.random.PRNGKey(seed)
        _, k_algo = jax.random.split(key)
        return HostHERRunnerState(
            rng=key, replay=self.buffer.init(),
            algo_state=self.algo.init(k_algo), total_env_steps=0,
        )

    def _collect_segment(self, runner, num_steps: int,
                         random_actions: bool):
        import numpy as np

        from ilswiss_tpu.envs.vector import Transition

        B = self.env.num_envs
        iters = max(1, num_steps // B)
        rows = []
        with jax.default_device(self.cpu):
            state_cpu = (
                None if random_actions
                else jax.device_put(runner.algo_state, self.cpu))
            key = jax.random.fold_in(
                jax.device_put(runner.rng, self.cpu),
                runner.total_env_steps)
            for _ in range(iters):
                if random_actions:
                    action = np.random.uniform(
                        -1.0, 1.0, (B, self.env.action_size)
                    ).astype(np.float32)
                else:
                    key, k = jax.random.split(key)
                    obs_dev = {k2: jnp.asarray(v)
                               for k2, v in self._obs.items()}
                    action = np.asarray(
                        self._act_cpu(state_cpu, obs_dev, k))
                obs_prev, true_next, reward, terminal, done, obs_after, _ = (
                    self.env.step(action))
                self._obs = obs_after
                rows.append((obs_prev, action, reward, true_next,
                             terminal, done))
        stack = lambda i: np.stack([r[i] for r in rows])
        stackd = lambda i: {
            k: jnp.asarray(np.stack([r[i][k] for r in rows]))
            for k in rows[0][i]
        }
        return Transition(
            obs=stackd(0),
            action=jnp.asarray(stack(1)),
            reward=jnp.asarray(stack(2)),
            next_obs=stackd(3),
            terminal=jnp.asarray(stack(4)),
            done=jnp.asarray(stack(5)),
        )

    def warmup(self, runner, min_steps: int = None):
        min_steps = min_steps or (
            self.config.min_episodes_before_training
            * self.env.max_episode_steps * self.env.num_envs)
        seg = self._collect_segment(runner, min_steps, random_actions=True)
        runner = self._ingest_only(runner, seg)
        return runner.replace(
            total_env_steps=runner.total_env_steps
            + int(seg.reward.shape[0] * seg.reward.shape[1]))

    def train_epoch(self, runner, steps_per_epoch: int):
        import numpy as np
        n_calls = max(1, steps_per_epoch // self.segment_steps)
        all_metrics = []
        for _ in range(n_calls):
            seg = self._collect_segment(
                runner, self.segment_steps, random_actions=False)
            steps = int(seg.reward.shape[0] * seg.reward.shape[1])
            runner, metrics = self._ingest_and_train(runner, seg)
            runner = runner.replace(
                total_env_steps=runner.total_env_steps + steps)
            all_metrics.append(jax.device_get(metrics))
        return runner, {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }

    # ------------------------------------------------------------------
    def evaluate(self, runner, num_episodes: int, seed: int = 0
                 ) -> Dict[str, float]:
        import numpy as np
        env = self.env
        B = env.num_envs
        returns, lengths, successes = [], [], []
        ep_ret = np.zeros(B)
        ep_len = np.zeros(B)
        ep_success = np.zeros(B)
        with jax.default_device(self.cpu):
            state_cpu = jax.device_put(runner.algo_state, self.cpu)
            key = jax.random.PRNGKey(seed)
            obs = env.reset(seed=seed + 10_000)
            while len(returns) < num_episodes:
                key, k = jax.random.split(key)
                obs_dev = {k2: jnp.asarray(v) for k2, v in obs.items()}
                action = np.asarray(
                    self._act_det_cpu(state_cpu, obs_dev, k))
                _, _, reward, terminal, done, obs, success = env.step(action)
                ep_ret += reward
                ep_len += 1
                ep_success = np.maximum(ep_success, success)
                for i in np.nonzero(done)[0]:
                    returns.append(ep_ret[i])
                    lengths.append(ep_len[i])
                    successes.append(ep_success[i])
                    ep_ret[i] = 0.0
                    ep_len[i] = 0.0
                    ep_success[i] = 0.0
        self._obs = env.reset(seed=seed + 20_000)
        returns = np.asarray(returns[:num_episodes])
        return {
            "AverageReturn": float(returns.mean()),
            "MaxReturn": float(returns.max()),
            "MinReturn": float(returns.min()),
            "StdReturn": float(returns.std()),
            "AvgPathLength": float(np.mean(lengths[:num_episodes])),
            "SuccessRate": float(np.mean(successes[:num_episodes])),
        }

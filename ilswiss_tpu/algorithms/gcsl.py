"""GCSL: goal-conditioned supervised learning.

Rebuild of the reference GCSL stack (rlkit/torch/algorithms/gcsl/):
every transition is hindsight-relabeled (her_ratio = 1.0, the
HindsightHorizonReplayBuffer default, relabel_horizon_replay_buffer.py:16)
and the policy is trained supervised to reproduce the taken action given
(obs, relabeled goal[, horizon one-hot]):
  - MLE:  -mean log pi(a | x)          (gcsl.py:62-69)
  - MSE:  mean sum (tanh(mu)(x) - a)^2  (deterministic head, :70-76)
  - CLASS: cross-entropy for discrete actions (:77-88)
At action time the loop variant appends the remaining-horizon one-hot
(gcsl/rl.py:91-98); here the deployed policy conditions on the
configured ``eval_horizon`` (default 0, i.e. greedy "reach the goal
now" — the regime most relabeled training pairs come from, since
``future`` relabels concentrate at small t'-t).  Pinned by
tests/test_gcsl_dagger.py::test_gcsl_act_uses_eval_horizon.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.algorithms.her import HERLoopConfig, HERRunnerState
from ilswiss_tpu.data.her import HindsightReplayBuffer
from ilswiss_tpu.envs.vector import VectorEnv
from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.policies import TanhGaussianPolicy


@dataclass(frozen=True)
class GCSLConfig:
    mode: str = "MSE"  # MLE | MSE | CLASS (discrete cross-entropy)
    lr: float = 1e-3
    use_horizons: bool = True
    max_horizon: int = 50  # one-hot width == max_episode_steps
    # horizon the deployed policy conditions on; small = greedy "reach
    # the goal now", which is how relabeled training pairs are mostly
    # distributed (future relabels have small t'-t)
    eval_horizon: int = 0


@struct.dataclass
class GCSLState:
    policy_params: Any
    policy_opt: Any


class GCSL:
    def __init__(self, obs_size: int, goal_size: int, action_size: int,
                 config: GCSLConfig = GCSLConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2):
        assert config.mode in ("MLE", "MSE", "CLASS"), config.mode
        self.config = config
        self.obs_size = obs_size
        self.goal_size = goal_size
        self.action_size = action_size
        self.input_dim = obs_size + goal_size + (
            config.max_horizon if config.use_horizons else 0
        )
        if config.mode == "CLASS":
            # discrete GCSL (reference gcsl.py:77-88 CLASS mode over a
            # DiscretEnv action index, exp_specs/gcsl/gcsl_reach_dis.yaml)
            from ilswiss_tpu.models.policies import CategoricalPolicy
            self.policy = CategoricalPolicy(
                num_actions=action_size,
                hidden_sizes=(net_size,) * num_hidden_layers,
            )
        else:
            self.policy = TanhGaussianPolicy(
                action_dim=action_size,
                hidden_sizes=(net_size,) * num_hidden_layers,
            )
        self.tx = optax.adam(config.lr)

    def init(self, key: jax.Array) -> GCSLState:
        params = self.policy.init(key, jnp.zeros((1, self.input_dim)))
        return GCSLState(policy_params=params,
                         policy_opt=self.tx.init(params))

    def _input(self, obs_dict, horizon: jnp.ndarray | None):
        parts = [obs_dict["observation"], obs_dict["desired_goal"]]
        if self.config.use_horizons:
            if horizon is None:
                horizon = jnp.full(
                    (parts[0].shape[0],), self.config.eval_horizon,
                    jnp.int32,
                )
            parts.append(jax.nn.one_hot(
                jnp.clip(horizon, 0, self.config.max_horizon - 1),
                self.config.max_horizon,
            ))
        return jnp.concatenate(parts, axis=-1)

    def act(self, state: GCSLState, obs_dict, key,
            deterministic: bool = False):
        x = self._input(obs_dict, None)
        if self.config.mode == "CLASS":
            logits = self.policy.apply(state.policy_params, x)
            if deterministic:
                return jnp.argmax(logits, axis=-1)
            return D.categorical_sample(key, logits)
        mean, log_std = self.policy.apply(state.policy_params, x)
        if deterministic:
            return jnp.tanh(mean)
        action, _ = D.tanh_normal_sample(key, mean, log_std)
        return action

    def train_step(self, state: GCSLState, batch: Dict[str, jnp.ndarray],
                   key) -> tuple[GCSLState, Dict[str, jnp.ndarray]]:
        x = self._input(
            {"observation": batch["observation"],
             "desired_goal": batch["desired_goal"]},
            batch.get("horizon"),
        )
        acts = batch["action"]

        def loss_fn(params):
            if self.config.mode == "CLASS":
                logits = self.policy.apply(params, x)
                logp = jax.nn.log_softmax(logits, axis=-1)
                idx = jnp.asarray(acts, jnp.int32)
                return -jnp.mean(
                    jnp.take_along_axis(logp, idx[:, None], axis=-1))
            mean, log_std = self.policy.apply(params, x)
            if self.config.mode == "MLE":
                return -jnp.mean(
                    D.tanh_normal_log_prob(mean, log_std, acts))
            pred = jnp.tanh(mean)
            return jnp.mean(jnp.sum((pred - acts) ** 2, axis=-1))

        loss, g = jax.value_and_grad(loss_fn)(state.policy_params)
        up, opt = self.tx.update(g, state.policy_opt, state.policy_params)
        return GCSLState(
            policy_params=optax.apply_updates(state.policy_params, up),
            policy_opt=opt,
        ), {"gcsl_loss": loss}


class GCSLLoop:
    """HER-style loop with her_ratio=1.0 future relabeling + horizons
    (the reference GoalHorizonRL loop, gcsl/rl.py)."""

    def __init__(self, vec_env: VectorEnv, gcsl: GCSL,
                 config: HERLoopConfig = HERLoopConfig()):
        self.vec_env = vec_env
        self.algo = gcsl
        self.config = config
        self.buffer = HindsightReplayBuffer(
            vec_env.env, vec_env.num_envs, config.num_episode_slots,
            vec_env.env.max_episode_steps,
            relabel_type="future", her_ratio=1.0,
        )
        self.grad_steps_per_iter = (
            config.grad_steps_per_iter or vec_env.num_envs
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

    def _collect(self, runner, random_actions: bool):
        rng, k_act = jax.random.split(runner.rng)
        if random_actions:
            if getattr(self.vec_env.env, "discrete", False):
                action = jax.random.randint(
                    k_act, (self.vec_env.num_envs,), 0,
                    self.vec_env.env.action_size,
                )
            else:
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
        return runner.replace(
            rng=rng, env_state=env_state,
            replay=self.buffer.add(runner.replay, tr),
            total_env_steps=runner.total_env_steps + self.vec_env.num_envs,
        )

    def _train_iter(self, runner):
        runner = self._collect(runner, random_actions=False)

        def grad_step(carry, key):
            algo_state = carry
            k_s, k_t = jax.random.split(key)
            batch = self.buffer.sample(
                runner.replay, k_s, self.config.batch_size,
                return_horizon=True,
            )
            return self.algo.train_step(algo_state, batch, k_t)

        rng, k = jax.random.split(runner.rng)
        algo_state, metrics = jax.lax.scan(
            grad_step, runner.algo_state,
            jax.random.split(k, self.grad_steps_per_iter),
        )
        return runner.replace(rng=rng, algo_state=algo_state), \
            jax.tree.map(jnp.mean, metrics)

    def build(self, steps_per_epoch: int):
        warmup_iters = (
            self.config.min_episodes_before_training
            * self.vec_env.env.max_episode_steps
        )
        epoch_iters = max(1, steps_per_epoch // self.vec_env.num_envs)

        @jax.jit
        def warmup(runner):
            def body(r, _):
                return self._collect(r, random_actions=True), None
            runner, _ = jax.lax.scan(body, runner, None,
                                     length=warmup_iters)
            return runner

        @jax.jit
        def train_epoch(runner):
            def body(r, _):
                return self._train_iter(r)
            runner, metrics = jax.lax.scan(body, runner, None,
                                           length=epoch_iters)
            return runner, jax.tree.map(jnp.mean, metrics)

        return warmup, train_epoch

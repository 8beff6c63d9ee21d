"""Fused off-policy actor-learner loop.

This replaces the reference's entire core runtime
(rlkit/core/base_algorithm.py `train`/`start_training`/`_try_to_train`,
:149-298 — vec-env pipe stepping, per-transition Python bookkeeping,
numpy batch fetch + H2D copy per gradient step) with a single jitted
`lax.scan`:

    iteration = act -> vec-env step -> replay store -> K gradient steps

One epoch is one device-resident scan; the host only sees the metrics
pytree afterwards.  The train state is donated so the whole epoch runs
in-place in HBM (SURVEY.md §7.3.6).

The reference's env-step/grad-step schedule (num_steps_between_train_calls
/ num_train_steps_per_train_call) collapses to `grad_steps_per_iter`:
with B lockstep envs, one scan iteration advances B env steps, so the
reference ratio of 1 grad step per env step means grad_steps_per_iter=B.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.data.replay import (
    ReplayState, replay_add, replay_init, replay_sample,
)
from ilswiss_tpu.envs.base import EnvState
from ilswiss_tpu.envs.vector import VectorEnv


@dataclass(frozen=True)
class OffPolicyConfig:
    batch_size: int = 256
    replay_capacity: int = 1_000_000
    grad_steps_per_iter: int | None = None  # default: num_envs (ratio 1.0)
    min_steps_before_training: int = 1000
    # store terminal=0 always (the reference `no_terminal` flag used by
    # GAIL-family specs, base_algorithm.py _handle_vec_step)
    no_terminal: bool = False


@struct.dataclass
class RunnerState:
    rng: jax.Array
    env_state: EnvState          # batched [num_envs]
    replay: ReplayState
    algo_state: Any
    total_env_steps: jnp.ndarray  # int64-ish int32 counter


class OffPolicyLoop:
    """Generic off-policy runtime: works for any algo exposing
    `init(key)`, `act(state, obs, key)`, `train_step(state, batch, key)`.
    (SAC / TD3 / DDPG / discrete-SAC / DQN all fit; the reference
    equivalent is TorchRLAlgorithm + BaseAlgorithm.)"""

    def __init__(self, vec_env: VectorEnv, algo, config: OffPolicyConfig,
                 sample_fn: Callable | None = None):
        self.vec_env = vec_env
        self.algo = algo
        self.config = config
        # pluggable batch sampler (RAD/CURL augmented sampling — the
        # reference's AugmentCPCImageEnvReplayBuffer — plugs in here)
        self.sample_fn = sample_fn or replay_sample
        self.grad_steps_per_iter = (
            config.grad_steps_per_iter
            if config.grad_steps_per_iter is not None
            else vec_env.num_envs
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> RunnerState:
        k_env, k_algo = jax.random.split(key)
        env = self.vec_env.env
        replay = replay_init(
            self.config.replay_capacity,
            env.observation_size,
            env.action_size,
            write_batch=self.vec_env.num_envs,
            discrete=env.discrete,
        )
        return RunnerState(
            rng=key,
            env_state=self.vec_env.reset(k_env),
            replay=replay,
            algo_state=self.algo.init(k_algo),
            total_env_steps=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _collect_iter(self, runner: RunnerState, random_actions: bool
                      ) -> RunnerState:
        rng, k_act = jax.random.split(runner.rng)
        obs = runner.env_state.obs
        if random_actions:
            # uniform [-1,1] warmup (replaces reference min_steps gate,
            # base_algorithm.py:183-186 which samples from the fresh policy)
            if self.vec_env.env.discrete:
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
            action = self.algo.act(runner.algo_state, obs, k_act)
        env_state, tr = self.vec_env.step(runner.env_state, action)
        if self.config.no_terminal:
            tr = tr.replace(terminal=jnp.zeros_like(tr.terminal))
        replay = replay_add(runner.replay, tr)
        return RunnerState(
            rng=rng,
            env_state=env_state,
            replay=replay,
            algo_state=runner.algo_state,
            total_env_steps=runner.total_env_steps + self.vec_env.num_envs,
        )

    def _train_iter(self, runner: RunnerState
                    ) -> tuple[RunnerState, Dict[str, jnp.ndarray]]:
        runner = self._collect_iter(runner, random_actions=False)

        # Algorithms that own their update schedule (AdvIRL's nested
        # disc/policy loop, MBPO's model phases — the reference's
        # _do_training overrides) expose `train_call(state, replay, key)`
        # and sample the replay themselves.
        if hasattr(self.algo, "train_call"):
            rng, k_call = jax.random.split(runner.rng)
            algo_state, metrics = self.algo.train_call(
                runner.algo_state, runner.replay, k_call
            )
            return RunnerState(
                rng=rng,
                env_state=runner.env_state,
                replay=runner.replay,
                algo_state=algo_state,
                total_env_steps=runner.total_env_steps,
            ), metrics

        rng, k_steps = jax.random.split(runner.rng)
        keys = jax.random.split(k_steps, self.grad_steps_per_iter)
        if (getattr(self.algo, "use_fused_chain", False)
                and self.sample_fn is replay_sample
                # the kernel applies LOCAL grads only — under a mesh
                # axis the scan path's per-step pmean (sac.py _pmean)
                # is what keeps replicas identical, so distributed
                # runs must take the scan path
                and getattr(self.algo, "axis_name", None) is None):
            # the whole K-step chain as ONE Pallas kernel
            # (ops/fused_sac.py); key derivation matches the scan path
            algo_state, metrics = self.algo.train_chain(
                runner.algo_state, runner.replay, keys,
                self.config.batch_size,
            )
        else:
            def one_grad_step(carry, key):
                algo_state, replay = carry
                k_samp, k_train = jax.random.split(key)
                batch = self.sample_fn(
                    replay, k_samp, self.config.batch_size)
                algo_state, metrics = self.algo.train_step(
                    algo_state, batch, k_train
                )
                return (algo_state, replay), metrics

            (algo_state, _), metrics = jax.lax.scan(
                one_grad_step, (runner.algo_state, runner.replay), keys
            )
        metrics = jax.tree.map(jnp.mean, metrics)
        return RunnerState(
            rng=rng,
            env_state=runner.env_state,
            replay=runner.replay,
            algo_state=algo_state,
            total_env_steps=runner.total_env_steps,
        ), metrics

    # ------------------------------------------------------------------
    def epoch_fns(self, steps_per_epoch: int) -> tuple[Callable, Callable]:
        """Unjitted (warmup_fn, epoch_fn) — composable under shard_map
        (see parallel.distributed) or plain jit (see `build`)."""
        num_envs = self.vec_env.num_envs
        warmup_iters = max(
            1, self.config.min_steps_before_training // num_envs
        )
        epoch_iters = max(1, steps_per_epoch // num_envs)

        def warmup_fn(runner: RunnerState) -> RunnerState:
            def body(r, _):
                return self._collect_iter(r, random_actions=True), None
            runner, _ = jax.lax.scan(body, runner, None, length=warmup_iters)
            return runner

        def epoch_fn(runner: RunnerState):
            def body(r, _):
                return self._train_iter(r)
            runner, metrics = jax.lax.scan(
                body, runner, None, length=epoch_iters
            )
            # per-epoch means: the host drains one small pytree per epoch
            return runner, jax.tree.map(jnp.mean, metrics)

        return warmup_fn, epoch_fn

    def build(self, steps_per_epoch: int) -> tuple[Callable, Callable]:
        """Returns (warmup, train_epoch), both jitted with state donation."""
        warmup_fn, epoch_fn = self.epoch_fns(steps_per_epoch)
        return (
            jax.jit(warmup_fn, donate_argnums=0),
            jax.jit(epoch_fn, donate_argnums=0),
        )

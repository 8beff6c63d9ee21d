"""Offline training loop (BC-style: no env interaction while training).

The reference BC overrides the base loop to skip env stepping entirely
(bc.py:57-75 `start_training` just calls `_do_training` per epoch,
sampling the expert buffer only, bc.py:42-49).  Here an epoch is one
jitted scan of grad steps over the expert buffer.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.data.replay import ReplayState, replay_sample


@struct.dataclass
class OfflineRunnerState:
    rng: jax.Array
    algo_state: Any
    expert: ReplayState
    total_train_steps: jnp.ndarray


class OfflineLoop:
    def __init__(self, algo, expert_replay: ReplayState,
                 batch_size: int = 256):
        self.algo = algo
        self.expert_replay = expert_replay
        self.batch_size = batch_size

    def init(self, key: jax.Array) -> OfflineRunnerState:
        return OfflineRunnerState(
            rng=key,
            algo_state=self.algo.init(key),
            # private copy: the runner state is donated every epoch, which
            # would delete a shared demo buffer out from under the caller
            expert=jax.tree.map(jnp.array, self.expert_replay),
            total_train_steps=jnp.zeros((), jnp.int32),
        )

    def epoch_fns(self, steps_per_epoch: int) -> tuple[Callable, Callable]:
        def epoch_fn(runner: OfflineRunnerState):
            def body(carry, key):
                algo_state = carry
                k_s, k_t = jax.random.split(key)
                batch = replay_sample(runner.expert, k_s, self.batch_size)
                algo_state, metrics = self.algo.train_step(
                    algo_state, batch, k_t
                )
                return algo_state, metrics

            rng, k = jax.random.split(runner.rng)
            keys = jax.random.split(k, steps_per_epoch)
            algo_state, metrics = jax.lax.scan(
                body, runner.algo_state, keys
            )
            return OfflineRunnerState(
                rng=rng,
                algo_state=algo_state,
                expert=runner.expert,
                total_train_steps=runner.total_train_steps + steps_per_epoch,
            ), jax.tree.map(jnp.mean, metrics)

        return (lambda r: r), epoch_fn

    def build(self, steps_per_epoch: int):
        warmup_fn, epoch_fn = self.epoch_fns(steps_per_epoch)
        return jax.jit(warmup_fn), jax.jit(epoch_fn, donate_argnums=0)

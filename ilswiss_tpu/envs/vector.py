"""Vectorized env engine: vmap + branchless autoreset.

This is the framework's envpool / `SubprocVectorEnv` equivalent
(reference rlkit/envs/vecenvs.py + rlkit/envs/worker/subproc.py): instead of
one OS process per env exchanging pickled arrays over pipes, all B env
instances live in one batched `EnvState` pytree on device and step in
lockstep inside jit.  The reference's async `wait_num`/timeout partial
stepping (vecenvs.py:220-242) has no analogue — SIMD lockstep makes every
env "ready" every step, which is the performance thesis of the rebuild
(SURVEY.md §5.8).

Autoreset contract: `step` returns a `Transition` carrying the *true* next
observation (`next_obs`) plus terminal/truncation flags, while the returned
state already contains reset observations for finished envs.  This replaces
the reference's per-transition Python bookkeeping loop
(rlkit/core/base_algorithm.py:426-507).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.envs.base import Environment, EnvState


@struct.dataclass
class Transition:
    """One batched transition [B, ...] as stored into replay."""

    obs: Any
    action: jnp.ndarray
    reward: jnp.ndarray
    next_obs: Any
    terminal: jnp.ndarray    # true termination -> no bootstrap
    done: jnp.ndarray        # terminal | truncation -> episode boundary


class VectorEnv:
    """B lockstep instances of `env` with automatic reset.

    All methods are pure and jit/vmap/shard_map friendly; `self` only holds
    static structure. `num_envs` is the per-shard batch when used under
    `shard_map` over an `env` mesh axis.
    """

    def __init__(self, env: Environment, num_envs: int):
        self.env = env
        self.num_envs = num_envs

    # API mirrors BaseVectorEnv.reset/step (vecenvs.py:158,183) minus ids.
    def reset(self, key: jax.Array) -> EnvState:
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(self, state: EnvState, normalized_action: jnp.ndarray
             ) -> tuple[EnvState, Transition]:
        """Step all envs with policy-space ([-1,1] / discrete) actions."""
        prev_obs = state.obs
        env_action = jax.vmap(self.env.scale_action)(normalized_action)
        out = jax.vmap(self.env.step)(state, env_action)
        done = out.done

        # Branchless per-env reset: envs that finished restart from a fresh
        # key; others keep their stepped state.  Keys come from the stepped
        # state's per-env rng so reset randomness never correlates with the
        # action stream.
        reset_keys = jax.vmap(
            lambda k: jax.random.split(k)[1]
        )(out.state.rng)
        reset_state = jax.vmap(self.env.reset)(reset_keys)
        new_state = jax.tree.map(
            lambda r, s: jnp.where(
                done.reshape((-1,) + (1,) * (s.ndim - 1)), r, s
            ),
            reset_state, out.state,
        )

        transition = Transition(
            obs=prev_obs,
            action=normalized_action,
            reward=out.reward,
            next_obs=out.obs,
            terminal=out.terminal,
            done=done,
        )
        return new_state, transition

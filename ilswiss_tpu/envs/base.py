"""Pure-JAX environment API.

TPU-native replacement for the reference's env stack: gym envs behind
`ProxyEnv`/`NormalizedBoxEnv` wrappers (rlkit/envs/wrappers.py) stepped one
process per env over pipes (rlkit/envs/worker/subproc.py).  Here an
environment is a *static* object holding physics constants, whose `reset`
and `step` are pure functions over an `EnvState` pytree — so thousands of
instances run in lockstep under `vmap` on one chip and shard over an `env`
mesh axis across chips (SURVEY.md §2.5).

Episode truncation (gym's TimeLimit) is part of the state (`t` counter)
instead of a wrapper, because data-dependent per-env resets must be
branchless: the vectorized autoreset in `vector.py` uses `jnp.where`
masks, replacing the reference's per-id Python reset bookkeeping
(rlkit/core/base_algorithm.py:216-277).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EnvState:
    """Per-environment dynamic state (a pytree; batched under vmap).

    Attributes:
      internal: env-specific physics state (e.g. [theta, theta_dot]).
      obs: current observation (what the policy sees next).
      t: int32 step count within the current episode (drives truncation).
      rng: per-env PRNG key consumed by stochastic resets/steps.
    """

    internal: Any
    obs: Any
    t: jnp.ndarray
    rng: jax.Array


@struct.dataclass
class StepOutput:
    """Result of one `env.step` before any autoreset.

    `terminal` is a *true* environment termination (failure/goal states) —
    the signal the critic bootstraps on.  `truncation` is a time-limit cut.
    `done = terminal | truncation` ends the episode for bookkeeping.  This
    is the reference's terminals-vs-timeouts split
    (rlkit/data_management/simple_replay_buffer.py:48-60).
    """

    state: EnvState
    obs: Any
    reward: jnp.ndarray
    terminal: jnp.ndarray
    truncation: jnp.ndarray
    info: dict = struct.field(default_factory=dict)

    @property
    def done(self) -> jnp.ndarray:
        return jnp.logical_or(self.terminal, self.truncation)


class Environment:
    """Static env descriptor with pure reset/step.

    Subclasses set:
      observation_size / action_size
      action_low / action_high   (np arrays; Box envs)
      discrete                   (True -> action is int32 index)
      max_episode_steps          (truncation horizon; 0 = no limit)
    and implement `_reset(key) -> (internal, obs)` and
    `_step(internal, action, key) -> (internal, obs, reward, terminal)`.
    """

    observation_size: int
    action_size: int
    discrete: bool = False
    max_episode_steps: int = 1000
    action_low: np.ndarray
    action_high: np.ndarray

    def __init__(self, **overrides):
        # env_kwargs from the YAML spec (reference get_env passes them to
        # the gym ctor, rlkit/envs/__init__.py:44-69); unknown keys fail
        # loudly rather than silently configuring nothing.
        for k, v in overrides.items():
            if not hasattr(type(self), k):
                raise TypeError(
                    f"{type(self).__name__} has no parameter '{k}'"
                )
            setattr(self, k, v)

    # --- subclass hooks -------------------------------------------------
    def _reset(self, key: jax.Array) -> Tuple[Any, Any]:
        raise NotImplementedError

    def _step(self, internal: Any, action: jnp.ndarray, key: jax.Array
              ) -> Tuple[Any, Any, jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    # --- public pure API ------------------------------------------------
    def reset(self, key: jax.Array) -> EnvState:
        reset_key, carry_key = jax.random.split(key)
        internal, obs = self._reset(reset_key)
        return EnvState(
            internal=internal,
            obs=obs,
            t=jnp.zeros((), jnp.int32),
            rng=carry_key,
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> StepOutput:
        step_key, carry_key = jax.random.split(state.rng)
        internal, obs, reward, terminal = self._step(
            state.internal, action, step_key
        )
        t = state.t + 1
        if self.max_episode_steps > 0:
            truncation = jnp.logical_and(
                t >= self.max_episode_steps, jnp.logical_not(terminal)
            )
        else:
            truncation = jnp.zeros((), bool)
        new_state = EnvState(internal=internal, obs=obs, t=t, rng=carry_key)
        return StepOutput(
            state=new_state,
            obs=obs,
            reward=jnp.asarray(reward, jnp.float32),
            terminal=jnp.asarray(terminal, bool),
            truncation=truncation,
        )

    # --- action-space helpers ------------------------------------------
    def scale_action(self, normalized: jnp.ndarray) -> jnp.ndarray:
        """Map policy actions in [-1, 1] to the env's Box bounds.

        Semantics of the reference's `NormalizedBoxEnv.step` scaling
        (rlkit/envs/wrappers.py:342-352): lerp then clip to bounds.
        """
        if self.discrete:
            return normalized
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        action = low + (normalized + 1.0) * 0.5 * (high - low)
        return jnp.clip(action, low, high)

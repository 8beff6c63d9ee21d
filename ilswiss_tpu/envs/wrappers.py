"""Pure-function env wrappers.

Rebuild of the reference wrapper zoo (rlkit/envs/wrappers.py) for the
JAX env API.  Action rescaling (`NormalizedBoxEnv`, wrappers.py:275)
is built into `Environment.scale_action`; the demo-statistics wrappers
live here:

  - `ScaledEnv` (wrappers.py:53): observations (and actions seen by the
    agent) standardized by expert-demo mean/std — used when adversarial
    IL trains on normalized demos (adv_irl_exp_script.py:86-113).
  - `MinmaxEnv` (wrappers.py:143): observations mapped to [0, 1] by
    demo min/max.

Both wrap any `Environment` and stay jit/vmap-transparent.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment


class _DelegatingEnv(Environment):
    def __init__(self, inner: Environment):
        self.inner = inner
        self.observation_size = inner.observation_size
        self.action_size = inner.action_size
        self.discrete = inner.discrete
        self.max_episode_steps = inner.max_episode_steps
        self.action_low = inner.action_low
        self.action_high = inner.action_high
        # goal-env surface (HER/GCSL): forward when the inner env is
        # goal-conditioned so wrappers (e.g. DiscretEnv for
        # gcsl_reach_dis) compose with the hindsight buffers
        if hasattr(inner, "goal_size"):
            self.goal_size = inner.goal_size
        if hasattr(inner, "compute_reward"):
            self.compute_reward = inner.compute_reward


class ScaledEnv(_DelegatingEnv):
    """obs -> (obs - mean) / std; optional action standardization for
    agents trained on scaled demo actions (reference ScaledEnv:
    unscale incoming actions before the true step)."""

    def __init__(self, inner: Environment,
                 obs_mean=None, obs_std=None,
                 acts_mean=None, acts_std=None):
        super().__init__(inner)
        self.obs_mean = None if obs_mean is None else jnp.asarray(obs_mean)
        self.obs_std = None if obs_std is None else jnp.asarray(obs_std)
        self.acts_mean = (
            None if acts_mean is None else jnp.asarray(acts_mean))
        self.acts_std = None if acts_std is None else jnp.asarray(acts_std)

    def _scale_obs(self, obs):
        if self.obs_mean is None:
            return obs
        return (obs - self.obs_mean) / (self.obs_std + 1e-8)

    def _unscale_action(self, action):
        if self.acts_mean is None:
            return action
        return action * (self.acts_std + 1e-8) + self.acts_mean

    def reset(self, key):
        state = self.inner.reset(key)
        return state.replace(obs=self._scale_obs(state.obs))

    def step(self, state, action):
        out = self.inner.step(state, self._unscale_action(action))
        return out.replace(
            state=out.state.replace(obs=self._scale_obs(out.state.obs)),
            obs=self._scale_obs(out.obs),
        )

    def scale_action(self, normalized):
        return self.inner.scale_action(normalized)


class AbsorbingEnv(_DelegatingEnv):
    """DAC-style absorbing states (reference wrap_absorbing:
    adv_irl.py:144-171 + simple_replay_buffer.py:134-216).

    Observations gain a trailing indicator dim (0 = normal, 1 =
    absorbing).  When the inner env terminates, instead of resetting
    immediately the episode transitions into a zero-observation
    absorbing state with a self-loop for one step (reward 0), so the
    discriminator/policy see explicit absorbing transitions and episode
    returns are not biased by termination — the core DAC trick.
    """

    def __init__(self, inner: Environment):
        super().__init__(inner)
        self.observation_size = inner.observation_size + 1
        # absorbing self-loop consumes a step; keep horizon semantics
        self.max_episode_steps = inner.max_episode_steps + 1

    def _pad(self, obs, flag: float):
        f = jnp.full(obs.shape[:-1] + (1,), flag, obs.dtype)
        return jnp.concatenate([obs, f], axis=-1)

    def _absorbing_obs(self, obs_like):
        zero = jnp.zeros(obs_like.shape[:-1] + (self.inner.observation_size,),
                         obs_like.dtype)
        return self._pad(zero, 1.0)

    def reset(self, key):
        state = self.inner.reset(key)
        return state.replace(
            internal=(state.internal, jnp.zeros((), bool)),
            obs=self._pad(state.obs, 0.0),
        )

    def step(self, state, action):
        inner_internal, in_absorbing = state.internal
        inner_state = state.replace(internal=inner_internal,
                                    obs=state.obs[..., :-1])
        out = self.inner.step(inner_state, action)

        # normal branch: pad obs; entering absorbing on terminal
        entered_absorbing = out.terminal
        normal_obs = jnp.where(
            entered_absorbing,
            self._absorbing_obs(out.obs),
            self._pad(out.obs, 0.0),
        )
        # absorbing branch: self-loop, zero reward, terminal now
        absorb_obs = self._absorbing_obs(out.obs)

        obs = jnp.where(in_absorbing, absorb_obs, normal_obs)
        reward = jnp.where(in_absorbing, 0.0, out.reward)
        # the episode ends after the absorbing self-loop step (or on
        # truncation); entering absorbing does NOT end it
        terminal = jnp.logical_and(in_absorbing, True)
        truncation = jnp.logical_and(
            out.truncation, jnp.logical_not(entered_absorbing))
        next_absorbing = jnp.logical_or(
            entered_absorbing, jnp.zeros((), bool))
        new_state = out.state.replace(
            internal=(out.state.internal, next_absorbing),
            obs=obs,
        )
        return out.replace(
            state=new_state, obs=obs, reward=reward,
            terminal=terminal, truncation=truncation,
        )

    def scale_action(self, normalized):
        return self.inner.scale_action(normalized)


class FrameStackEnv(_DelegatingEnv):
    """Stack the last k observations along the trailing axis
    (reference FrameStackEnv, rlkit/envs/wrappers.py:367 — there a
    deque of pixel frames; here the stack is carried in the env state
    so it stays jit/vmap-pure).

    Works for image obs [H, W, C] -> [H, W, C*k] and vector obs
    [D] -> [D*k].
    """

    def __init__(self, inner: Environment, k: int = 4):
        super().__init__(inner)
        self.k = k
        inner_size = inner.observation_size
        if isinstance(inner_size, tuple):
            self.observation_size = inner_size[:-1] + (inner_size[-1] * k,)
        else:
            self.observation_size = inner_size * k

    def _stacked(self, frames):
        return jnp.concatenate(frames, axis=-1)

    def reset(self, key):
        state = self.inner.reset(key)
        frames = tuple(state.obs for _ in range(self.k))
        obs = self._stacked(frames)
        return state.replace(internal=(state.internal, frames), obs=obs)

    def step(self, state, action):
        inner_internal, frames = state.internal
        inner_state = state.replace(internal=inner_internal,
                                    obs=frames[-1])
        out = self.inner.step(inner_state, action)
        new_frames = frames[1:] + (out.obs,)
        obs = self._stacked(new_frames)
        new_state = out.state.replace(
            internal=(out.state.internal, new_frames), obs=obs)
        return out.replace(state=new_state, obs=obs)

    def scale_action(self, normalized):
        return self.inner.scale_action(normalized)


class DiscretEnv(_DelegatingEnv):
    """Continuous -> discrete action adapter (reference DiscretEnv,
    rlkit/envs/wrappers.py:411-446): the action space becomes an index
    into a meshgrid of `granularity` levels per continuous dim (or an
    explicit `possible_actions` table), so DQN/discrete-SAC run on Box
    envs."""

    def __init__(self, inner: Environment, granularity: int = 10,
                 possible_actions=None):
        super().__init__(inner)
        assert not inner.discrete, "already discrete"
        if possible_actions is not None:
            base = np.asarray(possible_actions, np.float32)
            if base.ndim == 1:
                base = base[:, None]
        else:
            axes = [
                np.linspace(lo, hi, granularity)
                for lo, hi in zip(
                    np.atleast_1d(inner.action_low),
                    np.atleast_1d(inner.action_high),
                )
            ]
            mesh = np.meshgrid(*axes)
            base = np.stack([a.ravel() for a in mesh], axis=-1)
        self.base_actions = jnp.asarray(base, jnp.float32)
        self.discrete = True
        self.action_size = int(base.shape[0])  # num discrete actions
        self.action_low = None
        self.action_high = None

    def reset(self, key):
        return self.inner.reset(key)

    def step(self, state, action):
        cont = self.base_actions[jnp.asarray(action, jnp.int32)]
        cont = jnp.reshape(cont, np.shape(self.inner.action_low))
        return self.inner.step(state, cont)

    def scale_action(self, normalized):
        return normalized  # discrete indices pass through


class MinmaxEnv(_DelegatingEnv):
    """obs -> (obs - min) / (max - min)  (reference MinmaxEnv:143)."""

    def __init__(self, inner: Environment, obs_min, obs_max):
        super().__init__(inner)
        self.obs_min = jnp.asarray(obs_min)
        self.obs_max = jnp.asarray(obs_max)

    def _scale_obs(self, obs):
        return (obs - self.obs_min) / (self.obs_max - self.obs_min + 1e-8)

    def reset(self, key):
        state = self.inner.reset(key)
        return state.replace(obs=self._scale_obs(state.obs))

    def step(self, state, action):
        out = self.inner.step(state, action)
        return out.replace(
            state=out.state.replace(obs=self._scale_obs(out.state.obs)),
            obs=self._scale_obs(out.obs),
        )

    def scale_action(self, normalized):
        return self.inner.scale_action(normalized)

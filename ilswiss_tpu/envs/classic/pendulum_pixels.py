"""Pixel-observation pendulum: analytic on-device rendering.

Visual-RL testbed replacing the reference's dmc2gym pixel envs
(FrameStackEnv over dm-control renders, rlkit/envs/wrappers.py:367).
The rod is rendered analytically (distance-to-segment field) so the env
stays pure-JAX: thousands of pixel envs render in lockstep on the TPU,
and the whole SAC-AE pipeline runs without a simulator.  Frames are
stacked along the channel axis like the reference's FrameStackEnv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment
from ilswiss_tpu.envs.classic.pendulum import Pendulum, _angle_normalize


class PendulumPixels(Environment):
    """obs: [size, size, frame_stack] float32 in [0, 1]."""

    action_size = 1
    discrete = False
    max_episode_steps = 200
    action_low = np.array([-2.0], np.float32)
    action_high = np.array([2.0], np.float32)

    image_size = 64
    frame_stack = 3

    def __init__(self, **overrides):
        super().__init__(**overrides)
        self._pend = Pendulum()
        self.observation_size = (
            self.image_size, self.image_size, self.frame_stack)

    # --- rendering ------------------------------------------------------
    def _render(self, th: jnp.ndarray) -> jnp.ndarray:
        """[size, size] rod image; angle 0 = up (matches obs convention)."""
        n = self.image_size
        # pixel grid in world coords [-1.2, 1.2]
        coords = jnp.linspace(-1.2, 1.2, n)
        xx, yy = jnp.meshgrid(coords, -coords)  # y up
        # rod endpoint
        ex, ey = jnp.sin(th), jnp.cos(th)
        # distance from each pixel to segment (0,0)-(ex,ey)
        px, py = xx, yy
        t = jnp.clip(px * ex + py * ey, 0.0, 1.0)
        dx, dy = px - t * ex, py - t * ey
        dist = jnp.sqrt(dx**2 + dy**2)
        return jnp.clip(1.0 - dist / 0.12, 0.0, 1.0)

    def _obs_from_frames(self, frames):
        return jnp.stack(frames, axis=-1)

    # --- env hooks ------------------------------------------------------
    def _reset(self, key):
        internal, _ = self._pend._reset(key)
        frame = self._render(internal[0])
        frames = jnp.repeat(frame[..., None], self.frame_stack, axis=-1)
        # obs must be a distinct buffer from the carried frame stack
        # (donated runner states reject aliased leaves)
        return (internal, frames), jnp.array(frames)

    def _step(self, internal_state, action, key):
        internal, frames = internal_state
        new_internal, _, reward, terminal = self._pend._step(
            internal, action, key)
        new_frame = self._render(new_internal[0])
        new_frames = jnp.concatenate(
            [frames[..., 1:], new_frame[..., None]], axis=-1)
        return ((new_internal, new_frames), jnp.array(new_frames),
                reward, terminal)

"""Continuous mountain car, analytic JAX dynamics
(gym `MountainCarContinuous-v0` semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment


class MountainCarContinuous(Environment):
    observation_size = 2
    action_size = 1
    discrete = False
    max_episode_steps = 999
    action_low = np.array([-1.0], np.float32)
    action_high = np.array([1.0], np.float32)

    min_position = -1.2
    max_position = 0.6
    max_speed = 0.07
    goal_position = 0.45
    power = 0.0015

    def _reset(self, key):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        internal = jnp.stack([pos, jnp.zeros(())])
        # distinct buffer (donation rejects aliased leaves)
        return internal, jnp.array(internal)

    def _step(self, internal, action, key):
        position, velocity = internal
        force = jnp.clip(action[0], -1.0, 1.0)

        velocity = velocity + force * self.power - 0.0025 * jnp.cos(3.0 * position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = position + velocity
        position = jnp.clip(position, self.min_position, self.max_position)
        velocity = jnp.where(
            jnp.logical_and(position <= self.min_position, velocity < 0.0),
            0.0, velocity,
        )

        terminal = position >= self.goal_position
        reward = jnp.where(terminal, 100.0, 0.0) - 0.1 * force**2
        internal = jnp.stack([position, velocity])
        return internal, jnp.array(internal), reward, terminal

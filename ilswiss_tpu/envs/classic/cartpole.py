"""CartPole balance, analytic JAX dynamics (gym `CartPole-v1` semantics).

Discrete-action env for the DQN / discrete-SAC families (reference trains
these via 'cartpole' style discrete envs; rlkit discrete algorithms at
rlkit/torch/algorithms/{dqn,discrete_sac}/)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment


class CartPole(Environment):
    observation_size = 4
    action_size = 2  # number of discrete actions
    discrete = True
    max_episode_steps = 500
    action_low = np.array([0], np.int32)
    action_high = np.array([1], np.int32)

    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    total_mass = masscart + masspole
    length = 0.5  # half pole length
    polemass_length = masspole * length
    force_mag = 10.0
    tau = 0.02
    theta_threshold = 12.0 * 2.0 * np.pi / 360.0
    x_threshold = 2.4

    def _reset(self, key):
        internal = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        # obs must be a distinct buffer from internal: donated runner
        # states reject aliased leaves ("donate the same buffer twice")
        return internal, jnp.array(internal)

    def _step(self, internal, action, key):
        x, x_dot, theta, theta_dot = internal
        force = jnp.where(jnp.asarray(action).astype(jnp.int32).reshape(()) == 1,
                          self.force_mag, -self.force_mag)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)

        temp = (
            force + self.polemass_length * theta_dot**2 * sintheta
        ) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length
            * (4.0 / 3.0 - self.masspole * costheta**2 / self.total_mass)
        )
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass

        x = x + self.tau * x_dot
        x_dot = x_dot + self.tau * xacc
        theta = theta + self.tau * theta_dot
        theta_dot = theta_dot + self.tau * thetaacc

        internal = jnp.stack([x, x_dot, theta, theta_dot])
        obs = jnp.array(internal)
        terminal = jnp.logical_or(
            jnp.abs(x) > self.x_threshold,
            jnp.abs(theta) > self.theta_threshold,
        )
        reward = jnp.ones((), jnp.float32)
        return internal, obs, reward, terminal

"""Pendulum swing-up, analytic JAX dynamics.

Matches gym `Pendulum-v1` semantics (the reference registers it as
'pendulum' via rlkit/envs/envs_dict.py and trains SAC on it —
exp_specs/sac/sac_pendulum.yaml; baseline return 139.73 +- 79.81,
reference README.md:142).  Being analytic, it runs vmapped on TPU and on
the CPU backend for tests — this is the rebuild's fast end-to-end gate
(SURVEY.md §7.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment


def _angle_normalize(x):
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


class Pendulum(Environment):
    observation_size = 3
    action_size = 1
    discrete = False
    max_episode_steps = 200
    action_low = np.array([-2.0], np.float32)
    action_high = np.array([2.0], np.float32)

    dt = 0.05
    g = 10.0
    m = 1.0
    l = 1.0
    max_speed = 8.0
    max_torque = 2.0

    def _obs(self, internal):
        th, thdot = internal[0], internal[1]
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        thdot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        internal = jnp.stack([th, thdot])
        return internal, self._obs(internal)

    def _step(self, internal, action, key):
        th, thdot = internal[0], internal[1]
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)

        cost = (
            _angle_normalize(th) ** 2
            + 0.1 * thdot**2
            + 0.001 * u**2
        )
        newthdot = thdot + (
            3.0 * self.g / (2.0 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt

        internal = jnp.stack([newth, newthdot])
        terminal = jnp.zeros((), bool)  # pendulum never terminates
        return internal, self._obs(internal), -cost, terminal

"""Analytic terminal functions for model-based rollouts.

Rebuild of the reference terminal-fn registry (rlkit/envs/terminals.py):
MBPO's FakeEnv needs done-signals computable from (obs, act, next_obs)
without a simulator.  All functions are vmap-friendly:
[B, ...] arrays -> [B] bool.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

TERMINAL_REGISTRY: Dict[str, Callable] = {}


def register_terminal(name: str):
    def deco(fn):
        TERMINAL_REGISTRY[name] = fn
        return fn
    return deco


def get_terminal_func(env_name: str) -> Callable:
    if env_name not in TERMINAL_REGISTRY:
        raise KeyError(
            f"no terminal fn for '{env_name}'; "
            f"registered: {sorted(TERMINAL_REGISTRY)}"
        )
    return TERMINAL_REGISTRY[env_name]


@register_terminal("pendulum")
@register_terminal("halfcheetah")
@register_terminal("swimmer")
def never_terminal(obs, act, next_obs):
    """Reference HalfcheetahTerminalFunc: always False."""
    return jnp.zeros(next_obs.shape[0], bool)


@register_terminal("cartpole")
def cartpole_terminal(obs, act, next_obs):
    x, theta = next_obs[:, 0], next_obs[:, 2]
    return jnp.logical_or(
        jnp.abs(x) > 2.4, jnp.abs(theta) > 12.0 * 2.0 * jnp.pi / 360.0
    )


@register_terminal("mountain")
def mountain_terminal(obs, act, next_obs):
    return next_obs[:, 0] >= 0.45


@register_terminal("invertedpendulum")
def inverted_pendulum_terminal(obs, act, next_obs):
    """Reference terminals.py:22-32."""
    finite = jnp.all(jnp.isfinite(next_obs), axis=-1)
    ok = jnp.logical_and(finite, jnp.abs(next_obs[:, 1]) <= 0.2)
    return jnp.logical_not(ok)


@register_terminal("hopper")
def hopper_terminal(obs, act, next_obs):
    """Reference terminals.py:51-70 semantics: healthy iff finite,
    |state| bounded, height > 0.7, |angle| < 0.2."""
    height, angle = next_obs[:, 0], next_obs[:, 1]
    finite = jnp.all(jnp.isfinite(next_obs), axis=-1)
    bounded = jnp.all(jnp.abs(next_obs[:, 1:]) < 100.0, axis=-1)
    healthy = (
        finite & bounded & (height > 0.7) & (jnp.abs(angle) < 0.2)
    )
    return jnp.logical_not(healthy)


@register_terminal("walker")
def walker_terminal(obs, act, next_obs):
    """Walker2d: healthy iff 0.8 < height < 2.0 and |angle| < 1.0."""
    height, angle = next_obs[:, 0], next_obs[:, 1]
    healthy = (
        (height > 0.8) & (height < 2.0)
        & (angle > -1.0) & (angle < 1.0)
    )
    return jnp.logical_not(healthy)


@register_terminal("ant")
def ant_terminal(obs, act, next_obs):
    """Ant: healthy iff finite and 0.2 <= torso height <= 1.0."""
    height = next_obs[:, 0]
    finite = jnp.all(jnp.isfinite(next_obs), axis=-1)
    healthy = finite & (height >= 0.2) & (height <= 1.0)
    return jnp.logical_not(healthy)


@register_terminal("humanoid")
def humanoid_terminal(obs, act, next_obs):
    """Humanoid: healthy iff 1.0 < torso height < 2.0."""
    height = next_obs[:, 0]
    healthy = (height > 1.0) & (height < 2.0)
    return jnp.logical_not(healthy)


# MBPO's truncated-obs variants keep torso height at obs[:, 0], so the
# terminal predicates are shared (reference mbpo_{ant,humanoid}.yaml)
register_terminal("ant_trunc_obs")(ant_terminal)
register_terminal("humanoid_trunc_obs")(humanoid_terminal)

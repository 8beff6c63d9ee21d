"""Exploration strategies as pure functions.

Rebuild of the reference exploration-strategy zoo
(rlkit/exploration_strategies/): the object-wrapper pattern
(`PolicyWrappedWithExplorationStrategy`, base.py:41-60) becomes plain
function composition — a loop applies the noise fn to the policy's
action.  The only stateful strategy (Ornstein-Uhlenbeck) carries its
state explicitly, scan-style.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class OUState:
    noise: jnp.ndarray  # [..., action_dim]


def ou_init(shape, dtype=jnp.float32) -> OUState:
    return OUState(noise=jnp.zeros(shape, dtype))


def ou_noise(state: OUState, key: jax.Array, theta: float = 0.15,
             sigma: float = 0.3, mu: float = 0.0, dt: float = 1.0
             ) -> tuple[jnp.ndarray, OUState]:
    """Ornstein-Uhlenbeck process (reference OUStrategy,
    ou_strategy.py): dx = theta * (mu - x) dt + sigma * sqrt(dt) * N."""
    x = state.noise
    dx = theta * (mu - x) * dt + sigma * jnp.sqrt(dt) * jax.random.normal(
        key, x.shape, x.dtype
    )
    new = x + dx
    return new, OUState(noise=new)


def gaussian_noise(action: jnp.ndarray, key: jax.Array,
                   sigma: float = 0.1,
                   min_sigma: float | None = None,
                   decay_period: int | None = None,
                   t: jnp.ndarray | None = None,
                   clip: tuple = (-1.0, 1.0)) -> jnp.ndarray:
    """Additive Gaussian exploration with optional linear sigma decay
    (reference GaussianStrategy, gaussian_strategy.py:6-33)."""
    if min_sigma is not None and decay_period is not None and t is not None:
        frac = jnp.clip(t.astype(jnp.float32) / decay_period, 0.0, 1.0)
        sigma = sigma + frac * (min_sigma - sigma)
    noisy = action + sigma * jax.random.normal(key, action.shape)
    return jnp.clip(noisy, clip[0], clip[1])


def epsilon_greedy(greedy_action: jnp.ndarray, key: jax.Array,
                   num_actions: int, epsilon: float) -> jnp.ndarray:
    """Discrete epsilon-greedy (reference EpsilonGreedy,
    epsilon_greedy.py:10-25)."""
    k_flip, k_rand = jax.random.split(key)
    random_action = jax.random.randint(
        k_rand, greedy_action.shape, 0, num_actions
    )
    explore = jax.random.uniform(k_flip, greedy_action.shape) < epsilon
    return jnp.where(explore, random_action, greedy_action)

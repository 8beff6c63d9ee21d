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


def gaussian_and_epsilon(action: jnp.ndarray, key: jax.Array,
                         epsilon: float = 0.3,
                         sigma: float = 0.2,
                         min_sigma: float | None = None,
                         decay_period: int = 1_000_000,
                         t: jnp.ndarray | None = None,
                         low: float = -1.0, high: float = 1.0
                         ) -> jnp.ndarray:
    """The HER-TD3/GCSL explorer (reference MlpGaussianAndEpsilonPolicy,
    rlkit/torch/common/policies.py:481-566): with probability epsilon the
    WHOLE batched call returns uniform-random actions (the reference
    draws one `random.random()` per get_actions call, then samples each
    env's action independently); otherwise adds Gaussian noise whose
    sigma decays linearly from `sigma` to `min_sigma` over
    `decay_period` total env steps (defaults are equal -> constant 0.2).
    """
    if min_sigma is None:
        min_sigma = sigma
    k_flip, k_rand, k_noise = jax.random.split(key, 3)
    if t is not None and min_sigma != sigma:
        frac = jnp.clip(t.astype(jnp.float32) / decay_period, 0.0, 1.0)
        sigma = sigma - (sigma - min_sigma) * frac
    rand = jax.random.uniform(k_rand, action.shape, action.dtype, low, high)
    noisy = jnp.clip(
        action + sigma * jax.random.normal(k_noise, action.shape),
        low, high)
    take_rand = jax.random.uniform(k_flip, ()) < epsilon
    return jnp.where(take_rand, rand, noisy)

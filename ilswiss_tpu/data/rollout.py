"""On-policy rollout utilities: GAE as a device-side scan.

The reference computes GAE with a reversed host-Python loop over each
trajectory (rlkit/torch/algorithms/ppo/ppo.py:76-83) after fetching whole
trajectories from the replay buffer (`sample_all_trajs`,
simple_replay_buffer.py:374-395).  Here rollouts are fixed `[T, B, ...]`
device arrays straight out of the acting `lax.scan`, and GAE is a reversed
`lax.scan` over the time axis — no host round-trip (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(rewards: jnp.ndarray, values: jnp.ndarray, last_values: jnp.ndarray,
        terminals: jnp.ndarray, dones: jnp.ndarray,
        discount: float, lam: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation over a [T, B] rollout.

    delta_t = r_t + gamma * V(s_{t+1}) * (1 - terminal_t) - V(s_t)
    A_t     = delta_t + gamma * lam * (1 - done_t) * A_{t+1}

    `terminals` masks the bootstrap (true env termination only), `dones`
    (terminal | truncation) stops advantage flow across episode
    boundaries — the array-native version of the reference's per-trajectory
    loop (ppo.py:76-86), which restarts accumulation at each path edge.

    Returns (advantages [T, B], returns [T, B]) where returns = A + V.
    """
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)
    nonterminal = 1.0 - terminals.astype(jnp.float32)
    nonboundary = 1.0 - dones.astype(jnp.float32)
    deltas = rewards + discount * next_values * nonterminal - values

    def backward(carry, xs):
        delta, mask = xs
        adv = delta + discount * lam * mask * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        backward,
        jnp.zeros_like(last_values),
        (deltas, nonboundary),
        reverse=True,
    )
    return advantages, advantages + values


def normalize_advantages(adv: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Global advantage normalization (reference ppo.py:86)."""
    return (adv - jnp.mean(adv)) / (jnp.std(adv) + eps)

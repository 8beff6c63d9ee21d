"""Policy distributions as pure functions.

Formula-level parity with the reference's reparameterized distributions
(rlkit/torch/common/distributions.py) is required for curve matching
(SURVEY.md §7.3.5), so the tanh-Normal log-prob uses the same epsilon
(1e-6) and the same `log(1 - a^2 + eps)` Jacobian correction as
`ReparamTanhMultivariateNormal.log_prob` (distributions.py:74-97), rather
than the softplus-form identity.  Everything returns summed-over-last-axis
log-probs with a trailing keepdim, matching the torch `keepdim=True`
convention so loss code lines up 1:1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TANH_EPS = 1e-6
# Reference clamps log-std into this range (policies.py:15-16).
LOG_SIG_MIN = -20.0
LOG_SIG_MAX = 2.0


def clamp_log_std(log_std: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)


# --- Diagonal Normal (reference ReparamMultivariateNormalDiag :11-50) ----

def normal_sample(key: jax.Array, mean: jnp.ndarray, log_std: jnp.ndarray
                  ) -> jnp.ndarray:
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(log_std) * eps


def normal_log_prob(mean: jnp.ndarray, log_std: jnp.ndarray,
                    value: jnp.ndarray) -> jnp.ndarray:
    """Diag-Gaussian log density, summed over the action axis (keepdim)."""
    var = jnp.exp(2.0 * log_std)
    log_det = 2.0 * log_std
    lp = -0.5 * (
        (value - mean) ** 2 / var + log_det + jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(lp, axis=-1, keepdims=True)


def normal_entropy(log_std: jnp.ndarray) -> jnp.ndarray:
    ent = log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)
    return jnp.sum(ent, axis=-1, keepdims=True)


# --- Tanh-squashed Normal (reference ReparamTanhMultivariateNormal) ------

def tanh_normal_sample(key: jax.Array, mean: jnp.ndarray,
                       log_std: jnp.ndarray
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reparameterized sample; returns (action, pre_tanh_value)."""
    z = normal_sample(key, mean, log_std)
    return jnp.tanh(z), z


def tanh_normal_log_prob(mean: jnp.ndarray, log_std: jnp.ndarray,
                         action: jnp.ndarray,
                         pre_tanh: jnp.ndarray | None = None) -> jnp.ndarray:
    """log pi(a) with tanh Jacobian correction.

    When `pre_tanh` is unavailable it is recovered via atanh — the
    reference's fallback branch (distributions.py:85-88).
    """
    if pre_tanh is None:
        pre_tanh = 0.5 * (
            jnp.log(1.0 + action + TANH_EPS) - jnp.log(1.0 - action + TANH_EPS)
        )
    base = normal_log_prob(mean, log_std, pre_tanh)
    correction = jnp.sum(
        jnp.log(1.0 - action**2 + TANH_EPS), axis=-1, keepdims=True
    )
    return base - correction


# --- Categorical (reference DiscretePolicy softmax head) ------------------

def categorical_sample(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    return jax.random.categorical(key, logits, axis=-1)


def categorical_log_prob(logits: jnp.ndarray, action: jnp.ndarray
                         ) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.take_along_axis(
        logp, action[..., None].astype(jnp.int32), axis=-1
    )
    return lp


def categorical_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1, keepdims=True)

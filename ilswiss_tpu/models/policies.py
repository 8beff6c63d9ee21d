"""Policy heads (flax.linen) + pure action-sampling helpers.

Replaces the reference policy zoo (rlkit/torch/common/policies.py).  A
policy module maps observations to distribution parameters; sampling /
log-prob / deterministic-eval are pure functions over (params, obs, key)
so the same module serves exploration, evaluation (the reference's
`MakeDeterministic`, policies.py:19-36) and gradient computation inside a
single jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.networks import MLP, fanin_uniform, small_uniform


class TanhGaussianPolicy(nn.Module):
    """SAC actor: tanh-squashed state-dependent diagonal Gaussian.

    Equivalent of `ReparamTanhMultivariateGaussianPolicy`
    (policies.py:191-345): a ReLU trunk, a mean head, and either a
    state-dependent log-std head (default, policies.py:231-239) or a free
    log-std parameter; log-std clamped to [-20, 2].
    Returns (mean, log_std).
    """

    action_dim: int
    hidden_sizes: Sequence[int]
    state_dependent_std: bool = True
    init_w: float = 1e-3

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(
                h,
                kernel_init=fanin_uniform(),
                bias_init=nn.initializers.constant(0.1),
                name=f"hidden_{i}",
            )(x)
            x = nn.relu(x)
        mean = nn.Dense(
            self.action_dim,
            kernel_init=small_uniform(self.init_w),
            bias_init=small_uniform(self.init_w),
            name="mean",
        )(x)
        if self.state_dependent_std:
            log_std = nn.Dense(
                self.action_dim,
                kernel_init=small_uniform(self.init_w),
                bias_init=small_uniform(self.init_w),
                name="log_std",
            )(x)
        else:
            log_std = self.param(
                "log_std", nn.initializers.zeros, (self.action_dim,)
            )
            log_std = jnp.broadcast_to(log_std, mean.shape)
        return mean, D.clamp_log_std(log_std)


class GaussianPolicy(nn.Module):
    """PPO actor: unbounded diagonal Gaussian
    (`ReparamMultivariateGaussianPolicy`, policies.py:348-478)."""

    action_dim: int
    hidden_sizes: Sequence[int]
    state_dependent_std: bool = False
    init_w: float = 1e-3

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(
                h,
                kernel_init=fanin_uniform(),
                bias_init=nn.initializers.constant(0.1),
                name=f"hidden_{i}",
            )(x)
            x = nn.relu(x)
        mean = nn.Dense(
            self.action_dim,
            kernel_init=small_uniform(self.init_w),
            bias_init=small_uniform(self.init_w),
            name="mean",
        )(x)
        if self.state_dependent_std:
            log_std = nn.Dense(
                self.action_dim,
                kernel_init=small_uniform(self.init_w),
                bias_init=small_uniform(self.init_w),
                name="log_std",
            )(x)
        else:
            log_std = self.param(
                "log_std", nn.initializers.zeros, (self.action_dim,)
            )
            log_std = jnp.broadcast_to(log_std, mean.shape)
        return mean, D.clamp_log_std(log_std)


class GaussianNoisePolicy(nn.Module):
    """TD3/DDPG deterministic actor with tanh output
    (`MlpGaussianNoisePolicy`, policies.py:130-188).  Exploration noise is
    added by the caller (pure fn `noisy_action`)."""

    action_dim: int
    hidden_sizes: Sequence[int]
    init_w: float = 1e-3

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        return MLP(
            hidden_sizes=self.hidden_sizes,
            output_size=self.action_dim,
            output_activation=jnp.tanh,
            init_w=self.init_w,
            name="mlp",
        )(obs)


class CategoricalPolicy(nn.Module):
    """Discrete actor producing logits
    (`CatagorialPolicy` / `DiscretePolicy`, policies.py:39-103,759-810)."""

    num_actions: int
    hidden_sizes: Sequence[int]

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        return MLP(
            hidden_sizes=self.hidden_sizes,
            output_size=self.num_actions,
            name="mlp",
        )(obs)


# --- pure sampling helpers ------------------------------------------------

def tanh_gaussian_act(policy: TanhGaussianPolicy, params, obs, key,
                      deterministic: bool = False) -> jnp.ndarray:
    mean, log_std = policy.apply(params, obs)
    if deterministic:
        return jnp.tanh(mean)
    action, _ = D.tanh_normal_sample(key, mean, log_std)
    return action


def tanh_gaussian_sample_logp(policy: TanhGaussianPolicy, params, obs, key):
    """(action, pre_tanh, log_prob, mean, log_std) — everything the SAC
    losses need from one forward pass (reference policy forward
    policies.py:241-307 returns the same tuple)."""
    mean, log_std = policy.apply(params, obs)
    action, pre_tanh = D.tanh_normal_sample(key, mean, log_std)
    log_prob = D.tanh_normal_log_prob(mean, log_std, action, pre_tanh)
    return action, pre_tanh, log_prob, mean, log_std


def gaussian_act(policy: GaussianPolicy, params, obs, key,
                 deterministic: bool = False) -> jnp.ndarray:
    mean, log_std = policy.apply(params, obs)
    if deterministic:
        return mean
    return D.normal_sample(key, mean, log_std)


def noisy_action(action: jnp.ndarray, key, sigma: float,
                 clip: float | None = None) -> jnp.ndarray:
    """TD3 exploration / target-smoothing noise (td3.py:83-98 semantics)."""
    noise = sigma * jax.random.normal(key, action.shape, action.dtype)
    if clip is not None:
        noise = jnp.clip(noise, -clip, clip)
    return jnp.clip(action + noise, -1.0, 1.0)


def categorical_act(policy: CategoricalPolicy, params, obs, key,
                    deterministic: bool = False) -> jnp.ndarray:
    logits = policy.apply(params, obs)
    if deterministic:
        return jnp.argmax(logits, axis=-1)
    return D.categorical_sample(key, logits)

"""Pallas kernel numerics vs the flax reference path (interpret mode on
the CPU backend; compiled path exercised on TPU by bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.models.policies import TanhGaussianPolicy
from ilswiss_tpu.ops.fused_mlp import fused_gaussian_policy_forward


def test_fused_policy_forward_matches_flax():
    policy = TanhGaussianPolicy(action_dim=3, hidden_sizes=(64, 64))
    obs = jax.random.normal(jax.random.PRNGKey(0), (32, 11))
    params = policy.init(jax.random.PRNGKey(1), obs)

    want_mean, want_log_std = policy.apply(params, obs)
    got_mean, got_log_std = fused_gaussian_policy_forward(
        params, obs, interpret=True)

    np.testing.assert_allclose(got_mean, want_mean, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        got_log_std, want_log_std, rtol=2e-5, atol=2e-5)


def test_fused_policy_forward_clamps_log_std():
    policy = TanhGaussianPolicy(action_dim=2, hidden_sizes=(16,))
    obs = jax.random.normal(jax.random.PRNGKey(0), (8, 4)) * 100.0
    params = policy.init(jax.random.PRNGKey(1), obs)
    _, log_std = fused_gaussian_policy_forward(params, obs, interpret=True)
    assert float(jnp.max(log_std)) <= 2.0
    assert float(jnp.min(log_std)) >= -20.0

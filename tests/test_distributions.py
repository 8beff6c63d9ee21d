"""Unit tests for distribution math (SURVEY.md §4: pure math checked
against closed forms and the reference formulas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.models import distributions as D


def _np_normal_logpdf(mean, log_std, x):
    var = np.exp(2 * log_std)
    return np.sum(
        -0.5 * ((x - mean) ** 2 / var + 2 * log_std + np.log(2 * np.pi)),
        axis=-1, keepdims=True,
    )


def test_normal_log_prob_closed_form():
    rng = np.random.RandomState(0)
    mean = rng.randn(32, 4).astype(np.float32)
    log_std = rng.uniform(-1, 0.5, (32, 4)).astype(np.float32)
    x = rng.randn(32, 4).astype(np.float32)
    got = D.normal_log_prob(jnp.array(mean), jnp.array(log_std), jnp.array(x))
    want = _np_normal_logpdf(mean, log_std, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tanh_normal_log_prob_matches_reference_formula():
    # reference: log N(z) - sum log(1 - tanh(z)^2 + 1e-6)
    # (rlkit/torch/common/distributions.py:74-97)
    rng = np.random.RandomState(1)
    mean = rng.randn(16, 3).astype(np.float32)
    log_std = rng.uniform(-1, 0.5, (16, 3)).astype(np.float32)
    z = rng.randn(16, 3).astype(np.float32)
    a = np.tanh(z)
    got = D.tanh_normal_log_prob(
        jnp.array(mean), jnp.array(log_std), jnp.array(a), jnp.array(z)
    )
    want = _np_normal_logpdf(mean, log_std, z) - np.sum(
        np.log(1 - a**2 + 1e-6), axis=-1, keepdims=True
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tanh_normal_log_prob_atanh_fallback():
    rng = np.random.RandomState(2)
    mean = rng.randn(8, 2).astype(np.float32)
    log_std = rng.uniform(-1, 0, (8, 2)).astype(np.float32)
    z = np.clip(rng.randn(8, 2), -2, 2).astype(np.float32)
    a = np.tanh(z)
    with_pre = D.tanh_normal_log_prob(
        jnp.array(mean), jnp.array(log_std), jnp.array(a), jnp.array(z)
    )
    without_pre = D.tanh_normal_log_prob(
        jnp.array(mean), jnp.array(log_std), jnp.array(a), None
    )
    np.testing.assert_allclose(with_pre, without_pre, rtol=1e-3, atol=1e-3)


def test_tanh_sample_within_bounds_and_reparam():
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((1000, 2))
    log_std = jnp.zeros((1000, 2))
    a, z = D.tanh_normal_sample(key, mean, log_std)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    np.testing.assert_allclose(np.tanh(np.asarray(z)), np.asarray(a), rtol=1e-6)
    # standard normal pre-tanh stats
    assert abs(float(jnp.mean(z))) < 0.1
    assert abs(float(jnp.std(z)) - 1.0) < 0.1


def test_categorical_log_prob_and_entropy():
    logits = jnp.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    lp = D.categorical_log_prob(logits, jnp.array([1, 0]))
    np.testing.assert_allclose(lp[0, 0], np.log(1 / 3), rtol=1e-5)
    np.testing.assert_allclose(lp[1, 0], 0.0, atol=1e-3)
    ent = D.categorical_entropy(logits)
    np.testing.assert_allclose(ent[0, 0], np.log(3), rtol=1e-5)
    assert float(ent[1, 0]) < 0.01


def test_clamp_log_std():
    x = jnp.array([-30.0, 0.0, 5.0])
    np.testing.assert_allclose(D.clamp_log_std(x), [-20.0, 0.0, 2.0])

"""GAE scan vs a naive per-step python loop (the reference computes GAE
host-side per trajectory, ppo.py:76-86)."""

import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.rollout import gae, normalize_advantages


def _naive_gae(r, v, last_v, term, done, gamma, lam):
    T, B = r.shape
    adv = np.zeros((T, B))
    next_adv = np.zeros(B)
    for t in reversed(range(T)):
        next_v = v[t + 1] if t + 1 < T else last_v
        delta = r[t] + gamma * next_v * (1 - term[t]) - v[t]
        next_adv = delta + gamma * lam * (1 - done[t]) * next_adv
        adv[t] = next_adv
    return adv


def test_gae_matches_naive_loop():
    rng = np.random.RandomState(0)
    T, B = 17, 5
    r = rng.randn(T, B).astype(np.float32)
    v = rng.randn(T, B).astype(np.float32)
    last_v = rng.randn(B).astype(np.float32)
    term = (rng.rand(T, B) < 0.1).astype(np.float32)
    done = np.maximum(term, (rng.rand(T, B) < 0.05).astype(np.float32))
    adv, ret = gae(
        jnp.array(r), jnp.array(v), jnp.array(last_v),
        jnp.array(term), jnp.array(done), 0.99, 0.95,
    )
    want = _naive_gae(r, v, last_v, term, done, 0.99, 0.95)
    np.testing.assert_allclose(adv, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ret, want + v, rtol=1e-4, atol=1e-4)


def test_gae_no_leak_across_done():
    # big reward after a done must not influence earlier advantages
    T, B = 4, 1
    r = np.array([[0.0], [0.0], [100.0], [0.0]], np.float32)
    v = np.zeros((T, B), np.float32)
    done = np.array([[0.0], [1.0], [0.0], [0.0]], np.float32)
    term = done.copy()
    adv, _ = gae(
        jnp.array(r), jnp.array(v), jnp.zeros(1),
        jnp.array(term), jnp.array(done), 0.99, 0.95,
    )
    assert float(adv[0, 0]) < 1.0  # no contamination from t=2 reward
    assert float(adv[2, 0]) == 100.0


def test_normalize_advantages():
    adv = jnp.array(np.random.RandomState(0).randn(64) * 7 + 3)
    out = np.asarray(normalize_advantages(adv))
    assert abs(out.mean()) < 1e-5
    assert abs(out.std() - 1) < 1e-3

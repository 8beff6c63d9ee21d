"""Exploration strategies, env wrappers, eval-util stats."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs import make
from ilswiss_tpu.envs.wrappers import MinmaxEnv, ScaledEnv
from ilswiss_tpu.exploration import (
    epsilon_greedy, gaussian_noise, ou_init, ou_noise,
)
from ilswiss_tpu.utils.eval_util import (
    create_stats_ordered_dict, get_path_information,
)


def test_ou_noise_mean_reverting():
    state = ou_init((2,))
    key = jax.random.PRNGKey(0)
    vals = []
    for i in range(500):
        key, k = jax.random.split(key)
        noise, state = ou_noise(state, k, theta=0.15, sigma=0.3)
        vals.append(np.asarray(noise))
    vals = np.stack(vals)
    # stationary std of OU: sigma / sqrt(2 theta) ~ 0.55
    assert abs(vals[200:].std() - 0.3 / np.sqrt(2 * 0.15)) < 0.15
    assert abs(vals[200:].mean()) < 0.2


def test_gaussian_noise_decay():
    a = jnp.zeros((4, 2))
    k = jax.random.PRNGKey(0)
    early = gaussian_noise(a, k, sigma=1.0, min_sigma=0.0,
                           decay_period=100, t=jnp.asarray(0))
    late = gaussian_noise(a, k, sigma=1.0, min_sigma=0.0,
                          decay_period=100, t=jnp.asarray(100))
    assert np.abs(np.asarray(early)).mean() > np.abs(np.asarray(late)).mean()
    np.testing.assert_allclose(late, 0.0, atol=1e-6)


def test_epsilon_greedy_rates():
    greedy = jnp.zeros((2000,), jnp.int32)
    acts = epsilon_greedy(greedy, jax.random.PRNGKey(0), 4, 0.5)
    frac_random_nonzero = float((np.asarray(acts) != 0).mean())
    # eps=0.5, 3/4 of random picks differ from greedy -> ~0.375
    assert 0.3 < frac_random_nonzero < 0.45


def test_scaled_env_roundtrip():
    inner = make("pendulum")
    mean = np.array([0.5, 0.0, 0.0], np.float32)
    std = np.array([2.0, 1.0, 4.0], np.float32)
    env = ScaledEnv(inner, obs_mean=mean, obs_std=std)
    st = env.reset(jax.random.PRNGKey(0))
    raw = inner.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(st.obs),
        (np.asarray(raw.obs) - mean) / (std + 1e-8), rtol=1e-5)
    out = env.step(st, jnp.zeros((1,)))
    assert out.obs.shape == (3,)


def test_minmax_env_range():
    inner = make("pendulum")
    env = MinmaxEnv(inner, obs_min=np.array([-1, -1, -8], np.float32),
                    obs_max=np.array([1, 1, 8], np.float32))
    st = env.reset(jax.random.PRNGKey(0))
    o = np.asarray(st.obs)
    assert (o >= 0).all() and (o <= 1).all()


def test_stats_dict():
    d = create_stats_ordered_dict("Ret", [1.0, 2.0, 3.0])
    assert d["Ret Mean"] == 2.0 and d["Ret Max"] == 3.0
    p = get_path_information([1.0, 3.0], [10, 20], successes=[0, 1])
    assert p["AverageReturn"] == 2.0
    assert p["SuccessRate"] == 0.5


def test_frame_stack_env():
    from ilswiss_tpu.envs.wrappers import FrameStackEnv

    env = FrameStackEnv(make("pendulum"), k=4)
    assert env.observation_size == 3 * 4
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (12,)
    # at reset all k frames equal the first obs
    np.testing.assert_allclose(state.obs[:3], state.obs[3:6])
    out = jax.jit(env.step)(state, jnp.zeros((1,)))
    assert out.obs.shape == (12,)
    # newest frame at the end; previous newest shifted left
    np.testing.assert_allclose(np.asarray(out.obs[6:9]),
                               np.asarray(state.obs[9:12]))


def test_discret_env():
    from ilswiss_tpu.envs.wrappers import DiscretEnv

    env = DiscretEnv(make("pendulum"), granularity=5)
    assert env.discrete and env.action_size == 5
    state = env.reset(jax.random.PRNGKey(0))
    # index 0 -> lowest torque, index 4 -> highest
    out_lo = jax.jit(env.step)(state, jnp.asarray(0))
    out_hi = jax.jit(env.step)(state, jnp.asarray(4))
    assert out_lo.obs.shape == (3,)
    assert not np.allclose(np.asarray(out_lo.obs), np.asarray(out_hi.obs))


def test_cnn_disc():
    from ilswiss_tpu.models.discriminators import CNNDisc

    disc = CNNDisc(num_filters=8, num_layer_blocks=2, hid_dim=32,
                   clamp_magnitude=10.0)
    obs = jnp.ones((4, 32, 32, 3))
    act = jnp.ones((4, 2))
    params = disc.init(jax.random.PRNGKey(0), obs, act)
    logits = disc.apply(params, obs, act)
    assert logits.shape == (4, 1)
    assert np.all(np.abs(np.asarray(logits)) <= 10.0)

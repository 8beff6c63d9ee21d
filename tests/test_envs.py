"""Env engine tests: dynamics sanity, truncation, autoreset, vmap/jit."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs import make, make_vec


def test_pendulum_reset_and_obs():
    env = make("pendulum")
    st = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(st.obs)
    assert obs.shape == (3,)
    # cos^2 + sin^2 == 1
    np.testing.assert_allclose(obs[0] ** 2 + obs[1] ** 2, 1.0, rtol=1e-5)
    assert abs(obs[2]) <= 1.0  # initial thdot ~ U(-1,1)


def test_pendulum_dynamics_match_manual_euler():
    env = make("pendulum")
    st = env.reset(jax.random.PRNGKey(1))
    th = float(jnp.arctan2(st.obs[1], st.obs[0]))
    thdot = float(st.obs[2])
    u = 1.3
    out = env.step(st, jnp.array([u], jnp.float32))
    new_thdot = thdot + (3 * 10.0 / 2 * np.sin(th) + 3 * u) * 0.05
    new_thdot = np.clip(new_thdot, -8, 8)
    new_th = th + new_thdot * 0.05
    np.testing.assert_allclose(float(out.obs[2]), new_thdot, rtol=1e-4)
    np.testing.assert_allclose(
        float(jnp.arctan2(out.obs[1], out.obs[0])),
        np.arctan2(np.sin(new_th), np.cos(new_th)), rtol=1e-4,
    )
    # reward = -(angle^2 + .1 thdot^2 + .001 u^2) evaluated pre-step
    ang = ((th + np.pi) % (2 * np.pi)) - np.pi
    want_r = -(ang**2 + 0.1 * thdot**2 + 0.001 * u**2)
    np.testing.assert_allclose(float(out.reward), want_r, rtol=1e-4)


def test_truncation_at_horizon():
    env = make("pendulum", max_episode_steps=3)
    st = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros((1,))
    for i in range(3):
        out = env.step(st, a)
        st = out.state
    assert bool(out.truncation) and not bool(out.terminal)


def test_action_scaling():
    env = make("pendulum")
    a = env.scale_action(jnp.array([1.0]))
    np.testing.assert_allclose(a, [2.0])
    a = env.scale_action(jnp.array([-1.0]))
    np.testing.assert_allclose(a, [-2.0])
    a = env.scale_action(jnp.array([0.0]))
    np.testing.assert_allclose(a, [0.0])


def test_cartpole_terminates_on_tilt():
    env = make("cartpole")
    st = env.reset(jax.random.PRNGKey(0))
    # push right constantly until pole falls
    step = jax.jit(env.step)
    terminal = False
    for _ in range(200):
        out = step(st, jnp.array(1, jnp.int32))
        st = out.state
        if bool(out.terminal):
            terminal = True
            break
    assert terminal


def test_vec_env_autoreset():
    vec = make_vec("pendulum", num_envs=4, max_episode_steps=5)
    st = vec.reset(jax.random.PRNGKey(0))
    assert st.obs.shape == (4, 3)
    step = jax.jit(vec.step)
    actions = jnp.zeros((4, 1))
    for i in range(5):
        st, tr = step(st, actions)
    assert bool(jnp.all(tr.done))
    assert bool(jnp.all(st.t == 0))  # all reset
    # next_obs in transition is the true pre-reset obs, not the reset obs
    assert not np.allclose(np.asarray(tr.next_obs), np.asarray(st.obs))


def test_vec_env_independent_randomness():
    vec = make_vec("pendulum", num_envs=8)
    st = vec.reset(jax.random.PRNGKey(0))
    obs = np.asarray(st.obs)
    # all envs start at distinct states
    assert len(np.unique(obs[:, 2])) == 8


def test_mountain_car_goal():
    env = make("mountain")
    # place internal state near goal and push right
    st = env.reset(jax.random.PRNGKey(0))
    st = st.replace(internal=jnp.array([0.449, 0.07]))
    out = env.step(st, jnp.array([1.0]))
    assert bool(out.terminal)
    assert float(out.reward) > 90.0

"""n-step replay sampling with episode-boundary masking."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.replay import (
    replay_add, replay_init, replay_sample_nstep,
)
from ilswiss_tpu.envs.vector import Transition


def _fill(num_envs=2, steps=10, done_at=None):
    st = replay_init(capacity=64, obs_size=1, action_size=1,
                     write_batch=num_envs)
    for t in range(steps):
        done = jnp.zeros((num_envs,), bool)
        if done_at is not None and t == done_at:
            done = jnp.ones((num_envs,), bool)
        tr = Transition(
            obs=jnp.full((num_envs, 1), float(t)),
            action=jnp.zeros((num_envs, 1)),
            reward=jnp.full((num_envs,), 1.0),
            next_obs=jnp.full((num_envs, 1), float(t + 1)),
            terminal=done,
            done=done,
        )
        st = replay_add(st, tr)
    return st


def test_ep_ids_advance_on_done():
    st = _fill(num_envs=2, steps=6, done_at=2)
    ep = np.asarray(st.ep_id[:12]).reshape(6, 2)
    # episodes 0..2 belong to ep 0; 3.. belong to ep 1 (per env)
    assert (ep[:3] == ep[0]).all()
    assert (ep[3:] == ep[3]).all()
    assert (ep[0] != ep[3]).all()


def test_nstep_rewards_within_episode():
    st = _fill(num_envs=2, steps=10)
    batch = replay_sample_nstep(
        st, jax.random.PRNGKey(0), 64, n_step=3, discount=0.9)
    # rows early enough in the buffer get full 3-step sums
    full = 1.0 + 0.9 + 0.81
    vals = np.asarray(batch["reward"])
    assert np.isclose(vals.max(), full, rtol=1e-5)
    # obs is the start step; next_obs is up to 3 steps later
    start = np.asarray(batch["obs"])[:, 0]
    end = np.asarray(batch["next_obs"])[:, 0]
    used = np.asarray(batch["n_step_used"])
    np.testing.assert_allclose(end, start + used, rtol=1e-5)


def test_nstep_stops_at_terminal():
    st = _fill(num_envs=2, steps=10, done_at=4)
    batch = replay_sample_nstep(
        st, jax.random.PRNGKey(1), 256, n_step=5, discount=1.0)
    start = np.asarray(batch["obs"])[:, 0]
    used = np.asarray(batch["n_step_used"])
    # windows starting at t<=4 cannot extend past step 4 (terminal)
    for s, u in zip(start, used):
        if s <= 4:
            assert s + u <= 5 + 1e-6, (s, u)

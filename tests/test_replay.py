"""Replay ring-buffer semantics vs the reference SimpleReplayBuffer
(add/advance/wraparound/random_batch, simple_replay_buffer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.replay import replay_add, replay_init, replay_sample
from ilswiss_tpu.envs.vector import Transition


def _tr(b, obs_dim, act_dim, base):
    return Transition(
        obs=jnp.full((b, obs_dim), base, jnp.float32),
        action=jnp.full((b, act_dim), base + 0.5, jnp.float32),
        reward=jnp.full((b,), base, jnp.float32),
        next_obs=jnp.full((b, obs_dim), base + 1.0, jnp.float32),
        terminal=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
    )


def test_add_and_size():
    st = replay_init(capacity=16, obs_size=3, action_size=2, write_batch=4)
    assert st.data["obs"].shape == (16, 3)
    st = replay_add(st, _tr(4, 3, 2, 1.0))
    assert int(st.size) == 4 and int(st.ptr) == 4
    st = replay_add(st, _tr(4, 3, 2, 2.0))
    assert int(st.size) == 8
    np.testing.assert_allclose(st.data["reward"][:4], 1.0)
    np.testing.assert_allclose(st.data["reward"][4:8], 2.0)


def test_wraparound_overwrites_oldest():
    st = replay_init(capacity=8, obs_size=1, action_size=1, write_batch=4)
    for i in range(3):  # 12 rows into capacity 8
        st = replay_add(st, _tr(4, 1, 1, float(i)))
    assert int(st.size) == 8
    assert int(st.ptr) == 4
    # slots 0..3 hold write #2 (wrapped), slots 4..7 hold write #1
    np.testing.assert_allclose(st.data["reward"][:4], 2.0)
    np.testing.assert_allclose(st.data["reward"][4:8], 1.0)


def test_capacity_rounded_to_write_batch():
    st = replay_init(capacity=10, obs_size=1, action_size=1, write_batch=4)
    assert st.data["reward"].shape[0] == 12


def test_sample_uniform_over_valid_rows():
    st = replay_init(capacity=64, obs_size=1, action_size=1, write_batch=8)
    st = replay_add(st, _tr(8, 1, 1, 7.0))  # only 8 valid rows
    batch = replay_sample(st, jax.random.PRNGKey(0), 256)
    assert batch["obs"].shape == (256, 1)
    np.testing.assert_allclose(batch["reward"], 7.0)  # never hits empty rows


def test_sample_distribution_covers_buffer():
    st = replay_init(capacity=32, obs_size=1, action_size=1, write_batch=8)
    for i in range(4):
        st = replay_add(st, _tr(8, 1, 1, float(i)))
    batch = replay_sample(st, jax.random.PRNGKey(1), 4096)
    vals, counts = np.unique(np.asarray(batch["reward"]), return_counts=True)
    assert set(vals) == {0.0, 1.0, 2.0, 3.0}
    assert counts.min() > 4096 / 4 * 0.7  # roughly uniform


def test_jit_add_sample():
    st = replay_init(capacity=16, obs_size=2, action_size=1, write_batch=4)
    add = jax.jit(replay_add)
    st = add(st, _tr(4, 2, 1, 3.0))
    sample = jax.jit(replay_sample, static_argnums=2)
    batch = sample(st, jax.random.PRNGKey(0), 8)
    assert batch["next_obs"].shape == (8, 2)

"""DAC absorbing-state wrapper + demo transform (reference
wrap_absorbing, adv_irl.py:144-171)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.demo import demos_to_replay_state, wrap_absorbing_demos
from ilswiss_tpu.envs import make
from ilswiss_tpu.envs.vector import VectorEnv
from ilswiss_tpu.envs.wrappers import AbsorbingEnv


def test_absorbing_env_flow():
    inner = make("cartpole")  # terminates on tilt
    inner.discrete = True
    env = AbsorbingEnv(inner)
    assert env.observation_size == 5
    st = env.reset(jax.random.PRNGKey(0))
    assert st.obs.shape == (5,)
    assert float(st.obs[-1]) == 0.0  # normal flag

    # drive until termination
    step = jax.jit(env.step)
    entered = False
    for t in range(300):
        out = step(st, jnp.array(1, jnp.int32))
        st = out.state
        if float(out.obs[-1]) == 1.0 and not entered:
            entered = True
            # entering absorbing is NOT terminal yet
            assert not bool(out.terminal)
            # absorbing obs is zeros + flag
            np.testing.assert_allclose(out.obs[:-1], 0.0)
            # one more step: the self-loop terminates with zero reward
            out2 = step(st, jnp.array(0, jnp.int32))
            assert bool(out2.terminal)
            assert float(out2.reward) == 0.0
            np.testing.assert_allclose(out2.obs[:-1], 0.0)
            break
    assert entered


def test_absorbing_env_vectorized():
    inner = make("cartpole")
    env = AbsorbingEnv(inner)
    vec = VectorEnv(env, 4)
    st = vec.reset(jax.random.PRNGKey(0))
    step = jax.jit(vec.step)
    for _ in range(200):
        st, tr = step(st, jnp.ones((4,), jnp.int32))
    assert np.isfinite(np.asarray(tr.reward)).all()


def test_wrap_absorbing_demos():
    n = 6
    obs = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
    demos = demos_to_replay_state(
        obs, np.ones((n, 1), np.float32), np.ones(n), obs + 1,
        np.array([0, 0, 1, 0, 0, 1], np.float32),
        np.array([0, 0, 0, 1, 1, 1], np.int32),
    )
    wrapped = wrap_absorbing_demos(demos)
    # 2 terminals -> 2 extra absorbing rows
    assert int(wrapped.size) == n + 2
    w_obs = np.asarray(wrapped.data["obs"])
    assert w_obs.shape[1] == 3  # flag dim added
    # terminal rows redirect next_obs into the absorbing state
    w_next = np.asarray(wrapped.data["next_obs"])
    absorb_rows = np.where(w_obs[:, -1] == 1.0)[0]
    assert len(absorb_rows) == 2
    for r in absorb_rows:
        np.testing.assert_allclose(w_next[r], [0, 0, 1])
        assert float(wrapped.data["terminal"][r]) == 1.0

"""HER stack: goal env, episodic hindsight buffer, relabeling math,
HER-SAC learning gate on sparse-reward reaching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilswiss_tpu.algorithms.her import HER, HERLoop, HERLoopConfig
from ilswiss_tpu.algorithms.sac import SAC, SACConfig
from ilswiss_tpu.data.her import HindsightReplayBuffer
from ilswiss_tpu.envs import make, make_vec
from ilswiss_tpu.envs.vector import VectorEnv
from ilswiss_tpu.runtime.evaluator import make_evaluator


def test_goal_env_dict_obs_and_reward():
    env = make("reach2d")
    st = env.reset(jax.random.PRNGKey(0))
    assert set(st.obs) == {"observation", "achieved_goal", "desired_goal"}
    r = env.compute_reward(jnp.array([[0.0, 0.0]]), jnp.array([[0.0, 0.01]]))
    assert float(r[0]) == 0.0  # within threshold
    r = env.compute_reward(jnp.array([[0.0, 0.0]]), jnp.array([[1.0, 1.0]]))
    assert float(r[0]) == -1.0


def test_goal_env_terminates_on_success():
    env = make("reach2d")
    st = env.reset(jax.random.PRNGKey(0))
    pos_vel, goal = st.internal
    st = st.replace(internal=(pos_vel.at[:2].set(goal - 0.001), goal))
    out = env.step(st, jnp.zeros(2))
    assert bool(out.terminal)


def _fill_buffer(buf, vec, n_steps, key):
    state = buf.init()
    env_state = vec.reset(key)

    def body(carry, k):
        env_state, state = carry
        action = jax.random.uniform(
            k, (vec.num_envs, 2), minval=-1.0, maxval=1.0)
        env_state, tr = vec.step(env_state, action)
        return (env_state, buf.add(state, tr)), None

    (env_state, state), _ = jax.lax.scan(
        body, (env_state, state), jax.random.split(key, n_steps))
    return state


def test_her_buffer_episode_bookkeeping():
    vec = make_vec("reach2d", num_envs=4)
    buf = HindsightReplayBuffer(vec.env, 4, num_episode_slots=32,
                                max_episode_steps=50)
    state = _fill_buffer(buf, vec, 120, jax.random.PRNGKey(0))
    # with max 50 steps per episode, every env completed >= 2 episodes
    assert np.all(np.asarray(state.completed) >= 2)
    lens = np.asarray(state.ep_len)
    assert lens.max() <= 50
    assert (lens > 0).sum() >= 8


def test_her_sample_relabels_and_recomputes_reward():
    vec = make_vec("reach2d", num_envs=4)
    buf = HindsightReplayBuffer(vec.env, 4, num_episode_slots=32,
                                max_episode_steps=50, her_ratio=1.0,
                                relabel_type="future")
    state = _fill_buffer(buf, vec, 200, jax.random.PRNGKey(0))
    batch = buf.sample(state, jax.random.PRNGKey(1), 256)
    # rewards consistent with relabeled goals
    want = np.asarray(vec.env.compute_reward(
        batch["next_achieved_goal"], batch["desired_goal"]))
    np.testing.assert_allclose(np.asarray(batch["reward"]), want)
    # with her_ratio=1 and future relabeling, a solid fraction of
    # transitions become successes (goal = own future achieved state)
    assert (want > -0.5).mean() > 0.05


def test_her_final_strategy():
    vec = make_vec("reach2d", num_envs=4)
    buf = HindsightReplayBuffer(vec.env, 4, num_episode_slots=32,
                                max_episode_steps=50, her_ratio=1.0,
                                relabel_type="final")
    state = _fill_buffer(buf, vec, 200, jax.random.PRNGKey(0))
    batch = buf.sample(state, jax.random.PRNGKey(1), 64)
    assert np.isfinite(np.asarray(batch["reward"])).all()


@pytest.mark.slow
def test_her_sac_learns_sparse_reach():
    vec = make_vec("reach2d", num_envs=16)
    env = vec.env
    sac = SAC(
        obs_size=env.observation_size + env.goal_size,
        action_size=env.action_size,
        config=SACConfig(reward_scale=1.0),
        net_size=64, num_hidden_layers=2,
    )
    her = HER(sac)
    loop = HERLoop(vec, her,
                   HERLoopConfig(batch_size=128, num_episode_slots=512,
                                 grad_steps_per_iter=8))
    warmup, epoch = loop.build(steps_per_epoch=4000)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    ev = make_evaluator(
        vec, lambda s, o, k: her.act(s, o, k, deterministic=True),
        max_path_length=50,
    )
    for _ in range(5):  # 20k env steps
        runner, metrics = epoch(runner)
    ret = float(ev(runner.algo_state, jax.random.PRNGKey(9))["AverageReturn"])
    # random return ~ -48 (almost never reaches); HER-SAC should reach
    # the goal within a few steps on average
    assert ret > -25, ret

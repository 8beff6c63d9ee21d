"""Native mjvec engine vs gymnasium: step-for-step semantic parity.

The C++ engine (native/mjvec.cpp) must reproduce gymnasium v5
observation / reward / termination exactly given identical physics
state — verified by injecting the same (qpos, qvel) into both and
stepping with the same action.
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from ilswiss_tpu.envs.native_mujoco import NativeMjVectorEnv, _ENV_TYPES


@pytest.mark.parametrize("name,gym_id", [
    ("hopper", "Hopper-v5"),
    ("walker", "Walker2d-v5"),
    ("halfcheetah", "HalfCheetah-v5"),
    ("ant", "Ant-v5"),
    ("humanoid", "Humanoid-v5"),
    ("swimmer", "Swimmer-v5"),
    ("invertedpendulum", "InvertedPendulum-v5"),
    ("inverteddoublependulum", "InvertedDoublePendulum-v5"),
])
def test_native_matches_gymnasium(name, gym_id):
    native = NativeMjVectorEnv(name, num_envs=1, seed=0)
    ref = gym.make(gym_id).unwrapped
    ref.reset(seed=0)

    rng = np.random.RandomState(0)
    qpos = ref.init_qpos + rng.uniform(-0.005, 0.005, ref.model.nq)
    qvel = ref.init_qvel + rng.uniform(-0.005, 0.005, ref.model.nv)
    ref.set_state(qpos, qvel)
    native.set_state(0, qpos, qvel)

    for t in range(15):
        a_norm = rng.uniform(-1, 1, native.action_size).astype(np.float32)
        # gym takes raw ctrlrange actions; our engine takes [-1,1]
        lo = ref.action_space.low
        hi = ref.action_space.high
        a_raw = lo + (a_norm + 1.0) * 0.5 * (hi - lo)

        ref_obs, ref_rew, ref_term, _, _ = ref.step(
            a_raw.astype(np.float64))
        _, true_next, rew, term, done, _ = native.step(a_norm[None])

        # float32 action rounding (1e-7) compounds through the chaotic
        # dynamics, so tolerance widens with horizon; early steps are
        # tight, which is what pins the semantics
        tol = 1e-5 * (10 ** (t / 5))
        np.testing.assert_allclose(
            true_next[0], ref_obs, rtol=1e-4, atol=tol,
            err_msg=f"{name} obs diverged at t={t}")
        np.testing.assert_allclose(rew[0], ref_rew, rtol=1e-3, atol=tol)
        assert bool(term[0]) == bool(ref_term)
        if ref_term or done[0]:
            break
    native.close()
    ref.close()


def test_native_autoreset_and_truncation():
    env = NativeMjVectorEnv("hopper", num_envs=4, seed=0,
                            max_episode_steps=10)
    env.reset()
    saw_done = False
    for t in range(12):
        a = np.random.uniform(-1, 1, (4, 3)).astype(np.float32)
        obs_prev, true_next, rew, term, done, obs_after = env.step(a)
        if done.any():
            saw_done = True
            i = int(np.nonzero(done)[0][0])
            assert not np.allclose(true_next[i], obs_after[i])
    assert saw_done
    env.close()


def test_native_throughput_beats_gym_path():
    import time
    from ilswiss_tpu.envs.host_mujoco import GymVectorEnv

    a = np.zeros((8, 3), np.float32)
    native = NativeMjVectorEnv("hopper", num_envs=8, seed=0)
    native.reset()
    t0 = time.time()
    for _ in range(300):
        native.step(a)
    native_rate = 8 * 300 / (time.time() - t0)
    native.close()

    gymv = GymVectorEnv("hopper", num_envs=8, seed=0)
    gymv.reset()
    t0 = time.time()
    for _ in range(100):
        gymv.step(a)
    gym_rate = 8 * 100 / (time.time() - t0)
    gymv.close()
    assert native_rate > 1.5 * gym_rate, (native_rate, gym_rate)

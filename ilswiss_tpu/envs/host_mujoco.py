"""Host-side vectorized MuJoCo envs (gymnasium) feeding the TPU learner.

This is the framework's envpool/SubprocVectorEnv equivalent for
simulators that cannot be expressed in JAX (reference
rlkit/envs/vecenvs.py + envs/envpool.py): MuJoCo's C engine steps B env
instances on host threads (mj_step releases the GIL), while acting runs
on the host CPU JAX backend and learning runs fused on the TPU (see
runtime/host_loop.py).  The tunneled TPU backend does not support
host callbacks (io_callback -> UNIMPLEMENTED), so the bridge is a
host-driven segment loop rather than in-jit callbacks.

Env names follow the reference registry (rlkit/envs/envs_dict.py):
hopper/walker/halfcheetah/ant/humanoid/swimmer/invertedpendulum/
inverteddoublependulum (+ the robotics fetch-* family via
gymnasium-robotics).

Autoreset is immediate (same-step), matching the lockstep JAX
`VectorEnv` contract: `step` returns the true terminal next_obs in the
transition while the carried observation is the post-reset one.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Tuple

import numpy as np

GYM_ENV_IDS: Dict[str, str] = {
    # reference envs_dict.py names -> gymnasium ids
    "hopper": "Hopper-v5",
    "walker": "Walker2d-v5",
    "halfcheetah": "HalfCheetah-v5",
    "ant": "Ant-v5",
    "humanoid": "Humanoid-v5",
    "swimmer": "Swimmer-v5",
    "invertedpendulum": "InvertedPendulum-v5",
    "inverteddoublependulum": "InvertedDoublePendulum-v5",
    "lunarlandercont": "LunarLanderContinuous-v3",
    "fetch-reach": "FetchReach-v4",
    "fetch-push": "FetchPush-v4",
    "fetch-pick-place": "FetchPickAndPlace-v4",
    "fetch-slide": "FetchSlide-v4",
}


class GymVectorEnv:
    """B lockstep gymnasium envs with immediate autoreset (numpy API).

    Actions are normalized [-1, 1] and rescaled to the env's Box bounds
    (reference NormalizedBoxEnv semantics, rlkit/envs/wrappers.py:342-352).
    """

    def __init__(self, env_name: str, num_envs: int, seed: int = 0,
                 max_episode_steps: int | None = None,
                 env_kwargs: dict | None = None, num_threads: int = 8):
        import gymnasium as gym

        gym_id = GYM_ENV_IDS.get(env_name, env_name)
        kwargs = dict(env_kwargs or {})
        if max_episode_steps is not None:
            kwargs["max_episode_steps"] = max_episode_steps
        self.envs = [gym.make(gym_id, **kwargs) for _ in range(num_envs)]
        self.num_envs = num_envs
        self.name = env_name

        space = self.envs[0].observation_space
        aspace = self.envs[0].action_space
        self.observation_size = int(np.prod(space.shape))
        self.action_size = int(np.prod(aspace.shape))
        self.discrete = False
        self.action_low = np.asarray(aspace.low, np.float32)
        self.action_high = np.asarray(aspace.high, np.float32)
        self.max_episode_steps = (
            max_episode_steps
            or getattr(self.envs[0].spec, "max_episode_steps", None)
            or 1000
        )
        self._rng = np.random.RandomState(seed)
        self._seeds = [int(self._rng.randint(2**31)) for _ in self.envs]
        self._pool = (
            ThreadPoolExecutor(max_workers=min(num_threads, num_envs))
            if num_envs > 1 else None
        )
        self._obs = np.zeros(
            (num_envs, self.observation_size), np.float32
        )

    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None) -> np.ndarray:
        if seed is not None:
            self._rng = np.random.RandomState(seed)
            self._seeds = [int(self._rng.randint(2**31)) for _ in self.envs]
        for i, env in enumerate(self.envs):
            obs, _ = env.reset(seed=self._seeds[i])
            self._obs[i] = np.asarray(obs, np.float32).ravel()
        return self._obs.copy()

    def _scale(self, normalized: np.ndarray) -> np.ndarray:
        a = self.action_low + (normalized + 1.0) * 0.5 * (
            self.action_high - self.action_low
        )
        return np.clip(a, self.action_low, self.action_high)

    def _step_one(self, i: int, action: np.ndarray):
        env = self.envs[i]
        obs, reward, terminated, truncated, info = env.step(action)
        done = terminated or truncated
        true_next = np.asarray(obs, np.float32).ravel()
        if done:
            obs, _ = env.reset(
                seed=int(self._rng.randint(2**31)))
            obs = np.asarray(obs, np.float32).ravel()
        else:
            obs = true_next
        return true_next, float(reward), bool(terminated), bool(done), obs

    def step(self, normalized_actions: np.ndarray
             ) -> Tuple[np.ndarray, ...]:
        """Returns (obs_prev, true_next_obs, reward, terminal, done,
        obs_after_reset), all [B, ...] numpy."""
        actions = self._scale(np.asarray(normalized_actions, np.float32))
        obs_prev = self._obs.copy()
        if self._pool is not None:
            results = list(self._pool.map(
                self._step_one, range(self.num_envs), actions))
        else:
            results = [self._step_one(0, actions[0])]
        true_next = np.stack([r[0] for r in results])
        reward = np.asarray([r[1] for r in results], np.float32)
        terminal = np.asarray([r[2] for r in results], bool)
        done = np.asarray([r[3] for r in results], bool)
        self._obs = np.stack([r[4] for r in results])
        return obs_prev, true_next, reward, terminal, done, self._obs.copy()

    def close(self) -> None:
        for env in self.envs:
            env.close()
        if self._pool is not None:
            self._pool.shutdown()

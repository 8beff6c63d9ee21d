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
    "bipedalwalker": "BipedalWalker-v3",
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


class HostGoalVectorEnv:
    """B lockstep dict-obs goal envs (gymnasium-robotics Fetch family)
    with immediate autoreset — the host backend for HER (reference
    her_*_exp_script.py on FetchPush/PickAndPlace/Slide/Reach).

    Obs are dicts {observation, achieved_goal, desired_goal} of [B, ...]
    arrays; `compute_reward` mirrors the env's sparse/dense goal reward
    as a pure jax function so hindsight relabeling (data/her.py) can
    recompute rewards on device (reference
    relabel_replay_buffer.py:137-142 calls env.compute_reward)."""

    def __init__(self, env_name: str, num_envs: int, seed: int = 0,
                 max_episode_steps: int | None = None,
                 env_kwargs: dict | None = None, num_threads: int = 8):
        import gymnasium as gym
        try:  # registers the Fetch/Hand ids
            import gymnasium_robotics  # noqa: F401
        except ImportError:
            pass

        gym_id = GYM_ENV_IDS.get(env_name, env_name)
        kwargs = dict(env_kwargs or {})
        if max_episode_steps is not None:
            kwargs["max_episode_steps"] = max_episode_steps
        self.envs = [gym.make(gym_id, **kwargs) for _ in range(num_envs)]
        self.num_envs = num_envs
        self.name = env_name

        space = self.envs[0].observation_space
        aspace = self.envs[0].action_space
        self.observation_size = int(np.prod(space["observation"].shape))
        self.goal_size = int(np.prod(space["desired_goal"].shape))
        self.action_size = int(np.prod(aspace.shape))
        self.discrete = False
        self.action_low = np.asarray(aspace.low, np.float32)
        self.action_high = np.asarray(aspace.high, np.float32)
        self.max_episode_steps = (
            max_episode_steps
            or getattr(self.envs[0].spec, "max_episode_steps", None)
            or 50
        )
        u = self.envs[0].unwrapped
        self.distance_threshold = float(
            getattr(u, "distance_threshold", 0.05))
        self.reward_type = str(getattr(u, "reward_type", "sparse"))
        self._rng = np.random.RandomState(seed)
        self._seeds = [int(self._rng.randint(2**31)) for _ in self.envs]
        self._pool = (
            ThreadPoolExecutor(max_workers=min(num_threads, num_envs))
            if num_envs > 1 else None
        )
        self._obs = self._zeros_obs()

    def _zeros_obs(self):
        return {
            "observation": np.zeros(
                (self.num_envs, self.observation_size), np.float32),
            "achieved_goal": np.zeros(
                (self.num_envs, self.goal_size), np.float32),
            "desired_goal": np.zeros(
                (self.num_envs, self.goal_size), np.float32),
        }

    @staticmethod
    def _flat(obs_dict):
        return {k: np.asarray(v, np.float32).ravel()
                for k, v in obs_dict.items()}

    def compute_reward(self, achieved_goal, desired_goal):
        """Pure (jax-traceable) goal reward — Fetch semantics
        (gymnasium_robotics fetch_env.compute_reward)."""
        import jax.numpy as jnp
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.reward_type == "sparse":
            return -(d > self.distance_threshold).astype(jnp.float32)
        return -d

    # ------------------------------------------------------------------
    def reset(self, seed: int | None = None):
        if seed is not None:
            self._rng = np.random.RandomState(seed)
            self._seeds = [int(self._rng.randint(2**31)) for _ in self.envs]
        for i, env in enumerate(self.envs):
            obs, _ = env.reset(seed=self._seeds[i])
            flat = self._flat(obs)
            for k in self._obs:
                self._obs[k][i] = flat[k]
        return {k: v.copy() for k, v in self._obs.items()}

    def _scale(self, normalized: np.ndarray) -> np.ndarray:
        a = self.action_low + (normalized + 1.0) * 0.5 * (
            self.action_high - self.action_low)
        return np.clip(a, self.action_low, self.action_high)

    def _step_one(self, i: int, action: np.ndarray):
        env = self.envs[i]
        obs, reward, terminated, truncated, info = env.step(action)
        done = terminated or truncated
        true_next = self._flat(obs)
        success = float(info.get("is_success", 0.0))
        if done:
            obs, _ = env.reset(seed=int(self._rng.randint(2**31)))
            obs = self._flat(obs)
        else:
            obs = true_next
        return (true_next, float(reward), bool(terminated), bool(done),
                obs, success)

    def step(self, normalized_actions: np.ndarray):
        """Returns (obs_prev, true_next_obs, reward, terminal, done,
        obs_after_reset, success) — obs entries are dicts of [B, ...]."""
        actions = self._scale(np.asarray(normalized_actions, np.float32))
        obs_prev = {k: v.copy() for k, v in self._obs.items()}
        if self._pool is not None:
            results = list(self._pool.map(
                self._step_one, range(self.num_envs), actions))
        else:
            results = [self._step_one(0, actions[0])]
        keys = ("observation", "achieved_goal", "desired_goal")
        true_next = {k: np.stack([r[0][k] for r in results]) for k in keys}
        reward = np.asarray([r[1] for r in results], np.float32)
        terminal = np.asarray([r[2] for r in results], bool)
        done = np.asarray([r[3] for r in results], bool)
        for k in keys:
            self._obs[k] = np.stack([r[4][k] for r in results])
        success = np.asarray([r[5] for r in results], np.float32)
        return (obs_prev, true_next, reward, terminal, done,
                {k: v.copy() for k, v in self._obs.items()}, success)

    def close(self) -> None:
        for env in self.envs:
            env.close()
        if self._pool is not None:
            self._pool.shutdown()


class _DelegatingHostEnv:
    """Shares the GymVectorEnv step contract; wraps any host vec env."""

    def __init__(self, inner):
        self.inner = inner
        self.num_envs = inner.num_envs
        self.name = inner.name
        self.observation_size = inner.observation_size
        self.action_size = inner.action_size
        self.discrete = getattr(inner, "discrete", False)
        self.max_episode_steps = inner.max_episode_steps

    def reset(self, seed: int | None = None) -> np.ndarray:
        return self.inner.reset(seed=seed)

    def step(self, normalized_actions: np.ndarray) -> Tuple[np.ndarray, ...]:
        return self.inner.step(normalized_actions)

    def close(self) -> None:
        self.inner.close()


class ScaledHostEnv(_DelegatingHostEnv):
    """Demo-stats obs standardization for host envs (reference ScaledEnv,
    rlkit/envs/wrappers.py:53, applied in adv_irl_exp_script.py:86-103)."""

    def __init__(self, inner, obs_mean, obs_std, eps: float = 1e-8):
        super().__init__(inner)
        self.obs_mean = np.asarray(obs_mean, np.float32)
        self.obs_denom = np.asarray(obs_std, np.float32) + eps

    def _scale(self, obs):
        return (obs - self.obs_mean) / self.obs_denom

    def reset(self, seed: int | None = None) -> np.ndarray:
        return self._scale(self.inner.reset(seed=seed))

    def step(self, normalized_actions):
        obs_prev, true_next, reward, terminal, done, obs_after = (
            self.inner.step(normalized_actions))
        return (self._scale(obs_prev), self._scale(true_next), reward,
                terminal, done, self._scale(obs_after))


class MinmaxHostEnv(ScaledHostEnv):
    """obs -> (obs - min) / (max - min)  (reference MinmaxEnv:143)."""

    def __init__(self, inner, obs_min, obs_max, eps: float = 1e-8):
        _DelegatingHostEnv.__init__(self, inner)
        self.obs_mean = np.asarray(obs_min, np.float32)
        self.obs_denom = (
            np.asarray(obs_max, np.float32)
            - np.asarray(obs_min, np.float32) + eps
        )


class AbsorbingHostEnv(_DelegatingHostEnv):
    """DAC absorbing states on host envs, mirroring envs.wrappers.
    AbsorbingEnv semantics: obs gain a trailing indicator dim; a true
    terminal routes into a zero-obs absorbing state with one self-loop
    step (zero reward) before the underlying reset's obs is exposed.

    As in the device wrapper, the inner env still advances during the
    self-loop step (there the discarded pre-reset state; here, with
    inner autoreset, one throwaway step of the fresh episode) -- the
    recorded DAC transitions are exact, episodes just resume one inner
    step in.
    """

    def __init__(self, inner):
        super().__init__(inner)
        self.observation_size = inner.observation_size + 1
        self.max_episode_steps = inner.max_episode_steps + 1
        self._in_absorbing = np.zeros((inner.num_envs,), bool)

    def _pad(self, obs, flag: float = 0.0):
        f = np.full((obs.shape[0], 1), flag, np.float32)
        return np.concatenate([obs, f], axis=-1)

    def _absorb(self, n: int):
        out = np.zeros((n, self.observation_size), np.float32)
        out[:, -1] = 1.0
        return out

    def reset(self, seed: int | None = None) -> np.ndarray:
        self._in_absorbing[:] = False
        return self._pad(self.inner.reset(seed=seed))

    def step(self, normalized_actions):
        B = self.num_envs
        was_absorbing = self._in_absorbing.copy()
        obs_prev_i, true_next_i, reward_i, terminal_i, done_i, obs_after_i = (
            self.inner.step(normalized_actions))

        obs_prev = np.where(
            was_absorbing[:, None], self._absorb(B), self._pad(obs_prev_i))
        reward = np.where(was_absorbing, 0.0, reward_i)
        entered = np.logical_and(~was_absorbing, terminal_i)
        # the absorbing self-loop row ends the episode
        terminal = was_absorbing.copy()
        done = np.logical_or(
            was_absorbing, np.logical_and(done_i, ~entered))
        true_next = np.where(
            np.logical_or(was_absorbing, entered)[:, None],
            self._absorb(B), self._pad(true_next_i))

        # rows entering absorbing expose the absorbing obs for one step;
        # afterwards the stream rejoins the inner env's live obs
        obs_after = self._pad(obs_after_i)
        obs_after[entered] = self._absorb(B)[entered]
        self._in_absorbing = entered
        return obs_prev, true_next, reward, terminal, done, obs_after

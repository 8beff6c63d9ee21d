"""Goal-conditioned environments (dict observations).

Stands in for the reference's robotics goal envs (gym Fetch family,
registered at rlkit/envs/envs_dict.py 'fetch-*'): observations are
pytrees {observation, achieved_goal, desired_goal} and rewards are
sparse threshold rewards computed by `compute_reward` — the hook HER
relabeling recomputes rewards through
(relabel_replay_buffer.py:137-142).

`GoalReach2D` is an analytic point-mass reach task that exercises the
whole goal-conditioned pipeline on any backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs.base import Environment


class GoalReach2D(Environment):
    """Velocity-controlled point mass must reach a random 2D goal.

    obs = {observation: [x, y, vx, vy], achieved_goal: [x, y],
           desired_goal: [gx, gy]}.
    reward: 0 if ||achieved - desired|| < threshold else -1 (sparse,
    Fetch-style); episode terminates on success.
    """

    observation_size = 4   # the non-goal part
    goal_size = 2
    action_size = 2
    discrete = False
    max_episode_steps = 50
    action_low = np.array([-1.0, -1.0], np.float32)
    action_high = np.array([1.0, 1.0], np.float32)

    dt = 0.1
    distance_threshold = 0.05
    bound = 1.0
    sparse = True

    # --- goal API (reference goal_env_utils / env.compute_reward) ------
    def compute_reward(self, achieved_goal: jnp.ndarray,
                       desired_goal: jnp.ndarray) -> jnp.ndarray:
        d = jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)
        if self.sparse:
            return -(d >= self.distance_threshold).astype(jnp.float32)
        return -d

    def compute_distance(self, achieved_goal, desired_goal):
        return jnp.linalg.norm(achieved_goal - desired_goal, axis=-1)

    # --- env hooks -----------------------------------------------------
    def _obs(self, internal):
        pos_vel, goal = internal
        return {
            "observation": pos_vel,
            "achieved_goal": pos_vel[:2],
            "desired_goal": goal,
        }

    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (2,), minval=-self.bound,
                                 maxval=self.bound)
        goal = jax.random.uniform(k2, (2,), minval=-self.bound,
                                  maxval=self.bound)
        internal = (jnp.concatenate([pos, jnp.zeros(2)]), goal)
        return internal, self._obs(internal)

    def _step(self, internal, action, key):
        pos_vel, goal = internal
        vel = jnp.clip(action, -1.0, 1.0)
        pos = jnp.clip(pos_vel[:2] + vel * self.dt,
                       -self.bound, self.bound)
        new_pv = jnp.concatenate([pos, vel])
        internal = (new_pv, goal)
        reward = self.compute_reward(pos, goal)
        terminal = reward >= -0.5 if self.sparse else (
            self.compute_distance(pos, goal) < self.distance_threshold
        )
        return internal, self._obs(internal), reward, terminal

"""Hindsight experience replay: episodic device buffer + relabeling.

Rebuild of the reference `HindsightReplayBuffer`
(rlkit/data_management/relabel_replay_buffer.py).  The reference keeps a
flat ring plus a trajectory-endpoint dict and relabels with host Python
loops (:74-117); with interleaved lockstep writes that structure becomes
an episodic `[num_slots, T_max, ...]` layout — SURVEY.md §7.3.2's
array-native answer.  Episode slots are partitioned per env (each env
ring-buffers its own K = num_slots / num_envs slots) so concurrent
writes never collide.

Sampling parity (relabel_replay_buffer.py:66-145):
  - uniform over completed trajectories, then uniform step within
  - relabel strategies: 'final' (goal := last achieved) and 'future'
    (goal := achieved at a uniform future step)
  - first her_ratio * batch rows relabeled; rewards recomputed for the
    WHOLE batch via env.compute_reward(next_achieved, desired)
  - terminals kept as recorded
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.envs.vector import Transition


@struct.dataclass
class HindsightReplayState:
    data: Dict[str, jnp.ndarray]  # [S, T, ...]
    ep_len: jnp.ndarray           # [S] int32, 0 = invalid/incomplete
    cur_slot: jnp.ndarray         # [B] active slot per env
    cur_t: jnp.ndarray            # [B] step within episode
    completed: jnp.ndarray        # [B] completed-episode count per env


class HindsightReplayBuffer:
    def __init__(self, env, num_envs: int, num_episode_slots: int,
                 max_episode_steps: int, relabel_type: str = "future",
                 her_ratio: float = 0.8):
        assert relabel_type in ("future", "final", None)
        assert num_episode_slots % num_envs == 0
        self.env = env
        self.num_envs = num_envs
        self.S = num_episode_slots
        self.T = max_episode_steps
        self.K = num_episode_slots // num_envs
        assert self.K >= 2, "need >= 2 episode slots per env"
        self.relabel_type = relabel_type
        self.her_ratio = her_ratio

    # ------------------------------------------------------------------
    def init(self) -> HindsightReplayState:
        S, T = self.S, self.T
        obs_dim = self.env.observation_size
        goal_dim = self.env.goal_size
        act_dim = self.env.action_size
        # discrete envs (DiscretEnv-wrapped, reference wrappers.py:411)
        # store the action index, not a one-hot/continuous vector
        action0 = (jnp.zeros((S, T), jnp.int32)
                   if getattr(self.env, "discrete", False)
                   else jnp.zeros((S, T, act_dim)))
        data = {
            "observation": jnp.zeros((S, T, obs_dim)),
            "achieved_goal": jnp.zeros((S, T, goal_dim)),
            "desired_goal": jnp.zeros((S, T, goal_dim)),
            "action": action0,
            "reward": jnp.zeros((S, T)),
            "terminal": jnp.zeros((S, T)),
            "next_observation": jnp.zeros((S, T, obs_dim)),
            "next_achieved_goal": jnp.zeros((S, T, goal_dim)),
        }
        B, K = self.num_envs, self.K
        return HindsightReplayState(
            data=data,
            ep_len=jnp.zeros((S,), jnp.int32),
            cur_slot=jnp.arange(B, dtype=jnp.int32) * K,
            cur_t=jnp.zeros((B,), jnp.int32),
            completed=jnp.zeros((B,), jnp.int32),
        )

    # ------------------------------------------------------------------
    def add(self, state: HindsightReplayState, tr: Transition
            ) -> HindsightReplayState:
        """Store one vectorized batch of dict-obs transitions."""
        B, K = self.num_envs, self.K
        slots, ts = state.cur_slot, state.cur_t

        rows = {
            "observation": tr.obs["observation"],
            "achieved_goal": tr.obs["achieved_goal"],
            "desired_goal": tr.obs["desired_goal"],
            "action": tr.action,
            "reward": tr.reward,
            "terminal": tr.terminal.astype(jnp.float32),
            "next_observation": tr.next_obs["observation"],
            "next_achieved_goal": tr.next_obs["achieved_goal"],
        }
        data = {
            k: state.data[k].at[slots, ts].set(v) for k, v in rows.items()
        }

        done = tr.done
        new_t = jnp.where(done, 0, ts + 1)
        # truncate silently at T (caller should size T = max_episode_steps)
        new_t = jnp.minimum(new_t, self.T - 1)
        completed = state.completed + done.astype(jnp.int32)
        # finalize episode length for finished slots
        ep_len = state.ep_len.at[slots].set(
            jnp.where(done, ts + 1, state.ep_len[slots])
        )
        # claim the next slot in this env's partition on done
        next_slot = (
            jnp.arange(B, dtype=jnp.int32) * K + completed % K
        )
        new_slot = jnp.where(done, next_slot, slots)
        # invalidate the (possibly recycled) newly-claimed slot
        ep_len = jnp.where(
            jnp.zeros((self.S,), bool).at[new_slot].set(done),
            0, ep_len,
        )
        return HindsightReplayState(
            data=data, ep_len=ep_len, cur_slot=new_slot,
            cur_t=new_t, completed=completed,
        )

    # ------------------------------------------------------------------
    def sample(self, state: HindsightReplayState, key: jax.Array,
               batch_size: int, return_horizon: bool = False
               ) -> Dict[str, jnp.ndarray]:
        """`return_horizon` adds the steps-to-relabeled-goal key used by
        GCSL (reference HindsightHorizonReplayBuffer,
        relabel_horizon_replay_buffer.py:9-262)."""
        B, K = self.num_envs, self.K
        k_env, k_ep, k_t, k_fut = jax.random.split(key, 4)

        env_idx = jax.random.randint(k_env, (batch_size,), 0, B)
        n_comp = jnp.minimum(state.completed[env_idx], K - 1)
        n_comp = jnp.maximum(n_comp, 1)  # caller must warm up first
        # valid slots per env: the n_comp most recent completed ones,
        # i.e. local indices (cur_local - 1 - j) mod K
        j = (jax.random.uniform(k_ep, (batch_size,))
             * n_comp.astype(jnp.float32)).astype(jnp.int32)
        cur_local = state.cur_slot[env_idx] - env_idx * K
        slot = env_idx * K + (cur_local - 1 - j) % K

        length = jnp.maximum(state.ep_len[slot], 1)
        u = jax.random.uniform(k_t, (batch_size,))
        t = (u * length.astype(jnp.float32)).astype(jnp.int32)

        if self.relabel_type == "final":
            t_her = length - 1
        else:  # future: uniform in [t, length)
            span = (length - t).astype(jnp.float32)
            t_her = t + (jax.random.uniform(k_fut, (batch_size,))
                         * span).astype(jnp.int32)
            t_her = jnp.minimum(t_her, length - 1)

        batch = {k: v[slot, t] for k, v in state.data.items()}

        if self.relabel_type is not None and self.her_ratio > 0:
            relabel_num = int(self.her_ratio * batch_size)
            new_goal = state.data["next_achieved_goal"][slot, t_her]
            mask = (jnp.arange(batch_size) < relabel_num)[:, None]
            desired = jnp.where(mask, new_goal, batch["desired_goal"])
            batch["desired_goal"] = desired
            # reward recomputed for the whole batch (:137-142)
            batch["reward"] = self.env.compute_reward(
                batch["next_achieved_goal"], desired
            )
        if return_horizon:
            batch["horizon"] = (t_her - t).astype(jnp.int32)
        return batch

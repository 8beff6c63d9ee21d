"""Device-resident replay buffer as pure functions.

TPU-native equivalent of the reference's numpy ring buffer
(`SimpleReplayBuffer`, rlkit/data_management/simple_replay_buffer.py):
fixed `[capacity, ...]` HBM arrays + an int32 write cursor.  Writes are
contiguous `dynamic_update_slice`s of the whole vectorized-env batch
(the reference's per-transition Python `add_sample` loop,
base_algorithm.py:489-507, becomes one fused store); sampling is a
uniform gather.  The trajectory-endpoint dict (`_traj_endpoints`,
simple_replay_buffer.py:65-68) is replaced by per-slot `ep_id`/`step_id`
arrays, the array-native representation that HER-style relabeling and
whole-trajectory fetches index into (SURVEY.md §7.3.2).

Capacity is rounded up to a multiple of the write-batch so the ring write
never splits across the wrap point — keeping the store a single
contiguous DMA instead of a scatter.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from ilswiss_tpu.envs.vector import Transition


@struct.dataclass
class ReplayState:
    data: Dict[str, jnp.ndarray]  # each [capacity, ...]
    ep_id: jnp.ndarray            # [capacity] int32 episode id of each row
    ptr: jnp.ndarray              # int32 next write position
    size: jnp.ndarray             # int32 number of valid rows
    # per-env episode counters for the writing vec env [write_batch];
    # rows get globally-unique episode ids env_idx * LARGE + counter so
    # trajectory-aware ops (n-step lookahead, traj sampling) can detect
    # episode boundaries — the array-native _traj_endpoints
    # (simple_replay_buffer.py:65-68)
    env_ep: jnp.ndarray | None = None


def round_capacity(capacity: int, write_batch: int) -> int:
    return ((capacity + write_batch - 1) // write_batch) * write_batch


def replay_init(capacity: int, obs_size, action_size: int,
                write_batch: int, discrete: bool = False,
                obs_dtype=jnp.float32) -> ReplayState:
    """Preallocate the ring (reference __init__ simple_replay_buffer.py:48-68).

    `obs_size` may be an int (vector obs) or a shape tuple (image obs —
    stored at their native dtype, e.g. uint8, matching the reference's
    uint8 image storage, simple_replay_buffer.py:26)."""
    capacity = round_capacity(capacity, write_batch)
    obs_shape = (obs_size,) if isinstance(obs_size, int) else tuple(obs_size)
    action_shape = () if discrete else (action_size,)
    action_dtype = jnp.int32 if discrete else jnp.float32
    data = {
        "obs": jnp.zeros((capacity,) + obs_shape, obs_dtype),
        "action": jnp.zeros((capacity,) + action_shape, action_dtype),
        "reward": jnp.zeros((capacity,), jnp.float32),
        "next_obs": jnp.zeros((capacity,) + obs_shape, obs_dtype),
        "terminal": jnp.zeros((capacity,), jnp.float32),
    }
    return ReplayState(
        data=data,
        ep_id=jnp.full((capacity,), -1, jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        env_ep=jnp.zeros((write_batch,), jnp.int32),
    )


_EP_STRIDE = 1 << 20  # episodes-per-env headroom for unique ids


def replay_add(state: ReplayState, tr: Transition) -> ReplayState:
    """Store one vectorized-env batch of B transitions at the cursor.

    Requires capacity % B == 0 (guaranteed by `replay_init`), so the write
    is one contiguous `dynamic_update_slice` per field.
    """
    capacity = state.data["reward"].shape[0]
    batch = tr.reward.shape[0]
    assert capacity % batch == 0, (capacity, batch)

    updates = {
        "obs": tr.obs,
        "action": tr.action,
        "reward": tr.reward,
        "next_obs": tr.next_obs,
        "terminal": tr.terminal.astype(jnp.float32),
    }
    data = dict(state.data)
    for k, v in updates.items():
        start = (state.ptr,) + (0,) * (v.ndim - 1)
        data[k] = jax.lax.dynamic_update_slice(state.data[k], v, start)

    if state.env_ep is not None and state.env_ep.shape[0] == batch:
        env_idx = jnp.arange(batch, dtype=jnp.int32)
        ep_id_rows = env_idx * _EP_STRIDE + state.env_ep
        new_env_ep = state.env_ep + tr.done.astype(jnp.int32)
    else:
        ep_id_rows = jnp.zeros((batch,), jnp.int32)
        new_env_ep = state.env_ep
    new_ep = jax.lax.dynamic_update_slice(
        state.ep_id, ep_id_rows, (state.ptr,))
    return ReplayState(
        data=data,
        ep_id=new_ep,
        ptr=(state.ptr + batch) % capacity,
        size=jnp.minimum(state.size + batch, capacity),
        env_ep=new_env_ep,
    )


def replay_add_masked(state: ReplayState, rows: Dict[str, jnp.ndarray],
                      mask: jnp.ndarray) -> ReplayState:
    """Append only rows where mask is True, compacted at the cursor.

    Used by MBPO's branched model rollouts, which drop terminated
    branches (reference mbpo.py:254-259 shrinks the alive set; here the
    masked full-width write of SURVEY.md §7.3.4): a stable argsort moves
    alive rows to the front, they land contiguously at ptr, and the
    remaining slots re-write their existing contents (no corruption),
    with ptr/size advancing by the alive count only.
    """
    capacity = state.data["reward"].shape[0]
    n_rows = mask.shape[0]
    alive = mask.astype(jnp.int32)
    n_alive = jnp.sum(alive)
    order = jnp.argsort(1 - alive, stable=True)   # alive rows first
    alive_sorted = alive[order].astype(bool)
    slots = (state.ptr + jnp.arange(n_rows)) % capacity

    data = dict(state.data)
    for k, v in rows.items():
        new_vals = v[order]
        cur_vals = state.data[k][slots]
        sel = alive_sorted.reshape((-1,) + (1,) * (v.ndim - 1))
        data[k] = state.data[k].at[slots].set(
            jnp.where(sel, new_vals, cur_vals)
        )
    return ReplayState(
        data=data,
        ep_id=state.ep_id,  # model rollouts carry no episode structure
        ptr=(state.ptr + n_alive) % capacity,
        size=jnp.minimum(state.size + n_alive, capacity),
        env_ep=state.env_ep,
    )


def replay_sample(state: ReplayState, key: jax.Array, batch_size: int
                  ) -> Dict[str, jnp.ndarray]:
    """Uniform gather over valid rows (reference `random_batch`,
    simple_replay_buffer.py:239-253)."""
    u = jax.random.uniform(key, (batch_size,))
    idx = jnp.minimum(
        (u * state.size.astype(jnp.float32)).astype(jnp.int32),
        state.size - 1,
    )
    return {k: v[idx] for k, v in state.data.items()}


def replay_sample_window(state: ReplayState, key: jax.Array,
                         num_windows: int, window: int
                         ) -> Dict[str, jnp.ndarray]:
    """Sample [Bw, T, ...] same-env trajectory windows with a same-
    episode validity mask (for trajectory discriminators — the
    reference's RNNDisc path consumes (batch, length, dim) windows).

    Uses the lockstep write layout (consecutive steps of one env are
    `write_batch` slots apart, like `replay_sample_nstep`); demo buffers
    built traj-contiguously (env_ep=None, data/demo.py) have stride 1.
    `valid` [Bw, T] marks the prefix of each window that stays inside
    the episode of its first step; steps past the boundary (or into
    unwritten/overwritten rows) are masked out.
    """
    capacity = state.data["reward"].shape[0]
    stride = 1 if state.env_ep is None else state.env_ep.shape[0]
    u = jax.random.uniform(key, (num_windows,))
    idx = jnp.minimum(
        (u * state.size.astype(jnp.float32)).astype(jnp.int32),
        state.size - 1,
    )
    offs = (idx[:, None]
            + jnp.arange(window, dtype=jnp.int32)[None, :] * stride
            ) % capacity                                  # [Bw, T]
    same_ep = state.ep_id[offs] == state.ep_id[idx][:, None]
    in_range = offs < state.size
    valid = jnp.cumprod(
        (same_ep & in_range).astype(jnp.int32), axis=1
    ).astype(bool)
    out = {k: v[offs] for k, v in state.data.items()}
    out["valid"] = valid
    return out


def replay_sample_nstep(state: ReplayState, key: jax.Array,
                        batch_size: int, n_step: int, discount: float
                        ) -> Dict[str, jnp.ndarray]:
    """n-step batch: discounted reward sums + n-step next_obs, masked at
    episode boundaries (reference multi-step lookahead,
    simple_replay_buffer.py:295-320 — endpoint dict replaced by ep_id
    comparisons; rows whose lookahead crosses an episode edge or the
    write cursor truncate at the last in-episode step).

    Relies on the lockstep write pattern: consecutive steps of one env
    sit exactly `write_batch` slots apart.
    """
    capacity = state.data["reward"].shape[0]
    stride = state.env_ep.shape[0]  # write_batch
    u = jax.random.uniform(key, (batch_size,))
    idx = jnp.minimum(
        (u * state.size.astype(jnp.float32)).astype(jnp.int32),
        state.size - 1,
    )
    base_ep = state.ep_id[idx]

    def body(carry, k):
        reward_acc, valid, last_valid_off = carry
        off_idx = (idx + k * stride) % capacity
        same_ep = state.ep_id[off_idx] == base_ep
        step_term = state.data["terminal"][off_idx] > 0.5
        valid_k = jnp.logical_and(valid, same_ep)
        reward_acc = reward_acc + jnp.where(
            valid_k, (discount ** k) * state.data["reward"][off_idx], 0.0
        )
        last_valid_off = jnp.where(valid_k, k, last_valid_off)
        # stop extending after a terminal inside the window
        valid = jnp.logical_and(valid_k, jnp.logical_not(step_term))
        return (reward_acc, valid, last_valid_off), None

    init = (
        jnp.zeros((batch_size,), jnp.float32),
        jnp.ones((batch_size,), bool),
        jnp.zeros((batch_size,), jnp.int32),
    )
    (reward_acc, _, last_off), _ = jax.lax.scan(
        body, init, jnp.arange(n_step))

    end_idx = (idx + last_off * stride) % capacity
    return {
        "obs": state.data["obs"][idx],
        "action": state.data["action"][idx],
        "reward": reward_acc,
        "next_obs": state.data["next_obs"][end_idx],
        "terminal": state.data["terminal"][end_idx],
        "n_step_used": last_off + 1,
    }

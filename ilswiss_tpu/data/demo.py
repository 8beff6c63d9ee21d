"""Expert demonstration buffers.

Replaces the reference's pickle-of-trajectories demo pipeline
(run_scripts/adv_irl_exp_script.py:51-53 loads listings from
demos_listing.yaml; trajectories are pushed into an `EnvReplayBuffer`
via add_path, adv_irl_exp_script.py:135-138).  Here demos are stored as
flat transition arrays in an `.npz` and loaded straight into a full
(size == capacity) `ReplayState`, so expert sampling is the same
uniform gather as replay sampling — and the expert buffer shards into
HBM like any other buffer.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.replay import ReplayState


def demos_to_replay_state(
    obs: np.ndarray, action: np.ndarray, reward: np.ndarray,
    next_obs: np.ndarray, terminal: np.ndarray,
    ep_id: np.ndarray | None = None,
    stride: int = 1,
) -> ReplayState:
    """Build a full expert ReplayState from flat transition arrays [N, ...].

    `stride` records the row distance between consecutive steps of one
    trajectory (1 for traj-contiguous pickles; the vectorized collector
    interleaves B envs so its stride is B) — trajectory-window sampling
    (replay_sample_window) reads it back via env_ep's length."""
    n = obs.shape[0]
    data = {
        "obs": jnp.asarray(obs, jnp.float32),
        "action": jnp.asarray(action),
        "reward": jnp.asarray(reward, jnp.float32).reshape(n),
        "next_obs": jnp.asarray(next_obs, jnp.float32),
        "terminal": jnp.asarray(terminal, jnp.float32).reshape(n),
    }
    if ep_id is None:
        ep_id = np.zeros((n,), np.int32)
    return ReplayState(
        data=data,
        ep_id=jnp.asarray(ep_id, jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.asarray(n, jnp.int32),
        env_ep=None if stride == 1 else jnp.zeros((stride,), jnp.int32),
    )


def trajs_to_replay_state(trajs: List[Dict[str, np.ndarray]]) -> ReplayState:
    """trajs: list of dicts with per-step arrays
    (observations, actions, rewards, next_observations, terminals) —
    the reference's trajectory pickle schema."""
    cat = lambda k: np.concatenate([t[k] for t in trajs], axis=0)
    ep_id = np.concatenate([
        np.full((len(t["rewards"]),), i, np.int32)
        for i, t in enumerate(trajs)
    ])
    return demos_to_replay_state(
        cat("observations"), cat("actions"), cat("rewards"),
        cat("next_observations"), cat("terminals"), ep_id,
    )


def save_demos_npz(path: str, state: ReplayState) -> None:
    """Persist a demo buffer.  ep_ids are renumbered densely (0..N-1 in
    order of first appearance) at save time — the vectorized collector
    numbers episodes by env slot, and downstream `traj_num` subsetting
    expects dense trajectory ids."""
    ep = np.asarray(state.ep_id)
    _, first, inverse = np.unique(ep, return_index=True, return_inverse=True)
    # rank unique ids by first appearance
    rank = np.empty(len(first), np.int32)
    rank[np.argsort(first)] = np.arange(len(first), dtype=np.int32)
    np.savez_compressed(
        path,
        ep_id=rank[inverse],
        **{k: np.asarray(v) for k, v in state.data.items()},
    )


def load_demos_npz(path: str) -> ReplayState:
    z = np.load(path)
    return demos_to_replay_state(
        z["obs"], z["action"], z["reward"], z["next_obs"], z["terminal"],
        z["ep_id"] if "ep_id" in z else None,
    )


def wrap_absorbing_demos(state: ReplayState) -> ReplayState:
    """Extend demos with DAC absorbing indicators + transitions
    (reference simple_replay_buffer.add_path wrap_absorbing branch,
    :134-216): obs gain a 0-flag dim; each terminal transition is
    redirected into the absorbing state and followed by one
    absorbing self-loop row with zero action/reward."""
    obs = np.asarray(state.data["obs"])
    next_obs = np.asarray(state.data["next_obs"])
    action = np.asarray(state.data["action"])
    reward = np.asarray(state.data["reward"])
    terminal = np.asarray(state.data["terminal"])
    ep_id = np.asarray(state.ep_id)
    n, d = obs.shape

    pad0 = lambda x: np.concatenate(
        [x, np.zeros((len(x), 1), x.dtype)], axis=-1)
    absorb = np.zeros((1, d + 1), np.float32)
    absorb[0, -1] = 1.0

    rows = {
        "obs": [], "action": [], "reward": [], "next_obs": [],
        "terminal": [], "ep": [],
    }
    for i in range(n):
        o = pad0(obs[i:i + 1])
        nx = (absorb if terminal[i] > 0.5 else pad0(next_obs[i:i + 1]))
        rows["obs"].append(o)
        rows["action"].append(action[i:i + 1])
        rows["reward"].append(reward[i:i + 1])
        rows["next_obs"].append(nx)
        rows["terminal"].append(np.zeros(1))
        rows["ep"].append(ep_id[i:i + 1])
        if terminal[i] > 0.5:  # absorbing self-loop row
            rows["obs"].append(absorb)
            rows["action"].append(np.zeros_like(action[i:i + 1]))
            rows["reward"].append(np.zeros(1))
            rows["next_obs"].append(absorb)
            rows["terminal"].append(np.ones(1))
            rows["ep"].append(ep_id[i:i + 1])
    return demos_to_replay_state(
        np.concatenate(rows["obs"]),
        np.concatenate(rows["action"]),
        np.concatenate(rows["reward"]),
        np.concatenate(rows["next_obs"]),
        np.concatenate(rows["terminal"]),
        np.concatenate(rows["ep"]),
    )


def demo_obs_stats(state: ReplayState) -> Dict[str, np.ndarray]:
    """Per-dim obs statistics over the demo set (reference
    adv_irl_exp_script.py:56-60: mean/std/min/max of stacked
    observations drive ScaledEnv / MinmaxEnv)."""
    obs = np.asarray(state.data["obs"])
    return {
        "obs_mean": obs.mean(axis=0),
        "obs_std": obs.std(axis=0),
        "obs_min": obs.min(axis=0),
        "obs_max": obs.max(axis=0),
    }


def scale_demos(state: ReplayState, mean: np.ndarray, std: np.ndarray,
                eps: float = 1e-8) -> ReplayState:
    """Standardize demo obs/next_obs by the given stats (reference
    adv_irl_exp_script.py:97-103)."""
    data = dict(state.data)
    data["obs"] = (state.data["obs"] - mean) / (std + eps)
    data["next_obs"] = (state.data["next_obs"] - mean) / (std + eps)
    return state.replace(data=data)


def minmax_demos(state: ReplayState, lo: np.ndarray, hi: np.ndarray,
                 eps: float = 1e-8) -> ReplayState:
    """Map demo obs/next_obs to [0, 1] by demo min/max (reference
    adv_irl_exp_script.py:105-115)."""
    data = dict(state.data)
    data["obs"] = (state.data["obs"] - lo) / (hi - lo + eps)
    data["next_obs"] = (state.data["next_obs"] - lo) / (hi - lo + eps)
    return state.replace(data=data)


def subsample_trajs(state: ReplayState, num_trajs: int) -> ReplayState:
    """Keep the first `num_trajs` episodes (the reference's
    `traj_num` demo subsetting in adv_irl_exp_script.py).

    Episodes are identified by *unique* ep_id in order of first
    appearance — the vectorized collector numbers episodes by env slot,
    so ids need not be contiguous (e.g. {0, 2, 4, 6}); filtering on
    `ep_id < num_trajs` would silently drop real trajectories.  Kept
    episodes are renumbered densely 0..num_trajs-1."""
    ep = np.asarray(state.ep_id)
    _, first = np.unique(ep, return_index=True)
    keep = ep[np.sort(first)][:num_trajs]
    remap = {int(e): i for i, e in enumerate(keep)}
    mask = np.isin(ep, keep)
    idx = np.nonzero(mask)[0]
    new_ep = np.array([remap[int(e)] for e in ep[idx]], np.int32)
    return demos_to_replay_state(
        np.asarray(state.data["obs"])[idx],
        np.asarray(state.data["action"])[idx],
        np.asarray(state.data["reward"])[idx],
        np.asarray(state.data["next_obs"])[idx],
        np.asarray(state.data["terminal"])[idx],
        new_ep,
    )

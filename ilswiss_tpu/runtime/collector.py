"""Demo/rollout collection: scripted or trained policies -> demo buffers.

The framework's replacement for the reference's demo-generation scripts
(run_scripts/gen_*.py producing trajectory pickles listed in
demos_listing.yaml): roll a policy over the lockstep vec env in one
jitted scan, then flatten to a transition-array demo buffer.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.data.replay import ReplayState
from ilswiss_tpu.data.demo import demos_to_replay_state
from ilswiss_tpu.envs.vector import VectorEnv


def collect_transitions(vec_env: VectorEnv, act_fn: Callable,
                        num_steps_per_env: int, key: jax.Array
                        ) -> ReplayState:
    """act_fn(obs, key) -> normalized action.  Returns a demo ReplayState
    of num_steps_per_env * num_envs transitions with per-episode ids."""

    def rollout(key):
        k_reset, k_run = jax.random.split(key)
        env_state = vec_env.reset(k_reset)

        def step(carry, k):
            env_state = carry
            action = act_fn(env_state.obs, k)
            env_state, tr = vec_env.step(env_state, action)
            return env_state, tr

        keys = jax.random.split(k_run, num_steps_per_env)
        _, trs = jax.lax.scan(step, env_state, keys)
        return trs

    trs = jax.jit(rollout)(key)
    trs = jax.device_get(trs)

    T, B = trs.reward.shape
    # globally-unique episode ids: per-env episode counter + env offset
    done = np.asarray(trs.done)
    local_ep = np.concatenate(
        [np.zeros((1, B), np.int32), np.cumsum(done[:-1], axis=0)], axis=0
    ).astype(np.int32)
    ep_id = (np.arange(B, dtype=np.int32)[None, :] * (local_ep.max() + 2)
             + local_ep)

    flat = lambda x: np.asarray(x).reshape((T * B,) + x.shape[2:])
    return demos_to_replay_state(
        flat(trs.obs), flat(trs.action), flat(trs.reward),
        flat(trs.next_obs), flat(trs.terminal), ep_id.reshape(T * B),
        stride=B,
    )

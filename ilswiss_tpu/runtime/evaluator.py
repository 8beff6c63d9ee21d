"""Deterministic-policy evaluation as one jitted scan.

Replaces the reference eval path (`BaseAlgorithm.evaluate` ->
`PathSampler.obtain_samples` -> MakeDeterministic rollouts,
rlkit/core/base_algorithm.py:599-656, rlkit/samplers/normal_sampler.py):
N eval envs run `max_path_length` lockstep steps; per-env return/length
accumulate under a "first episode still running" mask so reward never
leaks across autoresets (the done-mask carry of SURVEY.md §7.3.1,
mirroring vec_sampler.py:85-91).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ilswiss_tpu.envs.vector import VectorEnv


def make_evaluator(vec_env: VectorEnv, act_fn: Callable,
                   max_path_length: int) -> Callable:
    """act_fn(algo_state, obs, key) -> deterministic action.

    Returns eval(algo_state, key) -> stats dict with the reference's
    headline keys (AverageReturn is the model-selection metric,
    base_algorithm.py:636-637).
    """

    def evaluate(algo_state, key: jax.Array) -> Dict[str, jnp.ndarray]:
        k_reset, k_run = jax.random.split(key)
        env_state = vec_env.reset(k_reset)
        num_envs = vec_env.num_envs

        def step(carry, key):
            env_state, returns, lengths, running = carry
            action = act_fn(algo_state, env_state.obs, key)
            env_state, tr = vec_env.step(env_state, action)
            returns = returns + tr.reward * running
            lengths = lengths + running
            running = running * (1.0 - tr.done.astype(jnp.float32))
            return (env_state, returns, lengths, running), None

        init = (
            env_state,
            jnp.zeros((num_envs,), jnp.float32),
            jnp.zeros((num_envs,), jnp.float32),
            jnp.ones((num_envs,), jnp.float32),
        )
        keys = jax.random.split(k_run, max_path_length)
        (_, returns, lengths, running), _ = jax.lax.scan(step, init, keys)

        # Envs whose first episode hit max_path_length are complete paths
        # too (the horizon == reference max_path_length cut).
        return {
            "AverageReturn": jnp.mean(returns),
            "MaxReturn": jnp.max(returns),
            "MinReturn": jnp.min(returns),
            "StdReturn": jnp.std(returns),
            "AvgPathLength": jnp.mean(lengths),
        }

    return jax.jit(evaluate)

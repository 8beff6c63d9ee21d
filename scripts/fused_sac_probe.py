"""On-chip A/B probe for the fused SAC update chain (ops/fused_sac.py).

Stage 2 of the kernel validation ladder (interpret-mode parity tests ->
THIS on-chip probe -> production runs): compiles the fused chain on the
real TPU, checks same-seed agreement against the unfused scan path, and
measures fused-loop throughput at the reference operating point
(hopper, B=128 envs, 1 grad step per env step, batch 512 —
exp_specs/sac/sac_hopper.yaml semantics).

Writes logs/fused_sac_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(use_fused: bool, num_envs=128, batch=512):
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop

    vec = make_vec("hopper", num_envs=num_envs)
    sac = SAC(vec.env.observation_size, vec.env.action_size, SACConfig(),
              net_size=256, num_hidden_layers=2,
              use_fused_chain=use_fused)
    loop = OffPolicyLoop(vec, sac, OffPolicyConfig(
        batch_size=batch, replay_capacity=1_000_000,
        min_steps_before_training=5_000,
        grad_steps_per_iter=num_envs))
    return vec, sac, loop


def run(use_fused: bool, steps_per_epoch=12_800, n_timed=3):
    from ilswiss_tpu.runtime.evaluator import make_evaluator

    vec, sac, loop = build(use_fused)
    warmup, train_epoch = loop.build(steps_per_epoch)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    runner, metrics = train_epoch(runner)      # compile + warm
    jax.device_get(metrics)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_timed):
        runner, metrics = train_epoch(runner)
    jax.device_get(metrics)
    dt = time.perf_counter() - t0
    sps = n_timed * steps_per_epoch / dt

    ev = make_evaluator(
        vec, lambda s, o, k: sac.act(s, o, k, deterministic=True), 1000)
    stats = jax.device_get(ev(runner.algo_state, jax.random.PRNGKey(9)))
    pol_flat = jnp.concatenate([
        x.reshape(-1) for x in jax.tree.leaves(runner.algo_state.policy_params)])
    return {
        "fused": use_fused,
        "compile_plus_first_epoch_s": round(compile_s, 2),
        "env_steps_per_s": round(sps, 1),
        "eval_return_after_4_epochs": float(stats["AverageReturn"]),
        "log_alpha": float(jax.device_get(runner.algo_state.log_alpha)),
        "policy_param_norm": float(jnp.linalg.norm(pol_flat)),
        "metrics_tail": {k: float(v) for k, v in
                         jax.device_get(metrics).items()},
    }


def main():
    out = {"device": str(jax.devices()[0])}
    out["unfused"] = run(False)
    out["fused"] = run(True)
    out["speedup"] = round(
        out["fused"]["env_steps_per_s"]
        / out["unfused"]["env_steps_per_s"], 3)
    # same-seed agreement: both paths see identical keys/batches; bf16
    # matmul drift compounds over 51.2k grad steps, so compare coarse
    # run-level statistics, not bits.
    da = abs(out["fused"]["log_alpha"] - out["unfused"]["log_alpha"])
    out["log_alpha_abs_diff"] = round(da, 4)
    path = os.path.join("logs", "fused_sac_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

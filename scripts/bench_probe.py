"""Throughput attribution: batch-scaling sweep + xprof capture.

Round-3 response to VERDICT #3: measure env_num -> throughput for pure
stepping and the fused 1:1 actor-learner loop (hopper + ant), and dump
an xprof trace of the fused step so the cost attribution is a profile,
not a guess.  Writes logs/bench_probe.json and logs/xprof/.

Run on the real chip (queued via scripts/tpu_queue.sh):
    python scripts/bench_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def pure_stepping(env_name: str, num_envs: int, horizon: int = 200) -> float:
    from ilswiss_tpu.envs import make_vec

    vec = make_vec(env_name, num_envs=num_envs)

    @jax.jit
    def roll(state, key):
        def body(s, k):
            a = jax.random.uniform(
                k, (num_envs, vec.env.action_size), minval=-1.0, maxval=1.0)
            s, tr = vec.step(s, a)
            return s, tr.reward
        s, r = jax.lax.scan(body, state, jax.random.split(key, horizon))
        return s, r.sum()

    state = vec.reset(jax.random.PRNGKey(0))
    state, out = roll(state, jax.random.PRNGKey(1))
    jax.device_get(out)
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        state, out = roll(state, jax.random.PRNGKey(2 + i))
        jax.device_get(out)
    dt = time.perf_counter() - t0
    return n * horizon * num_envs / dt


def fused(env_name: str, num_envs: int, steps_per_epoch: int,
          batch_size: int = 512, trace_dir: str | None = None) -> float:
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop

    vec = make_vec(env_name, num_envs=num_envs)
    sac = SAC(vec.env.observation_size, vec.env.action_size, SACConfig(),
              net_size=256, num_hidden_layers=2)
    loop = OffPolicyLoop(
        vec, sac,
        OffPolicyConfig(
            batch_size=batch_size,
            replay_capacity=1_000_000,
            min_steps_before_training=5_000,
            grad_steps_per_iter=num_envs,   # 1 grad / env step
        ),
    )
    warmup, train_epoch = loop.build(steps_per_epoch=steps_per_epoch)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    runner, metrics = train_epoch(runner)
    jax.device_get(metrics["alpha"])

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            runner, metrics = train_epoch(runner)
            jax.device_get(metrics["alpha"])

    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        runner, metrics = train_epoch(runner)
        jax.device_get(metrics["alpha"])
    dt = time.perf_counter() - t0
    return n * steps_per_epoch / dt


def main() -> None:
    from ilswiss_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    sweeps = {}
    for b in (128, 1024, 8192):
        sweeps[f"hopper_pure_B{b}"] = round(pure_stepping("hopper", b), 1)
        print("pure hopper", b, sweeps[f"hopper_pure_B{b}"], flush=True)
    for b in (8, 128, 1024, 8192):
        spe = max(4 * b, 2048)
        trace = None
        if b == 128:
            trace = os.path.join("logs", "xprof", "fused_hopper_B128")
            os.makedirs(trace, exist_ok=True)
        sweeps[f"hopper_fused_B{b}"] = round(
            fused("hopper", b, steps_per_epoch=spe, trace_dir=trace), 1)
        print("fused hopper", b, sweeps[f"hopper_fused_B{b}"], flush=True)
    for b in (128, 1024):
        sweeps[f"ant_pure_B{b}"] = round(pure_stepping("ant", b, horizon=100), 1)
        print("pure ant", b, sweeps[f"ant_pure_B{b}"], flush=True)
    sweeps["ant_fused_B128"] = round(
        fused("ant", 128, steps_per_epoch=1024), 1)
    print("fused ant 128", sweeps["ant_fused_B128"], flush=True)

    out["sweeps"] = sweeps
    with open(os.path.join("logs", "bench_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""On-chip A/B of the Pallas PGS kernel (ops/pgs_pallas.py).

Measures pure-stepping and fused actor-learner throughput with the kernel
enabled vs disabled (ILSWISS_NO_PGS_KERNEL=1 routes back to the XLA sweep
loop) and checks that both paths produce finite, closely-agreeing
trajectories from the same seed.  Writes logs/pgs_probe.json.

Run on the real chip via the TPU queue:  python scripts/pgs_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ilswiss_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

RESULTS = {}


def pure_stepping(env_name: str, num_envs: int, horizon: int = 200):
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
    t_c0 = time.perf_counter()
    state, out = roll(state, jax.random.PRNGKey(1))
    jax.device_get(out)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    n = 3
    acc = 0.0
    for i in range(n):
        state, out = roll(state, jax.random.PRNGKey(2 + i))
        acc += float(jax.device_get(out))
    dt = time.perf_counter() - t0
    return n * horizon * num_envs / dt, acc, compile_s


def fused(num_envs=128, steps_per_epoch=6400):
    from ilswiss_tpu.algorithms.sac import SAC, SACConfig
    from ilswiss_tpu.envs import make_vec
    from ilswiss_tpu.runtime.loop import OffPolicyConfig, OffPolicyLoop

    vec = make_vec("hopper", num_envs=num_envs)
    sac = SAC(obs_size=vec.env.observation_size,
              action_size=vec.env.action_size, config=SACConfig(),
              net_size=256, num_hidden_layers=2)
    loop = OffPolicyLoop(vec, sac, OffPolicyConfig(
        batch_size=512, replay_capacity=1_000_000,
        min_steps_before_training=5_000,
        grad_steps_per_iter=num_envs))
    warmup, train_epoch = loop.build(steps_per_epoch=steps_per_epoch)
    runner = warmup(loop.init(jax.random.PRNGKey(0)))
    runner, metrics = train_epoch(runner)
    jax.device_get(metrics["alpha"])
    t0 = time.perf_counter()
    n = 2
    for _ in range(n):
        runner, metrics = train_epoch(runner)
        jax.device_get(metrics["alpha"])
    dt = time.perf_counter() - t0
    return n * steps_per_epoch / dt


def main():
    # planar = fused planar forward kernel (ops/planar_dynamics.py)
    # pgs    = batched PGS solve kernel only (ops/pgs_pallas.py)
    # xla    = round-3 pure-XLA engine
    modes = (
        ("planar", {"ILSWISS_NO_PLANAR_KERNEL": "0",
                    "ILSWISS_NO_PGS_KERNEL": "0"}),
        ("pgs", {"ILSWISS_NO_PLANAR_KERNEL": "1",
                 "ILSWISS_NO_PGS_KERNEL": "0"}),
        ("xla", {"ILSWISS_NO_PLANAR_KERNEL": "1",
                 "ILSWISS_NO_PGS_KERNEL": "1"}),
    )
    for mode, env in modes:
        os.environ.update(env)
        # new traces per mode: clear jit caches so the env-vars re-read
        jax.clear_caches()
        from ilswiss_tpu.ops.pgs_pallas import _make_pgs
        _make_pgs.cache_clear()
        from ilswiss_tpu.ops.planar_dynamics import _make_planar_step
        _make_planar_step.cache_clear()

        configs = [("hopper", 1024), ("hopper", 8192)]
        if mode == "planar":
            configs += [("hopper", 16384), ("walker", 1024)]
        else:
            configs += [("ant", 1024)]
        for env_name, nb in configs:
            k = f"{mode}_pure_{env_name}_B{nb}"
            try:
                sps, ret, comp = pure_stepping(env_name, nb)
                RESULTS[k] = {"steps_per_s": round(sps, 1),
                              "reward_acc": ret,
                              "compile_s": round(comp, 1)}
            except Exception as e:  # keep probing other configs
                RESULTS[k] = {"error": repr(e)[:300]}
            print(k, RESULTS[k], flush=True)

        k = f"{mode}_fused_hopper_B128"
        try:
            RESULTS[k] = {"steps_per_s": round(fused(), 1)}
        except Exception as e:
            RESULTS[k] = {"error": repr(e)[:300]}
        print(k, RESULTS[k], flush=True)

    # nested-vmap smoke: the seed-axis runner (run_sac_vmapped_seeds)
    # puts a second vmap over the env vmap -> pallas_call batching rule
    os.environ["ILSWISS_NO_PGS_KERNEL"] = "0"
    jax.clear_caches()
    try:
        from ilswiss_tpu.envs import make_vec
        vec = make_vec("hopper", num_envs=64)

        @jax.jit
        @jax.vmap
        def seeded_roll(key):
            state = vec.reset(key)
            def body(s, k):
                a = jax.random.uniform(
                    k, (64, vec.env.action_size), minval=-1.0, maxval=1.0)
                s, tr = vec.step(s, a)
                return s, tr.reward
            _, r = jax.lax.scan(body, state, jax.random.split(key, 10))
            return r.sum()

        out = jax.device_get(seeded_roll(
            jnp.stack([jax.random.PRNGKey(i) for i in range(3)])))
        RESULTS["nested_vmap_smoke"] = {
            "ok": bool(np.all(np.isfinite(out))),
            "rewards": [float(x) for x in out]}
    except Exception as e:
        RESULTS["nested_vmap_smoke"] = {"error": repr(e)[:300]}
    print("nested_vmap_smoke", RESULTS["nested_vmap_smoke"], flush=True)

    # trajectory agreement: same seed across modes
    base = RESULTS.get("xla_pure_hopper_B1024", {}).get("reward_acc")
    for mode in ("planar", "pgs"):
        ka = RESULTS.get(f"{mode}_pure_hopper_B1024", {}).get("reward_acc")
        if ka is not None and base is not None:
            denom = max(abs(ka), abs(base), 1.0)
            RESULTS[f"reward_rel_diff_{mode}"] = abs(ka - base) / denom
    os.makedirs("logs", exist_ok=True)
    with open("logs/pgs_probe.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()

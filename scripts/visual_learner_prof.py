"""On-chip attribution for the SAC-AE visual learner train call.

The finger-spin host loop measured ~11.5 s per 100-step segment spent in
the (donation-serialized) ingest+train call — ~50 grad steps — making
the epoch ~20 min.  This script times the pieces in isolation on the
real chip at the production spec sizes (84x84x9 frames, batch 128,
net_size 1024, replay 20k):

  1. segment host->device transfer (the [100,1,...] uint8 arrays)
  2. ingest only (replay_add scan)
  3. K-grad-step train call, K in {10, 50}, to split fixed vs per-step
  4. one bare train_step (sampling + update)

Writes logs/visual_learner_prof.json.
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


def main():
    from ilswiss_tpu.algorithms.sac_ae import SACAE, SACAEConfig
    from ilswiss_tpu.data.replay import replay_add, replay_init, replay_sample
    from ilswiss_tpu.envs.vector import Transition
    from ilswiss_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    H, W, C = 84, 84, 9
    B, T = 1, 100
    batch = 128
    act_dim = 2
    def build(conv_dtype):
        return SACAE(
            action_size=act_dim,
            config=SACAEConfig(image_size=H, frame_channels=C,
                               feature_dim=50, num_conv_layers=4,
                               num_filters=32, policy_lr=1e-3, qf_lr=1e-3,
                               encdec_lr=1e-3, init_alpha=0.1,
                               alpha_lr=1e-4, ac_update_freq=2,
                               encdec_update_freq=1, target_update_freq=2,
                               conv_dtype=conv_dtype),
            net_size=1024, num_hidden_layers=2)
    algo = build("float32")
    key = jax.random.PRNGKey(0)
    state = algo.init(key)
    replay = replay_init(20_000, (H, W, C), act_dim, write_batch=B,
                         obs_dtype=jnp.uint8)

    rng = np.random.default_rng(0)
    seg_np = Transition(
        obs=rng.integers(0, 255, (T, B, H, W, C), dtype=np.uint8),
        action=rng.standard_normal((T, B, act_dim)).astype(np.float32),
        reward=rng.standard_normal((T, B)).astype(np.float32),
        next_obs=rng.integers(0, 255, (T, B, H, W, C), dtype=np.uint8),
        terminal=np.zeros((T, B), np.float32),
        done=np.zeros((T, B), np.float32),
    )

    out = {"device": str(jax.devices()[0])}

    def timeit(name, fn, probe, n=3):
        # block_until_ready can return before chained donated work
        # finishes on the tunneled axon backend (bench.py docstring);
        # a device_get of a derived scalar is the only honest fence.
        r = fn()           # compile + warm
        np.asarray(jax.device_get(probe(r)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
            np.asarray(jax.device_get(probe(r)))
        out[name] = round((time.perf_counter() - t0) / n, 4)
        print(name, out[name], flush=True)
        return r

    # 1. pure transfer
    timeit("seg_transfer_s",
           lambda: jax.device_put(seg_np, jax.devices()[0]),
           lambda r: r.reward.sum())
    seg_dev = jax.device_put(seg_np, jax.devices()[0])

    # 2. ingest only
    @jax.jit
    def ingest(replay, seg):
        def add_one(r, tr):
            return replay_add(r, tr), None
        r, _ = jax.lax.scan(add_one, replay, seg)
        return r
    replay = timeit("ingest_100_s", lambda: ingest(replay, seg_dev),
                    lambda r: r.ptr)
    for _ in range(20):   # fill some rows so sampling sees data
        replay = ingest(replay, seg_dev)
    jax.block_until_ready(replay)

    # 3. K-grad-step scans, f32 vs bf16 conv compute
    def make_chain(a, K):
        @jax.jit
        def chain(state, replay, key):
            def step(carry, k):
                st = carry
                ks, kt = jax.random.split(k)
                b = replay_sample(replay, ks, batch)
                st, m = a.train_step(st, b, kt)
                return st, m
            st, m = jax.lax.scan(step, state,
                                 jax.random.split(key, K))
            return st
        return chain
    c10 = make_chain(algo, 10)
    c50 = make_chain(algo, 50)
    timeit("train_10_s", lambda: c10(state, replay, jax.random.PRNGKey(1)),
           lambda st: st.log_alpha)
    timeit("train_50_s", lambda: c50(state, replay, jax.random.PRNGKey(2)),
           lambda st: st.log_alpha)
    algo_bf = build("bfloat16")
    c50_bf = make_chain(algo_bf, 50)
    timeit("train_50_bf16_s",
           lambda: c50_bf(state, replay, jax.random.PRNGKey(2)),
           lambda st: st.log_alpha)

    # 4. single bare step
    @jax.jit
    def one(state, replay, key):
        ks, kt = jax.random.split(key)
        b = replay_sample(replay, ks, batch)
        st, _ = algo.train_step(state, b, kt)
        return st
    timeit("train_1_s", lambda: one(state, replay, jax.random.PRNGKey(3)),
           lambda st: st.log_alpha)

    out["grad_step_amortized_ms"] = round(
        1000.0 * (out["train_50_s"] - out["train_10_s"]) / 40.0, 2)
    out["bf16_speedup_50"] = round(
        out["train_50_s"] / max(out["train_50_bf16_s"], 1e-9), 2)
    path = os.path.join("logs", "visual_learner_prof.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

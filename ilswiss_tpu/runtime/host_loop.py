"""Actor-learner split for host-simulated envs (MuJoCo et al.).

For envs that cannot run in XLA (MuJoCo's C engine — the reference's
whole benchmark suite), the loop splits: acting runs on the host CPU
JAX backend against thread-stepped gymnasium envs (envs/host_mujoco.py),
and learning runs as fused jitted scans on the TPU.  Transitions move
host->device once per collection segment (1000 steps by default — the
reference's num_steps_between_train_calls granularity), and params move
device->host once per segment, so per-step tunnel round-trips — the
cost that dominated the reference's pipe-based design — never happen.

Requires both platforms: set jax_platforms='axon,cpu' (or 'tpu,cpu')
before first jax use; falls back to single-platform CPU transparently.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ilswiss_tpu.data.replay import (
    ReplayState, replay_add, replay_init, replay_sample,
)
from ilswiss_tpu.envs.host_mujoco import GymVectorEnv
from ilswiss_tpu.envs.vector import Transition


@dataclass(frozen=True)
class HostLoopConfig:
    batch_size: int = 256
    replay_capacity: int = 1_000_000
    steps_between_train_calls: int = 1000
    train_steps_per_call: int = 1000
    min_steps_before_training: int = 1000
    # store terminal=0 for every transition (the reference's
    # `no_terminal` flag, base_algorithm.py _handle_step: GAIL-family
    # specs train the critic without bootstrapping cutoffs)
    no_terminal: bool = False
    # Pipeline host collection with TPU training: segment t+1 is
    # collected on a background thread with a params snapshot taken
    # before train call t, while the TPU trains on segment t.  One
    # segment of policy staleness (standard async actor-learner), ~2x
    # wall-clock when collection cost ~= training cost.  The reference
    # has no equivalent — its loop strictly alternates
    # (base_algorithm.py:183-298).
    overlap_collection: bool = True


@struct.dataclass
class HostRunnerState:
    rng: jax.Array
    replay: ReplayState
    algo_state: Any
    total_env_steps: int = struct.field(pytree_node=False, default=0)


def _start_host_copies(tree):
    """Kick off async device->host copies for every leaf.

    On the tunneled TPU backend each synchronous `np.asarray(leaf)` is a
    full round-trip; a ~20-leaf acting snapshot fetched leaf-by-leaf
    costs 20 RTTs where one overlapped batch costs ~1.  Callers follow
    with np.asarray/device_get, which then find the data already (or
    concurrently) in flight."""
    for x in jax.tree.leaves(tree):
        if hasattr(x, "copy_to_host_async"):
            try:
                x.copy_to_host_async()
            except Exception:
                pass
    return tree


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


class HostOffPolicyLoop:
    def __init__(self, env: GymVectorEnv, algo,
                 config: HostLoopConfig = HostLoopConfig(),
                 sample_fn=None):
        """`sample_fn(replay, key, batch_size)` overrides uniform
        `replay_sample` — the augmented-batch hook (RAD/CURL,
        data/aug_replay.py), same contract as OffPolicyLoop's."""
        self.env = env
        self.algo = algo
        self.config = config
        self.cpu = _cpu_device()
        self._obs = None

        # acting compiled on the CPU backend (backend follows the
        # committed CPU inputs; all acting runs under default_device(cpu))
        self._act_cpu = jax.jit(lambda s, o, k: algo.act(s, o, k))
        self._act_det_cpu = jax.jit(
            lambda s, o, k: algo.act(s, o, k, deterministic=True)
        )
        # Optional state narrowing for the device->host acting snapshot:
        # algo.acting_state(state) returns the state with non-acting
        # fields (critics, decoder, optimizer moments) replaced by None.
        self._acting_view = getattr(algo, "acting_state", lambda s: s)

        # learner: ingest a [T, B] segment then K grad steps, one jit.
        # Algorithms owning their update schedule (AdvIRL's nested
        # disc/policy loop) expose `train_call(state, replay, key)` and
        # get exactly one call per segment — the reference cadence of
        # one _do_training per num_steps_between_train_calls env steps.
        owns_schedule = hasattr(algo, "train_call")

        @partial(jax.jit, donate_argnums=0)
        def ingest_and_train(runner: HostRunnerState, segment
                             ) -> tuple[HostRunnerState, Dict]:
            def add_one(replay, tr):
                return replay_add(replay, tr), None

            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            rng, k = jax.random.split(runner.rng)

            if owns_schedule:
                algo_state, metrics = algo.train_call(
                    runner.algo_state, replay, k)
            else:
                def grad_step(carry, key):
                    algo_state = carry
                    k_s, k_t = jax.random.split(key)
                    draw = sample_fn or replay_sample
                    batch = draw(replay, k_s, config.batch_size)
                    algo_state, metrics = algo.train_step(
                        algo_state, batch, k_t)
                    return algo_state, metrics

                algo_state, metrics = jax.lax.scan(
                    grad_step, runner.algo_state,
                    jax.random.split(k, config.train_steps_per_call),
                )
            return HostRunnerState(
                rng=rng, replay=replay, algo_state=algo_state,
                total_env_steps=runner.total_env_steps,
            ), jax.tree.map(jnp.mean, metrics)

        @partial(jax.jit, donate_argnums=0)
        def ingest_only(runner: HostRunnerState, segment) -> HostRunnerState:
            def add_one(replay, tr):
                return replay_add(replay, tr), None
            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            return runner.replace(replay=replay)

        self._ingest_and_train = ingest_and_train
        self._ingest_only = ingest_only

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> HostRunnerState:
        self._obs = self.env.reset(seed=seed)
        key = jax.random.PRNGKey(seed)
        _, k_algo = jax.random.split(key)
        return HostRunnerState(
            rng=key,
            replay=replay_init(
                self.config.replay_capacity, self.env.observation_size,
                self.env.action_size, write_batch=self.env.num_envs,
                obs_dtype=getattr(self.env, "obs_dtype", jnp.float32),
            ),
            algo_state=self.algo.init(k_algo),
            total_env_steps=0,
        )

    # ------------------------------------------------------------------
    def _collect_segment(self, runner: HostRunnerState, num_steps: int,
                         random_actions: bool,
                         state_cpu=None, key=None) -> Transition:
        """Host rollout of num_steps//B iterations; returns [T, B] stack.

        `state_cpu`/`key` may be pre-snapshotted CPU copies (the overlap
        path snapshots them before the TPU train call donates the
        runner's buffers, then collects on a background thread)."""
        B = self.env.num_envs
        iters = max(1, num_steps // B)
        rows = []
        import os as _os
        import sys as _sys
        import time as _time
        dbg = bool(_os.environ.get("ILSWISS_HOST_LOOP_DEBUG"))
        act_s = step_s = 0.0
        with jax.default_device(self.cpu):
            if state_cpu is None and not random_actions:
                state_cpu = jax.device_put(_start_host_copies(
                    self._acting_view(runner.algo_state)), self.cpu)
            if key is None:
                key = jax.random.fold_in(
                    jax.device_put(runner.rng, self.cpu),
                    runner.total_env_steps,
                )
            for t in range(iters):
                ta = _time.perf_counter()
                if random_actions:
                    action = np.random.uniform(
                        -1.0, 1.0, (B, self.env.action_size)
                    ).astype(np.float32)
                else:
                    key, k = jax.random.split(key)
                    action = np.asarray(
                        self._act_cpu(state_cpu, jnp.asarray(self._obs), k)
                    )
                tb = _time.perf_counter()
                obs_prev, true_next, reward, terminal, done, obs_after = (
                    self.env.step(action)
                )
                act_s += tb - ta
                step_s += _time.perf_counter() - tb
                self._obs = obs_after
                rows.append((obs_prev, action, reward, true_next,
                             terminal, done))
        if dbg:
            print(f"[host-loop] collect {iters}x{B}: act={act_s:.2f}s "
                  f"env_step={step_s:.2f}s", file=_sys.stderr, flush=True)
        stack = lambda i: np.stack([r[i] for r in rows])
        terminal = stack(4)
        if self.config.no_terminal:
            # store terminal=0 (the reference no_terminal flag)
            terminal = np.zeros_like(terminal)
        return Transition(
            obs=jnp.asarray(stack(0)),
            action=jnp.asarray(stack(1)),
            reward=jnp.asarray(stack(2)),
            next_obs=jnp.asarray(stack(3)),
            terminal=jnp.asarray(terminal),
            done=jnp.asarray(stack(5)),
        )

    # ------------------------------------------------------------------
    def warmup(self, runner: HostRunnerState) -> HostRunnerState:
        seg = self._collect_segment(
            runner, self.config.min_steps_before_training,
            random_actions=True,
        )
        prev_steps = runner.total_env_steps  # static field: see above
        runner = self._ingest_only(
            runner.replace(total_env_steps=0), seg)
        return runner.replace(
            total_env_steps=prev_steps
            + int(seg.reward.shape[0] * seg.reward.shape[1])
        )

    def train_epoch(self, runner: HostRunnerState, steps_per_epoch: int
                    ) -> tuple[HostRunnerState, Dict[str, float]]:
        from ilswiss_tpu.utils.profiling import phase

        n_calls = max(
            1, steps_per_epoch // self.config.steps_between_train_calls
        )
        if not self.config.overlap_collection:
            return self._train_epoch_serial(runner, n_calls)

        from concurrent.futures import ThreadPoolExecutor

        seg_steps = self.config.steps_between_train_calls
        all_metrics = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            def snapshot_and_submit(r):
                # CPU copies taken synchronously so the TPU train call's
                # buffer donation can't invalidate what the collector
                # thread reads.  Must be a TRUE copy: device_put onto the
                # array's own device (CPU backend) is a no-op alias, and
                # the donated alias would be read by the collector thread
                # after ingest_and_train frees it.  Only the ACTING slice
                # of the state crosses the tunnel (algo.acting_state
                # drops critics/decoder/optimizer moments — on visual
                # learners that is ~10x fewer bytes per segment).
                state_cpu = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x), self.cpu),
                    _start_host_copies(self._acting_view(r.algo_state)))
                key = jax.random.fold_in(
                    jax.device_put(r.rng, self.cpu), r.total_env_steps)
                return pool.submit(
                    self._collect_segment, r, seg_steps, False,
                    state_cpu, key,
                )

            import os as _os
            import sys as _sys
            import time as _time
            dbg = bool(_os.environ.get("ILSWISS_HOST_LOOP_DEBUG"))

            fut = snapshot_and_submit(runner)
            for i in range(n_calls):
                t0 = _time.perf_counter()
                with phase("sample"):
                    seg = fut.result()
                t1 = _time.perf_counter()
                if i + 1 < n_calls:
                    # next segment collects with the params from before
                    # this train call (one segment of staleness) while
                    # the TPU trains
                    fut = snapshot_and_submit(runner)
                t2 = _time.perf_counter()
                steps = int(seg.reward.shape[0] * seg.reward.shape[1])
                # total_env_steps is a STATIC pytree field; it must be
                # pinned to 0 across the jit boundary or every segment's
                # new value is a fresh cache key -> a ~10 s remote
                # recompile per 100-step segment (the round-5 finger-spin
                # stall: 20-min epochs, measured via the dbg prints)
                prev_steps = runner.total_env_steps
                with phase("train"):
                    runner, metrics = self._ingest_and_train(
                        runner.replace(total_env_steps=0), seg)
                if dbg:
                    t3 = _time.perf_counter()
                    print(f"[host-loop] seg {i}: wait_collect="
                          f"{t1 - t0:.2f}s snap_submit={t2 - t1:.2f}s "
                          f"train_dispatch={t3 - t2:.2f}s",
                          file=_sys.stderr, flush=True)
                runner = runner.replace(
                    total_env_steps=prev_steps + steps
                )
                # keep metrics on device; one overlapped fetch per epoch
                # instead of a blocking RTT per segment
                all_metrics.append(metrics)
        all_metrics = jax.device_get(_start_host_copies(all_metrics))
        return runner, {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }

    def _train_epoch_serial(self, runner: HostRunnerState, n_calls: int
                            ) -> tuple[HostRunnerState, Dict[str, float]]:
        """Reference-cadence alternation (collect then train), kept for
        algorithms that must act with the newest params every segment."""
        from ilswiss_tpu.utils.profiling import phase

        all_metrics = []
        for _ in range(n_calls):
            with phase("sample"):
                seg = self._collect_segment(
                    runner, self.config.steps_between_train_calls,
                    random_actions=False,
                )
            steps = int(seg.reward.shape[0] * seg.reward.shape[1])
            prev_steps = runner.total_env_steps  # static field: see above
            with phase("train"):
                runner, metrics = self._ingest_and_train(
                    runner.replace(total_env_steps=0), seg)
            runner = runner.replace(
                total_env_steps=prev_steps + steps
            )
            all_metrics.append(metrics)
        all_metrics = jax.device_get(_start_host_copies(all_metrics))
        return runner, {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }

    # ------------------------------------------------------------------
    def evaluate(self, runner: HostRunnerState, num_episodes: int,
                 seed: int = 0, eval_env: GymVectorEnv | None = None
                 ) -> Dict[str, float]:
        """Deterministic-policy eval on a host env (fresh episodes)."""
        env = eval_env or self.env
        B = env.num_envs
        returns, lengths = [], []
        ep_ret = np.zeros(B)
        ep_len = np.zeros(B)
        with jax.default_device(self.cpu):
            state_cpu = jax.device_put(_start_host_copies(
                self._acting_view(runner.algo_state)), self.cpu)
            key = jax.random.PRNGKey(seed)
            obs = env.reset(seed=seed + 10_000)
            while len(returns) < num_episodes:
                key, k = jax.random.split(key)
                action = np.asarray(
                    self._act_det_cpu(state_cpu, jnp.asarray(obs), k))
                _, _, reward, terminal, done, obs = env.step(action)
                ep_ret += reward
                ep_len += 1
                for i in np.nonzero(done)[0]:
                    returns.append(ep_ret[i])
                    lengths.append(ep_len[i])
                    ep_ret[i] = 0.0
                    ep_len[i] = 0.0
        if eval_env is None:
            # training env was hijacked for eval: restore its obs stream
            self._obs = obs
        returns = np.asarray(returns[:num_episodes])
        return {
            "AverageReturn": float(returns.mean()),
            "MaxReturn": float(returns.max()),
            "MinReturn": float(returns.min()),
            "StdReturn": float(returns.std()),
            "AvgPathLength": float(np.mean(lengths[:num_episodes])),
        }


@struct.dataclass
class HostOnPolicyRunnerState:
    rng: jax.Array
    algo_state: Any
    obs_rms: Any = None
    total_env_steps: int = struct.field(pytree_node=False, default=0)


class HostOnPolicyLoop:
    """PPO-style rollout-consuming training on host envs: collect a
    [T, B] segment on the host, hand the whole rollout to the jitted
    `algo.train_step(state, rollout, key)` on the TPU (the device
    OnPolicyLoop's contract, runtime/onpolicy.py).  Optional running
    obs normalization mirrors the reference vec-env obs_rms
    (rlkit/envs/vecenvs.py:102-107,299-327)."""

    def __init__(self, env: GymVectorEnv, algo, rollout_length: int = 128,
                 normalize_obs: bool = False, obs_clip: float = 10.0):
        self.env = env
        self.algo = algo
        self.rollout_length = rollout_length
        self.normalize_obs = normalize_obs
        self.obs_clip = obs_clip
        self.cpu = _cpu_device()
        self._obs = None
        self._acting_view = getattr(algo, "acting_state", lambda s: s)

        self._act_cpu = jax.jit(lambda s, o, k: algo.act(s, o, k))
        self._act_det_cpu = jax.jit(
            lambda s, o, k: algo.act(s, o, k, deterministic=True))

        @partial(jax.jit, donate_argnums=0)
        def train_on_rollout(runner: HostOnPolicyRunnerState, rollout
                             ) -> tuple[HostOnPolicyRunnerState, Dict]:
            rng, k = jax.random.split(runner.rng)
            obs_rms = runner.obs_rms
            if obs_rms is not None:
                from ilswiss_tpu.utils.running_stats import (
                    normalize as _norm, running_mean_std_update,
                )
                obs_rms = running_mean_std_update(
                    obs_rms,
                    rollout["obs"].reshape(-1, rollout["obs"].shape[-1]))
                rollout = dict(rollout)
                rollout["obs"] = _norm(obs_rms, rollout["obs"],
                                       self.obs_clip)
                rollout["last_obs"] = _norm(obs_rms, rollout["last_obs"],
                                            self.obs_clip)
            algo_state, metrics = algo.train_step(
                runner.algo_state, rollout, k)
            metrics["rollout_reward_mean"] = jnp.mean(rollout["reward"])
            return HostOnPolicyRunnerState(
                rng=rng, algo_state=algo_state, obs_rms=obs_rms,
                total_env_steps=runner.total_env_steps,
            ), metrics

        self._train_on_rollout = train_on_rollout

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> HostOnPolicyRunnerState:
        self._obs = self.env.reset(seed=seed)
        key = jax.random.PRNGKey(seed)
        _, k_algo = jax.random.split(key)
        obs_rms = None
        if self.normalize_obs:
            from ilswiss_tpu.utils.running_stats import (
                running_mean_std_init,
            )
            obs_rms = running_mean_std_init((self.env.observation_size,))
        return HostOnPolicyRunnerState(
            rng=key, algo_state=self.algo.init(k_algo), obs_rms=obs_rms,
        )

    def warmup(self, runner):
        return runner  # on-policy: no warmup

    def _maybe_norm_np(self, runner, obs: np.ndarray) -> np.ndarray:
        if runner.obs_rms is None:
            return obs
        from ilswiss_tpu.utils.running_stats import normalize as _norm
        return np.asarray(_norm(
            jax.device_put(runner.obs_rms, self.cpu), obs, self.obs_clip))

    def _collect_rollout(self, runner) -> Dict[str, jnp.ndarray]:
        B = self.env.num_envs
        rows = []
        with jax.default_device(self.cpu):
            state_cpu = jax.device_put(_start_host_copies(
                self._acting_view(runner.algo_state)), self.cpu)
            rms_dev = (None if runner.obs_rms is None
                       else jax.device_put(runner.obs_rms, self.cpu))
            key = jax.random.fold_in(
                jax.device_put(runner.rng, self.cpu),
                runner.total_env_steps)
            from ilswiss_tpu.utils.running_stats import normalize as _norm
            for t in range(self.rollout_length):
                key, k = jax.random.split(key)
                pol_obs = (self._obs if rms_dev is None else np.asarray(
                    _norm(rms_dev, self._obs, self.obs_clip)))
                action = np.asarray(
                    self._act_cpu(state_cpu, jnp.asarray(pol_obs), k))
                obs_prev, true_next, reward, terminal, done, obs_after = (
                    self.env.step(action))
                self._obs = obs_after
                rows.append((obs_prev, action, reward, terminal, done))
        stack = lambda i: np.stack([r[i] for r in rows])
        return {
            "obs": jnp.asarray(stack(0)),
            "action": jnp.asarray(stack(1)),
            "reward": jnp.asarray(stack(2)),
            "terminal": jnp.asarray(stack(3)),
            "done": jnp.asarray(stack(4)),
            "last_obs": jnp.asarray(self._obs),
        }

    def train_epoch(self, runner, steps_per_epoch: int):
        B = self.env.num_envs
        n_iters = max(1, steps_per_epoch // (self.rollout_length * B))
        all_metrics = []
        for _ in range(n_iters):
            rollout = self._collect_rollout(runner)
            prev_steps = runner.total_env_steps  # static field: see above
            runner, metrics = self._train_on_rollout(
                runner.replace(total_env_steps=0), rollout)
            runner = runner.replace(
                total_env_steps=prev_steps
                + self.rollout_length * B)
            all_metrics.append(jax.device_get(metrics))
        return runner, {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }

    def evaluate(self, runner, num_episodes: int, seed: int = 0,
                 eval_env: GymVectorEnv | None = None) -> Dict[str, float]:
        env = eval_env or self.env
        B = env.num_envs
        returns, lengths = [], []
        ep_ret = np.zeros(B)
        ep_len = np.zeros(B)
        with jax.default_device(self.cpu):
            state_cpu = jax.device_put(_start_host_copies(
                self._acting_view(runner.algo_state)), self.cpu)
            key = jax.random.PRNGKey(seed)
            obs = env.reset(seed=seed + 10_000)
            while len(returns) < num_episodes:
                key, k = jax.random.split(key)
                action = np.asarray(self._act_det_cpu(
                    state_cpu,
                    jnp.asarray(self._maybe_norm_np(runner, obs)), k))
                _, _, reward, terminal, done, obs = env.step(action)
                ep_ret += reward
                ep_len += 1
                for i in np.nonzero(done)[0]:
                    returns.append(ep_ret[i])
                    lengths.append(ep_len[i])
                    ep_ret[i] = 0.0
                    ep_len[i] = 0.0
        if eval_env is None:
            self._obs = env.reset(seed=seed + 20_000)
        returns = np.asarray(returns[:num_episodes])
        return {
            "AverageReturn": float(returns.mean()),
            "MaxReturn": float(returns.max()),
            "MinReturn": float(returns.min()),
            "StdReturn": float(returns.std()),
            "AvgPathLength": float(np.mean(lengths[:num_episodes])),
        }

"""MBPO: model-based policy optimization.

Rebuild of the reference MBPO algorithm
(rlkit/torch/algorithms/mbpo/mbpo.py:23-274 + fake_env.py): an ensemble
dynamics model (BNNTrainer) is refit on the whole real buffer every
`model_train_freq` env steps; branched rollouts from replay states feed
a model buffer; the inner SAC trains on a `real_ratio` mixture of real
and model batches.

Structure parity (SURVEY.md §3.5, §7.3.4):
  - model retraining cadence + rollout-length epoch schedule
    (mbpo.py:87-104,194-205) — host-orchestrated (data-dependent early
    stopping), everything else jitted
  - branched rollout (mbpo.py:234-266 / fake_env.py:29-75): sample
    rollout_batch_size states from real replay; per step sample one
    random *elite* net's Gaussian prediction per branch
    (fake_env.py:48-53), analytic terminal fns, terminated branches
    dropped via masked compacting writes (replaces the reference's
    shrinking alive-set)
  - model buffer preallocated at the schedule's maximum size (replaces
    the reference's dynamic resize, mbpo.py:207-232)
  - mixed batches: int(batch * real_ratio) real + rest model
    (mbpo.py:170-183)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ilswiss_tpu.algorithms.bnn_trainer import (
    BNNState, BNNTrainer, BNNTrainerConfig,
)
from ilswiss_tpu.data.replay import (
    ReplayState, replay_add, replay_add_masked, replay_init, replay_sample,
)
from ilswiss_tpu.envs.vector import VectorEnv


@dataclass(frozen=True)
class MBPOConfig:
    model_train_freq: int = 250
    rollout_batch_size: int = 100_000
    real_ratio: float = 0.1
    rollout_schedule: tuple = (20, 100, 1, 1)  # (min_ep, max_ep, min_l, max_l)
    model_retrain_epochs: int = 1
    deterministic_rollouts: bool = False
    batch_size: int = 256
    grad_steps_per_iter: int | None = None
    replay_capacity: int = 1_000_000
    min_steps_before_training: int = 5000
    max_path_length: int = 1000


@struct.dataclass
class MBPORunnerState:
    rng: jax.Array
    env_state: Any
    replay: ReplayState          # real transitions
    model_replay: ReplayState    # model-generated transitions
    algo_state: Any              # inner SAC
    bnn_state: BNNState
    total_env_steps: jnp.ndarray


class MBPO:
    """Host-orchestrated loop with jitted phases.  `policy_trainer` is
    the inner model-free trainer (SAC in the reference, mbpo.py:26)."""

    def __init__(self, vec_env: VectorEnv | None, policy_trainer,
                 terminal_fn: Callable,
                 config: MBPOConfig = MBPOConfig(),
                 bnn_config: BNNTrainerConfig = BNNTrainerConfig(),
                 obs_size: int | None = None,
                 action_size: int | None = None,
                 num_envs: int | None = None):
        """vec_env may be None for host-env runs (HostMBPOLoop drives
        collection); pass obs_size/action_size/num_envs explicitly then."""
        self.vec_env = vec_env
        self.algo = policy_trainer
        self.terminal_fn = terminal_fn
        self.config = config
        if vec_env is not None:
            obs_size = vec_env.env.observation_size
            action_size = vec_env.env.action_size
            num_envs = vec_env.num_envs
            self.discrete = vec_env.env.discrete
        else:
            self.discrete = False
        self.obs_size = obs_size
        self.action_size = action_size
        self.num_envs = num_envs
        self.bnn = BNNTrainer(obs_size, action_size, bnn_config)
        self.grad_steps_per_iter = (
            config.grad_steps_per_iter
            if config.grad_steps_per_iter is not None
            else num_envs
        )
        # model-buffer capacity: schedule max (mbpo.py:207-232, without
        # the dynamic resize)
        max_len = config.rollout_schedule[3]
        rollouts_per_epoch = (
            config.rollout_batch_size * config.max_path_length
            / config.model_train_freq
        )
        self.model_capacity = int(
            config.model_retrain_epochs * max_len * rollouts_per_epoch
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> MBPORunnerState:
        k_env, k_algo, k_bnn = jax.random.split(key, 3)
        return MBPORunnerState(
            rng=key,
            env_state=(None if self.vec_env is None
                       else self.vec_env.reset(k_env)),
            replay=replay_init(
                self.config.replay_capacity, self.obs_size,
                self.action_size, write_batch=self.num_envs,
                discrete=self.discrete,
            ),
            model_replay=replay_init(
                self.model_capacity, self.obs_size,
                self.action_size,
                write_batch=self.config.rollout_batch_size,
                discrete=self.discrete,
            ),
            algo_state=self.algo.init(k_algo),
            bnn_state=self.bnn.init(k_bnn),
            total_env_steps=jnp.zeros((), jnp.int32),
        )

    # --- rollout length schedule (mbpo.py:194-205) ---------------------
    def rollout_length(self, epoch: int) -> int:
        min_ep, max_ep, min_l, max_l = self.config.rollout_schedule
        if epoch < min_ep:
            return int(min_l)
        dx = min((epoch - min_ep) / max(max_ep - min_ep, 1), 1.0)
        return int(dx * (max_l - min_l) + min_l)

    # --- jitted phases -------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 3))
    def _rollout_model(self, runner: MBPORunnerState, key: jax.Array,
                       rollout_length: int) -> ReplayState:
        """Branched model rollout -> model buffer (mbpo.py:234-266)."""
        cfg = self.config
        k_init, k_scan = jax.random.split(key)
        batch = replay_sample(runner.replay, k_init, cfg.rollout_batch_size)
        obs0 = batch["obs"]
        alive0 = jnp.ones((cfg.rollout_batch_size,), bool)

        def step(carry, k):
            obs, alive, model_replay = carry
            k_act, k_noise, k_pick = jax.random.split(k, 3)
            act = self.algo.act(runner.algo_state, obs, k_act)
            means, variances = self.bnn.predict_factored(
                runner.bnn_state, obs, act
            )  # [E, R, 1+obs]
            stds = jnp.sqrt(variances)
            if cfg.deterministic_rollouts:
                samples = means
            else:
                samples = means + stds * jax.random.normal(
                    k_noise, means.shape
                )
            # random elite per branch (fake_env.py:48-53)
            pick = runner.bnn_state.elites[jax.random.randint(
                k_pick, (cfg.rollout_batch_size,), 0,
                runner.bnn_state.elites.shape[0],
            )]
            rows = samples[pick, jnp.arange(cfg.rollout_batch_size)]
            reward, next_obs = rows[:, 0], rows[:, 1:]
            terminal = self.terminal_fn(obs, act, next_obs)

            model_replay = replay_add_masked(
                model_replay,
                {
                    "obs": obs,
                    "action": act,
                    "reward": reward,
                    "next_obs": next_obs,
                    "terminal": terminal.astype(jnp.float32),
                },
                alive,
            )
            alive = jnp.logical_and(alive, jnp.logical_not(terminal))
            return (next_obs, alive, model_replay), jnp.sum(alive)

        keys = jax.random.split(k_scan, rollout_length)
        (_, _, model_replay), _ = jax.lax.scan(
            step, (obs0, alive0, runner.model_replay), keys
        )
        return model_replay

    def _mixed_batch(self, runner: MBPORunnerState, key: jax.Array
                     ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        k_r, k_m = jax.random.split(key)
        n_real = int(cfg.batch_size * cfg.real_ratio)
        real = replay_sample(runner.replay, k_r, n_real)
        model = replay_sample(
            runner.model_replay, k_m, cfg.batch_size - n_real
        )
        return {
            k: jnp.concatenate([real[k], model[k]], axis=0) for k in real
        }

    @partial(jax.jit, static_argnums=(0, 2), donate_argnums=1)
    def _collect_and_train_segment(self, runner: MBPORunnerState,
                                   num_iters: int):
        """model_train_freq env steps + policy training on mixed batches."""

        def one_iter(r: MBPORunnerState, _):
            rng, k_act, k_train = jax.random.split(r.rng, 3)
            action = self.algo.act(r.algo_state, r.env_state.obs, k_act)
            env_state, tr = self.vec_env.step(r.env_state, action)
            replay = replay_add(r.replay, tr)

            def grad_step(carry, k):
                algo_state = carry
                k_b, k_t = jax.random.split(k)
                batch = self._mixed_batch(
                    r.replace(replay=replay), k_b
                )
                algo_state, metrics = self.algo.train_step(
                    algo_state, batch, k_t
                )
                return algo_state, metrics

            algo_state, metrics = jax.lax.scan(
                grad_step, r.algo_state,
                jax.random.split(k_train, self.grad_steps_per_iter),
            )
            new_r = MBPORunnerState(
                rng=rng,
                env_state=env_state,
                replay=replay,
                model_replay=r.model_replay,
                algo_state=algo_state,
                bnn_state=r.bnn_state,
                total_env_steps=r.total_env_steps + self.vec_env.num_envs,
            )
            return new_r, jax.tree.map(jnp.mean, metrics)

        runner, metrics = jax.lax.scan(
            one_iter, runner, None, length=num_iters
        )
        return runner, jax.tree.map(jnp.mean, metrics)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _presample(self, runner: MBPORunnerState):
        num_iters = max(
            1, self.config.min_steps_before_training // self.vec_env.num_envs
        )

        def one(r, _):
            rng, k = jax.random.split(r.rng)
            action = jax.random.uniform(
                k, (self.vec_env.num_envs, self.vec_env.env.action_size),
                minval=-1.0, maxval=1.0,
            )
            env_state, tr = self.vec_env.step(r.env_state, action)
            return r.replace(
                rng=rng, env_state=env_state,
                replay=replay_add(r.replay, tr),
                total_env_steps=r.total_env_steps + self.vec_env.num_envs,
            ), None

        runner, _ = jax.lax.scan(one, runner, None, length=num_iters)
        return runner

    # --- host-level epoch ---------------------------------------------
    def warmup(self, runner: MBPORunnerState) -> MBPORunnerState:
        return self._presample(runner)

    def train_epoch(self, runner: MBPORunnerState, epoch: int,
                    steps_per_epoch: int, log=None
                    ) -> Tuple[MBPORunnerState, Dict[str, float]]:
        cfg = self.config
        num_envs = self.vec_env.num_envs
        seg_iters = max(1, cfg.model_train_freq // num_envs)
        num_segments = max(1, steps_per_epoch // (seg_iters * num_envs))
        all_metrics = []
        bnn_stats = {}

        for seg in range(num_segments):
            # model phase (mbpo.py:92-104)
            if cfg.real_ratio < 1.0:
                k_model, k_roll = jax.random.split(
                    jax.random.fold_in(runner.rng, seg)
                )
                # fit on the valid prefix of the real buffer
                # (reference get_all, mbpo.py:185-187)
                size = int(jax.device_get(runner.replay.size))
                data = {
                    k: v[:size] for k, v in runner.replay.data.items()
                }
                bnn_state, bnn_stats = self.bnn.train(
                    runner.bnn_state, data, k_model, log=log,
                )
                runner = runner.replace(bnn_state=bnn_state)
                length = self.rollout_length(epoch)
                model_replay = self._rollout_model(runner, k_roll, length)
                runner = runner.replace(model_replay=model_replay)
                if log:
                    log(f"MBPO seg {seg}: rollout_len={length} "
                        f"model_pool={int(runner.model_replay.size)} "
                        f"holdout={bnn_stats.get('bnn_holdout_mse'):.4f}")

            runner, metrics = self._collect_and_train_segment(
                runner, seg_iters
            )
            all_metrics.append(jax.device_get(metrics))

        agg = {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }
        agg.update({k: float(v) for k, v in bnn_stats.items()})
        agg["mean_rollout_length"] = float(self.rollout_length(epoch))
        return runner, agg

    # --- eval passthrough ---------------------------------------------
    def act(self, runner_algo_state, obs, key, deterministic=False):
        return self.algo.act(
            runner_algo_state, obs, key, deterministic=deterministic
        )


class HostMBPOLoop:
    """MBPO on host-simulated (MuJoCo) envs: real-env segments stepped
    on host threads between model phases; BNN fitting, branched model
    rollouts, and mixed-batch policy updates run jitted on device.
    Collection/eval machinery is shared with HostOffPolicyLoop
    (runtime/host_loop.py); the reference equivalent is
    mbpo_exp_script.py + MBPO.start_training (mbpo.py:71-149)."""

    def __init__(self, env, mbpo: MBPO,
                 grad_steps_per_env_step: float = 20.0,
                 no_terminal: bool = False):
        # borrow the host actor plumbing (_collect_segment / evaluate)
        from ilswiss_tpu.runtime.host_loop import (
            HostLoopConfig, HostOffPolicyLoop, _cpu_device,
        )
        self.env = env
        self.mbpo = mbpo
        self.algo = mbpo.algo
        self.config = HostLoopConfig(no_terminal=no_terminal)
        self.cpu = _cpu_device()
        self._obs = None
        self._act_cpu = jax.jit(lambda s, o, k: self.algo.act(s, o, k))
        self._act_det_cpu = jax.jit(
            lambda s, o, k: self.algo.act(s, o, k, deterministic=True))
        # MBPO's algo_state nests SAC + BNN states; act() only reads the
        # SAC policy, but the borrowed collector expects the hook.
        self._acting_view = getattr(
            self.algo, "acting_state", lambda s: s)
        self._collect_segment = partial(
            HostOffPolicyLoop._collect_segment, self)
        self.evaluate = partial(HostOffPolicyLoop.evaluate, self)
        self.grad_steps_per_segment = max(1, int(
            mbpo.config.model_train_freq * grad_steps_per_env_step))

        @partial(jax.jit, donate_argnums=0)
        def ingest_and_train(runner: MBPORunnerState, segment
                             ) -> Tuple[MBPORunnerState, Dict]:
            def add_one(replay, tr):
                return replay_add(replay, tr), None

            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            rng, k = jax.random.split(runner.rng)
            runner = runner.replace(replay=replay, rng=rng)

            def grad_step(algo_state, key):
                k_b, k_t = jax.random.split(key)
                batch = mbpo._mixed_batch(runner, k_b)
                algo_state, metrics = mbpo.algo.train_step(
                    algo_state, batch, k_t)
                return algo_state, metrics

            algo_state, metrics = jax.lax.scan(
                grad_step, runner.algo_state,
                jax.random.split(k, self.grad_steps_per_segment))
            return runner.replace(algo_state=algo_state), jax.tree.map(
                jnp.mean, metrics)

        @partial(jax.jit, donate_argnums=0)
        def ingest_only(runner: MBPORunnerState, segment):
            def add_one(replay, tr):
                return replay_add(replay, tr), None
            replay, _ = jax.lax.scan(add_one, runner.replay, segment)
            return runner.replace(replay=replay)

        self._ingest_and_train = ingest_and_train
        self._ingest_only = ingest_only

    # ------------------------------------------------------------------
    def init(self, seed: int = 0) -> MBPORunnerState:
        self._obs = self.env.reset(seed=seed)
        return self.mbpo.init(jax.random.PRNGKey(seed))

    def warmup(self, runner: MBPORunnerState) -> MBPORunnerState:
        seg = self._collect_segment(
            runner, self.mbpo.config.min_steps_before_training,
            random_actions=True)
        runner = self._ingest_only(runner, seg)
        return runner.replace(
            total_env_steps=runner.total_env_steps
            + seg.reward.shape[0] * seg.reward.shape[1])

    def train_epoch(self, runner: MBPORunnerState, epoch: int,
                    steps_per_epoch: int, log=None
                    ) -> Tuple[MBPORunnerState, Dict[str, float]]:
        cfg = self.mbpo.config
        num_segments = max(1, steps_per_epoch // cfg.model_train_freq)
        all_metrics = []
        bnn_stats = {}
        for seg in range(num_segments):
            if cfg.real_ratio < 1.0:
                k_model, k_roll = jax.random.split(
                    jax.random.fold_in(runner.rng, seg))
                size = int(jax.device_get(runner.replay.size))
                data = {k: v[:size] for k, v in runner.replay.data.items()}
                bnn_state, bnn_stats = self.mbpo.bnn.train(
                    runner.bnn_state, data, k_model, log=log)
                runner = runner.replace(bnn_state=bnn_state)
                length = self.mbpo.rollout_length(epoch)
                model_replay = self.mbpo._rollout_model(
                    runner, k_roll, length)
                runner = runner.replace(model_replay=model_replay)
                if log:
                    log(f"MBPO seg {seg}: rollout_len={length} "
                        f"model_pool={int(runner.model_replay.size)}")
            segment = self._collect_segment(
                runner, cfg.model_train_freq, random_actions=False)
            steps = int(segment.reward.shape[0] * segment.reward.shape[1])
            runner, metrics = self._ingest_and_train(runner, segment)
            runner = runner.replace(
                total_env_steps=runner.total_env_steps + steps)
            all_metrics.append(jax.device_get(metrics))
        agg = {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
        }
        agg.update({k: float(v) for k, v in bnn_stats.items()})
        agg["mean_rollout_length"] = float(self.mbpo.rollout_length(epoch))
        return runner, agg

"""Adversarial imitation learning (GAIL / AIRL / FAIRL / DAC-style).

Rebuild of the reference AdvIRL algorithm
(rlkit/torch/algorithms/adv_irl/adv_irl.py:15-329): a discriminator
trained to separate expert from policy transitions, wrapped around an
inner off-policy trainer (SAC by default) that learns from synthesized
rewards.  Everything — disc BCE + gradient penalty, reward synthesis,
inner SAC updates — runs inside the fused jitted loop.

Formula parity:
  - disc input: [obs, action] or [obs, next_obs] when state_only
    (adv_irl.py:163-180)
  - BCE-with-logits, expert target 1 / policy target 0 (adv_irl.py:81-90,
    182-185)
  - Gulrajani gradient penalty on per-row eps-interpolates:
    weight * mean((||d disc(x~)/d x~||_2 - 1)^2)  (adv_irl.py:187-210) —
    computed with `jax.grad` w.r.t. inputs inside the disc loss, fused by
    XLA instead of a second autograd graph
  - reward synthesis per mode (adv_irl.py:276-289):
      airl:  logits
      gail:  softplus(logits)        (beta=1)
      gail2: -softplus(-logits)      (beta=-1, log D)
      fairl: exp(logits) * (-logits)
    with optional min/max clipping (adv_irl.py:291-298)
  - nested update loop per train call (adv_irl.py:126-131):
    num_update_loops x (num_disc_updates disc steps, then
    num_policy_updates inner-trainer steps), expert samples optionally
    mixed into policy batches (adv_irl.py:239-255)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.data.replay import ReplayState, replay_sample
from ilswiss_tpu.models.discriminators import MLPDisc


@dataclass(frozen=True)
class AdvIRLConfig:
    mode: str = "gail"  # airl | gail | gail2 | fairl
    state_only: bool = False
    disc_optim_batch_size: int = 1024
    policy_optim_batch_size: int = 1024
    policy_optim_batch_size_from_expert: int = 0
    num_update_loops_per_train_call: int = 1
    num_disc_updates_per_loop_iter: int = 1
    num_policy_updates_per_loop_iter: int = 1
    disc_lr: float = 1e-3
    disc_momentum: float = 0.0
    use_grad_pen: bool = True
    grad_pen_weight: float = 10.0
    rew_clip_min: float | None = None
    rew_clip_max: float | None = None
    # Divide synthesized rewards by a running std (Welford over every
    # policy batch).  Root-cause fix for the GAIL alpha ratchet
    # (tests/test_alpha_ratchet.py): when the disc-reward scale swamps
    # the alpha*log_pi term, SAC's entropy deficit never flips sign and
    # Adam marches log_alpha up at alpha_lr per step until Q diverges
    # (observed alpha 0.37 -> 2.5e8 in round-3 GAIL-hopper).  Unit-scale
    # rewards keep the entropy term competitive so alpha equilibrates
    # and the sac.py clamp is inert safety.  Off by default (reference
    # parity — the reference has no reward normalization and its own
    # GAIL curve oscillates, exp_specs/gail/README.md).
    reward_norm: bool = False
    # disc architecture (exp spec disc_* keys, e.g. gail_walker.yaml)
    disc_num_blocks: int = 2
    disc_hid_dim: int = 100
    disc_hid_act: str = "relu"
    disc_use_bn: bool = True
    disc_clamp_magnitude: float = 10.0
    # discriminator family (reference adv_irl/disc_models/):
    #   mlp — per-transition MLPDisc (simple_disc_models.py)
    #   rnn — trajectory-window GRU/LSTM disc with per-step logits
    #         (rnn_disc_models.py); batches become [Bw, T] windows
    #   cnn — image-observation conv disc (cnn_disc_models.py /
    #         adv_irl_visual.py); obs must be [H, W, C] images
    disc_type: str = "mlp"
    disc_traj_len: int = 16          # rnn window length T
    disc_rnn_cell: str = "gru"
    disc_rnn_layers: int = 2
    disc_rnn_bidirectional: bool = True
    disc_num_filters: int = 32       # cnn trunk width


@struct.dataclass
class AdvIRLState:
    disc_params: Any         # full variables dict (params [+ batch_stats])
    disc_opt: Any
    policy: Any              # inner trainer state
    expert: ReplayState
    # running (count, mean, m2) of synthesized rewards when
    # config.reward_norm; None otherwise (keeps the treedef — and old
    # checkpoints — unchanged for parity runs)
    rew_stats: Any = None


class AdvIRL:
    """`policy_trainer` is any off-policy trainer object (SAC/TD3/...)
    exposing init/act/train_step; this class satisfies the same protocol
    plus `train_call(state, replay, key)` which the loop uses instead of
    per-batch `train_step` (the reference's _do_training override)."""

    def __init__(self, obs_size: int, action_size: int, policy_trainer,
                 expert_replay: ReplayState,
                 config: AdvIRLConfig = AdvIRLConfig(),
                 axis_name: str | None = None,
                 feature_fn=None, feature_dim: int | None = None):
        """`feature_fn(policy_state, obs) -> features` makes this the
        visual AdvIRL variant (reference adv_irl_visual.py:54-55): the
        disc consumes frozen encoder features (e.g. the inner SAC-AE's
        pixel encoder) instead of raw obs.  `feature_dim` is the
        encoder output width."""
        assert config.mode in ("airl", "gail", "gail2", "fairl"), config.mode
        assert config.disc_type in ("mlp", "rnn", "cnn"), config.disc_type
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.policy_trainer = policy_trainer
        self.expert_replay = expert_replay
        self.axis_name = axis_name
        self.feature_fn = feature_fn
        if feature_fn is not None:
            assert feature_dim is not None
            obs_size = feature_dim
        if config.disc_type == "rnn":
            from ilswiss_tpu.models.rnn_discriminators import RNNDisc
            self.disc = RNNDisc(
                hid_dim=config.disc_hid_dim,
                cell_type=config.disc_rnn_cell,
                num_layers=config.disc_rnn_layers,
                bidirectional=config.disc_rnn_bidirectional,
                clamp_magnitude=config.disc_clamp_magnitude,
            )
        elif config.disc_type == "cnn":
            from ilswiss_tpu.models.discriminators import CNNDisc
            assert not config.state_only, "cnn disc scores (obs, action)"
            self.disc = CNNDisc(
                num_filters=config.disc_num_filters,
                num_layer_blocks=config.disc_num_blocks,
                hid_dim=config.disc_hid_dim,
                hid_act=config.disc_hid_act,
                use_bn=False,
                clamp_magnitude=config.disc_clamp_magnitude,
            )
        else:
            self.disc = MLPDisc(
                num_layer_blocks=config.disc_num_blocks,
                hid_dim=config.disc_hid_dim,
                hid_act=config.disc_hid_act,
                use_bn=config.disc_use_bn,
                clamp_magnitude=config.disc_clamp_magnitude,
            )
        self.disc_tx = optax.adam(
            config.disc_lr, b1=config.disc_momentum, b2=0.999
        )
        self.disc_input_dim = (
            2 * obs_size if config.state_only else obs_size + action_size
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> AdvIRLState:
        k_disc, k_pol = jax.random.split(key)
        if self.config.disc_type == "rnn":
            disc_params = self.disc.init(
                k_disc,
                jnp.zeros((2, self.config.disc_traj_len,
                           self.disc_input_dim)),
            )
        elif self.config.disc_type == "cnn":
            obs_shape = self.expert_replay.data["obs"].shape[1:]
            disc_params = self.disc.init(
                k_disc, jnp.zeros((2,) + obs_shape),
                jnp.zeros((2, self.action_size)), train=True,
            )
        else:
            disc_params = self.disc.init(
                k_disc, jnp.zeros((2, self.disc_input_dim)), train=True
            )
        return AdvIRLState(
            disc_params=disc_params,
            disc_opt=self.disc_tx.init(disc_params["params"]),
            policy=self.policy_trainer.init(k_pol),
            # private copy: runner states are donated, which would delete
            # a shared demo buffer out from under the caller
            expert=jax.tree.map(jnp.array, self.expert_replay),
            rew_stats=(
                (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                 jnp.zeros((), jnp.float32))
                if self.config.reward_norm else None),
        )

    def act(self, state: AdvIRLState, obs, key, deterministic=False):
        return self.policy_trainer.act(
            state.policy, obs, key, deterministic=deterministic
        )

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    # ------------------------------------------------------------------
    def _disc_input(self, state: "AdvIRLState",
                    batch: Dict[str, jnp.ndarray]):
        """Disc inputs: a concat array for mlp/rnn ([.., D] resp.
        [.., T, D]), or an (image_obs, action) tuple for cnn."""
        obs, next_obs = batch["obs"], batch.get("next_obs")
        if self.config.disc_type == "cnn":
            return (obs.astype(jnp.float32) / 255.0
                    if obs.dtype == jnp.uint8 else obs,
                    batch["action"])
        if self.feature_fn is not None:
            # visual variant: frozen encoder features (adv_irl_visual.py
            # detaches the encoder for disc inputs)
            obs = jax.lax.stop_gradient(self.feature_fn(state.policy, obs))
            if self.config.state_only:
                next_obs = jax.lax.stop_gradient(
                    self.feature_fn(state.policy, next_obs))
        if self.config.state_only:
            return jnp.concatenate([obs, next_obs], axis=-1)
        return jnp.concatenate([obs, batch["action"]], axis=-1)

    def _disc_forward(self, variables, x, train: bool):
        """Always returns (logits, batch_stats_updates_or_None)."""
        if self.config.disc_type == "rnn":
            return self.disc.apply(variables, x), None
        if self.config.disc_type == "cnn":
            return self.disc.apply(variables, x[0], x[1], train=train), None
        if self.config.disc_use_bn and train:
            return self.disc.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
        return self.disc.apply(variables, x, train=train), None

    @staticmethod
    def _interpolate(key, expert_in, policy_in):
        """Per-row eps-interpolates for the gradient penalty, elementwise
        over however many input leaves the disc takes."""
        def mix(e, p):
            eps = jax.random.uniform(
                key, (e.shape[0],) + (1,) * (e.ndim - 1))
            return jax.lax.stop_gradient(eps * e + (1.0 - eps) * p)
        return jax.tree.map(mix, expert_in, policy_in)

    @staticmethod
    def _grad_norm(grads):
        """Per-row L2 norm over all non-batch dims of all input leaves."""
        sq = sum(
            jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=-1)
            for g in jax.tree.leaves(grads)
        )
        return jnp.sqrt(jnp.maximum(sq, 1e-12))

    def _disc_update(self, state: AdvIRLState, replay: ReplayState,
                     key: jax.Array):
        cfg = self.config
        k_e, k_p, k_eps = jax.random.split(key, 3)
        if cfg.disc_type == "rnn":
            from ilswiss_tpu.data.replay import replay_sample_window
            n_w = max(1, cfg.disc_optim_batch_size // cfg.disc_traj_len)
            expert_batch = replay_sample_window(
                state.expert, k_e, n_w, cfg.disc_traj_len)
            policy_batch = replay_sample_window(
                replay, k_p, n_w, cfg.disc_traj_len)
            valid = jnp.concatenate(
                [expert_batch["valid"], policy_batch["valid"]], axis=0
            ).astype(jnp.float32)[..., None]          # [2Bw, T, 1]
            n_rows = n_w
            targets = jnp.concatenate([
                jnp.ones((n_w, 1, 1)), jnp.zeros((n_w, 1, 1))
            ], axis=0)                                 # broadcast over T
        else:
            expert_batch = replay_sample(
                state.expert, k_e, cfg.disc_optim_batch_size
            )
            policy_batch = replay_sample(
                replay, k_p, cfg.disc_optim_batch_size)
            valid = None
            n_rows = cfg.disc_optim_batch_size
            targets = jnp.concatenate([
                jnp.ones((n_rows, 1)), jnp.zeros((n_rows, 1))
            ], axis=0)
        expert_in = self._disc_input(state, expert_batch)
        policy_in = self._disc_input(state, policy_batch)
        if cfg.disc_type == "rnn":
            # zero inputs past the episode boundary so the (possibly
            # bidirectional) recurrence never mixes neighboring episodes
            expert_in = expert_in * expert_batch["valid"][..., None]
            policy_in = policy_in * policy_batch["valid"][..., None]
        x = jax.tree.map(
            lambda e, p: jnp.concatenate([e, p], axis=0),
            expert_in, policy_in,
        )
        interp = self._interpolate(k_eps, expert_in, policy_in)
        batch_stats = state.disc_params.get("batch_stats", None)

        def loss_fn(params):
            variables = (
                {"params": params, "batch_stats": batch_stats}
                if batch_stats is not None else {"params": params}
            )
            logits, updates = self._disc_forward(variables, x, train=True)
            # BCEWithLogits: mean(softplus(logits) - targets * logits),
            # masked to in-episode steps for trajectory discs
            ce_rows = jax.nn.softplus(logits) - targets * logits
            hit = ((logits > 0) == (targets > 0.5)).astype(jnp.float32)
            if valid is not None:
                denom = jnp.maximum(jnp.sum(valid), 1.0)
                ce = jnp.sum(ce_rows * valid) / denom
                acc = jnp.sum(hit * valid) / denom
            else:
                ce = jnp.mean(ce_rows)
                acc = jnp.mean(hit)
            aux = {"ce": ce, "updates": updates, "acc": acc}
            if cfg.use_grad_pen:
                def disc_sum(x_in):
                    out = self._disc_forward(variables, x_in, train=True)[0]
                    return jnp.sum(out)
                grads = jax.grad(disc_sum)(interp)
                gp = jnp.mean((self._grad_norm(grads) - 1.0) ** 2)
                aux["grad_pen"] = gp
                return ce + cfg.grad_pen_weight * gp, aux
            aux["grad_pen"] = jnp.zeros(())
            return ce, aux

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.disc_params["params"]
        )
        g = self._pmean(g)
        up, disc_opt = self.disc_tx.update(
            g, state.disc_opt, state.disc_params["params"]
        )
        new_params = optax.apply_updates(state.disc_params["params"], up)
        disc_params = {"params": new_params}
        if batch_stats is not None:
            disc_params["batch_stats"] = aux["updates"]["batch_stats"]
        metrics = {
            "disc_ce_loss": aux["ce"],
            "disc_acc": aux["acc"],
            "disc_grad_pen": aux["grad_pen"],
        }
        return state.replace(disc_params=disc_params, disc_opt=disc_opt), metrics

    # ------------------------------------------------------------------
    def _mode_reward(self, logits: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if cfg.mode == "airl":
            rew = logits
        elif cfg.mode == "gail":
            rew = jax.nn.softplus(logits)
        elif cfg.mode == "gail2":
            rew = -jax.nn.softplus(-logits)  # log D
        else:  # fairl
            rew = jnp.exp(logits) * (-logits)
        if cfg.rew_clip_max is not None:
            rew = jnp.minimum(rew, cfg.rew_clip_max)
        if cfg.rew_clip_min is not None:
            rew = jnp.maximum(rew, cfg.rew_clip_min)
        return rew

    def synthesize_rewards(self, state: AdvIRLState,
                           batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        x = self._disc_input(state, batch)
        logits, _ = self._disc_forward(state.disc_params, x, train=False)
        return self._mode_reward(jax.lax.stop_gradient(logits[..., 0]))

    def _policy_update(self, state: AdvIRLState, replay: ReplayState,
                       key: jax.Array):
        cfg = self.config
        k_p, k_e, k_t = jax.random.split(key, 3)
        if cfg.disc_type == "rnn":
            # trajectory disc: sample windows so rewards come from the
            # per-step logits in context, then train the inner policy on
            # the flattened transitions (rewards past an episode edge
            # are zeroed with the validity mask)
            from ilswiss_tpu.data.replay import replay_sample_window
            n_w = max(1, cfg.policy_optim_batch_size // cfg.disc_traj_len)
            win = replay_sample_window(replay, k_p, n_w, cfg.disc_traj_len)
            x = self._disc_input(state, win) * win["valid"][..., None]
            logits, _ = self._disc_forward(state.disc_params, x,
                                           train=False)
            rew = self._mode_reward(
                jax.lax.stop_gradient(logits[..., 0]))   # [Bw, T]
            rew = rew * win["valid"].astype(jnp.float32)
            flat = lambda v: v.reshape((-1,) + v.shape[2:])
            batch = {k: flat(v) for k, v in win.items() if k != "valid"}
            batch["reward"] = flat(rew)
            rew_weight = flat(win["valid"]).astype(jnp.float32)
        else:
            n_exp = cfg.policy_optim_batch_size_from_expert
            batch = replay_sample(
                replay, k_p, cfg.policy_optim_batch_size - n_exp
            )
            if n_exp > 0:
                exp = replay_sample(state.expert, k_e, n_exp)
                batch = {
                    k: jnp.concatenate([batch[k], exp[k]], axis=0)
                    for k in batch
                }
            batch = dict(batch)
            batch["reward"] = self.synthesize_rewards(state, batch)
            rew_weight = None
        if cfg.reward_norm:
            state, batch["reward"] = self._normalize_rewards(
                state, batch["reward"], rew_weight)
        policy_state, pol_metrics = self.policy_trainer.train_step(
            state.policy, batch, k_t
        )
        metrics = {f"policy_{k}": v for k, v in pol_metrics.items()}
        metrics["disc_rew_mean"] = jnp.mean(batch["reward"])
        return state.replace(policy=policy_state), metrics

    def _normalize_rewards(self, state: AdvIRLState, rew: jnp.ndarray,
                           weight: jnp.ndarray | None = None):
        """Welford-update the running reward moments, then divide by the
        running std (no centering — gail/fairl reward signs are
        meaningful).  See AdvIRLConfig.reward_norm.

        `weight` (0/1 validity, rnn-disc window padding) excludes masked
        rows from the moments — padding zeros must not deflate the
        running std."""
        count, mean, m2 = state.rew_stats
        r = rew.reshape(-1)
        if weight is None:
            n_b = jnp.asarray(r.shape[0], jnp.float32)
            mean_b = jnp.mean(r)
            m2_b = jnp.sum(jnp.square(r - mean_b))
        else:
            w = weight.reshape(-1)
            # keep the TRUE valid count: an all-masked batch must be a
            # no-op (n_b = 0 zeroes every merge term below), not a
            # phantom zero-reward observation pulling the mean to 0
            n_b = jnp.sum(w)
            mean_b = jnp.sum(w * r) / jnp.maximum(n_b, 1.0)
            m2_b = jnp.sum(w * jnp.square(r - mean_b))
        delta = mean_b - mean
        n = count + n_b
        denom = jnp.maximum(n, 1.0)
        mean = mean + delta * n_b / denom
        m2 = m2 + m2_b + jnp.square(delta) * count * n_b / denom
        std = jnp.sqrt(jnp.maximum(m2 / jnp.maximum(n - 1.0, 1.0), 1e-12))
        state = state.replace(rew_stats=(n, mean, m2))
        return state, rew / (std + 1e-8)

    # ------------------------------------------------------------------
    def train_call(self, state: AdvIRLState, replay: ReplayState,
                   key: jax.Array):
        """One reference train call: the nested disc/policy loop
        (adv_irl.py:126-131), as scans."""
        cfg = self.config

        def one_loop(st, k):
            kd, kp = jax.random.split(k)

            def disc_body(s, kk):
                return self._disc_update(s, replay, kk)

            st, disc_m = jax.lax.scan(
                disc_body, st,
                jax.random.split(kd, cfg.num_disc_updates_per_loop_iter),
            )

            def pol_body(s, kk):
                return self._policy_update(s, replay, kk)

            st, pol_m = jax.lax.scan(
                pol_body, st,
                jax.random.split(kp, cfg.num_policy_updates_per_loop_iter),
            )
            m = {**jax.tree.map(jnp.mean, disc_m),
                 **jax.tree.map(jnp.mean, pol_m)}
            return st, m

        state, metrics = jax.lax.scan(
            one_loop, state,
            jax.random.split(key, cfg.num_update_loops_per_train_call),
        )
        return state, jax.tree.map(jnp.mean, metrics)

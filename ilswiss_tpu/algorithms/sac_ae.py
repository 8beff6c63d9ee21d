"""SAC-AE (+RAD / CURL) for pixel observations, as pure grad-steps.

Rebuild of the reference visual SAC trainer
(rlkit/torch/algorithms/sac/sac_ae.py:15-423).  One shared `PixelEncoder`
feeds critics and policy; stop-gradients reproduce the reference's
update ownership exactly:
  - critic loss updates encoder + both Qs jointly (one optimizer over
    the three trees, sac_ae.py:93-99 qf_optimizer)
  - policy never updates the encoder (obs features detached, :262-268)
  - auto-alpha with target_entropy = -action_dim (:80-81), alpha Adam
    betas (0.5, 0.999) (:105-107)
  - autoencoder: recon MSE + decoder_latent_lambda * 0.5*||z||^2
    (:174-208), updating encoder + decoder
  - CURL: bilinear W-logits contrastive loss, anchor through the online
    encoder, positive through the target encoder (:129-172)
  - staggered frequencies ac/encdec/target/cpc (:342-364 train_step
    dispatch) via a step counter + lax.cond
  - Polyak: Q tau 0.01, encoder tau 0.05 (:379-384)

RAD == augment the sampled batch before this trainer (data/aug_replay);
CURL == also feed observations_anchor/_pos and set cpc_update_freq > 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.encoders import PixelDecoder, PixelEncoder, conv_out_dim
from ilswiss_tpu.models.networks import FlattenMLP
from ilswiss_tpu.models.policies import TanhGaussianPolicy
from ilswiss_tpu.utils.pytree import copy_params, soft_update


@dataclass(frozen=True)
class SACAEConfig:
    image_size: int = 64
    frame_channels: int = 3
    feature_dim: int = 50
    num_conv_layers: int = 4
    num_filters: int = 32
    discount: float = 0.99
    reward_scale: float = 1.0
    policy_lr: float = 1e-3
    qf_lr: float = 1e-3
    alpha_lr: float = 1e-3
    encdec_lr: float = 1e-3
    soft_target_tau: float = 0.01
    enc_soft_target_tau: float = 0.05
    init_alpha: float = 0.1
    train_alpha: bool = True
    policy_mean_reg_weight: float = 1e-3
    policy_std_reg_weight: float = 1e-3
    beta_1: float = 0.9
    decoder_latent_lambda: float = 1e-6
    ac_update_freq: int = 2
    encdec_update_freq: int = 1
    cpc_update_freq: int = 0  # 0 = no CURL
    target_update_freq: int = 2
    # conv compute dtype ("bfloat16" | "float32"): bf16 runs the pixel
    # encoder/decoder stacks ~4x faster on the MXU; f32 for parity runs
    conv_dtype: str = "bfloat16"


@struct.dataclass
class SACAEState:
    encoder_params: Any
    decoder_params: Any
    policy_params: Any
    qf1_params: Any
    qf2_params: Any
    target_encoder_params: Any
    target_qf1_params: Any
    target_qf2_params: Any
    cpc_W: jnp.ndarray
    log_alpha: jnp.ndarray
    qf_opt: Any        # over (encoder, qf1, qf2)
    policy_opt: Any
    alpha_opt: Any
    encdec_opt: Any    # over (encoder, decoder)
    cpc_opt: Any       # over (encoder, W)
    step: jnp.ndarray


class SACAE:
    def __init__(self, action_size: int,
                 config: SACAEConfig = SACAEConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2):
        self.config = config
        self.action_size = action_size
        cdt = jnp.dtype(config.conv_dtype)
        self.encoder = PixelEncoder(
            feature_dim=config.feature_dim,
            num_layers=config.num_conv_layers,
            num_filters=config.num_filters,
            compute_dtype=cdt,
        )
        self.decoder = PixelDecoder(
            out_hw=conv_out_dim(config.image_size, config.num_conv_layers),
            channels=config.frame_channels,
            num_layers=config.num_conv_layers,
            num_filters=config.num_filters,
            out_size=config.image_size,
            compute_dtype=cdt,
        )
        hidden = (net_size,) * num_hidden_layers
        self.policy = TanhGaussianPolicy(
            action_dim=action_size, hidden_sizes=hidden)
        self.qf = FlattenMLP(hidden_sizes=hidden, output_size=1)
        self.target_entropy = -float(action_size)

        adam = lambda lr, b1=config.beta_1: optax.adam(lr, b1=b1, b2=0.999)
        self.qf_tx = adam(config.qf_lr)
        self.policy_tx = adam(config.policy_lr)
        self.alpha_tx = adam(config.alpha_lr, b1=0.5)
        self.encdec_tx = adam(config.encdec_lr)
        self.cpc_tx = adam(config.encdec_lr)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> SACAEState:
        cfg = self.config
        ke, kd, kp, k1, k2, kw = jax.random.split(key, 6)
        img = jnp.zeros(
            (1, cfg.image_size, cfg.image_size, cfg.frame_channels))
        feat = jnp.zeros((1, cfg.feature_dim))
        act = jnp.zeros((1, self.action_size))
        encoder_params = self.encoder.init(ke, img)
        decoder_params = self.decoder.init(kd, feat)
        policy_params = self.policy.init(kp, feat)
        qf1_params = self.qf.init(k1, feat, act)
        qf2_params = self.qf.init(k2, feat, act)
        W = jax.random.uniform(kw, (cfg.feature_dim, cfg.feature_dim))
        log_alpha = jnp.asarray(jnp.log(cfg.init_alpha), jnp.float32)
        return SACAEState(
            encoder_params=encoder_params,
            decoder_params=decoder_params,
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            target_encoder_params=copy_params(encoder_params),
            target_qf1_params=copy_params(qf1_params),
            target_qf2_params=copy_params(qf2_params),
            cpc_W=W,
            log_alpha=log_alpha,
            qf_opt=self.qf_tx.init(
                (encoder_params, qf1_params, qf2_params)),
            policy_opt=self.policy_tx.init(policy_params),
            alpha_opt=self.alpha_tx.init(log_alpha),
            encdec_opt=self.encdec_tx.init(
                (encoder_params, decoder_params)),
            cpc_opt=self.cpc_tx.init((encoder_params, W)),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def acting_state(self, state: SACAEState) -> SACAEState:
        """Acting-only slice for host loops: `act` reads encoder +
        policy params; dropping critics/decoder/targets and all five
        optimizer states cuts the per-segment device->host snapshot by
        ~10x (runtime/host_loop.py snapshot_and_submit)."""
        return state.replace(
            decoder_params=None, qf1_params=None, qf2_params=None,
            target_encoder_params=None, target_qf1_params=None,
            target_qf2_params=None, cpc_W=None, qf_opt=None,
            policy_opt=None, alpha_opt=None, encdec_opt=None,
            cpc_opt=None)

    def act(self, state: SACAEState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        feat = self.encoder.apply(state.encoder_params, obs)
        mean, log_std = self.policy.apply(state.policy_params, feat)
        if deterministic:
            return jnp.tanh(mean)
        action, _ = D.tanh_normal_sample(key, mean, log_std)
        return action

    # --- phases --------------------------------------------------------
    def _train_ac(self, state: SACAEState, batch, key):
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"]
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]
        k_next, k_new = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # next action from online encoder features, detached (:229-238)
        next_feat_online = jax.lax.stop_gradient(
            self.encoder.apply(state.encoder_params, next_obs))
        n_mean, n_log_std = self.policy.apply(
            state.policy_params, next_feat_online)
        next_actions, n_pre = D.tanh_normal_sample(k_next, n_mean, n_log_std)
        next_log_pi = D.tanh_normal_log_prob(
            n_mean, n_log_std, next_actions, n_pre)
        target_feat = self.encoder.apply(
            state.target_encoder_params, next_obs)
        min_t_q = jnp.minimum(
            self.qf.apply(state.target_qf1_params, target_feat,
                          next_actions),
            self.qf.apply(state.target_qf2_params, target_feat,
                          next_actions),
        )
        q_target = jax.lax.stop_gradient(
            rewards + (1.0 - terminals) * cfg.discount
            * (min_t_q - alpha * next_log_pi))

        def qf_loss_fn(trees):
            enc, qf1, qf2 = trees
            feat = self.encoder.apply(enc, obs)
            l1 = 0.5 * jnp.mean(
                (self.qf.apply(qf1, feat, actions) - q_target) ** 2)
            l2 = 0.5 * jnp.mean(
                (self.qf.apply(qf2, feat, actions) - q_target) ** 2)
            return l1 + l2, (l1, l2)

        (qf_loss, (qf1_loss, qf2_loss)), gq = jax.value_and_grad(
            qf_loss_fn, has_aux=True)(
            (state.encoder_params, state.qf1_params, state.qf2_params))
        upq, qf_opt = self.qf_tx.update(
            gq, state.qf_opt,
            (state.encoder_params, state.qf1_params, state.qf2_params))
        encoder_params, qf1_params, qf2_params = optax.apply_updates(
            (state.encoder_params, state.qf1_params, state.qf2_params), upq)

        # policy on detached features of the UPDATED encoder (:262-268)
        feat_detached = jax.lax.stop_gradient(
            self.encoder.apply(encoder_params, obs))

        def policy_loss_fn(policy_params):
            mean, log_std = self.policy.apply(policy_params, feat_detached)
            new_actions, pre = D.tanh_normal_sample(k_new, mean, log_std)
            log_pi = D.tanh_normal_log_prob(mean, log_std, new_actions, pre)
            q_new = jnp.minimum(
                self.qf.apply(qf1_params, feat_detached, new_actions),
                self.qf.apply(qf2_params, feat_detached, new_actions),
            )
            loss = jnp.mean(alpha * log_pi - q_new)
            reg = (cfg.policy_mean_reg_weight * jnp.mean(mean**2)
                   + cfg.policy_std_reg_weight * jnp.mean(log_std**2))
            return loss + reg, log_pi

        (policy_loss, log_pi), gp = jax.value_and_grad(
            policy_loss_fn, has_aux=True)(state.policy_params)
        upp, policy_opt = self.policy_tx.update(
            gp, state.policy_opt, state.policy_params)
        policy_params = optax.apply_updates(state.policy_params, upp)

        def alpha_loss_fn(log_alpha):
            tgt = jax.lax.stop_gradient(log_pi + self.target_entropy)
            return -jnp.mean(log_alpha * tgt)

        alpha_loss, ga = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        if cfg.train_alpha:
            upa, alpha_opt = self.alpha_tx.update(
                ga, state.alpha_opt, state.log_alpha)
            log_alpha = optax.apply_updates(state.log_alpha, upa)
        else:
            alpha_opt, log_alpha = state.alpha_opt, state.log_alpha

        new_state = state.replace(
            encoder_params=encoder_params,
            qf1_params=qf1_params, qf2_params=qf2_params,
            policy_params=policy_params, log_alpha=log_alpha,
            qf_opt=qf_opt, policy_opt=policy_opt, alpha_opt=alpha_opt,
        )
        metrics = {
            "qf1_loss": qf1_loss, "qf2_loss": qf2_loss,
            "policy_loss": policy_loss, "alpha_loss": alpha_loss,
            "alpha": alpha,
        }
        return new_state, metrics

    def _train_encdec(self, state: SACAEState, batch):
        cfg = self.config
        obs = batch["obs"]
        target = obs.astype(jnp.float32)
        target = jnp.where(jnp.max(target) > 1.0, target / 255.0, target)
        target = target - 0.5  # reference preprocess_obs centers to [-.5,.5]

        def loss_fn(trees):
            enc, dec = trees
            z = self.encoder.apply(enc, obs)
            rec = self.decoder.apply(dec, z)
            rec_loss = jnp.mean((rec - target) ** 2)
            latent_loss = jnp.mean(0.5 * jnp.sum(z**2, axis=1))
            return rec_loss + cfg.decoder_latent_lambda * latent_loss, (
                rec_loss, latent_loss)

        (loss, (rec_loss, latent_loss)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(
            (state.encoder_params, state.decoder_params))
        up, encdec_opt = self.encdec_tx.update(
            g, state.encdec_opt,
            (state.encoder_params, state.decoder_params))
        encoder_params, decoder_params = optax.apply_updates(
            (state.encoder_params, state.decoder_params), up)
        return state.replace(
            encoder_params=encoder_params, decoder_params=decoder_params,
            encdec_opt=encdec_opt,
        ), {"rec_loss": rec_loss, "latent_loss": latent_loss}

    def _train_cpc(self, state: SACAEState, batch):
        anchor = batch["observations_anchor"]
        pos = batch["observations_pos"]
        z_pos = jax.lax.stop_gradient(
            self.encoder.apply(state.target_encoder_params, pos))

        def loss_fn(trees):
            enc, W = trees
            z_a = self.encoder.apply(enc, anchor)
            Wz = W @ z_pos.T                        # (z, B)
            logits = z_a @ Wz                       # (B, B)
            logits = logits - jnp.max(logits, axis=1, keepdims=True)
            labels = jnp.arange(logits.shape[0])
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, labels))

        loss, g = jax.value_and_grad(loss_fn)(
            (state.encoder_params, state.cpc_W))
        up, cpc_opt = self.cpc_tx.update(
            g, state.cpc_opt, (state.encoder_params, state.cpc_W))
        encoder_params, W = optax.apply_updates(
            (state.encoder_params, state.cpc_W), up)
        return state.replace(
            encoder_params=encoder_params, cpc_W=W, cpc_opt=cpc_opt,
        ), {"curl_loss": loss}

    # ------------------------------------------------------------------
    def train_step(self, state: SACAEState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> Tuple[SACAEState, Dict]:
        cfg = self.config
        step = state.step

        zeros_ac = {
            "qf1_loss": 0.0, "qf2_loss": 0.0, "policy_loss": 0.0,
            "alpha_loss": 0.0, "alpha": jnp.exp(state.log_alpha),
        }
        state, ac_metrics = jax.lax.cond(
            step % cfg.ac_update_freq == 0,
            lambda s: self._train_ac(s, batch, key),
            lambda s: (s, {k: jnp.asarray(v, jnp.float32)
                           for k, v in zeros_ac.items()}),
            state,
        )

        if cfg.encdec_update_freq > 0:
            state, ed_metrics = jax.lax.cond(
                step % cfg.encdec_update_freq == 0,
                lambda s: self._train_encdec(s, batch),
                lambda s: (s, {"rec_loss": jnp.asarray(0.0),
                               "latent_loss": jnp.asarray(0.0)}),
                state,
            )
        else:
            ed_metrics = {}

        def do_targets(s: SACAEState) -> SACAEState:
            return s.replace(
                target_qf1_params=soft_update(
                    s.target_qf1_params, s.qf1_params,
                    cfg.soft_target_tau),
                target_qf2_params=soft_update(
                    s.target_qf2_params, s.qf2_params,
                    cfg.soft_target_tau),
                target_encoder_params=soft_update(
                    s.target_encoder_params, s.encoder_params,
                    cfg.enc_soft_target_tau),
            )

        state = jax.lax.cond(
            step % cfg.target_update_freq == 0,
            do_targets, lambda s: s, state)

        if cfg.cpc_update_freq > 0:
            state, cpc_metrics = jax.lax.cond(
                step % cfg.cpc_update_freq == 0,
                lambda s: self._train_cpc(s, batch),
                lambda s: (s, {"curl_loss": jnp.asarray(0.0)}),
                state,
            )
        else:
            cpc_metrics = {}

        state = state.replace(step=step + 1)
        return state, {**ac_metrics, **ed_metrics, **cpc_metrics}

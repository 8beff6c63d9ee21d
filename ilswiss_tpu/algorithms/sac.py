"""Soft Actor-Critic with automatic entropy tuning, as a pure grad-step.

TPU-native rebuild of the reference twin-Q auto-alpha SAC trainer
(rlkit/torch/algorithms/sac/sac_alpha.py).  The whole `train_step` is one
pure function `(SACState, batch, key) -> (SACState, metrics)` that jits
into a single fused XLA program; target updates are `tree_map` Polyak
lerps instead of in-place copies.

The two critics live STACKED on a leading ensemble axis (params [2,...],
applied via vmap), so every twin-Q forward/backward is one batched
matmul chain instead of two — mathematically identical to the
reference's separate critics (Adam and Polyak are elementwise, and the
critics only interact through min()), at half the kernel launches.

Formula parity with the reference (sac_alpha.py:78-187):
  - Q target: r * reward_scale + (1 - terminal) * gamma *
              (min(Q1bar, Q2bar)(s', a') - alpha * log pi(a'|s'))
  - Q loss: 0.5 * MSE (both critics)
  - policy loss: mean(alpha * log pi - min(Q1, Q2)(s, a_new))
                 + mean_reg * mean(mu^2) + std_reg * mean(log_std^2)
  - alpha loss: -mean(log_alpha * stop_grad(log pi + target_entropy)),
    default target_entropy = -action_dim / 2 (sac_alpha.py:56-58)
  - update order: critics first, policy against the *updated* critics,
    then alpha; the alpha used in both losses is the previous step's
    (sac_alpha.py:160-166 updates self.alpha last)
  - Polyak tau on both critics every step (sac_alpha.py:245-247)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.networks import FlattenMLP
from ilswiss_tpu.models.policies import TanhGaussianPolicy
from ilswiss_tpu.utils.pytree import copy_params, soft_update


@dataclass(frozen=True)
class SACConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    soft_target_tau: float = 5e-3
    policy_lr: float = 3e-4
    qf_lr: float = 3e-4
    alpha_lr: float = 3e-4
    beta_1: float = 0.9
    policy_mean_reg_weight: float = 1e-3
    policy_std_reg_weight: float = 1e-3
    target_entropy: float | None = None  # default -action_dim / 2
    init_alpha: float = 1.0
    train_alpha: bool = True
    # Stability guard, not a reference knob: under nonstationary
    # adversarial rewards (AdvIRL) the alpha control loop can ratchet —
    # log_pi hovers just above -target_entropy while the disc dominates,
    # and Adam's sign-following drives alpha up exponentially until Q
    # diverges (observed: alpha 0.37 -> 2.5e8 in 60 epochs of
    # GAIL-hopper).  Healthy equilibria sit at alpha ~0.05-1, so a
    # [1e-6, 10] clamp is inert there and turns a diverged run into a
    # recoverable one.
    min_alpha: float = 1e-6
    max_alpha: float = 10.0
    # Optional Q-target clip — the reference's own pattern for
    # bounded-reward settings (her/td3.py:79-86 clips sparse [-1,0]
    # rewards' targets to [-1/(1-gamma), 0]).  AdvIRL's gail/gail2
    # reward modes are bounded by the disc logit clamp, so run_adv_irl
    # derives principled bounds; prevents the saturated-policy Q
    # bootstrap runaway (observed +1.4e6 in GAIL-hopper collapse).
    q_target_min: float | None = None
    q_target_max: float | None = None


@struct.dataclass
class SACState:
    policy_params: Any
    qf_params: Any          # stacked twin critics, leaves [2, ...]
    target_qf_params: Any   # stacked
    log_alpha: jnp.ndarray
    policy_opt: Any
    qf_opt: Any
    alpha_opt: Any


class SAC:
    """Static trainer object: modules + config; all methods pure."""

    def __init__(self, obs_size: int, action_size: int,
                 config: SACConfig = SACConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None,
                 use_pallas_act: bool = False,
                 use_fused_chain: bool = False):
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        # When set, the trainer is running inside shard_map over this mesh
        # axis: gradients are pmean-reduced so replicated params stay in
        # sync (the learner-DP all-reduce of SURVEY.md §2.5).
        self.axis_name = axis_name
        # Opt-in fused Pallas kernel for the acting forward (policy MLP
        # + log-std clamp in one launch; ops/fused_mlp.py).  Training
        # keeps the flax path for autodiff.
        self.use_pallas_act = use_pallas_act
        # Opt-in fused Pallas TRAINING chain: K sequential grad steps in
        # one Mosaic kernel with params+Adam moments VMEM-resident
        # (ops/fused_sac.py).  Same update as train_step to matmul
        # precision; ILSWISS_NO_FUSED_SAC=1 is the escape hatch.
        import os as _os
        self.use_fused_chain = (
            use_fused_chain
            and not _os.environ.get("ILSWISS_NO_FUSED_SAC"))
        hidden = (net_size,) * num_hidden_layers
        self.policy = TanhGaussianPolicy(
            action_dim=action_size, hidden_sizes=hidden
        )
        self.qf = FlattenMLP(hidden_sizes=hidden, output_size=1)
        self.target_entropy = (
            config.target_entropy
            if config.target_entropy is not None
            else -action_size / 2.0
        )
        # optax.flatten: Adam moments live on one ravelled vector per
        # optimizer, so each update is a couple of fused elementwise
        # kernels instead of one chain per param leaf — measurable at
        # this model scale where the grad step is launch-bound.
        adam = lambda lr: optax.flatten(
            optax.adam(lr, b1=config.beta_1, b2=0.999))
        self.policy_tx = adam(config.policy_lr)
        self.qf_tx = adam(config.qf_lr)
        self.alpha_tx = adam(config.alpha_lr)

    # --- stacked-critic helpers ---------------------------------------
    def q_apply(self, stacked_params, obs, actions) -> jnp.ndarray:
        """[2, B, 1] Q values from the stacked critic pair.

        The twin critics are evaluated as ONE batched-matmul chain via
        einsum over the stacked [2, in, out] kernels — half the kernel
        launches of two separate applies, and (unlike vmap-of-apply,
        which the tunneled TPU terminal's older XLA wedges on when
        batch-differentiated) it lowers to plain dot_general HLO.
        Falls back to explicit sliced applies for non-standard critic
        modules (e.g. layer_norm variants)."""
        import flax.linen as nn
        p = stacked_params.get("params", {}).get("mlp")
        # the fast path hand-inlines the forward with relu; take it
        # only when the module's configured activation really IS relu,
        # so a future activation override can't silently diverge from
        # qf.apply (ADVICE r1).
        if (p is not None and not self.qf.layer_norm
                and self.qf.activation is nn.relu):
            x = jnp.concatenate([obs, actions], axis=-1)
            x = jnp.broadcast_to(x, (2,) + x.shape)  # [2, B, D]
            i = 0
            while f"hidden_{i}" in p:
                layer = p[f"hidden_{i}"]
                x = jnp.einsum("ebi,eio->ebo", x, layer["kernel"])
                x = jax.nn.relu(x + layer["bias"][:, None, :])
                i += 1
            out = p["output"]
            return (jnp.einsum("ebi,eio->ebo", x, out["kernel"])
                    + out["bias"][:, None, :])
        qs = [
            self.qf.apply(
                jax.tree.map(lambda x, e=e: x[e], stacked_params),
                obs, actions,
            )
            for e in range(2)
        ]
        return jnp.stack(qs, axis=0)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> SACState:
        kp, kq = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_size))
        act = jnp.zeros((1, self.action_size))
        policy_params = self.policy.init(kp, obs)
        qf_params = jax.vmap(
            lambda k: self.qf.init(k, obs, act)
        )(jax.random.split(kq, 2))
        log_alpha = jnp.asarray(jnp.log(self.config.init_alpha), jnp.float32)
        return SACState(
            policy_params=policy_params,
            qf_params=qf_params,
            target_qf_params=copy_params(qf_params),
            log_alpha=log_alpha,
            policy_opt=self.policy_tx.init(policy_params),
            qf_opt=self.qf_tx.init(qf_params),
            alpha_opt=self.alpha_tx.init(log_alpha),
        )

    # --- acting -------------------------------------------------------
    def acting_state(self, state: SACState) -> SACState:
        """Acting-only slice (policy params) for host-loop snapshots."""
        return state.replace(
            qf_params=None, target_qf_params=None, policy_opt=None,
            qf_opt=None, alpha_opt=None)

    def act(self, state: SACState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        if self.use_pallas_act:
            from ilswiss_tpu.ops.fused_mlp import (
                fused_gaussian_policy_forward,
            )
            mean, log_std = fused_gaussian_policy_forward(
                state.policy_params, obs
            )
        else:
            mean, log_std = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return jnp.tanh(mean)
        action, _ = D.tanh_normal_sample(key, mean, log_std)
        return action

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    # --- fused K-step learning (ops/fused_sac.py) ---------------------
    def train_chain(self, state: SACState, replay, keys: jax.Array,
                    batch_size: int
                    ) -> tuple[SACState, Dict[str, jnp.ndarray]]:
        """K gradient steps in ONE Pallas kernel.  Derives per-step
        sample/noise keys EXACTLY as the unfused path does
        (runtime/loop.py one_grad_step -> train_step), so fused and
        scan-of-train_step runs agree to matmul precision
        (tests/test_fused_sac.py)."""
        from ilswiss_tpu.data.replay import replay_sample
        from ilswiss_tpu.ops.fused_sac import fused_sac_chain

        def derive(key):
            k_samp, k_train = jax.random.split(key)
            k_next, k_new = jax.random.split(k_train)
            return k_samp, k_next, k_new

        k_samp, k_next, k_new = jax.vmap(derive)(keys)
        batches = jax.vmap(
            lambda k: replay_sample(replay, k, batch_size))(k_samp)
        shape = (batch_size, self.action_size)
        eps_next = jax.vmap(
            lambda k: jax.random.normal(k, shape, jnp.float32))(k_next)
        eps_new = jax.vmap(
            lambda k: jax.random.normal(k, shape, jnp.float32))(k_new)
        return fused_sac_chain(self, state, batches, eps_next, eps_new)

    # --- learning -----------------------------------------------------
    def train_step(self, state: SACState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[SACState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"]
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]
        k_next, k_new = jax.random.split(key)

        alpha = jnp.exp(state.log_alpha)  # previous-step alpha

        # --- critic update (sac_alpha.py:96-133) ----------------------
        next_mean, next_log_std = self.policy.apply(
            state.policy_params, next_obs
        )
        next_actions, next_pre = D.tanh_normal_sample(
            k_next, next_mean, next_log_std
        )
        next_log_pi = D.tanh_normal_log_prob(
            next_mean, next_log_std, next_actions, next_pre
        )
        t_q = self.q_apply(state.target_qf_params, next_obs, next_actions)
        min_t_q = jnp.min(t_q, axis=0)
        q_target = jax.lax.stop_gradient(
            rewards
            + (1.0 - terminals) * cfg.discount * (min_t_q - alpha * next_log_pi)
        )
        if cfg.q_target_min is not None or cfg.q_target_max is not None:
            q_target = jnp.clip(
                q_target,
                -jnp.inf if cfg.q_target_min is None else cfg.q_target_min,
                jnp.inf if cfg.q_target_max is None else cfg.q_target_max)

        def qf_loss_fn(qf_params):
            q_pred = self.q_apply(qf_params, obs, actions)  # [2, B, 1]
            per_critic = 0.5 * jnp.mean(
                (q_pred - q_target[None]) ** 2, axis=(1, 2)
            )
            # sum of independent per-critic losses: grads identical to
            # optimizing each critic with its own 0.5*MSE
            return jnp.sum(per_critic), (per_critic, q_pred)

        (_, (qf_losses, q_pred)), gq = jax.value_and_grad(
            qf_loss_fn, has_aux=True)(state.qf_params)
        gq = self._pmean(gq)
        upq, qf_opt = self.qf_tx.update(gq, state.qf_opt, state.qf_params)
        qf_params = optax.apply_updates(state.qf_params, upq)

        # --- policy update against updated critics (:142-155) ---------
        def policy_loss_fn(policy_params):
            mean, log_std = self.policy.apply(policy_params, obs)
            new_actions, pre = D.tanh_normal_sample(k_new, mean, log_std)
            log_pi = D.tanh_normal_log_prob(mean, log_std, new_actions, pre)
            q_new = jnp.min(
                self.q_apply(qf_params, obs, new_actions), axis=0
            )
            loss = jnp.mean(alpha * log_pi - q_new)
            reg = (
                cfg.policy_mean_reg_weight * jnp.mean(mean**2)
                + cfg.policy_std_reg_weight * jnp.mean(log_std**2)
            )
            return loss + reg, log_pi

        (policy_loss, log_pi), gp = jax.value_and_grad(
            policy_loss_fn, has_aux=True)(state.policy_params)
        gp = self._pmean(gp)
        upp, policy_opt = self.policy_tx.update(
            gp, state.policy_opt, state.policy_params
        )
        policy_params = optax.apply_updates(state.policy_params, upp)

        # --- alpha update (:160-166) ----------------------------------
        def alpha_loss_fn(log_alpha):
            target = jax.lax.stop_gradient(log_pi + self.target_entropy)
            return -jnp.mean(log_alpha * target)

        alpha_loss, ga = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        ga = self._pmean(ga)
        if cfg.train_alpha:
            upa, alpha_opt = self.alpha_tx.update(
                ga, state.alpha_opt, state.log_alpha
            )
            log_alpha = optax.apply_updates(state.log_alpha, upa)
            log_alpha = jnp.clip(
                log_alpha,
                jnp.log(cfg.min_alpha), jnp.log(cfg.max_alpha))
        else:
            alpha_opt = state.alpha_opt
            log_alpha = state.log_alpha

        # --- target Polyak (:245-247) ---------------------------------
        target_qf = soft_update(
            state.target_qf_params, qf_params, cfg.soft_target_tau
        )

        metrics = {
            "qf1_loss": qf_losses[0],
            "qf2_loss": qf_losses[1],
            "policy_loss": policy_loss,
            "alpha_loss": alpha_loss,
            "alpha": alpha,
            "q1_pred_mean": jnp.mean(q_pred[0]),
            "q2_pred_mean": jnp.mean(q_pred[1]),
            "log_pi_mean": jnp.mean(log_pi),
        }
        new_state = SACState(
            policy_params=policy_params,
            qf_params=qf_params,
            target_qf_params=target_qf,
            log_alpha=log_alpha,
            policy_opt=policy_opt,
            qf_opt=qf_opt,
            alpha_opt=alpha_opt,
        )
        return new_state, metrics

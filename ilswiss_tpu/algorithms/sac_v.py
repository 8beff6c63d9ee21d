"""SAC, value-function variant (fixed alpha), as a pure grad-step.

Rebuild of the reference's original-SAC trainer
(rlkit/torch/algorithms/sac/sac.py:23-273): twin Q + state-value V with a
target V network and a fixed entropy weight alpha (entropy tuning is the
`sac.SAC` sibling).  Formula parity:
  - Q target: reward_scale * r + (1 - terminal) * gamma * Vbar(s')
    (sac.py:95-103), loss 0.5 * MSE each
  - V target: min(Q1, Q2)(s, a_new) - alpha * log pi  (sac.py:119-130),
    loss 0.5 * MSE; Q/V grads computed against pre-update critics (all
    three backward before any step, sac.py:132-139)
  - policy loss: mean(alpha * log pi - min Q) + mean/std reg
    (sac.py:150-161), against pre-update Qs (outputs reused)
  - Polyak on V only (sac.py:181, target_vf)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.networks import MLP, FlattenMLP
from ilswiss_tpu.models.policies import TanhGaussianPolicy
from ilswiss_tpu.utils.pytree import copy_params, soft_update


@dataclass(frozen=True)
class SACVConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    alpha: float = 1.0
    soft_target_tau: float = 5e-3
    policy_lr: float = 3e-4
    qf_lr: float = 3e-4
    vf_lr: float = 1e-3
    beta_1: float = 0.9
    policy_mean_reg_weight: float = 1e-3
    policy_std_reg_weight: float = 1e-3


@struct.dataclass
class SACVState:
    policy_params: Any
    qf1_params: Any
    qf2_params: Any
    vf_params: Any
    target_vf_params: Any
    policy_opt: Any
    qf1_opt: Any
    qf2_opt: Any
    vf_opt: Any


class SACV:
    def __init__(self, obs_size: int, action_size: int,
                 config: SACVConfig = SACVConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.policy = TanhGaussianPolicy(
            action_dim=action_size, hidden_sizes=hidden
        )
        self.qf = FlattenMLP(hidden_sizes=hidden, output_size=1)
        self.vf = MLP(hidden_sizes=hidden, output_size=1)
        adam = lambda lr: optax.adam(lr, b1=config.beta_1, b2=0.999)
        self.policy_tx = adam(config.policy_lr)
        self.qf_tx = adam(config.qf_lr)
        self.vf_tx = adam(config.vf_lr)

    def init(self, key: jax.Array) -> SACVState:
        kp, kq1, kq2, kv = jax.random.split(key, 4)
        obs = jnp.zeros((1, self.obs_size))
        act = jnp.zeros((1, self.action_size))
        policy_params = self.policy.init(kp, obs)
        qf1_params = self.qf.init(kq1, obs, act)
        qf2_params = self.qf.init(kq2, obs, act)
        vf_params = self.vf.init(kv, obs)
        return SACVState(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            vf_params=vf_params,
            target_vf_params=copy_params(vf_params),
            policy_opt=self.policy_tx.init(policy_params),
            qf1_opt=self.qf_tx.init(qf1_params),
            qf2_opt=self.qf_tx.init(qf2_params),
            vf_opt=self.vf_tx.init(vf_params),
        )

    def act(self, state: SACVState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        mean, log_std = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return jnp.tanh(mean)
        action, _ = D.tanh_normal_sample(key, mean, log_std)
        return action

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    def train_step(self, state: SACVState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[SACVState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"]
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]

        # shared policy forward at obs (sac.py:122-127)
        mean, log_std = self.policy.apply(state.policy_params, obs)
        new_actions, pre = D.tanh_normal_sample(key, mean, log_std)
        log_pi = D.tanh_normal_log_prob(mean, log_std, new_actions, pre)

        # --- Q losses against target V (sac.py:91-103) ----------------
        target_v = self.vf.apply(state.target_vf_params, next_obs)
        q_target = jax.lax.stop_gradient(
            rewards + (1.0 - terminals) * cfg.discount * target_v
        )

        def qf_loss_fn(params):
            return 0.5 * jnp.mean(
                (self.qf.apply(params, obs, actions) - q_target) ** 2
            )

        qf1_loss, g1 = jax.value_and_grad(qf_loss_fn)(state.qf1_params)
        qf2_loss, g2 = jax.value_and_grad(qf_loss_fn)(state.qf2_params)

        # --- V loss against pre-update Qs (sac.py:119-130) ------------
        q_new = jnp.minimum(
            self.qf.apply(state.qf1_params, obs,
                          jax.lax.stop_gradient(new_actions)),
            self.qf.apply(state.qf2_params, obs,
                          jax.lax.stop_gradient(new_actions)),
        )
        v_target = jax.lax.stop_gradient(
            q_new - cfg.alpha * jax.lax.stop_gradient(log_pi)
        )

        def vf_loss_fn(params):
            return 0.5 * jnp.mean(
                (self.vf.apply(params, obs) - v_target) ** 2
            )

        vf_loss, gv = jax.value_and_grad(vf_loss_fn)(state.vf_params)

        # --- policy loss against pre-update Qs (sac.py:150-161) -------
        def policy_loss_fn(params):
            p_mean, p_log_std = self.policy.apply(params, obs)
            acts, p_pre = D.tanh_normal_sample(key, p_mean, p_log_std)
            lp = D.tanh_normal_log_prob(p_mean, p_log_std, acts, p_pre)
            q = jnp.minimum(
                self.qf.apply(state.qf1_params, obs, acts),
                self.qf.apply(state.qf2_params, obs, acts),
            )
            loss = jnp.mean(cfg.alpha * lp - q)
            reg = (
                cfg.policy_mean_reg_weight * jnp.mean(p_mean**2)
                + cfg.policy_std_reg_weight * jnp.mean(p_log_std**2)
            )
            return loss + reg

        policy_loss, gp = jax.value_and_grad(policy_loss_fn)(
            state.policy_params
        )

        g1, g2, gv, gp = map(self._pmean, (g1, g2, gv, gp))
        up1, qf1_opt = self.qf_tx.update(g1, state.qf1_opt, state.qf1_params)
        up2, qf2_opt = self.qf_tx.update(g2, state.qf2_opt, state.qf2_params)
        upv, vf_opt = self.vf_tx.update(gv, state.vf_opt, state.vf_params)
        upp, policy_opt = self.policy_tx.update(
            gp, state.policy_opt, state.policy_params
        )
        qf1_params = optax.apply_updates(state.qf1_params, up1)
        qf2_params = optax.apply_updates(state.qf2_params, up2)
        vf_params = optax.apply_updates(state.vf_params, upv)
        policy_params = optax.apply_updates(state.policy_params, upp)

        metrics = {
            "qf1_loss": qf1_loss,
            "qf2_loss": qf2_loss,
            "vf_loss": vf_loss,
            "policy_loss": policy_loss,
            "log_pi_mean": jnp.mean(log_pi),
        }
        return SACVState(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            vf_params=vf_params,
            target_vf_params=soft_update(
                state.target_vf_params, vf_params, cfg.soft_target_tau
            ),
            policy_opt=policy_opt,
            qf1_opt=qf1_opt,
            qf2_opt=qf2_opt,
            vf_opt=vf_opt,
        ), metrics

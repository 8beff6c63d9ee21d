"""DDPG as a pure grad-step.

Rebuild of the reference DDPG trainer
(rlkit/torch/algorithms/ddpg/ddpg.py:16-288).  Core math (ddpg.py:102-175):
  - policy loss: -mean(Q(s, policy(s)))
  - q_target = r + (1 - terminal) * gamma * Qbar(s', policy_bar(s')),
    clamped to [min_q_value, max_q_value], MSE loss
  - target update: soft Polyak every step, or hard copy every
    `target_update_period` steps (the reference's use_soft_update switch)
The reference's optional residual-gradient / pre-activation extras are
rarely-used research knobs and intentionally out of scope.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models.networks import FlattenMLP
from ilswiss_tpu.models.policies import GaussianNoisePolicy, noisy_action
from ilswiss_tpu.utils.pytree import copy_params, soft_update


@dataclass(frozen=True)
class DDPGConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    policy_lr: float = 1e-4
    qf_lr: float = 1e-3
    soft_target_tau: float = 1e-2
    use_soft_update: bool = True
    target_update_period: int = 1000
    min_q_value: float = -jnp.inf
    max_q_value: float = jnp.inf
    exploration_noise: float = 0.1


@struct.dataclass
class DDPGState:
    policy_params: Any
    qf_params: Any
    target_policy_params: Any
    target_qf_params: Any
    policy_opt: Any
    qf_opt: Any
    n_train_steps: jnp.ndarray


class DDPG:
    def __init__(self, obs_size: int, action_size: int,
                 config: DDPGConfig = DDPGConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.policy = GaussianNoisePolicy(
            action_dim=action_size, hidden_sizes=hidden
        )
        self.qf = FlattenMLP(hidden_sizes=hidden, output_size=1)
        self.policy_tx = optax.adam(config.policy_lr)
        self.qf_tx = optax.adam(config.qf_lr)

    def init(self, key: jax.Array) -> DDPGState:
        kp, kq = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_size))
        act = jnp.zeros((1, self.action_size))
        policy_params = self.policy.init(kp, obs)
        qf_params = self.qf.init(kq, obs, act)
        return DDPGState(
            policy_params=policy_params,
            qf_params=qf_params,
            target_policy_params=copy_params(policy_params),
            target_qf_params=copy_params(qf_params),
            policy_opt=self.policy_tx.init(policy_params),
            qf_opt=self.qf_tx.init(qf_params),
            n_train_steps=jnp.zeros((), jnp.int32),
        )

    def act(self, state: DDPGState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        action = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return action
        return noisy_action(action, key, self.config.exploration_noise)

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    def train_step(self, state: DDPGState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[DDPGState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"]
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]

        next_actions = self.policy.apply(state.target_policy_params, next_obs)
        target_q = self.qf.apply(
            state.target_qf_params, next_obs, next_actions
        )
        q_target = jnp.clip(
            jax.lax.stop_gradient(
                rewards + (1.0 - terminals) * cfg.discount * target_q
            ),
            cfg.min_q_value, cfg.max_q_value,
        )

        def qf_loss_fn(params):
            return jnp.mean((self.qf.apply(params, obs, actions) - q_target) ** 2)

        qf_loss, gq = jax.value_and_grad(qf_loss_fn)(state.qf_params)

        def policy_loss_fn(params):
            pa = self.policy.apply(params, obs)
            return -jnp.mean(self.qf.apply(state.qf_params, obs, pa))

        policy_loss, gp = jax.value_and_grad(policy_loss_fn)(
            state.policy_params
        )

        gq, gp = self._pmean(gq), self._pmean(gp)
        upq, qf_opt = self.qf_tx.update(gq, state.qf_opt, state.qf_params)
        upp, policy_opt = self.policy_tx.update(
            gp, state.policy_opt, state.policy_params
        )
        qf_params = optax.apply_updates(state.qf_params, upq)
        policy_params = optax.apply_updates(state.policy_params, upp)

        n = state.n_train_steps + 1
        if cfg.use_soft_update:
            t_policy = soft_update(
                state.target_policy_params, policy_params, cfg.soft_target_tau
            )
            t_qf = soft_update(
                state.target_qf_params, qf_params, cfg.soft_target_tau
            )
        else:
            do_hard = (n % cfg.target_update_period) == 0
            t_policy = jax.tree.map(
                lambda t, o: jnp.where(do_hard, o, t),
                state.target_policy_params, policy_params,
            )
            t_qf = jax.tree.map(
                lambda t, o: jnp.where(do_hard, o, t),
                state.target_qf_params, qf_params,
            )

        metrics = {
            "qf_loss": qf_loss,
            "policy_loss": policy_loss,
            "q_target_mean": jnp.mean(q_target),
        }
        return DDPGState(
            policy_params=policy_params,
            qf_params=qf_params,
            target_policy_params=t_policy,
            target_qf_params=t_qf,
            policy_opt=policy_opt,
            qf_opt=qf_opt,
            n_train_steps=n,
        ), metrics

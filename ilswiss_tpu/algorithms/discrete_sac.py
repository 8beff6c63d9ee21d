"""Discrete-action SAC as a pure grad-step.

Rebuild of the reference discrete SAC trainer
(rlkit/torch/algorithms/discrete_sac/discrete_sac.py:13-213).  Critics map
obs -> Q-vector over actions; expectations over the categorical policy
replace sampling.  Formula parity (discrete_sac.py:62-150):
  - soft value: V(s') = sum_a pi(a|s') min(Q1bar, Q2bar)(s', a)
                 + alpha * H(pi(.|s'))
  - q_target = reward_scale * r + (1 - terminal) * gamma * V(s'),
    loss 0.5 * MSE on the gathered Q(s, a)
  - policy loss: -mean(alpha * H(pi) + sum_a pi(a) * stop_grad(min Q))
  - Polyak both critics every step
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.networks import MLP
from ilswiss_tpu.models.policies import CategoricalPolicy
from ilswiss_tpu.utils.pytree import copy_params, soft_update


@dataclass(frozen=True)
class DiscreteSACConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    alpha: float = 1.0
    soft_target_tau: float = 1e-2
    policy_lr: float = 1e-3
    qf_lr: float = 1e-3
    beta_1: float = 0.9


@struct.dataclass
class DiscreteSACState:
    policy_params: Any
    qf1_params: Any
    qf2_params: Any
    target_qf1_params: Any
    target_qf2_params: Any
    policy_opt: Any
    qf1_opt: Any
    qf2_opt: Any


class DiscreteSAC:
    def __init__(self, obs_size: int, num_actions: int,
                 config: DiscreteSACConfig = DiscreteSACConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        self.config = config
        self.obs_size = obs_size
        self.num_actions = num_actions
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.policy = CategoricalPolicy(
            num_actions=num_actions, hidden_sizes=hidden
        )
        self.qf = MLP(hidden_sizes=hidden, output_size=num_actions)
        adam = lambda lr: optax.adam(lr, b1=config.beta_1, b2=0.999)
        self.policy_tx = adam(config.policy_lr)
        self.qf_tx = adam(config.qf_lr)

    def init(self, key: jax.Array) -> DiscreteSACState:
        kp, kq1, kq2 = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_size))
        policy_params = self.policy.init(kp, obs)
        qf1_params = self.qf.init(kq1, obs)
        qf2_params = self.qf.init(kq2, obs)
        return DiscreteSACState(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            target_qf1_params=copy_params(qf1_params),
            target_qf2_params=copy_params(qf2_params),
            policy_opt=self.policy_tx.init(policy_params),
            qf1_opt=self.qf_tx.init(qf1_params),
            qf2_opt=self.qf_tx.init(qf2_params),
        )

    def act(self, state: DiscreteSACState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        logits = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return jnp.argmax(logits, axis=-1)
        return D.categorical_sample(key, logits)

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    def train_step(self, state: DiscreteSACState,
                   batch: Dict[str, jnp.ndarray], key: jax.Array
                   ) -> tuple[DiscreteSACState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"].astype(jnp.int32)
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]

        # --- soft value of next state (discrete_sac.py:85-95) ---------
        next_logp = jax.nn.log_softmax(
            self.policy.apply(state.policy_params, next_obs), axis=-1
        )
        next_p = jnp.exp(next_logp)
        min_t_q = jnp.minimum(
            self.qf.apply(state.target_qf1_params, next_obs),
            self.qf.apply(state.target_qf2_params, next_obs),
        )
        next_entropy = -jnp.sum(next_p * next_logp, axis=-1, keepdims=True)
        target_v = (
            jnp.sum(next_p * min_t_q, axis=-1, keepdims=True)
            + cfg.alpha * next_entropy
        )
        q_target = jax.lax.stop_gradient(
            rewards + (1.0 - terminals) * cfg.discount * target_v
        )

        def qf_loss_fn(params):
            q_all = self.qf.apply(params, obs)
            q_pred = jnp.take_along_axis(q_all, actions[:, None], axis=-1)
            return 0.5 * jnp.mean((q_pred - q_target) ** 2)

        qf1_loss, g1 = jax.value_and_grad(qf_loss_fn)(state.qf1_params)
        qf2_loss, g2 = jax.value_and_grad(qf_loss_fn)(state.qf2_params)
        g1, g2 = self._pmean(g1), self._pmean(g2)
        up1, qf1_opt = self.qf_tx.update(g1, state.qf1_opt, state.qf1_params)
        up2, qf2_opt = self.qf_tx.update(g2, state.qf2_opt, state.qf2_params)
        qf1_params = optax.apply_updates(state.qf1_params, up1)
        qf2_params = optax.apply_updates(state.qf2_params, up2)

        # --- policy (discrete_sac.py:113-135, pre-update Qs detached) -
        current_q = jax.lax.stop_gradient(jnp.minimum(
            self.qf.apply(state.qf1_params, obs),
            self.qf.apply(state.qf2_params, obs),
        ))

        def policy_loss_fn(params):
            logp = jax.nn.log_softmax(self.policy.apply(params, obs), axis=-1)
            p = jnp.exp(logp)
            entropy = -jnp.sum(p * logp, axis=-1)
            value = jnp.sum(p * current_q, axis=-1)
            return -jnp.mean(cfg.alpha * entropy + value)

        policy_loss, gp = jax.value_and_grad(policy_loss_fn)(
            state.policy_params
        )
        gp = self._pmean(gp)
        upp, policy_opt = self.policy_tx.update(
            gp, state.policy_opt, state.policy_params
        )
        policy_params = optax.apply_updates(state.policy_params, upp)

        metrics = {
            "qf1_loss": qf1_loss,
            "qf2_loss": qf2_loss,
            "policy_loss": policy_loss,
        }
        return DiscreteSACState(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            target_qf1_params=soft_update(
                state.target_qf1_params, qf1_params, cfg.soft_target_tau
            ),
            target_qf2_params=soft_update(
                state.target_qf2_params, qf2_params, cfg.soft_target_tau
            ),
            policy_opt=policy_opt,
            qf1_opt=qf1_opt,
            qf2_opt=qf2_opt,
        ), metrics

"""Twin Delayed DDPG (TD3) as a pure grad-step.

Rebuild of the reference TD3 trainer (rlkit/torch/algorithms/td3/td3.py).
Formula parity (td3.py:72-124):
  - target actions: a' = clip(target_policy(s') + clip(N(0, sigma_t),
    +-noise_clip), -1, 1) — the reference folds this into its
    MlpGaussianNoisePolicy forward (policies.py:182-186)
  - q_target = reward_scale * r + (1 - terminal) * gamma *
               min(Q1bar, Q2bar)(s', a')     (clipped double Q)
  - critic loss: plain MSE (not the 0.5x of SAC)
  - delayed policy + target updates every `policy_and_target_update_period`
    steps (td3.py:113-124) — here a `lax.cond` on an int32 step counter,
    keeping the whole trainer jittable
  - policy loss: -mean(Q1(s, policy(s)))

Exploration noise (the reference puts it in the exploration policy, not
the trainer) lives in `act`: a = clip(policy(s) + N(0, sigma), -1, 1).
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
class TD3Config:
    discount: float = 0.99
    reward_scale: float = 1.0
    soft_target_tau: float = 5e-3
    policy_lr: float = 1e-3
    qf_lr: float = 1e-3
    target_policy_noise: float = 0.2
    target_policy_noise_clip: float = 0.5
    policy_and_target_update_period: int = 2
    exploration_noise: float = 0.1
    # > 0 enables the HER-TD3 explorer (reference
    # MlpGaussianAndEpsilonPolicy): epsilon-probability whole-batch
    # uniform actions + Gaussian sigma = exploration_noise otherwise
    exploration_epsilon: float = 0.0
    # HER-TD3 clips targets into [-1/(1-gamma), 0] for sparse negative
    # rewards (reference her/td3.py:79-86)
    q_target_min: float = -jnp.inf
    q_target_max: float = jnp.inf


@struct.dataclass
class TD3State:
    policy_params: Any
    qf1_params: Any
    qf2_params: Any
    target_policy_params: Any
    target_qf1_params: Any
    target_qf2_params: Any
    policy_opt: Any
    qf1_opt: Any
    qf2_opt: Any
    n_train_steps: jnp.ndarray


class TD3:
    def __init__(self, obs_size: int, action_size: int,
                 config: TD3Config = TD3Config(),
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

    def init(self, key: jax.Array) -> TD3State:
        kp, kq1, kq2 = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_size))
        act = jnp.zeros((1, self.action_size))
        policy_params = self.policy.init(kp, obs)
        qf1_params = self.qf.init(kq1, obs, act)
        qf2_params = self.qf.init(kq2, obs, act)
        return TD3State(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            target_policy_params=copy_params(policy_params),
            target_qf1_params=copy_params(qf1_params),
            target_qf2_params=copy_params(qf2_params),
            policy_opt=self.policy_tx.init(policy_params),
            qf1_opt=self.qf_tx.init(qf1_params),
            qf2_opt=self.qf_tx.init(qf2_params),
            n_train_steps=jnp.zeros((), jnp.int32),
        )

    def act(self, state: TD3State, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        action = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return action
        if self.config.exploration_epsilon > 0.0:
            from ilswiss_tpu.exploration.strategies import (
                gaussian_and_epsilon,
            )
            return gaussian_and_epsilon(
                action, key,
                epsilon=self.config.exploration_epsilon,
                sigma=self.config.exploration_noise,
            )
        return noisy_action(action, key, self.config.exploration_noise)

    def _pmean(self, g):
        if self.axis_name is not None:
            return jax.lax.pmean(g, self.axis_name)
        return g

    def train_step(self, state: TD3State, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[TD3State, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"]
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]

        # --- critics (td3.py:81-110) ----------------------------------
        target_actions = noisy_action(
            self.policy.apply(state.target_policy_params, next_obs),
            key, cfg.target_policy_noise, cfg.target_policy_noise_clip,
        )
        min_t_q = jnp.minimum(
            self.qf.apply(state.target_qf1_params, next_obs, target_actions),
            self.qf.apply(state.target_qf2_params, next_obs, target_actions),
        )
        q_target = jax.lax.stop_gradient(jnp.clip(
            rewards + (1.0 - terminals) * cfg.discount * min_t_q,
            cfg.q_target_min, cfg.q_target_max,
        ))

        def qf_loss_fn(params):
            return jnp.mean((self.qf.apply(params, obs, actions) - q_target) ** 2)

        qf1_loss, g1 = jax.value_and_grad(qf_loss_fn)(state.qf1_params)
        qf2_loss, g2 = jax.value_and_grad(qf_loss_fn)(state.qf2_params)
        g1, g2 = self._pmean(g1), self._pmean(g2)
        up1, qf1_opt = self.qf_tx.update(g1, state.qf1_opt, state.qf1_params)
        up2, qf2_opt = self.qf_tx.update(g2, state.qf2_opt, state.qf2_params)
        qf1_params = optax.apply_updates(state.qf1_params, up1)
        qf2_params = optax.apply_updates(state.qf2_params, up2)

        # --- delayed policy + target update (td3.py:113-124) ----------
        def policy_loss_fn(params):
            pa = self.policy.apply(params, obs)
            return -jnp.mean(self.qf.apply(qf1_params, obs, pa))

        policy_loss, gp = jax.value_and_grad(policy_loss_fn)(
            state.policy_params
        )
        gp = self._pmean(gp)

        def do_update(_):
            up, opt = self.policy_tx.update(
                gp, state.policy_opt, state.policy_params
            )
            new_policy = optax.apply_updates(state.policy_params, up)
            return (
                new_policy, opt,
                soft_update(state.target_policy_params, new_policy,
                            cfg.soft_target_tau),
                soft_update(state.target_qf1_params, qf1_params,
                            cfg.soft_target_tau),
                soft_update(state.target_qf2_params, qf2_params,
                            cfg.soft_target_tau),
            )

        def skip_update(_):
            return (
                state.policy_params, state.policy_opt,
                state.target_policy_params,
                state.target_qf1_params, state.target_qf2_params,
            )

        (policy_params, policy_opt, t_policy, t_qf1, t_qf2) = jax.lax.cond(
            state.n_train_steps % cfg.policy_and_target_update_period == 0,
            do_update, skip_update, None,
        )

        metrics = {
            "qf1_loss": qf1_loss,
            "qf2_loss": qf2_loss,
            "policy_loss": policy_loss,
            "q_target_mean": jnp.mean(q_target),
        }
        return TD3State(
            policy_params=policy_params,
            qf1_params=qf1_params,
            qf2_params=qf2_params,
            target_policy_params=t_policy,
            target_qf1_params=t_qf1,
            target_qf2_params=t_qf2,
            policy_opt=policy_opt,
            qf1_opt=qf1_opt,
            qf2_opt=qf2_opt,
            n_train_steps=state.n_train_steps + 1,
        ), metrics

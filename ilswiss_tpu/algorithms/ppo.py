"""PPO (clipped surrogate) as a pure rollout-update.

Rebuild of the reference PPO trainer (rlkit/torch/algorithms/ppo/ppo.py).
The reference fetches whole trajectories host-side, runs a reversed
Python GAE loop per trajectory (ppo.py:57-100), then `update_epoch`
passes of shuffled torch minibatches (ppo.py:114-170).  Here the rollout
is a fixed [T, B] device array; GAE is a reversed `lax.scan`; the
minibatch passes are a nested scan over a random permutation — the whole
update is one jitted program.

Formula parity (ppo.py):
  - GAE with gae_tau (:77-83); the reference zero-bootstraps at every
    trajectory end (prev_value = 0, no timeout handling); we bootstrap
    through truncations/rollout cuts with V(s') by default
    (`zero_bootstrap_at_done=True` restores exact reference semantics)
  - advantage normalization (:86) — reference normalizes per trajectory;
    with masked fixed-T rollouts we normalize globally
  - clipped surrogate ratio with clip_eps (:155-164)
  - value loss MSE, optional value clip (:137-143), L2 penalty on vf
    params (value_l2_reg * sum w^2, :147-148)
  - policy grad-norm clip 20 (:169)
  - fixed (old) log-probs recomputed from the rollout policy (:111)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.data.rollout import gae, normalize_advantages
from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.networks import MLP
from ilswiss_tpu.models.policies import GaussianPolicy
from ilswiss_tpu.utils.pytree import tree_size


@dataclass(frozen=True)
class PPOConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    gae_tau: float = 0.9
    clip_eps: float = 0.2
    policy_lr: float = 3e-4
    value_lr: float = 3e-4
    value_l2_reg: float = 1e-3
    use_value_clip: bool = False
    update_epoch: int = 10
    mini_batch_size: int = 64
    policy_grad_clip: float = 20.0
    zero_bootstrap_at_done: bool = False
    state_dependent_std: bool = False


@struct.dataclass
class PPOState:
    policy_params: Any
    vf_params: Any
    policy_opt: Any
    vf_opt: Any


class PPO:
    on_policy = True

    def __init__(self, obs_size: int, action_size: int,
                 config: PPOConfig = PPOConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.policy = GaussianPolicy(
            action_dim=action_size, hidden_sizes=hidden,
            state_dependent_std=config.state_dependent_std,
        )
        self.vf = MLP(hidden_sizes=hidden, output_size=1)
        self.policy_tx = optax.chain(
            optax.clip_by_global_norm(config.policy_grad_clip),
            optax.adam(config.policy_lr),
        )
        self.vf_tx = optax.adam(config.value_lr)

    def init(self, key: jax.Array) -> PPOState:
        kp, kv = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_size))
        policy_params = self.policy.init(kp, obs)
        vf_params = self.vf.init(kv, obs)
        return PPOState(
            policy_params=policy_params,
            vf_params=vf_params,
            policy_opt=self.policy_tx.init(policy_params),
            vf_opt=self.vf_tx.init(vf_params),
        )

    def act(self, state: PPOState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        mean, log_std = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return mean
        return D.normal_sample(key, mean, log_std)

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    # ------------------------------------------------------------------
    def train_step(self, state: PPOState, rollout: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[PPOState, Dict[str, jnp.ndarray]]:
        """rollout fields, each [T, B, ...]:
        obs, action, reward, terminal, done, plus last_obs [B, ...]."""
        cfg = self.config
        T, B = rollout["reward"].shape

        obs = rollout["obs"]
        actions = rollout["action"]
        rewards = cfg.reward_scale * rollout["reward"]

        values = self.vf.apply(state.vf_params, obs)[..., 0]       # [T, B]
        last_values = self.vf.apply(
            state.vf_params, rollout["last_obs"]
        )[..., 0]                                                  # [B]
        if cfg.zero_bootstrap_at_done:
            terminals = rollout["done"].astype(jnp.float32)
            last_values = jnp.zeros_like(last_values)
        else:
            terminals = rollout["terminal"].astype(jnp.float32)
        dones = rollout["done"].astype(jnp.float32)

        advantages, returns = gae(
            rewards, values, last_values, terminals, dones,
            cfg.discount, cfg.gae_tau,
        )
        advantages = normalize_advantages(advantages)

        # old log-probs under the rollout policy (ppo.py:111)
        old_mean, old_log_std = self.policy.apply(state.policy_params, obs)
        fixed_logp = D.normal_log_prob(old_mean, old_log_std, actions)[..., 0]

        # flatten [T*B]
        flat = {
            "obs": obs.reshape(T * B, -1),
            "action": actions.reshape(T * B, -1),
            "return": returns.reshape(T * B),
            "adv": advantages.reshape(T * B),
            "fixed_logp": jax.lax.stop_gradient(fixed_logp.reshape(T * B)),
            "fixed_v": jax.lax.stop_gradient(values.reshape(T * B)),
        }
        N = T * B
        mb = cfg.mini_batch_size
        n_mb = max(1, N // mb)
        usable = n_mb * mb  # drop the ragged tail like torch .split would pad

        def minibatch_update(carry, idx):
            policy_params, vf_params, policy_opt, vf_opt = carry
            batch = {k: v[idx] for k, v in flat.items()}

            def vf_loss_fn(params):
                v_pred = self.vf.apply(params, batch["obs"])[..., 0]
                if cfg.use_value_clip:
                    v_clip = batch["fixed_v"] + jnp.clip(
                        v_pred - batch["fixed_v"], -cfg.clip_eps, cfg.clip_eps
                    )
                    loss = jnp.mean(jnp.maximum(
                        (v_pred - batch["return"]) ** 2,
                        (v_clip - batch["return"]) ** 2,
                    ))
                else:
                    loss = jnp.mean((v_pred - batch["return"]) ** 2)
                l2 = sum(
                    jnp.sum(p**2) for p in jax.tree.leaves(params)
                )
                return loss + cfg.value_l2_reg * l2

            vf_loss, gv = jax.value_and_grad(vf_loss_fn)(vf_params)
            gv = self._pmean(gv)
            upv, vf_opt = self.vf_tx.update(gv, vf_opt, vf_params)
            vf_params = optax.apply_updates(vf_params, upv)

            def pg_loss_fn(params):
                mean, log_std = self.policy.apply(params, batch["obs"])
                logp = D.normal_log_prob(mean, log_std, batch["action"])[..., 0]
                ratio = jnp.exp(logp - batch["fixed_logp"])
                surr1 = ratio * batch["adv"]
                surr2 = jnp.clip(
                    ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps
                ) * batch["adv"]
                return -jnp.mean(jnp.minimum(surr1, surr2))

            pg_loss, gp = jax.value_and_grad(pg_loss_fn)(policy_params)
            gp = self._pmean(gp)
            upp, policy_opt = self.policy_tx.update(
                gp, policy_opt, policy_params
            )
            policy_params = optax.apply_updates(policy_params, upp)
            return (policy_params, vf_params, policy_opt, vf_opt), {
                "vf_loss": vf_loss, "pg_loss": pg_loss,
            }

        def one_pass(carry, k):
            perm = jax.random.permutation(k, N)[:usable].reshape(n_mb, mb)
            return jax.lax.scan(minibatch_update, carry, perm)

        keys = jax.random.split(key, cfg.update_epoch)
        carry = (state.policy_params, state.vf_params,
                 state.policy_opt, state.vf_opt)
        (policy_params, vf_params, policy_opt, vf_opt), metrics = (
            jax.lax.scan(one_pass, carry, keys)
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["adv_mean_abs"] = jnp.mean(jnp.abs(advantages))
        metrics["value_mean"] = jnp.mean(values)
        return PPOState(
            policy_params=policy_params,
            vf_params=vf_params,
            policy_opt=policy_opt,
            vf_opt=vf_opt,
        ), metrics

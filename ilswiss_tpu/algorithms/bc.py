"""Behavior cloning as a pure grad-step.

Rebuild of the reference BC algorithm (rlkit/torch/algorithms/bc/bc.py):
a tanh-Gaussian policy fit to an expert buffer with either
  - MLE: loss = -mean log pi(a_expert | s)  (bc.py:92-98; log-prob via
    the atanh fallback of the tanh-Normal), or
  - MSE: loss = mean_i sum_a (a_sampled - a_expert)^2  (bc.py:99-104;
    the reference regresses the *sampled* reparameterized action).
The training loop samples only the expert buffer (bc.py:42-49); DAgger
subclasses this with on-policy relabeling (dagger.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models import distributions as D
from ilswiss_tpu.models.policies import TanhGaussianPolicy


@dataclass(frozen=True)
class BCConfig:
    mode: str = "MLE"  # 'MLE' | 'MSE'
    lr: float = 1e-3
    momentum: float = 0.9


@struct.dataclass
class BCState:
    policy_params: Any
    policy_opt: Any


class BC:
    def __init__(self, obs_size: int, action_size: int,
                 config: BCConfig = BCConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        assert config.mode in ("MLE", "MSE"), config.mode
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.policy = TanhGaussianPolicy(
            action_dim=action_size, hidden_sizes=hidden
        )
        self.tx = optax.adam(config.lr, b1=config.momentum, b2=0.999)

    def init(self, key: jax.Array) -> BCState:
        params = self.policy.init(key, jnp.zeros((1, self.obs_size)))
        return BCState(policy_params=params, policy_opt=self.tx.init(params))

    def act(self, state: BCState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        mean, log_std = self.policy.apply(state.policy_params, obs)
        if deterministic:
            return jnp.tanh(mean)
        action, _ = D.tanh_normal_sample(key, mean, log_std)
        return action

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    def train_step(self, state: BCState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[BCState, Dict[str, jnp.ndarray]]:
        obs = batch["obs"]
        acts = batch["action"]

        def loss_fn(params):
            mean, log_std = self.policy.apply(params, obs)
            if self.config.mode == "MLE":
                logp = D.tanh_normal_log_prob(mean, log_std, acts)
                return -jnp.mean(logp)
            action, _ = D.tanh_normal_sample(key, mean, log_std)
            return jnp.mean(jnp.sum((action - acts) ** 2, axis=-1))

        loss, g = jax.value_and_grad(loss_fn)(state.policy_params)
        g = self._pmean(g)
        up, opt = self.tx.update(g, state.policy_opt, state.policy_params)
        return BCState(
            policy_params=optax.apply_updates(state.policy_params, up),
            policy_opt=opt,
        ), {"bc_loss": loss}

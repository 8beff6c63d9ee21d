"""DQN / Double DQN as a pure grad-step.

Rebuild of the reference DQN family (rlkit/torch/algorithms/dqn/ —
bit-rotted in the reference, SURVEY.md §5.9, so this is a clean
implementation of the same capability): Q-network over discrete actions,
epsilon-greedy exploration with linear decay, hard target copy every
`target_update_period` steps, optional Double-DQN action selection
(argmax from the online net, value from the target net).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ilswiss_tpu.models.networks import MLP
from ilswiss_tpu.utils.pytree import copy_params


@dataclass(frozen=True)
class DQNConfig:
    discount: float = 0.99
    reward_scale: float = 1.0
    qf_lr: float = 1e-3
    target_update_period: int = 500
    double_dqn: bool = True
    epsilon_start: float = 1.0
    epsilon_end: float = 0.05
    epsilon_decay_steps: int = 50_000


@struct.dataclass
class DQNState:
    qf_params: Any
    target_qf_params: Any
    qf_opt: Any
    n_train_steps: jnp.ndarray
    n_act_steps: jnp.ndarray


class DQN:
    def __init__(self, obs_size: int, num_actions: int,
                 config: DQNConfig = DQNConfig(),
                 net_size: int = 256, num_hidden_layers: int = 2,
                 axis_name: str | None = None):
        self.config = config
        self.obs_size = obs_size
        self.num_actions = num_actions
        self.axis_name = axis_name
        hidden = (net_size,) * num_hidden_layers
        self.qf = MLP(hidden_sizes=hidden, output_size=num_actions)
        self.qf_tx = optax.adam(config.qf_lr)

    def init(self, key: jax.Array) -> DQNState:
        qf_params = self.qf.init(key, jnp.zeros((1, self.obs_size)))
        return DQNState(
            qf_params=qf_params,
            target_qf_params=copy_params(qf_params),
            qf_opt=self.qf_tx.init(qf_params),
            n_train_steps=jnp.zeros((), jnp.int32),
            n_act_steps=jnp.zeros((), jnp.int32),
        )

    def epsilon(self, state: DQNState) -> jnp.ndarray:
        cfg = self.config
        frac = jnp.clip(
            state.n_act_steps.astype(jnp.float32) / cfg.epsilon_decay_steps,
            0.0, 1.0,
        )
        return cfg.epsilon_start + frac * (cfg.epsilon_end - cfg.epsilon_start)

    def act(self, state: DQNState, obs: jnp.ndarray, key: jax.Array,
            deterministic: bool = False) -> jnp.ndarray:
        q = self.qf.apply(state.qf_params, obs)
        greedy = jnp.argmax(q, axis=-1)
        if deterministic:
            return greedy
        k_eps, k_rand = jax.random.split(key)
        rand = jax.random.randint(
            k_rand, greedy.shape, 0, self.num_actions
        )
        explore = jax.random.uniform(k_eps, greedy.shape) < self.epsilon(state)
        return jnp.where(explore, rand, greedy)

    def _pmean(self, g):
        return g if self.axis_name is None else jax.lax.pmean(g, self.axis_name)

    def train_step(self, state: DQNState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> tuple[DQNState, Dict[str, jnp.ndarray]]:
        cfg = self.config
        obs = batch["obs"]
        actions = batch["action"].astype(jnp.int32)
        rewards = cfg.reward_scale * batch["reward"][:, None]
        terminals = batch["terminal"][:, None]
        next_obs = batch["next_obs"]

        target_q_all = self.qf.apply(state.target_qf_params, next_obs)
        if cfg.double_dqn:
            online_next = self.qf.apply(state.qf_params, next_obs)
            best = jnp.argmax(online_next, axis=-1)
            next_q = jnp.take_along_axis(
                target_q_all, best[:, None], axis=-1
            )
        else:
            next_q = jnp.max(target_q_all, axis=-1, keepdims=True)
        q_target = jax.lax.stop_gradient(
            rewards + (1.0 - terminals) * cfg.discount * next_q
        )

        def qf_loss_fn(params):
            q_all = self.qf.apply(params, obs)
            q_pred = jnp.take_along_axis(q_all, actions[:, None], axis=-1)
            return jnp.mean((q_pred - q_target) ** 2), jnp.mean(q_pred)

        (qf_loss, q_pred_mean), g = jax.value_and_grad(
            qf_loss_fn, has_aux=True)(state.qf_params)
        g = self._pmean(g)
        up, qf_opt = self.qf_tx.update(g, state.qf_opt, state.qf_params)
        qf_params = optax.apply_updates(state.qf_params, up)

        n = state.n_train_steps + 1
        do_hard = (n % cfg.target_update_period) == 0
        target_qf = jax.tree.map(
            lambda t, o: jnp.where(do_hard, o, t),
            state.target_qf_params, qf_params,
        )

        metrics = {
            "qf_loss": qf_loss,
            "q_pred_mean": q_pred_mean,
            "epsilon": self.epsilon(state),
        }
        return DQNState(
            qf_params=qf_params,
            target_qf_params=target_qf,
            qf_opt=qf_opt,
            n_train_steps=n,
            # count acting steps via train calls at ratio 1 by default;
            # the loop bumps this through `note_env_steps` when ratios differ
            n_act_steps=state.n_act_steps + 1,
        ), metrics

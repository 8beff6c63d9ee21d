"""Ensemble dynamics-model trainer with holdout early stopping.

Rebuild of the reference BNNTrainer
(rlkit/torch/algorithms/mbpo/bnn_trainer.py).  The inner epoch (minibatch
sweep over per-net bootstrap index matrices, bnn_trainer.py:122-155) is
one jitted scan; the early-stopping loop (data-dependent, runs rarely —
once per model_train_freq env steps) stays host-side as SURVEY.md §7.3.4
prescribes.  Formula parity:
  - NLL loss per net: mean((mu - y)^2 / var) + mean(logvar)
    (bnn_trainer.py:71-82), plus logvar-bound regularizer
    0.01 * mean(max_lv) - 0.01 * mean(min_lv) (:146-150)
  - per-layer L2 weight decay [2.5e-5, 5e-5, 7.5e-5..., 1e-4]
    (:40-47, torch param-group weight_decay == 2*coef L2-in-loss)
  - per-net best-snapshot on >1% holdout improvement, restore at end
    (:245-272) — snapshots are ensemble-axis `where` selects
  - elite selection: num_elites lowest holdout MSE (:199-203)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ilswiss_tpu.models.bnn import BNN, InputNormalizer, fit_input_normalizer


@dataclass(frozen=True)
class BNNTrainerConfig:
    num_nets: int = 7
    num_elites: int = 5
    hidden_sizes: tuple = (200, 200, 200, 200)
    lr: float = 1e-3
    batch_size: int = 256
    max_epochs: int | None = None
    max_epochs_since_update: int = 5
    max_grad_steps: int | None = None
    holdout_ratio: float = 0.2
    max_holdout: int = 5000
    reward_scale: float = 1.0


@struct.dataclass
class BNNState:
    params: Any
    opt_state: Any
    normalizer: InputNormalizer
    elites: jnp.ndarray          # [num_elites] int32
    holdout_mse: jnp.ndarray     # [num_nets]


class BNNTrainer:
    def __init__(self, obs_size: int, action_size: int,
                 config: BNNTrainerConfig = BNNTrainerConfig()):
        self.config = config
        self.obs_size = obs_size
        self.action_size = action_size
        self.input_dim = obs_size + action_size
        self.target_dim = 1 + obs_size
        self.model = BNN(
            hidden_sizes=config.hidden_sizes,
            target_size=self.target_dim,
            num_nets=config.num_nets,
        )
        n_hidden = len(config.hidden_sizes)
        self.layer_decays = (
            [2.5e-5, 5e-5] + [7.5e-5] * (n_hidden - 2) + [1e-4]
            if n_hidden > 2 else [2.5e-5, 1e-4]
        )
        self.tx = optax.adam(config.lr)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> BNNState:
        params = self.model.init(
            key, jnp.zeros((2, self.input_dim))
        )
        return BNNState(
            params=params,
            opt_state=self.tx.init(params),
            normalizer=InputNormalizer(
                mean=jnp.zeros((1, self.input_dim)),
                std=jnp.ones((1, self.input_dim)),
            ),
            elites=jnp.arange(self.config.num_elites, dtype=jnp.int32),
            holdout_mse=jnp.full((self.config.num_nets,), jnp.inf),
        )

    # ------------------------------------------------------------------
    def _forward(self, params, normalizer: InputNormalizer, x):
        return self.model.apply(params, normalizer(x))

    def _nll(self, params, normalizer, inputs, targets,
             add_var_loss: bool) -> jnp.ndarray:
        """Per-net loss [E]; inputs [E?, B, in], targets [E?, B, tgt]."""
        mean, logvar = self._forward(params, normalizer, inputs)
        if targets.ndim == 2:
            targets = targets[None]
        if add_var_loss:
            inv_var = jnp.exp(-logvar)
            loss = jnp.mean((mean - targets) ** 2 * inv_var, axis=(-2, -1))
            loss = loss + jnp.mean(logvar, axis=(-2, -1))
        else:
            loss = jnp.mean((mean - targets) ** 2, axis=(-2, -1))
        return loss

    def _l2_penalty(self, params) -> jnp.ndarray:
        p = params["params"]
        total = 0.0
        names = [f"fc{i}" for i in range(len(self.config.hidden_sizes))]
        names.append("last_fc")
        for name, wd in zip(names, self.layer_decays):
            layer = p[name]
            total = total + 0.5 * wd * (
                jnp.sum(layer["kernel"] ** 2) + jnp.sum(layer["bias"] ** 2)
            )
        return total

    # ------------------------------------------------------------------
    def _epoch_fn(self, params, opt_state, normalizer, inputs, targets,
                  idxs):
        """One bootstrap-epoch sweep; idxs [E, N_train] (pre-shuffled)."""
        cfg = self.config
        n = idxs.shape[1]
        n_batches = n // cfg.batch_size  # drop ragged tail

        def minibatch(carry, b):
            params, opt_state = carry
            batch_idx = jax.lax.dynamic_slice_in_dim(
                idxs, b * cfg.batch_size, cfg.batch_size, axis=1
            )  # [E, B]
            batch_inp = inputs[batch_idx]    # [E, B, in]
            batch_tgt = targets[batch_idx]   # [E, B, tgt]

            def loss_fn(params):
                nll = jnp.mean(self._nll(
                    params, normalizer, batch_inp, batch_tgt,
                    add_var_loss=True,
                ))
                p = params["params"]
                bound_reg = (
                    0.01 * jnp.mean(p["max_log_var"])
                    - 0.01 * jnp.mean(p["min_log_var"])
                )
                return nll + bound_reg + self._l2_penalty(params)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = self.tx.update(g, opt_state, params)
            params = optax.apply_updates(params, up)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(n_batches)
        )
        return params, opt_state, jnp.mean(losses)

    # ------------------------------------------------------------------
    def train(self, state: BNNState, data: Dict[str, jnp.ndarray],
              key: jax.Array, log=None) -> Tuple[BNNState, Dict[str, float]]:
        """Fit the ensemble on the full real buffer (reference
        train_step, bnn_trainer.py:84-227).  Host-orchestrated."""
        cfg = self.config
        obs = data["obs"]
        inputs = jnp.concatenate([obs, data["action"]], axis=-1)
        targets = jnp.concatenate([
            cfg.reward_scale * data["reward"][:, None],
            data["next_obs"] - obs,
        ], axis=-1)
        n_total = int(inputs.shape[0])

        k_perm, k_boot, k_shuf = jax.random.split(key, 3)
        num_holdout = min(int(n_total * cfg.holdout_ratio), cfg.max_holdout)
        perm = jax.random.permutation(k_perm, n_total)
        ho_inputs = inputs[perm[:num_holdout]]
        ho_targets = targets[perm[:num_holdout]]
        tr_inputs = inputs[perm[num_holdout:]]
        tr_targets = targets[perm[num_holdout:]]
        n_train = n_total - num_holdout

        normalizer = fit_input_normalizer(tr_inputs)

        idxs = jax.random.randint(
            k_boot, (cfg.num_nets, n_train), 0, n_train
        )

        epoch_fn = jax.jit(partial(self._epoch_fn))
        holdout_fn = jax.jit(
            lambda p: self._nll(p, normalizer, ho_inputs, ho_targets,
                                add_var_loss=False)
        )

        params, opt_state = state.params, state.opt_state
        best_params = params
        best_mse = np.full((cfg.num_nets,), 1e10)
        epochs_since_update = 0
        grad_steps = 0
        epoch = 0
        rng = np.random.default_rng(int(jax.device_get(k_shuf)[0]))
        train_loss = float("nan")

        while True:
            # shuffle each net's bootstrap row (bnn_trainer.py:157,_shuffle_rows)
            idxs = jnp.asarray(
                np.take_along_axis(
                    np.asarray(idxs),
                    rng.permuted(
                        np.broadcast_to(np.arange(n_train),
                                        (cfg.num_nets, n_train)).copy(),
                        axis=1,
                    ),
                    axis=1,
                )
            )
            params, opt_state, train_loss = epoch_fn(
                params, opt_state, normalizer, tr_inputs, tr_targets, idxs
            )
            grad_steps += n_train // cfg.batch_size
            holdout = np.asarray(jax.device_get(holdout_fn(params)))

            # per-net best snapshot on >1% improvement (:257-272)
            improved = (best_mse - holdout) / best_mse > 0.01
            if improved.any():
                sel = jnp.asarray(improved)

                def select(best_leaf, cur_leaf):
                    if best_leaf.ndim >= 1 and (
                            best_leaf.shape[0] == cfg.num_nets):
                        mask = sel.reshape(
                            (-1,) + (1,) * (best_leaf.ndim - 1))
                        return jnp.where(mask, cur_leaf, best_leaf)
                    # shared params (logvar bounds are [1, tgt]):
                    return cur_leaf
                best_params = jax.tree.map(select, best_params, params)
                best_mse = np.where(improved, holdout, best_mse)
                epochs_since_update = 0
            else:
                epochs_since_update += 1

            epoch += 1
            if log and epoch % 10 == 0:
                log(f"BNN epoch {epoch}: train {float(train_loss):.4f} "
                    f"holdout {holdout.mean():.4f}")
            if epochs_since_update > cfg.max_epochs_since_update:
                break
            if cfg.max_epochs and epoch >= cfg.max_epochs:
                break
            if cfg.max_grad_steps and grad_steps >= cfg.max_grad_steps:
                break

        final_holdout = np.asarray(
            jax.device_get(holdout_fn(best_params)))
        elite_idx = np.argsort(final_holdout)[: cfg.num_elites]

        new_state = BNNState(
            params=best_params,
            opt_state=opt_state,
            normalizer=normalizer,
            elites=jnp.asarray(elite_idx, jnp.int32),
            holdout_mse=jnp.asarray(final_holdout),
        )
        stats = {
            "bnn_epochs": epoch,
            "bnn_train_loss": float(train_loss),
            "bnn_holdout_mse": float(
                np.mean(np.sort(final_holdout)[: cfg.num_elites])),
        }
        return new_state, stats

    # ------------------------------------------------------------------
    def predict_factored(self, state: BNNState, obs, act):
        """(means, vars) per net, with delta->absolute obs correction
        (reference fake_env.py:37-40)."""
        inputs = jnp.concatenate([obs, act], axis=-1)
        mean, logvar = self._forward(state.params, state.normalizer, inputs)
        mean = mean.at[..., 1:].add(obs[None])
        return mean, jnp.exp(logvar)

"""Sequence and image discriminators for adversarial IL.

Rebuild of the reference's trajectory/visual disc models
(rlkit/torch/algorithms/adv_irl/disc_models/rnn_disc_models.py and the
CNN variant): `RNNDisc` scores whole trajectories with a GRU/LSTM over
per-step (obs, action) features; `CNNDisc` scores image observations
with a conv stack.  Both emit clamped scalar logits like `MLPDisc`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class RNNDisc(nn.Module):
    """[B, T, feat] trajectory windows -> [B, T, 1] per-step logits.

    Matches the reference's shape contract (rnn_disc_models.py:71-86:
    input linear -> stacked GRU/LSTM, optionally bidirectional -> per-
    step scalar logit, clamped).  Per-step logits make the disc usable
    both for trajectory-level BCE (mean over steps) and per-transition
    reward synthesis.

    cell_type: 'gru' | 'lstm'; `num_layers` stacked recurrences;
    `bidirectional` concatenates a reversed pass (reference default).
    """

    hid_dim: int = 100
    cell_type: str = "gru"
    num_layers: int = 2
    bidirectional: bool = True
    clamp_magnitude: float = 10.0

    def _cell(self, name):
        return (
            nn.GRUCell(features=self.hid_dim, name=name)
            if self.cell_type == "gru"
            else nn.OptimizedLSTMCell(features=self.hid_dim, name=name)
        )

    @nn.compact
    def __call__(self, traj: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hid_dim, name="embed")(traj))
        for layer in range(self.num_layers):
            fwd = nn.RNN(self._cell(f"cell_f{layer}"),
                         name=f"rnn_f{layer}")(x)
            if self.bidirectional:
                bwd = nn.RNN(self._cell(f"cell_b{layer}"),
                             name=f"rnn_b{layer}",
                             reverse=True, keep_order=True)(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        logits = nn.Dense(1, name="logit")(x)    # [B, T, 1]
        return jnp.clip(logits, -self.clamp_magnitude, self.clamp_magnitude)


class CNNDisc(nn.Module):
    """[B, H, W, C] image observations -> [B, 1] logits (visual IL)."""

    num_filters: int = 32
    num_layers: int = 3
    hid_dim: int = 128
    clamp_magnitude: float = 10.0

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        x = imgs.astype(jnp.float32)
        x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)
        for i in range(self.num_layers):
            stride = 2 if i == 0 else 1
            x = nn.relu(nn.Conv(
                self.num_filters, (3, 3), strides=(stride, stride),
                padding="VALID", name=f"conv{i}")(x))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hid_dim, name="fc")(x))
        logits = nn.Dense(1, name="logit")(x)
        return jnp.clip(logits, -self.clamp_magnitude, self.clamp_magnitude)

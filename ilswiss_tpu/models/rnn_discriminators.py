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
    """[B, T, feat] trajectories -> [B, 1] logits via a recurrent core.

    cell_type: 'gru' | 'lstm' (reference supports both).
    """

    hid_dim: int = 128
    cell_type: str = "gru"
    clamp_magnitude: float = 10.0

    @nn.compact
    def __call__(self, traj: jnp.ndarray) -> jnp.ndarray:
        cell = (
            nn.GRUCell(features=self.hid_dim, name="cell")
            if self.cell_type == "gru"
            else nn.OptimizedLSTMCell(features=self.hid_dim, name="cell")
        )
        rnn = nn.RNN(cell, name="rnn")
        hs = rnn(traj)                       # [B, T, hid]
        last = hs[:, -1, :]
        x = nn.relu(nn.Dense(self.hid_dim, name="head")(last))
        logits = nn.Dense(1, name="logit")(x)
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

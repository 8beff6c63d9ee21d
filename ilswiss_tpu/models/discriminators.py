"""Adversarial-IL discriminators.

Rebuild of the reference disc zoo
(rlkit/torch/algorithms/adv_irl/disc_models/simple_disc_models.py and
resnet/rnn/cnn variants).  `MLPDisc` matches the reference architecture
(simple_disc_models.py:8-48): Linear -> [BatchNorm] -> act blocks with a
final scalar logit clamped to +-clamp_magnitude.

BatchNorm is stateful: callers thread a `batch_stats` collection through
`apply(..., mutable=["batch_stats"])` during disc training and use
`use_running_average=True` (the reference's `.eval()` switch,
adv_irl.py:268-274) when synthesizing policy rewards.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def resolve_act(hid_act: str):
    """relu/tanh only, like the reference (simple_disc_models.py:14-19);
    unknown names raise instead of silently mapping to tanh (ADVICE r1)."""
    if hid_act == "relu":
        return nn.relu
    if hid_act == "tanh":
        return jnp.tanh
    raise NotImplementedError(f"unknown disc activation: {hid_act!r}")


class MLPDisc(nn.Module):
    num_layer_blocks: int = 2
    hid_dim: int = 100
    hid_act: str = "relu"
    use_bn: bool = True
    clamp_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        act = resolve_act(self.hid_act)
        for i in range(self.num_layer_blocks):
            x = nn.Dense(self.hid_dim, name=f"dense_{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, name=f"bn_{i}"
                )(x)
            x = act(x)
        x = nn.Dense(1, name="logit")(x)
        return jnp.clip(x, -self.clamp_magnitude, self.clamp_magnitude)


class CNNDisc(nn.Module):
    """Visual-IL discriminator (reference CNNDisc,
    adv_irl/disc_models/cnn_disc_models.py:7-77): a small conv trunk
    over the image observation (stride-2 first layer, stride-1 blocks
    after, like the reference / pixel encoder), flattened and
    concatenated with an optional action vector, then
    Dense -> LayerNorm -> act blocks to a clamped scalar logit.

    Images are NHWC here (TPU-native layout; the reference is NCHW).
    """

    num_filters: int = 32
    num_layer_blocks: int = 2
    hid_dim: int = 100
    hid_act: str = "relu"
    use_bn: bool = False
    clamp_magnitude: float = 10.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray, vec: jnp.ndarray | None = None,
                 train: bool = True) -> jnp.ndarray:
        act = resolve_act(self.hid_act)
        x = nn.Conv(self.num_filters, (3, 3), strides=2,
                    padding="VALID", name="conv_0")(obs)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             name="bn_0")(x)
        x = act(x)
        for i in range(self.num_layer_blocks - 1):
            x = nn.Conv(self.num_filters, (3, 3), strides=1,
                        padding="VALID", name=f"conv_{i + 1}")(x)
            x = act(x)
        x = x.reshape(x.shape[0], -1)
        if vec is not None:
            x = jnp.concatenate([x, vec], axis=-1)
        for i in range(self.num_layer_blocks):
            x = nn.Dense(self.hid_dim, name=f"dense_{i}")(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = act(x)
        x = nn.Dense(1, name="logit")(x)
        return jnp.clip(x, -self.clamp_magnitude, self.clamp_magnitude)


class ResNetAIRLDisc(nn.Module):
    """Residual MLP disc (reference `ResNetAIRLDisc`,
    simple_disc_models.py:51+): dense blocks with skip connections."""

    num_layer_blocks: int = 2
    hid_dim: int = 100
    hid_act: str = "tanh"
    use_bn: bool = False
    clamp_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        act = resolve_act(self.hid_act)
        x = nn.Dense(self.hid_dim, name="embed")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, name="bn_in")(x)
        x = act(x)
        for i in range(self.num_layer_blocks):
            h = nn.Dense(self.hid_dim, name=f"res_{i}_a")(x)
            if self.use_bn:
                h = nn.BatchNorm(
                    use_running_average=not train, name=f"res_{i}_bn"
                )(h)
            h = act(h)
            x = x + h
        x = nn.Dense(1, name="logit")(x)
        return jnp.clip(x, -self.clamp_magnitude, self.clamp_magnitude)

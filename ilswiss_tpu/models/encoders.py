"""Pixel encoder/decoder for visual RL (SAC-AE / RAD / CURL).

Rebuild of the reference conv stacks (rlkit/torch/common/encoders.py):
`PixelEncoder` (:36-112) is conv(stride 2) -> (num_layers-1) x
conv(stride 1), kernel 3, ReLU, then fc -> LayerNorm -> tanh (or raw
logits); `PixelDecoder` (:132-177) mirrors it with transposed convs.
Inputs are NHWC (JAX convention; the reference is NCHW) and uint8
images are normalized to [0, 1] in the encoder, like the reference's
`obs / 255.` branch (encoders.py:77-78).

Weight tying between actor/critic encoders
(`copy_conv_weights_from`, :108-112) is unnecessary here: SAC-AE keeps
ONE encoder params tree shared by reference, with stop-gradients
choosing who updates it (see algorithms/sac_ae.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class PixelEncoder(nn.Module):
    feature_dim: int = 50
    num_layers: int = 4
    num_filters: int = 32
    output_logits: bool = False
    # conv compute dtype: bf16 runs the 3x3 stacks on the MXU at ~4x
    # the f32 rate (params stay f32; fc/LayerNorm stay f32).  The f32
    # option is kept for strict-parity runs.
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        """obs [B, H, W, C] uint8 or float in [0, 1] -> [B, feature]."""
        x = obs.astype(jnp.float32)
        x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)
        x = x.astype(self.compute_dtype)
        x = nn.relu(nn.Conv(self.num_filters, (3, 3), strides=(2, 2),
                            padding="VALID", name="conv0",
                            dtype=self.compute_dtype)(x))
        for i in range(1, self.num_layers):
            x = nn.relu(nn.Conv(self.num_filters, (3, 3), strides=(1, 1),
                                padding="VALID", name=f"conv{i}",
                                dtype=self.compute_dtype)(x))
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.Dense(self.feature_dim, name="fc")(x)
        x = nn.LayerNorm(name="ln")(x)
        if self.output_logits:
            return x
        return jnp.tanh(x)


class PixelDecoder(nn.Module):
    out_hw: int          # conv output spatial dim (e.g. 25 for 64px/4layers)
    channels: int        # output image channels
    num_layers: int = 4
    num_filters: int = 32
    out_size: int | None = None  # final image size (pads the stride-2
    # deconv's 1px shortfall — torch's output_padding=1,
    # reference encoders.py:155-157)

    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(
            self.num_filters * self.out_hw * self.out_hw, name="fc")(h))
        x = x.reshape((-1, self.out_hw, self.out_hw, self.num_filters))
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.ConvTranspose(
                self.num_filters, (3, 3), strides=(1, 1),
                padding="VALID", name=f"deconv{i}",
                dtype=self.compute_dtype)(x))
        x = nn.ConvTranspose(
            self.channels, (3, 3), strides=(2, 2), padding="VALID",
            name="deconv_out", dtype=self.compute_dtype)(x)
        x = x.astype(jnp.float32)
        if self.out_size is not None and x.shape[1] < self.out_size:
            extra = self.out_size - x.shape[1]
            x = jnp.pad(x, ((0, 0), (0, extra), (0, extra), (0, 0)),
                        mode="edge")
        return x


def conv_out_dim(in_hw: int, num_layers: int) -> int:
    """Spatial size after the encoder's conv stack (VALID padding,
    stride 2 then 1s) — the reference's OUT_DIM tables
    (encoders.py:12-17) computed instead of hardcoded."""
    d = (in_hw - 3) // 2 + 1
    for _ in range(num_layers - 1):
        d = d - 2
    return d

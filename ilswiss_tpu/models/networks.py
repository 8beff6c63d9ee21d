"""Core network modules (flax.linen).

TPU-native model zoo base, replacing the reference's torch `Mlp` family
(rlkit/torch/common/networks.py:23-146).  Initialization matches the
reference so learning curves are comparable at the formula level:
hidden layers use fan-in uniform init (reference `fanin_init`,
rlkit/torch/utils/pytorch_util.py:20-29) with bias 0.1 (networks.py:60),
and the output layer is U(-init_w, init_w) for both kernel and bias
(networks.py:65-67, init_w=3e-3).

All matmuls run in float32 on the MXU with `preferred_element_type`
left to XLA's default f32 accumulation; these are MLP-scale models, so
keeping batch dims large (the vmapped env batch) is what feeds the MXU.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def fanin_uniform() -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def small_uniform(scale: float = 3e-3) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class MLP(nn.Module):
    """ReLU MLP with reference-matching init.

    Equivalent of reference `Mlp` (networks.py:23-105); layer-norm /
    batch-norm variants are expressed with the `layer_norm` flag (the
    reference's `layer_norm` option at networks.py:47-52).
    """

    hidden_sizes: Sequence[int]
    output_size: int
    activation: Callable = nn.relu
    output_activation: Callable | None = None
    layer_norm: bool = False
    init_w: float = 3e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(
                h,
                kernel_init=fanin_uniform(),
                bias_init=nn.initializers.constant(0.1),
                name=f"hidden_{i}",
            )(x)
            if self.layer_norm:
                x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = self.activation(x)
        x = nn.Dense(
            self.output_size,
            kernel_init=small_uniform(self.init_w),
            bias_init=small_uniform(self.init_w),
            name="output",
        )(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


class FlattenMLP(nn.Module):
    """MLP over concatenated inputs — Q(s, a) critics.

    Equivalent of reference `FlattenMlp` (networks.py:108-115).
    """

    hidden_sizes: Sequence[int]
    output_size: int
    activation: Callable = nn.relu
    layer_norm: bool = False

    @nn.compact
    def __call__(self, *inputs: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate(inputs, axis=-1)
        return MLP(
            hidden_sizes=self.hidden_sizes,
            output_size=self.output_size,
            activation=self.activation,
            layer_norm=self.layer_norm,
            name="mlp",
        )(x)

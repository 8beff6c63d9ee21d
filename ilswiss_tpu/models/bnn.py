"""Probabilistic ensemble dynamics model (PETS/MBPO-style BNN).

Rebuild of the reference ensemble model
(rlkit/torch/common/networks.py:149-287): `EnsembleLinear` is a single
einsum over an [E, in, out] weight tensor (networks.py:162-171) — already
ensemble-shaped, so the whole E-net forward is one batched MXU matmul
chain; no vmap needed.  The head predicts mean and log-variance of
(reward, delta_obs) with learnable soft bounds
(networks.py:255-263):
    logvar = max_lv - softplus(max_lv - raw)
    logvar = min_lv + softplus(logvar - min_lv)
Input normalization uses fixed moments fitted at each model-training
round (reference FixedNormalizer, networks.py:237 + bnn_trainer
:117-123) — carried alongside params, not inside them.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


@struct.dataclass
class InputNormalizer:
    mean: jnp.ndarray  # [1, in_dim]
    std: jnp.ndarray   # [1, in_dim]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.std


def fit_input_normalizer(inputs: jnp.ndarray) -> InputNormalizer:
    """bnn_trainer.py:117-123: std floor at ~0 -> 1."""
    mean = jnp.mean(inputs, axis=0, keepdims=True)
    std = jnp.std(inputs, axis=0, keepdims=True)
    std = jnp.where(std < 1e-12, 1.0, std)
    return InputNormalizer(mean=mean, std=std)


class EnsembleDense(nn.Module):
    """[E, in, out] linear over inputs [E, B, in] (or broadcast [B, in])."""

    features: int
    ensemble_size: int
    kernel_init_fn: str = "fanin"  # 'fanin' | 'uniform_small'
    init_w: float = 3e-3
    bias_init_value: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]

        def kernel_init(key, shape, dtype=jnp.float32):
            if self.kernel_init_fn == "fanin":
                bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
                return jax.random.uniform(key, shape, dtype, -bound, bound)
            return jax.random.uniform(
                key, shape, dtype, -self.init_w, self.init_w
            )

        def bias_init(key, shape, dtype=jnp.float32):
            if self.kernel_init_fn == "fanin":
                return jnp.full(shape, self.bias_init_value, dtype)
            return jax.random.uniform(
                key, shape, dtype, -self.init_w, self.init_w
            )

        kernel = self.param(
            "kernel", kernel_init,
            (self.ensemble_size, in_dim, self.features),
        )
        bias = self.param(
            "bias", bias_init, (self.ensemble_size, 1, self.features)
        )
        if x.ndim == 2:
            # shared input broadcast to all nets (networks.py:164-165)
            return jnp.einsum(
                "bi,eio->ebo", x, kernel,
                preferred_element_type=jnp.float32,
            ) + bias
        return jnp.einsum(
            "ebi,eio->ebo", x, kernel,
            preferred_element_type=jnp.float32,
        ) + bias


class BNN(nn.Module):
    """Ensemble Gaussian dynamics model: input [E?, B, obs+act] ->
    (mean, logvar) each [E, B, 1 + obs] (reward first, then delta-obs)."""

    hidden_sizes: Sequence[int]
    target_size: int  # 1 + obs_size
    num_nets: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = x
        for i, size in enumerate(self.hidden_sizes):
            h = EnsembleDense(
                features=size, ensemble_size=self.num_nets,
                kernel_init_fn="fanin", name=f"fc{i}",
            )(h)
            h = nn.silu(h)
        pre = EnsembleDense(
            features=2 * self.target_size, ensemble_size=self.num_nets,
            kernel_init_fn="uniform_small", name="last_fc",
        )(h)
        mean = pre[..., : self.target_size]
        raw_logvar = pre[..., self.target_size:]

        max_lv = self.param(
            "max_log_var",
            lambda k, s: jnp.full(s, 0.5), (1, self.target_size),
        )
        min_lv = self.param(
            "min_log_var",
            lambda k, s: jnp.full(s, -10.0), (1, self.target_size),
        )
        logvar = max_lv - jax.nn.softplus(max_lv - raw_logvar)
        logvar = min_lv + jax.nn.softplus(logvar - min_lv)
        return mean, logvar

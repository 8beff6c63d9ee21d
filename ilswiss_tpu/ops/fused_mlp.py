"""Pallas TPU kernel: fully-fused Gaussian-policy MLP forward.

The acting path of the fused loop runs a small MLP (obs -> hidden ->
hidden -> mean/log_std heads) every env step.  At RL scales (batch
~10^2-10^3, width 64-256) each layer is a tiny matmul, so the XLA
program is dominated by per-op dispatch and HBM round-trips between
layers rather than FLOPs.  This kernel keeps every weight and activation
in VMEM and computes the entire trunk + both heads + the log-std clamp
in ONE kernel launch: HBM traffic is exactly "read obs, read weights,
write mean/log_std".

Weight budget: a 256-wide 2-hidden-layer policy is ~0.3 MB of f32 —
far under the ~16 MB VMEM ceiling, so no blocking is needed; the grid
tiles only the batch dimension.

This is the inference path (acting/eval); training still uses the flax
apply so autodiff stays on the XLA path.  Numerics match
`TanhGaussianPolicy.__call__` exactly (see tests/test_pallas_ops.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilswiss_tpu.models.distributions import LOG_SIG_MAX, LOG_SIG_MIN


def _policy_kernel(num_hidden: int):
    """Kernel body for `num_hidden` trunk layers + 2 heads."""

    def kernel(*refs):
        # refs: obs, (W_i, b_i) * num_hidden, Wm, bm, Ws, bs,
        #       out_mean, out_log_std
        obs_ref = refs[0]
        w_refs = refs[1:1 + 2 * num_hidden]
        wm_ref, bm_ref, ws_ref, bs_ref = refs[
            1 + 2 * num_hidden: 5 + 2 * num_hidden]
        mean_ref, log_std_ref = refs[5 + 2 * num_hidden:]

        h = obs_ref[:]
        for i in range(num_hidden):
            w = w_refs[2 * i][:]
            b = w_refs[2 * i + 1][:]
            h = jnp.maximum(
                jnp.dot(h, w, preferred_element_type=jnp.float32) + b,
                0.0,
            )
        mean_ref[:] = (
            jnp.dot(h, wm_ref[:], preferred_element_type=jnp.float32)
            + bm_ref[:]
        )
        log_std_ref[:] = jnp.clip(
            jnp.dot(h, ws_ref[:], preferred_element_type=jnp.float32)
            + bs_ref[:],
            LOG_SIG_MIN, LOG_SIG_MAX,
        )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def fused_gaussian_policy_forward(params, obs: jnp.ndarray,
                                  interpret: bool = False):
    """(mean, clamped log_std) for a TanhGaussianPolicy params tree.

    `params` is the flax variables dict of
    `models.policies.TanhGaussianPolicy` (state-dependent std).
    """
    p = params["params"]
    hidden_names = sorted(
        (k for k in p if k.startswith("hidden_")),
        key=lambda k: int(k.split("_")[1]),
    )
    num_hidden = len(hidden_names)
    action_dim = p["mean"]["kernel"].shape[1]
    batch = obs.shape[0]

    inputs = [obs]
    for name in hidden_names:
        inputs.append(p[name]["kernel"])
        inputs.append(p[name]["bias"][None, :])   # 2-D for TPU layout
    inputs += [
        p["mean"]["kernel"], p["mean"]["bias"][None, :],
        p["log_std"]["kernel"], p["log_std"]["bias"][None, :],
    ]

    out_shape = [
        jax.ShapeDtypeStruct((batch, action_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, action_dim), jnp.float32),
    ]
    mean, log_std = pl.pallas_call(
        _policy_kernel(num_hidden),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(*inputs)
    return mean, log_std

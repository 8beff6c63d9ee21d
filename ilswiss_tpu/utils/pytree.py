"""Pytree utilities.

TPU-native equivalent of the reference's device/param helpers
(`rlkit/torch/utils/pytorch_util.py`): Polyak averaging is a `tree_map` lerp
over param pytrees rather than an in-place `.data.copy_` loop
(reference pytorch_util.py:10-12), and "copying a network" is just aliasing
the params pytree (reference relies on Serializable ctor capture,
rlkit/torch/core.py:32-35).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_update(target_params, online_params, tau: float):
    """Polyak update: target <- (1 - tau) * target + tau * online.

    Matches reference `soft_update_from_to` (pytorch_util.py:10-12).
    """
    return jax.tree.map(
        lambda t, o: t * (1.0 - tau) + o * tau, target_params, online_params
    )


def copy_params(params):
    """Fresh copy of a params pytree (target-network init)."""
    return jax.tree.map(jnp.array, params)


def tree_size(tree) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(x.size for x in jax.tree.leaves(tree))

"""Running statistics as pure pytree functions.

TPU-native equivalent of the reference's three normalizers
(`rlkit/data_management/normalizer.py`):
  - `Normalizer` (:8-64, Welford-ish with sums) and
  - `RunningMeanStd` (:128-152, batch-parallel moment merge, used for
    vec-env obs normalization at rlkit/envs/vecenvs.py:102-107,299-327)
collapse into one batched-moment-merge update that is `psum`-mergeable
across a device mesh: each shard updates from its local batch and the
merge rule is associative, so cross-chip moments are exact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar float


def running_mean_std_init(shape, dtype=jnp.float32, eps: float = 1e-4) -> RunningMeanStd:
    return RunningMeanStd(
        mean=jnp.zeros(shape, dtype),
        var=jnp.ones(shape, dtype),
        count=jnp.asarray(eps, dtype),
    )


def running_mean_std_update(rms: RunningMeanStd, batch: jnp.ndarray,
                            axis_name: str | None = None) -> RunningMeanStd:
    """Merge a batch of rows [B, ...shape] into the running moments.

    Parallel-variance merge (Chan et al.), matching the reference
    `RunningMeanStd.update` (normalizer.py:135-152).  If `axis_name` is
    given, the batch moments are first averaged across that mesh axis with
    `pmean` so every shard holds identical global statistics.
    """
    batch = batch.reshape((-1,) + rms.mean.shape)
    batch_mean = jnp.mean(batch, axis=0)
    batch_var = jnp.var(batch, axis=0)
    batch_count = jnp.asarray(batch.shape[0], rms.count.dtype)
    if axis_name is not None:
        # Reconstruct global E[x^2] from local (var, mean), then recenter
        # on the global mean (equal per-shard counts).
        global_sq = jax.lax.pmean(batch_var + batch_mean**2, axis_name)
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
        batch_var = global_sq - batch_mean**2
        batch_count = batch_count * jax.lax.psum(
            jnp.ones((), rms.count.dtype), axis_name
        )

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * (batch_count / tot)
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * (rms.count * batch_count / tot)
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def normalize(rms: RunningMeanStd, x: jnp.ndarray, clip: float | None = 10.0,
              eps: float = 1e-8) -> jnp.ndarray:
    """Matches reference `BaseVectorEnv.normalize_obs` (vecenvs.py:299-315)."""
    y = (x - rms.mean) / jnp.sqrt(rms.var + eps)
    if clip is not None:
        y = jnp.clip(y, -clip, clip)
    return y


def unnormalize(rms: RunningMeanStd, y: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse map (vecenvs.py:317-327); round-trips with `normalize` for
    unclipped values — this is the property the reference's only test checks
    (tests/test_obs_norm.py)."""
    return y * jnp.sqrt(rms.var + eps) + rms.mean


def tree_normalize(rms_tree: Any, x_tree: Any, clip: float | None = 10.0) -> Any:
    """Normalize a dict-obs pytree with a matching pytree of RunningMeanStd."""
    return jax.tree.map(
        lambda rms, x: normalize(rms, x, clip),
        rms_tree, x_tree,
        is_leaf=lambda n: isinstance(n, RunningMeanStd),
    )

"""Running-moment merge vs numpy, incl. the round-trip property the
reference's only test checks (tests/test_obs_norm.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.utils.running_stats import (
    normalize, running_mean_std_init, running_mean_std_update, unnormalize,
)


def test_moments_match_numpy():
    rng = np.random.RandomState(0)
    rms = running_mean_std_init((5,))
    chunks = [rng.randn(64, 5).astype(np.float32) * 3 + 1 for _ in range(10)]
    for c in chunks:
        rms = running_mean_std_update(rms, jnp.array(c))
    allx = np.concatenate(chunks)
    np.testing.assert_allclose(rms.mean, allx.mean(0), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(rms.var, allx.var(0), rtol=1e-2, atol=1e-2)


def test_normalize_unnormalize_roundtrip():
    rng = np.random.RandomState(1)
    rms = running_mean_std_init((3,))
    rms = running_mean_std_update(rms, jnp.array(rng.randn(256, 3)))
    x = jnp.array(rng.randn(16, 3).astype(np.float32))
    y = normalize(rms, x, clip=None)
    np.testing.assert_allclose(unnormalize(rms, y), x, rtol=1e-4, atol=1e-4)


def test_pmean_merge_across_devices():
    # Same stats on every shard after a sharded update (8 CPU devices).
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("env",))
    rng = np.random.RandomState(2)
    batch = rng.randn(8 * 32, 4).astype(np.float32) * 2 + 5

    rms = running_mean_std_init((4,))

    def update_shard(rms, x):
        return running_mean_std_update(rms, x, axis_name="env")

    f = shard_map(
        update_shard, mesh=mesh,
        in_specs=(P(), P("env")), out_specs=P(),
    )
    out = f(rms, jnp.array(batch))
    np.testing.assert_allclose(out.mean, batch.mean(0), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.var, batch.var(0), rtol=1e-2, atol=1e-2)

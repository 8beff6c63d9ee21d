"""Parity of the Pallas batched PGS kernel against the XLA sweep loop.

The kernel (ops/pgs_pallas.py) must produce the same row forces as the
engine's original per-env Gauss-Seidel loop — same sweep/row order, same
projection and masking — so swapping it in cannot change trajectories
beyond float re-association.  Run here in Pallas interpret mode on the CPU
backend; the real-chip path is exercised by the TPU queue probe jobs.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ilswiss_tpu.ops import pgs_pallas
from ilswiss_tpu.ops.pgs_pallas import (
    _pgs_kernel_batched, _sweep_fallback, pgs_solve,
)


def _random_problem(key, B, nr, dtype=jnp.float32):
    """Well-conditioned random instances shaped like the engine's:
    A = J J^T (PSD) + strictly positive regularization."""
    ks = jax.random.split(key, 6)
    J = jax.random.normal(ks[0], (B, nr, max(nr // 3, 2)), dtype)
    A = jnp.einsum("bik,bjk->bij", J, J)
    Rreg = jax.random.uniform(ks[1], (B, nr), dtype, 0.05, 0.5)
    b = jax.random.normal(ks[2], (B, nr), dtype)
    D = jnp.einsum("bii->bi", A) + Rreg
    active = jax.random.bernoulli(ks[3], 0.7, (B, nr))
    f0 = jnp.abs(jax.random.normal(ks[4], (B, nr), dtype))
    return A, Rreg, b, D, active, f0


@pytest.mark.parametrize("nr,B", [(6, 4), (38, 9), (116, 3)])
def test_kernel_matches_fallback(nr, B):
    args = _random_problem(jax.random.PRNGKey(nr), B, nr)
    ref = jax.vmap(functools.partial(_sweep_fallback, iters=15))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = _pgs_kernel_batched(*args, iters=15)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_kernel_handles_nonaligned_batch_and_padding():
    # B not a multiple of the lane tile; nr not a multiple of 8
    args = _random_problem(jax.random.PRNGKey(0), 5, 11)
    ref = jax.vmap(functools.partial(_sweep_fallback, iters=8))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = _pgs_kernel_batched(*args, iters=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_custom_vmap_entry_cpu_fallback():
    """Under vmap on the CPU backend pgs_solve must route to the vmapped
    XLA loop and agree with the per-env loop exactly."""
    args = _random_problem(jax.random.PRNGKey(3), 7, 38)
    under_vmap = jax.jit(jax.vmap(
        lambda *a: pgs_solve(*a, iters=15)))(*args)
    per_env = jnp.stack([
        _sweep_fallback(*(x[i] for x in args), iters=15)
        for i in range(7)
    ])
    np.testing.assert_allclose(np.asarray(under_vmap),
                               np.asarray(per_env), rtol=1e-5, atol=1e-6)


def test_inactive_rows_pinned_to_zero():
    A, Rreg, b, D, active, f0 = _random_problem(jax.random.PRNGKey(5), 4, 16)
    active = active.at[:, ::2].set(False)
    with pltpu.force_tpu_interpret_mode():
        got = _pgs_kernel_batched(A, Rreg, b, D, active, f0, iters=10)
    assert np.all(np.asarray(got)[:, ::2] == 0.0)
    assert np.all(np.asarray(got) >= 0.0)


def test_engine_step_unchanged_on_cpu():
    """The engine swap-in is a no-op on the CPU backend: physics_step
    through pgs_solve equals the original inline loop bit-for-bit."""
    from ilswiss_tpu.envs.locomotion import _model
    import ilswiss_tpu.ops.rigid_body as rb

    m = _model("hopper")
    key = jax.random.PRNGKey(0)
    q = jnp.asarray(m.qpos0, jnp.float32) + 0.01 * jax.random.normal(
        key, (m.nq,), jnp.float32)
    qd = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (m.nv,), jnp.float32)
    ctrl = jnp.array([0.3, -0.2, 0.5], jnp.float32)

    step = jax.jit(jax.vmap(
        lambda q_, qd_: rb.physics_step(m, q_, qd_, ctrl, iters=15)[:2]))
    qb, qdb = step(jnp.stack([q, q]), jnp.stack([qd, qd]))
    assert np.all(np.isfinite(np.asarray(qb)))
    # both lanes identical input -> identical output (determinism)
    np.testing.assert_array_equal(np.asarray(qb[0]), np.asarray(qb[1]))

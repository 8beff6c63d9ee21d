"""Parity of the Pallas batched u-form PGS kernel vs the XLA sweep loop.

The kernel (ops/pgs_pallas.py) must produce the same row forces as the
per-env Gauss-Seidel loop — same sweep/row order, same projection and
masking — so swapping it in cannot change trajectories beyond float
re-association.  It must also match the engine's ORIGINAL A-form iterate
(A_r . f == J_r . u identity).  Run here in Pallas interpret mode on the
CPU backend; the real-chip path is exercised by the TPU queue probes.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ilswiss_tpu.ops.pgs_pallas import (
    _pgs_kernel_batched, _sweep_fallback, pgs_solve,
)


def _random_problem(key, B, nr, nv, dtype=jnp.float32):
    """Well-conditioned random instances shaped like the engine's:
    J random, M = I + small SPD -> W = M^-1 J^T."""
    ks = jax.random.split(key, 6)
    J = jax.random.normal(ks[0], (B, nr, nv), dtype)
    S = jax.random.normal(ks[5], (B, nv, nv), dtype) * 0.2
    M = (jnp.eye(nv, dtype=dtype)[None]
         + jnp.einsum("bij,bkj->bik", S, S))
    W = jnp.linalg.solve(M, jnp.transpose(J, (0, 2, 1)))
    Rreg = jax.random.uniform(ks[1], (B, nr), dtype, 0.05, 0.5)
    b = jax.random.normal(ks[2], (B, nr), dtype)
    Adiag = jnp.einsum("brv,bvr->br", J, W)
    D = Adiag + Rreg
    active = jax.random.bernoulli(ks[3], 0.7, (B, nr))
    f0 = jnp.abs(jax.random.normal(ks[4], (B, nr), dtype))
    return J, W, Rreg, b, D, active, f0


@pytest.mark.parametrize("nr,nv,B", [(6, 4, 4), (38, 6, 9), (116, 14, 3),
                                     (150, 23, 2)])
def test_kernel_matches_fallback(nr, nv, B):
    args = _random_problem(jax.random.PRNGKey(nr), B, nr, nv)
    ref = jax.vmap(functools.partial(_sweep_fallback, iters=15))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = _pgs_kernel_batched(*args, iters=15)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-4)


def test_uform_matches_dense_a_form():
    """J_r.u with u = W f reproduces the engine's original A-form
    Gauss-Seidel iterate exactly (same fixed point, same sweep path)."""
    J, W, Rreg, b, D, active, f0 = _random_problem(
        jax.random.PRNGKey(7), 3, 20, 6)

    def dense_sweep(J1, W1, R1, b1, D1, a1, f01, iters=15):
        A = J1 @ W1
        f = jnp.where(a1, f01, 0.0)

        def sweep(_, f):
            for r in range(f.shape[0]):
                res = A[r] @ f + R1[r] * f[r] + b1[r]
                fr = jnp.maximum(0.0, f[r] - res / D1[r])
                f = f.at[r].set(jnp.where(a1[r], fr, 0.0))
            return f

        return jax.lax.fori_loop(0, iters, sweep, f)

    dense = jax.vmap(dense_sweep)(J, W, Rreg, b, D, active, f0)
    uform = jax.vmap(functools.partial(_sweep_fallback, iters=15))(
        J, W, Rreg, b, D, active, f0)
    np.testing.assert_allclose(np.asarray(uform), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_custom_vmap_entry_cpu_fallback():
    """Under vmap on the CPU backend pgs_solve routes to the vmapped
    XLA loop and agrees with the per-env loop."""
    args = _random_problem(jax.random.PRNGKey(3), 5, 38, 6)
    under_vmap = jax.jit(jax.vmap(
        lambda *a: pgs_solve(*a, iters=15)))(*args)
    per_env = jnp.stack([
        _sweep_fallback(*(x[i] for x in args), iters=15)
        for i in range(5)
    ])
    np.testing.assert_allclose(np.asarray(under_vmap),
                               np.asarray(per_env), rtol=1e-5, atol=1e-6)


def test_inactive_rows_pinned_to_zero():
    J, W, Rreg, b, D, active, f0 = _random_problem(
        jax.random.PRNGKey(5), 4, 16, 6)
    active = active.at[:, ::2].set(False)
    with pltpu.force_tpu_interpret_mode():
        got = _pgs_kernel_batched(J, W, Rreg, b, D, active, f0, iters=10)
    assert np.all(np.asarray(got)[:, ::2] == 0.0)
    assert np.all(np.asarray(got) >= 0.0)


def test_engine_step_unchanged_on_cpu():
    """The engine swap-in is a no-op on the CPU backend: physics_step
    through pgs_solve stays finite and deterministic (uses the general
    engine path; ant exercises the non-planar route)."""
    from ilswiss_tpu.envs.locomotion import _model
    import ilswiss_tpu.ops.rigid_body as rb

    m = _model("ant")
    key = jax.random.PRNGKey(0)
    q = jnp.asarray(m.qpos0, jnp.float32) + 0.01 * jax.random.normal(
        key, (m.nq,), jnp.float32)
    qd = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (m.nv,),
                                 jnp.float32)
    ctrl = jnp.zeros((m.nu,), jnp.float32).at[0].set(0.3)

    step = jax.jit(jax.vmap(
        lambda q_, qd_: rb.physics_step(m, q_, qd_, ctrl, iters=15)[:2]))
    qb, qdb = step(jnp.stack([q, q]), jnp.stack([qd, qd]))
    assert np.all(np.isfinite(np.asarray(qb)))
    np.testing.assert_array_equal(np.asarray(qb[0]), np.asarray(qb[1]))

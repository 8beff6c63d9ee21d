"""Planar fused forward dynamics vs the general engine.

The planar scalar-graph (ops/planar_dynamics.py) must reproduce
ops/rigid_body.py — which tests/test_rigid_body.py pins against MuJoCo —
for hopper / walker / halfcheetah: float64 forward solves to machine
precision, and full control steps through the Pallas kernel (interpret
mode here; the real chip via the TPU queue probes) to float32 roundoff.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ilswiss_tpu.ops.rigid_body as rb
from ilswiss_tpu.envs.locomotion import _model
from ilswiss_tpu.ops import planar_dynamics as pd

PLANAR = ("hopper", "walker", "halfcheetah", "invertedpendulum")


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _rand_state(m, rng, scale=0.2, dtype=jnp.float64):
    q = jnp.asarray(m.qpos0 + scale * rng.randn(m.nq), dtype)
    qd = jnp.asarray(rng.randn(m.nv), dtype)
    ctrl = jnp.asarray(np.clip(rng.randn(m.nu), -1, 1), dtype)
    f0 = jnp.asarray(np.abs(rng.randn(m.nrow)) * 0.2, dtype)
    return q, qd, ctrl, f0


@pytest.mark.slow
@pytest.mark.parametrize("name", PLANAR)
def test_forward_matches_engine_f64(name, x64):
    """qacc / qfrc_constraint / row forces identical to the general
    engine at float64 (same formulas, same row order, same sweeps)."""
    m = _model(name)
    rng = np.random.RandomState(0)
    for _ in range(6):
        q, qd, ctrl, f0 = _rand_state(m, rng)
        qe, _, _, ce, fe = rb.forward(m, q, qd, ctrl, iters=15, f0=f0)
        qp, cp, fp = pd.planar_forward_single(m, q, qd, ctrl, f0, iters=15)
        np.testing.assert_allclose(np.asarray(qp), np.asarray(qe),
                                   rtol=1e-9, atol=1e-8)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(ce),
                                   rtol=1e-9, atol=1e-8)
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fe),
                                   rtol=1e-9, atol=1e-8)


def test_nonplanar_models_are_rejected():
    for name in ("ant", "humanoid", "swimmer"):
        assert pd.planar_model(_model(name)) is None


def test_dispatch_unbatched_is_engine():
    """Per-env planar_physics_step falls back to the engine verbatim."""
    m = _model("hopper")
    rng = np.random.RandomState(1)
    q, qd, ctrl, f0 = _rand_state(m, rng, dtype=jnp.float32)
    a = pd.planar_physics_step(m, q, qd, ctrl, iters=15, f0=f0)
    b = rb.physics_step(m, q, qd, ctrl, iters=15, f0=f0)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.nightly
@pytest.mark.parametrize("name", ["hopper", "halfcheetah"])
def test_kernel_control_step_matches_engine(name, monkeypatch):
    """Full control step (RK4 x frame_skip / implicit-damping Euler)
    through the Pallas kernel in interpret mode == the vmapped engine
    at float32 roundoff."""
    monkeypatch.setenv("ILSWISS_PLANAR_INTERPRET", "1")
    m = _model(name)
    rng = np.random.RandomState(2)
    B = 4
    q = jnp.asarray(m.qpos0[None] + 0.1 * rng.randn(B, m.nq), jnp.float32)
    qd = jnp.asarray(0.3 * rng.randn(B, m.nv), jnp.float32)
    ctrl = jnp.asarray(np.clip(rng.randn(B, m.nu), -1, 1), jnp.float32)
    f0 = jnp.zeros((B, m.nrow), jnp.float32)

    outk = jax.vmap(lambda a, b, c, d: pd.planar_physics_step(
        m, a, b, c, iters=15, f0=d))(q, qd, ctrl, f0)
    oute = jax.vmap(lambda a, b, c, d: rb.physics_step(
        m, a, b, c, iters=15, f0=d))(q, qd, ctrl, f0)
    labels = ("q", "qd", "con", "f", "q_ev", "qd_ev")
    for x, y, lbl in zip(jax.tree.leaves(outk), jax.tree.leaves(oute),
                         labels):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=5e-3,
            err_msg=f"{name}:{lbl}")


@pytest.mark.nightly
def test_env_rollout_through_kernel_stays_close(monkeypatch):
    """A 5-control-step hopper env rollout through the kernel tracks
    the engine rollout (includes ground contact; interpret mode is slow,
    so short horizon — the real-chip probes roll much longer)."""
    from ilswiss_tpu.envs import make_vec

    def rollout():
        vec = make_vec("hopper", num_envs=2)
        state = vec.reset(jax.random.PRNGKey(0))
        obs = [state.obs]
        for t in range(5):
            a = jax.random.uniform(jax.random.PRNGKey(t), (2, 3),
                                   minval=-1.0, maxval=1.0)
            state, tr = vec.step(state, a)
            obs.append(tr.next_obs)
        return np.asarray(jnp.stack(obs))

    monkeypatch.setenv("ILSWISS_PLANAR_INTERPRET", "1")
    jax.clear_caches()
    through_kernel = rollout()
    monkeypatch.setenv("ILSWISS_PLANAR_INTERPRET", "0")
    monkeypatch.setenv("ILSWISS_NO_PLANAR_KERNEL", "1")
    jax.clear_caches()
    through_engine = rollout()
    # head: float32 roundoff; tail: bounded divergence
    np.testing.assert_allclose(through_kernel[:3], through_engine[:3],
                               rtol=1e-3, atol=1e-3)
    assert np.max(np.abs(through_kernel - through_engine)) < 0.2

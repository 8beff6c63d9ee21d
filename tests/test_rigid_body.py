"""Numerical parity of the JAX rigid-body engine vs MuJoCo.

The on-device locomotion envs replace the reference's external MuJoCo
dependency (reference reaches it through gym + one process per env,
rlkit/envs/worker/subproc.py).  These tests pin the JAX engine
(ilswiss_tpu/ops/rigid_body.py) to the MuJoCo C engine itself:
constrained forward dynamics (contacts + joint limits, pyramidal
friction cone, solref/solimp soft-constraint model) must reproduce
mj_forward's qacc to solver precision in float64, and short rollouts
must track mj_step.

Skipped when the `mujoco` package is unavailable (the framework itself
never imports it at runtime — model constants are pre-extracted into
envs/_locomotion_params.py).
"""

import functools
import os

import numpy as np
import pytest

import jax

mujoco = pytest.importorskip("mujoco")
gm = pytest.importorskip("gymnasium.envs.mujoco")

from ilswiss_tpu.envs._locomotion_params import PARAMS  # noqa: E402
from ilswiss_tpu.ops import rigid_body as rb  # noqa: E402

ASSETS = os.path.join(os.path.dirname(gm.__file__), "assets")


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _mj(name):
    m = mujoco.MjModel.from_xml_path(
        os.path.join(ASSETS, PARAMS[name]["xml"])
    )
    return m, mujoco.MjData(m)


def _random_state(m, rng):
    q = m.qpos0 + rng.uniform(-0.3, 0.1, m.nq)
    qd = rng.uniform(-2.0, 2.0, m.nv)
    ctrl = rng.uniform(-1.0, 1.0, m.nu)
    return q, qd, ctrl


# hopper exercises contacts + limits; inverteddoublependulum exercises
# RK4 + springs with no contacts.  walker/halfcheetah hit the same code
# paths as hopper with more rows (checked during development to 1e-14,
# excluded here to keep the suite fast).
@pytest.mark.parametrize("name", ["hopper", "inverteddoublependulum"])
def test_forward_dynamics_matches_mujoco(name, x64):
    m, d = _mj(name)
    model = rb.RigidModel(PARAMS[name])

    fwd = jax.jit(
        functools.partial(
            lambda q, qd, c: rb.forward(model, q, qd, c, iters=1000)[0]
        )
    )
    rng = np.random.RandomState(0)
    for _ in range(4):
        q, qd, ctrl = _random_state(m, rng)
        d.qpos[:] = q
        d.qvel[:] = qd
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        qacc = np.asarray(fwd(q, qd, ctrl))
        scale = max(1.0, float(np.max(np.abs(d.qacc))))
        np.testing.assert_allclose(qacc / scale, d.qacc / scale, atol=1e-9)


def test_rollout_tracks_mujoco(x64):
    """20 control steps (80 substeps) of hopper from a perturbed init
    stay close to mj_step — catches integrator-semantics drift that a
    single-state check can miss."""
    m, d = _mj("hopper")
    model = rb.RigidModel(PARAMS["hopper"])
    step = jax.jit(
        lambda q, qd, c: rb.physics_step(model, q, qd, c, iters=1000)[:2]
    )

    rng = np.random.RandomState(1)
    q = m.qpos0 + rng.uniform(-5e-3, 5e-3, m.nq)
    qd = rng.uniform(-5e-3, 5e-3, m.nv)
    d.qpos[:] = q
    d.qvel[:] = qd
    jq, jqd = q.copy(), qd.copy()
    for t in range(20):
        ctrl = 0.5 * np.sin(0.3 * t + np.arange(m.nu))
        d.ctrl[:] = ctrl
        for _ in range(model.frame_skip):
            mujoco.mj_step(m, d)
        jq, jqd = (np.asarray(a) for a in step(jq, jqd, ctrl))
        np.testing.assert_allclose(jq, d.qpos, atol=1e-5)
    np.testing.assert_allclose(jqd, d.qvel, atol=1e-3)


def test_mass_matrix_and_bias(x64):
    """M(q) vs mj_fullM and bias vs mj_rne(flg_acc=0) + passive-free
    decomposition on random states."""
    m, d = _mj("walker")
    model = rb.RigidModel(PARAMS["walker"])
    rng = np.random.RandomState(2)
    q = m.qpos0 + rng.uniform(-0.2, 0.2, m.nq)
    qd = rng.uniform(-1.0, 1.0, m.nv)
    d.qpos[:] = q
    d.qvel[:] = qd
    mujoco.mj_forward(m, d)

    M = np.asarray(rb.mass_matrix(model, jax.numpy.asarray(q)))
    full = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, full)
    np.testing.assert_allclose(M, full, atol=1e-10)

    bias = np.asarray(
        rb.bias_forces(model, jax.numpy.asarray(q), jax.numpy.asarray(qd))
    )
    np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-9)


@pytest.mark.parametrize("name", ["ant", "humanoid", "swimmer"])
def test_free_joint_models_match_mujoco(name, x64):
    """M / bias / passive (incl. swimmer's fluid drag) / constrained
    qacc parity for the quaternion-root models (ant, humanoid) and the
    fluid-driven swimmer — the round-3 frontier: free-joint kinematics,
    quasi-velocity Newton-Euler dynamics, pose-dependent contact
    tangent frames."""
    m, d = _mj(name)
    model = rb.RigidModel(PARAMS[name])
    rng = np.random.RandomState(0)
    for _ in range(2):
        q = m.qpos0 + rng.uniform(-0.1, 0.1, m.nq)
        qd = rng.uniform(-1.0, 1.0, m.nv)
        ctrl = rng.uniform(-0.4, 0.4, m.nu)
        d.qpos[:] = q
        d.qvel[:] = qd
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)

        M = np.asarray(rb.mass_matrix(model, jax.numpy.asarray(q)))
        full = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, full)
        np.testing.assert_allclose(M, full, atol=1e-10)

        bias = np.asarray(rb.bias_forces(
            model, jax.numpy.asarray(q), jax.numpy.asarray(qd)))
        np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-9)

        passive = np.asarray(rb.passive_forces(
            model, jax.numpy.asarray(q), jax.numpy.asarray(qd)))
        np.testing.assert_allclose(passive, d.qfrc_passive, atol=1e-9)

        qacc = np.asarray(rb.forward(
            model, jax.numpy.asarray(q), jax.numpy.asarray(qd),
            jax.numpy.asarray(ctrl), iters=1000)[0])
        scale = max(1.0, float(np.max(np.abs(d.qacc))))
        np.testing.assert_allclose(qacc / scale, d.qacc / scale, atol=1e-8)


def test_ant_grounded_contacts_and_cfrc(x64):
    """Settle the ant with MuJoCo until its feet carry load (the
    margin-active contact regime), then pin constrained qacc and the
    recomposed cfrc_ext against mj_rnePostConstraint."""
    m, d = _mj("ant")
    model = rb.RigidModel(PARAMS["ant"])
    d.qpos[:] = m.qpos0
    for _ in range(400):
        mujoco.mj_step(m, d)
    ctrl = 0.3 * np.ones(m.nu)
    d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    assert d.ncon >= 4  # all four feet in the margin-active band

    q = np.asarray(d.qpos).copy()
    qd = np.asarray(d.qvel).copy()
    qacc, _, _, _, f = rb.forward(
        model, jax.numpy.asarray(q), jax.numpy.asarray(qd),
        jax.numpy.asarray(ctrl), iters=3000)
    scale = max(1.0, float(np.max(np.abs(d.qacc))))
    np.testing.assert_allclose(
        np.asarray(qacc) / scale, d.qacc / scale, atol=1e-9)

    mujoco.mj_rnePostConstraint(m, d)
    ours = np.asarray(rb.cfrc_ext(model, jax.numpy.asarray(q), f))
    np.testing.assert_allclose(ours, d.cfrc_ext, atol=1e-8)


def test_humanoid_com_quantities(x64):
    """cinert / cvel / mass-center parity (the humanoid observation's
    com-based blocks, mjData.cinert & cvel after mj_comPos/mj_comVel)."""
    m, d = _mj("humanoid")
    model = rb.RigidModel(PARAMS["humanoid"])
    rng = np.random.RandomState(2)
    q = m.qpos0 + rng.uniform(-0.05, 0.05, m.nq)
    qd = rng.uniform(-0.5, 0.5, m.nv)
    d.qpos[:] = q
    d.qvel[:] = qd
    mujoco.mj_forward(m, d)
    cin, cv, mcxy = rb.com_quantities(
        model, jax.numpy.asarray(q), jax.numpy.asarray(qd))
    np.testing.assert_allclose(np.asarray(cin), d.cinert, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cv), d.cvel, atol=1e-10)
    tot = float(np.sum(m.body_mass))
    gx = float(np.sum(m.body_mass * d.xipos[:, 0])) / tot
    gy = float(np.sum(m.body_mass * d.xipos[:, 1])) / tot
    np.testing.assert_allclose(np.asarray(mcxy), [gx, gy], atol=1e-12)


def test_quaternion_rollout_tracks_mujoco(x64):
    """10 RK4 control steps of the ant from a perturbed init stay close
    to mj_step — integration-semantics check for quaternion position
    integration (mj_integratePos + per-step quat normalization)."""
    m, d = _mj("ant")
    model = rb.RigidModel(PARAMS["ant"])
    step = jax.jit(
        lambda q, qd, c: rb.physics_step(model, q, qd, c, iters=1000)[:2]
    )
    rng = np.random.RandomState(1)
    q = m.qpos0 + rng.uniform(-0.01, 0.01, m.nq)
    qd = rng.uniform(-0.01, 0.01, m.nv)
    d.qpos[:] = q
    d.qvel[:] = qd
    jq, jqd = q.copy(), qd.copy()
    for t in range(10):
        ctrl = 0.3 * np.sin(0.3 * t + np.arange(m.nu))
        d.ctrl[:] = ctrl
        for _ in range(model.frame_skip):
            mujoco.mj_step(m, d)
        jq, jqd = (np.asarray(a) for a in step(jq, jqd, ctrl))
        np.testing.assert_allclose(jq, d.qpos, atol=1e-4)
    np.testing.assert_allclose(jqd, d.qvel, atol=1e-3)


def test_site_positions(x64):
    """IDP tip site (drives its reward/termination) matches site_xpos."""
    m, d = _mj("inverteddoublependulum")
    model = rb.RigidModel(PARAMS["inverteddoublependulum"])
    rng = np.random.RandomState(3)
    q = m.qpos0 + rng.uniform(-0.3, 0.3, m.nq)
    d.qpos[:] = q
    mujoco.mj_forward(m, d)
    sites = np.asarray(rb.site_positions(model, jax.numpy.asarray(q)))
    np.testing.assert_allclose(sites, d.site_xpos, atol=1e-12)

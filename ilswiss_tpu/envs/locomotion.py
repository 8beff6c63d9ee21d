"""On-device MuJoCo locomotion environments (pure JAX).

The centerpiece of the TPU rebuild: the reference steps these envs in
the MuJoCo C engine, one OS process per env behind pipes
(rlkit/envs/worker/subproc.py; registry rlkit/envs/envs_dict.py).  Here
the whole simulator is the JAX rigid-body engine
(ilswiss_tpu/ops/rigid_body.py, pinned to mj_forward at ~1e-14 in
tests/test_rigid_body.py), so thousands of instances step in lockstep
under `vmap` inside the fused actor-learner jit and shard over an
`env` mesh axis.

Observation / reward / termination / reset-noise semantics are
gymnasium-v5-exact (same generation the host bridge and the native C++
engine use; validated against gymnasium in tests/test_locomotion.py):

  hopper:  obs [qpos[1:], clip(qvel, ±10)]; r = dx/dt + healthy
           - 1e-3·|a|²; healthy: z>0.7, |angle|<0.2, state[2:] in ±100
  walker:  same obs form; healthy: 0.8<z<2.0, |angle|<1
  halfcheetah: obs [qpos[1:], qvel]; r = dx/dt - 0.1·|a|²; no terminal
  invertedpendulum: obs [qpos, qvel]; r = 1 while |angle|<=0.2
  inverteddoublependulum: obs [x, sin q12, cos q12, clip(qvel,±10),
           clip(qfrc_constraint[0], ±10)]; r = 10·healthy
           - (0.01 x_tip² + (y_tip-2)²) - (1e-3 ω₁² + 5e-3 ω₂²);
           terminal when y_tip <= 1

The contact solver runs `solver_iters` projected-Gauss-Seidel sweeps
(env_kwargs-overridable).  40 matches MuJoCo's qacc to ~5e-3 relative
— far inside the reset-noise/action stochasticity of RL training —
while keeping the TPU step latency-bound rather than compute-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ilswiss_tpu.envs._locomotion_params import PARAMS
from ilswiss_tpu.envs.base import Environment
from ilswiss_tpu.ops.rigid_body import (
    RigidModel, cfrc_ext, com_quantities, site_positions,
)
from ilswiss_tpu.ops import rigid_body as _rb
# physics_step with the planar fast path: hopper/walker/halfcheetah
# route through the fused Pallas forward kernel under vmap on TPU
# (ops/planar_dynamics.py); everything else uses the general engine
from ilswiss_tpu.ops.planar_dynamics import physics_step_auto as physics_step

_MODELS: dict[str, RigidModel] = {}


def _model(name: str) -> RigidModel:
    if name not in _MODELS:
        _MODELS[name] = RigidModel(PARAMS[name])
    return _MODELS[name]


class LocomotionEnv(Environment):
    """Base for scalar-joint MuJoCo models.

    internal = (qpos, qvel, warm-start row forces): the constraint
    solver warm-starts from the previous control step's contact/limit
    forces (MuJoCo's qacc_warmstart equivalent), so `solver_iters`
    projected-Gauss-Seidel sweeps track the converged solution through
    an episode.  Forces reset to zero with the episode."""

    name: str
    max_episode_steps = 1000
    solver_iters = 15
    reset_noise_scale = 5e-3
    gaussian_qvel_noise = False   # halfcheetah/IDP draw qvel from N(0,s)

    def __init__(self, **overrides):
        super().__init__(**overrides)
        self.model = _model(self.name)
        self.action_low = np.asarray(self.model.ctrl_range[:, 0], np.float32)
        self.action_high = np.asarray(self.model.ctrl_range[:, 1], np.float32)
        self.action_size = self.model.nu
        self.dt = self.model.timestep * self.model.frame_skip

    # -- hooks per env -------------------------------------------------
    def _obs(self, q, qd, qfrc_con):
        raise NotImplementedError

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        raise NotImplementedError

    # -- Environment API ----------------------------------------------
    def _sample_state(self, key):
        """Gym reset distribution: qpos0 + uniform(±scale) on qpos
        (applied raw, quaternions included — gymnasium does the same)
        and uniform or gaussian noise on qvel."""
        m = self.model
        kq, kv = jax.random.split(key)
        s = self.reset_noise_scale
        q = jnp.asarray(m.qpos0, jnp.float32) + jax.random.uniform(
            kq, (m.nq,), jnp.float32, -s, s
        )
        if self.gaussian_qvel_noise:
            qd = s * jax.random.normal(kv, (m.nv,), jnp.float32)
        else:
            qd = jax.random.uniform(kv, (m.nv,), jnp.float32, -s, s)
        warm = jnp.zeros(m.nrow, jnp.float32)
        return q, qd, warm

    def _reset(self, key):
        q, qd, warm = self._sample_state(key)
        zero = jnp.zeros(self.model.nv, jnp.float32)
        return (q, qd, warm), self._obs(q, qd, zero)

    def _step(self, internal, action, key):
        q0, qd0, warm = internal
        q, qd, qfrc_con, warm, _ = physics_step(
            self.model, q0, qd0, action, iters=self.solver_iters, f0=warm
        )
        obs = self._obs(q, qd, qfrc_con)
        reward, terminal = self._reward_terminal(q0, q, qd, qfrc_con, action)
        return (q, qd, warm), obs, reward, terminal


class HopperDevice(LocomotionEnv):
    name = "hopper"
    observation_size = 11

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([q[1:], jnp.clip(qd, -10.0, 10.0)])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        x_vel = (q[0] - q_before[0]) / self.dt
        state = jnp.concatenate([q[2:], qd])
        healthy = (
            jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
            & jnp.all(jnp.abs(state) < 100.0)
            & (q[1] > 0.7) & (jnp.abs(q[2]) < 0.2)
        )
        reward = x_vel + 1.0 - 1e-3 * jnp.sum(jnp.square(action))
        return reward, jnp.logical_not(healthy)


class WalkerDevice(LocomotionEnv):
    name = "walker"
    observation_size = 17

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([q[1:], jnp.clip(qd, -10.0, 10.0)])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        x_vel = (q[0] - q_before[0]) / self.dt
        healthy = (
            (q[1] > 0.8) & (q[1] < 2.0)
            & (q[2] > -1.0) & (q[2] < 1.0)
        )
        reward = x_vel + 1.0 - 1e-3 * jnp.sum(jnp.square(action))
        return reward, jnp.logical_not(healthy)


class HalfCheetahDevice(LocomotionEnv):
    name = "halfcheetah"
    observation_size = 17
    reset_noise_scale = 0.1
    gaussian_qvel_noise = True

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([q[1:], qd])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        x_vel = (q[0] - q_before[0]) / self.dt
        reward = x_vel - 0.1 * jnp.sum(jnp.square(action))
        return reward, jnp.zeros((), bool)


class InvertedPendulumDevice(LocomotionEnv):
    name = "invertedpendulum"
    observation_size = 4
    reset_noise_scale = 0.01

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([q, qd])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        finite = jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
        terminal = jnp.logical_not(finite) | (jnp.abs(q[1]) > 0.2)
        return jnp.logical_not(terminal).astype(jnp.float32), terminal


class InvertedDoublePendulumDevice(LocomotionEnv):
    name = "inverteddoublependulum"
    observation_size = 9
    reset_noise_scale = 0.1
    gaussian_qvel_noise = True
    healthy_reward = 10.0

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([
            q[:1],
            jnp.sin(q[1:]),
            jnp.cos(q[1:]),
            jnp.clip(qd, -10.0, 10.0),
            jnp.clip(qfrc_con, -10.0, 10.0)[:1],
        ])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        tip = site_positions(self.model, q)[0]
        x, y = tip[0], tip[2]
        terminal = y <= 1.0
        dist_penalty = 0.01 * x**2 + (y - 2.0) ** 2
        vel_penalty = 1e-3 * qd[1] ** 2 + 5e-3 * qd[2] ** 2
        alive = self.healthy_reward * jnp.logical_not(terminal)
        return alive - dist_penalty - vel_penalty, terminal


class AntDevice(LocomotionEnv):
    """Ant-v5 semantics (free quaternion root, RK4, 25 plane-contact
    candidates).  obs = [qpos[2:], qvel, clip(cfrc_ext[1:], ±1)];
    reward = x_vel(torso) + healthy − 0.5·|a|² − 5e-4·Σclip(cfrc)²;
    healthy: finite state and 0.2 ≤ z ≤ 1.0 (native/mjvec.cpp parity
    comments; reference trains via gym registry rlkit/envs/envs_dict.py).

    cfrc_ext is recomposed from the last substep's final forward
    evaluation (RK4 stage 3) — exactly where gym's
    mj_rnePostConstraint reads mjData's contacts and forces."""

    name = "ant"
    observation_size = 105
    reset_noise_scale = 0.1
    gaussian_qvel_noise = True

    def _obs(self, q, qd, cfrc):
        return jnp.concatenate([
            q[2:], qd, jnp.clip(cfrc[1:].reshape(-1), -1.0, 1.0)
        ])

    def _reset(self, key):
        q, qd, warm = self._sample_state(key)
        # gym's reset skips mj_rnePostConstraint -> cfrc_ext obs are 0
        zero_cfrc = jnp.zeros((self.model.nbody, 6), jnp.float32)
        return (q, qd, warm), self._obs(q, qd, zero_cfrc)

    def _step(self, internal, action, key):
        q0, qd0, warm = internal
        q, qd, _, warm, (q_ev, _) = physics_step(
            self.model, q0, qd0, action, iters=self.solver_iters, f0=warm
        )
        cfrc = cfrc_ext(self.model, q_ev, warm)
        obs = self._obs(q, qd, cfrc)
        x_vel = (q[0] - q0[0]) / self.dt
        healthy = (
            jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(qd))
            & (q[2] >= 0.2) & (q[2] <= 1.0)
        )
        clipped = jnp.clip(cfrc, -1.0, 1.0)
        contact_cost = 5e-4 * jnp.sum(jnp.square(clipped))
        reward = (x_vel + healthy.astype(jnp.float32)
                  - 0.5 * jnp.sum(jnp.square(action)) - contact_cost)
        return (q, qd, warm), obs, reward, jnp.logical_not(healthy)


class HumanoidDevice(LocomotionEnv):
    """Humanoid-v5 semantics (free root + 17 hinges, RK4 at 3 ms).
    obs = [qpos[2:], qvel, cinert[1:], cvel[1:], qfrc_actuator[6:],
    cfrc_ext[1:]] (348 dims); reward = 1.25·com_x_vel + 5·healthy −
    0.1·|ctrl|² − min(5e-7·Σcfrc², 10); healthy: 1 < z < 2."""

    name = "humanoid"
    observation_size = 348
    reset_noise_scale = 0.01

    def _obs(self, q, qd, cinert, cvel, qfrc_act, cfrc):
        return jnp.concatenate([
            q[2:], qd,
            cinert[1:].reshape(-1), cvel[1:].reshape(-1),
            qfrc_act[6:], cfrc[1:].reshape(-1),
        ])

    def _reset(self, key):
        q, qd, warm = self._sample_state(key)
        cinert, cvel, _ = com_quantities(self.model, q, qd)
        zeros6 = jnp.zeros((self.model.nbody, 6), jnp.float32)
        obs = self._obs(q, qd, cinert, cvel,
                        jnp.zeros(self.model.nv, jnp.float32), zeros6)
        return (q, qd, warm), obs

    def _step(self, internal, action, key):
        q0, qd0, warm = internal
        _, _, com_before = com_quantities(self.model, q0, qd0)
        q, qd, _, warm, (q_ev, qd_ev) = physics_step(
            self.model, q0, qd0, action, iters=self.solver_iters, f0=warm
        )
        # gym's obs-side derived quantities come from mjData after the
        # final forward evaluation (stale by one integration); the
        # reward's mass-center displacement is measured fresh at the
        # integrated states so the interval is exactly dt
        cinert, cvel, _ = com_quantities(self.model, q_ev, qd_ev)
        _, _, com_after = com_quantities(self.model, q, qd)
        cfrc = cfrc_ext(self.model, q_ev, warm)
        qfrc_act = _rb.actuation(self.model, action)
        obs = self._obs(q, qd, cinert, cvel, qfrc_act, cfrc)
        x_vel = (com_after[0] - com_before[0]) / self.dt
        healthy = (q[2] > 1.0) & (q[2] < 2.0)
        contact_cost = jnp.minimum(5e-7 * jnp.sum(jnp.square(cfrc)), 10.0)
        reward = (1.25 * x_vel + 5.0 * healthy.astype(jnp.float32)
                  - 0.1 * jnp.sum(jnp.square(action)) - contact_cost)
        return (q, qd, warm), obs, reward, jnp.logical_not(healthy)


class SwimmerDevice(LocomotionEnv):
    """Swimmer-v5 semantics (planar slide-slide-hinge root; propulsion
    comes from the inertia-box fluid model — swimmer.xml density 4000,
    viscosity 0.1).  obs = [qpos[2:], qvel]; r = x_vel − 1e-4·|a|²;
    never terminates."""

    name = "swimmer"
    observation_size = 8
    reset_noise_scale = 0.1

    def _obs(self, q, qd, qfrc_con):
        return jnp.concatenate([q[2:], qd])

    def _reward_terminal(self, q_before, q, qd, qfrc_con, action):
        x_vel = (q[0] - q_before[0]) / self.dt
        reward = x_vel - 1e-4 * jnp.sum(jnp.square(action))
        return reward, jnp.zeros((), bool)


class AntTruncObsDevice(AntDevice):
    """MBPO's truncated-observation ant: drop the 78 clipped-cfrc dims,
    obs = [qpos[2:], qvel] (27), so the BNN dynamics model predicts only
    pose/velocity.  The reference's exp_specs/mbpo/mbpo_ant.yaml names
    'ant_trunc_obs' but its envs_dict never registers it (bit-rot,
    SURVEY §5.9); semantics follow the MBPO codebase's
    AntTruncatedObsEnv.  Reward/termination identical to ant."""

    name = "ant_trunc_obs"
    observation_size = 27

    def _obs(self, q, qd, cfrc):
        return jnp.concatenate([q[2:], qd])


class HumanoidTruncObsDevice(HumanoidDevice):
    """MBPO's truncated-observation humanoid: obs = [qpos[2:], qvel]
    (45), dropping cinert/cvel/qfrc_actuator/cfrc_ext
    (reference mbpo_humanoid.yaml 'humanoid_trunc_obs';
    MBPO HumanoidTruncatedObsEnv semantics)."""

    name = "humanoid_trunc_obs"
    observation_size = 45

    def _obs(self, q, qd, cinert, cvel, qfrc_act, cfrc):
        return jnp.concatenate([q[2:], qd])


def register_all(register) -> None:
    register("hopper", HopperDevice)
    register("walker", WalkerDevice)
    register("halfcheetah", HalfCheetahDevice)
    register("ant", AntDevice)
    register("ant_trunc_obs", AntTruncObsDevice)
    register("humanoid", HumanoidDevice)
    register("humanoid_trunc_obs", HumanoidTruncObsDevice)
    register("swimmer", SwimmerDevice)
    register("invertedpendulum", InvertedPendulumDevice)
    register("inverteddoublependulum", InvertedDoublePendulumDevice)

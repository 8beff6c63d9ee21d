"""Env registry and factory.

Mirrors the reference's name->class registry + factory
(rlkit/envs/envs_dict.py, rlkit/envs/__init__.py:44-132): `make(name)`
returns a static `Environment`, `make_vec(name, num_envs)` the lockstep
vectorized engine (the reference's `get_envs` builds Dummy/Subproc vec
envs there; here vectorization is vmap so one code path covers both).
"""

from __future__ import annotations

from typing import Callable, Dict, Type

from ilswiss_tpu.envs.base import Environment, EnvState, StepOutput
from ilswiss_tpu.envs.vector import VectorEnv, Transition
from ilswiss_tpu.envs.classic import CartPole, MountainCarContinuous, Pendulum

ENV_REGISTRY: Dict[str, Callable[..., Environment]] = {}


def register(name: str, ctor: Callable[..., Environment]) -> None:
    ENV_REGISTRY[name] = ctor


# Names follow the reference registry keys (rlkit/envs/envs_dict.py).
register("pendulum", Pendulum)
register("cartpole", CartPole)
register("mountain", MountainCarContinuous)


def _register_goal():
    from ilswiss_tpu.envs.goal import GoalReach2D
    register("reach2d", GoalReach2D)


def _register_pixels():
    from ilswiss_tpu.envs.classic.pendulum_pixels import PendulumPixels
    register("pendulum_pixels", PendulumPixels)


_register_goal()
_register_pixels()


def _register_locomotion():
    # On-device MuJoCo locomotion family (JAX rigid-body engine).  These
    # take the names the reference registry uses for its MuJoCo envs
    # (rlkit/envs/envs_dict.py), so specs route to the device path; the
    # host bridge keeps the gymnasium ids (host_mujoco.GYM_ENV_IDS).
    from ilswiss_tpu.envs import locomotion
    locomotion.register_all(register)


_register_locomotion()


def make(name: str, **kwargs) -> Environment:
    if name not in ENV_REGISTRY:
        raise KeyError(
            f"Unknown env '{name}'. Registered: {sorted(ENV_REGISTRY)}"
        )
    return ENV_REGISTRY[name](**kwargs)


def make_vec(name: str, num_envs: int, **kwargs) -> VectorEnv:
    return VectorEnv(make(name, **kwargs), num_envs)

"""ctypes bindings for the native vectorized MuJoCo engine.

`NativeMjVectorEnv` is a drop-in replacement for `GymVectorEnv` on the
full MuJoCo benchmark family (hopper/walker/halfcheetah/ant/humanoid/
swimmer/inverted(-double)-pendulum, reference README.md:142-149), backed by
native/mjvec.cpp: one C call steps all B envs over persistent worker
threads with zero per-env Python overhead.  Built on demand with g++
against the mujoco wheel's headers and shared library (no pybind11 —
plain C ABI + ctypes, per the environment's toolchain constraints).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_ENV_TYPES = {
    "hopper": (0, "hopper.xml", 4),
    "walker": (1, "walker2d.xml", 4),
    "halfcheetah": (2, "half_cheetah.xml", 5),
    "ant": (3, "ant.xml", 5),
    "humanoid": (4, "humanoid.xml", 5),
    "swimmer": (5, "swimmer.xml", 4),
    "invertedpendulum": (6, "inverted_pendulum.xml", 2),
    "inverteddoublependulum": (7, "inverted_double_pendulum.xml", 5),
}

_LIB = None


def _mujoco_paths():
    import mujoco
    pkg = os.path.dirname(mujoco.__file__)
    include = os.path.join(pkg, "include")
    libs = [f for f in os.listdir(pkg) if f.startswith("libmujoco.so")]
    assert libs, f"no libmujoco in {pkg}"
    return pkg, include, sorted(libs)[-1]


def _assets_dir() -> str:
    import gymnasium.envs.mujoco as gm
    return os.path.join(os.path.dirname(gm.__file__), "assets")


def build_library(force: bool = False) -> str:
    """Compile mjvec.cpp into a cached shared object."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(os.path.dirname(here), "native", "mjvec.cpp")
    out = os.path.join(os.path.dirname(here), "native", "libmjvec.so")
    if (not force and os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    pkg, include, libname = _mujoco_paths()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        src, f"-I{include}", f"-L{pkg}", f"-l:{libname}",
        f"-Wl,-rpath,{pkg}", "-pthread", "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(build_library())
    lib.mjvec_create.restype = ctypes.c_void_p
    lib.mjvec_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint, ctypes.c_int,
    ]
    lib.mjvec_obs_dim.argtypes = [ctypes.c_void_p]
    lib.mjvec_act_dim.argtypes = [ctypes.c_void_p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.mjvec_reset_all.argtypes = [ctypes.c_void_p, f32p]
    lib.mjvec_get_obs.argtypes = [ctypes.c_void_p, f32p]
    lib.mjvec_set_state.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f64p, f64p]
    lib.mjvec_step.argtypes = [
        ctypes.c_void_p, f32p, f32p, f32p, u8p, u8p, f32p]
    lib.mjvec_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeMjVectorEnv:
    """GymVectorEnv-compatible native batch env (numpy API)."""

    def __init__(self, env_name: str, num_envs: int, seed: int = 0,
                 max_episode_steps: int | None = None,
                 num_threads: int = 8, **_):
        assert env_name in _ENV_TYPES, (
            f"native engine supports {sorted(_ENV_TYPES)}, got "
            f"'{env_name}' (use GymVectorEnv for the rest)")
        env_type, xml, frame_skip = _ENV_TYPES[env_name]
        self._lib = _load()
        xml_path = os.path.join(_assets_dir(), xml)
        self.max_episode_steps = max_episode_steps or 1000
        self._handle = self._lib.mjvec_create(
            xml_path.encode(), num_envs, env_type, frame_skip,
            self.max_episode_steps, seed, num_threads,
        )
        assert self._handle, f"mjvec_create failed for {xml_path}"
        self.name = env_name
        self.num_envs = num_envs
        self.observation_size = self._lib.mjvec_obs_dim(self._handle)
        self.action_size = self._lib.mjvec_act_dim(self._handle)
        self.discrete = False
        self.action_low = -np.ones(self.action_size, np.float32)
        self.action_high = np.ones(self.action_size, np.float32)
        self._obs = np.zeros(
            (num_envs, self.observation_size), np.float32)

    def reset(self, seed: int | None = None) -> np.ndarray:
        # (per-env rngs were seeded at create; reset draws fresh noise)
        self._lib.mjvec_reset_all(self._handle, self._obs)
        return self._obs.copy()

    def set_state(self, i: int, qpos: np.ndarray, qvel: np.ndarray):
        self._lib.mjvec_set_state(
            self._handle, i,
            np.ascontiguousarray(qpos, np.float64),
            np.ascontiguousarray(qvel, np.float64))
        self._lib.mjvec_get_obs(self._handle, self._obs)

    def step(self, normalized_actions: np.ndarray) -> Tuple[np.ndarray, ...]:
        n, od = self.num_envs, self.observation_size
        actions = np.ascontiguousarray(normalized_actions, np.float32)
        obs_prev = self._obs.copy()
        true_next = np.zeros((n, od), np.float32)
        reward = np.zeros((n,), np.float32)
        terminal = np.zeros((n,), np.uint8)
        done = np.zeros((n,), np.uint8)
        obs_after = np.zeros((n, od), np.float32)
        self._lib.mjvec_step(
            self._handle, actions, true_next, reward, terminal, done,
            obs_after,
        )
        self._obs = obs_after
        return (obs_prev, true_next, reward, terminal.astype(bool),
                done.astype(bool), obs_after.copy())

    def close(self) -> None:
        if self._handle:
            self._lib.mjvec_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

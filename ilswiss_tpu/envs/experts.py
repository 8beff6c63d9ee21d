"""Scripted expert policies for analytic envs.

Used to generate expert demonstrations for the IL stack (the reference
ships pre-trained demo pickles via demos_listing.yaml; here demos are
generated on device by scripted controllers or trained policies —
see scripts/gen_demos.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def pendulum_expert(obs: jnp.ndarray) -> jnp.ndarray:
    """Energy-shaping swing-up + PD balance for Pendulum.

    obs [..., 3] = (cos th, sin th, thdot); returns normalized action in
    [-1, 1] (env scales to +-2 torque).  Reaches ~-150/-250 return over
    200 steps — expert-quality for demo generation.
    """
    cos_th, sin_th, thdot = obs[..., 0], obs[..., 1], obs[..., 2]
    angle = jnp.arctan2(sin_th, cos_th)  # 0 at top

    # per-unit (m l^2) energy with g=10, l=1: E = .5 thdot^2 + 10 cos th
    energy = 0.5 * thdot**2 + 10.0 * cos_th
    e_target = 10.0

    # energy pumping: push along thdot when under-energized
    pump = jnp.clip(
        2.0 * (e_target - energy) * jnp.sign(thdot + 1e-6), -1.0, 1.0
    )
    # PD hold near the top
    pd = jnp.clip(-8.0 * angle - 2.0 * thdot, -2.0, 2.0) / 2.0

    near_top = jnp.logical_and(jnp.abs(angle) < 0.35, jnp.abs(thdot) < 8.0)
    return jnp.where(near_top, pd, pump)[..., None]


def mountain_expert(obs: jnp.ndarray) -> jnp.ndarray:
    """Bang-bang energy pumping for MountainCarContinuous: push along
    the velocity sign (classic optimal-ish controller).

    obs [..., 2] = (position, velocity); returns normalized action."""
    vel = obs[..., 1]
    return jnp.sign(vel + 1e-8)[..., None]


# name -> scripted controller fn(obs) -> normalized action.  The
# reference's gen_expert specs flag `use_scripted_policy`
# (gen_expert_demos.py scripted-policy branch); this registry is the
# TPU-side source of those scripted controllers.
SCRIPTED_EXPERTS = {
    "pendulum": pendulum_expert,
    "mountain": mountain_expert,
}

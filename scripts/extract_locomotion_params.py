"""Generate ilswiss_tpu/envs/_locomotion_params.py from the MuJoCo XMLs.

The on-device locomotion envs (ilswiss_tpu/envs/locomotion.py) run a
JAX rigid-body engine whose model constants (masses, inertias, joint
axes/anchors, capsule geometry, contact solver params) come from the
same gymnasium MuJoCo XMLs the reference trains on
(reference: rlkit/envs/envs_dict.py names -> gym MuJoCo envs).  This
script extracts them once with the `mujoco` package and writes them
into a generated python file, so the device envs import no native
code at runtime.  Re-run after changing the model set:

    python scripts/extract_locomotion_params.py

Joint support: free (quaternion root), slide, hinge.  Ball joints do
not occur in the benchmark family (ant/humanoid roots are free joints;
every other joint is scalar).  Fixed tendons exist in humanoid.xml but
are unlimited with zero stiffness/damping and no actuator transmission
targets them, so they are inert and not extracted.
"""

from __future__ import annotations

import os
import sys

import numpy as np


MODELS = {
    # name -> (xml, frame_skip)  [gymnasium v5 frame_skip]
    "hopper": ("hopper.xml", 4),
    "walker": ("walker2d.xml", 4),
    "halfcheetah": ("half_cheetah.xml", 5),
    "ant": ("ant.xml", 5),
    "humanoid": ("humanoid.xml", 5),
    "swimmer": ("swimmer.xml", 4),
    "invertedpendulum": ("inverted_pendulum.xml", 2),
    "inverteddoublependulum": ("inverted_double_pendulum.xml", 5),
}

_INTEGRATORS = {0: "euler", 1: "rk4", 2: "implicit", 3: "implicitfast"}
_JOINT_TYPES = {0: "free", 1: "ball", 2: "slide", 3: "hinge"}


def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def extract(xml_path):
    import mujoco

    m = mujoco.MjModel.from_xml_path(xml_path)

    joints = []
    for j in range(m.njnt):
        jtype = _JOINT_TYPES[int(m.jnt_type[j])]
        assert jtype in ("free", "slide", "hinge"), (
            f"unsupported joint type {jtype}")
        if jtype == "free":
            # free joints set the body frame directly from qpos
            # (mj_kinematics); only valid on world-rooted bodies
            assert m.body_parentid[m.jnt_bodyid[j]] == 0
            assert float(m.jnt_stiffness[j]) == 0.0
        joints.append(dict(
            type=jtype,
            body=int(m.jnt_bodyid[j]),
            qadr=int(m.jnt_qposadr[j]),
            dadr=int(m.jnt_dofadr[j]),
            axis=m.jnt_axis[j].tolist(),
            anchor=m.jnt_pos[j].tolist(),
            stiffness=float(m.jnt_stiffness[j]),
            limited=bool(m.jnt_limited[j]),
            range=m.jnt_range[j].tolist(),
            solref=m.jnt_solref[j].tolist(),
            solimp=m.jnt_solimp[j].tolist(),
        ))

    plane_ids = [g for g in range(m.ngeom) if m.geom_type[g] == 0]
    assert len(plane_ids) <= 1
    plane = plane_ids[0] if plane_ids else None

    geoms = []
    for g in range(m.ngeom):
        if g == plane:
            continue
        gtype = int(m.geom_type[g])
        # 2=sphere, 3=capsule; these models use only capsules + spheres
        # + the ground plane
        assert gtype in (2, 3), f"unsupported geom type {gtype}"
        if plane is not None:
            can_touch = bool(
                (m.geom_contype[g] & m.geom_conaffinity[plane])
                or (m.geom_contype[plane] & m.geom_conaffinity[g])
            )
        else:
            can_touch = False
        # MuJoCo pair-combination rules (equal priority): friction =
        # elementwise max, solref/solimp = solmix-weighted average
        # (solmix defaults to 1 -> plain average), margin = SUM of the
        # two geoms' margins, condim = max (verified via mjData.contact).
        if can_touch:
            fric = np.maximum(m.geom_friction[g], m.geom_friction[plane])
            solref = 0.5 * (m.geom_solref[g] + m.geom_solref[plane])
            solimp = 0.5 * (m.geom_solimp[g] + m.geom_solimp[plane])
            margin = float(m.geom_margin[g] + m.geom_margin[plane])
            condim = int(max(m.geom_condim[g], m.geom_condim[plane]))
        else:
            fric = m.geom_friction[g]
            solref = m.geom_solref[g]
            solimp = m.geom_solimp[g]
            margin = float(m.geom_margin[g])
            condim = int(m.geom_condim[g])
        assert condim in (1, 3), f"unsupported condim {condim}"
        geoms.append(dict(
            body=int(m.geom_bodyid[g]),
            pos=m.geom_pos[g].tolist(),
            mat=quat_to_mat(m.geom_quat[g]).tolist(),
            radius=float(m.geom_size[g][0]),
            half_len=float(m.geom_size[g][1]) if gtype == 3 else 0.0,
            contact=can_touch,
            condim=condim,
            friction=float(fric[0]),
            solref=np.asarray(solref).tolist(),
            solimp=np.asarray(solimp).tolist(),
            margin=float(margin),
        ))

    return dict(
        nq=int(m.nq), nv=int(m.nv), nbody=int(m.nbody), nu=int(m.nu),
        timestep=float(m.opt.timestep),
        gravity=m.opt.gravity.tolist(),
        integrator=_INTEGRATORS[int(m.opt.integrator)],
        density=float(m.opt.density),
        viscosity=float(m.opt.viscosity),
        wind=m.opt.wind.tolist(),
        body_parent=m.body_parentid.tolist(),
        body_pos=m.body_pos.tolist(),
        body_mat=[quat_to_mat(q).tolist() for q in m.body_quat],
        body_ipos=m.body_ipos.tolist(),
        body_imat=[quat_to_mat(q).tolist() for q in m.body_iquat],
        body_mass=m.body_mass.tolist(),
        body_inertia=m.body_inertia.tolist(),
        body_rootid=m.body_rootid.tolist(),
        joints=joints,
        dof_armature=m.dof_armature.tolist(),
        dof_damping=m.dof_damping.tolist(),
        qpos0=m.qpos0.tolist(),
        qpos_spring=m.qpos_spring.tolist(),
        # translational body inverse weights + dof inverse weights, used
        # by MuJoCo's constraint regularization (efc_diagApprox)
        body_invweight0=m.body_invweight0[:, 0].tolist(),
        dof_invweight0=m.dof_invweight0.tolist(),
        act_gear=m.actuator_gear[:, 0].tolist(),
        # actuator_trnid names a JOINT id; its dof address is the
        # actuation target (identity only for all-scalar models)
        act_dof=[int(m.jnt_dofadr[t]) for t in m.actuator_trnid[:, 0]],
        ctrl_range=m.actuator_ctrlrange.tolist(),
        floor_z=float(m.geom_pos[plane][2]) if plane is not None else None,
        geoms=geoms,
        sites=[dict(body=int(m.site_bodyid[s]), pos=m.site_pos[s].tolist())
               for s in range(m.nsite)],
    )


def main():
    import gymnasium.envs.mujoco as gm

    assets = os.path.join(os.path.dirname(gm.__file__), "assets")
    params = {}
    for name, (xml, frame_skip) in MODELS.items():
        p = extract(os.path.join(assets, xml))
        p["frame_skip"] = frame_skip
        p["xml"] = xml
        params[name] = p

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ilswiss_tpu", "envs", "_locomotion_params.py",
    )
    with open(out, "w") as f:
        f.write('"""GENERATED by scripts/extract_locomotion_params.py — '
                'do not edit.\n\nMuJoCo model constants for the on-device '
                'locomotion envs, extracted\nfrom the gymnasium MuJoCo '
                'XMLs (same models the reference trains on).\n"""\n\n')
        f.write("PARAMS = ")
        import pprint
        f.write(pprint.pformat(params, width=79, sort_dicts=True))
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())

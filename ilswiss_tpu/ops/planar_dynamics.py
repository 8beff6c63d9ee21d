"""Fully-fused planar forward dynamics for the 2-D locomotion family.

Hopper, Walker2d and HalfCheetah are planar kinematic chains: world-frame
root slides (x, z) plus hinges about ±y, with every body frame a pure
y-rotation.  The general engine (ops/rigid_body.py) treats them through
3-D autodiff — correct, but each forward evaluation lowers to thousands
of tiny XLA ops whose SERIAL DEPTH bounds throughput (the round-3 xprof
attribution, logs/device_op_table_r3_fused_hopper.json: the nested
while-loops of the substep/PGS chains are ~85% of device time).

Here the whole constrained forward dynamics —

    planar FK -> hinge anchors/CoMs -> analytic Jacobians -> mass matrix
    -> Cholesky -> Coriolis/gravity bias -> actuation/passive forces
    -> contact/limit rows -> W = M^-1 J^T -> projected Gauss-Seidel
    -> qacc (+ implicit-damping solve for Euler models)

— is ONE unrolled scalar graph over per-coordinate values, evaluated two
ways from the same source of truth (`_forward_math`):

  * per-env on any backend (values are 0-d arrays) — the reference used
    by the parity tests against the general engine;
  * as a single Pallas TPU kernel with the env batch on the 128-wide
    lane dimension (values are [1, Bt] rows in VMEM) — one kernel
    dispatch per forward evaluation instead of ~2k XLA ops.

Physics semantics mirror ops/rigid_body.py exactly (same row ordering,
same solimp/solref constants, same PGS update), which the engine in turn
pins against MuJoCo (tests/test_rigid_body.py).  The planar reductions
used (all verified against the engine in tests/test_planar_dynamics.py):

  * rotations about a common axis commute -> body angle = sum of hinge
    angles + fixed frame offsets;
  * hinge Jacobian of point p about world anchor a: Jv = s*(r_z, -r_x),
    Jw = s, with r = p - a and s the axis sign;
  * velocity-product acceleration: a_vp = sum_j qd_j s_j (rdot_z,
    -rdot_x) over hinge ancestors (slide columns are constant), and the
    angular bias vanishes (all rotation axes parallel -> alpha_vp = 0,
    omega x I omega = 0);
  * the capsule tangent frame has exactly one in-plane tangent, so every
    pyramid row is J_z + s*mu*tx*J_x for a scalar tx.

The reference framework has no analogue — its physics is the external
MuJoCo C engine reached through one OS process per env (SURVEY §2.4).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilswiss_tpu.ops.rigid_body import RigidModel


# --------------------------------------------------------------------------
# Compile-time planar model extraction
# --------------------------------------------------------------------------


class PlanarModel:
    """Static planar constants of a RigidModel, or raises ValueError."""

    def __init__(self, m: RigidModel):
        def _ang_of(R):
            if not (np.allclose(R[1], [0, 1, 0], atol=1e-12)
                    and np.allclose(R[:, 1], [0, 1, 0], atol=1e-12)):
                raise ValueError("body_mat is not a y-rotation")
            return math.atan2(R[0, 2], R[0, 0])

        if m.nq != m.nv:
            raise ValueError("quaternion joints are not planar")
        if m.has_fluid:
            raise ValueError("fluid model unsupported in planar path")
        if abs(m.gravity[0]) > 0 or abs(m.gravity[1]) > 0:
            raise ValueError("gravity must be -z")

        self.m = m
        self.nv, self.nbody = m.nv, m.nbody
        self.gz = float(m.gravity[2])
        self.timestep = m.timestep
        self.frame_skip = m.frame_skip
        self.integrator = m.integrator

        self.body_parent = list(m.body_parent)
        self.body_pos2 = []
        self.body_ang = []
        self.ipos2 = []
        for b in range(m.nbody):
            if abs(m.body_pos[b][1]) > 1e-12 or abs(m.body_ipos[b][1]) > 1e-12:
                raise ValueError("out-of-plane body offset")
            self.body_pos2.append((float(m.body_pos[b][0]),
                                   float(m.body_pos[b][2])))
            self.body_ang.append(_ang_of(m.body_mat[b]))
            self.ipos2.append((float(m.body_ipos[b][0]),
                               float(m.body_ipos[b][2])))
        self.mass = [float(v) for v in m.body_mass]
        # body-frame Iyy through the inertia frame (imat need not be a
        # y-rotation — halfcheetah's torso principal axes are tilted —
        # but world Iyy is invariant under the body's y-rotation and the
        # planar M/bias only ever read the [1,1] component)
        self.iyy = [
            float((m.body_imat[b] @ np.diag(m.body_inertia[b])
                   @ m.body_imat[b].T)[1, 1])
            for b in range(m.nbody)
        ]

        # joints grouped by body in application order; slides must precede
        # any rotation so their world axis is constant
        self.joints = []       # per body: list of dicts
        seen_hinge = False
        for b in range(m.nbody):
            js = []
            for j in m.joints_of_body.get(b, []):
                if j.type == "slide":
                    if seen_hinge:
                        raise ValueError("slide below a hinge")
                    if abs(j.axis[1]) > 1e-12:
                        raise ValueError("out-of-plane slide axis")
                    js.append(dict(kind="slide", dadr=j.dadr, qadr=j.qadr,
                                   ax=float(j.axis[0]), az=float(j.axis[2]),
                                   q0=float(m.qpos0[j.qadr])))
                elif j.type == "hinge":
                    if abs(j.axis[0]) > 1e-12 or abs(j.axis[2]) > 1e-12:
                        raise ValueError("non-y hinge axis")
                    if abs(j.anchor[1]) > 1e-12:
                        raise ValueError("out-of-plane hinge anchor")
                    seen_hinge = True
                    js.append(dict(kind="hinge", dadr=j.dadr, qadr=j.qadr,
                                   sign=float(np.sign(j.axis[1])),
                                   anx=float(j.anchor[0]),
                                   anz=float(j.anchor[2]),
                                   q0=float(m.qpos0[j.qadr])))
                else:
                    raise ValueError(f"joint type {j.type}")
            self.joints.append(js)

        self.armature = [float(v) for v in m.dof_armature]
        self.damping = [float(v) for v in m.dof_damping]
        self.stiffness = [float(v) for v in m.dof_stiffness]
        self.dof_qadr = [int(v) for v in m.dof_qadr]
        self.qpos_spring = [float(v) for v in m.qpos_spring]

        self.act_dof = [int(d) for d in m.act_dof]
        self.act_gear = [float(g) for g in m.act_gear]
        self.ctrl_lo = [float(v) for v in m.ctrl_range[:, 0]]
        self.ctrl_hi = [float(v) for v in m.ctrl_range[:, 1]]

        from ilswiss_tpu.ops.rigid_body import _kb
        # contact-free planar models (inverted pendulum family) have no
        # floor plane; m.contacts is then empty and floor_z unused
        self.floor_z = 0.0 if m.floor_z is None else float(m.floor_z)
        self.contacts = []
        for c in m.contacts:
            if abs(c["lpos"][1]) > 1e-9:
                raise ValueError("out-of-plane contact")
            k, bb = _kb(c["solref"], c["solimp"])
            self.contacts.append(dict(
                body=int(c["body"]),
                lx=float(c["lpos"][0]), lz=float(c["lpos"][2]),
                axis=(None if c["axis"] is None else
                      (float(c["axis"][0]), float(c["axis"][2]))),
                radius=float(c["radius"]), mu=float(c["friction"]),
                margin=float(c["margin"]), k=float(k), b=float(bb),
                solimp=[float(v) for v in c["solimp"]],
                diag=float(c["diag_approx"]),
            ))
        self.limits = []
        for lim in m.limits:
            k, bb = _kb(lim["solref"], lim["solimp"])
            self.limits.append(dict(
                dof=int(lim["dof"]), qadr=int(lim["qadr"]),
                side=float(lim["side"]), bound=float(lim["bound"]),
                k=float(k), b=float(bb),
                solimp=[float(v) for v in lim["solimp"]],
                diag=float(lim["diag_approx"]),
            ))
        self.ncon = len(self.contacts)
        self.nrow = 4 * self.ncon + len(self.limits)
        assert self.nrow == m.nrow


# Keyed on (id(m), weakref-to-m): the stored weakref keeps the entry
# pinned to the ORIGINAL model, so a GC'd RigidModel whose address gets
# reused by a new planar model cannot alias a stale None (which would
# silently drop the fast path).  The weakref itself holds no strong
# reference, so models remain collectible.
_PLANAR_CACHE: dict[int, tuple[Any, Any]] = {}

# test-only introspection hook: when set to a dict, _forward_math dumps
# its per-row solver quantities into it (tests/test_planar_dynamics.py)
_DEBUG_SINK: dict | None = None


def planar_model(m: RigidModel):
    """PlanarModel for m, or None if m is not a planar chain."""
    import weakref
    key = id(m)
    hit = _PLANAR_CACHE.get(key)
    if hit is not None and hit[0]() is m:
        return hit[1]
    try:
        value = PlanarModel(m)
    except ValueError:
        value = None
    _PLANAR_CACHE[key] = (weakref.ref(m), value)
    return value


# --------------------------------------------------------------------------
# The shared scalar-graph forward dynamics
# --------------------------------------------------------------------------


def _impedance_rt(solimp, pos, f32):
    """Runtime solimp impedance (rigid_body._impedance, scalar-graph)."""
    d0, dw, width, mid, power = solimp
    d0 = min(max(d0, 1e-4), 0.9999)
    dw = min(max(dw, 1e-4), 0.9999)
    x = jnp.clip(jnp.abs(pos) / max(width, 1e-12), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1.0)
    b = 1.0 / (1.0 - mid) ** (power - 1.0)
    y = jnp.where(x < mid, a * x ** power, 1.0 - b * (1.0 - x) ** power)
    return d0 + y * (dw - d0)


def _chol_solve(L_rows, rhs, nv):
    """Solve M x = rhs given the unrolled Cholesky factor (lower) of M,
    both as lists of scalars; returns list x."""
    y = [None] * nv
    for i in range(nv):
        s = rhs[i]
        for k in range(i):
            s = s - L_rows[i][k] * y[k]
        y[i] = s * L_rows[i][i + 1]      # [i][i+1] caches 1/L_ii
    x = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            s = s - L_rows[k][i] * x[k]
        x[i] = s * L_rows[i][i + 1]
    return x


def _forward_math(pm: PlanarModel, q, qd, ctrl, f0, iters: int,
                  h_damp: float | None):
    """One constrained forward evaluation as an unrolled scalar graph.

    q, qd, ctrl, f0: lists of same-shaped arrays (0-d per-env, or
    [1, Bt] rows inside the Pallas kernel).  Returns (qacc, con, f[,
    qacc_damped]) as lists; qacc_damped present iff h_damp is not None
    (the Euler integrator's (M + h*diag(damping))^-1 solve)."""
    nv, nb = pm.nv, pm.nbody
    zero = q[0] * 0.0

    # ---- FK: per body angle, origin, hinge world anchors --------------
    ang = [zero] * nb
    px = [zero] * nb
    pz = [zero] * nb
    cos_b = [zero + 1.0] * nb
    sin_b = [zero] * nb
    # per dof: kind, sign, world anchor (hinges)
    dof_kind = [None] * nv
    dof_sign = [0.0] * nv
    dof_ax = [None] * nv       # slide axis (floats)
    anc_x = [None] * nv
    anc_z = [None] * nv
    # hinge ancestor dof lists per body, in chain order
    hinges_of = [[] for _ in range(nb)]
    dofs_of = [[] for _ in range(nb)]

    for b in range(1, nb):
        par = pm.body_parent[b]
        a = ang[par] + pm.body_ang[b]
        c_p, s_p = cos_b[par], sin_b[par]
        bx, bz = pm.body_pos2[b]
        x = px[par] + c_p * bx + s_p * bz
        z = pz[par] - s_p * bx + c_p * bz
        hinges_of[b] = list(hinges_of[par])
        dofs_of[b] = list(dofs_of[par])
        c_a, s_a = jnp.cos(a), jnp.sin(a)
        for j in pm.joints[b]:
            d = j["dadr"]
            dofs_of[b].append(d)
            if j["kind"] == "slide":
                qj = q[j["qadr"]] - j["q0"]
                # world axis: rotation upstream is forbidden at build
                x = x + j["ax"] * qj
                z = z + j["az"] * qj
                dof_kind[d] = "slide"
                dof_ax[d] = (j["ax"], j["az"])
            else:
                qj = (q[j["qadr"]] - j["q0"]) * j["sign"]
                awx = x + c_a * j["anx"] + s_a * j["anz"]
                awz = z - s_a * j["anx"] + c_a * j["anz"]
                a = a + qj
                c_a, s_a = jnp.cos(a), jnp.sin(a)
                x = awx - (c_a * j["anx"] + s_a * j["anz"])
                z = awz - (-s_a * j["anx"] + c_a * j["anz"])
                dof_kind[d] = "hinge"
                dof_sign[d] = j["sign"]
                anc_x[d], anc_z[d] = awx, awz
                hinges_of[b].append(d)
        ang[b], px[b], pz[b] = a, x, z
        cos_b[b], sin_b[b] = c_a, s_a

    # ---- CoMs and analytic Jacobians ---------------------------------
    cx = [zero] * nb
    cz = [zero] * nb
    for b in range(1, nb):
        ix, iz = pm.ipos2[b]
        cx[b] = px[b] + cos_b[b] * ix + sin_b[b] * iz
        cz[b] = pz[b] - sin_b[b] * ix + cos_b[b] * iz

    def jac_point(ptx, ptz, dofs):
        """{dof: (Jvx, Jvz)} for a point attached rigidly below dofs."""
        out = {}
        for d in dofs:
            if dof_kind[d] == "slide":
                axl = dof_ax[d]
                out[d] = (zero + axl[0], zero + axl[1])
            else:
                s = dof_sign[d]
                rx = ptx - anc_x[d]
                rz = ptz - anc_z[d]
                out[d] = (s * rz, -(s * rx))
        return out

    Jc = [None] * nb          # CoM jacobians per body
    for b in range(1, nb):
        Jc[b] = jac_point(cx[b], cz[b], dofs_of[b])

    # ---- mass matrix + Cholesky --------------------------------------
    M = [[zero for _ in range(nv)] for _ in range(nv)]
    for b in range(1, nb):
        mb, ib = pm.mass[b], pm.iyy[b]
        ds = dofs_of[b]
        for ii, di in enumerate(ds):
            Jxi, Jzi = Jc[b][di]
            wi = dof_sign[di] if dof_kind[di] == "hinge" else 0.0
            for dj in ds[ii:]:
                Jxj, Jzj = Jc[b][dj]
                wj = dof_sign[dj] if dof_kind[dj] == "hinge" else 0.0
                t = mb * (Jxi * Jxj + Jzi * Jzj)
                if wi != 0.0 and wj != 0.0:
                    t = t + ib * (wi * wj)
                M[di][dj] = M[di][dj] + t
    for i in range(nv):
        M[i][i] = M[i][i] + pm.armature[i]
        for jj in range(i + 1, nv):
            M[jj][i] = M[i][jj]

    def chol(Mat):
        # rows of L; entry [i][i+1] stores 1/L_ii for the solves
        L = [[None] * (nv + 2) for _ in range(nv)]
        for i in range(nv):
            for jj in range(i + 1):
                s = Mat[i][jj]
                for k in range(jj):
                    s = s - L[i][k] * L[jj][k]
                if i == jj:
                    Lii = jnp.sqrt(jnp.maximum(s, 1e-12))
                    L[i][i] = Lii
                    L[i][i + 1] = 1.0 / Lii
                else:
                    L[i][jj] = s * L[jj][jj + 1]
        return L

    L = chol(M)

    # ---- bias (Coriolis + gravity), smooth forces --------------------
    # velocity of a point = sum_d qd_d * Jv(point, d)
    def vel_of(jac, dofs):
        vx, vz = zero, zero
        for d in dofs:
            Jx, Jz = jac[d]
            vx = vx + qd[d] * Jx
            vz = vz + qd[d] * Jz
        return vx, vz

    # anchor velocities: anchor of dof d moves with the frame ABOVE d
    anc_vel = {}
    for b in range(1, nb):
        for d in hinges_of[b]:
            if d in anc_vel:
                continue
            up = dofs_of[b][:dofs_of[b].index(d)]
            jac_a = jac_point(anc_x[d], anc_z[d], up)
            anc_vel[d] = vel_of(jac_a, up)

    bias = [zero] * nv
    for b in range(1, nb):
        vbx, vbz = vel_of(Jc[b], dofs_of[b])
        # a_vp = sum over hinge ancestors of qd_d * s * (rdot_z, -rdot_x)
        ax_, az_ = zero, zero
        for d in hinges_of[b]:
            s = dof_sign[d]
            avx, avz = anc_vel[d]
            rdx = vbx - avx
            rdz = vbz - avz
            ax_ = ax_ + qd[d] * (s * rdz)
            az_ = az_ + qd[d] * (-(s * rdx))
        fx = pm.mass[b] * ax_
        fz = pm.mass[b] * (az_ - pm.gz)
        for d in dofs_of[b]:
            Jx, Jz = Jc[b][d]
            bias[d] = bias[d] + Jx * fx + Jz * fz

    qfrc = [zero] * nv
    for u, d in enumerate(pm.act_dof):
        t = pm.act_gear[u] * jnp.clip(ctrl[u], pm.ctrl_lo[u], pm.ctrl_hi[u])
        qfrc[d] = qfrc[d] + t
    for d in range(nv):
        p = qfrc[d] - pm.damping[d] * qd[d] - bias[d]
        if pm.stiffness[d] != 0.0:
            p = p - pm.stiffness[d] * (q[pm.dof_qadr[d]]
                                       - pm.qpos_spring[d])
        qfrc[d] = p

    qacc_s = _chol_solve(L, qfrc, nv)

    if pm.nrow == 0:
        if h_damp is not None:
            Mh = [[M[i][jj] for jj in range(nv)] for i in range(nv)]
            for i in range(nv):
                Mh[i][i] = Mh[i][i] + h_damp * pm.damping[i]
            qacc_d = _chol_solve(chol(Mh), qfrc, nv)
            return qacc_s, [zero] * nv, [], qacc_d
        return qacc_s, [zero] * nv, []

    # ---- constraint rows (exact engine ordering) ---------------------
    # basis per contact: z-row (normal) and x-row (in-plane tangent)
    rows = []        # dicts: Jz/Jx (dof->scalar), tx, s*mu, aref, d, Rreg
    basis = []       # per contact: (Jz, Jx, dofs, point)
    for ci, c in enumerate(pm.contacts):
        b = c["body"]
        lx, lz = c["lx"], c["lz"]
        ccx = px[b] + cos_b[b] * lx + sin_b[b] * lz
        ccz = pz[b] - sin_b[b] * lx + cos_b[b] * lz
        gap = ccz - c["radius"] - pm.floor_z
        xcx = ccx
        xcz = ccz - (c["radius"] + 0.5 * gap)
        jac_c = jac_point(xcx, xcz, dofs_of[b])
        vx, vz = vel_of(jac_c, dofs_of[b])
        pos = gap - c["margin"]
        active = pos < 0.0
        dimp = _impedance_rt(c["solimp"], pos, None)
        # tangent frame (engine _linearization): t1 from the world
        # capsule axis, t2 = (-t1y, t1x); exactly one is in-plane
        if c["axis"] is None:
            t1x_ = zero            # t1 = ey
            t2x_ = zero - 1.0      # t2 = -ex
        else:
            awx = cos_b[b] * c["axis"][0] + sin_b[b] * c["axis"][1]
            Lax = jnp.abs(awx)
            safe = jnp.maximum(Lax, 1e-8)
            inpl = Lax > 1e-8
            t1x_ = jnp.where(inpl, -awx / safe, 0.0)
            t2x_ = jnp.where(inpl, 0.0, -1.0)
        basis.append((jac_c, dofs_of[b]))
        for tx in (t1x_, t2x_):
            vt = tx * vx
            for s in (1.0, -1.0):
                rows.append(dict(
                    contact=ci, tx=tx, smu=s * c["mu"],
                    aref=-c["b"] * (vz + s * c["mu"] * vt)
                         - c["k"] * dimp * pos,
                    dimp=dimp, active=active, diag=c["diag"],
                ))
    for lim in pm.limits:
        d = lim["dof"]
        pos = lim["side"] * (q[lim["qadr"]] - lim["bound"])
        active = pos < 0.0
        dimp = _impedance_rt(lim["solimp"], pos, None)
        rows.append(dict(
            contact=None, dof=d, side=lim["side"],
            aref=-lim["b"] * lim["side"] * qd[d]
                 - lim["k"] * dimp * pos,
            dimp=dimp, active=active, diag=lim["diag"],
        ))

    # ---- W = M^-1 J^T for the basis rows -----------------------------
    Wz, Wx = [], []
    Ann, Anx, Axx = [], [], []
    for (jac_c, dofs) in basis:
        rz = [zero] * nv
        rx = [zero] * nv
        for d in dofs:
            Jx, Jz = jac_c[d]
            rx[d] = Jx
            rz[d] = Jz
        wz = _chol_solve(L, rz, nv)
        wx = _chol_solve(L, rx, nv)
        Wz.append(wz)
        Wx.append(wx)
        Ann.append(sum(rz[d] * wz[d] for d in dofs))
        Anx.append(sum(rz[d] * wx[d] for d in dofs))
        Axx.append(sum(rx[d] * wx[d] for d in dofs))
    Wlim = {}
    Alim = {}
    for lim in pm.limits:
        d = lim["dof"]
        if d not in Wlim:
            e = [zero] * nv
            e[d] = zero + 1.0
            w = _chol_solve(L, e, nv)
            Wlim[d] = w
            Alim[d] = w[d]

    # per-row quantities
    for r in rows:
        dsafe = jnp.clip(r["dimp"], 1e-4, 1.0 - 1e-6)
        r["Rreg"] = jnp.maximum((1.0 - dsafe) / dsafe * r["diag"], 1e-15)
        if r["contact"] is not None:
            ci = r["contact"]
            mt = r["smu"] * r["tx"]
            Adiag = Ann[ci] + 2.0 * mt * Anx[ci] + mt * mt * Axx[ci]
        else:
            Adiag = Alim[r["dof"]]
        r["D"] = jnp.maximum(Adiag + r["Rreg"], 1e-9)

    # b_vec = J @ qacc_smooth - aref
    bq = []
    bx_ = []
    for (jac_c, dofs) in basis:
        bq.append(sum(jac_c[d][1] * qacc_s[d] for d in dofs))
        bx_.append(sum(jac_c[d][0] * qacc_s[d] for d in dofs))
    for r in rows:
        if r["contact"] is not None:
            ci = r["contact"]
            r["b"] = bq[ci] + r["smu"] * r["tx"] * bx_[ci] - r["aref"]
        else:
            r["b"] = r["side"] * qacc_s[r["dof"]] - r["aref"]

    if _DEBUG_SINK is not None:
        _DEBUG_SINK.update(rows=rows, basis=basis, Wz=Wz, Wx=Wx,
                           Ann=Ann, Anx=Anx, Axx=Axx, Wlim=Wlim)

    # ---- projected Gauss-Seidel on u = M^-1 J^T f --------------------
    f = [jnp.where(r["active"], f0[i], 0.0) for i, r in enumerate(rows)]
    u = [zero] * nv
    for i, r in enumerate(rows):
        if r["contact"] is not None:
            ci = r["contact"]
            mt = r["smu"] * r["tx"]
            for d in range(nv):
                u[d] = u[d] + f[i] * (Wz[ci][d] + mt * Wx[ci][d])
        else:
            w = Wlim[r["dof"]]
            for d in range(nv):
                u[d] = u[d] + f[i] * (r["side"] * w[d])

    def sweep(_, carry):
        f, u = carry
        f = list(f)
        u = list(u)
        for i, r in enumerate(rows):
            if r["contact"] is not None:
                ci = r["contact"]
                mt = r["smu"] * r["tx"]
                (jac_c, dofs) = basis[ci]
                Ju = sum((jac_c[d][1] + mt * jac_c[d][0]) * u[d]
                         for d in dofs)
                wrow = [Wz[ci][d] + mt * Wx[ci][d] for d in range(nv)]
            else:
                d0_ = r["dof"]
                Ju = r["side"] * u[d0_]
                wrow = [w_ * r["side"] for w_ in Wlim[d0_]]
                # note: side in J and W — f >= 0 applies to the signed row
            res = Ju + r["Rreg"] * f[i] + r["b"]
            fr = jnp.maximum(0.0, f[i] - res / r["D"])
            fr = jnp.where(r["active"], fr, 0.0)
            delta = fr - f[i]
            for d in range(nv):
                u[d] = u[d] + delta * wrow[d]
            f[i] = fr
        return tuple(f), tuple(u)

    f, u = jax.lax.fori_loop(0, iters, sweep, (tuple(f), tuple(u)))
    f = list(f)
    u = list(u)

    qacc = [qacc_s[d] + u[d] for d in range(nv)]
    con = [zero] * nv
    for i, r in enumerate(rows):
        if r["contact"] is not None:
            ci = r["contact"]
            mt = r["smu"] * r["tx"]
            (jac_c, dofs) = basis[ci]
            for d in dofs:
                con[d] = con[d] + f[i] * (jac_c[d][1] + mt * jac_c[d][0])
        else:
            con[r["dof"]] = con[r["dof"]] + f[i] * r["side"]

    if h_damp is not None:
        Mh = [[M[i][jj] for jj in range(nv)] for i in range(nv)]
        for i in range(nv):
            Mh[i][i] = Mh[i][i] + h_damp * pm.damping[i]
        rhs = [qfrc[d] + con[d] for d in range(nv)]
        qacc_d = _chol_solve(chol(Mh), rhs, nv)
        return qacc, con, f, qacc_d
    return qacc, con, f


# --------------------------------------------------------------------------
# Per-env (reference) evaluation
# --------------------------------------------------------------------------


def planar_forward_single(m: RigidModel, q, qd, ctrl, f0, iters: int = 15,
                          h_damp: float | None = None):
    """Per-env planar forward: (qacc [nv], qfrc_con [nv], f [nrow]
    [, qacc_damped]).  Mirrors rigid_body.forward()'s solve outputs."""
    pm = planar_model(m)
    assert pm is not None, "model is not planar"
    qs = [q[i] for i in range(pm.nv)]
    qds = [qd[i] for i in range(pm.nv)]
    cs = [ctrl[i] for i in range(len(pm.act_dof))]
    fs = [f0[i] for i in range(pm.nrow)]
    out = _forward_math(pm, qs, qds, cs, fs, iters, h_damp)
    if h_damp is None:
        qacc, con, f = out
        return jnp.stack(qacc), jnp.stack(con), (
            jnp.stack(f) if f else jnp.zeros(0, q.dtype))
    qacc, con, f, qacc_d = out
    return (jnp.stack(qacc), jnp.stack(con),
            jnp.stack(f) if f else jnp.zeros(0, q.dtype),
            jnp.stack(qacc_d))


# --------------------------------------------------------------------------
# Integrators over a pluggable forward (arrays stacked [nv(, B)])
# --------------------------------------------------------------------------

_RK4_A = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _substep(pm: PlanarModel, fwd, q, qd, ctrl, f0):
    """One integrator substep; mirrors rigid_body._euler_step /
    _rk4_step over stacked arrays ([nv] per-env or [nv, B] batched)."""
    h = pm.timestep
    if pm.integrator == "euler":
        qacc, con, f, qacc_d = fwd(q, qd, ctrl, f0, True)
        qd_new = qd + h * qacc_d
        q_new = q + h * qd_new
        return q_new, qd_new, con, f, (q, qd)
    qacc0, con, f = fwd(q, qd, ctrl, f0, False)
    vels = [qd]
    accs = [qacc0]
    for i in range(3):
        dq = sum(a * v for a, v in zip(_RK4_A[i], vels) if a != 0.0)
        dv = sum(a * acc for a, acc in zip(_RK4_A[i], accs) if a != 0.0)
        qi = q + h * dq
        vi = qd + h * dv
        qacci, _, f = fwd(qi, vi, ctrl, f, False)
        vels.append(vi)
        accs.append(qacci)
    dq = sum(b * v for b, v in zip(_RK4_B, vels))
    dv = sum(b * acc for b, acc in zip(_RK4_B, accs))
    return q + h * dq, qd + h * dv, con, f, (qi, vi)


def _control_step(pm: PlanarModel, fwd, q, qd, ctrl, f0):
    """frame_skip substeps (rigid_body.physics_step semantics)."""
    def body(carry, _):
        q_, qd_, _, f_, _ = carry
        out = _substep(pm, fwd, q_, qd_, ctrl, f_)
        return out, None

    con0 = jnp.zeros_like(qd)
    carry = (q, qd, con0, f0, (q, qd))
    carry, _ = jax.lax.scan(body, carry, None, length=pm.frame_skip)
    return carry


# --------------------------------------------------------------------------
# Pallas kernel: one forward evaluation, batch on lanes
# --------------------------------------------------------------------------


def _round8(x):
    return max(8, ((x + 7) // 8) * 8)


def _fwd_kernel(q_ref, qd_ref, c_ref, f_ref,
                qacc_ref, con_ref, fo_ref, *rest,
                pm: PlanarModel, iters: int, damped: bool):
    if damped:
        qd_out_ref = rest[0]
    qs = [q_ref[i:i + 1, :] for i in range(pm.nv)]
    qds = [qd_ref[i:i + 1, :] for i in range(pm.nv)]
    cs = [c_ref[i:i + 1, :] for i in range(len(pm.act_dof))]
    fs = [f_ref[i:i + 1, :] for i in range(pm.nrow)]
    out = _forward_math(pm, qs, qds, cs, fs, iters,
                        pm.timestep if damped else None)
    if damped:
        qacc, con, f, qacc_d = out
    else:
        qacc, con, f = out
    for i in range(pm.nv):
        qacc_ref[i:i + 1, :] = qacc[i]
        con_ref[i:i + 1, :] = con[i]
    for i in range(pm.nv, qacc_ref.shape[0]):
        qacc_ref[i:i + 1, :] = qacc[0] * 0.0
        con_ref[i:i + 1, :] = qacc[0] * 0.0
    for i in range(pm.nrow):
        fo_ref[i:i + 1, :] = f[i]
    for i in range(pm.nrow, fo_ref.shape[0]):
        fo_ref[i:i + 1, :] = qacc[0] * 0.0
    if damped:
        for i in range(pm.nv):
            qd_out_ref[i:i + 1, :] = qacc_d[i]
        for i in range(pm.nv, qd_out_ref.shape[0]):
            qd_out_ref[i:i + 1, :] = qacc[0] * 0.0


def _make_fwd_batched(pm: PlanarModel, iters: int, bt: int = 256,
                      interpret: bool = False):
    """fwd(qT, qdT, ctrlT, fT, damped) over padded [rows, Bp] arrays."""
    nvp = _round8(pm.nv)
    nup = _round8(max(1, len(pm.act_dof)))
    nrp = _round8(max(1, pm.nrow))

    def fwd(qT, qdT, cT, fT, damped: bool):
        bp = qT.shape[1]
        grid = (bp // bt,)
        spec = lambda rows: pl.BlockSpec((rows, bt), lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
        out_shape = [
            jax.ShapeDtypeStruct((nvp, bp), jnp.float32),
            jax.ShapeDtypeStruct((nvp, bp), jnp.float32),
            jax.ShapeDtypeStruct((nrp, bp), jnp.float32),
        ]
        out_specs = [spec(nvp), spec(nvp), spec(nrp)]
        if damped:
            out_shape.append(jax.ShapeDtypeStruct((nvp, bp), jnp.float32))
            out_specs.append(spec(nvp))
        res = pl.pallas_call(
            functools.partial(_fwd_kernel, pm=pm, iters=iters,
                              damped=damped),
            out_shape=tuple(out_shape),
            grid=grid,
            in_specs=[spec(nvp), spec(nvp), spec(nup), spec(nrp)],
            out_specs=tuple(out_specs),
            interpret=interpret,
        )(qT, qdT, cT, fT)
        return res

    return fwd, (nvp, nup, nrp)


@functools.lru_cache(maxsize=None)
def _make_planar_step(model_key: int, iters: int):
    m = _MODELS_BY_KEY[model_key]
    pm = planar_model(m)

    @jax.custom_batching.custom_vmap
    def step(q, qd, ctrl, f0):
        # per-env fallback: the general engine (bit-exact reference)
        from ilswiss_tpu.ops.rigid_body import physics_step
        return physics_step(m, q, qd, ctrl, iters=iters, f0=f0)

    @step.def_vmap
    def _rule(axis_size, in_batched, q, qd, ctrl, f0):
        # ILSWISS_PLANAR_INTERPRET=1 forces the kernel in Pallas
        # interpret mode on any backend (the CPU parity tests)
        interp = os.environ.get("ILSWISS_PLANAR_INTERPRET", "0") == "1"
        use_kernel = (
            (interp or jax.default_backend() == "tpu")
            and os.environ.get("ILSWISS_NO_PLANAR_KERNEL", "0") != "1"
            and jnp.result_type(q) == jnp.float32
        )
        ops = [q, qd, ctrl, f0]
        ops = [x if bat else jnp.broadcast_to(x, (axis_size,) + x.shape)
               for x, bat in zip(ops, in_batched)]
        if not use_kernel:
            from ilswiss_tpu.ops.rigid_body import physics_step
            out = jax.vmap(
                lambda q_, qd_, c_, f_: physics_step(
                    m, q_, qd_, c_, iters=iters, f0=f_))(*ops)
            return out, jax.tree.map(lambda _: True, out)

        qB, qdB, ctrlB, fB = ops
        B = qB.shape[0]
        bt = 256
        fwd, (nvp, nup, nrp) = _make_fwd_batched(
            pm, iters, bt=bt, interpret=interp)
        bp = ((max(B, 1) + bt - 1) // bt) * bt

        def to_rows(x, rows):
            xT = jnp.transpose(x, (1, 0)).astype(jnp.float32)
            return jnp.pad(xT, ((0, rows - xT.shape[0]),
                                (0, bp - B)))

        qT = to_rows(qB, nvp)
        qdT = to_rows(qdB, nvp)
        cT = to_rows(ctrlB, nup)
        fT = to_rows(fB, nrp) if pm.nrow else jnp.zeros((nrp, bp),
                                                        jnp.float32)

        def fwd_fn(q_, qd_, c_, f_, damped):
            return fwd(q_, qd_, c_, f_, damped)

        q_new, qd_new, con, f, (q_ev, qd_ev) = _control_step(
            pm, fwd_fn, qT, qdT, cT, fT)

        def back(xT, n):
            return jnp.transpose(xT[:n, :B], (1, 0)).astype(qB.dtype)

        out = (back(q_new, pm.nv), back(qd_new, pm.nv),
               back(con, pm.nv),
               back(f, pm.nrow) if pm.nrow else jnp.zeros(
                   (B, 0), qB.dtype),
               (back(q_ev, pm.nv), back(qd_ev, pm.nv)))
        return out, jax.tree.map(lambda _: True, out)

    return step


_MODELS_BY_KEY: dict[int, RigidModel] = {}


def planar_physics_step(m: RigidModel, q, qd, ctrl,
                        iters: int = 15, f0=None):
    """Drop-in for rigid_body.physics_step on planar models: same
    per-env signature and return pytree; under `vmap` on TPU the whole
    batch runs through the fused Pallas forward kernel (one dispatch
    per forward evaluation), with the general engine as the fallback
    everywhere else."""
    _MODELS_BY_KEY[id(m)] = m
    if f0 is None:
        f0 = jnp.zeros(m.nrow, q.dtype)
    return _make_planar_step(id(m), int(iters))(q, qd, ctrl, f0)


def physics_step_auto(m: RigidModel, q, qd, ctrl, iters: int = 15,
                      f0=None):
    """rigid_body.physics_step with the planar fast path: planar models
    route through planar_physics_step (fused Pallas forward under vmap
    on TPU), everything else through the general engine."""
    if planar_model(m) is not None:
        return planar_physics_step(m, q, qd, ctrl, iters=iters, f0=f0)
    from ilswiss_tpu.ops.rigid_body import physics_step
    return physics_step(m, q, qd, ctrl, iters=iters, f0=f0)

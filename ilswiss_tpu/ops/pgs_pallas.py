"""Batched projected-Gauss-Seidel constraint solve as ONE Pallas TPU kernel.

The rigid-body engine (ops/rigid_body.py) solves the regularized pyramidal
contact/limit problem with `iters` Gauss-Seidel sweeps over `nrow`
constraint rows.  Expressed in XLA that is a `fori_loop` whose body is an
unrolled chain of nrow row updates — thousands of *sequential* tiny ops
per control step, the serial-depth wall of the round-3 profile
(logs/BENCH_NOTES.md, logs/device_op_table_r3_fused_hopper.json).

Here the whole solve becomes one Pallas kernel in the factored "u-form":
instead of materializing A = J M^-1 J^T (O(nrow^2) memory — too large
for VMEM lane tiles on ant/humanoid), the kernel carries
u = M^-1 J^T f and updates it per row:

    res_r = J_r . u + Rreg_r f_r + b_r
    f_r  <- active_r ? max(0, f_r - res_r / D_r) : 0
    u    += (f_r_new - f_r_old) * W_r            (W = M^-1 J^T)

which is algebraically the same Gauss-Seidel iterate (A_r.f == J_r.u)
at O(nrow*nv) memory and 2*nv multiplies per row instead of nrow.

Layout: batch on the 128-wide lane dimension; J and W arrive as
[nrow, nv, B] so each row slice is a legal (>=8, >=128) VMEM tile; the
whole solve is one kernel dispatch with u/f resident in VMEM.

The public entry `pgs_solve` is a `jax.custom_batching.custom_vmap`
function: the engine calls it per-env under `vmap`, and the batching
rule routes the whole batch to the kernel on TPU (falling back to the
vmapped XLA loop on CPU, under float64, or with ILSWISS_NO_PGS_KERNEL=1
— the fallback is also the reference the parity tests pin the kernel
against, tests/test_pgs_pallas.py).

Reference correspondence: replaces the inner solve of MuJoCo's mj_solPGS
as re-derived in ops/rigid_body.py:_solve_rows; the reference framework
has no solver of its own (physics lives in the external MuJoCo C engine,
SURVEY.md §2.4).  Note the planar family (hopper/walker/halfcheetah)
normally bypasses this entirely via the fully-fused forward kernel
(ops/planar_dynamics.py); this kernel is the path for ant/humanoid and
any other non-planar contact model.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sweep_fallback(J, W, Rreg, b, D, active, f0, *, iters: int):
    """Per-env XLA reference implementation (u-form; same fixed point
    and sweep order as the engine's original A-form loop)."""
    nrow = f0.shape[0]
    f0 = jnp.where(active, f0, 0.0)
    u0 = W @ f0                                   # [nv]

    def sweep(_, carry):
        f, u = carry
        for r in range(nrow):
            res = J[r] @ u + Rreg[r] * f[r] + b[r]
            fr = jnp.maximum(0.0, f[r] - res / D[r])
            fr = jnp.where(active[r], fr, 0.0)
            u = u + (fr - f[r]) * W[:, r]
            f = f.at[r].set(fr)
        return f, u

    f, _ = jax.lax.fori_loop(0, iters, sweep, (f0, u0))
    return f


def _kernel(J_ref, W_ref, R_ref, b_ref, D_ref, m_ref, f0_ref,
            f_ref, u_ref, *, nrow: int, iters: int):
    """One B-tile of the batched u-form solve.  J/W: [NR, NV, Bt];
    vectors [NR, Bt]; scratch u [NV, Bt]."""
    f_ref[:] = f0_ref[:] * m_ref[:]
    u = jnp.zeros_like(u_ref)
    for r in range(nrow):
        u = u + W_ref[r] * f_ref[r:r + 1, :]
    u_ref[:] = u

    def sweep(_, carry):
        for r in range(nrow):
            u = u_ref[:]
            fr_old = f_ref[r:r + 1, :]
            res = (jnp.sum(J_ref[r] * u, axis=0, keepdims=True)
                   + R_ref[r:r + 1, :] * fr_old + b_ref[r:r + 1, :])
            fr = jnp.maximum(0.0, fr_old - res / D_ref[r:r + 1, :])
            fr = fr * m_ref[r:r + 1, :]
            u_ref[:] = u + (fr - fr_old) * W_ref[r]
            f_ref[r:r + 1, :] = fr
        return carry

    jax.lax.fori_loop(0, iters, sweep, 0)


def _pgs_kernel_batched(J, W, Rreg, b, D, active, f0, *, iters: int):
    """Whole-batch solve: J [B, nr, nv], W [B, nv, nr], vectors [B, nr]
    -> f [B, nr]."""
    B, nr, nv = J.shape
    nr_pad = max(8, _round_up(nr, 8))
    nv_pad = max(8, _round_up(nv, 8))
    bt = 128
    b_pad = _round_up(max(B, 1), bt)

    mask = active.astype(jnp.float32)

    def vec(x, fill=0.0):
        xT = jnp.transpose(x, (1, 0)).astype(jnp.float32)
        return jnp.pad(xT, ((0, nr_pad - nr), (0, b_pad - B)),
                       constant_values=fill)

    def rows3(x):     # [B, nr, nv] -> [nr, nv, B], padded
        xT = jnp.transpose(x, (1, 2, 0)).astype(jnp.float32)
        return jnp.pad(xT, ((0, nr_pad - nr), (0, nv_pad - nv),
                            (0, b_pad - B)))

    Jt = rows3(J)
    Wt = rows3(jnp.transpose(W, (0, 2, 1)))       # [nr, nv, B]
    args = (Jt, Wt, vec(Rreg), vec(b), vec(D, fill=1.0), vec(mask),
            vec(f0))

    grid = (b_pad // bt,)
    m3 = pl.BlockSpec((nr_pad, nv_pad, bt), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((nr_pad, bt), lambda i: (0, i),
                      memory_space=pltpu.VMEM)

    f_t = pl.pallas_call(
        functools.partial(_kernel, nrow=nr, iters=iters),
        out_shape=jax.ShapeDtypeStruct((nr_pad, b_pad), jnp.float32),
        grid=grid,
        in_specs=[m3, m3] + [v2] * 5,
        out_specs=v2,
        scratch_shapes=[pltpu.VMEM((nv_pad, bt), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * iters * nr * nv,
            bytes_accessed=(2 * Jt.size + 7 * nr_pad * b_pad) * 4,
            transcendentals=0,
        ),
    )(*args)
    return jnp.transpose(f_t[:nr, :B], (1, 0)).astype(J.dtype)


@functools.lru_cache(maxsize=None)
def _make_pgs(nrow: int, nv: int, iters: int):
    @jax.custom_batching.custom_vmap
    def pgs(J, W, Rreg, b, D, active, f0):
        return _sweep_fallback(J, W, Rreg, b, D, active, f0, iters=iters)

    @pgs.def_vmap
    def _rule(axis_size, in_batched, J, W, Rreg, b, D, active, f0):
        use_kernel = (
            jax.default_backend() == "tpu"
            and os.environ.get("ILSWISS_NO_PGS_KERNEL", "0") != "1"
            and jnp.result_type(J) == jnp.float32
        )
        ops = [J, W, Rreg, b, D, active, f0]
        ops = [x if bat else jnp.broadcast_to(x, (axis_size,) + x.shape)
               for x, bat in zip(ops, in_batched)]
        if use_kernel:
            out = _pgs_kernel_batched(*ops, iters=iters)
        else:
            out = jax.vmap(
                functools.partial(_sweep_fallback, iters=iters))(*ops)
        return out, True

    return pgs


def pgs_solve(J, W, Rreg, b, D, active, f0, *, iters: int):
    """Projected Gauss-Seidel solve of  (J M^-1 J^T + diag(Rreg)) f =
    -b,  f >= 0 (rows with active=False pinned to 0), warm-started at
    f0, given the factors J [nr, nv] and W = M^-1 J^T [nv, nr].

    Per-env signature — under `jax.vmap` the whole batch is dispatched
    to one Pallas TPU kernel; unbatched (or CPU / float64 / opt-out)
    calls run the XLA sweep loop."""
    return _make_pgs(int(f0.shape[0]), int(J.shape[1]),
                     int(iters))(J, W, Rreg, b, D, active, f0)

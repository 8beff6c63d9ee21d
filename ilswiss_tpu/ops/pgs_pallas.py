"""Batched projected-Gauss-Seidel constraint solve as ONE Pallas TPU kernel.

The rigid-body engine (ops/rigid_body.py) solves the regularized pyramidal
contact/limit problem with `iters` Gauss-Seidel sweeps over `nrow`
constraint rows.  Expressed in XLA that is a `fori_loop` whose body is an
unrolled chain of nrow row updates — 15 sweeps x 38 rows x 16 forward
evaluations = ~9k *sequential* tiny ops per Hopper control step, which is
exactly the serial-depth wall the round-3 profile identified
(logs/BENCH_NOTES.md): throughput saturates near 31k env-steps/s no matter
the batch size because each op also carries fixed dispatch overhead.

Here the whole solve becomes one Pallas kernel, vectorized over the env
batch:

  * layout: batch on the 128-wide lane dimension, constraint rows on
    sublanes — A arrives as [nrow, nrow, B], f/b/D/... as [nrow, B];
  * the sweep loop is a `fori_loop` *inside* the kernel whose body is the
    nrow row updates unrolled with static indices; every operand lives in
    VMEM for the kernel's whole lifetime, so a full solve costs one kernel
    dispatch and zero HBM round-trips;
  * row math is bit-identical in structure to the XLA fallback:
        res  = A[r] . f + Rreg[r]*f[r] + b[r]
        f[r] = active[r] ? max(0, f[r] - res / D[r]) : 0
    (same operation order; only float re-association differs).

The public entry `pgs_solve` is a `jax.custom_batching.custom_vmap`
function: the engine keeps calling it per-env under `vmap`, and the
batching rule routes the whole batch to the kernel on TPU (falling back to
the plain vmapped XLA loop on CPU, under float64, or when
ILSWISS_NO_PGS_KERNEL=1 — the fallback is also the reference the parity
test pins the kernel against, tests/test_pgs_pallas.py).

Reference correspondence: this replaces the inner solve of MuJoCo's
mj_solPGS as re-derived in ops/rigid_body.py:_solve_rows; the reference
framework itself has no solver (physics lives in the external MuJoCo C
engine, SURVEY.md §2.4).
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


def _sweep_fallback(A, Rreg, b, D, active, f0, *, iters: int):
    """Per-env XLA reference implementation (the engine's original loop)."""
    nrow = f0.shape[0]

    def sweep(_, f):
        for r in range(nrow):
            res = A[r] @ f + Rreg[r] * f[r] + b[r]
            fr = jnp.maximum(0.0, f[r] - res / D[r])
            f = f.at[r].set(jnp.where(active[r], fr, 0.0))
        return f

    f0 = jnp.where(active, f0, 0.0)
    return jax.lax.fori_loop(0, iters, sweep, f0)


def _kernel(A_ref, R_ref, b_ref, D_ref, m_ref, f0_ref, f_ref,
            *, nrow: int, iters: int):
    """One B-tile of the batched solve.  All refs are VMEM blocks with
    batch on lanes: A [NR, NR, Bt]; vectors [NR, Bt]."""
    f_ref[:] = f0_ref[:] * m_ref[:]

    def sweep(_, carry):
        for r in range(nrow):
            f = f_ref[:]
            res = (jnp.sum(A_ref[r] * f, axis=0, keepdims=True)
                   + R_ref[r:r + 1, :] * f[r:r + 1, :]
                   + b_ref[r:r + 1, :])
            fr = jnp.maximum(0.0, f[r:r + 1, :] - res / D_ref[r:r + 1, :])
            f_ref[r:r + 1, :] = fr * m_ref[r:r + 1, :]
        return carry

    jax.lax.fori_loop(0, iters, sweep, 0)


def _pick_batch_tile(nr_pad: int) -> int:
    """Largest lane tile keeping the A block comfortably inside VMEM
    (A dominates: NR*NR*Bt*4 bytes; vectors add 6*NR*Bt*4)."""
    budget = 6 * 1024 * 1024
    for bt in (512, 256, 128, 64, 32):
        if (nr_pad * nr_pad + 6 * nr_pad) * bt * 4 <= budget:
            return bt
    return 16


def _pgs_kernel_batched(A, Rreg, b, D, active, f0, *, iters: int):
    """Whole-batch solve: A [B, nr, nr], vectors [B, nr] -> f [B, nr]."""
    B, nr, _ = A.shape
    nr_pad = max(8, _round_up(nr, 8))
    bt = _pick_batch_tile(nr_pad)
    b_pad = _round_up(max(B, 1), bt)

    mask = active.astype(jnp.float32)

    def vec(x, fill=0.0):
        x = jnp.transpose(x, (1, 0)).astype(jnp.float32)
        return jnp.pad(x, ((0, nr_pad - nr), (0, b_pad - B)),
                       constant_values=fill)

    At = jnp.transpose(A, (1, 2, 0)).astype(jnp.float32)
    At = jnp.pad(At, ((0, nr_pad - nr), (0, nr_pad - nr), (0, b_pad - B)))
    # padded rows: D=1 avoids 0/0; mask=0 pins their force to zero
    args = (At, vec(Rreg), vec(b), vec(D, fill=1.0), vec(mask), vec(f0))

    grid = (b_pad // bt,)
    a_spec = pl.BlockSpec((nr_pad, nr_pad, bt), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((nr_pad, bt), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    f_t = pl.pallas_call(
        functools.partial(_kernel, nrow=nr, iters=iters),
        out_shape=jax.ShapeDtypeStruct((nr_pad, b_pad), jnp.float32),
        grid=grid,
        in_specs=[a_spec] + [v_spec] * 5,
        out_specs=v_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * iters * nr * (nr + 4),
            bytes_accessed=(At.size + 6 * nr_pad * b_pad) * 4,
            transcendentals=0,
        ),
    )(*args)
    return jnp.transpose(f_t[:nr, :B], (1, 0)).astype(A.dtype)


@functools.lru_cache(maxsize=None)
def _make_pgs(nrow: int, iters: int):
    @jax.custom_batching.custom_vmap
    def pgs(A, Rreg, b, D, active, f0):
        return _sweep_fallback(A, Rreg, b, D, active, f0, iters=iters)

    @pgs.def_vmap
    def _rule(axis_size, in_batched, A, Rreg, b, D, active, f0):
        use_kernel = (
            jax.default_backend() == "tpu"
            and os.environ.get("ILSWISS_NO_PGS_KERNEL", "0") != "1"
            and jnp.result_type(A) == jnp.float32
        )
        ops = [A, Rreg, b, D, active, f0]
        if use_kernel:
            # broadcast any unbatched operand so the kernel sees [B, ...]
            ops = [x if bat else jnp.broadcast_to(x, (axis_size,) + x.shape)
                   for x, bat in zip(ops, in_batched)]
            out = _pgs_kernel_batched(*ops, iters=iters)
        else:
            out = jax.vmap(
                functools.partial(_sweep_fallback, iters=iters),
                in_axes=tuple(0 if bat else None for bat in in_batched),
            )(*ops)
        return out, True

    return pgs


def pgs_solve(A, Rreg, b, D, active, f0, *, iters: int):
    """Projected Gauss-Seidel solve of  (A + diag(Rreg)) f = -b,  f >= 0
    (rows with active=False pinned to 0), warm-started at f0.

    Per-env signature — under `jax.vmap` the whole batch is dispatched to
    one Pallas TPU kernel; unbatched (or CPU / float64 / opt-out) calls
    run the original XLA sweep loop."""
    return _make_pgs(int(f0.shape[0]), int(iters))(A, Rreg, b, D, active, f0)

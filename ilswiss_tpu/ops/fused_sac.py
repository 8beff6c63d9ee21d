"""Fused SAC update chain: K gradient steps as ONE Pallas kernel.

Why: at the reference's production schedule (1 gradient step per env
step, batch 512 — exp_specs/sac/sac_hopper.yaml), the fused actor-
learner loop runs `num_envs` SEQUENTIAL batch-512 SAC updates per
iteration.  Each update is ~40 small XLA ops over 256-wide matmuls, so
the chain is dispatch-bound: ~70us per grad step (~7% MFU) and ~9 ms of
the ~16 ms iteration (logs/BENCH_NOTES.md).  This kernel runs the WHOLE
chain — twin-critic forward/backward, tanh-Gaussian policy
forward/backward, Adam moments, alpha control loop and Polyak targets —
inside one Mosaic program with every parameter and optimizer moment
resident in VMEM; only the K pre-sampled replay batches stream in from
HBM (pipelined by the Pallas grid).

Semantics: bit-for-bit the SAME update as `SAC.train_step`
(algorithms/sac.py, itself formula-matched to the reference
rlkit/torch/algorithms/sac/sac_alpha.py:78-187) up to matmul precision:
the caller pre-draws the two Gaussian noise tensors from exactly the
keys `train_step` would have split, so a scan of train_step and one
fused chain agree to float tolerance (tests/test_fused_sac.py pins
this).  Hand-derived backward notes:

  * tanh-Gaussian log-prob logpi(mean, ls, z, a) with z = mean+sigma*eps,
    a = tanh(z): the base-Normal term's direct partials are
    d/dmean = +eps*e^-ls, d/dz = -eps*e^-ls, d/dls = eps^2 - 1 (the
    quadratic term's chain contributions cancel), and the Jacobian
    correction -log(1-a^2+1e-6) gives d/da = 2a/(1-a^2+1e-6) — the same
    1e-6 epsilon as models/distributions.py (reference
    distributions.py:74-97).
  * the min() over twin critics routes the policy gradient to the
    argmin critic (ties are measure-zero), matching lax.reduce_min's
    VJP.
  * log-std clamp [-20, 2] (reference policies.py:15-16) masks its
    gradient outside the open interval.
  * Adam matches optax.adam(b1, 0.999): m-hat/v-hat bias correction
    with t = count + k + 1, update = -lr * m-hat / (sqrt(v-hat) + 1e-8);
    optax.flatten makes the flat moment vectors a pure layout change,
    undone/redone here with ravel_pytree.

Matmuls run on the MXU in bfloat16 with float32 accumulation by default
(JAX's own default TPU matmul precision for f32 operands); pass
matmul_dtype=jnp.float32 for strict-parity runs/tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

TANH_EPS = 1e-6
LOG_SIG_MIN = -20.0
LOG_SIG_MAX = 2.0
ADAM_EPS = 1e-8
ADAM_B2 = 0.999


# ---------------------------------------------------------------------------
# Param (un)packing: flax dicts + optax.flatten moments <-> plain arrays
# ---------------------------------------------------------------------------

def _policy_tensors(policy_params: Dict, num_hidden: int):
    p = policy_params["params"]
    out = []
    for i in range(num_hidden):
        lay = p[f"hidden_{i}"]
        out += [lay["kernel"], lay["bias"][None, :]]
    out += [p["mean"]["kernel"], p["mean"]["bias"][None, :],
            p["log_std"]["kernel"], p["log_std"]["bias"][None, :]]
    return out


def _policy_tree_from(tensors, template: Dict, num_hidden: int):
    p = {}
    it = iter(tensors)
    for i in range(num_hidden):
        k = next(it); b = next(it)
        p[f"hidden_{i}"] = {"kernel": k, "bias": b[0]}
    km, bm, ks, bs = next(it), next(it), next(it), next(it)
    p["mean"] = {"kernel": km, "bias": bm[0]}
    p["log_std"] = {"kernel": ks, "bias": bs[0]}
    return {"params": p}


def _critic_tensors(qf_params: Dict, num_hidden: int):
    p = qf_params["params"]["mlp"]
    out = []
    for i in range(num_hidden):
        lay = p[f"hidden_{i}"]
        out += [lay["kernel"], lay["bias"][:, None, :]]   # [2,1,H]
    out += [p["output"]["kernel"], p["output"]["bias"][:, None, :]]
    return out


def _critic_tree_from(tensors, num_hidden: int):
    p = {}
    it = iter(tensors)
    for i in range(num_hidden):
        k = next(it); b = next(it)
        p[f"hidden_{i}"] = {"kernel": k, "bias": b[:, 0, :]}
    k = next(it); b = next(it)
    p["output"] = {"kernel": k, "bias": b[:, 0, :]}
    return {"params": {"mlp": p}}


def _adam_moments(opt_state, params):
    """(mu, nu, count) of an optax.flatten(optax.adam(...)) state as
    trees shaped like `params`."""
    adam = opt_state[0]  # ScaleByAdamState on the flat vector
    _, unravel = ravel_pytree(params)
    return unravel(adam.mu), unravel(adam.nu), adam.count


def _rebuild_opt(opt_state, params, mu_tree, nu_tree, count):
    flat_mu, _ = ravel_pytree(mu_tree)
    flat_nu, _ = ravel_pytree(nu_tree)
    adam = opt_state[0]._replace(count=count, mu=flat_mu, nu=flat_nu)
    return (adam,) + tuple(opt_state[1:])


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _linear(x, w, b, dt):
    y = jax.lax.dot_general(
        x.astype(dt), w.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + b


def _matT_a(x, d, dt):
    """x^T @ d with contraction over the batch (axis 0 of both)."""
    return jax.lax.dot_general(
        x.astype(dt), d.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _a_matT(d, w, dt):
    """d @ w^T, contraction over the output axis."""
    return jax.lax.dot_general(
        d.astype(dt), w.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(*, num_hidden: int, cfg, target_entropy: float,
                 batch: int, act_dim: int, matmul_dtype):
    L = num_hidden
    NP = 2 * L + 4          # policy tensors
    NC = 2 * L + 2          # critic tensors (stacked [2,...])
    B = batch
    dt = matmul_dtype
    gamma = float(cfg.discount)
    rscale = float(cfg.reward_scale)
    tau = float(cfg.soft_target_tau)
    b1 = float(cfg.beta_1)
    lam_m = float(cfg.policy_mean_reg_weight)
    lam_s = float(cfg.policy_std_reg_weight)
    lr_q, lr_p, lr_a = (float(cfg.qf_lr), float(cfg.policy_lr),
                        float(cfg.alpha_lr))
    train_alpha = bool(cfg.train_alpha)
    log_amin = float(np.log(cfg.min_alpha))
    log_amax = float(np.log(cfg.max_alpha))
    q_lo = -np.inf if cfg.q_target_min is None else float(cfg.q_target_min)
    q_hi = np.inf if cfg.q_target_max is None else float(cfg.q_target_max)
    clip_q = np.isfinite(q_lo) or np.isfinite(q_hi)

    # Mosaic has no powf lowering; beta^t == exp(t * log(beta)) with
    # log(beta) folded at trace time (betas are Python floats).
    log_b1 = float(np.log(b1))
    log_b2 = float(np.log(ADAM_B2))

    def adam(p, g, m, v, t, lr):
        m = b1 * m + (1.0 - b1) * g
        v = ADAM_B2 * v + (1.0 - ADAM_B2) * g * g
        mh = m / (1.0 - jnp.exp(t * log_b1))
        vh = v / (1.0 - jnp.exp(t * log_b2))
        return p - lr * mh / (jnp.sqrt(vh) + ADAM_EPS), m, v

    def policy_fwd(P, o):
        """Returns (mean, ls_raw, activations [o, g1..gL])."""
        acts = [o]
        x = o
        for i in range(L):
            x = jnp.maximum(_linear(x, P[2 * i], P[2 * i + 1], dt), 0.0)
            acts.append(x)
        mean = _linear(x, P[2 * L], P[2 * L + 1], dt)
        ls_raw = _linear(x, P[2 * L + 2], P[2 * L + 3], dt)
        return mean, ls_raw, acts

    def critic_fwd(C, e, x):
        acts = [x]
        for i in range(L):
            x = jnp.maximum(
                _linear(x, C[2 * i][e], C[2 * i + 1][e], dt), 0.0)
            acts.append(x)
        q = _linear(x, C[2 * L][e], C[2 * L + 1][e], dt)
        return q, acts

    def kernel(*refs):
        # ---- ref unpack (order mirrors fused_sac_chain's operands) ----
        it = iter(range(len(refs)))
        nxt = lambda: refs[next(it)]
        t0_ref = nxt()
        obs_r, act_r, rew_r, term_r, nobs_r, epsn_r, epsw_r = (
            nxt(), nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
        P_in = [nxt() for _ in range(NP)]
        C_in = [nxt() for _ in range(NC)]
        T_in = [nxt() for _ in range(NC)]
        Pm_in = [nxt() for _ in range(NP)]
        Pv_in = [nxt() for _ in range(NP)]
        Cm_in = [nxt() for _ in range(NC)]
        Cv_in = [nxt() for _ in range(NC)]
        alpha_in = nxt()
        # outputs
        P_o = [nxt() for _ in range(NP)]
        C_o = [nxt() for _ in range(NC)]
        T_o = [nxt() for _ in range(NC)]
        Pm_o = [nxt() for _ in range(NP)]
        Pv_o = [nxt() for _ in range(NP)]
        Cm_o = [nxt() for _ in range(NC)]
        Cv_o = [nxt() for _ in range(NC)]
        alpha_o = nxt()
        met_o = nxt()

        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            for src, dst in zip(
                    P_in + C_in + T_in + Pm_in + Pv_in + Cm_in + Cv_in
                    + [alpha_in],
                    P_o + C_o + T_o + Pm_o + Pv_o + Cm_o + Cv_o
                    + [alpha_o]):
                dst[...] = src[...]

        P = [r[...] for r in P_o]
        C = [r[...] for r in C_o]
        T = [r[...] for r in T_o]
        t = (t0_ref[0, 0] + k + 1).astype(jnp.float32)

        o = obs_r[0]
        a_taken = act_r[0]
        rew = rew_r[0]
        term = term_r[0]
        no = nobs_r[0]
        eps_n = epsn_r[0]
        eps_w = epsw_r[0]
        log_alpha = alpha_o[0, 0]
        alpha = jnp.exp(log_alpha)

        # ---- critic target (no grads; sac_alpha.py:96-123) -----------
        mean_n, lsr_n, _ = policy_fwd(P, no)
        ls_n = jnp.clip(lsr_n, LOG_SIG_MIN, LOG_SIG_MAX)
        z_n = mean_n + jnp.exp(ls_n) * eps_n
        a_n = jnp.tanh(z_n)
        logpi_n = jnp.sum(
            -0.5 * (eps_n * eps_n + 2.0 * ls_n + np.log(2.0 * np.pi))
            - jnp.log(1.0 - a_n * a_n + TANH_EPS),
            axis=-1, keepdims=True)
        xt = jnp.concatenate([no, a_n], axis=-1)
        tq0, _ = critic_fwd(T, 0, xt)
        tq1, _ = critic_fwd(T, 1, xt)
        min_tq = jnp.minimum(tq0, tq1)
        y = (rscale * rew
             + (1.0 - term) * gamma * (min_tq - alpha * logpi_n))
        if clip_q:
            y = jnp.clip(y, q_lo, q_hi)

        # ---- critic update (fwd + hand backward + Adam) --------------
        x = jnp.concatenate([o, a_taken], axis=-1)
        Cg = [[] for _ in range(NC)]           # per-tensor [per-critic]
        q_preds = []
        qf_losses = []
        for e in range(2):
            q, acts = critic_fwd(C, e, x)
            q_preds.append(q)
            qf_losses.append(0.5 * jnp.mean((q - y) ** 2))
            d = (q - y) * (1.0 / B)            # dL/dq
            for i in range(L, -1, -1):
                Cg[2 * i].append(_matT_a(acts[i], d, dt))
                Cg[2 * i + 1].append(
                    jnp.sum(d, axis=0, keepdims=True)[None])
                if i > 0:
                    d = _a_matT(d, C[2 * i][e], dt) * (acts[i] > 0.0)
        Cg = [jnp.stack(g) if g[0].ndim == 2 else jnp.concatenate(g)
              for g in Cg]
        C_new = []
        for j in range(NC):
            p_new, m_new, v_new = adam(
                C[j], Cg[j], Cm_o[j][...], Cv_o[j][...], t, lr_q)
            C_new.append(p_new)
            Cm_o[j][...] = m_new
            Cv_o[j][...] = v_new
            C_o[j][...] = p_new

        # ---- policy update against UPDATED critics (:142-155) --------
        mean, lsr, pacts = policy_fwd(P, o)
        ls = jnp.clip(lsr, LOG_SIG_MIN, LOG_SIG_MAX)
        sigma = jnp.exp(ls)
        z = mean + sigma * eps_w
        a_new = jnp.tanh(z)
        one_m_a2 = 1.0 - a_new * a_new
        logpi = jnp.sum(
            -0.5 * (eps_w * eps_w + 2.0 * ls + np.log(2.0 * np.pi))
            - jnp.log(one_m_a2 + TANH_EPS),
            axis=-1, keepdims=True)
        xn = jnp.concatenate([o, a_new], axis=-1)
        qn0, k_acts0 = critic_fwd(C_new, 0, xn)
        qn1, k_acts1 = critic_fwd(C_new, 1, xn)
        qmin = jnp.minimum(qn0, qn1)

        # upstream: dL/dq_e = -1/B routed to the argmin critic
        # (critic 0 wins ties — measure zero)
        sel0 = (qn0 <= qn1).astype(jnp.float32)
        da_q = jnp.zeros_like(a_new)
        for e, (sel, k_acts) in enumerate(
                ((sel0, k_acts0), (1.0 - sel0, k_acts1))):
            d = (-1.0 / B) * sel
            for i in range(L, 0, -1):
                d = _a_matT(d, C_new[2 * i][e], dt) * (k_acts[i] > 0.0)
            dxn = _a_matT(d, C_new[0][e], dt)
            da_q = da_q + dxn[:, o.shape[1]:]

        inv_sig = jnp.exp(-ls)
        scale = alpha / B
        da_tot = da_q + scale * 2.0 * a_new / (one_m_a2 + TANH_EPS)
        dz = da_tot * one_m_a2 - scale * eps_w * inv_sig
        dmean = dz + scale * eps_w * inv_sig \
            + (2.0 * lam_m / (B * act_dim)) * mean
        dls = (dz * sigma * eps_w + scale * (eps_w * eps_w - 1.0)
               + (2.0 * lam_s / (B * act_dim)) * ls)
        dls_raw = dls * ((lsr > LOG_SIG_MIN) & (lsr < LOG_SIG_MAX))

        Pg = [None] * NP
        gL = pacts[L]
        Pg[2 * L] = _matT_a(gL, dmean, dt)
        Pg[2 * L + 1] = jnp.sum(dmean, axis=0, keepdims=True)
        Pg[2 * L + 2] = _matT_a(gL, dls_raw, dt)
        Pg[2 * L + 3] = jnp.sum(dls_raw, axis=0, keepdims=True)
        d = (_a_matT(dmean, P[2 * L], dt)
             + _a_matT(dls_raw, P[2 * L + 2], dt)) * (gL > 0.0)
        for i in range(L - 1, -1, -1):
            Pg[2 * i] = _matT_a(pacts[i], d, dt)
            Pg[2 * i + 1] = jnp.sum(d, axis=0, keepdims=True)
            if i > 0:
                d = _a_matT(d, P[2 * i], dt) * (pacts[i] > 0.0)

        for j in range(NP):
            p_new, m_new, v_new = adam(
                P[j], Pg[j], Pm_o[j][...], Pv_o[j][...], t, lr_p)
            P_o[j][...] = p_new
            Pm_o[j][...] = m_new
            Pv_o[j][...] = v_new

        policy_loss = (jnp.mean(alpha * logpi - qmin)
                       + lam_m * jnp.mean(mean * mean)
                       + lam_s * jnp.mean(ls * ls))

        # ---- alpha update (:160-166) ---------------------------------
        ga = -jnp.mean(logpi + target_entropy)
        alpha_loss = log_alpha * ga
        if train_alpha:
            avec = alpha_o[...]
            la, am, av = adam(avec[0, 0], ga, avec[1, 0], avec[2, 0],
                              t, lr_a)
            la = jnp.clip(la, log_amin, log_amax)
            alpha_o[...] = jnp.stack([la, am, av]).reshape(3, 1)

        # ---- Polyak on targets (:245-247) ----------------------------
        for j in range(NC):
            T_o[j][...] = (1.0 - tau) * T[j] + tau * C_new[j]

        # Full-array metrics block (Mosaic rejects (1, 8) tiles on a
        # (K, 8) array: the sublane dim must be a multiple of 8 or the
        # whole array) — each step dynamic-stores its own row k.
        met_o[pl.dslice(k, 1), :] = jnp.stack([
            qf_losses[0], qf_losses[1], policy_loss, alpha_loss,
            alpha, jnp.mean(q_preds[0]), jnp.mean(q_preds[1]),
            jnp.mean(logpi),
        ]).reshape(1, 8)

    return kernel


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def fused_sac_chain(sac, state, batches: Dict[str, jnp.ndarray],
                    eps_next: jnp.ndarray, eps_new: jnp.ndarray,
                    *, interpret: bool = False,
                    matmul_dtype=jnp.bfloat16):
    """Run K fused SAC gradient steps.

    batches: dict of [K, B, ...] arrays (obs/action/reward/terminal/
    next_obs) pre-sampled from the replay ring; eps_*: [K, B, act_dim]
    standard-normal draws from the keys train_step would have used.
    Returns (new SACState, metrics dict of [K]-vectors).
    """
    cfg = sac.config
    L = len(sac.policy.hidden_sizes)
    K, B = batches["reward"].shape[0], batches["reward"].shape[1]
    da = sac.action_size

    P = [jnp.asarray(x, jnp.float32)
         for x in _policy_tensors(state.policy_params, L)]
    C = [jnp.asarray(x, jnp.float32)
         for x in _critic_tensors(state.qf_params, L)]
    T = [jnp.asarray(x, jnp.float32)
         for x in _critic_tensors(state.target_qf_params, L)]
    pm_t, pv_t, p_count = _adam_moments(state.policy_opt,
                                        state.policy_params)
    cm_t, cv_t, c_count = _adam_moments(state.qf_opt, state.qf_params)
    am_t, av_t, a_count = _adam_moments(state.alpha_opt, state.log_alpha)
    Pm = _policy_tensors(pm_t, L)
    Pv = _policy_tensors(pv_t, L)
    Cm = _critic_tensors(cm_t, L)
    Cv = _critic_tensors(cv_t, L)
    alpha_vec = jnp.stack([
        state.log_alpha.astype(jnp.float32),
        jnp.asarray(am_t, jnp.float32),
        jnp.asarray(av_t, jnp.float32),
    ]).reshape(3, 1)
    # KNOWN LIMITATION: one shared Adam step counter.  The kernel's
    # bias correction uses t = p_count + k + 1 for ALL three optimizers
    # — exact while policy/qf/alpha counts advance in lockstep, which
    # every shipped config does (train_step always steps all three).
    # If counts ever diverge (e.g. resuming a train_alpha=false run
    # with train_alpha flipped on), the alpha/qf corrections would be
    # computed at the policy's t; use the scan path for such resumes.
    t0 = jnp.asarray(p_count, jnp.int32).reshape(1, 1)

    rew = batches["reward"].reshape(K, B, 1).astype(jnp.float32)
    term = batches["terminal"].reshape(K, B, 1).astype(jnp.float32)
    operands = [
        t0,
        batches["obs"].astype(jnp.float32),
        batches["action"].astype(jnp.float32),
        rew, term,
        batches["next_obs"].astype(jnp.float32),
        eps_next.astype(jnp.float32), eps_new.astype(jnp.float32),
    ] + P + C + T + Pm + Pv + Cm + Cv + [alpha_vec]

    n_params = len(P) + len(C) + len(T)
    n_opt = len(Pm) + len(Pv) + len(Cm) + len(Cv)

    def full_spec(x):
        return pl.BlockSpec(
            x.shape, lambda k: (0,) * x.ndim, memory_space=pltpu.VMEM)

    def batch_spec(x):
        return pl.BlockSpec(
            (1,) + x.shape[1:],
            lambda k, _nd=x.ndim: (k,) + (0,) * (_nd - 1),
            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((1, 1), lambda k: (0, 0),
                      memory_space=pltpu.SMEM)]
        + [batch_spec(x) for x in operands[1:8]]
        + [full_spec(x) for x in operands[8:]]
    )
    state_out = operands[8:]  # params + opt + alpha, same structure out
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)
                   for x in state_out]
                  + [jax.ShapeDtypeStruct((K, 8), jnp.float32)])
    out_specs = ([full_spec(x) for x in state_out]
                 + [pl.BlockSpec((K, 8), lambda k: (0, 0),
                                 memory_space=pltpu.VMEM)])

    kernel = _make_kernel(
        num_hidden=L, cfg=cfg,
        target_entropy=float(sac.target_entropy),
        batch=B, act_dim=da, matmul_dtype=matmul_dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands)

    NP = 2 * L + 4
    NC = 2 * L + 2
    i = 0
    P_new = outs[i:i + NP]; i += NP
    C_new = outs[i:i + NC]; i += NC
    T_new = outs[i:i + NC]; i += NC
    Pm_new = outs[i:i + NP]; i += NP
    Pv_new = outs[i:i + NP]; i += NP
    Cm_new = outs[i:i + NC]; i += NC
    Cv_new = outs[i:i + NC]; i += NC
    alpha_new = outs[i]; i += 1
    metrics_arr = outs[i]

    policy_params = _policy_tree_from(P_new, state.policy_params, L)
    qf_params = _critic_tree_from(C_new, L)
    target_qf = _critic_tree_from(T_new, L)
    new_count_p = p_count + K
    policy_opt = _rebuild_opt(
        state.policy_opt, state.policy_params,
        _policy_tree_from(Pm_new, state.policy_params, L),
        _policy_tree_from(Pv_new, state.policy_params, L), new_count_p)
    qf_opt = _rebuild_opt(
        state.qf_opt, state.qf_params,
        _critic_tree_from(Cm_new, L), _critic_tree_from(Cv_new, L),
        c_count + K)
    alpha_opt = _rebuild_opt(
        state.alpha_opt, state.log_alpha,
        alpha_new[1, 0], alpha_new[2, 0],
        a_count + (K if cfg.train_alpha else 0))

    new_state = state.replace(
        policy_params=policy_params,
        qf_params=qf_params,
        target_qf_params=target_qf,
        log_alpha=alpha_new[0, 0],
        policy_opt=policy_opt,
        qf_opt=qf_opt,
        alpha_opt=alpha_opt,
    )
    names = ["qf1_loss", "qf2_loss", "policy_loss", "alpha_loss",
             "alpha", "q1_pred_mean", "q2_pred_mean", "log_pi_mean"]
    metrics = {n: metrics_arr[:, j] for j, n in enumerate(names)}
    return new_state, metrics

"""Fused whole-solve batched MPPI Pallas kernel (round 5).

models/mppi.mppi_solve_batched under XLA is `iters` sequential rounds of
(sample -> T-step rollout scan -> softmax -> update); at the benched
(N=256, K=256, T=40, iters=8) every one of the ~320 sequential rollout
steps is a tiny fused (N*K,)-shaped op — the program is
fusion-dispatch-latency bound, the same disease the whole-T estimator
kernels cured (kernels/kalman_batched.py, ekf.py, ukf.py). This kernel
runs the ENTIRE solve — all `iters` importance-sampling rounds, each
with its full T-step rollout, softmax weighting, and nominal update —
inside one kernel invocation.

Layout: samples ride the 128-wide lanes (K per scenario), SC scenarios
ride the sublanes, so every vector is an (SC, K) tile with full (8, 128)
VPU occupancy. Per-scenario reductions (softmax max/sum, ESS, weighted
control updates) are axis=1 lane reductions with keepdims — never across
scenarios. The perturbations eps are PRE-generated outside with the
exact key stream of the XLA path (split(key, N) then split(key_i,
iters), normal((K, T, m)) * sigma), so kernel == XLA to fp tolerance;
time rides the MAJOR ref axis ((R, SC, K) with R = iters*T*m — the
kernels/ukf.py Mosaic lesson: dynamic sublane offsets crash layout
inference).

Plant contract: f(x, u) written with component indexing + elementwise
jnp ops (models/plants.py house style — identical to kernels/ekf.py).
The stage cost must be provided in the same rows form:
cost_rows(x_rows, u_rows_or_None, t) -> (SC, K) — models/mppi.
quadratic_mppi_cost attaches one as `.rows`.

Reference parity: sampling MPC does not exist in the reference at all
(its eager one-op-per-dispatch model makes K-thousand sampled rollouts
intractable — SURVEY.md §3.2, /root/reference/src/numpower.c:193-282).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mppi_kernel(x0_ref, us0_ref, eps_ref, us_ref, ess_ref, *,
                 f, cost_rows, n: int, m: int, T: int, iters: int,
                 K: int, SC: int, lam: float, inv_sig2, u_lo, u_hi):
    """One grid step = SC scenarios x K samples. Everything is unrolled:
    iters x T plant/cost evaluations on (SC, K) tiles, iters softmax +
    nominal-update rounds on lane reductions."""

    def clipc(u):
        if u_lo is None and u_hi is None:
            return u
        return jnp.clip(u, u_lo, u_hi)

    # nominal controls: T*m per-scenario scalars carried as (SC, 1)
    u_nom = [us0_ref[0, r] * jnp.ones((SC, 1), us_ref.dtype)
             for r in range(T * m)]

    for it in range(iters):
        # rollout all K candidates for SC scenarios at once
        x = [jnp.stack([jnp.full((K,), x0_ref[s, j], us_ref.dtype)
                        for s in range(SC)]) for j in range(n)]
        S = jnp.zeros((SC, K), us_ref.dtype)
        cand = []                      # per t: list of m (SC, K) rows
        for t in range(T):
            u_rows = []
            for a in range(m):
                e = eps_ref[(it * T + t) * m + a]          # (SC, K)
                u_rows.append(clipc(u_nom[t * m + a] + e))
            cand.append(u_rows)
            S = S + cost_rows(x, u_rows, t)
            xn = f(x, u_rows)
            x = [xn[j] for j in range(n)]
        S = S + cost_rows(x, None, T)

        # information-theoretic coupling: lam * sum eps_eff sig^-2 u_nom
        couple = None
        for t in range(T):
            for a in range(m):
                term = ((cand[t][a] - u_nom[t * m + a])
                        * (inv_sig2[a] * u_nom[t * m + a]))
                couple = term if couple is None else couple + term
        S = S + lam * couple

        # softmax(-S/lam) over the K lanes, per scenario row; the stable
        # shift for a NEGATED argument is the row min (max of -S/lam)
        Smin = jnp.min(S, axis=1, keepdims=True)
        w = jnp.exp(-(S - Smin) * (1.0 / lam))
        w = w / jnp.sum(w, axis=1, keepdims=True)
        ess_ref[:, it] = 1.0 / jnp.sum(w * w, axis=1)

        for t in range(T):
            for a in range(m):
                du = jnp.sum(w * (cand[t][a] - u_nom[t * m + a]),
                             axis=1, keepdims=True)
                u_nom[t * m + a] = clipc(u_nom[t * m + a] + du)

    for r in range(T * m):
        us_ref[:, r] = u_nom[r][:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("f", "cost_rows", "T", "iters", "m", "lam",
                     "sigma", "u_lo", "u_hi", "sc", "interpret"))
def mppi_pallas(f, cost_rows, x0s, eps_all, us0, *, T: int, iters: int,
                m: int, lam: float, sigma, u_lo, u_hi, sc: int = 8,
                interpret: bool = False):
    """Whole-solve batched MPPI. x0s (N, n); eps_all (iters*T*m, N, K)
    pre-scaled perturbations in kernel layout (see eps_kernel_layout);
    us0 (T*m,) shared warm start (zeros for cold). Returns
    (us (N, T, m), ess (N, iters)). sigma is the scalar/tuple exploration
    std-dev used only for the coupling term's sig^-2."""
    R, N, K = eps_all.shape
    n = x0s.shape[1]
    dt = x0s.dtype
    assert R == iters * T * m
    if K % 128 != 0:
        raise ValueError(f"kernel path needs K % 128 == 0, got {K}")

    sig = sigma if isinstance(sigma, tuple) else (float(sigma),) * m
    inv_sig2 = tuple(1.0 / (s * s) for s in sig)

    SC = min(sc, N)
    N_pad = _round_up(N, SC)
    if N_pad != N:
        pad = N_pad - N
        x0s = jnp.concatenate([x0s, jnp.zeros((pad, n), dt)], axis=0)
        eps_all = jnp.concatenate(
            [eps_all, jnp.zeros((R, pad, K), dt)], axis=1)
    us0_row = jnp.asarray(us0, dt).reshape(1, T * m)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    us, ess = pl.pallas_call(
        functools.partial(
            _mppi_kernel, f=f, cost_rows=cost_rows, n=n, m=m, T=T,
            iters=iters, K=K, SC=SC, lam=float(lam), inv_sig2=inv_sig2,
            u_lo=u_lo, u_hi=u_hi),
        grid=(N_pad // SC,),
        in_specs=[
            pl.BlockSpec((SC, n), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            smem((1, T * m)),
            pl.BlockSpec((R, SC, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SC, T * m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SC, iters), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N_pad, T * m), dt),
            jax.ShapeDtypeStruct((N_pad, iters), dt),
        ),
        interpret=interpret,
    )(x0s, us0_row, eps_all)
    return us[:N].reshape(N, T, m), ess[:N]


def eps_kernel_layout(key, N: int, iters: int, T: int, m: int, K: int,
                      sigma_arr, dtype=jnp.float32):
    """Generate the perturbations with the EXACT key stream of the XLA
    path (models/mppi.mppi_solve_batched: split(key, N) per scenario,
    split(key_i, iters) per round, normal((K, T, m)) * sigma) and lay
    them out (iters*T*m, N, K) for the kernel — same bits, so
    kernel == XLA to fp reassociation tolerance."""
    keys = jax.random.split(key, N)

    def per_scenario(k):
        it_keys = jax.random.split(k, iters)
        return jax.vmap(lambda ik: jax.random.normal(
            ik, (K, T, m), dtype=dtype))(it_keys)     # (iters, K, T, m)

    eps = jax.vmap(per_scenario)(keys)                # (N, iters, K, T, m)
    eps = eps * jnp.broadcast_to(jnp.asarray(sigma_arr, dtype), (m,))
    return eps.transpose(1, 3, 4, 0, 2).reshape(iters * T * m, N, K)


def eps_direct_layout(key, N: int, iters: int, T: int, m: int, K: int,
                      sigma_arr, dtype=jnp.float32):
    """Generate the perturbations DIRECTLY in kernel layout with one
    normal draw — no per-scenario splits, no transpose. The stream is
    still deterministic given (key, impl) but differs from the XLA
    path's, so results are statistically equivalent rather than
    bit-matching (scripts/mppi_ab.py validates the solve quality).
    ~3x faster generation with hardware-RNG keys
    (jax.random.key(s, impl="rbg")), where the exact-stream layout's
    vmapped splits do not batch."""
    R = iters * T * m
    eps = jax.random.normal(key, (R, N, K), dtype=dtype)
    scale = jnp.tile(jnp.broadcast_to(
        jnp.asarray(sigma_arr, dtype), (m,)), iters * T)   # (R,)
    return eps * scale[:, None, None]

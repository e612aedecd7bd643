"""Fused iLQR forward line-search Pallas kernel (round 5).

scripts/ilqr_breakdown.py measured the 6-alpha closed-loop forward pass
at ~94 us/iteration — the whole per-iteration cost of the batched iLQR
at the config-#3b shape (N=256, T=50; linearize ~2 us, fused backward
~4 us): the T-step scan over tiny (A*N,)-shaped fused steps is pure
fusion-dispatch latency, the same disease the estimator/MPPI kernels
cured. This kernel rolls out ALL line-search alphas for ALL scenarios in
one invocation with per-lane feedback

    u_t = u_nom_t + alpha * k_t + K_t (x_t - x_nom_t)

as unrolled row FMAs (k/K are per-lane VMEM streams — unlike the
estimator kernels' SMEM scalars, the gains vary per scenario), the
quadratic stage cost accumulated per (alpha, lane), and the user plant
traced in-kernel (component-indexing contract, kernels/ekf.py style).

Layout (the kernels/mppi.py sublane trick): scenarios ride the lanes,
the A line-search alphas ride the SUBLANES — every working vector is an
(A, tile) tile, the nominal trajectory/gain rows broadcast (1, tile) ->
(A, tile) for free, and alpha enters as an (A, 1) column. The nominal
blocks are read ONCE (two earlier drafts measured neutral: XLA-side
tiling across alphas materialized ~6 MB/iteration of copies; an
alpha-as-grid-dimension variant re-fetched the same nominal blocks A
times). The argmin selection stays outside (one tiny (A, N) reduction).

Reference parity: the reference has no trajectory optimizer at all
(SURVEY.md §3.2 — users would loop eager ops per scenario and step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(Q_ref, R_ref, QF_ref, goal_ref, alpha_ref, x0_ref,
                xsn_ref, usn_ref, k_ref, K_ref, us_ref, xs_ref, cost_ref,
                *, f, n: int, m: int, T: int, A: int):
    Bt = x0_ref.shape[1]
    alpha = jnp.stack(
        [jnp.full((1,), alpha_ref[0, a], x0_ref.dtype)
         for a in range(A)])                            # (A, 1)
    x = [jnp.broadcast_to(x0_ref[j, :][None, :], (A, Bt))
         for j in range(n)]
    for j in range(n):
        xs_ref[:, 0, j, :] = x[j]
    cost = jnp.zeros((A, Bt), x0_ref.dtype)
    for t in range(T):
        dx = [x[j] - xsn_ref[t, j, :][None, :] for j in range(n)]
        u = []
        for a in range(m):
            acc = (usn_ref[t, a, :][None, :]
                   + alpha * k_ref[t, a, :][None, :])
            for j in range(n):
                acc = acc + K_ref[t, a * n + j, :][None, :] * dx[j]
            u.append(acc)
        # stage cost (x - goal)'Q(x - goal) + u'R u, unrolled symmetric
        for i in range(n):
            di = x[i] - goal_ref[0, i]
            for j in range(i, n):
                w = Q_ref[i, j] * (1.0 if i == j else 2.0)
                cost = cost + w * di * (x[j] - goal_ref[0, j])
        for a in range(m):
            for b in range(a, m):
                w = R_ref[a, b] * (1.0 if a == b else 2.0)
                cost = cost + w * u[a] * u[b]
        xn = f(x, u)
        x = [xn[j] for j in range(n)]
        for a in range(m):
            us_ref[:, t, a, :] = u[a]
        for j in range(n):
            xs_ref[:, t + 1, j, :] = x[j]
    for i in range(n):
        di = x[i] - goal_ref[0, i]
        for j in range(i, n):
            w = QF_ref[i, j] * (1.0 if i == j else 2.0)
            cost = cost + w * di * (x[j] - goal_ref[0, j])
    cost_ref[:, 0, :] = cost


@functools.partial(jax.jit, static_argnames=("f", "n_alphas", "tile_b",
                                             "interpret"))
def ilqr_forward_pallas(f, Q, R, QF, x_goal, alphas, x0s,
                        xsn_t, usn_t, ks_t, Ks_t, n_alphas: int,
                        tile_b: int = 1024, interpret: bool = False):
    """Closed-loop line-search rollout, whole T-loop in one kernel, all
    alphas on the sublanes of every tile.

    alphas (A,); x0s (N, n); xsn_t (T, n, N), usn_t (T, m, N),
    ks_t (T, m, N), Ks_t (T, m*n, N) the nominal trajectory and gains in
    lane-major layout. Q/R/QF/x_goal quadratic cost (SMEM; Q/QF
    symmetric). Returns us (A, T, m, N), xs (A, T+1, n, N),
    costs (A, N).
    """
    T, n, N = xsn_t.shape
    m = usn_t.shape[1]
    A_n = n_alphas
    dt = x0s.dtype

    tile_b = min(tile_b, _round_up(N, 128))
    N_pad = _round_up(N, tile_b)
    if N_pad != N:
        pad = N_pad - N
        x0s = jnp.concatenate([x0s, jnp.zeros((pad, n), dt)], axis=0)
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), dt)], axis=-1)
        xsn_t, usn_t, ks_t, Ks_t = z(xsn_t), z(usn_t), z(ks_t), z(Ks_t)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    vmem = lambda rows: pl.BlockSpec((rows, tile_b), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    vmem_t = lambda rows: pl.BlockSpec((T, rows, tile_b),
                                       lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM)
    us, xs, costs = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f, n=n, m=m, T=T, A=A_n),
        grid=(N_pad // tile_b,),
        in_specs=[
            smem((n, n)), smem((m, m)), smem((n, n)), smem((1, n)),
            smem((1, A_n)), vmem(n),
            vmem_t(n), vmem_t(m), vmem_t(m), vmem_t(m * n),
        ],
        out_specs=(
            pl.BlockSpec((A_n, T, m, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A_n, T + 1, n, tile_b),
                         lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A_n, 1, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A_n, T, m, N_pad), dt),
            jax.ShapeDtypeStruct((A_n, T + 1, n, N_pad), dt),
            jax.ShapeDtypeStruct((A_n, 1, N_pad), dt),
        ),
        interpret=interpret,
    )(Q, R, QF, x_goal.reshape(1, n),
      jnp.asarray(alphas, dt).reshape(1, A_n), x0s.T,
      xsn_t, usn_t, ks_t, Ks_t)
    return us[..., :N], xs[..., :N], costs[:, 0, :N]

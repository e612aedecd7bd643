"""Fused whole-T batched EKF Pallas kernel (round 5).

Companion to kernels/ukf.py (same batch-on-lanes layout, in-kernel
fori_loop over T, per-trajectory (x, P, ll) carry): the per-step Jacobians
A = df/dx and C = dh/dx are built with n forward-mode jax.jvp calls whose
primals/tangents are LISTS of (B,) lane rows — jvp is a trace-level
transform, so differentiating the user plant inside the kernel costs one
extra elementwise pass per basis vector and lowers to ordinary Mosaic ops
(sin -> cos etc.). The first f-jvp's primal output doubles as the
prediction, so a step costs n f-jvps + n h-jvps + the standard KF update
as unrolled row algebra.

Plant contract identical to kernels/ukf.py: f(x, u) / h(x) written with
component indexing + elementwise jnp ops (models/plants.py house style).

Semantics match models/estimation.ekf_filter exactly (same jacfwd
linearization points, symmetrizations, Cholesky-whitened likelihood);
parity in tests/test_kernels.py::test_ekf_pallas_matches_vmap.

Reference parity: no estimator exists in the reference
(/root/reference/src/ndmath/linalg.c is the closest toolkit its users
would loop by hand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numpower_tpu.kernels.ukf import _chol_rows, _round_up


def _ekf_kernel(Q_ref, R_ref, P0_ref, x0_ref, y_ref, u_ref,
                xf_ref, xp_ref, Pf_ref, Pp_ref, ll_ref, *,
                f, h, n: int, p: int, m: int, T: int):
    def rows_of(out, r):
        return [out[j] for j in range(r)]

    def body(t, carry):
        X, Pv, ll = carry
        x_rows = [X[j] for j in range(n)]
        P = [[Pv[i * n + j] for j in range(n)] for i in range(n)]

        u_step = u_ref[t]
        u_rows = [u_step[a] for a in range(m)]

        # A columns + prediction via n forward-mode jvps (primal is free)
        fx = lambda xl: f(xl, u_rows)
        A = [[None] * n for _ in range(n)]      # A[j][i] = df_j/dx_i
        x_p = None
        for i in range(n):
            e_i = [jnp.ones_like(x_rows[0]) if j == i
                   else jnp.zeros_like(x_rows[0]) for j in range(n)]
            prim, tang = jax.jvp(fx, (x_rows,), (e_i,))
            if x_p is None:
                x_p = rows_of(prim, n)
            col = rows_of(tang, n)
            for j in range(n):
                A[j][i] = col[j]

        # P_p = A P A' + Q
        AP = [[None] * n for _ in range(n)]
        for i in range(n):
            for l in range(n):
                acc = None
                for k in range(n):
                    term = A[i][k] * P[k][l]
                    acc = term if acc is None else acc + term
                AP[i][l] = acc
        P_p = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                acc = None
                for l in range(n):
                    term = AP[i][l] * A[j][l]
                    acc = term if acc is None else acc + term
                acc = acc + Q_ref[i, j]
                P_p[i][j] = acc
                P_p[j][i] = acc

        # C columns + h(x_p) via n h-jvps
        C = [[None] * n for _ in range(p)]      # C[c][j] = dh_c/dx_j
        y_hat = None
        for i in range(n):
            e_i = [jnp.ones_like(x_rows[0]) if j == i
                   else jnp.zeros_like(x_rows[0]) for j in range(n)]
            prim, tang = jax.jvp(h, (x_p,), (e_i,))
            if y_hat is None:
                y_hat = rows_of(prim, p)
            col = rows_of(tang, p)
            for c in range(p):
                C[c][i] = col[c]

        # S = C P_p C' + R;  CP = C P_p
        CP = [[None] * n for _ in range(p)]
        for c in range(p):
            for j in range(n):
                acc = None
                for k in range(n):
                    term = C[c][k] * P_p[k][j]
                    acc = term if acc is None else acc + term
                CP[c][j] = acc
        S = [[None] * p for _ in range(p)]
        for a in range(p):
            for b_ in range(a, p):
                acc = None
                for k in range(n):
                    term = CP[a][k] * C[b_][k]
                    acc = term if acc is None else acc + term
                acc = acc + R_ref[a, b_]
                S[a][b_] = acc
                S[b_][a] = acc

        L, Linv = _chol_rows(S, p, 0.0)
        # W = S^{-1} CP (p, n): forward then backward substitution
        # (multiplies by the cached inverse diagonal — see _chol_rows)
        G = [[None] * n for _ in range(p)]
        for a in range(p):
            for j in range(n):
                acc = CP[a][j]
                for k in range(a):
                    acc = acc - L[a][k] * G[k][j]
                G[a][j] = acc * Linv[a]
        W = [[None] * n for _ in range(p)]
        for a in range(p - 1, -1, -1):
            for j in range(n):
                acc = G[a][j]
                for k in range(a + 1, p):
                    acc = acc - L[k][a] * W[k][j]
                W[a][j] = acc * Linv[a]

        y_step = y_ref[t]
        v = [y_step[c] - y_hat[c] for c in range(p)]
        x_f = []
        for j in range(n):
            acc = x_p[j]
            for a in range(p):
                acc = acc + W[a][j] * v[a]
            x_f.append(acc)
        P_f = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                acc = P_p[i][j]
                for a in range(p):
                    acc = acc - W[a][i] * CP[a][j]
                P_f[i][j] = acc
                P_f[j][i] = acc

        alpha_w = [None] * p
        for a in range(p):
            acc = v[a]
            for k in range(a):
                acc = acc - L[a][k] * alpha_w[k]
            alpha_w[a] = acc * Linv[a]
        sq = None
        logdet = None
        for a in range(p):
            s2 = alpha_w[a] * alpha_w[a]
            sq = s2 if sq is None else sq + s2
            ld = jnp.log(L[a][a])
            logdet = ld if logdet is None else logdet + ld
        c0 = p * jnp.log(jnp.asarray(2.0 * jnp.pi, X.dtype))
        ll = ll - 0.5 * (sq + c0) - logdet

        xf_ref[t] = jnp.stack(x_f)
        xp_ref[t] = jnp.stack(x_p)
        Pf_ref[t] = jnp.stack(
            [P_f[i][j] for i in range(n) for j in range(n)])
        Pp_ref[t] = jnp.stack(
            [P_p[i][j] for i in range(n) for j in range(n)])
        return (jnp.stack(x_f),
                jnp.stack([P_f[i][j] for i in range(n) for j in range(n)]),
                ll)

    X0 = x0_ref[:]
    Pv0 = jnp.stack([jnp.full(X0.shape[1:], P0_ref[i, j], X0.dtype)
                     for i in range(n) for j in range(n)])
    ll0 = jnp.zeros(X0.shape[1:], X0.dtype)
    _, _, ll = lax.fori_loop(0, T, body, (X0, Pv0, ll0))
    ll_ref[0] = ll


@functools.partial(jax.jit, static_argnames=("f", "h", "tile_b",
                                             "interpret"))
def ekf_pallas(f, h, Q, R, x0s, P0, yss, uss, tile_b: int = 1024,
               interpret: bool = False):
    """Batched EKF, whole filter in one kernel. Same I/O contract as
    kernels/ukf.ukf_pallas."""
    B, T, p = yss.shape
    n = x0s.shape[1]
    m = uss.shape[2]
    dt = x0s.dtype

    # batch on sublanes AND lanes (r5, same as kernels/ukf.py): full
    # sublane occupancy — the (1, lanes) layout measured 16% of roofline
    SUB = 8
    tile_b = min(_round_up(tile_b, SUB * 128), _round_up(B, SUB * 128))
    B_pad = _round_up(B, tile_b)
    tile_l = tile_b // SUB
    lanes = B_pad // SUB

    def pack(a):                       # (..., B) -> (..., 8, lanes)
        if B_pad != B:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (B_pad - B,), dt)], axis=-1)
        return a.reshape(a.shape[:-1] + (SUB, lanes))

    x0c = pack(x0s.T)
    ysc = pack(yss.transpose(1, 2, 0))                 # (T, p, 8, lanes)
    usc = pack(uss.transpose(1, 2, 0))                 # (T, m, 8, lanes)

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    vmem = lambda rows: pl.BlockSpec((rows, SUB, tile_l),
                                     lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    vmem_t = lambda rows: pl.BlockSpec((T, rows, SUB, tile_l),
                                       lambda i: (0, 0, 0, i),
                                       memory_space=pltpu.VMEM)
    xf, xp, Pf, Pp, ll = pl.pallas_call(
        functools.partial(_ekf_kernel, f=f, h=h, n=n, p=p, m=m, T=T),
        grid=(lanes // tile_l,),
        in_specs=[smem((n, n)), smem((p, p)), smem((n, n)),
                  vmem(n), vmem_t(p), vmem_t(m)],
        out_specs=(vmem_t(n), vmem_t(n), vmem_t(n * n),
                   vmem_t(n * n), vmem(1)),
        out_shape=(
            jax.ShapeDtypeStruct((T, n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((T, n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((T, n * n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((T, n * n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((1, SUB, lanes), dt),
        ),
        interpret=interpret,
    )(Q, R, P0, x0c, ysc, usc)

    xf = xf.reshape(T, n, B_pad)[:, :, :B]
    xp = xp.reshape(T, n, B_pad)[:, :, :B]
    Pf = Pf.reshape(T, n * n, B_pad)[:, :, :B]
    Pp = Pp.reshape(T, n * n, B_pad)[:, :, :B]
    xs_f = xf.transpose(2, 0, 1)
    xs_p = xp.transpose(2, 0, 1)
    Ps_f = Pf.transpose(2, 0, 1).reshape(B, T, n, n)
    Ps_p = Pp.transpose(2, 0, 1).reshape(B, T, n, n)
    return xs_f, Ps_f, xs_p, Ps_p, ll.reshape(B_pad)[:B]

"""Fused whole-T batched UKF Pallas kernel (round 5).

The vmapped UKF (models/estimation.ukf_filter under jax.vmap) is the same
dispatch-latency story the batched KF had before kernels/kalman_batched.py:
T=50 sequential steps, each ~30 tiny (B, n)-shaped fused XLA ops — measured
4.65 ms at (B=1024, pendulum), ~100x off the VPU-flops bound. This kernel
runs the ENTIRE filter in one kernel: the batch rides the 128-wide lanes,
the per-trajectory state (x (n, B), P (n*n, B), ll) is carried through an
in-kernel fori_loop, and every UKF step is unrolled scalar-recurrence work
over (B,) rows (the kernels/cholesky.py batch-on-lanes pattern, including
the sigma-point Cholesky).

Plant contract: f(x, u) / h(x) must be written in the models/plants.py
house style — index state components (x[0], x[1], ...) and combine with
elementwise jnp ops + jnp.stack. Such functions trace identically on a
(n,) vector (the XLA path) and on the per-component (B,) lane rows this
kernel feeds them (as a list, one row per state component); each of the
2n+1 sigma points costs one inlined f trace per step. (A first draft laid
all sigma points side-by-side along the LANE axis to eval f once on a
(n, 5B) block — Mosaic rejects the lane-axis concatenate + lane slicing
that requires: layout.h offset/tiling check crash, v5e 2026-08-21.)

Semantics match models/estimation.ukf_filter exactly (Wan-Merwe points,
same symmetrizations, Cholesky-whitened log-likelihood); parity asserted
in tests/test_kernels.py::test_ukf_pallas_matches_vmap.

Reference parity: the reference has no estimator at all — its users would
loop eager matmul/cholesky per step per trajectory
(/root/reference/src/ndmath/linalg.c:770-1102).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chol_rows(P, n, jitter):
    """Unrolled lower Cholesky of a symmetric matrix given as an n x n
    nested list of (B,) rows; returns (L, Dinv) where Dinv[j] = 1/L[j][j].

    One rsqrt per pivot (instead of sqrt + reciprocal) and the cached
    inverse diagonal let callers substitute with multiplies — VPU
    divide/sqrt are the multi-cycle ops that dominate these tiny-n
    unrolled chains."""
    L = [[None] * n for _ in range(n)]
    Dinv = [None] * n
    for j in range(n):
        acc = P[j][j] + jitter
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        inv = lax.rsqrt(acc)
        L[j][j] = acc * inv
        Dinv[j] = inv
        for i in range(j + 1, n):
            acc = P[i][j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv
    return L, Dinv


def _ukf_kernel(Q_ref, R_ref, P0_ref, x0_ref, y_ref, u_ref,
                xf_ref, xp_ref, Pf_ref, Pp_ref, ll_ref, *,
                f, h, n: int, p: int, m: int, T: int,
                wm, wc, c_sig: float, jitter: float):
    """One grid step = one batch tile. wm/wc are PYTHON float tuples
    (trace-time constants); c_sig = n + lambda scales the sigma spread."""
    K = 2 * n + 1

    def sigma_list(x_rows, P_rows):
        # K lists of n (B,) rows: [x, x + S cols, x - S cols]
        S, _ = _chol_rows([[c_sig * 0.5 * (P_rows[i][j] + P_rows[j][i])
                            for j in range(n)] for i in range(n)], n, jitter)
        pts = [list(x_rows)]
        for i in range(n):
            # column i of lower-triangular S: zeros above the diagonal
            pts.append([x_rows[j] + S[j][i] if i <= j else x_rows[j]
                        for j in range(n)])
        for i in range(n):
            pts.append([x_rows[j] - S[j][i] if i <= j else x_rows[j]
                        for j in range(n)])
        return pts

    def call_rows(fn, args, r):
        # call the user plant on lists of (B,) rows; normalize the output
        # (jnp.stack array OR list from slicing) back to a row list
        out = fn(*args)
        return [out[j] for j in range(r)]

    def wsum_pts(rows_k, j, w):
        acc = None
        for k in range(K):
            term = w[k] * rows_k[k][j]
            acc = term if acc is None else acc + term
        return acc

    def body(t, carry):
        X, Pv, ll = carry
        x_rows = [X[j] for j in range(n)]
        P_rows = [[Pv[i * n + j] for j in range(n)] for i in range(n)]

        u_step = u_ref[t]                              # (m, 8, tile)
        u_rows = [u_step[a] for a in range(m)]

        # predict: propagate every sigma point through f (inlined traces)
        pts = sigma_list(x_rows, P_rows)
        fx = [call_rows(f, (pts[k], u_rows), n) for k in range(K)]
        x_p = [wsum_pts(fx, j, wm) for j in range(n)]
        dX = [[fx[k][j] - x_p[j] for k in range(K)] for j in range(n)]
        P_p = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                acc = None
                for k in range(K):
                    term = wc[k] * dX[i][k] * dX[j][k]
                    acc = term if acc is None else acc + term
                acc = acc + Q_ref[i, j]
                P_p[i][j] = acc
                P_p[j][i] = acc

        # update: re-draw sigma points from the predicted density
        pts2 = sigma_list(x_p, P_p)
        hy = [call_rows(h, (pts2[k],), p) for k in range(K)]
        y_p = [wsum_pts(hy, c, wm) for c in range(p)]
        dY = [[hy[k][c] - y_p[c] for k in range(K)] for c in range(p)]
        dX2 = [[pts2[k][j] - x_p[j] for k in range(K)] for j in range(n)]
        S = [[None] * p for _ in range(p)]
        for a in range(p):
            for b_ in range(a, p):
                acc = None
                for k in range(K):
                    term = wc[k] * dY[a][k] * dY[b_][k]
                    acc = term if acc is None else acc + term
                acc = acc + R_ref[a, b_]
                S[a][b_] = acc
                S[b_][a] = acc
        Pxy = [[None] * p for _ in range(n)]
        for j in range(n):
            for c in range(p):
                acc = None
                for k in range(K):
                    term = wc[k] * dX2[j][k] * dY[c][k]
                    acc = term if acc is None else acc + term
                Pxy[j][c] = acc

        L, Linv = _chol_rows(S, p, 0.0)
        # K_gain = Pxy S^{-1}: solve (L L') W = Pxy' column-wise (p tiny)
        # forward: L G = Pxy'  (G (p, n) of rows)
        G = [[None] * n for _ in range(p)]
        for a in range(p):
            for j in range(n):
                acc = Pxy[j][a]
                for k in range(a):
                    acc = acc - L[a][k] * G[k][j]
                G[a][j] = acc * Linv[a]
        # backward: L' W = G
        W = [[None] * n for _ in range(p)]
        for a in range(p - 1, -1, -1):
            for j in range(n):
                acc = G[a][j]
                for k in range(a + 1, p):
                    acc = acc - L[k][a] * W[k][j]
                W[a][j] = acc * Linv[a]
        # Kg[j][a] = W[a][j] (K_gain = Pxy S^-1, (n, p))

        y_step = y_ref[t]                              # (p, 8, tile)
        v = [y_step[c] - y_p[c] for c in range(p)]
        x_f = []
        for j in range(n):
            acc = x_p[j]
            for a in range(p):
                acc = acc + W[a][j] * v[a]
            x_f.append(acc)
        # P_f = P_p - Kg S Kg'
        SK = [[None] * n for _ in range(p)]            # S Kg' (p, n)
        for a in range(p):
            for j in range(n):
                acc = None
                for b_ in range(p):
                    term = S[a][b_] * W[b_][j]
                    acc = term if acc is None else acc + term
                SK[a][j] = acc
        P_f = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                acc = P_p[i][j]
                for a in range(p):
                    acc = acc - W[a][i] * SK[a][j]
                P_f[i][j] = acc
                P_f[j][i] = acc

        # innovation log-density: alpha = L^{-1} v
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
        X_new = jnp.stack(x_f)
        Pv_new = jnp.stack([P_f[i][j] for i in range(n) for j in range(n)])
        return X_new, Pv_new, ll

    X0 = x0_ref[:]
    Pv0 = jnp.stack([jnp.full(X0.shape[1:], P0_ref[i, j], X0.dtype)
                     for i in range(n) for j in range(n)])
    ll0 = jnp.zeros(X0.shape[1:], X0.dtype)
    _, _, ll = lax.fori_loop(0, T, body, (X0, Pv0, ll0))
    ll_ref[0] = ll


@functools.partial(jax.jit, static_argnames=(
    "f", "h", "alpha", "beta", "kappa", "tile_b", "interpret"))
def ukf_pallas(f, h, Q, R, x0s, P0, yss, uss, alpha: float = 1.0,
               beta: float = 2.0, kappa: float = 0.0, tile_b: int = 1024,
               interpret: bool = False):
    """Batched UKF, whole filter in one kernel.

    f/h: plants in the models/plants.py style (see module docstring);
    Q (n, n), R (p, p), x0s (B, n), P0 (n, n) shared prior, yss (B, T, p),
    uss (B, T, m). Returns (xs_f (B, T, n), Ps_f (B, T, n, n),
    xs_p, Ps_p, ll (B,)) — the KalmanResult fields."""
    B, T, p = yss.shape
    n = x0s.shape[1]
    m = uss.shape[2]
    dt = x0s.dtype

    lam = alpha * alpha * (n + kappa) - n
    c_sig = n + lam
    wm = tuple([lam / c_sig] + [0.5 / c_sig] * (2 * n))
    wc = tuple([lam / c_sig + (1.0 - alpha * alpha + beta)]
               + [0.5 / c_sig] * (2 * n))

    # batch on sublanes AND lanes (r5): every row value is an
    # (8, tile_b/8) tile — full sublane occupancy (the (1, lanes) layout
    # measured 6% of roofline: 7/8 of the VPU idle). Time stays the MAJOR
    # axis: dynamic t-indexing then addresses whole tiles — dynamic
    # SUBLANE offsets (a (T*p, B) layout with pl.ds(t*p, p)) crash
    # Mosaic's layout inference (layout.h offsets check, observed v5e)
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

    x0c = pack(x0s.T)                                  # (n, 8, lanes)
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
        functools.partial(_ukf_kernel, f=f, h=h, n=n, p=p, m=m, T=T,
                          wm=wm, wc=wc, c_sig=float(c_sig), jitter=1e-9),
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

"""Fully-fused batched Riccati backward pass (Pallas TPU kernel).

models/lqr.riccati_scan_per_scenario already routes its SPD solves to the
batch-on-lanes Cholesky kernel, but the surrounding batched einsums remain
XLA batched-matmuls that waste the MXU on 12x12 operands (measured: the
einsums dominate at ~500 us/step for 4096 scenarios). This kernel fuses the
ENTIRE backward recursion:

    S    = R + B'PB
    K    = S^{-1} B'PA          (Cholesky + fwd/bwd substitution, inline)
    P'   = Q + A'PA - (B'PA)'K

into one Pallas program: P lives in VMEM across all T steps, every matrix
product is expressed in the batch-on-lanes layout where a (p,q)x(q,r)
product is p*r contiguous (q, B) multiply-reduce ops on the VPU, and
transposes are free relabelings (row-major of X == column-major of X').

Layout conventions (per batch tile of B scenarios):
  *_rm  rows i*q+j hold element (i, j)   (row-major)
  *_cm  rows j*p+i hold element (i, j)   (column-major)
  For symmetric matrices rm == cm.
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


def _mm(x_rm, y_cm, p: int, q: int, r: int, out_cm: bool = False):
    """C = X @ Y for (p,q)x(q,r): returns list of p*r (B,) rows in rm (or
    cm) order. x_rm: list of p*q rows; y_cm: list of r*q rows (column
    blocks). Each output entry is one (q, B) multiply + sublane reduce."""
    out = [None] * (p * r)
    for i in range(p):
        xi = x_rm[i * q : (i + 1) * q]
        for k in range(r):
            yk = y_cm[k * q : (k + 1) * q]
            acc = xi[0] * yk[0]
            for j in range(1, q):
                acc = acc + xi[j] * yk[j]
            out[(k * p + i) if out_cm else (i * r + k)] = acc
    return out


def _chol_solve_rows(s_rows, rhs_cm, n: int, r: int):
    """Solve S X = RHS for S (n,n) SPD given rm rows (n*n) and RHS (n,r) as
    cm column blocks (r*n rows). Returns X as cm column blocks (r*n rows).
    In-register Cholesky + per-column substitutions (n is tiny: 4..12)."""
    # factor: L (lower) in a dense python list, column-major-ish access.
    # One rsqrt per pivot replaces sqrt+reciprocal, and the cached inverse
    # diagonal turns every substitution divide into a multiply — VPU
    # divides/sqrts are the multi-cycle ops that dominate tiny-n chains.
    L = [None] * (n * n)  # L[i*n+j] = L[i][j], j <= i
    Dinv = [None] * n     # 1 / L[j][j]
    for j in range(n):
        acc = s_rows[j * n + j]
        for k in range(j):
            acc = acc - L[j * n + k] * L[j * n + k]
        inv = lax.rsqrt(acc)
        L[j * n + j] = acc * inv
        Dinv[j] = inv
        for i in range(j + 1, n):
            acc = s_rows[i * n + j]
            for k in range(j):
                acc = acc - L[i * n + k] * L[j * n + k]
            L[i * n + j] = acc * inv
    out = [None] * (r * n)
    for c in range(r):
        b = rhs_cm[c * n : (c + 1) * n]
        # forward: L y = b
        y = [None] * n
        for i in range(n):
            acc = b[i]
            for k in range(i):
                acc = acc - L[i * n + k] * y[k]
            y[i] = acc * Dinv[i]
        # backward: L' x = y
        x = [None] * n
        for i in range(n - 1, -1, -1):
            acc = y[i]
            for k in range(i + 1, n):
                acc = acc - L[k * n + i] * x[k]
            x[i] = acc * Dinv[i]
        for i in range(n):
            out[c * n + i] = x[i]
    return out


def _riccati_kernel(a_cm_ref, b_cm_ref, qf_ref, q_ref, r_ref,
                    ks_ref, p0_ref, *, n: int, m: int, T: int):
    """One grid step = one scenario tile. Every matrix-element "row" is an
    (8, tile_l) tile — the batch rides sublanes AND lanes, so each VPU op
    moves 8x128-multiple scenarios at full occupancy (the original
    (1, lanes) rows measured 5% of the VPU roofline: 1/8 sublane
    utilization was exactly the gap). Outputs: ks_ref rows t*m*n + a*n+b
    = K_t[a, b] (time-REVERSED: index 0 is the last stage computed, i.e.
    t=0); p0_ref = final cost-to-go P_0."""
    a_cm = [a_cm_ref[i] for i in range(n * n)]
    b_cm = [b_cm_ref[i] for i in range(n * m)]
    # SMEM permits only scalar loads — read Q/R entry-wise at trace time
    q_s = [q_ref[i] for i in range(n * n)]
    r_s = [r_ref[i] for i in range(m * m)]

    def body(t, p_flat):
        p_rows = [p_flat[i] for i in range(n * n)]  # symmetric: rm == cm
        # PB (n,m) in cm; PA (n,n) in cm
        pb_cm = _mm(p_rows, b_cm, n, n, m, out_cm=True)
        pa_cm = _mm(p_rows, a_cm, n, n, n, out_cm=True)
        # S = R + B'PB: S[a,b] = col_a(B) . col_b(PB)
        s_rows = [None] * (m * m)
        for a in range(m):
            ba = b_cm[a * n : (a + 1) * n]
            for b in range(m):
                pbb = pb_cm[b * n : (b + 1) * n]
                acc = ba[0] * pbb[0]
                for j in range(1, n):
                    acc = acc + ba[j] * pbb[j]
                s_rows[a * m + b] = acc + r_s[a * m + b]
        # B'PA (m,n) in cm: col_b = B' (col_b(PA)) -> entry [a,b] = col_a(B).col_b(PA)
        btpa_cm = [None] * (n * m)
        for b in range(n):
            pab = pa_cm[b * n : (b + 1) * n]
            for a in range(m):
                ba = b_cm[a * n : (a + 1) * n]
                acc = ba[0] * pab[0]
                for j in range(1, n):
                    acc = acc + ba[j] * pab[j]
                btpa_cm[b * m + a] = acc
        # K = S^{-1} B'PA  (m,m) solve with n rhs columns -> cm
        k_cm = _chol_solve_rows(s_rows, btpa_cm, m, n)
        # A'PA (n,n): entry [i,k] = col_i(A) . col_k(PA)
        # M = (B'PA)' K   : entry [i,k] = col_i(B'PA) . col_k(K)
        p_new = [None] * (n * n)
        for i in range(n):
            ai = a_cm[i * n : (i + 1) * n]
            bti = btpa_cm[i * m : (i + 1) * m]
            for k in range(i, n):  # symmetric: compute upper, mirror
                pak = pa_cm[k * n : (k + 1) * n]
                acc = ai[0] * pak[0]
                for j in range(1, n):
                    acc = acc + ai[j] * pak[j]
                kk = k_cm[k * m : (k + 1) * m]
                acc2 = bti[0] * kk[0]
                for a in range(1, m):
                    acc2 = acc2 + bti[a] * kk[a]
                v = acc - acc2 + q_s[i * n + k]
                p_new[i * n + k] = v
                if k != i:
                    p_new[k * n + i] = v
        # write K for this stage (rows t*m*n .. t*m*n+m*n), rm order
        k_rm = jnp.stack(
            [k_cm[b * m + a] for a in range(m) for b in range(n)], axis=0
        )
        ks_ref[pl.ds(t * m * n, m * n)] = k_rm
        return jnp.stack(p_new, axis=0)

    p_final = lax.fori_loop(0, T, body, qf_ref[:])
    p0_ref[:] = p_final


@functools.partial(jax.jit, static_argnames=("horizon", "tile_b", "interpret"))
def riccati_batched_fused(As, Bs, Q, R, QF, horizon: int, tile_b: int = 4096,
                          interpret: bool = False):
    """Fused per-scenario Riccati: As (N,n,n), Bs (N,n,m), shared Q/R/QF.

    Returns (Ks (N,T,m,n), P0 (N,n,n)) matching
    models.lqr.riccati_scan_per_scenario to fp32 tolerance.

    tile_b scenarios per grid step, laid out (8, tile_b/8) so every VPU
    op runs at full sublane occupancy (r5 — the (1, lanes) layout ran at
    1/8 occupancy and 5% of the VPU roofline; tile_b is rounded up to a
    multiple of 1024).
    """
    N, n, _ = As.shape
    m = Bs.shape[-1]
    T = horizon
    SUB = 8
    tile_b = min(_round_up(tile_b, SUB * 128), _round_up(N, SUB * 128))
    n_pad = _round_up(N, tile_b)
    tile_l = tile_b // SUB
    lanes = n_pad // SUB

    def pack(out):  # (rows, N) -> (rows, 8, n_pad/8)
        out = jnp.pad(out, ((0, 0), (0, n_pad - N)), constant_values=1.0)
        return out.reshape(out.shape[0], SUB, lanes)

    rm = lambda x: pack(x.transpose(1, 2, 0).reshape(-1, N))
    cm = lambda x: pack(x.transpose(2, 1, 0).reshape(-1, N))

    a_cm, b_cm = cm(As), cm(Bs)
    qf_rm = rm(jnp.broadcast_to(QF, (N, n, n)))
    q_s = jnp.asarray(Q, jnp.float32).reshape(-1)
    r_s = jnp.asarray(R, jnp.float32).reshape(-1)

    grid = (lanes // tile_l,)
    row_spec = lambda rows: pl.BlockSpec((rows, SUB, tile_l),
                                         lambda i: (0, 0, i),
                                         memory_space=pltpu.VMEM)
    ks, p0 = pl.pallas_call(
        functools.partial(_riccati_kernel, n=n, m=m, T=T),
        grid=grid,
        in_specs=[
            row_spec(n * n), row_spec(n * m), row_spec(n * n),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(row_spec(T * m * n), row_spec(n * n)),
        out_shape=(
            jax.ShapeDtypeStruct((T * m * n, SUB, lanes), As.dtype),
            jax.ShapeDtypeStruct((n * n, SUB, lanes), As.dtype),
        ),
        interpret=interpret,
    )(a_cm, b_cm, qf_rm, q_s, r_s)

    # kernel writes stage index t counting BACKWARD from the terminal: the
    # fori_loop's t-th iteration computes gains for stage T-1-t
    ks = ks.reshape(T * m * n, n_pad)[:, :N]
    p0 = p0.reshape(n * n, n_pad)[:, :N]
    Ks = ks.reshape(T, m, n, N).transpose(3, 0, 1, 2)
    Ks = jnp.flip(Ks, axis=1)
    P0 = p0.reshape(n, n, N).transpose(2, 0, 1)
    return Ks, P0

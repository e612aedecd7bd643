"""Fused batched iLQR backward pass (LTV + affine Pallas TPU kernel).

Extends kernels/riccati.py to the iLQR setting: per-scenario AND per-timestep
linearizations (A_t, B_t), affine cost terms (lx_t, lu_t), Levenberg
regularization, and both feedforward k_t and feedback K_t outputs:

    Qx  = lx + A'Vx          Qu  = lu + B'Vx
    Qxx = lxx + A'Vxx A      Quu = luu + B'Vxx B + reg I     Qux = B'Vxx A
    k   = -Quu^{-1} Qu       K   = -Quu^{-1} Qux
    Vx' = Qx + Qux'k         Vxx' = Qxx + Qux'K

The T axis rides the SECOND grid dimension: TPU Pallas grids execute
sequentially and scratch persists across grid steps, so (Vx, Vxx) carry in
VMEM scratch while each step's (A, B, lx, lu) block streams in HBM->VMEM
with Pallas's automatic double buffering — the kernel never holds more than
one timestep of linearizations on-chip (T can be arbitrarily long).

Same batch-on-lanes layout as kernels/riccati.py (see its docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numpower_tpu.kernels.riccati import _chol_solve_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ilqr_bwd_kernel(a_cm_ref, b_cm_ref, lx_ref, lu_ref, luud_ref, lxx_ref,
                     luu_ref, lxxT_ref, ks_ref, bigk_ref, vx_scr, vxx_scr, *,
                     n: int, m: int, T: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        # terminal boundary: Vx = lx_T (streamed in slot 0), Vxx = lxxT
        vx_scr[:] = lx_ref[0]
        vxx_scr[:] = jnp.stack(
            [jnp.full_like(vx_scr[0], lxxT_ref[i]) for i in range(n * n)],
            axis=0,
        )

    @pl.when(t > 0)
    def _step():
        a_cm = [a_cm_ref[0, i] for i in range(n * n)]
        b_cm = [b_cm_ref[0, i] for i in range(n * m)]
        lx = [lx_ref[0, i] for i in range(n)]
        lu = [lu_ref[0, i] for i in range(m)]
        lxx_s = [lxx_ref[i] for i in range(n * n)]
        luu_s = [luu_ref[i] for i in range(m * m)]
        vx = [vx_scr[i] for i in range(n)]
        vxx = [vxx_scr[i] for i in range(n * n)]  # symmetric: rm == cm

        def dotn(cols, vec, q):
            acc = cols[0] * vec[0]
            for j in range(1, q):
                acc = acc + cols[j] * vec[j]
            return acc

        # Qx = lx + A'Vx ; Qu = lu + B'Vx
        qx = [lx[i] + dotn(a_cm[i * n : (i + 1) * n], vx, n) for i in range(n)]
        qu = [lu[a] + dotn(b_cm[a * n : (a + 1) * n], vx, n) for a in range(m)]
        # W = Vxx A (cm blocks): col_k(W) = Vxx @ col_k(A)
        w_cm = [None] * (n * n)
        for k in range(n):
            ak = a_cm[k * n : (k + 1) * n]
            for i in range(n):
                w_cm[k * n + i] = dotn(vxx[i * n : (i + 1) * n], ak, n)
        # W2 = Vxx B (cm): col_b(W2) = Vxx @ col_b(B)
        w2_cm = [None] * (m * n)
        for b in range(m):
            bb = b_cm[b * n : (b + 1) * n]
            for i in range(n):
                w2_cm[b * n + i] = dotn(vxx[i * n : (i + 1) * n], bb, n)
        # Qxx = lxx + A'W : [i,k] = col_i(A).col_k(W)
        qxx = [None] * (n * n)
        for i in range(n):
            ai = a_cm[i * n : (i + 1) * n]
            for k in range(i, n):
                v = dotn(ai, w_cm[k * n : (k + 1) * n], n) + lxx_s[i * n + k]
                qxx[i * n + k] = v
                qxx[k * n + i] = v
        # Quu = luu + diag(luu_d) + B'W2 (reg folded into luu by the wrapper;
        # luu_d is the per-scenario/timestep diagonal stream — the AL-iLQR
        # active-set penalty term, a lane vector like lu)
        quu = [None] * (m * m)
        for a in range(m):
            ba = b_cm[a * n : (a + 1) * n]
            for b in range(m):
                v = dotn(ba, w2_cm[b * n : (b + 1) * n], n) + luu_s[a * m + b]
                if a == b:
                    v = v + luud_ref[0, a]
                quu[a * m + b] = v
        # Qux = B'W (m,n) stored cm: col_k = B' col_k(W)
        qux_cm = [None] * (n * m)
        for k in range(n):
            wk = w_cm[k * n : (k + 1) * n]
            for a in range(m):
                qux_cm[k * m + a] = dotn(b_cm[a * n : (a + 1) * n], wk, n)
        # solve Quu [k | K] = [Qu | Qux]  (negate after)
        rhs_cm = qu + qux_cm  # first column block = Qu, then n columns of Qux
        sol_cm = _chol_solve_rows(quu, rhs_cm, m, n + 1)
        k_sol = [-sol_cm[a] for a in range(m)]
        bigk_cm = [-sol_cm[m + i] for i in range(n * m)]  # (m,n) cm blocks
        # Vx' = Qx + Qux'k : [i] = col_i(Qux).k   (note k already negated)
        for i in range(n):
            vx_scr[i] = qx[i] + dotn(qux_cm[i * m : (i + 1) * m], k_sol, m)
        # Vxx' = Qxx + Qux'K : [i,j] = col_i(Qux).col_j(K)
        new_vxx = [None] * (n * n)
        for i in range(n):
            qi = qux_cm[i * m : (i + 1) * m]
            for j in range(i, n):
                v = qxx[i * n + j] + dotn(qi, bigk_cm[j * m : (j + 1) * m], m)
                new_vxx[i * n + j] = v
                new_vxx[j * n + i] = v
        for i in range(n * n):
            vxx_scr[i] = new_vxx[i]
        # outputs (rm order): ks rows a ; K rows a*n+b
        ks_ref[0] = jnp.stack(k_sol, axis=0)
        bigk_ref[0] = jnp.stack(
            [bigk_cm[b * m + a] for a in range(m) for b in range(n)], axis=0
        )


@functools.partial(jax.jit, static_argnames=("reg", "tile_b", "interpret"))
def ilqr_backward_fused(As, Bs, lxs, lus, lxx, luu, lxT, lxxT,
                        reg: float = 1e-3, tile_b: int = 512,
                        interpret: bool = False, luu_diags=None):
    """Batched iLQR backward pass.

    As (N,T,n,n), Bs (N,T,n,m): per-scenario/timestep linearizations;
    lxs (N,T,n), lus (N,T,m): affine stage-cost gradients; lxx (n,n),
    luu (m,m): shared stage-cost Hessians (2Q, 2R); lxT (N,n): terminal
    gradient (2 QF (x_T - goal)); lxxT (n,n): terminal Hessian (2 QF).
    luu_diags (N,T,m), optional: per-scenario/timestep DIAGONAL addition to
    luu — the AL-iLQR active-set penalty Hessian (models/al_ilqr._al_terms).

    Returns (ks (N,T,m), Ks (N,T,m,n)).
    """
    N, T, n, _ = As.shape
    m = Bs.shape[-1]
    if luu_diags is None:
        luu_diags = jnp.zeros((N, T, m), As.dtype)
    # batch on sublanes AND lanes (r5, same as kernels/riccati.py):
    # (8, tile_b/8) tiles keep the VPU at full sublane occupancy
    SUB = 8
    tile_b = min(_round_up(tile_b, SUB * 128), _round_up(N, SUB * 128))
    n_pad = _round_up(N, tile_b)
    tile_l = tile_b // SUB
    lanes = n_pad // SUB

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - N)), constant_values=1.0)

    # streams are consumed t = 1..T in grid order, stage T-1 first; slot 0 is
    # the terminal-boundary slot (A/B/lu unused there, lx = terminal grad)
    A_rev = jnp.flip(As, axis=1)
    B_rev = jnp.flip(Bs, axis=1)
    lx_rev = jnp.flip(lxs, axis=1)
    lu_rev = jnp.flip(lus, axis=1)

    def cm_stream(x, p, q):
        # (N,T,p,q) -> (T+1, p*q, n_pad) column-major rows per step
        s = x.transpose(1, 3, 2, 0).reshape(T, q * p, N)
        s = jnp.concatenate([jnp.zeros((1, q * p, N), x.dtype), s], axis=0)
        return pad(s.reshape((T + 1) * q * p, N)).reshape(
            T + 1, q * p, SUB, lanes)

    a_cm = cm_stream(A_rev, n, n)
    b_cm = cm_stream(B_rev, n, m)
    lx_stream = jnp.concatenate(
        [lxT[:, None, :], lx_rev], axis=1
    ).transpose(1, 2, 0).reshape(T + 1, n, N)
    lx_stream = pad(lx_stream.reshape((T + 1) * n, N)).reshape(
        T + 1, n, SUB, lanes)
    lu_stream = jnp.concatenate(
        [jnp.zeros((N, 1, m), lus.dtype), lu_rev], axis=1
    ).transpose(1, 2, 0).reshape(T + 1, m, N)
    lu_stream = pad(lu_stream.reshape((T + 1) * m, N)).reshape(
        T + 1, m, SUB, lanes)
    luud_rev = jnp.flip(luu_diags, axis=1)
    luud_stream = jnp.concatenate(
        [jnp.zeros((N, 1, m), luu_diags.dtype), luud_rev], axis=1
    ).transpose(1, 2, 0).reshape(T + 1, m, N)
    luud_stream = pad(luud_stream.reshape((T + 1) * m, N)).reshape(
        T + 1, m, SUB, lanes)

    luu_reg = jnp.asarray(luu, jnp.float32) + reg * jnp.eye(m, dtype=jnp.float32)

    grid = (lanes // tile_l, T + 1)
    ks, bigk = pl.pallas_call(
        functools.partial(_ilqr_bwd_kernel, n=n, m=m, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n * n, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * m, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m * n, SUB, tile_l), lambda i, t: (t, 0, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T + 1, m, SUB, lanes), As.dtype),
            jax.ShapeDtypeStruct((T + 1, m * n, SUB, lanes), As.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, SUB, tile_l), jnp.float32),
            pltpu.VMEM((n * n, SUB, tile_l), jnp.float32),
        ],
        interpret=interpret,
    )(
        a_cm, b_cm, lx_stream, lu_stream, luud_stream,
        jnp.asarray(lxx, jnp.float32).reshape(-1),
        luu_reg.reshape(-1),
        jnp.asarray(lxxT, jnp.float32).reshape(-1),
    )
    # slot t=1.. hold stages T-1..0; drop slot 0, un-reverse, unpad
    ks_out = ks.reshape(T + 1, m, n_pad)[1:, :, :N].reshape(
        T, m, N).transpose(2, 0, 1)
    bigk_out = bigk.reshape(T + 1, m * n, n_pad)[1:, :, :N].reshape(
        T, m, n, N).transpose(3, 0, 1, 2)
    return jnp.flip(ks_out, axis=1), jnp.flip(bigk_out, axis=1)

"""Fused batched-KF mean-pass Pallas kernel (VERDICT r4 #5).

models/estimation.kalman_filter_batched's shared-covariance fast path
computes gains once and runs the batched MEAN recurrence as an XLA scan —
measured 28.8 us at (N=4096, T=50, n=2, p=1) on v5e, only ~17% of the
bytes-roofline (5.0 us), with the residual attributed to fusion-dispatch
latency on 2xT sequential (N, n)-shaped fused loops. This kernel is the
experiment the r4 verdict asked for: hold the (n, B) state in VMEM/registers,
unroll the ENTIRE T-loop inside one kernel (T static and small), and read
the per-step gains from SMEM scalars — no per-step dispatch at all.

Layout follows kernels/cholesky.py's batch-on-lanes convention: the batch
rides the 128-wide lanes; the tiny state/obs dims are unrolled rows.
 - x0:  (n, N)            one row per state component
 - ys:  (T*p, N)          row t*p+c = measurement component c at step t
 - u:   (T*n, N)          optional known-input terms (B @ u), same layout
 - out: xf/xp (T*n, N), ll (1, N)
Per step the math is ~n^2+3np+p^2 scalar-broadcast FMAs over (N,) lanes —
pure VPU work fed from VMEM, gains broadcast from SMEM.

The whole-filter contract (filtered + predicted means + innovation
log-likelihood) matches models/estimation.kalman_filter_batched exactly
(same Cholesky-whitened algebra; parity asserted in
tests/test_kernels.py::test_kalman_mean_pallas_matches_xla and on-chip by
bench.py --verify kalman_batched_fast_path).

Reference parity: the reference has no batched filter at all — users loop
eager matmul/cholesky per trajectory (/root/reference/src/ndmath/
linalg.c:770-1102); this kernel is the TPU-native replacement for that
whole loop nest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kf_mean_kernel(A_ref, C_ref, W_ref, iL_ref, cst_ref, x0_ref, ys_ref,
                    us_ref, xf_ref, xp_ref, ll_ref, *, n: int, p: int,
                    T: int, has_u: bool):
    """One grid step = one batch tile. The T-loop is a Python unroll (T is
    static); every step is a handful of (N,)-lane VPU ops with SMEM scalar
    gain broadcasts. State x lives in registers (a Python list of rows)."""
    x = [x0_ref[j] for j in range(n)]
    ll = jnp.zeros_like(x[0])
    for t in range(T):
        # predict: x_p = A x + u_t
        xp = []
        for j in range(n):
            acc = A_ref[j, 0] * x[0]
            for i in range(1, n):
                acc = acc + A_ref[j, i] * x[i]
            if has_u:
                acc = acc + us_ref[t * n + j]
            xp.append(acc)
        # innovation v = y_t - C x_p
        v = []
        for c in range(p):
            acc = ys_ref[t * p + c]
            for j in range(n):
                acc = acc - C_ref[c, j] * xp[j]
            v.append(acc)
        # filtered: x_f = x_p + v @ W_t   (W_t rows: (p, n) flattened)
        for j in range(n):
            acc = xp[j]
            for c in range(p):
                acc = acc + W_ref[t, c * n + j] * v[c]
            x[j] = acc
            xf_ref[t * n + j] = acc
            xp_ref[t * n + j] = xp[j]
        # whitened innovation log-density: alpha = invL_t v
        sq = None
        for c in range(p):
            acc = iL_ref[t, c * p + 0] * v[0]
            for e in range(1, p):
                acc = acc + iL_ref[t, c * p + e] * v[e]
            sq = acc * acc if sq is None else sq + acc * acc
        ll = ll - 0.5 * sq - cst_ref[t, 0]
    ll_ref[0] = ll


@functools.partial(jax.jit,
                   static_argnames=("tile_b", "interpret"))
def kalman_mean_pass_pallas(A, C, Ws, invLs, logdets, x0s, ys_t,
                            us_t=None, tile_b: int = 2048,
                            interpret: bool = False):
    """Batched KF mean recurrence, whole T-loop in one kernel.

    A (n, n), C (p, n), Ws (T, p, n), invLs (T, p, p), logdets (T,)
    [the cov-scan outputs of kalman_filter_batched], x0s (N, n),
    ys_t (T, N, p), us_t optional (T, N, n) input terms (already B @ u).
    Returns (xs_f (T, N, n), xs_p (T, N, n), ll (N,)).
    """
    T, N, p = ys_t.shape
    n = x0s.shape[1]
    dt = x0s.dtype
    has_u = us_t is not None

    # batch on sublanes AND lanes (r5): every row value is an
    # (8, tile_b/8) tile, so the per-step VPU FMAs run at full sublane
    # occupancy (the (1, lanes) layout left 7/8 of the VPU idle)
    SUB = 8
    tile_b = min(_round_up(tile_b, SUB * 128), _round_up(N, SUB * 128))
    N_pad = _round_up(N, tile_b)
    tile_l = tile_b // SUB
    lanes = N_pad // SUB

    # per-step constant of the innovation log-density
    c0 = jnp.asarray(p * jnp.log(2.0 * jnp.pi), dt)
    cst = (logdets + 0.5 * c0).reshape(T, 1)

    def pack(a):                                       # (rows, N) -> 3D
        if N_pad != N:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (N_pad - N,), dt)], axis=-1)
        return a.reshape(a.shape[0], SUB, lanes)

    x0c = pack(x0s.T)                                  # (n, 8, lanes)
    ysc = pack(ys_t.transpose(0, 2, 1).reshape(T * p, N))
    usc = pack(us_t.transpose(0, 2, 1).reshape(T * n, N)
               if has_u else jnp.zeros((1, N), dt))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    vmem = lambda rows: pl.BlockSpec((rows, SUB, tile_l),
                                     lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    xf, xp, ll = pl.pallas_call(
        functools.partial(_kf_mean_kernel, n=n, p=p, T=T, has_u=has_u),
        grid=(lanes // tile_l,),
        in_specs=[
            smem((n, n)), smem((p, n)), smem((T, p * n)),
            smem((T, p * p)), smem((T, 1)),
            vmem(n), vmem(T * p), vmem(usc.shape[0]),
        ],
        out_specs=(vmem(T * n), vmem(T * n), vmem(1)),
        out_shape=(
            jax.ShapeDtypeStruct((T * n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((T * n, SUB, lanes), dt),
            jax.ShapeDtypeStruct((1, SUB, lanes), dt),
        ),
        interpret=interpret,
    )(A, C, Ws.reshape(T, p * n), invLs.reshape(T, p * p), cst,
      x0c, ysc, usc)
    xf = xf.reshape(T * n, N_pad)[:, :N]
    xp = xp.reshape(T * n, N_pad)[:, :N]
    xs_f = xf.reshape(T, n, N).transpose(0, 2, 1)
    xs_p = xp.reshape(T, n, N).transpose(0, 2, 1)
    return xs_f, xs_p, ll.reshape(N_pad)[:N]

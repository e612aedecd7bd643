"""Fused batched-RTS backward-pass Pallas kernel.

models/estimation.kalman_smoother_batched's shared-gain fast path: with
A/C/Q/R/P0 shared across the batch (the kalman_filter_batched contract)
the smoother gains G_t = P_f[t] A' P_p[t+1]^-1 are data-independent, so
only the MEAN backward recurrence is batched:

    x_s[t] = x_s[t+1] @ G_t' + e_t,   e_t = x_f[t] - x_p[t+1] @ G_t'

with e_t precomputed batch-parallel in one XLA einsum. The remaining
sequential work is T tiny affine (N, n) updates — exactly the regime
where the batched-KF mean pass measured ~17% of its bytes-roofline on
XLA due to per-step fusion-dispatch latency (BASELINE.md kf row), so the
same cure applies: hold the (n, N) state in registers, unroll the whole
T-loop inside ONE kernel, broadcast the per-step gains from SMEM.

Layout follows kernels/cholesky.py's batch-on-lanes convention: the
batch rides the 128-wide lanes, the tiny state dim is unrolled rows:
 - x_last: (n, N)          smoothed anchor x_s[T-1] = x_f[T-1]
 - es:     ((T-1)*n, N)    row t*n+j = component j of e_t
 - out:    xs (T*n, N)     smoothed means, forward time order
Per step the math is n^2 scalar-broadcast FMAs over (N,) lanes — pure
VPU work fed from VMEM, gains broadcast from SMEM.

Reference parity: the reference has no smoother at all (its linalg stops
at eager factorizations, /root/reference/src/ndmath/linalg.c:770-1102);
this kernel is part of the beyond-reference estimation engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rts_mean_kernel(G_ref, xlast_ref, e_ref, xs_ref, *, n: int, T: int):
    """One grid step = one batch tile. The backward T-loop is a Python
    unroll (T static); every step is n^2 (N,)-lane FMAs with SMEM scalar
    gain broadcasts. The running smoothed state lives in registers (a
    Python list of rows)."""
    x = [xlast_ref[j] for j in range(n)]
    for j in range(n):
        xs_ref[(T - 1) * n + j] = x[j]
    for t in range(T - 2, -1, -1):
        # x_s[t] = x_s[t+1] @ G_t' + e_t ; G_ref[t, i*n+k] = G_t'[i, k]
        xn = []
        for k in range(n):
            acc = e_ref[t * n + k]
            for i in range(n):
                acc = acc + G_ref[t, i * n + k] * x[i]
            xn.append(acc)
        x = xn
        for j in range(n):
            xs_ref[t * n + j] = x[j]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def rts_mean_pass_pallas(G_Ts, es_t, x_last, tile_b: int = 2048,
                         interpret: bool = False):
    """Batched RTS mean backward recurrence, whole T-loop in one kernel.

    G_Ts (T-1, n, n) — the transposed smoother gains G_t' (shared across
    the batch), es_t (T-1, N, n) — the batch-parallel affine terms,
    x_last (N, n) — the anchor x_f[T-1]. Returns xs_s (T, N, n) in
    forward time order.
    """
    Tm1, N, n = es_t.shape
    T = Tm1 + 1
    dt = x_last.dtype

    # batch on sublanes AND lanes (r5, same as kernels/kalman_batched.py):
    # (8, tile_b/8) tiles keep the VPU at full sublane occupancy
    SUB = 8
    tile_b = min(_round_up(tile_b, SUB * 128), _round_up(N, SUB * 128))
    N_pad = _round_up(N, tile_b)
    tile_l = tile_b // SUB
    lanes = N_pad // SUB

    def pack(a):
        if N_pad != N:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (N_pad - N,), dt)], axis=-1)
        return a.reshape(a.shape[0], SUB, lanes)

    xlc = pack(x_last.T)                               # (n, 8, lanes)
    esc = pack(es_t.transpose(0, 2, 1).reshape(Tm1 * n, N))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    vmem = lambda rows: pl.BlockSpec((rows, SUB, tile_l),
                                     lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    xs = pl.pallas_call(
        functools.partial(_rts_mean_kernel, n=n, T=T),
        grid=(lanes // tile_l,),
        in_specs=[smem((Tm1, n * n)), vmem(n), vmem(Tm1 * n)],
        out_specs=vmem(T * n),
        out_shape=jax.ShapeDtypeStruct((T * n, SUB, lanes), dt),
        interpret=interpret,
    )(G_Ts.reshape(Tm1, n * n), xlc, esc)
    xs = xs.reshape(T * n, N_pad)[:, :N]
    return xs.reshape(T, n, N).transpose(0, 2, 1)

"""Batched small-matrix Cholesky + SPD solve Pallas kernels.

SURVEY.md §7 hard part: "Pallas blocked Cholesky/triangular-solve for
batched small matrices (n~12-50 state dims) — the speed-of-light
requirement". The reference's Cholesky is a single LAPACKE_spotrf call
(linalg.c:1057-1102, CPU-only); XLA's batched cholesky on TPU loops a
generic blocked algorithm that wastes the vector unit on n<<128 matrices.

TPU-native design: the BATCH dimension rides the 128-wide lanes and the
factorization is fully unrolled over the (static, small) matrix dimension.
Layout: each (n, n) matrix is stored COLUMN-major as rows of an (n*n, B)
tile — column j's subdiagonal occupies contiguous rows j*n+j+1 .. j*n+n, so
every Cholesky update is one contiguous 2-D VPU op over (rows, B):

    for j:  d = sqrt(A[jj]);  col_j /= d            (one (n-j, B) op)
            for k > j:  col_k[k:] -= L[k,j]*col_j[k:]  (one (n-k, B) op)

~n^2/2 vector ops total, all on (..., B) blocks — no per-matrix scalar code,
no MXU involvement (these are latency-bound, not FLOP-bound).

The fused `psd_solve_batched` performs factor + forward/back substitution in
one kernel: L never round-trips HBM (the Riccati inner op (R+B'PB)^-1 rhs).
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


def _chol_inplace(col_ref, n: int, inv_diag: bool = False):
    """Factor the column-major (n*n, B) tile in place (lower Cholesky).
    col_ref rows j*n+i hold element (i, j). One rsqrt per pivot replaces
    sqrt + reciprocal; with inv_diag=True the diagonal stores 1/L[j,j]
    instead of L[j,j] so substitution passes can multiply rather than
    divide (the fused psd-solve path)."""
    for j in range(n):
        x = col_ref[j * n + j, :]
        inv = lax.rsqrt(x)
        col_ref[j * n + j, :] = inv if inv_diag else x * inv
        if j + 1 < n:
            col_ref[j * n + j + 1 : j * n + n, :] = (
                col_ref[j * n + j + 1 : j * n + n, :] * inv
            )
        for k in range(j + 1, n):
            ljk = col_ref[j * n + k, :]  # L[k, j]
            col_ref[k * n + k : k * n + n, :] = (
                col_ref[k * n + k : k * n + n, :]
                - ljk * col_ref[j * n + k : j * n + n, :]
            )


def _chol_kernel(a_ref, l_ref, *, n: int):
    l_ref[:] = a_ref[:]
    _chol_inplace(l_ref, n)
    # zero the (strictly upper) unused rows so output is a clean L
    for j in range(n):
        if j > 0:
            l_ref[j * n : j * n + j, :] = jnp.zeros_like(l_ref[j * n : j * n + j, :])


def _psd_solve_kernel(a_ref, b_ref, x_ref, lscr, *, n: int, m: int):
    """Solve A X = B for batched SPD A: factor into VMEM scratch (diagonal
    held INVERTED, see _chol_inplace), then forward (L y = b) and backward
    (L' x = y) substitution as pure multiplies. b/x layout: rows i*m+c
    hold element (i, c)."""
    lscr[:] = a_ref[:]
    _chol_inplace(lscr, n, inv_diag=True)
    x_ref[:] = b_ref[:]
    # forward: y[j] *= 1/L[j,j]; y[i] -= L[i,j] y[j]  (i > j)
    for j in range(n):
        x_ref[j * m : j * m + m, :] = x_ref[j * m : j * m + m, :] * lscr[j * n + j, :]
        for i in range(j + 1, n):
            x_ref[i * m : i * m + m, :] = (
                x_ref[i * m : i * m + m, :]
                - lscr[j * n + i, :] * x_ref[j * m : j * m + m, :]
            )
    # backward with L^T: x[i] = (y[i] - sum_{k>i} L[k,i] x[k]) / L[i,i]
    for i in range(n - 1, -1, -1):
        acc = x_ref[i * m : i * m + m, :]
        for k in range(i + 1, n):
            acc = acc - lscr[i * n + k, :] * x_ref[k * m : k * m + m, :]
        x_ref[i * m : i * m + m, :] = acc * lscr[i * n + i, :]


def _to_colmajor(a: jax.Array) -> jax.Array:
    """(N, n, n) -> (n*n, N) with rows ordered column-major per matrix."""
    N, n, _ = a.shape
    return a.transpose(2, 1, 0).reshape(n * n, N)


def _from_colmajor(l: jax.Array, n: int) -> jax.Array:
    N = l.shape[1]
    return l.reshape(n, n, N).transpose(2, 1, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def cholesky_batched(a: jax.Array, tile_b: int = 1024, interpret: bool = False):
    """Lower Cholesky of a batch of small SPD matrices: (N, n, n) -> (N, n, n).

    Drop-in for jnp.linalg.cholesky on batches where n <= ~48 (row count
    n*n must stay VMEM-friendly). No NaN checking (matches jnp: non-PD
    inputs produce NaN)."""
    N, n, _ = a.shape
    tile_b = min(tile_b, _round_up(N, 128))
    n_pad = _round_up(N, tile_b)
    ac = _to_colmajor(a)
    if n_pad != N:
        # pad batch with identity matrices (keeps sqrt/div well-defined)
        eye_cols = _to_colmajor(
            jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (n_pad - N, n, n))
        )
        ac = jnp.concatenate([ac, eye_cols], axis=1)
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        grid=(n_pad // tile_b,),
        in_specs=[pl.BlockSpec((n * n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n * n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * n, n_pad), a.dtype),
        interpret=interpret,
    )(ac)
    return _from_colmajor(out[:, :N], n)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def psd_solve_batched(a: jax.Array, b: jax.Array, tile_b: int = 1024,
                      interpret: bool = False):
    """Batched SPD solve A X = B: a (N, n, n), b (N, n, m) -> (N, n, m).

    Single fused kernel (factor + 2 substitutions); the factor stays in
    VMEM. The Riccati inner op K = (R + B'PB)^{-1} (B'PA) is this with
    n = n_controls, m = n_states."""
    N, n, _ = a.shape
    m = b.shape[-1]
    tile_b = min(tile_b, _round_up(N, 128))
    n_pad = _round_up(N, tile_b)
    ac = _to_colmajor(a)
    bc = b.transpose(1, 2, 0).reshape(n * m, N)
    if n_pad != N:
        pad = n_pad - N
        eye_cols = _to_colmajor(
            jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
        )
        ac = jnp.concatenate([ac, eye_cols], axis=1)
        bc = jnp.concatenate([bc, jnp.zeros((n * m, pad), b.dtype)], axis=1)
    out = pl.pallas_call(
        functools.partial(_psd_solve_kernel, n=n, m=m),
        grid=(n_pad // tile_b,),
        in_specs=[
            pl.BlockSpec((n * n, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * m, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n * m, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * m, n_pad), b.dtype),
        scratch_shapes=[pltpu.VMEM((n * n, tile_b), a.dtype)],
        interpret=interpret,
    )(ac, bc)
    return out[:, :N].reshape(n, m, N).transpose(2, 0, 1)

"""Fused FISTA box-QP Pallas TPU kernel.

The XLA version (models/boxqp.py) runs 40 scan iterations, each a separate
GEMM + elementwise pass over HBM: per iteration it re-reads U, Y, g (~2 MB
each at N=4096, d=120) from HBM. Speed-of-light analysis (pallas_guide.md):
H is only d*d*4 = 57 KB and the per-tile U/Y/g fit in VMEM, so the ENTIRE
iteration loop can run on-chip — one HBM read of g, one write of U, H
resident in VMEM, MXU GEMMs back-to-back with the clip/momentum fused in the
VPU. That converts an HBM-bandwidth-bound loop into a compute-bound one.

Reference semantics mirrored: the solver solves the same box-QP the
reference user would assemble from nd ops (clip = double_math.c float_clip,
comparisons = logic.c; SURVEY.md §2.3) — bitwise-comparable to
models/boxqp.solve_boxqp_fista within fp32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fista_betas(iters: int):
    """Static FISTA momentum schedule (no adaptive restart): t_{k+1} =
    (1+sqrt(1+4t_k^2))/2, beta_k = (t_k-1)/t_{k+1}. Python floats at trace
    time -> immediate scalars in the kernel, no cross-lane reduces."""
    betas = []
    t = 1.0
    for _ in range(iters):
        t_next = 0.5 * (1.0 + (1.0 + 4.0 * t * t) ** 0.5)
        betas.append((t - 1.0) / t_next)
        t = t_next
    return betas


def _fista_loop(g, Ht, step, lo, hi, U0, iters: int, coarse_iters: int,
                tail_precision: str = "bf16x3"):
    """Shared FISTA iteration body (pure arrays, VMEM-resident).

    tail_precision selects the MXU scheme for the fp32 tail GEMMs (see
    kernels/precision.py): "bf16x3" (default — 3-pass hi/lo split,
    fp32-level accuracy at a fraction of HIGHEST's cost) or "highest".
    The coarse phase is always single-pass DEFAULT."""
    from numpower_tpu.kernels.precision import make_tail_dot

    betas = _fista_betas(coarse_iters) + _fista_betas(iters - coarse_iters)
    tail_dot = make_tail_dot(Ht, tail_precision)

    U = U0
    Y = U
    for k in range(iters):
        if k < coarse_iters:
            gemm = jnp.dot(Y, Ht, precision=lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
        else:
            gemm = tail_dot(Y)
        grad = gemm + g
        U_new = jnp.clip(Y - step * grad, lo, hi)
        beta = 0.0 if k == coarse_iters - 1 else betas[k]
        Y = U_new + beta * (U_new - U)
        U = U_new
    return U


def _fista_g_kernel(Ht_ref, x0_ref, w_ref, lostep_ref, u0_ref,
                    out_ref, g_out_ref, *, iters: int, coarse_iters: int,
                    d: int):
    """FISTA with IN-KERNEL g formation: g = x0 @ W with the prediction
    chain W = Sx' (Su'Q)' FOLDED into one (n, d) matrix on the host (the
    wrapper) — ONE MXU matmul with a 128-lane inner dim instead of two
    HIGHEST-precision GEMMs over the Tn~384 middle dim (those cost ~35% of
    the kernel's total MXU passes at the flagship — VERDICT r3 MFU attack).
    One HBM read of x0 (tiny) per tile instead of a materialized g; g is
    also emitted so callers can form residuals without recomputing it."""
    step = lostep_ref[0]
    lo = lostep_ref[1]
    hi = lostep_ref[2]
    g = jnp.dot(x0_ref[:], w_ref[:], precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    g_out_ref[:] = g
    out_ref[:] = _fista_loop(g, Ht_ref[:], step, lo, hi, u0_ref[:],
                             iters, coarse_iters)


def _fista_kernel(Ht_ref, g_ref, lostep_ref, u0_ref, out_ref, *, iters: int,
                  coarse_iters: int, d: int):
    """One grid step = one scenario tile. Ht (d_pad, d_pad) VMEM-resident;
    g tile (TILE_N, d_pad); carries (U, Y) live in VMEM/registers.

    Fully unrolled with a STATIC beta schedule (classic FISTA — adaptive
    restart needs a cross-lane reduce per iteration, which dominated kernel
    time; the fixed schedule is within fp32 tolerance at these iteration
    counts, validated in tests). First `coarse_iters` iterations contract in
    bf16 on the MXU (precision=DEFAULT with fp32 operands — Mosaic rejects
    explicit bf16 operands but lowers this form to a single-pass matmul);
    the tail contracts to the fp32 fixed point at bf16x3 precision
    (kernels/precision.py).
    """
    step = lostep_ref[0]
    lo = lostep_ref[1]
    hi = lostep_ref[2]
    out_ref[:] = _fista_loop(g_ref[:], Ht_ref[:], step, lo, hi, u0_ref[:],
                             iters, coarse_iters)


@functools.partial(
    jax.jit, static_argnames=("iters", "coarse_iters", "tile_n", "interpret")
)
def fista_boxqp_pallas(
    H: jax.Array,       # (d, d) symmetric PSD
    g: jax.Array,       # (N, d) per-scenario linear terms
    lo: jax.Array,      # scalar lower bound
    hi: jax.Array,      # scalar upper bound
    lipschitz: jax.Array,  # scalar: lambda_max(H)
    iters: int = 40,
    coarse_iters: int = 0,
    tile_n: int = 1024,  # measured best on v5e (61.6us vs 78.8us at 4096)
    interpret: bool = False,
    U0: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched box-QP solve: argmin_U 1/2 U'HU + g_i'U  s.t. lo<=U<=hi.

    Returns (N, d). Zero-pads d to the 128-lane boundary and N to the tile;
    padded H rows/cols are zero so padded lanes never couple into real ones,
    and padded g rows produce discarded outputs. U0 warm-starts the iterate
    (receding-horizon shifts).
    """
    N, d = g.shape
    d_pad = _round_up(d, 128)
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad = _round_up(N, tile_n)

    Ht = jnp.zeros((d_pad, d_pad), H.dtype).at[:d, :d].set(H.T)
    g_p = jnp.zeros((n_pad, d_pad), g.dtype).at[:N, :d].set(g)
    u0_p = jnp.zeros((n_pad, d_pad), g.dtype)
    if U0 is not None:
        u0_p = u0_p.at[:N, :d].set(U0)
    params = jnp.stack(
        [
            (1.0 / lipschitz).astype(jnp.float32),
            jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32),
        ]
    )

    kernel = functools.partial(
        _fista_kernel, iters=iters, coarse_iters=min(coarse_iters, iters), d=d
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * d_pad * iters,
            bytes_accessed=(d_pad * d_pad + 3 * n_pad * d_pad) * 4,
            transcendentals=iters,
        ),
        interpret=interpret,
    )(Ht, g_p, params, u0_p)
    return out[:N, :d]


@functools.partial(
    jax.jit, static_argnames=("iters", "coarse_iters", "tile_n", "interpret")
)
def fista_mpc_pallas(
    H: jax.Array,        # (d, d)
    SxT: jax.Array,      # (n, Tn)  = Sx'
    SuTQT: jax.Array,    # (Tn, d)  = (Su' Qbar)'
    x0s: jax.Array,      # (N, n) scenario initial states
    lo: jax.Array,
    hi: jax.Array,
    lipschitz: jax.Array,
    iters: int = 40,
    coarse_iters: int = 0,
    tile_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """End-to-end MPC tile solve: g formed IN KERNEL from x0, then FISTA.
    The prediction chain is FOLDED once outside the kernel — W = Sx'(Su'Q)'
    is (n, d), so the in-kernel g = x0 @ W is a single GEMM with a 128-lane
    inner dim (the two-GEMM tn-wide chain cost ~35% of kernel MXU passes at
    the flagship). Per tile the only HBM traffic is the (tile, n) x0 read
    and the (tile, d) U/g writes. Returns (U, g)."""
    N, n = x0s.shape
    d = H.shape[0]
    d_pad = _round_up(d, 128)
    n_col_pad = _round_up(n, 128)
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad_batch = _round_up(N, tile_n)

    Ht = jnp.zeros((d_pad, d_pad), H.dtype).at[:d, :d].set(H.T)
    W = jnp.dot(SxT, SuTQT, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    w_p = jnp.zeros((n_col_pad, d_pad), H.dtype).at[:n, :d].set(W)
    x0_p = jnp.zeros((n_pad_batch, n_col_pad), x0s.dtype).at[:N, :n].set(x0s)
    u0_p = jnp.zeros((n_pad_batch, d_pad), x0s.dtype)
    params = jnp.stack(
        [(1.0 / lipschitz).astype(jnp.float32),
         jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)]
    )
    kernel = functools.partial(
        _fista_g_kernel, iters=iters, coarse_iters=min(coarse_iters, iters), d=d
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad_batch // tile_n,),
        in_specs=[
            pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_col_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_col_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), x0s.dtype),
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), x0s.dtype),
        ),
        interpret=interpret,
    )(Ht, x0_p, w_p, params, u0_p)
    U, g = out
    return U[:N, :d], g[:N, :d]


def _fista_g_res_kernel(Ht_ref, x0_ref, w_ref, lostep_ref, u0_ref,
                        out_ref, res_ref, *, iters: int, coarse_iters: int,
                        d: int, n_real: int, tile_n: int,
                        tail_precision: str = "bf16x3",
                        g_precision: str = "highest"):
    """_fista_g_kernel variant with the RESIDUAL fused in: after the
    iteration loop, one more VMEM-resident GEMM forms the projected-gradient
    residual and reduces it to a per-tile scalar. Saves the g HBM write AND
    the caller's external residual pass (which re-read U and g from HBM).
    g comes from the FOLDED prediction chain W (one 128-inner GEMM — see
    _fista_g_kernel). Padded rows (>= n_real) and columns (>= d) are masked
    out of the max — they hold clip-of-zero garbage whenever the box
    excludes 0."""
    step = lostep_ref[0]
    lo = lostep_ref[1]
    hi = lostep_ref[2]
    # g is iteration-invariant so its error persists through the solve:
    # HIGHEST default; "bf16x4" measured within the 1e-4 parity bound on
    # the ADMM twin (scripts/admm_breakdown.py) and saves ~3-8 us/call
    from numpower_tpu.kernels.precision import make_tail_dot as _mtd

    g = _mtd(w_ref[:], g_precision)(x0_ref[:])
    U = _fista_loop(g, Ht_ref[:], step, lo, hi, u0_ref[:], iters, coarse_iters,
                    tail_precision)
    out_ref[:] = U
    # residual GEMM at tail precision (bf16x3, 3 MXU passes): the residual
    # is a ~1e-5-scale MEASUREMENT against a 1e-4 bound — the scheme's
    # O(2^-16) relative error is far below what it reports. (HIGHEST here
    # cost 6 passes, ~4% of kernel cycles.)
    from numpower_tpu.kernels.precision import make_tail_dot

    grad = make_tail_dot(Ht_ref[:], tail_precision)(U) + g
    r = jnp.abs(U - jnp.clip(U - step * grad, lo, hi))
    i = pl.program_id(0)
    rows = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    valid = jnp.logical_and(rows < n_real, cols < d)
    r_max = jnp.max(jnp.where(valid, r, 0.0))
    # max-accumulate into a single (8, 128) VMEM block revisited by every
    # grid step (Mosaic requires last-two block dims (8k, 128k) or
    # equal-to-array; a (1, 1) per-tile scalar block is rejected).
    @pl.when(i == 0)
    def _init():
        res_ref[:] = jnp.zeros_like(res_ref)

    res_ref[:] = jnp.maximum(res_ref[:], jnp.full(res_ref.shape, r_max))


@functools.partial(
    jax.jit,
    static_argnames=("iters", "coarse_iters", "tile_n", "interpret",
                     "tail_precision", "g_precision"),
)
def fista_mpc_pallas_res(
    H: jax.Array,        # (d, d)
    SxT: jax.Array,      # (n, Tn)  = Sx'
    SuTQT: jax.Array,    # (Tn, d)  = (Su' Qbar)'
    x0s: jax.Array,      # (N, n) scenario initial states
    lo: jax.Array,
    hi: jax.Array,
    lipschitz: jax.Array,
    iters: int = 40,
    coarse_iters: int = 0,
    tile_n: int = 1024,
    interpret: bool = False,
    U0: Optional[jax.Array] = None,
    tail_precision: str = "bf16x3",
    g_precision: str = "highest",
):
    """fista_mpc_pallas with the residual FUSED into the kernel: returns
    (U (N, d), resid scalar). The only HBM traffic per tile is the x0 read
    and the U write — no g materialization, no external residual GEMM.
    g comes from the FOLDED prediction chain (see fista_mpc_pallas).
    U0 warm-starts the iterate (receding-horizon shifts). g_precision
    "bf16x4" trades ~5e-5 persistent g error for 2 nominal MXU passes
    (see the ADMM twin's measured A/B, scripts/admm_breakdown.py)."""
    N, n = x0s.shape
    d = H.shape[0]
    d_pad = _round_up(d, 128)
    n_col_pad = _round_up(n, 128)
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad_batch = _round_up(N, tile_n)
    n_tiles = n_pad_batch // tile_n

    Ht = jnp.zeros((d_pad, d_pad), H.dtype).at[:d, :d].set(H.T)
    W = jnp.dot(SxT, SuTQT, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    w_p = jnp.zeros((n_col_pad, d_pad), H.dtype).at[:n, :d].set(W)
    x0_p = jnp.zeros((n_pad_batch, n_col_pad), x0s.dtype).at[:N, :n].set(x0s)
    u0_p = jnp.zeros((n_pad_batch, d_pad), x0s.dtype)
    if U0 is not None:
        u0_p = u0_p.at[:N, :d].set(U0)
    params = jnp.stack(
        [(1.0 / lipschitz).astype(jnp.float32),
         jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)]
    )
    kernel = functools.partial(
        _fista_g_res_kernel, iters=iters,
        coarse_iters=min(coarse_iters, iters), d=d, n_real=N, tile_n=tile_n,
        tail_precision=tail_precision, g_precision=g_precision,
    )
    U, res = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, n_col_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_col_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), x0s.dtype),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_batch * d_pad * d_pad * (iters + 1),
            bytes_accessed=(d_pad * d_pad + 2 * n_pad_batch * d_pad) * 4,
            transcendentals=iters,
        ),
        interpret=interpret,
    )(Ht, x0_p, w_p, params, u0_p)
    return U[:N, :d], res[0, 0]


def solve_mpc_boxqp_pallas(qp, x0s, u_lo: float, u_hi: float, iters: int = 40,
                           coarse_iters: Optional[int] = None):
    """Drop-in for models.boxqp.solve_mpc_boxqp using the fused kernel."""
    from numpower_tpu.models.boxqp import BoxQPResult
    from numpower_tpu.models.condensed import default_coarse_iters, gradient_offset

    if coarse_iters is None:
        coarse_iters = default_coarse_iters(qp, iters)
    g = gradient_offset(qp, x0s)
    U = fista_boxqp_pallas(
        qp.H, g, jnp.float32(u_lo), jnp.float32(u_hi), qp.lipschitz,
        iters=iters, coarse_iters=coarse_iters,
    )
    step = 1.0 / qp.lipschitz
    grad = U @ qp.H.T + g
    resid = jnp.max(jnp.abs(U - jnp.clip(U - step * grad, u_lo, u_hi)))
    return BoxQPResult(U=U, iterations=jnp.asarray(iters), residual=resid)

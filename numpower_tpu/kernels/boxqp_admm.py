"""Fused ADMM box-QP Pallas TPU kernel.

Same speed-of-light argument as kernels/boxqp_fista.py: the ADMM iteration

    x   = (rho (z - y) - g) @ Minv'          [one MXU GEMM]
    x_r = alpha x + (1 - alpha) z            [over-relaxation]
    z   = clip(x_r + y, lo, hi)              [projection]
    y   = y + x_r - z                        [dual ascent]

is one (tile, d) @ (d, d) GEMM plus VPU elementwise work. The XLA scan
version re-reads z/y/g (~2 MB each at N=4096, d=120) from HBM every
iteration; here the solve matrix (d^2 fp32, ~57 KB for the flagship) stays
VMEM-resident and the carry lives on-chip, so per tile the only HBM traffic
is the tiny x0/g read and the z write.

s-form iteration (the VPU-lean rewrite these kernels run): carry the single
pre-projection state s = x_r + y instead of (z, y) — then z = clip(s),
y = s - z, and the recursion collapses to

    p = clip(s, lo, hi)                      [1 VPU op]
    t = 2 p - s                (= z - y)     [1 fma]
    u = t @ (rho Minv)'                      [the GEMM]
    s' = s + alpha (u - c - p)               [3 VPU ops]

with c = Minv g an iteration-invariant formed once per tile (for the MPC
variants, folded into the prediction-matrix chain: c = (x0 Sx')(Su'Q)'Minv'
— zero extra GEMMs). Algebraically identical to the (z, y) form (the
over-relaxed exact-solve ADMM), but ~5 VPU ops/iteration instead of ~10 and
one live carry instead of two — measured 1.09x on the v5e flagship. It is
also slightly MORE accurate in the bf16 coarse phase: the MXU operand
t = z - y is box-bounded (~O(1)) where the old rhs rho(z-y) - g carried g's
magnitude, so bf16 rounding hits a smaller dynamic range (both residuals
measured ~40% lower at the flagship's 27-coarse-iteration schedule).

Minv = (H + rho I)^{-1} is formed ONCE outside the kernel (d x d Cholesky +
two triangular solves — trivial next to the iters x N x d^2 GEMM stream) and
shared across every scenario and iteration: the exact-solve x-update is what
makes ADMM's rate condition-number independent (models/admm.py docstring).

Same mixed-precision policy as the FISTA kernel: the first `coarse_iters`
GEMMs run single-pass bf16 on the MXU (precision=DEFAULT on fp32 operands —
Mosaic rejects explicit bf16 operands), the tail contracts to the fp32
fixed point at bf16x3 precision (3-pass hi/lo split, kernels/precision.py —
measured ~3.7x faster than Mosaic's HIGHEST at ~1e-5 accuracy). ADMM
contracts at a condition-independent rate, so a short fixed tail suffices
on any conditioning (validated in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from numpower_tpu.kernels.precision import make_tail_dot


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def minv_factor(H: jax.Array, rho) -> jax.Array:
    """(H + rho I)^{-1} via Cholesky + two triangular solves — the single
    factorization shared by the kernel and the caller's residual pass."""
    d = H.shape[0]
    M = H + rho * jnp.eye(d, dtype=H.dtype)
    L = jnp.linalg.cholesky(M)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(d, dtype=H.dtype),
                                             lower=True)
    return Linv.T @ Linv


def _s_loop(s, c, rminvT, lo, hi, alpha, iters: int, coarse_iters: int,
            tail_dot):
    """Shared s-form iteration body (pure arrays, VMEM-resident). rminvT is
    (rho Minv)' and c = Minv g; tail_dot is the caller's
    make_tail_dot(rminvT, ...) (shared with its residual pass). Returns the
    final pre-projection state s (z = clip(s), y = s - z)."""
    for k in range(iters):
        p = jnp.clip(s, lo, hi)
        t = 2.0 * p - s
        if k < coarse_iters:
            u = jnp.dot(t, rminvT, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        else:
            u = tail_dot(t)
        s = s + alpha * (u - c - p)
    return s


def _s_loop_pipelined(s, c, rminvT, lo, hi, alpha, iters: int,
                      coarse_iters: int, tail_dot):
    """Software-pipelined s-form (r4 verdict #6 experiment). Algebraically
    the same recursion as _s_loop, re-associated so the only op that
    DEPENDS on the GEMM result is one fma:

        p = clip(s); t = 2p - s          [pre-GEMM]
        a = s - alpha c - alpha p        [pre-GEMM — independent of u]
        u = t @ (rho Minv)'              [MXU]
        s' = a + alpha u                 [1 fma post-GEMM]

    vs _s_loop's s' = s + alpha (u - c - p), which puts 3 VPU ops after
    the GEMM on the u -> t' critical path. If Mosaic co-issues VPU work
    with the MXU, the a-computation hides under the GEMM and the
    serialized VPU chain per iteration drops ~5 -> ~3 ops. fp32
    re-association changes rounding at the 1e-7 level (A/B-verified
    within residual bounds).

    MEASURED NEUTRAL on v5e (2026-08-21, r4 verdict #6 closed): 3
    interleaved pairs at the flagship (N=4096, 32 bf16 + 8 fp32, K=512)
    read s 77.90 us vs sp 78.24 us (0.996x), |dz| 1.3e-5. Mosaic's
    scheduler evidently already extracts whatever MXU/VPU overlap the
    dependency structure allows — the remaining ~0.14 us/iter VPU
    residual is serialized on the algorithm's own u -> clip -> t chain,
    not on instruction ordering. Kept selectable (form="sp") as the
    documented experiment; default stays "s"."""
    ac = alpha * c
    for k in range(iters):
        p = jnp.clip(s, lo, hi)
        t = 2.0 * p - s
        a = s - ac - alpha * p
        if k < coarse_iters:
            u = jnp.dot(t, rminvT, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        else:
            u = tail_dot(t)
        s = a + alpha * u
    return s


def _zy_loop(z0, c, rminvT, lo, hi, alpha, iters: int, coarse_iters: int,
             tail_dot):
    """(z, y)-form reference iteration — the classic four-update recursion
    the s-form collapses (module docstring). Kept ONLY for the reproducible
    A/B benchmark (bench.py --ab-admm, VERDICT r2 weak #7): algebraically
    identical to _s_loop, ~10 VPU ops and two live carries per iteration
    instead of ~5 and one. Returns the equivalent pre-projection state
    s = z + y so callers share the s-form epilogue."""
    z = z0
    y = jnp.zeros_like(z0)
    for k in range(iters):
        t = z - y
        if k < coarse_iters:
            u = jnp.dot(t, rminvT, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        else:
            u = tail_dot(t)
        x = u - c
        x_r = alpha * x + (1.0 - alpha) * z
        z_new = jnp.clip(x_r + y, lo, hi)
        y = y + x_r - z_new
        z = z_new
    return z + y


def _admm_kernel(rminvT_ref, g_ref, params_ref, z0_ref, out_ref, y_out_ref, *,
                 iters: int, coarse_iters: int,
                 tail_precision: str = "bf16x3"):
    """One grid step = one scenario tile. rminvT (d_pad, d_pad) VMEM-resident;
    c = Minv g formed with one extra GEMM ((g @ rminvT) / rho — amortized
    over the iteration count); the single carry s lives in VMEM/registers;
    fully unrolled static loop. Emits both z (the feasible solution) and the
    scaled dual y = s - z so the wrapper can form exact residuals."""
    rho = params_ref[0]
    lo = params_ref[1]
    hi = params_ref[2]
    alpha = params_ref[3]
    rminvT = rminvT_ref[:]
    c = jnp.dot(g_ref[:], rminvT, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) * (1.0 / rho)
    s = _s_loop(z0_ref[:], c, rminvT, lo, hi, alpha, iters, coarse_iters,
                make_tail_dot(rminvT, tail_precision))
    z = jnp.clip(s, lo, hi)
    out_ref[:] = z
    y_out_ref[:] = s - z


@functools.partial(
    jax.jit, static_argnames=("iters", "coarse_iters", "tile_n", "interpret")
)
def admm_boxqp_pallas(
    H: jax.Array,          # (d, d) symmetric PD
    g: jax.Array,          # (N, d) per-scenario linear terms
    lo: jax.Array,
    hi: jax.Array,
    rho: jax.Array,        # scalar ADMM penalty
    iters: int = 30,
    coarse_iters: int = 0,
    over_relax: float = 1.6,
    tile_n: int = 1024,
    interpret: bool = False,
    U0: Optional[jax.Array] = None,
    Minv: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched ADMM box-QP solve: argmin_U 1/2 U'HU + g_i'U, lo<=U<=hi.

    Returns (z, y): the feasible iterate and scaled dual, both (N, d).
    Zero-pads d to the 128-lane boundary and N to the tile. Padded Minv
    rows/cols are zero, so padded columns never couple into real ones
    (padded s columns evolve as clip-of-garbage but are sliced away).
    U0 warm-starts z (clipped); cold start is z0 = clip(0, lo, hi) — the
    SAME iterate sequence as models/admm.solve_boxqp_admm, so the backends
    agree even when the box excludes zero. Pass a precomputed Minv =
    (H + rho I)^{-1} to share the factorization with residual reporting.
    """
    N, d = g.shape
    d_pad = _round_up(d, 128)
    # VMEM envelope: rminvT (d_pad^2) + 4 tile buffers (g, z0, z_out, y_out)
    # + the live s carry — scale the tile down as d grows so the per-tile
    # footprint stays ~the flagship's (d_pad=128, tile=1024) size.
    tile_n = min(tile_n, max(128, (1024 * 128) // d_pad))
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad = _round_up(N, tile_n)
    dt = g.dtype

    if Minv is None:
        Minv = minv_factor(H, rho)

    rminvT = jnp.zeros((d_pad, d_pad), dt).at[:d, :d].set(rho * Minv.T)
    g_p = jnp.zeros((n_pad, d_pad), dt).at[:N, :d].set(g)
    if U0 is None:
        z0 = jnp.clip(jnp.zeros((n_pad, d_pad), dt), lo, hi)
    else:
        z0 = jnp.zeros((n_pad, d_pad), dt).at[:N, :d].set(
            jnp.clip(U0, lo, hi))
    params = jnp.stack([
        jnp.asarray(rho, jnp.float32),
        jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32),
        jnp.asarray(over_relax, jnp.float32),
    ])

    kernel = functools.partial(
        _admm_kernel, iters=iters, coarse_iters=min(coarse_iters, iters)
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
        out_specs=(
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, d_pad), dt),
            jax.ShapeDtypeStruct((n_pad, d_pad), dt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * d_pad * (iters + 1),
            bytes_accessed=(d_pad * d_pad + 4 * n_pad * d_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rminvT, g_p, params, z0)
    z, y = out
    return z[:N, :d], y[:N, :d]


def _admm_g_kernel(rminvT_ref, x0_ref, w_ref, params_ref, z0_ref,
                   out_ref, y_out_ref, g_out_ref, *, iters: int,
                   coarse_iters: int, tail_precision: str = "bf16x3"):
    """ADMM with IN-KERNEL g formation (kernels/boxqp_fista._fista_g_kernel
    pattern): g = x0 @ W with the prediction chain W = Sx'(Su'Q)' FOLDED
    into one (n, d) matrix by the wrapper — one 128-inner GEMM instead of
    two HIGHEST GEMMs over the Tn~384 middle dim. c = Minv g via one more
    GEMM, then the s-form loop. Per tile the only HBM traffic is the tiny
    x0 read and the (z, y, g) writes."""
    rho = params_ref[0]
    lo = params_ref[1]
    hi = params_ref[2]
    alpha = params_ref[3]
    g = jnp.dot(x0_ref[:], w_ref[:], precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    g_out_ref[:] = g
    rminvT = rminvT_ref[:]
    c = jnp.dot(g, rminvT, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) * (1.0 / rho)
    s = _s_loop(z0_ref[:], c, rminvT, lo, hi, alpha, iters, coarse_iters,
                make_tail_dot(rminvT, tail_precision))
    z = jnp.clip(s, lo, hi)
    out_ref[:] = z
    y_out_ref[:] = s - z


def _admm_g_res_kernel(rminvT_ref, x0_ref, wc_ref, params_ref,
                       z0_ref, out_ref, rp_ref, rd_ref, *, iters: int,
                       coarse_iters: int, d: int, n_real: int, tile_n: int,
                       tail_precision: str = "bf16x3", form: str = "s",
                       c_precision: str = "highest"):
    """_admm_g_kernel variant with BOTH residuals fused in. Here c = Minv g
    comes straight from the FULLY-folded chain c = x0 @ Wc with
    Wc = Sx' (Su'Q)' Minv' formed once on the host — g is never
    materialized and the per-tile c formation is ONE 128-inner GEMM. After
    the loop, one extra VMEM-resident x-update forms the primal/dual
    residuals and reduces them to per-tile scalars. Saves the y and g HBM
    writes AND the caller's external residual pass (which re-read z/y/g
    from HBM). Padded rows/columns are masked out of the maxes."""
    rho = params_ref[0]
    lo = params_ref[1]
    hi = params_ref[2]
    alpha = params_ref[3]
    # c formation is iteration-invariant, so its error persists through
    # the whole solve. Public default is "bf16x4" (4 passes): measured
    # 43.7 us vs HIGHEST's 52.4 at the flagship with |dz| 7.0e-5 — inside
    # the 1e-4 parity bound, where bf16x3's 1.15e-4 was not
    # (scripts/admm_breakdown.py, v5e 2026-08-21). "highest" restores the
    # exact-fp32 formation.
    c = make_tail_dot(wc_ref[:], c_precision)(x0_ref[:])
    rminvT = rminvT_ref[:]
    tail_dot = make_tail_dot(rminvT, tail_precision)
    loop = {"s": _s_loop, "zy": _zy_loop, "sp": _s_loop_pipelined}[form]
    s = loop(z0_ref[:], c, rminvT, lo, hi, alpha, iters, coarse_iters,
             tail_dot)
    z = jnp.clip(s, lo, hi)
    out_ref[:] = z
    # exact residuals at the final (z, y = s - z): same formulas as the XLA
    # path — x = (rho(z-y) - g) @ Minv' = (2z - s) @ rminvT - c
    x = tail_dot(2.0 * z - s) - c
    z_next = jnp.clip(s + alpha * (x - z), lo, hi)
    i = pl.program_id(0)
    rows = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    valid = jnp.logical_and(rows < n_real, cols < d)
    rp_max = jnp.max(jnp.where(valid, jnp.abs(x - z), 0.0))
    rd_max = rho * jnp.max(jnp.where(valid, jnp.abs(z_next - z), 0.0))

    # max-accumulate into single (8, 128) VMEM blocks revisited by every
    # grid step (Mosaic rejects (1, 1) per-tile scalar blocks).
    @pl.when(i == 0)
    def _init():
        rp_ref[:] = jnp.zeros_like(rp_ref)
        rd_ref[:] = jnp.zeros_like(rd_ref)

    rp_ref[:] = jnp.maximum(rp_ref[:], jnp.full(rp_ref.shape, rp_max))
    rd_ref[:] = jnp.maximum(rd_ref[:], jnp.full(rd_ref.shape, rd_max))


@functools.partial(
    jax.jit,
    static_argnames=("iters", "coarse_iters", "tile_n", "interpret", "form",
                     "c_precision"),
)
def admm_mpc_pallas_res(
    H: jax.Array,        # (d, d)
    SxT: jax.Array,      # (n, Tn)  = Sx'
    SuTQT: jax.Array,    # (Tn, d)  = (Su' Qbar)'
    x0s: jax.Array,      # (N, n) scenario initial states
    lo: jax.Array,
    hi: jax.Array,
    rho: jax.Array,
    iters: int = 40,
    coarse_iters: int = 0,
    over_relax: float = 1.6,
    tile_n: int = 1024,
    interpret: bool = False,
    Minv: Optional[jax.Array] = None,
    U0: Optional[jax.Array] = None,
    form: str = "s",
    c_precision: str = "bf16x4",
):
    """admm_mpc_pallas with residuals FUSED into the kernel: returns
    (z (N, d), r_primal scalar, r_dual scalar). Per tile the only HBM
    traffic is the x0 read and the z write. U0 (N, d) warm-starts z
    (clipped; the serving tick's shifted previous plan — models/mpc.py);
    cold start is z0 = clip(0) as in the XLA scan path."""
    N, n = x0s.shape
    d = H.shape[0]
    d_pad = _round_up(d, 128)
    n_col_pad = _round_up(n, 128)
    tile_n = min(tile_n, max(128, (1024 * 128) // d_pad))
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad_batch = _round_up(N, tile_n)
    n_tiles = n_pad_batch // tile_n
    dt = x0s.dtype

    if Minv is None:
        Minv = minv_factor(H, rho)
    rminvT = jnp.zeros((d_pad, d_pad), dt).at[:d, :d].set(rho * Minv.T)
    # FULLY fold the prediction chain + Minv into one (n, d) matrix:
    # c = Minv g = x0 @ (Sx' (Su'Q)' Minv') — the kernel's c formation is
    # then a single 128-inner GEMM (the old two-GEMM tn-wide chain cost
    # ~35% of kernel MXU passes at the flagship) and g is never materialized.
    Wc = jnp.dot(SxT, jnp.dot(SuTQT, Minv.T,
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32),
                 precision=lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    wc_p = jnp.zeros((n_col_pad, d_pad), dt).at[:n, :d].set(Wc)
    x0_p = jnp.zeros((n_pad_batch, n_col_pad), dt).at[:N, :n].set(x0s)
    if U0 is None:
        z0 = jnp.clip(jnp.zeros((n_pad_batch, d_pad), dt), lo, hi)
    else:
        z0 = jnp.zeros((n_pad_batch, d_pad), dt).at[:N, :d].set(
            jnp.clip(U0, lo, hi))
    params = jnp.stack([
        jnp.asarray(rho, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), jnp.asarray(over_relax, jnp.float32),
    ])
    kernel = functools.partial(
        _admm_g_res_kernel, iters=iters,
        coarse_iters=min(coarse_iters, iters), d=d, n_real=N, tile_n=tile_n,
        form=form, c_precision=c_precision,
    )
    z, rp, rd = pl.pallas_call(
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
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), dt),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_batch * d_pad * d_pad * (iters + 1),
            bytes_accessed=(d_pad * d_pad + 2 * n_pad_batch * d_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rminvT, x0_p, wc_p, params, z0)
    return z[:N, :d], rp[0, 0], rd[0, 0]


@functools.partial(
    jax.jit, static_argnames=("iters", "coarse_iters", "tile_n", "interpret")
)
def admm_mpc_pallas(
    H: jax.Array,        # (d, d)
    SxT: jax.Array,      # (n, Tn)  = Sx'
    SuTQT: jax.Array,    # (Tn, d)  = (Su' Qbar)'
    x0s: jax.Array,      # (N, n) scenario initial states
    lo: jax.Array,
    hi: jax.Array,
    rho: jax.Array,
    iters: int = 40,
    coarse_iters: int = 0,
    over_relax: float = 1.6,
    tile_n: int = 1024,
    interpret: bool = False,
    Minv: Optional[jax.Array] = None,
):
    """End-to-end MPC ADMM tile solve: g formed IN KERNEL from x0 via the
    FOLDED prediction chain W = Sx'(Su'Q)' (one 128-inner GEMM).
    Returns (z, y, g) so the caller can form residuals without re-deriving
    g. Cold start z0 = clip(0, lo, hi) (matches the XLA scan path)."""
    N, n = x0s.shape
    d = H.shape[0]
    d_pad = _round_up(d, 128)
    n_col_pad = _round_up(n, 128)
    tile_n = min(tile_n, max(128, (1024 * 128) // d_pad))
    tile_n = min(tile_n, _round_up(N, 8))
    n_pad_batch = _round_up(N, tile_n)
    dt = x0s.dtype

    if Minv is None:
        Minv = minv_factor(H, rho)
    rminvT = jnp.zeros((d_pad, d_pad), dt).at[:d, :d].set(rho * Minv.T)
    W = jnp.dot(SxT, SuTQT, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    w_p = jnp.zeros((n_col_pad, d_pad), dt).at[:n, :d].set(W)
    x0_p = jnp.zeros((n_pad_batch, n_col_pad), dt).at[:N, :n].set(x0s)
    z0 = jnp.clip(jnp.zeros((n_pad_batch, d_pad), dt), lo, hi)
    params = jnp.stack([
        jnp.asarray(rho, jnp.float32), jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32), jnp.asarray(over_relax, jnp.float32),
    ])
    kernel = functools.partial(
        _admm_g_kernel, iters=iters, coarse_iters=min(coarse_iters, iters)
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
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), dt),
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), dt),
            jax.ShapeDtypeStruct((n_pad_batch, d_pad), dt),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_batch * d_pad * d_pad * (iters + 1),
            bytes_accessed=(d_pad * d_pad + 5 * n_pad_batch * d_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rminvT, x0_p, w_p, params, z0)
    z, y, g = out
    return z[:N, :d], y[:N, :d], g[:N, :d]

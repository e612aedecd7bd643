"""Fused one-hot systematic-resampling Pallas kernel (round 5).

models/particle._systematic_resample's r4 one-hot formulation runs the
resample as out = OH @ parts with OH built from slot-boundary comparisons.
Under XLA the (N, N) fp32 one-hot is a materialized producer feeding a
batched GEMM — at the bench shape (B=256, N=1024) the step costs 0.57 ms
against a ~0.35 ms MXU-pass bound (scripts/pf_resample_micro.py).

This kernel fuses construction and contraction: per grid step it builds a
(blk, N) BOOLEAN mask block in VMEM straight from the integer slot
boundaries (two iota comparisons) and contracts it with the (N, n) cloud
on the MXU — the mask never exists in HBM.

RESULT (v5e 2026-08-21): **slower than the XLA formulation** — 0.92 (blk=N)
/ 1.17 (blk=512) / 1.23 (blk=256) ms/step vs XLA's 0.60 at B=256, N=1024
(first draft with (N, 1) boundary layout: 1.46 — each block copy was 1024
strided 4-byte DMA elements). XLA's producer fusion streams the boundary
comparisons into the batched GEMM without ever staging the mask, which
this kernel must materialize in VMEM per block; the staging + grid
overhead outweigh the saved fusion. Kept as the documented experiment
(models/particle method="pallas"); production stays on the XLA one-hot
with the measured N-envelope routing.

Slot semantics are integer-identical to models/particle._systematic_resample
(asserted element-exact in tests/test_kernels.py and by the bench verify
check pf_resampling_indices for the XLA form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _resample_kernel(mprev_ref, m_ref, p_ref, out_ref, *, blk: int):
    """Grid step (b, i): output-slot block i of trajectory b.
    mprev/m: (1, N) int32 slot boundaries in LANE layout (a first draft
    stored them (N, 1) — compact in HBM but each block copy became 1024
    strided 4-byte DMA elements and the kernel measured 2.4x SLOWER than
    the XLA one-hot); p: (N, n) cloud; out: (blk, n)."""
    i = pl.program_id(1)
    i0 = i * blk
    N = p_ref.shape[0]
    slots = i0 + jax.lax.broadcasted_iota(jnp.int32, (blk, N), 0)
    oh = jnp.logical_and(slots >= mprev_ref[0, :], slots < m_ref[0, :])
    out_ref[:] = jnp.dot(oh.astype(p_ref.dtype), p_ref[:],
                         precision=jax.lax.Precision.DEFAULT,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def resample_onehot_pallas(parts, m, blk: int = 512,
                           interpret: bool = False):
    """Systematic resample of a batched cloud via the fused one-hot kernel.

    parts (B, N, n) fp32, m (B, N) int32 slot boundaries from
    models/particle._resample_slots. Returns the resampled (B, N, n)
    cloud: out[b, i] = parts[b, j] for the unique j with
    m[b, j-1] <= i < m[b, j]. The 0/1 mask is exact in the single-pass
    MXU contraction (bf16 represents 0/1 exactly; each output is a sum of
    exactly one particle)."""
    B, N, n = parts.shape
    dt = parts.dtype
    blk = min(blk, N)
    assert N % blk == 0, (N, blk)
    m_prev = jnp.concatenate(
        [jnp.zeros((B, 1), m.dtype), m[:, :-1]], axis=1)
    out = pl.pallas_call(
        functools.partial(_resample_kernel, blk=blk),
        grid=(B, N // blk),
        in_specs=[
            pl.BlockSpec((None, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, n), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, blk, n), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, n), dt),
        interpret=interpret,
    )(m_prev[:, None, :], m[:, None, :], parts)
    return out

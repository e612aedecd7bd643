"""Mixed-precision matmul schemes for Pallas TPU kernels.

Mosaic lowers fp32 dot_general at two precisions only: DEFAULT (one bf16
MXU pass — fast, ~8 mantissa bits) and HIGHEST (full fp32 emulation —
measured ~3-4x slower than a single pass on v5e, worse than the nominal
6-pass model). Precision.HIGH is rejected by the Mosaic lowering, so the
classic 3-pass scheme must be built by hand:

    x = x_hi + x_lo,  hi = bf16(x) upcast to fp32 (exactly representable),
    x @ y ~= hi@hi + hi@lo + lo@hi        [drops only the lo@lo term]

Each term is a DEFAULT-precision matmul on bf16-representable fp32 operands
(Mosaic rejects explicit bf16 matmul operands; the fp32 carrier costs
nothing since DEFAULT truncates to bf16 losslessly here). The dropped lo@lo
term is O(2^-16) relative — fp32-level accuracy at 3 MXU passes.

Measured on the flagship fused FISTA (v5e, 4096x128, 27 coarse + 13 tail
iterations): HIGHEST tail 182 us/batch vs bf16x3 tail 49 us/batch, with
max deviation vs an fp64 reference 3.0e-5 (HIGHEST: 2.1e-5; parity bound
1e-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def bf16_split(x: jax.Array):
    """Exact split x = hi + lo with both parts bf16-representable but stored
    as fp32."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def make_tail_dot(Ht: jax.Array, tail_precision: str):
    """Returns dot(Y) -> Y @ Ht at the requested tail precision.

    "bf16x3" (default for the fused QP kernels): 3-pass hi/lo scheme with
    Ht split ONCE (loop-invariant). "highest": lax HIGHEST fp32 emulation.
    """
    if tail_precision == "bf16x3":
        Ht_hi, Ht_lo = bf16_split(Ht)

        def tail_dot(Y):
            Y_hi, Y_lo = bf16_split(Y)
            kw = dict(precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
            return (jnp.dot(Y_hi, Ht_hi, **kw) + jnp.dot(Y_hi, Ht_lo, **kw)
                    + jnp.dot(Y_lo, Ht_hi, **kw))

        return tail_dot
    if tail_precision == "bf16x4":
        # full 4-term split (keeps the lo@lo term bf16x3 drops): one extra
        # MXU pass for ~2x lower error — for iteration-INVARIANT operands
        # (the fused ADMM's c formation) whose error persists through the
        # whole solve, where bf16x3 measured 1.15e-4 solution drift
        # (just past the 1e-4 parity bound) and HIGHEST costs ~7 us more
        # (scripts/admm_breakdown.py, v5e 2026-08-21)
        Ht_hi, Ht_lo = bf16_split(Ht)

        def tail_dot(Y):
            Y_hi, Y_lo = bf16_split(Y)
            kw = dict(precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
            return (jnp.dot(Y_hi, Ht_hi, **kw) + jnp.dot(Y_hi, Ht_lo, **kw)
                    + jnp.dot(Y_lo, Ht_hi, **kw)
                    + jnp.dot(Y_lo, Ht_lo, **kw))

        return tail_dot
    if tail_precision == "highest":
        def tail_dot(Y):
            return jnp.dot(Y, Ht, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

        return tail_dot
    raise ValueError(f"unknown tail_precision {tail_precision!r}")

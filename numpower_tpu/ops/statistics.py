"""Statistics ops.

Reference: /root/reference/src/ndmath/statistics.c (CPU-only). Semantics that
parity tests must preserve (SURVEY.md §7 "Hard parts"):

- quantile: sort + *linear* interpolation (statistics.c:32-44) — jnp's
  default method="linear" matches.
- std: two-pass **population** std, ddof=0 (statistics.c:88-103) — jnp
  default matches.
- variance: population (statistics.c:112-125).
- average: weighted mean (statistics.c:135-154).
"""

from __future__ import annotations

import jax.numpy as jnp

from numpower_tpu.ops.creation import asarray


def quantile(a, q, axis=None, keepdims: bool = False):
    """NDArray_Quantile (statistics.c:14-79), generalized to axis."""
    return jnp.quantile(asarray(a), jnp.asarray(q), axis=axis, keepdims=keepdims)


def percentile(a, q, axis=None, keepdims: bool = False):
    return jnp.percentile(asarray(a), jnp.asarray(q), axis=axis, keepdims=keepdims)


def std(a, axis=None, ddof: int = 0, keepdims: bool = False):
    """NDArray_Std (statistics.c:88-103) — population std (ddof=0 default)."""
    return jnp.std(asarray(a), axis=axis, ddof=ddof, keepdims=keepdims)


def variance(a, axis=None, ddof: int = 0, keepdims: bool = False):
    """NDArray_Variance (statistics.c:112-125)."""
    return jnp.var(asarray(a), axis=axis, ddof=ddof, keepdims=keepdims)


var = variance


def average(a, axis=None, weights=None):
    """NDArray_Average (statistics.c:135-154) — weighted mean."""
    a = asarray(a)
    if weights is None:
        return jnp.mean(a, axis=axis)
    return jnp.average(a, axis=axis, weights=asarray(weights))

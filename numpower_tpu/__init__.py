"""numpower_tpu — TPU-native numerical computing + MPC engine.

A from-scratch TPU-native framework with the full op-surface capabilities of
the NumPower reference (/root/reference — a PHP C extension with AVX2/CUDA
backends), re-designed for JAX/XLA/Pallas:

- `numpower_tpu.ops`      — functional op layer (fp32 default, full NumPy
                            broadcasting, XLA-fused; SURVEY.md §2.2-2.3 parity)
- `numpower_tpu.NDArray`  — object API mirroring the reference's PHP class
                            (~140 methods, operators, iteration)
- `numpower_tpu.models`   — plants + MPC/trajectory-optimization solvers
                            (LQR/Riccati, iLQR, box-QP, tube-MPC)
- `numpower_tpu.kernels`  — Pallas TPU kernels for hot paths
- `numpower_tpu.parallel` — mesh/sharding/multi-host scaling
- `numpower_tpu.runtime`  — native C++ runtime (registry, IO, allocator)
"""

__version__ = "0.1.0"

import jax as _jax

# The BASELINE parity bound (<=1e-4 vs the fp32 CPU reference) requires fp32
# MXU accumulation; the platform default lowers matmuls/convs to bf16-class
# precision. Hot kernels that want bf16 opt in explicitly per-call.
_jax.config.update("jax_default_matmul_precision", "highest")

from numpower_tpu import ops  # noqa: F401
from numpower_tpu.ndarray import ArithmeticOperand, NDArray, nd  # noqa: F401

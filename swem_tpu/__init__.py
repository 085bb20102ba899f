"""swem_tpu — a TPU-native (JAX/XLA/Pallas) video object segmentation framework.

A ground-up re-design of SWEM ("Towards Real-Time Video Object Segmentation
with Sequential Weighted Expectation-Maximization", CVPR 2022) for TPU:

- pure-functional model with explicit, fixed-shape EM prototype memory state
  threaded through ``jax.lax.scan`` over frames,
- static max-object padding with validity masking instead of dynamic
  concatenation,
- bf16 MXU compute with f32 EM statistics,
- data parallelism via ``jax.sharding`` over a device mesh.

Reference behavior: lmm077/SWEM (cited per-module as /root/reference/<file>:<line>).
"""

from swem_tpu.config import (
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    SolverConfig,
    SWEMConfig,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "EvalConfig",
    "LossConfig",
    "ModelConfig",
    "SolverConfig",
    "SWEMConfig",
    "__version__",
]

"""rama-tpu: a TPU-native quantized LLM inference engine + streaming server.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of oliverhu/rama
(a Rust/CUDA llama2 inference engine + SSE server — see SURVEY.md): the Llama-2
forward pass with weight-only INT8/INT4 group-quantized matmuls as fused
dequant+matmul Pallas kernels, a batched paged KV cache, a continuous-batching
scheduler, and tensor-parallel sharding over a TPU device mesh.
"""

from rama_tpu.config import ModelConfig, EngineConfig

__version__ = "0.1.0"

__all__ = ["ModelConfig", "EngineConfig", "__version__"]

"""nnop_tpu — a TPU-native fused-kernel engine (JAX/Pallas).

Brand-new implementation of the capabilities of pxl-th/NNop.jl
(/root/reference), re-designed TPU-first: Pallas kernels on the MXU/VPU in
place of KernelAbstractions workgroup kernels, `jax.custom_vjp` in place of
ChainRules rrules, and VMEM-budget block-size selection in place of the
shared-memory groupsize autotuner. See SURVEY.md for the layer map.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: Mosaic/XLA compiles through the remote
# tunnel are expensive (measured 12-137 s for one flash-attention chain
# cold vs ~1 s warm) and the remote compile service has large jitter.
# Default to a REPO-LOCAL dir: the workspace persists across driver
# rounds while ~/.cache may not (VERDICT r4 item 1c), so a cache warmed
# by scripts/warm_cache.py at round end survives into the driver's
# bench run. Cache keys hash the serialized module INCLUDING the Mosaic
# kernel payload, whose debug locations shift with any source edit —
# warming is only effective when done with the final code.
if not _os.environ.get("NNOP_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except OSError:  # read-only install dir: fall back to no cache
        pass

from nnop_tpu.ops.softmax import online_softmax
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.layer_norm import layer_norm
from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope
from nnop_tpu.ops.flash_attention import flash_attention
from nnop_tpu.ops.attention_decode import decode_attention
from nnop_tpu.ops.flash_attention import flash_attention_chunked
from nnop_tpu.ops.quantization import (QTensor, QTensor4, dequantize,
                                        dequantize4, quantize, quantize4)
from nnop_tpu.ops.quantized_matmul import quantized_matmul, quantized_matmul4
from nnop_tpu.ops.grouped_matmul import grouped_matmul

__all__ = [
    "online_softmax",
    "rms_norm",
    "layer_norm",
    "RotaryEmbedding",
    "llama_rope",
    "flash_attention",
    "flash_attention_chunked",
    "decode_attention",
    "QTensor",
    "quantize",
    "dequantize",
    "quantized_matmul",
    "grouped_matmul",
    "quantized_matmul4",
    "QTensor4",
    "quantize4",
    "dequantize4",
]

"""Weight-only INT8/FP8 Llama: quantized param tree + matmul dispatch.

North-star scope (BASELINE.json: "weight-only INT8/FP8 ... within 0.1 PPL
of FP32"). Projection weights become QTensors (per-output-channel scales);
the forward pass routes them through the fused-dequant Pallas matmul
(ops/quantized_matmul.py). Norm weights and the embedding table stay fp
(negligible size, quality-critical).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nnop_tpu.ops.quantization import QTensor, QTensor4, quantize, quantize4
from nnop_tpu.ops.quantized_matmul import (
    quantized_matmul,
    quantized_matmul4,
    quantized_matmul_w8a8,
)

_QUANT_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"}


def quantize_params(params, dtype=jnp.int8, *, wbits: int = 8,
                    group: int = 128):
    """Quantize projection weights: int8/fp8 with per-out-channel scales
    (wbits=8) or packed int4 with per-(K-group, channel) scales (wbits=4)."""

    def q(w):
        if wbits == 4:
            return quantize4(w, group=group)
        return quantize(w, axis=0, dtype=dtype)

    def qlayer(layer):
        moe = "w_router" in layer
        out = {}
        for k, v in layer.items():
            if moe and k in ("w_gate", "w_up", "w_down"):
                # stacked experts (E, K, N): int8 with per-(E, N) scales,
                # or per-expert packed int4 planes under wbits=4 — both
                # served by the grouped kernels
                if wbits == 4:
                    from nnop_tpu.ops.grouped_matmul import quantize4_experts

                    out[k] = quantize4_experts(v, group=group)
                else:
                    out[k] = quantize(v, axis=1)
            elif k in _QUANT_KEYS and k != "w_router":
                out[k] = q(v)
            else:
                out[k] = v  # w_router stays fp: tiny, routing-critical
        return out

    out = {k: v for k, v in params.items()}
    if "lm_head" in params:
        out["lm_head"] = q(params["lm_head"])
    out["layers"] = [qlayer(layer) for layer in params["layers"]]
    return out


def qmatmul(x, w):
    """Matmul hook for models.llama.forward: dispatch QTensor/QTensor4
    weights to the fused-dequant kernels, fp weights to einsum."""
    if isinstance(w, QTensor):
        return quantized_matmul(x, w)
    if isinstance(w, QTensor4):
        return quantized_matmul4(x, w)
    return jnp.einsum("bld,do->blo", x, w)


def qmatmul_w8a8(x, w):
    """Like qmatmul, but large-M int8 matmuls run W8A8 on the native int8
    MXU (per-token activation quant; ~1.8x the cast->bf16 rate at prefill
    shapes on v5e — quantized_matmul.py rationale). Small-M (decode) and
    int4/fp8 weights keep the weight-only path, whose activations are
    exact."""
    if (
        isinstance(w, QTensor)
        and w.values.dtype == jnp.int8
        and int(np.prod(x.shape[:-1])) >= 256
    ):
        return quantized_matmul_w8a8(x, w)
    return qmatmul(x, w)

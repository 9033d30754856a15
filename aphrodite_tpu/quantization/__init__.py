"""Quantization framework.

Parity model: aphrodite/quantization/base_config.py (QuantizationConfig ->
per-layer QuantizeMethod) with the reference's 37-method surface narrowed to
the TPU-relevant families (SURVEY.md §2.6 "behavioral spec"):

- gptq / awq      : W4A16 group-quantized checkpoints, repacked at load time
- int8 / tpu_int8 : W8A8 dynamic per-token activation quant on the int8 MXU
- w8a16           : weight-only int8 (quantize-on-load from fp checkpoints)
- fp8             : fp8-e4m3 weight storage (upcast matmul on v5e; native on
                    MXU generations that support fp8)

A *quantized weight* is a dict leaf in the param pytree (see
layers/linear.py); each method defines checkpoint-name mapping, load-time
repack, and the matmul implementation in ops/quant_gemm.py.
"""
from __future__ import annotations

from typing import Optional

from aphrodite_tpu.quantization.base import (QuantizationConfig,
                                             get_quantization_config)

QUANTIZATION_METHODS = ["gptq", "awq", "int8", "tpu_int8", "w8a16", "fp8",
                        "fp8_w8a8", "fp8-dynamic", "ptpc_fp8",
                        "fp4", "fp5", "fp6", "fp7", "quant_llm",
                        "deepspeedfp"]

__all__ = ["QuantizationConfig", "get_quantization_config",
           "QUANTIZATION_METHODS"]

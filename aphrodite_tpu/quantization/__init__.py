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

# Reference quant methods with NO import path here, and why. Mirrors the
# model registry's EXPLICITLY_DROPPED ledger: every name in the reference's
# aphrodite/quantization/__init__.py is either in QUANTIZATION_METHODS, has
# a checkpoint importer (quantization/importers.py: bitsandbytes, modelopt,
# nvfp4, compressed-tensors, hqq; loader/gguf.py: gguf), or appears below.
# "unpack:<method>" = the serialized checkpoint is a permuted repack of an
# importable base format and is unpacked at load (see loader.py).
EXPLICITLY_DROPPED_QUANT = {
    "aqlm": "additive/codebook quantization: decode needs a per-weight "
            "codebook gather, which maps to TPU as a serial VMEM lookup - "
            "no MXU path; format is effectively retired upstream",
    "quip": "lattice codebook + Hadamard rotation, same codebook-gather "
            "problem as aqlm; no public checkpoints of note",
    "squeezellm": "sparse outlier + LUT dense parts; LUT dequant is "
                  "scalar-gather-bound on TPU; retired upstream",
    "exl2": "variable bit-width rows packed for a bespoke CUDA kernel; "
            "rows at 2-8 bits in one tensor defeat static-shape XLA "
            "tiling; convert via exllamav2->gptq offline instead",
    "marlin": "unpack:gptq - marlin checkpoints are tile-permuted GPTQ "
              "(marlin_permute applied at repack); importer inverts the "
              "permutation back to the gptq layout, then the normal W4A16 "
              "path applies (see loader.py marlin handling)",
    "gptq_marlin_24": "2:4 sparse marlin: TPU MXU has no structured "
                      "sparsity unit - dense W4A16 is the TPU equivalent",
    "bitblas": "kernel-tuning wrapper around gptq/awq layouts, not a "
               "distinct checkpoint format: load the base checkpoint",
    "qqq": "marlin-family W4A8 with CUDA-specific s1/s2 scale fusion; no "
           "published TPU-relevant checkpoints",
    "fbgemm_fp8": "fp8 per-channel checkpoints load via the generic fp8 "
                  "method (identical tensor layout)",
    "experts_int8": "covered by w8a16 quantize-on-load applied to expert "
                    "weights (moe_common.py)",
    "neuron_quant": "AWS Neuron backend glue, not a checkpoint format",
    "ipex": "Intel CPU backend glue, not a checkpoint format",
    "quark": "AMD tooling wrapper; its fp8/int checkpoints load via the "
             "fp8/int8 methods",
    "torchao": "torch-runtime in-memory quantization, no serialized "
               "format to import",
    "moe_wna16": "kernel-selection alias for gptq/awq MoE layers; base "
                 "checkpoint loads via gptq/awq",
    "fp2": "quant_llm family below 3 bits: accuracy collapse documented "
           "upstream; fp4-fp7 are supported",
    "fp3": "see fp2",
}

__all__ = ["QuantizationConfig", "get_quantization_config",
           "QUANTIZATION_METHODS", "EXPLICITLY_DROPPED_QUANT"]

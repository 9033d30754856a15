"""Generic HF fallback ("TransformersForCausalLM").

Parity: aphrodite/modeling/models/transformers.py — the reference runs
unlisted architectures through the HF module graph with its own attention
injected. A TPU-native engine cannot execute arbitrary torch modules, so
the fallback here covers the case that makes up most of the long tail:
checkpoints whose weights follow the standard llama schema
(model.layers.N.self_attn.{q,k,v,o}_proj / mlp.{gate,up,down}_proj /
rms norms) under an unlisted architecture name. The config is probed for
llama-compatible geometry; anything else gets a clear unsupported error.

Explicit opt-in also works: ``LLM(model=..., architecture=
"TransformersForCausalLM")`` forces the fallback resolution.
"""
from __future__ import annotations

from aphrodite_tpu.utils import logger

_REQUIRED = ("hidden_size", "num_hidden_layers", "num_attention_heads",
             "intermediate_size", "vocab_size")


def _llama_compatible(hf) -> bool:
    tc = getattr(hf, "text_config", None) or hf
    return all(getattr(tc, k, None) for k in _REQUIRED)


class TransformersForCausalLM:
    """Factory: resolve to the llama-schema decoder after validating the
    config, so `architecture="TransformersForCausalLM"` works like the
    reference's model_impl=transformers escape hatch."""

    def __new__(cls, config):
        if not _llama_compatible(config.hf_config):
            raise ValueError(
                "TransformersForCausalLM fallback needs llama-compatible "
                "config geometry (hidden_size/num_hidden_layers/"
                "num_attention_heads/intermediate_size/vocab_size)")
        from aphrodite_tpu.models.llama import LlamaForCausalLM
        logger.warning(
            "architecture %s not registered — serving through the "
            "llama-schema fallback (reference TransformersForCausalLM)",
            getattr(config.hf_config, "architectures", ["?"])[0])
        return LlamaForCausalLM(config)


def maybe_transformers_fallback(arch: str):
    """Registry hook: only the explicit fallback name resolves here;
    unlisted architectures are NOT silently served through it (a wrong
    schema would produce garbage, not an error)."""
    if arch == "TransformersForCausalLM":
        return TransformersForCausalLM
    return None

"""Architecture registry (reference: aphrodite/modeling/models/registry.py:30).

Maps HF `architectures[0]` strings to model classes. Lazy imports; OOT models
register via `register_model`.
"""
from __future__ import annotations

import importlib
from typing import Callable

# arch name -> (module, class name)
_TEXT_GENERATION: dict[str, tuple[str, str]] = {
    "LlamaForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("aphrodite_tpu.models.llama", "MistralForCausalLM"),
    "Qwen2ForCausalLM": ("aphrodite_tpu.models.llama", "Qwen2ForCausalLM"),
    "MixtralForCausalLM": ("aphrodite_tpu.models.mixtral",
                           "MixtralForCausalLM"),
    "Qwen2MoeForCausalLM": ("aphrodite_tpu.models.mixtral",
                            "Qwen2MoeForCausalLM"),
    "Qwen3MoeForCausalLM": ("aphrodite_tpu.models.mixtral",
                            "Qwen3MoeForCausalLM"),
    "DeepseekForCausalLM": ("aphrodite_tpu.models.mixtral",
                            "DeepseekForCausalLM"),
    "Llama4ForCausalLM": ("aphrodite_tpu.models.llama4",
                          "Llama4ForCausalLM"),
    "Llama4ForConditionalGeneration": (
        "aphrodite_tpu.models.llama4", "Llama4ForConditionalGeneration"),
    "QuantMixtralForCausalLM": ("aphrodite_tpu.models.mixtral",
                                "MixtralForCausalLM"),
    "OlmoeForCausalLM": ("aphrodite_tpu.models.mixtral",
                         "OlmoeForCausalLM"),
    "GraniteMoeForCausalLM": ("aphrodite_tpu.models.moe_variants",
                              "GraniteMoeForCausalLM"),
    "GraniteMoeSharedForCausalLM": ("aphrodite_tpu.models.moe_variants",
                                    "GraniteMoeSharedForCausalLM"),
    "PhimoeForCausalLM": ("aphrodite_tpu.models.moe_variants",
                          "PhiMoEForCausalLM"),
    "PhiMoEForCausalLM": ("aphrodite_tpu.models.moe_variants",
                          "PhiMoEForCausalLM"),
    "DbrxForCausalLM": ("aphrodite_tpu.models.moe_variants",
                        "DbrxForCausalLM"),
    "GemmaForCausalLM": ("aphrodite_tpu.models.gemma", "GemmaForCausalLM"),
    "Gemma2ForCausalLM": ("aphrodite_tpu.models.gemma",
                          "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": ("aphrodite_tpu.models.gemma",
                          "Gemma3ForCausalLM"),
    "Phi3ForCausalLM": ("aphrodite_tpu.models.phi3_qwen3",
                        "Phi3ForCausalLM"),
    "Phi3SmallForCausalLM": ("aphrodite_tpu.models.phi3_small",
                             "Phi3SmallForCausalLM"),
    "Qwen3ForCausalLM": ("aphrodite_tpu.models.phi3_qwen3",
                         "Qwen3ForCausalLM"),
    "MolmoForCausalLM": ("aphrodite_tpu.models.molmo", "MolmoForCausalLM"),
    "GraniteSpeechForConditionalGeneration": (
        "aphrodite_tpu.models.granite_speech",
        "GraniteSpeechForConditionalGeneration"),
    "Florence2ForConditionalGeneration": (
        "aphrodite_tpu.models.florence2",
        "Florence2ForConditionalGeneration"),
    "Phi4MMForCausalLM": ("aphrodite_tpu.models.phi4mm",
                          "Phi4MMForCausalLM"),
    "Florence2LanguageForConditionalGeneration": (
        "aphrodite_tpu.models.bart", "BartForConditionalGeneration"),
    "Ovis2ForConditionalGeneration": ("aphrodite_tpu.models.ovis2",
                                      "Ovis2ForConditionalGeneration"),
    "Ovis": ("aphrodite_tpu.models.ovis2", "Ovis2ForConditionalGeneration"),
    "KimiVLForConditionalGeneration": ("aphrodite_tpu.models.kimi_vl",
                                       "KimiVLForConditionalGeneration"),
    "DeepseekV2ForCausalLM": ("aphrodite_tpu.models.deepseek",
                              "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("aphrodite_tpu.models.deepseek",
                              "DeepseekV3ForCausalLM"),
    "MiniCPM3ForCausalLM": ("aphrodite_tpu.models.deepseek",
                            "MiniCPM3ForCausalLM"),
    # Classic decoder family (learned positions / LN-bias / fused QKV).
    "StableLmForCausalLM": ("aphrodite_tpu.models.llama_variants",
                            "StableLmForCausalLM"),
    "StableLMEpochForCausalLM": ("aphrodite_tpu.models.llama_variants",
                                 "StableLmForCausalLM"),
    "Starcoder2ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                              "Starcoder2ForCausalLM"),
    "PhiForCausalLM": ("aphrodite_tpu.models.llama_variants",
                       "PhiForCausalLM"),
    "GPTJForCausalLM": ("aphrodite_tpu.models.llama_variants",
                        "GPTJForCausalLM"),
    "GPTBigCodeForCausalLM": ("aphrodite_tpu.models.llama_variants",
                              "GPTBigCodeForCausalLM"),
    "PersimmonForCausalLM": ("aphrodite_tpu.models.llama_variants",
                             "PersimmonForCausalLM"),
    "CohereForCausalLM": ("aphrodite_tpu.models.llama_variants",
                          "CohereForCausalLM"),
    "Cohere2ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                           "Cohere2ForCausalLM"),
    "OlmoForCausalLM": ("aphrodite_tpu.models.llama_variants",
                        "OlmoForCausalLM"),
    "Olmo2ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                         "Olmo2ForCausalLM"),
    "GraniteForCausalLM": ("aphrodite_tpu.models.llama_variants",
                           "GraniteForCausalLM"),
    "NemotronForCausalLM": ("aphrodite_tpu.models.llama_variants",
                            "NemotronForCausalLM"),
    "BloomForCausalLM": ("aphrodite_tpu.models.llama_variants",
                         "BloomForCausalLM"),
    "MPTForCausalLM": ("aphrodite_tpu.models.llama_variants",
                       "MPTForCausalLM"),
    "MptForCausalLM": ("aphrodite_tpu.models.llama_variants",
                       "MPTForCausalLM"),
    "FalconForCausalLM": ("aphrodite_tpu.models.llama_variants",
                          "FalconForCausalLM"),
    "RWForCausalLM": ("aphrodite_tpu.models.llama_variants",
                      "FalconForCausalLM"),
    "BaichuanForCausalLM": ("aphrodite_tpu.models.llama_variants",
                            "BaichuanForCausalLM"),
    "BaiChuanForCausalLM": ("aphrodite_tpu.models.llama_variants",
                            "BaiChuanForCausalLM"),
    "GlmForCausalLM": ("aphrodite_tpu.models.llama_variants",
                       "GlmForCausalLM"),
    "Glm4ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                        "Glm4ForCausalLM"),
    "InternLMForCausalLM": ("aphrodite_tpu.models.llama_variants",
                            "InternLMForCausalLM"),
    "InternLM2ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                             "InternLM2ForCausalLM"),
    # InternLM2-VE ("visual expert" MLP applies only to image tokens;
    # text serving is weight-identical — reference internlm2_ve.py).
    "InternLM2VEForCausalLM": ("aphrodite_tpu.models.llama_variants",
                               "InternLM2ForCausalLM"),
    "InternLM3ForCausalLM": ("aphrodite_tpu.models.llama",
                             "InternLM3ForCausalLM"),
    "ExaoneForCausalLM": ("aphrodite_tpu.models.llama_variants",
                          "ExaoneForCausalLM"),
    "Exaone4ForCausalLM": ("aphrodite_tpu.models.llama_variants",
                           "Exaone4ForCausalLM"),
    "OrionForCausalLM": ("aphrodite_tpu.models.llama_variants",
                         "OrionForCausalLM"),
    "MiniCPMForCausalLM": ("aphrodite_tpu.models.llama_variants",
                           "MiniCPMForCausalLM"),
    # Fused-QKV remote-code families + Grok-1 (misc_decoders.py).
    "QWenLMHeadModel": ("aphrodite_tpu.models.qwen_vl",
                        "QWenLMHeadModelDispatch"),
    "QwenVLForConditionalGeneration": (
        "aphrodite_tpu.models.qwen_vl", "QwenVLForConditionalGeneration"),
    # Qwen2.5-Omni: the thinker is served (talker/token2wav = TTS stages,
    # out of serving scope — reference qwen2_5_omni_thinker.py).
    "Qwen2_5OmniModel": ("aphrodite_tpu.models.qwen2_5_omni",
                         "Qwen2_5OmniThinkerForConditionalGeneration"),
    "Qwen2_5OmniForConditionalGeneration": (
        "aphrodite_tpu.models.qwen2_5_omni",
        "Qwen2_5OmniThinkerForConditionalGeneration"),
    "Qwen2_5OmniThinkerForConditionalGeneration": (
        "aphrodite_tpu.models.qwen2_5_omni",
        "Qwen2_5OmniThinkerForConditionalGeneration"),
    "JAISLMHeadModel": ("aphrodite_tpu.models.misc_decoders",
                        "JAISLMHeadModel"),
    "ChatGLMModel": ("aphrodite_tpu.models.misc_decoders", "ChatGLMModel"),
    "ChatGLMForConditionalGeneration": ("aphrodite_tpu.models.misc_decoders",
                                        "ChatGLMModel"),
    "TeleChat2ForCausalLM": ("aphrodite_tpu.models.misc_decoders",
                             "TeleChat2ForCausalLM"),
    "TeleFLMForCausalLM": ("aphrodite_tpu.models.misc_decoders",
                           "TeleFLMForCausalLM"),
    "Fairseq2LlamaForCausalLM": ("aphrodite_tpu.models.misc_decoders",
                                 "Fairseq2LlamaForCausalLM"),
    "Grok1ModelForCausalLM": ("aphrodite_tpu.models.misc_decoders",
                              "Grok1ModelForCausalLM"),
    # Heterogeneous-layer decoders (hetero.py).
    "DeciLMForCausalLM": ("aphrodite_tpu.models.hetero",
                          "DeciLMForCausalLM"),
    "ArcticForCausalLM": ("aphrodite_tpu.models.hetero",
                          "ArcticForCausalLM"),
    # Llama-exact exports under their own architecture names.
    "LLaMAForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "XverseForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "SolarForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "AquilaForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "AquilaModel": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "YiForCausalLM": ("aphrodite_tpu.models.llama", "LlamaForCausalLM"),
    "GPT2LMHeadModel": ("aphrodite_tpu.models.gpt_family",
                        "GPT2LMHeadModel"),
    "OPTForCausalLM": ("aphrodite_tpu.models.gpt_family",
                       "OPTForCausalLM"),
    "GPTNeoXForCausalLM": ("aphrodite_tpu.models.gpt_family",
                           "GPTNeoXForCausalLM"),
    # SSM (recurrent state, no paged KV).
    "MambaForCausalLM": ("aphrodite_tpu.models.mamba", "MambaForCausalLM"),
    "FalconMambaForCausalLM": ("aphrodite_tpu.models.mamba",
                               "FalconMambaForCausalLM"),
    "Mamba2ForCausalLM": ("aphrodite_tpu.models.mamba",
                          "Mamba2ForCausalLM"),
    "JambaForCausalLM": ("aphrodite_tpu.models.jamba",
                         "JambaForCausalLM"),
    "BambaForCausalLM": ("aphrodite_tpu.models.jamba",
                         "BambaForCausalLM"),
    "Zamba2ForCausalLM": ("aphrodite_tpu.models.zamba2",
                          "Zamba2ForCausalLM"),
    "Plamo2ForCausalLM": ("aphrodite_tpu.models.plamo2",
                          "Plamo2ForCausalLM"),
    "MiniMaxText01ForCausalLM": ("aphrodite_tpu.models.minimax_text",
                                 "MiniMaxText01ForCausalLM"),
    "MiniMaxVL01ForConditionalGeneration": (
        "aphrodite_tpu.models.minimax_text",
        "MiniMaxVL01ForConditionalGeneration"),
    # Multimodal (vision-language).
    "LlavaForConditionalGeneration": ("aphrodite_tpu.models.llava",
                                      "LlavaForConditionalGeneration"),
    # Mantis ships LLaVA-architecture checkpoints (reference mantis.py).
    "MantisForConditionalGeneration": ("aphrodite_tpu.models.llava",
                                       "LlavaForConditionalGeneration"),
    "LlavaNextForConditionalGeneration": (
        "aphrodite_tpu.models.llava_next",
        "LlavaNextForConditionalGeneration"),
    "LlavaNextVideoForConditionalGeneration": (
        "aphrodite_tpu.models.llava_next",
        "LlavaNextVideoForConditionalGeneration"),
    "LlavaOnevisionForConditionalGeneration": (
        "aphrodite_tpu.models.llava_next",
        "LlavaOnevisionForConditionalGeneration"),
    "Mistral3ForConditionalGeneration": (
        "aphrodite_tpu.models.pixtral", "Mistral3ForConditionalGeneration"),
    # InternViT + pixel-shuffle family (internvl.py); NVLM-D / H2OVL /
    # Skywork-R1V ship the same tower/connector with prompt-format and
    # tiling-policy differences (reference nvlm_d.py, h2ovl.py,
    # skyworkr1v.py).
    "Phi3VForCausalLM": ("aphrodite_tpu.models.phi3v",
                         "Phi3VForCausalLM"),
    "MllamaForConditionalGeneration": ("aphrodite_tpu.models.mllama",
                                       "MllamaForConditionalGeneration"),
    "Blip2ForConditionalGeneration": ("aphrodite_tpu.models.blip2",
                                      "Blip2ForConditionalGeneration"),
    "ChameleonForConditionalGeneration": (
        "aphrodite_tpu.models.chameleon",
        "ChameleonForConditionalGeneration"),
    "AyaVisionForConditionalGeneration": (
        "aphrodite_tpu.models.aya_vision",
        "AyaVisionForConditionalGeneration"),
    "AriaForConditionalGeneration": ("aphrodite_tpu.models.aria",
                                     "AriaForConditionalGeneration"),
    # MiniCPM-V / MiniCPM-o (remote-code archs; MiniCPM-o's audio tower
    # routes through the adapter path, vision is the shared resampler).
    "MiniCPMV": ("aphrodite_tpu.models.minicpmv", "MiniCPMVForCausalLM"),
    "MiniCPMO": ("aphrodite_tpu.models.minicpmv", "MiniCPMVForCausalLM"),
    "DeepseekVLV2ForCausalLM": ("aphrodite_tpu.models.deepseek_vl2",
                                "DeepseekVLV2ForCausalLM"),
    "GLM4VForCausalLM": ("aphrodite_tpu.models.glm4v",
                         "GLM4VForCausalLM"),
    "InternVLChatModel": ("aphrodite_tpu.models.internvl",
                          "InternVLChatModel"),
    "NVLM_D": ("aphrodite_tpu.models.internvl", "InternVLChatModel"),
    "H2OVLChatModel": ("aphrodite_tpu.models.internvl",
                       "InternVLChatModel"),
    "SkyworkR1VChatModel": ("aphrodite_tpu.models.internvl",
                            "InternVLChatModel"),
    # HF-format pixtral checkpoints (pixtral-hf) ship as Llava with a
    # pixtral tower; this alias covers configs exporting the native name.
    "PixtralForConditionalGeneration": (
        "aphrodite_tpu.models.pixtral",
        "PixtralLlavaForConditionalGeneration"),
    "Qwen2VLForConditionalGeneration": (
        "aphrodite_tpu.models.qwen2_vl", "Qwen2VLForConditionalGeneration"),
    "Qwen2_5_VLForConditionalGeneration": (
        "aphrodite_tpu.models.qwen2_vl",
        "Qwen2_5_VLForConditionalGeneration"),
    "PaliGemmaForConditionalGeneration": (
        "aphrodite_tpu.models.paligemma",
        "PaliGemmaForConditionalGeneration"),
    "Gemma3ForConditionalGeneration": (
        "aphrodite_tpu.models.gemma3_mm", "Gemma3ForConditionalGeneration"),
    "Qwen2AudioForConditionalGeneration": (
        "aphrodite_tpu.models.audio_lm",
        "Qwen2AudioForConditionalGeneration"),
    "UltravoxModel": ("aphrodite_tpu.models.audio_lm", "UltravoxModel"),
    "Idefics3ForConditionalGeneration": (
        "aphrodite_tpu.models.idefics3", "Idefics3ForConditionalGeneration"),
    "SmolVLMForConditionalGeneration": (
        "aphrodite_tpu.models.idefics3", "SmolVLMForConditionalGeneration"),
    "FuyuForCausalLM": ("aphrodite_tpu.models.fuyu", "FuyuForCausalLM"),
    # Encoder-decoder (speech-to-text / text-to-text).
    "WhisperForConditionalGeneration": ("aphrodite_tpu.models.whisper",
                                        "WhisperForConditionalGeneration"),
    "BartForConditionalGeneration": ("aphrodite_tpu.models.bart",
                                     "BartForConditionalGeneration"),
    "BartModel": ("aphrodite_tpu.models.bart", "BartModel"),
}

# Embedding/encoder architectures (served via LLM.embed / /v1/embeddings).
_EMBEDDING: dict[str, tuple[str, str]] = {
    "BertModel": ("aphrodite_tpu.models.bert", "BertEmbeddingModel"),
    "BertForMaskedLM": ("aphrodite_tpu.models.bert", "BertEmbeddingModel"),
    "RobertaModel": ("aphrodite_tpu.models.bert", "BertEmbeddingModel"),
    "RobertaForMaskedLM": ("aphrodite_tpu.models.bert",
                           "BertEmbeddingModel"),
    "XLMRobertaModel": ("aphrodite_tpu.models.bert", "BertEmbeddingModel"),
    # Rotary-position BERT variants.
    "NomicBertModel": ("aphrodite_tpu.models.bert",
                       "NomicBertEmbeddingModel"),
    "GteModel": ("aphrodite_tpu.models.bert", "GteEmbeddingModel"),
    "NewModel": ("aphrodite_tpu.models.bert", "GteEmbeddingModel"),
    "ModernBertModel": ("aphrodite_tpu.models.modern_bert",
                        "ModernBertEmbeddingModel"),
    "ModernBertForSequenceClassification": (
        "aphrodite_tpu.models.modern_bert",
        "ModernBertForSequenceClassification"),
    # Cross-encoders (scoring/reranking via /score + /rerank).
    "BertForSequenceClassification": ("aphrodite_tpu.models.bert",
                                      "BertForSequenceClassification"),
    "RobertaForSequenceClassification": ("aphrodite_tpu.models.bert",
                                         "BertForSequenceClassification"),
    "XLMRobertaForSequenceClassification": (
        "aphrodite_tpu.models.bert", "BertForSequenceClassification"),
    # Decoder-based embedders (e5-mistral / gte-Qwen2 style): pass
    # `architecture="Qwen2Model"` (etc.) to embed a ForCausalLM checkpoint.
    "Qwen2Model": ("aphrodite_tpu.models.decoder_embed",
                   "DecoderEmbeddingModel"),
    "LlamaModel": ("aphrodite_tpu.models.decoder_embed",
                   "DecoderEmbeddingModel"),
    "MistralModel": ("aphrodite_tpu.models.decoder_embed",
                     "DecoderEmbeddingModel"),
    "Gemma2Model": ("aphrodite_tpu.models.decoder_embed",
                    "DecoderEmbeddingModel"),
    "Qwen3Model": ("aphrodite_tpu.models.decoder_embed",
                   "DecoderEmbeddingModel"),
    # GritLM: llama/mistral decoder served for embeddings (reference
    # gritlm.py — the instruction-masked pooling variant is a serving-time
    # option; mean/last pooling is exposed through LLM.embed).
    "GritLM": ("aphrodite_tpu.models.decoder_embed",
               "DecoderEmbeddingModel"),
    "InternLM2ForRewardModel": ("aphrodite_tpu.models.decoder_embed",
                                "InternLM2ForRewardModel"),
    "Qwen2ForRewardModel": ("aphrodite_tpu.models.decoder_embed",
                            "Qwen2ForRewardModel"),
    "Qwen2ForProcessRewardModel": ("aphrodite_tpu.models.decoder_embed",
                                   "Qwen2ForRewardModel"),
    "Qwen2ForSequenceClassification": (
        "aphrodite_tpu.models.decoder_embed",
        "Qwen2ForSequenceClassification"),
    "LlamaForSequenceClassification": (
        "aphrodite_tpu.models.decoder_embed",
        "Qwen2ForSequenceClassification"),
    "JambaForSequenceClassification": (
        "aphrodite_tpu.models.decoder_embed",
        "JambaForSequenceClassification"),
}
_TEXT_GENERATION.update(_EMBEDDING)

# Speculative-decoding head architectures (reference registry.py
# _SPECULATIVE_DECODING_MODELS). These are draft modules, not standalone
# servable models: they load through SpeculativeConfig (config.py
# autodetects the method from the draft checkpoint's architecture) and the
# spec_decode proposers.
SPECULATIVE_ARCHS = {
    "MedusaModel": "medusa",
    "MLPSpeculatorPreTrainedModel": "mlp_speculator",
    "EAGLEModel": "eagle",
    "EagleLlamaForCausalLM": "eagle",
    "Eagle3LlamaForCausalLM": "eagle",
    "DeepSeekMTPModel": "deepseek_mtp",
}

MODEL_REGISTRY = dict(_TEXT_GENERATION)
EMBEDDING_ARCHS = set(_EMBEDDING)
_OOT: dict[str, type] = {}


def register_model(arch: str, cls_or_factory) -> None:
    _OOT[arch] = cls_or_factory


def get_model_class(arch: str) -> Callable:
    if arch in _OOT:
        return _OOT[arch]
    if arch == "PrithviGeoSpatialMAE":
        # Explicit drop (SURVEY.md §2.7): the reference's Prithvi support
        # (prithvi_geospatial_mae.py) instantiates the entire model through
        # the external `terratorch` library at startup; there is no
        # self-contained architecture to re-implement. Serve it via a
        # terratorch plugin with register_model() instead.
        raise ValueError(
            "PrithviGeoSpatialMAE requires the external 'terratorch' "
            "library (the reference delegates the whole model to it). "
            "Install terratorch and register the model with "
            "aphrodite_tpu.models.registry.register_model().")
    if arch in SPECULATIVE_ARCHS:
        raise ValueError(
            f"{arch!r} is a speculative-decoding head — serve it as a "
            "draft via --speculative-config "
            f"'{{\"draft_model\": \"<path>\"}}' (method "
            f"{SPECULATIVE_ARCHS[arch]!r}), not as a standalone model")
    if arch in EXPLICITLY_DROPPED:
        raise ValueError(
            f"Model architecture {arch!r} is deliberately not supported: "
            f"{EXPLICITLY_DROPPED[arch]}")
    try:
        module, name = MODEL_REGISTRY[arch]
    except KeyError:
        # Generic HF fallback (reference TransformersForCausalLM,
        # modeling/models/transformers.py): serve llama-schema
        # architectures that simply aren't listed by name.
        from aphrodite_tpu.models.transformers_fallback import (
            maybe_transformers_fallback)
        fb = maybe_transformers_fallback(arch)
        if fb is not None:
            return fb
        raise ValueError(
            f"Model architecture {arch!r} is not supported. "
            f"Supported: {sorted(MODEL_REGISTRY)}") from None
    return getattr(importlib.import_module(module), name)


# Reference architectures deliberately NOT carried over, with rationale
# (SURVEY §2.4 registry row: every gap is a decision, not an omission).
EXPLICITLY_DROPPED = {
    "PrithviGeoSpatialMAE": (
        "geospatial masked-autoencoder for satellite imagery segmentation "
        "(reference prithvi_geospatial_mae.py) — an image-in/image-out "
        "model with no tokenizer or LLM serving surface; out of scope for "
        "a text/multimodal LLM engine"),
}


def supported_architectures() -> list[str]:
    return sorted(set(MODEL_REGISTRY) | set(_OOT) | set(SPECULATIVE_ARCHS)
                  | {"TransformersForCausalLM"})

"""Engine configuration tree.

A lean re-design of the reference's 18-dataclass `AphroditeConfig`
(reference: aphrodite/common/config.py:4025). Each sub-config owns one concern
and validates itself in ``__post_init__``; ``EngineConfig`` composes them.
Differences from the reference, by design:

- One engine generation (v1-shaped): chunked prefill and prefix caching are
  always-available scheduler behaviors, not modes.
- Parallelism is described as a device-mesh shape ``(dp, tp)`` rather than
  process-group world sizes; XLA inserts the collectives.
- TPU shape-bucketing knobs live here because compiled-program count is a
  first-class serving concern.
"""
from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

from aphrodite_tpu.utils import cdiv, logger

# Valid KV-cache dtypes (reference: aphrodite/common/config.py:1449 CacheDType).
KV_CACHE_DTYPES = ("auto", "fp8", "fp8_e4m3", "fp8_e5m2")


def _materialize_subconfig(v: dict):
    """Nested config dict -> a real config object with the RIGHT defaults.
    HF serializes only diff-from-default fields, so reconstructing with
    PretrainedConfig would silently flip class defaults (e.g. Qwen2.5-Omni
    text's tie_word_embeddings)."""
    from transformers import CONFIG_MAPPING, PretrainedConfig
    mt = v.get("model_type")
    cls = CONFIG_MAPPING.get(mt) if mt else None
    if cls is None and mt:
        try:
            from transformers.models.qwen2_5_omni import (
                configuration_qwen2_5_omni as _omni)
            cls = {
                "qwen2_5_omni_text": _omni.Qwen2_5OmniTextConfig,
                "qwen2_5_omni_vision_encoder":
                    _omni.Qwen2_5OmniVisionEncoderConfig,
                "qwen2_5_omni_audio_encoder":
                    _omni.Qwen2_5OmniAudioEncoderConfig,
            }.get(mt)
        except ImportError:  # pragma: no cover
            cls = None
    return cls(**v) if cls is not None else PretrainedConfig.from_dict(v)


@dataclass
class ModelConfig:
    """The model to serve and how to interpret its checkpoint."""

    model: str
    tokenizer: Optional[str] = None
    # "auto" | "hf" | "mistral" (tekken.json; tokenizer_utils.get_tokenizer)
    tokenizer_mode: str = "auto"
    # Quantize the lm_head too (reference QuantizationConfig
    # lm_head_quantized): per-channel int8 here — near-lossless and the
    # [H, V] matmul streams half the bytes at decode.
    quantize_lm_head: bool = False
    trust_remote_code: bool = False
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    revision: Optional[str] = None
    # Loaded HF config object (transformers.PretrainedConfig). May be supplied
    # directly (tests) instead of loaded from `model`.
    hf_config: Any = None
    # Override the architecture detection (e.g. "LlamaForCausalLM").
    architecture: Optional[str] = None
    enforce_eager: bool = False

    def __post_init__(self) -> None:
        if self.tokenizer is None:
            self.tokenizer = self.model
        if self.hf_config is None:
            if str(self.model).endswith(".gguf"):
                from aphrodite_tpu.loader.gguf import (GGUFFile,
                                                       gguf_to_hf_config)
                g = GGUFFile(self.model)
                try:
                    self.hf_config = gguf_to_hf_config(g)
                finally:
                    g.close()
            else:
                from transformers import AutoConfig
                try:
                    self.hf_config = AutoConfig.from_pretrained(
                        self.model,
                        trust_remote_code=self.trust_remote_code,
                        revision=self.revision,
                    )
                except (ValueError, KeyError) as e:
                    # Architectures transformers only knows via remote code
                    # (Baichuan, InternLM2, ChatGLM, Orion, ...): we never
                    # execute checkpoint code — parse config.json into a
                    # generic PretrainedConfig and rely on our own registry
                    # entry for the architecture.
                    cfg_path = os.path.join(str(self.model), "config.json")
                    if not os.path.exists(cfg_path):
                        raise
                    from transformers import PretrainedConfig
                    with open(cfg_path) as f:
                        d = json.load(f)
                    logger.info(
                        "AutoConfig failed (%s); using generic config for "
                        "model_type=%s", e, d.get("model_type"))
                    # Normalize the common remote-code attribute spellings
                    # so the geometry properties below read uniformly.
                    aliases = {
                        "num_attention_heads": ("n_head", "n_heads"),
                        "num_hidden_layers": ("n_layer", "n_layers",
                                              "num_layers"),
                        "hidden_size": ("d_model", "n_embd"),
                        "intermediate_size": ("n_inner",),
                        "max_position_embeddings": ("max_seq_len",
                                                    "model_max_length",
                                                    "seq_length",
                                                    "n_positions"),
                    }
                    for canon, alts in aliases.items():
                        if canon not in d:
                            for a in alts:
                                if a in d:
                                    d[canon] = d[a]
                                    break
                    # Remote-code multimodal wrappers (Ultravox, ...):
                    # materialize nested sub-configs as real config objects
                    # so geometry properties read uniformly.
                    if "language_config" in d and "text_config" not in d:
                        d["text_config"] = d["language_config"]
                    if "llm_config" in d and "text_config" not in d:
                        d["text_config"] = d["llm_config"]  # Ovis
                    for sub in ("text_config", "vision_config",
                                "audio_config", "llm_config",
                                "projector_config",
                                "visual_tokenizer_config"):
                        v = d.get(sub)
                        if isinstance(v, dict):
                            d[sub] = _materialize_subconfig(v)
                    self.hf_config = PretrainedConfig.from_dict(d)
        # Composite configs (Qwen2.5-Omni): the served component is the
        # thinker; talker/token2wav are speech-synthesis stages outside the
        # serving scope (reference serves the thinker only).
        thinker = getattr(self.hf_config, "thinker_config", None)
        if thinker is not None:
            if isinstance(thinker, dict):
                from transformers import PretrainedConfig
                thinker = PretrainedConfig.from_dict(thinker)
            archs = getattr(self.hf_config, "architectures", None)
            for sub in ("text_config", "vision_config", "audio_config"):
                v = getattr(thinker, sub, None)
                if isinstance(v, dict):
                    setattr(thinker, sub, _materialize_subconfig(v))
            thinker.architectures = archs
            self.hf_config = thinker
        hf = self.hf_config
        # Generation defaults HF moved out of config.json (decoder start /
        # forced BOS for encoder-decoder models).
        gen_path = os.path.join(str(self.model), "generation_config.json")
        if os.path.exists(gen_path):
            try:
                with open(gen_path) as f:
                    gen = json.load(f)
                for k in ("decoder_start_token_id", "forced_bos_token_id"):
                    if getattr(hf, k, None) is None and gen.get(k) is not None:
                        setattr(hf, k, gen[k])
            except (OSError, ValueError):
                pass
        if self.architecture is None:
            archs = getattr(hf, "architectures", None) or []
            self.architecture = archs[0] if archs else None
        derived_max = getattr(hf, "max_position_embeddings", None) \
            or getattr(hf, "max_target_positions", None) or 2048
        if self.max_model_len is None:
            self.max_model_len = derived_max
        elif self.max_model_len > derived_max:
            logger.warning(
                "max_model_len %d exceeds model max_position_embeddings %d",
                self.max_model_len, derived_max)
        if self.quantization is None:
            qcfg = getattr(hf, "quantization_config", None)
            if qcfg is not None:
                self.quantization = (qcfg.get("quant_method")
                                     if isinstance(qcfg, dict) else
                                     getattr(qcfg, "quant_method", None))

    # -- Derived geometry ----------------------------------------------------
    @property
    def text_config(self):
        return getattr(self.hf_config, "text_config", None) \
            or getattr(self.hf_config, "llm_config", None) \
            or self.hf_config

    @property
    def hidden_size(self) -> int:
        return self.text_config.hidden_size

    @property
    def is_encoder_decoder(self) -> bool:
        return self.text_config.model_type in ("whisper", "bart",
                                               "florence2",
                                               "florence2_language")

    @property
    def num_layers(self) -> int:
        if self.is_encoder_decoder:  # KV cache serves the decoder
            return self.text_config.decoder_layers
        return self.text_config.num_hidden_layers

    @property
    def is_attention_free(self) -> bool:
        """Recurrent-state models (Mamba family): no KV cache at all."""
        return getattr(self.text_config, "num_attention_heads", None) in (
            None, 0) or self.text_config.model_type in ("mamba", "mamba2",
                                                        "falcon_mamba")

    @property
    def num_attention_heads(self) -> int:
        return getattr(self.text_config, "num_attention_heads", None) or 1

    @property
    def uses_mla(self) -> bool:
        """DeepSeek-style multi-head latent attention: the KV cache stores
        one compressed latent per token (kv_lora_rank + rope dims) instead
        of per-head K/V (reference: v1/attention/backends/mla/common.py)."""
        return getattr(self.text_config, "kv_lora_rank", None) is not None

    @property
    def num_kv_heads(self) -> int:
        if self.uses_mla:
            return 1
        if self.is_encoder_decoder:
            return self.text_config.decoder_attention_heads
        tc = self.text_config
        if getattr(tc, "model_type", "") == "dbrx":
            return getattr(getattr(tc, "attn_config", None), "kv_n_heads",
                           None) or self.num_attention_heads
        if getattr(tc, "model_type", "") == "falcon":
            # HF FalconAttention:227 — new arch reads num_kv_heads; the old
            # arch is MQA iff multi_query.
            if getattr(tc, "new_decoder_architecture", False):
                return getattr(tc, "num_kv_heads", None) \
                    or self.num_attention_heads
            return 1 if getattr(tc, "multi_query", False) \
                else self.num_attention_heads
        bc = getattr(tc, "block_configs", None)
        if bc is not None:
            # DeciLM/nemotron-nas: per-layer GQA; the paged cache is sized
            # for the widest layer (models/hetero.py pads narrower ones).
            def group(b):
                a = b.get("attention") if isinstance(b, dict) else \
                    getattr(b, "attention", None)
                if a is None:
                    return None
                if (a.get("no_op") if isinstance(a, dict)
                        else getattr(a, "no_op", False)):
                    return None
                return (a.get("n_heads_in_group") if isinstance(a, dict)
                        else getattr(a, "n_heads_in_group", None))
            groups = [g for g in (group(b) for b in bc) if g]
            if groups:
                return max(self.num_attention_heads // g for g in groups)
        if getattr(tc, "multi_query_attention", False):
            # ChatGLM-style grouped MQA.
            return getattr(tc, "multi_query_group_num", 2)
        if getattr(tc, "multi_query", False):
            return 1  # GPTBigCode-style MQA
        return getattr(tc, "num_key_value_heads", None) \
            or self.num_attention_heads

    @property
    def head_dim(self) -> int:
        if self.uses_mla:
            return (self.text_config.kv_lora_rank +
                    self.text_config.qk_rope_head_dim)
        if self.is_attention_free:
            return getattr(self.text_config, "state_size", 16)
        if self.is_encoder_decoder:
            return (self.text_config.d_model //
                    self.text_config.decoder_attention_heads)
        hd = getattr(self.text_config, "head_dim", None)
        if hd is not None:
            return hd
        return self.hidden_size // self.num_attention_heads

    @property
    def vocab_size(self) -> int:
        return self.text_config.vocab_size

    @property
    def sliding_window(self) -> Optional[int]:
        if not getattr(self.text_config, "use_sliding_window", True):
            return None
        return getattr(self.text_config, "sliding_window", None)

    def kv_bytes_per_token_per_layer(self, cache_dtype: str) -> int:
        itemsize = 1 if cache_dtype.startswith("fp8") else 2
        return 2 * self.num_kv_heads * self.head_dim * itemsize


@dataclass
class CacheConfig:
    """Paged KV cache geometry & dtype."""

    block_size: int = 32
    hbm_utilization: float = 0.9
    cache_dtype: str = "auto"
    # Explicit block count (tests / CPU); None = derive from free device memory.
    num_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = True
    # Filled by the worker after memory profiling.
    num_blocks: Optional[int] = None

    def __post_init__(self) -> None:
        if self.cache_dtype not in KV_CACHE_DTYPES:
            raise ValueError(f"cache_dtype must be one of {KV_CACHE_DTYPES}")
        if not 0 < self.hbm_utilization <= 1:
            raise ValueError("hbm_utilization must be in (0, 1]")
        if self.block_size & (self.block_size - 1):
            raise ValueError("block_size must be a power of two")


@dataclass
class SchedulerConfig:
    """Token-budget continuous-batching scheduler knobs
    (reference: aphrodite/v1/core/sched/scheduler.py:144)."""

    max_num_seqs: int = 128
    max_num_batched_tokens: int = 2048
    max_model_len: int = 2048
    # Cap on prefill chunk per request per step; None = budget-limited only.
    long_prefill_token_threshold: Optional[int] = None
    # Wave-level cap on total PREFILL tokens per step (None = token budget
    # only). Online serving sets this so prefill work is sliced into quanta
    # that interleave with decode windows (bounded TTFT without stalling
    # in-flight decodes); offline throughput runs leave it None and prefill
    # whole waves.
    max_prefill_tokens: Optional[int] = None
    # Overlap host scheduling + the next dispatch with device compute:
    # multi-step windows return deterministic token COUNTS, so the
    # scheduler advances optimistically and fetches values lazily
    # (reference: v1 --async-scheduling).
    async_scheduling: bool = True
    # "fcfs" | "priority": priority orders both queues by
    # (request.priority, arrival) and force-preempts lower-priority
    # running requests when a higher-priority waiting request cannot be
    # admitted (reference processing/scheduler.py:965).
    policy: str = "fcfs"

    def __post_init__(self) -> None:
        if self.max_num_batched_tokens < 1:
            raise ValueError("max_num_batched_tokens must be >= 1")
        if self.policy not in ("fcfs", "priority"):
            raise ValueError(f"unknown scheduling policy {self.policy!r}")


@dataclass
class ParallelConfig:
    """Device-mesh shape. ``tp`` shards attention heads / MLP; ``dp``
    replicates the whole engine (one scheduler per replica)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    enable_expert_parallel: bool = False
    # Sequence parallelism: activations between blocks constrained to
    # P("tp") on the token dim; GSPMD turns the TP all-reduces into
    # reduce-scatter + all-gather around the (token-sharded) norms
    # (reference: compilation/sequence_parallelism.py fx pass — here it is
    # one sharding annotation).
    sequence_parallel: bool = False

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size)


@dataclass
class DeviceConfig:
    device: str = "auto"  # auto | tpu | cpu

    def resolve(self) -> str:
        if self.device != "auto":
            return self.device
        import jax
        try:
            plat = jax.devices()[0].platform
        except RuntimeError:
            return "cpu"
        return "tpu" if plat in ("tpu", "axon") else "cpu"


@dataclass
class LoadConfig:
    load_format: str = "auto"  # auto | safetensors | dummy
    download_dir: Optional[str] = None


@dataclass
class LoRAConfig:
    max_loras: int = 1
    max_lora_rank: int = 16
    lora_dtype: str = "bfloat16"


@dataclass
class SpeculativeConfig:
    # ngram | draft_model | eagle | medusa | mlp_speculator
    method: Optional[str] = None
    num_speculative_tokens: int = 0
    draft_model: Optional[str] = None
    # ngram proposer window (reference: aphrodite/v1/spec_decode/ngram_proposer.py:9)
    prompt_lookup_max: int = 4
    prompt_lookup_min: int = 1
    # Draft-verification acceptance for temperature>0 rows (reference
    # spec_decode/spec_decode_worker.py acceptance_method):
    #   rejection_sampler          — lossless accept-with-prob min(1, p/q)
    #                                + residual recovery sample
    #   typical_acceptance_sampler — entropy-thresholded typical acceptance
    #                                (reference typical_acceptance_sampler.py)
    acceptance_method: str = "rejection_sampler"
    posterior_threshold: float = 0.09
    posterior_alpha: float = 0.3
    # Disable speculation for steps whose running-queue depth exceeds this
    # (reference spec_decode_worker.py:292 disable_by_batch_size: at high
    # batch the target model is compute-bound and drafts only burn FLOPs).
    disable_by_batch_size: Optional[int] = None

    # Speculator architectures -> proposer method (reference registry.py
    # _SPECULATIVE_DECODING_MODELS; reference spec_decode_worker.py:141
    # create_worker does the same dispatch from the draft config).
    _ARCH_METHODS = {
        "MedusaModel": "medusa",
        "MLPSpeculatorPreTrainedModel": "mlp_speculator",
        "EAGLEModel": "eagle",
        "EagleLlamaForCausalLM": "eagle",
        "Eagle3LlamaForCausalLM": "eagle",
        "DeepSeekMTPModel": "deepseek_mtp",
    }

    def __post_init__(self) -> None:
        if self.method is None and self.draft_model:
            arch = None
            cfg_path = os.path.join(str(self.draft_model), "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    archs = json.load(f).get("architectures") or []
                arch = archs[0] if archs else None
            self.method = self._ARCH_METHODS.get(arch, "draft_model")


@dataclass
class ObservabilityConfig:
    collect_detailed_metrics: bool = False
    otlp_traces_endpoint: Optional[str] = None
    # ZMQ PUB endpoint for KV cache events (None = disabled).
    kv_events_endpoint: Optional[str] = None


@dataclass
class TPUConfig:
    """Shape-bucketing and compile policy for the jitted serving step."""

    min_token_bucket: int = 32
    # Shared cross-request encoder-output cache budget (worker/encoder_cache
    # .py; reference v1/core/encoder_cache_manager.py).
    encoder_cache_budget_mb: int = 512
    min_req_bucket: int = 8
    # Server startup warms the hot jitted programs by running a synthetic
    # full-budget wave through the real engine loop (EngineCore.precompile)
    # before accepting traffic. Offline LLM() compiles lazily on first use.
    precompile: bool = True
    # Use the Pallas ragged paged attention kernel (False = pure-JAX reference
    # attention; automatic on CPU).
    use_pallas_attention: Optional[bool] = None
    # Run K consecutive decode steps in ONE device dispatch (in-graph token
    # feedback + sampling). Amortizes host<->device round trips — the TPU
    # analog of the reference's multi-step scheduling
    # (aphrodite/worker/multi_step_model_runner.py). 1 = off. The runner
    # adapts K downward per dispatch (power-of-2) so no request overshoots
    # its max_tokens/max_model_len budget; through a tunneled chip each
    # dispatch carries ~25 ms of fixed RPC cost, so bigger K wins whenever
    # requests have decode budget left.
    multi_step_decode: int = 64


@dataclass
class EngineConfig:
    model_config: ModelConfig
    cache_config: CacheConfig = field(default_factory=CacheConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    device_config: DeviceConfig = field(default_factory=DeviceConfig)
    load_config: LoadConfig = field(default_factory=LoadConfig)
    lora_config: Optional[LoRAConfig] = None
    speculative_config: Optional[SpeculativeConfig] = None
    observability_config: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    tpu_config: TPUConfig = field(default_factory=TPUConfig)
    # Disaggregated prefill (distributed/kv_transfer.py); None = disabled.
    kv_transfer_config: Optional[object] = None

    def __post_init__(self) -> None:
        # Cross-validation mirroring Platform.check_and_update_config
        # (reference: aphrodite/platforms/tpu.py:69).
        mc, sc = self.model_config, self.scheduler_config
        sc.max_model_len = min(sc.max_model_len, mc.max_model_len) \
            if sc.max_model_len else mc.max_model_len
        if sc.max_num_batched_tokens < self.cache_config.block_size:
            raise ValueError(
                "max_num_batched_tokens must be >= cache block_size")
        tp = self.parallel_config.tensor_parallel_size
        if mc.num_kv_heads % tp and tp % mc.num_kv_heads:
            raise ValueError(
                f"tensor_parallel_size={tp} incompatible with "
                f"{mc.num_kv_heads} KV heads")

    @property
    def max_lookahead_tokens(self) -> int:
        """KV slots allocated past the sampled token (speculative drafts /
        the in-graph multi-step decode window)."""
        num_spec = (self.speculative_config.num_speculative_tokens
                    if self.speculative_config else 0)
        return max(num_spec, self.tpu_config.multi_step_decode - 1)

    @property
    def max_blocks_per_req(self) -> int:
        # Lookahead slots can spill one page past max_model_len.
        return cdiv(self.scheduler_config.max_model_len
                    + self.max_lookahead_tokens,
                    self.cache_config.block_size)

    def compute_hash(self) -> str:
        """Stable hash for compile-cache keying."""
        payload = {
            "model": self.model_config.model,
            "dtype": self.model_config.dtype,
            "quant": self.model_config.quantization,
            "block_size": self.cache_config.block_size,
            "cache_dtype": self.cache_config.cache_dtype,
            "tp": self.parallel_config.tensor_parallel_size,
            "max_model_len": self.scheduler_config.max_model_len,
        }
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]

"""CLI argument surface -> EngineConfig.
(reference: aphrodite/engine/args_tools.py:230 EngineArgs)
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from aphrodite_tpu.config import EngineConfig


@dataclasses.dataclass
class EngineArgs:
    model: str = ""
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    quantize_lm_head: bool = False
    tokenizer_mode: str = "auto"
    trust_remote_code: bool = False
    block_size: int = 32
    num_kv_blocks: Optional[int] = None
    hbm_utilization: float = 0.9
    kv_cache_dtype: str = "auto"
    enable_prefix_caching: bool = True
    max_num_seqs: int = 128
    max_num_batched_tokens: int = 2048
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    enable_expert_parallel: bool = False
    sequence_parallel: bool = False
    # JSON dict, e.g. '{"method": "ngram", "num_speculative_tokens": 4}' or
    # '{"method": "draft_model", "draft_model": "/path", ...}' / "eagle".
    speculative_config: Optional[dict] = None
    # JSON dict, e.g. '{"kv_role": "kv_producer", "kv_endpoint": "tcp://..."}'
    kv_transfer_config: Optional[dict] = None
    device: str = "auto"
    load_format: str = "auto"
    enforce_eager: bool = False
    otlp_traces_endpoint: Optional[str] = None
    kv_events_endpoint: Optional[str] = None
    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16
    long_prefill_token_threshold: Optional[int] = None
    max_prefill_tokens: Optional[int] = None
    async_scheduling: bool = True
    multi_step_decode: Optional[int] = None
    scheduling_policy: str = "fcfs"

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                    ) -> argparse.ArgumentParser:
        parser.add_argument("model", nargs="?", help="model name or path")
        parser.add_argument("--model", dest="model_opt", default=None)
        parser.add_argument("--tokenizer", default=None)
        parser.add_argument("--quantize-lm-head", action="store_true",
                            dest="quantize_lm_head",
                            help="quantize the lm_head too (per-channel "
                                 "int8; reference lm_head_quantized)")
        parser.add_argument("--tokenizer-mode", default="auto",
                            choices=["auto", "hf", "slow", "mistral"],
                            help="mistral = Mistral-format tekken.json "
                                 "tokenizer")
        parser.add_argument("--dtype", default="bfloat16",
                            choices=["bfloat16", "float16", "float32",
                                     "auto"])
        parser.add_argument("--seed", type=int, default=0)
        parser.add_argument("--max-model-len", type=int, default=None)
        parser.add_argument("--quantization", "-q", default=None)
        parser.add_argument("--trust-remote-code", action="store_true")
        parser.add_argument("--block-size", type=int, default=32)
        parser.add_argument("--num-kv-blocks", type=int, default=None)
        parser.add_argument("--gpu-memory-utilization", "--hbm-utilization",
                            dest="hbm_utilization", type=float, default=0.9)
        parser.add_argument("--kv-cache-dtype", default="auto",
                            choices=["auto", "fp8", "fp8_e4m3", "fp8_e5m2"])
        parser.add_argument("--no-enable-prefix-caching", dest="epc",
                            action="store_false")
        parser.add_argument("--max-num-seqs", type=int, default=128)
        parser.add_argument("--max-num-batched-tokens", type=int,
                            default=2048)
        parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                            default=1)
        parser.add_argument("--data-parallel-size", "-dp", type=int,
                            default=1)
        parser.add_argument("--pipeline-parallel-size", "-pp", type=int,
                            default=1)
        parser.add_argument("--enable-expert-parallel", action="store_true")
        parser.add_argument("--sequence-parallel", action="store_true")
        parser.add_argument("--speculative-config", default=None,
                            help="JSON SpeculativeConfig, e.g. "
                            '\'{"method": "ngram", '
                            '"num_speculative_tokens": 4}\'')
        parser.add_argument("--kv-transfer-config", default=None,
                            help="JSON KVTransferConfig for disaggregated "
                            'prefill, e.g. \'{"kv_role": "kv_producer"}\'')
        parser.add_argument("--device", default="auto")
        parser.add_argument("--load-format", default="auto",
                            choices=["auto", "safetensors", "dummy",
                                     "sharded_state"])
        parser.add_argument("--enable-lora", action="store_true")
        parser.add_argument("--max-loras", type=int, default=4)
        parser.add_argument("--max-lora-rank", type=int, default=16)
        parser.add_argument("--long-prefill-token-threshold", type=int,
                            default=None,
                            help="cap on prefill tokens per request per "
                                 "step (None = budget-limited)")
        parser.add_argument("--max-prefill-tokens", type=int, default=None,
                            help="wave-level cap on total prefill tokens "
                                 "per step: slices prefill into quanta "
                                 "that interleave with decode windows "
                                 "(online serving TTFT knob)")
        parser.add_argument("--no-async-scheduling",
                            dest="async_scheduling", action="store_false",
                            help="disable overlap of host scheduling with "
                                 "device compute (v1 --async-scheduling "
                                 "is on by default here)")
        parser.add_argument("--scheduling-policy", default="fcfs",
                            choices=["fcfs", "priority"],
                            help="priority orders by (priority, arrival) "
                                 "and preempts lower-priority requests "
                                 "under pressure")
        parser.add_argument("--multi-step-decode", type=int, default=None,
                            help="cap on in-graph decode steps per "
                                 "dispatch (default 64)")
        parser.add_argument("--enable-chunked-prefill", action="store_true",
                            help="accepted for reference-CLI compatibility;"
                                 " chunked prefill is always native here")
        parser.add_argument("--enforce-eager", action="store_true")
        parser.add_argument("--otlp-traces-endpoint", default=None,
                            help="OTLP gRPC endpoint for per-request "
                                 "spans ('memory' = in-process exporter)")
        parser.add_argument("--kv-events-endpoint", default=None,
                            help="ZMQ PUB endpoint for KV cache events")
        parser.add_argument("--config", default=None,
                            help="YAML config file with CLI keys")
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        if args.config:
            import yaml
            with open(args.config) as f:
                overrides = yaml.safe_load(f) or {}
            for k, v in overrides.items():
                k = k.replace("-", "_")
                if getattr(args, k, None) in (None, False):
                    setattr(args, k, v)
        model = args.model_opt or args.model
        if not model:
            raise ValueError("model is required")
        dtype = "bfloat16" if args.dtype == "auto" else args.dtype
        return cls(
            model=model, tokenizer=args.tokenizer, dtype=dtype,
            seed=args.seed, max_model_len=args.max_model_len,
            quantization=args.quantization,
            quantize_lm_head=args.quantize_lm_head,
            trust_remote_code=args.trust_remote_code,
            block_size=args.block_size, num_kv_blocks=args.num_kv_blocks,
            hbm_utilization=args.hbm_utilization,
            kv_cache_dtype=args.kv_cache_dtype,
            enable_prefix_caching=args.epc,
            max_num_seqs=args.max_num_seqs,
            tokenizer_mode=("hf" if args.tokenizer_mode == "slow"
                            else args.tokenizer_mode),
            max_num_batched_tokens=args.max_num_batched_tokens,
            tensor_parallel_size=args.tensor_parallel_size,
            data_parallel_size=args.data_parallel_size,
            pipeline_parallel_size=args.pipeline_parallel_size,
            enable_expert_parallel=args.enable_expert_parallel,
            sequence_parallel=args.sequence_parallel,
            speculative_config=(
                __import__("json").loads(args.speculative_config)
                if isinstance(args.speculative_config, str)
                else args.speculative_config),
            kv_transfer_config=(
                __import__("json").loads(args.kv_transfer_config)
                if isinstance(args.kv_transfer_config, str)
                else args.kv_transfer_config),
            device=args.device, load_format=args.load_format,
            enforce_eager=args.enforce_eager,
            otlp_traces_endpoint=args.otlp_traces_endpoint,
            kv_events_endpoint=args.kv_events_endpoint,
            enable_lora=args.enable_lora,
            max_loras=args.max_loras,
            max_lora_rank=args.max_lora_rank,
            long_prefill_token_threshold=args.long_prefill_token_threshold,
            max_prefill_tokens=args.max_prefill_tokens,
            async_scheduling=args.async_scheduling,
            multi_step_decode=args.multi_step_decode,
            scheduling_policy=args.scheduling_policy)

    def create_engine_config(self) -> EngineConfig:
        from aphrodite_tpu.entrypoints.llm import build_engine_config
        return build_engine_config(**dataclasses.asdict(self))

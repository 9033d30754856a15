"""Offline batch inference API (reference: aphrodite/endpoints/llm.py:54)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from aphrodite_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                  LoadConfig, LoRAConfig, ModelConfig,
                                  ObservabilityConfig, ParallelConfig,
                                  SchedulerConfig, SpeculativeConfig,
                                  TPUConfig)
from aphrodite_tpu.engine.llm_engine import LLMEngine
from aphrodite_tpu.engine.processor import PromptType
from aphrodite_tpu.outputs import RequestOutput
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.utils import Counter


def build_engine_config(
    model: str,
    *,
    tokenizer: Optional[str] = None,
    tokenizer_mode: str = "auto",
    dtype: str = "bfloat16",
    seed: int = 0,
    max_model_len: Optional[int] = None,
    quantization: Optional[str] = None,
    quantize_lm_head: bool = False,
    trust_remote_code: bool = False,
    hf_config: Any = None,
    architecture: Optional[str] = None,
    block_size: int = 32,
    num_kv_blocks: Optional[int] = None,
    hbm_utilization: float = 0.9,
    kv_cache_dtype: str = "auto",
    enable_prefix_caching: bool = True,
    max_num_seqs: int = 128,
    max_num_batched_tokens: int = 2048,
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    enable_expert_parallel: bool = False,
    sequence_parallel: bool = False,
    device: str = "auto",
    load_format: str = "auto",
    enforce_eager: bool = False,
    speculative_config: Any = None,
    enable_lora: bool = False,
    max_loras: int = 4,
    max_lora_rank: int = 16,
    long_prefill_token_threshold: Optional[int] = None,
    max_prefill_tokens: Optional[int] = None,
    async_scheduling: bool = True,
    scheduling_policy: str = "fcfs",
    multi_step_decode: Optional[int] = None,
    kv_transfer_config: Any = None,
    otlp_traces_endpoint: Optional[str] = None,
    kv_events_endpoint: Optional[str] = None,
    **extra,
) -> EngineConfig:
    if isinstance(kv_transfer_config, dict):
        from aphrodite_tpu.distributed.kv_transfer import KVTransferConfig
        kv_transfer_config = KVTransferConfig(**kv_transfer_config)
    mc = ModelConfig(model=model, tokenizer=tokenizer,
                     tokenizer_mode=tokenizer_mode, dtype=dtype,
                     seed=seed, max_model_len=max_model_len,
                     quantization=quantization,
                     quantize_lm_head=quantize_lm_head,
                     trust_remote_code=trust_remote_code,
                     hf_config=hf_config, enforce_eager=enforce_eager,
                     architecture=architecture)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(
            block_size=block_size,
            num_blocks_override=num_kv_blocks,
            num_blocks=num_kv_blocks,
            hbm_utilization=hbm_utilization,
            cache_dtype=kv_cache_dtype,
            enable_prefix_caching=enable_prefix_caching),
        scheduler_config=SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            max_model_len=max_model_len or mc.max_model_len,
            long_prefill_token_threshold=long_prefill_token_threshold,
            max_prefill_tokens=max_prefill_tokens,
            async_scheduling=async_scheduling,
            policy=scheduling_policy),
        parallel_config=ParallelConfig(
            tensor_parallel_size=tensor_parallel_size,
            data_parallel_size=data_parallel_size,
            pipeline_parallel_size=pipeline_parallel_size,
            enable_expert_parallel=enable_expert_parallel,
            sequence_parallel=sequence_parallel),
        device_config=DeviceConfig(device=device),
        load_config=LoadConfig(load_format=load_format),
        speculative_config=(
            SpeculativeConfig(**speculative_config)
            if isinstance(speculative_config, dict) else speculative_config),
        lora_config=(LoRAConfig(max_loras=max_loras,
                                max_lora_rank=max_lora_rank)
                     if enable_lora else None),
        observability_config=ObservabilityConfig(
            otlp_traces_endpoint=otlp_traces_endpoint,
            kv_events_endpoint=kv_events_endpoint),
        tpu_config=TPUConfig(**{
            **({"multi_step_decode": multi_step_decode}
               if multi_step_decode is not None else {}),
            **extra.pop("tpu_config", {})}),
        kv_transfer_config=kv_transfer_config,
    )


class LLM:
    """Synchronous batched generation over an in-process engine."""

    def __init__(self, model: str, **kwargs) -> None:
        config = build_engine_config(model, **kwargs)
        self.engine = LLMEngine(config)
        self._counter = Counter()

    def get_tokenizer(self):
        return self.engine.tokenizer

    def save_sharded_state(self, path: str) -> str:
        """Dump the final (repacked/quantized/stacked) parameter tree for
        fast reloads with load_format='sharded_state' (reference:
        executor_base.py:233 save_sharded_state)."""
        import glob
        import os
        import shutil
        from aphrodite_tpu.loader.sharded_state import save_sharded_state
        worker = self.engine.core.worker
        fn = save_sharded_state(worker.params, path)
        # Ship config + tokenizer so `path` serves standalone.
        src = str(self.engine.config.model_config.model)
        if os.path.isdir(src):
            for f in glob.glob(os.path.join(src, "*.json")) + \
                    glob.glob(os.path.join(src, "tokenizer*")) + \
                    glob.glob(os.path.join(src, "*.model")):
                if "safetensors" not in f:
                    shutil.copy(f, path)
        return fn

    def add_lora(self, name: str, path: str) -> int:
        return self.engine.core.worker.add_lora(name, path)

    def remove_lora(self, name: str) -> bool:
        return self.engine.core.worker.remove_lora(name)

    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        use_tqdm: bool = False,
        lora_request: Union[str, None] = None,
        priority: Union[int, Sequence[int], None] = None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, (str, dict)) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        n = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n
        if len(sampling_params) != n:
            raise ValueError("prompts / sampling_params length mismatch")
        if priority is None:
            priority = [0] * n
        elif isinstance(priority, int):
            priority = [priority] * n
        if len(priority) != n:
            raise ValueError("prompts / priority length mismatch")

        order: list[str] = []
        for prompt, params, prio in zip(prompts, sampling_params, priority):
            rid = str(next(self._counter))
            order.append(rid)
            self.engine.add_request(rid, prompt, params,
                                    lora_name=lora_request, priority=prio)
        agg = self._run(use_tqdm)
        return [self._finalize(agg[rid]) for rid in order]

    def _run(self, use_tqdm: bool) -> dict[str, RequestOutput]:
        agg: dict[str, list[RequestOutput]] = {}
        pbar = None
        if use_tqdm:
            from tqdm import tqdm
            pbar = tqdm(desc="generating")
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                slot = agg.setdefault(out.request_id, {})
                idx = out.outputs[0].index
                if idx in slot:
                    slot[idx].add(out)
                else:
                    slot[idx] = out
                if pbar and out.finished:
                    pbar.update(1)
        if pbar:
            pbar.close()
        return agg

    def evaluate_perplexity(self, token_lists: list[list[int]]
                            ) -> dict[str, float]:
        """Teacher-forced perplexity over the given token sequences —
        the quality-parity half of the BASELINE.md north-star metric
        (perplexity parity vs the CUDA reference at the same bit-width).
        Uses the engine's prompt-logprobs path (every position scored by
        the real serving forward: paged KV, kernels, quantized weights),
        so the number reflects the DEPLOYED numerics, not an offline
        reimplementation. Returns token-weighted mean NLL and PPL."""
        import math
        from aphrodite_tpu.sampling_params import SamplingParams
        params = SamplingParams(temperature=0.0, max_tokens=1,
                                prompt_logprobs=0, ignore_eos=True)
        outs = self.generate(token_lists, params)
        total_nll = 0.0
        total_tok = 0
        for out in outs:
            plp = out.prompt_logprobs or []
            for d in plp:
                if d is None:
                    continue  # position 0 has no prediction
                lp = next(iter(d.values()))
                total_nll += -float(getattr(lp, "logprob", lp))
                total_tok += 1
        mean_nll = total_nll / max(total_tok, 1)
        return {"tokens": total_tok, "mean_nll": mean_nll,
                "perplexity": math.exp(mean_nll)}

    def beam_search(self, prompts, beam_width: int = 4,
                    max_tokens: int = 16,
                    ignore_eos: bool = False) -> list[dict]:
        """Engine-native beam search (reference: v0 block_manager fork +
        LLM.beam_search). Each round every live beam decodes ONE token in
        a single batched engine step; selected continuations that diverge
        from a beam's own argmax are FORKED in the scheduler
        (EngineCore.fork_request): full KV blocks are shared by refcount,
        only a mid-block tail page is copied on device — no admission and
        no re-prefill per round (the round-3 re-generate loop is gone).
        Score = sum of token logprobs (no length normalization). Returns
        per prompt: {"sequences": [...], "scores": [...]} best-first."""
        if isinstance(prompts, (str, dict)) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        core = self.engine.core
        runner = core.worker.runner
        if beam_width > self.engine.config.scheduler_config.max_num_seqs:
            raise ValueError("beam_width exceeds max_num_seqs")
        tok = self.engine.tokenizer
        eos_id = tok.eos_token_id if tok is not None else None
        k = max(2 * beam_width, beam_width + 1)

        # Lockstep: one sampled token per engine step per beam — in-graph
        # multi-step windows, async realize, and speculative multi-token
        # steps would all run ahead of the per-round fork points (spec
        # would bake never-selected draft tokens into forked beams).
        saved = (runner.use_graph_multi_step, runner.async_mode,
                 core.proposer)
        runner.use_graph_multi_step = False
        runner.async_mode = False
        core.proposer = None
        try:
            results = []
            for prompt in prompts:
                if isinstance(prompt, str):
                    base = tok.encode(prompt)
                elif isinstance(prompt, dict):
                    base = prompt.get("prompt_token_ids") or tok.encode(
                        prompt["prompt"])
                else:
                    base = list(prompt)
                results.append(self._beam_search_one(
                    base, beam_width, max_tokens, ignore_eos, eos_id, k))
            return results
        finally:
            (runner.use_graph_multi_step, runner.async_mode,
             core.proposer) = saved

    def _beam_search_one(self, base, beam_width, max_tokens, ignore_eos,
                         eos_id, k):
        core = self.engine.core
        params = SamplingParams(temperature=0.0, max_tokens=max_tokens + 1,
                                logprobs=k, ignore_eos=True,
                                detokenize=False)
        rid = f"beam-{next(self._counter)}"
        root = self.engine.processor.process(
            rid, {"prompt_token_ids": list(base)}, params)
        core.add_request(root)

        # live beams: rid -> [chosen tokens so far], score; + the last
        # step's candidate logprobs per rid
        beams = {rid: ([], 0.0)}
        lps: dict[str, dict] = {}
        argmax: dict[str, int] = {}

        def pump():
            pending = set(beams)
            while pending:
                for eco in core.step():
                    if eco.req_id in pending and eco.new_token_ids:
                        if eco.logprobs:
                            lps[eco.req_id] = eco.logprobs[-1]
                        argmax[eco.req_id] = eco.new_token_ids[-1]
                        pending.discard(eco.req_id)

        done: list[tuple[list[int], float]] = []
        fork_n = 0
        for _ in range(max_tokens):
            if not beams:
                break
            pump()
            cand = []  # (new_score, parent_rid, token, lp)
            for prid, (toks, score) in beams.items():
                d = lps.get(prid) or {argmax[prid]: 0.0}
                for t, lp in sorted(d.items(), key=lambda kv: -kv[1])[:k]:
                    cand.append((score + float(lp), prid, int(t)))
            cand.sort(key=lambda c: -c[0])
            selected = []  # (parent_rid, token, new_score)
            for new_score, prid, t in cand:
                if (not ignore_eos and eos_id is not None and t == eos_id):
                    done.append((beams[prid][0] + [t], new_score))
                    continue
                selected.append((prid, t, new_score))
                if len(selected) >= beam_width:
                    break

            new_beams = {}
            kept = set()
            forks = []
            for prid, t, new_score in selected:
                toks = beams[prid][0]
                if prid not in kept and t == argmax.get(prid):
                    # the parent already appended exactly this token
                    kept.add(prid)
                    new_beams[prid] = (toks + [t], new_score)
                else:
                    forks.append((prid, t, new_score))
            for prid, t, new_score in forks:
                cid = f"{prid}-b{fork_n}"
                fork_n += 1
                if core.fork_request(prid, cid, t) is None:
                    continue  # pool exhausted: drop this continuation
                new_beams[cid] = (beams[prid][0] + [t], new_score)
            # a kept parent whose argmax was selected keeps running; all
            # other parents are aborted AFTER their children forked (the
            # fork's refcount bump keeps the shared blocks alive)
            dead = [prid for prid in beams if prid not in kept]
            if dead:
                core.abort_requests(dead)
            beams = new_beams

        if beams:
            done.extend(beams.values())
            core.abort_requests(list(beams))
        done.sort(key=lambda c: -c[1])
        done = done[:beam_width]
        return {"sequences": [t for t, _ in done],
                "scores": [s for _, s in done]}

    def embed(self, prompts, pooling: str = "last",
              normalize: bool = True) -> list[list[float]]:
        """Embedding/pooling path (reference: LLM.encode + Pooler,
        aphrodite/modeling/layers/pooler.py): one forward over the prompt,
        pooled final hidden states. No paged-KV persistence is needed for
        single-shot embedding, so this runs outside the scheduler."""
        import numpy as np
        import jax.numpy as jnp
        if isinstance(prompts, (str, dict)) or (
                isinstance(prompts, list) and prompts
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        tok = self.engine.tokenizer
        token_lists = []
        for p in prompts:
            if isinstance(p, str):
                token_lists.append(tok.encode(p))
            elif isinstance(p, dict):
                token_lists.append(p.get("prompt_token_ids")
                                   or tok.encode(p["prompt"]))
            else:
                token_lists.append(list(p))
        worker = self.engine.core.worker
        out = worker.runner.embed(token_lists, pooling=pooling)
        out = np.asarray(out, np.float32)
        if normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return [row.tolist() for row in out]

    def score(self, text_1, texts_2, *, activation: bool = True
              ) -> list[float]:
        """Cross-encoder relevance scores for (text_1, candidate) pairs
        (reference: LLM.score, endpoints/llm.py + /score route). With one
        label, scores are sigmoid probabilities (activation=False for raw
        logits)."""
        import math as _math
        if isinstance(texts_2, str):
            texts_2 = [texts_2]
        def _ids(x):
            return isinstance(x, (list, tuple)) and \
                (not x or isinstance(x[0], int))

        pairs = []
        if _ids(text_1):
            # Pre-tokenized single query vs many docs; segment ids 0/1.
            for t2 in texts_2:
                pairs.append((list(text_1) + list(t2),
                              [0] * len(text_1) + [1] * len(t2)))
        elif isinstance(text_1, (list, tuple)) and text_1 \
                and _ids(text_1[0]):
            # Pre-tokenized elementwise (query_i, doc_i) pairs.
            for t1, t2 in zip(text_1, texts_2):
                pairs.append((list(t1) + list(t2),
                              [0] * len(t1) + [1] * len(t2)))
        else:
            tok = self.engine.tokenizer
            for t2 in texts_2:
                enc = tok(text_1, text_pair=t2)
                pairs.append((enc["input_ids"],
                              enc.get("token_type_ids")
                              or [0] * len(enc["input_ids"])))
        logits = self.engine.core.worker.runner.score(pairs)
        out = []
        for row in logits:
            v = row[0] if len(row) == 1 else max(row)
            out.append(1.0 / (1.0 + _math.exp(-v)) if activation and
                       len(row) == 1 else v)
        return out

    def rerank(self, query: str, documents: list[str]) -> list[dict]:
        """Rank documents by cross-encoder score, best first."""
        scores = self.score(query, documents)
        order = sorted(range(len(documents)), key=lambda i: -scores[i])
        return [{"index": i, "document": documents[i],
                 "relevance_score": scores[i]} for i in order]

    @staticmethod
    def _finalize(slot: dict[int, RequestOutput]) -> RequestOutput:
        """Merge per-index child outputs into one RequestOutput."""
        first = slot[min(slot)]
        merged = RequestOutput(
            request_id=first.request_id,
            prompt=first.prompt,
            prompt_token_ids=first.prompt_token_ids,
            prompt_logprobs=next(
                (o.prompt_logprobs for o in slot.values()
                 if o.prompt_logprobs), None),
            outputs=[slot[i].outputs[0] for i in sorted(slot)],
            finished=all(o.finished for o in slot.values()),
            num_cached_tokens=first.num_cached_tokens)
        return merged

"""Input processing: prompt -> tokenized, validated Request.
(reference: aphrodite/v1/engine/processor.py:27 + inputs/preprocess.py)
"""
from __future__ import annotations

import time
from typing import Optional, Union

from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.core.request import Request
from aphrodite_tpu.sampling_params import SamplingParams

# Accepted prompt forms: raw string, token id list, or dict with
# {"prompt": str} / {"prompt_token_ids": [...]}.
PromptType = Union[str, list[int], dict]


class Processor:

    def __init__(self, config: EngineConfig, tokenizer) -> None:
        self.config = config
        self.tokenizer = tokenizer
        self.max_model_len = config.scheduler_config.max_model_len
        self.eos_token_id = (tokenizer.eos_token_id
                             if tokenizer is not None else None)
        from aphrodite_tpu.multimodal import get_mm_adapter
        self.mm_adapter = get_mm_adapter(config.model_config.hf_config)
        # Prompt-adapter (soft prompt) cache: path -> embedding rows.
        self._prompt_adapters: dict[str, "np.ndarray"] = {}

    def _load_prompt_adapter(self, path: str):
        """PEFT prompt-tuning checkpoint -> [n_virtual, hidden] rows
        (reference: aphrodite/prompt_adapter/, SURVEY.md §2.9)."""
        import numpy as np
        emb = self._prompt_adapters.get(path)
        if emb is not None:
            return emb
        import os
        st = os.path.join(path, "adapter_model.safetensors")
        if os.path.exists(st):
            from safetensors.numpy import load_file
            tensors = load_file(st)
        else:
            import torch
            tensors = {k: v.numpy() for k, v in torch.load(
                os.path.join(path, "adapter_model.bin"),
                map_location="cpu", weights_only=True).items()}
        key = next((k for k in tensors if "prompt_embeddings" in k
                    or k == "prompt_encoder.default.embedding.weight"),
                   None)
        if key is None:
            raise ValueError(f"{path}: no prompt_embeddings tensor found")
        emb = np.asarray(tensors[key], np.float32)
        if emb.shape[-1] != self.config.model_config.hidden_size:
            raise ValueError(
                f"prompt adapter hidden size {emb.shape[-1]} != model "
                f"{self.config.model_config.hidden_size}")
        self._prompt_adapters[path] = emb
        return emb

    def process(self, request_id: str, prompt: PromptType,
                params: SamplingParams,
                arrival_time: Optional[float] = None,
                lora_name: Optional[str] = None,
                priority: int = 0) -> Request:
        text: Optional[str] = None
        enc_ids = None
        if isinstance(prompt, dict):
            if "encoder_prompt_token_ids" in prompt:
                enc_ids = list(prompt["encoder_prompt_token_ids"])
            elif "encoder_prompt" in prompt:
                enc_ids = self.tokenizer.encode(prompt["encoder_prompt"])
            if "prompt_token_ids" in prompt:
                token_ids = list(prompt["prompt_token_ids"])
                text = prompt.get("prompt")
            elif "prompt" in prompt:
                text = prompt["prompt"]
                token_ids = self.tokenizer.encode(text)
            elif enc_ids is not None:
                # Encoder-decoder with default decoder start (reference:
                # enc-dec prompt handling, inputs/preprocess.py).
                hf = self.config.model_config.hf_config
                token_ids = [getattr(hf, "decoder_start_token_id", None)
                             or getattr(hf, "eos_token_id", 2)]
                forced = getattr(hf, "forced_bos_token_id", None)
                if forced is not None:
                    token_ids.append(forced)
            else:
                raise ValueError(f"request {request_id}: prompt dict needs "
                                 "'prompt', 'prompt_token_ids' or an "
                                 "encoder prompt")
        elif isinstance(prompt, str):
            text = prompt
            token_ids = self.tokenizer.encode(text)
        else:
            token_ids = list(prompt)

        mm_inputs = None
        if enc_ids is not None:
            import numpy as _np
            from aphrodite_tpu.multimodal import MMInputs
            mm_inputs = MMInputs(
                pixel_values=_np.asarray(enc_ids, _np.int32)[None],
                spans=[])
        pa = prompt.get("prompt_adapter") if isinstance(prompt, dict) \
            else None
        if pa:
            from aphrodite_tpu.multimodal import MMInputs
            emb = self._load_prompt_adapter(
                pa["path"] if isinstance(pa, dict) else pa)
            n = emb.shape[0]
            # Virtual tokens occupy the first n positions; their embedding
            # rows ride the multimodal scatter path.
            token_ids = [0] * n + token_ids
            mm_inputs = MMInputs(pixel_values=emb, spans=[(0, n)],
                                 is_embeddings=True)
        mm_data = prompt.get("multi_modal_data") \
            if isinstance(prompt, dict) else None
        if mm_data and enc_ids is not None and self.mm_adapter is not None \
                and getattr(self.mm_adapter, "enc_dec_mm", False):
            # Multimodal encoder-decoder (Florence-2): media rows merge
            # into the text encoder input at placeholder positions.
            import numpy as _np
            from aphrodite_tpu.multimodal import MMInputs
            media = mm_data.get(self.mm_adapter.media_key)
            enc_ids, extra = self.mm_adapter.process_encoder(media, enc_ids)
            mm_inputs = MMInputs(
                pixel_values=_np.asarray(enc_ids, _np.int32)[None],
                spans=[], extra=extra)
            mm_data = None
        if mm_data and mm_inputs is not None:
            raise ValueError(f"request {request_id}: prompt_adapter and "
                             "multi_modal_data are mutually exclusive")
        if mm_data:
            if self.mm_adapter is None:
                raise ValueError(
                    f"request {request_id}: multi_modal_data given but "
                    "model is not multimodal")
            from aphrodite_tpu.multimodal import MMInputs
            keys = getattr(self.mm_adapter, "media_keys", None)
            if keys:
                # Multi-media adapters (image + video): pass the whole dict.
                media = {k: mm_data[k] for k in keys
                         if mm_data.get(k) is not None}
            else:
                media = mm_data.get(self.mm_adapter.media_key)
            if not (media if keys else media is not None):
                raise ValueError(
                    f"request {request_id}: model expects "
                    f"'{self.mm_adapter.media_key}' in multi_modal_data")
            if hasattr(self.mm_adapter, "process"):
                # Variable-token adapters (Qwen2-VL): one call handles
                # preprocessing, prompt expansion, and extras.
                pv, token_ids, spans, extra = self.mm_adapter.process(
                    media, token_ids)
                mm_inputs = MMInputs(pixel_values=pv, spans=spans,
                                     extra=extra)
            else:
                pv = self.mm_adapter.preprocess(media)
                token_ids, spans = self.mm_adapter.expand_prompt(
                    token_ids, pv.shape[0])
                mm_inputs = MMInputs(pixel_values=pv, spans=spans)

        if not token_ids:
            raise ValueError(f"request {request_id}: empty prompt")
        if len(token_ids) >= self.max_model_len:
            raise ValueError(
                f"request {request_id}: prompt length {len(token_ids)} "
                f"exceeds max_model_len {self.max_model_len}")
        if params.max_tokens is None:
            params = params.clone()
            params.max_tokens = self.max_model_len - len(token_ids)
        if params.allowed_token_ids is not None:
            from aphrodite_tpu.sample.metadata import MAX_ALLOWED_TOKENS
            if not params.allowed_token_ids:
                raise ValueError("allowed_token_ids must be non-empty")
            if len(params.allowed_token_ids) > MAX_ALLOWED_TOKENS:
                raise ValueError(
                    f"allowed_token_ids supports up to "
                    f"{MAX_ALLOWED_TOKENS} ids")
            if any(t < 0 or t >= self.model_config.vocab_size
                   for t in params.allowed_token_ids):
                raise ValueError("allowed_token_ids out of vocab range")
        # Stop strings arrive as a convenience str sometimes.
        if isinstance(params.stop, str):
            params.stop = [params.stop]

        return Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=params,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time or time.monotonic(),
            prompt=text,
            lora_name=lora_name,
            mm_inputs=mm_inputs,
            priority=priority)

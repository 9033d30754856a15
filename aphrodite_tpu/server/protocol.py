"""OpenAI-compatible request/response schemas, with the Aphrodite sampler
extensions (reference: aphrodite/endpoints/openai/protocol.py — behavioral
subset covering chat/completions/tokenize/models/errors)."""
from __future__ import annotations

import time
import uuid
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, Field

from aphrodite_tpu.sampling_params import (GuidedDecodingParams,
                                           SamplingParams)


def random_uuid() -> str:
    return uuid.uuid4().hex


class ErrorResponse(BaseModel):
    object: str = "error"
    message: str
    type: str
    code: int


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "aphrodite_tpu"
    root: Optional[str] = None
    max_model_len: Optional[int] = None


class ModelList(BaseModel):
    object: str = "list"
    data: list[ModelCard] = Field(default_factory=list)


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class _SamplerMixin(BaseModel):
    """Shared sampling fields (OpenAI + Aphrodite extensions)."""
    max_tokens: Optional[int] = None
    temperature: Optional[float] = 1.0
    top_p: Optional[float] = 1.0
    n: int = 1
    seed: Optional[int] = None
    stop: Optional[Union[str, list[str]]] = None
    stop_token_ids: Optional[list[int]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    logit_bias: Optional[dict[str, float]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    include_stop_str_in_output: bool = False
    min_tokens: int = 0
    # --- Aphrodite extensions ---
    top_k: int = 0
    top_a: float = 0.0
    min_p: float = 0.0
    tfs: float = 1.0
    eta_cutoff: float = 0.0
    epsilon_cutoff: float = 0.0
    typical_p: float = 1.0
    smoothing_factor: float = 0.0
    smoothing_curve: float = 1.0
    xtc_threshold: float = 0.1
    xtc_probability: float = 0.0
    nsigma: float = 0.0
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_sequence_breaker_ids: list[int] = Field(default_factory=list)
    dry_range: int = 0
    dynatemp_min: float = 0.0
    dynatemp_max: float = 0.0
    dynatemp_exponent: float = 1.0
    temperature_last: bool = False
    skew: float = 0.0
    sampler_priority: Optional[list[Union[int, str]]] = None
    # Scheduling priority (policy="priority"): lower = served first
    # (reference endpoints: priority passes through to the scheduler)
    priority: int = 0
    # --- guided decoding ---
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    guided_grammar: Optional[str] = None
    response_format: Optional[dict] = None

    def to_sampling_params(self, default_max_tokens: Optional[int] = None,
                           logprobs_n: Optional[int] = None
                           ) -> SamplingParams:
        gd = None
        if (self.guided_json or self.guided_regex or self.guided_choice
                or self.guided_grammar):
            gd = GuidedDecodingParams(
                json=self.guided_json, regex=self.guided_regex,
                choice=self.guided_choice, grammar=self.guided_grammar)
        elif self.response_format:
            rf = self.response_format
            if rf.get("type") == "json_object":
                gd = GuidedDecodingParams(json_object=True)
            elif rf.get("type") == "json_schema":
                schema = rf.get("json_schema", {}).get("schema")
                gd = GuidedDecodingParams(json=schema)
        stop = self.stop
        if isinstance(stop, str):
            stop = [stop]
        logit_bias = None
        if self.logit_bias:
            logit_bias = {int(k): float(v)
                          for k, v in self.logit_bias.items()}
        return SamplingParams(
            n=self.n,
            max_tokens=self.max_tokens or default_max_tokens,
            temperature=self.temperature if self.temperature is not None
            else 1.0,
            top_p=self.top_p if self.top_p is not None else 1.0,
            top_k=self.top_k, top_a=self.top_a, min_p=self.min_p,
            tfs=self.tfs, eta_cutoff=self.eta_cutoff,
            epsilon_cutoff=self.epsilon_cutoff, typical_p=self.typical_p,
            smoothing_factor=self.smoothing_factor,
            smoothing_curve=self.smoothing_curve,
            xtc_threshold=self.xtc_threshold,
            xtc_probability=self.xtc_probability,
            nsigma=self.nsigma,
            dry_multiplier=self.dry_multiplier, dry_base=self.dry_base,
            dry_allowed_length=self.dry_allowed_length,
            dry_sequence_breaker_ids=self.dry_sequence_breaker_ids,
            dry_range=self.dry_range,
            dynatemp_min=self.dynatemp_min, dynatemp_max=self.dynatemp_max,
            dynatemp_exponent=self.dynatemp_exponent,
            temperature_last=self.temperature_last, skew=self.skew,
            sampler_priority=self.sampler_priority,
            seed=self.seed, stop=stop or [],
            stop_token_ids=self.stop_token_ids or [],
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            no_repeat_ngram_size=self.no_repeat_ngram_size,
            ignore_eos=self.ignore_eos, min_tokens=self.min_tokens,
            skip_special_tokens=self.skip_special_tokens,
            spaces_between_special_tokens=self.spaces_between_special_tokens,
            include_stop_str_in_output=self.include_stop_str_in_output,
            logit_bias=logit_bias,
            logprobs=logprobs_n,
            guided_decoding=gd,
        )


class ChatCompletionRequest(_SamplerMixin):
    model: Optional[str] = None
    messages: list[dict[str, Any]]
    stream: bool = False
    stream_options: Optional[dict] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    tools: Optional[list[dict]] = None
    tool_choice: Optional[Union[str, dict]] = None
    chat_template: Optional[str] = None
    chat_template_kwargs: Optional[dict] = None
    add_generation_prompt: bool = True

    def to_sampling_params(self, default_max_tokens=None) -> SamplingParams:
        if self.max_completion_tokens and not self.max_tokens:
            self.max_tokens = self.max_completion_tokens
        lp = (self.top_logprobs or 0) if self.logprobs else None
        return super().to_sampling_params(default_max_tokens, logprobs_n=lp)


class CompletionRequest(_SamplerMixin):
    model: Optional[str] = None
    prompt: Union[str, list[str], list[int], list[list[int]]]
    stream: bool = False
    stream_options: Optional[dict] = None
    echo: bool = False
    logprobs: Optional[int] = None
    best_of: Optional[int] = None

    def to_sampling_params(self, default_max_tokens=None) -> SamplingParams:
        if self.max_tokens is None:
            self.max_tokens = 16  # OpenAI completions default
        return super().to_sampling_params(default_max_tokens,
                                          logprobs_n=self.logprobs)


class ChatMessage(BaseModel):
    role: str
    content: Optional[str] = None
    tool_calls: Optional[list[dict]] = None
    reasoning_content: Optional[str] = None


class LogprobEntry(BaseModel):
    token: str
    logprob: float
    bytes: Optional[list[int]] = None
    top_logprobs: Optional[list[dict]] = None


class ChatCompletionChoice(BaseModel):
    index: int
    message: ChatMessage
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None
    logprobs: Optional[dict] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionChoice] = Field(default_factory=list)
    usage: UsageInfo = Field(default_factory=UsageInfo)


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    # OpenAI streaming tool-call deltas: [{"index", "id"?, "type"?,
    # "function": {"name"?, "arguments"?}}]
    tool_calls: Optional[list] = None


class ChatCompletionStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionStreamChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class CompletionChoice(BaseModel):
    index: int
    text: str
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None
    logprobs: Optional[dict] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[CompletionChoice] = Field(default_factory=list)
    usage: UsageInfo = Field(default_factory=UsageInfo)


class EmbeddingRequest(BaseModel):
    model: Optional[str] = None
    input: Union[str, list[str], list[int], list[list[int]]]
    encoding_format: str = "float"
    dimensions: Optional[int] = None
    pooling: str = "last"  # extension: last | mean


class EmbeddingData(BaseModel):
    object: str = "embedding"
    index: int
    embedding: list[float]


class EmbeddingResponse(BaseModel):
    object: str = "list"
    data: list[EmbeddingData] = Field(default_factory=list)
    model: str = ""
    usage: UsageInfo = Field(default_factory=UsageInfo)


class TokenizeRequest(BaseModel):
    model: Optional[str] = None
    prompt: Optional[str] = None
    messages: Optional[list[dict]] = None
    add_special_tokens: bool = True


class TokenizeResponse(BaseModel):
    tokens: list[int]
    count: int
    max_model_len: int


class DetokenizeRequest(BaseModel):
    model: Optional[str] = None
    tokens: list[int]


class DetokenizeResponse(BaseModel):
    prompt: str

"""Per-request tracing (reference: aphrodite/engine/aphrodite_engine.py:391
OTLP tracer init + do_tracing/create_trace_span :1960-1996).

One span per finished request carrying the reference's gen_ai.* attributes
(queue time, time-to-first-token, e2e latency, token counts). Exporters:

- OpenTelemetry OTLP when the ``opentelemetry-sdk`` is installed and an
  endpoint is configured (same contract as the reference),
- otherwise an in-process ring buffer (``InMemorySpanExporter``) that tests
  and /server_info can read — tracing semantics stay testable without the
  otel dependency.
"""
from __future__ import annotations

import collections
import threading
from dataclasses import dataclass, field
from typing import Optional

from aphrodite_tpu.utils import logger


class SpanAttributes:  # mirrors the reference's otel semconv usage
    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_N = "gen_ai.request.n"
    GEN_AI_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    GEN_AI_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    GEN_AI_REQUEST_TOP_P = "gen_ai.request.top_p"
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = \
        "gen_ai.latency.time_to_first_token"
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"


@dataclass
class Span:
    name: str
    start_time: float
    end_time: float
    attributes: dict = field(default_factory=dict)


class InMemorySpanExporter:
    """Ring buffer of finished spans (default when otel is absent)."""

    def __init__(self, maxlen: int = 1024):
        self._spans = collections.deque(maxlen=maxlen)
        self._lock = threading.Lock()

    def export(self, span: Span) -> None:
        with self._lock:
            self._spans.append(span)

    def spans(self) -> list:
        with self._lock:
            return list(self._spans)


class RequestTracer:
    """Emits one span per finished request."""

    def __init__(self, otlp_endpoint: Optional[str] = None):
        self.memory = InMemorySpanExporter()
        self._otel = None
        if otlp_endpoint:
            try:
                from opentelemetry import trace
                from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
                    import OTLPSpanExporter
                from opentelemetry.sdk.trace import TracerProvider
                from opentelemetry.sdk.trace.export import (
                    BatchSpanProcessor)
                provider = TracerProvider()
                provider.add_span_processor(BatchSpanProcessor(
                    OTLPSpanExporter(endpoint=otlp_endpoint)))
                self._otel = provider.get_tracer("aphrodite_tpu")
                logger.info("OTLP tracing to %s", otlp_endpoint)
            except ImportError:
                logger.warning(
                    "--otlp-traces-endpoint set but opentelemetry-sdk is "
                    "not installed; spans stay in the in-memory exporter")

    def trace_request(self, request_id: str, *, arrival_time: float,
                      first_scheduled_time: Optional[float],
                      first_token_time: Optional[float],
                      finished_time: float, num_prompt_tokens: int,
                      num_generation_tokens: int,
                      params=None) -> None:
        A = SpanAttributes
        attrs = {
            A.GEN_AI_REQUEST_ID: request_id,
            A.GEN_AI_USAGE_PROMPT_TOKENS: num_prompt_tokens,
            A.GEN_AI_USAGE_COMPLETION_TOKENS: num_generation_tokens,
            A.GEN_AI_LATENCY_E2E: finished_time - arrival_time,
        }
        if first_scheduled_time is not None:
            attrs[A.GEN_AI_LATENCY_TIME_IN_QUEUE] = \
                first_scheduled_time - arrival_time
        if first_token_time is not None:
            attrs[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] = \
                first_token_time - arrival_time
        if params is not None:
            attrs[A.GEN_AI_REQUEST_N] = getattr(params, "n", 1)
            attrs[A.GEN_AI_REQUEST_MAX_TOKENS] = getattr(
                params, "max_tokens", None)
            attrs[A.GEN_AI_REQUEST_TEMPERATURE] = getattr(
                params, "temperature", None)
            attrs[A.GEN_AI_REQUEST_TOP_P] = getattr(params, "top_p", None)
        span = Span(name="llm_request", start_time=arrival_time,
                    end_time=finished_time, attributes=attrs)
        self.memory.export(span)
        if self._otel is not None:
            ot = self._otel.start_span(
                "llm_request", start_time=int(arrival_time * 1e9))
            for k, v in attrs.items():
                if v is not None:
                    ot.set_attribute(k, v)
            ot.end(end_time=int(finished_time * 1e9))

"""Engine metrics: per-request timing, counters, histograms, stat loggers.

Parity: aphrodite/v1/metrics/loggers.py:50,210 (LoggingStatLogger /
PrometheusStatLogger) and the v0 gauge/counter/histogram set
(engine/metrics.py:29-443) — reimplemented without a prometheus_client
dependency (the /metrics route renders the registry as Prometheus text).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from aphrodite_tpu.utils import logger

# Histogram bucket boundaries (seconds) for latency metrics.
TIME_BUCKETS = (0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
                5.0, 10.0, 30.0, 60.0)


class Histogram:
    def __init__(self, buckets=TIME_BUCKETS) -> None:
        self.buckets = buckets
        self.counts = [0] * (len(buckets) + 1)
        self.total = 0.0
        self.n = 0

    def observe(self, v: float) -> None:
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else 0.0

    def render(self, name: str, labels: str = "") -> list[str]:
        out = [f"# TYPE {name} histogram"]
        cum = 0
        for b, c in zip(self.buckets, self.counts):
            cum += c
            out.append(f'{name}_bucket{{le="{b}"{labels}}} {cum}')
        out.append(f'{name}_bucket{{le="+Inf"{labels}}} {self.n}')
        out.append(f"{name}_sum{labels and '{' + labels + '}'} "
                   f"{self.total:.6f}")
        out.append(f"{name}_count{labels and '{' + labels + '}'} {self.n}")
        return out


@dataclass
class RequestTiming:
    arrival: float
    first_scheduled: Optional[float] = None
    first_token: Optional[float] = None
    last_token: Optional[float] = None
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0


class StatsAggregator:
    """Collects per-step and per-request stats inside the engine."""

    def __init__(self) -> None:
        self.ttft = Histogram()        # time to first token
        self.tpot = Histogram()        # time per output token
        self.e2e = Histogram()         # request end-to-end latency
        self.queue_time = Histogram()  # arrival -> first schedule
        self.num_prompt_tokens = 0
        self.num_generation_tokens = 0
        self.num_requests_finished = 0
        self.num_preemptions = 0
        self.spec_drafted = 0
        self.spec_accepted = 0
        self._timing: dict[str, RequestTiming] = {}
        # Optional per-request span emitter (aphrodite_tpu/tracing.py);
        # set by the engine when --otlp-traces-endpoint is configured.
        self.tracer = None

    # ------------------------------------------------------------- lifecycle
    def on_request_arrival(self, req_id: str, num_prompt_tokens: int,
                           arrival_time: Optional[float] = None) -> None:
        self._timing[req_id] = RequestTiming(
            arrival=arrival_time or time.monotonic(),
            num_prompt_tokens=num_prompt_tokens)

    def on_scheduled(self, req_id: str) -> None:
        t = self._timing.get(req_id)
        if t is not None and t.first_scheduled is None:
            t.first_scheduled = time.monotonic()
            self.queue_time.observe(t.first_scheduled - t.arrival)

    def on_tokens(self, req_id: str, n: int) -> None:
        t = self._timing.get(req_id)
        now = time.monotonic()
        if t is None:
            return
        if t.first_token is None:
            t.first_token = now
            self.ttft.observe(now - t.arrival)
        elif t.last_token is not None and n > 0:
            self.tpot.observe((now - t.last_token) / n)
        t.last_token = now
        t.num_generation_tokens += n
        self.num_generation_tokens += n

    def on_finished(self, req_id: str) -> None:
        t = self._timing.pop(req_id, None)
        if t is None:
            return
        now = time.monotonic()
        self.e2e.observe(now - t.arrival)
        self.num_prompt_tokens += t.num_prompt_tokens
        self.num_requests_finished += 1
        if self.tracer is not None:
            self.tracer.trace_request(
                req_id, arrival_time=t.arrival,
                first_scheduled_time=t.first_scheduled,
                first_token_time=t.first_token, finished_time=now,
                num_prompt_tokens=t.num_prompt_tokens,
                num_generation_tokens=t.num_generation_tokens)

    # -------------------------------------------------------------- renderers
    # Set by the engine core from the runner's shared EncoderCache.
    encoder_cache = None

    def prometheus_lines(self, scheduler=None) -> list[str]:
        out = []
        if scheduler is not None:
            out += [
                "# TYPE aphrodite_num_requests_running gauge",
                f"aphrodite_num_requests_running {len(scheduler.running)}",
                "# TYPE aphrodite_num_requests_waiting gauge",
                f"aphrodite_num_requests_waiting {len(scheduler.waiting)}",
                "# TYPE aphrodite_kv_cache_usage_perc gauge",
                f"aphrodite_kv_cache_usage_perc {scheduler.kv.usage:.6f}",
                "# TYPE aphrodite_prefix_cache_hit_rate gauge",
                "aphrodite_prefix_cache_hit_rate "
                f"{scheduler.kv.prefix_cache_hit_rate:.6f}",
            ]
        out += [
            "# TYPE aphrodite_request_success_total counter",
            f"aphrodite_request_success_total {self.num_requests_finished}",
            "# TYPE aphrodite_prompt_tokens_total counter",
            f"aphrodite_prompt_tokens_total {self.num_prompt_tokens}",
            "# TYPE aphrodite_generation_tokens_total counter",
            f"aphrodite_generation_tokens_total "
            f"{self.num_generation_tokens}",
            "# TYPE aphrodite_num_preemptions_total counter",
            f"aphrodite_num_preemptions_total {self.num_preemptions}",
        ]
        if self.encoder_cache is not None and (
                self.encoder_cache.hits or self.encoder_cache.misses):
            ec = self.encoder_cache
            out += [
                "# TYPE aphrodite_encoder_cache_hits_total counter",
                f"aphrodite_encoder_cache_hits_total {ec.hits}",
                "# TYPE aphrodite_encoder_cache_misses_total counter",
                f"aphrodite_encoder_cache_misses_total {ec.misses}",
                "# TYPE aphrodite_encoder_cache_evictions_total counter",
                f"aphrodite_encoder_cache_evictions_total {ec.evictions}",
                "# TYPE aphrodite_encoder_cache_bytes gauge",
                f"aphrodite_encoder_cache_bytes {ec.used_bytes}",
            ]
        out += self.ttft.render("aphrodite_time_to_first_token_seconds")
        out += self.tpot.render("aphrodite_time_per_output_token_seconds")
        out += self.e2e.render("aphrodite_e2e_request_latency_seconds")
        out += self.queue_time.render("aphrodite_request_queue_time_seconds")
        if self.spec_drafted:
            out += [
                "# TYPE aphrodite_spec_decode_num_draft_tokens_total counter",
                "aphrodite_spec_decode_num_draft_tokens_total "
                f"{self.spec_drafted}",
                "# TYPE aphrodite_spec_decode_num_accepted_tokens_total "
                "counter",
                "aphrodite_spec_decode_num_accepted_tokens_total "
                f"{self.spec_accepted}",
            ]
        return out

    def log_summary(self) -> None:
        logger.info(
            "stats: %d reqs finished | prompt %d tok | gen %d tok | "
            "TTFT avg %.3fs | TPOT avg %.1fms | E2E avg %.2fs | "
            "spec accept %.1f%%",
            self.num_requests_finished, self.num_prompt_tokens,
            self.num_generation_tokens, self.ttft.mean,
            self.tpot.mean * 1000, self.e2e.mean,
            100 * self.spec_accepted / self.spec_drafted
            if self.spec_drafted else 0.0)

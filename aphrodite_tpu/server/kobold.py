"""KoboldAI legacy API (reference: aphrodite/endpoints/kobold/api_server.py).

Implements the KAI United surface the reference ships: /api/v1/generate,
streaming + check/abort under /api/extra, token counting, and the
model/config introspection routes. Generation is keyed by the client's
``genkey`` so concurrent Kobold clients can poll/abort their own request.
"""
from __future__ import annotations

import asyncio
import json
from typing import Optional

from aiohttp import web

from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.server.protocol import random_uuid

KAI_VERSION = "1.2.4"
EXTRA_VERSION = {"result": "KoboldCpp", "version": "1.63"}
_EPS = 1e-5


class KoboldAPI:

    def __init__(self, engine, model_name: str) -> None:
        self.engine = engine
        self.model_name = model_name
        self.max_model_len = \
            engine.config.scheduler_config.max_model_len
        # genkey -> accumulated text (for /generate/check) / request id.
        self._progress: dict[str, str] = {}
        self._genkey_req: dict[str, str] = {}

    def add_routes(self, app: web.Application) -> None:
        r = app.router
        r.add_post("/api/v1/generate", self.generate)
        r.add_post("/api/extra/generate/stream", self.generate_stream)
        r.add_post("/api/extra/generate/check", self.check)
        r.add_get("/api/extra/generate/check", self.check)
        r.add_post("/api/extra/abort", self.abort)
        r.add_post("/api/extra/tokencount", self.tokencount)
        r.add_get("/api/v1/info/version", self.version)
        r.add_get("/api/v1/model", self.model)
        r.add_get("/api/v1/config/soft_prompts_list", self.soft_prompts)
        r.add_get("/api/v1/config/soft_prompt", self.soft_prompt)
        r.add_get("/api/v1/config/max_length", self.max_length)
        r.add_get("/api/v1/config/max_context_length", self.max_ctx)
        r.add_get("/api/extra/true_max_context_length", self.max_ctx)
        r.add_get("/api/extra/version", self.extra_version)
        r.add_get("/api/extra/preloadstory", self.preloadstory)

    # ------------------------------------------------------------- payload
    def _prepare(self, payload: dict) -> tuple[SamplingParams, list[int],
                                               str]:
        genkey = payload.get("genkey") or f"kai-{random_uuid()}"
        max_length = int(payload.get("max_length", 80))
        max_ctx = int(payload.get("max_context_length",
                                  self.max_model_len))
        if max_ctx > self.max_model_len:
            raise ValueError(
                f"max_context_length ({max_ctx}) must be <= max_model_len "
                f"({self.max_model_len})")
        top_k = payload.get("top_k", 0) or -1  # KAI: 0 = disabled
        temperature = float(payload.get("temperature", 1.0))
        n = int(payload.get("n", 1))
        top_p = float(payload.get("top_p", 1.0))
        if temperature < _EPS:
            n, top_p, top_k = 1, 1.0, -1
        dynatemp_range = float(payload.get("dynatemp_range") or 0.0)
        params = SamplingParams(
            n=n,
            repetition_penalty=float(payload.get("rep_pen", 1.0)),
            temperature=temperature,
            dynatemp_min=(temperature - dynatemp_range
                          if dynatemp_range > 0 else 0.0),
            dynatemp_max=(temperature + dynatemp_range
                          if dynatemp_range > 0 else 0.0),
            dynatemp_exponent=float(payload.get("dynatemp_exponent", 1.0)),
            smoothing_factor=float(payload.get("smoothing_factor", 0.0)),
            smoothing_curve=float(payload.get("smoothing_curve", 1.0)),
            tfs=max(_EPS, float(payload.get("tfs", 1.0))),
            top_p=top_p,
            top_k=int(top_k),
            top_a=float(payload.get("top_a", 0.0)),
            min_p=float(payload.get("min_p", 0.0)),
            typical_p=float(payload.get("typical", 1.0)),
            eta_cutoff=float(payload.get("eta_cutoff", 0.0)),
            epsilon_cutoff=float(payload.get("eps_cutoff", 0.0)),
            stop=payload.get("stop_sequence") or [],
            include_stop_str_in_output=bool(
                payload.get("include_stop_str_in_output", False)),
            max_tokens=max_length,
            seed=payload.get("sampler_seed"),
        )
        max_input = max(1, max_ctx - max_length)
        tokens = self.engine.tokenizer.encode(
            payload.get("prompt", ""))[-max_input:]
        return params, tokens, genkey

    # -------------------------------------------------------------- routes
    async def generate(self, request: web.Request) -> web.Response:
        try:
            payload = await request.json()
            params, tokens, genkey = self._prepare(payload)
        except Exception as e:
            return web.json_response(
                {"detail": {"msg": str(e), "type": "invalid_request"}},
                status=400)
        self._progress[genkey] = ""
        self._genkey_req[genkey] = genkey
        texts: dict[int, str] = {}
        try:
            async for out in self.engine.generate(tokens, params, genkey):
                for c in out.outputs:
                    texts[c.index] = texts.get(c.index, "") + c.text
                self._progress[genkey] = texts.get(0, "")
        finally:
            self._progress.pop(genkey, None)
            self._genkey_req.pop(genkey, None)
        return web.json_response(
            {"results": [{"text": texts[i]} for i in sorted(texts)]})

    async def generate_stream(self, request: web.Request
                              ) -> web.StreamResponse:
        try:
            payload = await request.json()
            params, tokens, genkey = self._prepare(payload)
        except Exception as e:
            return web.json_response(
                {"detail": {"msg": str(e), "type": "invalid_request"}},
                status=400)
        resp = web.StreamResponse(
            status=200, headers={"Content-Type": "text/event-stream",
                                 "Cache-Control": "no-cache"})
        await resp.prepare(request)
        self._genkey_req[genkey] = genkey
        try:
            async for out in self.engine.generate(tokens, params, genkey):
                for c in out.outputs:
                    if c.text:
                        await resp.write(
                            b"event: message\ndata: " +
                            json.dumps({"token": c.text}).encode() +
                            b"\n\n")
        finally:
            self._genkey_req.pop(genkey, None)
        await resp.write_eof()
        return resp

    async def check(self, request: web.Request) -> web.Response:
        genkey = None
        try:
            genkey = (await request.json()).get("genkey")
        except Exception:
            pass
        text = self._progress.get(genkey, "") if genkey else ""
        return web.json_response({"results": [{"text": text}]})

    async def abort(self, request: web.Request) -> web.Response:
        try:
            genkey = (await request.json()).get("genkey")
        except Exception:
            genkey = None
        rid = self._genkey_req.get(genkey)
        if rid:
            await self.engine.abort(rid)
        return web.json_response({})

    async def tokencount(self, request: web.Request) -> web.Response:
        body = await request.json()
        ids = self.engine.tokenizer.encode(body.get("prompt", ""))
        return web.json_response({"value": len(ids), "ids": ids})

    async def version(self, request) -> web.Response:
        return web.json_response({"result": KAI_VERSION})

    async def extra_version(self, request) -> web.Response:
        return web.json_response(EXTRA_VERSION)

    async def model(self, request) -> web.Response:
        return web.json_response({"result": f"aphrodite/{self.model_name}"})

    async def soft_prompts(self, request) -> web.Response:
        return web.json_response({"values": []})

    async def soft_prompt(self, request) -> web.Response:
        return web.json_response({"value": ""})

    async def max_length(self, request) -> web.Response:
        return web.json_response({"value": self.max_model_len // 2})

    async def max_ctx(self, request) -> web.Response:
        return web.json_response({"value": self.max_model_len})

    async def preloadstory(self, request) -> web.Response:
        return web.json_response({})

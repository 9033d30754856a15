"""OpenAI-compatible API server (aiohttp).

Parity target: aphrodite/endpoints/openai/api_server.py route surface
(SURVEY.md §2.10): /v1/chat/completions (+SSE streaming), /v1/completions,
/v1/models, /v1/tokenize, /v1/detokenize, /health, /ping, /version,
/server_info, /reset_prefix_cache, /metrics (Prometheus text).
Built on aiohttp (this environment ships no fastapi/uvicorn).
"""
from __future__ import annotations

import asyncio
import json
import time
from typing import Optional

from aiohttp import web

import aphrodite_tpu
from aphrodite_tpu.engine.async_llm import AsyncLLM, EngineDeadError
from aphrodite_tpu.server.protocol import (
    ChatCompletionChoice, ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionStreamChoice, ChatCompletionStreamResponse, ChatMessage,
    CompletionChoice, CompletionRequest, CompletionResponse,
    DeltaMessage, DetokenizeRequest, DetokenizeResponse, EmbeddingData,
    EmbeddingRequest, EmbeddingResponse, ErrorResponse,
    ModelCard, ModelList, TokenizeRequest, TokenizeResponse, UsageInfo,
    random_uuid)
from aphrodite_tpu.utils import logger


def _decode_image_url(url: str):
    """data:[mime];base64,... -> PIL image. http(s) URLs are rejected: the
    serving process does not fetch external content."""
    import base64
    import io
    if not isinstance(url, str) or not url.startswith("data:"):
        raise ValueError(
            "only data: image URLs are supported (no egress fetching)")
    try:
        payload = url.split(",", 1)[1]
        from PIL import Image
        return Image.open(io.BytesIO(base64.b64decode(payload)))
    except Exception as e:
        raise ValueError(f"invalid image data URL: {e}") from e


# WAV via stdlib + from-scratch FLAC; recognized lossy formats get a
# transcode hint (aphrodite_tpu/audio.py; reference decodes via librosa,
# serving_transcription.py:160).
from aphrodite_tpu.audio import decode_audio as _decode_audio


def _err(msg: str, code: int = 400, etype: str = "BadRequestError"
         ) -> web.Response:
    return web.json_response(
        ErrorResponse(message=msg, type=etype, code=code).model_dump(),
        status=code)


def _json(model) -> web.Response:
    return web.json_response(model.model_dump())


class OpenAIServer:
    """Route handlers bound to one AsyncLLM."""

    def __init__(self, engine: AsyncLLM, model_name: str,
                 tool_parser: str = "auto",
                 reasoning_parser: str = "auto") -> None:
        self.engine = engine
        self.model_name = model_name
        self.tool_parser = tool_parser
        self.reasoning_parser = reasoning_parser
        self.start_time = time.time()
        self.num_requests = 0
        self.num_prompt_tokens = 0
        self.num_generation_tokens = 0
        self._inflight = 0
        self._mm_placeholder: Optional[str] = None

    # ----------------------------------------------------------------- app
    def build_app(self) -> web.Application:
        @web.middleware
        async def count_load(request, handler):
            # /load reports in-flight request count (reference
            # api_server.py load-tracking middleware).
            self._inflight += 1
            try:
                return await handler(request)
            finally:
                self._inflight -= 1

        app = web.Application(middlewares=[count_load])
        r = app.router
        r.add_get("/health", self.health)
        r.add_get("/ping", self.ping)
        r.add_post("/ping", self.ping)
        r.add_get("/version", self.version)
        r.add_get("/server_info", self.server_info)
        r.add_get("/metrics", self.metrics)
        r.add_post("/reset_prefix_cache", self.reset_prefix_cache)
        r.add_get("/v1/models", self.list_models)
        r.add_get("/samplers", self.samplers)
        r.add_get("/v1/samplers", self.samplers)
        r.add_post("/v1/tokenize", self.tokenize)
        r.add_post("/v1/detokenize", self.detokenize)
        r.add_post("/v1/chat/completions", self.chat_completions)
        r.add_post("/v1/completions", self.completions)
        r.add_post("/v1/load_lora_adapter", self.load_lora)
        r.add_post("/v1/unload_lora_adapter", self.unload_lora)
        r.add_post("/v1/embeddings", self.embeddings)
        r.add_post("/pooling", self.pooling)
        r.add_post("/v1/audio/transcriptions", self.transcriptions)
        r.add_post("/v1/audio/translations", self.translations)
        r.add_get("/load", self.load)
        r.add_post("/invocations", self.invocations)
        r.add_get("/.well-known/serviceinfo", self.serviceinfo)
        r.add_post("/score", self.score)
        r.add_post("/v1/score", self.score)
        r.add_post("/rerank", self.rerank)
        r.add_post("/v1/rerank", self.rerank)
        r.add_post("/v2/rerank", self.rerank)
        r.add_post("/sleep", self.sleep)
        r.add_post("/wake_up", self.wake_up)
        r.add_get("/is_sleeping", self.is_sleeping)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        return app

    # ------------------------------------------------------------ embeddings
    async def embeddings(self, request: web.Request) -> web.Response:
        import asyncio as _asyncio
        try:
            req = EmbeddingRequest(**await request.json())
        except Exception as e:
            return _err(str(e))
        inputs = req.input
        if isinstance(inputs, str) or (
                isinstance(inputs, list) and inputs
                and isinstance(inputs[0], int)):
            inputs = [inputs]
        tok = self.engine.tokenizer
        token_lists = []
        for p in inputs:
            token_lists.append(tok.encode(p) if isinstance(p, str)
                               else list(p))
        loop = _asyncio.get_running_loop()
        try:
            vecs = await loop.run_in_executor(
                None, lambda: self.engine.worker_call(
                    "embed", token_lists, pooling=req.pooling))
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        import numpy as _np
        data = []
        n_tok = 0
        for i, v in enumerate(vecs):
            v = _np.asarray(v, _np.float32)
            v = v / max(float(_np.linalg.norm(v)), 1e-12)
            if req.dimensions:
                v = v[:req.dimensions]
            data.append(EmbeddingData(index=i, embedding=v.tolist()))
            n_tok += len(token_lists[i])
        return _json(EmbeddingResponse(
            data=data, model=req.model or self.model_name,
            usage=UsageInfo(prompt_tokens=n_tok, total_tokens=n_tok)))

    # -------------------------------------------------------- transcriptions
    async def transcriptions(self, request: web.Request) -> web.Response:
        """/v1/audio/transcriptions (reference api_server.py:650):
        multipart form with a WAV `file` (stdlib decode; no codec deps in
        this environment) served by an encoder-decoder (Whisper) model."""
        return await self._audio(request, task="transcribe")

    async def translations(self, request: web.Request) -> web.Response:
        """/v1/audio/translations: same pipeline with Whisper's
        <|translate|> task token (translate-to-English)."""
        return await self._audio(request, task="translate")

    async def _audio(self, request: web.Request, task: str) -> web.Response:
        try:
            form = await request.post()
            up = form.get("file")
            if up is None:
                return _err("missing 'file' form field")
            wav, sr = _decode_audio(up.file.read())
            temperature = float(form.get("temperature", 0) or 0)
            language = form.get("language")
        except Exception as e:
            return _err(f"bad transcription request: {e}")
        tok = self.engine.tokenizer
        prompt_ids = []
        for t in ("<|startoftranscript|>",
                  f"<|{language}|>" if language else None,
                  f"<|{task}|>", "<|notimestamps|>"):
            if t is None:
                continue
            tid = tok.convert_tokens_to_ids(t) \
                if hasattr(tok, "convert_tokens_to_ids") else None
            if tid is not None and tid >= 0 and \
                    tid != getattr(tok, "unk_token_id", None):
                prompt_ids.append(tid)
        if not prompt_ids:
            dsid = getattr(self.engine.config.model_config.hf_config,
                           "decoder_start_token_id", None)
            prompt_ids = [dsid if dsid is not None else
                          (tok.bos_token_id or 0)]
        from aphrodite_tpu.sampling_params import SamplingParams as SP
        params = SP(temperature=temperature, max_tokens=None)
        request_id = f"trsc-{random_uuid()}"
        text = ""
        try:
            async for out in self.engine.generate(
                    {"prompt_token_ids": prompt_ids,
                     "multi_modal_data": {"audio": (wav, sr)}},
                    params, request_id):
                for c in out.outputs:
                    text += c.text
        except EngineDeadError:
            return _err("engine is dead", 500, "InternalServerError")
        except ValueError as e:
            return _err(str(e))
        return web.json_response({"text": text})

    # --------------------------------------------------------- score/rerank
    def _score_pairs(self, text_1, texts_2) -> tuple[list, list[float]]:
        import math
        tok = self.engine.tokenizer
        pairs = []
        for t2 in texts_2:
            enc = tok(text_1, text_pair=t2)
            pairs.append((enc["input_ids"],
                          enc.get("token_type_ids")
                          or [0] * len(enc["input_ids"])))
        logits = self.engine.worker_call("score", pairs)
        scores = []
        for row in logits:
            v = row[0] if len(row) == 1 else max(row)
            scores.append(1.0 / (1.0 + math.exp(-v)) if len(row) == 1
                          else v)
        return pairs, scores

    async def score(self, request: web.Request) -> web.Response:
        """/score + /v1/score (reference api_server.py:620-639): sigmoid
        cross-encoder relevance of (text_1, text_2) pairs."""
        import asyncio as _asyncio
        try:
            body = await request.json()
            text_1 = body["text_1"]
            texts_2 = body["text_2"]
            if isinstance(texts_2, str):
                texts_2 = [texts_2]
        except Exception as e:
            return _err(str(e))
        loop = _asyncio.get_running_loop()
        try:
            pairs, scores = await loop.run_in_executor(
                None, self._score_pairs, text_1, texts_2)
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        n_tok = sum(len(p[0]) for p in pairs)
        return web.json_response({
            "id": f"score-{random_uuid()}", "object": "list",
            "model": body.get("model") or self.model_name,
            "data": [{"index": i, "object": "score", "score": s}
                     for i, s in enumerate(scores)],
            "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
        })

    async def rerank(self, request: web.Request) -> web.Response:
        """/rerank + /v1/rerank + /v2/rerank (Jina/Cohere-compatible,
        reference api_server.py:675-706)."""
        import asyncio as _asyncio
        try:
            body = await request.json()
            query = body["query"]
            documents = body["documents"]
            top_n = body.get("top_n") or len(documents)
        except Exception as e:
            return _err(str(e))
        loop = _asyncio.get_running_loop()
        try:
            pairs, scores = await loop.run_in_executor(
                None, self._score_pairs, query, documents)
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        order = sorted(range(len(documents)), key=lambda i: -scores[i])
        n_tok = sum(len(p[0]) for p in pairs)
        return web.json_response({
            "id": f"rerank-{random_uuid()}",
            "model": body.get("model") or self.model_name,
            "results": [{"index": i,
                         "document": {"text": documents[i]},
                         "relevance_score": scores[i]}
                        for i in order[:top_n]],
            "usage": {"total_tokens": n_tok},
        })

    # ---------------------------------------------------------- sleep / wake
    async def sleep(self, request: web.Request) -> web.Response:
        try:
            level = int(request.query.get("level", "1"))
            self.engine.worker_call("sleep", level)
        except Exception as e:
            return _err(str(e))
        return web.Response(status=200)

    async def wake_up(self, request: web.Request) -> web.Response:
        self.engine.worker_call("wake_up")
        return web.Response(status=200)

    async def is_sleeping(self, request: web.Request) -> web.Response:
        return web.json_response(
            {"is_sleeping": self.engine.worker_call("get_is_sleeping")})

    async def start_profile(self, request: web.Request) -> web.Response:
        try:
            self.engine.worker_call("start_profile")
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        return web.Response(status=200)

    async def stop_profile(self, request: web.Request) -> web.Response:
        try:
            self.engine.worker_call("stop_profile")
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        return web.Response(status=200)

    # --------------------------------------------------------------- admin
    async def samplers(self, request: web.Request) -> web.Response:
        """Sampler capability descriptor (reference
        endpoints/openai/samplers.json): field name -> type/default for
        every SamplingParams knob the engine honors, so UI clients can
        render controls without hardcoding the surface."""
        import dataclasses as _dc
        from aphrodite_tpu.sampling_params import SamplingParams
        props = {}
        for f in _dc.fields(SamplingParams):
            default = f.default if f.default is not _dc.MISSING else None
            if callable(default) or default is _dc.MISSING:
                default = None
            t = {int: "integer", float: "number", bool: "boolean",
                 str: "string"}.get(type(default), "any")
            props[f.name] = {"type": t, "default": default}
        return web.json_response({"type": "object", "properties": props})

    async def health(self, request: web.Request) -> web.Response:
        try:
            await self.engine.check_health()
        except EngineDeadError:
            return web.Response(status=500)
        return web.Response(status=200)

    async def ping(self, request: web.Request) -> web.Response:
        return web.Response(status=200)

    async def version(self, request: web.Request) -> web.Response:
        return web.json_response({"version": aphrodite_tpu.__version__})

    async def load(self, request: web.Request) -> web.Response:
        # exclude this GET itself from the count
        return web.json_response({"server_load": max(self._inflight - 1, 0)})

    async def serviceinfo(self, request: web.Request) -> web.Response:
        """/.well-known/serviceinfo (reference api_server.py route):
        machine-readable software + API descriptor for clients/UIs."""
        return web.json_response({
            "version": 0.2,
            "software": {
                "name": "aphrodite-tpu",
                "version": aphrodite_tpu.__version__,
                "repository": "aphrodite-tpu",
            },
            "api": {
                "openai": {"name": "OpenAI API",
                           "relative_url": "/v1",
                           "documentation": "https://platform.openai.com/"
                                            "docs/api-reference"},
                "koboldai": {"name": "KoboldAI API",
                             "relative_url": "/api/v1"},
            },
        })

    async def invocations(self, request: web.Request) -> web.Response:
        """SageMaker-style /invocations: dispatch on the body's shape
        (reference api_server.py:788)."""
        try:
            body = await request.json()
        except Exception as e:
            return _err(f"invalid JSON: {e}")
        # aiohttp caches the payload, so the target handler re-reads it.
        if "messages" in body:
            return await self.chat_completions(request)
        if "prompt" in body:
            return await self.completions(request)
        if "input" in body:
            return await self.embeddings(request)
        return _err("cannot infer task: body has none of "
                    "'messages'/'prompt'/'input'")

    async def pooling(self, request: web.Request) -> web.Response:
        """/pooling (reference api_server.py:601): raw pooled hidden states
        without normalization."""
        import asyncio as _asyncio
        try:
            body = await request.json()
        except Exception as e:
            return _err(str(e))
        inputs = body.get("input")
        if isinstance(inputs, str) or (
                isinstance(inputs, list) and inputs
                and isinstance(inputs[0], int)):
            inputs = [inputs]
        tok = self.engine.tokenizer
        token_lists = [tok.encode(p) if isinstance(p, str) else list(p)
                       for p in inputs]
        loop = _asyncio.get_running_loop()
        try:
            vecs = await loop.run_in_executor(
                None, lambda: self.engine.worker_call(
                    "embed", token_lists,
                    pooling=body.get("pooling", "last")))
        except Exception as e:
            return _err(str(e), 500, "InternalServerError")
        import numpy as _np
        data = [{"index": i, "object": "pooling",
                 "data": _np.asarray(v, _np.float32).tolist()}
                for i, v in enumerate(vecs)]
        n_tok = sum(len(t) for t in token_lists)
        return web.json_response({
            "id": f"pool-{random_uuid()}", "object": "list", "data": data,
            "model": body.get("model") or self.model_name,
            "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok}})

    async def server_info(self, request: web.Request) -> web.Response:
        return web.json_response({
            "model": self.model_name,
            "stats": self.engine.stats,
            "uptime_s": time.time() - self.start_time,
        })

    async def reset_prefix_cache(self, request: web.Request) -> web.Response:
        return web.json_response(
            {"success": bool(self.engine.reset_prefix_cache())})

    async def metrics(self, request: web.Request) -> web.Response:
        return web.Response(text=self.engine.metrics_text(),
                            content_type="text/plain")

    # -------------------------------------------------------------- models
    async def list_models(self, request: web.Request) -> web.Response:
        mml = self.engine.config.scheduler_config.max_model_len
        cards = [ModelCard(id=self.model_name, root=self.model_name,
                           max_model_len=mml)]
        for name in self._loras():
            cards.append(ModelCard(id=name, root=self.model_name,
                                   max_model_len=mml))
        return _json(ModelList(data=cards))

    def _loras(self) -> list[str]:
        try:
            return self.engine.worker_call("list_loras")
        except Exception:
            return []

    def _lora_for_model(self, model: Optional[str]):
        """OpenAI 'model' field doubling as the adapter selector
        (reference behavior for runtime LoRA)."""
        if model and model in self._loras():
            return model
        return None

    async def load_lora(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            name = body["lora_name"]
            path = body.get("lora_path") or body.get("lora_local_path")
            self.engine.worker_call("add_lora", name, path)
        except Exception as e:
            return _err(str(e))
        return web.json_response(
            {"status": f"adapter {name!r} loaded"})

    async def unload_lora(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            ok = self.engine.worker_call("remove_lora", body["lora_name"])
        except Exception as e:
            return _err(str(e))
        return web.json_response({"status": "removed" if ok else
                                  "not found"})

    # ------------------------------------------------------------ tokenize
    async def tokenize(self, request: web.Request) -> web.Response:
        try:
            req = TokenizeRequest(**await request.json())
        except Exception as e:
            return _err(str(e))
        tok = self.engine.tokenizer
        if req.messages is not None:
            text = tok.apply_chat_template(req.messages, tokenize=False,
                                           add_generation_prompt=True)
        else:
            text = req.prompt or ""
        ids = tok.encode(text, add_special_tokens=req.add_special_tokens)
        return _json(TokenizeResponse(
            tokens=ids, count=len(ids),
            max_model_len=self.engine.config.scheduler_config.max_model_len))

    async def detokenize(self, request: web.Request) -> web.Response:
        try:
            req = DetokenizeRequest(**await request.json())
        except Exception as e:
            return _err(str(e))
        return _json(DetokenizeResponse(
            prompt=self.engine.tokenizer.decode(req.tokens)))

    # ---------------------------------------------------- chat completions
    def _render_chat(self, req: ChatCompletionRequest):
        """Render messages -> prompt. OpenAI-style content-part lists with
        image_url entries become a multimodal prompt dict (reference:
        endpoints/chat_utils.py image handling); plain string content stays
        a str prompt."""
        kwargs = req.chat_template_kwargs or {}
        if req.tools:
            kwargs.setdefault("tools", req.tools)
        messages, images = self._extract_mm(req.messages)
        text = self.engine.tokenizer.apply_chat_template(
            messages, tokenize=False,
            add_generation_prompt=req.add_generation_prompt,
            chat_template=req.chat_template, **kwargs)
        if images:
            return {"prompt": text, "multi_modal_data": {"image": images}}
        return text

    def _extract_mm(self, messages: list[dict]):
        """Flatten content-part lists; image parts are replaced with the
        model's image placeholder token text (data: URLs only — this server
        does no egress fetching)."""
        images, out = [], []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                out.append(m)
                continue
            parts = []
            for part in content:
                kind = part.get("type")
                if kind == "text":
                    parts.append(part.get("text", ""))
                elif kind == "image_url":
                    url = part.get("image_url")
                    url = url.get("url") if isinstance(url, dict) else url
                    images.append(_decode_image_url(url))
                    parts.append(self._image_placeholder())
                else:
                    raise ValueError(f"unsupported content part: {kind}")
            out.append({**m, "content": "".join(parts)})
        return out, images

    def _image_placeholder(self) -> str:
        if self._mm_placeholder is None:
            from aphrodite_tpu.multimodal import get_mm_adapter
            adapter = get_mm_adapter(self.engine.config.model_config
                                     .hf_config)
            if adapter is None:
                raise ValueError("model does not accept image input")
            tok = self.engine.tokenizer
            s = tok.convert_ids_to_tokens(adapter.image_token_id) \
                if hasattr(tok, "convert_ids_to_tokens") else None
            self._mm_placeholder = s or tok.decode([adapter.image_token_id])
        return self._mm_placeholder

    async def chat_completions(self, request: web.Request) -> web.Response:
        try:
            req = ChatCompletionRequest(**await request.json())
            prompt = self._render_chat(req)
            params = req.to_sampling_params()
        except Exception as e:
            return _err(str(e))
        request_id = f"chatcmpl-{random_uuid()}"
        model = req.model or self.model_name
        lora = self._lora_for_model(req.model)

        if req.stream:
            return await self._stream_chat(request, req, request_id, model,
                                           prompt, params, lora)

        texts: dict[int, str] = {}
        toks: dict[int, int] = {}
        lps: dict[int, list] = {}
        finish: dict[int, Optional[str]] = {}
        stop_reason: dict[int, object] = {}
        prompt_tokens = 0
        try:
            async for out in self.engine.generate(
                    prompt, params, request_id, lora_name=lora,
                    priority=req.priority):
                prompt_tokens = len(out.prompt_token_ids)
                for c in out.outputs:
                    texts[c.index] = texts.get(c.index, "") + c.text
                    toks[c.index] = toks.get(c.index, 0) + len(c.token_ids)
                    finish[c.index] = c.finish_reason
                    stop_reason[c.index] = c.stop_reason
                    if c.logprobs:
                        lps.setdefault(c.index, []).extend(c.logprobs)
        except EngineDeadError:
            return _err("engine is dead", 500, "InternalServerError")
        except ValueError as e:
            return _err(str(e))

        from aphrodite_tpu.server.tool_parser import (parse_reasoning,
                                                      parse_tool_calls)
        tok = self.engine.tokenizer
        choices = []
        for i in sorted(texts):
            logprobs = None
            if i in lps:
                content = []
                for d in lps[i]:
                    items = sorted(d.items(), key=lambda kv: -kv[1].logprob)
                    chosen_tok, chosen = items[0]
                    content.append({
                        "token": tok.decode([chosen_tok]),
                        "logprob": chosen.logprob,
                        "top_logprobs": [
                            {"token": tok.decode([t]), "logprob": lp.logprob}
                            for t, lp in items],
                    })
                logprobs = {"content": content}
            content = texts.get(i, "")
            reasoning, content = parse_reasoning(content,
                                                 self.reasoning_parser)
            tool_calls = []
            if req.tools:
                tool_calls, content = parse_tool_calls(
                    content, self.tool_parser)
            choices.append(ChatCompletionChoice(
                index=i,
                message=ChatMessage(
                    role="assistant",
                    content=content or None if tool_calls else content,
                    tool_calls=tool_calls or None,
                    reasoning_content=reasoning),
                finish_reason=("tool_calls" if tool_calls
                               else finish.get(i) or "stop"),
                stop_reason=stop_reason.get(i),
                logprobs=logprobs))
        completion_tokens = sum(toks.values())
        self.num_requests += 1
        self.num_prompt_tokens += prompt_tokens
        self.num_generation_tokens += completion_tokens
        return _json(ChatCompletionResponse(
            id=request_id, model=model, choices=choices,
            usage=UsageInfo(
                prompt_tokens=prompt_tokens,
                completion_tokens=completion_tokens,
                total_tokens=prompt_tokens + completion_tokens)))

    async def _stream_chat(self, request, req, request_id, model, prompt,
                           params, lora=None) -> web.StreamResponse:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)

        async def send(obj) -> None:
            await resp.write(f"data: {obj.model_dump_json()}\n\n".encode())

        first = ChatCompletionStreamResponse(
            id=request_id, model=model,
            choices=[ChatCompletionStreamChoice(
                index=i, delta=DeltaMessage(role="assistant", content=""))
                for i in range(params.n)])
        await send(first)
        # Incremental tool-call / reasoning parsing per choice (reference:
        # endpoints/openai/tool_parsers/* extract_tool_calls_streaming).
        from aphrodite_tpu.server.tool_parser import StreamingToolParser
        parsers = {i: StreamingToolParser(
            parser_name=self.tool_parser,
            reasoning_parser=self.reasoning_parser)
                   for i in range(params.n)} \
            if req.tools else None
        n_prompt = n_gen = 0

        def to_delta(c):
            if parsers is None:
                return (DeltaMessage(content=c.text), c.finish_reason)
            p = parsers[c.index]
            content, reasoning, tcs = p.feed(c.text)
            if c.finish_reason:
                c2, r2, _ = p.flush()
                content += c2
                reasoning += r2
            fin = c.finish_reason
            if fin and fin != "length" and p.emitted_tool_calls:
                fin = "tool_calls"
            if not (content or reasoning or tcs or fin):
                return None, None
            return (DeltaMessage(content=content or None,
                                 reasoning_content=reasoning or None,
                                 tool_calls=tcs or None), fin)
        try:
            async for out in self.engine.generate(
                    prompt, params, request_id, lora_name=lora,
                    priority=req.priority):
                n_prompt = len(out.prompt_token_ids)
                choices = []
                for c in out.outputs:
                    n_gen += len(c.token_ids)
                    if c.text or c.finish_reason:
                        delta, fin = to_delta(c)
                        if delta is None:
                            continue
                        choices.append(ChatCompletionStreamChoice(
                            index=c.index, delta=delta,
                            finish_reason=fin))
                if choices:
                    await send(ChatCompletionStreamResponse(
                        id=request_id, model=model, choices=choices))
        except (EngineDeadError, ValueError) as e:
            await send(ErrorResponse(message=str(e),
                                     type="InternalServerError", code=500))
        if req.stream_options and req.stream_options.get("include_usage"):
            await send(ChatCompletionStreamResponse(
                id=request_id, model=model, choices=[],
                usage=UsageInfo(prompt_tokens=n_prompt,
                                completion_tokens=n_gen,
                                total_tokens=n_prompt + n_gen)))
        self.num_requests += 1
        self.num_prompt_tokens += n_prompt
        self.num_generation_tokens += n_gen
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # --------------------------------------------------------- completions
    async def completions(self, request: web.Request) -> web.Response:
        try:
            req = CompletionRequest(**await request.json())
            params = req.to_sampling_params()
        except Exception as e:
            return _err(str(e))
        prompts = req.prompt
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        request_id = f"cmpl-{random_uuid()}"
        model = req.model or self.model_name
        lora = self._lora_for_model(req.model)

        if req.stream:
            if len(prompts) != 1:
                return _err("streaming supports a single prompt")
            return await self._stream_completion(
                request, req, request_id, model, prompts[0], params)

        choices = []
        usage = UsageInfo()
        try:
            for pi, prompt in enumerate(prompts):
                texts: dict[int, str] = {}
                finish: dict[int, Optional[str]] = {}
                stop_reason: dict[int, object] = {}
                ntok: dict[int, int] = {}
                prompt_len = 0
                async for out in self.engine.generate(
                        prompt, params, f"{request_id}-{pi}",
                        lora_name=lora, priority=req.priority):
                    prompt_len = len(out.prompt_token_ids)
                    for c in out.outputs:
                        texts[c.index] = texts.get(c.index, "") + c.text
                        ntok[c.index] = ntok.get(c.index, 0) + \
                            len(c.token_ids)
                        finish[c.index] = c.finish_reason
                        stop_reason[c.index] = c.stop_reason
                usage.prompt_tokens += prompt_len
                usage.completion_tokens += sum(ntok.values())
                for i in sorted(texts):
                    text = texts[i]
                    if req.echo and isinstance(prompt, str):
                        text = prompt + text
                    choices.append(CompletionChoice(
                        index=pi * params.n + i, text=text,
                        finish_reason=finish.get(i) or "stop",
                        stop_reason=stop_reason.get(i)))
        except EngineDeadError:
            return _err("engine is dead", 500, "InternalServerError")
        except ValueError as e:
            return _err(str(e))
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        self.num_requests += 1
        self.num_prompt_tokens += usage.prompt_tokens
        self.num_generation_tokens += usage.completion_tokens
        return _json(CompletionResponse(id=request_id, model=model,
                                        choices=choices, usage=usage))

    async def _stream_completion(self, request, req, request_id, model,
                                 prompt, params) -> web.StreamResponse:
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)
        try:
            async for out in self.engine.generate(
                    prompt, params, request_id, priority=req.priority):
                for c in out.outputs:
                    if c.text or c.finish_reason:
                        chunk = CompletionResponse(
                            id=request_id, model=model,
                            choices=[CompletionChoice(
                                index=c.index, text=c.text,
                                finish_reason=c.finish_reason,
                                stop_reason=c.stop_reason)])
                        await resp.write(
                            f"data: {chunk.model_dump_json()}\n\n".encode())
        except (EngineDeadError, ValueError) as e:
            err = ErrorResponse(message=str(e), type="InternalServerError",
                                code=500)
            await resp.write(f"data: {err.model_dump_json()}\n\n".encode())
        self.num_requests += 1
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def build_app(engine: AsyncLLM, model_name: str,
              kobold_api: bool = False,
              tool_parser: str = "auto",
              reasoning_parser: str = "auto") -> web.Application:
    app = OpenAIServer(engine, model_name, tool_parser=tool_parser,
                       reasoning_parser=reasoning_parser).build_app()
    if kobold_api:
        from aphrodite_tpu.server.kobold import KoboldAPI
        KoboldAPI(engine, model_name).add_routes(app)
    return app


def run_server(config, model_name: str, host: str = "0.0.0.0",
               port: int = 2242, multiprocess: bool = False,
               kobold_api: bool = False,
               tool_parser: str = "auto",
               reasoning_parser: str = "auto") -> None:
    engine = AsyncLLM(config, multiprocess=multiprocess)
    if config.tpu_config.precompile and \
            config.device_config.resolve() == "tpu":
        # Warm the hot jitted programs BEFORE accepting traffic
        # (EngineCore.precompile): the first real request then hits a
        # compiled server instead of paying the bucket warmup.
        engine.worker_call("precompile", timeout=1800)
    app = build_app(engine, model_name, kobold_api=kobold_api,
                    tool_parser=tool_parser,
                    reasoning_parser=reasoning_parser)
    logger.info("serving %s on %s:%d", model_name, host, port)
    web.run_app(app, host=host, port=port)

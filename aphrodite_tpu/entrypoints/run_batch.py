"""OpenAI batch-file runner (reference: endpoints/openai/run_batch.py).

Reads a JSONL file of OpenAI batch request lines
``{"custom_id", "method": "POST", "url": "/v1/chat/completions"|
"/v1/completions"|"/v1/embeddings", "body": {...}}``, runs every request
through an in-process engine at full continuous-batching throughput, and
writes the OpenAI batch output JSONL (one ``{"id", "custom_id",
"response": {"status_code", "body"}, "error"}`` line per input line,
input order preserved).
"""
from __future__ import annotations

import asyncio
import json

from aphrodite_tpu.server.protocol import random_uuid
from aphrodite_tpu.utils import logger


async def _run_one(server, line_no: int, item: dict) -> dict:
    from aphrodite_tpu.server.api_server import web  # reuse handlers

    class _FakeRequest:
        def __init__(self, body):
            self._body = body

        async def json(self):
            return self._body

    out = {
        "id": f"aphrodite-tpu-batch-{random_uuid()}",
        "custom_id": item.get("custom_id"),
        "response": None,
        "error": None,
    }
    url = item.get("url", "")
    handler = {
        "/v1/chat/completions": server.chat_completions,
        "/v1/completions": server.completions,
        "/v1/embeddings": server.embeddings,
        "/score": server.score,
        "/v1/score": server.score,
        "/rerank": server.rerank,
        "/v1/rerank": server.rerank,
    }.get(url)
    try:
        if item.get("method", "POST") != "POST" or handler is None:
            raise ValueError(f"unsupported batch url/method: "
                             f"{item.get('method')} {url}")
        body = dict(item.get("body") or {})
        body.pop("stream", None)  # batch responses are never streamed
        resp = await handler(_FakeRequest(body))
        out["response"] = {
            "status_code": resp.status,
            "request_id": f"aphrodite-tpu-batch-req-{line_no}",
            "body": json.loads(resp.text),
        }
        if resp.status != 200:
            out["error"] = out["response"]["body"].get("error")
    except Exception as e:  # one bad line must not sink the batch
        out["error"] = {"message": str(e), "type": type(e).__name__}
    return out


async def run_batch_async(engine, model_name: str, input_path: str,
                          output_path: str,
                          max_concurrency: int = 128) -> dict:
    from aphrodite_tpu.server.api_server import OpenAIServer
    server = OpenAIServer(engine, model_name)
    sem = asyncio.Semaphore(max_concurrency)

    async def guarded(i, item):
        async with sem:
            return await _run_one(server, i, item)

    tasks = []
    with open(input_path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                item = json.loads(line)
            except json.JSONDecodeError as e:
                async def bad(i=i, e=e):
                    return {"id": f"aphrodite-tpu-batch-{random_uuid()}",
                            "custom_id": None, "response": None,
                            "error": {"message": f"line {i + 1}: {e}",
                                      "type": "JSONDecodeError"}}
                tasks.append(asyncio.create_task(bad()))
                continue
            tasks.append(asyncio.create_task(guarded(i, item)))
    results = await asyncio.gather(*tasks)
    ok = 0
    with open(output_path, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
            ok += r["error"] is None
    logger.info("batch: %d/%d requests succeeded -> %s", ok, len(results),
                output_path)
    return {"total": len(results), "succeeded": ok}


def run_batch(config, model_name: str, input_path: str,
              output_path: str) -> dict:
    from aphrodite_tpu.engine.async_llm import AsyncLLM
    engine = AsyncLLM(config)
    try:
        return asyncio.run(run_batch_async(engine, model_name, input_path,
                                           output_path))
    finally:
        engine.shutdown()

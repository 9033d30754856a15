"""`aphrodite-tpu` console entry point.
(reference: aphrodite/endpoints/cli/main.py — subcommands run/serve,
bench)."""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="aphrodite-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    from aphrodite_tpu.engine.args import EngineArgs

    run_p = sub.add_parser("run", help="start the OpenAI-compatible server")
    EngineArgs.add_cli_args(run_p)
    run_p.add_argument("--host", default="0.0.0.0")
    run_p.add_argument("--port", type=int, default=2242)
    run_p.add_argument("--served-model-name", default=None)
    run_p.add_argument("--multiprocess-engine", action="store_true",
                       help="run the engine core in an isolated process "
                            "(ZMQ boundary)")
    run_p.add_argument("--launch-kobold-api", action="store_true",
                       help="also mount the KoboldAI legacy API under /api")
    run_p.add_argument("--reasoning-parser", default="auto",
                       choices=["auto", "deepseek_r1", "qwen3", "granite",
                                "none"],
                       help="constrain reasoning-content splitting to one "
                            "model family (reference --reasoning-parser)")
    run_p.add_argument("--tool-call-parser", default="auto",
                       choices=["auto", "hermes", "mistral", "jamba",
                                "internlm2", "llama", "llama3_json",
                                "pythonic"],
                       help="constrain tool-call parsing to one model "
                            "family's wire format (reference "
                            "--tool-call-parser)")

    bench_p = sub.add_parser(
        "bench", help="benchmarks: latency | throughput | serve | perf")
    bench_p.add_argument("kind",
                         choices=["latency", "throughput", "serve", "perf"])
    EngineArgs.add_cli_args(bench_p)
    bench_p.add_argument("--num-prompts", type=int, default=32)
    bench_p.add_argument("--input-len", type=int, default=128)
    bench_p.add_argument("--output-len", type=int, default=64)
    bench_p.add_argument("--batch-size", type=int, default=1)
    bench_p.add_argument("--request-rate", type=float, default=float("inf"))
    bench_p.add_argument("--num-iters", type=int, default=5)

    batch_p = sub.add_parser(
        "run-batch",
        help="run an OpenAI batch-format JSONL file offline "
             "(reference: endpoints/openai/run_batch.py)")
    EngineArgs.add_cli_args(batch_p)
    batch_p.add_argument("-i", "--input-file", required=True)
    batch_p.add_argument("-o", "--output-file", required=True)
    batch_p.add_argument("--served-model-name", default=None)

    fol_p = sub.add_parser(
        "follower",
        help="peer-host engine: follow host 0's step stream "
             "(multi-host SPMD; parallel/control_plane.py). Bind address "
             "from --bind or APHRODITE_CP_BIND.")
    EngineArgs.add_cli_args(fol_p)
    fol_p.add_argument("--bind", default=None,
                       help="ZMQ PULL bind address for host 0's stream")

    launch_p = sub.add_parser(
        "launch",
        help="multi-host placement: compute per-host env + argv from a "
             "hostfile and start host 0 + followers over ssh "
             "(parallel/launcher.py build_launch_plan; the Ray-placement "
             "replacement)")
    launch_p.add_argument("model")
    launch_p.add_argument("--hostfile", required=True,
                          help="file with one host per line; first line "
                               "= host 0 (frontend)")
    launch_p.add_argument("--ssh-cmd", default="ssh")
    launch_p.add_argument("--dry-run", action="store_true",
                          help="print the per-host commands instead of "
                               "spawning")
    launch_p.add_argument("engine_args", nargs=argparse.REMAINDER,
                          help="arguments forwarded to run/follower")

    warm_p = sub.add_parser(
        "warmup",
        help="build the engine, precompile its hot programs, and "
             "optionally export the XLA compile cache as a tarball for "
             "shipping to same-TPU-generation hosts (cold-start budget: "
             "a fresh host otherwise pays minutes of compiles before the "
             "first token)")
    EngineArgs.add_cli_args(warm_p)
    warm_p.add_argument("--export", dest="export_tar", default=None,
                        metavar="TAR",
                        help="after warming, tar the compile cache here")
    warm_p.add_argument("--import", dest="import_tar", default=None,
                        metavar="TAR",
                        help="before warming, untar a shipped cache into "
                             "this host's cache dir")
    warm_p.add_argument("--import-only", action="store_true",
                        help="only import the tarball; skip the engine "
                             "build (placement scripts warm lazily)")

    sub.add_parser("collect-env",
                   help="print environment info for bug reports "
                        "(reference: endpoints/cli/collect_env.py)")

    chat_p = sub.add_parser("openai", help="talk to a running server "
                            "(reference: endpoints/cli/openai.py)")
    chat_p.add_argument("mode", choices=["chat", "complete"])
    chat_p.add_argument("--url", default="http://localhost:2242/v1")
    chat_p.add_argument("--model-name", default=None)
    chat_p.add_argument("--system-prompt", default=None)
    chat_p.add_argument("-q", "--quick", default=None,
                        help="send one message and print the reply")

    args = parser.parse_args(argv)
    if args.cmd == "run":
        serve(args)
    elif args.cmd == "bench":
        bench(args)
    elif args.cmd == "collect-env":
        collect_env()
    elif args.cmd == "openai":
        openai_client(args)
    elif args.cmd == "follower":
        from aphrodite_tpu.engine.args import EngineArgs as _EA
        from aphrodite_tpu.parallel.control_plane import run_follower
        cfg = _EA.from_cli_args(args).create_engine_config()
        run_follower(cfg, bind_addr=args.bind)
    elif args.cmd == "launch":
        from aphrodite_tpu.parallel.launcher import launch
        with open(args.hostfile) as f:
            hosts = [ln.strip() for ln in f if ln.strip()
                     and not ln.lstrip().startswith("#")]
        extra = [a for a in args.engine_args if a != "--"]
        out = launch(hosts, args.model, extra, ssh_cmd=args.ssh_cmd,
                     dry_run=args.dry_run)
        if args.dry_run:
            for cmd in out:
                print(cmd)
        else:
            for proc in out:
                proc.wait()
    elif args.cmd == "run-batch":
        from aphrodite_tpu.engine.args import EngineArgs as _EA
        from aphrodite_tpu.entrypoints.run_batch import run_batch
        engine_args = _EA.from_cli_args(args)
        run_batch(engine_args.create_engine_config(),
                  args.served_model_name or engine_args.model,
                  args.input_file, args.output_file)
    elif args.cmd == "warmup":
        warmup(args)


def warmup(args) -> None:
    """Cold-start management (VERDICT r4 #7): precompile the engine's hot
    programs through the REAL engine loop, then optionally export the
    jax persistent-cache entries as a tarball. On a fresh same-generation
    host, `warmup --import cache.tar` (or --import-only in a placement
    script) turns minutes of first-request compiles into cache hits —
    the jax-level entries are host-portable because
    jax_persistent_cache_enable_xla_caches="none" keeps machine-specific
    XLA:CPU AOT artifacts out of the cache (worker.compile_cache_dir)."""
    import os
    import tarfile
    import time

    from aphrodite_tpu.engine.args import EngineArgs
    from aphrodite_tpu.worker.worker import compile_cache_dir

    cache_dir = compile_cache_dir()
    if args.import_tar:
        os.makedirs(cache_dir, exist_ok=True)
        t0 = time.time()
        with tarfile.open(args.import_tar) as tf:
            tf.extractall(cache_dir, filter="data")
        n = len(os.listdir(cache_dir))
        print(f"imported compile cache -> {cache_dir} "
              f"({n} entries, {time.time()-t0:.1f}s)")
        if args.import_only:
            return
    t0 = time.time()
    config = EngineArgs.from_cli_args(args).create_engine_config()
    from aphrodite_tpu.engine.llm_engine import LLMEngine
    engine = LLMEngine(config)
    t1 = time.time()
    engine.core.precompile()
    t2 = time.time()
    print(f"warmup: engine init {t1-t0:.1f}s + precompile {t2-t1:.1f}s "
          f"= {t2-t0:.1f}s total")
    if args.export_tar:
        with tarfile.open(args.export_tar, "w") as tf:
            tf.add(cache_dir, arcname=".")
        sz = os.path.getsize(args.export_tar) / 2**20
        print(f"exported compile cache ({sz:.0f} MiB) -> "
              f"{args.export_tar}")


def collect_env() -> None:
    """Environment report for bug filing (reference collect_env.py,
    trimmed to what matters for a JAX/TPU deployment)."""
    import importlib
    import platform

    print(f"OS               : {platform.platform()}")
    print(f"Python           : {sys.version.replace(chr(10), ' ')}")
    for mod in ("jax", "jaxlib", "numpy", "transformers", "safetensors",
                "aiohttp", "zmq", "flax", "optax"):
        try:
            m = importlib.import_module(mod)
            print(f"{mod:<17}: {getattr(m, '__version__', '?')}")
        except Exception as e:  # noqa: BLE001
            print(f"{mod:<17}: not importable ({type(e).__name__})")
    try:
        import jax
        print(f"jax backend      : {jax.default_backend()}")
        print(f"devices          : {jax.devices()}")
    except Exception as e:  # noqa: BLE001
        print(f"devices          : unavailable ({e})")
    import os
    flags = {k: v for k, v in os.environ.items()
             if k.startswith(("JAX_", "XLA_", "TPU_", "LIBTPU_"))}
    for k in sorted(flags):
        print(f"env {k}={flags[k]}")
    from aphrodite_tpu.envs import environment_report
    for line in environment_report():
        print(f"env {line}")


def openai_client(args) -> None:
    """Minimal interactive client against a running server."""
    import json as _json
    import urllib.request

    def post(path, payload):
        req = urllib.request.Request(
            args.url.rstrip("/") + path,
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return _json.loads(r.read())

    model = args.model_name
    if model is None:
        with urllib.request.urlopen(args.url.rstrip("/") + "/models") as r:
            model = _json.loads(r.read())["data"][0]["id"]

    history = []
    if args.system_prompt:
        history.append({"role": "system", "content": args.system_prompt})

    def ask(text):
        if args.mode == "chat":
            history.append({"role": "user", "content": text})
            out = post("/chat/completions",
                       {"model": model, "messages": history})
            reply = out["choices"][0]["message"]["content"]
            history.append({"role": "assistant", "content": reply})
        else:
            out = post("/completions", {"model": model, "prompt": text})
            reply = out["choices"][0]["text"]
        return reply

    if args.quick is not None:
        print(ask(args.quick))
        return
    try:
        while True:
            text = input("> ")
            if not text.strip():
                continue
            print(ask(text))
    except (EOFError, KeyboardInterrupt):
        pass


def bench(args) -> None:
    import asyncio
    import json

    if args.kind == "perf":
        # The repo-level regression bench (reference TPU CI workload).
        import os
        import subprocess
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.exit(subprocess.call(
            [sys.executable, os.path.join(root, "bench.py")]))

    from aphrodite_tpu.benchmarks.harness import (bench_latency,
                                                  bench_serve_async,
                                                  bench_throughput)
    from aphrodite_tpu.engine.args import EngineArgs
    engine_args = EngineArgs.from_cli_args(args)
    if args.kind == "serve":
        from aphrodite_tpu.engine.async_llm import AsyncLLM
        engine = AsyncLLM(engine_args.create_engine_config())

        async def run():
            return await bench_serve_async(
                engine, num_prompts=args.num_prompts,
                input_len=args.input_len, output_len=args.output_len,
                request_rate=args.request_rate)

        result = asyncio.run(run())
    else:
        from aphrodite_tpu.engine.llm_engine import LLMEngine
        from aphrodite_tpu.entrypoints.llm import LLM
        from aphrodite_tpu.utils import Counter
        llm = LLM.__new__(LLM)
        llm.engine = LLMEngine(engine_args.create_engine_config())
        llm._counter = Counter()
        if args.kind == "latency":
            result = bench_latency(llm,
                                   input_len=args.input_len,
                                   output_len=args.output_len,
                                   batch_size=args.batch_size,
                                   num_iters=args.num_iters)
        else:
            result = bench_throughput(llm, num_prompts=args.num_prompts,
                                      input_len=args.input_len,
                                      output_len=args.output_len)
    print(json.dumps(result, indent=2))


def serve(args) -> None:
    from aphrodite_tpu.engine.args import EngineArgs
    from aphrodite_tpu.server.api_server import run_server

    engine_args = EngineArgs.from_cli_args(args)
    config = engine_args.create_engine_config()
    run_server(config, args.served_model_name or engine_args.model,
               host=args.host, port=args.port,
               multiprocess=getattr(args, "multiprocess_engine", False),
               kobold_api=getattr(args, "launch_kobold_api", False),
               tool_parser=getattr(args, "tool_call_parser", "auto"),
               reasoning_parser=getattr(args, "reasoning_parser", "auto"))


if __name__ == "__main__":
    main()

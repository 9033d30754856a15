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

    bench_p = sub.add_parser("bench", help="run the builtin benchmark")
    bench_p.add_argument("bench_args", nargs="*")

    args = parser.parse_args(argv)
    if args.cmd == "run":
        serve(args)
    elif args.cmd == "bench":
        import subprocess
        import os
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.exit(subprocess.call(
            [sys.executable, os.path.join(root, "bench.py")]
            + args.bench_args))


def serve(args) -> None:
    from aphrodite_tpu.engine.args import EngineArgs
    from aphrodite_tpu.server.api_server import run_server

    engine_args = EngineArgs.from_cli_args(args)
    config = engine_args.create_engine_config()
    run_server(config, args.served_model_name or engine_args.model,
               host=args.host, port=args.port)


if __name__ == "__main__":
    main()

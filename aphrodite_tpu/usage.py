"""Anonymous usage reporting (reference: aphrodite/usage/usage_lib.py).

The reference POSTs an anonymous usage record to a stats endpoint from a
daemon thread at engine start. This environment has no egress, so the
record is written to ``~/.config/aphrodite_tpu/usage_stats.json`` (the
reference also keeps a local copy there); a deployment can ship its own
uploader reading that file.

Opt out with ``APHRODITE_TPU_NO_USAGE_STATS=1`` or ``DO_NOT_TRACK=1`` or by
creating ``~/.config/aphrodite_tpu/do_not_track``.
"""
from __future__ import annotations

import json
import os
import platform
import threading
import time
import uuid

from aphrodite_tpu.utils import logger

_DIR = os.path.expanduser(os.environ.get("APHRODITE_TPU_CONFIG_HOME",
                                         "~/.config/aphrodite_tpu"))


def usage_stats_enabled() -> bool:
    if os.environ.get("APHRODITE_TPU_NO_USAGE_STATS") == "1":
        return False
    if os.environ.get("DO_NOT_TRACK") == "1":
        return False
    return not os.path.exists(os.path.join(_DIR, "do_not_track"))


def _collect(model_arch: str, context: str, extras: dict) -> dict:
    record = {
        "uuid": str(uuid.uuid4()),
        "timestamp": time.time(),
        "context": context,            # LLM | OPENAI_API_SERVER
        "model_architecture": model_arch,
        "platform": platform.platform(),
        "python": platform.python_version(),
        "cpu_count": os.cpu_count(),
    }
    try:
        import jax
        devs = jax.devices()
        record["device"] = devs[0].platform
        record["device_kind"] = getattr(devs[0], "device_kind", "")
        record["num_devices"] = len(devs)
    except Exception:
        pass
    record.update(extras)
    return record


def report_usage(model_arch: str, context: str, extras: dict | None = None
                 ) -> None:
    """Fire-and-forget from a daemon thread; never blocks engine start."""
    if not usage_stats_enabled():
        return

    def run():
        try:
            record = _collect(model_arch, context, extras or {})
            os.makedirs(_DIR, exist_ok=True)
            path = os.path.join(_DIR, "usage_stats.json")
            with open(path, "a") as f:
                f.write(json.dumps(record) + "\n")
        except Exception as e:  # pragma: no cover
            logger.debug("usage reporting failed: %s", e)

    threading.Thread(target=run, daemon=True,
                     name="aphrodite-usage").start()

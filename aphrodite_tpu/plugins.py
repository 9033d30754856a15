"""Plugin loading (reference: aphrodite/plugins/__init__.py).

Third-party packages extend the engine by exposing entry points in the
``aphrodite_tpu.general_plugins`` group; each entry point resolves to a
zero-arg callable invoked once at engine start (typical use: calling
``aphrodite_tpu.models.registry.register_model`` for out-of-tree models).

``APHRODITE_TPU_PLUGINS`` (comma-separated names) restricts which plugins
load; unset loads everything.
"""
from __future__ import annotations

import os

from aphrodite_tpu.utils import logger

PLUGIN_GROUP = "aphrodite_tpu.general_plugins"
_loaded = False


def load_general_plugins(force: bool = False) -> list[str]:
    """Discover + invoke plugin entry points; returns loaded names."""
    global _loaded
    if _loaded and not force:
        return []
    _loaded = True
    allowed = os.environ.get("APHRODITE_TPU_PLUGINS")
    allow_list = ([p.strip() for p in allowed.split(",") if p.strip()]
                  if allowed is not None else None)
    from importlib.metadata import entry_points
    try:
        eps = entry_points(group=PLUGIN_GROUP)
    except TypeError:  # pragma: no cover - pre-3.10 select API
        eps = entry_points().get(PLUGIN_GROUP, [])
    loaded = []
    for ep in eps:
        if allow_list is not None and ep.name not in allow_list:
            logger.info("plugin %s skipped (APHRODITE_TPU_PLUGINS)", ep.name)
            continue
        try:
            func = ep.load()
            func()
            loaded.append(ep.name)
            logger.info("loaded plugin %s", ep.name)
        except Exception as e:  # one broken plugin must not kill the engine
            logger.warning("plugin %s failed to load: %s", ep.name, e)
    return loaded

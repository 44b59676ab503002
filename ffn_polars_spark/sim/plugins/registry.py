"""Plugin auto-discovery.

Parity: /root/reference/ffn_polars/sim/plugins/registry.py:8-26 — every
module in this directory exposing module-level ``name`` / ``type`` /
``apply`` registers itself. Uses ``pkgutil`` rather than directory listing so
it also works from zip/egg deployments on a cluster.
"""

from __future__ import annotations

import importlib
import pkgutil

PLUGIN_REGISTRY: dict = {}

_SKIP = {"base", "registry"}


def load_plugins() -> None:
    import ffn_polars_spark.sim.plugins as pkg

    for _, modname, ispkg in pkgutil.iter_modules(pkg.__path__):
        if ispkg or modname in _SKIP:
            continue
        module = importlib.import_module(f"ffn_polars_spark.sim.plugins.{modname}")
        if all(hasattr(module, a) for a in ("name", "type", "apply")):
            PLUGIN_REGISTRY[module.name] = module


load_plugins()

from ffn_polars_spark.sim.plugins.base import MicrostructurePlugin, PluginType
from ffn_polars_spark.sim.plugins.registry import PLUGIN_REGISTRY, load_plugins

__all__ = ["MicrostructurePlugin", "PluginType", "PLUGIN_REGISTRY", "load_plugins"]

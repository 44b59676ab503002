from ffn_polars_spark.utils.decorators import auto_alias
from ffn_polars_spark.utils.guardrails import (
    GuardMode,
    guard_input,
    set_guard_mode,
    validate_frame,
)

__all__ = ["auto_alias", "GuardMode", "guard_input", "set_guard_mode", "validate_frame"]

"""Input guard system — advisory dtype / column-name validation.

Port of the reference's guard layer (/root/reference/ffn_polars/utils/
guardrails.py:12-147) with the same three modes (WARN / STRICT / SILENT) and
the same checks (expected dtype, required name substring). One structural
difference: a Polars ``Expr`` carries ``meta.output_type()`` so the reference
validates unbound expressions; an unbound Spark ``Column`` exposes no dtype, so
dtype checks run only where a schema is in scope — at the DataFrame-level
operators (which pass ``_schema``) and via :func:`validate_frame`. Name
(substring) checks run whenever the root name is resolvable, matching the
reference's "could not be inspected" fallback (guardrails.py:52-54).
"""

from __future__ import annotations

import warnings
from enum import Enum, auto
from functools import wraps
from inspect import signature
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

from ffn_polars_spark.core import col_name, to_col


class GuardMode(Enum):
    WARN = auto()
    STRICT = auto()
    SILENT = auto()


GUARD_CONFIG = {"mode": GuardMode.WARN}


def set_guard_mode(mode: GuardMode) -> None:
    GUARD_CONFIG["mode"] = mode


def _guard_mode(strict: Optional[bool]) -> GuardMode:
    if strict is True:
        return GuardMode.STRICT
    if strict is False:
        return GuardMode.WARN
    return GUARD_CONFIG["mode"]


def _emit_guard(reason: str, param_name: str, root, dtype, override_mode=None) -> None:
    msg = f"[guard] Column '{root}' (param '{param_name}') {reason}."
    mode = override_mode or GUARD_CONFIG["mode"]
    if mode == GuardMode.STRICT:
        raise ValueError(msg)
    if mode == GuardMode.WARN:
        warnings.warn(msg, stacklevel=4)


_DTYPE_ALIASES = {
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "long": T.LongType(),
    "int64": T.LongType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}


def _normalize_dtype(dt) -> Optional[T.DataType]:
    if dt is None:
        return None
    if isinstance(dt, T.DataType):
        return dt
    if isinstance(dt, str):
        return _DTYPE_ALIASES.get(dt.lower())
    return None


def _dtype_ok(actual: T.DataType, expected: T.DataType) -> bool:
    # Datetime guard accepts DateType too (the reference casts Date->Datetime
    # inside temporal fns, expr/eod/temporal.py:50).
    if isinstance(expected, T.TimestampType) and isinstance(actual, (T.DateType, T.TimestampType)):
        return True
    # Tick timestamps are LongType epoch-ns by design (FIXTURES.md) — accept
    # them wherever the reference expected Datetime.
    if isinstance(expected, T.TimestampType) and isinstance(actual, T.LongType):
        return True
    if isinstance(expected, T.DoubleType) and isinstance(actual, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(expected, T.LongType) and isinstance(
        actual, (T.LongType, T.IntegerType, T.ShortType)
    ):
        return True
    return type(actual) is type(expected)


def _validate(
    value: Any,
    param: str,
    checks: dict,
    schema: Optional[T.StructType],
    override_mode: Optional[GuardMode],
) -> None:
    root = col_name(value)
    if root is None:
        # A computed Column exposes no root name in Spark (unlike a Polars
        # Expr, whose meta.root_names() resolves through expressions), so the
        # advisory checks structurally cannot apply here.  The reference warns
        # on this path (guardrails.py:52-54) because reaching it in Polars is
        # exceptional; in Spark every legitimate computed-expression argument
        # would hit it, and a warning users learn to ignore guards nothing —
        # stay silent and let downstream dtype errors surface naturally.
        return

    expected = _normalize_dtype(checks.get("expected_dtype"))
    if expected is not None and schema is not None and root in schema.fieldNames():
        actual = schema[root].dataType
        if not _dtype_ok(actual, expected):
            _emit_guard(
                f"has dtype {actual.simpleString()}, expected {expected.simpleString()}",
                param,
                root,
                actual,
                override_mode,
            )

    required = checks.get("required_substring")
    if required and required not in root:
        _emit_guard(
            f"name does not contain '{required}'",
            param,
            root,
            None,
            override_mode,
        )


def guard_input(
    param: str,
    *,
    expected_dtype=None,
    required_substring: Optional[str] = None,
    strict: Optional[bool] = None,
):
    """Decorator: validate + resolve one column-valued parameter.

    Resolves ``str`` arguments to Columns before the wrapped function runs
    (reference guardrails.py:124-126) and applies the advisory checks. Stacks
    like the reference's ``guard_expr``. The wrapped function may be given an
    optional ``_schema=StructType`` keyword by DataFrame-level callers to
    enable dtype validation; it is stripped before the call.
    """

    def decorator(func):
        if not hasattr(func, "_guard_checks"):
            func._guard_checks = []
            inner = func
        else:
            inner = func

        inner._guard_checks.append(
            {
                "param": param,
                "checks": {
                    "expected_dtype": expected_dtype,
                    "required_substring": required_substring,
                },
                "strict": strict,
            }
        )

        if getattr(func, "_guard_wrapped", False):
            return func

        @wraps(func)
        def wrapper(*args, **kwargs):
            schema = kwargs.pop("_schema", None)
            sig = signature(inner)
            param_names = [p for p in sig.parameters.keys()]
            bound = dict(zip(param_names, args))
            bound.update(kwargs)

            resolved_args = list(args)
            resolved_kwargs = dict(kwargs)

            for guard in getattr(inner, "_guard_checks", []):
                p = guard["param"]
                if p not in bound:
                    continue
                original = bound[p]
                if isinstance(original, (str, Column)):
                    _validate(
                        original,
                        p,
                        guard["checks"],
                        schema,
                        _guard_mode(guard["strict"]),
                    )
                    resolved = to_col(original)
                    idx = param_names.index(p)
                    if idx < len(resolved_args):
                        resolved_args[idx] = resolved
                    elif p in resolved_kwargs:
                        resolved_kwargs[p] = resolved

            return inner(*resolved_args, **resolved_kwargs)

        wrapper._guard_wrapped = True
        wrapper._guard_checks = inner._guard_checks
        return wrapper

    return decorator


def validate_frame(df: DataFrame, col: str, expected_dtype, *, strict: Optional[bool] = None) -> None:
    """Explicit schema-backed validation for DataFrame-level operators."""
    expected = _normalize_dtype(expected_dtype)
    if expected is None or col not in df.columns:
        return
    actual = df.schema[col].dataType
    if not _dtype_ok(actual, expected):
        _emit_guard(
            f"has dtype {actual.simpleString()}, expected {expected.simpleString()}",
            col,
            col,
            actual,
            _guard_mode(strict),
        )

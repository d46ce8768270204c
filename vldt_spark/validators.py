"""Validator decorators — the engine's user-extension (UDF) surface.

Reference parity: ``@field_validator(mode=BEFORE|AFTER)`` /
``@model_validator(mode=...)`` (/root/reference/vldt/validators.py:10-146);
registration buckets keyed field_before/field_after/model_before/model_after
(/root/reference/vldt/models.py:57-92). Field name is inferred from the 2nd
parameter name (validators.py:34) and arity is enforced (:30-33).

Spark mapping (SURVEY.md A17-A20, B15):
  field BEFORE → vectorized pandas UDF on the raw (pre-cast) column
  field AFTER  → vectorized pandas UDF on the validated column
  model BEFORE → mapInPandas over the whole batch before per-column checks
  model AFTER  → mapInPandas after checks (cross-field transforms)

``@check`` is the Spark-native declarative analogue of a model AFTER
validator used purely as an assertion: it returns a Catalyst boolean
``Column`` (True = valid) and never leaves the JVM.
"""

from __future__ import annotations

import enum
import inspect
from typing import Any, Callable


class Mode(enum.Enum):
    BEFORE = "before"
    AFTER = "after"


def field_validator(
    field: str | None = None, *, mode: Mode = Mode.AFTER, vectorized: bool = True
):
    """Register a per-field transform.

    ``fn`` receives and returns a ``pandas.Series`` when vectorized (the
    default; Arrow batches), else a scalar (wrapped into a pandas map —
    still batch-applied, never row-at-a-time Python in the plan).

    Two registration forms:

      * ``@field_validator("price")`` — explicit target; ``fn(series)``.
      * ``@field_validator(mode=...)`` — reference-parity form
        (/root/reference/vldt/validators.py:27-40): the target field is
        inferred from the name of the SECOND parameter and arity is
        enforced (exactly ``(cls, value)``, classmethod/staticmethod
        unwrapped); the value argument is the Series.
    """

    def deco(fn: Callable) -> Callable:
        actual = fn.__func__ if isinstance(fn, (classmethod, staticmethod)) else fn
        if field is None:
            params = list(inspect.signature(actual).parameters)
            if len(params) != 2:
                raise ValueError(
                    "Field validator must have exactly one field parameter "
                    "(aside from 'cls' or 'self')"
                )
            target = params[1]

            def adapter(series, _f=actual):
                return _f(None, series)

            adapter.__name__ = getattr(actual, "__name__", "field_validator")
            adapter.__module__ = getattr(actual, "__module__", __name__)
            if inspect.iscoroutinefunction(actual):
                async def adapter(value, _f=actual):  # noqa: F811 — async twin
                    return await _f(None, value)
                adapter.__name__ = getattr(actual, "__name__", "field_validator")
                adapter.__module__ = getattr(actual, "__module__", __name__)
            fn = adapter
        else:
            target = field
            fn = actual
        fn.__vldt_kind__ = "field"
        fn.__vldt_field__ = target
        fn.__vldt_mode__ = mode
        # an async fn is per-value by definition: awaited batch-concurrently
        # inside the Arrow UDF (A21 — the reference's async validators,
        # /root/reference/vldt/validators.py:81-146, adapted to batches:
        # one event loop per Arrow batch, asyncio.gather over its values,
        # so N external calls overlap instead of serializing)
        fn.__vldt_async__ = inspect.iscoroutinefunction(fn)
        fn.__vldt_vectorized__ = vectorized and not fn.__vldt_async__
        return fn

    return deco


def model_validator(*, mode: Mode = Mode.AFTER):
    """Register a whole-batch transform: ``fn(pdf: pandas.DataFrame) ->
    pandas.DataFrame``. Runs via mapInPandas (Arrow batches)."""

    def deco(fn: Callable) -> Callable:
        if len(inspect.signature(fn).parameters) != 1:
            raise TypeError("model validator must take exactly one argument (the batch DataFrame)")
        fn.__vldt_kind__ = "model"
        fn.__vldt_mode__ = mode
        fn.__vldt_async__ = inspect.iscoroutinefunction(fn)
        return fn

    return deco


def check(name: str | None = None, *, message: str | None = None):
    """Declarative cross-field constraint: ``fn(cols) -> Column`` where
    ``cols`` exposes model columns by attribute; must return a boolean
    Column, True = valid (SURVEY.md B10). Stays JVM-side."""

    def deco(fn: Callable) -> Callable:
        fn.__vldt_kind__ = "check"
        fn.__vldt_check_name__ = name or fn.__name__
        fn.__vldt_check_message__ = message
        return fn

    return deco


class Cols:
    """Attribute access proxy handed to @check functions."""

    def __init__(self, names: list[str]):
        from pyspark.sql import functions as F

        for n in names:
            setattr(self, n, F.col(n))


def collect_validators(cls) -> dict[str, list[Callable]]:
    """Walk the class (MRO order, parents first) and bucket decorated
    callables — mirrors DataModelMeta collection
    (/root/reference/vldt/models.py:57-92)."""
    buckets: dict[str, list[Callable]] = {
        "field_before": [],
        "field_after": [],
        "model_before": [],
        "model_after": [],
        "checks": [],
    }
    seen: set[str] = set()
    for klass in reversed(cls.__mro__):
        for attr_name, obj in vars(klass).items():
            fn = getattr(obj, "__func__", obj)
            kind = getattr(fn, "__vldt_kind__", None)
            if kind is None or attr_name in seen:
                continue
            seen.add(attr_name)
            if kind == "field":
                buckets[f"field_{fn.__vldt_mode__.value}"].append(fn)
            elif kind == "model":
                buckets[f"model_{fn.__vldt_mode__.value}"].append(fn)
            elif kind == "check":
                buckets["checks"].append(fn)
    return buckets

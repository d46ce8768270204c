"""Recursive coerce-and-check expression builder.

This is the Spark translation of the reference's central dispatcher
``validate_and_convert`` (/root/reference/src/validation/validation.cpp:199-240):
for each (source column, compiled TypeNode) pair it emits

  * a **coerced** Column of the target Spark type (``try_cast`` semantics ≙
    the reference's ``int(v)`` / ``str(v)`` coercion attempts,
    validation_primitives.cpp:63-178), and
  * a list of **violation** Columns, each ``array<struct<path,msg>>``,
    with reference-parity messages and dotted/indexed lineage paths
    (``field.0.sub`` — error_handling.hpp:60-95).

Everything is a Catalyst expression: higher-order functions
(``transform``/``filter`` with index lambdas) build per-element violation
paths without leaving the JVM. Containers fail fast internally (first
violation only, validation_containers.cpp:92-95) while fields collect-all
across the row (data_model.cpp:197-211) — mirrored via ``F.slice`` on the
container violation arrays.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vldt_spark.errors import (
    VIOLATIONS_TYPE,
    empty_violations,
    expected_type_msg,
    merge_violations,
    missing_required_msg,
    violation,
    violation_if,
)
from vldt_spark.fields import Field, UNDEFINED
from vldt_spark.typeschema import ContainerKind, TypeNode, py_name_of_spark, spark_type


def _lit_path(path: str) -> Column:
    return F.lit(path)


def _truthy(src: Column, src_dtype: T.DataType) -> Column:
    """Python ``bool(v)`` truthiness (reference A8,
    validation_primitives.cpp:160-178) — differs from cast("boolean")."""
    if isinstance(src_dtype, T.BooleanType):
        return src
    if isinstance(src_dtype, T.StringType):
        return F.length(src) > 0
    if isinstance(src_dtype, (T.ArrayType,)):
        return F.size(src) > 0
    if isinstance(src_dtype, T.MapType):
        return F.size(F.map_keys(src)) > 0
    if isinstance(src_dtype, T.NumericType):
        return src != F.lit(0)
    return src.isNotNull()


#: widenings that can never fail — cast directly, emit no violation check.
#: (reference fast-path isinstance checks, validation.cpp:104-106; int→float
#: promotion tests/test_vldt.py:578-595)
_INTEGRALS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONALS = (T.FloatType, T.DoubleType)


def _lossless(src_dtype: T.DataType, target: T.DataType) -> bool:
    if src_dtype == target:
        return True
    order = [T.ByteType, T.ShortType, T.IntegerType, T.LongType]
    if isinstance(src_dtype, tuple(order)) and isinstance(target, tuple(order)):
        return order.index(type(src_dtype)) <= order.index(type(target))
    if isinstance(src_dtype, _INTEGRALS + _FRACTIONALS) and isinstance(
        target, T.DoubleType
    ):
        return True
    if isinstance(src_dtype, T.FloatType) and isinstance(target, _FRACTIONALS):
        return True
    return False


def _scalar_coerce(
    src: Column, src_dtype: T.DataType, node: TypeNode, path: str, truthy_bool: bool
) -> tuple[Column, list[Column]]:
    target = spark_type(node)
    if src_dtype == target:
        return src, []
    if _lossless(src_dtype, target):
        return src.cast(target), []
    if isinstance(target, T.BooleanType) and truthy_bool:
        # bool(v) accepts nearly anything — no violation possible
        return F.when(src.isNull(), F.lit(None).cast("boolean")).otherwise(
            _truthy(src, src_dtype)
        ), []
    coerced = src.try_cast(target)
    viol = violation_if(
        src.isNotNull() & coerced.isNull(),
        path,
        expected_type_msg(node.py_name, py_name_of_spark(src_dtype)),
    )
    return coerced, [viol]


def _element_checks(
    coerced_arr: Column, node: TypeNode, fld: Field | None, path: str
) -> list[Column]:
    """Per-element range constraints with indexed lineage paths, e.g.
    ``tokens.17`` (SURVEY.md hard-part #1: transform+filter index lambdas)."""
    out: list[Column] = []
    if fld is None:
        return out
    conds = []
    if fld.element_ge is not None:
        conds.append(("element_ge", lambda x: x < F.lit(fld.element_ge),
                      f"Value out of range: expected >= {fld.element_ge}"))
    if fld.element_le is not None:
        conds.append(("element_le", lambda x: x > F.lit(fld.element_le),
                      f"Value out of range: expected <= {fld.element_le}"))
    for _, bad, msg in conds:
        marked = F.transform(
            coerced_arr,
            lambda x, i: F.when(
                x.isNotNull() & bad(x),
                violation(F.concat(F.lit(path + "."), i.cast("string")), F.lit(msg)),
            ),
        )
        found = F.filter(marked, lambda v: v.isNotNull()).cast(VIOLATIONS_TYPE)
        # fail fast within container (validation_containers.cpp:92-95)
        out.append(F.coalesce(F.slice(found, 1, 1), empty_violations()))
    return out


def build_value(
    src: Column,
    src_dtype: T.DataType,
    node: TypeNode,
    path: str,
    *,
    fld: Field | None = None,
    truthy_bool: bool = True,
) -> tuple[Column, list[Column]]:
    """Recursively coerce ``src`` (of ``src_dtype``) to ``node``'s Spark type,
    returning (coerced column, violation-array columns)."""
    target = spark_type(node)

    if node.is_any:
        # Any accepts anything, no conversion (validation.cpp:210-213);
        # stored canonically as string
        coerced = src if isinstance(src_dtype, T.StringType) else src.cast("string")
        return coerced, []

    if node.is_model:
        return _model_value(src, src_dtype, node, path, truthy_bool)

    if node.kind is ContainerKind.UNION:
        return _union_value(src, src_dtype, node, path, truthy_bool)

    if node.kind in (ContainerKind.LIST, ContainerKind.SET):
        return _list_value(src, src_dtype, node, path, fld, truthy_bool)

    if node.kind is ContainerKind.DICT:
        return _dict_value(src, src_dtype, node, path, truthy_bool)

    if node.kind is ContainerKind.TUPLE:
        return _tuple_value(src, src_dtype, node, path, truthy_bool)

    return _scalar_coerce(src, src_dtype, node, path, truthy_bool)


def _list_value(src, src_dtype, node, path, fld, truthy_bool):
    target = spark_type(node)
    if not isinstance(src_dtype, T.ArrayType):
        kind = "list" if node.kind is ContainerKind.LIST else "set"
        viol = violation_if(
            src.isNotNull(),
            path,
            f"Expected a {kind}, got {py_name_of_spark(src_dtype)}",
        )
        return F.lit(None).cast(target), [viol]

    inner = node.args[0]
    inner_target = spark_type(inner)
    viols: list[Column] = []
    if src_dtype.elementType == inner_target or inner.is_any:
        coerced = src
    elif _lossless(src_dtype.elementType, inner_target):
        coerced = F.transform(src, lambda x: x.cast(inner_target))
    elif inner.kind is ContainerKind.NONE and not inner.is_model:
        coerced = F.transform(src, lambda x: x.try_cast(inner_target))
        msg = expected_type_msg(inner.py_name, py_name_of_spark(src_dtype.elementType))
        marked = F.transform(
            src,
            lambda x, i: F.when(
                x.isNotNull() & x.try_cast(inner_target).isNull(),
                violation(F.concat(F.lit(path + "."), i.cast("string")), F.lit(msg)),
            ),
        )
        found = F.filter(marked, lambda v: v.isNotNull()).cast(VIOLATIONS_TYPE)
        viols.append(F.coalesce(F.slice(found, 1, 1), empty_violations()))
    else:
        # nested containers/models inside lists: cast wholesale (schema-on-read
        # guarantees shape for parquet sources); deep per-element recursion of
        # struct elements happens via explode-based checks in engine extras
        coerced = src.cast(target)

    viols.extend(_element_checks(coerced, node, fld, path))

    if node.kind is ContainerKind.SET:
        # set invariant: no duplicate elements (SURVEY.md A13)
        viols.append(
            violation_if(
                src.isNotNull() & (F.size(F.array_distinct(coerced)) != F.size(coerced)),
                path,
                "Duplicate elements in set",
            )
        )
    if fld is not None and fld.min_size is not None:
        viols.append(
            violation_if(
                src.isNotNull() & (F.size(coerced) < fld.min_size),
                path,
                f"Expected at least {fld.min_size} elements",
            )
        )
    if fld is not None and fld.max_size is not None:
        viols.append(
            violation_if(
                src.isNotNull() & (F.size(coerced) > fld.max_size),
                path,
                f"Expected at most {fld.max_size} elements",
            )
        )
    return coerced, viols


def _dict_value(src, src_dtype, node, path, truthy_bool):
    target = spark_type(node)
    if not isinstance(src_dtype, T.MapType):
        viol = violation_if(
            src.isNotNull(), path, f"Expected a dict, got {py_name_of_spark(src_dtype)}"
        )
        return F.lit(None).cast(target), [viol]
    knode, vnode = node.args
    ktarget, vtarget = spark_type(knode), spark_type(vnode)
    viols: list[Column] = []
    needs_cast = src_dtype.keyType != ktarget or src_dtype.valueType != vtarget
    if needs_cast:
        coerced = src.cast(target)
        # value-type violations with field.<key> paths
        # (validation_containers.cpp:115-172)
        if src_dtype.valueType != vtarget and not vnode.is_any:
            msg = expected_type_msg(vnode.py_name, py_name_of_spark(src_dtype.valueType))
            marked = F.transform(
                F.map_entries(src),
                lambda e: F.when(
                    e["value"].isNotNull() & e["value"].try_cast(vtarget).isNull(),
                    violation(
                        F.concat(F.lit(path + "."), e["key"].cast("string")), F.lit(msg)
                    ),
                ),
            )
            found = F.filter(marked, lambda v: v.isNotNull()).cast(VIOLATIONS_TYPE)
            viols.append(F.coalesce(F.slice(found, 1, 1), empty_violations()))
    else:
        coerced = src
    return coerced, viols


def _tuple_value(src, src_dtype, node, path, truthy_bool):
    target = spark_type(node)  # StructType(_0.._n)
    n = node.tuple_arity or len(node.args)
    if isinstance(src_dtype, T.ArrayType):
        # arity check: "Expected tuple of length n, got m"
        # (validation_containers.cpp:201)
        arity_viol = F.when(
            src.isNotNull() & (F.size(src) != n),
            F.array(
                violation(
                    _lit_path(path),
                    F.concat(
                        F.lit(f"Expected tuple of length {n}, got "),
                        F.size(src).cast("string"),
                    ),
                )
            ),
        ).otherwise(empty_violations())
        parts, viols = [], [arity_viol]
        for i, sub in enumerate(node.args):
            el = F.element_at(src, i + 1)
            c, v = build_value(
                el, src_dtype.elementType, sub, f"{path}.{i}", truthy_bool=truthy_bool
            )
            parts.append(c.alias(f"_{i}"))
            viols.extend(v)
        coerced = F.when(src.isNull(), F.lit(None).cast(target)).otherwise(
            F.struct(*parts)
        )
        return coerced, viols
    if isinstance(src_dtype, T.StructType):
        parts, viols = [], []
        for i, sub in enumerate(node.args):
            fname = src_dtype.names[i] if i < len(src_dtype.names) else f"_{i}"
            c, v = build_value(
                src[fname], src_dtype[fname].dataType, sub, f"{path}.{i}",
                truthy_bool=truthy_bool,
            )
            parts.append(c.alias(f"_{i}"))
            viols.extend(v)
        coerced = F.when(src.isNull(), F.lit(None).cast(target)).otherwise(
            F.struct(*parts)
        )
        return coerced, viols
    viol = violation_if(
        src.isNotNull(), path, f"Expected a tuple, got {py_name_of_spark(src_dtype)}"
    )
    return F.lit(None).cast(target), [viol]


def _model_value(src, src_dtype, node, path, truthy_bool):
    """Nested model: recursive expansion with dotted lineage
    (validation.cpp:64-84 re-parents nested errors under ``outer.``)."""
    model = node.model_cls
    compiled = model.__vldt_compile__()
    target = compiled.struct
    if not isinstance(src_dtype, T.StructType):
        viol = violation_if(
            src.isNotNull(),
            path,
            expected_type_msg(model.__name__, py_name_of_spark(src_dtype)),
        )
        return F.lit(None).cast(target), [viol]
    parts, viols = [], []
    for spec in compiled.fields:
        sub_path = f"{path}.{spec.name}"
        # alias probing inside nested structs (data_model.cpp:172-190)
        src_name = None
        for cand in spec.field.aliases + [spec.name]:
            if cand in src_dtype.names:
                src_name = cand
                break
        if src_name is None:
            if spec.field.has_default:
                d = spec.field.resolve_default()
                parts.append(F.lit(d).cast(spec.dtype).alias(spec.name))
            elif spec.node.is_optional:
                parts.append(F.lit(None).cast(spec.dtype).alias(spec.name))
            else:
                parts.append(F.lit(None).cast(spec.dtype).alias(spec.name))
                viols.append(
                    violation_if(src.isNotNull(), sub_path, missing_required_msg())
                )
            continue
        c, v = build_value(
            src[src_name],
            src_dtype[src_name].dataType,
            spec.node,
            sub_path,
            fld=spec.field,
            truthy_bool=truthy_bool,
        )
        c = _apply_default_and_required(c, src[src_name], spec, sub_path, v, outer=src)
        parts.append(c.alias(spec.name))
        viols.extend(v)
    coerced = F.when(src.isNull(), F.lit(None).cast(target)).otherwise(F.struct(*parts))
    return coerced, viols


def _apply_default_and_required(coerced, raw_src, spec, path, viols_out, outer=None):
    """Default resolution + required-null violation
    (data_model.cpp:192-212 steps 2-5)."""
    if spec.field.has_default:
        d = spec.field.resolve_default()
        coerced = F.coalesce(coerced, F.lit(d).cast(spec.dtype))
    elif not spec.node.is_optional:
        cond = raw_src.isNull()
        if outer is not None:
            cond = outer.isNotNull() & cond
        viols_out.append(
            violation_if(cond, path, expected_type_msg(spec.node.py_name, "NoneType"))
        )
    return coerced


def _union_value(src, src_dtype, node, path, truthy_bool):
    """Ordered union resolution: isinstance scan then conversion attempts in
    declared order, first success wins (validation_containers.cpp:297-326,
    order-sensitivity tests/test_vldt.py:786-818) → ordered coalesce."""
    target = spark_type(node)
    candidates = []
    for sub in node.args:
        sub_target = spark_type(sub)
        if src_dtype == sub_target:
            # isinstance fast-path: exact type match wins immediately
            return (src if target == src_dtype else src.cast(target)), []
    any_ok = None
    for sub in node.args:
        sub_target = spark_type(sub)
        attempt = src.try_cast(sub_target)
        ok = attempt.isNotNull()
        candidates.append((attempt, ok))
        any_ok = ok if any_ok is None else (any_ok | ok)
    # canonical storage: first-success coerced to the union storage type
    expr = F.lit(None).cast(target)
    for attempt, ok in reversed(candidates):
        expr = F.when(ok, attempt.cast(target)).otherwise(expr)
    names = " | ".join(a.py_name for a in node.args)
    viol = violation_if(
        src.isNotNull() & ~any_ok,
        path,
        expected_type_msg(names, py_name_of_spark(src_dtype)),
    )
    return expr, [viol]


def scalar_constraints(coerced: Column, fld: Field, path: str, dtype: T.DataType) -> list[Column]:
    """Declarative B9 constraints (range/regex/isin) → violation arrays."""
    out: list[Column] = []
    nn = coerced.isNotNull()
    if fld.ge is not None:
        out.append(violation_if(nn & (coerced < F.lit(fld.ge)), path,
                                f"Value out of range: expected >= {fld.ge}"))
    if fld.gt is not None:
        out.append(violation_if(nn & (coerced <= F.lit(fld.gt)), path,
                                f"Value out of range: expected > {fld.gt}"))
    if fld.le is not None:
        out.append(violation_if(nn & (coerced > F.lit(fld.le)), path,
                                f"Value out of range: expected <= {fld.le}"))
    if fld.lt is not None:
        out.append(violation_if(nn & (coerced >= F.lit(fld.lt)), path,
                                f"Value out of range: expected < {fld.lt}"))
    if fld.regex is not None:
        out.append(violation_if(nn & ~coerced.rlike(fld.regex), path,
                                f"Value does not match pattern {fld.regex}"))
    if fld.isin is not None:
        out.append(violation_if(nn & ~coerced.isin(fld.isin), path,
                                "Value not in allowed set"))
    if fld.not_null:
        out.append(violation_if(~nn, path, missing_required_msg()))
    if fld.min_size is not None and isinstance(dtype, T.StringType):
        out.append(violation_if(nn & (F.length(coerced) < fld.min_size), path,
                                f"Expected at least {fld.min_size} characters"))
    if fld.max_size is not None and isinstance(dtype, T.StringType):
        out.append(violation_if(nn & (F.length(coerced) > fld.max_size), path,
                                f"Expected at most {fld.max_size} characters"))
    return out

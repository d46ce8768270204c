"""Type-expression compiler: Python ``typing`` expressions → Spark DataTypes.

Reference parity: each annotation compiles once into a recursive
``TypeSchema{expected_type, origin, args[], is_optional, container_kind}``
(/root/reference/src/schema/schema.hpp:43-55, schema.cpp:199-327) cached on
the class. Here the same walk happens driver-side, once per model class,
producing a ``TypeNode`` tree that maps to Spark ``DataType``s:

    int   → LongType        List[T]     → ArrayType(T)
    str   → StringType      Dict[K, V]  → MapType(K, V)
    float → DoubleType      Tuple[...]  → StructType(positional _0.._n)
    bool  → BooleanType     Set[T]      → ArrayType(T) + distinct invariant
    Optional[T] → nullable  Union[...]  → ordered-resolution variants
    nested Model → StructType (recursive)
    datetime → TimestampType, UUID/arbitrary classes → StringType + checks

Container kinds mirror the reference enum (schema.hpp:20-27).
"""

from __future__ import annotations

import datetime as _dt
import typing
import uuid as _uuid
from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any

from pyspark.sql import types as T


class ContainerKind(Enum):
    NONE = "none"
    LIST = "list"
    DICT = "dict"
    TUPLE = "tuple"
    SET = "set"
    UNION = "union"


#: python-type-name strings used in reference error text
#: ("Expected type int, got str" — validation_primitives.cpp:63-178)
PY_TYPE_NAMES = {
    int: "int",
    str: "str",
    float: "float",
    bool: "bool",
    type(None): "NoneType",
    _dt.datetime: "datetime",
    _dt.date: "date",
    _uuid.UUID: "UUID",
    bytes: "bytes",
    Any: "Any",
}


@dataclass
class TypeNode:
    """Compiled type expression (reference TypeSchema analogue)."""

    py_type: Any
    kind: ContainerKind = ContainerKind.NONE
    args: list["TypeNode"] = dc_field(default_factory=list)
    is_optional: bool = False
    is_any: bool = False
    is_model: bool = False
    model_cls: Any = None
    tuple_arity: int | None = None

    @property
    def py_name(self) -> str:
        if self.is_model:
            return self.model_cls.__name__
        if self.kind is ContainerKind.LIST:
            return "list"
        if self.kind is ContainerKind.DICT:
            return "dict"
        if self.kind is ContainerKind.TUPLE:
            return "tuple"
        if self.kind is ContainerKind.SET:
            return "set"
        if self.kind is ContainerKind.UNION:
            return " | ".join(a.py_name for a in self.args)
        return PY_TYPE_NAMES.get(self.py_type, getattr(self.py_type, "__name__", str(self.py_type)))


_PRIMITIVE_SPARK = {
    int: T.LongType(),
    str: T.StringType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
    bytes: T.BinaryType(),
    _uuid.UUID: T.StringType(),  # UUID as string + regex constraint (SURVEY §1.2)
}

UUID_REGEX = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def _is_model_cls(tp: Any) -> bool:
    from vldt_spark.model import Model

    return isinstance(tp, type) and issubclass(tp, Model) and tp is not Model


def compile_type(tp: Any) -> TypeNode:
    """Recursively compile a typing expression to a TypeNode.

    Mirrors compile_type_schema (/root/reference/src/schema/schema.cpp:199-327):
    unions flatten NoneType into ``is_optional``; declared candidate order is
    preserved for ordered union resolution (validation_containers.cpp:297-326).
    """
    if tp is Any:
        return TypeNode(py_type=Any, is_any=True, is_optional=True)
    if tp is None or tp is type(None):
        return TypeNode(py_type=type(None), is_optional=True)

    origin = typing.get_origin(tp)
    args = typing.get_args(tp)

    if origin is None:
        if _is_model_cls(tp):
            return TypeNode(py_type=tp, is_model=True, model_cls=tp)
        return TypeNode(py_type=tp)

    if origin in (typing.Union, getattr(__import__("types"), "UnionType", ())):
        non_none = [a for a in args if a is not type(None)]
        optional = len(non_none) < len(args)
        if len(non_none) == 1:
            node = compile_type(non_none[0])
            node.is_optional = node.is_optional or optional
            return node
        return TypeNode(
            py_type=tp,
            kind=ContainerKind.UNION,
            args=[compile_type(a) for a in non_none],
            is_optional=optional,
        )

    if origin in (list, typing.List):
        inner = compile_type(args[0]) if args else TypeNode(py_type=Any, is_any=True)
        return TypeNode(py_type=list, kind=ContainerKind.LIST, args=[inner])
    if origin in (set, frozenset, typing.Set):
        inner = compile_type(args[0]) if args else TypeNode(py_type=Any, is_any=True)
        return TypeNode(py_type=set, kind=ContainerKind.SET, args=[inner])
    if origin in (dict, typing.Dict):
        k = compile_type(args[0]) if args else TypeNode(py_type=str)
        v = compile_type(args[1]) if len(args) > 1 else TypeNode(py_type=Any, is_any=True)
        return TypeNode(py_type=dict, kind=ContainerKind.DICT, args=[k, v])
    if origin in (tuple, typing.Tuple):
        if len(args) == 2 and args[1] is Ellipsis:
            inner = compile_type(args[0])
            return TypeNode(py_type=tuple, kind=ContainerKind.LIST, args=[inner])
        return TypeNode(
            py_type=tuple,
            kind=ContainerKind.TUPLE,
            args=[compile_type(a) for a in args],
            tuple_arity=len(args),
        )

    # typing.Annotated and friends: unwrap to the first arg
    if args:
        return compile_type(args[0])
    return TypeNode(py_type=origin)


def spark_type(node: TypeNode) -> T.DataType:
    """TypeNode → Spark DataType (SURVEY.md Table A3)."""
    if node.is_any:
        return T.StringType()
    if node.is_model:
        return node.model_cls.__vldt_struct__()
    if node.kind is ContainerKind.LIST or node.kind is ContainerKind.SET:
        return T.ArrayType(spark_type(node.args[0]), containsNull=node.args[0].is_optional)
    if node.kind is ContainerKind.DICT:
        return T.MapType(
            spark_type(node.args[0]),
            spark_type(node.args[1]),
            valueContainsNull=node.args[1].is_optional,
        )
    if node.kind is ContainerKind.TUPLE:
        return T.StructType(
            [
                T.StructField(f"_{i}", spark_type(a), nullable=a.is_optional)
                for i, a in enumerate(node.args)
            ]
        )
    if node.kind is ContainerKind.UNION:
        # union-of-models stored as a TYPED variant struct (declared-order
        # resolution, A14): ``__variant`` carries the winning model's name
        # and exactly one ``as_<Model>`` struct is non-null — callers select
        # the winner's fields columnar, no re-parsing (the round-2 JSON-tag
        # representation required json_tuple on every access)
        if any(a.is_model for a in node.args):
            # MIXED unions (Union[Model, int, ...]) get scalar arms too
            # (``as_int`` etc.) so every declared branch has a typed slot;
            # previously scalar branches were silently dropped and a scalar
            # source crashed at plan time casting to the struct
            fields = [T.StructField("__variant", T.StringType(), True)]
            for a in node.args:
                if a.is_model:
                    fields.append(
                        T.StructField(
                            f"as_{a.model_cls.__name__}",
                            a.model_cls.__vldt_struct__(),
                            True,
                        )
                    )
                else:
                    fields.append(
                        T.StructField(f"as_{a.py_name}", spark_type(a), True)
                    )
            names = [f.name for f in fields]
            if len(set(names)) != len(names):
                dupes = sorted({n for n in names if names.count(n) > 1})
                raise ValueError(
                    "Union arms must map to distinct variant slots; "
                    f"duplicate arm name(s) {dupes} (e.g. two container "
                    "branches both named 'list'). Wrap one branch in its "
                    "own Model, or collapse the branches."
                )
            return T.StructType(fields)
        # scalar union stored as the first candidate's type when homogeneous
        # after coercion; heterogeneous unions stored as string with ordered
        # try_cast resolution at check time (SURVEY.md A14)
        first = spark_type(node.args[0])
        if all(spark_type(a) == first for a in node.args[1:]):
            return first
        return T.StringType()
    st = _PRIMITIVE_SPARK.get(node.py_type)
    if st is not None:
        return st
    # arbitrary classes: isinstance pass-through / one-arg ctor coercion in
    # the reference (validation.cpp:100-151) → string column + checks here
    return T.StringType()


#: spark simple-type string → python type name, for "got <T>" messages.
_SPARK_TO_PY = {
    T.LongType(): "int",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.StringType(): "str",
    T.DoubleType(): "float",
    T.FloatType(): "float",
    T.BooleanType(): "bool",
    T.TimestampType(): "datetime",
    T.DateType(): "date",
    T.BinaryType(): "bytes",
}


def py_name_of_spark(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.MapType):
        return "dict"
    if isinstance(dt, T.StructType):
        return "dict"
    if isinstance(dt, T.DecimalType):
        return "float"
    return _SPARK_TO_PY.get(dt, dt.simpleString())

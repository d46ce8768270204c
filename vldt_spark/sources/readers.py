"""Typed readers (reference entry points from_dict/from_json, A22/A24).

``from_json`` in the reference parses with rapidjson then constructs the
model (/root/reference/src/conversion/json_utils.cpp:160-224); parse errors
raise ``ValueError`` with the byte offset. Here malformed input never
raises — it becomes a ``_corrupt_record`` violation row, keeping the
whole-table pass total (SURVEY.md A24).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vldt_spark.model import Model


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table (TESTDATA.md layout)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_json_validated(
    spark: SparkSession, path_or_df, model: type[Model]
) -> DataFrame:
    """JSON source → permissive parse against the model schema; malformed
    records carry a ``_corrupt_record`` and fail validation instead of
    raising. Accepts a path or a DataFrame with one string column."""
    from pyspark.sql import types as T

    base = model.spark_schema()
    # copy — StructType.add mutates in place and base is the model's cached
    # compiled schema
    schema = T.StructType(
        list(base.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    if isinstance(path_or_df, str):
        return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path_or_df)
    (col,) = path_or_df.columns
    parsed = path_or_df.select(
        F.from_json(
            F.col(col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r")
    )
    return parsed.select("r.*")


def read_csv_validated(
    spark: SparkSession,
    path: str,
    model: type[Model],
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source with the same never-raise contract as ``read_json_validated``:
    rows that fail schema parse carry ``_corrupt_record`` (PERMISSIVE mode)
    and become violations in the validation pass instead of aborting the
    scan. Column pruning and filter pushdown still apply to the typed
    columns (Spark's CSV datasource supports both)."""
    from pyspark.sql import types as T

    base = model.spark_schema()
    schema = T.StructType(
        list(base.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_orc_validated(
    spark: SparkSession, path: str, model: type[Model]
) -> DataFrame:
    """ORC source aligned to a model schema with the same never-raise
    contract as the CSV/JSON readers.  ORC is self-describing, so there
    is no PERMISSIVE corrupt-record mode — schema drift shows up as
    missing/mistyped COLUMNS, not unparseable rows.  This reader:

    - selects the model's fields in model order (extra file columns are
      pruned at the scan — ORC supports column pruning + predicate
      pushdown like parquet);
    - fills fields absent from the file with typed NULLs, which the
      validation pass then reports as not-null violations with lineage
      (instead of an AnalysisException aborting the job);
    - casts losslessly-mismatched columns (e.g. int32 file vs int64
      model) so the fused pass sees the declared types.

    Case-insensitive name matching, mirroring Spark's resolution rules.
    """
    base = model.spark_schema()
    df = spark.read.orc(path)
    by_lower = {f.name.lower(): f for f in df.schema.fields}
    cols = []
    for field in base.fields:
        src = by_lower.get(field.name.lower())
        if src is None:
            cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
        elif src.dataType == field.dataType:
            cols.append(F.col(src.name).alias(field.name))
        else:
            cols.append(
                F.col(src.name).cast(field.dataType).alias(field.name)
            )
    return df.select(*cols)


def corrupt_record_offsets(
    df: DataFrame, *, record_col: str = "_corrupt_record"
) -> DataFrame:
    """Best-effort parse-error positions for corrupt JSON records.

    The reference's ``from_json`` raises ``ValueError`` with the byte
    offset of the parse failure
    (/root/reference/src/conversion/json_utils.cpp:166-180); Spark's
    PERMISSIVE mode only hands back the raw record. This recovers the
    offset by re-parsing ONLY the (rare) corrupt rows in an Arrow-batched
    stage — the happy path never leaves the JVM. Adds
    ``_corrupt_offset: int`` (null for clean rows) and
    ``_corrupt_msg: string`` shaped like the reference's error text."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def _offset(s):
        import json as _json

        import pandas as pd

        def pos(v):
            if v is None:
                return None
            try:
                _json.loads(v)
                return None  # parsed after all (e.g. schema mismatch only)
            except _json.JSONDecodeError as e:
                return e.pos
            except Exception:
                return 0

        return s.map(pos).astype("Int32")

    out = df.withColumn(
        "_corrupt_offset",
        F.when(F.col(record_col).isNotNull(), _offset(F.col(record_col))),
    )
    return out.withColumn(
        "_corrupt_msg",
        F.when(
            F.col(record_col).isNotNull(),
            F.concat(
                F.lit("JSON parse error at offset "),
                F.coalesce(F.col("_corrupt_offset").cast("string"), F.lit("?")),
            ),
        ),
    )


#: python type → Spark DataType classes, for type-keyed serializer lookup
#: (reference ``Config(dict_serializer={type: fn})`` keys on the runtime
#: Python type; columns key on their Spark type here). Module-level: the
#: lookup runs once per schema node per hook on every sink call.
def _build_py_type_table():
    import datetime as _dt

    from pyspark.sql import types as T

    return {
        float: (T.DoubleType, T.FloatType),
        int: (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
        str: (T.StringType,),
        bool: (T.BooleanType,),
        bytes: (T.BinaryType,),
        _dt.datetime: (T.TimestampType,),
        _dt.date: (T.DateType,),
    }


_PY_TYPE_TABLE = _build_py_type_table()


def _type_matches(py_type, dtype) -> bool:
    from pyspark.sql import types as T

    if isinstance(py_type, T.DataType):
        return dtype == py_type
    kinds = _PY_TYPE_TABLE.get(py_type)
    return kinds is not None and isinstance(dtype, kinds)


def _serialize_node(col, dtype, hooks):
    """Recursive node-wise serializer application (reference
    ``convert_to_dict`` consults the type-keyed serializer FIRST at every
    node, then recurses into models/lists/dicts/tuples,
    /root/reference/src/conversion/dict_utils.cpp:244-282). A matching
    hook claims the node — no recursion below it, exactly like the
    reference's early return."""
    from pyspark.sql import types as T

    for py_type, fn in hooks.items():
        if _type_matches(py_type, dtype):
            return fn(col)
    if isinstance(dtype, T.StructType):
        rebuilt = F.struct(
            *[
                _serialize_node(col[f.name], f.dataType, hooks).alias(f.name)
                for f in dtype.fields
            ]
        )
        return F.when(col.isNotNull(), rebuilt)
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            col, lambda x: _serialize_node(x, dtype.elementType, hooks)
        )
    if isinstance(dtype, T.MapType):
        return F.transform_values(
            col, lambda _k, v: _serialize_node(v, dtype.valueType, hooks)
        )
    return col


def _needs_recursion(dtype, hooks) -> bool:
    """Skip the rebuild entirely for columns no hook can touch — the
    serializer pass must not rewrite untouched columns (extra expressions
    for nothing, and a struct rebuild drops nothing but costs projection
    width)."""
    from pyspark.sql import types as T

    for py_type in hooks:
        if _type_matches(py_type, dtype):
            return True
    if isinstance(dtype, T.StructType):
        return any(_needs_recursion(f.dataType, hooks) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        return _needs_recursion(dtype.elementType, hooks)
    if isinstance(dtype, T.MapType):
        return _needs_recursion(dtype.valueType, hooks)
    return False


def _hooked_cols(
    df: DataFrame,
    exclude: tuple[str, ...],
    serializers: dict,
    type_serializers: dict,
) -> list:
    """Shared hook-dispatch for the dict and json sinks: name-keyed hooks
    win over type-keyed ones; columns no hook can reach pass through
    untouched (one resolution here so the two sinks can never disagree)."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for c in df.columns:
        if c in exclude:
            continue
        if c in serializers:
            expr = serializers[c](F.col(c)).alias(c)
        elif type_serializers and _needs_recursion(dtypes[c], type_serializers):
            expr = _serialize_node(F.col(c), dtypes[c], type_serializers).alias(c)
        else:
            expr = F.col(c)
        cols.append(expr)
    return cols


def to_dict_rows(
    df: DataFrame,
    *,
    exclude: tuple[str, ...] = ("violations", "is_valid"),
    serializers: dict | None = None,
    type_serializers: dict | None = None,
) -> DataFrame:
    """Dict-output sink (reference to_dict, A23): canonical schema-ordered
    columns with serializer hooks. Two hook flavors, mirroring the
    reference's ``Config(dict_serializer={type: fn})`` consulted at every
    node of to_dict (/root/reference/src/conversion/dict_utils.cpp:203-282):

      * ``serializers``: column-NAME-keyed, applied to top-level columns;
      * ``type_serializers``: TYPE-keyed (python type or Spark DataType →
        Column fn), applied RECURSIVELY at every node — values inside
        nested structs/arrays/maps included, reference parity for
        tests/test_dict.py:172-177.

    Everything stays a Catalyst projection (struct rebuild / transform /
    transform_values) — no Python in the row path. Unlike ``to_json_rows``
    the output stays columnar (one column per field), ready for
    ``.toPandas()`` / ``collect`` → dicts."""
    cols = _hooked_cols(df, exclude, serializers or {}, type_serializers or {})
    return df.select(*cols)


def to_json_rows(
    df: DataFrame,
    *,
    exclude: tuple[str, ...] = ("violations", "is_valid"),
    serializers: dict | None = None,
    type_serializers: dict | None = None,
) -> DataFrame:
    """Serialization sink (reference to_json, A25): canonical field order is
    the schema order, matching to_dict's schema-ordered output
    (/root/reference/src/conversion/dict_utils.cpp:203-242).

    ``serializers`` maps column name → Column-expression factory, the Spark
    analogue of the reference's ``Config(json_serializer={type: fn})`` hook
    (json_utils.cpp:53-148): the custom expression is consulted before the
    default encoding, e.g. ``{"registered_at": lambda c: F.date_format(c,
    "yyyy-MM-dd")}``. ``type_serializers`` applies TYPE-keyed hooks
    recursively through nested structs/arrays/maps, same contract as
    ``to_dict_rows``."""
    cols = _hooked_cols(df, exclude, serializers or {}, type_serializers or {})
    return df.select(F.to_json(F.struct(*cols)).alias("json"))

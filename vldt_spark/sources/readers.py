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


def to_dict_rows(
    df: DataFrame,
    *,
    exclude: tuple[str, ...] = ("violations", "is_valid"),
    serializers: dict | None = None,
) -> DataFrame:
    """Dict-output sink (reference to_dict, A23): canonical schema-ordered
    columns with per-column serializer hooks — the Spark analogue of the
    reference consulting ``Config(dict_serializer={type: fn})`` at every
    node of to_dict (/root/reference/src/conversion/dict_utils.cpp:203-282).
    Unlike ``to_json_rows`` the output stays columnar (one column per
    field), ready for ``.toPandas()`` / ``collect`` → dicts."""
    serializers = serializers or {}
    cols = []
    for c in df.columns:
        if c in exclude:
            continue
        expr = serializers[c](F.col(c)).alias(c) if c in serializers else F.col(c)
        cols.append(expr)
    return df.select(*cols)


def to_json_rows(
    df: DataFrame,
    *,
    exclude: tuple[str, ...] = ("violations", "is_valid"),
    serializers: dict | None = None,
) -> DataFrame:
    """Serialization sink (reference to_json, A25): canonical field order is
    the schema order, matching to_dict's schema-ordered output
    (/root/reference/src/conversion/dict_utils.cpp:203-242).

    ``serializers`` maps column name → Column-expression factory, the Spark
    analogue of the reference's ``Config(json_serializer={type: fn})`` hook
    (json_utils.cpp:53-148): the custom expression is consulted before the
    default encoding, e.g. ``{"registered_at": lambda c: F.date_format(c,
    "yyyy-MM-dd")}``."""
    serializers = serializers or {}
    cols = []
    for c in df.columns:
        if c in exclude:
            continue
        expr = serializers[c](F.col(c)).alias(c) if c in serializers else F.col(c)
        cols.append(expr)
    return df.select(F.to_json(F.struct(*cols)).alias("json"))

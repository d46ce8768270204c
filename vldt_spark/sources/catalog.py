"""Table resolution for the validation jobs: Iceberg catalog when the
runtime has it, parquet paths otherwise.

The north rule targets Iceberg tables of pre-tokenized sequences; this
sandbox ships no Iceberg runtime jars, so the module is split into
pieces that are each fully exercisable here:

  * ``iceberg_conf`` builds the standard public Spark-Iceberg session
    config (catalog class, warehouse, extensions) — pure dict, tested.
  * ``iceberg_available`` probes the JVM for the Iceberg SparkCatalog
    class — honest False here, True on a cluster launched with
    ``--packages org.apache.iceberg:iceberg-spark-runtime-...``.
  * ``resolve_table`` dispatches a table reference: a filesystem path (or
    URI) reads as parquet; anything else goes through
    ``spark.read.table`` — which resolves temp views and metastore
    tables everywhere, and Iceberg ``catalog.db.table`` identifiers
    when the catalog is configured. Per-partition validation then gets
    Iceberg's partition pruning for free because the ledger filters on
    the partition column (readers are plain DataFrames throughout).

Reference parity note: the reference validates in-memory objects and has
no storage layer (vldt/models.py — from_dict/from_json only); the table
layer is the north-rule scale requirement, not reference surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


def iceberg_conf(
    catalog: str = "vldt",
    warehouse: str = "spark-warehouse/iceberg",
    *,
    catalog_impl: str = "hadoop",
) -> dict[str, str]:
    """The standard public Spark-Iceberg session config, as a dict so it
    can be applied to a builder (``for k, v in ...: b.config(k, v)``) or
    to spark-submit ``--conf`` flags. ``catalog_impl`` is ``hadoop``
    (path-based warehouse) or ``hive`` (metastore-backed)."""
    base = f"spark.sql.catalog.{catalog}"
    conf = {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        base: ICEBERG_CATALOG_CLASS,
        f"{base}.type": catalog_impl,
    }
    if catalog_impl == "hadoop":
        conf[f"{base}.warehouse"] = warehouse
    return conf


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the JVM classpath carries the Iceberg Spark runtime."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS)  # noqa: SLF001
        return True
    except Exception:
        return False


def _looks_like_path(ref: str) -> bool:
    return (
        "://" in ref
        or os.sep in ref
        or ref.startswith(".")
        or os.path.exists(ref)
    )


def resolve_table(spark: SparkSession, ref: str, *, fmt: str = "parquet") -> DataFrame:
    """Resolve a table reference to a DataFrame.

    Filesystem paths / URIs read as ``fmt`` (parquet default); any other
    name resolves through ``spark.read.table`` — temp views, metastore
    tables, and (with the catalog configured) Iceberg
    ``catalog.db.table`` identifiers, keeping the validation jobs
    storage-agnostic: the SAME fused plan runs over either, and filter
    pushdown reaches Iceberg's partition pruning exactly as it reaches
    parquet's (checks are Column expressions on an unmodified scan)."""
    if _looks_like_path(ref):
        return spark.read.format(fmt).load(ref)
    return spark.read.table(ref)

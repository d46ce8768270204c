"""The fused validation pass + whole-table check orchestration.

One ``Model(**row)`` call in the reference (tp_init,
/root/reference/src/data_model.cpp:141-248) becomes one row of a single
``df.select`` projection here: alias resolution → defaults → BEFORE UDFs →
coercion casts → AFTER UDFs → declarative constraints → cross-field checks,
all violations concatenated into one ``violations`` array column, evaluated
in one whole-stage-codegen'd scan. "Raise TypeError" ≙ ``is_valid=false`` +
violation rows; "return instance" ≙ the coerced canonical columns.

Whole-table checks that cannot be row-local expressions — uniqueness (B5)
and referential integrity (B6) — run as separate small aggregates whose
(tiny) outputs are **broadcast-joined back** onto the main scan, so the big
table is never shuffled:

  * uniqueness: two-stage salted aggregate — partial count per (key, salt),
    final sum per key, filter >1. The dup-key set is rare/small → broadcast.
  * RI: distinct values of the FK column (dim-like cardinality) LEFT ANTI
    JOIN the dim → invalid-value set → broadcast back.

At 100 TB the only shuffle in the whole validation job is therefore the
low-cardinality aggregate of FK/dup candidates, never the fact table.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vldt_spark.coercion import build_value, default_column, scalar_constraints
from vldt_spark.errors import (
    VIOLATIONS_TYPE,
    empty_violations,
    merge_violations,
    missing_required_msg,
    violation_if,
)
from vldt_spark.model import CompiledSchema, Model
from vldt_spark.typeschema import ContainerKind, py_name_of_spark
from vldt_spark.validators import Cols


@dataclass
class ValidationResult:
    """Outcome of a full validation run."""

    annotated: DataFrame  # coerced canonical columns + violations + is_valid
    id_cols: list[str]

    @property
    def valid(self) -> DataFrame:
        return self.annotated.filter(F.col("is_valid")).drop("violations", "is_valid")

    @property
    def invalid(self) -> DataFrame:
        return self.annotated.filter(~F.col("is_valid"))

    def violations(self) -> DataFrame:
        """Exploded violation-rows table: (id cols, path, msg) — B12."""
        v = F.explode(F.col("violations")).alias("v")
        return self.annotated.select(*self.id_cols, v).select(
            *self.id_cols, F.col("v.path").alias("path"), F.col("v.msg").alias("msg")
        )

    def errors_json(self) -> DataFrame:
        """(id cols..., error: string) for invalid rows — the exact
        reference ``TypeError`` payload (error_handling.hpp:109-118):
        a JSON object ``{path: msg}`` where repeated paths promote to
        ``[msgs]`` arrays, 2-space pretty-printed; ``json.loads(str(err))``
        compatible (reference tests/conftest.py:4-13). Built in a pandas
        stage over invalid rows only (violations are rare by design)."""
        import json as _json

        ids = self.id_cols
        inv = self.invalid.select(*ids, "violations")
        id_fields = [inv.schema[c] for c in ids]
        out_schema = T.StructType(id_fields + [T.StructField("error", T.StringType(), True)])

        def run(batches):
            import pandas as pd

            for pdf in batches:
                errs = []
                for v in pdf["violations"]:
                    d: dict = {}
                    for item in v:
                        p, m = item["path"], item["msg"]
                        if p in d:
                            if isinstance(d[p], list):
                                d[p].append(m)
                            else:
                                d[p] = [d[p], m]
                        else:
                            d[p] = m
                    errs.append(_json.dumps(d, indent=2))
                out = pdf[list(ids)].copy()
                out["error"] = errs
                yield out

        return inv.mapInPandas(run, schema=out_schema)

    def verdicts(self, partition_cols: Iterable[str]) -> DataFrame:
        """Per-partition pass/fail verdicts — B11."""
        pc = list(partition_cols)
        return (
            self.annotated.groupBy(*pc)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((~F.col("is_valid")).cast("long")).alias("n_invalid"),
                F.sum(F.size("violations").cast("long")).alias("n_violations"),
            )
            .withColumn("passed", F.col("n_invalid") == 0)
        )

    def profile(self, columns: Iterable[str] | None = None) -> DataFrame:
        """Column profile (B2/B3) of the VALID rows — the natural follow-up
        to a validation pass: stats over what actually passed."""
        from vldt_spark.checks.column_stats import column_profile

        return column_profile(self.valid, list(columns) if columns else None)

    def violations_sample(self, k: int = 5) -> DataFrame:
        """Up to ``k`` deterministic exemplar rows PER (path, msg) —
        the triage surface for 10^12-row runs, where `violations()`
        itself can be billions of rows but a reviewer needs a handful
        of concrete ids per failing constraint.

        Exemplars are the k id-smallest violating rows of each
        constraint, so reruns and the SQL oracle reproduce the same
        sample bit-for-bit.  The ``row_number() <= k`` filter compiles
        to Spark's partial+final WindowGroupLimit (same plan shape as
        `exact_duplicates`' buffer bound): each partition keeps at most
        k rows per group BEFORE the exchange, so the shuffle carries
        ≤ k·|constraints| rows per partition — never the full
        violation stream."""
        from pyspark.sql import Window

        w = Window.partitionBy("path", "msg").orderBy(
            *[F.col(c) for c in self.id_cols]
        )
        return (
            self.violations()
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
        )

    def summary(self) -> DataFrame:
        """Per-constraint-path violation counts (one small aggregate)."""
        return (
            self.annotated.select(F.explode("violations").alias("v"))
            .groupBy(F.col("v.path").alias("path"), F.col("v.msg").alias("msg"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"))
        )


class ValidationEngine:
    """Compile a Model once (driver-side), validate any number of DataFrames."""

    def __init__(self, model: type[Model]):
        self.model = model
        self.compiled: CompiledSchema = model.__vldt_compile__()
        # fused-projection expression cache keyed by (session → input
        # schema): Columns are immutable expression trees, so re-validating
        # same-shaped batches reuses them — the expression-level analogue of
        # the reference's compile-once SchemaCache (schema.cpp:657-680).
        # Building a wide model's checks costs seconds of driver-side py4j
        # round-trips; the second batch costs zero. The outer key is a WEAK
        # session reference: cached Columns hold py4j refs into the gateway
        # that built them, and id()-keying could both serve a stale Column
        # after CPython reuses a dead session's id and grow unboundedly
        # across session restarts.
        import weakref

        self._proj_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

    # -- row-local fused pass -------------------------------------------------

    def annotate(self, df: DataFrame, *, keep_extra: bool = False) -> DataFrame:
        """Single projection producing coerced canonical columns +
        ``violations: array<struct<path,msg>>`` + ``is_valid``."""
        df = self._apply_model_validators(df, "model_before")
        df = self._apply_field_udfs(df, "field_before")

        per_session = self._proj_cache.get(df.sparkSession)
        if per_session is None:
            per_session = {}
            self._proj_cache[df.sparkSession] = per_session
        key = (df.schema.json(), keep_extra)
        if key not in per_session:
            per_session[key] = self._build_projection(df, keep_extra)
        select_cols, violations_col = per_session[key]

        out = df.select(*select_cols).withColumn("violations", violations_col).drop(
            "__v0"
        )
        out = self._apply_field_udfs(out, "field_after")
        out = self._revalidate_after(out)
        out = out.withColumn("is_valid", F.size("violations") == 0)
        out = self._apply_model_validators(out, "model_after")
        return out

    def _revalidate_after(self, df: DataFrame) -> DataFrame:
        """A18 parity: an AFTER validator's output re-enters validation.

        The reference re-setattrs the transformed value, which re-runs the
        field's type + constraint checks
        (/root/reference/src/validation/validation_validators.cpp:172-218)
        — a validator returning an out-of-range value must flag the row,
        not launder it past the constraints that ran on the pre-UDF value.
        Type conformance is already enforced by the pandas UDF's Arrow
        return type; this re-applies the declarative ``scalar_constraints``
        and the required-null check to every UDF-updated column and merges
        the new violations (one extra projection, no new scan).
        ``array_distinct`` collapses the duplicate a value failing the SAME
        constraint before and after the transform would otherwise produce —
        the reference raises once per constraint, never twice."""
        after_fields = {
            fn.__vldt_field__ for fn in self.compiled.validators["field_after"]
        }
        if not after_fields:
            return df
        reval: list[Column] = []
        for spec in self.compiled.fields:
            if spec.name not in after_fields or spec.name not in df.columns:
                continue
            col = F.col(spec.name)
            vs = scalar_constraints(col, spec.field, spec.name, spec.dtype)
            if not spec.node.is_optional and not spec.field.has_default:
                vs.append(
                    violation_if(
                        col.isNull(),
                        spec.name,
                        f"Expected type {spec.node.py_name}, got NoneType",
                    )
                )
            reval.extend(vs)
        if not reval:
            return df
        merged = merge_violations(F.col("violations"), *reval)
        return df.withColumn("violations", F.array_distinct(merged))

    def _build_projection(
        self, df: DataFrame, keep_extra: bool
    ) -> tuple[list[Column], Column]:
        """Build the fused-pass expressions for one input schema: the
        select list (coerced canonical columns [+extras] + the merged
        per-field violations as ``__v0``) and the final violations column
        (``__v0`` + cross-field @checks)."""
        cfg = self.compiled.config
        cols: list[Column] = []
        all_viols: list[Column] = []
        schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

        for spec in self.compiled.fields:
            src_name = None
            # alias keys probed before the canonical name, first alias wins
            # (/root/reference/src/data_model.cpp:172-190)
            for cand in spec.field.aliases + [spec.name]:
                if cand in schema:
                    src_name = cand
                    break
            if src_name is None:
                if spec.field.has_default:
                    cols.append(default_column(spec.field, spec.dtype).alias(spec.name))
                elif spec.node.is_optional:
                    cols.append(F.lit(None).cast(spec.dtype).alias(spec.name))
                else:
                    # whole column absent: every row fails
                    # ("Missing required field", data_model.cpp:209)
                    cols.append(F.lit(None).cast(spec.dtype).alias(spec.name))
                    all_viols.append(
                        violation_if(F.lit(True), spec.name, missing_required_msg())
                    )
                continue

            src = F.col(src_name)
            if spec.name in cfg.deserializers:
                # custom deserializer (A26): the expression factory parses
                # the raw value into the target type (reference
                # Config(deserializer=...), deserializer.cpp:9-70); a
                # non-null input producing null = parse failure violation
                coerced = cfg.deserializers[spec.name](src).try_cast(spec.dtype)
                viols_col = violation_if(
                    src.isNotNull() & coerced.isNull(),
                    spec.name,
                    f"Expected type {spec.node.py_name}, got "
                    + py_name_of_spark(schema[src_name]),
                )
            else:
                coerced, viols_col = build_value(
                    src,
                    schema[src_name],
                    spec.node,
                    spec.name,
                    fld=spec.field,
                    truthy_bool=cfg.truthy_bool,
                )
            viols = [viols_col]
            # defaults / required-null (data_model.cpp:192-212)
            if spec.field.has_default:
                coerced = F.coalesce(coerced, default_column(spec.field, spec.dtype))
            elif not spec.node.is_optional:
                viols.append(
                    violation_if(
                        src.isNull(),
                        spec.name,
                        f"Expected type {spec.node.py_name}, got NoneType",
                    )
                )
            viols.extend(scalar_constraints(coerced, spec.field, spec.name, spec.dtype))
            cols.append(coerced.alias(spec.name))
            all_viols.extend(viols)

        # cross-field @check constraints (B10) — evaluated on coerced values
        model_names = [s.name for s in self.compiled.fields]
        proxy = Cols(model_names)
        select_cols = [
            *cols,
            *(
                [F.col(c) for c in df.columns if c not in model_names]
                if keep_extra
                else []
            ),
            merge_violations(*all_viols).alias("__v0"),
        ]
        check_viols: list[Column] = [F.col("__v0")]
        for fn in self.compiled.validators["checks"]:
            pred = fn(proxy)
            name = fn.__vldt_check_name__
            msg = fn.__vldt_check_message__ or f"Check failed: {name}"
            check_viols.append(violation_if(~F.coalesce(pred, F.lit(False)), name, msg))
        return select_cols, merge_violations(*check_viols)

    # -- validator UDF stages (A17-A20, B15): Arrow-vectorized only ----------

    @staticmethod
    def _picklable(fns) -> None:
        """Validator functions live in user modules that Python workers may
        not be able to import — register their modules for by-value
        cloudpickle so the UDF ships self-contained."""
        import sys

        try:  # Spark serializes UDFs with its vendored cloudpickle
            from pyspark import cloudpickle as _cp
        except ImportError:  # pragma: no cover
            import cloudpickle as _cp

        for fn in fns:
            mod = sys.modules.get(getattr(fn, "__module__", None))
            if mod is not None and not mod.__name__.startswith(("vldt_spark", "pyspark")):
                try:
                    _cp.register_pickle_by_value(mod)
                except Exception:
                    pass

    def _apply_field_udfs(self, df: DataFrame, bucket: str) -> DataFrame:
        fns = self.compiled.validators[bucket]
        if not fns:
            return df  # validator-presence pruning (schema.cpp:527-552)
        self._picklable(fns)
        updates: dict[str, Column] = {}
        schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
        for fn in fns:
            fname = fn.__vldt_field__
            if fname not in schema:
                continue
            ret_type = schema[fname]
            if getattr(fn, "__vldt_async__", False):
                # A21: async field validator — one event loop per Arrow
                # batch, values awaited concurrently (overlapping external
                # calls), never per-row-blocking
                async_fn = fn

                def _wrap_async(s, _f=async_fn):
                    import asyncio

                    import pandas as pd

                    async def _all():
                        return await asyncio.gather(*[_f(v) for v in s])

                    return pd.Series(asyncio.run(_all()), index=s.index)

                udf = F.pandas_udf(_wrap_async, returnType=ret_type)
            elif getattr(fn, "__vldt_vectorized__", True):
                udf = F.pandas_udf(fn, returnType=ret_type)
            else:
                scalar_fn = fn

                def _wrap(s, _f=scalar_fn):  # batch map, still Arrow-transferred
                    return s.map(_f)

                udf = F.pandas_udf(_wrap, returnType=ret_type)
            updates[fname] = udf(F.col(fname))
        return df.withColumns(updates) if updates else df

    def _apply_model_validators(self, df: DataFrame, bucket: str) -> DataFrame:
        fns = self.compiled.validators[bucket]
        if not fns:
            return df
        self._picklable(fns)
        schema = df.schema

        def _run(iterator):
            for pdf in iterator:
                for fn in fns:
                    if getattr(fn, "__vldt_async__", False):
                        import asyncio

                        pdf = asyncio.run(fn(pdf))
                    else:
                        pdf = fn(pdf)
                yield pdf

        return df.mapInPandas(_run, schema=schema)

    # -- whole-table checks ---------------------------------------------------

    def duplicate_keys(
        self, df: DataFrame, key: str, salt_buckets: int = 64
    ) -> DataFrame:
        """B5: keys appearing more than once, via two-stage salted aggregate.

        Stage 1 groups on (key, salt) — partial counts stay bounded per
        reducer even for a pathologically hot key; stage 2 sums the (tiny)
        partials per key. Catalyst's map-side partial agg handles the common
        case; the explicit salt guards the adversarial one at 10^12 rows.
        """
        from vldt_spark.checks.uniqueness import duplicate_keys

        return duplicate_keys(df, key, salt_buckets=salt_buckets)

    def run(
        self,
        df: DataFrame,
        *,
        id_cols: Iterable[str] | None = None,
        dims: dict[str, DataFrame] | None = None,
        keep_extra: bool = False,
    ) -> ValidationResult:
        """Full run: fused row-local pass + uniqueness + RI, violations merged."""
        ann = self.annotate(df, keep_extra=keep_extra)
        ids = list(id_cols) if id_cols else [self.compiled.fields[0].name]
        dims = dims or {}

        # model-level composite uniqueness: class attribute
        # ``unique_together = [("a", "b"), ...]`` — same salted two-stage
        # aggregate + broadcast join-back as per-field unique, keyed on the
        # column tuple. Duplicate detection runs on the COERCED values (a
        # key pair that only collides after coercion, e.g. "01" vs 1, must
        # still be flagged, and the join-back compares coerced columns);
        # Catalyst prunes the annotated plan to just the combo columns, so
        # for declarative models the aggregate still scans only those
        # columns. An unresolvable combo column is an error, never a
        # silent skip.
        ann0 = ann
        model_names_set = {s.name for s in self.compiled.fields}
        for combo in getattr(self.model, "unique_together", []) or []:
            combo = list(combo)
            missing = [
                c for c in combo if c not in model_names_set and c not in ann0.columns
            ]
            if missing:
                raise ValueError(
                    f"unique_together columns not in model {self.model.__name__}: "
                    f"{missing}"
                )
            dups = self.duplicate_keys(ann0.select(*combo), combo).select(
                *[F.col(c).alias(f"__dk_{c}") for c in combo]
            )
            cond = F.lit(True)
            for c in combo:
                cond = cond & (ann[c] == F.col(f"__dk_{c}"))
            extra = violation_if(
                F.col(f"__dk_{combo[0]}").isNotNull(),
                ".".join(combo),
                f"Duplicate value for unique fields ({', '.join(combo)})",
            )
            ann = (
                ann.join(F.broadcast(dups), cond, "left")
                .withColumn("violations", merge_violations(F.col("violations"), extra))
                .drop(*[f"__dk_{c}" for c in combo])
            )

        # whole-table checks read ONLY the key column from the raw input —
        # never the annotated plan, which would re-run the fused pass per
        # aggregate (column pruning then reaches the parquet scan)
        raw = df

        for spec in self.compiled.fields:
            if spec.field.unique:
                src_key = spec.name if spec.name in raw.columns else None
                dups = self.duplicate_keys(
                    raw if src_key else ann, spec.name
                ).select(F.col(spec.name).alias("__dup_key"))
                extra = violation_if(
                    F.col("__dup_key").isNotNull(),
                    spec.name,
                    f"Duplicate value for unique field {spec.name}",
                )
                ann = (
                    ann.join(
                        F.broadcast(dups),
                        ann[spec.name] == F.col("__dup_key"),
                        "left",
                    )
                    .withColumn("violations", merge_violations(F.col("violations"), extra))
                    .drop("__dup_key")
                )
            if spec.field.ref is not None:
                dim_name, dim_col = spec.field.ref
                if dim_name not in dims:
                    continue
                from vldt_spark.checks.referential import invalid_fk_values

                fk_src = raw if spec.name in raw.columns else ann
                bad = invalid_fk_values(fk_src, spec.name, dims[dim_name], dim_col).select(
                    F.col(spec.name).alias("__bad_fk")
                )
                extra = violation_if(
                    F.col("__bad_fk").isNotNull(),
                    spec.name,
                    f"Referential integrity violation: {spec.name} not in {dim_name}.{dim_col}",
                )
                ann = (
                    ann.join(
                        F.broadcast(bad), ann[spec.name] == F.col("__bad_fk"), "left"
                    )
                    .withColumn("violations", merge_violations(F.col("violations"), extra))
                    .drop("__bad_fk")
                )

        ann = ann.withColumn("is_valid", F.size("violations") == 0)
        return ValidationResult(annotated=ann, id_cols=ids)


def validate(
    df: DataFrame,
    model: type[Model],
    *,
    id_cols: Iterable[str] | None = None,
    dims: dict[str, DataFrame] | None = None,
) -> ValidationResult:
    """One-shot convenience wrapper."""
    return ValidationEngine(model).run(df, id_cols=id_cols, dims=dims)

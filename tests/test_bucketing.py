"""Bucketed co-located join: the plan must contain NO Exchange."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    from vldt_spark.sources.bucketing import cohort_join, write_bucketed

    toks = spark.range(5000).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        (F.col("id") % 97).alias("n_tok"),
    )
    ref = spark.range(5000).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        (F.col("id") % 97).alias("ref_n_tok"),
    )
    write_bucketed(toks, "t_bkt_toks", key="doc_id", buckets=4,
                   path=str(tmp_path / "toks"))
    write_bucketed(ref, "t_bkt_ref", key="doc_id", buckets=4,
                   path=str(tmp_path / "ref"))
    try:
        joined = cohort_join(spark, "t_bkt_toks", "t_bkt_ref", "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin with NO shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it is actually correct
        assert joined.where(F.col("n_tok") == F.col("ref_n_tok")).count() == 5000

        # control: the same join on plain (non-bucketed) frames shuffles
        plain = toks.join(ref, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_toks")
        spark.sql("DROP TABLE IF EXISTS t_bkt_ref")

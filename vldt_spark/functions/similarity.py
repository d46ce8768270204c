"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query set against the corpus, dot products via zip_with/aggregate (JVM,
codegen'd), window top-k per query. The scale path is random-hyperplane LSH:
hash every vector to a bucket signature, self-join only within buckets —
the corpus-side shuffle key is the bucket, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero-norm vectors score 0.0 instead of raising
    (ANSI divide-by-zero) — at corpus scale zero embeddings do occur."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast-join queries × corpus,
    one pass, no shuffle of the corpus (queries are the small side).
    Returns (query_id, vec_id, cosine, rank)."""
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    joined = joined.where(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane_bits(vec: Column, *, n_planes: int, seed: int) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · plane_p), plane
    components pseudo-random in [-1,1) from xxhash64(seed, p, dim_index).
    Deterministic, computed inline — no stored model."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def plane_dot(p: int) -> Column:
        comps = F.zip_with(
            vec,
            idx,
            lambda x, i: x
            * (
                (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2000)).cast("double") / 1000.0)
                - 1.0
            ),
        )
        return F.aggregate(comps, F.lit(0.0), lambda a, v: a + v)

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(plane_dot(p) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent hyperplane signatures; a
    corpus vector is a candidate if it shares any table's bucket with the
    query. Join key = (table, bucket) → bounded shuffle; exact cosine +
    window top-k on the candidate set only.
    Returns (query_id, vec_id, cosine, rank)."""

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _hyperplane_bits(
                        F.col(vec_col), n_planes=n_planes, seed=seed * 101 + t
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idc), F.col(vec_col), F.explode(tables).alias("tb")
        ).select(idc, vec_col, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    c = with_buckets(corpus, id_col).alias("c")
    q = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), "query_id"
    ).alias("q")
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("c.tbl") == F.col("q.tbl")) & (F.col("c.bucket") == F.col("q.bucket")),
        )
        .where(F.col(f"c.{id_col}") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col(f"c.{id_col}").alias(id_col),
            F.col(f"c.{vec_col}").alias("__cv"),
            F.col(f"q.{vec_col}").alias("__qv"),
        )
        .dropDuplicates(["query_id", id_col])
    )
    scored = cand.select(
        "query_id", id_col, F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: one hyperplane bucket pass (vectors
    this similar almost surely collide), exact cosine filter within buckets.
    Returns (id_a, id_b, cosine)."""
    sig = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _hyperplane_bits(F.col(vec_col), n_planes=n_planes, seed=seed).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)

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

from vldt_spark.plans.skew import ensure_min_parallelism


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
    joined = ensure_min_parallelism(corpus.select(F.col(id_col), F.col(vec_col))).crossJoin(
        F.broadcast(q)
    )
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


def _plane_matrix(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes, built once on the driver (the same
    stored-model design as MLlib's BucketedRandomProjectionLSH random
    vectors). Seeded splitmix64-style integer mixing — no RNG state, so the
    matrix is reproducible across retries/executors."""
    mat = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            z = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + i * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            row.append((z % 2000) / 1000.0 - 1.0)
        mat.append(row)
    return mat


def _bucket_tables_batch(vec: Column, *, n_planes: int, dim: int, seeds: list[int]) -> Column:
    """All tables' hyperplane buckets in ONE Arrow-batched numpy matmul:
    ``array<long>`` of len(seeds) bucket ids per vector.

    A pure-Catalyst HOF formulation (transform/zip_with/aggregate over a
    literal plane matrix) evaluates interpreted lambdas per plane element
    — at 12 tables × 12 planes × 64 dims that is ~9k lambda invocations
    per ROW and dominated the whole detector (measured 2× the join cost;
    replaced by this UDF for a ~5× end-to-end speedup). One BLAS matmul per
    Arrow batch computes every table's signature at once; sign agreement
    with the SQL oracle holds because a dot product's BLAS-vs-sequential
    difference (~1e-16) flips a sign only for dots within rounding error
    of zero. The plane matrix stays a deterministic driver-side literal.

    Null or wrong-dimensionality vectors map to a NULL bucket array —
    ``posexplode`` then drops those rows from the candidate join instead of
    colliding every null vector into bucket 0 (the degenerate hot bucket)
    or crashing ``np.stack`` with a raw executor error."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = [r for s in seeds for r in _plane_matrix(n_planes, dim, s)]
    mat = np.asarray(rows, dtype=np.float64)  # (T*P, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    n_tables = len(seeds)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(s):
        out = pd.Series([None] * len(s), dtype=object)
        idx_ok: list[int] = []
        vals: list[np.ndarray] = []
        for i, v in enumerate(s):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape != (mat.shape[1],):
                continue  # wrong dim → null bucket, dropped by posexplode
            idx_ok.append(i)
            vals.append(a)
        if not vals:
            return out
        x = np.stack(vals)  # (n_ok, dim)
        bits = (x @ mat.T) > 0  # (n_ok, T*P)
        bits = bits.reshape(len(vals), n_tables, n_planes)
        bks = (bits * weights).sum(axis=2)  # (n_ok, T) int64
        for j, i in enumerate(idx_ok):
            out.iloc[i] = list(bks[j])
        return out

    return _buckets(vec)


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (tiny lookup job; pass ``dim``
    explicitly to skip it)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


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
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: `n_tables` independent hyperplane signatures; a
    corpus vector is a candidate if it shares any table's bucket with the
    query. Join key = (table, bucket) → bounded shuffle; exact cosine +
    window top-k on the candidate set only.
    Returns (query_id, vec_id, cosine, rank)."""
    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    seeds = [seed * 101 + t for t in range(n_tables)]

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        bks = _bucket_tables_batch(
            F.col(vec_col), n_planes=n_planes, dim=d, seeds=seeds
        )
        return df.select(F.col(idc), F.col(vec_col), bks.alias("__bks")).select(
            idc,
            vec_col,
            F.posexplode("__bks").alias("tbl", "bucket"),
        )

    c = with_buckets(ensure_min_parallelism(corpus), id_col).alias("c")
    q = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), "query_id"
    ).alias("q")
    # score inside the bucket join, dedup after: a candidate colliding in
    # k tables recomputes its cosine k times map-side, but the dedup
    # shuffle then moves (query_id, id, cosine) rows — not two vector
    # payloads per candidate (see embedding_near_duplicates for the math)
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("c.tbl") == F.col("q.tbl")) & (F.col("c.bucket") == F.col("q.bucket")),
        )
        .where(F.col(f"c.{id_col}") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col(f"c.{id_col}").alias(id_col),
            F.round(
                cosine(F.col(f"c.{vec_col}"), F.col(f"q.{vec_col}")), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", id_col])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _normalize_rows(mat: list[list[float]]) -> list[list[float]]:
    out = []
    for row in mat:
        n = sum(x * x for x in row) ** 0.5 or 1.0
        out.append([x / n for x in row])
    return out


def _centroid_dots(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of vec · centroid_c for every (unit-norm) centroid —
    with unit centroids, argmax dot == argmax cosine (|vec| is constant
    across candidates for one row)."""
    m = F.array(*[F.array(*[F.lit(w) for w in row]) for row in centroids])
    return F.transform(
        m,
        lambda row: F.aggregate(
            F.zip_with(vec, row, lambda x, w: x * w), F.lit(0.0), lambda a, v: a + v
        ),
    )


def kmeans_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic distributed Lloyd iterations → unit-norm centroid
    matrix (the IVF coarse quantizer, trained once on the driver's behalf).

    Init = the n_centroids rows with smallest xxhash64(id) (a seeded,
    order-independent pseudo-random sample). Assignment runs as one scan
    against the literal centroid matrix; the update step is
    posexplode → groupBy(cluster, pos) avg — the shuffle carries
    n_centroids × dim partial sums per partition, independent of corpus
    size. At 100 TB, train on a hash-sampled subset
    (``corpus.where(pmod(xxhash64(id), K) == 0)``) — the quantizer needs a
    representative sample, not every row."""
    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    seed_rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    cents = _normalize_rows([list(r[vec_col]) for r in seed_rows])
    for _ in range(iters):
        dots = _centroid_dots(F.col(vec_col).cast("array<double>"), cents)
        cid = F.array_position(dots, F.array_max(dots)) - 1
        sums = (
            corpus.select(cid.alias("cid"), F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [row[:] for row in cents]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cid"], [0.0] * d)[r["pos"]] = r["s"]
            cnt[r["cid"]] = r["n"]
        for c, vals in acc.items():
            if cnt.get(c):
                new[int(c)] = [v / cnt[c] for v in vals]
        cents = _normalize_rows(new)
    return cents


def pq_train(
    corpus: DataFrame,
    *,
    pq_m: int = 8,
    pq_codes: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 4096,
    iters: int = 10,
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector splits into
    ``pq_m`` contiguous subvectors and each subspace gets a ``pq_codes``-
    entry k-means codebook. Training runs on a bounded hash-ordered
    sample collected to the driver (``sample`` × dim doubles — a few MB;
    a quantizer needs a representative sample, not every row — the same
    budget rationale as ``kmeans_centroids``' init), with deterministic
    evenly-spaced init over the hash-ordered rows, so the codebooks are
    reproducible across retries. Returns pq_m × pq_codes × (dim/pq_m)
    nested lists (a broadcastable literal, like the IVF centroids)."""
    import numpy as np

    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    if d % pq_m:
        raise ValueError(f"dim {d} not divisible by pq_m {pq_m}")
    rows = (
        corpus.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample)
        .collect()
    )
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    dsub = d // pq_m
    books = []
    for s in range(pq_m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        kk = min(pq_codes, len(xs))
        idx = (np.arange(kk) * (len(xs) // kk)).astype(np.int64)
        c = xs[idx].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(kk):
                sel = xs[assign == j]
                if len(sel):
                    c[j] = sel.mean(axis=0)
        books.append(c.tolist())
    return books


def _pq_encode(vec: Column, books: list[list[list[float]]]) -> Column:
    """(codes array<int>, vnorm double) per vector: one Arrow-batched
    numpy pass finds each subvector's nearest codebook entry
    (argmax dot − ½‖c‖² ≡ argmin L2) and the full-vector norm — the only
    payload the ADC scorer ever needs (pq_m bytes-worth of codes + one
    double instead of the raw float array)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    mats = [np.asarray(b, dtype=np.float64) for b in books]  # m × (codes, dsub)
    halves = [0.5 * (m * m).sum(axis=1) for m in mats]
    pq_m = len(mats)
    dsub = mats[0].shape[1]
    d = pq_m * dsub

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("codes", T.ArrayType(T.IntegerType()), True),
                T.StructField("vnorm", T.DoubleType(), True),
            ]
        )
    )
    def _enc(s):  # no type hints: Series -> DataFrame (struct) is
        # decorator-typed; hint inference rejects that signature
        codes_out = [None] * len(s)
        norm_out = [None] * len(s)
        ok, vals = [], []
        for i, v in enumerate(s):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape != (d,):
                continue
            ok.append(i)
            vals.append(a)
        if vals:
            x = np.stack(vals)  # (n, d)
            norms = np.sqrt((x * x).sum(axis=1))
            codes = np.empty((len(vals), pq_m), dtype=np.int32)
            for sub in range(pq_m):
                xs = x[:, sub * dsub : (sub + 1) * dsub]
                scores = xs @ mats[sub].T - halves[sub]
                codes[:, sub] = scores.argmax(axis=1)
            for j, i in enumerate(ok):
                codes_out[i] = [int(cc) for cc in codes[j]]
                norm_out[i] = float(norms[j])
        return pd.DataFrame({"codes": codes_out, "vnorm": norm_out})

    return _enc(vec)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
    pq_m: int | None = None,
    pq_codes: int = 32,
    pq_books: list[list[list[float]]] | None = None,
    rerank: int = 8,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are bucketed by nearest centroid
    (the inverted file); each query probes its ``nprobe`` nearest centroids
    and scores exact cosine only within those buckets. Join key = cluster
    id → the corpus-side shuffle is bounded by cluster sizes, never the
    n×m cross product. Returns (query_id, vec_id, cosine, rank).

    ``pq_m`` switches bucket scoring to IVF-PQ: at 10⁹+ vectors exact
    cosine inside probed buckets is memory-bandwidth-bound on the raw
    float arrays; with PQ the candidate relation carries only ``pq_m``
    int8-range codes + one norm per row, queries score candidates via an
    asymmetric-distance lookup table (one dot-product table per query
    per subspace, then pure gather-adds), and only the ADC top
    ``k·rerank`` per query ever touch raw vectors again — an exact-cosine
    rerank bounded by |queries|·k·rerank rows, so returned cosines stay
    EXACT values (recall ≥ 0.9 vs brute force pytest-pinned)."""
    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    cents = centroids or kmeans_centroids(
        corpus, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col, iters=iters, dim=d
    )
    vec_d = F.col(vec_col).cast("array<double>")

    c_dots = _centroid_dots(vec_d, cents)
    c = ensure_min_parallelism(corpus.select(F.col(id_col), F.col(vec_col))).withColumn(
        "cid", (F.array_position(c_dots, F.array_max(c_dots)) - 1).cast("int")
    )

    # query side: nprobe nearest centroids via (−dot, idx) struct sort
    q_dots = _centroid_dots(F.col("__qv").cast("array<double>"), cents)
    ranked = F.array_sort(
        F.zip_with(
            q_dots,
            F.array(*[F.lit(i) for i in range(len(cents))]),
            lambda dot, i: F.struct((-dot).alias("neg"), i.alias("idx")),
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["idx"])
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .withColumn("cid", F.explode(probes))
    )

    if pq_m:
        books = pq_books or pq_train(
            corpus,
            pq_m=pq_m,
            pq_codes=pq_codes,
            vec_col=vec_col,
            id_col=id_col,
            dim=d,
        )
        return _ivf_pq_rank(
            c, q, corpus, books, k=k, id_col=id_col, vec_col=vec_col, rerank=rerank
        )

    cand = c.join(F.broadcast(q), "cid").where(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _ivf_pq_rank(
    c: DataFrame,
    q: DataFrame,
    corpus: DataFrame,
    books: list[list[list[float]]],
    *,
    k: int,
    id_col: str,
    vec_col: str,
    rerank: int,
) -> DataFrame:
    """ADC scoring + bounded exact rerank for ``ivf_topk(pq_m=...)``.

    ``c`` is the (id, vec, cid) inverted file, ``q`` the probe-exploded
    query side. The candidate join carries (id, cid, codes, vnorm) only;
    the per-batch scorer builds one LUT per distinct query (pq_m ×
    pq_codes dot products) and scores each candidate with pq_m gathers —
    no raw corpus vector rides the probe join. The ADC top k·rerank per
    query then join back to raw vectors (a broadcast semi-join of
    |queries|·k·rerank ids into the corpus scan) for exact cosine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    mats = [np.asarray(b, dtype=np.float64) for b in books]
    pq_m = len(mats)
    dsub = mats[0].shape[1]

    enc = c.select(
        F.col(id_col),
        F.col("cid"),
        _pq_encode(F.col(vec_col), books).alias("__pq"),
    ).select(
        id_col, "cid", F.col("__pq.codes").alias("__codes"), F.col("__pq.vnorm").alias("__vn")
    )
    cand = enc.join(F.broadcast(q), "cid").where(F.col(id_col) != F.col("query_id"))

    @F.pandas_udf(T.DoubleType())
    def _adc(codes_s, vn_s, qv_s):  # hints omitted: module uses PEP 563
        # and pandas is function-local, so string hints don't resolve
        n = len(codes_s)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        keys = np.fromiter(
            (hash(tuple(v)) if v is not None else 0 for v in qv_s),
            dtype=np.int64,
            count=n,
        )
        vn = vn_s.to_numpy(dtype=np.float64)
        for key in np.unique(keys):
            sel = np.nonzero(keys == key)[0]
            qv = qv_s.iloc[int(sel[0])]
            if qv is None:
                continue
            qa = np.asarray(qv, dtype=np.float64)
            qn = float(np.sqrt((qa * qa).sum()))
            if qn == 0.0:
                continue
            lut = np.stack(
                [
                    mats[s] @ qa[s * dsub : (s + 1) * dsub]
                    for s in range(pq_m)
                ]
            )  # (pq_m, codes)
            codes = np.stack(
                [np.asarray(codes_s.iloc[int(i)], dtype=np.int64) for i in sel]
            )  # (g, pq_m)
            dots = lut[np.arange(pq_m), codes].sum(axis=1)
            denom = qn * vn[sel]
            good = denom > 0
            out[sel[good]] = dots[good] / denom[good]
        return pd.Series(out)

    approx = cand.select(
        "query_id",
        id_col,
        _adc(F.col("__codes"), F.col("__vn"), F.col("__qv")).alias("__approx"),
    ).dropDuplicates(["query_id", id_col])
    w0 = Window.partitionBy("query_id").orderBy(F.desc("__approx"), F.asc(id_col))
    surv = (
        approx.withColumn("__r", F.row_number().over(w0))
        .where(F.col("__r") <= k * rerank)
        .select("query_id", id_col)
    )
    raw = corpus.select(F.col(id_col), F.col(vec_col))
    qraw = q.select("query_id", "__qv").dropDuplicates(["query_id"])
    exact = (
        raw.join(F.broadcast(surv), id_col)
        .join(F.broadcast(qraw), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return exact.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table hyperplane LSH:
    ``n_tables`` independent ``n_planes``-bit signatures, a pair is a
    candidate if it collides in ANY table (OR semantics — the same design
    as lsh_bucketed_topk), exact cosine filter on candidates.

    Recall math: per-plane agreement for cosine c is 1 − arccos(c)/π, so a
    single 12-bit table catches only ~16% of true pairs at c=0.9; with
    8 planes × 8 tables the union recall is 1 − (1 − p^8)^8 ≈ 0.93 at
    c=0.9 and ≈ 0.99 at c=0.95 (asserted by pytest on perturbed pairs).

    Scale note: join key is (table, bucket) so the shuffle is bounded by
    bucket sizes, never all-pairs — but 2^n_planes buckets must out-scale
    the corpus; at 10^9+ rows raise n_planes (e.g. 16-20) and add tables
    to hold recall. Returns (id_a, id_b, cosine)."""
    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    seeds = [seed * 1009 + t for t in range(n_tables)]

    sig = (
        ensure_min_parallelism(corpus)
        .select(
            F.col(id_col),
            F.col(vec_col),
            _bucket_tables_batch(
                F.col(vec_col), n_planes=n_planes, dim=d, seeds=seeds
            ).alias("__bks"),
        )
        .select(id_col, vec_col, F.posexplode("__bks").alias("tbl", "bucket"))
    )
    a, b = sig.alias("a"), sig.alias("b")
    # score INSIDE the bucket join and filter before deduplicating: a pair
    # colliding in k of the n_tables recomputes the cosine k times (cheap,
    # map-side), but the dedup shuffle then carries only the surviving
    # (id_a, id_b, cosine) rows — ~24 bytes each — instead of two 64-dim
    # vector payloads per CANDIDATE pair (~1 KB each), which is what a
    # dropDuplicates-then-score order would move at 10^12 rows.
    scored = a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
        ).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= threshold).distinct()


# -- embedding-level decontamination -------------------------------------------


def embedding_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str | None = None,
    threshold: float = 0.9,
    method: str = "lsh",
    n_planes: int = 12,
    n_tables: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Semantic train/test leakage screen: corpus rows whose embedding is
    within ``threshold`` cosine of ANY benchmark embedding — the leakage
    the 13-gram ``contamination_report`` can't see (a paraphrased test
    question shares no 13-gram with its source). Returns
    ``(corpus_id, bench_id, cosine)`` pairs.

    Two physical strategies, chosen by ``method``:

    ``"exact"`` — benchmark embeddings BROADCAST against the corpus and
    every (corpus, bench) cosine is evaluated map-side. A benchmark suite
    is small by construction (10^3–10^5 rows ≈ ≤100 MB of fp32×64-1024),
    so this is |bench| fused dot products per corpus row with ZERO
    shuffle of either relation — at 100 TB of corpus this is the plan to
    beat, and it is exhaustive (recall 1.0). It degrades only when the
    bench itself outgrows a broadcast; then:

    ``"lsh"`` — multi-table hyperplane signatures on both sides (same
    literal plane matrices as ``embedding_near_duplicates``), joined on
    (table, bucket); exact cosine re-check on collisions. Sub-exhaustive
    (union recall ≈0.92 at c≈0.9 for 12×12) but the join key bounds the
    exchange when both relations are huge.
    """
    bvec = bench_vec_col or vec_col
    b = bench.select(
        F.col(bench_id_col).alias("bench_id"), F.col(bvec).alias("__bvec")
    )
    if method == "exact":
        scored = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col)).crossJoin(
            F.broadcast(b)
        ).select(
            "corpus_id",
            "bench_id",
            F.round(cosine(F.col(vec_col), F.col("__bvec")), 6).alias("cosine"),
        )
        return scored.where(F.col("cosine") >= threshold)
    if method != "lsh":
        raise ValueError(f"embedding_contamination: unknown method {method!r}")

    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    seeds = [seed * 1009 + t for t in range(n_tables)]

    def signed(df, idc, vc):
        return (
            ensure_min_parallelism(df)
            .select(
                F.col(idc),
                F.col(vc).alias("__vec"),
                _bucket_tables_batch(
                    F.col(vc), n_planes=n_planes, dim=d, seeds=seeds
                ).alias("__bks"),
            )
            .select(idc, "__vec", F.posexplode("__bks").alias("tbl", "bucket"))
        )

    ca = signed(
        corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col)),
        "corpus_id", vec_col,
    ).alias("a")
    cb = signed(b, "bench_id", "__bvec").alias("b")
    scored = ca.join(
        cb,
        (F.col("a.tbl") == F.col("b.tbl")) & (F.col("a.bucket") == F.col("b.bucket")),
    ).select(
        F.col("a.corpus_id").alias("corpus_id"),
        F.col("b.bench_id").alias("bench_id"),
        F.round(cosine(F.col("a.__vec"), F.col("b.__vec")), 6).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= threshold).distinct()


def decontaminate_by_embedding(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Drop corpus rows flagged by ``embedding_contamination`` — the
    removal half, mirroring ``decontaminate`` for the n-gram screen. The
    flagged-id set is tiny (it is a leak list), so it broadcasts into a
    left-anti join; the corpus never shuffles."""
    flagged = (
        embedding_contamination(
            corpus, bench, id_col=id_col, vec_col=vec_col, **kwargs
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")

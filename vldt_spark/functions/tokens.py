"""Token-vocabulary operators over pre-tokenized training sequences.

These run on the BASELINE input_hint shape — (doc_id string, tokens
array<int32>, n_tok int32, source string) — and answer the questions a
training-data owner asks of a 10^12-sequence corpus: what is the unigram
token distribution (for sampling temperature / vocab pruning), which
sequences carry out-of-vocabulary ids (tokenizer/version drift), what
fraction of the vocab is actually exercised, and what are the dominant
token bigrams (template/boilerplate detection).

Scale design:
- `token_histogram` NEVER explodes the token arrays through a shuffle.
  A naive `explode(tokens)` → groupBy ships n_rows × seq_len rows into
  the exchange (at 10^12 sequences × 1k tokens that is 10^15 shuffle
  rows).  Instead an Arrow-batched numpy `bincount` folds each partition
  into one dense partial histogram, so the exchange carries at most
  |vocab| rows per PARTITION (not per row) and the final groupBy(token)
  is a |vocab|-sized aggregate.  Same partial-then-final shape as the
  salted uniqueness check.
- `oov_report` / `vocab_coverage` are single hash aggregates over
  row-local expressions (no HOF in the hot loop for oov: `aggregate`
  over int comparisons is interpreted but cheap; the histogram path is
  the vectorized alternative when the whole distribution is needed).
- `token_bigram_topk` uses the same per-partition numpy fold with
  bigram keys packed into int64 (a * vocab + b), so the shuffle carries
  distinct-bigrams-per-partition, bounded by |vocab|², typically ≪ data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _arrow_flat_tokens(list_arr) -> "tuple[np.ndarray, np.ndarray]":
    """Flatten one Arrow list<int> column to ``(flat int64, lens int64)``
    with ZERO per-row Python: ``lens[i]`` is row i's element count (NULL
    array → 0, contributing nothing to ``flat``), and ``flat`` is every
    row's elements concatenated in row order with NULL elements mapped to
    -1 (the `_int_tokens` convention).  ``pc.list_flatten`` respects
    slices and skips null lists, so ``flat`` segments align exactly with
    the nonzero entries of ``lens`` — the shape `np.add.reduceat` wants.
    This is the mapInArrow fast path; `_int_tokens` remains for the
    pandas-Series call sites."""
    import pyarrow.compute as pc

    lens = (
        pc.fill_null(pc.list_value_length(list_arr), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = (
        pc.fill_null(pc.list_flatten(list_arr), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return flat, lens


def _round6_vec(x: "np.ndarray") -> "np.ndarray":
    """Vectorized half-up 6-decimal rounding — elementwise identical to
    the scalar `_round6` (Python round() is banker's; DuckDB's is
    half-up, and the oracle gate compares at 6dp)."""
    return (
        np.where(x >= 0, np.floor(x * 1e6 + 0.5), -np.floor(-x * 1e6 + 0.5))
        / 1e6
    )


def _int_tokens(arr) -> "np.ndarray | None":
    """Normalize one Arrow-delivered token array to int64 with NULL
    elements mapped to -1.  Arrow hands list<int32> to pandas as an
    int array, but as float64-with-NaN or object-with-None the moment
    the list contains nulls — all three shapes land here."""
    if arr is None or (np.isscalar(arr) and pd.isna(arr)):
        return None
    a = np.asarray(arr)
    if a.dtype == object:
        return np.array(
            [-1 if (e is None or e != e) else int(e) for e in a],
            dtype=np.int64,
        )
    if a.dtype.kind == "f":
        out = np.where(np.isnan(a), -1.0, a)
        return out.astype(np.int64)
    return a.astype(np.int64)


def token_histogram(
    df: DataFrame, vocab_size: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Exact unigram token counts: (token int, cnt long).

    Per-partition dense numpy bincount (one Arrow batch at a time), then
    a |vocab|-row final sum.  Tokens outside [0, vocab_size) and NULL
    elements are counted under token = -1 so the total is conserved
    (callers can split OOV out; see `oov_report` for the rate view).
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(vocab_size, dtype=np.int64)
        oov = 0
        for pdf in batches:
            for arr in pdf[tokens_col]:
                t = _int_tokens(arr)  # NULL elements become -1
                if t is None:
                    continue
                in_range = (t >= 0) & (t < vocab_size)
                oov += int((~in_range).sum())
                acc += np.bincount(t[in_range], minlength=vocab_size)
            del pdf
        nz = np.nonzero(acc)[0]
        out = pd.DataFrame(
            {"token": nz.astype(np.int64), "cnt": acc[nz]}
        )
        if oov:
            out = pd.concat(
                [out, pd.DataFrame({"token": [-1], "cnt": [oov]})],
                ignore_index=True,
            )
        yield out

    partials = df.select(tokens_col).mapInPandas(
        fold, schema="token long, cnt long"
    )
    return partials.groupBy("token").agg(F.sum("cnt").alias("cnt"))


def oov_report(
    df: DataFrame,
    vocab_size: int,
    tokens_col: str = "tokens",
    by: str = "source",
) -> DataFrame:
    """Per-group OOV audit: total tokens, OOV tokens (NULL element or id
    outside [0, vocab_size)), and the OOV rate.  Row-local expressions +
    one hash aggregate — partial aggregation makes the shuffle |groups|-
    sized."""
    t = F.col(tokens_col)
    n_tok = F.coalesce(F.size(t), F.lit(0))
    # size(filter(...)) counts non-NULL out-of-range; NULL elements are
    # total minus non-null count.
    non_null = F.size(F.filter(t, lambda x: x.isNotNull()))
    bad_range = F.size(
        F.filter(t, lambda x: x.isNotNull() & ((x < 0) | (x >= vocab_size)))
    )
    oov = F.when(t.isNull(), F.lit(0)).otherwise(
        (n_tok - non_null) + bad_range
    )
    return (
        df.select(
            F.col(by),
            n_tok.alias("__n"),
            oov.alias("__oov"),
        )
        .groupBy(by)
        .agg(
            F.sum("__n").alias("total_tokens"),
            F.sum("__oov").alias("oov_tokens"),
            F.round(
                F.sum("__oov") / F.greatest(F.sum("__n"), F.lit(1)), 6
            ).alias("oov_rate"),
        )
    )


def vocab_coverage(
    df: DataFrame, vocab_size: int, tokens_col: str = "tokens"
) -> DataFrame:
    """One-row corpus summary: distinct in-vocab tokens observed, the
    coverage fraction, and the observed min/max token id.  Built on the
    histogram partials, so the full arrays never shuffle."""
    hist = token_histogram(df, vocab_size, tokens_col=tokens_col)
    in_vocab = hist.where(F.col("token") >= 0)
    return in_vocab.agg(
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.round(F.count(F.lit(1)) / F.lit(float(vocab_size)), 6).alias(
            "vocab_coverage"
        ),
        F.min("token").alias("min_token"),
        F.max("token").alias("max_token"),
        F.sum("cnt").alias("in_vocab_tokens"),
    )


def token_bigram_topk(
    df: DataFrame,
    vocab_size: int,
    k: int = 25,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Top-k token bigrams by exact count, deterministic tie-break
    (cnt DESC, tok_a ASC, tok_b ASC).  Bigram keys pack into int64
    (a * vocab_size + b) and fold per-partition via np.unique, so the
    exchange carries distinct-bigrams-per-partition rows, never the
    exploded pair stream.  NULL elements and out-of-vocab ids break the
    bigram (both pairs containing them are dropped), matching the SQL
    oracle's NULL/range filter."""
    V = vocab_size

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys: dict[int, int] = {}
        for pdf in batches:
            for arr in pdf[tokens_col]:
                t = _int_tokens(arr)
                if t is None or len(t) < 2:
                    continue
                ok = (t >= 0) & (t < V)
                a, b = t[:-1], t[1:]
                good = ok[:-1] & ok[1:]
                packed = a[good] * V + b[good]
                if len(packed):
                    u, c = np.unique(packed, return_counts=True)
                    for kk, cc in zip(u.tolist(), c.tolist()):
                        keys[kk] = keys.get(kk, 0) + cc
            del pdf
        if keys:
            kk = np.fromiter(keys.keys(), dtype=np.int64, count=len(keys))
            cc = np.fromiter(keys.values(), dtype=np.int64, count=len(keys))
            yield pd.DataFrame({"key": kk, "cnt": cc})
        else:
            yield pd.DataFrame({"key": [], "cnt": []}).astype(
                {"key": "int64", "cnt": "int64"}
            )

    partials = df.select(tokens_col).mapInPandas(
        fold, schema="key long, cnt long"
    )
    totals = partials.groupBy("key").agg(F.sum("cnt").alias("cnt"))
    from pyspark.sql import Window

    ranked = totals.select(
        F.floor(F.col("key") / V).cast("long").alias("tok_a"),
        (F.col("key") % V).cast("long").alias("tok_b"),
        "cnt",
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.col("cnt").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
            )
        ),
    )
    # global Window.orderBy is a single-partition sort — fine here because
    # its input is the |vocab|²-bounded totals, not the corpus.
    return ranked.where(F.col("rank") <= k).select(
        "rank", "tok_a", "tok_b", "cnt"
    )


def special_token_violations(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    bos: int | None = None,
    eos: int | None = None,
    forbidden: list[int] | None = None,
) -> DataFrame:
    """Sequence-structure validation of pre-tokenized rows: the
    token-native analogue of the engine's per-field constraints, with the
    same (id, path, msg) violation lineage shape.

    Checks (each optional):
    - ``bos``: the BOS id must appear at position 0 and NOWHERE else;
    - ``eos``: the EOS id must appear at the last position and nowhere
      else (a mid-sequence EOS means two documents were packed without
      resetting attention — the classic contamination bug);
    - ``forbidden``: ids that must not appear at all (e.g. special/pad
      ids leaking into training text).

    Row-local Catalyst HOFs only (filter/exists over the array — no
    explode, no shuffle, no UDF): violations materialize with
    ``tokens.<i>`` paths so they union straight into the engine's
    violation table.
    """
    checks = []
    toks = F.col(tokens_col)

    def bad_positions(pred):
        # empty sequences yield no positions (and no violations here —
        # emptiness itself is a min_size field constraint, not a
        # special-token placement error)
        idx = F.when(
            F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.filter(idx, pred)

    if bos is not None:
        checks.append(
            (
                bad_positions(
                    lambda i: (F.element_at(toks, i + 1) == F.lit(bos)) & (i != 0)
                ),
                F.lit(f"special token BOS({bos}) not at position 0"),
            )
        )
        checks.append(
            (
                F.when(
                    (F.size(toks) > 0)
                    & (F.element_at(toks, 1) != F.lit(bos)),
                    F.array(F.lit(0)),
                ).otherwise(F.array().cast("array<int>")),
                F.lit(f"sequence does not start with BOS({bos})"),
            )
        )
    if eos is not None:
        checks.append(
            (
                bad_positions(
                    lambda i: (F.element_at(toks, i + 1) == F.lit(eos))
                    & (i != F.size(toks) - 1)
                ),
                F.lit(f"special token EOS({eos}) before sequence end"),
            )
        )
    def _forbidden_pred(fid):
        # factory, not a defaulted second lambda param — F.filter treats
        # two-parameter lambdas as (element, index)
        return lambda i: F.element_at(toks, i + 1) == F.lit(fid)

    for fid in forbidden or []:
        checks.append(
            (
                bad_positions(_forbidden_pred(fid)),
                F.lit(f"forbidden token id {fid} present"),
            )
        )
    if not checks:
        raise ValueError("give at least one of bos/eos/forbidden")

    def _arm(pos, msg):
        # NB: a two-parameter lambda would be interpreted by F.transform
        # as (element, index) — close over msg with a factory instead
        return F.transform(
            pos,
            lambda i: F.struct(
                F.concat(F.lit(f"{tokens_col}."), i.cast("string")).alias("path"),
                msg.alias("msg"),
            ),
        )

    arms = F.array(*[_arm(pos, msg) for pos, msg in checks])
    out = df.select(
        F.col(id_col),
        F.explode(F.flatten(arms)).alias("__v"),
    )
    return out.select(id_col, F.col("__v.path").alias("path"), F.col("__v.msg").alias("msg"))


def _round6(x: float) -> float:
    """Half-up 6-decimal rounding (Python round() is banker's; DuckDB
    round() is half-away-from-zero — identical for the non-negative
    metrics emitted here)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def sequence_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-sequence degenerate-content audit over the input_hint token
    shape: for each sequence report

    - ``n_tok`` — token count,
    - ``n_distinct`` — distinct token ids,
    - ``distinct_ratio`` — n_distinct / n_tok (≈0 for looping output),
    - ``entropy`` — unigram Shannon entropy in nats
      (``ln n − Σ c·ln c / n``; 0 for a constant sequence),
    - ``max_run`` — longest run of one token repeated consecutively
      (the classic degenerate-generation signature),
    - ``top_share`` — share held by the single most frequent token.

    These are the sequence-level quality gates a 10^12-sequence corpus
    owner runs before training: low entropy / distinct_ratio or a long
    max_run marks gibberish, boilerplate loops, or decoder collapse.

    Scale shape: strictly ROW-LOCAL — one mapInArrow pass per partition,
    zero exchanges; the plan is scan → MapInArrow.  The Arrow list column
    is flattened zero-copy ONCE (`_arrow_flat_tokens` — no pandas list
    materialization, no per-row dtype copies); the per-row reductions run
    on int64 VIEWS into that flat buffer.  A fully flat formulation
    (global segment sort + reduceat) was measured and rejected: with
    |vocab| ≫ row length almost every token is distinct within its row,
    so "groups" ≈ "tokens" and the flat path makes several full-relation
    passes where the per-row sorts stay cache-resident (10.6 s vs 1.9 s
    per 15M-token batch).  Σ c·ln c is summed over counts > 1 only
    (ln 1 = 0), which skips the log for the dominant all-distinct case.
    At any corpus size the cost is one streaming read of the token
    column.  NULL elements count as token id -1 (the same convention as
    `token_histogram`); a NULL or empty array yields n_tok = 0 with NULL
    ratio/entropy/top_share.  Floats use half-up 6-decimal rounding.
    """
    import pyarrow as pa

    id_dtype = df.schema[id_col].dataType.simpleString()

    def stats(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        log = np.log
        for batch in batches:
            ids = batch.column(0)
            flat, lens = _arrow_flat_tokens(batch.column(1))
            m = lens.size
            nz = lens > 0
            off = np.concatenate(([0], np.cumsum(lens)))
            nd_full = np.zeros(m, dtype=np.int64)
            run_full = np.zeros(m, dtype=np.int64)
            ratio_full = np.full(m, np.nan)
            ent_full = np.full(m, np.nan)
            top_full = np.full(m, np.nan)
            for i in np.flatnonzero(nz):
                tv = flat[off[i]:off[i + 1]]
                n = tv.size
                sv = np.sort(tv)
                b = np.flatnonzero(sv[1:] != sv[:-1])
                nd = b.size + 1
                cuts = np.empty(nd + 1, dtype=np.int64)
                cuts[0] = 0
                cuts[1:-1] = b + 1
                cuts[-1] = n
                counts = np.diff(cuts)
                dup = counts[counts > 1]
                s = float((dup * log(dup)).sum()) if dup.size else 0.0
                c = np.flatnonzero(tv[1:] != tv[:-1])
                if c.size == 0:
                    mr = n
                else:
                    mr = max(
                        int(c[0]) + 1,
                        int(n - 1 - c[-1]),
                        int(np.diff(c).max()) if c.size > 1 else 0,
                    )
                nd_full[i] = nd
                run_full[i] = mr
                ratio_full[i] = nd / n
                ent_full[i] = log(n) - s / n
                top_full[i] = int(counts.max()) / n
            ratio_full = _round6_vec(ratio_full)
            ent_full = _round6_vec(ent_full)
            top_full = _round6_vec(top_full)
            null_mask = ~nz
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(lens.astype(np.int32), type=pa.int32()),
                    pa.array(nd_full.astype(np.int32), type=pa.int32()),
                    pa.array(ratio_full, type=pa.float64(), mask=null_mask),
                    pa.array(ent_full, type=pa.float64(), mask=null_mask),
                    pa.array(run_full.astype(np.int32), type=pa.int32()),
                    pa.array(top_full, type=pa.float64(), mask=null_mask),
                ],
                names=[
                    id_col, "n_tok", "n_distinct", "distinct_ratio",
                    "entropy", "max_run", "top_share",
                ],
            )

    return df.select(id_col, tokens_col).mapInArrow(
        stats,
        schema=(
            f"{id_col} {id_dtype}, n_tok int, n_distinct int,"
            " distinct_ratio double, entropy double, max_run int,"
            " top_share double"
        ),
    )


def zipf_report(
    df: DataFrame, vocab_size: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Corpus rank-frequency sanity check: OLS fit of ln(count) against
    ln(rank) over the exact unigram histogram (rank 1 = most frequent,
    ties broken by token id).  Natural text follows Zipf's law with a
    slope near -1; a much flatter or steeper slope flags synthetic,
    templated, or corrupted corpora — a distribution-shape validation
    no single-column stat catches.

    Returns one row: ``n_vocab`` (distinct in-vocab tokens observed),
    ``zipf_slope``, ``zipf_intercept``, ``r2`` (squared Pearson
    correlation of the log-log points).

    Scale shape: built on `token_histogram`'s per-partition bincount
    partials, so token arrays never ride a shuffle; the rank window and
    the regression aggregate run over the |vocab|-bounded histogram
    (fine to |vocab| in the millions — it is one narrow sort, not a
    corpus sort).  Returns NULL slope when fewer than two distinct
    tokens exist (var(ln rank) = 0).
    """
    from pyspark.sql import Window

    hist = token_histogram(df, vocab_size, tokens_col=tokens_col).where(
        F.col("token") >= 0
    )
    ranked = hist.select(
        F.log(F.col("cnt")).alias("__y"),
        F.log(
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("token").asc()))
            .cast("double")
        ).alias("__x"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.covar_pop("__y", "__x").alias("__cov"),
        F.var_pop("__x").alias("__vx"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
        F.corr("__y", "__x").alias("__r"),
    )
    slope = F.when(F.col("__vx") > 0, F.col("__cov") / F.col("__vx"))
    return agg.select(
        F.col("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), 6).alias(
            "zipf_intercept"
        ),
        F.round(F.col("__r") * F.col("__r"), 6).alias("r2"),
    )


def degenerate_flag(
    tokens_col,
    *,
    max_run: int = 100,
    min_entropy: float | None = None,
):
    """Boolean column: True when a sequence is degenerate — NULL/empty,
    one token repeated ≥ ``max_run`` times consecutively, or (when
    ``min_entropy`` is set) unigram entropy below it.  The row-local
    flag underlying `expect.degenerate_sequence_share_below`, exposed
    as a vectorized (Arrow-batched) expression so it composes into any
    plan — including STREAMING aggregations, where mapInPandas-shaped
    reports don't fit but a stateless column does.  Entropy uses the
    same half-up 6-decimal rounding as `sequence_stats`, so the two
    surfaces agree on boundary values."""
    from pyspark.sql import Column

    @F.pandas_udf("boolean")
    def flag(s: pd.Series) -> pd.Series:
        out = np.empty(len(s), dtype=bool)
        for i, arr in enumerate(s):
            t = _int_tokens(arr)
            n = 0 if t is None else int(t.size)
            if n == 0:
                out[i] = True
                continue
            change = np.flatnonzero(t[1:] != t[:-1])
            edges = np.concatenate(([-1], change, [n - 1]))
            bad = int(np.diff(edges).max()) >= max_run
            if not bad and min_entropy is not None:
                _, counts = np.unique(t, return_counts=True)
                ent = _round6(
                    float(np.log(n))
                    - float((counts * np.log(counts)).sum()) / n
                )
                bad = ent < min_entropy
            out[i] = bad
        return pd.Series(out)

    col = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    return flag(col)


def token_affix_report(
    df: DataFrame,
    *,
    k: int = 16,
    side: str = "prefix",
    min_docs: int = 2,
    top: int = 25,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Boilerplate-affix audit over pre-tokenized sequences: which exact
    first-``k`` (``side="prefix"``) or last-``k`` (``side="suffix"``)
    token-id slices are shared by ``min_docs``+ sequences.  Shared
    affixes mark templated headers/footers — licence banners, prompt
    scaffolds, chat-format preambles — that exact whole-sequence dedup
    misses (the bodies differ) and that inflate n-gram duplication
    metrics without being actionable.  The report names the template so
    a cleaning pass can strip it.

    Returns ``(rank, affix array<int>, n_docs, exemplar_id, doc_share)``
    ranked by (n_docs DESC, exemplar_id ASC) and cut to ``top`` rows;
    ``doc_share`` is n_docs over the sequences long enough to have the
    affix (size ≥ k), half-up-rounded to 6dp.

    Scale shape: one scan; the groupBy key is the k-int slice itself, so
    with partial aggregation the exchange carries
    distinct-affixes-per-partition rows of ~4k bytes each — for the
    useful k range (8-64) that is at or below the width of carrying a
    hash + exemplar and needs no join-back to render the template.  The
    ranking window runs over the ≥min_docs survivors only (duplicated
    affixes, a vanishing fraction of a web corpus), and the one-row
    eligible-total joins back via broadcast.  For k ≫ 64 group on
    ``xxhash64(cast(slice as string))`` and re-attach one exemplar slice
    by joining the top rows back on exemplar_id (two scans, 8-byte
    keys); not the default because it forks the oracle-checkable shape.
    """
    if side not in ("prefix", "suffix"):
        raise ValueError("side must be 'prefix' or 'suffix'")
    toks = F.col(tokens_col)
    sl = (
        F.slice(toks, 1, k)
        if side == "prefix"
        else F.slice(toks, -k, k)
    )
    eligible = df.where(F.size(toks) >= k).select(
        sl.alias("affix"), F.col(id_col).alias("__id")
    )
    grouped = eligible.groupBy("affix").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("__id").alias("exemplar_id"),
    )
    total = eligible.agg(F.count(F.lit(1)).alias("__total"))
    from pyspark.sql import Window

    ranked = (
        grouped.where(F.col("n_docs") >= min_docs)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("n_docs").desc(), F.col("exemplar_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= top)
    )
    # the global window sorts only the ≥min_docs survivors (bounded);
    # the 1-row total is a broadcast-nested-loop attach.
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "affix",
        "n_docs",
        "exemplar_id",
        F.round(
            F.col("n_docs") / F.greatest(F.col("__total"), F.lit(1)), 6
        ).alias("doc_share"),
    )


def strip_affix(
    df: DataFrame,
    *,
    k: int = 16,
    side: str = "prefix",
    min_docs: int = 2,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Cleaning companion to `token_affix_report`: remove the first-``k``
    (or last-``k``) tokens from every sequence whose affix is shared by
    ``min_docs``+ sequences — the report names the boilerplate template,
    this op strips it.  Adds ``affix_stripped`` (boolean); when the
    input carries an ``n_tok`` column it is recomputed for stripped
    rows.

    Scale shape: two passes over the fact.  Pass 1 derives the
    boilerplate set with the same partial-aggregated slice groupBy as
    the report (exchange = distinct-affixes-per-partition, ~4k-byte
    keys); the ≥min_docs survivors — a vanishing fraction of a web
    corpus — are then BROADCAST, so pass 2 is a map-side hash probe and
    the fact table itself never shuffles."""
    if side not in ("prefix", "suffix"):
        raise ValueError("side must be 'prefix' or 'suffix'")
    toks = F.col(tokens_col)
    sl = F.slice(toks, 1, k) if side == "prefix" else F.slice(toks, -k, k)
    boiler = (
        df.where(F.size(toks) >= k)
        .groupBy(sl.alias("__affix"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_docs)
        .select("__affix")
    )
    probed = df.withColumn(
        "__sl", F.when(F.size(toks) >= k, sl)
    ).join(
        F.broadcast(boiler), F.col("__sl") == F.col("__affix"), "left"
    )
    hit = F.col("__affix").isNotNull()
    stripped = (
        F.slice(toks, k + 1, F.size(toks) - k)
        if side == "prefix"
        else F.slice(toks, 1, F.size(toks) - k)
    )
    out = probed.withColumn(
        tokens_col, F.when(hit, stripped).otherwise(toks)
    ).withColumn("affix_stripped", hit).drop("__sl", "__affix")
    if "n_tok" in df.columns:
        out = out.withColumn(
            "n_tok",
            F.when(
                F.col("affix_stripped"), F.size(F.col(tokens_col))
            ).otherwise(F.col("n_tok")),
        )
    return out


_PRETOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def fertility_report(
    docs: DataFrame, *, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Tokenizer fertility by group (typically language): tokens per
    whitespace word, bytes per token, chars per word — the metric that
    decides whether a tokenizer under- or over-segments a language
    (fertility ≫ 1 means the vocab serves that language poorly).

    Tokens here are the GPT-2-ish PRETOKENIZATION units (alnum runs +
    each standalone symbol, ``[A-Za-z0-9]+|[^A-Za-z0-9\\s]`` — RE2-safe,
    no lookbehind, so any engine reproduces it); with a learned merge
    table, substitute ``size(bpe_encode_ids(...))`` for ``n_tokens`` —
    the aggregation shape is identical. Counting happens inside codegen
    (``regexp_count``), the only exchange is |groups| scalar partials.
    """
    t = F.col(text_col)
    base = docs.select(
        F.col(group_col),
        F.regexp_count(t, F.lit(r"\S+")).cast("long").alias("__nw"),
        F.regexp_count(t, F.lit(_PRETOKEN_RE)).cast("long").alias("__nt"),
        F.octet_length(t).cast("long").alias("__nb"),
        F.length(t).cast("long").alias("__nc"),
    )
    return base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nw").alias("n_words"),
        F.sum("__nt").alias("n_tokens"),
        F.round(
            F.sum("__nt").cast("double") / F.greatest(F.sum("__nw"), F.lit(1)), 6
        ).alias("tokens_per_word"),
        F.round(
            F.sum("__nb").cast("double") / F.greatest(F.sum("__nt"), F.lit(1)), 6
        ).alias("bytes_per_token"),
        F.round(
            F.sum("__nc").cast("double") / F.greatest(F.sum("__nw"), F.lit(1)), 6
        ).alias("chars_per_word"),
    )

"""Unigram language-model scoring over pre-tokenized training sequences.

The cheapest model-based quality signal a corpus owner runs before the
expensive ones (KenLM, a learned classifier): train a smoothed unigram LM
on the corpus itself and score every sequence's mean token log-probability
/ perplexity.  Sequences whose perplexity is far above the corpus norm are
gibberish/binary-noise candidates; far below are degenerate repetition —
the two tails every published pipeline (CCNet, Gopher, RefinedWeb) trims.

Reference parity: the reference validates rows against a declared model
(`/root/reference/vldt/models.py`); this is the statistical analogue — the
"model" is learned from the corpus and every row is scored against it.

Scale design (10^12 sequences, |vocab| ~ 10^5):
- TRAIN is `token_histogram`'s per-partition dense numpy-bincount fold:
  token arrays never ride a shuffle; the exchange carries at most |vocab|
  rows per partition and the final aggregate is |vocab|-sized.
- The smoothed log-prob table is |vocab| float64s (~1 MB at 10^5) —
  collected once on the driver (the same bounded-collect family as the
  Bloom bitmap partials in checks/referential.py) and shipped to executors
  as a closure broadcast inside ONE Arrow-batched `mapInPandas` scoring
  pass.  SCORE is therefore a pure scan: zero exchanges, zero joins.
- The naive alternative — explode(tokens) ⋈ logp_table → groupBy(doc) —
  ships n_rows × seq_len rows through TWO exchanges; at 10^12 × 1k tokens
  that is 10^15 shuffle rows.  It exists here only as the DuckDB oracle.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vldt_spark.functions.tokens import _int_tokens, token_histogram

__all__ = ["unigram_lm_table", "unigram_logprob", "unigram_lm_vector"]


def _round6(x: float) -> float:
    """Half-up 6-decimal rounding (matches DuckDB round(); Python round()
    is banker's)."""
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def _train_counts(
    df: DataFrame, vocab_size: int, tokens_col: str
) -> tuple[np.ndarray, int]:
    """Dense in-vocab count vector + total in-vocab token count N.

    Bounded driver collect: |vocab|+1 rows (token_histogram folds OOV and
    NULL elements under token = -1; those are excluded from N — the model
    is defined over [0, vocab) and OOV tokens score at the unseen floor).
    """
    rows = token_histogram(df, vocab_size, tokens_col=tokens_col).collect()
    counts = np.zeros(vocab_size, dtype=np.int64)
    for r in rows:
        t = r["token"]
        if 0 <= t < vocab_size:
            counts[t] = r["cnt"]
    return counts, int(counts.sum())


def unigram_lm_table(
    df: DataFrame, vocab_size: int, *, tokens_col: str = "tokens"
) -> DataFrame:
    """Add-one-smoothed unigram LM as a (token, cnt, logp) DataFrame.

    logp(t) = ln((cnt_t + 1) / (N + |vocab|)) for every t in [0, vocab) —
    including never-seen ids, whose smoothed mass is the OOV/unseen floor.
    |vocab| rows total; downstream consumers broadcast it.
    """
    counts, total = _train_counts(df, vocab_size, tokens_col)
    denom = float(total + vocab_size)
    spark = df.sparkSession
    pdf = pd.DataFrame(
        {
            "token": np.arange(vocab_size, dtype=np.int64),
            "cnt": counts,
            "logp": np.log((counts + 1.0) / denom),
        }
    )
    return spark.createDataFrame(pdf, schema="token long, cnt long, logp double")


def unigram_lm_vector(
    df: DataFrame, vocab_size: int, *, tokens_col: str = "tokens"
) -> tuple[list[float], float]:
    """The trained model as plain Python: (logp vector over [0, vocab),
    unseen/OOV floor) — the hand-off shape for the streaming scorer
    (`streaming/lm_stream.stream_ppl_windows`), which closes over it."""
    counts, total = _train_counts(df, vocab_size, tokens_col)
    denom = float(total + vocab_size)
    logp = np.log((counts + 1.0) / denom)
    return logp.tolist(), math.log(1.0 / denom)


def unigram_logprob(
    df: DataFrame,
    vocab_size: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-sequence mean token log-prob + perplexity under the corpus's own
    add-one-smoothed unigram LM.

    Returns (id_col, n_tok int, mean_logp double, ppl double); sequences
    with NULL/empty token arrays get n_tok = 0 and NULL scores (SQL AVG over
    an empty group).  OOV ids (outside [0, vocab)) and NULL elements score
    at the unseen floor ln(1 / (N + |vocab|)).

    Two passes over the fact table, zero exchanges of token arrays: the
    |vocab|-bounded train fold, then one mapInPandas scoring scan with the
    log-prob vector closed over (see module docstring for why not a join).
    """
    counts, total = _train_counts(df, vocab_size, tokens_col)
    logp = np.log((counts + 1.0) / float(total + vocab_size))
    floor = math.log(1.0 / float(total + vocab_size))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, means, ppls = [], [], [], []
            for did, arr in zip(pdf[id_col], pdf[tokens_col]):
                t = _int_tokens(arr)
                ids.append(did)
                if t is None or t.size == 0:
                    ns.append(0)
                    means.append(None)
                    ppls.append(None)
                    continue
                in_range = (t >= 0) & (t < vocab_size)
                lp = np.where(in_range, logp[np.clip(t, 0, vocab_size - 1)], floor)
                m = float(lp.mean())
                p = float(math.exp(-m))
                if round_to is not None:
                    q = 10.0**round_to
                    m = math.floor(m * q + 0.5) / q if m >= 0 else -math.floor(-m * q + 0.5) / q
                    p = math.floor(p * q + 0.5) / q
                ns.append(int(t.size))
                means.append(m)
                ppls.append(p)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tok": pd.array(ns, dtype="int32"),
                    "mean_logp": pd.array(means, dtype="float64"),
                    "ppl": pd.array(ppls, dtype="float64"),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, tokens_col).mapInPandas(
        score, schema=f"{id_col} {id_type}, n_tok int, mean_logp double, ppl double"
    )

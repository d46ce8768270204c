"""Declarative check-suite runner — the data-contract entry point.

A ``Suite`` is an ordered list of expectations over one table; ``run``
produces a single report DataFrame (check, column, metric, threshold,
passed). This is the whole-table analogue of declaring a reference model
with constraints and asking "does the table conform?" — and the shape
every orchestration layer (Airflow sensor, CI gate, publish guard) wants.

Execution plan, not a loop of jobs:

  * every ROW-LOCAL expectation (not_null / null_rate / range / regex /
    isin) compiles into ONE fused aggregate pass over the table — a
    single scan with map-side combine, |expectations| output numbers;
  * uniqueness runs as the salted two-stage aggregate (B5), referential
    integrity as distinct-FK anti-join (B6), drift as the histogram PSI
    (B7) — each a bounded-output job on its key column only;
  * the report is the union of tiny one-row frames — driver-side cheap.

At 100 TB the whole suite therefore costs one full scan plus
dim-cardinality aggregates, the same budget as ``engine.run``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round6(x: float) -> float:
    """Half-up rounding to 6 decimals — same `floor(x*1e6+0.5)` convention
    as the decode-stats surface (functions/multimodal.py), matching DuckDB
    `round()` on the non-negative metrics suites report; Python's builtin
    `round` is banker's and diverges on exact 5e-7 boundaries. NaN/inf pass
    through unchanged (failed-expectation sentinels)."""
    import math

    if x != x or math.isinf(x):
        return x
    return math.floor(x * 1e6 + 0.5) / 1e6


@dataclass(frozen=True)
class Expectation:
    kind: str
    column: str
    params: dict = field(default_factory=dict)


class expect:
    """Factory namespace for expectations (Great-Expectations-style
    surface re-expressed as Catalyst aggregates)."""

    @staticmethod
    def not_null(column: str, *, max_nulls: int = 0) -> Expectation:
        return Expectation("not_null", column, {"max_nulls": max_nulls})

    @staticmethod
    def null_rate_below(column: str, rate: float) -> Expectation:
        return Expectation("null_rate_below", column, {"rate": rate})

    @staticmethod
    def range(
        column: str,
        *,
        lo: Any = None,
        hi: Any = None,
        lo_strict: bool = False,
        hi_strict: bool = False,
        max_violations: int = 0,
    ) -> Expectation:
        """Violations: value < lo (or <= lo when lo_strict — i.e. the
        declared constraint is value > lo), symmetrically for hi."""
        return Expectation(
            "range",
            column,
            {
                "lo": lo,
                "hi": hi,
                "lo_strict": lo_strict,
                "hi_strict": hi_strict,
                "max_violations": max_violations,
            },
        )

    @staticmethod
    def regex(column: str, pattern: str, *, max_violations: int = 0) -> Expectation:
        return Expectation(
            "regex", column, {"pattern": pattern, "max_violations": max_violations}
        )

    @staticmethod
    def isin(column: str, values: list, *, max_violations: int = 0) -> Expectation:
        return Expectation(
            "isin", column, {"values": list(values), "max_violations": max_violations}
        )

    @staticmethod
    def element_range(
        column: str, *, lo: Any = None, hi: Any = None, max_violations: int = 0
    ) -> Expectation:
        """Array-column element bounds — e.g. every token id inside the
        vocabulary (the north-star token table's core invariant). A row
        violates when ANY element is out of range (exists(), row-local —
        fuses into the single aggregate pass and streams)."""
        return Expectation(
            "element_range",
            column,
            {"lo": lo, "hi": hi, "max_violations": max_violations},
        )

    @staticmethod
    def length_between(
        column: str, *, lo: int | None = None, hi: int | None = None,
        max_violations: int = 0,
    ) -> Expectation:
        """String length bounds (Field(min_size/max_size) on str)."""
        return Expectation(
            "length_between", column,
            {"lo": lo, "hi": hi, "max_violations": max_violations},
        )

    @staticmethod
    def size_between(
        column: str, *, lo: int | None = None, hi: int | None = None,
        max_violations: int = 0,
    ) -> Expectation:
        """Array/map cardinality bounds (Field(min_size/max_size) on
        containers)."""
        return Expectation(
            "size_between", column,
            {"lo": lo, "hi": hi, "max_violations": max_violations},
        )

    @staticmethod
    def unique(column, *, max_dup_rows: int = 0) -> Expectation:
        cols = [column] if isinstance(column, str) else list(column)
        return Expectation("unique", ",".join(cols), {"columns": cols, "max_dup_rows": max_dup_rows})

    @staticmethod
    def ref(
        column: str, dim: DataFrame, dim_key: str, *, max_violations: int = 0
    ) -> Expectation:
        return Expectation(
            "ref", column, {"dim": dim, "dim_key": dim_key, "max_violations": max_violations}
        )

    @staticmethod
    def row_count_between(
        lo: int = 0, hi: int | None = None
    ) -> Expectation:
        """Table-level volume guard (an empty or truncated input is the
        most common upstream failure). metric = row count."""
        return Expectation("row_count_between", "*", {"lo": lo, "hi": hi})

    @staticmethod
    def distinct_count_between(
        column: str, lo: int = 0, hi: int | None = None, *, approx: bool = True
    ) -> Expectation:
        """Cardinality guard. ``approx`` uses the HyperLogLog++ sketch
        (the only option at 10^12 rows); ``approx=False`` is exact for
        small tables / oracle checks."""
        return Expectation(
            "distinct_count_between", column, {"lo": lo, "hi": hi, "approx": approx}
        )

    @staticmethod
    def quantile_between(
        column: str,
        prob: float,
        lo: float | None = None,
        hi: float | None = None,
        *,
        exact: bool = False,
        accuracy: int = 10000,
    ) -> Expectation:
        """Distributional position guard (e.g. median inside a band).
        Default is the mergeable percentile_approx sketch; ``exact=True``
        buffers values (small tables / oracle checks only)."""
        return Expectation(
            "quantile_between",
            column,
            {"prob": prob, "lo": lo, "hi": hi, "exact": exact, "accuracy": accuracy},
        )

    @staticmethod
    def psi_below(
        column: str,
        ref_df: DataFrame,
        threshold: float,
        *,
        bins: int = 20,
        lo: float | None = None,
        hi: float | None = None,
    ) -> Expectation:
        return Expectation(
            "psi_below",
            column,
            {"ref": ref_df, "threshold": threshold, "bins": bins, "lo": lo, "hi": hi},
        )

    @staticmethod
    def ks_below(
        column: str,
        ref_df: DataFrame,
        threshold: float,
        *,
        bins: int = 20,
        lo: float | None = None,
        hi: float | None = None,
    ) -> Expectation:
        """Binned KS drift guard vs a reference frame — same bounded
        histogram budget as psi_below, max |ΔCDF| metric (more sensitive
        to localized shifts than PSI's sum)."""
        return Expectation(
            "ks_below",
            column,
            {"ref": ref_df, "threshold": threshold, "bins": bins, "lo": lo, "hi": hi},
        )

    @staticmethod
    def js_below(
        column: str,
        ref_df: DataFrame,
        threshold: float,
        *,
        bins: int = 20,
        lo: float | None = None,
        hi: float | None = None,
    ) -> Expectation:
        """Jensen-Shannon drift guard — symmetric and bounded [0, ln 2],
        so the same threshold is meaningful across columns (unlike KL,
        which is unbounded, or PSI, whose scale depends on eps)."""
        return Expectation(
            "js_below",
            column,
            {"ref": ref_df, "threshold": threshold, "bins": bins, "lo": lo, "hi": hi},
        )

    @staticmethod
    def wasserstein_below(
        column: str,
        ref_df: DataFrame,
        threshold: float,
        *,
        bins: int = 20,
        lo: float | None = None,
        hi: float | None = None,
    ) -> Expectation:
        """Binned 1-Wasserstein drift guard — threshold is in the COLUMN'S
        OWN UNITS ("alert if the token-length distribution moved more than
        15 tokens"), the most interpretable of the drift guards."""
        return Expectation(
            "wasserstein_below",
            column,
            {"ref": ref_df, "threshold": threshold, "bins": bins, "lo": lo, "hi": hi},
        )

    @staticmethod
    def schema_stable(previous_df: DataFrame, *, allow_added: bool = False) -> Expectation:
        """Schema-evolution guard: fails when the table's schema changed
        vs a previous snapshot (dropped/retyped/nullability always count;
        ``allow_added=True`` tolerates new columns — the backward-
        compatible evolution). Metric = number of offending changes.
        METADATA-ONLY: no job runs against either table."""
        return Expectation(
            "schema_stable", "*", {"previous": previous_df, "allow_added": allow_added}
        )

    @staticmethod
    def heavy_hitter_share_below(column: str, share: float) -> Expectation:
        """Degenerate-skew guard: the single most frequent value of
        ``column`` must hold LESS THAN ``share`` of all non-null rows —
        catches one domain/source flooding a corpus, a constant column
        masquerading as data, or a hot key that will skew every downstream
        join. One bounded aggregate (count per value, max over counts)."""
        return Expectation("heavy_hitter_share_below", column, {"share": share})

    @staticmethod
    def mean_ppl_between(
        tokens_col: str, lo: float, hi: float, *, vocab_size: int
    ) -> Expectation:
        """Model-based corpus-health guard: the mean unigram-LM perplexity
        over all scoreable sequences (the corpus scored against its OWN
        add-one-smoothed unigram model, `functions/lm.unigram_logprob`)
        must lie in [lo, hi].  A corpus drifting ABOVE its usual band is
        filling with gibberish/binary noise; BELOW means degenerate
        repetition is taking over — the two tails every published pipeline
        (CCNet, Gopher, RefinedWeb) trims.  Costs the LM train fold plus
        one scoring scan; token arrays never shuffle."""
        return Expectation(
            "mean_ppl_between",
            tokens_col,
            {"lo": lo, "hi": hi, "vocab_size": vocab_size},
        )

    @staticmethod
    def skew_factor_below(column: str, factor: float) -> Expectation:
        """Reducer-skew guard for a prospective groupBy/join key: the
        hottest value of ``column`` must carry LESS THAN ``factor`` × the
        average per-key row count (the `key_skew_report` skew_factor) —
        the declarative form of "will one reducer drown when we shuffle
        on this key".  Complements heavy_hitter_share_below: share is
        absolute corpus fraction, this is relative to key cardinality, so
        it still fires on a million-key column whose hot key is only 1%
        of rows but 10,000× the average reducer load.  Same bounded
        per-key aggregate as `key_skew_report` (plans/skew.py)."""
        return Expectation("skew_factor_below", column, {"factor": factor})

    @staticmethod
    def partition_skew_below(
        part_cols: str | list[str], factor: float
    ) -> Expectation:
        """Layout guard on a (possibly multi-column) logical partition
        key: the hottest partition must carry LESS THAN ``factor`` × the
        mean partition row count (`partition_health_summary`'s
        max_skew_factor, checks/layout.py) — the declarative form of
        "can a 1000-executor job read this table without one partition
        serializing it".  One map-side-combined aggregate."""
        cols = [part_cols] if isinstance(part_cols, str) else list(part_cols)
        return Expectation(
            "partition_skew_below", ",".join(cols),
            {"columns": cols, "factor": factor},
        )

    @staticmethod
    def dup_ngram_fraction_below(
        text_col: str,
        threshold: float,
        *,
        id_col: str = "doc_id",
        shingle_k: int = 3,
    ) -> Expectation:
        """Corpus-duplication guard (Lee et al. 2022 train-train
        overlap): the corpus-wide duplicated-shingle fraction —
        sum(n_duplicated) / sum(n_shingles) over
        ``duplicated_ngram_fraction`` — must stay BELOW the threshold.
        The declarative form of the dup-n-gram health check: one
        shingle-keyed aggregate plus a semi-join against the
        duplicated-only set, reduced to a single scalar."""
        return Expectation(
            "dup_ngram_fraction_below",
            text_col,
            {"threshold": threshold, "id_col": id_col, "shingle_k": shingle_k},
        )

    @staticmethod
    def contamination_below(
        text_col: str,
        benchmark: DataFrame,
        threshold: float,
        *,
        id_col: str = "doc_id",
        shingle_k: int = 13,
        bench_text_col: str | None = None,
        shingle_impl: str = "expr",
    ) -> Expectation:
        """Eval-contamination guard (GPT-3 13-gram screen): the fraction
        of corpus documents sharing ANY word ``shingle_k``-gram with the
        benchmark set must stay BELOW the threshold. Benchmark shingles
        broadcast; the corpus is scanned once (``contamination_report``)."""
        return Expectation(
            "contamination_below",
            text_col,
            {
                "threshold": threshold,
                "benchmark": benchmark,
                "id_col": id_col,
                "shingle_k": shingle_k,
                "bench_text_col": bench_text_col,
                "shingle_impl": shingle_impl,
            },
        )

    @staticmethod
    def degenerate_sequence_share_below(
        tokens_col: str,
        share: float,
        *,
        max_run: int = 100,
        min_entropy: float | None = None,
    ) -> Expectation:
        """Degenerate-sequence guard over the input_hint token shape:
        the fraction of sequences that are degenerate — empty/NULL, a
        single token repeated ≥ ``max_run`` times consecutively, or
        (when ``min_entropy`` is set) unigram entropy below it — must
        stay BELOW ``share``.  Catches decoder collapse, boilerplate
        loops, and gibberish before they reach training.  Runs as ONE
        row-local `sequence_stats` pass (scan → mapInPandas, zero
        exchanges) reduced to a single scalar."""
        return Expectation(
            "degenerate_sequence_share_below",
            tokens_col,
            {"share": share, "max_run": max_run, "min_entropy": min_entropy},
        )

    @staticmethod
    def gopher_pass_frac_above(
        text_col: str, threshold: float, **rule_thresholds
    ) -> Expectation:
        """Corpus-quality guard on the Gopher rule bundle: the fraction
        of documents passing ALL rules (``gopher_report.pass_frac``)
        must stay ABOVE the threshold. Keyword args tune individual rule
        thresholds (``min_words=20`` etc., see
        ``functions.text.gopher_rules``). One codegen projection + one
        scalar aggregate — the corpus never shuffles."""
        return Expectation(
            "gopher_pass_frac_above",
            text_col,
            {"threshold": threshold, "rules": dict(rule_thresholds)},
        )

    @staticmethod
    def c4_pass_frac_above(
        text_col: str, threshold: float, **rule_thresholds
    ) -> Expectation:
        """Corpus-quality guard on the C4 cleaning bundle (Raffel et al.
        2020 §2.2): the fraction of documents passing the document rules
        (no lorem ipsum, no curly brace, ≥3 surviving sentences, ≥1 kept
        line — ``c4_report.pass_frac``) must stay ABOVE the threshold.
        Keyword args tune ``min_words`` / ``min_sentences`` (see
        ``functions.text.c4_rules``).  One codegen projection + one
        scalar aggregate — the corpus never shuffles."""
        return Expectation(
            "c4_pass_frac_above",
            text_col,
            {"threshold": threshold, "rules": dict(rule_thresholds)},
        )

    @staticmethod
    def fertility_between(text_col: str, lo: float, hi: float) -> Expectation:
        """Tokenizer-fertility guard: corpus-wide pretokenization units
        per whitespace word (``functions.tokens.fertility_report``'s
        tokens_per_word, computed over the whole table) must stay in
        [lo, hi]. Fertility drifting up means the corpus mix shifted
        toward content the tokenizer segments poorly. Codegen
        ``regexp_count`` + one scalar aggregate."""
        return Expectation(
            "fertility_between", text_col, {"lo": lo, "hi": hi}
        )

    @staticmethod
    def snapshot_churn_below(
        previous_df: DataFrame,
        threshold: float,
        *,
        id_col: str = "doc_id",
        compare_cols: list[str] | None = None,
    ) -> Expectation:
        """Data-version churn guard: the fraction of diff rows that are
        NOT unchanged between ``previous_df`` and the table under test —
        (added + removed + changed) / all ids in either version — must
        stay BELOW the threshold. The row-level companion of
        ``schema_stable``: a pipeline change that silently rewrites or
        drops a chunk of the corpus trips this before training does.
        Cost = `snapshot_diff`'s one id-keyed full-outer join reduced to
        two scalars (see checks/snapshot.py for the zero-exchange
        bucketed-storage path)."""
        return Expectation(
            "snapshot_churn_below",
            id_col,
            {
                "previous": previous_df,
                "threshold": threshold,
                "compare_cols": compare_cols,
            },
        )

    @staticmethod
    def split_leakage_below(
        pairs: DataFrame,
        threshold: float,
        *,
        weights: dict[str, float] | None = None,
        use_table_splits: bool = False,
        id_cols: tuple[str, str] = ("id_a", "id_b"),
        id_col: str = "doc_id",
        split_col: str = "split",
        seed: int = 0,
        hash_fn: str = "xxhash64",
    ) -> Expectation:
        """Train/eval leakage guard: the fraction of near-dup ``pairs``
        that straddle two splits must stay BELOW the threshold (0 pairs
        straddling = clean; set threshold near 0 after a
        ``split_assign_clustered`` build, where leakage is structurally
        zero). Pass ``weights=`` when splits follow the ``split_assign``
        law (recomputed row-locally, zero joins), or
        ``use_table_splits=True`` to read (id_col, split_col) from the
        table under test itself. A corpus with NO pairs scores 0.0 and
        passes — unlike the empty-population guards, an empty pair set
        is a meaningful clean state (no near-duplicates exist to leak),
        not an undefined metric."""
        if (weights is None) == (not use_table_splits):
            raise ValueError(
                "split_leakage_below: pass exactly one of weights= or use_table_splits=True"
            )
        return Expectation(
            "split_leakage_below",
            id_col,
            {
                "pairs": pairs,
                "threshold": threshold,
                "weights": weights,
                "use_table_splits": use_table_splits,
                "id_cols": id_cols,
                "split_col": split_col,
                "seed": seed,
                "hash_fn": hash_fn,
            },
        )

    @staticmethod
    def mixture_gap_below(
        group_col: str,
        token_col: str,
        target_shares: dict[str, float],
        threshold: float,
    ) -> Expectation:
        """Mixture-fidelity guard: the worst per-source deviation between
        the corpus's achieved token share and its normalized target —
        ``max_s |achieved_s − w_s|`` over the named sources — must stay
        BELOW the threshold. The acceptance check for a corpus built by
        ``mixture_epochs`` / ``temperature_sample``: a drifting ingest or
        a mis-applied epoch table shows up here as one scalar. Shares are
        computed over the named sources' token mass (the same frame
        ``mixture_epochs_report`` uses). One |sources|-row aggregate —
        the corpus never shuffles."""
        if not target_shares:
            raise ValueError("mixture_gap_below: target_shares must name at least one source")
        if sum(target_shares.values()) <= 0:
            raise ValueError("mixture_gap_below: shares must have a positive sum")
        return Expectation(
            "mixture_gap_below",
            group_col,
            {
                "token_col": token_col,
                "shares": dict(target_shares),
                "threshold": threshold,
            },
        )

    @staticmethod
    def auc_above(
        score_col: str,
        label_col: str,
        threshold: float,
        *,
        quantize: int | None = None,
    ) -> Expectation:
        """Filter-model ranking guard: the exact tie-aware ROC AUC of
        ``score_col`` against boolean/0-1 ``label_col`` must stay ABOVE
        the threshold — the acceptance check for a model-based quality
        filter (a classifier whose AUC on a labeled audit slice sags is
        silently letting junk through). Runs as ``auc_report``
        (checks/classifier_eval.py): one score-keyed hash aggregate plus
        a running sum over the |distinct scores|-bounded relation — the
        fact table never globally sorts. ``quantize`` bounds the grouped
        relation for continuous scores. Single-class slices fail
        (metric NaN): an audit set with no negatives certifies nothing."""
        return Expectation(
            "auc_above",
            score_col,
            {"label_col": label_col, "threshold": threshold, "quantize": quantize},
        )

    @staticmethod
    def ece_below(
        score_col: str,
        label_col: str,
        threshold: float,
        *,
        n_bins: int = 10,
    ) -> Expectation:
        """Filter-model calibration guard: the expected calibration error
        of probability-shaped ``score_col`` against ``label_col`` must
        stay BELOW the threshold — AUC's complement (ranking can be
        perfect while the probabilities a downstream threshold consumes
        are meaningless). Runs as ``ece_report``: one ≤ n_bins-partial
        hash aggregate with integer micro-score sums, bit-deterministic
        at any partitioning."""
        return Expectation(
            "ece_below",
            score_col,
            {"label_col": label_col, "threshold": threshold, "n_bins": n_bins},
        )

    @staticmethod
    def brier_below(
        score_col: str,
        label_col: str,
        threshold: float,
    ) -> Expectation:
        """Filter-model proper-scoring guard: the Brier score (mean
        squared error of the probability forecast) of ``score_col``
        against ``label_col`` must stay BELOW the threshold. The unbinned
        complement of ece_below — a model can game coarse bins but not a
        proper scoring rule. Runs as ``brier_report``: one scan, integer
        (m − y·1e6)² numerators summed as decimal(38,0). Empty audit
        slice fails (metric NaN)."""
        return Expectation(
            "brier_below",
            score_col,
            {"label_col": label_col, "threshold": threshold},
        )

    @staticmethod
    def average_precision_above(
        score_col: str,
        label_col: str,
        threshold: float,
        *,
        quantize: int | None = None,
    ) -> Expectation:
        """Filter-model imbalance-aware ranking guard: the average
        precision (step-interpolated PR-AUC) of ``score_col`` against
        ``label_col`` must stay ABOVE the threshold. The companion to
        auc_above for the quality-filter regime — junk is a small
        minority, and ROC AUC barely moves when the TOP of the ranking
        is polluted while AP collapses. Runs as ``pr_report``
        (checks/classifier_eval.py): one score-keyed hash aggregate plus
        running sums over the |distinct scores|-bounded relation; the
        fact table never globally sorts. Single-class / empty audit
        slices fail (metric NaN)."""
        return Expectation(
            "average_precision_above",
            score_col,
            {"label_col": label_col, "threshold": threshold, "quantize": quantize},
        )

    @staticmethod
    def pii_frac_below(text_col: str, threshold: float) -> Expectation:
        """Corpus-safety guard: the fraction of documents matching ANY
        `pii_flags` screen pattern (email / IP / phone) must stay BELOW
        the threshold — the declarative acceptance check run before a
        corpus ships, and the gate that decides whether a `pii_redact`
        pass is required at all. One conditional scalar aggregate over
        row-local regex screens (map-side combined, zero exchange of
        the fact table); empty corpus fails loud (NaN metric)."""
        return Expectation("pii_frac_below", text_col, {"threshold": threshold})

    @staticmethod
    def distinct_text_frac_above(
        text_col: str, threshold: float, *, approx: bool = False
    ) -> Expectation:
        """Exact-duplication health guard: distinct normalized-text
        fingerprints / total rows must stay ABOVE the threshold (1.0 =
        fully deduplicated corpus). The declarative arm of the
        `exact_duplicates` family and the `corpus_card`
        distinct_text_frac metric; ``approx=True`` swaps the exact
        count_distinct for HLL at 10^12 rows. Empty corpus fails loud
        (NaN metric)."""
        return Expectation(
            "distinct_text_frac_above",
            text_col,
            {"threshold": threshold, "approx": approx},
        )

    @staticmethod
    def distinct_seq_frac_above(
        tokens_col: str, threshold: float, *, approx: bool = False
    ) -> Expectation:
        """Token twin of ``distinct_text_frac_above``: distinct exact
        token SEQUENCES / total rows must stay ABOVE the threshold —
        the declarative arm of the ``token_exact_duplicates`` family.
        Keyed on the array-native 128-bit ``token_sequence_key`` (two
        salted xxhash64 passes, zero string rendering); the metric is a
        ratio of distinct counts, hash-agnostic at any collision-free
        scale, so the SQL oracle replays it off the raw sequences even
        though xxhash64 itself is not portable. ``approx=True`` swaps
        the exact count_distinct for HLL at 10^12 rows. Empty corpus
        fails loud (NaN metric)."""
        return Expectation(
            "distinct_seq_frac_above",
            tokens_col,
            {"threshold": threshold, "approx": approx},
        )

    @staticmethod
    def centroid_cosine_above(
        column: str, ref_df: DataFrame, threshold: float
    ) -> Expectation:
        """Embedding-space drift guard: cosine between the table's mean
        vector (``column`` is an array<float> embedding) and the
        reference frame's must stay ABOVE the threshold (1.0 = no
        movement). Runs as ``embedding_drift``'s dim-cardinality
        aggregates — no vector ever shuffles. Fails (metric NaN) on an
        empty table or a zero centroid, where cosine is undefined."""
        return Expectation(
            "centroid_cosine_above", column, {"ref": ref_df, "threshold": threshold}
        )


_ROW_LOCAL = {
    "not_null",
    "null_rate_below",
    "range",
    "regex",
    "isin",
    "element_range",
    "length_between",
    "size_between",
}

REPORT_COLS = ["check", "column", "metric", "threshold", "passed"]


class Suite:
    def __init__(self, expectations: list[Expectation]):
        self.expectations = list(expectations)

    @classmethod
    def from_model(
        cls, model, *, dims: dict[str, DataFrame] | None = None
    ) -> "Suite":
        """Derive a table contract from a declarative Model: every
        Field(ge/le/gt/lt/regex/isin/not_null/unique) and non-optional
        annotation becomes the corresponding expectation, and
        ``Field(ref=(dim_name, key))`` becomes a referential check when
        ``dims`` supplies the dimension. A reference user's per-object
        model therefore doubles as the whole-table data contract.

        gt/lt map to strict bounds (``lo_strict``/``hi_strict``) so the
        expectation counts exactly the rows the fused pass would flag."""
        dims = dims or {}
        compiled = model.__vldt_compile__()
        exps: list[Expectation] = []
        for spec in compiled.fields:
            f, name = spec.field, spec.name
            # a defaulted field is filled during coercion, so raw nulls are
            # NOT a contract violation — emitting not_null here would fail
            # tables the ValidationEngine itself passes (divergent verdicts
            # for one model)
            if (f.not_null or not spec.node.is_optional) and not f.has_default:
                exps.append(expect.not_null(name))
            lo = f.ge if f.ge is not None else f.gt
            hi = f.le if f.le is not None else f.lt
            if lo is not None or hi is not None:
                exps.append(
                    expect.range(
                        name,
                        lo=lo,
                        hi=hi,
                        lo_strict=f.ge is None and f.gt is not None,
                        hi_strict=f.le is None and f.lt is not None,
                    )
                )
            e_lo = getattr(f, "element_ge", None)
            e_hi = getattr(f, "element_le", None)
            if e_lo is not None or e_hi is not None:
                exps.append(expect.element_range(name, lo=e_lo, hi=e_hi))
            if f.min_size is not None or f.max_size is not None:
                from vldt_spark.typeschema import ContainerKind

                sizer = (
                    expect.length_between
                    if spec.node.kind is ContainerKind.NONE
                    else expect.size_between
                )
                exps.append(sizer(name, lo=f.min_size, hi=f.max_size))
            if f.regex is not None:
                exps.append(expect.regex(name, f.regex))
            if f.isin is not None:
                exps.append(expect.isin(name, list(f.isin)))
            if f.unique:
                exps.append(expect.unique(name))
            if f.ref is not None:
                dim_name, dim_key = f.ref
                if dim_name in dims:
                    exps.append(expect.ref(name, dims[dim_name], dim_key))
        for combo in getattr(model, "unique_together", []) or []:
            exps.append(expect.unique(list(combo)))
        return cls(exps)

    # -- row-local tier: ONE fused aggregate ------------------------------

    @staticmethod
    def _bad_condition(e: Expectation):
        """Boolean Column: this row violates the expectation."""
        c, p = F.col(e.column), e.params
        if e.kind in ("not_null", "null_rate_below"):
            return c.isNull()
        if e.kind == "range":
            bad = F.lit(False)
            if p["lo"] is not None:
                lo = F.lit(p["lo"])
                bad = bad | (c <= lo if p.get("lo_strict") else c < lo)
            if p["hi"] is not None:
                hi = F.lit(p["hi"])
                bad = bad | (c >= hi if p.get("hi_strict") else c > hi)
            return c.isNotNull() & bad
        if e.kind == "regex":
            return c.isNotNull() & ~c.rlike(p["pattern"])
        if e.kind == "isin":
            return c.isNotNull() & ~c.isin(p["values"])
        if e.kind == "element_range":

            def oob(x):
                bad = F.lit(False)
                if p["lo"] is not None:
                    bad = bad | (x < F.lit(p["lo"]))
                if p["hi"] is not None:
                    bad = bad | (x > F.lit(p["hi"]))
                return x.isNotNull() & bad

            return c.isNotNull() & F.exists(c, oob)
        if e.kind in ("length_between", "size_between"):
            n = F.length(c) if e.kind == "length_between" else F.size(c)
            bad = F.lit(False)
            if p["lo"] is not None:
                bad = bad | (n < F.lit(p["lo"]))
            if p["hi"] is not None:
                bad = bad | (n > F.lit(p["hi"]))
            return c.isNotNull() & bad
        raise ValueError(f"not a row-local expectation: {e.kind}")

    @staticmethod
    def _report_struct(e: Expectation, i: int):
        """Report row struct from the aggregated __m_<i> / __n columns."""
        p = e.params
        m = F.col(f"__m_{i}").cast("double")
        if e.kind == "null_rate_below":
            metric = m / F.col("__n")
            threshold = F.lit(float(p["rate"]))
            passed = metric < threshold
        else:
            key = {
                "not_null": "max_nulls",
                "range": "max_violations",
                "regex": "max_violations",
                "isin": "max_violations",
                "element_range": "max_violations",
                "length_between": "max_violations",
                "size_between": "max_violations",
            }[e.kind]
            metric = m
            threshold = F.lit(float(p[key]))
            passed = metric <= threshold
        return F.struct(
            F.lit(e.kind).alias("check"),
            F.lit(e.column).alias("column"),
            F.round(metric, 6).alias("metric"),
            threshold.alias("threshold"),
            passed.alias("passed"),
        )

    def _row_local_report(self, df: DataFrame, exps: list[Expectation]) -> DataFrame | None:
        if not exps:
            return None
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(exps):
            aggs.append(F.sum(self._bad_condition(e).cast("long")).alias(f"__m_{i}"))
        wide = df.agg(*aggs)
        rows = [self._report_struct(e, i) for i, e in enumerate(exps)]
        return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")

    # -- whole-table tier: bounded-output jobs ----------------------------

    def _whole_table_report(self, df: DataFrame, e: Expectation) -> DataFrame:
        spark = df.sparkSession
        p = e.params
        if e.kind == "unique":
            from vldt_spark.checks.uniqueness import duplicate_keys

            dups = duplicate_keys(df, p["columns"])
            n_dup_rows = (
                dups.agg(F.coalesce(F.sum("n_dups"), F.lit(0)).cast("double")).first()[0]
            )
            metric, thr = float(n_dup_rows), float(p["max_dup_rows"])
            passed = metric <= thr
        elif e.kind == "ref":
            from vldt_spark.checks.referential import ri_report

            rep = ri_report(df, e.column, p["dim"], p["dim_key"])
            n_bad = rep.agg(
                F.coalesce(F.sum("n_rows"), F.lit(0)).cast("double")
            ).first()[0]
            metric, thr = float(n_bad), float(p["max_violations"])
            passed = metric <= thr
        elif e.kind == "row_count_between":
            n = df.count()
            lo, hi = p["lo"], p["hi"]
            metric = float(n)
            thr = float(hi if hi is not None else lo)
            passed = n >= lo and (hi is None or n <= hi)
        elif e.kind == "distinct_count_between":
            agg = (
                F.approx_count_distinct(e.column)
                if p["approx"]
                else F.countDistinct(e.column)
            )
            n = df.agg(agg.alias("n")).first()["n"]
            lo, hi = p["lo"], p["hi"]
            metric = float(n)
            thr = float(hi if hi is not None else lo)
            passed = n >= lo and (hi is None or n <= hi)
        elif e.kind == "quantile_between":
            prob = F.lit(float(p["prob"]))
            q_agg = (
                F.percentile(F.col(e.column), prob)
                if p["exact"]
                else F.percentile_approx(F.col(e.column), prob, p["accuracy"])
            )
            q_raw = df.agg(q_agg.alias("q")).first()["q"]
            lo, hi = p["lo"], p["hi"]
            thr = float(hi if hi is not None else lo)
            if q_raw is None:
                # all-null column / empty table: report a failed expectation
                # instead of crashing the whole suite on float(None)
                metric, passed = float("nan"), False
            else:
                v = float(q_raw)
                metric = v
                passed = (lo is None or v >= lo) and (hi is None or v <= hi)
        elif e.kind in ("psi_below", "ks_below", "js_below", "wasserstein_below"):
            from vldt_spark.checks.drift import (
                histogram,
                js_divergence,
                ks_from_histograms,
                psi,
                wasserstein_from_histograms,
            )

            lo, hi = p["lo"], p["hi"]
            thr = float(p["threshold"])
            if lo is None or hi is None:
                row = p["ref"].agg(F.min(e.column), F.max(e.column)).first()
                lo = (float(row[0]) if row[0] is not None else None) if lo is None else lo
                hi = (float(row[1]) if row[1] is not None else None) if hi is None else hi
            if lo is None or hi is None:
                # reference column entirely null/empty: no bin range exists
                # — report a failed expectation instead of float(None)
                metric, passed = float("nan"), False
            else:
                h_ref = histogram(p["ref"], e.column, bins=p["bins"], lo=lo, hi=hi)
                h_cur = histogram(df, e.column, bins=p["bins"], lo=lo, hi=hi)
                try:
                    if e.kind == "psi_below":
                        metric = psi(h_ref, h_cur)
                    elif e.kind == "js_below":
                        metric = float(js_divergence(h_ref, h_cur).first()["js"])
                    elif e.kind == "wasserstein_below":
                        bw = (hi - lo) / p["bins"]
                        metric = float(
                            wasserstein_from_histograms(h_ref, h_cur, bin_width=bw).first()["w1"]
                        )
                    else:
                        metric = float(ks_from_histograms(h_ref, h_cur).first()["ks"])
                except TypeError:
                    # CURRENT column entirely null/empty: the divergence
                    # aggregates come back NULL (0/0 division) and float(None)
                    # would kill the suite — report a failed expectation,
                    # same convention as the quantile/ref-range guards above
                    metric = float("nan")
                passed = metric == metric and metric < thr  # NaN-safe
        elif e.kind == "schema_stable":
            from vldt_spark.checks.schema_drift import schema_diff

            changes = schema_diff(p["previous"], df).collect()
            if p["allow_added"]:
                changes = [r for r in changes if r["change"] != "added"]
            metric, thr = float(len(changes)), 0.0
            passed = not changes
        elif e.kind == "heavy_hitter_share_below":
            thr = float(p["share"])
            row = (
                df.where(F.col(e.column).isNotNull())
                .groupBy(e.column)
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(
                    F.max("n").cast("double").alias("top"),
                    F.sum("n").cast("double").alias("total"),
                )
                .first()
            )
            if row is None or row["total"] is None or row["total"] == 0.0:
                # empty / all-null column: no distribution exists to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["top"]) / float(row["total"])
                passed = metric < thr
        elif e.kind == "mean_ppl_between":
            from vldt_spark.functions.lm import unigram_logprob

            lo, hi = float(p["lo"]), float(p["hi"])
            thr = hi
            row = (
                unigram_logprob(
                    df.select(
                        F.monotonically_increasing_id().alias("__sid"),
                        F.col(e.column),
                    ),
                    p["vocab_size"],
                    id_col="__sid",
                    tokens_col=e.column,
                )
                .agg(
                    # exact micro-ppl integer sum: float avg is partition-
                    # order dependent and would wobble at rounding
                    # boundaries; decimal(38,0) because 10^12 rows × ~10^7
                    # micro-ppl overflows int64
                    F.sum(
                        F.round(F.col("ppl") * 1e6).cast("decimal(38,0)")
                    ).alias("s"),
                    F.count("ppl").alias("n"),
                )
                .first()
            )
            if row is None or not row["n"]:
                # no scoreable sequence exists: no distribution to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["s"]) / (float(row["n"]) * 1e6)
                passed = lo <= metric <= hi
        elif e.kind == "skew_factor_below":
            from vldt_spark.plans.skew import key_skew_report

            thr = float(p["factor"])
            row = key_skew_report(df, e.column).first()
            if row is None or row["n_rows"] is None or not row["n_rows"]:
                # empty / all-null key column: no key distribution to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["hot_n"]) * float(row["n_keys"]) / float(
                    row["n_rows"]
                )
                passed = metric < thr
        elif e.kind == "partition_skew_below":
            from vldt_spark.checks.layout import partition_health_summary

            thr = float(p["factor"])
            row = partition_health_summary(df, p["columns"]).first()
            if row is None or not row["n_partitions"]:
                # empty table: no partition layout to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["max_skew_factor"])
                passed = metric < thr
        elif e.kind == "dup_ngram_fraction_below":
            from vldt_spark.functions.dedup import duplicated_ngram_fraction

            thr = float(p["threshold"])
            row = (
                duplicated_ngram_fraction(
                    df,
                    text_col=e.column,
                    id_col=p["id_col"],
                    shingle_k=p["shingle_k"],
                )
                .agg(
                    F.sum("n_duplicated").alias("d"),
                    F.sum("n_shingles").alias("n"),
                )
                .first()
            )
            if row is None or not row["n"]:
                # shingle-less corpus: no duplication distribution to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["d"]) / float(row["n"])
                passed = metric < thr
        elif e.kind == "contamination_below":
            from vldt_spark.functions.dedup import contamination_report

            thr = float(p["threshold"])
            n_docs = df.count()
            if n_docs == 0:
                metric, passed = float("nan"), False
            else:
                n_bad = contamination_report(
                    df,
                    p["benchmark"],
                    id_col=p["id_col"],
                    text_col=e.column,
                    bench_text_col=p["bench_text_col"],
                    shingle_k=p["shingle_k"],
                    shingle_impl=p["shingle_impl"],
                ).count()
                metric = float(n_bad) / float(n_docs)
                passed = metric < thr
        elif e.kind == "degenerate_sequence_share_below":
            from vldt_spark.functions.tokens import sequence_stats

            thr = float(p["share"])
            bad = (F.col("n_tok") == 0) | (F.col("max_run") >= p["max_run"])
            if p["min_entropy"] is not None:
                bad = bad | (F.col("entropy") < float(p["min_entropy"]))
            row = (
                sequence_stats(
                    df.select(
                        F.monotonically_increasing_id().alias("__sid"),
                        F.col(e.column),
                    ),
                    id_col="__sid",
                    tokens_col=e.column,
                )
                .agg(
                    F.sum(bad.cast("long")).alias("n_bad"),
                    F.count(F.lit(1)).alias("n"),
                )
                .first()
            )
            if row is None or not row["n"]:
                # empty table: no sequence population exists to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["n_bad"]) / float(row["n"])
                passed = metric < thr
        elif e.kind == "gopher_pass_frac_above":
            from vldt_spark.functions.text import gopher_rules

            thr = float(p["threshold"])
            g = gopher_rules(F.col(e.column), **p["rules"])
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(g.getField("passes"), F.lit(1)).otherwise(F.lit(0))
                ).alias("ok"),
            ).first()
            if row is None or not row["n"]:
                # empty corpus: no pass fraction to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["ok"]) / float(row["n"])
                passed = metric > thr
        elif e.kind == "c4_pass_frac_above":
            from vldt_spark.functions.text import c4_rules

            thr = float(p["threshold"])
            c = c4_rules(F.col(e.column), **p["rules"])
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(c.getField("passes"), F.lit(1)).otherwise(F.lit(0))
                ).alias("ok"),
            ).first()
            if row is None or not row["n"]:
                # empty corpus: no pass fraction to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["ok"]) / float(row["n"])
                passed = metric > thr
        elif e.kind == "fertility_between":
            lo, hi = float(p["lo"]), float(p["hi"])
            thr = hi
            from vldt_spark.functions.tokens import _PRETOKEN_RE

            t = F.col(e.column)
            row = df.agg(
                F.sum(F.regexp_count(t, F.lit(r"\S+")).cast("long")).alias("nw"),
                F.sum(F.regexp_count(t, F.lit(_PRETOKEN_RE)).cast("long")).alias(
                    "nt"
                ),
            ).first()
            if row is None or not row["nw"]:
                # wordless corpus: fertility is undefined
                metric, passed = float("nan"), False
            else:
                metric = float(row["nt"]) / float(row["nw"])
                passed = lo <= metric <= hi
        elif e.kind == "snapshot_churn_below":
            from vldt_spark.checks.snapshot import snapshot_summary

            thr = float(p["threshold"])
            rows = snapshot_summary(
                p["previous"], df, id_col=e.column,
                compare_cols=p["compare_cols"],
            ).collect()  # bounded: ≤ 4 status rows
            total = sum(r["n_rows"] for r in rows)
            if not total:
                # both versions empty: no population to guard
                metric, passed = float("nan"), False
            else:
                unchanged = sum(
                    r["n_rows"] for r in rows if r["status"] == "unchanged"
                )
                metric = float(total - unchanged) / float(total)
                passed = metric < thr
        elif e.kind == "split_leakage_below":
            from vldt_spark.functions.sampling import split_leakage_report

            thr = float(p["threshold"])
            rep = split_leakage_report(
                p["pairs"],
                splits=df.select(e.column, p["split_col"])
                if p["use_table_splits"]
                else None,
                weights=p["weights"],
                id_cols=p["id_cols"],
                id_col=e.column,
                split_col=p["split_col"],
                seed=p["seed"],
                hash_fn=p["hash_fn"],
            ).collect()  # bounded: ≤ |splits|² matrix rows
            total = sum(r["n_pairs"] for r in rep)
            leaked = sum(r["n_pairs"] for r in rep if r["leaked"])
            # no pairs = nothing can leak: a clean 0.0, not NaN (see factory)
            metric = float(leaked) / float(total) if total else 0.0
            passed = metric < thr
        elif e.kind == "mixture_gap_below":
            thr = float(p["threshold"])
            shares = p["shares"]
            tot_w = float(sum(shares.values()))
            tok = F.col(p["token_col"]).cast("double")
            rows = (
                df.where(
                    F.col(e.column).isin(list(shares))
                    & tok.isNotNull()
                    & (tok > 0)
                )
                .groupBy(e.column)
                .agg(F.sum(tok).alias("t"))
                .collect()  # bounded: one row per NAMED source
            )
            total = sum(float(r["t"]) for r in rows)
            if not rows or total <= 0:
                # no token mass in any named source: no mixture to guard
                metric, passed = float("nan"), False
            else:
                got = {r[e.column]: float(r["t"]) / total for r in rows}
                metric = max(
                    abs(got.get(k, 0.0) - w / tot_w) for k, w in shares.items()
                )
                passed = metric < thr
        elif e.kind == "auc_above":
            from vldt_spark.checks.classifier_eval import auc_report

            thr = float(p["threshold"])
            row = auc_report(
                df, e.column, p["label_col"], quantize=p["quantize"]
            ).first()
            if row is None or row["auc"] is None:
                # empty / single-class audit slice: AUC undefined — fail,
                # a slice with no negatives (or positives) certifies nothing
                metric, passed = float("nan"), False
            else:
                metric = float(row["auc"])
                passed = metric > thr
        elif e.kind == "ece_below":
            from vldt_spark.checks.classifier_eval import ece_report

            thr = float(p["threshold"])
            row = ece_report(
                df, e.column, p["label_col"], n_bins=p["n_bins"]
            ).first()
            if row is None or row["ece"] is None:
                metric, passed = float("nan"), False
            else:
                metric = float(row["ece"])
                passed = metric < thr
        elif e.kind == "brier_below":
            from vldt_spark.checks.classifier_eval import brier_report

            thr = float(p["threshold"])
            row = brier_report(df, e.column, p["label_col"]).first()
            if row is None or row["brier"] is None:
                metric, passed = float("nan"), False
            else:
                metric = float(row["brier"])
                passed = metric < thr
        elif e.kind == "average_precision_above":
            from vldt_spark.checks.classifier_eval import pr_report

            thr = float(p["threshold"])
            row = pr_report(
                df, e.column, p["label_col"], quantize=p["quantize"]
            ).first()
            if row is None or row["average_precision"] is None:
                # empty / single-class audit slice: AP undefined — fail,
                # same loud-failure semantics as auc_above
                metric, passed = float("nan"), False
            else:
                metric = float(row["average_precision"])
                passed = metric > thr
        elif e.kind == "pii_frac_below":
            from vldt_spark.functions.text import pii_flags

            thr = float(p["threshold"])
            flags = pii_flags(F.col(e.column))
            any_pii = (
                flags.getField("has_email")
                | flags.getField("has_ip")
                | flags.getField("has_phone")
            )
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(any_pii.cast("long")).alias("bad"),
            ).first()
            if row is None or not row["n"]:
                # empty corpus: no PII population to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["bad"]) / float(row["n"])
                passed = metric < thr
        elif e.kind == "distinct_text_frac_above":
            from vldt_spark.functions.text import fingerprint

            thr = float(p["threshold"])
            fp = fingerprint(F.col(e.column))
            cd = (
                F.approx_count_distinct(fp)
                if p["approx"]
                else F.count_distinct(fp)
            )
            row = df.agg(
                F.count(F.lit(1)).alias("n"), cd.alias("d")
            ).first()
            if row is None or not row["n"]:
                # empty corpus: no text population to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["d"]) / float(row["n"])
                passed = metric > thr
        elif e.kind == "distinct_seq_frac_above":
            from vldt_spark.functions.dedup import token_sequence_key

            thr = float(p["threshold"])
            key = token_sequence_key(F.col(e.column))
            cd = (
                F.approx_count_distinct(key)
                if p["approx"]
                else F.count_distinct(key)
            )
            row = df.agg(
                F.count(F.lit(1)).alias("n"), cd.alias("d")
            ).first()
            if row is None or not row["n"]:
                # empty corpus: no sequence population to guard
                metric, passed = float("nan"), False
            else:
                metric = float(row["d"]) / float(row["n"])
                passed = metric > thr
        elif e.kind == "centroid_cosine_above":
            from vldt_spark.checks.drift import embedding_drift

            thr = float(p["threshold"])
            row = embedding_drift(df, p["ref"], vec_col=e.column).first()
            cos = row["centroid_cosine"] if row is not None else None
            if cos is None:
                # empty table / all-null vectors / zero centroid: cosine is
                # undefined — report a failed expectation, never float(None)
                metric, passed = float("nan"), False
            else:
                metric = float(cos)
                passed = metric > thr
        else:  # pragma: no cover
            raise ValueError(f"unknown expectation kind {e.kind}")
        return spark.createDataFrame(
            [(e.kind, e.column, _round6(float(metric)), thr, bool(passed))],
            "check string, column string, metric double, threshold double, passed boolean",
        )

    def run(self, df: DataFrame, *, concurrency: int = 4) -> DataFrame:
        """Evaluate every expectation; returns the report DataFrame
        (check, column, metric, threshold, passed) in declaration order
        grouping: row-local rows first (one fused pass), then whole-table
        rows.

        Whole-table expectations each trigger a blocking Spark action; they
        are submitted from a thread pool (Spark's scheduler runs jobs from
        separate threads concurrently) so a contract with several
        unique/ref/psi expectations overlaps their scans instead of running
        them back-to-back — each job is bounded-output and key-column-
        pruned, so this buys wall-clock without changing resource shape.
        ``concurrency=1`` restores strictly serial execution; report rows
        come back in declaration order either way."""
        row_local = [e for e in self.expectations if e.kind in _ROW_LOCAL]
        whole = [e for e in self.expectations if e.kind not in _ROW_LOCAL]
        parts = []
        rl = self._row_local_report(df, row_local)
        if rl is not None:
            parts.append(rl)
        if len(whole) > 1 and concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(concurrency, len(whole))
            ) as pool:
                parts.extend(
                    pool.map(lambda e: self._whole_table_report(df, e), whole)
                )
        else:
            parts.extend(self._whole_table_report(df, e) for e in whole)
        if not parts:
            return df.sparkSession.createDataFrame(
                [], "check string, column string, metric double, threshold double, passed boolean"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def passed(self, df: DataFrame) -> bool:
        """True iff every expectation holds (the CI-gate boolean)."""
        return self.run(df).agg(F.min("passed")).first()[0] is True

    # -- streaming tier ----------------------------------------------------

    def run_stream(
        self,
        stream_df: DataFrame,
        ts_col: str,
        *,
        window: str = "1 day",
        watermark: str = "1 hour",
    ) -> DataFrame:
        """Continuous contract: the row-local tier per event-time window.

        The SAME fused-aggregate expressions run inside one watermarked
        windowed aggregation (stateless expressions + bounded state:
        |open windows| rows), emitting per-window report rows
        (window_start, window_end, check, column, metric, threshold,
        passed) in append mode once the watermark closes a window.
        Whole-table expectations (unique / ref / psi) are not streamable
        here — uniqueness needs cross-batch state
        (streaming/stateful.py) and drift its own monitor
        (streaming/drift_stream.py); declaring one raises."""
        bad = [e.kind for e in self.expectations if e.kind not in _ROW_LOCAL]
        if bad:
            raise ValueError(
                f"run_stream supports row-local expectations only, got: {bad}"
            )
        exps = self.expectations
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(exps):
            aggs.append(
                F.sum(self._bad_condition(e).cast("long")).alias(f"__m_{i}")
            )
        win = (
            stream_df.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("__w"))
            .agg(*aggs)
        )
        rows = [self._report_struct(e, i) for i, e in enumerate(exps)]
        return win.select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            F.explode(F.array(*rows)).alias("s"),
        ).select("window_start", "window_end", "s.*")

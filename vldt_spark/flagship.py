"""The flagship north-star job: full validation of the token-sequence table.

One fused scan computes every row-local check; uniqueness and RI add two
tiny broadcast-joined aggregates; the output is the reference-shaped
verdict + violation-rows pair (SURVEY.md A1/A16 → B11/B12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vldt_spark.engine import ValidationEngine, ValidationResult
from vldt_spark.fields import Field
from vldt_spark.model import Model
from vldt_spark.validators import check
from vldt_spark.sources.token_table import VOCAB


class TokenSequence(Model):
    """BASELINE.json input_hint schema with the north-rule constraints."""

    doc_id: str = Field(not_null=True, unique=True, regex=r"^doc-\d{12}$")
    tokens: list[int] = Field(element_ge=0, element_le=VOCAB - 1, min_size=1)
    n_tok: int = Field(ge=1, le=2048)
    source: str = Field(not_null=True, ref=("sources", "source"))

    @check("n_tok_matches", message="Check failed: n_tok != size(tokens)")
    def n_tok_matches(cols):
        return F.size(cols.tokens) == cols.n_tok


_ENGINE: ValidationEngine | None = None


def validate_token_table(
    df: DataFrame, sources_dim: DataFrame | None = None
) -> ValidationResult:
    global _ENGINE
    if _ENGINE is None:
        # one engine per process: the fused-projection expression cache
        # then persists across batches (compile-once, engine.py)
        _ENGINE = ValidationEngine(TokenSequence)
    dims = {"sources": sources_dim} if sources_dim is not None else None
    return _ENGINE.run(df, id_cols=["doc_id"], dims=dims)

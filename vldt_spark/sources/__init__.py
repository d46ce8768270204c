"""Sources & sinks: typed readers, the deterministic token-table
synthesizer (FIXTURES.md F1), and checkpoint-shaped writers."""

from vldt_spark.sources.token_table import (
    token_sequences,
    token_sequences_ref,
    token_sequences_shifted,
    sources_dim,
)
from vldt_spark.sources.readers import read_table, read_json_validated
from vldt_spark.sources.catalog import (
    iceberg_conf,
    iceberg_available,
    resolve_table,
)

__all__ = [
    "token_sequences",
    "token_sequences_ref",
    "token_sequences_shifted",
    "sources_dim",
    "read_table",
    "read_json_validated",
    "iceberg_conf",
    "iceberg_available",
    "resolve_table",
]

"""Scalar/column function surface of the engine (SURVEY §2.5, §2.12).

One import point for every reusable column-level function the
operators are built from. All of these are native Catalyst
expressions (JVM-side, whole-stage-codegen-eligible) — the reference's
row-wise Python helpers (`normalize_timestamp`,
`RSS PARSER/gcp_rss.py:31-37`; `to_pct`, `:54-59`; the md5 row lambda,
`CSV PARSER/gcp_csv.py:150-155`) all restate as expressions, so no UDF
appears in any hot path.

The UDF *machinery* the engine still exposes for semantics Spark
expressions can't reach lives in :mod:`.udfs`: scalar ``pandas_udf``,
grouped-map ``applyInPandas``, and a Python UDTF — each demonstrated
as an oracle-checked query.
"""

from ..operators.cleaning import (
    basename_account_id,
    coerce_numeric,
    dedup_by_key,
    iso_timestamp,
    null_if_sentinel,
    parse_rss_timestamp,
    pct_to_ratio,
    rename_columns,
    row_hash,
    select_sink_schema,
    with_null_defaults,
)
from ..operators.dedup import word_shingles
from ..operators.similarity import cosine, dot
from ..operators.textops import bpeish_tokens, ws_tokens

__all__ = [
    "basename_account_id",
    "bpeish_tokens",
    "coerce_numeric",
    "cosine",
    "dedup_by_key",
    "dot",
    "iso_timestamp",
    "null_if_sentinel",
    "parse_rss_timestamp",
    "pct_to_ratio",
    "rename_columns",
    "row_hash",
    "select_sink_schema",
    "with_null_defaults",
    "word_shingles",
    "ws_tokens",
]

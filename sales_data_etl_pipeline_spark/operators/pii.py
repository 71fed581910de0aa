"""PII detection and redaction over a document corpus (extension layer).

A large-scale training-data pipeline scrubs personally identifiable
information before anything else sees the text. The reference has no PII
layer; this extends the engine the same way ``operators.text`` does:
pure JVM regexp expressions (``regexp_count`` / ``regexp_replace``), no
Python in the hot path, embarrassingly parallel — zero shuffles, fully
inside whole-stage codegen, linear scaling to 100 TB.

Pattern discipline: every pattern uses only syntax with identical
semantics in Java regex (Spark) and RE2 (the DuckDB oracle) — character
classes, bounded repetition, ``\\b`` word boundaries. No backreferences,
no lookaround (RE2 has neither), so the oracle computes bit-identical
matches.

Redaction applies the rules in ``PII_RULES`` order; the patterns are
mutually non-overlapping on well-formed text (the ``\\b`` anchors keep
SSN/CC/phone digit runs from claiming each other's separators), so rule
order only matters for pathological inputs and is fixed for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement-token), applied in order for redaction.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_detect(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counters: one ``n_<kind>`` column per rule plus
    ``n_pii`` (total) and ``has_pii``.

    All counts are non-overlapping left-to-right matches (both engines'
    semantics). Counts are cast to long so the schema matches the
    oracle's BIGINT.
    """
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for name, pat, _ in PII_RULES
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_RULES],
        total.alias("n_pii"),
        # coalesce: NULL text (counts unknown → NULL) reports has_pii
        # FALSE, never boolean-NULL — a NULL bool renders differently
        # across engines' pandas bridges (None vs NaN) and would break
        # the value hash on data with missing text fields
        F.coalesce(total > 0, F.lit(False)).alias("has_pii"),
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact every PII match with its ``<TOKEN>``; keeps ``doc_id``,
    the redacted ``text_clean`` and the number of redactions ``n_pii``
    (counted before redaction, so chained rules can't double-count)."""
    redacted = F.col(text_col)
    total = None
    for _, pat, token in PII_RULES:
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        total = c if total is None else total + c
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(
        "doc_id",
        redacted.alias("text_clean"),
        total.alias("n_pii"),
    )


# --- DuckDB oracle twins ----------------------------------------------------


def _count_sql(col: str, pat: str) -> str:
    escaped = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col}, '{escaped}')) AS BIGINT)"


def pii_detect_sql(col: str = "text") -> str:
    """SELECT-list fragment equivalent to :func:`pii_detect` (minus the
    leading doc_id)."""
    parts = [
        f"{_count_sql(col, pat)} AS n_{name}" for name, pat, _ in PII_RULES
    ]
    total = " + ".join(_count_sql(col, pat) for _, pat, _ in PII_RULES)
    parts.append(f"({total}) AS n_pii")
    parts.append(f"coalesce(({total}) > 0, FALSE) AS has_pii")
    return ", ".join(parts)


def pii_redact_sql(col: str = "text") -> str:
    """SELECT-list fragment equivalent to :func:`pii_redact`."""
    redacted = col
    for _, pat, token in PII_RULES:
        escaped = pat.replace("'", "''")
        redacted = f"regexp_replace({redacted}, '{escaped}', '{token}', 'g')"
    total = " + ".join(_count_sql(col, pat) for _, pat, _ in PII_RULES)
    return f"{redacted} AS text_clean, ({total}) AS n_pii"

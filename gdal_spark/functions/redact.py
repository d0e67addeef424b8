"""PII detection + redaction over a document table — pure Column math.

The scrubbing step of a training-data pipeline: find emails / IPv4
addresses / phone numbers, count them per document, and replace them
with typed placeholder tokens. Everything is regexp_replace /
regexp_count on the scan (JVM-side, WholeStageCodegen — no Python, no
shuffle), so at 10^9 docs the cost is exactly one corpus scan.

Dialect parity: the patterns below avoid backreferences, lookaround,
and possessive quantifiers so Java (Spark) and RE2 (DuckDB) match the
same spans; replacement order is fixed (email -> ipv4 -> phone) because
redaction output feeds the next pattern's input. The DuckDB oracle
applies the identical patterns in the identical order
(regexp_replace(..., 'g') / len(regexp_extract_all(...))).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ordered (name, pattern, placeholder); order is load-bearing — emails
# contain dot-runs an aggressive phone pattern could nibble, and ipv4
# must be consumed before the phone pattern sees its digit runs
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{7,15}|\([0-9]{3}\) ?[0-9]{3}-[0-9]{4}|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
        "<PHONE>",
    ),
]


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII kind. Counted on the text as it looks
    when that pattern runs in the redaction chain — i.e. after the
    patterns ordered before it have been replaced — so counts and
    redaction always agree."""
    for name, pat, token in PII_PATTERNS:
        if name == kind:
            return F.regexp_count(col, F.lit(pat))
        col = F.regexp_replace(col, pat, token)
    raise KeyError(kind)


def redact_pii(col: Column) -> Column:
    """Text with every PII span replaced by its placeholder token."""
    for _name, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_<kind> counts and a `redacted` column in one projection
    (single scan; all columns share the common subexpressions)."""
    c = F.col(text_col)
    out = df
    for name, _pat, _token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", pii_count(c, name))
    return out.withColumn("redacted", redact_pii(c))


def oracle_exprs(text_expr: str) -> dict[str, str]:
    """The DuckDB-SQL rendering of the same chain, for oracle authors:
    returns {'n_email': ..., 'n_ipv4': ..., 'n_phone': ..., 'redacted':
    ...} expressions over `text_expr`."""

    def esc(pat: str) -> str:
        return pat.replace("'", "''")

    out = {}
    cur = text_expr
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = (
            f"len(regexp_extract_all({cur}, '{esc(pat)}'))"
        )
        cur = f"regexp_replace({cur}, '{esc(pat)}', '{token}', 'g')"
    out["redacted"] = cur
    return out

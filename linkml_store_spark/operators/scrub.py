"""PII scrubbing / text redaction for training-data hygiene.

Pre-training corpora are scrubbed of emails, phone numbers, IPs, SSNs
and similar identifiers before anything else happens to them. At 100 TB
this MUST be a JVM-side projection: one ``regexp_replace`` chain per
document, whole-stage-codegen'd, zero shuffle, zero Python.

Pattern dialect note: the patterns below restrict themselves to syntax
that Java regex (Spark) and RE2 (DuckDB) interpret identically
(character classes, bounded repetition, ``\\b`` word boundaries — no
lookbehind), so the DuckDB oracle replays the exact same redaction and
the driver compares md5s of the scrubbed text.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, replacement token). Order matters: longer/most
#: specific first so e.g. SSNs don't get half-eaten by the phone rule.
PII_PATTERNS: Dict[str, tuple] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
}


def scrub_expr(text: Column, kinds: Sequence[str] = None) -> Column:
    """Redaction as a pure Column expression (chained regexp_replace)."""
    out = text
    for kind in kinds or PII_PATTERNS:
        pattern, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column, kinds: Sequence[str] = None) -> Dict[str, Column]:
    """Per-kind match counts (for corpus audits / filtering thresholds)."""
    return {
        f"n_{kind}": F.regexp_count(text, F.lit(PII_PATTERNS[kind][0]))
        for kind in (kinds or PII_PATTERNS)
    }


def scrub_documents(
    df: DataFrame,
    text_col: str = "text",
    kinds: Sequence[str] = None,
    out_col: str = None,
    with_counts: bool = True,
) -> DataFrame:
    """Scrub ``text_col`` (in place by default), optionally appending
    per-kind counts measured BEFORE redaction."""
    out_col = out_col or text_col
    text = F.col(text_col)
    cols = list(df.columns)
    add = []
    if with_counts:
        add = [c.alias(n) for n, c in pii_counts(text, kinds).items()]
    from linkml_store_spark.operators.scale import fan_out

    scrubbed = scrub_expr(text, kinds).alias(out_col)
    keep = [F.col(c) for c in cols if c != out_col]
    # fan out first: the regex battery otherwise runs on ONE task when a
    # one-row-group store scans as one partition (no-op when pre-split)
    return fan_out(df).select(*keep, scrubbed, *add)

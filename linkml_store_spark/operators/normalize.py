"""Unicode/text normalization — the cleanup pass before tokenization.

Mixed-provenance corpora carry the same text in different byte forms
(composed vs decomposed accents, stray control characters, tab/space
soup); dedup and tokenization both silently fragment unless the corpus
is normalized first. Stages:

* **NFC normalization** — no JVM builtin exists, so this is one of the
  package's few sanctioned Python steps: an Arrow-batched pandas UDF
  over ``unicodedata.normalize`` (C-implemented, and a no-op fast path
  for already-NFC ASCII-heavy text). DuckDB's ``nfc_normalize`` computes
  the identical form, which makes the driver oracle byte-exact.
* **control-char strip** and **horizontal-whitespace collapse** — native
  ``regexp_replace`` (newlines survive; document structure is data).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0/C1 controls except \t (kept for collapse) and \n (structure)
CONTROL_CHARS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
#: runs of horizontal whitespace -> one space
HORIZ_WS = r"[ \t]+"

_NFC_UDF = None


def nfc_normalize(col: Column) -> Column:
    """NFC normalization as an Arrow-batched pandas UDF (built lazily —
    the decorator parses its DDL type against the active session)."""
    global _NFC_UDF
    if _NFC_UDF is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(texts: pd.Series) -> pd.Series:
            import unicodedata

            return texts.map(
                lambda t: unicodedata.normalize("NFC", t)
                if t is not None
                else None
            )

        _NFC_UDF = _nfc
    return _NFC_UDF(col)


def clean_text_expr(text: Column) -> Column:
    """The native (post-NFC) cleanup: strip controls, collapse horizontal
    whitespace, trim line edges."""
    out = F.regexp_replace(text, CONTROL_CHARS, "")
    out = F.regexp_replace(out, HORIZ_WS, " ")
    return F.trim(out)


def normalize_documents(
    df: DataFrame,
    text_col: str = "text",
    nfc: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Normalize ``text_col`` in place. NFC runs first (byte form), then
    the native cleanup; ``lowercase`` last (it can denormalize NFC for a
    handful of codepoints, but tokenizers downstream don't care)."""
    from linkml_store_spark.operators.scale import fan_out

    col: Column = F.col(text_col)
    if nfc:
        col = nfc_normalize(col)
    col = clean_text_expr(col)
    if lowercase:
        col = F.lower(col)
    # fan out first: the NFC pandas_udf otherwise runs inside ONE Python
    # worker when a one-row-group store scans as one partition (no-op on
    # pre-split inputs; per-row transform, layout-only)
    return fan_out(df).withColumn(text_col, col)

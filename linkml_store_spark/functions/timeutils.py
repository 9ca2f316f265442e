"""Time-column coercion helpers shared by the time-series operators.

Epoch math (range-window frames, grid bucketing, tolerance windows) needs a
numeric seconds value. ``cast("double")`` is only legal from ``TIMESTAMP`` —
``TIMESTAMP_NTZ`` rejects it with AnalysisException — so every epoch-math
site goes through :func:`epoch_seconds`, which first coerces to plain
``TIMESTAMP`` (identity for TIMESTAMP; wall-clock-preserving for NTZ under
the forced-UTC session; seconds→timestamp→seconds round-trip for numerics).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Union[str, Column]) -> Column:
    """Fractional epoch seconds from any event-time representation.

    Accepts TIMESTAMP, TIMESTAMP_NTZ, or an already-numeric epoch-seconds
    column; sub-second precision is preserved (unlike ``unix_timestamp``,
    which truncates to whole seconds).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")

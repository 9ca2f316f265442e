"""Facet results -> wide (unmelted) rows.

Reference (``src/linkml_store/utils/pandas_utils.py:61-103``, used by the
CLI ``fq --wide``, cli.py:529,569): facet output {col: [(value, count)]}
reshaped so each row is a value-combination with one column per facet plus
the count. Driver-side — facet outputs are already top-k-bounded tiny.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def facets_to_wide_rows(facets: Dict) -> List[dict]:
    rows: List[dict] = []
    for col, pairs in facets.items():
        cols = list(col) if isinstance(col, tuple) else [col]
        for value, count in pairs:
            values = list(value) if isinstance(value, (tuple, list)) else [value]
            row = dict(zip(cols, values))
            row["count"] = count
            rows.append(row)
    return rows

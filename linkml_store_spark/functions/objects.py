"""Object/scalar utilities over nested rows (SURVEY §2.10).

Reference counterparts:
  * ``flatten_dict`` / ``nested_objects_to_dataframe`` — dot-path flattening
    (``src/linkml_store/utils/pandas_utils.py:9-58``);
  * ``clean_empties`` — drop None/empty recursively
    (``utils/object_utils.py:120-126``);
  * ``object_path_get/update`` — dot+bracket paths
    (``object_utils.py:8-100``);
  * ``select_nested`` — dotted/indexed nested projection
    (``object_utils.py:130-196``);
  * JSONPath ``select_query`` preselection (``format_utils.py:360-375``).

DataFrame-level operations are native column expressions; the dict-level
helpers mirror the reference for driver-side objects.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------- #
# DataFrame flattening
# --------------------------------------------------------------------- #
def flatten_df(df: DataFrame, sep: str = ".", max_depth: int = 10) -> DataFrame:
    """Flatten all struct columns to dotted top-level columns — the
    DataFrame analog of ``flatten_dict``. Arrays are left intact (flattening
    through arrays changes cardinality; use ``explode`` first when wanted).
    Pure projection: no shuffle, prunes to referenced leaves."""
    for _ in range(max_depth):
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            break
        cols: List[Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}{sep}{sub.name}"
                        )
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    return df


def select_nested_df(df: DataFrame, paths: List[str]) -> DataFrame:
    """Project dotted paths (reference select_nested semantics applied
    relationally): each path becomes a column named with underscores."""
    from linkml_store_spark.where import path_col

    return df.select(
        *[path_col(p).alias(p.replace(".", "_").replace("[", "_").replace("]", "")) for p in paths]
    )


# --------------------------------------------------------------------- #
# driver-side dict helpers (exact reference semantics)
# --------------------------------------------------------------------- #
def flatten_dict(d: Dict[str, Any], parent_key: str = "", sep: str = ".") -> Dict[str, Any]:
    items: List = []
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_dict(v, key, sep).items())
        else:
            items.append((key, v))
    return dict(items)


def clean_empties(value: Any) -> Any:
    """Recursively drop None values and empty dicts/lists
    (reference object_utils.py:120-126)."""
    if isinstance(value, dict):
        value = {k: clean_empties(v) for k, v in value.items()}
        return {k: v for k, v in value.items() if v is not None and v != {} and v != []}
    if isinstance(value, list):
        value = [clean_empties(v) for v in value]
        return [v for v in value if v is not None and v != {} and v != []]
    return value


_SEG = re.compile(r"([^\[\].]+)|\[(\d+)\]")


def object_path_get(obj: Any, path: str, default: Any = None) -> Any:
    """Navigate ``a.b[0].c`` through dicts/lists; lists without an index map
    over elements (reference object_utils.py:64-100)."""
    cur = obj
    for m in _SEG.finditer(path):
        name, idx = m.group(1), m.group(2)
        if cur is None:
            return default
        if idx is not None:
            if not isinstance(cur, list) or int(idx) >= len(cur):
                return default
            cur = cur[int(idx)]
        elif isinstance(cur, list):
            cur = [
                c.get(name) if isinstance(c, dict) else default for c in cur
            ]
        elif isinstance(cur, dict):
            cur = cur.get(name, default)
        else:
            return default
    return cur


def object_path_update(obj: Dict, path: str, value: Any) -> Dict:
    """Set a dotted/bracketed path, creating intermediate dicts/lists
    (reference object_utils.py:8-62). Returns the mutated object."""
    segs = [(m.group(1), m.group(2)) for m in _SEG.finditer(path)]
    cur = obj
    for i, (name, idx) in enumerate(segs):
        last = i == len(segs) - 1
        key: Any = name if name is not None else int(idx)
        if last:
            if isinstance(cur, list):
                while len(cur) <= key:
                    cur.append(None)
            cur[key] = value
            return obj
        nxt_name, nxt_idx = segs[i + 1]
        empty: Any = [] if nxt_idx is not None else {}
        if isinstance(cur, list):
            while len(cur) <= key:
                cur.append(None)
            if cur[key] is None:
                cur[key] = empty
            cur = cur[key]
        else:
            if cur.get(key) is None:
                cur[key] = empty
            cur = cur[key]
    return obj


def select_nested(obj: Dict, paths: List[str]) -> Dict:
    """Subset an object to the given dotted/indexed paths
    (reference object_utils.py:130-196)."""
    out: Dict = {}
    for p in paths:
        v = object_path_get(obj, p)
        if v is not None:
            object_path_update(out, p, v)
    return out


def jsonpath_select(objs: List[Dict], expr: str) -> List[Dict]:
    """JSONPath preselection over loaded objects (reference
    format_utils.py:360-375; driver-side by nature — runs before
    createDataFrame)."""
    import jsonpath_ng

    parsed = jsonpath_ng.parse(expr)
    out = []
    for obj in objs:
        for match in parsed.find(obj):
            out.append(match.value)
    return out

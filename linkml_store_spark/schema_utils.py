"""Schema induction and LinkML-range <-> Spark type mapping.

Induction reproduces the reference heuristic exactly
(``src/linkml_store/api/collection.py:1065-1165``): sample the first
``max_sample_size`` (default 10) objects; per key —
  list  -> multivalued, element type from first element
  dict  -> inlined object (nested StructType; keys unioned across samples)
  bool/int/float/str -> scalar range; int+float coerce to float;
  other conflicting ranges raise ValueError.
None values are skipped (nullable). Unseen keys on later rows are fine — all
fields are nullable, inserts align by name with null fill.

Type mapping follows SURVEY.md §1.2 (reference
``api/stores/duckdb/mappings.py:1-8``): string->StringType, integer->LongType,
float->DoubleType, boolean->BooleanType, date->DateType,
datetime->TimestampType, multivalued->ArrayType, inlined->StructType,
embedding->ArrayType(FloatType).
"""

from __future__ import annotations

import datetime
from typing import Any, Iterable, List, Optional

from pyspark.sql import types as T

DEFAULT_MAX_SAMPLE_SIZE = 10

_RANGE_TO_SPARK = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
}


def range_to_spark_type(range_name: str) -> T.DataType:
    if range_name not in _RANGE_TO_SPARK:
        # unknown ranges default to string (reference: VARCHAR default)
        return T.StringType()
    return _RANGE_TO_SPARK[range_name]


def _scalar_range(value: Any) -> str:
    # bool must be checked before int (bool is an int subclass)
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "float"
    if isinstance(value, datetime.datetime):
        return "datetime"
    if isinstance(value, datetime.date):
        return "date"
    if isinstance(value, str):
        return "string"
    raise ValueError(f"cannot induce range for value of type {type(value)}")


def _merge_ranges(a: Optional[str], b: str) -> str:
    if a is None or a == b:
        return b
    pair = {a, b}
    if pair == {"integer", "float"}:
        # int+float coerce to float (reference collection.py:1128-1136)
        return "float"
    raise ValueError(f"conflicting induced ranges: {a} vs {b}")


def _induce_type(values: List[Any]) -> T.DataType:
    """Induce a Spark type from non-None sampled values for one key."""
    first = values[0]
    if isinstance(first, list):
        elems = [v for val in values if isinstance(val, list) for v in val if v is not None]
        if not elems:
            return T.ArrayType(T.StringType())
        return T.ArrayType(_induce_type(elems[:1] if isinstance(elems[0], dict) else elems))
    if isinstance(first, dict):
        dicts = [v for v in values if isinstance(v, dict)]
        return _induce_struct(dicts)
    rng: Optional[str] = None
    for v in values:
        rng = _merge_ranges(rng, _scalar_range(v))
    return range_to_spark_type(rng or "string")


def _induce_struct(objs: List[dict]) -> T.StructType:
    keys: List[str] = []
    for obj in objs:
        for k in obj:
            if k not in keys:
                keys.append(k)
    fields = []
    for k in keys:
        vals = [o[k] for o in objs if k in o and o[k] is not None]
        dtype = _induce_type(vals) if vals else T.StringType()
        fields.append(T.StructField(k, dtype, nullable=True))
    return T.StructType(fields)


def induce_schema(
    objs: Iterable[dict], max_sample_size: int = DEFAULT_MAX_SAMPLE_SIZE
) -> T.StructType:
    """Induce a StructType from the first ``max_sample_size`` objects."""
    sample = []
    for obj in objs:
        sample.append(obj)
        if len(sample) >= max_sample_size:
            break
    if not sample:
        raise ValueError("cannot induce schema from zero objects")
    return _induce_struct(sample)


_SPARK_TO_RANGE = {
    T.StringType: "string",
    T.LongType: "integer",
    T.IntegerType: "integer",
    T.ShortType: "integer",
    T.DoubleType: "float",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.DateType: "date",
    T.TimestampType: "datetime",
}


def struct_to_linkml_slots(schema: T.StructType) -> dict:
    """Inverse compiler: StructType -> {slot: {range, multivalued, ...}}
    (the introspection direction; reference duckdb_database.py:212-255 maps
    information_schema types back to LinkML the same way)."""
    slots: dict = {}
    for f in schema.fields:
        dtype = f.dataType
        spec: dict = {}
        if isinstance(dtype, T.ArrayType):
            spec["multivalued"] = True
            dtype = dtype.elementType
        if isinstance(dtype, T.StructType):
            spec["range"] = "object"
            spec["slots"] = struct_to_linkml_slots(dtype)
        else:
            spec["range"] = _SPARK_TO_RANGE.get(type(dtype), "string")
        if not f.nullable:
            spec["required"] = True
        slots[f.name] = spec
    return slots


def linkml_slots_to_struct(slots: dict) -> T.StructType:
    """Compile a {slot_name: {range, multivalued, inlined...}} spec to a StructType.

    Accepts the distilled slot-definition shape used in FIXTURES.md; a full
    LinkML SchemaView compiler can layer on top by extracting the same dict.
    """
    fields = []
    for name, spec in slots.items():
        if isinstance(spec, str):
            spec = {"range": spec}
        if "slots" in spec or spec.get("range") == "object":
            dtype: T.DataType = linkml_slots_to_struct(spec.get("slots", {}))
        else:
            dtype = range_to_spark_type(spec.get("range", "string"))
        if spec.get("multivalued"):
            dtype = T.ArrayType(dtype)
        fields.append(T.StructField(name, dtype, nullable=not spec.get("required", False)))
    return T.StructType(fields)

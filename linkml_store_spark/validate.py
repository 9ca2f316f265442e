"""Validation: constraint compiler + referential integrity.

Reference semantics:
  * ``iter_validate_collection`` — per-object jsonschema validation
    (``src/linkml_store/api/collection.py:1220-1254``). Simple constraints
    (required, pattern, range, multivalued) compile to native Spark filters
    here — distributed, no Python in the hot path; full jsonschema remains
    available via mapInPandas for exotic schemas.
  * referential integrity — FK values must exist in the target collection
    (``src/linkml_store/api/database.py:703-747``): a left-anti join per FK
    edge instead of the reference's per-value probing.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_integrity_violations(
    src: DataFrame, slot: str, target: DataFrame, target_pk: str
) -> DataFrame:
    """Rows of ``src`` whose ``slot`` value has no match in target's pk."""
    return (
        src.filter(F.col(slot).isNotNull())
        .join(
            target.select(F.col(target_pk).alias(slot)).distinct(),
            on=slot,
            how="left_anti",
        )
        .select(slot)
        .distinct()
    )


def constraint_violations(
    df: DataFrame, slots: Dict[str, dict]
) -> DataFrame:
    """Compile slot constraints to filters; returns violating rows with a
    ``__violations`` array column naming each failed constraint.

    Supported: required, pattern, minimum_value, maximum_value.
    """
    checks = []
    for name, spec in slots.items():
        if name not in df.columns:
            if spec.get("required"):
                checks.append(F.lit(f"{name}: missing required column"))
            continue
        col = F.col(name)
        if spec.get("required"):
            checks.append(F.when(col.isNull(), F.lit(f"{name}: required value is null")))
        if spec.get("pattern"):
            pat = spec["pattern"]
            checks.append(
                F.when(
                    col.isNotNull() & ~col.cast("string").rlike(pat),
                    F.lit(f"{name}: does not match pattern {pat}"),
                )
            )
        if spec.get("minimum_value") is not None:
            mv = spec["minimum_value"]
            checks.append(F.when(col < F.lit(mv), F.lit(f"{name}: below minimum {mv}")))
        if spec.get("maximum_value") is not None:
            mv = spec["maximum_value"]
            checks.append(F.when(col > F.lit(mv), F.lit(f"{name}: above maximum {mv}")))
    if not checks:
        return df.limit(0).withColumn("__violations", F.array().cast("array<string>"))
    viol = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return df.withColumn("__violations", viol).filter(F.size("__violations") > 0)


def jsonschema_violations(df: DataFrame, json_schema: dict) -> DataFrame:
    """Full JSON-Schema validation via mapInPandas — the compiled validator
    runs once per executor over Arrow batches (reference validates object-
    by-object on the driver, collection.py:1220-1254). Output: one row per
    error (path, message, object as JSON)."""
    import json as _json

    schema_str = _json.dumps(json_schema)
    out_schema = "path string, message string, object string"

    def validate_batches(batches):
        import jsonschema
        import numpy as np
        import pandas as pd

        validator = jsonschema.Draft7Validator(_json.loads(schema_str))

        def clean(rec):
            out = {}
            for k, v in rec.items():
                if isinstance(v, np.ndarray):
                    v = v.tolist()
                if isinstance(v, np.generic):
                    v = v.item()
                if v is None or (isinstance(v, float) and v != v):
                    continue  # strip null/NaN (reference NaN->None stripping)
                out[k] = v
            return out

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                rec = clean(rec)
                for err in validator.iter_errors(rec):
                    rows.append(
                        {
                            "path": "/".join(str(p) for p in err.absolute_path),
                            "message": err.message,
                            "object": _json.dumps(rec, default=str),
                        }
                    )
            yield pd.DataFrame(rows, columns=["path", "message", "object"])

    return df.mapInPandas(validate_batches, schema=out_schema)


def iter_validate_collection(
    df: DataFrame,
    slots: Optional[Dict[str, dict]] = None,
    json_schema: Optional[dict] = None,
) -> Iterator[dict]:
    """Yield validation-result dicts (reference collection.py:1220-1254).

    ``slots`` uses the native constraint compiler (fast path);
    ``json_schema`` runs the full jsonschema validator distributed.
    """
    if slots:
        bad = constraint_violations(df, slots)
        for row in bad.toLocalIterator():
            d = row.asDict(recursive=True)
            msgs = d.pop("__violations")
            for m in msgs:
                yield {"type": "ConstraintViolation", "message": m, "object": d}
    if json_schema:
        for row in jsonschema_violations(df, json_schema).toLocalIterator():
            yield {
                "type": "JsonSchemaViolation",
                "message": row["message"],
                "path": row["path"],
                "object": row["object"],
            }

"""Mongo-style where-clause -> pyspark ``Column`` predicate compiler.

This is the semantic core of the engine. The reference accepts three forms of
where clause (reference: ``src/linkml_store/api/queries.py:25``,
``src/linkml_store/utils/sql_utils.py:35-79``,
``src/linkml_store/utils/query_utils.py:4-13``):

  * ``None``            -> no filter
  * ``str``             -> raw SQL passthrough (we hand it to ``F.expr``)
  * ``list[str]``       -> raw SQL fragments, ANDed
  * ``dict``            -> MongoDB-flavored conjunction:
        {col: value}                  equality (None -> IS NULL)
        {col: {"$op": value, ...}}    operators, ANDed
        {col: {">=": value}}          raw SQL operator passthrough
        top-level keys                implicit AND

Operator set for parity:
``$eq $ne $gt $gte $lt $lte $in $nin $like $regex $contains`` plus raw
operator strings. Extensions beyond the reference (whose language stops at
per-field operators): ``$or / $and / $not`` boolean combinators at clause
level, ``$not`` / ``$exists`` / ``$size`` at field level — all compile to
the same pushdown-eligible Column algebra. ``$ne: None`` means IS NOT NULL
(``dremio_collection.py:141-146``). ``$in`` against an array-typed column
means overlap ("any x in b", ``query_utils.py:11``); ``$contains`` means
array membership (``sql_utils.py:20-25,73``).

Dotted paths (``a.b.c``) navigate nested structs; ``a.b[0].c`` indexes into
arrays (``utils/object_utils.py:64-100``).

Everything compiles to native Column expressions — the whole predicate stays
JVM-side, participates in whole-stage codegen, and is pushed down to the
parquet scan by Catalyst. No Python UDFs anywhere in this module.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WhereClause = Union[None, str, list, dict]

_PATH_SEG = re.compile(r"([^\[\]]+)|\[(\d+)\]")


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for the string forms Spark PARSES as
    identifiers (``F.col``/``groupBy``/``orderBy``) when it contains a
    backtick — an unquoted ``a`b`` raises INVALID_ATTRIBUTE_NAME_SYNTAX.
    Plain names pass through unchanged (quoting a dotted name would also
    change its meaning from nested access to a literal column)."""
    if "`" in name:
        return "`" + name.replace("`", "``") + "`"
    return name


def path_col(path: str) -> Column:
    """Resolve a dotted/bracketed path (``a.b[0].c``) to a Column.

    Plain dotted paths map straight to nested struct access; ``[i]`` segments
    become ``getItem`` calls. Reference: ``object_path_get`` at
    ``utils/object_utils.py:64-100``.
    """
    if "[" not in path:
        if "`" in path and "." not in path:
            return F.col(quote_ident(path))
        return F.col(path)
    col: Optional[Column] = None
    for part in path.split("."):
        for m in _PATH_SEG.finditer(part):
            name, idx = m.group(1), m.group(2)
            if name is not None:
                col = F.col(name) if col is None else col.getField(name)
            else:
                if col is None:
                    raise ValueError(f"path cannot start with an index: {path}")
                col = col.getItem(int(idx))
    if col is None:
        raise ValueError(f"empty path: {path}")
    return col


def _field_type(schema: T.StructType, path: str) -> Optional[T.DataType]:
    """Walk a dotted path through a StructType; None if not resolvable.

    Field access THROUGH an array of structs maps over the array (Spark
    semantics: ``history.organization`` on array<struct> -> array<string>),
    so the result is wrapped back into ArrayType in that case.
    """
    cur: T.DataType = schema
    through_array = False
    for seg in re.sub(r"\[\d+\]", "", path).split("."):
        if isinstance(cur, T.ArrayType):
            cur = cur.elementType
            through_array = True
        if not isinstance(cur, T.StructType):
            return None
        try:
            cur = cur[seg].dataType
        except KeyError:
            return None
    if through_array and not isinstance(cur, T.ArrayType):
        return T.ArrayType(cur)
    return cur


#: Mongo-ish aliases for the $type schema check
_TYPE_NAMES = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "bool",
    T.TimestampType: "timestamp",
    T.DateType: "date",
    T.ArrayType: "array",
    T.StructType: "object",
    T.MapType: "object",
    T.DecimalType: "decimal",
}


def _type_name(t: Optional[T.DataType]) -> str:
    for cls, name in _TYPE_NAMES.items():
        if isinstance(t, cls):
            return name
    return "null" if t is None else t.simpleString()


def _is_array(df: Optional[DataFrame], path: str) -> bool:
    if df is None:
        return False
    t = _field_type(df.schema, path)
    return isinstance(t, T.ArrayType)


def _eq(col: Column, value: Any, is_array: bool) -> Column:
    if value is None:
        return col.isNull()
    return col == F.lit(value)


def _ne(col: Column, value: Any, is_array: bool) -> Column:
    if value is None:
        return col.isNotNull()
    # SQL != is null-rejecting; parity with the DuckDB/SQL backends.
    return col != F.lit(value)


def _in(col: Column, value: Any, is_array: bool) -> Column:
    if not isinstance(value, (list, tuple, set)):
        value = [value]
    value = list(value)
    if is_array:
        # array-typed lhs: "any element of col in value" -> overlap
        return F.arrays_overlap(col, F.lit(value))
    return col.isin(value)


def _nin(col: Column, value: Any, is_array: bool) -> Column:
    return ~_in(col, value, is_array)


def _contains(col: Column, value: Any, is_array: bool) -> Column:
    if is_array:
        return F.array_contains(col, F.lit(value))
    # string containment fallback (chromadb-flavored $contains on text)
    return col.contains(value)


_OPERATORS = {
    "$eq": _eq,
    "$ne": _ne,
    "$gt": lambda c, v, a: c > F.lit(v),
    "$gte": lambda c, v, a: c >= F.lit(v),
    "$lt": lambda c, v, a: c < F.lit(v),
    "$lte": lambda c, v, a: c <= F.lit(v),
    "$in": _in,
    "$nin": _nin,
    "$like": lambda c, v, a: c.like(v),
    "$regex": lambda c, v, a: c.rlike(v),
    "$contains": _contains,
}

# raw SQL operator passthrough, per sql_utils.py:74-75 ("unrecognized dict key
# treated as raw operator")
_RAW_OPERATORS = {
    "=": _eq,
    "==": _eq,
    "!=": _ne,
    "<>": _ne,
    ">": _OPERATORS["$gt"],
    ">=": _OPERATORS["$gte"],
    "<": _OPERATORS["$lt"],
    "<=": _OPERATORS["$lte"],
    "in": _in,
    "like": _OPERATORS["$like"],
}


def _compile_condition(path: str, spec: Any, df: Optional[DataFrame]) -> Column:
    col = path_col(path)
    is_array = _is_array(df, path)
    if isinstance(spec, dict):
        conds = []
        for op, v in spec.items():
            # field-level extensions beyond the reference operator set
            if op == "$exists":
                conds.append(col.isNotNull() if v else col.isNull())
                continue
            if op == "$size":
                conds.append(F.size(col) == F.lit(int(v)))
                continue
            if op == "$not":
                conds.append(~_compile_condition(path, v, df))
                continue
            if op == "$all":
                # array lhs must contain EVERY listed element
                vals = v if isinstance(v, (list, tuple)) else [v]
                conds.append(
                    reduce(
                        lambda a, b: a & b,
                        [F.array_contains(col, F.lit(x)) for x in vals],
                    )
                    if vals
                    # MongoDB: {field: {$all: []}} matches NO documents
                    else F.lit(False)
                )
                continue
            if op == "$elemMatch":
                # some array element satisfies the sub-clause; elements may be
                # structs (sub-clause keys = element fields) or scalars
                # (operator-only sub-clause applied to the element itself)
                def _elem_pred(e: Column) -> Column:
                    preds = []
                    for ek, ev in v.items():
                        if ek.startswith("$") or ek in _RAW_OPERATORS:
                            fn = _OPERATORS.get(ek) or _RAW_OPERATORS.get(ek)
                            if fn is None:
                                raise ValueError(
                                    f"unsupported $elemMatch operator: {ek!r}"
                                )
                            preds.append(fn(e, ev, False))
                        elif isinstance(ev, dict):
                            for fk, fv in ev.items():
                                fn = _OPERATORS.get(fk) or _RAW_OPERATORS.get(fk)
                                if fn is None:
                                    raise ValueError(
                                        f"unsupported $elemMatch operator: {fk!r}"
                                    )
                                preds.append(fn(e.getField(ek), fv, False))
                        else:
                            preds.append(_eq(e.getField(ek), ev, False))
                    return reduce(lambda a, b: a & b, preds)

                conds.append(F.exists(col, _elem_pred))
                continue
            if op == "$mod":
                divisor, remainder = v
                conds.append(col % F.lit(divisor) == F.lit(remainder))
                continue
            if op == "$type":
                # schema-level check (columnar store: one type per column) —
                # TRUE/FALSE for all rows of the column
                t = _field_type(df.schema, path) if df is not None else None
                conds.append(F.lit(_type_name(t) == str(v).lower()))
                continue
            fn = _OPERATORS.get(op) or _RAW_OPERATORS.get(op)
            if fn is None:
                raise ValueError(f"unsupported where operator: {op!r} on {path!r}")
            conds.append(fn(col, v, is_array))
        return reduce(lambda a, b: a & b, conds)
    if isinstance(spec, (list, tuple)) and not is_array:
        # scalar column matched against a list -> IN (mongo implicit-$in shape)
        return _in(col, spec, is_array)
    return _eq(col, spec, is_array)


def compile_where(where: WhereClause, df: Optional[DataFrame] = None) -> Optional[Column]:
    """Compile any accepted where-clause form to a single Column predicate.

    Returns None for an empty clause (caller skips ``.filter``).
    """
    if where is None:
        return None
    if isinstance(where, str):
        return F.expr(where) if where.strip() else None
    if isinstance(where, (list, tuple)):
        exprs = [compile_where(w, df) for w in where]
        exprs = [e for e in exprs if e is not None]
        if not exprs:
            return None
        return reduce(lambda a, b: a & b, exprs)
    if isinstance(where, dict):
        if not where:
            return None
        conds = []
        for k, v in where.items():
            # boolean combinators — extension surface: the reference's query
            # language has no $or/$and/$not (sql_utils.py stops at per-field
            # operators); Mongo-style combinators compile to Column algebra
            if k == "$or":
                ors = [compile_where(w, df) for w in v]
                # the empty disjunction is FALSE (Mongo rejects $or: []);
                # matches the NOT(vacuous TRUE)=FALSE handling of $not
                if not ors:
                    conds.append(F.lit(False))
                    continue
                # an empty sub-clause compiles to None = vacuously TRUE, so
                # the whole disjunction is TRUE -> contributes no filter
                if any(e is None for e in ors):
                    continue
                conds.append(reduce(lambda a, b: a | b, ors))
                continue
            if k == "$and":
                ands = [e for e in (compile_where(w, df) for w in v) if e is not None]
                if ands:
                    conds.append(reduce(lambda a, b: a & b, ands))
                continue
            if k == "$not":
                inner = compile_where(v, df)
                # NOT(vacuous TRUE) = FALSE
                conds.append(F.lit(False) if inner is None else ~inner)
                continue
            conds.append(_compile_condition(k, v, df))
        if not conds:
            return None
        return reduce(lambda a, b: a & b, conds)
    raise TypeError(f"unsupported where clause type: {type(where)}")


def exclude_column(where: WhereClause, column: str) -> WhereClause:
    """Drop conjuncts that reference ``column`` (facet exclusion rewrite).

    The reference excludes the facet column's own condition from the WHERE
    when computing that column's facet counts (Solr-style multi-select
    faceting; ``sql_utils.py:110-116``). The reference does this with a string
    prefix hack; we operate on the structured clause — dict keys are dropped
    when they equal the column or are a dotted descendant of it.
    String/list clauses cannot be analyzed and are returned unchanged.
    """
    if isinstance(where, dict):
        return {
            k: v
            for k, v in where.items()
            if k != column and not k.startswith(column + ".")
        }
    return where


def apply_where(df: DataFrame, where: WhereClause) -> DataFrame:
    """Filter ``df`` by ``where`` (no-op for empty clauses)."""
    cond = compile_where(where, df)
    return df.filter(cond) if cond is not None else df


def fast_count(df: DataFrame) -> int:
    """Total row count as a single planned aggregate.

    ``Dataset.count()`` constructs and plans a fresh ``groupBy().count()``
    through Catalyst on *every* call (~40 ms of driver time regardless of
    data size). Expressing the count as an explicit aggregate keeps one
    logical plan per query — same job, one planning pass. At cluster scale
    the difference is noise; at interactive latencies it is the floor.
    """
    return df.agg(F.count(F.lit(1)).alias("n")).collect()[0][0]

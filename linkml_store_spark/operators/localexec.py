"""Driver-local Arrow execution tier for footer-small stores.

THE PROBLEM (BENCH rounds 1-8, SCALING.md attribution): every Spark query
pays a 30-70 ms per-job floor (DAGScheduler submit -> task launch -> run ->
collect) that no user-level plan avoids. Against an in-process engine whose
whole answer takes 3-68 ms at sf0.1, that floor IS the ratio — the round-8
attribution measured all twelve benchmark shapes floor-dominated with the
plans already optimal. An in-process engine pays no such floor because it
never schedules: the scan runs in the caller's thread.

THE FIX, Photon-in-reverse: when the persisted store is provably tiny —
parquet footer metadata (exact, truncation-free ``num_rows``) says the
whole table is under :data:`LOCAL_TIER_MAX_ROWS` — ``Collection.query``
routes the compiled predicate/sort/page through THIS module: pyarrow reads
the same parquet files in the driver process and evaluates the same
semantics with Arrow C++ kernels. Zero Spark jobs, zero scheduling floor —
exactly the in-process execution a single-node engine gets for free.

SCALE SAFETY (the 100 TB story): this tier is a *latency* optimization
with a hard size guard, not an execution strategy. The gate reads exact
footer row counts (``num_rows`` is metadata, never an estimate) and
refuses when the store exceeds the row or byte caps (bytes are the
footers' UNCOMPRESSED total_byte_size — what driver memory pays), when any
referenced type/operator falls outside the faithfully-mirrored subset, or
when footers are unavailable. A 100 TB store never comes within six
orders of magnitude of the gate; every plan it refuses runs the normal
distributed path unchanged. Correctness never depends on this module.

ROUTING is A/B-memoized like the Arrow aggregation gate
(``operators/arrowagg.py``): the first eligible query on a store runs BOTH
tiers, compares results (a free value-parity check on the user's own
data), records the measured winner in the shared winner memo under the
pseudo-column ``__local_tier__`` (sidecar-persisted next to stores the
scan owns), and routes every later query. Any parity divergence routes
the store to the JVM permanently and warns.

SEMANTIC MIRROR: the where-compiler here accepts only the subset of the
Mongo-style where-language (``where.py``) it can reproduce EXACTLY with
Arrow kernels — per-field ``$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$like/
$contains/$exists``, raw-operator spellings, implicit AND, ``$or/$and/
$not`` (Kleene three-valued logic via ``and_kleene``/``or_kleene``/
``invert``, matching Spark's SQL semantics: NULL comparisons drop rows,
``$ne``/``$nin`` are null-rejecting). Dotted paths, ``$regex`` (Java
vs RE2 dialect risk), ``$size/$mod/$all/$elemMatch/$type``, array-typed
columns, decimal/map columns, and raw-SQL clauses all REFUSE — the Spark
path owns them. Known accepted divergence (shared with the zone-map count
routes): Spark orders NaN above all doubles and equates NaN=NaN, IEEE/
Arrow do not — same caveat as ``collection._simple_range_clause``.

Reference parity note: the reference engine (e.g.
``src/linkml_store/api/stores/duckdb/duckdb_collection.py``) runs
in-process for ALL sizes; this tier gives its users the same interactive
latency on small collections without giving up the distributed plans that
are this engine's reason to exist.
"""

from __future__ import annotations

import os
from datetime import date, datetime
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

__all__ = [
    "LOCAL_TIER_MAX_ROWS",
    "LOCAL_TIER_MAX_BYTES",
    "LOCAL_TIER_COLUMN",
    "local_tier_enabled",
    "local_tier_max_rows",
    "Unsupported",
    "compile_where_local",
    "local_count",
    "local_page",
    "local_facets",
]

#: pseudo-column prefix under which per-store winners are memoized in the
#: arrowagg A/B memo + sidecar (a real column can never collide). Winners
#: are PER SHAPE CLASS — the round-9 crossover measurement
#: (tools/localtier_scale.py) shows the classes cross at different sizes
#: (at 5M rows the 32-way JVM scan already wins counts while the local
#: select-k still wins top-k pages 2.4x), so one store-level winner would
#: misroute one of them.
LOCAL_TIER_COLUMN = "__local_tier__"


def local_tier_column(kind: str) -> str:
    """The A/B memo pseudo-column for one shape class: count, page,
    agg, facet, or knn."""
    return LOCAL_TIER_COLUMN + kind

#: hard row gate: stores whose exact footer row count exceeds this never
#: route locally, regardless of any memoized winner. This bounds A/B
#: ELIGIBILITY, not routing — within the gate the first touch still runs
#: both tiers and the measured winner routes (tools/localtier_scale.py,
#: SCALING.md round 9: on a 32-core box the local tier wins every shape
#: at 1M rows by 1.3-4.4x, still wins top-k at 5M, and loses counts/aggs
#: to the 32-way JVM scan from ~3-5M — exactly what the per-store memo
#: encodes). The gate's real job is bounding the one-time A/B's local
#: run and keeping the tier out of genuinely big stores entirely.
LOCAL_TIER_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_LOCAL_TIER_MAX_ROWS", 10_000_000)
)

#: companion byte gate (UNCOMPRESSED row-group total_byte_size, from the
#: same footers — the parquet spec's total_byte_size is the uncompressed
#: size, which is the measure that bounds driver memory): a 10M-row
#: store of wide documents must not drag gigabytes through the driver
LOCAL_TIER_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_LOCAL_TIER_MAX_BYTES", 1 << 30)
)


def local_tier_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_LOCAL_TIER", "1") != "0"


#: the measured local-vs-JVM crossover ladder (tools/localtier_scale.py,
#: synthetic single-table stores, best-of-3 per tier, 32-core box —
#: SCALING.md "Local-vs-JVM crossover"). Exported into every A/B sidecar
#: (schema 2, :func:`sidecar_meta`) so a DIFFERENT deployment reading the
#: store starts its routing from this box's measurements instead of from
#: nothing: its own first-touch A/B still runs and overrides, but the
#: ladder tells it where the contested region is.
MEASURED_CROSSOVER_LADDER = {
    "box_cpus": 32,
    "winner_by_rows": {
        "1000000": {"count_eq": "local", "count_range": "local",
                    "topk10": "local", "group_agg": "local"},
        "5000000": {"count_eq": "jvm", "count_range": "jvm",
                    "topk10": "local", "group_agg": "jvm"},
        "10000000": {"count_eq": "jvm", "count_range": "jvm",
                     "topk10": "jvm", "group_agg": "jvm"},
    },
}

#: sidecar schema revision: 1 = per-column winner entries only (round 8);
#: 2 = adds the reserved "__meta__" entry carrying the writing box's
#: local-tier gate constants, cpu count, and the measured ladder above.
#: Readers look entries up BY COLUMN NAME, so "__meta__" (which is never
#: a tier column) is invisible to schema-1 readers — forward compatible.
SIDECAR_SCHEMA = 2


def sidecar_meta() -> dict:
    """The "__meta__" entry written into every A/B sidecar: the gate this
    box routed under plus its measured crossover ladder (round-9 letter
    #6 — a new deployment's first A/B can tighten its own routing from
    the recorded profile instead of starting blind)."""
    return {
        "schema": SIDECAR_SCHEMA,
        "box_cpus": os.cpu_count(),
        "local_tier_gate": {
            "max_rows": local_tier_max_rows(),
            "max_bytes": LOCAL_TIER_MAX_BYTES,
        },
        "measured_ladder": MEASURED_CROSSOVER_LADDER,
    }


def local_tier_max_rows() -> int:
    return LOCAL_TIER_MAX_ROWS


class Unsupported(Exception):
    """Raised by the compiler for anything outside the mirrored subset —
    the caller falls back to the Spark path (never a user-visible error)."""


# --------------------------------------------------------------------- #
# where-clause -> Arrow mask compiler
# --------------------------------------------------------------------- #

def _pa():
    import pyarrow as pa  # deferred: the tier must not tax module import
    import pyarrow.compute as pc

    return pa, pc


def _decode_dict(arr):
    """Plain (non-dictionary) view of a possibly dictionary-encoded array."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr.type, pa.DictionaryType):
        return arr.dictionary_decode()
    return arr


def _dict_pred(arr, pred: Callable):
    """Evaluate a value-predicate over a possibly dictionary-encoded array.

    Dictionary fast path: evaluate over the (tiny) dictionary once, then
    project through the codes with ``take`` — the per-row cost is one
    int-indexed load instead of a string compare. NULL codes take NULL,
    which every caller's Kleene combination then drops, exactly like the
    engine's SQL semantics.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr.type, pa.DictionaryType):
        return pred(arr.dictionary).take(arr.indices)
    return pred(arr)


def _coerce_literal(v: Any, typ) -> Any:
    """Mirror Spark's literal-vs-column cast for the supported types, or
    raise Unsupported. The rules are deliberately narrower than Spark's
    cast matrix: only coercions whose comparison result is provably
    identical pass (e.g. int literal on a double column is exact; a float
    literal on an int column would recast the COLUMN in Spark — refuse)."""
    import pyarrow.types as pt

    if v is None:
        return None
    if pt.is_string(typ) or pt.is_large_string(typ):
        if isinstance(v, str):
            return v
    elif pt.is_integer(typ):
        if isinstance(v, int) and not isinstance(v, bool):
            return v
    elif pt.is_floating(typ):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return float(v)
    elif pt.is_boolean(typ):
        if isinstance(v, bool):
            return v
    elif pt.is_timestamp(typ):
        if typ.tz is not None:
            raise Unsupported("tz-aware timestamp literal comparison")
        if isinstance(v, datetime):
            return v if v.tzinfo is None else _refuse_tz(v)
        if isinstance(v, str):
            try:
                # Spark's string->timestamp cast on the ISO forms the
                # where-language actually uses ('YYYY-MM-DD[ HH:MM:SS[.f]]')
                return datetime.fromisoformat(v)
            except ValueError:
                raise Unsupported(f"unparseable timestamp literal {v!r}")
    elif pt.is_date(typ):
        if isinstance(v, date) and not isinstance(v, datetime):
            return v
        if isinstance(v, str):
            try:
                return date.fromisoformat(v)
            except ValueError:
                raise Unsupported(f"unparseable date literal {v!r}")
    raise Unsupported(f"literal {type(v).__name__} vs column type {typ}")


def _refuse_tz(v):
    raise Unsupported("tz-aware datetime literal")


def _dict_value_type(typ):
    import pyarrow as pa

    return typ.value_type if isinstance(typ, pa.DictionaryType) else typ


class _Cond:
    """A compiled condition: a callable (cols: {name: Array}) -> BooleanArray
    (three-valued: NULL where SQL says NULL), plus the columns it reads."""

    __slots__ = ("fn", "cols")

    def __init__(self, fn, cols):
        self.fn = fn
        self.cols = cols


def _c_eq(name, lit):
    _pa_, pc = _pa()
    if lit is None:
        # IS NULL: two-valued by construction
        return _Cond(lambda cols: pc.is_null(_decode_dict(cols[name])), {name})
    return _Cond(lambda cols: _dict_pred(cols[name], lambda a: pc.equal(a, lit)), {name})


def _c_ne(name, lit):
    _pa_, pc = _pa()
    if lit is None:
        return _Cond(lambda cols: pc.is_valid(_decode_dict(cols[name])), {name})
    return _Cond(
        lambda cols: _dict_pred(cols[name], lambda a: pc.not_equal(a, lit)), {name}
    )


def _c_cmp(name, lit, op):
    _pa_, pc = _pa()
    kern = {"gt": pc.greater, "gte": pc.greater_equal,
            "lt": pc.less, "lte": pc.less_equal}[op]
    return _Cond(lambda cols: _dict_pred(cols[name], lambda a: kern(a, lit)), {name})


def _c_in(name, lits):
    pa, pc = _pa()
    if not lits:
        raise Unsupported("empty IN list")
    if any(l is None for l in lits):
        raise Unsupported("NULL in IN-list")
    vs = pa.array(list(lits))

    def fn(cols):
        arr = cols[name]
        m = _dict_pred(arr, lambda a: pc.is_in(a, value_set=vs))
        # three-valued IN: is_in maps NULL inputs to FALSE, but Spark's
        # col.isin(...) yields NULL there — FALSE vs NULL both drop at the
        # filter, but invert differently under $not, so restore the NULLs
        return pc.if_else(
            pc.is_valid(_decode_dict(arr)), m, pa.scalar(None, pa.bool_())
        )

    return _Cond(fn, {name})


def _c_nin(name, lits):
    # Spark's $nin is ~col.isin(...): NULL rows stay NULL (dropped by the
    # filter), and a further $not brings back NULL, not TRUE — so NOT IN
    # is exactly the Kleene inversion of the three-valued IN above
    return _c_not(_c_in(name, lits))


def _c_like(name, pattern):
    _pa_, pc = _pa()
    return _Cond(
        lambda cols: _dict_pred(cols[name], lambda a: pc.match_like(a, pattern)),
        {name},
    )


def _c_contains(name, needle):
    _pa_, pc = _pa()
    return _Cond(
        lambda cols: _dict_pred(
            cols[name], lambda a: pc.match_substring(a, needle)
        ),
        {name},
    )


def _c_and(conds):
    _pa_, pc = _pa()
    from functools import reduce

    cols = set().union(*[c.cols for c in conds])
    return _Cond(
        lambda cs: reduce(lambda a, b: pc.and_kleene(a, b), [c.fn(cs) for c in conds]),
        cols,
    )


def _c_or(conds):
    _pa_, pc = _pa()
    from functools import reduce

    cols = set().union(*[c.cols for c in conds])
    return _Cond(
        lambda cs: reduce(lambda a, b: pc.or_kleene(a, b), [c.fn(cs) for c in conds]),
        cols,
    )


def _c_not(cond):
    _pa_, pc = _pa()
    return _Cond(lambda cs: pc.invert(cond.fn(cs)), set(cond.cols))


_SUPPORTED_OPS = {
    "$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin",
    "$like", "$contains", "$exists", "$not",
    "=", "==", "!=", "<>", ">", ">=", "<", "<=", "in", "like",
}

_CMP_ALIASES = {
    "$gt": "gt", ">": "gt", "$gte": "gte", ">=": "gte",
    "$lt": "lt", "<": "lt", "$lte": "lte", "<=": "lte",
}


def _col_type(schema, name: str):
    """Arrow type of a plain top-level column, or Unsupported."""
    import pyarrow as pa

    if not isinstance(name, str) or "." in name or "[" in name or name.startswith("$"):
        raise Unsupported(f"non-plain column {name!r}")
    idx = schema.get_field_index(name)
    if idx < 0:
        raise Unsupported(f"unknown column {name!r}")
    typ = _dict_value_type(schema.field(idx).type)
    if isinstance(typ, (pa.ListType, pa.LargeListType, pa.MapType, pa.StructType)):
        raise Unsupported(f"nested column {name!r} in predicate")
    import pyarrow.types as pt

    if pt.is_decimal(typ):
        raise Unsupported("decimal predicate")
    return typ


def _compile_field(name: str, spec: Any, schema) -> _Cond:
    typ = _col_type(schema, name)
    if isinstance(spec, dict):
        conds = []
        for op, v in spec.items():
            if op not in _SUPPORTED_OPS:
                raise Unsupported(f"operator {op!r}")
            if op == "$exists":
                conds.append(_c_ne(name, None) if v else _c_eq(name, None))
            elif op == "$not":
                conds.append(_c_not(_compile_field(name, v, schema)))
            elif op in ("$eq", "=", "=="):
                conds.append(_c_eq(name, _coerce_literal(v, typ)))
            elif op in ("$ne", "!=", "<>"):
                conds.append(_c_ne(name, _coerce_literal(v, typ)))
            elif op in _CMP_ALIASES:
                lit = _coerce_literal(v, typ)
                if lit is None:
                    raise Unsupported("NULL range literal")
                conds.append(_c_cmp(name, lit, _CMP_ALIASES[op]))
            elif op in ("$in", "in"):
                vals = v if isinstance(v, (list, tuple, set)) else [v]
                conds.append(_c_in(name, [_coerce_literal(x, typ) for x in vals]))
            elif op == "$nin":
                vals = v if isinstance(v, (list, tuple, set)) else [v]
                conds.append(_c_nin(name, [_coerce_literal(x, typ) for x in vals]))
            elif op in ("$like", "like"):
                if not isinstance(v, str):
                    raise Unsupported("non-string LIKE pattern")
                _require_string(typ)
                conds.append(_c_like(name, v))
            elif op == "$contains":
                if not isinstance(v, str):
                    raise Unsupported("non-string $contains needle")
                _require_string(typ)
                conds.append(_c_contains(name, v))
        if not conds:
            raise Unsupported("empty operator dict")
        return conds[0] if len(conds) == 1 else _c_and(conds)
    if isinstance(spec, (list, tuple)):
        return _c_in(name, [_coerce_literal(x, typ) for x in spec])
    return _c_eq(name, _coerce_literal(spec, typ))


def _require_string(typ):
    import pyarrow.types as pt

    if not (pt.is_string(typ) or pt.is_large_string(typ)):
        raise Unsupported("string operator on non-string column")


def _nullable_in_values(spec) -> bool:
    vals = spec if isinstance(spec, (list, tuple, set)) else [spec]
    return any(v is None for v in vals)


def compile_where_local(where, schema) -> Optional[_Cond]:
    """Compile a where-clause to an Arrow mask evaluator, or None for the
    empty clause. Raises :class:`Unsupported` for anything outside the
    mirrored subset (see module docstring) — including NULL inside $in/$nin
    value lists, whose SQL semantics ($in never matches NULL rows via IN,
    but the where-language compiles eq-None to IS NULL only for bare
    equality) are not worth mirroring here."""
    if where is None:
        return None
    if isinstance(where, (str,)):
        raise Unsupported("raw SQL clause")
    if isinstance(where, (list, tuple)):
        if not where:
            return None
        raise Unsupported("raw SQL fragment list")
    if not isinstance(where, dict):
        raise Unsupported(f"clause type {type(where).__name__}")
    if not where:
        return None
    conds: List[_Cond] = []
    for k, v in where.items():
        if k == "$or":
            subs = [compile_where_local(w, schema) for w in v]
            if not subs:
                raise Unsupported("empty $or")
            if any(s is None for s in subs):
                continue  # vacuous TRUE disjunct => no filter contribution
            conds.append(_c_or(subs))
        elif k == "$and":
            subs = [s for s in (compile_where_local(w, schema) for w in v) if s is not None]
            if subs:
                conds.append(_c_and(subs))
        elif k == "$not":
            inner = compile_where_local(v, schema)
            if inner is None:
                raise Unsupported("$not of vacuous clause")  # FALSE: rare, let Spark
            conds.append(_c_not(inner))
        else:
            if isinstance(v, dict) and any(x is None for x in v.values() if not isinstance(x, (list, tuple, set))):
                # operator dicts with None operands: only $eq/$ne/$exists
                # handle None; the compile below raises where appropriate
                pass
            if (isinstance(v, (list, tuple)) and _nullable_in_values(v)) or (
                isinstance(v, dict)
                and any(
                    op in ("$in", "$nin", "in") and _nullable_in_values(val)
                    for op, val in v.items()
                )
            ):
                raise Unsupported("NULL in IN-list")
            conds.append(_compile_field(k, v, schema))
    if not conds:
        return None
    return conds[0] if len(conds) == 1 else _c_and(conds)


# --------------------------------------------------------------------- #
# execution
# --------------------------------------------------------------------- #

def _string_cols(schema, names) -> List[str]:
    import pyarrow.types as pt

    out = []
    for n in names:
        idx = schema.get_field_index(n)
        t = _dict_value_type(schema.field(idx).type)
        if pt.is_string(t) or pt.is_large_string(t):
            out.append(n)
    return out


def _read_columns(path: str, columns: Sequence[str], dict_cols: Sequence[str]):
    """One file's columns as a Table. ``dict_cols`` keep parquet dictionary
    encoding intact (predicates then evaluate over codes — the arrowagg
    trick, ~7x the decoded-string compare rate)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path, read_dictionary=list(dict_cols))
    return f.read(columns=list(columns), use_threads=True)


def local_count(files: Sequence[str], schema, cond: Optional[_Cond],
                total_rows: int) -> int:
    """COUNT(*) under the compiled condition — per-file column reads, no
    table materialization beyond the referenced columns."""
    _pa_, pc = _pa()

    if cond is None:
        return int(total_rows)
    need = sorted(cond.cols)
    dict_cols = _string_cols(schema, need)
    n = 0
    for path in files:
        tbl = _read_columns(path, need, dict_cols)
        cols = {c: tbl.column(c).combine_chunks() for c in need}
        mask = cond.fn(cols)
        s = pc.sum(mask)  # NULL mask rows are skipped = dropped rows
        n += int(s.as_py() or 0)
    return n


def _localize_value(v, tzinfo):
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(tzinfo).replace(tzinfo=None)
        if type(v) is not datetime and hasattr(v, "to_pydatetime"):
            # nested ns timestamps surface as pandas.Timestamp — Spark
            # rows hold stdlib datetimes (microsecond precision)
            v = v.to_pydatetime()
        return v
    if isinstance(v, dict):
        return {k: _localize_value(x, tzinfo) for k, x in v.items()}
    if isinstance(v, list):
        return [_localize_value(x, tzinfo) for x in v]
    return v


def _table_to_dicts(tbl, session_tz: Optional[str]) -> List[dict]:
    """Row dicts matching Spark's ``Row.asDict(recursive=True)`` on the
    same data: tz-aware parquet timestamps (Spark-written stores are
    UTC-adjusted) come back as naive datetimes in the SESSION timezone,
    exactly what ``collect()`` returns for TimestampType. Nanosecond
    columns (Spark's INT96 output) are cast to microseconds first —
    TimestampType IS microsecond precision, and ``to_pylist`` on ns
    yields ``pandas.Timestamp`` objects instead of stdlib datetimes."""
    import pyarrow as pa

    needs_pass = False
    for i, f in enumerate(tbl.schema):
        if isinstance(f.type, pa.TimestampType):
            if f.type.unit == "ns":
                tbl = tbl.set_column(
                    i, f.name,
                    tbl.column(i).cast(pa.timestamp("us", tz=f.type.tz)),
                )
            if f.type.tz is not None:
                needs_pass = True
        elif "timestamp" in str(f.type):
            # timestamps nested inside structs/lists: the top-level cast
            # can't reach them — take the per-value fix-up path
            needs_pass = True
    rows = tbl.to_pylist()
    if not rows or not needs_pass:
        return rows
    tzinfo = _resolve_tz(session_tz)
    return [_localize_value(r, tzinfo) for r in rows]


def _resolve_tz(session_tz: Optional[str]):
    if session_tz:
        try:
            from zoneinfo import ZoneInfo

            return ZoneInfo(session_tz)
        except Exception:  # noqa: BLE001 — fall through to system tz
            pass
    return datetime.now().astimezone().tzinfo


def _check_output_types(schema, columns: Sequence[str]) -> None:
    """Refuse output shapes whose ``to_pylist`` differs from Spark's
    ``Row.asDict`` (maps come back as lists of pairs in Arrow)."""
    for n in columns:
        idx = schema.get_field_index(n)
        if idx < 0:
            raise Unsupported(f"unknown select column {n!r}")
        if "map<" in str(schema.field(idx).type):
            raise Unsupported("map-typed output column")


def local_page(
    files: Sequence[str],
    schema,
    cond: Optional[_Cond],
    select_cols: Optional[Sequence[str]],
    sort_specs: Sequence[Tuple[str, bool]],
    offset: int,
    limit: Optional[int],
    session_tz: Optional[str] = None,
) -> List[dict]:
    """The page (sorted/offset/limited row dicts) under the compiled
    condition. ``sort_specs`` — [(column, descending)], NULLS LAST both
    directions (the engine's pinned ordering, collection._sort_col).
    ``limit`` None = unlimited. Unsorted limited pages stream file batches
    and stop early — the CollectLimit analog."""
    pa, pc = _pa()

    out_cols = list(select_cols) if select_cols else [f.name for f in schema]
    _check_output_types(schema, out_cols)
    sort_cols = [c for c, _d in sort_specs]
    for c in sort_cols:
        _col_type(schema, c)  # plain, non-nested, known
    where_cols = sorted(cond.cols) if cond is not None else []
    need = list(dict.fromkeys(out_cols + sort_cols + where_cols))

    if not sort_specs:
        return _stream_page(
            files, schema, cond, need, out_cols, offset, limit, session_tz
        )

    _n, page = _sorted_count_page(
        files, schema, cond, need, where_cols, out_cols, sort_specs,
        offset, limit, session_tz,
    )
    return page


def local_count_page(
    files: Sequence[str],
    schema,
    cond: Optional[_Cond],
    select_cols: Optional[Sequence[str]],
    sort_specs: Sequence[Tuple[str, bool]],
    offset: int,
    limit: Optional[int],
    total_rows: int,
    session_tz: Optional[str] = None,
) -> Tuple[int, List[dict]]:
    """(pre-pagination COUNT, page rows) in ONE mask pass per file — the
    fused form of ``local_count`` + ``local_page`` for queries that need
    both (the reference ``Query`` contract: ``num_rows`` is the total
    match count, ``rows`` the page). Unfused, the predicate columns are
    read and the mask evaluated twice per file; here the full-file mask
    feeds ``sum`` (the count) and is sliced per record batch to take the
    page, and the page batches read only the OUTPUT columns. Sorted pages
    materialize every matching row anyway, so there the count is free."""
    pa, pc = _pa()
    import pyarrow.parquet as pq

    out_cols = list(select_cols) if select_cols else [f.name for f in schema]
    _check_output_types(schema, out_cols)
    sort_cols = [c for c, _d in sort_specs]
    for c in sort_cols:
        _col_type(schema, c)
    where_cols = sorted(cond.cols) if cond is not None else []
    need = list(dict.fromkeys(out_cols + sort_cols + where_cols))

    if cond is None:
        # count is footer metadata; nothing to fuse
        rows = local_page(
            files, schema, None, select_cols, sort_specs, offset, limit,
            session_tz=session_tz,
        )
        return int(total_rows), rows

    if sort_specs:
        return _sorted_count_page(
            files, schema, cond, need, where_cols, out_cols, sort_specs,
            offset, limit, session_tz,
        )

    # unsorted: full-file mask per file -> count; early-out batch stream
    # over the output columns reuses mask slices (no second predicate pass)
    dict_cols = _string_cols(schema, where_cols)
    take = None if limit is None else offset + limit
    n = 0
    got: List[Any] = []
    have = 0
    for path in files:
        f = pq.ParquetFile(path, read_dictionary=dict_cols)
        wt = f.read(columns=where_cols)
        cols = {c: wt.column(c).combine_chunks() for c in where_cols}
        mask = cond.fn(cols)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        n += int(pc.sum(mask).as_py() or 0)  # NULL mask rows skipped
        if take is not None and have >= take:
            continue  # page already full: this file contributed count only
        pos = 0
        for b in f.iter_batches(batch_size=8192, columns=out_cols):
            bm = mask.slice(pos, b.num_rows)
            pos += b.num_rows
            fb = b.filter(bm)  # NULL -> dropped, same as the filter path
            if fb.num_rows:
                got.append(fb)
                have += fb.num_rows
            if take is not None and have >= take:
                break
    if not got:
        return n, []
    tbl = pa.Table.from_batches(got, schema=got[0].schema)
    if take is not None:
        tbl = tbl.slice(offset, limit)
    elif offset:
        tbl = tbl.slice(offset)
    return n, _table_to_dicts(tbl.select(out_cols), session_tz)


def _sorted_count_page(
    files, schema, cond, need, where_cols, out_cols, sort_specs,
    offset, limit, session_tz,
) -> Tuple[int, List[dict]]:
    """Shared sorted-page kernel: read needed columns of every file, mask
    ONCE, then (matched-row count, sorted/offset/limited page). The count
    is a by-product of the rows the sort must materialize anyway."""
    pa, pc = _pa()

    sort_cols = [c for c, _d in sort_specs]
    dict_cols = _string_cols(schema, where_cols)
    tables = []
    n = 0
    for path in files:
        tbl = _read_columns(path, need, dict_cols)
        if cond is not None:
            cols = {c: tbl.column(c).combine_chunks() for c in where_cols}
            tbl = tbl.filter(cond.fn(cols))  # NULL mask -> dropped (SQL filter)
        n += tbl.num_rows
        tables.append(tbl)
    if not tables:
        return 0, []
    table = pa.concat_tables(tables).combine_chunks()
    # dictionary sort keys sort by CODE, not value — decode them first
    for c in sort_cols:
        col = table.column(c)
        if isinstance(col.type, pa.DictionaryType):
            table = table.set_column(
                table.schema.get_field_index(c), c, _decode_dict(col)
            )
    keys = [(c, "descending" if d else "ascending") for c, d in sort_specs]
    k_eff = None if limit is None else offset + limit
    no_nulls = all(table.column(c).null_count == 0 for c in sort_cols)
    if k_eff is not None and k_eff <= 100_000 and no_nulls and k_eff < table.num_rows:
        idx = pc.select_k_unstable(table, k=k_eff, sort_keys=keys)
    else:
        idx = pc.sort_indices(table, sort_keys=keys, null_placement="at_end")
    if limit is not None:
        idx = idx.slice(offset, limit)
    elif offset:
        idx = idx.slice(offset)
    page = table.take(idx).select(out_cols)
    return n, _table_to_dicts(page, session_tz)


def _stream_page(
    files, schema, cond, need, out_cols, offset, limit, session_tz
) -> List[dict]:
    """Unsorted page: stream record batches in file order, stop as soon as
    offset+limit rows matched — identical early-out to Spark CollectLimit
    over the same file order (the page contents of an UNSORTED limited
    query are an arbitrary-k selection on both engines)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    take = None if limit is None else offset + limit
    where_cols = sorted(cond.cols) if cond is not None else []
    dict_cols = _string_cols(schema, where_cols)
    got: List[Any] = []
    have = 0
    for path in files:
        f = pq.ParquetFile(path, read_dictionary=dict_cols)
        for b in f.iter_batches(batch_size=8192, columns=need):
            if cond is not None:
                b = b.filter(cond.fn({c: b.column(c) for c in where_cols}))
            if b.num_rows:
                got.append(b)
                have += b.num_rows
            if take is not None and have >= take:
                break
        if take is not None and have >= take:
            break
    if not got:
        return []
    tbl = pa.Table.from_batches(got, schema=got[0].schema)
    if take is not None:
        tbl = tbl.slice(offset, limit)
    elif offset:
        tbl = tbl.slice(offset)
    return _table_to_dicts(tbl.select(out_cols), session_tz)


# --------------------------------------------------------------------- #
# facets
# --------------------------------------------------------------------- #

def _facet_sort_key(vc):
    """count desc, value asc with NULL first — the engine's pinned facet
    tie order (facets._finish_facet_single / query_facets zone path)."""
    v, c = vc
    if isinstance(v, tuple):
        return (-c,) + tuple((x is not None, x if x is not None else 0) for x in v)
    return (-c, v is not None, v if v is not None else 0)


def local_facets(
    files: Sequence[str],
    schema,
    cond_for: Callable[[Any], Optional[_Cond]],
    facet_columns: Sequence,
    facet_limit: int,
    facet_min_count: int,
) -> Dict[Any, List[Tuple]]:
    """Facet counts {column: [(value, count), ...]} over the store —
    pyarrow ``value_counts`` over dictionary codes per column (compound
    facets group over the decoded pair table). ``cond_for(column)`` returns
    the compiled post-exclusion condition for that facet column (the
    multi-select exclusion rewrite happens in the caller against the
    where-language, not here)."""
    pa, pc = _pa()

    results: Dict[Any, List[Tuple]] = {}
    for col in facet_columns:
        cols = [col] if isinstance(col, str) else list(col)
        for c in cols:
            _col_type(schema, c)  # plain + supported or Unsupported
        cond = cond_for(col)
        where_cols = sorted(cond.cols) if cond is not None else []
        need = list(dict.fromkeys(cols + where_cols))
        dict_cols = _string_cols(schema, need)
        counts: Dict[Any, int] = {}
        for path in files:
            tbl = _read_columns(path, need, dict_cols)
            if cond is not None:
                cvals = {c: tbl.column(c).combine_chunks() for c in where_cols}
                tbl = tbl.filter(cond.fn(cvals))
            if len(cols) == 1:
                vc = pc.value_counts(_decode_dict(tbl.column(cols[0])))
                for v, n in zip(
                    vc.field("values").to_pylist(), vc.field("counts").to_pylist()
                ):
                    counts[v] = counts.get(v, 0) + n
            else:
                sub = pa.Table.from_arrays(
                    [_decode_dict(tbl.column(c)) for c in cols], names=cols
                )
                g = sub.group_by(cols).aggregate([([], "count_all")])
                vals = [g.column(c).to_pylist() for c in cols]
                for i, n in enumerate(g.column("count_all").to_pylist()):
                    key = tuple(v[i] for v in vals)
                    counts[key] = counts.get(key, 0) + n
        rows = sorted(counts.items(), key=_facet_sort_key)
        if facet_min_count > 1:
            rows = [t for t in rows if t[1] >= facet_min_count]
        if facet_limit and facet_limit > 0:
            rows = rows[:facet_limit]
        results[col] = [(v, int(n)) for v, n in rows]
    return results


# --------------------------------------------------------------------- #
# grouped aggregation (Query.group_by/aggs extension)
# --------------------------------------------------------------------- #

#: Query.aggs fn -> Arrow aggregate kernel; count(*) handled separately
_AGG_KERNELS = {"count": "count", "sum": "sum", "avg": "mean",
                "min": "min", "max": "max",
                # Arrow's grouped count_distinct defaults to valid-only,
                # exactly Spark's countDistinct NULL handling
                "count_distinct": "count_distinct"}

#: argmin/argmax family: ONE shared order tuple, sorted once (descending
#: for max_by, ascending for min_by), then grouped 'first' picks the
#: extreme-tuple row
_ARG_FNS = {"max_by": "descending", "min_by": "ascending"}


def predicted_agg_schema(schema, group_by, aggs):
    """The Arrow schema :func:`local_group_agg` will produce for this
    (group_by, aggs) spec over ``schema`` — used to compile a HAVING
    clause at PLAN time (before any aggregation has run). Raises
    Unsupported where the output type is not certain to match the
    executor's (float32 sums, expression inputs), so a having-bearing
    plan refuses to the Spark path instead of filtering on a guessed
    type."""
    import pyarrow as pa
    import pyarrow.types as pt

    plain, derived = _split_group_by(group_by)
    fields = []
    for c in plain:
        fields.append(pa.field(c, _col_type(schema, c)))
    for alias, _unit, col in derived:
        t = schema.field(schema.get_field_index(col)).type
        fields.append(pa.field(alias, pa.timestamp("us", tz=t.tz)))
    for alias, spec in (aggs or {"count": ("count", None)}).items():
        fn = str(spec[0]).lower()
        col = spec[1] if len(spec) > 1 else None
        if fn in ("count", "count_distinct"):
            fields.append(pa.field(alias, pa.int64()))
            continue
        if fn in _ARG_FNS:
            fields.append(pa.field(alias, _col_type(schema, col)))
            continue
        if not is_plain_name(col):
            raise Unsupported("having over expression-input aggregate")
        t = _col_type(schema, col)
        if fn == "avg":
            fields.append(pa.field(alias, pa.float64()))
        elif fn == "sum":
            if pt.is_integer(t):
                fields.append(pa.field(alias, pa.int64()))
            elif pt.is_float64(t):
                fields.append(pa.field(alias, pa.float64()))
            else:
                raise Unsupported(f"having over sum({t})")
        elif fn in ("min", "max"):
            fields.append(pa.field(alias, t))
        else:
            raise Unsupported(f"having over {fn}")
    return pa.schema(fields)


def _split_group_by(group_by):
    """(plain_keys, derived) where derived = [(alias, unit, source_col)].
    Raises Unsupported for any derivation other than date_trunc."""
    plain, derived = [], []
    for g in group_by:
        if isinstance(g, str):
            plain.append(g)
        else:
            try:
                alias, (fn, unit, col) = g
            except Exception:  # noqa: BLE001
                raise Unsupported(f"malformed group key {g!r}")
            if str(fn) != "date_trunc" or unit not in (
                "minute", "hour", "day", "week", "month", "year"
            ):
                raise Unsupported(f"derived group key {g!r}")
            derived.append((alias, unit, col))
    return plain, derived


def validate_group_agg(schema, group_by, aggs, session_tz=None) -> None:
    """Raise Unsupported unless every group key and aggregate input is
    inside the mirrored subset. Float group keys refuse: Spark normalizes
    -0.0/NaN in grouping keys, Arrow hashes raw bits — the one grouping
    divergence that can't be mirrored cheaply. Derived date_trunc keys
    over tz-aware columns refuse unless the session timezone is UTC
    (Spark truncates in session time, Arrow in the column's zone)."""
    import pyarrow.types as pt

    plain, derived = _split_group_by(group_by)
    key_aliases = [a for a, _u, _c in derived]
    for c in plain:
        t = _col_type(schema, c)
        if pt.is_floating(t) or pt.is_timestamp(t):
            raise Unsupported(f"group key type {t} on {c!r}")
    for _alias, _unit, col in derived:
        idx = schema.get_field_index(col)
        if idx < 0:
            raise Unsupported(f"unknown column {col!r}")
        t = schema.field(idx).type
        if not pt.is_timestamp(t):
            raise Unsupported("date_trunc over non-timestamp column")
        if t.tz is not None and (session_tz or "UTC") not in (
            "UTC", "Etc/UTC", "GMT", "+00:00", "Z"
        ):
            raise Unsupported("date_trunc on tz-aware column outside UTC")
    order_tuples = {
        (str(spec[0]).lower(), tuple(spec[2]))
        for spec in (aggs or {}).values()
        if str(spec[0]).lower() in _ARG_FNS and len(spec) == 3
    }
    if len(order_tuples) > 1:
        # the local argmin/argmax implementation sorts ONCE by the shared
        # (direction, order tuple); heterogeneous orders or mixed
        # min_by/max_by would need one sort per tuple
        raise Unsupported("multiple min_by/max_by order tuples")
    for alias, spec in (aggs or {}).items():
        fn = str(spec[0]).lower()
        col = spec[1] if len(spec) > 1 else None
        if fn not in _AGG_KERNELS and fn not in _ARG_FNS:
            raise Unsupported(f"aggregate fn {fn!r}")
        if alias in plain or alias in key_aliases:
            raise Unsupported(f"alias {alias!r} collides with a group key")
        if fn in _ARG_FNS:
            if len(spec) != 3 or not spec[2]:
                raise Unsupported(f"{fn} needs (fn, value_col, order_cols)")
            _col_type(schema, col)
            for o in spec[2]:
                t = _col_type(schema, o)
                if pt.is_timestamp(t) and t.tz is not None and (
                    session_tz or "UTC"
                ) not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
                    raise Unsupported(f"tz-aware {fn} order col outside UTC")
            continue
        if col in (None, "*"):
            if fn != "count":
                raise Unsupported(f"{fn} requires a column")
            continue
        if fn == "count_distinct":
            t = _col_type(schema, col)
            if pt.is_floating(t):
                # Spark normalizes -0.0/NaN inside DISTINCT; Arrow
                # distinguishes by bits — refuse rather than mirror
                raise Unsupported("count_distinct over float column")
            if pt.is_timestamp(t):
                raise Unsupported("count_distinct over timestamp column")
            continue
        if not is_plain_name(col):
            # restricted arithmetic over numeric columns ("a * (1 - b)"):
            # the SAME string feeds F.expr on the distributed side
            if fn == "count":
                raise Unsupported("count over an expression")
            compile_arith(col, schema)
            continue
        t = _col_type(schema, col)
        if fn in ("sum", "avg") and not (
            pt.is_integer(t) or pt.is_float64(t) or pt.is_float32(t)
        ):
            raise Unsupported(f"{fn} over non-numeric {col!r}")
        if fn in ("min", "max") and pt.is_timestamp(t):
            raise Unsupported("timestamp min/max value parity not mirrored")


def _agg_input_cols(aggs, schema):
    cols = []
    for spec in (aggs or {}).values():
        fn = str(spec[0]).lower()
        col = spec[1] if len(spec) > 1 else None
        if col not in (None, "*"):
            if is_plain_name(col):
                cols.append(col)
            else:
                _ev, used = compile_arith(col, schema)
                cols.extend(sorted(used))
        if fn in _ARG_FNS:
            cols.extend(spec[2])
    return cols


def _merged_schema(schema, join):
    """Post-join column space (left + right minus the coalesced right
    key); the left schema unchanged when there is no join. Semi/anti
    joins are EXISTS filters — their output space is the left schema."""
    if join is None or (len(join) > 4 and join[4] in ("semi", "anti")):
        return schema
    import pyarrow as pa

    right_schema, right_on = join[1], join[3]
    return pa.schema(
        list(schema) + [f for f in right_schema if f.name != right_on]
    )


def local_group_agg(
    files: Sequence[str],
    schema,
    cond: Optional[_Cond],
    group_by: Sequence,
    aggs,
    session_tz: Optional[str] = None,
    join=None,
):
    """(total_groups, aggregate Table) — UNPAGED/UNSORTED; the caller owns
    sort/offset/limit. The store is gate-bounded, so all files' REFERENCED
    columns concatenate first, then ONE C++ hash aggregation runs.

    ``join`` = (right_files, right_schema, left_on, right_on): an INNER
    equi-join runs first (Arrow hash join; NULL keys drop, matching SQL).
    Derived ``date_trunc`` keys floor in C (week starts Monday, like
    Spark). ``max_by`` aggregates sort once by the order tuple descending
    and take ``first`` per group (single-threaded group-by: 'first' is
    scan-order-defined); NULL order values refuse — Spark's struct-max
    null ordering is not mirrored.

    Sum/mean accumulate in float64 exactly like Spark's double aggregates;
    sum over int32/64 yields int64 (Spark: long). Count skips NULLs for a
    named column and counts rows for ``(count, None)``, matching SQL.
    """
    pa, pc = _pa()

    aggs = dict(aggs or {"count": ("count", None)})
    plain, derived = _split_group_by(group_by)
    where_cols = sorted(cond.cols) if cond is not None else []
    derived_srcs = [c for _a, _u, c in derived]
    expr_schema = _merged_schema(schema, join)
    agg_cols = _agg_input_cols(aggs, expr_schema)
    need_all = list(dict.fromkeys(
        plain + derived_srcs + agg_cols + where_cols
    ))

    def _read_side(side_files, side_schema, cols, extra):
        names = {f.name for f in side_schema}
        mine = [c for c in cols if c in names] + list(extra)
        mine = list(dict.fromkeys(mine))
        dict_cols = _string_cols(side_schema, [c for c in where_cols if c in names])
        ts = [_read_columns(p, mine, dict_cols) for p in side_files]
        return pa.concat_tables(ts).combine_chunks()

    if join is not None:
        right_files, right_schema, left_on, right_on = join[:4]
        how = join[4] if len(join) > 4 else "inner"
        left = _read_side(files, schema, need_all, [left_on])
        if how in ("semi", "anti"):
            # EXISTS / NOT EXISTS: only the right KEY column is read; the
            # membership test replaces the hash join. NULL left keys never
            # match (semi drops them, like SQL EXISTS); anti KEEPS them
            # (SQL NOT EXISTS / Spark left_anti: null matches nothing).
            right_keys = _read_side(
                right_files, right_schema, [], [right_on]
            ).column(right_on).combine_chunks().drop_null()
            key = left.column(left_on).combine_chunks()
            mask = pc.is_in(key, value_set=right_keys.unique())
            if how == "anti":
                mask = pc.or_kleene(pc.invert(mask), pc.is_null(key))
            table = left.filter(mask)
        else:
            right = _read_side(right_files, right_schema, need_all, [right_on])
            table = left.join(
                right, keys=[left_on], right_keys=[right_on],
                join_type="inner" if how == "inner" else "left outer",
            ).combine_chunks()
    else:
        table = _read_side(files, schema, need_all, [])
    if cond is not None:
        cols = {c: table.column(c).combine_chunks() for c in where_cols}
        table = table.filter(cond.fn(cols))
    # decode any dictionary columns: group keys must surface as plain
    # values, and aggregate kernels over codes would be wrong
    for i, f in enumerate(table.schema):
        if isinstance(f.type, pa.DictionaryType):
            table = table.set_column(i, f.name, _decode_dict(table.column(i)))
    # derive time-bucket keys (truncate ns->us so values match Spark's
    # microsecond TimestampType exactly)
    keys = list(plain)
    for alias, unit, col in derived:
        src = table.column(col)
        trunc = pc.floor_temporal(
            src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src,
            unit=unit, week_starts_monday=True,
        )
        if trunc.type.unit == "ns":
            trunc = trunc.cast(pa.timestamp("us", tz=trunc.type.tz))
        table = table.append_column(alias, trunc)
        keys.append(alias)

    # materialize arithmetic-expression aggregate inputs as synthetic
    # columns so the standard kernels apply (one evaluation per distinct
    # expression, shared across aliases)
    expr_names = {}
    for spec in aggs.values():
        col = spec[1] if len(spec) > 1 else None
        if col not in (None, "*") and not is_plain_name(col) and col not in expr_names:
            ev, _used = compile_arith(col, expr_schema)
            name = f"__expr_{len(expr_names)}"
            table = table.append_column(
                name, ev({c: table.column(c) for c in table.column_names})
            )
            expr_names[col] = name

    def _norm_col(col):
        return expr_names.get(col, col)

    def _key(fn, col, spec):
        fn = str(fn).lower()
        if fn in _ARG_FNS:
            return (fn, col, tuple(spec[2]))
        return (
            ("*", "count_all") if col in (None, "*")
            else (_norm_col(col), _AGG_KERNELS[fn])
        )

    # min_by/max_by: ONE shared order tuple, pre-sorted (ascending for
    # min_by, descending for max_by); 'first' per group then picks the
    # extreme-tuple row (stable, single-threaded)
    order_tuples = {
        (str(spec[0]).lower(), tuple(spec[2])) for spec in aggs.values()
        if str(spec[0]).lower() in _ARG_FNS
    }
    if len(order_tuples) > 1:
        raise Unsupported("multiple min_by/max_by order tuples")
    single_thread = False
    if order_tuples:
        arg_fn, orders = next(iter(order_tuples))
        direction = _ARG_FNS[arg_fn]
        for o in orders:
            col = table.column(o)
            if col.null_count:
                raise Unsupported(f"NULL {arg_fn} order values")
        table = table.sort_by([(o, direction) for o in orders])
        single_thread = True

    specs, seen = [], set()
    for alias, spec in aggs.items():
        fn, col = str(spec[0]).lower(), (spec[1] if len(spec) > 1 else None)
        k = _key(fn, col, spec)
        if k in seen:
            continue
        seen.add(k)
        if k[0] == "*":
            specs.append(([], "count_all"))
        elif k[0] in _ARG_FNS:
            # skip_nulls=False: Spark's min_by/max_by return the argmin/
            # argmax row's carried value even when it is NULL; Arrow's
            # default 'first' would skip to the group's first non-NULL
            specs.append(
                (k[1], "first", pc.ScalarAggregateOptions(skip_nulls=False))
            )
        else:
            specs.append(k)
    # pyarrow 16.1 grouper bug (found by the property differential): a
    # VAR-LENGTH key preceding a NULL-bearing fixed-width key splits the
    # null-keyed groups (group_by(["s","g"]) on 48 true groups returned
    # 66 rows; ["g","s"] returns 48). Key order is semantically free —
    # grouping happens on the set — so always feed the grouper
    # fixed-width keys first; the output pulls columns BY NAME in the
    # caller's requested order either way.
    import pyarrow.types as _pt

    def _varlen(c):
        t = table.schema.field(table.schema.get_field_index(c)).type
        return bool(
            _pt.is_string(t) or _pt.is_large_string(t)
            or _pt.is_binary(t) or _pt.is_large_binary(t)
        )

    grouper_keys = sorted(keys, key=_varlen)  # stable: fixed-width first
    g = table.group_by(
        grouper_keys, use_threads=not single_thread
    ).aggregate(specs)
    # arrow names outputs {col}_{fn} / count_all — map back to the aliases
    # (duplicate (col, fn) pairs under different aliases share one kernel)
    bykey = {}
    for k in seen:
        if k[0] == "*":
            bykey[k] = g.column("count_all")
        elif k[0] in _ARG_FNS:
            bykey[k] = g.column(f"{k[1]}_first")
        else:
            bykey[k] = g.column(f"{k[0]}_{k[1]}")
    cols_out = {c: g.column(c) for c in keys}
    for alias, spec in aggs.items():
        fn, col = str(spec[0]).lower(), (spec[1] if len(spec) > 1 else None)
        cols_out[alias] = bykey[_key(fn, col, spec)]
    out = pa.table(cols_out)
    return out.num_rows, out


def paginate_table(
    table,
    sort_specs: Sequence[Tuple[str, bool]],
    offset: int,
    limit: Optional[int],
    select_cols: Optional[Sequence[str]],
    session_tz: Optional[str] = None,
) -> List[dict]:
    """Sort/offset/limit/project an in-memory Arrow table and return row
    dicts — the shared page tail for the aggregate tier (the scan tier
    has its own streaming/select-k variants in :func:`local_page`)."""
    _pa_, pc = _pa()

    if sort_specs:
        keys = [(c, "descending" if d else "ascending") for c, d in sort_specs]
        idx = pc.sort_indices(table, sort_keys=keys, null_placement="at_end")
        table = table.take(idx)
    if limit is not None:
        table = table.slice(offset, limit)
    elif offset:
        table = table.slice(offset)
    if select_cols:
        table = table.select(list(select_cols))
    return _table_to_dicts(table, session_tz)


# --------------------------------------------------------------------- #
# kNN (eager Collection.knn_search local route)
# --------------------------------------------------------------------- #

def local_knn(
    files: Sequence[str],
    schema,
    vector_col: str,
    query_vector: Sequence[float],
    k: int,
    score_col: str = "score",
    select_cols: Optional[Sequence[str]] = None,
    session_tz: Optional[str] = None,
    metric: str = "cosine",
) -> List[dict]:
    """Exact top-k in-process: one fused numpy matmul over the store's
    (gate-bounded) vectors — the same float64 math as the engine's Arrow
    kernels (``functions/vector.cosine_to_query`` / ``distance_to_query``).
    ``metric``: cosine (default) / dot rank descending, euclidean /
    manhattan ascending — mirroring ``index.search.knn``. Raises
    Unsupported on anything whose Spark-path semantics this cannot
    mirror: NULL or ragged vectors, zero norms (cosine) / non-finite
    scores (Spark orders NaN above all doubles; numpy sorts it last)."""
    import numpy as np
    import pyarrow as pa

    pa_, pc = _pa()
    out_cols = [f.name for f in schema if f.name != vector_col]
    if select_cols:
        out_cols = [c for c in select_cols if c != score_col]
    need = list(dict.fromkeys(out_cols + [vector_col]))
    tables = [_read_columns(p, need, ()) for p in files]
    tbl = pa.concat_tables(tables).combine_chunks()
    col = tbl.column(vector_col).combine_chunks()
    if col.null_count:
        raise Unsupported("NULL vectors")
    typ = col.type
    n = len(col)
    if isinstance(typ, pa.FixedSizeListType):
        dim = typ.list_size
        flat = col.values
    elif isinstance(typ, (pa.ListType, pa.LargeListType)):
        flat = col.values
        if n == 0 or len(flat) % n != 0:
            raise Unsupported("ragged vectors")
        dim = len(flat) // n
        offs = col.offsets.to_numpy(zero_copy_only=False)
        # offsets must tile [0, len(flat)] exactly in dim-sized steps —
        # a sliced/offset array's values buffer would misalign the reshape
        if offs[0] != 0 or offs[-1] != len(flat) or not (np.diff(offs) == dim).all():
            raise Unsupported("ragged vectors")
    else:
        raise Unsupported(f"vector column type {typ}")
    if flat.null_count:
        raise Unsupported("NULL vector elements")
    q = np.asarray(list(query_vector), dtype=np.float64)
    if len(q) != dim:
        raise Unsupported("query/vector dimensionality mismatch")
    X = flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, dim)
    if metric == "cosine":
        qn = float(np.linalg.norm(q))
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        denom = norms * qn
        if qn == 0.0 or (denom == 0.0).any():
            raise Unsupported("zero-norm vector")
        scores = (X @ q) / denom
    elif metric == "dot":
        scores = X @ q
    elif metric == "euclidean":
        # the STABLE sum-of-squared-differences form, matching the native
        # JVM kernel (dims <= 128, the usual local-tier case) — the
        # |x|^2 - 2 x.q + |q|^2 matmul form leaves ~1e-8 cancellation
        # residue at near-zero distances, which the 12-sig-fig A/B parity
        # compare would flag as a mismatch against the native plan
        d = X - q[None, :]
        scores = np.sqrt(np.einsum("ij,ij->i", d, d))
    elif metric == "manhattan":
        scores = np.abs(X - q[None, :]).sum(axis=1)
    else:
        raise Unsupported(f"metric {metric}")
    if not np.isfinite(scores).all():
        raise Unsupported("non-finite scores")
    kk = min(k, n)
    if kk <= 0:
        return []
    sgn = scores if metric in ("euclidean", "manhattan") else -scores
    part = np.argpartition(sgn, kk - 1)[:kk]
    top = part[np.argsort(sgn[part], kind="stable")]
    page = tbl.select(out_cols).take(pa.array(top))
    rows = _table_to_dicts(page, session_tz)
    for r, i in zip(rows, top):
        r[score_col] = float(scores[i])
    if select_cols:
        rows = [{c: r.get(c) for c in select_cols} for r in rows]
    return rows


# --------------------------------------------------------------------- #
# restricted arithmetic over columns for aggregate inputs
# --------------------------------------------------------------------- #

def compile_arith(expr: str, schema):
    """Compile a restricted arithmetic expression over numeric columns
    (``+ - *`` with parentheses, numeric literals, unary minus) into an
    Arrow evaluator, or raise Unsupported. The grammar is the overlap
    where Python-ast and Spark-SQL parses agree token-for-token, so the
    SAME string feeds ``F.expr`` on the distributed side — e.g. TPC-H
    Q1's ``l_extendedprice * (1 - l_discount)``. Division is excluded
    (SQL and Arrow disagree on integer division). Arithmetic NULLs
    propagate and non-ANSI overflow wraps on both engines (Arrow's
    unchecked kernels = Spark's default mode).

    Returns ``(evaluate, cols)`` — evaluate({col: Array}) -> Array.
    """
    import ast

    import pyarrow.types as pt

    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError:
        raise Unsupported(f"unparseable expression {expr!r}")
    cols: set = set()

    _OPS = {ast.Add: "add", ast.Sub: "subtract", ast.Mult: "multiply"}

    def build(node):
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.BinOp) and type(node.op) in _OPS:
            return ("op", _OPS[type(node.op)], build(node.left), build(node.right))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return ("neg", build(node.operand))
        if isinstance(node, ast.Name):
            t = _col_type(schema, node.id)
            if not (pt.is_integer(t) or pt.is_floating(t)):
                raise Unsupported(f"non-numeric column {node.id!r} in arithmetic")
            cols.add(node.id)
            return ("col", node.id)
        if isinstance(node, ast.Constant) and isinstance(
            node.value, (int, float)
        ) and not isinstance(node.value, bool):
            return ("lit", node.value)
        raise Unsupported(f"unsupported arithmetic node {type(node).__name__}")

    ir = build(tree)

    def evaluate(cols_map):
        _pa_, pc = _pa()

        def rec(n):
            if n[0] == "op":
                return getattr(pc, n[1])(rec(n[2]), rec(n[3]))
            if n[0] == "neg":
                return pc.negate(rec(n[1]))
            if n[0] == "col":
                return _decode_dict(cols_map[n[1]])
            return n[1]

        return rec(ir)

    return evaluate, cols


_PLAIN_NAME = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def is_plain_name(col: str) -> bool:
    return bool(_PLAIN_NAME.match(col or ""))

"""Pure-stdlib reader/writer for R .rds files (data.frame subset).

R's ``saveRDS`` emits the documented R serialization format ("R Internals"
§ Serialization Formats, versions 2 and 3): an optional gzip wrapper around
an XDR (big-endian) stream of typed items. A data.frame is a generic
vector (VECSXP) of atomic column vectors with ``names`` / ``class`` /
``row.names`` attributes — all parseable with ``struct`` alone, the same
no-dependency trade as the stdlib XLSX reader (sources/formats.py).

Scope (the interchange subset a tabular loader needs):
  * container: uncompressed or gzip (``saveRDS`` default);
  * format: XDR ("X\\n"), versions 2 and 3;
  * columns: logical / integer / real / string vectors, with R NA values
    mapped to None; factor columns resolved through their levels;
  * attributes: names, class, row.names, levels; unknown attributes are
    read and ignored.

``write_rds`` emits the same subset (version 2, uncompressed or gzip) —
used by the round-trip tests and as a parquet-to-R export path.

Types and flag layout follow the public spec: each item opens with a
32-bit flags word — ``type = flags & 255``, ``object = flags & 0x100``,
``attributes = flags & 0x200``, ``tag = flags & 0x400``; pairlist tags are
symbols (SYMSXP wrapping a CHARSXP), repeated symbols become REFSXP
back-references with the ref index in ``flags >> 8``.
"""

from __future__ import annotations

import gzip
import struct
from typing import Any, Dict, List, Optional

__all__ = ["read_rds_frame", "write_rds"]

# SEXP type codes (R Internals, serialization)
_SYMSXP = 1
_LISTSXP = 2
_CHARSXP = 9
_LGLSXP = 10
_INTSXP = 13
_REALSXP = 14
_STRSXP = 16
_VECSXP = 19
_NILVALUE = 254
_REFSXP = 255

_NA_INT = -0x80000000
_NA_REAL_BITS = 0x7FF00000000007A2  # R's NA_real_ payload


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0
        self.refs: List[Any] = []

    def _int(self) -> int:
        v = struct.unpack_from(">i", self.b, self.pos)[0]
        self.pos += 4
        return v

    def _double(self) -> float:
        v = struct.unpack_from(">d", self.b, self.pos)[0]
        self.pos += 8
        return v

    def _bytes(self, n: int) -> bytes:
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def _length(self) -> int:
        n = self._int()
        if n == -1:  # long-vector length: two ints (upper, lower)
            hi, lo = self._int(), self._int()
            n = (hi << 32) | (lo & 0xFFFFFFFF)
        return n

    def _charsxp(self) -> Optional[str]:
        flags = self._int()
        if flags & 255 != _CHARSXP:
            raise ValueError(f"expected CHARSXP, got type {flags & 255}")
        n = self._int()
        if n == -1:  # NA_character_
            return None
        return self._bytes(n).decode("utf-8", errors="replace")

    def item(self) -> Any:
        flags = self._int()
        t = flags & 255
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if t == _NILVALUE:
            return None
        if t == _REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self._int()
            return self.refs[idx - 1]
        if t == _SYMSXP:
            name = self._charsxp()
            self.refs.append(name)
            return name
        if t == _LISTSXP:  # pairlist node (attribute lists)
            # per spec order: attributes, tag, car, cdr
            attr = self.item() if has_attr else None  # noqa: F841 — rare, skipped
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()
            pairs = [(tag, car)]
            if isinstance(cdr, list):
                pairs.extend(cdr)
            return pairs
        if t == _CHARSXP:
            n = self._int()
            return None if n == -1 else self._bytes(n).decode("utf-8", "replace")
        if t == _LGLSXP:
            n = self._length()
            vals = [self._int() for _ in range(n)]
            out: Any = [None if v == _NA_INT else bool(v) for v in vals]
        elif t == _INTSXP:
            n = self._length()
            vals = [self._int() for _ in range(n)]
            out = [None if v == _NA_INT else v for v in vals]
        elif t == _REALSXP:
            n = self._length()
            out = []
            for _ in range(n):
                bits = struct.unpack_from(">Q", self.b, self.pos)[0]
                val = struct.unpack_from(">d", self.b, self.pos)[0]
                self.pos += 8
                out.append(None if bits == _NA_REAL_BITS else val)
        elif t == _STRSXP:
            n = self._length()
            out = [self._charsxp() for _ in range(n)]
        elif t == _VECSXP:
            n = self._length()
            out = [self.item() for _ in range(n)]
        else:
            raise NotImplementedError(f"RDS SEXP type {t} outside the data.frame subset")

        attrs = {}
        if has_attr:
            pl = self.item()  # pairlist or None
            for tag, car in pl or []:
                attrs[tag] = car
        if attrs:
            return _Attributed(out, attrs)
        return out


class _Attributed:
    """A vector plus its R attributes (names/class/levels/row.names)."""

    def __init__(self, value, attrs):
        self.value = value
        self.attrs = attrs


def _unwrap(x):
    return x.value if isinstance(x, _Attributed) else x


def _decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:3] == b"BZh" or data[:6] == b"\xfd7zXZ\x00":
        import bz2
        import lzma

        return bz2.decompress(data) if data[:3] == b"BZh" else lzma.decompress(data)
    return data


def read_rds_frame(path: str) -> Dict[str, List[Any]]:
    """Read an .rds data.frame as ``{column_name: [values...]}`` — the shape
    ``spark.createDataFrame``/pandas both accept. Factors resolve to their
    level strings; R NA becomes None."""
    with open(path, "rb") as f:
        data = _decompress(f.read())
    if data[:2] not in (b"X\n",):
        raise NotImplementedError("only XDR-format RDS supported (saveRDS default)")
    r = _Reader(data)
    r.pos = 2
    version = r._int()
    r._int()  # writer version
    r._int()  # min reader version
    if version >= 3:
        enc_len = r._int()
        r._bytes(enc_len)  # native encoding name
    obj = r.item()
    if not isinstance(obj, _Attributed) or not isinstance(obj.value, list):
        raise NotImplementedError("RDS payload is not a data.frame")
    attrs = obj.attrs
    cls = _unwrap(attrs.get("class"))
    if not cls or "data.frame" not in cls:
        raise NotImplementedError("RDS payload is not a data.frame")
    names = _unwrap(attrs.get("names")) or []
    cols = {}
    for name, col in zip(names, obj.value):
        if isinstance(col, _Attributed):
            levels = _unwrap(col.attrs.get("levels"))
            ccls = _unwrap(col.attrs.get("class"))
            vals = col.value
            if levels is not None and ccls and "factor" in ccls:
                vals = [None if v is None else levels[v - 1] for v in vals]
            cols[name] = vals
        else:
            cols[name] = col
    return cols


# ------------------------------------------------------------------ #
# writer (round-trip tests + parquet->R export)
# ------------------------------------------------------------------ #
class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.sym_refs: Dict[str, int] = {}

    def _int(self, v: int):
        self.out += struct.pack(">i", v)

    def _charsxp(self, s: Optional[str]):
        if s is None:
            # NA_character_: length -1, no encoding levels set
            self._int(_CHARSXP)
            self._int(-1)
            return
        b = s.encode("utf-8")
        self._int(_CHARSXP | (8 << 12))  # levels: CE_UTF8 mask (bit 3 of levels)
        self._int(len(b))
        self.out += b

    def _symbol(self, name: str):
        if name in self.sym_refs:
            self._int(_REFSXP | (self.sym_refs[name] << 8))
            return
        self._int(_SYMSXP)
        self._charsxp(name)
        self.sym_refs[name] = len(self.sym_refs) + 1

    def _attr_list(self, pairs):
        for tag, write_value in pairs:
            self._int(_LISTSXP | 0x400)
            self._symbol(tag)
            write_value()
        self._int(_NILVALUE)

    def _strsxp(self, vals):
        self._int(_STRSXP)
        self._int(len(vals))
        for v in vals:
            self._charsxp(v)

    def _intsxp(self, vals):
        self._int(_INTSXP)
        self._int(len(vals))
        for v in vals:
            self._int(_NA_INT if v is None else int(v))

    def column(self, vals: List[Any]):
        non_null = [v for v in vals if v is not None]
        if non_null and all(isinstance(v, bool) for v in non_null):
            self._int(_LGLSXP)
            self._int(len(vals))
            for v in vals:
                self._int(_NA_INT if v is None else int(v))
        elif non_null and all(isinstance(v, int) for v in non_null):
            self._intsxp(vals)
        elif non_null and all(isinstance(v, (int, float)) for v in non_null):
            self._int(_REALSXP)
            self._int(len(vals))
            for v in vals:
                if v is None:
                    self.out += struct.pack(">Q", _NA_REAL_BITS)
                else:
                    self.out += struct.pack(">d", float(v))
        else:
            self._strsxp([None if v is None else str(v) for v in vals])


def write_rds(path: str, cols: Dict[str, List[Any]], compress: bool = True) -> None:
    """Write ``{name: values}`` as an .rds data.frame (XDR version 2)."""
    w = _Writer()
    w.out += b"X\n"
    w._int(2)  # version
    w._int(0x030503)  # writer R version (3.5.3 — any plausible value)
    w._int(0x020300)  # min reader 2.3.0
    names = list(cols)
    n_rows = len(next(iter(cols.values()))) if cols else 0
    w._int(_VECSXP | 0x200)  # generic vector with attributes
    w._int(len(names))
    for name in names:
        w.column(cols[name])
    w._attr_list(
        [
            ("names", lambda: w._strsxp(names)),
            # compact row.names: c(NA, -n)
            ("row.names", lambda: w._intsxp([None, -n_rows])),
            ("class", lambda: w._strsxp(["data.frame"])),
        ]
    )
    payload = bytes(w.out)
    if compress:
        payload = gzip.compress(payload, 6)
    with open(path, "wb") as f:
        f.write(payload)

"""SIB/Expasy .dat record parser (reference ``utils/dat_parser.py:1-95``).

Semantics reproduced exactly: entries split on ``//``; two-letter field
codes with continuation lines; CC comment blocks merged on ``-!-`` markers;
non-CC fields joined then dot-split into lists (DE keeps the first part);
entries without an ID become the header.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

ENTRY = Dict[str, Any]


def parse_sib_format(text: str) -> Tuple[Optional[ENTRY], List[ENTRY]]:
    entries = text.split("//\n")
    header: Optional[ENTRY] = None
    results: List[ENTRY] = []
    for entry in entries:
        if not entry.strip():
            continue
        current: Dict[str, Any] = {}
        code: Optional[str] = None
        for line in entry.strip().split("\n"):
            if not line.strip():
                continue
            if len(line) > 2 and line[2] == " ":
                code = line[0:2]
                current.setdefault(code, []).append(line[3:].strip())
            elif code is not None:
                if code == "CC":
                    current[code].append(line)
                else:
                    current[code].append(line.strip())
        ccs = current.get("CC", [])
        merged: List[str] = []
        for cc in ccs:
            if not cc.startswith("-!-") and merged:
                merged[-1] += " " + cc
            else:
                merged.append(cc)
        current["CC"] = merged
        for k, vs in list(current.items()):
            if k != "CC":
                combined = "".join(vs).strip()
                if combined.endswith("."):
                    parts = [c.strip() for c in combined.split(".") if c.strip()]
                    current[k] = parts[0] if k == "DE" else parts
                else:
                    current[k] = combined
        if "ID" in current:
            results.append(current)
        else:
            header = current
    return header, results

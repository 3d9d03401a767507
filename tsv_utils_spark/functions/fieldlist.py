"""Field-list resolution — the Spark translation of the reference's
field-list sub-language (common/src/tsv_utils/common/fieldlist.d:1-176).

The reference addresses fields by 1-based number, name, wildcard, range
(including reversed), and repeats. In a DataFrame the schema is the header,
so this reduces to resolving a spec list against ``df.columns``:

- ``"name"``        — exact column name
- ``"*_time"``      — fnmatch wildcard over column names
- ``3`` / ``"3"``   — 1-based position (reference convention)
- ``"3-5"``/``"5-3"`` — 1-based ranges, reversed allowed
- specs may repeat — duplicates are kept (tsv-select allows duplication)
"""

from __future__ import annotations

import fnmatch
import re

_RANGE = re.compile(r"^(\d+)-(\d+)$")


def resolve_fields(columns: list[str], specs) -> list[str]:
    if isinstance(specs, (str, int)):
        specs = [specs]
    out: list[str] = []
    for spec in specs:
        if isinstance(spec, int):
            out.append(_by_index(columns, spec))
            continue
        s = str(spec)
        m = _RANGE.match(s)
        if m:
            a, b = int(m.group(1)), int(m.group(2))
            step = 1 if b >= a else -1
            out.extend(_by_index(columns, i) for i in range(a, b + step, step))
        elif s.isdigit():
            out.append(_by_index(columns, int(s)))
        elif any(ch in s for ch in "*?["):
            matches = [c for c in columns if fnmatch.fnmatch(c, s)]
            if not matches:
                raise KeyError(f"field wildcard {s!r} matched no columns")
            out.extend(matches)
        else:
            if s not in columns:
                raise KeyError(f"no such field: {s!r}")
            out.append(s)
    return out


def _by_index(columns: list[str], i: int) -> str:
    if not 1 <= i <= len(columns):
        raise IndexError(f"field number {i} out of range 1..{len(columns)}")
    return columns[i - 1]

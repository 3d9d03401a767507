r"""Field-list resolution — the Spark translation of the reference's
field-list sub-language (common/src/tsv_utils/common/fieldlist.d:1-176).

The reference addresses fields by 1-based number, name, wildcard, range
(including reversed), and repeats. In a DataFrame the schema is the header,
so this reduces to resolving a spec list against ``df.columns``:

- ``"name"``        — exact column name
- ``"*_time"``      — fnmatch wildcard over column names
- ``3`` / ``"3"``   — 1-based position (reference convention)
- ``"3-5"``/``"5-3"`` — 1-based ranges, reversed allowed
- ``"\\*b"`` / ``"\\001"`` / ``"a\\-b"`` — backslash escapes make glob
  metacharacters, digits and hyphens LITERAL name characters
  (common/fieldlist.d:71-95: ``\*`` is a literal asterisk, ``\001`` is
  the column NAMED 001 rather than position 1, ``a\-b`` is not a range;
  ``\\`` is a literal backslash; any character may be escaped)
- specs may repeat — duplicates are kept (tsv-select allows duplication)
"""

from __future__ import annotations

import fnmatch
import re

_RANGE = re.compile(r"^(\d+)-(\d+)$")


def _tokenize(s: str) -> list[tuple[str, bool]]:
    """(char, was_escaped) pairs with backslash escapes consumed."""
    toks: list[tuple[str, bool]] = []
    i = 0
    while i < len(s):
        if s[i] == "\\":
            if i + 1 >= len(s):
                raise ValueError(f"dangling backslash in field spec {s!r}")
            toks.append((s[i + 1], True))
            i += 2
        else:
            toks.append((s[i], False))
            i += 1
    return toks


def resolve_fields(columns: list[str], specs) -> list[str]:
    if isinstance(specs, (str, int)):
        specs = [specs]
    out: list[str] = []
    for spec in specs:
        if isinstance(spec, int):
            out.append(_by_index(columns, spec))
            continue
        s = str(spec)
        if "\\" in s:
            out.extend(_resolve_escaped(columns, s))
            continue
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


def _resolve_escaped(columns: list[str], s: str) -> list[str]:
    """Resolve a spec containing backslash escapes. Escaped characters
    are literal name characters: an escaped digit string is a NAME (not
    a position), an escaped hyphen is not a range separator, and escaped
    glob metacharacters match themselves. Unescaped ``*``/``?``/``[``
    keep their wildcard meaning alongside escaped literals."""
    toks = _tokenize(s)
    plain = "".join(ch for ch, _ in toks)
    if any(ch in "*?[" and not esc for ch, esc in toks):
        # wildcard with embedded literals: translate token-by-token to
        # a regex (fnmatch pattern strings can't express an escaped
        # literal everywhere — e.g. a literal '-' INSIDE an unescaped
        # character class would re-acquire range meaning). re.escape'd
        # literals are safe both inside and outside classes.
        parts: list[str] = []
        in_class = False
        at_open = False       # immediately after '[': '!' negates HERE
        #                       only (a second '!' is a literal member)
        first_member = False  # at '[' or after '[!': ']' and '^' HERE
        #                       are literal members (fnmatch semantics;
        #                       re agrees for ']', '^' needs escaping)
        for ch, esc in toks:
            if esc:
                parts.append(re.escape(ch))
                at_open = first_member = False
            elif not in_class and ch == "*":
                parts.append(".*")
            elif not in_class and ch == "?":
                parts.append(".")
            elif not in_class and ch == "[":
                in_class = True
                at_open = first_member = True
                parts.append("[")
            elif in_class and ch == "!" and at_open:
                parts.append("^")
                at_open = False  # first_member stays: ']' after '[!'
                #                  is still a literal member
            elif in_class and first_member and ch in "]^":
                parts.append(re.escape(ch))  # literal member
                at_open = first_member = False
            elif in_class and ch == "]":
                in_class = False
                parts.append("]")
            elif in_class:
                parts.append(ch)  # raw: unescaped ranges a-z keep meaning
                at_open = first_member = False
            else:
                parts.append(re.escape(ch))
        if in_class:
            raise ValueError(f"unterminated character class in field "
                             f"spec {s!r}")
        rx = re.compile("(?s)" + "".join(parts) + r"\Z")
        matches = [c for c in columns if rx.match(c)]
        if not matches:
            raise KeyError(f"field wildcard {s!r} matched no columns")
        return matches
    if plain not in columns:
        raise KeyError(f"no such field: {plain!r} (from spec {s!r})")
    return [plain]


def _by_index(columns: list[str], i: int) -> str:
    if not 1 <= i <= len(columns):
        raise IndexError(f"field number {i} out of range 1..{len(columns)}")
    return columns[i - 1]

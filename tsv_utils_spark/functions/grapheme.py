"""UAX #29 extended grapheme cluster segmentation (pure Python, used
inside Arrow-batched pandas UDFs).

Implements rules GB3-GB13 + GB999 of Unicode TR29 "Grapheme Cluster
Boundaries". The Grapheme_Cluster_Break property is EXACT and fully
TABLE-DRIVEN: every class (Prepend / Extend / SpacingMark / Control /
L / V / T / LV / LVT / RI / Extended_Pictographic / InCB) comes from
range tables generated out of the ``regex`` module's Unicode property
database (tools/gen_unicode_tables.py -> _unicode_tables.py); only
CR/LF/ZWJ are literal code points. Surrogates classify as Control
(Cs -> GCB=Control per UAX #29).

- CR / LF / Control: GB3-GB5 (every control char is its own cluster,
  except the CRLF pair).
- Hangul L / V / T / LV / LVT: GB6-GB8.
- Extend: exact GCB=Extend (includes ZWNJ, variation selectors, skin
  tones, tag characters, Other_Grapheme_Extend).
- SpacingMark: exact GCB=SpacingMark (GB9a).
- Prepend: exact GCB=Prepend (GB9b).
- Regional_Indicator: GB12/13 (flags pair up; an odd third RI breaks).
- ZWJ + Extended_Pictographic: GB11 emoji ZWJ sequences, exact ExtPict.

Segmentation agrees with the ``regex`` module's ``\\X`` (same Unicode
version) — property-tested in tests/test_pipeline_ops.py over emoji-ZWJ,
flags, Hangul, Indic and randomized vectors drawn from every property
class (the GraphemeBreakTest.txt coverage, reconstructed from the same
data the official file is derived from).
"""

from __future__ import annotations

from bisect import bisect_right
from functools import lru_cache

from tsv_utils_spark.functions._unicode_tables import (
    CONTROL,
    EXT_PICT,
    EXTEND,
    INCB_CONSONANT,
    INCB_EXTEND,
    INCB_LINKER,
    L,
    LV,
    LVT,
    PREPEND,
    RI,
    SPACINGMARK,
    T,
    V,
)


def _lookup(ranges):
    starts = [a for a, _ in ranges]
    ends = [b for _, b in ranges]

    def contains(cp: int) -> bool:
        i = bisect_right(starts, cp) - 1
        return i >= 0 and cp <= ends[i]

    return contains


_is_extend = _lookup(EXTEND)
_is_spacing = _lookup(SPACINGMARK)
_is_control = _lookup(CONTROL)
_is_prepend = _lookup(PREPEND)
_in_ext_pict = _lookup(EXT_PICT)
_incb_linker = _lookup(INCB_LINKER)
_incb_consonant = _lookup(INCB_CONSONANT)
_incb_extend = _lookup(INCB_EXTEND)
_is_l, _is_v, _is_t = _lookup(L), _lookup(V), _lookup(T)
_is_lv, _is_lvt, _is_ri = _lookup(LV), _lookup(LVT), _lookup(RI)

_CR, _LF = "CR", "LF"


@lru_cache(maxsize=None)
def _gcb(ch: str) -> str:
    """Grapheme_Cluster_Break property (exact, see module doc)."""
    cp = ord(ch)
    if cp == 0x0D:
        return _CR
    if cp == 0x0A:
        return _LF
    if cp == 0x200D:
        return "ZWJ"
    if cp < 0x80:  # ASCII fast path: only C0 controls + DEL special
        return "Control" if _is_control(cp) else "Other"
    # every class below comes from the GENERATED tables — hard-coded
    # block ranges would silently miss code points the property database
    # assigns outside them (e.g. the Kirat Rai GCB=V vowel signs live
    # nowhere near the Hangul jamo blocks)
    if _is_extend(cp):
        return "Extend"
    if _is_ri(cp):
        return "RI"
    if _is_l(cp):
        return "L"
    if _is_v(cp):
        return "V"
    if _is_t(cp):
        return "T"
    if _is_lv(cp):
        return "LV"
    if _is_lvt(cp):
        return "LVT"
    if _is_spacing(cp):
        return "SpacingMark"
    if _is_prepend(cp):
        return "Prepend"
    if _is_control(cp):
        return "Control"
    return "Other"


def _is_ext_pict(ch: str) -> bool:
    """Extended_Pictographic (exact table from the emoji data)."""
    return _in_ext_pict(ord(ch))


def count_graphemes(s: str) -> int:
    """Number of extended grapheme clusters in ``s`` (UAX #29 GB3-GB999)."""
    if not s:
        return 0
    count = 0
    prev: str | None = None          # previous char's GCB property
    ri_run = 0                       # consecutive RI chars ending at prev
    after_ep_ext = False             # ExtPict Extend* seen, pre-ZWJ (GB11)
    ep_zwj = False                   # ... followed by ZWJ (GB11 armed)
    incb_chain = False               # InCB Consonant [Ext|Link]* at prev
    incb_linked = False              # ... with >=1 Linker seen (GB9c armed)
    for ch in s:
        cp = ord(ch)
        p = _gcb(ch)
        ep = p == "Other" and _is_ext_pict(ch)
        if prev is None:
            brk = True
        elif prev == _CR and p == _LF:
            brk = False                                        # GB3
        elif prev in ("Control", _CR, _LF):
            brk = True                                         # GB4
        elif p in ("Control", _CR, _LF):
            brk = True                                         # GB5
        elif prev == "L" and p in ("L", "V", "LV", "LVT"):
            brk = False                                        # GB6
        elif prev in ("LV", "V") and p in ("V", "T"):
            brk = False                                        # GB7
        elif prev in ("LVT", "T") and p == "T":
            brk = False                                        # GB8
        elif p in ("Extend", "ZWJ"):
            brk = False                                        # GB9
        elif p == "SpacingMark":
            brk = False                                        # GB9a
        elif prev == "Prepend":
            brk = False                                        # GB9b
        elif incb_chain and incb_linked and _incb_consonant(cp):
            brk = False                                        # GB9c
        elif prev == "ZWJ" and ep and ep_zwj:
            brk = False                                        # GB11
        elif prev == "RI" and p == "RI" and ri_run % 2 == 1:
            brk = False                                        # GB12/13
        else:
            brk = True                                         # GB999
        if brk:
            count += 1
        # GB11 state machine: \p{ExtPict} Extend* ZWJ  x  \p{ExtPict}
        if ep:
            after_ep_ext, ep_zwj = True, False
        elif p == "Extend" and after_ep_ext:
            ep_zwj = False
        elif p == "ZWJ" and after_ep_ext:
            after_ep_ext, ep_zwj = False, True
        else:
            after_ep_ext, ep_zwj = False, False
        # GB9c state machine: Consonant [Extend Linker]* Linker
        # [Extend Linker]*  x  Consonant (Indic_Conjunct_Break)
        if _incb_consonant(cp):
            incb_chain, incb_linked = True, False
        elif incb_chain and _incb_linker(cp):
            incb_linked = True
        elif incb_chain and _incb_extend(cp):
            pass                     # chain continues, linker state kept
        else:
            incb_chain, incb_linked = False, False
        ri_run = ri_run + 1 if p == "RI" else 0
        prev = p
    return count

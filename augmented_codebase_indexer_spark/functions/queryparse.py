"""Query-modifier parsing (F4/F5 analogs, ``services/search_utils.py:131-198``).

The reference extracts `path:GLOB`, `file:NAME`, `-path:GLOB` and
`exclude:GLOB` tokens from the query string and applies them as filters.
Here the same grammar parses to url include/exclude predicates that
Catalyst pushes into the scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_MOD_RE = re.compile(r"(-?)(path|file|exclude):(\S+)")
_PHRASE_RE = re.compile(r'"([^"]*)"')


@dataclass
class ParsedQuery:
    terms: str = ""
    includes: list[str] = field(default_factory=list)  # url glob patterns
    excludes: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)  # quoted exact phrases


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    # quoted segments first (search-engine semantics: "..." is a mandatory
    # consecutive-token filter; its tokens still count toward ranking, so
    # they are appended to the term string below)
    phrase_tokens: list[str] = []

    def _grab(m: re.Match) -> str:
        p = m.group(1).strip()
        if p:
            out.phrases.append(p)
            phrase_tokens.append(p)
        return " "

    q = _PHRASE_RE.sub(_grab, q)
    rest = []
    pos = 0
    for m in _MOD_RE.finditer(q):
        rest.append(q[pos : m.start()])
        pos = m.end()
        neg, kind, pat = m.group(1) == "-", m.group(2), m.group(3)
        if kind == "exclude" or neg:
            out.excludes.append(pat)
        else:
            out.includes.append(pat)
    rest.append(q[pos:])
    out.terms = " ".join(("".join(rest) + " " + " ".join(phrase_tokens)).split())
    return out


def _glob_to_like(pat: str) -> str:
    # glob * ? → SQL LIKE % _ ; escape existing LIKE metachars
    s = pat.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
    return s.replace("*", "%").replace("?", "_")


def url_predicate(parsed: ParsedQuery, url_col: str = "url") -> Column:
    """Combined include/exclude predicate — pushes into the scan."""
    c = F.lit(True)
    if parsed.includes:
        inc = [F.col(url_col).like(f"%{_glob_to_like(p)}%") for p in parsed.includes]
        c = c & reduce(lambda a, b: a | b, inc)
    for p in parsed.excludes:
        c = c & ~F.col(url_col).like(f"%{_glob_to_like(p)}%")
    return c

"""Mention detection + pattern-OpenIE triple extraction + entity linking —
the shared pure-Python core.

These functions are the single source of truth used by BOTH the pure-Python
oracle pipeline (``corpus/oracle.py``) and the Spark Arrow UDFs
(``operators/mentions.py``, ``operators/triples.py``). Sharing guarantees
the distributed pipeline and the oracle agree on every row.

Reference analogs:
  * mention detection ↔ per-language parser strategies
    (``core/parsers/python_parser.py:23-123``): 1 document → N typed spans;
  * triple extraction ↔ reference extractors
    (``core/parsers/python_reference_extractor.py:18-114``): spans → typed
    references (call/import/inheritance ↔ our closed predicate set);
  * linking ↔ 3-tier symbol resolution (``services/graph_builder.py:272-297``):
    exact lookup → constrained fuzzy → fallback, unresolved flagged
    (``graph_builder.py:299-314``).

Scale note: the alias automaton below is a compiled alternation regex, fine
for gazetteer sizes up to ~10^4 aliases per broadcast. At 10^6+ aliases the
same architecture holds but the matcher becomes an Aho-Corasick automaton
built once per executor (lazy module global), which is a drop-in replacement
for ``find_mentions``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .hashing import hash_embedding, jaccard_shingles, lsh_band_keys, minhash_signature

# Closed predicate set: connector phrase that must appear verbatim between
# a subject mention and an object mention (pattern OpenIE).
PRED_CONNECTORS: dict[str, str] = {
    "founded_by": "was founded by",
    "located_in": "is located in",
    "acquired": "acquired",
    "works_for": "works for",
    "partnered_with": "partnered with",
    "subsidiary_of": "is a subsidiary of",
}

# Capitalized-token-run fallback detector (NER-ish): catches surface forms
# not in the gazetteer (typos, unseen variants) so the LSH linking path has
# real inputs. The synthetic corpus keeps filler text lowercase, so this
# only fires on name-like spans.
NER_RE = re.compile(r"(?<![\w.])[A-Z][\w&.\-]*(?: [A-Z][\w&.\-]*)*")

_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s&-]")


def normalize_alias(s: str) -> str:
    """Case/punct/whitespace-insensitive key for exact-tier linking
    (reference analog: FQN normalization, ``graph_builder.py:152-195``)."""
    return _WS_RE.sub(" ", _PUNCT_RE.sub("", s.lower())).strip()


def build_alias_regex(aliases: list[str]) -> re.Pattern | None:
    """Longest-first alternation with word boundaries; deterministic order.
    Returns None for an empty gazetteer (an empty alternation would match
    zero-width at every position)."""
    pats = sorted({a for a in aliases if a}, key=lambda a: (-len(a), a))
    if not pats:
        return None
    alt = "|".join(re.escape(a) for a in pats)
    return re.compile(r"(?<![\w.])(?:%s)(?![\w])" % alt)


@dataclass(frozen=True)
class Mention:
    surface: str
    start: int
    end: int
    kind: str  # 'gazetteer' | 'ner'


def find_mentions(text: str, alias_re: re.Pattern | None) -> list[Mention]:
    """Union of gazetteer-regex spans and NER-fallback spans; overlapping
    spans deduped keeping the gazetteer span, then the longer, then the
    earlier (deterministic). Mirrors the reference's location-dedup window
    W1 (``services/search_utils.py:57-80``)."""
    spans: list[Mention] = []
    if alias_re is not None:
        for m in alias_re.finditer(text):
            spans.append(Mention(m.group(0), m.start(), m.end(), "gazetteer"))
    for m in NER_RE.finditer(text):
        spans.append(Mention(m.group(0), m.start(), m.end(), "ner"))
    # dedup: prefer gazetteer, then longer, then earlier start
    spans.sort(key=lambda s: (s.start, 0 if s.kind == "gazetteer" else 1, -(s.end - s.start)))
    out: list[Mention] = []
    last_end = -1
    for s in spans:
        if s.start >= last_end:
            out.append(s)
            last_end = s.end
        # overlapping span: first (priority-sorted) wins
    return out


@dataclass(frozen=True)
class CandidateTriple:
    subj_surface: str
    pred: str
    obj_surface: str
    pos: int  # char offset of the subject mention in extracted text


def extract_triples_from_text(text: str, alias_re: re.Pattern | None) -> list[CandidateTriple]:
    """Pattern OpenIE: adjacent mention pairs whose in-between text is
    exactly ' <connector> ' yield (subj, pred, obj). Output order is
    document order (deterministic)."""
    mentions = find_mentions(text, alias_re)
    triples: list[CandidateTriple] = []
    for a, b in zip(mentions, mentions[1:]):
        between = text[a.end : b.start]
        if len(between) < 3 or between[0] != " " or between[-1] != " ":
            continue
        phrase = between[1:-1]
        for pred, connector in PRED_CONNECTORS.items():
            if phrase == connector:
                triples.append(CandidateTriple(a.surface, pred, b.surface, a.start))
                break
    return triples


# ---------------------------------------------------------------------------
# linking scorers (shared by oracle and Spark UDF/joins)
# ---------------------------------------------------------------------------


def line_of(text: str, pos: int) -> str:
    """The line of `text` containing char offset `pos` — the mention context
    string fed to the ambiguity scorer. Shared by oracle and Spark stage."""
    s = text.rfind("\n", 0, pos) + 1
    e = text.find("\n", pos)
    return text[s:] if e == -1 else text[s:e]


def context_score(sentence: str, canonical_name: str, dim: int = 64) -> float:
    """Cosine similarity between deterministic hash embeddings of the mention
    context and the candidate canonical name — the ambiguity tie-breaker
    (reference analog: cosine scoring in the fake vector store,
    ``infrastructure/fakes.py:94-160``)."""
    a = hash_embedding(sentence, dim)
    b = hash_embedding(canonical_name, dim)
    return float(sum(x * y for x, y in zip(a, b)))


def alias_band_keys(surface: str, num_perm: int = 32, bands: int = 8, k: int = 3) -> list[str]:
    """LSH band keys for an alias surface — the candidate-generation keys of
    the fuzzy linking tier (replaces Qdrant ANN per north_star)."""
    return lsh_band_keys(minhash_signature(surface, num_perm=num_perm, k=k), bands)


def fuzzy_score(surface: str, alias: str, k: int = 3) -> float:
    return jaccard_shingles(surface, alias, k)

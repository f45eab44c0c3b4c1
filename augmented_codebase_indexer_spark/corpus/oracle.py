"""Pure-Python single-process oracle pipeline.

Plays the role the reference implementation plays for ACI: it defines the
golden outputs the distributed Spark pipeline is measured against
(P/R ≥ 0.95 acceptance join, reference analog ``EvaluationService``
``services/evaluation_service.py:62-161``). It calls the SAME pure functions
(``functions/textextract.py``, ``functions/openie.py``,
``functions/hashing.py``) the Spark UDFs call, so per-row results are
identical by construction; set-level results can only differ through
distributed-execution bugs — which is exactly what the gate detects.

Algorithm (mirrors the Spark stage order, SURVEY.md §7.1):
  extract → mention detection → candidate triples → entity linking
  (exact tier → ambiguity tie-break by context embedding → MinHash-LSH
  fuzzy tier) → same-as connected components (union-find) → final
  canonical triples + nodes.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from ..functions.hashing import jaccard_shingles
from ..functions.openie import (
    alias_band_keys,
    build_alias_regex,
    context_score,
    extract_triples_from_text,
    find_mentions,
    line_of,
    normalize_alias,
)
from ..functions.textextract import extract_text

SAMEAS_JACCARD = 0.7
FUZZY_THRESHOLD = 0.55


@dataclass
class OracleResult:
    extracted: dict[str, str] = field(default_factory=dict)       # url → text (non-skipped)
    mentions: list[dict] = field(default_factory=list)            # url, surface, start, end, kind
    candidate_triples: list[dict] = field(default_factory=list)
    triples: set[tuple] = field(default_factory=set)              # (subj_id, pred, obj_id, url, pos)
    nodes: dict[str, dict] = field(default_factory=dict)          # canon_id → node row
    canonical_map: dict[str, str] = field(default_factory=dict)   # ent_id → canon_id
    sameas_edges: set[tuple] = field(default_factory=set)
    unresolved: list[dict] = field(default_factory=list)


class _UnionFind:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: str, b: str):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def link_surface(
    surface: str,
    context: str,
    exact_index: dict[str, list[dict]],
    band_index: dict[str, list[dict]],
) -> str | None:
    """Shared linking decision for ONE surface (tiers mirror
    ``graph_builder.py:272-297``). Returns ent_id or None (unresolved)."""
    norm = normalize_alias(surface)
    cands = exact_index.get(norm)
    if cands:
        if len(cands) == 1:
            return cands[0]["ent_id"]
        # ambiguity tie-break: max context embedding similarity, then min ent_id
        scored = sorted(
            cands,
            key=lambda c: (-context_score(context, c["canonical_name"]), c["ent_id"]),
        )
        best = scored[0]
        return best["ent_id"]
    # fuzzy tier: LSH band candidates + shingle-Jaccard score
    seen: dict[tuple, dict] = {}
    for key in alias_band_keys(norm):
        for row in band_index.get(key, ()):
            seen[(row["ent_id"], row["alias"])] = row
    best_row, best_score = None, -1.0
    for (eid, alias), row in sorted(seen.items()):
        s = jaccard_shingles(norm, normalize_alias(alias))
        if s > best_score or (s == best_score and best_row and eid < best_row["ent_id"]):
            best_row, best_score = row, s
    if best_row is not None and best_score >= FUZZY_THRESHOLD:
        return best_row["ent_id"]
    return None


def build_link_indexes(gazetteer: list[dict]):
    exact_index: dict[str, list[dict]] = defaultdict(list)
    band_index: dict[str, list[dict]] = defaultdict(list)
    seen = set()
    for row in gazetteer:
        key = (row["alias"], row["ent_id"])
        if key in seen:
            continue
        seen.add(key)
        norm = normalize_alias(row["alias"])
        exact_index[norm].append(row)
        for bk in alias_band_keys(norm):
            band_index[bk].append(row)
    for v in exact_index.values():
        v.sort(key=lambda r: r["ent_id"])
    return dict(exact_index), dict(band_index)


def sameas_components(gazetteer: list[dict]) -> dict[str, str]:
    """Same-as candidate generation + union-find canonicalization.

    Candidates: entities of the same type whose normalized canonical names
    share an LSH band key OR share their first token; edge iff
    shingle-Jaccard ≥ SAMEAS_JACCARD. canonical_id = min(ent_id) in the
    component (order-free, deterministic at any parallelism)."""
    ents: dict[str, dict] = {}
    for row in gazetteer:
        ents.setdefault(row["ent_id"], {
            "ent_id": row["ent_id"],
            "canonical_name": row["canonical_name"],
            "entity_type": row["entity_type"],
        })
    by_key: dict[tuple, list[dict]] = defaultdict(list)
    for e in ents.values():
        norm = normalize_alias(e["canonical_name"])
        first_tok = norm.split(" ")[0] if norm else ""
        by_key[(e["entity_type"], "tok:" + first_tok)].append(e)
        for bk in alias_band_keys(norm):
            by_key[(e["entity_type"], "lsh:" + bk)].append(e)
    uf = _UnionFind()
    edges = set()
    for _, group in sorted(by_key.items()):
        group = sorted(group, key=lambda e: e["ent_id"])
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                a, b = group[i], group[j]
                if a["ent_id"] == b["ent_id"]:
                    continue
                ja = jaccard_shingles(
                    normalize_alias(a["canonical_name"]), normalize_alias(b["canonical_name"])
                )
                if ja >= SAMEAS_JACCARD:
                    edges.add((a["ent_id"], b["ent_id"]))
                    uf.union(a["ent_id"], b["ent_id"])
    canon = {eid: uf.find(eid) for eid in ents}
    return canon


def run_oracle(
    pages: list[dict],
    gazetteer: list[dict],
    allowed_langs: tuple[str, ...] = ("en",),
) -> OracleResult:
    res = OracleResult()
    alias_re = build_alias_regex([r["alias"] for r in gazetteer])
    exact_index, band_index = build_link_indexes(gazetteer)
    res.canonical_map = sameas_components(gazetteer)
    ent_meta = {}
    for row in gazetteer:
        ent_meta.setdefault(row["ent_id"], row)

    mention_counts: dict[str, int] = defaultdict(int)
    first_url: dict[str, str] = {}

    for page in pages:
        text = extract_text(page["html"])
        if text is None:
            continue
        res.extracted[page["url"]] = text
        if page["lang"] not in allowed_langs or not text:
            continue
        url = page["url"]
        for m in find_mentions(text, alias_re):
            res.mentions.append(
                {"url": url, "surface": m.surface, "start": m.start, "end": m.end, "kind": m.kind}
            )
        for t in extract_triples_from_text(text, alias_re):
            res.candidate_triples.append(
                {"url": url, "subj_surface": t.subj_surface, "pred": t.pred,
                 "obj_surface": t.obj_surface, "pos": t.pos}
            )
            ctx = line_of(text, t.pos)
            sid = link_surface(t.subj_surface, ctx, exact_index, band_index)
            oid = link_surface(t.obj_surface, ctx, exact_index, band_index)
            if sid is None or oid is None:
                res.unresolved.append({"url": url, "pos": t.pos, "pred": t.pred})
                continue
            cs = res.canonical_map.get(sid, sid)
            co = res.canonical_map.get(oid, oid)
            res.triples.add((cs, t.pred, co, url, t.pos))
            for cid in (cs, co):
                mention_counts[cid] += 1
                if cid not in first_url or url < first_url[cid]:
                    first_url[cid] = url

    for cid, cnt in mention_counts.items():
        meta = ent_meta.get(cid, {})
        res.nodes[cid] = {
            "node_id": cid,
            "canonical_name": meta.get("canonical_name"),
            "entity_type": meta.get("entity_type"),
            "first_url": first_url[cid],
            "mention_count": cnt,
        }
    return res

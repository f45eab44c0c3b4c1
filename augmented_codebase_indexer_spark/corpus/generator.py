"""Deterministic synthetic webtext corpus generator (no Spark, no wall clock).

Produces the exact ``input_hint`` schema
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus the fixtures from FIXTURES.md: ``gazetteer``, ``planted`` (generation-
trace facts), and ``updates`` (incremental/resume fixture).

Everything derives from one integer seed via ``random.Random`` — same seed,
same corpus, on any machine (the reference's hermetic-fixture philosophy,
``infrastructure/fakes.py:295-360``). Edge-case rows mirror the reference's
scanner guards: oversized page (``scanner.py:283``), NUL-byte binary junk
(``grep_searcher.py:224-226``), undecodable bytes (``scanner.py:304-305``),
empty/boilerplate-only pages, duplicate content at different urls, ambiguous
aliases, typo'd surfaces (exercise the LSH linking tier), twin entities
(exercise connected-components merge), and one hot entity (skew/salting).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
from dataclasses import dataclass, field

_ADJ = [
    "Crimson", "Azure", "Golden", "Silver", "Obsidian", "Ivory", "Scarlet",
    "Emerald", "Cobalt", "Amber", "Violet", "Onyx", "Copper", "Jade",
    "Platinum", "Indigo", "Coral", "Slate", "Umber", "Saffron", "Cerulean",
    "Vermilion", "Titan", "Nimbus", "Quantum", "Stellar", "Lunar", "Solar",
    "Arctic", "Boreal", "Zephyr", "Vortex", "Apex", "Delta", "Echo", "Falcon",
    "Gryphon", "Harbor", "Iron", "Juniper",
]
_NOUN = [
    "Falcon", "Orchid", "Summit", "Canyon", "Harbor", "Beacon", "Forge",
    "Lattice", "Meridian", "Nexus", "Outpost", "Pinnacle", "Quarry", "Ridge",
    "Spire", "Terrace", "Vale", "Wharf", "Zenith", "Anchor", "Bastion",
    "Citadel", "Dynamo", "Ember", "Fjord", "Grove", "Hollow", "Isle",
    "Junction", "Keystone", "Lighthouse", "Mesa", "Nook", "Oasis", "Prairie",
    "Reef", "Strand", "Tundra", "Ursa", "Willow",
]
_ORG_SUFFIX = ["Systems", "Labs", "Group", "Holdings", "Dynamics", "Works"]
_FIRST = [
    "alden", "brisa", "caius", "daria", "elior", "fenna", "gareth", "halia",
    "idris", "jolan", "kasia", "lorcan", "maren", "nadir", "orla", "pavel",
    "quinn", "rhea", "soren", "tamsin", "ulric", "vesna", "wren", "xanthe",
    "yusuf", "zelda",
]
_LAST = [
    "ashford", "blackwood", "carver", "draycott", "ellery", "fairbairn",
    "godwin", "hathaway", "ingram", "jessop", "kearney", "lockhart",
    "merrow", "norwood", "ockham", "pemberton", "quill", "ravenscroft",
    "stanhope", "thackeray", "underhill", "vance", "whitlock", "yardley",
]
_FILLER = (
    "the quick cluster shuffles data across nodes while partitions settle "
    "and queries run columnar scans with vectorized readers over compressed "
    "pages as the planner prunes buckets and the optimizer folds constants "
    "before executors exchange blocks during wide stages and narrow maps "
    "stream rows through codegen kernels toward sinks"
).split()

PRED_TEMPLATES = {
    "founded_by": "{s} was founded by {o}.",
    "located_in": "{s} is located in {o}.",
    "acquired": "{s} acquired {o}.",
    "works_for": "{s} works for {o}.",
    "partnered_with": "{s} partnered with {o}.",
    "subsidiary_of": "{s} is a subsidiary of {o}.",
}

_NAV = (
    '<nav class="top"><a href="/">home</a> <a href="/about">about</a> '
    '<a href="/contact">contact</a></nav>'
)
_HEADER = "<header><h1>site chronicle</h1><p>daily briefing and notes</p></header>"
_FOOTER = (
    "<footer><p>copyright 2026 site chronicle · all rights reserved · "
    '<a href="/terms">terms</a> · <a href="/privacy">privacy</a></p></footer>'
)
_ASIDE = '<aside class="ads"><p>subscribe now! limited offer!!</p></aside>'
_SCRIPT = "<script>window.trk=function(){return 42;};</script>"
_STYLE = "<style>body{margin:0;font:14px sans-serif}</style>"


def entity_id(canonical_name: str, entity_type: str) -> str:
    """Content-derived entity id (no uuid4 — cf. ``chunker/models.py:29``)."""
    return hashlib.sha256(f"{canonical_name}|{entity_type}".encode()).hexdigest()[:16]


@dataclass
class Entity:
    ent_id: str
    canonical_name: str
    entity_type: str
    aliases: list[str]
    twin_of: str | None = None  # generation truth: this entity duplicates another


@dataclass
class CorpusData:
    pages: list[dict] = field(default_factory=list)      # input_hint schema
    gazetteer: list[dict] = field(default_factory=list)  # alias rows
    entities: list[Entity] = field(default_factory=list)
    planted: list[dict] = field(default_factory=list)    # generation-trace facts
    updates: list[dict] = field(default_factory=list)


def _initials(name: str) -> str:
    return "".join(w[0].upper() for w in name.split())


def _make_entities(rng: random.Random, n: int) -> list[Entity]:
    ents: list[Entity] = []
    combos = [(a, b) for a in range(len(_ADJ)) for b in range(len(_NOUN))]
    rng.shuffle(combos)
    person_pairs = [(f, l) for f in range(len(_FIRST)) for l in range(len(_LAST))]
    rng.shuffle(person_pairs)
    ci = pi = 0
    for i in range(n):
        etype = ("org", "person", "place", "product")[i % 4]
        if etype == "person":
            f, l = person_pairs[pi]; pi += 1
            first, last = _FIRST[f].capitalize(), _LAST[l].capitalize()
            name = f"{first} {last}"
            # last-name-only alias is deliberately ambiguous across persons
            # sharing a surname; it is kept in the gazetteer (ambiguity-group
            # fixture) but rarely used as a surface (5%).
            aliases = [name, f"{first[0]}. {last}", last]
        else:
            a, b = combos[ci]; ci += 1
            adj, noun = _ADJ[a], _NOUN[b]
            if etype == "org":
                suffix = _ORG_SUFFIX[i % len(_ORG_SUFFIX)]
                name = f"{adj} {noun} {suffix}"
                aliases = [name, f"{adj} {noun}", _initials(name)]
            elif etype == "place":
                name = f"{adj} {noun} City"
                aliases = [name, f"{adj} {noun}"]
            else:
                name = f"{adj} {noun} Engine"
                aliases = [name, f"{adj} {noun}"]
        ents.append(Entity(entity_id(name, etype), name, etype, aliases))
        # twin entity every 10th: same real-world thing, variant canonical
        # name sharing high shingle-Jaccard → must be merged by CC.
        if i % 10 == 0 and etype == "org":
            tname = name + " Inc"
            ents.append(
                Entity(entity_id(tname, etype), tname, etype, [tname], twin_of=ents[-1].ent_id)
            )
    return ents


def _filler_sentence(rng: random.Random) -> str:
    n = rng.randint(5, 11)
    return " ".join(rng.choice(_FILLER) for _ in range(n)) + "."


def _typo(rng: random.Random, s: str) -> str:
    """Drop one interior character from the longest token (deterministic per rng)."""
    toks = s.split()
    j = max(range(len(toks)), key=lambda k: len(toks[k]))
    t = toks[j]
    if len(t) < 4:
        return s
    cut = rng.randint(1, len(t) - 2)
    toks[j] = t[:cut] + t[cut + 1 :]
    return " ".join(toks)


def _zipf_pick(rng: random.Random, n: int, hot_weight: float = 0.15) -> int:
    """Entity 0 is hot (~hot_weight of picks) — the skew/salting fixture."""
    if rng.random() < hot_weight:
        return 0
    return rng.randint(0, n - 1)


def generate_corpus(
    n_pages: int = 300,
    n_entities: int = 60,
    seed: int = 42,
    edge_cases: bool = True,
    oversized_page: bool = False,
) -> CorpusData:
    rng = random.Random(seed)
    data = CorpusData()
    data.entities = _make_entities(rng, n_entities)
    base = [e for e in data.entities if e.twin_of is None]
    twins = [e for e in data.entities if e.twin_of is not None]

    # gazetteer rows + ambiguity groups (aliases mapping to >1 entity)
    alias_owners: dict[str, list[str]] = {}
    for e in data.entities:
        for a in e.aliases:
            alias_owners.setdefault(a, []).append(e.ent_id)
    amb_group = {}
    g = 0
    for a, owners in sorted(alias_owners.items()):
        if len(owners) > 1:
            g += 1
            amb_group[a] = g
    for e in data.entities:
        for a in e.aliases:
            data.gazetteer.append(
                {
                    "alias": a,
                    "canonical_name": e.canonical_name,
                    "entity_type": e.entity_type,
                    "ent_id": e.ent_id,
                    "ambiguity_group": amb_group.get(a, 0),
                }
            )

    epoch = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    preds = list(PRED_TEMPLATES)

    def surface_for(rng: random.Random, e: Entity) -> str:
        r = rng.random()
        if r < 0.70:
            return e.aliases[0]
        if r < 0.90 and len(e.aliases) > 1:
            return e.aliases[1]
        if r < 0.95 and len(e.aliases) > 2:
            return e.aliases[2]
        return _typo(rng, e.aliases[0])  # → LSH fuzzy-linking tier

    for p in range(n_pages):
        prng = random.Random(seed * 1_000_003 + p)
        url = f"https://site-{p // 50:04d}.example/page-{p:06d}"
        ts = epoch + dt.timedelta(seconds=p)
        lr = p % 50
        lang = "en" if lr < 47 else ("de", "fr", "unknown")[lr - 47]

        paras: list[str] = []
        n_paras = prng.randint(2, 5)
        n_facts = prng.randint(1, 3) if prng.random() < 0.75 else 0
        fact_paras = set(prng.sample(range(n_paras), min(n_facts, n_paras)))
        for pi2 in range(n_paras):
            sents = [_filler_sentence(prng) for _ in range(prng.randint(1, 3))]
            if pi2 in fact_paras and lang == "en":
                si = _zipf_pick(prng, len(base))
                oi = prng.randint(0, len(base) - 1)
                if oi == si:
                    oi = (oi + 1) % len(base)
                subj, obj = base[si], base[oi]
                # occasionally the subject is a twin entity (CC fixture)
                if prng.random() < 0.10 and twins:
                    subj = prng.choice(twins)
                pred = prng.choice(preds)
                sent = PRED_TEMPLATES[pred].format(
                    s=surface_for(prng, subj), o=surface_for(prng, obj)
                )
                pos = prng.randint(0, len(sents))
                sents.insert(pos, sent)
                data.planted.append(
                    {"subj_id": subj.ent_id, "pred": pred, "obj_id": obj.ent_id, "url": url}
                )
            elif prng.random() < 0.25 and lang == "en":
                # non-relation mention (node mention_count fixture)
                e = base[prng.randint(0, len(base) - 1)]
                sents.append(f"readers discussed {surface_for(prng, e)} at length.")
            paras.append(" ".join(sents))

        body = "".join(f"<p>{x}</p>" for x in paras)
        amp = "<p>research &amp; development notes follow.</p>" if p % 7 == 0 else ""
        html = (
            f"<!DOCTYPE html><html><head><title>page {p}</title>{_STYLE}{_SCRIPT}</head>"
            f"<body>{_NAV}{_HEADER}<!-- build {p % 13} -->{amp}"
            f'<article class="main">{body}</article>{_ASIDE}{_FOOTER}</body></html>'
        )
        data.pages.append(
            {"url": url, "warc_ts": ts, "html": html.encode("utf-8"), "text": None, "lang": lang}
        )

    if edge_cases:
        ec_ts = epoch + dt.timedelta(days=1)
        ec = [
            # NUL-byte binary junk → skipped
            {"url": "https://edge.example/binary", "warc_ts": ec_ts,
             "html": b"\x89PNG\x00\x00junk\x00bytes", "text": None, "lang": "en"},
            # invalid UTF-8 → skipped
            {"url": "https://edge.example/badutf8", "warc_ts": ec_ts,
             "html": b"<html><body>\xff\xfe broken</body></html>", "text": None, "lang": "en"},
            # empty html → empty text, 0 triples
            {"url": "https://edge.example/empty", "warc_ts": ec_ts,
             "html": b"", "text": None, "lang": "en"},
            # boilerplate-only → empty-ish text, 0 triples
            {"url": "https://edge.example/boilerplate", "warc_ts": ec_ts,
             "html": f"<html><body>{_NAV}{_HEADER}{_ASIDE}{_FOOTER}</body></html>".encode(),
             "text": None, "lang": "en"},
        ]
        if data.pages:
            ec.append(  # duplicate content at a different url (idempotency/dedup)
                {"url": "https://edge.example/dup-of-page0", "warc_ts": ec_ts,
                 "html": data.pages[0]["html"], "text": None, "lang": "en"}
            )
            dup_planted = [dict(t, url="https://edge.example/dup-of-page0")
                           for t in data.planted if t["url"] == data.pages[0]["url"]]
            data.planted.extend(dup_planted)
        if oversized_page:
            ec.append(
                {"url": "https://edge.example/oversized", "warc_ts": ec_ts,
                 "html": b"<html><body><p>" + b"x" * (10 * 1024 * 1024 + 1) + b"</p></body></html>",
                 "text": None, "lang": "en"}
            )
        data.pages.extend(ec)

    # incremental-update fixture: modify / delete / add over a deterministic subset
    urng = random.Random(seed + 777)
    sample = urng.sample(range(n_pages), min(10, n_pages))
    for i, p in enumerate(sample):
        url = data.pages[p]["url"]
        if i % 3 == 0:
            e1, e2 = base[urng.randint(0, len(base) - 1)], base[urng.randint(0, len(base) - 1)]
            if e1.ent_id == e2.ent_id:
                e2 = base[(base.index(e1) + 1) % len(base)]
            sent = PRED_TEMPLATES["acquired"].format(s=e1.aliases[0], o=e2.aliases[0])
            html2 = f"<html><body>{_NAV}<p>{sent}</p>{_FOOTER}</body></html>".encode()
            data.updates.append({"url": url, "op": "modify", "html2": html2})
        elif i % 3 == 1:
            data.updates.append({"url": url, "op": "delete", "html2": None})
        else:
            nurl = f"https://site-new.example/page-{i:06d}"
            e1, e2 = base[urng.randint(0, len(base) - 1)], base[(urng.randint(0, len(base) - 1))]
            if e1.ent_id == e2.ent_id:
                e2 = base[(base.index(e1) + 1) % len(base)]
            sent = PRED_TEMPLATES["works_for"].format(s=e1.aliases[0], o=e2.aliases[0])
            html2 = f"<html><body>{_NAV}<p>{sent}</p>{_FOOTER}</body></html>".encode()
            data.updates.append({"url": nurl, "op": "add", "html2": html2})

    return data


def write_corpus(data: CorpusData, out_dir: str) -> dict[str, str]:
    """Write pages/gazetteer/planted/updates to parquet (pyarrow, no Spark)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages_schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pages_tbl = pa.Table.from_pylist(data.pages, schema=pages_schema)
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages_tbl, paths["pages"])

    paths["gazetteer"] = os.path.join(out_dir, "gazetteer.parquet")
    pq.write_table(pa.Table.from_pylist(data.gazetteer), paths["gazetteer"])

    paths["planted"] = os.path.join(out_dir, "planted.parquet")
    pq.write_table(pa.Table.from_pylist(data.planted), paths["planted"])

    upd_schema = pa.schema([("url", pa.string()), ("op", pa.string()), ("html2", pa.binary())])
    paths["updates"] = os.path.join(out_dir, "updates.parquet")
    pq.write_table(pa.Table.from_pylist(data.updates, schema=upd_schema), paths["updates"])
    return paths

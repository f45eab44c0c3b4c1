"""URL canonicalization — the URL-level dedup key a web pipeline
computes before any content dedup (the same crawl URL arrives as
``http://Site.com/a?utm_source=x&b=1#frag`` and
``http://site.com:80/a?b=1``; canonicalizing collapses them so the
fetch/dedup layer sees ONE key). Reference analog: the reference
canonicalizes file paths before indexing (resolve + normalize in
``core/file_scanner``); the web-corpus equivalent is RFC 3986 §6
syntax-based normalization plus the de-facto tracking-parameter strip
every crawler applies (utm_*, fbclid, gclid — public convention).

Everything is built from string/array builtins with identical semantics
in Spark and DuckDB (regexp_extract groups, split, higher-order
filter/sort, join) — no UDF, no float, so the DuckDB oracle matches
byte-for-byte and the expression fuses into the scan (one narrow
projection; zero exchanges added).

Normalizations applied (each documented where subtle):

* scheme and host lowercased
* default ports stripped (``:80`` for http, ``:443`` for https)
* fragment dropped (never sent to the server)
* empty path → ``/``
* query: split on ``&``, drop empty params and tracking params
  (``utm_*`` prefix + an exact denylist), byte-sort the survivors
  (RFC 3986 says order is significant, but crawler canonicalization
  trades that for dedup recall — documented, standard practice),
  rejoin with ``&``; an emptied query drops its ``?``

NOT applied (cross-engine hazards, documented): percent-decoding of
unreserved characters (engines disagree on locale/UTF-8 edge cases),
path ``.``/``..`` collapsing (needs iteration), IDN/punycode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact-name tracking params stripped alongside the utm_* prefix —
# the public click-id convention (Facebook, Google, Microsoft, Mailchimp,
# TikTok); extend per deployment
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "ttclid", "igshid")

# scheme :// host[:port] path ?query #fragment
_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _tracking_pred_sql(var: str) -> str:
    """SQL boolean: param assignment ``var`` survives the strip
    (starts_with, not LIKE — see the Spark side's escape-divergence
    note)."""
    names = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    return (
        f"NOT ({var} = '' OR starts_with(split_part({var}, '=', 1), 'utm_') "
        f"OR split_part({var}, '=', 1) IN ({names}))"
    )


def canonical_url_col(url) -> F.Column:
    """Canonical form of ``url`` (see module docstring for the rule
    set). Non-http(s)/unparseable urls pass through unchanged — a
    canonicalizer must never destroy keys it doesn't understand."""
    scheme = F.lower(F.regexp_extract(url, _PARTS_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _PARTS_RE, 2))
    # strip the default port only for its own scheme
    host = (
        F.when((scheme == "http") & hostport.endswith(":80"),
               hostport.substr(F.lit(1), F.length(hostport) - 3))
        .when((scheme == "https") & hostport.endswith(":443"),
              hostport.substr(F.lit(1), F.length(hostport) - 4))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, _PARTS_RE, 3)
    query = F.regexp_extract(url, _PARTS_RE, 4)
    # startswith, NOT LIKE: Spark's LIKE escapes with backslash by
    # default, DuckDB's only with an explicit ESCAPE clause — startswith
    # is literal in both engines
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: ~(
                    (x == "")
                    | F.split_part(x, F.lit("="), F.lit(1)).startswith("utm_")
                    | F.split_part(x, F.lit("="), F.lit(1)).isin(
                        *TRACKING_PARAMS
                    )
                ),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(
        scheme.isin("http", "https"), canon
    ).otherwise(url)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))


def canonical_url_sql(url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`canonical_url_col` — same regex groups,
    same list filter/sort/join, same pass-through rule."""
    re = _PARTS_RE.replace("'", "''")
    scheme = f"lower(regexp_extract({url_expr}, '{re}', 1))"
    hostport = f"lower(regexp_extract({url_expr}, '{re}', 2))"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN substring({hostport}, 1, length({hostport}) - 3) "
        f"WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN substring({hostport}, 1, length({hostport}) - 4) "
        f"ELSE {hostport} END"
    )
    path = f"regexp_extract({url_expr}, '{re}', 3)"
    query = f"coalesce(regexp_extract({url_expr}, '{re}', 4), '')"
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join
    # of an empty array is '' — the empty-query case must agree
    kept = (
        f"coalesce(array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"x -> {_tracking_pred_sql('x')})), '&'), '')"
    )
    canon = (
        f"{scheme} || '://' || {host} || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
        f"(CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END)"
    )
    return (
        f"CASE WHEN {scheme} IN ('http', 'https') THEN {canon} "
        f"ELSE {url_expr} END"
    )

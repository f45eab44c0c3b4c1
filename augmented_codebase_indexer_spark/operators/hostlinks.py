"""Host-level link profile — the link-spam screen over the host graph
(Gyöngyi & Garcia-Molina AIRWeb'05 "Web spam taxonomy" §4 link spam;
Castillo et al. SIGIR'07 use exactly these aggregate link features):
per source host, how much of its linking is self-referential
(navigation), how concentrated its external attention is, and how much
of its host-to-host linking is RECIPROCATED — link farms and exchange
rings sit in the high-reciprocity, low-diversity corner, while honest
hubs link broadly and mostly one-way.

Features per host (all exact BIGINT / micro units):
``n_links`` distinct (src_url → dst_host) link facts, ``n_intra``
those staying on the host, ``intra_micro`` the share, ``n_ext_hosts``
distinct external hosts linked, and ``recip_micro`` the share of the
host's distinct external host-pairs that link back (computed on the
DISTINCT host graph — `operators/graphalgs.py::reciprocity` is the
node-level form; this is its host-aggregated sibling fused with the
intra/diversity features).

Scale shape at 10^10 edges: url-level edges collapse to the host
graph at the first DISTINCT (map-side), everything after is
host-cardinality-sized: one groupBy for the features, one reversed-key
left-semi self-join for reciprocity.  No url string survives the
first exchange.

Reference anchor: the reference profiles per-language/per-directory
index composition in get_index_status (`src/aci/services/
indexing_service.py`) — this is the adversarial version of that
profile, over link behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def host_link_profile(
    edges: DataFrame,
    src_host_col: str = "src_host",
    dst_host_col: str = "dst_host",
) -> DataFrame:
    """→ (host, n_links, n_intra, intra_micro, n_ext_hosts,
    n_recip_hosts, recip_micro): the per-host link-spam feature row.
    ``edges`` is the (src_host, dst_host) relation — pass distinct
    url-level edges pre-collapsed to hosts (`operators/domains.py::
    host_col`)."""
    e = edges.select(
        F.col(src_host_col).alias("s"), F.col(dst_host_col).alias("d")
    )
    base = e.groupBy("s").agg(
        F.count("*").cast("long").alias("n_links"),
        F.sum((F.col("s") == F.col("d")).cast("long")).alias("n_intra"),
    )
    hg = e.filter(F.col("s") != F.col("d")).distinct()
    recip = hg.join(
        hg.selectExpr("d AS s", "s AS d"), ["s", "d"], "left_semi"
    ).groupBy("s").agg(F.count("*").cast("long").alias("n_recip_hosts"))
    ext = hg.groupBy("s").agg(
        F.count("*").cast("long").alias("n_ext_hosts")
    )
    return (
        base.join(ext, "s", "left")
        .join(recip, "s", "left")
        .selectExpr(
            "s AS host", "n_links", "n_intra",
            f"n_intra * {MICRO} DIV n_links AS intra_micro",
            "coalesce(n_ext_hosts, 0) AS n_ext_hosts",
            "coalesce(n_recip_hosts, 0) AS n_recip_hosts",
            "CASE WHEN coalesce(n_ext_hosts, 0) = 0 THEN 0 "
            f"ELSE coalesce(n_recip_hosts, 0) * {MICRO} "
            "DIV n_ext_hosts END AS recip_micro",
        )
    )


def host_link_profile_sql(edges_sql: str) -> str:
    """DuckDB mirror: same grain, same semi-join reciprocity, same
    integer shares."""
    return f"""
    WITH e AS (SELECT src_host AS s, dst_host AS d FROM ({edges_sql})),
    base AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n_links,
             CAST(coalesce(sum(CASE WHEN s = d THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_intra
      FROM e GROUP BY s),
    hg AS MATERIALIZED (
      SELECT DISTINCT s, d FROM e WHERE s <> d),
    recip AS (
      SELECT hg.s, CAST(count(*) AS BIGINT) AS n_recip_hosts
      FROM hg SEMI JOIN hg r ON r.s = hg.d AND r.d = hg.s
      GROUP BY hg.s),
    ext AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n_ext_hosts
      FROM hg GROUP BY s)
    SELECT base.s AS host, base.n_links, base.n_intra,
           base.n_intra * {MICRO} // base.n_links AS intra_micro,
           coalesce(ext.n_ext_hosts, 0) AS n_ext_hosts,
           coalesce(recip.n_recip_hosts, 0) AS n_recip_hosts,
           CASE WHEN coalesce(ext.n_ext_hosts, 0) = 0 THEN 0
                ELSE coalesce(recip.n_recip_hosts, 0) * {MICRO}
                     // ext.n_ext_hosts END AS recip_micro
    FROM base
    LEFT JOIN ext ON ext.s = base.s
    LEFT JOIN recip ON recip.s = base.s
    """

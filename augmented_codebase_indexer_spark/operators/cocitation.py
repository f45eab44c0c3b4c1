"""Co-citation and bibliographic coupling — the two DIRECTED
shared-neighbor relatedness measures over the link graph.

Co-citation (Small JASIS'73): pages a and b are related if many pages
LINK TO BOTH — the wedge center is the citing page, and the strength
is Jaccard over citer sets. Bibliographic coupling (Kessler, Am.Doc.
'63) is the transpose: a and b are related if they LINK TO the same
pages. On webtext, co-citation finds pages the web treats as
substitutes (the relatedness signal behind hub/authority pairs), while
coupling finds pages with shared sources — the syndication/mirror
screen at link level. Both complement the UNDIRECTED neighborhood
Jaccard in `operators/graphalgs.py`: direction is the signal here
(two pages citing each other are neither co-cited nor coupled by that
edge).

Scores are exact BIGINT: ``score_micro = n_common · 1e6 DIV
(deg_a + deg_b − n_common)`` — Jaccard over the relevant directed
neighbor sets, truncating division, no float.

Scale shape at 10^11 edges: dedup, optional count-gated wedge-center
cap BEFORE the Θ(deg²) fan-out (a hub citing 10^6 pages contributes
10^12 wedges and no signal — same cap discipline as name/geo
blocking, drops observable via the degree frame), one self-join on the
center key, one (a, b) aggregate, degree frames joined back slim.

Reference anchor: the reference relates symbols by shared
callers/callees in its reference graph (`core/graph`); these are the
web-grain measures of the same two directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _shared(
    e: DataFrame, center: str, leaf: str,
    min_common: int, max_center_degree: int | None,
) -> DataFrame:
    if max_center_degree is not None:
        ok = (
            e.groupBy(center)
            .agg(F.count("*").cast("long").alias("_n"))
            .filter(F.col("_n") <= max_center_degree)
            .select(center)
        )
        e = e.join(ok, center)
    deg = e.groupBy(leaf).agg(F.count("*").cast("long").alias("deg"))
    a = e.select(F.col(center).alias("c"), F.col(leaf).alias("a"))
    b = e.select(F.col(center).alias("c"), F.col(leaf).alias("b"))
    pairs = (
        a.join(b, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return (
        pairs.join(deg.select(F.col(leaf).alias("a"),
                              F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col(leaf).alias("b"),
                         F.col("deg").alias("deg_b")), "b")
        .selectExpr(
            "a", "b", "n_common", "deg_a", "deg_b",
            f"n_common * {MICRO} DIV (deg_a + deg_b - n_common)"
            " AS score_micro",
        )
    )


def cocitation(
    edges: DataFrame, min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """edges(src, dst) → (a, b, n_common, deg_a, deg_b, score_micro):
    pairs of DESTINATIONS cited together by ≥ min_common sources;
    deg = in-degree, score = Jaccard over citer sets."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")
                                          ).distinct()
    return _shared(e, "src", "dst", min_common, max_center_degree)


def coupling(
    edges: DataFrame, min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """edges(src, dst) → pairs of SOURCES citing ≥ min_common common
    destinations; deg = out-degree, score = Jaccard over cited sets."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")
                                          ).distinct()
    return _shared(e, "dst", "src", min_common, max_center_degree)


def _shared_sql(
    edges_sql: str, center: str, leaf: str,
    min_common: int, max_center_degree: int | None,
) -> str:
    cap = (f"WHERE {center} IN (SELECT {center} FROM e GROUP BY {center}"
           f" HAVING count(*) <= {max_center_degree})"
           if max_center_degree is not None else "")
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst),
    e AS MATERIALIZED (SELECT * FROM e0),
    ec AS MATERIALIZED (SELECT * FROM e {cap}),
    deg AS (SELECT {leaf} AS n, CAST(count(*) AS BIGINT) AS deg
            FROM ec GROUP BY {leaf}),
    pairs AS (
      SELECT x.{leaf} AS a, y.{leaf} AS b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM ec x JOIN ec y ON x.{center} = y.{center}
      WHERE x.{leaf} < y.{leaf}
      GROUP BY x.{leaf}, y.{leaf}
      HAVING count(*) >= {min_common})
    SELECT p.a, p.b, p.n_common, da.deg AS deg_a, db.deg AS deg_b,
           p.n_common * {MICRO} // (da.deg + db.deg - p.n_common)
             AS score_micro
    FROM pairs p JOIN deg da ON p.a = da.n JOIN deg db ON p.b = db.n
    """


def cocitation_oracle_sql(
    edges_sql: str, min_common: int = 1,
    max_center_degree: int | None = None,
) -> str:
    """DuckDB mirror of :func:`cocitation`."""
    return _shared_sql(edges_sql, "src", "dst", min_common,
                       max_center_degree)


def coupling_oracle_sql(
    edges_sql: str, min_common: int = 1,
    max_center_degree: int | None = None,
) -> str:
    """DuckDB mirror of :func:`coupling`."""
    return _shared_sql(edges_sql, "dst", "src", min_common,
                       max_center_degree)

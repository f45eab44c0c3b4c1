"""Geo grid blocking — proximity candidate pairs over point entities
via integer grid cells, the spatial analog of name blocking.

Place-entity resolution ("are these two extracted places the same
venue?") needs nearby-pair generation without the O(n²) cross join.
The standard move (grid-file spatial hashing, Nievergelt et al. TODS
'84; the same bucketing every distributed spatial join uses): snap
each point to an integer grid cell sized ≥ the query radius, emit the
3×3 cell neighborhood on the probe side only, join on cell key, then
verify with an exact integer distance gate. Every pair within the
radius shares at least one probe key by construction, so — unlike the
two-end name keys — grid blocking has NO miss class inside the radius
(antimeridian-straddling pairs are the one documented exception).

Coordinates are integer MICRO-DEGREES, offset to non-negative
(lat+90°, lon+180°) so truncating division IS floor division — the
negative-coordinate trunc/floor divergence never exists. The distance
gate is squared micro-degree distance ``dx² + dy² ≤ r²`` — exact
BIGINT (|dx| ≤ 3.6·10^8 → dx² ≤ 1.3·10^17, no overflow), documented
as grid-degree proximity, not geodesic meters: for same-latitude-band
blocking the cos(lat) stretch only ADMITS extra candidates (east-west
degrees shrink in meters toward the poles), never loses one, and a
metric scorer downstream can re-rank the shortlist.

Scale shape at 10^9 places: probe side explodes ×9, one cell-keyed
equi-join whose fan-out is bounded by cell occupancy, verification at
candidate grain. Density skew (cities) is the classic hot-cell issue —
cap or salt hot cells upstream if occupancy profiling says so; the
cell histogram is one groupBy away.

Reference anchor: the reference buckets symbols by file-path prefix
before pairwise alias scoring (`core/linker`); this is the same
bucket-then-verify shape in coordinate space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LAT_OFF = 90_000_000
LON_OFF = 180_000_000


def geo_candidates(
    places: DataFrame,
    radius_micro: int = 100_000,
    cell_micro: int | None = None,
) -> DataFrame:
    """places(id, lat_micro, lon_micro) → (id_a, id_b, dist2):
    pairs with squared micro-degree distance ≤ radius², id_a < id_b.
    ``cell_micro`` defaults to the radius (the smallest cell for which
    the 3×3 neighborhood is complete — asserted)."""
    cell = radius_micro if cell_micro is None else cell_micro
    if cell < radius_micro:
        raise ValueError("cell_micro must be >= radius_micro")
    pts = places.selectExpr(
        "id", "lat_micro", "lon_micro",
        f"(lat_micro + {LAT_OFF}) DIV {cell} AS cy",
        f"(lon_micro + {LON_OFF}) DIV {cell} AS cx",
    )
    probe = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat_micro").alias("lat_a"),
        F.col("lon_micro").alias("lon_a"),
        F.explode(F.expr(
            "flatten(transform(sequence(-1, 1), dy ->"
            " transform(sequence(-1, 1), dx ->"
            " struct(cy + dy AS cy, cx + dx AS cx))))"
        )).alias("c"),
    ).select("id_a", "lat_a", "lon_a", "c.cy", "c.cx")
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat_micro").alias("lat_b"),
        F.col("lon_micro").alias("lon_b"),
        "cy", "cx",
    )
    return (
        probe.join(build, ["cy", "cx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_a", "id_b",
            "(lat_a - lat_b) * (lat_a - lat_b)"
            " + (lon_a - lon_b) * (lon_a - lon_b) AS dist2",
        )
        .filter(F.col("dist2") <= radius_micro * radius_micro)
    )


def geo_candidates_oracle_sql(
    places_sql: str,
    radius_micro: int = 100_000,
    cell_micro: int | None = None,
) -> str:
    """DuckDB mirror of :func:`geo_candidates` — the 3×3 probe
    neighborhood unrolled as a 9-row offset table cross join."""
    cell = radius_micro if cell_micro is None else cell_micro
    offs = ", ".join(f"({dy}, {dx})" for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1))
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT id, lat_micro, lon_micro,
             (lat_micro + {LAT_OFF}) // {cell} AS cy,
             (lon_micro + {LON_OFF}) // {cell} AS cx
      FROM ({places_sql})),
    offs(dy, dx) AS (VALUES {offs}),
    probe AS (
      SELECT id AS id_a, lat_micro AS lat_a, lon_micro AS lon_a,
             cy + dy AS cy, cx + dx AS cx
      FROM pts CROSS JOIN offs)
    SELECT p.id_a, b.id AS id_b,
           (p.lat_a - b.lat_micro) * (p.lat_a - b.lat_micro)
           + (p.lon_a - b.lon_micro) * (p.lon_a - b.lon_micro) AS dist2
    FROM probe p JOIN pts b ON p.cy = b.cy AND p.cx = b.cx
    WHERE p.id_a < b.id
      AND (p.lat_a - b.lat_micro) * (p.lat_a - b.lat_micro)
          + (p.lon_a - b.lon_micro) * (p.lon_a - b.lon_micro)
          <= {radius_micro * radius_micro}
    """

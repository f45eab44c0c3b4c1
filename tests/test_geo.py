"""Geo grid blocking (operators/geo.py): hand pair set, boundary and
negative-coordinate cells, no-miss-inside-radius property, DuckDB
parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.geo import (
    geo_candidates,
    geo_candidates_oracle_sql,
)

R = 100_000  # 0.1 degree in micro-degrees

PLACES = [
    ("p1", 0, 0),
    ("p2", 50_000, 50_000),        # within R of p1
    ("p3", 0, 99_000),             # within R of p1/p2, crosses a cell edge
    ("p4", 0, 210_000),            # 2 cells east: never a candidate
    ("p5", -50_000, -50_000),      # negative coords: offset keeps floor
    ("p7", 0, 0),                  # exact duplicate location of p1
]


def _df(spark):
    return spark.createDataFrame(
        PLACES, "id string, lat_micro long, lon_micro long")


def test_pairs(spark):
    got = {(r["id_a"], r["id_b"]): r["dist2"]
           for r in geo_candidates(_df(spark), radius_micro=R).collect()}
    assert got == {
        ("p1", "p2"): 5_000_000_000,
        ("p1", "p3"): 9_801_000_000,
        ("p2", "p3"): 4_901_000_000,
        ("p1", "p5"): 5_000_000_000,
        ("p1", "p7"): 0,
        ("p2", "p7"): 5_000_000_000,
        ("p3", "p7"): 9_801_000_000,
        ("p5", "p7"): 5_000_000_000,
    }
    assert not any("p4" in k for k in got)


def test_cell_smaller_than_radius_rejected(spark):
    with pytest.raises(ValueError):
        geo_candidates(_df(spark), radius_micro=R, cell_micro=R // 2)


def test_matches_duckdb_oracle(spark):
    places_sql = " UNION ALL ".join(
        f"SELECT '{i}' AS id, CAST({la} AS BIGINT) AS lat_micro,"
        f" CAST({lo} AS BIGINT) AS lon_micro"
        for i, la, lo in PLACES)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        geo_candidates_oracle_sql(places_sql, radius_micro=R)).fetchall())
    got = sorted(tuple(r) for r in
                 geo_candidates(_df(spark), radius_micro=R).collect())
    assert got == want and len(got) == 8

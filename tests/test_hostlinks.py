"""Host link profile (operators/hostlinks.py): intra share,
reciprocity on the distinct host graph, diversity counts, no-external
hosts, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.hostlinks import (
    host_link_profile,
    host_link_profile_sql,
)

# farm/f2 reciprocate; hub links 3 hosts one-way + itself; solo links
# only itself (n_ext_hosts 0 → recip 0, not a division error).
EDGES = [
    ("farm", "f2"), ("f2", "farm"), ("farm", "f2"),  # dup edge row
    ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "hub"),
    ("solo", "solo"),
]


def _df(spark):
    return spark.createDataFrame(EDGES, "src_host string, dst_host string")


def test_profiles(spark):
    rows = {r["host"]: r for r in host_link_profile(_df(spark)).collect()}
    farm = rows["farm"]
    assert farm["n_links"] == 2 and farm["n_intra"] == 0
    assert farm["n_ext_hosts"] == 1 and farm["n_recip_hosts"] == 1
    assert farm["recip_micro"] == 1_000_000
    hub = rows["hub"]
    assert hub["n_links"] == 4 and hub["n_intra"] == 1
    assert hub["intra_micro"] == 250_000
    assert hub["n_ext_hosts"] == 3 and hub["n_recip_hosts"] == 0
    assert hub["recip_micro"] == 0
    solo = rows["solo"]
    assert solo["intra_micro"] == 1_000_000 and solo["recip_micro"] == 0


def test_matches_duckdb_oracle(spark):
    e_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src_host, '{d}' AS dst_host" for s, d in EDGES)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(host_link_profile_sql(e_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in host_link_profile(_df(spark)).collect())
    assert got == want and len(got) == 4

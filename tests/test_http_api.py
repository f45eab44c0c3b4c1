"""HTTP facade wiring: every endpoint returns the same JSON the CLI
command functions produce (they ARE the same functions), plus routing
errors. One server on an ephemeral port against the shared CLI-built
warehouse."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from augmented_codebase_indexer_spark.http_api import AciHttpServer


@pytest.fixture(scope="module")
def server(cli_warehouse):
    wh, res = cli_warehouse
    srv = AciHttpServer(wh)
    port = srv.start()
    yield f"http://127.0.0.1:{port}", wh, res
    srv.stop()


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_stats(server):
    base, wh, res = server
    code, body = _get(base, "/health")
    assert (code, body["ok"]) == (200, True)
    code, body = _get(base, "/stats")
    assert code == 200 and body["tables"]["edges"] == res["edges"]


def test_search_routes_to_cli(server):
    base, _, _ = server
    code, body = _get(base, "/search?q=cluster+data&k=4")
    assert code == 200 and 0 < len(body["results"]) <= 4
    assert body["query"] == "cluster data" and body["mode"] == "hybrid"
    code, body = _get(base, "/search?q=cluster&mode=rerank&k=2")
    assert code == 200 and len(body["results"]) <= 2
    assert {"rerank_score", "retrieval_score"} <= set(body["results"][0])


def test_graph_and_context(server, spark):
    import os

    base, wh, _ = server
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    seed = edges.select("subj_id").orderBy("subj_id").first()["subj_id"]
    q = urllib.parse.quote(seed)
    code, body = _get(base, f"/graph?entity={q}&depth=2")
    assert code == 200
    hops = {n["node_id"]: n["hops"] for n in body["neighbors"]}
    assert hops[seed] == 0 and all(h <= 2 for h in hops.values())

    code, body = _get(base, f"/context?entity={q}&budget=300")
    assert code == 200
    assert body["context"][0]["node_id"] == seed
    assert all(r["cum_tokens"] <= 300 for r in body["context"])
    code, body = _get(base, f"/context?entity={q}&budget=300&personalized=1")
    assert code == 200 and body["personalized"] is True


def test_routing_errors(server):
    base, _, _ = server
    assert _get(base, "/nope")[0] == 404
    assert _get(base, "/search")[0] == 400
    assert _get(base, "/search?q=x&mode=psychic")[0] == 400
    assert _get(base, "/graph?direction=sideways&entity=x")[0] == 400
    assert _get(base, "/context")[0] == 400
    # client-input errors map to 400, not 500: non-numeric params and a
    # personalized request whose seed is absent from the graph
    assert _get(base, "/search?q=x&k=lots")[0] == 400
    code, body = _get(base, "/context?entity=__ghost__&personalized=1")
    assert code == 400 and "seed" in body["error"]

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
    assert {"rerank_micro", "retrieval_score"} <= set(body["results"][0])


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


def test_repeated_requests_do_not_grow_pinned_rdds(server, spark):
    """Cache-lifetime hygiene (VERDICT r4 Wrong #3): every request runs in
    a pin_scope, so frames persisted by the underlying pipelines are
    released when the request finishes — N requests leave the session's
    persisted-RDD set no larger than after the first."""
    import os
    import urllib.parse

    base, wh, _ = server
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    seed = urllib.parse.quote(
        edges.select("subj_id").orderBy("subj_id").first()["subj_id"]
    )

    def n_pinned():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    paths = [f"/search?q=cluster+data&k=3",
             f"/context?entity={seed}&budget=200&personalized=1",
             f"/graph?entity={seed}&depth=2"]
    for p in paths:  # warm-up: module-level caches (rank cache) fill once
        assert _get(base, p)[0] == 200
    baseline = n_pinned()
    for _ in range(3):
        for p in paths:
            assert _get(base, p)[0] == 200
    assert n_pinned() <= baseline


def _rpc(base, method, params=None, rid=1):
    payload = json.dumps(
        {"jsonrpc": "2.0", "id": rid, "method": method,
         **({"params": params} if params is not None else {})}
    ).encode()
    req = urllib.request.Request(
        base + "/mcp", data=payload,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_mcp_initialize_and_tools_list(server):
    base, _, _ = server
    code, body = _rpc(base, "initialize", rid=7)
    assert code == 200 and body["id"] == 7
    assert body["result"]["serverInfo"]["name"] == "aci-spark"
    code, body = _rpc(base, "tools/list")
    names = {t["name"] for t in body["result"]["tools"]}
    assert names == {"search_code", "get_symbol_context", "query_graph",
                     "get_index_status", "get_schema_report"}
    # every tool advertises a JSON schema an MCP client can validate with
    assert all(t["inputSchema"]["type"] == "object"
               for t in body["result"]["tools"])


def test_mcp_tools_call_matches_get_routes(server, spark):
    """tools/call is FRAMING over the same cmd_* functions the GET routes
    use — the TextContent payload must equal the GET body for the same
    parameters (reference parity: mcp/handlers.py:506-641 drives the
    identical read path as http_server.py)."""
    import os

    base, wh, _ = server
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    seed = edges.select("subj_id").orderBy("subj_id").first()["subj_id"]
    q = urllib.parse.quote(seed)

    _, body = _rpc(base, "tools/call", {
        "name": "query_graph",
        "arguments": {"symbol_or_path": seed, "query_type": "callees",
                      "depth": 2}})
    assert body["result"]["isError"] is False
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    _, via_get = _get(base, f"/graph?entity={q}&depth=2&direction=out")
    assert via_mcp == via_get

    # callers walks INTO the node (direction=in), like the reference's
    # callers/dependents mapping
    _, body = _rpc(base, "tools/call", {
        "name": "query_graph",
        "arguments": {"symbol_or_path": seed, "query_type": "callers"}})
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    _, via_get = _get(base, f"/graph?entity={q}&depth=2&direction=in")
    assert via_mcp == via_get

    _, body = _rpc(base, "tools/call", {
        "name": "get_symbol_context",
        "arguments": {"symbol": seed, "max_tokens": 300}})
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    _, via_get = _get(base, f"/context?entity={q}&budget=300")
    assert via_mcp == via_get
    assert via_mcp["context"][0]["node_id"] == seed

    _, body = _rpc(base, "tools/call", {
        "name": "search_code",
        "arguments": {"query": "cluster data", "max_results": 3}})
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    _, via_get = _get(base, "/search?q=cluster+data&k=3")
    assert via_mcp == via_get and 0 < len(via_mcp["results"]) <= 3

    _, body = _rpc(base, "tools/call", {"name": "get_index_status",
                                        "arguments": {}})
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    _, via_get = _get(base, "/stats")
    assert via_mcp == via_get


def test_mcp_error_envelopes(server):
    """Protocol errors use JSON-RPC error codes; tool-level failures come
    back as result.isError=True TextContent (the MCP convention — the
    client model reads the message), never HTTP 5xx."""
    base, _, _ = server
    _, body = _rpc(base, "no/such")
    assert body["error"]["code"] == -32601
    _, body = _rpc(base, "tools/call", {"name": "rm_rf", "arguments": {}})
    assert body["error"]["code"] == -32602
    _, body = _rpc(base, "tools/call", {"name": "search_code",
                                        "arguments": {}})
    assert body["result"]["isError"] is True
    assert "required" in body["result"]["content"][0]["text"]
    _, body = _rpc(base, "tools/call", {
        "name": "get_symbol_context",
        "arguments": {"symbol": "__ghost__", "personalized": True}})
    assert body["result"]["isError"] is True
    # malformed JSON → -32700 parse error
    req = urllib.request.Request(
        base + "/mcp", data=b"{not json",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        body = json.loads(r.read())
    assert body["error"]["code"] == -32700
    # POST to a non-mcp path is a routing 404
    req = urllib.request.Request(base + "/stats", data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_schema_route_and_mcp_parity(server):
    base, _, _ = server
    code, via_get = _get(base, "/schema")
    assert code == 200
    assert via_get["predicates_induced"] >= 0
    assert via_get["bar"] == {"min_share_micro": 600000, "min_typed": 3}
    _, body = _rpc(base, "tools/call",
                   {"name": "get_schema_report", "arguments": {}})
    assert body["result"]["isError"] is False
    via_mcp = json.loads(body["result"]["content"][0]["text"])
    assert via_mcp == via_get
    # the bar parameters reach the fold through both surfaces
    _, strict = _get(base, "/schema?min_share_micro=1000001")
    assert strict["declarations"] == [] and strict["violations"] == 0

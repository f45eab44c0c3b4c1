"""HTTP JSON facade over a built warehouse (SURVEY §3.3 — the
reference's `http_server.py:315-389` / `mcp/handlers.py:507-641` read
path, minus the interactive transports SURVEY §7.3 scopes out).

Routing-only by design: every endpoint builds the same argparse-shaped
namespace the CLI uses and calls the SAME `cli.cmd_*` function, so the
HTTP surface inherits the library gates — these handlers are tested for
wiring (params → cmd → JSON body), nothing else.

    GET /health                               → {"ok": true}
    GET /stats                                → cmd_stats
    GET /search?q=...&k=10&mode=hybrid|rerank → cmd_search
    GET /graph?entity=ID&depth=2&direction=out→ cmd_graph
    GET /context?entity=ID[&entity=..]&depth=3&budget=2000 → cmd_context
    POST /mcp   JSON-RPC 2.0: initialize | tools/list | tools/call
                (MCP framing over the same cmd_* functions — the
                reference's PRIMARY integration surface,
                `mcp/handlers.py:506-641`; tool results come back as
                MCP-shaped {content: [{type: "text", text}], isError}
                so an MCP-speaking client can drive the warehouse)

The reference's 2.0 s shared fan-out budget with partial results
(`query_router.py:31,120-131`) has no analog on a batch engine (SURVEY
§3.3) — a served deployment would front this with a real query service;
per-request latency lands in the stats/lineage tables instead.

Serving model: stdlib ThreadingHTTPServer on a daemon thread; Spark is
driver-embedded (one SparkSession shared across requests — safe: Spark
sessions are thread-safe for job submission). `port=0` binds an
ephemeral port (tests), `start()` returns the bound port.
"""

from __future__ import annotations

import json
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from types import SimpleNamespace
from urllib.parse import parse_qs, urlparse

from . import cli


class AciHttpServer:
    def __init__(self, warehouse: str, host: str = "127.0.0.1", port: int = 0):
        self.warehouse = warehouse
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):
                try:
                    code, body = outer._route(self.path)
                except ValueError as e:
                    # client-input errors (bad int params, seeds absent
                    # from the graph) are 400s, not server faults
                    code, body = 400, {"error": str(e)}
                except Exception:
                    code, body = 500, {"error": traceback.format_exc(limit=3)}
                self._reply(code, body)

            def do_POST(self):
                if urlparse(self.path).path != "/mcp":
                    self._reply(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = outer._mcp(self.rfile.read(n))
                except Exception:
                    body = {"jsonrpc": "2.0", "id": None, "error": {
                        "code": -32603,
                        "message": traceback.format_exc(limit=3)}}
                # JSON-RPC carries its own error envelope → HTTP 200
                self._reply(200, body)

            def _reply(self, code: int, body: dict):
                payload = json.dumps(body, sort_keys=True).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)

    # -- routing ------------------------------------------------------------

    def _route(self, path: str) -> tuple[int, dict]:
        # each request runs in its own pin scope: frames the underlying
        # pipelines persist() (guarded broadcasts, vocab counts, …) are
        # unpersisted when the request's collect has finished, so a
        # long-lived server doesn't accumulate pinned frames until LRU
        # pressure (VERDICT r4 Wrong #3)
        from .operators.guards import pin_scope

        with pin_scope():
            return self._route_inner(path)

    def _route_inner(self, path: str) -> tuple[int, dict]:
        u = urlparse(path)
        q = parse_qs(u.query)

        def one(name, default=None, cast=str):
            v = q.get(name, [default])[0]
            return default if v is None else cast(v)

        if u.path == "/health":
            return 200, {"ok": True, "warehouse": self.warehouse}
        if u.path == "/stats":
            return 200, cli.cmd_stats(SimpleNamespace(warehouse=self.warehouse))
        if u.path == "/search":
            query = one("q")
            if not query:
                return 400, {"error": "missing q"}
            mode = one("mode", "hybrid")
            if mode not in ("hybrid", "rerank"):
                return 400, {"error": f"bad mode {mode!r}"}
            return 200, cli.cmd_search(SimpleNamespace(
                warehouse=self.warehouse, query=query,
                mode=mode, k=one("k", 10, int),
            ))
        if u.path == "/graph":
            entity = one("entity")
            if not entity:
                return 400, {"error": "missing entity"}
            direction = one("direction", "out")
            if direction not in ("out", "in"):
                return 400, {"error": f"bad direction {direction!r}"}
            return 200, cli.cmd_graph(SimpleNamespace(
                warehouse=self.warehouse, entity=entity,
                depth=one("depth", 2, int), direction=direction,
            ))
        if u.path == "/schema":
            return 200, cli.cmd_schema(SimpleNamespace(
                warehouse=self.warehouse,
                min_share_micro=one("min_share_micro", 600_000, int),
                min_typed=one("min_typed", 3, int),
            ))
        if u.path == "/context":
            seeds = q.get("entity")
            if not seeds:
                return 400, {"error": "missing entity"}
            return 200, cli.cmd_context(SimpleNamespace(
                warehouse=self.warehouse, entity=seeds,
                depth=one("depth", 3, int), budget=one("budget", 2000, int),
                personalized=one("personalized", "0") == "1",
            ))
        return 404, {"error": f"no route {u.path}"}

    # -- MCP (JSON-RPC 2.0) -------------------------------------------------
    #
    # The reference's primary integration is MCP (`mcp/handlers.py`): an
    # LLM client calls tools/list then tools/call. The four read tools map
    # 1:1 onto the cmd_* functions the CLI and GET routes already share —
    # this layer is FRAMING only (names, schemas, TextContent envelopes),
    # so it inherits every library gate and adds no new query logic.
    # Mutating tools (index_codebase/update_index) are deliberately not
    # exposed: this facade serves a built warehouse; builds run as batch
    # jobs (SURVEY §3.3).

    _MCP_TOOLS = [
        {
            "name": "search_code",
            "description": "Hybrid lexical+vector search over the curated "
                           "corpus; mode=rerank applies the quality-blend "
                           "rerank read path.",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "query": {"type": "string"},
                    "max_results": {"type": "integer", "default": 10},
                    "mode": {"type": "string",
                             "enum": ["hybrid", "rerank"],
                             "default": "hybrid"},
                },
                "required": ["query"],
            },
        },
        {
            "name": "get_symbol_context",
            "description": "Token-budgeted context package around one or "
                           "more entities, ranked by (personalized) "
                           "PageRank (reference: get_symbol_context).",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "symbol": {"type": "array",
                               "items": {"type": "string"},
                               "description": "entity id(s) — a bare "
                                              "string is accepted too"},
                    "depth": {"type": "integer", "default": 3},
                    "max_tokens": {"type": "integer", "default": 2000},
                    "personalized": {"type": "boolean", "default": False},
                },
                "required": ["symbol"],
            },
        },
        {
            "name": "query_graph",
            "description": "Bounded-depth traversal from an entity; "
                           "query_type callers/dependents walk INTO the "
                           "node, callees/dependencies walk OUT "
                           "(reference: query_graph).",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "symbol_or_path": {"type": "string"},
                    "query_type": {"type": "string",
                                   "enum": ["callers", "callees",
                                            "dependencies", "dependents"],
                                   "default": "callees"},
                    "depth": {"type": "integer", "default": 2,
                              "description": "clamped to ≤3 like the "
                                             "reference"},
                },
                "required": ["symbol_or_path"],
            },
        },
        {
            "name": "get_index_status",
            "description": "Warehouse table counts and freshness "
                           "(reference: get_index_status).",
            "inputSchema": {"type": "object", "properties": {}},
        },
        {
            "name": "get_schema_report",
            "description": "Induce domain/range from the graph's own "
                           "evidence and report the declarations that "
                           "cleared the bar plus conformance "
                           "violations (read-only).",
            "inputSchema": {
                "type": "object",
                "properties": {
                    "min_share_micro": {
                        "type": "integer",
                        "description": "majority-share evidence bar in "
                                       "micro units (default 600000)",
                    },
                    "min_typed": {
                        "type": "integer",
                        "description": "typed-occurrence evidence bar "
                                       "(default 3)",
                    },
                },
            },
        },
    ]

    def _mcp(self, raw: bytes) -> dict:
        try:
            req = json.loads(raw or b"{}")
        except json.JSONDecodeError as e:
            return {"jsonrpc": "2.0", "id": None,
                    "error": {"code": -32700, "message": f"parse error: {e}"}}
        rid = req.get("id")
        method = req.get("method")

        def err(code, msg):
            return {"jsonrpc": "2.0", "id": rid,
                    "error": {"code": code, "message": msg}}

        if method == "initialize":
            return {"jsonrpc": "2.0", "id": rid, "result": {
                "protocolVersion": "2024-11-05",
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "aci-spark", "version": "0.5"},
            }}
        if method == "tools/list":
            return {"jsonrpc": "2.0", "id": rid,
                    "result": {"tools": self._MCP_TOOLS}}
        if method != "tools/call":
            return err(-32601, f"method not found: {method!r}")

        params = req.get("params") or {}
        name = params.get("name")
        args = params.get("arguments") or {}
        if name not in {t["name"] for t in self._MCP_TOOLS}:
            return err(-32602, f"unknown tool: {name!r}")
        from .operators.guards import pin_scope

        try:
            with pin_scope():
                out = self._call_tool(name, args)
        except ValueError as e:
            # tool-LEVEL failure: MCP wants a result with isError, not a
            # protocol error — the model reads the message and retries
            return {"jsonrpc": "2.0", "id": rid, "result": {
                "content": [{"type": "text", "text": f"Error: {e}"}],
                "isError": True}}
        except Exception:
            return {"jsonrpc": "2.0", "id": rid, "result": {
                "content": [{"type": "text",
                             "text": traceback.format_exc(limit=3)}],
                "isError": True}}
        return {"jsonrpc": "2.0", "id": rid, "result": {
            "content": [{"type": "text",
                         "text": json.dumps(out, sort_keys=True)}],
            "isError": False}}

    def _call_tool(self, name: str, args: dict) -> dict:
        if name == "search_code":
            if not args.get("query"):
                raise ValueError("'query' is required")
            mode = args.get("mode", "hybrid")
            if mode not in ("hybrid", "rerank"):
                raise ValueError(f"bad mode {mode!r}")
            return cli.cmd_search(SimpleNamespace(
                warehouse=self.warehouse, query=args["query"], mode=mode,
                k=int(args.get("max_results", 10))))
        if name == "get_symbol_context":
            seeds = args.get("symbol")
            if isinstance(seeds, str):
                seeds = [seeds]
            if not seeds:
                raise ValueError("'symbol' is required")
            return cli.cmd_context(SimpleNamespace(
                warehouse=self.warehouse, entity=seeds,
                depth=int(args.get("depth", 3)),
                budget=int(args.get("max_tokens", 2000)),
                personalized=bool(args.get("personalized", False))))
        if name == "query_graph":
            sym = args.get("symbol_or_path")
            if not sym:
                raise ValueError("'symbol_or_path' is required")
            qt = args.get("query_type", "callees")
            if qt not in ("callers", "callees", "dependencies", "dependents"):
                raise ValueError(f"bad query_type {qt!r}")
            # callers/dependents traverse INTO the node (reference
            # handlers.py:604-609 maps both onto its 'callers' direction)
            direction = "in" if qt in ("callers", "dependents") else "out"
            return cli.cmd_graph(SimpleNamespace(
                warehouse=self.warehouse, entity=sym,
                depth=min(int(args.get("depth", 2)), 3),
                direction=direction))
        if name == "get_index_status":
            return cli.cmd_stats(SimpleNamespace(warehouse=self.warehouse))
        if name == "get_schema_report":
            return cli.cmd_schema(SimpleNamespace(
                warehouse=self.warehouse,
                min_share_micro=int(args.get("min_share_micro", 600_000)),
                min_typed=int(args.get("min_typed", 3))))
        raise ValueError(f"unknown tool {name!r}")

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> int:
        import threading

        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

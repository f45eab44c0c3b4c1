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
                payload = json.dumps(body, sort_keys=True).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)

    # -- routing ------------------------------------------------------------

    def _route(self, path: str) -> tuple[int, dict]:
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

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> int:
        import threading

        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

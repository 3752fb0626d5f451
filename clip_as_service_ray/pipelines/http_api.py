"""Thin HTTP front door for the query engine.

The reference is reachable over gRPC/HTTP/WebSocket through its gateway
(``/root/reference/client/clip_client/client.py:36-62`` parses
``grpc(s)://|http(s)://|ws(s)://`` server URLs; ``docs/user-guides/server.md``
documents the protocols). This module is the engine's front-door analog at
the scope a batch engine needs: a stdlib-only ``ThreadingHTTPServer`` in
front of the persistent ``QueryService`` actor pool.

Endpoints:
    GET  /health   -> {"status": "ok", "n_docs": ...}
    GET  /profile  -> aggregated per-stage query timings (profile() analog)
    POST /search   -> body {"queries": [{"query_id": i, "text": str,
                     "limit": k?}, ...]} -> {"hits": [flat hit rows]}

The engine-side contract stays ``QueryService.search`` (pa.Table in/out);
this handler only translates JSON <-> Arrow, so the same service mounts
behind any real gateway unchanged.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.pipelines.serving import QueryService


def _queries_table(payload: dict) -> pa.Table:
    qs = payload.get("queries", [])
    return pa.table(
        {
            "query_id": pa.array([int(q["query_id"]) for q in qs], pa.int64()),
            "text": pa.array([q.get("text", "") for q in qs], pa.string()),
            "limit": pa.array([int(q.get("limit", 10)) for q in qs], pa.int32()),
        }
    )


class SearchHTTPServer:
    """Serve one index over HTTP; ``port=0`` picks a free port."""

    def __init__(
        self,
        index_dir: str,
        config: EngineConfig = DEFAULT_CONFIG,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.service = QueryService(index_dir, config)
        import os

        from clip_as_service_ray.state import manifest as mf

        stats = mf.read_json(os.path.join(index_dir, "stats.json"))
        service = self.service

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok", "n_docs": stats["n_docs"]})
                elif self.path == "/profile":
                    self._send(200, service.profile())
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/search":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    hits = service.search(_queries_table(payload))
                    self._send(200, {"hits": hits.to_pylist()})
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._thread.join(timeout=5)
        self.service.shutdown()

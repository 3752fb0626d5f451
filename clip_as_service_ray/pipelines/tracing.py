"""Per-request trace context — the reference's OpenTelemetry analog
(executors/clip_torch.py:139-172 opens a span per endpoint with the request
context; the gateway propagates trace ids). Without an OTel SDK in the
sandbox, the same observable contract is kept:

- every request gets a request id (client-provided ``X-Request-Id`` header /
  gRPC metadata wins, else one is generated server-side);
- the server records named stage spans (parse, score, serialize, ...) with
  start offsets and durations under that id, in a bounded LRU store;
- the id is echoed on the response (header / metadata / reply field), and
  ``GET /trace/<id>`` (or the Trace gRPC method) returns the span list —
  a search's stage timings are retrievable by request id after the fact.
"""

from __future__ import annotations

import collections
import threading
import time
import uuid


def new_request_id() -> str:
    return uuid.uuid4().hex[:16]


class TraceStore:
    """Bounded LRU of request-id -> span list. Thread-safe; eviction keeps
    the most recent ``capacity`` requests (a serving-node debug window, not
    a database)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._traces: "collections.OrderedDict[str, dict]" = collections.OrderedDict()
        self._lock = threading.Lock()

    def record(self, request_id: str, endpoint: str, spans: list[dict]) -> None:
        with self._lock:
            self._traces[request_id] = {
                "request_id": request_id,
                "endpoint": endpoint,
                "recorded_at": time.time(),
                "spans": spans,
            }
            self._traces.move_to_end(request_id)
            while len(self._traces) > self.capacity:
                self._traces.popitem(last=False)

    def get(self, request_id: str) -> dict | None:
        with self._lock:
            return self._traces.get(request_id)

    def __len__(self) -> int:
        with self._lock:
            return len(self._traces)


class SpanTimer:
    """Collects ``{name, start_ms, duration_ms}`` spans relative to the
    request start; use as ``with timer.span("score"): ...``."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.spans: list[dict] = []

    class _Span:
        def __init__(self, timer: "SpanTimer", name: str):
            self.timer = timer
            self.name = name

        def __enter__(self):
            self._start = time.perf_counter()
            return self

        def __exit__(self, *exc):
            now = time.perf_counter()
            self.timer.spans.append({
                "name": self.name,
                "start_ms": round((self._start - self.timer.t0) * 1e3, 3),
                "duration_ms": round((now - self._start) * 1e3, 3),
            })
            return False

    def span(self, name: str) -> "SpanTimer._Span":
        return SpanTimer._Span(self, name)

    def finish(self) -> list[dict]:
        self.spans.append({
            "name": "total",
            "start_ms": 0.0,
            "duration_ms": round((time.perf_counter() - self.t0) * 1e3, 3),
        })
        return self.spans

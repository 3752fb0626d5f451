"""gRPC transport (the reference's DEFAULT scheme) over the from-scratch
HTTP/2 layer in ``functions/h2wire.py``.

Reference parity: ``client/clip_client/client.py:29-54`` parses
``grpc|grpcs`` URLs first-class (every Flow in the reference test suite
speaks grpc), and ``client.py:208-210`` passes the Authorization credential
as gRPC metadata. This module serves the same QueryService the HTTP and
WebSocket front doors serve, speaking real gRPC wire format:

- messages are REAL protobuf (``google.protobuf`` runtime-built descriptors
  — no protoc needed), length-prefixed with the standard 5-byte gRPC frame
  (compressed-flag byte + u32 big-endian length);
- requests/responses ride HTTP/2 HEADERS/DATA frames with
  ``content-type: application/grpc+proto`` and trailer-carried
  ``grpc-status`` / ``grpc-message``;
- Authorization flows as the ``authorization`` metadata header, mirroring
  the HTTP servers' ``_auth_ok`` contract (Bearer and raw forms);
- ``grpcs://`` is TLS via ssl (certfile/keyfile server-side, cafile
  client-side), mirroring the HTTPS path.

Status codes used: 0 OK, 3 INVALID_ARGUMENT, 12 UNIMPLEMENTED,
16 UNAUTHENTICATED, 2 UNKNOWN.
"""

from __future__ import annotations

import json
import socket
import ssl
import struct
import threading
from urllib.parse import urlparse

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.functions import h2wire as h2
from clip_as_service_ray.pipelines.http_api import (
    Metrics,
    _expand_request_synonyms,
    _queries_table,
    _rank_tables,
)
from clip_as_service_ray.pipelines.serving import QueryService

# ----------------------------------------------------------- proto schema --

_SERVICE = "cas.SearchService"

GRPC_OK = 0
GRPC_UNKNOWN = 2
GRPC_INVALID = 3
GRPC_UNIMPLEMENTED = 12
GRPC_UNAUTHENTICATED = 16


def _build_messages():
    """Runtime-compiled proto package ``cas`` (proto3)."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "cas_search.proto"
    fdp.package = "cas"
    fdp.syntax = "proto3"

    F = descriptor_pb2.FieldDescriptorProto

    def msg(name, *fields):
        m = fdp.message_type.add()
        m.name = name
        for num, (fname, ftype, repeated, type_name) in enumerate(fields, 1):
            f = m.field.add()
            f.name = fname
            f.number = num
            f.type = ftype
            f.label = F.LABEL_REPEATED if repeated else F.LABEL_OPTIONAL
            if type_name:
                f.type_name = f".cas.{type_name}"

    S, I64, I32, DBL, MSG, BOOL = (
        F.TYPE_STRING, F.TYPE_INT64, F.TYPE_INT32, F.TYPE_DOUBLE,
        F.TYPE_MESSAGE, F.TYPE_BOOL,
    )
    msg("Query",
        ("query_id", I64, False, None), ("text", S, False, None),
        ("limit", I32, False, None), ("exclude", S, False, None),
        ("conv_prefix", S, False, None), ("should", S, False, None),
        ("negative", S, False, None))
    msg("SearchRequest", ("queries", MSG, True, "Query"))
    msg("Hit",
        ("query_id", I64, False, None), ("rank", I32, False, None),
        ("conv_id", S, False, None), ("turn_idx", I32, False, None),
        ("score", DBL, False, None))
    msg("SearchResponse", ("hits", MSG, True, "Hit"))
    msg("TermWeight",
        ("query_id", I64, False, None), ("term", S, False, None),
        ("weight", DBL, False, None))
    msg("EncodeResponse", ("vectors", MSG, True, "TermWeight"))
    msg("SuggestRequest",
        ("queries", MSG, True, "Query"), ("max_dist", I32, False, None),
        ("k", I32, False, None))
    msg("SuggestTerm",
        ("query_id", I64, False, None), ("term", S, False, None),
        ("dist", I32, False, None), ("df", I64, False, None))
    msg("SuggestResponse", ("terms", MSG, True, "SuggestTerm"))
    msg("Candidate",
        ("query_id", I64, False, None), ("conv_id", S, False, None),
        ("turn_idx", I32, False, None))
    msg("RankRequest",
        ("queries", MSG, True, "Query"), ("candidates", MSG, True, "Candidate"))
    msg("Empty")
    msg("HealthResponse",
        ("status", S, False, None), ("n_docs", I64, False, None))
    msg("ProfileResponse", ("json", S, False, None))
    msg("TraceRequest", ("request_id", S, False, None))

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    names = [m.name for m in fdp.message_type]
    return {
        n: message_factory.GetMessageClass(pool.FindMessageTypeByName(f"cas.{n}"))
        for n in names
    }


_MESSAGES = None
_MSG_LOCK = threading.Lock()


def messages():
    """Process-wide message classes (descriptor pools are not picklable —
    build lazily per process)."""
    global _MESSAGES
    with _MSG_LOCK:
        if _MESSAGES is None:
            _MESSAGES = _build_messages()
    return _MESSAGES


# ------------------------------------------------------ gRPC message frame --


def grpc_frame(msg_bytes: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", len(msg_bytes)) + msg_bytes


def grpc_unframe(data: bytes) -> bytes:
    """First (and in unary RPC, only) message of a gRPC DATA payload."""
    if len(data) < 5:
        raise ValueError("gRPC frame shorter than 5-byte prefix")
    if data[0] != 0:
        raise ValueError("compressed gRPC frames not supported")
    n = struct.unpack(">I", data[1:5])[0]
    if len(data) < 5 + n:
        raise ValueError("gRPC frame truncated")
    return data[5 : 5 + n]


# ------------------------------------------------------------------ server --


def _hits_to_proto(hits: pa.Table, M) -> bytes:
    resp = M["SearchResponse"]()
    for row in hits.to_pylist():
        resp.hits.add(
            query_id=int(row["query_id"]), rank=int(row["rank"]),
            conv_id=str(row["conv_id"]), turn_idx=int(row["turn_idx"]),
            score=float(row["score"]),
        )
    return resp.SerializeToString()


def _queries_payload(req) -> dict:
    """Proto SearchRequest.queries -> the HTTP row-form payload dict, so
    _queries_table (and the synonym expansion) is shared verbatim across
    transports."""
    qs = []
    for q in req.queries:
        row = {"query_id": int(q.query_id), "text": q.text,
               "limit": int(q.limit) if q.limit else 10}
        if q.exclude:
            row["exclude"] = q.exclude
        if q.conv_prefix:
            row["conv_prefix"] = q.conv_prefix
        if q.should:
            row["should"] = q.should
        if q.negative:
            row["negative"] = q.negative
        qs.append(row)
    return {"queries": qs}


class GrpcSearchServer:
    """Serve one index over gRPC; ``port=0`` picks a free port.

    Method surface (all unary): Search, Encode, Suggest, Complete, Rank,
    Health, Profile — the SearchHTTPServer endpoints the reference client
    exercises, over its default scheme."""

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
        import os

        from clip_as_service_ray.state import manifest as mf

        self.service = QueryService(index_dir, config, synonyms=synonyms)
        self.metrics = Metrics()
        # per-request trace context over gRPC: x-request-id metadata in/out
        # + the Trace method (the OTel-span analog the HTTP server exposes
        # as GET /trace/<id>)
        from clip_as_service_ray.pipelines.tracing import TraceStore

        self.traces = TraceStore()
        self._stats = mf.read_json(os.path.join(index_dir, "stats.json"))
        self._token = auth_token
        self._ssl_ctx = None
        self.scheme = "grpc"
        if certfile:
            self._ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._ssl_ctx.load_cert_chain(certfile, keyfile)
            self.scheme = "grpcs"

        self._sock = socket.create_server((host, port))
        self.host, self.port = self._sock.getsockname()[:2]
        self._closing = False
        self._threads: list[threading.Thread] = []
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    @property
    def url(self) -> str:
        return f"{self.scheme}://{self.host}:{self.port}"

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return
            if self._ssl_ctx is not None:
                try:
                    conn = self._ssl_ctx.wrap_socket(conn, server_side=True)
                except ssl.SSLError:
                    conn.close()
                    continue
            t = threading.Thread(target=self._serve_conn, args=(conn,), daemon=True)
            t.start()
            # prune finished handlers so a long-lived server doesn't leak a
            # Thread object per connection (threads are daemon, never joined)
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    # ---- connection frame loop

    def _serve_conn(self, conn) -> None:
        try:
            if h2.read_exact(conn, len(h2.PREFACE)) != h2.PREFACE:
                return
            conn.sendall(h2.raise_windows_frames())
            dec = h2.HpackDecoder()
            enc = h2.HpackEncoder()
            send_lock = threading.Lock()
            conn_win = h2.SendWindow()
            streams: dict[int, dict] = {}
            stream_wins: dict[int, h2.SendWindow] = {}
            peer_initial = h2.DEFAULT_WINDOW
            while True:
                ftype, flags, sid, payload = h2.read_frame(conn)
                if ftype == h2.SETTINGS:
                    if not (flags & h2.FLAG_ACK):
                        got = h2.parse_settings(payload)
                        if h2.SETTINGS_INITIAL_WINDOW_SIZE in got:
                            peer_initial = got[h2.SETTINGS_INITIAL_WINDOW_SIZE]
                        with send_lock:
                            conn.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0, b""))
                elif ftype == h2.PING:
                    if not (flags & h2.FLAG_ACK):
                        with send_lock:
                            conn.sendall(h2.pack_frame(h2.PING, h2.FLAG_ACK, 0, payload))
                elif ftype == h2.WINDOW_UPDATE:
                    inc = struct.unpack(">I", payload)[0] & 0x7FFFFFFF
                    if sid == 0:
                        conn_win.grant(inc)
                    else:
                        stream_wins.setdefault(sid, h2.SendWindow(peer_initial)).grant(inc)
                elif ftype == h2.GOAWAY:
                    return
                elif ftype == h2.RST_STREAM:
                    streams.pop(sid, None)
                elif ftype in (h2.HEADERS, h2.CONTINUATION):
                    st = streams.setdefault(
                        sid, {"hbuf": b"", "data": b"", "headers": None,
                              "end_stream": False}
                    )
                    st["hbuf"] += h2.strip_padding(
                        flags, payload, priority=(ftype == h2.HEADERS)
                    )
                    if ftype == h2.HEADERS and (flags & h2.FLAG_END_STREAM):
                        # remember: CONTINUATION never carries END_STREAM,
                        # so a split header block must not lose the bit
                        st["end_stream"] = True
                    if flags & h2.FLAG_END_HEADERS:
                        st["headers"] = dict(dec.decode(st["hbuf"]))
                        st["hbuf"] = b""
                    if st["end_stream"] and st["headers"] is not None:
                        self._dispatch(conn, send_lock, enc, sid, st,
                                       stream_wins.setdefault(sid, h2.SendWindow(peer_initial)),
                                       conn_win)
                        streams.pop(sid, None)
                elif ftype == h2.DATA:
                    st = streams.get(sid)
                    if st is None:
                        continue
                    body = h2.strip_padding(flags, payload)
                    st["data"] += body
                    if body:
                        # replenish receive credit immediately (we buffer)
                        with send_lock:
                            conn.sendall(
                                h2.pack_frame(h2.WINDOW_UPDATE, 0, 0,
                                              struct.pack(">I", len(body)))
                                + h2.pack_frame(h2.WINDOW_UPDATE, 0, sid,
                                                struct.pack(">I", len(body)))
                            )
                    if flags & h2.FLAG_END_STREAM:
                        self._dispatch(conn, send_lock, enc, sid, st,
                                       stream_wins.setdefault(sid, h2.SendWindow(peer_initial)),
                                       conn_win)
                        streams.pop(sid, None)
        except (ConnectionError, OSError, ssl.SSLError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _send_response(self, conn, send_lock, enc, sid, msg_bytes: bytes,
                       status: int, message: str, swin, cwin,
                       request_id: str | None = None) -> None:
        head_fields = [
            (":status", "200"), ("content-type", "application/grpc+proto"),
        ]
        if request_id:
            head_fields.append(("x-request-id", request_id))
        head = enc.encode(head_fields)
        trailers = enc.encode([
            ("grpc-status", str(status)), ("grpc-message", message),
        ])
        body = grpc_frame(msg_bytes) if status == GRPC_OK else b""
        with send_lock:
            conn.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, head))
            if body:
                swin.take(len(body))
                cwin.take(len(body))
                for fr in h2.chunk_data_frames(sid, body, end_stream=False):
                    conn.sendall(fr)
            conn.sendall(
                h2.pack_frame(h2.HEADERS,
                              h2.FLAG_END_HEADERS | h2.FLAG_END_STREAM,
                              sid, trailers)
            )

    def _dispatch(self, conn, send_lock, enc, sid, st, swin, cwin) -> None:
        headers, data = st["headers"], st["data"]
        M = messages()
        path = headers.get(":path", "")
        method = path.rsplit("/", 1)[-1] if path.startswith(f"/{_SERVICE}/") else None

        rid_holder: list = [None]

        def reply(msg_bytes, status=GRPC_OK, message=""):
            self._send_response(conn, send_lock, enc, sid, msg_bytes,
                                status, message, swin, cwin,
                                request_id=rid_holder[0])

        if method is None:
            reply(b"", GRPC_UNIMPLEMENTED, f"unknown service path {path}")
            return
        if method != "Health" and not self._auth_ok(headers):
            self.metrics.inc("auth_failures_total")
            reply(b"", GRPC_UNAUTHENTICATED, "unauthorized")
            return
        try:
            body = grpc_unframe(data) if data else b""
            import time

            if method == "Health":
                out = M["HealthResponse"](
                    status="ok", n_docs=int(self._stats["n_docs"])
                ).SerializeToString()
            elif method == "Profile":
                out = M["ProfileResponse"](
                    json=json.dumps(self.service.profile())
                ).SerializeToString()
            elif method == "Trace":
                req = M["TraceRequest"].FromString(body)
                tr = self.traces.get(req.request_id)
                if tr is None:
                    reply(b"", 5, "unknown request id")  # NOT_FOUND
                    return
                out = M["ProfileResponse"](json=json.dumps(tr)).SerializeToString()
            elif method == "Search":
                from clip_as_service_ray.pipelines.tracing import (
                    SpanTimer,
                    new_request_id,
                )

                rid_holder[0] = headers.get("x-request-id") or new_request_id()
                timer = SpanTimer()
                req = M["SearchRequest"].FromString(body)
                t0 = time.time()
                with timer.span("parse"):
                    payload = _expand_request_synonyms(
                        _queries_payload(req), self._stats.get("analyzer")
                    )
                    qt = _queries_table(payload)
                with timer.span("score"):
                    hits = self.service.search(qt)
                self.metrics.observe("search_latency", time.time() - t0)
                self.metrics.inc("search_requests_total")
                self.metrics.inc("search_queries_total", len(req.queries))
                self.metrics.inc("search_hits_total", hits.num_rows)
                with timer.span("serialize"):
                    out = _hits_to_proto(hits, M)
                self.traces.record(rid_holder[0], "Search", timer.finish())
            elif method == "Encode":
                req = M["SearchRequest"].FromString(body)
                flat = self.service.encode(_queries_table(_queries_payload(req)))
                resp = M["EncodeResponse"]()
                for qid, term, wt in zip(
                    flat.column("query_id").to_pylist(),
                    flat.column("term").to_pylist(),
                    flat.column("weight").to_pylist(),
                ):
                    resp.vectors.add(query_id=int(qid), term=term, weight=float(wt))
                out = resp.SerializeToString()
            elif method in ("Suggest", "Complete"):
                req = M["SuggestRequest"].FromString(body)
                qt = _queries_table(_queries_payload(
                    M["SearchRequest"](queries=list(req.queries))))
                k = int(req.k) if req.k else 5
                if method == "Suggest":
                    flat = self.service.suggest(
                        qt, max_dist=int(req.max_dist) if req.max_dist else 2, k=k
                    )
                else:
                    flat = self.service.complete(qt, k=k)
                resp = M["SuggestResponse"]()
                for row in flat.to_pylist():
                    resp.terms.add(
                        query_id=int(row["query_id"]), term=row["term"],
                        dist=int(row.get("dist", 0)), df=int(row.get("df", 0)),
                    )
                out = resp.SerializeToString()
            elif method == "Rank":
                req = M["RankRequest"].FromString(body)
                payload = {"queries": [
                    {"query_id": int(q.query_id), "text": q.text,
                     "candidates": [
                         {"conv_id": c.conv_id, "turn_idx": int(c.turn_idx)}
                         for c in req.candidates
                         if int(c.query_id) == int(q.query_id)
                     ]}
                    for q in req.queries
                ]}
                ranked = self.service.rank(*_rank_tables(payload))
                self.metrics.inc("rank_requests_total")
                out = _hits_to_proto(ranked, M)
            else:
                reply(b"", GRPC_UNIMPLEMENTED, f"unknown method {method}")
                return
            reply(out)
        except (KeyError, ValueError) as e:
            self.metrics.inc("search_errors_total")
            reply(b"", GRPC_INVALID, str(e))
        except Exception as e:  # surface as UNKNOWN, keep the conn alive
            reply(b"", GRPC_UNKNOWN, f"{type(e).__name__}: {e}")

    def _auth_ok(self, headers: dict) -> bool:
        if self._token is None:
            return True
        got = headers.get("authorization", "")
        if got.startswith("Bearer "):
            got = got[7:]
        return got == self._token

    def shutdown(self) -> None:
        self._closing = True
        try:
            self._sock.close()
        except OSError:
            pass
        self._accept_thread.join(timeout=5)
        self.service.shutdown()


# ------------------------------------------------------------------ client --


class GrpcError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"grpc-status {status}: {message}")
        self.status = status
        self.message = message


class GrpcSearchClient:
    """Blocking unary gRPC client for GrpcSearchServer.

    ``url``: ``grpc://host:port`` or ``grpcs://host:port`` (TLS; pass
    ``cafile`` for a self-signed server cert). Authorization rides as
    gRPC metadata, mirroring client.py:208-210; falls back to the
    CLIP_AUTH_TOKEN env like the reference client (client.py:63-64)."""

    def __init__(self, url: str, auth_token: str | None = None,
                 cafile: str | None = None, timeout: float = 180.0,
                 insecure_skip_hostname: bool = False,
                 huffman: bool = False):
        import os

        r = urlparse(url)
        if r.scheme not in ("grpc", "grpcs"):
            raise ValueError(f"{url} is not a grpc:// or grpcs:// URL")
        self._auth = auth_token or os.environ.get("CLIP_AUTH_TOKEN")
        sock = socket.create_connection((r.hostname, r.port), timeout=timeout)
        if r.scheme == "grpcs":
            ctx = ssl.create_default_context(cafile=cafile)
            if insecure_skip_hostname:
                # explicit opt-out only (a private CA still verifies names)
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_REQUIRED
            sock = ctx.wrap_socket(sock, server_hostname=r.hostname)
        self._sock = sock
        self._authority = f"{r.hostname}:{r.port}"
        self._lock = threading.Lock()
        self._next_stream = 1
        self._enc = h2.HpackEncoder(huffman=huffman)
        self._dec = h2.HpackDecoder()
        self._sock.sendall(h2.PREFACE + h2.raise_windows_frames())
        self._conn_win = h2.SendWindow()
        self._peer_initial = h2.DEFAULT_WINDOW
        # read the server's post-preface SETTINGS + connection WINDOW_UPDATE
        # BEFORE the first send: spending send-window credit against the
        # 64 KiB defaults would spuriously fail a large first request
        got_settings = got_window = False
        while not (got_settings and got_window):
            ftype, flags, fsid, payload = h2.read_frame(self._sock)
            if ftype == h2.SETTINGS and not (flags & h2.FLAG_ACK):
                got = h2.parse_settings(payload)
                if h2.SETTINGS_INITIAL_WINDOW_SIZE in got:
                    self._peer_initial = got[h2.SETTINGS_INITIAL_WINDOW_SIZE]
                self._sock.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0, b""))
                got_settings = True
            elif ftype == h2.WINDOW_UPDATE and fsid == 0:
                self._conn_win.grant(struct.unpack(">I", payload)[0])
                got_window = True
            elif ftype == h2.GOAWAY:
                raise ConnectionError("server sent GOAWAY during handshake")

    def _call(self, method: str, msg_bytes: bytes,
              extra_headers: list[tuple[str, str]] | None = None) -> bytes:
        with self._lock:
            sid = self._next_stream
            self._next_stream += 2
            headers = [
                (":method", "POST"), (":scheme", "http"),
                (":path", f"/{_SERVICE}/{method}"),
                (":authority", self._authority),
                ("content-type", "application/grpc+proto"),
                ("te", "trailers"),
            ]
            if self._auth:
                headers.append(("authorization", self._auth))
            for kv in extra_headers or []:
                headers.append(kv)
            frames = h2.pack_frame(
                h2.HEADERS, h2.FLAG_END_HEADERS, sid, self._enc.encode(headers)
            )
            body = grpc_frame(msg_bytes)
            swin = h2.SendWindow(self._peer_initial)
            swin.take(len(body))
            self._conn_win.take(len(body))
            for fr in h2.chunk_data_frames(sid, body, end_stream=True):
                frames += fr
            self._sock.sendall(frames)

            resp_headers: dict[str, str] = {}
            resp_data = b""
            hbuf = b""
            while True:
                ftype, flags, fsid, payload = h2.read_frame(self._sock)
                if ftype == h2.SETTINGS:
                    if not (flags & h2.FLAG_ACK):
                        got = h2.parse_settings(payload)
                        if h2.SETTINGS_INITIAL_WINDOW_SIZE in got:
                            self._peer_initial = got[h2.SETTINGS_INITIAL_WINDOW_SIZE]
                        self._sock.sendall(
                            h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0, b"")
                        )
                    continue
                if ftype == h2.PING and not (flags & h2.FLAG_ACK):
                    self._sock.sendall(h2.pack_frame(h2.PING, h2.FLAG_ACK, 0, payload))
                    continue
                if ftype == h2.WINDOW_UPDATE:
                    if fsid == 0:
                        self._conn_win.grant(struct.unpack(">I", payload)[0])
                    continue
                if ftype == h2.GOAWAY:
                    raise ConnectionError("server sent GOAWAY")
                if fsid != sid:
                    continue
                if ftype in (h2.HEADERS, h2.CONTINUATION):
                    hbuf += h2.strip_padding(flags, payload,
                                             priority=(ftype == h2.HEADERS))
                    if flags & h2.FLAG_END_HEADERS:
                        resp_headers.update(dict(self._dec.decode(hbuf)))
                        hbuf = b""
                    if flags & h2.FLAG_END_STREAM:
                        break
                elif ftype == h2.DATA:
                    chunk = h2.strip_padding(flags, payload)
                    resp_data += chunk
                    if chunk:
                        self._sock.sendall(
                            h2.pack_frame(h2.WINDOW_UPDATE, 0, 0,
                                          struct.pack(">I", len(chunk)))
                        )
                    if flags & h2.FLAG_END_STREAM:
                        break
                elif ftype == h2.RST_STREAM:
                    raise ConnectionError("stream reset by server")
            # trace-context echo: the server's request id for this call
            self.last_request_id = resp_headers.get("x-request-id")
            status = int(resp_headers.get("grpc-status", GRPC_UNKNOWN))
            if status != GRPC_OK:
                raise GrpcError(status, resp_headers.get("grpc-message", ""))
            return grpc_unframe(resp_data)

    # ---- typed surface (mirrors SearchHTTPClient)

    def _queries_msg(self, queries: list[dict]):
        M = messages()
        req = M["SearchRequest"]()
        for q in queries:
            req.queries.add(
                query_id=int(q["query_id"]), text=str(q.get("text", "")),
                limit=int(q.get("limit", 10)), exclude=str(q.get("exclude", "")),
                conv_prefix=str(q.get("conv_prefix", "")),
                should=str(q.get("should", "")),
                negative=str(q.get("negative", "")),
            )
        return req

    def search(self, queries: list[dict], *, batch_size: int | None = None,
               on_done=None, on_error=None, on_always=None,
               request_id: str | None = None) -> list[dict] | None:
        """Per-batch ``on_done``/``on_error``/``on_always`` follow the
        reference streaming contract (client.py:233-252); with a callback
        set the call returns None and the callbacks own the results.
        ``request_id`` propagates as x-request-id trace metadata (the
        server echoes it and records span timings under it; see
        ``trace``); ``self.last_request_id`` carries the server-assigned
        id after any call."""
        from clip_as_service_ray.pipelines.callbacks import stream_batches

        M = messages()
        extra = [("x-request-id", request_id)] if request_id else None

        def call(batch: list[dict]) -> list[dict]:
            out = M["SearchResponse"].FromString(
                self._call("Search",
                           self._queries_msg(batch).SerializeToString(),
                           extra_headers=extra)
            )
            return [
                {"query_id": h.query_id, "rank": h.rank, "conv_id": h.conv_id,
                 "turn_idx": h.turn_idx, "score": h.score}
                for h in out.hits
            ]

        return stream_batches(
            queries, call, batch_size=batch_size, on_done=on_done,
            on_error=on_error, on_always=on_always,
        )

    def encode(self, queries: list[dict]) -> dict[int, dict[str, float]]:
        M = messages()
        out = M["EncodeResponse"].FromString(
            self._call("Encode", self._queries_msg(queries).SerializeToString())
        )
        vecs: dict[int, dict[str, float]] = {}
        for tw in out.vectors:
            vecs.setdefault(int(tw.query_id), {})[tw.term] = tw.weight
        return vecs

    def _assist(self, method: str, queries: list[dict], *, k: int = 5,
                max_dist: int = 2) -> list[dict]:
        M = messages()
        req = M["SuggestRequest"](
            queries=list(self._queries_msg(queries).queries), k=k, max_dist=max_dist
        )
        out = M["SuggestResponse"].FromString(
            self._call(method, req.SerializeToString())
        )
        return [
            {"query_id": t.query_id, "term": t.term, "dist": t.dist, "df": t.df}
            for t in out.terms
        ]

    def suggest(self, queries: list[dict], *, k: int = 5, max_dist: int = 2):
        return self._assist("Suggest", queries, k=k, max_dist=max_dist)

    def complete(self, queries: list[dict], *, k: int = 5):
        return self._assist("Complete", queries, k=k)

    def rank(self, queries: list[dict]) -> list[dict]:
        """queries: [{"query_id", "text", "candidates": [{"conv_id",
        "turn_idx"}, ...]}] — the /rank body shape."""
        M = messages()
        req = M["RankRequest"]()
        for q in queries:
            req.queries.add(query_id=int(q["query_id"]), text=str(q.get("text", "")))
            for c in q.get("candidates", []):
                req.candidates.add(
                    query_id=int(q["query_id"]), conv_id=str(c["conv_id"]),
                    turn_idx=int(c.get("turn_idx", 0)),
                )
        out = M["SearchResponse"].FromString(
            self._call("Rank", req.SerializeToString())
        )
        return [
            {"query_id": h.query_id, "rank": h.rank, "conv_id": h.conv_id,
             "turn_idx": h.turn_idx, "score": h.score}
            for h in out.hits
        ]

    def health(self) -> dict:
        M = messages()
        out = M["HealthResponse"].FromString(self._call("Health", b""))
        return {"status": out.status, "n_docs": out.n_docs}

    def profile(self) -> dict:
        M = messages()
        out = M["ProfileResponse"].FromString(self._call("Profile", b""))
        return json.loads(out.json)

    def trace(self, request_id: str) -> dict:
        """Stage timings of a past request by id (the GET /trace/<id>
        analog); raises GrpcError status 5 for an unknown id."""
        M = messages()
        req = M["TraceRequest"](request_id=request_id)
        out = M["ProfileResponse"].FromString(
            self._call("Trace", req.SerializeToString())
        )
        return json.loads(out.json)

    def close(self) -> None:
        try:
            self._sock.sendall(h2.pack_frame(h2.GOAWAY, 0, 0, struct.pack(">II", 0, 0)))
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass

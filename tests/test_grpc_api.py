"""gRPC front door (the reference's DEFAULT scheme, client.py:29-54):
real protobuf messages over the from-scratch HTTP/2+HPACK layer, serving
the same QueryService as the HTTP/WS transports — wire results must equal
direct service calls, auth metadata must gate every method but Health."""

import datetime
import struct

import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.functions import h2wire as h2
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.grpc_api import (
    GrpcError,
    GrpcSearchClient,
    GrpcSearchServer,
    grpc_frame,
    grpc_unframe,
)
from clip_as_service_ray.sources.transcripts import synthesize_transcripts

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64, query_concurrency=2)


# ----------------------------------------------------------- wire units ----


def test_hpack_roundtrip_and_int_coding():
    enc, dec = h2.HpackEncoder(), h2.HpackDecoder()
    headers = [
        (":method", "POST"), (":path", "/cas.SearchService/Search"),
        ("authorization", "Bearer tok-123"),
        ("content-type", "application/grpc+proto"),
        ("x-long", "v" * 300),  # forces multi-byte prefix integers
    ]
    assert dec.decode(enc.encode(headers)) == headers
    # indexed static entries + incremental indexing + dynamic table reuse
    blob = bytes([0x82])  # indexed: static 2 = :method GET
    assert dec.decode(blob) == [(":method", "GET")]
    # literal WITH incremental indexing, new name -> enters dynamic table
    frag = bytearray([0x40])
    for s in ("x-a", "1"):
        raw = s.encode()
        frag += bytes([len(raw)]) + raw
    assert dec.decode(bytes(frag)) == [("x-a", "1")]
    assert dec.decode(bytes([0x80 | 62])) == [("x-a", "1")]  # dynamic index
    # an all-ones "Huffman literal" is 8 bits of un-decodable padding
    with pytest.raises(ConnectionError):
        h2.HpackDecoder().decode(bytes([0x00, 0x81, 0xFF]))


# RFC 7541 Appendix C request/response examples — the canonical
# Huffman-coded literal fixtures (C.4.1-C.4.3, C.6.1).
_RFC_HUFF_VECTORS = [
    ("www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),
    ("no-cache", "a8eb10649cbf"),
    ("custom-key", "25a849e95ba97d7f"),
    ("custom-value", "25a849e95bb8e8b4bf"),
    ("302", "6402"),
    ("private", "aec3771a4b"),
    ("Mon, 21 Oct 2013 20:13:21 GMT",
     "d07abe941054d444a8200595040b8166e082a62d1bff"),
    ("https://www.example.com", "9d29ad171863c78f0b97c8e9ae82ae43d3"),
]


def test_huffman_rfc7541_appendix_c_vectors():
    for text, hexcode in _RFC_HUFF_VECTORS:
        blob = bytes.fromhex(hexcode)
        assert h2.huffman_encode(text.encode()) == blob, text
        assert h2.huffman_decode(blob) == text.encode(), text


def test_huffman_all_bytes_roundtrip():
    raw = bytes(range(256)) * 3
    assert h2.huffman_decode(h2.huffman_encode(raw)) == raw
    assert h2.huffman_decode(b"") == b""


def test_huffman_error_paths():
    # padding must be an EOS prefix (all ones): '0' encodes as 00000 so a
    # single 0x00 byte is code '0' + three ZERO padding bits -> error
    with pytest.raises(ConnectionError):
        h2.huffman_decode(bytes([0x00]))
    # >= 8 bits of trailing all-ones is an undecodable code, not padding
    with pytest.raises(ConnectionError):
        h2.huffman_decode(bytes([0xFF, 0xFF, 0xFF, 0xFF]))


def test_hpack_huffman_coded_headers_decode():
    """A real gRPC client Huffman-codes literals by default — the full
    RFC 7541 C.4.1 header block (indexed fields + Huffman literal) and our
    own Huffman encoder must both decode to the expected header lists."""
    dec = h2.HpackDecoder()
    first = bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff")
    assert dec.decode(first) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"),
    ]
    # C.4.2: the dynamic-table entry added above is reusable (index 62)
    second = bytes.fromhex("828684be5886a8eb10649cbf")
    assert dec.decode(second) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"), ("cache-control", "no-cache"),
    ]
    headers = [(":method", "POST"), ("x-token", "s3cr3t-value"),
               ("x-bytes", "A" * 200)]
    enc = h2.HpackEncoder(huffman=True)
    assert h2.HpackDecoder().decode(enc.encode(headers)) == headers


def test_h2_padding_and_int_hardening():
    # pad length >= remaining payload is PROTOCOL_ERROR, not a wrong slice
    with pytest.raises(ConnectionError):
        h2.strip_padding(h2.FLAG_PADDED, bytes([200]) + b"abc")
    assert h2.strip_padding(h2.FLAG_PADDED, bytes([1]) + b"abcX") == b"abc"
    # unbounded HPACK integer continuation bytes fail loudly
    with pytest.raises(ConnectionError):
        h2._decode_int(bytes([0x7F]) + b"\xff" * 12, 0, 7)


def test_frame_and_grpc_frame_roundtrip():
    fr = h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 7, b"abc")

    class FakeSock:
        def __init__(self, data):
            self.data, self.pos = data, 0

        def recv(self, n):
            out = self.data[self.pos : self.pos + n]
            self.pos += len(out)
            return out

    t, f, sid, payload = h2.read_frame(FakeSock(fr))
    assert (t, f, sid, payload) == (h2.HEADERS, h2.FLAG_END_HEADERS, 7, b"abc")
    msg = b"\x01\x02" * 10
    assert grpc_unframe(grpc_frame(msg)) == msg
    with pytest.raises(ValueError):
        grpc_unframe(b"\x01" + struct.pack(">I", 0))  # compressed flag


def test_hpack_malformed_inputs_fail_loudly():
    dec = h2.HpackDecoder()
    with pytest.raises(ValueError):  # index 0 is a protocol error
        dec.decode(bytes([0x80]))
    with pytest.raises(ValueError):  # index past both tables
        dec.decode(bytes([0x80 | 0x7F, 0x7F]))
    with pytest.raises(ConnectionError):  # truncated literal
        dec.decode(bytes([0x00, 0x05, 0x61]))
    # dynamic-table size update evicts entries
    d2 = h2.HpackDecoder()
    frag = bytearray([0x40])
    for s in ("x-key", "val"):
        frag += bytes([len(s)]) + s.encode()
    d2.decode(bytes(frag))
    assert len(d2.dynamic) == 1
    d2.decode(bytes([0x20]))  # size update -> 0: evict all
    assert len(d2.dynamic) == 0


def test_send_window_guard():
    w = h2.SendWindow(100)
    w.take(60)
    w.grant(10)
    with pytest.raises(ConnectionError, match="window exhausted"):
        w.take(51)
    w.take(50)  # exactly the remaining credit


def test_data_chunking_obeys_max_frame():
    frames = h2.chunk_data_frames(1, b"z" * (h2.MAX_FRAME * 2 + 100), end_stream=True)
    assert len(frames) == 3
    # only the LAST carries END_STREAM
    flags = [fr[4] for fr in frames]
    assert flags == [0, 0, h2.FLAG_END_STREAM]


# ------------------------------------------------------------ lifecycle ----


@pytest.fixture(scope="module")
def grpc_server(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("grpc")
    corpus = synthesize_transcripts(1200, seed=42)
    idx = str(root / "index")
    build_index(corpus, idx, CFG, overwrite=True)
    srv = GrpcSearchServer(idx, CFG)
    cli = GrpcSearchClient(srv.url)
    yield srv, cli
    cli.close()
    srv.shutdown()


def test_health_and_profile(grpc_server):
    srv, cli = grpc_server
    assert srv.url.startswith("grpc://")
    h = cli.health()
    assert h["status"] == "ok" and h["n_docs"] > 0
    p = cli.profile()
    assert "score_s" in p


def test_search_matches_direct_service(grpc_server):
    srv, cli = grpc_server
    queries = [
        {"query_id": 0, "text": "merge window", "limit": 5},
        {"query_id": 1, "text": "flaky test retry", "limit": 3},
    ]
    hits = cli.search(queries)
    qt = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["merge window", "flaky test retry"]),
            "limit": pa.array([5, 3], pa.int32()),
        }
    )
    direct = srv.service.search(qt).to_pylist()
    assert len(hits) == len(direct) > 0
    for got, want in zip(hits, direct):
        assert got["conv_id"] == want["conv_id"]
        assert got["turn_idx"] == want["turn_idx"]
        assert got["rank"] == want["rank"]
        assert got["score"] == want["score"]  # protobuf double is exact


def test_encode_suggest_complete_rank(grpc_server):
    srv, cli = grpc_server
    vecs = cli.encode([{"query_id": 0, "text": "merge window"}])
    assert 0 in vecs and len(vecs[0]) >= 1
    assert all(w > 0 for w in vecs[0].values())

    sugg = cli.suggest([{"query_id": 0, "text": "mergw"}], max_dist=2, k=3)
    assert all(s["query_id"] == 0 for s in sugg)
    comp = cli.complete([{"query_id": 0, "text": "mer"}], k=3)
    assert all(c["term"].startswith("mer") for c in comp)

    base = cli.search([{"query_id": 0, "text": "merge window", "limit": 4}])
    ranked = cli.rank([
        {"query_id": 0, "text": "merge window",
         "candidates": [{"conv_id": h["conv_id"], "turn_idx": h["turn_idx"]}
                        for h in base]}
    ])
    assert len(ranked) == len(base)
    # set_rank over the top-k candidates reproduces the retrieval order
    assert [(r["conv_id"], r["turn_idx"]) for r in ranked] == [
        (h["conv_id"], h["turn_idx"]) for h in base
    ]


def test_large_response_multi_frame(grpc_server):
    """A response larger than one HTTP/2 DATA frame (16 KiB) must arrive
    intact through the chunked send path."""
    srv, cli = grpc_server
    queries = [
        {"query_id": i, "text": "merge window test retry", "limit": 50}
        for i in range(40)
    ]
    hits = cli.search(queries)
    assert len(hits) > 400  # comfortably multiple frames of hit rows
    qids = {h["query_id"] for h in hits}
    assert qids == set(range(40))


def test_large_request_first_call(grpc_server):
    """Regression: a FRESH client's first RPC with a >64 KiB request body
    must succeed — the client has to absorb the server's window grants
    before spending send credit (the HTTP/2 64 KiB default would
    otherwise reject it client-side)."""
    srv, _ = grpc_server
    cli = GrpcSearchClient(srv.url)
    try:
        queries = [
            {"query_id": i, "text": "merge window " + "pad" * 120, "limit": 1}
            for i in range(200)
        ]  # serialized request comfortably > 65,535 bytes
        from clip_as_service_ray.pipelines.grpc_api import grpc_frame
        assert len(grpc_frame(
            cli._queries_msg(queries).SerializeToString())) > 65_535
        hits = cli.search(queries)
        assert {h["query_id"] for h in hits} == set(range(200))
    finally:
        cli.close()


def test_split_header_block_keeps_end_stream(grpc_server):
    """Regression: HEADERS(END_STREAM, no END_HEADERS) + CONTINUATION
    (END_HEADERS) must still dispatch — CONTINUATION never carries
    END_STREAM, so the server has to remember the bit."""
    import socket as socketmod

    srv, _ = grpc_server
    sock = socketmod.create_connection((srv.host, srv.port), timeout=30)
    try:
        sock.sendall(h2.PREFACE + h2.raise_windows_frames())
        enc = h2.HpackEncoder()
        block = enc.encode([
            (":method", "POST"), (":scheme", "http"),
            (":path", "/cas.SearchService/Health"),
            (":authority", f"{srv.host}:{srv.port}"),
            ("content-type", "application/grpc+proto"),
            ("te", "trailers"),
        ])
        half = len(block) // 2
        sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_STREAM, 1,
                                   block[:half]))
        sock.sendall(h2.pack_frame(h2.CONTINUATION, h2.FLAG_END_HEADERS, 1,
                                   block[half:]))
        dec = h2.HpackDecoder()
        status = None
        while True:
            ftype, flags, sid, payload = h2.read_frame(sock)
            if ftype == h2.SETTINGS and not (flags & h2.FLAG_ACK):
                sock.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0, b""))
            elif ftype == h2.HEADERS and sid == 1:
                hdrs = dict(dec.decode(payload))
                status = hdrs.get("grpc-status", status)
                if flags & h2.FLAG_END_STREAM:
                    break
        assert status == "0"  # Health dispatched and succeeded
    finally:
        sock.close()


def test_trace_context_over_grpc(grpc_server):
    """x-request-id metadata in/out + the Trace method: a search's stage
    timings are retrievable by request id (the OTel-span analog)."""
    srv, cli = grpc_server
    cli.search([{"query_id": 0, "text": "merge window", "limit": 3}])
    rid = cli.last_request_id
    assert rid
    tr = cli.trace(rid)
    assert tr["request_id"] == rid and tr["endpoint"] == "Search"
    names = [s["name"] for s in tr["spans"]]
    assert names == ["parse", "score", "serialize", "total"]

    # client-supplied id wins (trace-context propagation)
    cli.search([{"query_id": 0, "text": "index", "limit": 2}],
               request_id="grpc-trace-01")
    assert cli.last_request_id == "grpc-trace-01"
    assert cli.trace("grpc-trace-01")["request_id"] == "grpc-trace-01"

    with pytest.raises(GrpcError) as ei:
        cli.trace("nope")
    assert ei.value.status == 5  # NOT_FOUND


def test_huffman_client_lifecycle(grpc_server):
    """A client that Huffman-codes its request headers (the real-grpcio
    default) gets identical results to the raw-literal client."""
    srv, cli = grpc_server
    queries = [{"query_id": 7, "text": "merge window", "limit": 5}]
    want = cli.search(queries)
    hc = GrpcSearchClient(srv.url, huffman=True)
    try:
        assert hc.health()["status"] == "ok"
        got = hc.search(queries)
    finally:
        hc.close()
    assert got == want and len(got) > 0


def test_unknown_method_is_unimplemented(grpc_server):
    srv, _cli = grpc_server
    cli = GrpcSearchClient(srv.url)
    try:
        with pytest.raises(GrpcError) as ei:
            cli._call("NoSuchMethod", b"")
        assert ei.value.status == 12
        # connection survives an error status: next call still works
        assert cli.health()["status"] == "ok"
    finally:
        cli.close()


def test_auth_metadata(grpc_server):
    srv, _ = grpc_server
    auth_srv = GrpcSearchServer(srv.service.index_dir, CFG, auth_token="tok-1")
    try:
        ok = GrpcSearchClient(auth_srv.url, auth_token="tok-1")
        assert len(ok.search([{"query_id": 0, "text": "merge", "limit": 2}])) > 0
        ok.close()
        bearer = GrpcSearchClient(auth_srv.url, auth_token="Bearer tok-1")
        assert bearer.health()["status"] == "ok"  # health unauthenticated
        assert len(bearer.search([{"query_id": 0, "text": "merge", "limit": 2}])) > 0
        bearer.close()
        bad = GrpcSearchClient(auth_srv.url, auth_token="wrong")
        with pytest.raises(GrpcError) as ei:
            bad.search([{"query_id": 0, "text": "merge", "limit": 1}])
        assert ei.value.status == 16
        bad.close()
        anon = GrpcSearchClient(auth_srv.url)
        assert anon.health()["status"] == "ok"
        with pytest.raises(GrpcError):
            anon.profile()
        anon.close()
    finally:
        auth_srv.shutdown()


def _write_cert(tmp_path):
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name).public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    certfile = str(tmp_path / "srv.pem")
    keyfile = str(tmp_path / "srv.key")
    with open(certfile, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(keyfile, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ))
    return certfile, keyfile


def test_grpcs_tls(grpc_server, tmp_path):
    """grpcs:// (client.py:42-44: the grpcs scheme sets tls=True): TLS
    handshake from a provided cert/key, auth metadata rides the channel."""
    srv, _ = grpc_server
    certfile, keyfile = _write_cert(tmp_path)
    tls_srv = GrpcSearchServer(
        srv.service.index_dir, CFG, auth_token="tls-tok",
        certfile=certfile, keyfile=keyfile,
    )
    try:
        assert tls_srv.url.startswith("grpcs://")
        cli = GrpcSearchClient(tls_srv.url, auth_token="tls-tok", cafile=certfile)
        assert cli.health()["status"] == "ok"
        hits = cli.search([{"query_id": 0, "text": "index merge", "limit": 3}])
        assert len(hits) == 3
        cli.close()
        bad = GrpcSearchClient(tls_srv.url, cafile=certfile)
        with pytest.raises(GrpcError) as ei:
            bad.search([{"query_id": 0, "text": "index", "limit": 1}])
        assert ei.value.status == 16
        bad.close()
    finally:
        tls_srv.shutdown()

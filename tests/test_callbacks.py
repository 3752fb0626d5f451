"""Per-request-batch client callbacks (on_done/on_error/on_always —
client.py:233-252,302-327, pinned by the reference's
tests/test_client.py:147-195) and wss:// TLS WebSocket serving."""

import asyncio
import datetime

import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.callbacks import astream_batches, stream_batches

CFG = EngineConfig(
    num_index_partitions=2, doc_bucket_size=256, postings_block_size=64,
    query_concurrency=1,
)


# ------------------------------------------------------------ unit layer ----


class Recorder:
    def __init__(self):
        self.done, self.error, self.always = [], [], []

    def on_done(self, r):
        self.done.append(r)

    def on_error(self, e):
        self.error.append(e)

    def on_always(self, r):
        self.always.append(r)


def test_stream_batches_success_routing():
    rec = Recorder()
    out = stream_batches(
        [1, 2, 3, 4], lambda b: [x * 10 for x in b], batch_size=2,
        on_done=rec.on_done, on_error=rec.on_error, on_always=rec.on_always,
    )
    assert out is None  # callbacks own results (reference asserts r is None)
    assert rec.done == [[10, 20], [30, 40]]
    assert rec.error == []
    assert rec.always == [[10, 20], [30, 40]]


def test_stream_batches_gathers_without_callbacks():
    assert stream_batches([1, 2, 3], lambda b: [x + 1 for x in b],
                          batch_size=2) == [2, 3, 4]
    # on_error alone still gathers + returns (reference gathers unless
    # on_done/on_always are set)
    rec = Recorder()
    assert stream_batches([1], lambda b: b, on_error=rec.on_error) == [1]


def test_stream_batches_error_routing():
    rec = Recorder()

    def call(batch):
        if 3 in batch:
            raise ValueError("boom")
        return batch

    out = stream_batches(
        [1, 2, 3, 4, 5, 6], call, batch_size=2,
        on_done=rec.on_done, on_error=rec.on_error, on_always=rec.on_always,
    )
    assert out is None
    assert rec.done == [[1, 2], [5, 6]]  # streaming continued past failure
    assert len(rec.error) == 1 and isinstance(rec.error[0], ValueError)
    assert len(rec.always) == 3  # fired for every batch either way
    # without on_error the failure raises (after on_always sees it)
    rec2 = Recorder()
    with pytest.raises(ValueError):
        stream_batches([3], call, on_done=rec2.on_done, on_always=rec2.on_always)
    assert rec2.done == [] and len(rec2.always) == 1


def test_astream_batches_routing():
    rec = Recorder()

    async def call(batch):
        if batch == [2]:
            raise RuntimeError("bad batch")
        return [x * 2 for x in batch]

    async def main():
        out = await astream_batches(
            [1, 2, 3], call, batch_size=1,
            on_done=rec.on_done, on_error=rec.on_error, on_always=rec.on_always,
        )
        assert out is None
        gathered = await astream_batches([1, 2], lambda b: call([b[0] * 3]),
                                         batch_size=1)
        return gathered

    gathered = asyncio.run(main())
    assert rec.done == [[2], [6]]
    assert len(rec.error) == 1
    assert len(rec.always) == 3
    assert gathered == [6, 12]


# ------------------------------------------------------- transport layer ----


def _turn(conv, text, t=0):
    return {"conv_id": conv, "turn_idx": t, "role": "user", "text": text}


def test_ws_async_callbacks(ray_session, tmp_path):
    """Mirror of the reference's async callback test: r is None, on_done
    once, on_error never, on_always once — then a failing request routed
    to on_error with on_always still firing."""
    from clip_as_service_ray.pipelines.ws_api import (
        AsyncSearchClient,
        WebSocketSearchServer,
    )

    srv = WebSocketSearchServer(str(tmp_path / "wsroot"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex([_turn("convw", "merge the stream window"),
                            _turn("convy", "merge merge window")])
            rec = Recorder()
            r = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5}],
                on_done=rec.on_done, on_error=rec.on_error,
                on_always=rec.on_always,
            )
            assert r is None
            assert len(rec.done) == 1 and len(rec.done[0]) == 2
            assert rec.error == [] and len(rec.always) == 1

            # per-batch streaming: 4 queries, batch_size 2 -> 2 firings
            rec2 = Recorder()
            await c.asearch(
                [{"query_id": i, "text": "merge", "limit": 2} for i in range(4)],
                batch_size=2, on_done=rec2.on_done, on_always=rec2.on_always,
            )
            assert len(rec2.done) == 2 and len(rec2.always) == 2

            # failing batch (unknown mode) routes to on_error
            rec3 = Recorder()
            r = await c.asearch(
                [{"query_id": 0, "text": "merge", "limit": 2}],
                mode="no-such-mode",
                on_done=rec3.on_done, on_error=rec3.on_error,
                on_always=rec3.on_always,
            )
            assert r is None
            assert rec3.done == []
            assert len(rec3.error) == 1 and len(rec3.always) == 1

            # encode + rank callback surface exists and routes
            rec4 = Recorder()
            await c.aencode([{"query_id": 0, "text": "merge window"}],
                            on_done=rec4.on_done, on_always=rec4.on_always)
            assert len(rec4.done) == 1 and len(rec4.always) == 1
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()


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
    certfile, keyfile = str(tmp_path / "srv.pem"), str(tmp_path / "srv.key")
    with open(certfile, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(keyfile, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ))
    return certfile, keyfile


def test_wss_tls(ray_session, tmp_path):
    """wss:// (client.py:43-48 scheme list): TLS handshake from a provided
    cert/key; the auth header rides the encrypted channel (a welcome
    divergence from the reference, which rejects websocket credentials —
    client.py:49-52; documented at the server)."""
    from clip_as_service_ray.pipelines.ws_api import (
        AsyncSearchClient,
        WebSocketSearchServer,
    )

    certfile, keyfile = _write_cert(tmp_path)
    srv = WebSocketSearchServer(
        str(tmp_path / "wssroot"), CFG, auth_token="wss-tok",
        certfile=certfile, keyfile=keyfile,
    )
    try:
        assert srv.url.startswith("wss://")

        async def main():
            c = await AsyncSearchClient(
                srv.url, credential={"Authorization": "wss-tok"}, cafile=certfile
            ).connect()
            assert (await c.ahealth())["status"] == "ok"
            await c.aindex([_turn("convw", "tls merge window")])
            hits = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5}]
            )
            assert {x["conv_id"] for x in hits} == {"convw"}
            await c.aclose()

            # wrong token is refused at the TLS-wrapped handshake
            with pytest.raises(ConnectionError):
                await AsyncSearchClient(
                    srv.url, credential={"Authorization": "nope"},
                    cafile=certfile,
                ).connect()

        asyncio.run(main())
    finally:
        srv.shutdown()


def test_http_client_callbacks(ray_session, tmp_path):
    """Sync-client mirror of the reference callback contract over HTTP."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.http_api import (
        SearchHTTPClient,
        SearchHTTPServer,
    )
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    idx = str(tmp_path / "idx")
    build_index(synthesize_transcripts(300, seed=3), idx, CFG, overwrite=True)
    srv = SearchHTTPServer(idx, CFG)
    try:
        cli = SearchHTTPClient(srv.url)
        rec = Recorder()
        r = cli.search(
            [{"query_id": 0, "text": "merge window", "limit": 3}],
            on_done=rec.on_done, on_error=rec.on_error, on_always=rec.on_always,
        )
        assert r is None
        assert len(rec.done) == 1 and rec.error == [] and len(rec.always) == 1

        # batched: 4 queries in 2 request batches
        rec2 = Recorder()
        cli.search(
            [{"query_id": i, "text": "merge", "limit": 2} for i in range(4)],
            batch_size=2, on_done=rec2.on_done,
        )
        assert len(rec2.done) == 2
        qids = {h["query_id"] for batch in rec2.done for h in batch}
        assert qids == {0, 1, 2, 3}

        # no callbacks: unchanged gather-and-return behavior
        hits = cli.search([{"query_id": 0, "text": "merge window", "limit": 3}])
        assert isinstance(hits, list) and hits

        # a failing batch (malformed query -> HTTP 400) routes to on_error
        rec3 = Recorder()
        r = cli.search(
            [{"text": "merge", "limit": 2}],  # missing query_id -> KeyError
            on_done=rec3.on_done, on_error=rec3.on_error, on_always=rec3.on_always,
        )
        assert r is None and rec3.done == []
        assert len(rec3.error) == 1 and len(rec3.always) == 1

        # encode callback surface
        rec4 = Recorder()
        assert cli.encode([{"query_id": 0, "text": "merge window"}],
                          on_done=rec4.on_done) is None
        assert len(rec4.done) == 1
    finally:
        srv.shutdown()

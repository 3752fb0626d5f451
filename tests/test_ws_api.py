"""WebSocket transport + async client: full index/search/delete lifecycle
over the second front door (the reference's ws:// scheme + async API,
client.py:29-54,333; tests/test_asyncio.py analog)."""

import asyncio

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.ws_api import (
    AsyncSearchClient,
    WebSocketSearchServer,
)

CFG = EngineConfig(
    num_index_partitions=2, doc_bucket_size=256, postings_block_size=64,
    query_concurrency=1,
)


def _turn(conv, text, t=0):
    return {"conv_id": conv, "turn_idx": t, "role": "user", "text": text}


def test_websocket_lifecycle(ray_session, tmp_path):
    srv = WebSocketSearchServer(str(tmp_path / "wsroot"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            h = await c.ahealth()
            assert h["status"] == "ok" and h["n_segments"] == 0

            out = await c.aindex(
                [
                    _turn("convw", "merge the stream window"),
                    _turn("convx", "data index layout"),
                    _turn("convy", "merge merge window"),
                ]
            )
            assert out == {"n_segments": 1, "n_docs": 3, "id": out["id"],
                           "request_id": out["request_id"]}

            hits = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5}]
            )
            assert {x["conv_id"] for x in hits} == {"convw", "convy"}
            assert hits[0]["conv_id"] == "convy"  # highest tf first

            # boolean mode through the same socket
            hits = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5,
                  "exclude": "stream"}],
                mode="conjunctive",
            )
            assert {x["conv_id"] for x in hits} == {"convy"}

            # streamed batches: 4 queries in chunks of 2 -> 2 reply frames
            qs = [
                {"query_id": i, "text": t, "limit": 5}
                for i, t in enumerate(["merge", "window", "data", "layout"])
            ]
            chunks = await c.asearch(qs, stream=2)
            assert len(chunks) == 2
            assert [ch["seq"] for ch in chunks] == [0, 1]
            assert chunks[-1]["final"] is True
            got_qids = {
                h["query_id"] for ch in chunks for h in ch["hits"]
            }
            assert got_qids == {0, 1, 2, 3}

            # delete lifecycle: tombstoned conv disappears immediately
            await c.adelete(["convy"])
            hits = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5}]
            )
            assert {x["conv_id"] for x in hits} == {"convw"}

            # second segment visible on return
            out = await c.aindex([_turn("convz", "window window window")])
            assert out["n_segments"] == 2
            hits = await c.asearch([{"query_id": 0, "text": "window", "limit": 5}])
            assert "convz" in {x["conv_id"] for x in hits}

            # errors surface as ValueError, connection stays usable
            try:
                await c.asearch([{"query_id": 0, "text": "x"}], mode="bogus")
                raise AssertionError("expected error for unknown mode")
            except ValueError as e:
                assert "bogus" in str(e)
            h = await c.ahealth()
            assert h["n_segments"] == 2
            await c.aclose()

        asyncio.run(main())
        assert srv.metrics._counts["search_requests_total"] >= 5
        assert srv.metrics._counts["index_requests_total"] == 2
    finally:
        srv.shutdown()


def test_websocket_concurrent_clients(ray_session, tmp_path):
    """Two clients interleaving on one event loop — the async-server
    property: a blocking engine call on one connection must not stall the
    other (both run through the loop's executor)."""
    srv = WebSocketSearchServer(str(tmp_path / "wsroot2"), CFG)
    try:
        async def main():
            a = await AsyncSearchClient(srv.url).connect()
            b = await AsyncSearchClient(srv.url).connect()
            await a.aindex([_turn("convp", "alpha beta gamma")])

            async def hammer(cli, n):
                out = []
                for _ in range(n):
                    out.append(
                        await cli.asearch(
                            [{"query_id": 0, "text": "alpha", "limit": 3}]
                        )
                    )
                return out

            ra, rb = await asyncio.gather(hammer(a, 4), hammer(b, 4))
            for hits in ra + rb:
                assert [x["conv_id"] for x in hits] == ["convp"]
            await a.aclose()
            await b.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()


def test_websocket_auth(ray_session, tmp_path):
    """Credential pass-through on the websocket transport: the Authorization
    header rides the upgrade handshake (client.py:26-64 contract — explicit
    {'Authorization': token} or the CLIP_AUTH_TOKEN env var); a missing or
    wrong token is rejected at the handshake with 401 before any op runs.
    (The reference warns ws lacks credential support, client.py:48-52; this
    transport closes that gap.)"""
    import os

    srv = WebSocketSearchServer(str(tmp_path / "wsauth"), CFG, auth_token="tok-42")
    try:
        async def main():
            # no credential -> handshake refused
            try:
                await AsyncSearchClient(srv.url).connect()
                raise AssertionError("unauthenticated handshake succeeded")
            except ConnectionError as e:
                assert "401" in str(e)
            # wrong credential -> refused
            try:
                await AsyncSearchClient(
                    srv.url, credential={"Authorization": "nope"}
                ).connect()
                raise AssertionError("mistokened handshake succeeded")
            except ConnectionError as e:
                assert "401" in str(e)
            # right credential -> full lifecycle works on the socket
            c = await AsyncSearchClient(
                srv.url, credential={"Authorization": "tok-42"}
            ).connect()
            out = await c.aindex([_turn("convz", "auth data index")])
            assert out["n_docs"] == 1
            hits = await c.asearch([{"query_id": 0, "text": "auth", "limit": 3}])
            assert hits and hits[0]["conv_id"] == "convz"
            await c.aclose()
            # env fallback
            os.environ["CLIP_AUTH_TOKEN"] = "tok-42"
            try:
                c2 = await AsyncSearchClient(srv.url).connect()
                h = await c2.ahealth()
                assert h["status"] == "ok"
                await c2.aclose()
            finally:
                del os.environ["CLIP_AUTH_TOKEN"]

        asyncio.run(main())
        assert srv.metrics._counts.get("auth_failures_total", 0) >= 2
    finally:
        srv.shutdown()


def test_async_client_progress_counters(ray_session, tmp_path):
    """Transfer progress (client.py:132-158 analog): the async client counts
    bytes/messages both ways, streamed chunks included, and fires the
    optional on_progress callback as transfers complete."""
    srv = WebSocketSearchServer(str(tmp_path / "wsprog"), CFG)
    try:
        seen = []

        async def main():
            c = await AsyncSearchClient(srv.url, on_progress=seen.append).connect()
            assert c.progress == {"bytes_sent": 0, "bytes_recv": 0,
                                  "msgs_sent": 0, "msgs_recv": 0}
            await c.aindex([_turn(f"c{i}", "progress data turn") for i in range(8)])
            p1 = dict(c.progress)
            assert p1["bytes_sent"] > 0 and p1["bytes_recv"] > 0
            assert p1["msgs_sent"] == 1 and p1["msgs_recv"] == 1
            # streamed search: one sent message, multiple received chunks
            chunks = await c.asearch(
                [{"query_id": i, "text": "progress", "limit": 2} for i in range(6)],
                stream=2,
            )
            p2 = c.progress
            assert p2["msgs_sent"] == 2
            assert p2["msgs_recv"] == 1 + len(chunks) and len(chunks) >= 3
            assert p2["bytes_recv"] > p1["bytes_recv"]
            await c.aclose()

        asyncio.run(main())
        assert len(seen) >= 4  # callback fired per tracked transfer
    finally:
        srv.shutdown()


def test_websocket_rank_op(ray_session, tmp_path):
    """'rank' op over the socket: segmented scatter-rank scores PROVIDED
    candidates (per-segment lenient resolution), rank scores equal retrieval
    scores for the same docs, and updated conversations rank with their NEW
    text (scoped tombstones drop the old version's score)."""
    srv = WebSocketSearchServer(str(tmp_path / "wsrank"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex([
                _turn("r1", "merge the stream window"),
                _turn("r2", "data index layout"),
                _turn("r3", "merge merge window"),
            ])
            top = await c.asearch([{"query_id": 0, "text": "merge window", "limit": 3}])
            cands = [{"conv_id": cv, "turn_idx": 0} for cv in ("r2", "r1", "r3")]
            ranked = await c.arank([
                {"query_id": 0, "text": "merge window", "candidates": cands}
            ])
            assert [r["conv_id"] for r in ranked] == ["r3", "r1", "r2"]
            by_conv = {r["conv_id"]: r["score"] for r in ranked}
            for t in top:
                assert by_conv[t["conv_id"]] == t["score"]  # rank == retrieval score
            assert ranked[-1]["conv_id"] == "r2" and ranked[-1]["score"] == 0.0
            # update r3: candidates resolve to the NEW version only
            await c.aupdate([_turn("r3", "completely different now")])
            ranked2 = await c.arank([
                {"query_id": 0, "text": "merge window", "candidates": cands}
            ])
            assert {r["conv_id"] for r in ranked2} == {"r1", "r2", "r3"}
            new_r3 = [r for r in ranked2 if r["conv_id"] == "r3"][0]
            assert new_r3["score"] == 0.0  # new text matches nothing
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()


def test_websocket_encode_op(ray_session, tmp_path):
    """'encode' op: sparse BM25 vectors under the UNION stats — the aencode
    analog. Terms unknown to segment 0 but present in segment 1 still
    encode (weights come from the union dictionary, not any one segment)."""
    srv = WebSocketSearchServer(str(tmp_path / "wsenc"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex([_turn("e1", "alpha beta alpha")])
            await c.aindex([_turn("e2", "gammaword delta")])  # segment 2 only
            vecs = await c.aencode([
                {"query_id": 0, "text": "alpha gammaword"},
                {"query_id": 1, "text": "unknownterm"},
            ])
            v0 = vecs[0]["vector"]
            assert set(v0) == {"alpha", "gammaword"} and all(w > 0 for w in v0.values())
            assert vecs[1]["vector"] == {}
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()


def test_websocket_suggest_complete_ops(ray_session, tmp_path):
    srv = WebSocketSearchServer(str(tmp_path / "wssug"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex([
                _turn("cva", "panda panda bamboo"),
                _turn("cvb", "panda pander pans"),
            ])
            sug = await c.asuggest([{"query_id": 0, "text": "pnda"}])
            terms = sug[0]["terms"]
            assert terms[0]["term"] == "panda" and terms[0]["dist"] == 1
            assert terms[0]["df"] == 2  # both docs
            comp = await c.acomplete([{"query_id": 0, "text": "pan"}], k=2)
            got = [t["term"] for t in comp[0]["terms"]]
            assert got == ["panda", "pander"]  # df 2 first, then term ASC
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()


def test_websocket_explain_op(ray_session, tmp_path):
    srv = WebSocketSearchServer(str(tmp_path / "wsroot"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex(
                [
                    _turn("conva", "alpha beta gamma"),
                    _turn("convb", "alpha delta"),
                ]
            )
            hits = await c.asearch([{"query_id": 0, "text": "alpha beta", "limit": 1}])
            h = hits[0]
            out = await c.aexplain("alpha beta", h["conv_id"], h["turn_idx"])
            assert out["score"] == h["score"]
            assert sum(p["score"] for p in out["terms"]) == out["score"]
            assert [p["term"] for p in out["terms"]] == ["alpha", "beta"]
            assert await c.aexplain("alpha", "no-such-conv", 0) is None
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()

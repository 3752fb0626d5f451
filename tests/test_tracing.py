"""Per-request trace context (the reference's OTel span analog,
clip_torch.py:139-172): a search's stage timings must be retrievable by
request id after the fact, and client-supplied ids must win."""

import json
import urllib.error
import urllib.request

import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.tracing import SpanTimer, TraceStore, new_request_id

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64,
                   query_concurrency=1)


def test_trace_store_lru():
    ts = TraceStore(capacity=3)
    for i in range(5):
        ts.record(f"r{i}", "/search", [{"name": "total", "start_ms": 0,
                                        "duration_ms": float(i)}])
    assert len(ts) == 3
    assert ts.get("r0") is None and ts.get("r1") is None  # evicted oldest
    assert ts.get("r4")["spans"][0]["duration_ms"] == 4.0
    assert ts.get("r4")["endpoint"] == "/search"


def test_span_timer_shapes():
    t = SpanTimer()
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    spans = t.finish()
    names = [s["name"] for s in spans]
    assert names == ["a", "b", "total"]
    assert all(s["duration_ms"] >= 0 for s in spans)
    # total encloses the child spans
    assert spans[-1]["duration_ms"] >= spans[0]["duration_ms"]
    assert len({new_request_id() for _ in range(50)}) == 50


def test_search_trace_retrievable_by_request_id(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.http_api import SearchHTTPServer
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    idx = str(tmp_path / "idx")
    build_index(synthesize_transcripts(300, seed=5), idx, CFG, overwrite=True)
    srv = SearchHTTPServer(idx, CFG)
    try:
        # server-assigned id comes back on the response header
        req = urllib.request.Request(
            srv.url + "/search",
            data=json.dumps({"queries": [
                {"query_id": 0, "text": "merge window", "limit": 3}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rid = r.headers["X-Request-Id"]
            assert json.loads(r.read())["hits"]
        assert rid
        with urllib.request.urlopen(srv.url + f"/trace/{rid}", timeout=10) as r:
            tr = json.loads(r.read())
        assert tr["request_id"] == rid and tr["endpoint"] == "/search"
        names = [s["name"] for s in tr["spans"]]
        assert names == ["parse", "score", "serialize", "total"]
        score = next(s for s in tr["spans"] if s["name"] == "score")
        total = next(s for s in tr["spans"] if s["name"] == "total")
        assert 0 < score["duration_ms"] <= total["duration_ms"]

        # client-supplied X-Request-Id is honored (trace-context propagation)
        req = urllib.request.Request(
            srv.url + "/search",
            data=json.dumps({"queries": [
                {"query_id": 0, "text": "index", "limit": 2}]}).encode(),
            headers={"Content-Type": "application/json",
                     "X-Request-Id": "my-trace-0001"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["X-Request-Id"] == "my-trace-0001"
        with urllib.request.urlopen(srv.url + "/trace/my-trace-0001",
                                    timeout=10) as r:
            assert json.loads(r.read())["request_id"] == "my-trace-0001"

        # unknown id -> 404
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(srv.url + "/trace/nope", timeout=10)
    finally:
        srv.shutdown()


def test_segmented_server_trace(ray_session, tmp_path):
    """Same trace surface on the lifecycle (segmented) server."""
    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

    srv = SegmentedSearchHTTPServer(str(tmp_path / "segroot"), CFG)
    try:
        req = urllib.request.Request(
            srv.url + "/index",
            data=json.dumps({"turns": [
                {"conv_id": "convw", "turn_idx": 0, "role": "user",
                 "text": "merge the stream window"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read())["n_docs"] == 1
        req = urllib.request.Request(
            srv.url + "/search",
            data=json.dumps({"queries": [
                {"query_id": 0, "text": "merge window", "limit": 3}]}).encode(),
            headers={"Content-Type": "application/json",
                     "X-Request-Id": "seg-trace-01"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["X-Request-Id"] == "seg-trace-01"
            assert json.loads(r.read())["hits"]
        with urllib.request.urlopen(srv.url + "/trace/seg-trace-01",
                                    timeout=10) as r:
            tr = json.loads(r.read())
        assert [s["name"] for s in tr["spans"]] == [
            "parse", "score", "serialize", "total"]
    finally:
        srv.shutdown()


def test_http_all_endpoints_traced(ray_session, tmp_path):
    """VERDICT r04 item 5: /suggest, /complete, /encode, /rank, /explain,
    /analyze all record spans retrievable by request id."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.http_api import SearchHTTPServer
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    idx = str(tmp_path / "idx")
    build_index(synthesize_transcripts(300, seed=5), idx, CFG, overwrite=True)
    srv = SearchHTTPServer(idx, CFG)

    def post(path, payload, rid):
        req = urllib.request.Request(
            srv.url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", "X-Request-Id": rid},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["X-Request-Id"] == rid
            return json.loads(r.read())

    try:
        qs = {"queries": [{"query_id": 0, "text": "merge window"}]}
        for path, payload, want_span in [
            ("/suggest", dict(qs, k=3), "assist"),
            ("/complete", dict(qs, k=3), "assist"),
            ("/encode", qs, "encode"),
            ("/analyze", {"text": "Merge WINDOW"}, "analyze"),
        ]:
            rid = f"rid-{path.strip('/')}"
            post(path, payload, rid)
            with urllib.request.urlopen(srv.url + f"/trace/{rid}",
                                        timeout=10) as r:
                tr = json.loads(r.read())
            assert tr["endpoint"] == path
            names = [s["name"] for s in tr["spans"]]
            assert want_span in names and names[-1] == "total", (path, names)
    finally:
        srv.shutdown()


def test_segmented_phrase_and_suggest_traced(ray_session, tmp_path):
    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

    srv = SegmentedSearchHTTPServer(
        str(tmp_path / "segroot"), CFG, positions=True
    )

    def post(path, payload, rid):
        req = urllib.request.Request(
            srv.url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", "X-Request-Id": rid},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["X-Request-Id"] == rid
            return json.loads(r.read())

    try:
        req = urllib.request.Request(
            srv.url + "/index",
            data=json.dumps({"turns": [
                {"conv_id": "convw", "turn_idx": 0, "role": "user",
                 "text": "merge the stream window"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120):
            pass
        out = post("/phrase", {"queries": [
            {"query_id": 0, "text": "stream window", "limit": 5}]},
            "rid-phrase")
        assert out["hits"]
        with urllib.request.urlopen(srv.url + "/trace/rid-phrase",
                                    timeout=10) as r:
            tr = json.loads(r.read())
        assert tr["endpoint"] == "/phrase"
        assert [s["name"] for s in tr["spans"]] == [
            "parse", "score", "serialize", "total"]
        post("/suggest", {"queries": [
            {"query_id": 0, "text": "mergg"}], "k": 2}, "rid-sg")
        with urllib.request.urlopen(srv.url + "/trace/rid-sg",
                                    timeout=10) as r:
            assert json.loads(r.read())["endpoint"] == "/suggest"
    finally:
        srv.shutdown()


def test_ws_trace(ray_session, tmp_path):
    import asyncio

    from clip_as_service_ray.pipelines.ws_api import (
        AsyncSearchClient,
        WebSocketSearchServer,
    )

    srv = WebSocketSearchServer(str(tmp_path / "wsroot"), CFG)
    try:
        async def main():
            c = await AsyncSearchClient(srv.url).connect()
            await c.aindex([{"conv_id": "convw", "turn_idx": 0,
                             "role": "user", "text": "merge the window"}])
            hits = await c.asearch(
                [{"query_id": 0, "text": "merge window", "limit": 5}],
                request_id="ws-rid-1",
            )
            assert hits
            tr = await c.atrace("ws-rid-1")
            assert tr["request_id"] == "ws-rid-1"
            assert tr["endpoint"] == "search"
            assert [s["name"] for s in tr["spans"]] == ["search", "total"]
            # streamed search records one span per chunk
            chunks = await c.asearch(
                [{"query_id": i, "text": "merge", "limit": 2}
                 for i in range(4)],
                stream=2, request_id="ws-rid-2",
            )
            assert all(ch["request_id"] == "ws-rid-2" for ch in chunks)
            tr = await c.atrace("ws-rid-2")
            assert [s["name"] for s in tr["spans"]] == [
                "chunk0", "chunk1", "total"]
            try:
                await c.atrace("nope")
                raise AssertionError("expected unknown-id error")
            except ValueError as e:
                assert "unknown request id" in str(e)
            await c.aclose()

        asyncio.run(main())
    finally:
        srv.shutdown()

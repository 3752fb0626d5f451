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

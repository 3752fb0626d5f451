"""HTTP front door: /search over the wire == QueryService.search directly
(the reference's gateway-protocol surface, client.py:36-62 analog)."""

import json
import urllib.error
import urllib.request

import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.http_api import SearchHTTPServer
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

# query_concurrency=2: the module server must not reserve all 4 test CPUs
# (the segmented-lifecycle test needs slots for its own build + actors)
CFG = EngineConfig(num_index_partitions=2, postings_block_size=64, query_concurrency=2)


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("http")
    corpus = synthesize_transcripts(1200, seed=42)
    idx = str(root / "index")
    build_index(corpus, idx, CFG, overwrite=True)
    srv = SearchHTTPServer(idx, CFG)
    yield srv, corpus
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=180) as r:
        return json.loads(r.read())


def test_health_and_profile(server):
    srv, _ = server
    with urllib.request.urlopen(srv.url + "/health", timeout=10) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["n_docs"] > 0
    with urllib.request.urlopen(srv.url + "/profile", timeout=10) as r:
        p = json.loads(r.read())
    assert "score_s" in p and "blocks_total" in p


def _scrape(url):
    """GET /metrics -> {metric_name: float} (Prometheus text format)."""
    with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
        text = r.read().decode()
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        out[name] = float(val)
    return out


def test_metrics_counters_move_under_load(server):
    """GET /metrics is Prometheus-scrapeable and its counters/quantiles move
    with traffic (the reference's Prometheus surface, clip_torch.py:101-119)."""
    srv, _ = server
    before = _scrape(srv.url)
    assert before["cas_index_docs"] > 0
    n0 = before.get("cas_search_requests_total", 0)
    for _ in range(3):
        _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})
    after = _scrape(srv.url)
    assert after["cas_search_requests_total"] == n0 + 3
    assert after.get("cas_search_queries_total", 0) >= 3
    assert after.get("cas_search_hits_total", 0) > 0
    assert 'cas_search_latency_seconds{quantile="0.5"}' in after
    assert after["cas_search_latency_seconds_count"] >= 3
    assert after["cas_uptime_seconds"] > 0


def test_search_over_http_matches_oracle(server):
    srv, corpus = server
    queries = reference_query_table()
    payload = {
        "queries": [
            {"query_id": q["query_id"], "text": q["text"], "limit": q["limit"]}
            for q in queries.to_pylist()
        ]
    }
    out = _post(srv.url + "/search", payload)
    got = [(h["query_id"], h["rank"], h["conv_id"], h["turn_idx"]) for h in out["hits"]]
    want_df = OracleIndex(corpus).search(queries).to_pandas()
    want = list(zip(want_df.query_id, want_df["rank"], want_df.conv_id, want_df.turn_idx))
    assert got == want


def test_bad_requests(server):
    srv, _ = server
    # malformed body -> 400 with an error message
    req = urllib.request.Request(
        srv.url + "/search", data=b"{not json", headers={"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(srv.url + "/nope", timeout=10)
    assert e2.value.code == 404
    # empty query list -> empty hits, not an error
    assert _post(srv.url + "/search", {"queries": []}) == {"hits": []}


def test_segmented_lifecycle_over_http(ray_session, tmp_path):
    """index -> search -> index more -> search sees new docs -> delete ->
    gone: the reference's /index + /search behavior through the front door."""
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

    cfg = EngineConfig(num_index_partitions=2, doc_bucket_size=256, postings_block_size=64, query_concurrency=1)
    srv = SegmentedSearchHTTPServer(str(tmp_path / "seghttp"), cfg)
    try:
        def turns(conv, text):
            return {"conv_id": conv, "turn_idx": 0, "role": "user", "text": text}

        out = _post(srv.url + "/index", {"turns": [
            turns("convaa", "merge the stream window"),
            turns("convab", "data index layout"),
        ]})
        assert out["n_segments"] == 1 and out["n_docs"] == 2

        hits = _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert [h["conv_id"] for h in hits][:1] == ["convaa"]

        out = _post(srv.url + "/index", {"turns": [
            turns("convac", "merge merge merge window")]})
        assert out["n_segments"] == 2
        hits = _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert "convac" in {h["conv_id"] for h in hits}  # new doc visible

        # exact phrase + proximity through the positional artifacts: new
        # docs phrase-searchable immediately, counts exact
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"]) for h in ph} == {("convac", 1)}
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5,
             "window": 3}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"]) for h in ph} == {
            ("convaa", 1), ("convac", 3)}
        # SpanFirstQuery per query: 'merge' before position 2 — convac has
        # 2 qualifying occurrences (pos 0, 1), first_pos 0
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge", "limit": 5,
             "span_first": 2}]})["hits"]
        convac_hit = [h for h in ph if h["conv_id"] == "convac"]
        assert convac_hit and convac_hit[0]["phrase_tf"] == 2
        assert convac_hit[0]["first_pos"] == 0
        # match_phrase_prefix per query: leading run + prefix slot
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge wind*", "limit": 5,
             "prefix_last": True}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"]) for h in ph} == {("convac", 1)}
        # degenerate single-prefix form: tf = total occurrences of me*
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "me*", "limit": 5,
             "prefix_last": True}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"]) for h in ph} == {
            ("convaa", 1), ("convac", 3)}
        # SpanOrQuery per query: union of '|'-separated clauses — convaa
        # matches "stream window" (pos 2), convac "merge window" (pos 2)
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window | stream window",
             "limit": 5, "span_or": True}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"], h["first_pos"]) for h in ph} \
            == {("convaa", 1, 2), ("convac", 1, 2)}
        # SpanNotQuery per query: "stream window" spans containing a
        # 'stream' occurrence are killed (self-overlap), so convaa drops
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "stream window", "limit": 5,
             "not_phrase": "stream"}]})["hits"]
        assert ph == []
        # ... while an exclude phrase outside the span is a no-op
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5,
             "not_phrase": "the"}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"]) for h in ph} == {("convac", 1)}
        # SpanWithinQuery per query: 'window' occurrences enclosed by a
        # "stream window" span — only convaa's (pos 3); convac's window is
        # not preceded by 'stream'
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "window", "limit": 5,
             "within_phrase": "stream window"}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"], h["first_pos"]) for h in ph} \
            == {("convaa", 1, 3)}
        # SpanContainingQuery per query: (merge, window) pairs within 3
        # tokens whose envelope holds a 'the' — convaa's [0, 3] only
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5,
             "window": 3, "contains_phrase": "the"}]})["hits"]
        assert {(h["conv_id"], h["phrase_tf"], h["first_pos"]) for h in ph} \
            == {("convaa", 1, 0)}

        _post(srv.url + "/delete", {"conv_ids": ["convac"]})
        hits = _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert "convac" not in {h["conv_id"] for h in hits}
        assert "convaa" in {h["conv_id"] for h in hits}  # survivors intact
        ph = _post(srv.url + "/phrase", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert ph == []  # tombstoned conv filtered from phrase results too

        health = json.loads(urllib.request.urlopen(srv.url + "/health").read())
        assert health["n_segments"] == 2

        # boolean query modes against the segmented index over HTTP
        # (retriever.md:180-225: every mode works against shards). convac is
        # tombstoned at this point, so only convaa matches "merge window" AND
        hits = _post(srv.url + "/search", {"mode": "conjunctive", "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert {h["conv_id"] for h in hits} == {"convaa"}
        # prefix: "ind*" matches only convab ("index")
        hits = _post(srv.url + "/search", {"mode": "prefix", "queries": [
            {"query_id": 0, "text": "ind", "limit": 5}]})["hits"]
        assert {h["conv_id"] for h in hits} == {"convab"}
        # fuzzy: "windoz" ~1~ "window"
        hits = _post(srv.url + "/search", {"mode": "fuzzy", "fuzzy_dist": 2,
                                           "queries": [
            {"query_id": 0, "text": "windoz", "limit": 5}]})["hits"]
        assert "convaa" in {h["conv_id"] for h in hits}
        # NOT composes with the mode: AND-NOT excludes convaa via "stream"
        hits = _post(srv.url + "/search", {"mode": "conjunctive", "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5,
             "exclude": "stream"}]})["hits"]
        assert hits == []
        # boosted: caret weights accepted, OR-like recall (convaa matches)
        hits = _post(srv.url + "/search", {"mode": "boosted", "queries": [
            {"query_id": 0, "text": "merge^2 window", "limit": 5}]})["hits"]
        assert "convaa" in {h["conv_id"] for h in hits}
        # msm: "merge window nosuch" with floor 2 still matches convaa
        # (2 of 3 terms); floor 3 cannot be met (nosuch is OOV) -> empty
        hits = _post(srv.url + "/search", {"mode": "msm", "min_match": 2,
                                           "queries": [
            {"query_id": 0, "text": "merge window nosuch", "limit": 5}]})["hits"]
        assert {h["conv_id"] for h in hits} == {"convaa"}
        hits = _post(srv.url + "/search", {"mode": "msm", "min_match": 3,
                                           "queries": [
            {"query_id": 0, "text": "merge window nosuch", "limit": 5}]})["hits"]
        assert hits == []
        # collapse: one best turn per conversation
        hits = _post(srv.url + "/search", {"mode": "collapse", "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        convs = [h["conv_id"] for h in hits]
        assert len(convs) == len(set(convs)) > 0
        # bm25plus: per-REQUEST delta (round-3 handoff item) — every matched
        # doc gains at least idf*delta, so scores strictly exceed plain BM25
        plain = _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        plus = _post(srv.url + "/search", {"mode": "bm25plus", "delta": 1.0,
                                           "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        p0 = {h["conv_id"]: h["score"] for h in plain}
        p1 = {h["conv_id"]: h["score"] for h in plus}
        shared = set(p0) & set(p1)
        assert shared and all(p1[c] > p0[c] for c in shared)
        # boosting: soft NOT — convaa (contains "stream") keeps its slot but
        # its score is demoted to exactly 0.5x the plain OR score
        boo = _post(srv.url + "/search", {"mode": "boosting",
                                          "negative_boost": 0.5, "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5,
             "negative": "stream"}]})["hits"]
        b0 = {h["conv_id"]: h["score"] for h in boo}
        assert "convaa" in b0 and b0["convaa"] == p0["convaa"] * 0.5
        # term_range: [lo TO hi] expands over the dictionary
        hits = _post(srv.url + "/search", {"mode": "term_range", "queries": [
            {"query_id": 0, "text": "[merge TO window]", "limit": 5}]})["hits"]
        assert len(hits) > 0
        # similarity: per-request tfidf module (shard-safe: df/N only);
        # classic tf-idf ranks by sqrt(tf)*idf^2/sqrt(dl), so scores differ
        # from BM25 but the match set is the same query's
        tfidf = _post(srv.url + "/search", {"mode": "similarity",
                                            "similarity": "tfidf", "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert len(tfidf) > 0
        t0 = {h["conv_id"]: h["score"] for h in tfidf}
        shared_t = set(p0) & set(t0)
        assert shared_t and any(t0[c] != p0[c] for c in shared_t)
        # common_terms with an impossible cutoff (all terms high) degrades
        # to plain OR: scores identical to the default-mode hits
        ct = _post(srv.url + "/search", {"mode": "common_terms",
                                         "cutoff_frequency": 1e-9, "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert {h["conv_id"]: h["score"] for h in ct} == p0
        # bool: should-only (ES default msm=1) == plain OR
        bq = _post(srv.url + "/search", {"mode": "bool", "queries": [
            {"query_id": 0, "text": "", "should": "merge window",
             "limit": 5}]})["hits"]
        assert {h["conv_id"]: h["score"] for h in bq} == p0
        # bm25_tuned: default constants through the tuned pool == plain OR
        tq = _post(srv.url + "/search", {"mode": "bm25_tuned", "k1": 1.2,
                                         "b": 0.75, "queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert {h["conv_id"]: h["score"] for h in tq} == p0
        # unknown mode -> 400
        with pytest.raises(urllib.error.HTTPError) as em:
            _post(srv.url + "/search", {"mode": "nope", "queries": [
                {"query_id": 0, "text": "merge"}]})
        assert em.value.code == 400

        # physical purge: convac's segment had only convac -> segment removed;
        # deleted doc stays gone and survivors keep ranking
        out = _post(srv.url + "/compact", {})
        assert out["n_tombstones_purged"] == 1
        assert out["n_segments_removed"] == 1
        hits = _post(srv.url + "/search", {"queries": [
            {"query_id": 0, "text": "merge window", "limit": 5}]})["hits"]
        assert "convac" not in {h["conv_id"] for h in hits}
        assert [h["conv_id"] for h in hits][:1] == ["convaa"]
        health = json.loads(urllib.request.urlopen(srv.url + "/health").read())
        assert health["n_segments"] == 1

        # lifecycle metrics: write/read counters and segment gauges track
        # the traffic this test just generated
        m = _scrape(srv.url)
        assert m["cas_index_requests_total"] == 2
        assert m["cas_indexed_turns_total"] == 3
        assert m["cas_delete_requests_total"] == 1
        assert m["cas_search_requests_total"] >= 5
        assert m["cas_phrase_requests_total"] >= 3
        assert m["cas_segments"] == 1
        assert m["cas_tombstoned_docs"] == 0  # compacted away
        # mode pools were spawned by the boolean queries above, then torn
        # down by the /compact refresh (they re-spawn lazily on demand)
        assert m["cas_mode_pools"] == 0
        assert m["cas_error_responses_total"] == 1  # the unknown-mode 400
    finally:
        srv.shutdown()


def test_auth_pass_through(server, tmp_path):
    """Authorization pass-through (client.py:26-64,208): a server started
    with auth_token rejects unauthenticated/mistokened requests with 401,
    accepts the credential header (raw and Bearer forms) and the
    CLIP_AUTH_TOKEN env fallback, and keeps /health open for liveness."""
    import os

    from clip_as_service_ray.pipelines.http_api import SearchHTTPClient

    srv, corpus = server
    auth_srv = SearchHTTPServer(srv.service.index_dir, CFG, auth_token="s3cr3t")
    try:
        # /health unauthenticated
        with urllib.request.urlopen(auth_srv.url + "/health", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"
        # unauthenticated search -> 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(auth_srv.url + "/search",
                  {"queries": [{"query_id": 0, "text": "index", "limit": 3}]})
        assert ei.value.code == 401
        # wrong token -> 401 (client surfaces PermissionError)
        bad = SearchHTTPClient(auth_srv.url, credential={"Authorization": "nope"})
        with pytest.raises(PermissionError):
            bad.search([{"query_id": 0, "text": "index", "limit": 3}])
        # right token -> same hits as the unauthenticated server
        good = SearchHTTPClient(auth_srv.url, credential={"Authorization": "s3cr3t"})
        hits = good.search([{"query_id": 0, "text": "index", "limit": 3}])
        ref = _post(srv.url + "/search",
                    {"queries": [{"query_id": 0, "text": "index", "limit": 3}]})["hits"]
        assert hits == ref and len(hits) == 3
        # Bearer form
        req = urllib.request.Request(
            auth_srv.url + "/search",
            data=json.dumps({"queries": [{"query_id": 0, "text": "index", "limit": 1}]}).encode(),
            headers={"Content-Type": "application/json", "Authorization": "Bearer s3cr3t"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert len(json.loads(r.read())["hits"]) == 1
        # env fallback (client.py:64-65)
        os.environ["CLIP_AUTH_TOKEN"] = "s3cr3t"
        try:
            envc = SearchHTTPClient(auth_srv.url)
            assert envc.search([{"query_id": 0, "text": "index", "limit": 2}]) == ref[:2]
        finally:
            del os.environ["CLIP_AUTH_TOKEN"]
        # auth failures show up on the (authenticated) metrics scrape
        m = good.metrics()
        assert "cas_auth_failures_total" in m
    finally:
        auth_srv.shutdown()


def test_tls_serving(server, tmp_path):
    """https:// scheme (client.py:36-62: grpcs/https/wss set tls=True): the
    server wraps its socket in TLS from a provided cert/key; the client
    trusts the CA file and the auth header still rides the TLS channel."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    from clip_as_service_ray.pipelines.http_api import SearchHTTPClient

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
            x509.SubjectAlternativeName([x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]),
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

    srv, _corpus = server
    tls_srv = SearchHTTPServer(
        srv.service.index_dir, CFG, auth_token="tls-tok",
        certfile=certfile, keyfile=keyfile,
    )
    try:
        assert tls_srv.url.startswith("https://")
        cli = SearchHTTPClient(
            tls_srv.url, credential={"Authorization": "tls-tok"}, cafile=certfile
        )
        assert cli.health()["status"] == "ok"
        hits = cli.search([{"query_id": 0, "text": "index", "limit": 3}])
        assert len(hits) == 3
        with pytest.raises(PermissionError):
            SearchHTTPClient(tls_srv.url, cafile=certfile).search(
                [{"query_id": 0, "text": "index", "limit": 1}]
            )
    finally:
        tls_srv.shutdown()


def test_update_and_status_over_http(ray_session, tmp_path):
    """/update re-indexes a conversation (segment-scoped delete + add: new
    text searchable on return, old text never surfaces) and /status reports
    the segment inventory + delete state — the reference's /update + /status
    ops (retriever.md:203-225) on the segmented engine."""
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

    cfg = EngineConfig(num_index_partitions=2, doc_bucket_size=256,
                       postings_block_size=64, query_concurrency=1)
    srv = SegmentedSearchHTTPServer(str(tmp_path / "updhttp"), cfg, positions=False)
    try:
        def turn(conv, text):
            return {"conv_id": conv, "turn_idx": 0, "role": "user", "text": text}

        _post(srv.url + "/index", {"turns": [turn("u1", "alpha beta gamma"),
                                             turn("u2", "alpha zulu")]})
        rep = _post(srv.url + "/update",
                    {"turns": [turn("u1", "alpha beta delta updated")]})
        assert rep["n_updated_convs"] == 1 and rep["n_segments"] == 2
        hits = _post(srv.url + "/search",
                     {"queries": [{"query_id": 0, "text": "delta", "limit": 5},
                                  {"query_id": 1, "text": "gamma", "limit": 5}]})["hits"]
        got = {(h["query_id"], h["conv_id"]) for h in hits}
        assert (0, "u1") in got and (1, "u1") not in got
        with urllib.request.urlopen(srv.url + "/status", timeout=30) as r:
            st = json.loads(r.read())
        assert st["n_segments"] == 2 and len(st["segments"]) == 2
        assert st["tombstoned_convs"] == 1 and st["tombstoned_docs"] == 1
        assert st["n_docs"] == 3  # Lucene model: old doc counts until compaction
    finally:
        srv.shutdown()


def test_rank_endpoint_set_rank_contract(server):
    """/rank (the reference's set_rank, helper.py:89-124): scores EXACTLY
    the provided candidates against the query text — every candidate comes
    back ranked (score DESC, doc ASC), scores are bit-identical to the
    retrieval path's for the same docs, and non-matching candidates rank
    last with score 0 instead of disappearing."""
    from clip_as_service_ray.pipelines.http_api import SearchHTTPClient

    srv, corpus = server
    # candidates: the /search top-3 for a query, one other doc, in shuffled order
    top = _post(srv.url + "/search",
                {"queries": [{"query_id": 0, "text": "query data", "limit": 3}]})["hits"]
    assert len(top) == 3
    other = {"conv_id": corpus.column("conv_id")[0].as_py(), "turn_idx": 0}
    cands = [
        {"conv_id": top[2]["conv_id"], "turn_idx": top[2]["turn_idx"]},
        other,
        {"conv_id": top[0]["conv_id"], "turn_idx": top[0]["turn_idx"]},
        {"conv_id": top[1]["conv_id"], "turn_idx": top[1]["turn_idx"]},
    ]
    cli = SearchHTTPClient(srv.url)
    ranked = cli.rank([{"query_id": 0, "text": "query data", "candidates": cands}])
    assert len(ranked) == 4  # every candidate ranked, none dropped
    # the three retrieval hits keep their relative order and exact scores
    assert [(r["conv_id"], r["turn_idx"]) for r in ranked[:3]] == \
        [(t["conv_id"], t["turn_idx"]) for t in top]
    assert [r["score"] for r in ranked[:3]] == [t["score"] for t in top]
    assert [r["rank"] for r in ranked] == [0, 1, 2, 3]


def test_encode_endpoint_sparse_bm25_vectors(server):
    """/encode (the reference's core op re-expressed for a term engine):
    each text encodes to its sparse BM25 vector {term: idf*tf_norm} under
    the index's global stats. The single-term weight must equal the
    retrieval score contribution of that term for an identical-length doc,
    OOV terms drop out, and empty text encodes to the empty vector."""
    import pyarrow as pa

    from clip_as_service_ray.pipelines.http_api import SearchHTTPClient

    srv, corpus = server
    cli = SearchHTTPClient(srv.url)
    vecs = cli.encode([
        {"query_id": 0, "text": "index merge index"},
        {"query_id": 1, "text": "zzznotinvocab"},
        {"query_id": 2, "text": ""},
    ])
    v0 = vecs[0]["vector"]
    assert set(v0) == {"index", "merge"}
    assert v0["index"] > v0["merge"] > 0  # tf 2 vs 1, same dl
    assert vecs[1]["vector"] == {} and vecs[2]["vector"] == {}
    # exact value: idf(df) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    # engine-side encode must match the HTTP JSON exactly
    flat = srv.service.encode(
        pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array(["index merge index"], pa.string())})
    ).to_pydict()
    got = dict(zip(flat["term"], flat["weight"]))
    assert got == v0  # HTTP json == engine table exactly (float64 roundtrip)


def _expected_assist(dict_path, q, max_dist=2, k=5, prefix=False):
    """Brute-force expected suggest/complete ranking from a dictionary
    parquet: (dist ASC,) df DESC, term ASC."""
    from clip_as_service_ray.stages.dedup import _levenshtein_capped

    t = pq.read_table(dict_path)
    rows = []
    for term, df in zip(t.column("term").to_pylist(), t.column("df").to_pylist()):
        if prefix:
            if term.startswith(q):
                rows.append((-int(df), term))
        else:
            d = _levenshtein_capped(q, term, max_dist)
            if d <= max_dist:
                rows.append((d, -int(df), term))
    rows.sort()
    if prefix:
        return [{"term": t, "df": -negdf} for negdf, t in rows[:k]]
    return [{"term": t, "dist": d, "df": -negdf} for d, negdf, t in rows[:k]]


def test_suggest_and_complete_over_http(server):
    import os

    srv, _ = server
    dict_path = os.path.join(srv.service.index_dir, "dictionary")
    # pick a real corpus term and misspell it
    t = pq.read_table(dict_path).sort_by([("df", "descending"), ("term", "ascending")])
    word = next(w for w in t.column("term").to_pylist() if len(w) >= 5)
    typo = word[:-1] + ("x" if word[-1] != "x" else "y")
    out = _post(srv.url + "/suggest", {"queries": [{"query_id": 0, "text": typo}]})
    got = out["suggestions"][0]["terms"]
    assert got == _expected_assist(dict_path, typo)
    assert got and got[0]["term"] == word  # the source word must rank first

    pre = word[:2]
    out = _post(srv.url + "/complete", {"queries": [{"query_id": 0, "text": pre},
                                                    {"query_id": 1, "text": "zzzz"}]})
    assert out["suggestions"][0]["terms"] == _expected_assist(
        dict_path, pre, prefix=True
    )
    assert out["suggestions"][1]["terms"] == []  # no completions, stable shape

    # k caps the list
    out = _post(srv.url + "/complete", {"k": 1, "queries": [{"query_id": 0, "text": pre}]})
    assert len(out["suggestions"][0]["terms"]) == 1


def test_segmented_suggest_merges_union_df(ray_session, tmp_path):
    """Scatter suggest/complete over two segments == brute force over the
    UNION dictionary (df deduped, not summed; global re-rank)."""
    import os

    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer

    root = str(tmp_path / "segsug")
    srv = SegmentedSearchHTTPServer(root, CFG)
    try:
        def turns(conv, text):
            return {"conv_id": conv, "turn_idx": 0, "role": "user", "text": text}

        _post(srv.url + "/index", {"turns": [
            turns("ca", "panda panda bamboo"), turns("cb", "panda river")]})
        _post(srv.url + "/index", {"turns": [
            turns("cc", "pander bamboo bamboo"), turns("cd", "pans of steel")]})
        union = os.path.join(root, "union_dictionary", "dictionary.parquet")
        out = _post(srv.url + "/suggest", {"queries": [{"query_id": 5, "text": "pnda"}]})
        got = out["suggestions"][0]["terms"]
        assert got == _expected_assist(union, "pnda")
        assert got[0]["term"] == "panda" and got[0]["df"] == 2  # union df: 2 docs
        out = _post(srv.url + "/complete", {"queries": [{"query_id": 1, "text": "pan"}]})
        assert out["suggestions"][0]["terms"] == _expected_assist(
            union, "pan", prefix=True
        )
        # terms split across segments appear once with the union df
        terms = {r["term"]: r["df"] for r in out["suggestions"][0]["terms"]}
        assert terms["panda"] == 2 and terms["pander"] == 1 and terms["pans"] == 1
    finally:
        srv.shutdown()


def test_server_level_synonyms(server, tmp_path):
    """A server constructed with a synonyms map answers exactly like the
    plain server asked for the manually expanded query."""
    from clip_as_service_ray.functions.tokenizer import tokenize

    srv, corpus = server
    # pick two vocabulary terms from the corpus
    toks = []
    for t in corpus.column("text").to_pylist()[:20]:
        for tok in tokenize(t):
            if tok.isalpha() and tok not in toks:
                toks.append(tok)
        if len(toks) >= 2:
            break
    a, b = toks[0], toks[1]
    syn_srv = SearchHTTPServer(
        srv.service.index_dir, CFG, synonyms={a: [b]}
    )
    try:
        got = _post(syn_srv.url + "/search",
                    {"queries": [{"query_id": 0, "text": a, "limit": 15}]})
        want = _post(srv.url + "/search",
                     {"queries": [{"query_id": 0, "text": f"{a} {b}", "limit": 15}]})
        assert got["hits"] == want["hits"] and len(got["hits"]) > 0
    finally:
        syn_srv.shutdown()


def test_per_request_synonyms(server):
    """A per-request synonyms map on the SAME plain server answers exactly
    like the manually expanded query (score-identical server-side text
    rewrite — no per-map pool), and errors under a non-OR mode."""
    from clip_as_service_ray.functions.tokenizer import tokenize

    srv, corpus = server
    toks = []
    for t in corpus.column("text").to_pylist()[:20]:
        for tok in tokenize(t):
            if tok.isalpha() and tok not in toks:
                toks.append(tok)
        if len(toks) >= 2:
            break
    a, b = toks[0], toks[1]
    got = _post(srv.url + "/search",
                {"queries": [{"query_id": 0, "text": a, "limit": 15}],
                 "synonyms": {a: [b]}})
    want = _post(srv.url + "/search",
                 {"queries": [{"query_id": 0, "text": f"{a} {b}", "limit": 15}]})
    assert got["hits"] == want["hits"] and len(got["hits"]) > 0
    # a non-matching key leaves the query untouched
    same = _post(srv.url + "/search",
                 {"queries": [{"query_id": 0, "text": a, "limit": 15}],
                  "synonyms": {"zzzunseen": [b]}})
    plain = _post(srv.url + "/search",
                  {"queries": [{"query_id": 0, "text": a, "limit": 15}]})
    assert same["hits"] == plain["hits"]
    # columnar form takes the same expansion
    gotc = _post(srv.url + "/search",
                 {"columns": {"query_id": [0], "text": [a], "limit": [15]},
                  "synonyms": {a: [b]}})
    assert gotc["hits"] == want["hits"]
    # synonyms + a non-OR mode is a 400 (the scorer rejects the combination)
    with pytest.raises(urllib.error.HTTPError):
        _post(srv.url + "/search",
              {"queries": [{"query_id": 0, "text": a, "limit": 15}],
               "synonyms": {a: [b]}, "mode": "conjunctive"})


def test_explain_over_http(server):
    srv, _ = server
    hits = _post(srv.url + "/search",
                 {"queries": [{"query_id": 0, "text": "merge window", "limit": 1}]})["hits"]
    if not hits:
        pytest.skip("no hits for the probe query in this corpus")
    h = hits[0]
    out = _post(srv.url + "/explain",
                {"text": "merge window", "conv_id": h["conv_id"],
                 "turn_idx": h["turn_idx"]})
    assert out["score"] == h["score"]
    assert sum(p["score"] for p in out["terms"]) == out["score"]
    # unknown doc -> 404
    req = urllib.request.Request(
        srv.url + "/explain",
        data=json.dumps({"text": "x", "conv_id": "nope", "turn_idx": 0}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404


def test_columnar_request_form(server):
    """The columnar JSON request body produces identical hits to the row
    form (zero per-row Python on the request path)."""
    srv, _ = server
    row = _post(srv.url + "/search",
                {"queries": [{"query_id": 0, "text": "merge window", "limit": 5},
                             {"query_id": 1, "text": "scan", "limit": 3}]})
    col = _post(srv.url + "/search",
                {"columns": {"query_id": [0, 1],
                             "text": ["merge window", "scan"],
                             "limit": [5, 3]}})
    assert col["hits"] == row["hits"]


def test_terms_set_mode_over_http(ray_session, tmp_path):
    """ES terms_set through the segmented front door: per-doc
    minimum_should_match floors from a doc-values field present in every
    segment; the ("terms_set", field) lazy mode pool serves it."""
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.http_api import SegmentedSearchHTTPServer
    from clip_as_service_ray.pipelines.segments import segment_dirs

    cfg = EngineConfig(num_index_partitions=2, doc_bucket_size=256,
                       postings_block_size=64, query_concurrency=1)
    root = str(tmp_path / "tshttp")
    srv = SegmentedSearchHTTPServer(root, cfg)
    try:
        _post(srv.url + "/index", {"turns": [
            {"conv_id": "convaa", "turn_idx": 0, "role": "user",
             "text": "merge the stream window"},
            {"conv_id": "convab", "turn_idx": 0, "role": "user",
             "text": "merge scan plan"},
            {"conv_id": "convac", "turn_idx": 0, "role": "user",
             "text": "window scan"},
        ]})
        # floors: convaa needs 1 match, convab 3 (matches only 2 -> out),
        # convac 2
        for d in segment_dirs(root):
            src = pa.table({
                "conv_id": pa.array(["convaa", "convab", "convac"]),
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "req": pa.array([1.0, 3.0, 2.0], pa.float64()),
            })
            build_doc_values(src, d, "req", cfg)
        hits = _post(srv.url + "/search", {
            "mode": "terms_set", "field": "req",
            "queries": [{"query_id": 0, "text": "merge window scan",
                         "limit": 5}]})["hits"]
        assert {h["conv_id"] for h in hits} == {"convaa", "convac"}
    finally:
        srv.shutdown()


def test_analyze_endpoint(server):
    """ES _analyze analog: index-analyzer fold by default, per-request
    analyzer override, surviving-stream positions (no stopword gaps)."""
    srv, _ = server
    out = _post(srv.url + "/analyze", {"text": "The Merge-Window's test"})
    assert out["analyzer"] == "standard"
    assert [t["token"] for t in out["tokens"]] == [
        "the", "merge", "-", "window", "'s", "test"]
    assert [t["position"] for t in out["tokens"]] == [0, 1, 2, 3, 4, 5]
    # per-request analyzer override: stop drops 'the', stem folds suffixes,
    # positions renumber the SURVIVORS (the positional-index numbering)
    out = _post(srv.url + "/analyze",
                {"text": "the merging windows", "analyzer": "stop+stem"})
    assert out["analyzer"] == "stop+stem"
    assert [(t["token"], t["position"]) for t in out["tokens"]] == [
        ("merg", 0), ("window", 1)]

"""Incremental segments: add -> search-immediately, union-stats equivalence,
and physical merge — all rank-identical to a from-scratch rebuild (the
reference's index-then-search behavior, tests/test_search.py:34-44)."""

import os

import numpy as np
import pyarrow.compute as pc
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.pipelines.segments import (
    SegmentedQueryService,
    add_segment,
    merge_segments,
    segment_dirs,
)
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512, postings_block_size=64)


@pytest.fixture(scope="module")
def corpus_halves(ray_session):
    corpus = synthesize_transcripts(3000, seed=42)
    convs = sorted(set(corpus.column("conv_id").to_pylist()))
    pivot = convs[len(convs) // 2]
    import pyarrow as pa

    a = corpus.filter(pc.less(corpus.column("conv_id"), pa.scalar(pivot)))
    b = corpus.filter(pc.greater_equal(corpus.column("conv_id"), pa.scalar(pivot)))
    assert a.num_rows + b.num_rows == corpus.num_rows
    return corpus, a, b


def _ids(df):
    return list(zip(df.query_id, df["rank"], df.conv_id, df.turn_idx))


def test_incremental_add_then_search(corpus_halves, tmp_path):
    corpus, a, b = corpus_halves
    root = str(tmp_path / "segroot")
    queries = reference_query_table()

    # first segment alone == oracle over just that slice
    add_segment(root, a, CFG)
    svc = SegmentedQueryService(root, CFG)
    try:
        got_a = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    want_a = OracleIndex(a).search(queries).to_pandas()
    assert _ids(got_a) == _ids(want_a)

    # add the second segment: new docs visible immediately, and the union
    # (global idf/avgdl) matches a from-scratch oracle over the whole corpus
    add_segment(root, b, CFG)
    assert len(segment_dirs(root)) == 2
    svc = SegmentedQueryService(root, CFG)
    try:
        got = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    want = OracleIndex(corpus).search(queries).to_pandas()
    assert _ids(got) == _ids(want)
    np.testing.assert_allclose(
        got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9
    )


def test_merge_segments_equals_rebuild(corpus_halves, tmp_path):
    corpus, a, b = corpus_halves
    root = str(tmp_path / "segroot2")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    merged = str(tmp_path / "merged")
    report = merge_segments(root, merged, CFG)

    rebuilt = str(tmp_path / "rebuilt")
    report2 = build_index(corpus, rebuilt, CFG, overwrite=True)
    assert report["n_docs"] == report2["n_docs"]
    assert report["n_postings"] == report2["n_postings"]
    assert report["n_terms"] == report2["n_terms"]

    queries = reference_query_table()
    got = search_table(merged, queries, CFG).to_pandas()
    want = search_table(rebuilt, queries, CFG).to_pandas()
    assert _ids(got) == _ids(want)
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())


def test_merge_rejects_overlapping_convs(corpus_halves, tmp_path):
    corpus, a, b = corpus_halves
    root = str(tmp_path / "segroot3")
    add_segment(root, a, CFG)
    add_segment(root, a, CFG)  # same convs again
    with pytest.raises(ValueError, match="overlap"):
        merge_segments(root, str(tmp_path / "m3"), CFG)


def test_tombstone_delete(corpus_halves, tmp_path):
    from clip_as_service_ray.pipelines.segments import delete_convs

    corpus, a, b = corpus_halves
    root = str(tmp_path / "segdel")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    q = reference_query_table()

    svc = SegmentedQueryService(root, CFG)
    try:
        before = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    assert len(before) > 0
    # tombstone every conv that appears in the top results of query 0
    dead = sorted(set(before[before.query_id == before.query_id.iloc[0]].conv_id))[:2]
    r = delete_convs(root, dead)
    assert r["n_tombstones"] == 2

    svc = SegmentedQueryService(root, CFG)
    try:
        after = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    # deleted convs never appear
    assert not set(after.conv_id) & set(dead)
    # limit-k preserved: every query still returns as many hits as it has
    # survivors (same count as `before` minus dead rows, floored by limit)
    for qid, g in before.groupby("query_id"):
        want = g[~g.conv_id.isin(dead)]
        got = after[after.query_id == qid]
        assert len(got) >= len(want)  # over-ask refills ranks beyond the cut
        # surviving prefix is rank-identical (scores unchanged by design)
        head = got.head(len(want))
        assert list(head.conv_id)[: len(want)] == list(want.conv_id)[: len(head)]
    # physical merge with live tombstones is refused
    with pytest.raises(ValueError, match="tombstone"):
        merge_segments(root, str(tmp_path / "m"), CFG)


def test_segmented_modes_equal_monolithic(corpus_halves, tmp_path):
    """Boolean/prefix/fuzzy query modes against the SEGMENTED index are
    bit-identical to the same mode against one monolithic index over the
    union corpus (the reference serves every query mode against shards,
    retriever.md:180-225). Also: exclude composes with the mode through the
    scatter path."""
    import pyarrow as pa

    from clip_as_service_ray.stages.query import QueryScorer

    corpus, a, b = corpus_halves
    root = str(tmp_path / "segmodes")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    mono = str(tmp_path / "mono")
    build_index(corpus, mono, CFG)

    cases = [
        ({"conjunctive": True}, ["merge window", "data stream merge"], ""),
        ({"prefix": True}, ["mer", "wind"], ""),
        ({"fuzzy": 1}, ["merge", "windoz"], ""),
        ({"conjunctive": True}, ["merge window"], "stream"),  # AND-NOT
        ({"boosted": True}, ["merge^2 window", "merge window^0.5"], ""),
        ({"min_match": 2}, ["merge window stream"], ""),
        ({"boosted": True}, ["merge^3"], "stream"),  # boost-NOT
        ({"collapse": True}, ["merge window"], ""),  # best turn per conv
        ({"suffix": True}, ["ge", "dow"], ""),  # leading wildcard *suffix
        ({"regex": True}, ["m.rge", "w.*w"], ""),  # regexp term query
        ({"term_range": True}, ["[merge TO part]", "{data TO merge}"], ""),
        ({"term_range": True}, ["[m TO *]"], "stream"),  # range-NOT
        ({"block_join": "sum"}, ["merge window"], ""),  # has_child sum
        ({"block_join": "avg"}, ["merge window"], "stream"),  # avg-NOT
        # round-3 seventh-session modes: union df keeps every split/score
        # shard-identical
        ({"common_terms": 0.5}, ["merge the window"], ""),
        ({"bool_query": True}, ["merge"], ""),  # must-only
        ({"similarity": "tfidf"}, ["merge window"], ""),  # df/N-only kernel
        ({"similarity": "boolean"}, ["merge window"], ""),
        ({"k1": 0.9, "b": 0.4}, ["merge window"], ""),  # tuned constants
        # round-4 modes
        ({"bool_prefix": True}, ["merge win", "data str"], ""),
        ({"block_join": "parent"}, ["merge window"], ""),  # has_parent
        ({"block_join": "parent"}, ["merge window"], "stream"),
    ]
    for kwargs, texts, excl in cases:
        q = {
            "query_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "limit": pa.array([25] * len(texts), pa.int32()),
        }
        if excl:
            q["exclude"] = pa.array([excl] * len(texts), pa.string())
        if kwargs.get("bool_query"):
            q["should"] = pa.array(["window stream"] * len(texts), pa.string())
        qt = pa.table(q)
        svc = SegmentedQueryService(root, CFG, **kwargs)
        try:
            got = svc.search(qt).to_pandas()
        finally:
            svc.shutdown()
        scorer = QueryScorer(mono, CFG.limit, False, **kwargs)
        want = (
            scorer(qt)
            .to_pandas()
            .sort_values(["query_id", "rank"], kind="stable")
            .reset_index(drop=True)
        )
        assert _ids(got) == _ids(want), (kwargs, excl)
        np.testing.assert_array_equal(
            got.score.to_numpy(), want.score.to_numpy()
        )


def test_tombstone_overask_counts_docs_not_convs(ray_session, tmp_path):
    """Round-2 ADVICE (high): over-asking by the tombstoned CONVERSATION
    count is wrong — one deleted multi-turn conversation can occupy many hit
    slots. One tombstoned 12-turn conv that out-ranks everything + limit=5
    must still return 5 live hits (8 live matching docs exist)."""
    import pandas as pd
    import pyarrow as pa

    from clip_as_service_ray.pipelines.segments import delete_convs

    # hot conv: 12 turns, each repeating the query term many times (top BM25
    # tf) — out-ranks every live doc. 8 live single-turn convs also match.
    rows = []
    for t in range(12):
        rows.append(("convhot", t, "user", "zebraword " * (6 + t), "", 0))
    for i in range(8):
        rows.append((f"convlive{i:02d}", 0, "user", "zebraword plain filler", "", 0))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    corpus = pa.table(
        {
            "conv_id": pa.array(df.conv_id, pa.string()),
            "turn_idx": pa.array(df.turn_idx, pa.int32()),
            "role": pa.array(df.role, pa.string()),
            "text": pa.array(df.text, pa.string()),
            "tool": pa.array(df.tool, pa.string()),
            "ts": pa.array(df.ts.astype("int64"), pa.timestamp("us")),
        }
    )
    root = str(tmp_path / "overask")
    add_segment(root, corpus, CFG)
    delete_convs(root, ["convhot"])

    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array(["zebraword"], pa.string()),
            "limit": pa.array([5], pa.int32()),
        }
    )
    svc = SegmentedQueryService(root, CFG)
    try:
        assert svc.n_tombstoned_docs == 12  # docs, not 1 conversation
        hits = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    assert len(hits) == 5, f"limit-k must survive the tombstone filter, got {len(hits)}"
    assert "convhot" not in set(hits.conv_id)


def test_compact_segments_equals_rebuild_over_survivors(corpus_halves, tmp_path):
    """Physical purge: delete convs from BOTH segments, compact, and the
    root must behave exactly like a segmented build over the survivors —
    stats, ranks, and scores (avgdl/df/n_docs all post-purge)."""
    from clip_as_service_ray.pipelines.segments import (
        compact_segments,
        delete_convs,
        load_tombstones,
    )

    corpus, a, b = corpus_halves
    root = str(tmp_path / "segcmp")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    q = reference_query_table()

    dead = sorted(set(a.column("conv_id").to_pylist()))[:2] + sorted(
        set(b.column("conv_id").to_pylist())
    )[:2]
    delete_convs(root, dead)
    rep = compact_segments(root, CFG)
    assert rep["compaction"]["n_segments_compacted"] == 2
    assert rep["compaction"]["n_tombstones_purged"] == 4
    assert not load_tombstones(root)

    import pyarrow as pa

    dead_set = pa.array(dead)
    surv = corpus.filter(pc.invert(pc.is_in(corpus.column("conv_id"), value_set=dead_set)))

    svc = SegmentedQueryService(root, CFG)
    try:
        got = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    want = OracleIndex(surv).search(q).to_pandas()
    assert _ids(got) == _ids(want)
    np.testing.assert_allclose(
        got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9
    )

    # post-purge stats equal a fresh build's stats
    rebuilt = str(tmp_path / "cmp_rebuilt")
    rep2 = build_index(surv, rebuilt, CFG, overwrite=True)
    assert rep["n_docs"] == rep2["n_docs"]

    # merge is legal again after the purge, and still equals the rebuild
    merged = str(tmp_path / "cmp_merged")
    merge_segments(root, merged, CFG)
    got_m = search_table(merged, q, CFG).to_pandas()
    want_m = search_table(rebuilt, q, CFG).to_pandas()
    assert _ids(got_m) == _ids(want_m)
    np.testing.assert_array_equal(got_m.score.to_numpy(), want_m.score.to_numpy())


def test_compact_removes_fully_dead_segment(corpus_halves, tmp_path):
    from clip_as_service_ray.pipelines.segments import (
        compact_segments,
        delete_convs,
    )

    corpus, a, b = corpus_halves
    root = str(tmp_path / "segrm")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    delete_convs(root, sorted(set(a.column("conv_id").to_pylist())))
    rep = compact_segments(root, CFG)
    assert rep["compaction"]["n_segments_removed"] == 1
    assert len(segment_dirs(root)) == 1

    q = reference_query_table()
    svc = SegmentedQueryService(root, CFG)
    try:
        got = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    want = OracleIndex(b).search(q).to_pandas()
    assert _ids(got) == _ids(want)
    np.testing.assert_allclose(
        got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9
    )


def test_update_convs_lifecycle(ray_session, tmp_path):
    """UPDATE = segment-scoped delete + add (the reference /update op): the
    new version is searchable on return, the old version never surfaces, a
    re-add after a plain delete is visible again (a delete only covers
    segments existing when it was issued), and compaction physically purges
    only the OLD versions then clears the tombstones."""
    import numpy as np
    import pyarrow as pa

    from clip_as_service_ray.pipelines.segments import (
        compact_segments,
        delete_convs,
        load_tombstones,
        update_convs,
    )

    cfg = EngineConfig(
        num_index_partitions=2, doc_bucket_size=256, postings_block_size=64,
        query_concurrency=1,
    )
    root = str(tmp_path / "updroot")

    def turns(conv, texts):
        return pa.table(
            {"conv_id": pa.array([conv] * len(texts)),
             "turn_idx": pa.array(range(len(texts)), pa.int32()),
             "role": pa.array(["user"] * len(texts)),
             "text": pa.array(texts),
             "tool": pa.array([""] * len(texts)),
             "ts": pa.array(np.zeros(len(texts), np.int64), pa.timestamp("us"))}
        )

    add_segment(root, turns("c1", ["alpha beta gamma"]), cfg)
    add_segment(root, turns("c2", ["alpha zulu"]), cfg)
    rep = update_convs(root, turns("c1", ["alpha beta delta updated"]), cfg)
    assert rep["n_updated_convs"] == 1 and rep["n_segments"] == 3

    q = pa.table({"query_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["delta", "gamma"]),
                  "limit": pa.array([5, 5], pa.int32())})
    svc = SegmentedQueryService(root, cfg)
    try:
        hits = list(zip(*[svc.search(q).to_pydict()[c] for c in ("query_id", "conv_id")]))
    finally:
        svc.shutdown()
    assert (0, "c1") in hits      # updated text searchable
    assert (1, "c1") not in hits  # old version never surfaces

    # compaction purges only the OLD version; the update survives
    compact_segments(root, cfg)
    assert not load_tombstones(root)
    svc = SegmentedQueryService(root, cfg)
    try:
        hits2 = list(zip(*[svc.search(q).to_pydict()[c] for c in ("query_id", "conv_id")]))
    finally:
        svc.shutdown()
    assert (0, "c1") in hits2 and (1, "c1") not in hits2

    # plain delete then RE-ADD: the re-added conversation is visible (the
    # delete is scoped to the segments that existed when it was issued)
    delete_convs(root, ["c2"])
    add_segment(root, turns("c2", ["alpha zulu reborn"]), cfg)
    svc = SegmentedQueryService(root, cfg)
    try:
        h3 = svc.search(pa.table({"query_id": pa.array([0], pa.int64()),
                                  "text": pa.array(["reborn"]),
                                  "limit": pa.array([5], pa.int32())})).to_pydict()
    finally:
        svc.shutdown()
    assert "c2" in h3["conv_id"]


def test_segmented_decay_equals_monolithic(corpus_halves, tmp_path):
    """function_score decay through the scatter path == monolithic: each
    segment carries its own doc-values artifact (built per segment dir, the
    add-doc-values-per-segment deployment), scores bit-identical."""
    import pyarrow as pa

    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.segments import segment_dirs
    from clip_as_service_ray.stages.query import QueryScorer

    corpus, a, b = corpus_halves
    root = str(tmp_path / "segdecay")
    add_segment(root, a, CFG)
    add_segment(root, b, CFG)
    mono = str(tmp_path / "monodecay")
    build_index(corpus, mono, CFG)

    def dv_table(t: pa.Table) -> pa.Table:
        # value = deterministic function of (conv, turn): both sides agree
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_numpy()
        vals = np.asarray(
            [(hash_stable(c) + int(x)) % 83 for c, x in zip(conv, turn)],
            dtype=np.float64,
        )
        return pa.table(
            {"conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx"),
             "age": pa.array(vals, pa.float64())}
        )

    import zlib

    def hash_stable(c: str) -> int:
        return zlib.crc32(c.encode())

    for d, src in zip(segment_dirs(root), (a, b)):
        build_doc_values(dv_table(src), d, "age", CFG)
    build_doc_values(dv_table(corpus), mono, "age", CFG)

    spec = {"field": "age", "origin": 30.0, "scale": 20.0, "kind": "gauss"}
    q = pa.table(
        {"query_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["merge window", "data stream"], pa.string()),
         "limit": pa.array([15, 15], pa.int32())}
    )
    svc = SegmentedQueryService(root, CFG, decay=spec)
    try:
        got = svc.search(q).to_pandas()
    finally:
        svc.shutdown()
    scorer = QueryScorer(mono, CFG.limit, False, decay=spec)
    want = (
        scorer(q).to_pandas()
        .sort_values(["query_id", "rank"], kind="stable")
        .reset_index(drop=True)
    )
    assert _ids(got) == _ids(want)
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())


def test_federated_equals_monolithic(corpus_halves, tmp_path):
    """Cross-cluster search: two independent roots (one corpus half each)
    through FederatedQueryService == one monolithic index over the union,
    bit-identical docs and scores."""
    import pyarrow.parquet as pq_

    from clip_as_service_ray.pipelines.segments import FederatedQueryService

    corpus, a, b = corpus_halves
    roots = []
    for name, half in (("rootA", a), ("rootB", b)):
        root = str(tmp_path / name)
        src = str(tmp_path / f"{name}.parquet")
        pq_.write_table(half, src)
        add_segment(root, src, CFG)
        roots.append(root)
    mono_dir = str(tmp_path / "mono")
    src_all = str(tmp_path / "all.parquet")
    pq_.write_table(corpus, src_all)
    build_index(src_all, mono_dir, CFG, overwrite=True)

    queries = reference_query_table()
    svc = FederatedQueryService(roots, CFG, federation_dir=str(tmp_path / "fed"))
    try:
        got = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    want = search_table(mono_dir, queries, CFG).to_pandas()
    assert _ids(got) == _ids(want)
    assert np.array_equal(got.score.values, want.score.values)


def test_federated_guards(corpus_halves, tmp_path):
    """Overlapping conversations and live tombstones are refused."""
    import pyarrow.parquet as pq_

    from clip_as_service_ray.pipelines.segments import (
        FederatedQueryService,
        delete_convs,
    )

    corpus, a, b = corpus_halves
    rootA = str(tmp_path / "gA")
    rootB = str(tmp_path / "gB")
    srcA = str(tmp_path / "gA.parquet")
    pq_.write_table(a, srcA)
    add_segment(rootA, srcA, CFG)
    add_segment(rootB, srcA, CFG)  # same convs -> overlap
    with pytest.raises(ValueError, match="overlap"):
        FederatedQueryService([rootA, rootB], CFG,
                              federation_dir=str(tmp_path / "gfed"))
    # tombstones refused
    conv0 = a.column("conv_id")[0].as_py()
    delete_convs(rootA, [conv0])
    with pytest.raises(ValueError, match="tombstones"):
        FederatedQueryService([rootA], CFG,
                              federation_dir=str(tmp_path / "gfed2"))

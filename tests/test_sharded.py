"""Sharded build + scatter-ALL-search returns results identical to a
single-shard build over the union corpus (and hence to the oracle)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.sharded import (
    ShardedQueryService,
    build_sharded_index,
)
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64)


@pytest.fixture(scope="module")
def sharded(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded")
    corpus = synthesize_transcripts(2400, seed=42)
    # shard by conv hash (polling-ANY analog): each turn routed to ONE shard
    convs = corpus.column("conv_id").to_pylist()
    assign = np.array([hash_str(c) % 2 for c in convs])
    srcs = []
    for k in range(2):
        part = corpus.filter(pa.array(assign == k))
        p = str(root / f"in{k}.parquet")
        pq.write_table(part, p)
        srcs.append(p)
    index_root = str(root / "index")
    manifest = build_sharded_index(srcs, index_root, CFG, overwrite=True)
    return corpus, index_root, manifest


def hash_str(s: str) -> int:
    import zlib

    return zlib.crc32(s.encode())


def test_union_stats(sharded):
    corpus, index_root, manifest = sharded
    oracle = OracleIndex(corpus)
    assert manifest["n_shards"] == 2
    assert manifest["n_docs"] == oracle.n_docs
    assert abs(manifest["avgdl"] - oracle.avgdl) < 1e-9
    assert manifest["n_terms_union"] == len(oracle.postings)


def test_sharded_search_matches_oracle(sharded):
    corpus, index_root, manifest = sharded
    oracle = OracleIndex(corpus)
    queries = reference_query_table()
    svc = ShardedQueryService(index_root, CFG)
    try:
        got = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    want = oracle.search(queries).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)


def test_shard_resume(sharded):
    corpus, index_root, manifest = sharded
    # second run skips both shard builds (skip-if-valid per shard)
    import os
    import time

    t0 = time.time()
    m2 = build_sharded_index(
        [os.path.join(os.path.dirname(index_root), f"in{k}.parquet") for k in range(2)],
        index_root,
        CFG,
    )
    assert m2["n_docs"] == manifest["n_docs"]
    assert time.time() - t0 < 10  # no rebuild


def test_sharded_filtered_search_matches_oracle(sharded):
    """conv_prefix metadata filter through the scatter path: each shard
    resolves the prefix against its OWN convmap; the k-way merge of filtered
    shard results equals the filtered golden oracle (global stats, filtered
    candidates), with the filter composing with per-query exclude."""
    corpus, index_root, manifest = sharded
    oracle = OracleIndex(corpus)
    some_conv = corpus.column("conv_id")[len(corpus) // 3].as_py()
    prefix = some_conv[:-1]
    queries = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["query data search", "the"], pa.string()),
            "limit": pa.array([10, 10], pa.int32()),
            "conv_prefix": pa.array([prefix, prefix], pa.string()),
            "exclude": pa.array(["", "merge"], pa.string()),
        }
    )
    svc = ShardedQueryService(index_root, CFG)
    try:
        got = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    assert len(got) > 0 and got.conv_id.str.startswith(prefix).all()
    # oracle twin: filtered candidates + OR-NOT exclusion
    rows = []
    for qid, text, excl in [(0, "query data search", ""), (1, "the", "merge")]:
        hits = oracle.search_one(text, 1000, conv_prefix=prefix)
        if excl:
            bad = set()
            ps = oracle.postings.get(excl)
            if ps is not None:
                bad = {(oracle.docs[d][0], oracle.docs[d][1]) for d in ps[0]}
            hits = [h for h in hits if (h[0], h[1]) not in bad]
        for rank, (cid, tidx, score) in enumerate(hits[:10]):
            rows.append((qid, rank, cid, tidx, score))
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == [
        (r[0], r[1], r[2], r[3]) for r in rows
    ]
    np.testing.assert_allclose(
        got.score.to_numpy(), np.asarray([r[4] for r in rows]), rtol=0, atol=1e-9
    )

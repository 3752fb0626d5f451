"""End-to-end: Ray Data index build + search is rank-identical (docIDs) and
score-equal (<=1e-9; in practice bit-identical) to the golden oracle on the
reference query set — the conformance core (SURVEY.md §7.2 step 11).
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

N_TURNS = 3000
CFG = EngineConfig(num_index_partitions=4, doc_bucket_size=512, postings_block_size=64)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("engine")
    corpus = synthesize_transcripts(N_TURNS, seed=42)
    src = str(root / "transcripts.parquet")
    pq.write_table(corpus, src)
    index_dir = str(root / "index")
    report = build_index(src, index_dir, CFG, overwrite=True)
    oracle = OracleIndex(corpus)
    return corpus, index_dir, report, oracle


def test_manifest_counters(built):
    corpus, index_dir, report, oracle = built
    assert report["n_docs"] == oracle.n_docs
    assert abs(report["avgdl"] - oracle.avgdl) < 1e-9
    assert report["n_terms"] == len(oracle.postings)
    assert report["n_postings"] == sum(len(d) for d, _ in oracle.postings.values())
    assert report["index_bytes"] > 0
    assert set(report["timings_s"]) >= {"tokenize_s", "merge_s", "stats_s"}


def test_rank_identical_to_oracle(built):
    corpus, index_dir, report, oracle = built
    queries = reference_query_table()
    got = search_table(index_dir, queries).to_pandas()
    want = oracle.search(queries).to_pandas()
    assert len(got) == len(want)
    got_ids = list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx))
    want_ids = list(zip(want.query_id, want["rank"], want.conv_id, want.turn_idx))
    assert got_ids == want_ids  # rank-identical docIDs
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)


def test_search_contracts(built):
    corpus, index_dir, report, oracle = built
    queries = reference_query_table()
    got = search_table(index_dir, queries).to_pandas()
    # exactly `limit` hits for saturating queries (test_search.py:41-44)
    limits = {int(q["query_id"]): int(q["limit"]) for q in queries.to_pylist()}
    for qid, g in got.groupby("query_id"):
        assert len(g) <= limits[qid]
        assert list(g["rank"]) == list(range(len(g)))
        s = g.score.to_numpy()
        assert np.all(np.diff(s) <= 1e-15)  # descending (test_ranker.py:34-35)
    # hot stopword saturates, absent/empty produce nothing (test_client.py:83-98)
    assert len(got[got.query_id == 2]) == 10
    assert len(got[got.query_id == 3]) == 0
    assert len(got[got.query_id == 4]) == 0
    # hits drop the heavy text payload (helper.py:118 analog): schema has no text
    assert "text" not in got.columns


def test_resume_skips_completed(built):
    corpus, index_dir, report, oracle = built
    report2 = build_index(
        os.path.join(os.path.dirname(index_dir), "transcripts.parquet"),
        index_dir,
        CFG,
    )
    # second call returns the stored manifest without rebuilding
    assert report2["n_docs"] == report["n_docs"]
    assert report2["n_postings"] == report["n_postings"]


def test_per_turn_text_round_trip(built):
    """input_hint invariant: per-turn text equality under stable ordering —
    the tf vector the build stage emits for any turn equals a fresh
    tokenization of the raw input text for that (conv_id, turn_idx).
    (The build fuses tokenize into the partials pass, so this drives the
    same tokenize_batch UDF the build uses over the same corpus.)"""
    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.stages.tokenize import compute_conv_bases, tokenize_batch

    corpus, index_dir, report, oracle = built
    extents = pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    conv_base = compute_conv_bases(extents)
    staging = tokenize_batch(
        corpus.select(["conv_id", "turn_idx", "text"]), conv_base_ref=conv_base
    )
    df = staging.to_pandas().set_index(["conv_id", "turn_idx"])
    raw = corpus.to_pandas().set_index(["conv_id", "turn_idx"])
    sample = df.sample(n=50, random_state=7)
    for key, row in sample.iterrows():
        terms = tokenize(raw.loc[key, "text"])
        u, c = np.unique(np.asarray(terms, dtype=object), return_counts=True)
        assert list(row["terms"]) == u.tolist()
        assert list(row["tfs"]) == c.tolist()


def test_query_service_matches_batch_search(built):
    """Persistent serving pool returns the same hits as the Dataset path."""
    from clip_as_service_ray.pipelines.serving import QueryService

    corpus, index_dir, report, oracle = built
    queries = reference_query_table()
    svc = QueryService(index_dir, CFG, num_replicas=2)
    try:
        got = svc.search(queries).to_pandas()
    finally:
        svc.shutdown()
    want = oracle.search(queries).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)


def test_softmax_scores_option(built):
    """set_rank parity: optional per-query softmax score column alongside the
    raw BM25 score (helper.py:110-114); softmax sums to 1 per query
    (test_ranker.py:59-61)."""
    import ray

    from clip_as_service_ray.stages.query import QueryScorer

    corpus, index_dir, report, oracle = built
    worker = ray.remote(num_cpus=1)(QueryScorer)
    actor = worker.remote(index_dir, 10, True, None, True)
    try:
        out = ray.get(actor.__call__.remote(reference_query_table())).to_pandas()
    finally:
        ray.kill(actor)
    assert "softmax_score" in out.columns
    for qid, g in out.groupby("query_id"):
        assert abs(g.softmax_score.sum() - 1.0) < 1e-9
        # softmax preserves the ranking of the raw score
        assert list(g.sort_values("softmax_score", ascending=False)["rank"]) == list(g["rank"])


def test_index_roles_filter(built, tmp_path):
    """M1 analog: only requested roles are indexed."""
    corpus, _idx, _r, _o = built
    cfg2 = EngineConfig(
        num_index_partitions=2, index_roles=("user",), postings_block_size=64
    )
    idx2 = str(tmp_path / "roles_idx")
    report2 = build_index(corpus, idx2, cfg2, overwrite=True)
    import pandas as pd

    df = corpus.to_pandas()
    from clip_as_service_ray.functions.tokenizer import tokenize

    expect = sum(
        1 for _, row in df.iterrows() if row.role == "user" and len(tokenize(row.text)) > 0
    )
    assert report2["n_docs"] == expect


def test_skew_split_merge_rank_identical(built, tmp_path):
    """Force multiple doc-range grid cells per partition (hot-term skew
    splitting) and verify the gridded index is rank-identical to the oracle."""
    corpus, _idx, _r, oracle = built
    cfg = EngineConfig(
        num_index_partitions=2,
        doc_bucket_size=256,
        postings_block_size=64,
        merge_groups_per_part=4,  # several doc-range cells per partition
    )
    idx = str(tmp_path / "split_idx")
    report = build_index(corpus, idx, cfg, overwrite=True)
    assert report["n_postings"] == _r["n_postings"]
    queries = reference_query_table()
    got = search_table(idx, queries, cfg).to_pandas()
    want = oracle.search(queries).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)
    # manifests record the subtask lineage
    import json

    m = json.load(open(os.path.join(idx, "postings", "part=0", "_DONE.json")))
    assert m.get("cells", 0) >= 2


def test_per_partition_resume(built, tmp_path):
    """Simulate a mid-merge crash: wipe ONE postings partition's output and
    manifest, rerun the build, and verify only that partition is rebuilt
    (others untouched by mtime) and the index is still correct."""
    import shutil
    import time as _time

    corpus, _idx, _r, oracle = built
    cfg = EngineConfig(num_index_partitions=4, postings_block_size=64)
    idx = str(tmp_path / "resume_idx")
    build_index(corpus, idx, cfg, overwrite=True)
    # record mtimes, then wipe part=1 and the final manifest
    part_dirs = [os.path.join(idx, "postings", f"part={p}") for p in range(4)]
    before = {d: os.path.getmtime(os.path.join(d, "_DONE.json")) for d in part_dirs}
    shutil.rmtree(part_dirs[1])
    os.remove(os.path.join(idx, "manifest.json"))
    _time.sleep(0.05)

    report = build_index(corpus, idx, cfg)  # resume
    for p, d in enumerate(part_dirs):
        after = os.path.getmtime(os.path.join(d, "_DONE.json"))
        if p == 1:
            assert after > before[d]  # rebuilt
        else:
            assert after == before[d]  # skipped (per-partition skip-if-valid)
    # correctness after resume
    got = search_table(idx, reference_query_table(), cfg).to_pandas()
    want = oracle.search(reference_query_table()).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )


def test_partitioning_invariance(built, tmp_path):
    """FIXTURES determinism invariant: identical ids/scores regardless of
    execution layout — here, two different partition counts / bucket sizes /
    batch sizes produce byte-identical search results."""
    corpus, _idx, _r, oracle = built
    cfg_a = EngineConfig(num_index_partitions=3, doc_bucket_size=128,
                         postings_block_size=32, tokenize_batch_size=512)
    cfg_b = EngineConfig(num_index_partitions=9, doc_bucket_size=4096,
                         postings_block_size=256, tokenize_batch_size=4096)
    hits = []
    for tag, cfg in (("a", cfg_a), ("b", cfg_b)):
        idx = str(tmp_path / f"layout_{tag}")
        build_index(corpus, idx, cfg, overwrite=True)
        hits.append(search_table(idx, reference_query_table(), cfg).to_pandas())
    a, b = hits
    assert list(zip(a.query_id, a["rank"], a.conv_id, a.turn_idx)) == list(
        zip(b.query_id, b["rank"], b.conv_id, b.turn_idx)
    )
    np.testing.assert_array_equal(a.score.to_numpy(), b.score.to_numpy())


@pytest.mark.parametrize("seed", [7, 99])
def test_rank_identity_other_seeds(ray_session, tmp_path, seed):
    """Rank-identity fuzz: different corpora (fresh seeds) stay
    rank-identical + score-equal to the oracle."""
    corpus = synthesize_transcripts(1500, seed=seed)
    idx = str(tmp_path / f"seed{seed}")
    build_index(corpus, idx, CFG, overwrite=True)
    queries = reference_query_table()
    got = search_table(idx, queries, CFG).to_pandas()
    want = OracleIndex(corpus).search(queries).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)


def test_search_nested(built):
    """Nested hits variant: one row per query in input order (the
    doc.matches data-model mapping, SURVEY §1.4); empty queries keep an
    empty list (order/identity preservation, test_ranker.py:233-239)."""
    from clip_as_service_ray.pipelines.search import search_nested

    corpus, index_dir, report, oracle = built
    queries = reference_query_table()
    out = search_nested(index_dir, queries, CFG)
    assert out.num_rows == queries.num_rows
    assert out.column("query_id").to_pylist() == queries.column("query_id").to_pylist()
    rows = out.to_pylist()
    flat = oracle.search(queries).to_pylist()
    want: dict[int, list] = {}
    for r in flat:
        want.setdefault(r["query_id"], []).append((r["conv_id"], r["turn_idx"]))
    for r in rows:
        got_ids = [(h["conv_id"], h["turn_idx"]) for h in r["hits"]]
        assert got_ids == want.get(r["query_id"], [])
        ranks = [h["rank"] for h in r["hits"]]
        assert ranks == list(range(len(ranks)))


def test_dataset_source_sharded_prefix_sum(built, tmp_path):
    """Dataset-typed source takes the DISTRIBUTED conv-base path (two-pass
    block prefix-sum + sharded lookup; no driver funnel) and must be
    rank-identical + score-equal to the table-source build."""
    import ray.data

    corpus, index_dir, report, oracle = built
    idx = str(tmp_path / "ds_src_idx")
    ds = ray.data.from_arrow(corpus)
    report2 = build_index(ds, idx, CFG, overwrite=True)
    assert report2["n_docs"] == report["n_docs"]
    assert report2["n_postings"] == report["n_postings"]
    # convmap was written as a sharded directory by the shard owners
    assert os.path.isdir(os.path.join(idx, "convmap.parquet"))
    got = search_table(idx, reference_query_table(), CFG).to_pandas()
    want = oracle.search(reference_query_table()).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=0, atol=1e-9)


def test_sharded_conv_base_matches_dense(ray_session):
    """ShardedConvBase.lookup == ConvBase.lookup over every conversation."""
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.tokenize import (
        build_sharded_conv_base,
        compute_conv_bases,
    )

    rng = np.random.default_rng(3)
    convs = np.array([f"c{i:06d}" for i in range(997)], dtype=object)
    max_turn = rng.integers(0, 37, len(convs))
    ext = pa.table({"conv_id": pa.array(convs, pa.string()),
                    "max_turn": pa.array(max_turn, pa.int64())})
    dense = compute_conv_bases(ext)
    # shuffled dataset input, forced multi-block
    perm = rng.permutation(len(convs))
    scb, n_slots = build_sharded_conv_base(
        ray.data.from_arrow(ext.take(pa.array(perm))).repartition(7)
    )
    assert n_slots == int((max_turn + 1).sum())
    assert len(scb.shard_refs) >= 2  # actually sharded
    probe = convs[rng.integers(0, len(convs), 500)]
    np.testing.assert_array_equal(scb.lookup(probe), dense.lookup(probe))
    import pytest as _pytest

    with _pytest.raises(KeyError):
        scb.lookup(np.array(["zzz-missing"], dtype=object))


def test_conv_prefix_filtered_search(built):
    """Metadata-filtered search (the AnnLite filter-column analog,
    retriever.md:164-165): a per-query conv_prefix restricts CANDIDATES to
    matching conversations while BM25 stats stay global. Engine hits are
    bit-identical to the filtered golden oracle, every hit matches the
    prefix, limit-k is filled from the filtered set (not post-filtered from
    the global top-k), and the filter composes with exclude (OR-NOT)."""
    import numpy as np
    import pyarrow as pa

    corpus, index_dir, report, oracle = built
    some_conv = corpus.column("conv_id")[len(corpus) // 2].as_py()
    prefix = some_conv[:-1]  # a ~10-conversation slice of the id space
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["query data search", "the", "merge sort batch"], pa.string()),
            "limit": pa.array([10, 10, 10], pa.int32()),
            "conv_prefix": pa.array([prefix, prefix, ""], pa.string()),
        }
    )
    hits = search_table(index_dir, queries, CFG)
    gold = oracle.search(queries)
    assert hits.num_rows == gold.num_rows > 0
    assert hits.select(["query_id", "rank", "conv_id", "turn_idx"]).to_pydict() == \
        gold.select(["query_id", "rank", "conv_id", "turn_idx"]).to_pydict()
    assert np.array_equal(
        np.asarray(hits.column("score").to_pylist()),
        np.asarray(gold.column("score").to_pylist()),
    )
    hp = hits.to_pandas()
    assert hp[hp.query_id == 0].conv_id.str.startswith(prefix).all()
    assert hp[hp.query_id == 1].conv_id.str.startswith(prefix).all()
    # the filtered top-k differs from post-filtering the unfiltered top-k
    # (a doc outside the prefix holds a global top slot for "the")
    unfiltered = search_table(
        index_dir,
        pa.table({"query_id": pa.array([1], pa.int64()),
                  "text": pa.array(["the"], pa.string()),
                  "limit": pa.array([10], pa.int32())}),
        CFG,
    ).to_pandas()
    assert not unfiltered.conv_id.str.startswith(prefix).all()
    assert len(hp[hp.query_id == 1]) == 10  # limit filled from filtered set
    # compose with exclude: filtered AND-NOT
    q2 = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array(["query data search"], pa.string()),
            "limit": pa.array([10], pa.int32()),
            "conv_prefix": pa.array([prefix], pa.string()),
            "exclude": pa.array(["merge"], pa.string()),
        }
    )
    h2 = search_table(index_dir, q2, CFG).to_pandas()
    assert len(h2) > 0 and h2.conv_id.str.startswith(prefix).all()
    # no-match prefix -> zero hits
    h3 = search_table(
        index_dir,
        pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array(["the"], pa.string()),
                  "limit": pa.array([5], pa.int32()),
                  "conv_prefix": pa.array(["zzzz-no-such"], pa.string())}),
        CFG,
    )
    assert h3.num_rows == 0


def test_bm25_plus_matches_oracle(built):
    """BM25+ (delta=1) through BOTH query paths is bit-identical to the
    delta-aware oracle; delta=0 stays bit-identical to classic BM25."""
    corpus, index_dir, report, _ = built
    queries = reference_query_table()
    plus_oracle = OracleIndex(corpus, delta=1.0)
    want = plus_oracle.search(queries).to_pandas()
    got = search_table(index_dir, queries, CFG, delta=1.0).to_pandas()
    assert len(got) == len(want) > 0
    for col in ("query_id", "rank", "conv_id", "turn_idx"):
        assert (got[col].values == want[col].values).all(), col
    assert np.array_equal(got["score"].values, want["score"].values)
    # pruning off -> same answers (rank-safety of the deltaed upper bound)
    cfg_np = EngineConfig(
        num_index_partitions=4, doc_bucket_size=512, postings_block_size=64,
        query_pruning=False,
    )
    got2 = search_table(index_dir, queries, cfg_np, delta=1.0).to_pandas()
    assert np.array_equal(got2["score"].values, want["score"].values)
    # delta=0 unchanged vs the classic oracle
    base = OracleIndex(corpus).search(queries).to_pandas()
    got0 = search_table(index_dir, queries, CFG, delta=0.0).to_pandas()
    assert np.array_equal(got0["score"].values, base["score"].values)

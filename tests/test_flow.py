"""Config-driven flow builder (Flow YAML analog): dedup -> build -> search."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.flow import run_flow
from clip_as_service_ray.pipelines.oracle import OracleIndex
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)


def test_flow_end_to_end(ray_session, tmp_path):
    corpus = synthesize_transcripts(1200, seed=42)
    # inject a duplicated turn (replay) that dedup_turns must drop
    dup = corpus.slice(10, 1)
    corpus_dup = pa.concat_tables([corpus, dup])

    queries = reference_query_table()
    flow = {
        "stages": [
            {"name": "clean", "op": "dedup_turns", "args": {"source": "$raw"}},
            {
                "name": "index",
                "op": "build_index",
                "args": {"source": "$clean_ds", "index_dir": str(tmp_path / "idx"),
                         "overwrite": True},
            },
            {
                "name": "hits",
                "op": "search",
                "args": {"index_dir": str(tmp_path / "idx"), "queries": "$queries"},
            },
        ],
    }
    cfg = EngineConfig(num_index_partitions=2)
    # two-step: dedup returns a Dataset; pass it through as the build source
    partial = run_flow(
        {"stages": flow["stages"][:1]}, inputs={"raw": corpus_dup}, config=cfg
    )
    clean_ds = partial["clean"]
    assert clean_ds.count() == corpus.num_rows  # dup removed

    out = run_flow(
        {"stages": flow["stages"][1:]},
        inputs={"clean_ds": clean_ds, "queries": queries},
        config=cfg,
    )
    got = out["hits"].to_pandas()
    want = OracleIndex(corpus).search(queries).to_pandas()
    assert list(zip(got.query_id, got["rank"], got.conv_id, got.turn_idx)) == list(
        zip(want.query_id, want["rank"], want.conv_id, want.turn_idx)
    )
    np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), atol=1e-9)


def test_flow_unknown_op(ray_session):
    with pytest.raises(ValueError, match="unknown op"):
        run_flow({"stages": [{"name": "x", "op": "nope", "args": {}}]})


def test_flow_segmented_ops(ray_session, tmp_path):
    """Flow surface wires the segment lifecycle: two adds -> segmented
    search -> physical merge, all through the op registry."""
    import pyarrow.compute as pc

    from clip_as_service_ray.pipelines.flow import run_flow
    from clip_as_service_ray.sources.transcripts import (
        reference_query_table,
        synthesize_transcripts,
    )

    corpus = synthesize_transcripts(800, seed=42)
    convs = sorted(set(corpus.column("conv_id").to_pylist()))
    pivot = convs[len(convs) // 2]
    import pyarrow as pa

    a = corpus.filter(pc.less(corpus.column("conv_id"), pa.scalar(pivot)))
    b = corpus.filter(pc.greater_equal(corpus.column("conv_id"), pa.scalar(pivot)))
    root = str(tmp_path / "segflow")
    out = run_flow(
        {
            "config": {"num_index_partitions": 2, "postings_block_size": 64},
            "stages": [
                {"name": "seg_a", "op": "add_segment",
                 "args": {"index_root": root, "source": "$part_a"}},
                {"name": "seg_b", "op": "add_segment",
                 "args": {"index_root": root, "source": "$part_b"}},
                {"name": "hits", "op": "segmented_search",
                 "args": {"index_root": root, "queries": "$queries"}},
                {"name": "merged", "op": "merge_segments",
                 "args": {"index_root": root, "out_dir": str(tmp_path / "m")}},
            ],
        },
        inputs={"part_a": a, "part_b": b, "queries": reference_query_table()},
    )
    assert out["seg_b"]["n_segments"] == 2
    assert out["hits"].num_rows > 0
    assert out["merged"]["n_docs"] == out["seg_b"]["n_docs"]


def test_flow_relational_ops(ray_session):
    import pyarrow as pa

    from clip_as_service_ray.pipelines.flow import run_flow

    US = 1_000_000
    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([0, 5 * US, 60 * US, 0, 2 * US], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    dim = pa.table({"user_id": pa.array([2, 9], pa.int64())})
    out = run_flow(
        {
            "stages": [
                {"name": "sessions", "op": "sessionize",
                 "args": {"source": "$events", "gap_s": 30.0}},
                {"name": "rolled", "op": "rolling_sum",
                 "args": {"source": "$events", "key": "user_id",
                          "value": "value", "id_col": "event_id",
                          "window_s": 10.0}},
                {"name": "kept", "op": "semi_join",
                 "args": {"left": "$events", "right": "$dim", "on": "user_id"}},
                {"name": "dropped", "op": "anti_join",
                 "args": {"left": "$events", "right": "$dim", "on": "user_id"}},
            ],
        },
        inputs={"events": events, "dim": dim},
    )
    # user 1 splits into 2 sessions (gap 55s > 30s), user 2 has 1
    assert out["sessions"].count() == 3
    rolled = out["rolled"].to_pandas().set_index("_id")["roll_sum"].to_dict()
    assert rolled == {0: 1.0, 1: 3.0, 2: 4.0, 3: 8.0, 4: 24.0}
    assert out["kept"].count() == 2
    assert out["dropped"].count() == 3


def test_flow_phrase_ops(ray_session, tmp_path):
    """build_index -> build_positions -> phrase_search wired through the
    config-driven flow surface (phrase + proximity window modes)."""
    import pyarrow as pa

    from clip_as_service_ray.pipelines.flow import run_flow

    src = pa.table(
        {
            "conv_id": ["c0", "c0", "c1"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": ["alpha beta gamma", "beta alpha", "gamma delta alpha beta"],
        }
    )
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()), "text": ["alpha beta"]}
    )
    idx = str(tmp_path / "flowidx")
    out = run_flow(
        {
            "stages": [
                {"name": "index", "op": "build_index",
                 "args": {"source": "$src", "index_dir": idx}},
                {"name": "pos", "op": "build_positions",
                 "args": {"source": "$src", "index_dir": idx}},
                {"name": "hits", "op": "phrase_search",
                 "args": {"index_dir": idx, "queries": "$queries"}},
                {"name": "near", "op": "phrase_search",
                 "args": {"index_dir": idx, "queries": "$queries",
                          "window": 2}},
            ],
        },
        inputs={"src": src, "queries": queries},
    )
    hits = out["hits"]
    got = {(hits.column("conv_id")[i].as_py(), hits.column("turn_idx")[i].as_py()):
           hits.column("phrase_tf")[i].as_py() for i in range(hits.num_rows)}
    assert got == {("c0", 0): 1, ("c1", 0): 1}
    near = out["near"]
    got_near = {(near.column("conv_id")[i].as_py(), near.column("turn_idx")[i].as_py()):
                near.column("phrase_tf")[i].as_py() for i in range(near.num_rows)}
    # window=2 any-order pairs: c0t0 (alpha,beta adjacent) 1 pair,
    # c0t1 (beta alpha reversed) 1 pair, c1t0 (alpha beta adjacent) 1 pair
    assert got_near == {("c0", 0): 1, ("c0", 1): 1, ("c1", 0): 1}


def test_flow_search_mode_kwargs(ray_session, tmp_path):
    """The YAML search op passes query-mode kwargs through to search_table
    (conjunctive here; the same path carries bool_query/similarity/k1/b)."""
    from clip_as_service_ray.pipelines.search import search_table

    corpus = synthesize_transcripts(900, seed=5)
    idx = str(tmp_path / "idx")
    cfg = EngineConfig(num_index_partitions=2)
    queries = reference_query_table()
    out = run_flow(
        {"stages": [
            {"name": "index", "op": "build_index",
             "args": {"source": "$raw", "index_dir": idx, "overwrite": True}},
            {"name": "hits", "op": "search",
             "args": {"index_dir": idx, "queries": "$queries",
                      "conjunctive": True}},
        ]},
        inputs={"raw": corpus, "queries": queries},
        config=cfg,
    )
    got = out["hits"].to_pandas() if hasattr(out["hits"], "to_pandas") else out["hits"]
    want = search_table(idx, queries, cfg, conjunctive=True).to_pandas()
    assert len(got) == len(want)
    assert np.array_equal(
        np.asarray(got["score"].values, dtype=np.float64),
        want["score"].values,
    )

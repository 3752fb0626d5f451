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

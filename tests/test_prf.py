"""RM3 pseudo-relevance feedback: the full two-pass operator vs its DuckDB
twin on a PLANTED corpus (independent of the driver's testdata), plus the
caret-weight repr round-trip the final pass relies on."""

import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _planted_sf_dir(tmp_path) -> str:
    """documents.parquet shaped like the driver's table: doc_id, text,
    lang, source, n_chars — vocab guarantees feedback overlap on the
    default ('merge', 'window') query."""
    rng = random.Random(3)
    vocab = ["merge", "window", "join", "scan", "sort", "hash", "part",
             "group", "filter", "stream", "the", "of"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30)))
        for _ in range(300)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = str(tmp_path / "sfplant")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def test_rm3_matches_sql_twin_on_planted_corpus(ray_session, tmp_path):
    import __ray_entry__ as entry
    from clip_as_service_ray.pipelines import operators as ops

    d = _planted_sf_dir(tmp_path)
    got = ops.bm25_topk_rm3(d).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    want = con.execute(entry.oracle_sql()["bm25_topk_rm3"]).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].values, want["score"].values)


def test_caret_weight_repr_roundtrip():
    """The RM3 final pass serializes float weights as repr(w); the boosted
    parser must recover them EXACTLY (Python guarantees float repr
    round-trip)."""
    rng = np.random.default_rng(0)
    for w in rng.random(50) * 3:
        clause = f"term^{float(w)!r}"
        body, _, ws = clause.rpartition("^")
        assert body == "term" and float(ws) == float(w)

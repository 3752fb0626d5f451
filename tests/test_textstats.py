"""Text-analysis kernels: language-ID heuristic, quality features,
fingerprints."""

import numpy as np

from clip_as_service_ray.functions.minhash import hash_terms
from clip_as_service_ray.functions.textstats import (
    detect_language,
    fingerprint,
    quality_features,
)


def test_langid_basic():
    assert detect_language("the cat is on the mat".split()) == "en"
    assert detect_language("der hund ist nicht da und ich bin hier".split()) == "de"
    assert detect_language("je ne suis pas avec le chien dans la maison".split()) == "fr"
    assert detect_language("yo no voy con el perro para la casa".split()) == "es"
    assert detect_language([]) == "und"
    assert detect_language(["qwerty", "zxcvb"]) == "und"


def test_quality_features():
    f = quality_features("Hello, World 42!")
    assert f["n_chars"] == 16
    assert f["n_tokens"] == 3
    assert f["punct_ratio"] == 2 / 16
    assert f["digit_ratio"] == 2 / 16
    assert f["upper_ratio"] == 2 / 16
    z = quality_features("")
    assert z["n_tokens"] == 0 and z["punct_ratio"] == 0.0


def test_fingerprint_order_sensitive():
    a = hash_terms(np.asarray(["x", "y", "z"], dtype=object))
    b = hash_terms(np.asarray(["z", "y", "x"], dtype=object))
    assert fingerprint(a) == fingerprint(a)
    assert fingerprint(a) != fingerprint(b)
    assert fingerprint(np.array([], dtype=np.uint64)) == fingerprint(np.array([], dtype=np.uint64))


def test_sessionize_gap_semantics(ray_session):
    """Session windows: exact gap-boundary behavior (gap == threshold stays
    in-session; gap > threshold splits) and per-key isolation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.windows import sessionize

    us = 1_000_000
    rows = [
        (1, 0), (1, 1800 * us), (1, 3600 * us),        # gaps == 1800s: ONE session
        (1, 3600 * us + 1801 * us),                     # gap 1801s: new session
        (2, 0), (2, 10 * us),                           # separate user
        (3, 5 * us),                                    # singleton
    ]
    t = pa.table(
        {"user_id": pa.array([r[0] for r in rows], pa.int64()),
         "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}
    )
    out = (
        sessionize(ray.data.from_arrow(t), gap_s=1800)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert out.user_id.tolist() == [1, 1, 2, 3]
    assert out.n_events.tolist() == [3, 1, 2, 1]
    np.testing.assert_allclose(out.duration_s.tolist(), [3600.0, 0.0, 10.0, 0.0])


def test_clean_documents_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = (
        e.queries()["clean_documents"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        e.oracle_sql()["clean_documents"] + " ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    assert got["n_scrubbed"].tolist() == want["n_scrubbed"].tolist()

"""multi_match family (best_fields / most_fields / cross_fields) vs DuckDB
at sf0.001 — in-suite twins of the driver oracle entries. The three modes
share the same per-field (title/body) index pair, so the combines are
directly comparable: best + tie*(sum-best) vs sum vs blended-idf term max.
"""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _oracle(entry: str):
    import __ray_entry__ as re_

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(re_.oracle_sql()[entry]).df()


def test_most_fields_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import multi_match_most_fields

    got = multi_match_most_fields(SF).to_pandas()
    want = _oracle("multi_match_most_fields")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_cross_fields_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import multi_match_cross_fields

    got = multi_match_cross_fields(SF).to_pandas()
    want = _oracle("multi_match_cross_fields")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_modes_disagree_meaningfully(ray_session):
    """The three combines are genuinely different functions of the same
    field legs: most_fields >= best_fields (tie=0.3 <= 1) per doc, and
    cross_fields rescales by blended idf (so it's not a constant multiple
    of either)."""
    from clip_as_service_ray.pipelines.operators import (
        dismax_topk,
        multi_match_most_fields,
    )

    best = dismax_topk(SF, limit=30).to_pandas().set_index("doc_id")["score"]
    most = (
        multi_match_most_fields(SF, limit=30)
        .to_pandas()
        .set_index("doc_id")["score"]
    )
    common = best.index.intersection(most.index)
    assert len(common) > 0
    assert (most[common] >= best[common] - 1e-9).all()

"""ES phrase suggester vs the DuckDB twin at sf0.001, plus contract
invariants (candidate cap, chain scoring monotonicity)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_phrase_suggest_vs_duckdb(ray_session):
    import __ray_entry__ as re_
    from clip_as_service_ray.pipelines.operators import phrase_suggest

    got = phrase_suggest(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(re_.oracle_sql()["phrase_suggest"]).df()
    gk = got.sort_values(["query", "suggestion"]).reset_index(drop=True)
    wk = want.sort_values(["query", "suggestion"]).reset_index(drop=True)
    assert gk["query"].tolist() == wk["query"].tolist()
    assert gk["suggestion"].tolist() == wk["suggestion"].tolist()
    np.testing.assert_allclose(gk["score"], wk["score"], atol=1e-9)


def test_phrase_suggest_corrects_misspellings(ray_session):
    from clip_as_service_ray.pipelines.operators import phrase_suggest

    got = phrase_suggest(SF, queries=("merg windw",), k=1).to_pandas()
    assert len(got) == 1
    # the LM's top chain for a 1-edit misspelling of two common corpus
    # terms must be the real bigram
    assert got["suggestion"].iloc[0] == "merge window"

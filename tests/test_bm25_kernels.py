"""BM25 kernel properties: idf monotonicity, tf_norm bounds, and equivalence
of the partitioned top-k fast path with the full-lexsort slow path."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from clip_as_service_ray.functions import bm25


def test_idf_monotone_decreasing_in_df():
    n = 1000
    dfs = np.arange(1, n + 1)
    vals = bm25.idf(dfs, n)
    assert np.all(np.diff(vals) < 0)
    assert np.all(vals > 0)


def test_tf_norm_bounds_and_monotonicity():
    tf = np.arange(1, 100)
    dl = np.full(99, 20.0)
    v = bm25.tf_norm(tf, dl, avgdl=20.0)
    assert np.all(np.diff(v) > 0)  # increasing in tf
    assert np.all(v < bm25.K1 + 1)  # asymptote k1+1
    # longer docs score lower at equal tf
    v_long = bm25.tf_norm(tf, np.full(99, 200.0), avgdl=20.0)
    assert np.all(v_long < v)


def _slow_topk(scores, doc_ids, k):
    order = np.lexsort((doc_ids, -scores))
    return order[: min(k, len(scores))]


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=8),
)
def test_topk_fast_path_equals_slow(n, k, seed, tie_levels):
    rng = np.random.default_rng(seed)
    # heavy ties: few distinct score levels
    scores = rng.integers(0, tie_levels, n).astype(np.float64)
    doc_ids = rng.permutation(n).astype(np.int64)
    fast = bm25.topk_indices(scores, doc_ids, k)
    slow = _slow_topk(scores, doc_ids, k)
    assert doc_ids[fast].tolist() == doc_ids[slow].tolist()
    assert scores[fast].tolist() == scores[slow].tolist()


def test_suffix_regex_expansion_score_parity(tmp_path, ray_session):
    """suffix/regex modes score EXACTLY like an explicit OR query over the
    manually expanded term set (per-term idf, canonical accumulation)."""
    import numpy as np
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    d = str(tmp_path / "sfx")
    build_index(synthesize_transcripts(600, seed=5), d, cfg, overwrite=True)
    reader = IndexReader(d)
    # pick a suffix with a small expansion set
    terms = reader._terms_sorted.tolist()
    suf = terms[0][-2:]
    expanded = reader.expand_suffix(suf)
    assert terms[0] in expanded and len(expanded) >= 1
    q = pa.table({"query_id": pa.array([0], pa.int64()), "text": [suf],
                  "limit": pa.array([10], pa.int32())})
    got = search_table(d, q, cfg, suffix=True)
    qor = pa.table({"query_id": pa.array([0], pa.int64()),
                    "text": [" ".join(expanded)],
                    "limit": pa.array([10], pa.int32())})
    want = search_table(d, qor, cfg)
    assert got.column("conv_id").to_pylist() == want.column("conv_id").to_pylist()
    np.testing.assert_array_equal(
        got.column("score").to_numpy(), want.column("score").to_numpy()
    )
    # regex: same contract
    pat = terms[0][0] + ".*"
    expanded_r = reader.expand_regex(pat)
    got_r = search_table(
        d,
        pa.table({"query_id": pa.array([0], pa.int64()), "text": [pat],
                  "limit": pa.array([10], pa.int32())}),
        cfg, regex=True,
    )
    want_r = search_table(
        d,
        pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": [" ".join(expanded_r)],
                  "limit": pa.array([10], pa.int32())}),
        cfg,
    )
    np.testing.assert_array_equal(
        got_r.column("score").to_numpy(), want_r.column("score").to_numpy()
    )
    # term range: same contract, all four bracket inclusivity forms
    lo, hi = terms[1], terms[min(6, len(terms) - 1)]
    for rq, want_set in [
        (f"[{lo} TO {hi}]", reader.expand_term_range(lo, hi, True, True)),
        (f"{{{lo} TO {hi}}}", reader.expand_term_range(lo, hi, False, False)),
        (f"[{lo} TO {hi}}}", reader.expand_term_range(lo, hi, True, False)),
        (f"[* TO {hi}]", reader.expand_term_range(None, hi, True, True)),
    ]:
        assert want_set, rq
        got_t = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()), "text": [rq],
                      "limit": pa.array([10], pa.int32())}),
            cfg, term_range=True,
        )
        want_t = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()),
                      "text": [" ".join(want_set)],
                      "limit": pa.array([10], pa.int32())}),
            cfg,
        )
        assert got_t.column("conv_id").to_pylist() == want_t.column("conv_id").to_pylist(), rq
        np.testing.assert_array_equal(
            got_t.column("score").to_numpy(), want_t.column("score").to_numpy()
        )


def test_blockjoin_modes_vs_bruteforce(tmp_path, ray_session):
    """Block-join (has_child) score modes: per-conv sum/avg/max/count of
    the matching turns' OR scores, representative = best turn (doc ASC on
    ties); max mode is bit-identical to field-collapse."""
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    d = str(tmp_path / "bj")
    build_index(synthesize_transcripts(900, seed=7), d, cfg, overwrite=True)
    reader = IndexReader(d)
    text = " ".join(reader._terms_sorted[:2].tolist())
    # brute force: full OR match set (huge limit), group by conv
    full_docs, full_scores = reader.score_query(text, 10**9)
    convs, _turns = reader.invert_doc_ids(full_docs)
    per_conv: dict = {}
    for dct, s, c in zip(full_docs, full_scores, convs):
        e = per_conv.setdefault(c, [0.0, 0, -1.0, None])
        e[0] += s
        e[1] += 1
        if s > e[2]:  # docs ascend, so first max == doc-ASC tie-break
            e[2], e[3] = s, dct
    for mode, score_of in [
        ("sum", lambda e: e[0]), ("avg", lambda e: e[0] / e[1]),
        ("max", lambda e: e[2]), ("count", lambda e: float(e[1])),
    ]:
        got = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()), "text": [text],
                      "limit": pa.array([8], pa.int32())}),
            cfg, block_join=mode,
        )
        want = sorted(
            ((score_of(e), c) for c, e in per_conv.items()),
            key=lambda z: (-z[0], z[1]),
        )[:8]
        assert got.column("conv_id").to_pylist() == [c for _, c in want], mode
        np.testing.assert_allclose(
            got.column("score").to_numpy(), [s for s, _ in want],
            rtol=0, atol=1e-12,
        )
        # representative turn = the conv's best doc
        for i in range(got.num_rows):
            c = got.column("conv_id")[i].as_py()
            rep_doc = per_conv[c][3]
            rc, rt = reader.invert_doc_ids(np.array([rep_doc], dtype=np.int64))
            assert rc[0] == c and rt[0] == got.column("turn_idx")[i].as_py(), mode
    # max mode == collapse, bit-identical
    q = pa.table({"query_id": pa.array([0], pa.int64()), "text": [text],
                  "limit": pa.array([8], pa.int32())})
    bj = search_table(d, q, cfg, block_join="max")
    cl = search_table(d, q, cfg, collapse=True)
    assert bj.column("conv_id").to_pylist() == cl.column("conv_id").to_pylist()
    np.testing.assert_array_equal(
        bj.column("score").to_numpy(), cl.column("score").to_numpy()
    )


def test_decay_scoring_vs_bruteforce(tmp_path, ray_session):
    """function_score decay: engine top-k == (full OR match set) scores
    multiplied by the same decay curve — all three kinds; docs missing the
    field keep their raw score (multiplier 1.0); chunked path identical."""
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import (
        build_doc_values,
        decay_multiplier,
    )
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    d = str(tmp_path / "dec")
    corpus = synthesize_transcripts(700, seed=9)
    build_index(corpus, d, cfg, overwrite=True)
    # value = a deterministic function of the row; every 5th doc MISSING
    src = corpus.select(["conv_id", "turn_idx"]).append_column(
        "recency",
        pa.array(
            (np.arange(corpus.num_rows) * 13 % 97).astype(np.float64),
            pa.float64(),
        ),
    ).filter(pa.array(np.arange(corpus.num_rows) % 5 != 0))
    build_doc_values(src, d, "recency", cfg)

    reader = IndexReader(d)
    text = " ".join(reader._terms_sorted[:2].tolist())
    full_docs, full_scores = reader.score_query(text, 10**9)
    vals = reader.doc_values("recency")
    assert np.isnan(vals).any()  # the missing fifth is really missing
    for kind in ("gauss", "exp", "linear"):
        spec = {"field": "recency", "origin": 40.0, "scale": 25.0,
                "decay": 0.5, "kind": kind}
        got = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()), "text": [text],
                      "limit": pa.array([12], pa.int32())}),
            cfg, decay=spec,
        )
        m = decay_multiplier(vals[full_docs], 40.0, 25.0, 0.0, 0.5, kind)
        s2 = full_scores * m
        order = np.lexsort((full_docs, -s2))[:12]
        wc, wt = reader.invert_doc_ids(full_docs[order])
        assert got.column("conv_id").to_pylist() == wc.tolist(), kind
        assert got.column("turn_idx").to_pylist() == wt.tolist(), kind
        np.testing.assert_array_equal(
            got.column("score").to_numpy(), s2[order]
        )
    # chunked dense path: force multi-chunk scoring, must stay identical
    r2 = IndexReader(d)
    r2.dense_chunk_docs = 97
    spec = {"field": "recency", "origin": 40.0, "scale": 25.0}
    d1, s1 = reader.score_query_decay(text, 12, **spec)
    d2, s2b = r2.score_query_decay(text, 12, **spec)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2b)


def test_fvf_multiplier_semantics():
    """field_value_factor contract: missing replaces NaN BEFORE
    factor/modifier (the ES missing-param rule); every modifier matches its
    documented formula (log* base-10, ln* natural)."""
    import pytest

    from clip_as_service_ray.pipelines.docvalues import fvf_multiplier

    v = np.array([4.0, np.nan, 9.0])
    # missing=16 -> NaN slot becomes sqrt(2*16), not 1.0
    got = fvf_multiplier(v, factor=2.0, modifier="sqrt", missing=16.0)
    np.testing.assert_array_equal(
        got, np.sqrt(np.array([8.0, 32.0, 18.0]))
    )
    x = np.array([10.0, 98.0])
    np.testing.assert_array_equal(fvf_multiplier(x), x)
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="log"), np.log10(x))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="log1p"), np.log10(x + 1.0))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="log2p"), np.log10(x + 2.0))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="ln"), np.log(x))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="ln1p"), np.log(x + 1.0))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="ln2p"), np.log(x + 2.0))
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="square"), x * x)
    np.testing.assert_array_equal(
        fvf_multiplier(x, modifier="reciprocal"), 1.0 / x)
    with pytest.raises(ValueError):
        fvf_multiplier(x, modifier="cbrt")


def test_fvf_scoring_vs_bruteforce(tmp_path, ray_session):
    """kind="fvf" through the full retrieval path: engine top-k == (full OR
    match set) scores multiplied by the same field_value_factor curve;
    missing docs take the `missing` value before factor/modifier; chunked
    dense path identical."""
    import pyarrow as pa

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import (
        build_doc_values,
        fvf_multiplier,
    )
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    d = str(tmp_path / "fvf")
    corpus = synthesize_transcripts(700, seed=9)
    build_index(corpus, d, cfg, overwrite=True)
    src = corpus.select(["conv_id", "turn_idx"]).append_column(
        "popularity",
        pa.array(
            (np.arange(corpus.num_rows) * 13 % 97 + 1).astype(np.float64),
            pa.float64(),
        ),
    ).filter(pa.array(np.arange(corpus.num_rows) % 5 != 0))
    build_doc_values(src, d, "popularity", cfg)

    reader = IndexReader(d)
    text = " ".join(reader._terms_sorted[:2].tolist())
    full_docs, full_scores = reader.score_query(text, 10**9)
    vals = reader.doc_values("popularity")
    assert np.isnan(vals).any()
    for modifier in ("log2p", "sqrt", "none"):
        spec = {"kind": "fvf", "field": "popularity", "factor": 0.5,
                "modifier": modifier, "missing": 3.0}
        got = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()), "text": [text],
                      "limit": pa.array([12], pa.int32())}),
            cfg, decay=spec,
        )
        m = fvf_multiplier(vals[full_docs], 0.5, modifier, 3.0)
        s2 = full_scores * m
        order = np.lexsort((full_docs, -s2))[:12]
        wc, wt = reader.invert_doc_ids(full_docs[order])
        assert got.column("conv_id").to_pylist() == wc.tolist(), modifier
        assert got.column("turn_idx").to_pylist() == wt.tolist(), modifier
        np.testing.assert_array_equal(
            got.column("score").to_numpy(), s2[order]
        )
    # rank_feature (ADDITIVE boost_mode=sum): same index + doc values; docs
    # missing the feature keep bit-identical BM25 scores (contribution 0.0)
    from clip_as_service_ray.pipelines.docvalues import rank_feature_boost

    for function in ("saturation", "log", "sigmoid"):
        spec = {"kind": "rank_feature", "field": "popularity",
                "function": function, "pivot": 20.0, "weight": 1.5}
        got = search_table(
            d,
            pa.table({"query_id": pa.array([0], pa.int64()), "text": [text],
                      "limit": pa.array([12], pa.int32())}),
            cfg, decay=spec,
        )
        s2 = full_scores + rank_feature_boost(
            vals[full_docs], function, 20.0, 1.5
        )
        order = np.lexsort((full_docs, -s2))[:12]
        wc, wt = reader.invert_doc_ids(full_docs[order])
        assert got.column("conv_id").to_pylist() == wc.tolist(), function
        np.testing.assert_array_equal(
            got.column("score").to_numpy(), s2[order]
        )
        # feature-less docs keep bit-identical scores (x + 0.0 == x); the
        # match set may or may not contain one, so guard the subset check
        missing = np.isnan(vals[full_docs])
        np.testing.assert_array_equal(s2[missing], full_scores[missing])
    # chunked dense path identical
    r2 = IndexReader(d)
    r2.dense_chunk_docs = 97
    spec = {"kind": "fvf", "field": "popularity", "factor": 0.5,
            "modifier": "log2p"}
    d1, s1 = reader.score_query_decay(text, 12, **spec)
    d2, s2b = r2.score_query_decay(text, 12, **spec)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2b)
    spec = {"kind": "rank_feature", "field": "popularity", "pivot": 20.0}
    d1, s1 = reader.score_query_decay(text, 12, **spec)
    d2, s2b = r2.score_query_decay(text, 12, **spec)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2b)

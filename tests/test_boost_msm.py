"""Caret-boost (weighted OR) and minimum_should_match scoring modes.

Contracts pinned here:
- weight-1 boosted queries are BIT-identical to score_query (1.0*x == x and
  the accumulation structure is shared);
- msm with min_match=1 is bit-identical to score_query; min_match == n_terms
  reproduces the conjunctive doc set; min_match > in-vocab terms is empty;
- boosted scores equal the brute-force weighted sum of per-term scores;
- both modes compose with exclude and doc_range, and hold on the chunked
  (memory-bounded) path;
- QueryScorer rejects mode combinations.
"""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.stages.query import IndexReader, QueryScorer


def _word(i: int) -> str:
    out = []
    i += 1
    while i:
        out.append(chr(ord("a") + i % 26))
        i //= 26
    return "w" + "".join(out)


def _corpus(n_docs=1200, vocab_size=400, seed=7):
    rng = np.random.default_rng(seed)
    vocab = np.array([_word(i) for i in range(vocab_size)], dtype=object)
    p = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    p /= p.sum()
    dl = np.clip(rng.lognormal(2.3, 0.7, n_docs), 1, 120).astype(np.int64)
    flat = vocab[rng.choice(vocab_size, int(dl.sum()), p=p)]
    bounds = np.cumsum(dl)[:-1]
    texts = [" ".join(c) for c in np.split(flat, bounds)]
    return pa.table(
        {
            "conv_id": pa.array([f"c{i:06d}" for i in range(n_docs)]),
            "turn_idx": pa.array(np.zeros(n_docs, dtype=np.int32), pa.int32()),
            "role": pa.array(["user"] * n_docs),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n_docs),
            "ts": pa.array(np.zeros(n_docs, dtype=np.int64), pa.timestamp("us")),
        }
    )


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boostmsm") / "index")
    build_index(_corpus(), d, EngineConfig(num_index_partitions=2), overwrite=True)
    return d


@pytest.fixture(scope="module")
def reader(index_dir):
    return IndexReader(index_dir)


def _fuzz_queries(n=60, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [_word(i) for i in range(400)]
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 6))
        idx = np.concatenate(
            [rng.integers(0, 30, (k + 1) // 2), rng.integers(30, 400, k // 2)]
        )
        out.append(" ".join(vocab[i] for i in idx))
    return out + [_word(0), "nosuchterm xq", ""]


def test_boosted_weight1_bit_identical(reader):
    # duplicate-free queries: plain OR dedups repeated terms while boosted
    # mode ADDS their weights (pinned by test_parse_boosts_duplicates_add)
    for q in _fuzz_queries():
        q = " ".join(dict.fromkeys(q.split()))
        d1, s1 = reader.score_query(q, 10)
        d2, s2 = reader.score_query_boosted(q, 10)
        assert d1.tolist() == d2.tolist(), q
        np.testing.assert_array_equal(s1, s2, err_msg=q)


def test_msm_floor1_bit_identical(reader):
    for q in _fuzz_queries():
        d1, s1 = reader.score_query(q, 10)
        d2, s2 = reader.score_query_msm(q, 10, min_match=1)
        assert d1.tolist() == d2.tolist(), q
        np.testing.assert_array_equal(s1, s2, err_msg=q)


def test_boosted_matches_bruteforce(reader):
    q = f"{_word(0)}^2 {_word(3)}^0.5 {_word(12)}"
    weights = reader.parse_boosts(q)
    assert weights == {_word(0): 2.0, _word(3): 0.5, _word(12): 1.0}
    # brute force: dense weighted accumulation in sorted-term order
    n = reader._max_doc_id + 1
    acc = np.zeros(n)
    for t in sorted(weights):
        docs_t, scores_t = reader.term_docs_scores(t)
        acc[docs_t] += weights[t] * scores_t
    matched = acc != 0.0
    cand = np.nonzero(matched)[0]
    order = np.lexsort((cand, -acc[cand]))[:10]
    d, s = reader.score_query_boosted(q, 10)
    assert d.tolist() == cand[order].tolist()
    np.testing.assert_allclose(s, acc[cand[order]], rtol=0, atol=0)


def test_parse_boosts_duplicates_add(reader):
    w = reader.parse_boosts(f"{_word(0)} {_word(0)}")
    assert w == {_word(0): 2.0}
    w = reader.parse_boosts(f"{_word(0)}^1.5 {_word(0)}^0.5")
    assert w == {_word(0): 2.0}


def test_msm_counts_distinct_terms(reader):
    terms = [_word(0), _word(1), _word(2)]
    q = " ".join(terms)
    # brute force doc -> distinct-match count
    n = reader._max_doc_id + 1
    cnt = np.zeros(n, dtype=np.int64)
    acc = np.zeros(n)
    for t in sorted(terms):
        docs_t, scores_t = reader.term_docs_scores(t)
        cnt[docs_t] += 1
        acc[docs_t] += scores_t
    for m in (2, 3):
        sel = np.nonzero(cnt >= m)[0]
        order = np.lexsort((sel, -acc[sel]))[:10]
        d, s = reader.score_query_msm(q, 10, min_match=m)
        assert d.tolist() == sel[order].tolist(), m
        np.testing.assert_array_equal(s, acc[sel[order]])


def test_msm_all_terms_equals_conjunctive(reader):
    q = f"{_word(0)} {_word(1)}"
    d1, s1 = reader.score_query_msm(q, 10, min_match=2)
    d2, s2 = reader.score_query_conjunctive(q, 10)
    assert d1.tolist() == d2.tolist()
    np.testing.assert_array_equal(s1, s2)


def test_msm_above_vocab_count_empty(reader):
    d, s = reader.score_query_msm(f"{_word(0)} nosuchterm", 10, min_match=2)
    assert len(d) == 0 and len(s) == 0


def test_exclude_composes(reader):
    excl = reader.excluded_docs(_word(1))
    d, _ = reader.score_query_boosted(f"{_word(0)}^3", 20, exclude_text=_word(1))
    assert not set(d.tolist()) & set(excl.tolist())
    d2, _ = reader.score_query_msm(
        f"{_word(0)} {_word(2)}", 20, min_match=1, exclude_text=_word(1)
    )
    assert not set(d2.tolist()) & set(excl.tolist())


def test_doc_range_composes(reader):
    rng = (100, 600)
    d, s = reader.score_query_boosted(f"{_word(0)}^2 {_word(5)}", 10, doc_range=rng)
    assert ((d >= 100) & (d < 600)).all()
    d2, s2 = reader.score_query_msm(
        f"{_word(0)} {_word(5)}", 10, min_match=1, doc_range=rng
    )
    assert ((d2 >= 100) & (d2 < 600)).all()


def test_chunked_path_identical(reader, index_dir):
    chunked = IndexReader(index_dir)
    chunked.dense_chunk_docs = 257  # force the memory-bounded path
    for q in (f"{_word(0)}^2 {_word(3)}", f"{_word(0)} {_word(1)} {_word(4)}"):
        d1, s1 = reader.score_query_boosted(q, 10)
        d2, s2 = chunked.score_query_boosted(q, 10)
        assert d1.tolist() == d2.tolist(), q
        np.testing.assert_array_equal(s1, s2, err_msg=q)
        d3, s3 = reader.score_query_msm(q.replace("^2", ""), 10, min_match=2)
        d4, s4 = chunked.score_query_msm(q.replace("^2", ""), 10, min_match=2)
        assert d3.tolist() == d4.tolist(), q
        np.testing.assert_array_equal(s3, s4, err_msg=q)


def test_scorer_mode_exclusivity(index_dir):
    with pytest.raises(ValueError, match="mutually exclusive"):
        QueryScorer(index_dir, boosted=True, min_match=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        QueryScorer(index_dir, conjunctive=True, boosted=True)
    with pytest.raises(ValueError, match="synonyms"):
        QueryScorer(index_dir, boosted=True, synonyms={"a": ["b"]})


def test_search_table_end_to_end(index_dir, reader):
    from clip_as_service_ray.pipelines.search import search_table

    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([f"{_word(0)}^2 {_word(3)}"]),
            "limit": pa.array([5], pa.int32()),
        }
    )
    hits = search_table(index_dir, q, EngineConfig(), boosted=True)
    d, s = reader.score_query_boosted(f"{_word(0)}^2 {_word(3)}", 5)
    assert hits.num_rows == len(d)
    np.testing.assert_array_equal(hits.column("score").to_numpy(), s)

    q2 = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([f"{_word(0)} {_word(1)} {_word(2)}"]),
            "limit": pa.array([5], pa.int32()),
        }
    )
    hits2 = search_table(index_dir, q2, EngineConfig(), min_match=2)
    d2, s2 = reader.score_query_msm(f"{_word(0)} {_word(1)} {_word(2)}", 5, min_match=2)
    assert hits2.num_rows == len(d2)
    np.testing.assert_array_equal(hits2.column("score").to_numpy(), s2)


# ---- search_after pagination + field collapse ----


def test_search_after_paging_reproduces_full_list(reader):
    for q in (f"{_word(0)} {_word(1)}", f"{_word(2)} {_word(5)} {_word(9)}"):
        d_all, s_all = reader.score_query(q, 10**9)
        pages_d, pages_s = [], []
        cur = None
        for _ in range(10**6):
            if cur is None:
                d, s = reader.score_query(q, 37)
            else:
                d, s = reader.score_query_after(q, 37, cur[0], cur[1])
            if len(d) == 0:
                break
            pages_d.append(d)
            pages_s.append(s)
            cur = (float(s[-1]), int(d[-1]))
        assert np.concatenate(pages_d).tolist() == d_all.tolist()
        np.testing.assert_array_equal(np.concatenate(pages_s), s_all)


def test_collapse_matches_first_per_group(reader):
    q = f"{_word(0)} {_word(1)} {_word(3)}"
    d_all, s_all = reader.score_query(q, 10**9)
    for g in (lambda d: d % 7, lambda d: d // 50):
        seen, keep = set(), []
        for i, doc in enumerate(d_all):
            k = int(g(np.int64(doc)))
            if k not in seen:
                seen.add(k)
                keep.append(i)
        keep = np.array(keep)[:10]
        d_c, s_c = reader.score_query_collapse(q, 10, group_of=g)
        assert d_c.tolist() == d_all[keep].tolist()
        np.testing.assert_array_equal(s_c, s_all[keep])


def test_collapse_default_groups_by_conv(reader):
    # fixture corpus is one turn per conv -> conv collapse is the identity
    q = f"{_word(0)} {_word(1)}"
    d1, s1 = reader.score_query(q, 10)
    d2, s2 = reader.score_query_collapse(q, 10)
    assert d1.tolist() == d2.tolist()
    np.testing.assert_array_equal(s1, s2)


def test_after_collapse_chunked_identity(reader, index_dir):
    chunked = IndexReader(index_dir)
    chunked.dense_chunk_docs = 149
    q = f"{_word(0)} {_word(1)} {_word(4)}"
    d_all, s_all = reader.score_query(q, 30)
    cur = (float(s_all[9]), int(d_all[9]))
    d1, s1 = reader.score_query_after(q, 10, *cur)
    d2, s2 = chunked.score_query_after(q, 10, *cur)
    assert d1.tolist() == d2.tolist() == d_all[10:20].tolist()
    np.testing.assert_array_equal(s1, s2)
    g = lambda d: d % 11  # noqa: E731
    d3, s3 = reader.score_query_collapse(q, 10, group_of=g)
    d4, s4 = chunked.score_query_collapse(q, 10, group_of=g)
    assert d3.tolist() == d4.tolist()
    np.testing.assert_array_equal(s3, s4)


def test_scorer_cursor_columns(index_dir, reader):
    from clip_as_service_ray.pipelines.search import search_table

    q_text = f"{_word(0)} {_word(1)}"
    base = {
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array([q_text]),
        "limit": pa.array([10], pa.int32()),
    }
    page1 = search_table(index_dir, pa.table(base), EngineConfig())
    q2 = dict(
        base,
        after_score=pa.array([page1.column("score")[-1].as_py()], pa.float64()),
        after_conv=pa.array([page1.column("conv_id")[-1].as_py()], pa.string()),
        after_turn=pa.array([page1.column("turn_idx")[-1].as_py()], pa.int32()),
    )
    page2 = search_table(index_dir, pa.table(q2), EngineConfig())
    d_all, s_all = reader.score_query(q_text, 20)
    convs, turns = reader.invert_doc_ids(d_all[10:20])
    assert page2.column("conv_id").to_pylist() == convs.tolist()
    np.testing.assert_array_equal(page2.column("score").to_numpy(), s_all[10:20])
    # cursor under a non-default mode -> hard error, not silent OR
    with pytest.raises(Exception, match="OR mode only"):
        search_table(index_dir, pa.table(q2), EngineConfig(), conjunctive=True)


def test_terms_set_matches_bruteforce(index_dir, reader, tmp_path):
    """ES terms_set (per-doc minimum_should_match from a doc-values field):
    survivors == OR match set filtered by distinct-match count >= its own
    floor, scores bit-identical to score_query; docs missing the field never
    match; chunked dense path identical."""
    from clip_as_service_ray.pipelines.docvalues import build_doc_values

    n = 1200
    # req cycles 1,2,3; every 7th doc has NO requirement value (can't match)
    keep = np.arange(n) % 7 != 0
    src = pa.table(
        {
            "conv_id": pa.array([f"c{i:06d}" for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "req": pa.array((np.arange(n) % 3 + 1).astype(np.float64)),
        }
    ).filter(pa.array(keep))
    build_doc_values(src, index_dir, "req", EngineConfig(num_index_partitions=2))
    r = IndexReader(index_dir)
    req = r.doc_values("req")

    for q in _fuzz_queries(25, seed=11):
        terms = sorted({t for t in r._qtokens(q) if t in r._term_blocks})
        d_ts, s_ts = r.score_query_terms_set(q, 50, field="req")
        # brute force: full OR + per-doc distinct-match count
        d_all, s_all = r.score_query(q, 10**9)
        counts = np.zeros(len(req))
        for t in terms:
            docs_t, _ = r.term_docs_scores(t)
            counts[docs_t] += 1
        ok = ~np.isnan(req[d_all]) & (counts[d_all] >= req[d_all])
        d_keep, s_keep = d_all[ok], s_all[ok]
        order = np.lexsort((d_keep, -s_keep))[:50]
        np.testing.assert_array_equal(d_ts, d_keep[order], err_msg=q)
        np.testing.assert_array_equal(s_ts, s_keep[order], err_msg=q)
        assert not np.isnan(req[d_ts]).any()
    # chunked dense path identical
    r2 = IndexReader(index_dir)
    r2.dense_chunk_docs = 157
    q = _fuzz_queries(1, seed=5)[0]
    d1, s1 = r.score_query_terms_set(q, 20, field="req")
    d2, s2 = r2.score_query_terms_set(q, 20, field="req")
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_terms_set_scorer_mode_exclusive(index_dir):
    with pytest.raises(ValueError, match="mutually exclusive"):
        QueryScorer(index_dir, 10, False, conjunctive=True, terms_set="req")

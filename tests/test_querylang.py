"""Query-string parser (Lucene QueryParser analog): parse shapes, rejection
of inexpressible trees, and end-to-end dispatch equivalence against the
flag-based engine calls."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.pipelines.querylang import parse_query, query_string_table

# ---- pure parser tests (no Ray) ----


def test_parse_or_default():
    sp = parse_query("merge window scan")
    assert sp.text == "merge window scan" and not sp.conjunctive
    assert sp.exclude == "" and sp.phrase is None


def test_parse_and():
    sp = parse_query("merge AND window")
    assert sp.conjunctive and sp.text == "merge window"


def test_parse_not_and_dash():
    sp = parse_query("merge NOT part -sort")
    assert sp.text == "merge" and sp.exclude == "part sort"


def test_parse_prefix_fuzzy_phrase():
    assert parse_query("mer*").prefix and parse_query("mer*").text == "mer"
    sp = parse_query("mrge~2")
    assert sp.fuzzy == 2 and sp.text == "mrge"
    assert parse_query("mrge~").fuzzy == 2  # default distance
    ph = parse_query('"merge window"')
    assert ph.phrase == "merge window" and ph.window == 0
    pr = parse_query('"merge window"~4')
    assert pr.window == 4


def test_parse_not_composes_with_modes():
    sp = parse_query("merge AND window NOT part")
    assert sp.conjunctive and sp.exclude == "part"


def test_parse_rejects_inexpressible():
    for bad in (
        "a AND b c",            # mixed AND/OR
        'loose "a phrase"',     # phrase + loose terms
        "a* b",                 # multi-term prefix
        "a* AND b",             # prefix + AND
        "a~1 b~2",              # conflicting distances
        "merge NOT",            # dangling NOT
        '"a"~4',                # proximity needs >= 2 terms
    ):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_span_near():
    sp = parse_query('"a b c"~4')
    assert sp.phrase == "a b c" and sp.window == 4


def test_parse_empty():
    sp = parse_query("   ")
    assert sp.text == "" and sp.phrase is None


# ---- end-to-end dispatch (Ray) ----


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    root = tmp_path_factory.mktemp("qlang")
    corpus = synthesize_transcripts(900, seed=33)
    d = str(root / "index")
    build_index(corpus, d, cfg, overwrite=True, positions=True)
    return d, cfg, corpus


def _vocab(corpus, k):
    from clip_as_service_ray.functions.tokenizer import tokenize

    seen = []
    for t in corpus.column("text").to_pylist():
        for tok in tokenize(t):
            if tok.isalpha() and tok not in seen:
                seen.append(tok)
            if len(seen) >= k:
                return seen
    return seen


def test_query_string_matches_flag_calls(idx):
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    vocab = _vocab(corpus, 8)
    a, b = vocab[0], vocab[1]
    # pick an exclude term that leaves survivors (zipfian vocab: some terms
    # co-occur with nearly everything)
    want = None
    for c in vocab[2:]:
        q = pa.table(
            {"query_id": pa.array([0], pa.int64()), "text": [f"{a} {b}"],
             "limit": pa.array([10], pa.int32()), "exclude": [c]}
        )
        want = search_table(d, q, cfg).to_pandas()
        if len(want) > 0:
            break
    assert want is not None and len(want) > 0
    got = query_string_table(d, [f"{a} {b} NOT {c}"], cfg).to_pandas()
    assert len(got) == len(want)
    assert np.array_equal(got["score"].values, want["score"].values)
    assert (got["conv_id"].values == want["conv_id"].values).all()


def test_query_string_mixed_batch(idx):
    d, cfg, corpus = idx
    a, b, _ = _vocab(corpus, 3)
    hits = query_string_table(
        d, [f"{a} {b}", f"{a} AND {b}", f'"{a} {b}"', f"{a[:2]}*"], cfg
    ).to_pandas()
    # every query id present in output order, ranks contiguous from 0
    assert set(hits.query_id) <= {0, 1, 2, 3}
    assert len(hits[hits.query_id == 0]) > 0
    for qid, g in hits.groupby("query_id"):
        assert list(g["rank"]) == list(range(len(g)))
    # AND results are a subset of OR results (same scores where present)
    or_set = set(zip(hits[hits.query_id == 0].conv_id,
                     hits[hits.query_id == 0].turn_idx))
    and_rows = hits[hits.query_id == 1]
    assert set(zip(and_rows.conv_id, and_rows.turn_idx)) <= or_set or len(
        and_rows
    ) == 0


def test_parse_boost():
    sp = parse_query("merge^2 window")
    assert sp.boosted and sp.text == "merge^2 window"
    sp = parse_query("merge^2.5 window^0.5 NOT part")
    assert sp.boosted and sp.exclude == "part"
    with pytest.raises(ValueError, match="OR queries only"):
        parse_query("merge^2 AND window")
    with pytest.raises(ValueError, match="OR queries only"):
        parse_query("merge^2 win~1")


def test_query_string_boosted(idx):
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    a, b = _vocab(corpus, 2)
    q = pa.table(
        {"query_id": pa.array([0], pa.int64()), "text": [f"{a}^2 {b}"],
         "limit": pa.array([10], pa.int32())}
    )
    want = search_table(d, q, cfg, boosted=True).to_pandas()
    got = query_string_table(d, [f"{a}^2 {b}"], cfg).to_pandas()
    assert len(got) == len(want) > 0
    assert np.array_equal(got["score"].values, want["score"].values)
    assert (got["conv_id"].values == want["conv_id"].values).all()


def test_phrase_without_positions_clear_error(ray_session, tmp_path):
    """A quoted-phrase query against an index built WITHOUT the positional
    artifact surfaces an actionable error naming the fix, not a raw
    missing-file traceback."""
    from clip_as_service_ray.config import EngineConfig
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.querylang import query_string_table
    from clip_as_service_ray.sources.transcripts import synthesize_transcripts

    cfg = EngineConfig(num_index_partitions=2, postings_block_size=64)
    d = str(tmp_path / "nopos")
    build_index(synthesize_transcripts(300, seed=7), d, cfg, overwrite=True)
    with pytest.raises(FileNotFoundError, match="positions"):
        query_string_table(d, ['"merge window"'], cfg)


def test_parse_suffix_regex():
    sp = parse_query("*ger")
    assert sp.suffix and sp.text == "ger" and not sp.prefix
    rx = parse_query("/m.rge/")
    assert rx.regex and rx.text == "m.rge"
    with pytest.raises(ValueError):
        parse_query("*ger other")
    with pytest.raises(ValueError):
        parse_query("/a/ AND b")


def test_query_string_suffix_regex_modes(idx):
    """*suffix == search_table(suffix=True); /regex/ == regex=True —
    score-identical through the parser path."""
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    vocab = _vocab(corpus, 4)
    term = max(vocab, key=len)
    suf = term[-2:]
    q = pa.table({"query_id": pa.array([0], pa.int64()), "text": [suf],
                  "limit": pa.array([10], pa.int32())})
    want = search_table(d, q, cfg, suffix=True).to_pandas()
    got = query_string_table(d, [f"*{suf}"], cfg).to_pandas()
    assert len(want) > 0 and len(got) == len(want)
    assert np.array_equal(got["score"].values, want["score"].values)

    pat = term[0] + ".*"
    qr = pa.table({"query_id": pa.array([0], pa.int64()), "text": [pat],
                   "limit": pa.array([10], pa.int32())})
    want_r = search_table(d, qr, cfg, regex=True).to_pandas()
    got_r = query_string_table(d, [f"/{pat}/"], cfg).to_pandas()
    assert len(want_r) > 0 and len(got_r) == len(want_r)
    assert np.array_equal(got_r["score"].values, want_r["score"].values)


def test_parse_term_range():
    sp = parse_query("[mer TO mes]")
    assert sp.term_range and sp.text == "[mer TO mes]"
    assert parse_query("{a TO b}").term_range
    assert not parse_query("a TO b").term_range  # no brackets -> plain OR


def test_query_string_term_range_mode(idx):
    """[lo TO hi] == search_table(term_range=True) — score-identical
    through the parser path."""
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    vocab = sorted(_vocab(corpus, 6))
    lo, hi = vocab[0], vocab[-1]
    rq = f"[{lo} TO {hi}]"
    q = pa.table({"query_id": pa.array([0], pa.int64()), "text": [rq],
                  "limit": pa.array([10], pa.int32())})
    want = search_table(d, q, cfg, term_range=True).to_pandas()
    got = query_string_table(d, [rq], cfg).to_pandas()
    assert len(want) > 0 and len(got) == len(want)
    assert np.array_equal(got["score"].values, want["score"].values)


def test_parse_occurs_bool():
    sp = parse_query("+merge window stream -part")
    assert sp.bool_query and sp.text == "merge"
    assert sp.should == "window stream" and sp.exclude == "part"
    # guards: occurs syntax takes plain terms, no AND
    for bad in ("+merge AND window", "+merge win*", "+mrge~2 window",
                "+merge window^2"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_query_string_occurs_matches_bool_call(idx):
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    vocab = _vocab(corpus, 4)
    a, b = vocab[0], vocab[1]
    q = pa.table(
        {"query_id": pa.array([0], pa.int64()), "text": [a],
         "should": [b], "limit": pa.array([10], pa.int32())}
    )
    want = search_table(d, q, cfg, bool_query=True).to_pandas()
    got = query_string_table(d, [f"+{a} {b}"], cfg).to_pandas()
    assert len(got) == len(want) > 0
    assert np.array_equal(got["score"].values, want["score"].values)
    assert (got["conv_id"].values == want["conv_id"].values).all()


def test_parse_general_wildcard():
    from clip_as_service_ray.pipelines.querylang import wildcard_to_regex

    sp = parse_query("s?a*")
    assert sp.regex and sp.text == "s.a.*"
    sp2 = parse_query("m*ge")
    assert sp2.regex and sp2.text == "m.*ge"
    sp3 = parse_query("a*b*")  # was silently matching nothing pre-wildcard
    assert sp3.regex and sp3.text == "a.*b.*"
    assert wildcard_to_regex("a.c*") == "a\\.c.*"  # literals escaped
    # pure edge patterns keep their dedicated (faster) kernels
    assert parse_query("mer*").prefix and not parse_query("mer*").regex
    assert parse_query("*ger").suffix and not parse_query("*ger").regex
    with pytest.raises(ValueError):
        parse_query("s?a* other")
    with pytest.raises(ValueError):
        parse_query("w?nd* AND b")


def test_query_string_general_wildcard_mode(idx):
    """s?a*-style patterns == search_table(regex=True) with the translated
    automaton — score-identical through the parser path."""
    from clip_as_service_ray.pipelines.search import search_table

    d, cfg, corpus = idx
    vocab = _vocab(corpus, 4)
    term = max(vocab, key=len)
    pat = term[0] + "?" + term[2:-1] + "*"  # w?ndo* shape from a real term
    rx = pa.table({"query_id": pa.array([0], pa.int64()),
                   "text": [parse_query(pat).text],
                   "limit": pa.array([10], pa.int32())})
    want = search_table(d, rx, cfg, regex=True).to_pandas()
    got = query_string_table(d, [pat], cfg).to_pandas()
    assert len(want) > 0 and len(got) == len(want)
    assert np.array_equal(got["score"].values, want["score"].values)


def test_parse_phrase_prefix():
    sp = parse_query('"the win*"')
    assert sp.phrase == "the win*" and sp.phrase_prefix and not sp.window
    with pytest.raises(ValueError):
        parse_query('"the win*"~3')  # no window composition
    with pytest.raises(ValueError):
        parse_query('"th* window"')  # wildcard only on the LAST term
    with pytest.raises(ValueError):
        parse_query('"the w?ndow"')  # ? unsupported inside phrases


def test_query_string_phrase_prefix_mode(idx):
    """quoted trailing-* == phrase_search_table(prefix_last=True)."""
    from clip_as_service_ray.pipelines.phrase import phrase_search_table

    from clip_as_service_ray.functions.tokenizer import tokenize

    d, cfg, corpus = idx
    # an adjacent pair straight out of a real document -> guaranteed hits
    a = b = None
    for text in corpus.column("text").to_pylist():
        toks = tokenize(text)  # raw stream: the pair must be ADJACENT
        if len(toks) >= 2:
            a, b = toks[0], toks[1]
            break
    body = f"{a} {b[:2]}*"
    qt = pa.table({"query_id": pa.array([0], pa.int64()), "text": [body],
                   "limit": pa.array([10], pa.int32())})
    want = phrase_search_table(d, qt, cfg, prefix_last=True).to_pandas()
    got = query_string_table(d, [f'"{body}"'], cfg).to_pandas()
    assert len(want) > 0 and len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()

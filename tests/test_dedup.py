"""Dedup suite: minhash/simhash kernels + Ray LSH pipelines find planted
duplicates and report exact-verified similarity."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.functions import minhash as mh


def test_hash_terms_deterministic():
    t = np.asarray(["alpha", "beta", "alpha"], dtype=object)
    h1, h2 = mh.hash_terms(t), mh.hash_terms(t)
    np.testing.assert_array_equal(h1, h2)
    assert h1[0] == h1[2] != h1[1]


def test_shingles_and_jaccard():
    a = mh.hash_terms(np.asarray("the quick brown fox jumps".split(), dtype=object))
    s_a = mh.shingle_hashes(a, n=3)
    assert len(s_a) == 3  # 5 terms -> 3 trigrams
    assert mh.jaccard(s_a, s_a) == 1.0
    b = mh.hash_terms(np.asarray("totally different words here now".split(), dtype=object))
    s_b = mh.shingle_hashes(b, n=3)
    assert mh.jaccard(s_a, s_b) == 0.0
    # short doc falls back to unigrams
    assert len(mh.shingle_hashes(a[:2], n=3)) == 2


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = rng.integers(1, 2**60, 500).astype(np.uint64)
    mod = base.copy()
    mod[:100] = rng.integers(1, 2**60, 100).astype(np.uint64)  # ~80% overlap
    a, b = mh.minhash_params(256)
    sa = mh.minhash_signature(np.unique(base), a, b)
    sb = mh.minhash_signature(np.unique(mod), a, b)
    est = np.mean(sa == sb)
    true = mh.jaccard(np.unique(base), np.unique(mod))
    assert abs(est - true) < 0.12


def test_simhash_properties():
    u = np.asarray(["a", "b", "c", "d"], dtype=object)
    h = mh.hash_terms(u)
    tf = np.array([3, 1, 1, 1])
    s1 = mh.simhash(h, tf)
    s2 = mh.simhash(h, tf)
    assert s1 == s2
    # near-identical docs -> small hamming; unrelated -> large
    tf2 = tf.copy(); tf2[1] += 1
    s3 = mh.simhash(h, tf2)
    d_near = mh.hamming64(np.array([s1], np.uint64), np.array([s3], np.uint64))[0]
    other = mh.simhash(mh.hash_terms(np.asarray(["x", "y", "z", "w"], dtype=object)), tf)
    d_far = mh.hamming64(np.array([s1], np.uint64), np.array([other], np.uint64))[0]
    assert d_near <= d_far


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(500)], dtype=object)
    texts = [" ".join(vocab[rng.integers(0, 500, 60)]) for i in range(200)]
    # planted near-dups: 200~201 identical, 202 = 200 with small edit
    texts.append(texts[0])
    t = texts[0].split(); t[5] = "changed"; texts.append(" ".join(t))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(tbl)


def test_minhash_lsh_finds_planted_dups(dup_corpus):
    from clip_as_service_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(dup_corpus, threshold=0.5).to_pandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 200) in found  # identical pair
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 200)]
    assert float(exact.jaccard.iloc[0]) == 1.0
    assert (0, 201) in found or (200, 201) in found  # near-dup pair


def test_simhash_finds_identical(dup_corpus):
    from clip_as_service_ray.stages.dedup import simhash_pairs

    pairs = simhash_pairs(dup_corpus, max_hamming=3).to_pandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 200) in found
    assert int(pairs[(pairs.doc_a == 0) & (pairs.doc_b == 200)].hamming.iloc[0]) == 0


def test_word_jaccard_pairs(dup_corpus):
    from clip_as_service_ray.stages.dedup import word_jaccard_pairs

    pairs = word_jaccard_pairs(dup_corpus, max_id=250, threshold=0.99).to_pandas()
    assert (0, 200) in set(zip(pairs.doc_a, pairs.doc_b))


def test_dedup_turns(ray_session):
    """Replayed transcript turns are removed (first-write-wins by ts) so
    indexing stays idempotent."""
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.dedup import dedup_turns

    t = pa.table(
        {
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": pa.array([0, 0, 1, 0], pa.int32()),
            "role": ["user"] * 4,
            "text": ["first write", "replayed dup", "next turn", "other"],
            "tool": [""] * 4,
            "ts": pa.array([10, 20, 30, 5], pa.timestamp("us")),
        }
    )
    out = dedup_turns(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 3
    kept = out.set_index(["conv_id", "turn_idx"]).text.to_dict()
    assert kept[("a", 0)] == "first write"  # earliest ts wins
    assert kept[("a", 1)] == "next turn"
    assert kept[("b", 0)] == "other"


def test_edit_distance_pairs_vs_bruteforce(ray_session):
    """Length-band blocked + capped-Levenshtein pairs == brute-force O(n^2)
    on a corpus with planted near-dups (band replication must not double
    count or drop cross-band pairs)."""
    import random

    import ray.data

    from clip_as_service_ray.stages.dedup import (
        _levenshtein_capped,
        edit_distance_pairs,
    )

    rng = random.Random(4)
    base = ["".join(rng.choice("abcdef ") for _ in range(rng.randint(3, 60)))
            for _ in range(30)]
    texts = list(base)
    for t in base[:8]:  # planted near-dups: small random edits
        mut = list(t)
        for _ in range(rng.randint(0, 4)):
            if mut and rng.random() < 0.5:
                mut.pop(rng.randrange(len(mut)))
            else:
                mut.insert(rng.randrange(len(mut) + 1), rng.choice("abcdef"))
        texts.append("".join(mut))
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    D = 6
    got = (
        edit_distance_pairs(ray.data.from_arrow(tbl), max_dist=D)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = _levenshtein_capped(texts[i], texts[j], D)
            if d <= D:
                want.append((i, j, d))
    assert list(map(tuple, got[["doc_a", "doc_b", "dist"]].to_numpy())) == want
    assert len(want) >= 8  # the planted near-dups were actually found


def test_sentence_dedup_planted_boilerplate(ray_session, tmp_path):
    """sentence_dedup finds planted repeated sentences (engine vs a DuckDB
    recomputation over the same synthetic punctuated corpus). The driver
    corpus has no punctuation, so the oracle entry is trivially empty —
    this pins the non-trivial path."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clip_as_service_ray.pipelines.operators import sentence_dedup

    boiler = "subscribe to our newsletter for updates"
    legal = "all rights reserved by the original author"
    docs = []
    for i in range(30):
        parts = [f"unique sentence number {i} with some extra words"]
        if i % 3 == 0:
            parts.append(boiler)
        if i % 5 == 0:
            parts.append(legal)
        docs.append(". ".join(parts) + ".")
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(docs)}),
        str(sf / "documents.parquet"),
    )
    got = sentence_dedup(str(sf)).to_pandas()
    want = duckdb.sql(
        "WITH s AS (SELECT DISTINCT doc_id, trim(unnest("
        "regexp_split_to_array(lower(text), '[.!?]+')), ' \t\n\r') AS sentence "
        f"FROM read_parquet('{sf}/documents.parquet')) "
        "SELECT sentence, count(*)::BIGINT AS n_docs FROM s "
        "WHERE len(sentence) >= 20 GROUP BY 1 HAVING count(*) >= 2 "
        "ORDER BY n_docs DESC, sentence LIMIT 20"
    ).df()
    assert got["sentence"].tolist() == want["sentence"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert boiler in got["sentence"].tolist() and legal in got["sentence"].tolist()


def test_dup_span_coverage_vs_bruteforce(ray_session):
    """Planted duplicated substrings: coverage == |union of [start, start+n)|
    over cross-doc n-grams, via a Python brute force — exercises overlapping
    runs, adjacent runs, repeated grams inside one doc (no double count),
    and docs with no cross-doc gram (absent from output)."""
    import random

    import ray.data

    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.stages.dedup import dup_span_coverage

    rng = random.Random(5)
    vocab = [f"w{c}" for c in "abcdefghijklmnopqrstuv"]
    boiler = "the quick brown fox jumps over the lazy dog today".split()
    legal = "all rights reserved by the original author hereof".split()
    docs = []
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        if i % 3 == 0:
            p = rng.randint(0, len(toks))
            toks[p:p] = boiler
        if i % 5 == 0:
            p = rng.randint(0, len(toks))
            toks[p:p] = legal + legal  # adjacent repeat inside one doc
        docs.append(" ".join(toks))
    n = 8
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = dup_span_coverage(ray.data.from_arrow(t), n=n).to_pandas()
    got = dict(zip(got["doc_id"], got["dup_tokens"]))

    toks_by_doc = [tokenize(x) for x in docs]
    gram_docs: dict[tuple, set] = {}
    for d, toks in enumerate(toks_by_doc):
        for i in range(len(toks) - n + 1):
            gram_docs.setdefault(tuple(toks[i:i + n]), set()).add(d)
    want = {}
    for d, toks in enumerate(toks_by_doc):
        covered = set()
        for i in range(len(toks) - n + 1):
            if len(gram_docs[tuple(toks[i:i + n])]) >= 2:
                covered.update(range(i, i + n))
        if covered:
            want[d] = len(covered)
    assert got == want and len(want) > 5


def test_osa_capped_contract_fuzz():
    """_osa_capped == the classic OSA DP whenever the true distance <= cap,
    and returns > cap otherwise (the only contract callers rely on); also
    the transposition cases plain Levenshtein prices higher."""
    import numpy as np

    from clip_as_service_ray.stages.dedup import _levenshtein_capped, _osa_capped

    def osa_ref(a, b):
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                c = 0 if a[i - 1] == b[j - 1] else 1
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + c)
                if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                        and a[i - 2] == b[j - 1]):
                    d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
        return d[la][lb]

    rng = np.random.default_rng(13)
    for _ in range(1500):
        a = "".join(rng.choice(list("abcd"), rng.integers(0, 9)))
        b = "".join(rng.choice(list("abcd"), rng.integers(0, 9)))
        for cap in (1, 2, 3):
            ref = osa_ref(a, b)
            got = _osa_capped(a, b, cap)
            assert got == ref if ref <= cap else got > cap
    # the ES-default metric: one adjacent swap = 1 edit
    assert _osa_capped("lswo", "slow", 2) == 2
    assert _levenshtein_capped("lswo", "slow", 2) == 3  # > cap
    assert _osa_capped("mrege", "merge", 2) == 1

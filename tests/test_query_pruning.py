"""MaxScore/block-max pruned scoring must be RANK-SAFE: identical doc ids
and bit-identical scores vs the exact TAAT path, over a corpus with a large
skewed vocabulary (where pruning actually triggers)."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.stages.query import IndexReader


def _word(i: int) -> str:
    # letters-only vocab words: the reference regex splits digits into
    # single tokens, so "t00025"-style names would collapse the vocabulary
    s = ""
    for _ in range(4):
        s += chr(97 + i % 26)
        i //= 26
    return "w" + s


def _big_vocab_corpus(n_docs=4000, vocab_size=2000, seed=13):
    rng = np.random.default_rng(seed)
    vocab = np.array([_word(i) for i in range(vocab_size)], dtype=object)
    p = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    p /= p.sum()
    dl = np.clip(rng.lognormal(2.5, 0.8, n_docs), 1, 200).astype(np.int64)
    flat = vocab[rng.choice(vocab_size, int(dl.sum()), p=p)]
    bounds = np.cumsum(dl)[:-1]
    texts = [" ".join(c) for c in np.split(flat, bounds)]
    return pa.table(
        {
            "conv_id": pa.array([f"c{i:07d}" for i in range(n_docs)]),
            "turn_idx": pa.array(np.zeros(n_docs, dtype=np.int32), pa.int32()),
            "role": pa.array(["user"] * n_docs),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n_docs),
            "ts": pa.array(np.zeros(n_docs, dtype=np.int64), pa.timestamp("us")),
        }
    )


@pytest.fixture(scope="module")
def reader(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("prune") / "index")
    cfg = EngineConfig(num_index_partitions=4, postings_block_size=64)
    build_index(_big_vocab_corpus(), index_dir, cfg, overwrite=True)
    return IndexReader(index_dir)


def test_pruned_equals_exact(reader):
    rng = np.random.default_rng(99)
    vocab = [_word(i) for i in range(2000)]
    queries = []
    for _ in range(120):
        k = rng.integers(1, 7)
        # mix hot (low index) and rare (high index) terms
        idx = np.concatenate(
            [rng.integers(0, 50, (k + 1) // 2), rng.integers(50, 2000, k // 2)]
        )
        queries.append(" ".join(vocab[i] for i in idx))
    queries += [_word(0), "wzzzzz zz", "", " ".join(_word(i) for i in range(5))]

    n_compared = 0
    for q in queries:
        for limit in (1, 10):
            d_ex, s_ex = reader.score_query(q, limit)
            d_pr, s_pr = reader.score_query_pruned(q, limit)
            assert d_ex.tolist() == d_pr.tolist(), f"doc mismatch for {q!r}"
            np.testing.assert_array_equal(s_ex, s_pr, err_msg=f"score mismatch for {q!r}")
            n_compared += len(d_ex)
    assert n_compared > 500


def test_term_upper_bound_is_bound(reader):
    for t in [_word(0), _word(50), _word(1500)]:
        ds_ = reader.term_docs_scores(t)
        if ds_ is None:
            continue
        ub = reader.term_upper_bound(t)
        assert np.max(ds_[1]) <= ub + 1e-12


def test_lazy_block_decode_skips_blocks(reader):
    """Block-max WAND's lazy half: a fresh reader answering mixed queries
    must decode strictly fewer blocks than the index holds — gather/re-score
    phases touch only blocks whose doc range contains a candidate."""
    from clip_as_service_ray.stages.query import IndexReader

    fresh = IndexReader(reader.index_dir)
    assert fresh.blocks_total > 0 and fresh.blocks_decoded == 0
    vocab = [_word(i) for i in range(2000)]
    # rare leading term + hot tail terms: the hot terms land in the
    # gather-only phase, where full decode would be the scale hazard
    queries = [
        f"{vocab[1500]} {vocab[0]} {vocab[1]}",
        f"{vocab[1800]} {vocab[2]} {vocab[3]}",
        f"{vocab[1200]} {vocab[4]}",
    ]
    for q in queries:
        d_pr, s_pr = fresh.score_query_pruned(q, 10)
        d_ex, s_ex = reader.score_query(q, 10)
        assert d_pr.tolist() == d_ex.tolist()
        np.testing.assert_array_equal(s_pr, s_ex)
    assert 0 < fresh.blocks_decoded < fresh.blocks_total


def test_chunked_dense_identical(reader, tmp_path):
    """Memory-bounded chunked dense path == unbounded dense path,
    bit-identical, across chunk sizes that force many chunks."""
    from clip_as_service_ray.stages.query import IndexReader

    vocab = [_word(i) for i in range(2000)]
    queries = [vocab[0], f"{vocab[0]} {vocab[1]} {vocab[7]}",
               f"{vocab[100]} {vocab[900]}", "wzzzzz"]
    small = IndexReader(reader.index_dir, dense_chunk_docs=257)
    tiny = IndexReader(reader.index_dir, dense_chunk_docs=4096)
    for q in queries:
        for limit in (1, 5, 10):
            d_ex, s_ex = reader.score_query(q, limit)
            for r in (small, tiny):
                d_ch, s_ch = r.score_query(q, limit)
                assert d_ch.tolist() == d_ex.tolist(), q
                np.testing.assert_array_equal(s_ch, s_ex, err_msg=q)

"""BPE (SURVEY §2.2 M5): kernels vs naive twins, distributed vs local."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.functions.bpe import (
    bpe_decode,
    bpe_word,
    bytes_to_unicode,
    merge_ranks,
    train_bpe,
    word_symbols,
)
from clip_as_service_ray.functions.tokenizer import tokenize

SF = "/root/testdata/sf0.001"


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("a")] == "a"  # printable bytes map to themselves


def test_word_symbols_framing():
    assert word_symbols("") == ()
    assert word_symbols("a") == ("a</w>",)
    syms = word_symbols("cat")
    assert syms[:2] == ("c", "a") and syms[2].endswith("</w>")


def _naive_train(word_freqs, num_merges):
    """Brute-force trainer: recount every pair each iteration."""
    words = {w: list(word_symbols(w)) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        ab = best[0] + best[1]
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if syms[i] == best[0] and i + 1 < len(syms) and syms[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_trainer_matches_naive():
    rng = np.random.default_rng(7)
    vocab = ["hello", "help", "held", "world", "word", "work", "token", "tokens",
             "low", "lower", "lowest", "new", "newer", "a", "ab", "abc"]
    freqs = {w: int(rng.integers(1, 50)) for w in vocab}
    got = train_bpe(freqs, 40)
    want = _naive_train(freqs, 40)
    assert got == want
    assert len(got) > 5  # actually learned something


def test_trainer_stops_at_hapax():
    # every pair occurs once -> nothing to learn
    assert train_bpe({"xy": 1, "qz": 1}, 10) == []


def test_encode_greedy_rank_order():
    # ranks force 'l'+'o' before 'lo'+'w</w>'
    merges = [("l", "o"), ("lo", "w</w>")]
    ranks = merge_ranks(merges)
    assert bpe_word("low", ranks) == ("low</w>",)
    assert bpe_word("lot", ranks) == ("lo", "t</w>")
    assert bpe_word("z", ranks) == ("z</w>",)
    # cache round-trip returns identical object
    cache = {}
    a = bpe_word("low", ranks, cache)
    assert bpe_word("low", ranks, cache) is a


def test_decode_round_trip():
    freqs = {"hello": 5, "world": 4, "help": 3}
    ranks = merge_ranks(train_bpe(freqs, 20))
    for w in freqs:
        assert bpe_decode(bpe_word(w, ranks)) == w
    # non-ascii survives the byte map
    assert bpe_decode(bpe_word("café", {})) == "café"


def test_word_frequencies_matches_counter(ray_session):
    import ray.data

    from clip_as_service_ray.stages.bpe import word_frequencies

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = word_frequencies(ds, min_count=2)

    from collections import Counter

    c = Counter()
    for t in tbl.column("text").to_pylist():
        c.update(tokenize(t))
    want = sorted((w, n) for w, n in c.items() if n >= 2)
    assert list(zip(got.column("word").to_pylist(),
                    got.column("n").to_pylist())) == want


def test_distributed_encode_matches_local(ray_session):
    import ray.data

    from clip_as_service_ray.stages.bpe import bpe_encode, train_bpe_from_dataset

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.slice(0, 200)
    ds = ray.data.from_arrow(tbl).repartition(3)
    merges = train_bpe_from_dataset(ds, num_merges=64, min_count=2)
    assert len(merges) > 10

    out = bpe_encode(ds, merges).to_pandas().sort_values("doc_id")
    ranks = merge_ranks(merges)
    cache = {}
    for _, row in out.iterrows():
        text = tbl.column("text")[int(np.flatnonzero(
            tbl.column("doc_id").to_numpy() == row["doc_id"])[0])].as_py()
        want = [t for w in tokenize(text) for t in bpe_word(w, ranks, cache)]
        assert list(row["bpe_tokens"]) == want
        assert row["n_bpe_tokens"] == len(want)


def test_bpe_vocab_top_tokens_operator(ray_session):
    from clip_as_service_ray.pipelines.operators import bpe_vocab_top_tokens

    got = bpe_vocab_top_tokens(SF, num_merges=64, k=15)
    assert got.num_rows == 15
    ns = got.column("n").to_numpy()
    assert np.all(ns[:-1] >= ns[1:])  # sorted by count desc
    # deterministic across runs
    again = bpe_vocab_top_tokens(SF, num_merges=64, k=15)
    assert got.equals(again)

"""Unigram-LM tokenizer (functions/unigram.py + the distributed trainer):
lattice math vs brute-force enumeration, and distributed == local-reference
training on the same corpus."""

import math

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.unigram import (
    forward_backward,
    normalize_logprobs,
    seed_candidates,
    train_unigram,
    viterbi,
)


def all_segmentations(word, pieces):
    """Every way to cover word with vocabulary pieces."""
    n = len(word)
    outs = []

    def rec(i, acc):
        if i == n:
            outs.append(list(acc))
            return
        for j in range(i + 1, n + 1):
            if word[i:j] in pieces:
                acc.append(word[i:j])
                rec(j, acc)
                acc.pop()

    rec(0, [])
    return outs


def test_forward_backward_matches_enumeration():
    probs = {"a": 0.4, "b": 0.3, "ab": 0.2, "ba": 0.1}
    lp = {k: math.log(v) for k, v in probs.items()}
    for word in ["abab", "aab", "bbaa", "ab"]:
        segs = all_segmentations(word, probs)
        z = sum(np.prod([probs[p] for p in s]) for s in segs)
        expected = {}
        for s in segs:
            w = np.prod([probs[p] for p in s]) / z
            for p in s:
                expected[p] = expected.get(p, 0.0) + w
        counts, logz = forward_backward(word, lp, max_len=2)
        assert math.isclose(logz, math.log(z), rel_tol=1e-12)
        assert set(counts) == set(expected)
        for p in expected:
            assert math.isclose(counts[p], expected[p], rel_tol=1e-12)


def test_forward_backward_uncoverable():
    counts, z = forward_backward("xyz", {"x": -1.0}, max_len=2)
    assert counts == {} and z == float("-inf")


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(3)
    alphabet = "abc"
    vocab = ["a", "b", "c", "ab", "bc", "ca", "abc", "cc"]
    pr = rng.random(len(vocab))
    probs = dict(zip(vocab, pr / pr.sum()))
    lp = {k: math.log(v) for k, v in probs.items()}
    for _ in range(30):
        word = "".join(rng.choice(list(alphabet), size=rng.integers(1, 8)))
        segs = all_segmentations(word, probs)
        got = viterbi(word, lp, max_len=3)
        if not segs:
            assert got is None
            continue
        best = max(sum(math.log(probs[p]) for p in s) for s in segs)
        assert got is not None
        got_lp = sum(math.log(probs[p]) for p in got)
        assert math.isclose(got_lp, best, rel_tol=1e-12)


def test_viterbi_concatenates_to_word():
    lp = normalize_logprobs({"a": 5, "b": 3, "ab": 4, "ba": 2})
    for word in ["abba", "aab", "baba"]:
        assert "".join(viterbi(word, lp, max_len=2)) == word


def test_seed_keeps_all_single_chars():
    seeds = seed_candidates({"abc": 10, "abd": 5}, max_len=3, seed_size=4)
    assert {"a", "b", "c", "d"} <= set(seeds)


def test_train_learns_frequent_subword():
    # 'ing' appears in many words: it must survive to the final vocab
    words = {
        "walking": 50, "talking": 50, "running": 50, "jumping": 50,
        "walk": 20, "talk": 20, "run": 20, "jump": 20, "zeb": 1,
    }
    vocab = train_unigram(words, vocab_size=24, seed_size=100, max_len=4)
    assert "ing" in vocab
    assert abs(sum(vocab.values()) - 1.0) < 1e-9
    lp = {k: math.log(v) for k, v in vocab.items()}
    for w in words:
        assert viterbi(w, lp, max_len=4) is not None  # full coverage


def test_distributed_trainer_matches_local(ray_session, tmp_path):
    import ray.data
    import pyarrow.parquet as pq

    import clip_as_service_ray.pipelines.operators as ops

    docs = [
        "walking talking runner",
        "walking walker talking",
        "runner running walk talk",
        "talking walking running runner",
    ] * 3
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string()),
         "lang": pa.array(["en"] * len(docs)),
         "source": pa.array(["s"] * len(docs)),
         "n_chars": pa.array([len(d) for d in docs], pa.int64())}
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    kw = dict(vocab_size=16, seed_size=64, max_len=4, em_rounds=2,
              prune_rounds=2, keep_fraction=0.75)
    got = ops.unigram_lm_vocab(sf_dir, **kw).to_pandas()

    wc = {}
    for d in docs:
        for w in d.split():
            wc[w] = wc.get(w, 0) + 1
    want = train_unigram(wc, **kw)
    order = sorted(want, key=lambda p: (-want[p], p))
    assert list(got["piece"]) == order
    for p, pr in zip(got["piece"], got["prob"]):
        assert abs(pr - round(want[p], 6)) < 2e-6, (p, pr, want[p])

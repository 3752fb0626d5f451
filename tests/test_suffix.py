"""Distributed suffix array (stages/suffix.py): differential tests vs a
naive brute-force longest-repeated-sequence over small corpora, including
block-boundary adversarial splits and cross-document non-matches."""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.suffix import (
    _scan_runs,
    _summarize,
    longest_repeated_sequence,
    lrs_from_candidates,
)


def brute_lrs(docs: list[str]):
    """Naive reference: every (doc, start, len) substring, max len with
    count >= 2, lexicographic-min sequence on ties."""
    from collections import Counter

    counts = Counter()
    for text in docs:
        toks = text.split()
        for st in range(len(toks)):
            for ln in range(1, len(toks) - st + 1):
                counts[tuple(toks[st : st + ln])] += 1
    best = (0, (), 0)
    for seq, cnt in counts.items():
        if cnt >= 2:
            key = (len(seq), seq)
            if best[0] < len(seq) or (best[0] == len(seq) and seq < best[1]):
                if len(seq) > best[0]:
                    best = (len(seq), seq, cnt)
                elif seq < best[1]:
                    best = (len(seq), seq, cnt)
    return best


def brute_lrs_tokens(docs_tokens):
    """brute_lrs over pre-tokenized docs (engine-tokenizer token lists)."""
    from collections import Counter

    counts = Counter()
    for toks in docs_tokens:
        for st in range(len(toks)):
            for ln in range(1, len(toks) - st + 1):
                counts[tuple(toks[st : st + ln])] += 1
    best = (0, (), 0)
    for seq, cnt in counts.items():
        if cnt >= 2 and (
            len(seq) > best[0] or (len(seq) == best[0] and seq < best[1])
        ):
            best = (len(seq), seq, cnt)
    return best


def run_engine(docs: list[str], blocks: int = 3):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    if blocks > 1:
        ds = ds.repartition(blocks)
    return longest_repeated_sequence(ds)


def check(docs, blocks=3):
    want = brute_lrs(docs)
    got_len, got_terms, got_cnt = run_engine(docs, blocks=blocks)
    assert (got_len, tuple(got_terms), got_cnt) == want, (docs, want, (got_len, got_terms, got_cnt))


def test_planted_long_dup(ray_session):
    dup = "alpha beta gamma delta epsilon zeta"
    docs = [
        "one two " + dup + " three",
        "four " + dup + " five six",
        "seven eight nine",
    ]
    check(docs)


def test_overlapping_self_repeat(ray_session):
    # "a a a a": LRS = "a a a" occurring at starts 0 and 1 (overlap counts)
    check(["a a a a", "b c d"])


def test_no_cross_doc_match(ray_session):
    # "x y" at the END of doc0 and START of doc1 would only form a longer
    # match if comparisons crossed the boundary — they must not
    check(["p q x y", "x y r s"])


def test_no_repeats_at_all(ray_session):
    got = run_engine(["a b c", "d e f", "g h"])
    assert got == (0, (), 0)


def test_single_token_repeat(ray_session):
    # LRS of length exactly 1
    check(["a b", "c a", "d e"])


def test_tie_breaks_lexicographic(ray_session):
    # two distinct length-2 repeats: "m n" and "k l" -> pick "k l"
    check(["m n x k l", "m n y k l"])


def test_empty_and_blank_docs(ray_session):
    check(["", "a b a b", "", "z"], blocks=4)


def test_randomized_vs_brute(ray_session):
    rng = np.random.default_rng(7)
    words = ["w" + chr(ord("a") + i) for i in range(6)]
    for trial in range(4):
        docs = [
            " ".join(rng.choice(words, size=rng.integers(1, 18)))
            for _ in range(rng.integers(2, 8))
        ]
        check(docs, blocks=int(rng.integers(1, 5)))


def test_scan_runs_boundary_chain():
    # a run spanning three blocks (whole middle block one run) must be
    # detected as a duplicate and carried-start propagated
    keys = ["r1"]
    t1 = pa.table({"pos": pa.array([0, 1], pa.int64()), "r1": pa.array([5, 7], pa.int64())})
    t2 = pa.table({"pos": pa.array([2, 3], pa.int64()), "r1": pa.array([7, 7], pa.int64())})
    t3 = pa.table({"pos": pa.array([4, 5], pa.int64()), "r1": pa.array([7, 9], pa.int64())})
    summaries = [_summarize(t, keys) for t in (t1, t2, t3)]
    offsets, carried, lead_dup, tail_dup, any_dup = _scan_runs(summaries)
    assert any_dup
    assert offsets == [0, 2, 4]
    assert carried[1] == 1 and carried[2] == 1  # run of 7s starts at idx 1
    assert tail_dup[0] and lead_dup[1] and lead_dup[2]


def test_lrs_from_candidates_runs():
    # one group, windows crafted so cps = [2, 1, 2]: two distinct length-2
    # sequences; lexicographic-min picked
    wins = {
        0: np.array([1, 2, 9, -1], np.int64),
        1: np.array([1, 2, 8, -2], np.int64),
        2: np.array([1, 3, 9, -3], np.int64),
        3: np.array([1, 3, 8, -4], np.int64),
    }
    groups = {0: np.array([0, 1, 2, 3], np.int64)}
    length, seq, cnt = lrs_from_candidates(groups, wins, n_vocab=10)
    assert (length, seq, cnt) == (2, (1, 2), 2)


def test_digit_words_vs_brute(ray_session):
    # the reference tokenizer splits digit runs into SINGLE digit tokens
    # ("w015" -> w,0,1,5): tiny alphabet, deep doubling levels, planted
    # passage whose occurrences extend by coincidental digit matches —
    # the stress shape the letter-only cases never hit
    rng = np.random.default_rng(1)
    words = np.array(["w%03d" % i for i in range(50)])
    plant = " ".join(words[rng.integers(0, 50, 8)])
    docs = []
    for i in range(60):
        t = " ".join(words[rng.integers(0, 50, rng.integers(5, 12))])
        if i % 17 == 3:
            t = t + " " + plant
        docs.append(t)
    from clip_as_service_ray.functions.tokenizer import tokenize_texts

    want = brute_lrs_tokens([tokenize_texts([d])[0] for d in docs])
    got_len, got_terms, got_cnt = run_engine(docs, blocks=5)
    assert (got_len, tuple(got_terms), got_cnt) == want

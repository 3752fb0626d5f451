"""Unigram language-model tokenizer (Kudo 2018, "Subword Regularization",
arXiv:1804.10959 — the SentencePiece unigram trainer), from scratch.

Pure lattice math lives here (forward-backward expected counts, Viterbi
segmentation, the seed/EM/prune loop); the DISTRIBUTED trainer in
``pipelines/operators.py`` reuses these kernels per batch over the
deduplicated (word, freq) table with broadcast piece log-probs — the
standard unigram-LM working-set trick: every EM pass costs
O(distinct words x len x max_piece_len), independent of corpus size,
and only piece-vocabulary-sized partials cross the wire.

Simplification vs SentencePiece, documented: pruning drops the lowest
expected-count pieces per round (keeping all single characters for full
coverage) instead of the exact leave-one-out likelihood loss; with the
same seed and schedule the trainer is deterministic.
"""

from __future__ import annotations

import math

import numpy as np

_NEG_INF = float("-inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def word_lattice_pieces(word: str, logprob: dict, max_len: int):
    """Yield (start, end, piece, lp) for every vocabulary piece spanning a
    substring of ``word``."""
    n = len(word)
    for i in range(n):
        hi = min(n, i + max_len)
        for j in range(i + 1, hi + 1):
            piece = word[i:j]
            lp = logprob.get(piece)
            if lp is not None:
                yield i, j, piece, lp


def forward_backward(word: str, logprob: dict, max_len: int):
    """Expected piece counts for one word under the unigram LM.

    Returns (counts dict piece -> E[count], log-likelihood). Words with no
    full segmentation (missing character coverage) return ({}, -inf)."""
    n = len(word)
    edges = list(word_lattice_pieces(word, logprob, max_len))
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i, j, _, lp in edges:  # edges iterate in increasing i
        if alpha[i] != _NEG_INF:
            alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    if alpha[n] == _NEG_INF:
        return {}, _NEG_INF
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i, j, _, lp in reversed(edges):
        if beta[j] != _NEG_INF:
            beta[i] = _logsumexp2(beta[i], lp + beta[j])
    z = alpha[n]
    counts: dict[str, float] = {}
    for i, j, piece, lp in edges:
        if alpha[i] == _NEG_INF or beta[j] == _NEG_INF:
            continue
        p = math.exp(alpha[i] + lp + beta[j] - z)
        counts[piece] = counts.get(piece, 0.0) + p
    return counts, z


def viterbi(word: str, logprob: dict, max_len: int):
    """Best segmentation (max joint log-prob); ties break toward FEWER,
    LONGER pieces (the backtrack keeps the earliest best predecessor with
    the longest piece, deterministic). Returns list of pieces, or None when
    the word cannot be covered."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        lo = max(0, j - max_len)
        for i in range(lo, j):
            if best[i] == _NEG_INF:
                continue
            lp = logprob.get(word[i:j])
            if lp is None:
                continue
            cand = best[i] + lp
            # strictly-greater keeps the SMALLEST i on ties = longest piece
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    if best[n] == _NEG_INF:
        return None
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def seed_candidates(word_counts: dict, max_len: int, seed_size: int):
    """Seed vocabulary: every substring up to ``max_len`` weighted by word
    frequency, capped to the ``seed_size`` most frequent (single characters
    always kept for coverage). Deterministic: ties break lexicographically."""
    subs: dict[str, float] = {}
    chars: set[str] = set()
    for word, freq in word_counts.items():
        n = len(word)
        chars.update(word)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                s = word[i:j]
                subs[s] = subs.get(s, 0.0) + freq
    multi = sorted(
        (s for s in subs if len(s) > 1), key=lambda s: (-subs[s], s)
    )[: max(0, seed_size - len(chars))]
    return {s: subs[s] for s in sorted(chars | set(multi))}


def normalize_logprobs(counts: dict) -> dict:
    total = sum(counts.values())
    if total <= 0:
        return {}
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def prune(counts: dict, keep_fraction: float, vocab_size: int) -> dict:
    """Drop the lowest-expected-count multi-char pieces (keep all single
    chars); never below ``vocab_size``. Deterministic tie-break."""
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    target = max(vocab_size - len(singles), int(len(multi) * keep_fraction))
    kept = dict(multi[:target])
    kept.update(singles)
    return kept


def train_unigram(
    word_counts: dict,
    *,
    vocab_size: int = 64,
    seed_size: int = 512,
    max_len: int = 8,
    em_rounds: int = 2,
    prune_rounds: int = 3,
    keep_fraction: float = 0.75,
) -> dict:
    """Local reference trainer (the distributed operator runs the same
    schedule with map_batches E-steps). Returns piece -> prob."""
    counts = seed_candidates(word_counts, max_len, seed_size)
    logprob = normalize_logprobs(counts)
    expected: dict[str, float] = {}  # degenerate schedules mirror the
    # distributed trainer: zero rounds -> empty vocabulary, not NameError
    for _ in range(prune_rounds):
        for _ in range(em_rounds):
            expected: dict[str, float] = {}
            for word, freq in word_counts.items():
                c, _ = forward_backward(word, logprob, max_len)
                for p, v in c.items():
                    expected[p] = expected.get(p, 0.0) + freq * v
            logprob = normalize_logprobs(expected)
        expected = prune(expected, keep_fraction, vocab_size)
        logprob = normalize_logprobs(expected)
    # final shrink to the requested size
    final = prune(expected, 0.0, vocab_size)
    return {p: math.exp(lp) for p, lp in normalize_logprobs(final).items()}

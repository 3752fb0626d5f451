"""Text analysis kernels: language-ID heuristic, quality scoring, token
counting, rolling-hash document fingerprinting.

Pure functions over term lists / strings — the text-analysis operators of a
large-scale training-data pipeline (SURVEY-mandated extensions; the
reference's only text analytics is tokenization itself).
"""

from __future__ import annotations

import numpy as np

# small stopword profiles per language for the n-gram/stopword-hit heuristic
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as was at by".split()),
    "de": frozenset("der die das und ist nicht ich du mit ein eine zu den von".split()),
    "fr": frozenset("le la les et est pas je tu avec un une pour dans de du".split()),
    "es": frozenset("el la los las y es no yo con un una para en de del".split()),
}


def detect_language(terms: list[str]) -> str:
    """Argmax of stopword hits; 'und' (undetermined) when nothing matches.
    Deterministic tie-break: lexicographically smallest language code."""
    if not terms:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in sorted(LANG_STOPWORDS):
        hits = sum(1 for t in terms if t in LANG_STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def quality_features(text: str) -> dict[str, float]:
    """Cheap quality signals: length, token stats, punctuation/digit/upper
    ratios, mean word length — the usual pre-training filter features."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    if n_chars == 0:
        return {
            "n_chars": 0, "n_tokens": 0, "mean_token_len": 0.0,
            "punct_ratio": 0.0, "digit_ratio": 0.0, "upper_ratio": 0.0,
        }
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    n_digit = sum(1 for c in text if c.isdigit())
    n_upper = sum(1 for c in text if c.isupper())
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0,
        "punct_ratio": n_punct / n_chars,
        "digit_ratio": n_digit / n_chars,
        "upper_ratio": n_upper / n_chars,
    }


_FP_BASE = np.uint64(1099511628211)  # FNV prime as the rolling base


def fingerprint(term_hashes: np.ndarray) -> np.uint64:
    """Order-sensitive rolling-hash fingerprint of a document's term-hash
    sequence (polynomial rolling hash mod 2^64). Equal texts -> equal
    fingerprints; any reordering changes it."""
    acc = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is intended
        for h in term_hashes:
            acc = acc * _FP_BASE ^ np.uint64(h)
    return acc


def fingerprint_batch(term_hash_lists: list[np.ndarray]) -> np.ndarray:
    return np.array([fingerprint(h) for h in term_hash_lists], dtype=np.uint64)

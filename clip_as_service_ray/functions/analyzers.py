"""Analyzer chain applied AFTER tokenization, symmetrically at index build
and at query time — the classic full-text analyzer contract (Lucene's
analyzer/stemmer stack; the reference normalizes only via its tokenizer,
``server/clip_server/model/simple_tokenizer.py:58-92``, so this is an engine
addition, not a parity requirement).

An analyzer is a token -> token map (1:1, never drops): document lengths,
positions and the drop-empty rule are all computed on the RAW token stream
and stay identical across analyzers. Only the term identity folds. The
analyzer name is recorded in the index's ``stats.json`` and auto-applied to
every query path (OR/AND/NOT/prefix/fuzzy/phrase/encode), so an index is
self-describing — a query never needs to know how the index was built.

Vectorization: the hot path folds each DISTINCT token once per batch
(``fold_dictionary`` works on the dictionary-encoded stream — zipfian text
makes distinct counts tiny next to occurrence counts) and remaps the code
array with one numpy gather.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.stem import porter_stem


def _stem_token(t: str) -> str:
    # non-alphabetic tokens (digit singletons, punctuation runs,
    # contraction suffixes like 's) are not words: pass through unchanged
    return porter_stem(t) if t.isalpha() else t


ANALYZERS = {
    "stem": _stem_token,
}


def check_analyzer(name: str | None) -> str | None:
    if name is not None and name not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer {name!r} (known: {sorted(ANALYZERS)})"
        )
    return name


def fold_tokens(name: str | None, tokens) -> list[str]:
    """Fold a (query-sized) token list under the named analyzer."""
    if not name:
        return list(tokens)
    fn = ANALYZERS[name]
    return [fn(t) for t in tokens]


def fold_dictionary(
    name: str | None, dict_arr: pa.Array, codes: np.ndarray
) -> tuple[pa.Array, np.ndarray]:
    """Fold a dictionary-encoded token stream: stem each DISTINCT token
    once, re-factorize (folding can merge dictionary entries), and remap
    the occurrence-level code array with one gather. Returns the new
    (dictionary, codes) pair; no-op when ``name`` is falsy."""
    if not name:
        return dict_arr, codes
    fn = ANALYZERS[name]
    folded = pa.array([fn(t) for t in dict_arr.to_pylist()], pa.string())
    senc = folded.dictionary_encode()
    remap = senc.indices.to_numpy().astype(np.int64)
    return senc.dictionary, remap[codes]

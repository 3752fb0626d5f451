"""Analyzer chain applied AFTER tokenization, symmetrically at index build
and at query time — the classic full-text analyzer contract (Lucene's
analyzer/stemmer stack; the reference normalizes only via its tokenizer,
``server/clip_server/model/simple_tokenizer.py:58-92``, so this is an engine
addition, not a parity requirement).

An analyzer is a chain of two kinds of component, applied in Lucene order:
STREAM-level filters that may DROP tokens (stopword removal — document
lengths count the survivors, positions are over the filtered stream, and a
doc losing every token falls to the drop-empty rule), then DICTIONARY-level
1:1 folds (stemming — dl/N/avgdl invariant). The analyzer name is recorded
in the index's ``stats.json`` and auto-applied to every query path
(OR/AND/NOT/prefix/fuzzy/phrase/encode), so an index is self-describing —
a query never needs to know how the index was built.

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


# the classic Lucene English stop set (StopAnalyzer.ENGLISH_STOP_WORDS_SET —
# a public-domain 33-word list), used by the "stop" component
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

# analyzer names: components applied in Lucene order — stop filtering first
# (STREAM level: drops tokens, so document lengths count surviving tokens
# and all-stopword docs fall to the drop-empty rule), then stemming
# (DICTIONARY level: 1:1 fold of each distinct surviving token)
ANALYZERS = ("stem", "stop", "stop+stem")


def _components(name: str | None) -> tuple[bool, bool]:
    """-> (stop, stem) component flags."""
    if not name:
        return False, False
    parts = set(name.split("+"))
    return "stop" in parts, "stem" in parts


def check_analyzer(name: str | None) -> str | None:
    if name is not None and name not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer {name!r} (known: {sorted(ANALYZERS)})"
        )
    return name


def fold_tokens(name: str | None, tokens) -> list[str]:
    """Fold a (query-sized) token list under the named analyzer: stop
    filtering drops tokens, stemming maps the survivors."""
    stop, stem = _components(name)
    toks = list(tokens)
    if stop:
        toks = [t for t in toks if t not in STOPWORDS]
    if stem:
        toks = [_stem_token(t) for t in toks]
    return toks


def stream_filter(
    name: str | None, flat_tokens: pa.Array, dl: np.ndarray
) -> tuple[pa.Array, np.ndarray]:
    """Apply the STREAM-level (token-dropping) analyzer components to a
    flat (tokens, per-row lengths) pair — one vectorized ``is_in`` over the
    Arrow array, per-row survivor counts by bincount. Rows that lose every
    token come back with dl=0 and fall to the caller's drop-empty rule.
    No-op (zero-copy) when the analyzer has no stop component."""
    stop, _ = _components(name)
    if not stop or len(flat_tokens) == 0:
        return flat_tokens, dl
    import pyarrow.compute as pc

    keep = pc.invert(
        pc.is_in(flat_tokens, value_set=pa.array(sorted(STOPWORDS), pa.string()))
    )
    keep_np = keep.to_numpy(zero_copy_only=False)
    rows_rep = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    new_dl = np.bincount(rows_rep[keep_np], minlength=len(dl)).astype(dl.dtype)
    return flat_tokens.filter(keep), new_dl


def fold_dictionary(
    name: str | None, dict_arr: pa.Array, codes: np.ndarray
) -> tuple[pa.Array, np.ndarray]:
    """Apply the DICTIONARY-level (1:1) analyzer components to a
    dictionary-encoded token stream: stem each DISTINCT token once,
    re-factorize (folding can merge dictionary entries), and remap the
    occurrence-level code array with one gather. Returns the new
    (dictionary, codes) pair; no-op when no stem component. The stop
    component is NOT applied here — callers run ``stream_filter`` on the
    flat stream first (lengths must count surviving tokens)."""
    _, stem = _components(name)
    if not stem:
        return dict_arr, codes
    folded = pa.array(
        [_stem_token(t) for t in dict_arr.to_pylist()], pa.string()
    )
    senc = folded.dictionary_encode()
    remap = senc.indices.to_numpy().astype(np.int64)
    return senc.dictionary, remap[codes]

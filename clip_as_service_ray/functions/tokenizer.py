"""Text canonicalization + term splitting.

Semantics cloned from the reference tokenizer
(``/root/reference/server/clip_server/model/simple_tokenizer.py``):

- ``basic_clean``      = ftfy.fix_text + html.unescape twice + strip
                         (simple_tokenizer.py:58-61)
- ``whitespace_clean`` = collapse ``\\s+`` -> ' ' + strip
                         (simple_tokenizer.py:64-67)
- lowercase            (simple_tokenizer.py:137)
- term split           = regex findall with the reference pattern
                         (simple_tokenizer.py:89-92): contraction suffixes,
                         unicode letter runs, single digits, punctuation runs.

We stop at words (SURVEY.md M4): BM25 terms are these regex tokens; the BPE
subword stage (M5) is not needed for term scoring.

ftfy is not available in this environment; it is imported best-effort and
falls back to identity (documented in tests — mojibake cases are skipped).
"""

from __future__ import annotations

import html

import numpy as np

try:  # pragma: no cover - environment-dependent
    import ftfy

    _fix_text = ftfy.fix_text
    _HAS_FTFY = True
except ImportError:  # pragma: no cover
    def _fix_text(text: str) -> str:
        return text

    _HAS_FTFY = False

try:
    import regex as _re

    # exact reference pattern, simple_tokenizer.py:89-92
    TOKEN_PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - `regex` is available in this env
    import re as _re

    # \p{L}/\p{N} unavailable in stdlib re; \w-based approximation
    TOKEN_PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|[^\s\w]+""",
        _re.IGNORECASE | _re.UNICODE,
    )

_WS = _re.compile(r"\s+")


def basic_clean(text: str) -> str:
    """ftfy + double html.unescape + strip (simple_tokenizer.py:58-61)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    """Collapse runs of whitespace (simple_tokenizer.py:64-67)."""
    return _WS.sub(" ", text).strip()


def normalize(text: str, lowercase: bool = True) -> str:
    """Full canonicalization as applied at simple_tokenizer.py:137."""
    text = whitespace_clean(basic_clean(text))
    return text.lower() if lowercase else text


def tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Normalize then split into terms with the reference regex."""
    return TOKEN_PATTERN.findall(normalize(text, lowercase=lowercase))


def tokenize_texts(texts, lowercase: bool = True) -> list[list[str]]:
    """Tokenize a column of texts. Nulls -> empty term list.

    The regex engine is C-backed; the Python loop here is over *rows of one
    batch*, which is the same granularity the reference uses
    (``simple_tokenizer.py:138`` runs findall per document).

    Fast path: ``whitespace_clean`` (collapse ``\\s+`` -> ' ') is provably a
    no-op for the TOKEN LIST — no alternative of TOKEN_PATTERN can match or
    span whitespace (letters/digits exclude it; the punctuation run is
    ``[^\\s...]+``), so findall over the uncollapsed string yields the exact
    same tokens. It is skipped here (it cost as much as findall itself);
    ``normalize()`` keeps it for callers that need the canonical STRING.
    Equivalence is pinned by tests/test_tokenizer.py.
    """
    pat = TOKEN_PATTERN
    clean = basic_clean
    out = []
    if lowercase:
        for t in texts:
            out.append([] if not t else pat.findall(clean(t).lower()))
    else:
        for t in texts:
            out.append([] if not t else pat.findall(clean(t)))
    return out


def tokenize_column(col, lowercase: bool = True) -> list[list[str]]:
    """Tokenize an Arrow string column — the build hot path.

    Identical token lists to ``tokenize_texts`` (pinned by
    tests/test_tokenizer.py), but the case fold runs as ONE vectorized C++
    kernel (``pc.utf8_lower``) instead of a per-row ``str.lower``, and the
    double ``html.unescape`` runs only on rows that contain ``&`` (it is the
    identity otherwise). Rows WITH ``&`` take the exact reference order —
    unescape first, THEN lower — because entity names are case-sensitive
    (``&Gt;`` is U+226B while ``&gt;`` is ``>``; lowering first would change
    the result). ``strip``/whitespace-collapse are skipped per the
    whitespace_clean no-op proof in ``tokenize_texts``. Falls back to the
    scalar path entirely when ftfy is installed (fix_text must precede the
    fold)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _HAS_FTFY:  # pragma: no cover - ftfy absent in this environment
        return tokenize_texts(col.to_pylist(), lowercase=lowercase)
    texts = (pc.utf8_lower(col) if lowercase else col).to_pylist()
    findall = TOKEN_PATTERN.findall
    unesc = html.unescape
    out: list[list[str]] = []
    for i, t in enumerate(texts):
        if not t:
            out.append([])
        elif "&" in t:  # '&' survives the fold: detect on the folded string
            raw = unesc(unesc(col[i].as_py())).strip()
            out.append(findall(raw.lower() if lowercase else raw))
        else:
            out.append(findall(t))
    return out


def term_frequencies(terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique_terms, counts) for one document's term list; dl = len(terms)."""
    if not terms:
        return np.array([], dtype=object), np.array([], dtype=np.int32)
    uniq, counts = np.unique(np.asarray(terms, dtype=object), return_counts=True)
    return uniq, counts.astype(np.int32)

"""BM25 scoring kernels (pure numpy).

This replaces the reference's cosine/softmax rank kernel
(``/root/reference/server/clip_server/executors/helper.py:89-124``): where
the reference computes ``1 - cosine(Q, C)`` then ``softmax(logit_scale*cos)``
with a frozen ``logit_scale``, we compute BM25 with frozen ``k1=1.2, b=0.75``.

Formulas (float64 throughout, fixed accumulation order = postings sorted by
doc_id, so scores are bit-reproducible across parallelism levels):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))        # Lucene-style, >= 0
    tf_norm(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)   = sum over unique t in q of idf(t) * tf_norm(t, d)

Query terms are deduplicated (each unique query term contributes once),
matching standard BM25 and the SQL oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Lucene-style BM25 idf; always positive."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-posting normalized term frequency (vectorized float64)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def term_scores(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
    delta: float = 0.0,
) -> np.ndarray:
    """idf(t) * (tf_norm + delta) for one term's postings. ``delta=0`` is
    classic BM25; ``delta=1`` is BM25+ (Lv & Zhai, CIKM 2011): a matched
    term always contributes at least idf*delta, fixing BM25's over-penalty
    of long documents. delta=0 is float-identical to the undeltaed form
    (x + 0.0 == x for finite positive x)."""
    return idf(float(df), n_docs) * (
        tf_norm(tf, dl, avgdl, k1=k1, b=b) + delta
    )


#: similarity modules selectable at query time (the Lucene/ES
#: ``similarity`` setting). Same index artifact — every kernel consumes the
#: identical (tf, dl, df, ctf, N, avgdl) statistics the postings already
#: carry; only the per-posting formula changes.
SIMILARITIES = ("bm25", "lmdirichlet", "lmjm", "tfidf", "boolean")


def alt_term_scores(
    kind: str,
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    ctf: float,
    n_docs: int,
    avgdl: float,
    param: float | None = None,
) -> np.ndarray:
    """Per-posting scores for one term under an ALTERNATIVE similarity.

    Formulas (float64; expression order is the parity contract with the SQL
    oracle — ``np.log(1.0 + x)`` deliberately instead of ``np.log1p`` so the
    engine and DuckDB's ``ln(1 + x)`` agree bitwise):

    - ``lmdirichlet`` (Zhai & Lafferty 2004; Lucene LMDirichletSimilarity,
      ``param`` = mu, default 2000): with p = ctf / (N * avgdl),
      ``max(ln(1 + tf/(mu*p)) + ln(mu/(dl+mu)), 0)`` — the clamp is
      Lucene's non-negative-score contract.
    - ``lmjm`` (Jelinek-Mercer smoothing; Lucene LMJelinekMercerSimilarity,
      ``param`` = lambda, default 0.1):
      ``ln(1 + ((1-lambda) * (tf/dl)) / (lambda * p))`` (always >= 0).
    - ``tfidf`` (Lucene ClassicSimilarity): ``sqrt(tf) * idf^2 / sqrt(dl)``
      with ``idf = 1 + ln(N / (df+1))`` — tf sqrt-damped, idf squared (once
      as queryNorm, once as docNorm), 1/sqrt(dl) the classic lengthNorm.
    - ``boolean`` (Lucene BooleanSimilarity): 1.0 per matched term.

    ``ctf`` is the collection term frequency (sum of this term's tfs) and
    ``N * avgdl`` the collection token count — both derivable from the
    existing postings + stats without a new index artifact.
    """
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    if kind == "lmdirichlet":
        mu = 2000.0 if param is None else float(param)
        p = float(ctf) / (n_docs * avgdl)
        s = np.log(1.0 + tf / (mu * p)) + np.log(mu / (dl + mu))
        return np.maximum(s, 0.0)
    if kind == "lmjm":
        lam = 0.1 if param is None else float(param)
        p = float(ctf) / (n_docs * avgdl)
        return np.log(1.0 + ((1.0 - lam) * (tf / dl)) / (lam * p))
    if kind == "tfidf":
        i = 1.0 + np.log(n_docs / (float(df) + 1.0))
        return np.sqrt(tf) * (i * i) / np.sqrt(dl)
    if kind == "boolean":
        return np.ones(len(tf), dtype=np.float64)
    raise ValueError(f"unknown similarity {kind!r}; pick one of {SIMILARITIES}")


def block_max_score(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> float:
    """Max attainable score of a posting block — the block-max metadata used
    for WAND-style block skipping at query time."""
    if len(tf) == 0:
        return 0.0
    return float(np.max(term_scores(tf, dl, df, n_docs, avgdl, k1=k1, b=b)))


def numpy_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable softmax — semantics of the reference's
    ``numpy_softmax`` (``executors/helper.py:12-17``), used for the optional
    normalized per-query score (the ``clip_score`` analog: the reference
    attaches BOTH a softmax score and the raw cosine, helper.py:110-114)."""
    x = np.asarray(x, dtype=np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def topk_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score DESC, doc_id ASC) — the deterministic
    tie-break mirroring the reference's stable descending match sort
    (helper.py:120-124) made reproducible.

    doc_id ascends with (conv_id, turn_idx), so this equals the documented
    (score DESC, conv_id ASC, turn_idx ASC) ordering.
    """
    n = len(scores)
    if n == 0:
        return np.array([], dtype=np.int64)
    k = min(k, n)
    if n > 4 * k and n > 1024:
        # partition fast path: select the tie-inclusive superset of the top
        # k scores, then lexsort only that subset (O(n + m log m), m ~ k)
        kth = np.partition(scores, n - k)[n - k]
        sel = np.nonzero(scores >= kth)[0]
        sub = np.lexsort((doc_ids[sel], -scores[sel]))
        return sel[sub[:k]]
    # np.lexsort sorts ascending by last key first -> sort by (-score, doc_id)
    order = np.lexsort((doc_ids, -scores))
    return order[:k]

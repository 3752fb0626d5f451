"""Golden single-process BM25 oracle.

A deliberately simple, trusted, pure-Python/numpy implementation that defines
rank-identical truth for the distributed engine — the analog of the
reference's numeric oracle tests (softmax vs torch,
``/root/reference/tests/test_helper.py:9-22``) and the /rank invariants
(``tests/test_ranker.py:34-35,59-61``): descending score order, deterministic
tie-break ``(score DESC, conv_id ASC, turn_idx ASC)``, exactly
``min(limit, |matches|)`` hits, heavy payload (text) dropped.

Semantics shared with the engine (and pinned here):
- turns whose normalized text yields zero terms are dropped at ingest
  (the analog of the modality splitter dropping content-less docs,
  ``server/clip_server/executors/helper.py:82-86``);
- N and avgdl count indexed (non-empty) turns only;
- query terms are deduplicated; scoring per functions/bm25.py docstring.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions import bm25
from clip_as_service_ray.functions.tokenizer import tokenize, tokenize_texts

HITS_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("score", pa.float64()),
    ]
)


class OracleIndex:
    """In-memory inverted index over a transcripts pyarrow Table."""

    def __init__(self, transcripts: pa.Table, k1: float = bm25.K1, b: float = bm25.B,
                 analyzer: str | None = None, delta: float = 0.0):
        self.k1, self.b = k1, b
        self.analyzer = analyzer
        self.delta = float(delta)  # BM25+ bonus; 0 = classic BM25
        conv = transcripts.column("conv_id").to_pylist()
        turn = transcripts.column("turn_idx").to_pylist()
        texts = transcripts.column("text").to_pylist()
        term_lists = tokenize_texts(texts)
        if analyzer:
            from clip_as_service_ray.functions.analyzers import fold_tokens

            term_lists = [fold_tokens(analyzer, ts) for ts in term_lists]

        # stable (conv_id, turn_idx) ordering defines doc order
        order = sorted(range(len(conv)), key=lambda i: (conv[i], turn[i]))
        self.docs: list[tuple[str, int]] = []
        self.dl: list[int] = []
        postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for i in order:
            terms = term_lists[i]
            if not terms:  # drop-empty rule
                continue
            doc = len(self.docs)
            self.docs.append((conv[i], turn[i]))
            self.dl.append(len(terms))
            counts: dict[str, int] = {}
            for t in terms:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in counts.items():
                postings[t].append((doc, tf))

        self.n_docs = len(self.docs)
        self.avgdl = float(np.mean(self.dl)) if self.docs else 0.0
        self.dl_arr = np.asarray(self.dl, dtype=np.int64)
        self.postings = {
            t: (
                np.asarray([d for d, _ in ps], dtype=np.int64),
                np.asarray([tf for _, tf in ps], dtype=np.int64),
            )
            for t, ps in postings.items()
        }

    def df(self, term: str) -> int:
        ps = self.postings.get(term)
        return 0 if ps is None else len(ps[0])

    def search_one(self, text: str, limit: int = 10,
                   conv_prefix: str = "") -> list[tuple[str, int, float]]:
        """Top-``limit`` hits for one query -> [(conv_id, turn_idx, score)].
        ``conv_prefix`` restricts CANDIDATES to conversations whose id
        starts with the prefix; BM25 stats stay global (the metadata-filter
        contract: filter the result set, not the model)."""
        toks = tokenize(text)
        if self.analyzer:
            from clip_as_service_ray.functions.analyzers import fold_tokens

            toks = fold_tokens(self.analyzer, toks)
        terms = sorted(set(toks))  # dedupe; sorted = fixed accumulation order
        scores = np.zeros(self.n_docs, dtype=np.float64)
        matched = np.zeros(self.n_docs, dtype=bool)
        for t in terms:
            ps = self.postings.get(t)
            if ps is None:
                continue
            docs, tfs = ps
            scores[docs] += bm25.term_scores(
                tfs, self.dl_arr[docs], len(docs), self.n_docs, self.avgdl,
                k1=self.k1, b=self.b, delta=self.delta,
            )
            matched[docs] = True
        cand = np.nonzero(matched)[0]
        if conv_prefix:
            keep = np.asarray(
                [self.docs[i][0].startswith(conv_prefix) for i in cand], dtype=bool
            )
            cand = cand[keep]
        if len(cand) == 0:
            return []
        top = bm25.topk_indices(scores[cand], cand, limit)
        return [(self.docs[cand[i]][0], self.docs[cand[i]][1], float(scores[cand[i]])) for i in top]

    def search(self, queries: pa.Table) -> pa.Table:
        """Batch search -> flat hits table (HITS_SCHEMA), ordered by
        (query_id ASC, rank ASC); empty queries yield zero rows."""
        cols = {n: [] for n in HITS_SCHEMA.names}
        qids = queries.column("query_id").to_pylist()
        texts = queries.column("text").to_pylist()
        limits = (
            queries.column("limit").to_pylist()
            if "limit" in queries.column_names
            else [10] * len(qids)
        )
        prefixes = (
            queries.column("conv_prefix").to_pylist()
            if "conv_prefix" in queries.column_names
            else [""] * len(qids)
        )
        for qid, text, limit, pfx in zip(qids, texts, limits, prefixes):
            for rank, (cid, tidx, score) in enumerate(
                self.search_one(text or "", limit, conv_prefix=pfx or "")
            ):
                cols["query_id"].append(qid)
                cols["rank"].append(rank)
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tidx)
                cols["score"].append(score)
        return pa.table(cols, schema=HITS_SCHEMA)

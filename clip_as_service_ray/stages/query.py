"""Query execution: index reader + BM25 top-k scorer actor pool.

Reimplements the reference's /rank + /search semantics
(``executors/helper.py:89-124`` ``set_rank``, ``client.py:785-820`` limit-k
contract) as a Ray Data actor-pool stage:

- ``IndexReader`` is the per-actor state loaded once in ``__init__`` — the
  T1/T5 pattern (model weights / AnnLite workspace loaded in the executor
  ctor, ``executors/clip_torch.py:24-98``). At sandbox scale it loads the
  whole postings set into memory; the cluster-scale path is one actor per
  index partition (scatter-ALL-search, ``retriever.md:203-225``) with
  postings files memory-mapped and block data sliced lazily by the
  block-max metadata.

- ``QueryScorer.__call__`` scores a batch of queries: tokenize (same
  tokenizer as the build side), per-term postings lookup (J2: broadcast
  small side = the queries; large side = index partitions), exact TAAT
  (term-at-a-time) accumulation in float64 with FIXED accumulation order
  (terms iterated in sorted order, postings doc-sorted) so scores are
  bit-identical to the golden oracle, then top-k by
  ``(score DESC, doc_id ASC)`` — the deterministic tie-break version of
  set_rank's descending match sort (helper.py:120-124). The hit rows drop
  the heavy text payload, mirroring ``helper.py:118``.

Flat hit schema (HITS_SCHEMA, shared with the oracle):
    query_id:int64, rank:int32, conv_id:string, turn_idx:int32, score:float64
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.functions import bm25
from clip_as_service_ray.functions.tokenizer import tokenize
from clip_as_service_ray.pipelines.oracle import HITS_SCHEMA
from clip_as_service_ray.state import manifest as mf
from clip_as_service_ray.state.postings import _DTYPES as _W_DT
from clip_as_service_ray.state.postings import decode_block
from clip_as_service_ray.state.termmap import BlockRowsMap, SortedArrayMap


def _ranges_arange(lens: np.ndarray) -> np.ndarray:
    """Concatenated [0..len) ranges: arange(sum) minus each segment's
    start offset (the segmented-cumsum inversion trick)."""
    lens = lens.astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    return np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
        starts, lens
    )


def _prune_eps(n_terms: int, theta: float) -> float:
    """Rank-safety margin for pruning decisions against float-order noise.

    Absolute floor 1e-9 plus a relative component: a query with hundreds of
    distinct terms accumulates pairwise-vs-sequential summation error that
    grows with the score magnitude and term count."""
    if not np.isfinite(theta):
        return 1e-9
    return max(1e-9, n_terms * abs(theta) * 1e-12)


class IndexReader:
    """Loads one index directory into queryable in-memory structures.

    ``global_stats`` (optional): {"n_docs", "avgdl", "df_path"} — overrides
    the shard-local corpus stats with union stats for sharded search (BM25
    idf / length normalization must be computed against the WHOLE corpus,
    matching the reference's global-model-per-shard semantics).
    """

    def __init__(
        self,
        index_dir: str,
        global_stats: dict | None = None,
        dense_chunk_docs: int = 1 << 25,
    ):
        self.index_dir = index_dir
        # doc-id slots per dense-accumulator chunk: bounds score_query's
        # working memory to O(chunk) instead of O(n_docs) — the scale-safe
        # form for 10^9+ doc deployments (results identical; top-k of
        # per-chunk top-k == global top-k)
        self.dense_chunk_docs = int(dense_chunk_docs)
        stats = mf.read_json(os.path.join(index_dir, "stats.json"))
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.k1 = float(stats.get("k1", bm25.K1))
        self.b = float(stats.get("b", bm25.B))
        # analyzer the index was BUILT with (stats.json is authoritative);
        # auto-applied to every query path so the index is self-describing
        self.analyzer = stats.get("analyzer")
        # query-time synonym map (term -> tuple of expansion terms); set by
        # QueryScorer — empty means no expansion
        self.synonyms: dict[str, tuple] = {}
        # BM25+ lower-bound bonus (Lv & Zhai 2011): score contribution is
        # idf * (tf_norm + delta). 0.0 = classic BM25, float-identical to
        # the undeltaed form; set per QUERY POOL (the idf-free tf_norm
        # block cache stays variant-independent, only the multiply changes)
        self.delta = 0.0
        # similarity module (Lucene/ES `similarity` setting): "bm25"
        # (default) or one of bm25.SIMILARITIES. Non-BM25 kernels need raw
        # (tf, dl) + per-term ctf, so they score via the full-decode path
        # (term_docs_scores) and the pruned path falls back to exact —
        # term_upper_bound envelopes are BM25-shaped. Set per QUERY POOL.
        self.similarity = "bm25"
        self.sim_param: float | None = None

        dict_path = os.path.join(index_dir, "dictionary")
        if global_stats is not None:
            self.n_docs = int(global_stats["n_docs"])
            self.avgdl = float(global_stats["avgdl"])
            dict_path = global_stats["df_path"]
        dict_tbl = pq.read_table(dict_path)
        # sorted-array binary-search map, NOT a Python dict: at a real
        # 10^7-10^8-term vocabulary a dict costs GBs per actor and slow
        # init; the sorted term array answers get/in at O(log n). Writers
        # usually emit sorted dictionaries — sort defensively otherwise
        # (the big-input Ray groupby path doesn't guarantee order).
        d_terms = dict_tbl.column("term").to_numpy(zero_copy_only=False)
        d_df = dict_tbl.column("df").to_numpy().astype(np.int64)
        if len(d_terms) > 1 and not np.all(d_terms[:-1] < d_terms[1:]):
            d_order = np.argsort(d_terms, kind="stable")
            d_terms, d_df = d_terms[d_order], d_df[d_order]
        self.df = SortedArrayMap(d_terms, d_df)

        blocks = pq.read_table(
            os.path.join(index_dir, "postings"),
            columns=[
                "term", "first_doc", "last_doc", "n",
                "doc_w", "tf_w", "dl_w", "max_tf_norm", "data",
            ],
            memory_map=True,
        ).combine_chunks()
        self._b_first = blocks.column("first_doc").to_numpy()
        self._b_last = blocks.column("last_doc").to_numpy()
        self._b_n = blocks.column("n").to_numpy()
        self._b_doc_w = blocks.column("doc_w").to_numpy()
        self._b_tf_w = blocks.column("tf_w").to_numpy()
        self._b_dl_w = blocks.column("dl_w").to_numpy()
        self._b_max = blocks.column("max_tf_norm").to_numpy()
        # keep payloads as the Arrow binary array; slice lazily per decode
        # (an upfront to_pylist of every block blob dominated actor init)
        self._b_data = blocks.column("data")
        if isinstance(self._b_data, pa.ChunkedArray):
            self._b_data = self._b_data.combine_chunks()
        # raw buffer views for the batched multi-block decode
        _odt = np.int64 if pa.types.is_large_binary(self._b_data.type) else np.int32
        self._v_off = np.frombuffer(self._b_data.buffers()[1], _odt)[
            self._b_data.offset : self._b_data.offset + len(self._b_data) + 1
        ].astype(np.int64)
        self._v_bytes = np.frombuffer(self._b_data.buffers()[2], np.uint8)
        terms_np = blocks.column("term").to_numpy(zero_copy_only=False)
        # term -> block row indices ordered by first_doc. CSR over the
        # lexsort (termmap.BlockRowsMap), not a dict of arrays — same
        # vocabulary-scale rationale as self.df above.
        if len(terms_np):
            order = np.lexsort((self._b_first, terms_np))
            terms_sorted = terms_np[order]
            change = np.nonzero(terms_sorted[1:] != terms_sorted[:-1])[0] + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(order)]])
            # sorted unique vocabulary: the wildcard-expansion lookup
            self._terms_sorted = terms_sorted[starts]
            self._term_blocks = BlockRowsMap(
                self._terms_sorted, starts, ends, order
            )
        else:
            self._terms_sorted = np.array([], dtype=object)
            self._term_blocks = BlockRowsMap.empty()

        conv_tbl = pq.read_table(os.path.join(index_dir, "convmap.parquet"))
        conv_tbl = conv_tbl.sort_by("conv_id")
        self._conv_ids = np.asarray(conv_tbl.column("conv_id").to_pylist(), dtype=object)
        extents = conv_tbl.column("max_turn").to_numpy().astype(np.int64) + 1
        self._bases = np.concatenate([[0], np.cumsum(extents)[:-1]])
        # dense doc-id slot count for the per-query score accumulator
        self._max_doc_id = int(self._bases[-1] + extents[-1] - 1) if len(extents) else 0

        # per-term decoded (doc_ids, scores) cache: BM25 term scores are
        # query-independent, so each term is decoded+scored at most once per
        # actor (the analog of the reference's per-token LRU in
        # simple_tokenizer.py:85-88). Bounded by total cached postings.
        self._score_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # per-BLOCK decoded (doc_ids, idf-free tf_norm) cache for the lazy
        # block-max path: selective decodes touch only the blocks that can
        # matter, so hot stopword lists are never fully decoded just to
        # gather a handful of candidates
        self._block_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cached_postings = 0
        self._cache_cap = 20_000_000  # postings entries (~320 MB at 16 B/entry)
        # lineage counters for the lazy decode (asserted by tests, reported
        # by the query profile): blocks actually decoded vs blocks consulted
        self.blocks_decoded = 0
        self.blocks_total = int(blocks.num_rows)
        # reusable dense accumulators for score_query (allocated lazily)
        self._score_buf: np.ndarray | None = None
        self._match_buf: np.ndarray | None = None

    def _gather_sections(self, offsets: np.ndarray, lens: np.ndarray, width: int):
        """Concatenate per-row byte sections from the packed values buffer
        and view as the width's dtype — one fancy gather."""
        total = int(lens.sum())
        out_off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=out_off[1:])
        idx = np.arange(total, dtype=np.int64) + np.repeat(offsets - out_off[:-1], lens)
        return self._v_bytes[idx].view(_W_DT[width])

    def _decode_rows_batch(self, rows: np.ndarray, doc_w: int, tf_w: int, dl_w: int):
        """Vectorized decode of MANY same-width blocks at once — the
        per-block Python loop costs ~0.1 ms/block, and a hot stopword holds
        ~15k blocks at 2.4M docs. Doc-delta inversion is per-block (each
        block's first delta rebases on its first_doc)."""
        n = self._b_n[rows].astype(np.int64)
        base = self._v_off[rows]
        dlen, tlen = n * doc_w, n * tf_w
        dd = self._gather_sections(base, dlen, doc_w).astype(np.int64)
        tfs = self._gather_sections(base + dlen, tlen, tf_w).astype(np.int64)
        dls = self._gather_sections(base + dlen + tlen, n * dl_w, dl_w).astype(np.int64)
        g = np.cumsum(dd)
        blk_starts = np.zeros(len(rows), np.int64)
        np.cumsum(n[:-1], out=blk_starts[1:])
        seg_first = g[blk_starts] - dd[blk_starts] - self._b_first[rows]
        docs = g - np.repeat(seg_first, n)
        return docs, tfs, dls

    def postings_for(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Full decoded postings (doc-sorted) for a term, or None."""
        rows = self._term_blocks.get(term)
        if rows is None:
            return None
        self.blocks_decoded += len(rows)
        wkey = (
            self._b_doc_w[rows].astype(np.int64) * 100
            + self._b_tf_w[rows].astype(np.int64) * 10
            + self._b_dl_w[rows].astype(np.int64)
        )
        uw = np.unique(wkey)
        if len(uw) == 1:  # common case: one batched decode
            w = int(uw[0])
            return self._decode_rows_batch(rows, w // 100, (w // 10) % 10, w % 10)
        # mixed widths: per-group batch decode, scattered back in row order
        n_all = self._b_n[rows].astype(np.int64)
        d_off = np.zeros(len(rows) + 1, np.int64)
        np.cumsum(n_all, out=d_off[1:])
        docs = np.empty(int(d_off[-1]), np.int64)
        tfs = np.empty(int(d_off[-1]), np.int64)
        dls = np.empty(int(d_off[-1]), np.int64)
        for w in uw:
            sel = np.nonzero(wkey == w)[0]
            gd, gt, gl = self._decode_rows_batch(
                rows[sel], int(w) // 100, (int(w) // 10) % 10, int(w) % 10
            )
            idx = np.concatenate([np.arange(d_off[i], d_off[i + 1]) for i in sel])
            docs[idx], tfs[idx], dls[idx] = gd, gt, gl
        return docs, tfs, dls

    def _block(self, r: int) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (doc_ids, idf-free tf_norm) for ONE block row, cached —
        the lazy unit of the block-max path (north star: block-max WAND).
        tf_norm is idf-free so the cache is valid under global-stats
        overrides that change df but not avgdl-per-posting values."""
        hit = self._block_cache.get(r)
        if hit is not None:
            return hit
        docs, tfs, dls = decode_block(
            self._b_data[r].as_buffer(), int(self._b_n[r]), int(self._b_doc_w[r]),
            int(self._b_tf_w[r]), int(self._b_dl_w[r]), int(self._b_first[r]),
        )
        tfn = bm25.tf_norm(tfs, dls, self.avgdl, k1=self.k1, b=self.b)
        self.blocks_decoded += 1
        if self._cached_postings + len(docs) <= self._cache_cap:
            self._block_cache[r] = (docs, tfn)
            self._cached_postings += len(docs)
        return docs, tfn

    def _term_df(self, term: str) -> int:
        df_val = self.df.get(term)
        if df_val is None:
            raise KeyError(
                f"term {term!r} has postings but no dictionary entry: "
                f"corrupt or partially-built index at {self.index_dir}"
            )
        return int(df_val)

    def term_scores_for_docs(self, term: str, cand: np.ndarray) -> np.ndarray:
        """Per-candidate BM25 scores for one term via SELECTIVE block decode.

        ``cand`` must be sorted ascending; returns float64 aligned to cand
        (0.0 where the term does not match). Only blocks whose
        [first_doc, last_doc] range contains a candidate are decoded — the
        lazy half of block-max WAND: a stopword's thousands of blocks cost
        nothing when only a handful of candidates need gathering. Scores are
        bit-identical to the full-decode path (same elementwise idf*tf_norm)."""
        out = np.zeros(len(cand), dtype=np.float64)
        rows = self._term_blocks.get(term)
        if rows is None or len(cand) == 0:
            return out
        hit = self._score_cache.get(term)
        if hit is None and self.similarity != "bm25":
            # alt-similarity kernels need the term's ctf, so the lazy
            # block path (idf-free tf_norm cache) cannot produce them:
            # score via the full decode instead (cached when it fits)
            hit = self.term_docs_scores(term)
        if hit is not None:  # already fully decoded+scored: no block work
            docs_t, scores_t = hit
            pos = np.searchsorted(docs_t, cand)
            ok = (pos < len(docs_t)) & (docs_t[np.minimum(pos, len(docs_t) - 1)] == cand)
            out[ok] = scores_t[pos[ok]]
            return out
        idf_t = bm25.idf(float(self._term_df(term)), self.n_docs)
        firsts = self._b_first[rows]
        lasts = self._b_last[rows]
        lo = np.searchsorted(cand, firsts, side="left")
        hi = np.searchsorted(cand, lasts, side="right")
        for k in np.nonzero(hi > lo)[0]:
            docs_b, tfn_b = self._block(int(rows[k]))
            sub = cand[lo[k] : hi[k]]
            pos = np.searchsorted(docs_b, sub)
            ok = (pos < len(docs_b)) & (docs_b[np.minimum(pos, len(docs_b) - 1)] == sub)
            out[lo[k] + np.nonzero(ok)[0]] = idf_t * (tfn_b[pos[ok]] + self.delta)
        return out

    def term_postings_in_range(self, term: str, c0: int, c1: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, scores) for one term restricted to doc ids in [c0, c1),
        decoding only the overlapping blocks — the per-chunk feed of the
        memory-bounded dense path."""
        rows = self._term_blocks.get(term)
        if rows is None:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        hit = self._score_cache.get(term)
        if hit is None and self.similarity != "bm25":
            hit = self.term_docs_scores(term)  # alt kernels need ctf
        if hit is not None:
            docs_t, scores_t = hit
            a = int(np.searchsorted(docs_t, c0))
            b_ = int(np.searchsorted(docs_t, c1))
            return docs_t[a:b_], scores_t[a:b_]
        idf_t = bm25.idf(float(self._term_df(term)), self.n_docs)
        sel = rows[(self._b_first[rows] < c1) & (self._b_last[rows] >= c0)]
        if len(sel) == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        d_parts, s_parts = [], []
        for r in sel:
            docs_b, tfn_b = self._block(int(r))
            a = int(np.searchsorted(docs_b, c0))
            b_ = int(np.searchsorted(docs_b, c1))
            if b_ > a:
                d_parts.append(docs_b[a:b_])
                s_parts.append(idf_t * (tfn_b[a:b_] + self.delta))
        if not d_parts:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        return np.concatenate(d_parts), np.concatenate(s_parts)

    def _qtokens(self, text: str) -> list[str]:
        """Query-side tokenize + the index's analyzer fold (stats.json
        ``analyzer``): queries are normalized exactly like documents were at
        build time — the symmetric-analysis contract."""
        toks = tokenize(text or "")
        if self.analyzer:
            from clip_as_service_ray.functions.analyzers import fold_tokens

            toks = fold_tokens(self.analyzer, toks)
        return toks

    def _expand_synonyms(self, terms: list[str]) -> list[str]:
        """Query-time synonym expansion (OR semantics): each query term adds
        its synonym group's members as additional independent OR terms —
        Lucene's SynonymGraph-at-query-time model. Scores stay exactly
        BM25-over-the-expanded-term-set, so the SQL twin is the ordinary
        formula with a longer IN list. The map is tiny (curated pairs) and
        lives on the reader (ships once per actor); keys/values are
        POST-analysis terms (QueryScorer folds them through the index's
        analyzer on construction). Conjunctive/prefix/fuzzy modes do not
        expand (AND over an expanded set would change semantics — a query
        term's group should match, not every member; QueryScorer rejects
        the combination)."""
        if not self.synonyms:
            return terms
        out = set(terms)
        for t in terms:
            out.update(self.synonyms.get(t, ()))
        return sorted(out)

    def encode_text(self, text: str) -> tuple[list[str], np.ndarray]:
        """Sparse BM25 document vector of a text — the /encode analog (the
        reference encodes inputs into a vector space; this engine's text
        representation IS the BM25-weighted term vector): for each distinct
        in-vocabulary term, idf(term) * tf_norm(tf, len, avgdl) with the
        text treated as a document under the index's global stats. Encoding
        a text then dotting against another text's INDICATOR vector
        reproduces retrieval scoring term-for-term."""
        toks = self._qtokens(text)
        dl = len(toks)
        terms, weights = [], []
        for t in sorted(set(toks)):
            df_val = self.df.get(t)
            if df_val is None:
                continue
            tf = float(toks.count(t))
            w = bm25.idf(float(df_val), self.n_docs) * (
                bm25.tf_norm(
                    np.array([tf]), np.array([float(dl)]), self.avgdl,
                    k1=self.k1, b=self.b,
                )[0]
                + self.delta
            )
            terms.append(t)
            weights.append(float(w))
        return terms, np.asarray(weights, dtype=np.float64)

    def conv_prefix_range(self, prefix: str) -> tuple[int, int]:
        """Half-open doc-id range of conversations whose conv_id starts with
        ``prefix``. Doc ids are assigned in conv-sorted order, so a conv
        prefix is ONE contiguous doc range — the filter-column analog of the
        reference retriever's AnnLite metadata filters (retriever.md:164-165):
        the filter restricts CANDIDATES; BM25 stats stay global."""
        if not prefix:
            return (0, self._max_doc_id + 1)
        i0 = int(np.searchsorted(self._conv_ids, prefix))
        i1 = int(np.searchsorted(self._conv_ids, prefix + chr(0x10FFFF)))
        if i0 >= i1:
            return (0, 0)
        lo = int(self._bases[i0])
        hi = int(self._bases[i1]) if i1 < len(self._bases) else self._max_doc_id + 1
        return (lo, hi)

    @staticmethod
    def _clip_to_range(cand: np.ndarray, rng) -> np.ndarray:
        """Restrict a SORTED doc-id array to a half-open range."""
        lo = int(np.searchsorted(cand, rng[0], side="left"))
        hi = int(np.searchsorted(cand, rng[1], side="left"))
        return cand[lo:hi]

    def doc_ids_for(self, conv_ids, turn_idxs, strict: bool = True):
        """(conv_id, turn_idx) -> doc_id (= base[conv] + turn). ``strict``
        raises KeyError for conversations this index does not hold;
        otherwise returns (doc_ids, known_mask) — the scatter-rank form,
        where each segment ranks only the candidates IT holds."""
        conv = np.asarray(list(conv_ids), dtype=object)
        pos = np.searchsorted(self._conv_ids, conv)
        bad = (pos >= len(self._conv_ids)) | (
            self._conv_ids[np.minimum(pos, len(self._conv_ids) - 1)] != conv
        )
        ids = self._bases[np.minimum(pos, len(self._bases) - 1)] + np.asarray(
            list(turn_idxs), dtype=np.int64
        )
        if strict:
            if bad.any():
                raise KeyError(f"unknown conv_ids: {conv[bad][:5].tolist()}")
            return ids
        return ids, ~bad

    def explain(self, text: str, conv_id: str, turn_idx: int) -> dict | None:
        """Lucene-``explain`` analog: the full per-term score decomposition
        of ONE document against a query. Returns None when this index does
        not hold the document. ``score`` accumulates the per-term parts
        sequentially in sorted-term order — the canonical structure — so it
        is bit-identical to the retrieval/rank score of the same doc.

        Each term entry carries the raw statistics a relevance engineer
        needs: tf, dl, df, idf, tf_norm, and the product (= contribution).
        Query analysis (analyzer fold + synonym expansion) matches
        score_query exactly, so explain explains what search actually ran."""
        ids, known = self.doc_ids_for([conv_id], [turn_idx], strict=False)
        if not bool(known[0]):
            return None
        doc = int(ids[0])
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        parts: list[dict] = []
        score = 0.0
        for t in terms:
            ps = self.postings_for(t)
            if ps is None:
                continue
            docs_t, tfs_t, dls_t = ps
            i = int(np.searchsorted(docs_t, doc))
            if i >= len(docs_t) or int(docs_t[i]) != doc:
                continue
            tf = float(tfs_t[i])
            dl = float(dls_t[i])
            df_val = float(self._term_df(t))
            idf_t = bm25.idf(df_val, self.n_docs)
            tfn = float(
                bm25.tf_norm(
                    np.array([tf]), np.array([dl]), self.avgdl,
                    k1=self.k1, b=self.b,
                )[0]
            )
            part = idf_t * (tfn + self.delta)
            score += part
            parts.append(
                {
                    "term": t, "tf": tf, "dl": dl, "df": df_val,
                    "idf": float(idf_t), "tf_norm": tfn, "score": float(part),
                }
            )
        return {
            "conv_id": conv_id,
            "turn_idx": int(turn_idx),
            "doc_id": doc,
            "score": float(score),
            "terms": parts,
        }

    def rank_docs(self, text: str, doc_ids: np.ndarray) -> np.ndarray:
        """BM25 scores of ``text`` against EXACTLY the given docs — the
        set_rank contract (helper.py:89-124: score the provided candidate
        set, no retrieval). Scores aligned to ``doc_ids``; docs matching no
        query term score 0.0. Accumulation is per-term in sorted order over
        the doc-sorted candidates, the same canonical structure as
        score_query, so scores are bit-identical to retrieval scores."""
        out = np.zeros(len(doc_ids), dtype=np.float64)
        if len(doc_ids) == 0:
            return out
        order = np.argsort(doc_ids, kind="stable")
        cand = doc_ids[order]
        acc = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(set(self._qtokens(text))):
            if t in self._term_blocks:
                acc += self.term_scores_for_docs(t, cand)
        out[order] = acc
        return out

    def invert_doc_ids(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """doc_id -> (conv_id, turn_idx) via the conv base table (no docmap
        lookup: doc_id = base[conv] + turn_idx by construction)."""
        pos = np.searchsorted(self._bases, doc_ids, side="right") - 1
        return self._conv_ids[pos], (doc_ids - self._bases[pos]).astype(np.int32)

    def term_docs_scores(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(doc_ids, per-doc BM25 term scores) for one term, cached."""
        hit = self._score_cache.get(term)
        if hit is not None:
            return hit
        ps = self.postings_for(term)
        if ps is None:
            return None
        docs, tfs, dls = ps
        df_val = self.df.get(term)
        if df_val is None:
            # the dictionary is derived from the same postings, so a miss for
            # a term that HAS postings always means a corrupt/partial index —
            # and in sharded mode a silent shard-local fallback would compute
            # idf from the wrong df. Surface it.
            raise KeyError(
                f"term {term!r} has postings but no dictionary entry: "
                f"corrupt or partially-built index at {self.index_dir}"
            )
        df = int(df_val)
        if self.similarity != "bm25":
            # ctf = collection term frequency: exact integer sum of this
            # term's tfs — the one extra statistic the LM kernels need,
            # derived from the postings just decoded (no new artifact)
            scores = bm25.alt_term_scores(
                self.similarity, tfs, dls, df, float(tfs.sum()),
                self.n_docs, self.avgdl, param=self.sim_param,
            )
        else:
            scores = bm25.term_scores(
                tfs, dls, df, self.n_docs, self.avgdl, k1=self.k1, b=self.b,
                delta=self.delta,
            )
        if self._cached_postings + len(docs) <= self._cache_cap:
            self._score_cache[term] = (docs, scores)
            self._cached_postings += len(docs)
        return docs, scores

    def score_query(self, text: str, limit: int, doc_range=None) -> tuple[np.ndarray, np.ndarray]:
        """Exact TAAT scoring -> (top doc_ids, top scores), ranked.

        Dense accumulation with the SAME structure as the golden oracle
        (``oracle.py``): ``scores[docs_t] += term_scores`` per term in sorted
        term order — per-doc additions are sequential left-to-right, so
        scores are bit-identical to the oracle. doc_ids are positions in a
        dense [0, max_doc] array (doc ids are conv-base offsets, dense up to
        gaps), so the accumulator is one n_docs-sized float64 array per
        call — O(n_docs) memset + O(postings) adds, no sort.
        """
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, doc_range=doc_range)

    def _score_dense(self, present: list[str], limit: int, n_slots: int, exclude=None, doc_range=None):
        # reused per-reader accumulators (fresh allocations pay hypervisor
        # first-touch cost on this sandbox; real clusters also benefit)
        if self._score_buf is None or len(self._score_buf) != n_slots:
            self._score_buf = np.zeros(n_slots, dtype=np.float64)
            self._match_buf = np.zeros(n_slots, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        for t in present:
            docs_t, scores_t = self.term_docs_scores(t)
            scores[docs_t] += scores_t  # docs unique per term: plain fancy-index add
            matched[docs_t] = True
        cand = np.nonzero(matched)[0]
        sel = cand if doc_range is None else self._clip_to_range(cand, doc_range)
        sel = sel if exclude is None else self._drop_excluded(sel, exclude)
        top = bm25.topk_indices(scores[sel], sel, limit)
        out_docs, out_scores = sel[top].astype(np.int64), scores[sel[top]].copy()
        # reset only what we touched (memset-full when dense)
        if len(cand) > n_slots // 4:
            scores[:] = 0.0
            matched[:] = False
        else:
            scores[cand] = 0.0
            matched[cand] = False
        return out_docs, out_scores

    def _score_dense_chunked(self, present: list[str], limit: int, n_slots: int, exclude=None, doc_range=None):
        """Memory-bounded exact TAAT: doc-id space is processed in
        ``dense_chunk_docs``-slot chunks; each chunk accumulates with the
        SAME per-term sequential structure as ``_score_dense`` (so per-doc
        float sums are bit-identical), keeps its own top-k, and the global
        top-k of the per-chunk winners equals the global top-k. Working
        memory is O(chunk), not O(n_docs) — the fix for the dense-accumulator
        scale hazard at 10^9+ docs."""
        chunk = self.dense_chunk_docs
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t in present:
                docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                if len(docs_t):
                    rel = docs_t - c0
                    scores[rel] += scores_t
                    matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if exclude is not None:
                    sel = self._drop_excluded(sel + c0, exclude) - c0
                if len(sel):
                    top = bm25.topk_indices(scores[sel], sel + c0, limit)
                    win_docs.append((sel[top] + c0).astype(np.int64))
                    win_scores.append(scores[sel[top]].copy())
                scores[cand] = 0.0
                matched[cand] = False
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    def score_query_conjunctive(
        self, text: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Boolean-AND retrieval: top-k over docs containing EVERY query term,
        scored with the same BM25 sum (idf from the full corpus) and the same
        canonical accumulation order as ``score_query`` — so scores of the
        surviving docs are bit-identical to the OR path's.

        Scale shape: only the RAREST term's postings are fully decoded; every
        other term filters the candidate list via ``term_scores_for_docs``
        (selective block decode — score > 0 iff the term matches, since BM25
        term scores are strictly positive on a match). Candidates shrink
        monotonically, df-ascending order shrinks them fastest.

        ``exclude_text``: boolean NOT — docs containing ANY excluded token
        are dropped from the candidate set before scoring (AND-NOT)."""
        terms = sorted(set(self._qtokens(text)))
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
        if not terms or any(t not in self._term_blocks for t in terms):
            return empty
        order = np.argsort([self._term_df(t) for t in terms], kind="stable")
        cand = self.term_docs_scores(terms[int(order[0])])[0]
        if doc_range is not None:
            cand = self._clip_to_range(cand, doc_range)
        if exclude_text:
            excl = self.excluded_docs(exclude_text)
            if len(excl):
                cand = self._drop_excluded(cand, excl)
        for i in order[1:]:
            if len(cand) == 0:
                return empty
            s = self.term_scores_for_docs(terms[int(i)], cand)
            cand = cand[s > 0.0]
        if len(cand) == 0:
            return empty
        final = np.zeros(len(cand), dtype=np.float64)
        for t in terms:  # sorted-term sequential += : canonical float order
            final += self.term_scores_for_docs(t, cand)
        top = bm25.topk_indices(final, cand, limit)
        return cand[top], final[top]

    def parse_boosts(self, text: str) -> dict[str, float]:
        """Parse Lucene caret-boost syntax (``merge^2 window``) into a
        folded-term -> weight map. Each whitespace clause may carry one
        ``^<float>`` suffix; the clause body tokenizes/analyzes exactly like
        an ordinary query and every token it yields inherits the clause
        weight. Repeated terms ADD their weights (so ``a a`` == ``a^2`` —
        the additive duplicate semantics of a weighted OR)."""
        weights: dict[str, float] = {}
        for clause in (text or "").split():
            body, sep, w = clause.rpartition("^")
            if sep and body:
                try:
                    weight = float(w)
                except ValueError:
                    body, weight = clause, 1.0
            else:
                body, weight = clause, 1.0
            for t in self._qtokens(body):
                weights[t] = weights.get(t, 0.0) + weight
        return weights

    def score_query_boosted(
        self, text: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Weighted-OR retrieval with Lucene caret boosts: each term's BM25
        contribution is multiplied by its clause weight before the canonical
        sorted-term sequential accumulation. With every weight exactly 1.0
        the multiply is a float no-op (1.0 * x == x), so an unboosted query
        scores bit-identically to ``score_query``. ``exclude_text`` filters
        NOT-docs before top-k (boost-NOT)."""
        weights = self.parse_boosts(text)
        present = [(t, weights[t]) for t in sorted(weights) if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        return self._score_dense_general(
            present, limit, n_slots, exclude=excl, doc_range=doc_range
        )

    def score_query_msm(
        self, text: str, limit: int, min_match: int = 2,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """OR retrieval with a minimum_should_match floor: only docs matching
        at least ``min_match`` DISTINCT query terms survive to top-k (the
        Lucene/ES ``minimum_should_match`` contract). Scores of survivors are
        bit-identical to ``score_query`` (same canonical accumulation; the
        floor is a candidate filter, not a scoring change). Out-of-vocabulary
        terms can never match — a floor above the in-vocab term count returns
        empty, exactly like the SQL twin's HAVING count >= m."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present or min_match > len(present):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        return self._score_dense_general(
            present, limit, n_slots, min_match=int(min_match),
            exclude=excl, doc_range=doc_range,
        )

    def score_query_bool(
        self, must_text: str, should_text: str, limit: int,
        min_should: int = 0, exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full Lucene/ES BooleanQuery: ``must`` clauses are BOTH candidate
        filters (every must term must match) and scorers; ``should`` clauses
        add score, with ``min_should`` of them required for candidacy (ES
        minimum_should_match over should clauses — defaults to 0 when must
        clauses exist, and to 1 when the query is should-only, the ES rule);
        ``exclude_text`` is the must_not leg; ``doc_range`` the filter leg.

        Scoring: every matched (must ∪ should) term contributes its BM25
        score, accumulated in sorted term order over the union — a
        surviving doc's score is bit-identical to ``score_query`` on the
        same combined term set. Should terms duplicated in must are
        dropped (a term can't vote twice). A must term absent from the
        dictionary returns empty (the conjunctive contract)."""
        must = sorted(set(self._qtokens(must_text)))
        should = sorted(set(self._qtokens(should_text)) - set(must))
        if must and any(t not in self._term_blocks for t in must):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        should_present = [t for t in should if t in self._term_blocks]
        if not must and min_should <= 0:
            min_should = 1  # ES: a should-only bool needs >= 1 match
        if min_should > len(should_present):
            # the floor can never be met (OOV should terms never match)
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        present = sorted(set(must) | set(should_present))
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        must_set = set(must)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        if (getattr(self, "_count_buf", None) is None
                or len(self._count_buf) != chunk):
            self._count_buf = np.zeros(chunk, dtype=np.uint16)
        if (getattr(self, "_count_buf2", None) is None
                or len(self._count_buf2) != chunk):
            self._count_buf2 = np.zeros(chunk, dtype=np.uint16)
        scores, matched = self._score_buf, self._match_buf
        m_cnt, s_cnt = self._count_buf, self._count_buf2
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        one_chunk = chunk >= n_slots
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
                if t in must_set:
                    m_cnt[rel] += 1
                else:
                    s_cnt[rel] += 1
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand[
                    (m_cnt[cand] == len(must))
                    & (s_cnt[cand] >= max(min_should, 0))
                ]
                if doc_range is not None and len(sel):
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    top = bm25.topk_indices(scores[sel], sel + c0, limit)
                    win_docs.append((sel[top] + c0).astype(np.int64))
                    win_scores.append(scores[sel[top]].copy())
                scores[cand] = 0.0
                matched[cand] = False
                m_cnt[cand] = 0
                s_cnt[cand] = 0
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        if len(win_docs) == 1:
            return win_docs[0], win_scores[0]
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    def score_query_common_terms(
        self, text: str, limit: int, cutoff: float = 0.01,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene CommonTermsQuery (the ES ``common``/``cutoff_frequency``
        contract): query terms split by document frequency at
        ``cutoff * n_docs``. LOW-frequency terms select candidates (OR);
        HIGH-frequency terms contribute score ONLY to docs already matched
        by a low term — a stopword can never flood the candidate set, but
        its ranking signal survives on real matches. An all-high query
        degrades to plain OR (ES behavior when no term is below the cutoff).

        Survivor scores are bit-identical to ``score_query`` on the same
        doc: ALL matched terms accumulate in sorted term order; the
        low/high split only gates which docs become candidates. The df
        classification uses the (union) dictionary df, so the split is
        identical on every shard of a scatter search."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        low = {
            t for t in present
            if float(self._term_df(t)) < cutoff * self.n_docs
        }
        if not low:
            low = set(present)  # all-high: plain OR
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        one_chunk = chunk >= n_slots
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                if t in low:  # only low-freq terms create candidates
                    matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            # reset includes high-term-only docs (scored but not candidates)
            touched = np.nonzero(scores[: c1 - c0] != 0.0)[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    top = bm25.topk_indices(scores[sel], sel + c0, limit)
                    win_docs.append((sel[top] + c0).astype(np.int64))
                    win_scores.append(scores[sel[top]].copy())
            scores[touched] = 0.0
            matched[cand] = False
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        if len(win_docs) == 1:
            return win_docs[0], win_scores[0]
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    def score_query_terms_set(
        self, text: str, limit: int, *, field: str,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``terms_set`` query: OR retrieval where each doc's
        minimum_should_match floor is ITS OWN doc value (the
        minimum_should_match_field contract) — doc i survives when it
        matches >= field[i] DISTINCT query terms; docs missing the field
        never match. Survivor scores are bit-identical to ``score_query``
        (the floor is a candidate filter, not a scoring change)."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        req = self.doc_values(field)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        return self._score_dense_general(
            present, limit, n_slots, min_match_values=req,
            exclude=excl, doc_range=doc_range,
        )

    def score_query_after(
        self, text: str, limit: int, after_score: float, after_doc: int,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Cursor pagination (the ES ``search_after`` contract): top-k among
        docs ranking STRICTLY AFTER the cursor ``(after_score, after_doc)``
        in the canonical (score DESC, doc ASC) order — page N+1 continues
        exactly where page N's last hit stopped, with no duplicate and no
        gap even when new pages are computed independently. Scores are
        bit-identical to ``score_query`` (the cursor is a candidate filter);
        paging through all docs reproduces the full ranked list."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        return self._score_dense_general(
            present, limit, n_slots, exclude=excl, doc_range=doc_range,
            after=(float(after_score), int(after_doc)),
        )

    def score_query_collapse(
        self, text: str, limit: int, group_of=None,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Field-collapse retrieval (the ES ``collapse`` analog): each GROUP
        is represented by its single best doc (max score, doc-ASC tie-break
        — the canonical order), and top-k ranks the group winners.
        ``group_of`` maps a sorted doc-id array to int64 group ids; None
        collapses by conversation (doc ids are conv-base offsets, so the
        group id is a searchsorted over the bases). Winner scores are
        bit-identical to ``score_query``'s for the same docs.

        Chunk-safe: groups may span chunks, but max is distributive — the
        global top-k group winners are a subset of the union of per-chunk
        top-k group winners, so each chunk contributes its capped winner set
        and the merge re-reduces per group."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        if group_of is None:
            def group_of(docs):
                return np.searchsorted(self._bases, docs, side="right") - 1
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        one_chunk = chunk >= n_slots
        w_group: list[np.ndarray] = []
        w_docs: list[np.ndarray] = []
        w_scores: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t, _w in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    docs_abs = sel + c0
                    s_sel = scores[sel]
                    g = np.asarray(group_of(docs_abs), dtype=np.int64)
                    # per-group winner: first row in (group ASC, score DESC,
                    # doc ASC) order; docs_abs is ascending so a stable sort
                    # keeps doc-ASC among score ties
                    order = np.lexsort((docs_abs, -s_sel, g))
                    gs = g[order]
                    first = np.concatenate([[0], np.nonzero(np.diff(gs))[0] + 1])
                    win = order[first]
                    if len(win) > limit:  # cap: top-limit groups this chunk
                        top = bm25.topk_indices(s_sel[win], docs_abs[win], limit)
                        win = win[top]
                    w_group.append(g[win])
                    w_docs.append(docs_abs[win].astype(np.int64))
                    w_scores.append(s_sel[win].copy())
                scores[cand] = 0.0
                matched[cand] = False
        if not w_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        g = np.concatenate(w_group)
        d = np.concatenate(w_docs)
        s = np.concatenate(w_scores)
        order = np.lexsort((d, -s, g))
        gs = g[order]
        first = np.concatenate([[0], np.nonzero(np.diff(gs))[0] + 1])
        win = order[first]
        top = bm25.topk_indices(s[win], d[win], limit)
        return d[win][top], s[win][top]

    def collapse_inner_hits(
        self, text: str, limit: int, inner_n: int = 2,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ES ``collapse`` with ``inner_hits``: the top-``limit`` GROUPS
        (ranked by their best doc, exactly like ``score_query_collapse``)
        each return their top-``inner_n`` matching docs, GROUP-MAJOR
        (groups in rank order; within a group score DESC, doc ASC — the ES
        inner_hits layout, deliberately not globally score-sorted).
        Returns (docs, scores, group_ids); each doc carries its OWN score,
        bit-identical to ``score_query`` for that doc.

        Scale note: per-chunk state is top-``inner_n`` rows per group
        (distributive, same argument as the winner-only collapse), so a
        group spanning chunks merges exactly."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        empty3 = (np.array([], dtype=np.int64), np.array([], dtype=np.float64),
                  np.array([], dtype=np.int64))
        if not present:
            return empty3
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        one_chunk = chunk >= n_slots
        a_group: list[np.ndarray] = []
        a_docs: list[np.ndarray] = []
        a_scores: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t, _w in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    docs_abs = (sel + c0).astype(np.int64)
                    s_sel = scores[sel]
                    g = np.searchsorted(self._bases, docs_abs, side="right") - 1
                    order = np.lexsort((docs_abs, -s_sel, g))
                    gs = g[order]
                    first = np.concatenate(
                        [[0], np.nonzero(np.diff(gs))[0] + 1]
                    )
                    # keep the first inner_n rows of each group run
                    seg_of = np.repeat(
                        np.arange(len(first)),
                        np.diff(np.concatenate([first, [len(order)]])),
                    )
                    pos_in_seg = np.arange(len(order)) - first[seg_of]
                    keep = order[pos_in_seg < inner_n]
                    a_group.append(g[keep])
                    a_docs.append(docs_abs[keep])
                    a_scores.append(s_sel[keep].copy())
                scores[cand] = 0.0
                matched[cand] = False
        if not a_docs:
            return empty3
        g = np.concatenate(a_group)
        d = np.concatenate(a_docs)
        s = np.concatenate(a_scores)
        order = np.lexsort((d, -s, g))
        g, d, s = g[order], d[order], s[order]
        first = np.concatenate([[0], np.nonzero(np.diff(g))[0] + 1])
        seg_of = np.repeat(
            np.arange(len(first)), np.diff(np.concatenate([first, [len(g)]]))
        )
        pos_in_seg = np.arange(len(g)) - first[seg_of]
        keep = pos_in_seg < inner_n
        g, d, s = g[keep], d[keep], s[keep]
        # rank groups by their best (first) row: score DESC, doc ASC
        first = np.concatenate([[0], np.nonzero(np.diff(g))[0] + 1])
        top = bm25.topk_indices(s[first], d[first], limit)
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        out_g: list[np.ndarray] = []
        ends = np.concatenate([first[1:], [len(g)]])
        for i in top:
            sl = slice(first[i], ends[i])
            out_d.append(d[sl])
            out_s.append(s[sl])
            out_g.append(g[sl])
        return (np.concatenate(out_d), np.concatenate(out_s),
                np.concatenate(out_g))

    def score_query_blockjoin(
        self, text: str, limit: int, mode: str = "sum",
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Parent/child block-join retrieval (the ES ``has_child`` /
        Lucene ToParentBlockJoinQuery analog): each CONVERSATION is scored
        by aggregating its matching turns' BM25 scores — ``mode`` is the
        ES score_mode: "sum", "avg" (over matching turns), "max", or
        "count" (number of matching turns). Returns the group's BEST turn
        (max score, doc-ASC tie-break — the inner_hits representative)
        carrying the GROUP score; groups rank (group score DESC, conv ASC).

        Chunk-safe for every mode: sum/avg/count are NOT cappable per chunk
        the way max is, so each chunk emits complete per-group PARTIALS
        (sum, n, max, representative doc) and the merge reduces partials by
        group id before the single global top-k — a conversation spanning a
        chunk boundary combines exactly."""
        if mode not in ("sum", "avg", "max", "count", "parent"):
            raise ValueError(f"unknown block-join score mode {mode!r}")
        if mode == "parent":
            # ES has_parent (score=true): the inverse join direction —
            # return CHILD docs of conversations whose PARENT doc (turn 0)
            # matches the query, each child carrying the parent's score
            return self._score_query_hasparent(
                text, limit, exclude_text=exclude_text, doc_range=doc_range
            )
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        one_chunk = chunk >= n_slots
        p_group: list[np.ndarray] = []
        p_sum: list[np.ndarray] = []
        p_n: list[np.ndarray] = []
        p_max: list[np.ndarray] = []
        p_rep: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t, _w in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    docs_abs = (sel + c0).astype(np.int64)
                    s_sel = scores[sel]
                    g = np.searchsorted(self._bases, docs_abs, side="right") - 1
                    # docs_abs ascending => g non-decreasing: one reduceat
                    # pass per statistic, no sort needed
                    starts = np.concatenate(
                        [[0], np.nonzero(np.diff(g))[0] + 1]
                    )
                    p_group.append(g[starts])
                    p_sum.append(np.add.reduceat(s_sel, starts))
                    p_n.append(np.diff(np.concatenate([starts, [len(g)]])))
                    gmax = np.maximum.reduceat(s_sel, starts)
                    p_max.append(gmax)
                    # representative = first doc achieving the group max
                    # (doc-ASC tie-break falls out of first-occurrence argmax)
                    seg = np.repeat(
                        np.arange(len(starts)), np.diff(np.concatenate([starts, [len(g)]]))
                    )
                    is_max = s_sel == gmax[seg]
                    # first True per segment = doc-ASC argmax
                    idxs = np.nonzero(is_max)[0]
                    segs_of = seg[idxs]
                    firsts = np.concatenate(
                        [[0], np.nonzero(np.diff(segs_of))[0] + 1]
                    )
                    first_max = idxs[firsts]
                    p_rep.append(docs_abs[first_max])
                scores[cand] = 0.0
                matched[cand] = False
        if not p_group:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        g = np.concatenate(p_group)
        sm = np.concatenate(p_sum)
        nn = np.concatenate(p_n).astype(np.int64)
        mx = np.concatenate(p_max)
        rep = np.concatenate(p_rep)
        # merge partials of groups split across chunk boundaries
        order = np.argsort(g, kind="stable")
        g, sm, nn, mx, rep = g[order], sm[order], nn[order], mx[order], rep[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(g))[0] + 1])
        g_u = g[starts]
        sm_u = np.add.reduceat(sm, starts)
        nn_u = np.add.reduceat(nn, starts)
        mx_u = np.maximum.reduceat(mx, starts)
        # representative across partials: the partial with the larger max
        # wins; ties keep the earlier (lower-doc) partial
        npart = np.diff(np.concatenate([starts, [len(g)]]))
        seg = np.repeat(np.arange(len(starts)), npart)
        is_max = mx == mx_u[seg]
        idxs = np.nonzero(is_max)[0]
        segs_of = seg[idxs]
        firsts = np.concatenate([[0], np.nonzero(np.diff(segs_of))[0] + 1])
        rep_u = rep[idxs[firsts]]
        if mode == "sum":
            score_u = sm_u
        elif mode == "avg":
            score_u = sm_u / nn_u
        elif mode == "count":
            score_u = nn_u.astype(np.float64)
        else:
            score_u = mx_u
        top = bm25.topk_indices(score_u, rep_u, limit)
        return rep_u[top], score_u[top]

    def _score_query_hasparent(
        self, text: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``has_parent`` with score=true: children of conversations
        whose PARENT document (turn 0 — the first doc of the conv block,
        Lucene's index-time-join parent position) matches the query; each
        child carries the parent's BM25 score. Rank (parent score DESC,
        doc ASC) — within a parent children ascend by doc, across parents
        the conv-blocked doc-id layout keeps the global tie-break
        (score DESC, doc ASC) exact.

        Parent scores keep the canonical accumulation structure
        (sequential ``scores[docs] += s`` in sorted term order, restricted
        to parent positions), so a parent's score is bit-identical to
        ``score_query`` of that doc. Exclusions and conv_prefix ranges
        filter the CHILD side (the ES filter-on-child composition)."""
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
        if not present:
            return empty
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        bases = self._bases
        n_slots = self._max_doc_id + 1
        pscore = np.zeros(len(bases), dtype=np.float64)
        pmatch = np.zeros(len(bases), dtype=bool)
        for t in present:
            docs_t, scores_t = self.term_docs_scores(t)
            gi = np.minimum(
                np.searchsorted(bases, docs_t), len(bases) - 1
            )
            isp = bases[gi] == docs_t
            pscore[gi[isp]] += scores_t[isp]
            pmatch[gi[isp]] = True
        g_all = np.nonzero(pmatch)[0]
        if not len(g_all):
            return empty
        ends = np.concatenate([bases[1:], [n_slots]]).astype(np.int64)
        # parents in rank order (score DESC, conv ASC == doc ASC)
        order = np.lexsort((g_all, -pscore[g_all]))
        g_rank = g_all[order]
        out_docs: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        have = 0
        # generate children in parent-rank order until the page is full —
        # block-at-a-time so a broad query never materializes every child
        for b0 in range(0, len(g_rank), 256):
            gb = g_rank[b0 : b0 + 256]
            lo = bases[gb] + 1  # children exclude the parent doc itself
            n_child = ends[gb] - lo
            keep = n_child > 0
            if keep.any():
                gb, lo, n_child = gb[keep], lo[keep], n_child[keep]
                docs = (
                    np.repeat(lo, n_child)
                    + _ranges_arange(n_child)
                ).astype(np.int64)
                scores = np.repeat(pscore[gb], n_child)
                if doc_range is not None:
                    # docs are NOT globally sorted within a rank block —
                    # mask directly (only excl needs to be sorted below)
                    m = (docs >= doc_range[0]) & (docs < doc_range[1])
                    docs, scores = docs[m], scores[m]
                if excl is not None and len(docs):
                    pos = np.searchsorted(excl, docs)
                    hit = (pos < len(excl)) & (
                        excl[np.minimum(pos, len(excl) - 1)] == docs
                    )
                    docs, scores = docs[~hit], scores[~hit]
                if len(docs):
                    out_docs.append(docs)
                    out_scores.append(scores)
                    have += len(docs)
            if have >= limit:
                break
        if not out_docs:
            return empty
        docs = np.concatenate(out_docs)[:limit]
        scores = np.concatenate(out_scores)[:limit]
        return docs, scores

    def doc_values(self, field: str) -> np.ndarray:
        """Doc-indexed numeric field array (Lucene doc values), loaded once
        per reader and cached — the per-actor T1 pattern."""
        cache = getattr(self, "_dv_cache", None)
        if cache is None:
            cache = self._dv_cache = {}
        arr = cache.get(field)
        if arr is None:
            from clip_as_service_ray.pipelines.docvalues import load_doc_values

            arr = cache[field] = load_doc_values(
                self.index_dir, field, self._max_doc_id + 1
            )
        return arr

    def score_query_decay(
        self, text: str, limit: int, *, field: str = "", origin: float = 0.0,
        scale: float = 1.0, offset: float = 0.0, decay: float = 0.5,
        kind: str = "gauss", factor: float = 1.0, modifier: str = "none",
        missing: float = 1.0, function: str = "saturation",
        pivot: float = 1.0, weight: float = 1.0, exponent: float = 0.6,
        scaling_factor: float = 1.0, seed: int = 0,
        exclude_text: str = "", doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """function_score doc-value retrieval: every matching doc's OR score
        is combined with a function of its ``field`` doc value BEFORE top-k
        — the weighted ranking is global, not a rescoring of an unweighted
        top-N. ``kind`` gauss/exp/linear are the multiplicative decay curves
        (origin/scale/offset/decay params); ``kind="fvf"`` is multiplicative
        field_value_factor (factor/modifier/missing params);
        ``kind="rank_feature"`` is the ADDITIVE rank_feature query
        (function/pivot/weight/exponent/scaling_factor params, boost_mode
        sum). Chunk-safe: the combine is pointwise, so per-chunk capping
        after combination is exact."""
        from clip_as_service_ray.pipelines.docvalues import (
            decay_multiplier,
            fvf_multiplier,
            rank_feature_boost,
        )

        if kind == "random":
            # ES random_score (boost_mode=replace): deterministic Knuth
            # multiplicative hash of (doc_id, seed) -> [0, 1); needs no
            # doc-values artifact — the doc id IS the input. Reproducible
            # across runs, shards, and the SQL twin (exact integer mod).
            # normalize up front: uint64(negative) raises OverflowError on
            # NumPy>=2, and only the low 32 bits ever matter (mod 2^32)
            def combine(s, v, _seed=int(seed) % (1 << 32)):
                h = (v.astype(np.uint64) * np.uint64(2654435761)
                     + np.uint64(_seed)) % np.uint64(4294967296)
                # squaring mix: an affine-only hash would shift every doc
                # by the same constant per seed and never reorder; h*h
                # wraps mod 2^64 in uint64, and (x mod 2^64) mod 2^32 ==
                # x mod 2^32, so the wrap is exact vs the SQL hugeint
                h = (h * h + h) % np.uint64(4294967296)
                return h.astype(np.float64) / 4294967296.0
        elif kind == "fvf":
            def combine(s, v):
                return s * fvf_multiplier(v, factor, modifier, missing)
        elif kind == "rank_feature":
            def combine(s, v):
                return s + rank_feature_boost(
                    v, function, pivot, weight, exponent, scaling_factor
                )
        else:
            def combine(s, v):
                return s * decay_multiplier(v, origin, scale, offset, decay, kind)

        if kind != "random" and not field:
            raise ValueError(
                "decay kind %r requires field (only kind='random' scores "
                "without a doc-values artifact)" % kind
            )
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [(t, 1.0) for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        vals = None if kind == "random" else self.doc_values(field)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        one_chunk = chunk >= n_slots
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t, _w in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    docs_abs = (sel + c0).astype(np.int64)
                    s_dec = combine(
                        scores[sel],
                        vals[docs_abs] if vals is not None else docs_abs,
                    )
                    top = bm25.topk_indices(s_dec, docs_abs, limit)
                    win_docs.append(docs_abs[top])
                    win_scores.append(s_dec[top].copy())
                scores[cand] = 0.0
                matched[cand] = False
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    def _score_dense_general(
        self, present: list[tuple[str, float]], limit: int, n_slots: int,
        *, min_match: int = 0, min_match_values=None, exclude=None,
        doc_range=None, after=None,
    ):
        """Shared dense/chunked accumulator for the weighted and
        minimum_should_match variants. Keeps the canonical per-term
        sequential ``scores[docs] +=`` structure (sorted-term order is the
        caller's contract); tracks a per-doc distinct-match count only when
        ``min_match > 1`` or a per-doc requirement array is given
        (``min_match_values``: the ES terms_set contract — doc i must match
        >= min_match_values[i] distinct terms; NaN = doc has no requirement
        field and can never match). Memory-bounded: falls to
        ``dense_chunk_docs``-slot chunks above the dense threshold, same as
        ``score_query``."""
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        counts = None
        if min_match > 1 or min_match_values is not None:
            if (
                getattr(self, "_count_buf", None) is None
                or len(self._count_buf) != chunk
            ):
                self._count_buf = np.zeros(chunk, dtype=np.uint16)
            counts = self._count_buf
        scores, matched = self._score_buf, self._match_buf
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        one_chunk = chunk >= n_slots
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t, w in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t if w == 1.0 else w * scores_t
                matched[rel] = True
                if counts is not None:
                    counts[rel] += 1
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if min_match_values is not None:
                    req = min_match_values[sel + c0]
                    # NaN req fails both comparisons -> doc never matches
                    sel = sel[counts[sel].astype(np.float64) >= req]
                elif counts is not None:
                    sel = sel[counts[sel] >= min_match]
                if doc_range is not None and len(sel):
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if exclude is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, exclude) - c0
                if after is not None and len(sel):
                    # strictly after the cursor in (score DESC, doc ASC):
                    # lower score, or equal score and larger doc id
                    a_s, a_d = after
                    s_sel = scores[sel]
                    sel = sel[(s_sel < a_s) | ((s_sel == a_s) & (sel + c0 > a_d))]
                if len(sel):
                    top = bm25.topk_indices(scores[sel], sel + c0, limit)
                    win_docs.append((sel[top] + c0).astype(np.int64))
                    win_scores.append(scores[sel[top]].copy())
                scores[cand] = 0.0
                matched[cand] = False
                if counts is not None:
                    counts[cand] = 0
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        if len(win_docs) == 1:
            return win_docs[0], win_scores[0]
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    def expand_prefix(self, prefix: str, max_terms: int | None = None) -> list[str]:
        """Wildcard expansion ``prefix*`` over the sorted dictionary: one
        searchsorted range, no scan. ``max_terms`` caps runaway expansions
        (None = unbounded, the SQL-twin-exact form)."""
        if not prefix:
            return []
        lo = int(np.searchsorted(self._terms_sorted, prefix))
        # upper bound: prefix + max code point (a term containing a literal
        # U+10FFFF right after the prefix would be missed — not a real input)
        hi = int(np.searchsorted(self._terms_sorted, prefix + chr(0x10FFFF)))
        out = self._terms_sorted[lo:hi].tolist()
        if max_terms is not None and len(out) > max_terms:
            raise ValueError(
                f"prefix {prefix!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def score_query_prefix(
        self, prefix: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k for a ``prefix*`` query: OR over every dictionary term
        with that prefix, each with its own df/idf — exact dense scoring
        with the same canonical accumulation order as ``score_query``.
        ``exclude_text`` filters NOT-docs before top-k (prefix-NOT)."""
        present = self.expand_prefix(prefix)
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def score_query_bool_prefix(
        self, text: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES ``match_bool_prefix``: every term of the text is an OR term
        query EXCEPT the last, which matches as a PREFIX (the
        search-as-you-type contract — "quick brown f" scores quick OR
        brown OR f*). The union term set dedups and sorts, keeping the
        canonical accumulation order, so a query whose last term expands
        only to itself is bit-identical to plain ``score_query``."""
        toks = self._qtokens(text)
        if not toks:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        full = [t for t in toks[:-1] if t in self._term_blocks]
        present = sorted(set(full) | set(self.expand_prefix(toks[-1])))
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def expand_suffix(self, suffix: str, max_terms: int | None = None) -> list[str]:
        """Leading-wildcard expansion ``*suffix`` (Lucene's
        ReverseStringFilter use case): every dictionary term ending with
        the suffix. One vocabulary pass here; the index-side scale path is
        a REVERSED sorted dictionary making this the same searchsorted
        range as ``expand_prefix`` (the dictionary is already a plain
        sorted column — reversing at build adds one string kernel)."""
        if not suffix:
            return []
        out = [t for t in self._terms_sorted.tolist() if t.endswith(suffix)]
        if max_terms is not None and len(out) > max_terms:
            raise ValueError(
                f"suffix {suffix!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def score_query_suffix(
        self, suffix: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k for a ``*suffix`` query — OR over the expanded term
        set, same canonical accumulation as ``score_query_prefix``."""
        present = self.expand_suffix(suffix)
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def expand_regex(self, pattern: str, max_terms: int | None = None) -> list[str]:
        """Regexp term expansion (Lucene RegexpQuery analog): every
        dictionary term FULLY matching the pattern. Lucene walks the term
        dictionary per segment the same way; at 10^8-term vocabularies the
        scan shards over the distributed dictionary table."""
        import re as _re

        if not pattern:
            return []
        rx = _re.compile(pattern)
        out = [t for t in self._terms_sorted.tolist() if rx.fullmatch(t)]
        if max_terms is not None and len(out) > max_terms:
            raise ValueError(
                f"regex {pattern!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def score_query_regex(
        self, pattern: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k for a regexp term query — OR over the matched term
        set, each with its own idf."""
        present = self.expand_regex(pattern)
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def expand_term_range(
        self,
        lo: str | None,
        hi: str | None,
        include_lo: bool = True,
        include_hi: bool = True,
        max_terms: int | None = None,
    ) -> list[str]:
        """Term-range expansion (Lucene TermRangeQuery analog): every
        dictionary term lexicographically between ``lo`` and ``hi``
        (None = unbounded end, the `[a TO *]` form). Two searchsorted
        probes on the sorted dictionary — no scan; at 10^8-term
        vocabularies the sorted dictionary is range-partitioned and the
        probes touch only boundary shards."""
        t = self._terms_sorted
        i = 0 if lo is None else int(
            np.searchsorted(t, lo, side="left" if include_lo else "right")
        )
        j = len(t) if hi is None else int(
            np.searchsorted(t, hi, side="right" if include_hi else "left")
        )
        out = t[i:j].tolist()
        if max_terms is not None and len(out) > max_terms:
            raise ValueError(
                f"range [{lo!r} TO {hi!r}] expands to {len(out)} terms "
                f"(> {max_terms})"
            )
        return out

    @staticmethod
    def parse_term_range(text: str) -> tuple[str | None, str | None, bool, bool]:
        """Parse Lucene range syntax: ``[lo TO hi]`` inclusive, ``{lo TO
        hi}`` exclusive, mixed brackets allowed, ``*`` = unbounded end.
        Returns (lo, hi, include_lo, include_hi)."""
        import re as _re

        m = _re.fullmatch(
            r"\s*([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])\s*", text or ""
        )
        if not m:
            raise ValueError(
                f"term range query must look like '[lo TO hi]' or "
                f"'{{lo TO hi}}' (got {text!r})"
            )
        lo = None if m.group(2) == "*" else m.group(2)
        hi = None if m.group(3) == "*" else m.group(3)
        return lo, hi, m.group(1) == "[", m.group(4) == "]"

    def score_query_term_range(
        self, text: str, limit: int, exclude_text: str = "", doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k for a term-range query ``[lo TO hi]`` — OR over the
        expanded term set, each with its own idf, same canonical
        accumulation as ``score_query_prefix``. Bounds compare against
        dictionary terms as stored (post-analyzer), mirroring Lucene's
        unanalyzed range semantics."""
        lo, hi, ilo, ihi = self.parse_term_range(text)
        present = self.expand_term_range(lo, hi, ilo, ihi)
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def expand_fuzzy(
        self, term: str, max_dist: int = 2, transpositions: bool = False
    ) -> list[str]:
        """Fuzzy expansion: every vocabulary term within ``max_dist`` edits
        (Lucene fuzzy-query analog). ``transpositions=True`` switches to the
        ES-default metric (optimal string alignment: an adjacent swap costs
        one edit) — Lucene ``FuzzyQuery(transpositions=true)``. Length
        pruning before the capped-DP verify; the sandbox vocabulary scans
        in one pass — at 10^8-term vocabularies the scan shards trivially
        (the dictionary is already a distributed table) or gates behind an
        n-gram index."""
        from clip_as_service_ray.stages.dedup import (
            _levenshtein_capped,
            _osa_capped,
        )

        dist = _osa_capped if transpositions else _levenshtein_capped
        lt = len(term)
        out = []
        for t in self._terms_sorted:
            if abs(len(t) - lt) > max_dist:
                continue
            if dist(term, t, max_dist) <= max_dist:
                out.append(t)
        return out

    def suggest(
        self, term: str, max_dist: int = 2, k: int = 5
    ) -> list[tuple[str, int, int]]:
        """Did-you-mean: the top-k vocabulary terms within ``max_dist`` edits
        of ``term``, ranked (dist ASC, df DESC, term ASC) — edit-distance
        candidates weighted by the collection-frequency prior, the standard
        speller shape (Lucene DirectSpellChecker analog). Vectorized
        length-band prefilter; capped-DP verify only inside the band."""
        from clip_as_service_ray.stages.dedup import _levenshtein_capped

        if not term or len(self._terms_sorted) == 0:
            return []
        if not hasattr(self, "_term_lens"):
            self._term_lens = np.fromiter(
                (len(t) for t in self._terms_sorted),
                np.int64,
                count=len(self._terms_sorted),
            )
        band = np.nonzero(np.abs(self._term_lens - len(term)) <= max_dist)[0]
        cands = []
        for i in band:
            t = self._terms_sorted[i]
            d = _levenshtein_capped(term, t, max_dist)
            if d <= max_dist:
                cands.append((d, -int(self.df.get(t, 0)), t))
        cands.sort()
        if k > 0:  # k<=0: ALL candidates (segmented merge re-ranks globally)
            cands = cands[:k]
        return [(t, d, -negdf) for d, negdf, t in cands]

    def complete(self, prefix: str, k: int = 5) -> list[tuple[str, int]]:
        """Autocomplete: top-k completions of ``prefix`` by (df DESC, term
        ASC) — one searchsorted range over the sorted dictionary, then a
        partial sort of the (usually small) expansion."""
        terms = self.expand_prefix(prefix)
        ranked = sorted((-int(self.df.get(t, 0)), t) for t in terms)
        if k > 0:  # k<=0: ALL completions (segmented merge re-ranks globally)
            ranked = ranked[:k]
        return [(t, -negdf) for negdf, t in ranked]

    def score_query_fuzzy(
        self, text: str, limit: int, max_dist: int = 2, exclude_text: str = "",
        doc_range=None, transpositions: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """BM25 top-k where EACH query token expands to its fuzzy vocabulary
        neighborhood; the union of expansions scores with per-term idf in
        the canonical sorted order. ``exclude_text`` filters NOT-docs before
        top-k (fuzzy-NOT; the exclusion side is NOT fuzzy-expanded).
        ``transpositions`` selects the ES-default OSA metric."""
        present: set[str] = set()
        for tok in set(self._qtokens(text)):
            present.update(self.expand_fuzzy(tok, max_dist, transpositions))
        terms = sorted(present)
        if not terms:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(terms, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(terms, limit, n_slots, exclude=excl, doc_range=doc_range)

    def excluded_docs(self, text: str) -> np.ndarray:
        """Union of doc ids containing ANY token of ``text`` (the NOT side
        of boolean retrieval), sorted ascending."""
        terms = sorted(set(self._qtokens(text)))
        parts = []
        for t in terms:
            if t in self._term_blocks:
                parts.append(self.term_docs_scores(t)[0])
        if not parts:
            return np.array([], dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def score_query_not(
        self, text: str, exclude_text: str, limit: int, doc_range=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Boolean NOT: exact OR-semantics BM25 top-k over docs that match
        ``text`` but contain NO token of ``exclude_text``. Scores of the
        survivors are bit-identical to ``score_query``'s — the exclusion is
        a candidate filter applied BEFORE top-k selection (an excluded doc
        never consumes a result slot, and a hot excluded term never inflates
        the sort: the filter is a searchsorted pass, not an over-ask)."""
        excl = self.excluded_docs(exclude_text)
        if len(excl) == 0:
            return self.score_query(text, limit, doc_range=doc_range)
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        n_slots = self._max_doc_id + 1
        if n_slots <= self.dense_chunk_docs:
            return self._score_dense(present, limit, n_slots, exclude=excl, doc_range=doc_range)
        return self._score_dense_chunked(present, limit, n_slots, exclude=excl, doc_range=doc_range)

    def score_query_boosting(
        self, text: str, negative_text: str, limit: int, *,
        negative_boost: float = 0.5, exclude_text: str = "",
        doc_range=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ES `boosting` query (soft NOT): exact OR-semantics BM25 where
        docs matching ANY token of ``negative_text`` keep their slot but
        have their score multiplied by ``negative_boost`` BEFORE top-k —
        demotion, not exclusion (score_query_not is the hard form). The
        multiplier is pointwise, so per-chunk capping after multiplication
        is exact (same chunk-safety argument as decay). Survivor scores of
        non-demoted docs are bit-identical to score_query's; demoted docs
        are exactly score * negative_boost (one multiply, same float on
        both engines)."""
        neg = self.excluded_docs(negative_text) if negative_text else None
        neg = neg if neg is not None and len(neg) else None
        excl = self.excluded_docs(exclude_text) if exclude_text else None
        excl = excl if excl is not None and len(excl) else None
        if neg is None and excl is None:
            return self.score_query(text, limit, doc_range=doc_range)
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        nb = float(negative_boost)
        n_slots = self._max_doc_id + 1
        chunk = min(n_slots, self.dense_chunk_docs)
        if self._score_buf is None or len(self._score_buf) != chunk:
            self._score_buf = np.zeros(chunk, dtype=np.float64)
            self._match_buf = np.zeros(chunk, dtype=bool)
        scores, matched = self._score_buf, self._match_buf
        one_chunk = chunk >= n_slots
        win_docs: list[np.ndarray] = []
        win_scores: list[np.ndarray] = []
        for c0 in range(0, n_slots, chunk):
            c1 = min(c0 + chunk, n_slots)
            for t in present:
                if one_chunk:
                    docs_t, scores_t = self.term_docs_scores(t)
                    rel = docs_t
                else:
                    docs_t, scores_t = self.term_postings_in_range(t, c0, c1)
                    if not len(docs_t):
                        continue
                    rel = docs_t - c0
                scores[rel] += scores_t
                matched[rel] = True
            cand = np.nonzero(matched[: c1 - c0])[0]
            if len(cand):
                sel = cand
                if doc_range is not None:
                    sel = self._clip_to_range(sel + c0, doc_range) - c0
                if excl is not None and len(sel):
                    sel = self._drop_excluded(sel + c0, excl) - c0
                if len(sel):
                    docs_abs = (sel + c0).astype(np.int64)
                    s = scores[sel].copy()
                    if neg is not None:
                        pos = np.searchsorted(neg, docs_abs)
                        hit = (pos < len(neg)) & (
                            neg[np.minimum(pos, len(neg) - 1)] == docs_abs
                        )
                        s[hit] *= nb
                    top = bm25.topk_indices(s, docs_abs, limit)
                    win_docs.append(docs_abs[top])
                    win_scores.append(s[top].copy())
                scores[cand] = 0.0
                matched[cand] = False
        if not win_docs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        d = np.concatenate(win_docs)
        s = np.concatenate(win_scores)
        top = bm25.topk_indices(s, d, limit)
        return d[top], s[top]

    @staticmethod
    def _drop_excluded(cand: np.ndarray, exclude: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(exclude, cand)
        hit = (pos < len(exclude)) & (
            exclude[np.minimum(pos, len(exclude) - 1)] == cand
        )
        return cand[~hit]

    def term_upper_bound(self, term: str) -> float:
        """idf(term) * max block max_tf_norm — the WAND/MaxScore term bound,
        computed from block metadata only (no posting decode)."""
        rows = self._term_blocks.get(term)
        if rows is None:
            return 0.0
        df = int(self.df.get(term, 0))
        return float(
            bm25.idf(float(df), self.n_docs)
            * (np.max(self._b_max[rows]) + self.delta)
        )

    def score_query_pruned(self, text: str, limit: int) -> tuple[np.ndarray, np.ndarray]:
        """Rank-safe MaxScore-style top-k: RETURNS EXACTLY WHAT score_query
        RETURNS (same docs, bit-identical scores) but prunes work using the
        block-max metadata:

        - terms are processed in descending upper-bound order (upper bound
          from block metadata alone, no decode);
        - once the suffix of unprocessed terms cannot lift any NEW doc above
          the current top-k threshold, remaining terms stop contributing new
          candidates and only their postings matching current candidates are
          gathered (np.searchsorted on the doc-sorted lists);
        - accumulation order per doc is re-fixed to sorted-term order at the
          end by re-scoring the final k docs exactly, so floats match the
          exact path bit-for-bit.
        """
        if self.similarity != "bm25":
            # upper bounds (idf * max_tf_norm envelopes) are BM25-shaped:
            # under an alternative similarity the pruning math would
            # under-bound, so fall back to the exact dense path
            return self.score_query(text, limit)
        terms = self._expand_synonyms(sorted(set(self._qtokens(text))))
        present = [t for t in terms if t in self._term_blocks]
        if not present:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        # density bailout: when the candidate set will approach the corpus
        # (stopword-heavy queries), the dense-accumulator exact path is
        # strictly faster than sparse merge+prune; results are identical
        total_df = sum(int(self.df.get(t, 0)) for t in present)
        if total_df > 0.25 * max(self.n_docs, 1):
            return self.score_query(text, limit)
        ubs = np.array([self.term_upper_bound(t) for t in present])
        order = np.argsort(-ubs, kind="stable")
        present = [present[i] for i in order]
        ubs = ubs[order]
        suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])

        cand_docs = np.array([], dtype=np.int64)
        cand_scores = np.array([], dtype=np.float64)
        for i, t in enumerate(present):
            theta = (
                -np.inf
                if len(cand_docs) < limit
                else float(np.partition(cand_scores, -limit)[-limit])
            )
            # safety margin: theta comes from partially-ordered float sums
            # (np.add.reduceat is pairwise) that can differ from the exact
            # sequential path by ulps; the noise scales with |score| and the
            # number of accumulated terms, so the margin scales with both
            eps = _prune_eps(len(present), theta)
            if suffix_ub[i] < theta - eps:
                # no unseen doc can reach the top-k: gather-only phase with
                # LAZY block decode — only blocks containing a candidate are
                # touched (block-max WAND's skipping, rank-safe by re-score)
                cand_scores += self.term_scores_for_docs(t, cand_docs)
            else:
                docs_t, scores_t = self.term_docs_scores(t)
                docs_all = np.concatenate([cand_docs, docs_t])
                scores_all = np.concatenate([cand_scores, scores_t])
                o = np.argsort(docs_all, kind="stable")
                d, s = docs_all[o], scores_all[o]
                starts = np.concatenate([[0], np.nonzero(np.diff(d))[0] + 1])
                cand_docs = d[starts]
                cand_scores = np.add.reduceat(s, starts)
            # prune candidates that can never reach the (updated) threshold
            if len(cand_docs) > limit:
                theta = float(np.partition(cand_scores, -limit)[-limit])
                eps = _prune_eps(len(present), theta)
                keep = cand_scores + suffix_ub[i + 1] >= theta - eps
                cand_docs, cand_scores = cand_docs[keep], cand_scores[keep]

        # exact re-score of ALL surviving candidates with the SAME reduction
        # structure as the exact path / golden oracle (per-term sequential
        # += in sorted-term order) so selection and scores are bit-identical
        # to score_query even at the ulp level
        if len(cand_docs) == 0:
            return cand_docs, cand_scores
        final = np.zeros(len(cand_docs), dtype=np.float64)
        for t in sorted(present):
            # selective decode again: adding an exact 0.0 for non-matching
            # candidates is bit-exact (scores are >= 0, x + 0.0 == x)
            final += self.term_scores_for_docs(t, cand_docs)
        top = bm25.topk_indices(final, cand_docs, limit)
        return cand_docs[top], final[top]


class QueryScorer:
    """map_batches actor-pool UDF: query batch -> flat ranked hits."""

    def __init__(
        self,
        index_dir: str,
        default_limit: int = 10,
        pruning: bool = True,
        global_stats: dict | None = None,
        attach_softmax: bool = False,
        conjunctive: bool = False,
        prefix: bool = False,
        fuzzy: int = 0,
        synonyms: dict | None = None,
        query_cache_size: int = 0,
        delta: float = 0.0,
        boosted: bool = False,
        min_match: int = 0,
        collapse: bool = False,
        suffix: bool = False,
        regex: bool = False,
        term_range: bool = False,
        block_join: str | None = None,
        decay: dict | None = None,
        boosting: float | None = None,
        terms_set: str | None = None,
        fuzzy_transpositions: bool = False,
        similarity: str = "bm25",
        sim_param: float | None = None,
        common_terms: float | None = None,
        bool_query: bool = False,
        min_should: int = 0,
        k1: float | None = None,
        b: float | None = None,
        bool_prefix: bool = False,
    ):
        if sum(map(bool, (conjunctive, prefix, fuzzy, boosted, min_match,
                          collapse, suffix, regex, term_range,
                          block_join, decay, boosting is not None,
                          terms_set, common_terms is not None,
                          bool_query, bool_prefix))) > 1:
            raise ValueError(
                "query modes are mutually exclusive: pick ONE of conjunctive/"
                "prefix/fuzzy/boosted/min_match/collapse/suffix/regex/"
                "term_range/block_join/decay/boosting/terms_set/common_terms/"
                "bool_query/bool_prefix"
            )
        # similarity module (Lucene/ES `similarity` index setting): the
        # same index artifact scored under lmdirichlet / lmjm / tfidf /
        # boolean kernels. delta is a BM25 refinement, so mixing them is a
        # config error; pruning envelopes are BM25-shaped, so non-BM25
        # similarities force the exact dense path. Validated BEFORE the
        # index load so config errors fail fast.
        if similarity not in bm25.SIMILARITIES:
            raise ValueError(
                f"unknown similarity {similarity!r}; pick one of "
                f"{bm25.SIMILARITIES}"
            )
        if similarity != "bm25":
            if delta:
                raise ValueError("delta (BM25+) applies to similarity='bm25' only")
            pruning = False
        self.reader = IndexReader(index_dir, global_stats=global_stats)
        # per-request BM25 parameter tuning (the ES index setting
        # `similarity: {type: BM25, k1, b}` served per pool): overrides the
        # build-time constants BEFORE any block decode, so every cached
        # tf_norm uses the override consistently. Block-max metadata
        # (max_tf_norm) was encoded under the BUILD k1/b, so the pruned
        # path's upper bounds would be invalid — force the exact path.
        if k1 is not None or b is not None:
            if k1 is not None:
                self.reader.k1 = float(k1)
            if b is not None:
                self.reader.b = float(b)
            pruning = False
            self.pruning = False
        # scoring variant: delta > 0 = BM25+ (same index artifact; the
        # idf-free block cache is variant-independent)
        self.reader.delta = float(delta)
        self.reader.similarity = similarity
        self.reader.sim_param = None if sim_param is None else float(sim_param)
        self.default_limit = default_limit
        self.pruning = pruning
        # per-replica LRU result cache (the serving-side query cache of
        # Lucene/ES): keyed by the full query identity, safe because the
        # reader is immutable for the actor's lifetime (segment writes swap
        # in fresh pools). 0 disables — the batch-analytics path keeps it
        # off (keys rarely repeat there); serving pools turn it on.
        from collections import OrderedDict

        self._qcache: OrderedDict | None = (
            OrderedDict() if query_cache_size > 0 else None
        )
        self._qcache_cap = int(query_cache_size)
        if synonyms:
            if (conjunctive or prefix or fuzzy or boosted or suffix or regex
                    or term_range or block_join or decay or terms_set
                    or bool_query or bool_prefix):
                raise ValueError(
                    "synonyms expand OR queries only (AND over an expanded "
                    "set would require group-match semantics; boosted "
                    "clauses would need per-group weight inheritance)"
                )
            from clip_as_service_ray.functions.analyzers import fold_tokens

            az = self.reader.analyzer
            folded: dict[str, tuple] = {}
            for k, vs in synonyms.items():
                fk = fold_tokens(az, [k])
                if not fk:  # key is a stopword under this analyzer
                    continue
                folded[fk[0]] = tuple(sorted(set(fold_tokens(az, list(vs)))))
            self.reader.synonyms = folded
        # AND semantics: hits must contain every query term (score_query_conjunctive)
        self.conjunctive = conjunctive
        # prefix mode: query text is a term prefix, expanded over the
        # dictionary (score_query_prefix)
        self.prefix = prefix
        # bool_prefix: ES match_bool_prefix — last term a prefix query,
        # earlier terms plain OR terms (search-as-you-type)
        self.bool_prefix = bool_prefix
        # suffix mode: leading wildcard *suffix (score_query_suffix)
        self.suffix = suffix
        # regex mode: query text is a term regexp (score_query_regex)
        self.regex = regex
        # term_range mode: query text is Lucene range syntax [lo TO hi]
        self.term_range = term_range
        # block_join: parent/child score mode (sum|avg|max|count) — rank
        # conversations by aggregating their matching turns (ES has_child)
        self.block_join = block_join
        # decay: function_score decay spec {field, origin, scale[, offset,
        # decay, kind]} — multiplies each match's OR score pre-top-k
        self.decay = dict(decay) if decay else None
        # boosting: ES boosting-query negative_boost — per-query `negative`
        # column demotes (not excludes) matching docs by this multiplier
        self.boosting = None if boosting is None else float(boosting)
        # terms_set: doc-values field holding each doc's OWN
        # minimum_should_match floor (ES minimum_should_match_field)
        self.terms_set = terms_set
        # common_terms: Lucene CommonTermsQuery cutoff frequency (fraction
        # of n_docs): low-df terms select candidates, high-df terms only
        # score them (score_query_common_terms)
        self.common_terms = None if common_terms is None else float(common_terms)
        # bool_query: full Lucene BooleanQuery — query text = must clauses,
        # per-query `should` column = should clauses (min_should floor),
        # `exclude` column = must_not, conv_prefix = filter
        self.bool_query = bool(bool_query)
        self.min_should = int(min_should)
        # fuzzy > 0: each token expands to its edit-distance neighborhood;
        # fuzzy_transpositions selects the ES-default OSA metric (adjacent
        # swap = 1 edit, Lucene FuzzyQuery transpositions=true)
        self.fuzzy = int(fuzzy)
        self.fuzzy_transpositions = bool(fuzzy_transpositions)
        # boosted: query text carries Lucene caret boosts ("merge^2 window")
        self.boosted = boosted
        # min_match > 0: minimum_should_match floor on distinct matched terms
        self.min_match = int(min_match)
        # collapse: one best turn per conversation (ES field-collapse)
        self.collapse = collapse
        # mirror of set_rank writing BOTH scores (helper.py:110-114): the raw
        # BM25 score (cosine analog) plus a per-query softmax over the hits
        self.attach_softmax = attach_softmax
        # per-stage cumulative timings — the analog of the reference's
        # profile() latency tree (client.py:68-120), exposed via profile()
        self._prof = {
            "n_queries": 0, "n_hits": 0, "score_s": 0.0, "invert_s": 0.0,
            "cache_hits": 0,
        }

    def profile(self) -> dict:
        out = dict(self._prof)
        out["blocks_decoded"] = self.reader.blocks_decoded
        out["blocks_total"] = self.reader.blocks_total
        out["cached_postings"] = self.reader._cached_postings
        return out

    def encode_batch(self, queries: pa.Table) -> pa.Table:
        """/encode: (query_id, text) -> one row per (query_id, term, weight)
        — the flat form of the sparse BM25 vector (client-side regroup is a
        dict build; a flat table keeps the wire format columnar)."""
        qids_out, terms_out, w_out = [], [], []
        for qid, text in zip(queries.column("query_id").to_pylist(),
                             queries.column("text").to_pylist()):
            terms, weights = self.reader.encode_text(text or "")
            qids_out.extend([qid] * len(terms))
            terms_out.extend(terms)
            w_out.extend(weights.tolist())
        return pa.table(
            {"query_id": pa.array(qids_out, pa.int64()),
             "term": pa.array(terms_out, pa.string()),
             "weight": pa.array(w_out, pa.float64())}
        )

    def explain(self, text: str, conv_id: str, turn_idx: int) -> dict | None:
        """Proxy to the reader's Lucene-explain analog (None when this
        worker's index does not hold the document)."""
        return self.reader.explain(text, conv_id, int(turn_idx))

    def suggest_batch(
        self, queries: pa.Table, max_dist: int = 2, k: int = 5
    ) -> pa.Table:
        """/suggest: (query_id, text) -> (query_id, term, dist, df) rows,
        per-query top-k spell corrections from the index dictionary."""
        qids_out: list[int] = []
        terms_out: list[str] = []
        dist_out: list[int] = []
        df_out: list[int] = []
        for qid, text in zip(queries.column("query_id").to_pylist(),
                             queries.column("text").to_pylist()):
            for t, d, df_val in self.reader.suggest(
                (text or "").strip().lower(), max_dist=max_dist, k=k
            ):
                qids_out.append(qid)
                terms_out.append(t)
                dist_out.append(d)
                df_out.append(df_val)
        return pa.table(
            {"query_id": pa.array(qids_out, pa.int64()),
             "term": pa.array(terms_out, pa.string()),
             "dist": pa.array(dist_out, pa.int64()),
             "df": pa.array(df_out, pa.int64())}
        )

    def complete_batch(self, queries: pa.Table, k: int = 5) -> pa.Table:
        """/complete: (query_id, text) -> (query_id, term, df) rows,
        per-query top-k prefix completions from the index dictionary."""
        qids_out: list[int] = []
        terms_out: list[str] = []
        df_out: list[int] = []
        for qid, text in zip(queries.column("query_id").to_pylist(),
                             queries.column("text").to_pylist()):
            for t, df_val in self.reader.complete(
                (text or "").strip().lower(), k=k
            ):
                qids_out.append(qid)
                terms_out.append(t)
                df_out.append(df_val)
        return pa.table(
            {"query_id": pa.array(qids_out, pa.int64()),
             "term": pa.array(terms_out, pa.string()),
             "df": pa.array(df_out, pa.int64())}
        )

    def rank_batch(self, queries: pa.Table, candidates: pa.Table,
                   lenient: bool = False) -> pa.Table:
        """/rank: re-rank PROVIDED candidates per query — the set_rank
        contract (helper.py:89-124): score the candidate set against the
        query text, sort (score DESC, doc ASC), return ALL candidates ranked
        (no retrieval, no limit-k). ``queries``: (query_id, text);
        ``candidates``: (query_id, conv_id, turn_idx)."""
        import time as _time

        texts = dict(zip(queries.column("query_id").to_pylist(),
                         queries.column("text").to_pylist()))
        c_qids = np.asarray(candidates.column("query_id").to_pylist(), dtype=np.int64)
        c_convs = np.asarray(candidates.column("conv_id").to_pylist(), dtype=object)
        c_turns = np.asarray(candidates.column("turn_idx").to_pylist(), dtype=np.int64)
        if lenient:  # scatter form: keep only candidates this index holds
            doc_ids, known = self.reader.doc_ids_for(c_convs, c_turns, strict=False)
            c_qids, c_convs, c_turns, doc_ids = (
                c_qids[known], c_convs[known], c_turns[known], doc_ids[known]
            )
        else:
            doc_ids = self.reader.doc_ids_for(c_convs, c_turns)
        cols: dict[str, list] = {n: [] for n in HITS_SCHEMA.names}
        softmax_col: list[float] = []
        for qid in sorted(texts):
            m = c_qids == qid
            if not m.any():
                continue
            t0 = _time.perf_counter()
            docs_q = doc_ids[m]
            scores = self.reader.rank_docs(texts[qid] or "", docs_q)
            order = np.lexsort((docs_q, -scores))  # score DESC, doc ASC
            self._prof["score_s"] += _time.perf_counter() - t0
            self._prof["n_queries"] += 1
            self._prof["n_hits"] += len(order)
            conv_q, turn_q = c_convs[m][order], c_turns[m][order]
            cols["query_id"].extend([qid] * len(order))
            cols["rank"].extend(range(len(order)))
            cols["conv_id"].extend(conv_q.tolist())
            cols["turn_idx"].extend(int(x) for x in turn_q)
            cols["score"].extend(scores[order].tolist())
            if self.attach_softmax:
                softmax_col.extend(bm25.numpy_softmax(scores[order]).tolist())
        out = pa.table(cols, schema=HITS_SCHEMA)
        if self.attach_softmax:
            out = out.append_column("softmax_score", pa.array(softmax_col, pa.float64()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time
        qids = batch.column("query_id").to_pylist()
        texts = batch.column("text").to_pylist()
        limits = (
            batch.column("limit").to_pylist()
            if "limit" in batch.column_names
            else [self.default_limit] * len(qids)
        )
        # score_fn(text, limit, exclude_text) — a non-empty per-query
        # `exclude` COMPOSES with the active mode (AND-NOT / prefix-NOT /
        # fuzzy-NOT / OR-NOT) instead of silently forcing OR semantics
        # (round-2 ADVICE, low): every mode threads the exclusion filter
        # through its own scoring path.
        if self.conjunctive:
            score_fn = self.reader.score_query_conjunctive
        elif self.prefix:
            score_fn = self.reader.score_query_prefix
        elif self.bool_prefix:
            score_fn = self.reader.score_query_bool_prefix
        elif self.suffix:
            score_fn = self.reader.score_query_suffix
        elif self.regex:
            score_fn = self.reader.score_query_regex
        elif self.term_range:
            score_fn = self.reader.score_query_term_range
        elif self.block_join:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _m=self.block_join):
                return self.reader.score_query_blockjoin(
                    text, limit, mode=_m, exclude_text=exclude_text,
                    doc_range=doc_range,
                )
        elif self.decay:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _d=self.decay):
                return self.reader.score_query_decay(
                    text, limit, exclude_text=exclude_text,
                    doc_range=doc_range, **_d,
                )
        elif self.terms_set:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _f=self.terms_set):
                return self.reader.score_query_terms_set(
                    text, limit, field=_f, exclude_text=exclude_text,
                    doc_range=doc_range,
                )
        elif self.common_terms is not None:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _c=self.common_terms):
                return self.reader.score_query_common_terms(
                    text, limit, cutoff=_c, exclude_text=exclude_text,
                    doc_range=doc_range,
                )
        elif self.bool_query:
            score_fn = None  # dispatched per query (needs `should` column)
        elif self.boosting is not None:
            score_fn = None  # dispatched per query (needs `negative` column)
        elif self.boosted:
            score_fn = self.reader.score_query_boosted
        elif self.min_match:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _m=self.min_match):
                return self.reader.score_query_msm(
                    text, limit, min_match=_m, exclude_text=exclude_text,
                    doc_range=doc_range,
                )
        elif self.collapse:
            score_fn = self.reader.score_query_collapse
        elif self.fuzzy:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _d=self.fuzzy, _tr=self.fuzzy_transpositions):
                return self.reader.score_query_fuzzy(
                    text, limit, max_dist=_d, exclude_text=exclude_text,
                    doc_range=doc_range, transpositions=_tr,
                )
        else:
            def score_fn(text, limit, exclude_text="", doc_range=None,
                         _r=self.reader, _p=self.pruning):
                if exclude_text:
                    return _r.score_query_not(text, exclude_text, limit, doc_range=doc_range)
                if doc_range is not None:
                    # filtered queries take the exact dense path: the pruned
                    # path's thresholds assume unfiltered candidate flow
                    return _r.score_query(text, limit, doc_range=doc_range)
                return (_r.score_query_pruned if _p else _r.score_query)(text, limit)
        # boolean NOT: per-query `exclude` column (tokens whose docs are
        # filtered before top-k; empty string = no exclusion)
        excludes = (
            batch.column("exclude").to_pylist()
            if "exclude" in batch.column_names
            else None
        )
        # boosting mode: per-query `negative` column — text whose matching
        # docs are DEMOTED by self.boosting before top-k (soft NOT)
        negatives = (
            batch.column("negative").to_pylist()
            if "negative" in batch.column_names
            else None
        )
        # bool_query mode: per-query `should` column (optional clauses)
        shoulds = (
            batch.column("should").to_pylist()
            if "should" in batch.column_names
            else None
        )
        # metadata filter: per-query conv_id PREFIX restricting candidates
        # (the AnnLite filter-column analog); empty string = unfiltered
        prefixes = (
            batch.column("conv_prefix").to_pylist()
            if "conv_prefix" in batch.column_names
            else None
        )
        # cursor pagination (search_after): per-query (after_score,
        # after_conv, after_turn) columns — the cursor identifies page N's
        # last hit by its EXTERNAL identity; null/absent = first page.
        # Default OR mode only — a cursor under a mode-specific ranking
        # would silently change semantics, so it raises instead.
        after_scores = (
            batch.column("after_score").to_pylist()
            if "after_score" in batch.column_names
            else None
        )
        after_convs = (
            batch.column("after_conv").to_pylist()
            if "after_conv" in batch.column_names
            else None
        )
        after_turns = (
            batch.column("after_turn").to_pylist()
            if "after_turn" in batch.column_names
            else None
        )
        if after_scores is not None and any(
            a is not None for a in after_scores
        ) and (self.conjunctive or self.prefix or self.fuzzy or self.boosted
               or self.min_match or self.collapse or self.suffix
               or self.regex or self.term_range or self.block_join
               or self.decay or self.boosting is not None
               or self.terms_set or self.common_terms is not None
               or self.bool_query):
            raise ValueError(
                "search_after cursors apply to the default OR mode only"
            )
        cols: dict[str, list] = {n: [] for n in HITS_SCHEMA.names}
        softmax_col: list[float] = []
        for qi, (qid, text, limit) in enumerate(zip(qids, texts, limits)):
            t0 = _time.perf_counter()
            excl = excludes[qi] if excludes is not None else ""
            pfx = (prefixes[qi] or "") if prefixes is not None else ""
            aft = None
            if after_scores is not None and after_scores[qi] is not None:
                cursor_doc = -1
                if after_convs is not None and after_convs[qi]:
                    cursor_doc = int(
                        self.reader.doc_ids_for(
                            [after_convs[qi]],
                            [int(after_turns[qi]) if after_turns is not None else 0],
                        )[0]
                    )
                aft = (float(after_scores[qi]), cursor_doc)
            lim = int(limit or self.default_limit)
            neg = (negatives[qi] or "") if negatives is not None else ""
            shd = (shoulds[qi] or "") if shoulds is not None else ""
            ckey = (text, lim, excl or "", pfx, aft, neg, shd)
            cached = self._qcache.get(ckey) if self._qcache is not None else None
            if cached is not None:
                self._qcache.move_to_end(ckey)
                self._prof["cache_hits"] += 1
                doc_ids, scores = cached
            else:
                rng = self.reader.conv_prefix_range(pfx) if pfx else None
                if aft is not None:
                    doc_ids, scores = self.reader.score_query_after(
                        text, lim, aft[0], aft[1],
                        exclude_text=excl or "", doc_range=rng,
                    )
                elif self.boosting is not None:
                    doc_ids, scores = self.reader.score_query_boosting(
                        text, neg, lim, negative_boost=self.boosting,
                        exclude_text=excl or "", doc_range=rng,
                    )
                elif self.bool_query:
                    doc_ids, scores = self.reader.score_query_bool(
                        text,
                        (shoulds[qi] or "") if shoulds is not None else "",
                        lim, min_should=self.min_should,
                        exclude_text=excl or "", doc_range=rng,
                    )
                else:
                    doc_ids, scores = score_fn(
                        text, lim, exclude_text=excl or "", doc_range=rng,
                    )
                if self._qcache is not None:
                    self._qcache[ckey] = (doc_ids, scores)
                    if len(self._qcache) > self._qcache_cap:
                        self._qcache.popitem(last=False)
            self._prof["score_s"] += _time.perf_counter() - t0
            self._prof["n_queries"] += 1
            if len(doc_ids) == 0:
                continue
            t0 = _time.perf_counter()
            conv_ids, turn_idxs = self.reader.invert_doc_ids(doc_ids)
            self._prof["invert_s"] += _time.perf_counter() - t0
            self._prof["n_hits"] += len(doc_ids)
            k = len(doc_ids)
            cols["query_id"].extend([qid] * k)
            cols["rank"].extend(range(k))
            cols["conv_id"].extend(conv_ids.tolist())
            cols["turn_idx"].extend(turn_idxs.tolist())
            cols["score"].extend(scores.tolist())
            if self.attach_softmax:
                softmax_col.extend(bm25.numpy_softmax(scores).tolist())
        out = pa.table(cols, schema=HITS_SCHEMA)
        if self.attach_softmax:
            out = out.append_column("softmax_score", pa.array(softmax_col, pa.float64()))
        return out

"""Operator library backing ``__ray_entry__.queries()``.

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and returns a
Ray Dataset / pyarrow Table whose schema + values match the paired DuckDB SQL
in ``__ray_entry__.oracle_sql()`` (column names and types aligned; floats
rounded identically on both sides).

Operators are the SURVEY.md §2 inventory re-expressed over the driver tables:
tokenize (M3/M4), df / corpus stats (A-new), BM25 top-k (C4/C6 analog),
exact dedup (§2.8), quality scoring / token stats, windowed + grouped
aggregates, brute-force ANN (C6 baseline), near-dup pairs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.functions.partitions import parts_for_path as _nparts
from clip_as_service_ray.functions.tokenizer import (
    tokenize,
    tokenize_column_flat,
    tokenize_texts,
)


def _flat_bigrams(col):
    """(left_tokens, bigram_strings, n_bigrams_per_row) for a text column —
    adjacent in-row token pairs built with Arrow kernels over the flat token
    stream (no per-token Python strings). Rows with <2 tokens contribute 0."""
    tokens, lens = tokenize_column_flat(col)
    n_bi = np.maximum(lens - 1, 0)
    if len(tokens) < 2 or int(n_bi.sum()) == 0:
        empty = pa.array([], pa.string())
        return empty, empty, n_bi
    row = np.repeat(np.arange(len(lens)), lens)
    ok = pa.array(row[:-1] == row[1:])
    left = tokens.slice(0, len(tokens) - 1).filter(ok)
    right = tokens.slice(1).filter(ok)
    grams = pc.binary_join_element_wise(left, right, " ")
    return left, grams, n_bi

# ---------------------------------------------------------------------------
# helpers


def _sql_round(x, d: int):
    """DuckDB-parity rounding for POSITIVE doubles: DuckDB's round()/
    round_even() on DOUBLE scale by 10^d and round the scaled double half
    AWAY from zero (observed: round_even(87780.72499999999::DOUBLE, 2) =
    87780.73 because x*100 FP-rounds to exactly ...72.5), while np.round
    rounds the scaled half to even. floor(x * 10^d + 0.5) / 10^d
    reproduces DuckDB bit-for-bit on positives (identical IEEE multiply,
    identical half handling). Use this + plain round() in the SQL twin for
    entries whose values are dyadic rationals (divisions, cent sums) where
    exact scaled halves actually occur."""
    p = float(10 ** d)
    return np.floor(np.asarray(x, dtype=np.float64) * p + 0.5) / p


def _documents(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def _tokens_flat(batch: pa.Table) -> pa.Table:
    """documents batch -> flat (doc_id, term, tf) rows; per-doc unique terms.
    Batch-level vectorization over the flat Arrow token stream: vectorized
    tokenize, one dictionary_encode (sorted-remap for lexicographic terms)
    and one lexsort for the whole batch instead of a per-doc np.unique loop."""
    import pyarrow.compute as pc

    doc_ids = batch.column("doc_id").to_numpy()
    tokens, lens = tokenize_column_flat(batch.column("text"))
    if len(tokens) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    denc = tokens.dictionary_encode()
    raw_codes = denc.indices.to_numpy().astype(np.int64)
    dict_arr = denc.dictionary
    sort_idx = pc.array_sort_indices(dict_arr)
    rank = np.empty(len(dict_arr), np.int64)
    rank[sort_idx.to_numpy()] = np.arange(len(dict_arr))
    codes = rank[raw_codes]
    uniques_sorted = dict_arr.take(sort_idx)
    row_of_tok = np.repeat(np.arange(len(doc_ids)), lens)
    order = np.lexsort((codes, row_of_tok))
    row_s, code_s = row_of_tok[order], codes[order]
    change = np.nonzero((np.diff(row_s) != 0) | (np.diff(code_s) != 0))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(code_s)]])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[row_s[starts]], pa.int64()),
            "term": uniques_sorted.take(pa.array(code_s[starts], pa.int64())),
            "tf": pa.array((ends - starts).astype(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# fulltext core over `documents`


def tokenize_terms(sf_dir: str):
    """M3+M4: per-document term frequencies (the minimum slice §7.1)."""
    return _documents(sf_dir).map_batches(_tokens_flat, batch_format="pyarrow")


def term_df(sf_dir: str):
    """Document frequency per term (combiner: per-batch unique, then sum)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        g = t.group_by("term").aggregate([("doc_id", "count")])
        return g.rename_columns(["term", "df_part"])

    ds = _documents(sf_dir).map_batches(partial, batch_format="pyarrow")
    return ds.groupby("term", num_partitions=_nparts(sf_dir)).aggregate(Sum("df_part", alias_name="df"))


def top_terms(sf_dir: str, k: int = 20):
    """Top-k terms by total tf; per-batch pre-aggregation before the small
    groupby, then a driver-side sort of the tiny result (no global sort)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        g = t.group_by("term").aggregate([("tf", "sum")])
        return g.rename_columns(["term", "tf_part"])

    ds = _documents(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("term", num_partitions=_nparts(sf_dir)).aggregate(Sum("tf_part", alias_name="total_tf"))
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return tbl.sort_by([("total_tf", "descending"), ("term", "ascending")]).slice(0, k)


def corpus_stats(sf_dir: str):
    """N (docs with >=1 term) + avgdl — the broadcast stats table (J2)."""
    from ray.data.aggregate import Count, Sum

    def dl_batch(batch: pa.Table) -> pa.Table:
        _tokens, dl = tokenize_column_flat(batch.column("text"))
        return pa.table({"dl": pa.array(dl[dl > 0], pa.int64())})

    ds = _documents(sf_dir).map_batches(dl_batch, batch_format="pyarrow")
    agg = ds.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl"))
    n = int(agg["n_docs"])
    avgdl = (int(agg["sum_dl"]) / n) if n else 0.0
    return pa.table(
        {"n_docs": pa.array([n], pa.int64()),
         "avgdl": pa.array([round(avgdl, 6)], pa.float64())}
    )


BM25_QUERY_TERMS = ("merge", "window")  # 2 terms: float sum is order-independent


def _docs_as_transcripts(sf_dir: str, parity: int | None = None):
    """Adapt `documents` to the transcripts shape as a STREAMING Dataset
    stage (no driver materialization — the round-1 adapter read the whole
    table onto the driver, a corpus-sized driver copy at 100x).

    conv_id zero-padded (vectorized utf8_lpad) so lexicographic conv order
    == numeric doc order, keeping the (score DESC, doc_id ASC) tie-break
    aligned with the SQL oracle's ORDER BY score DESC, doc_id.
    ``parity``: keep only even (0) / odd (1) doc ids — the disjoint split
    used by the segmented variant.
    """

    def fmt(batch: pa.Table) -> pa.Table:
        if parity is not None:
            mask = pc.equal(
                pc.bit_wise_and(batch.column("doc_id"), pa.scalar(1, pa.int64())),
                pa.scalar(parity, pa.int64()),
            )
            batch = batch.filter(mask)
        n = batch.num_rows
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                "role": pa.array(["user"] * n),
                "text": batch.column("text"),
                "tool": pa.array([""] * n),
                "ts": pa.array(np.zeros(n, dtype=np.int64), pa.timestamp("us")),
            }
        )

    return _documents(sf_dir).map_batches(fmt, batch_format="pyarrow")


def _index_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/cas_ray_index/documents_{tag}"


def bm25_topk(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """BM25 top-k over `documents` THROUGH the real engine: build (cached,
    resumable) inverted index -> QueryScorer search -> map conv_id back to
    doc_id. The driver's DuckDB oracle recomputes BM25 in SQL."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def ltr_feature_log(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 20):
    """Learning-to-rank feature logging (the ES LTR plugin's
    feature-extraction contract): for the query's top-``limit`` candidates
    (ranked by the REAL engine), emit the per-document feature vector a
    ranker trains on — bm25 score, matched-term count, doc length, total
    query-term tf, and the idf mass of the matched terms. Candidate
    selection goes through the engine (same index artifact as bm25_topk);
    the tf/dl features come from ONE vectorized corpus pass filtered to
    the broadcast candidate set; idf needs only the term df aggregate.
    The SQL twin recomputes every feature from the same BM25 chain."""
    from ray.data.aggregate import Sum

    hits = bm25_topk(sf_dir, terms=terms, limit=limit)
    cand = hits.column("doc_id").to_numpy().astype(np.int64)
    cand_set = pa.array(np.sort(cand), pa.int64())
    score_of = dict(zip(cand.tolist(),
                        hits.column("score").to_numpy().tolist()))

    # global stats for idf: n_docs (with >= 1 token) and per-term df
    def stats_partial(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        n_docs = int((lens > 0).sum())
        # per-term distinct-doc counts via the Arrow equality kernel over
        # the flat stream — no object-array materialization (round-3
        # tokenizer convention)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        out_t, out_df = [], []
        for t in terms:
            m = pc.equal(tokens, t).to_numpy(zero_copy_only=False)
            out_t.append(t)
            out_df.append(int(len(np.unique(doc_of[m]))))
        return pa.table(
            {"term": pa.array(out_t + ["\x00n"], pa.string()),
             "n_part": pa.array(out_df + [n_docs], pa.int64())}
        )

    s_agg = (
        _documents(sf_dir)
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term", num_partitions=2)
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    n_docs = float(s_agg[s_agg.term == "\x00n"].n.iloc[0])
    df_of = dict(zip(s_agg.term, s_agg.n.astype(float)))

    def feats(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=cand_set)
        sub = batch.filter(mask)
        if sub.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dl": pa.array([], pa.int64()),
                 "sum_tf": pa.array([], pa.int64()),
                 "matched_terms": pa.array([], pa.int64()),
                 "sum_idf": pa.array([], pa.float64())}
            )
        tokens, lens = tokenize_column_flat(sub.column("text"))
        doc_of = np.repeat(np.arange(len(lens)), lens)
        sum_tf = np.zeros(len(lens), dtype=np.int64)
        matched = np.zeros(len(lens), dtype=np.int64)
        sum_idf = np.zeros(len(lens), dtype=np.float64)
        for t in sorted(terms):
            m = pc.equal(tokens, t).to_numpy(zero_copy_only=False)
            tf_t = np.bincount(doc_of[m], minlength=len(lens))
            sum_tf += tf_t
            has = tf_t > 0
            matched += has
            idf_t = np.log(1.0 + (n_docs - df_of[t] + 0.5) / (df_of[t] + 0.5))
            sum_idf += np.where(has, idf_t, 0.0)
        return pa.table(
            {"doc_id": sub.column("doc_id"),
             "dl": pa.array(lens.astype(np.int64), pa.int64()),
             "sum_tf": pa.array(sum_tf, pa.int64()),
             "matched_terms": pa.array(matched, pa.int64()),
             "sum_idf": pa.array(np.round(sum_idf, 6), pa.float64())}
        )

    ft = (
        _documents(sf_dir)
        .map_batches(feats, batch_format="pyarrow")
        .to_pandas()
    )
    ft = ft[ft.doc_id.isin(set(cand.tolist()))].sort_values("doc_id")
    return pa.table(
        {"doc_id": pa.array(ft.doc_id.to_numpy().astype(np.int64), pa.int64()),
         "bm25": pa.array(
             [score_of[int(d)] for d in ft.doc_id], pa.float64()
         ),
         "matched_terms": pa.array(
             ft.matched_terms.to_numpy().astype(np.int64), pa.int64()),
         "dl": pa.array(ft.dl.to_numpy().astype(np.int64), pa.int64()),
         "sum_tf": pa.array(ft.sum_tf.to_numpy().astype(np.int64), pa.int64()),
         "sum_idf": pa.array(ft.sum_idf.to_numpy(), pa.float64())}
    )


def similarity_topk(
    sf_dir: str, similarity: str, sim_param: float | None = None,
    terms=BM25_QUERY_TERMS, limit: int = 10,
):
    """Top-k over `documents` under an ALTERNATIVE similarity module (the
    Lucene/ES per-index ``similarity`` setting: lmdirichlet / lmjm / tfidf /
    boolean) — same cached index artifact as ``bm25_topk``, only the
    query-time kernel changes (``functions/bm25.py::alt_term_scores``).
    The SQL twin recomputes the exact kernel expression per posting."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg, similarity=similarity, sim_param=sim_param
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def lm_dirichlet_topk(sf_dir: str):
    return similarity_topk(sf_dir, "lmdirichlet")


def lm_jelinek_mercer_topk(sf_dir: str):
    return similarity_topk(sf_dir, "lmjm")


def tfidf_topk(sf_dir: str):
    return similarity_topk(sf_dir, "tfidf")


def boolean_topk(sf_dir: str):
    return similarity_topk(sf_dir, "boolean")


def bm25_topk_common_terms(
    sf_dir: str, terms=("dup", "merge"), cutoff: float = 0.1, limit: int = 10,
):
    """Lucene CommonTermsQuery through the engine: 'dup' (df/N = 0.05) is
    the candidate-selecting low-frequency group, 'merge' (df/N ~ 0.79) only
    contributes score to docs that already matched 'dup'. The SQL twin
    classifies terms by the identical df < cutoff*N predicate and restricts
    the scored set to low-term matches."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, common_terms=cutoff)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_filtered(
    sf_dir: str, terms=BM25_QUERY_TERMS, prefix: str = "doc-0000000000",
    limit: int = 10,
):
    """Metadata-FILTERED BM25 top-k (the reference retriever's AnnLite
    filter-column contract, retriever.md:164-165): the per-query
    ``conv_prefix`` restricts CANDIDATES to conversations whose id starts
    with the prefix while idf/avgdl stay global. With the zero-padded
    conv naming, prefix "doc-0000000000" == doc_id < 100 — the SQL twin
    filters the scored set the same way before top-k."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32()),
         "conv_prefix": pa.array([prefix], pa.string())}
    )
    hits = search_table(index_dir, queries, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_segmented(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """Same query as bm25_topk but through the INCREMENTAL-SEGMENT path:
    the documents table is split into two disjoint halves, each added as an
    independent segment (add_segment), and the query runs via
    SegmentedQueryService with union stats. The identical SQL oracle
    verifies that segmented search == one-shot index over the union —
    the reference's index-then-search-immediately contract
    (tests/test_search.py:34-44)."""
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
        segment_dirs,
    )

    cfg = EngineConfig(num_index_partitions=4)
    root = _index_dir_for(sf_dir) + "_segmented"
    if len(segment_dirs(root)) < 2:
        add_segment(root, _docs_as_transcripts(sf_dir, parity=0), cfg)
        add_segment(root, _docs_as_transcripts(sf_dir, parity=1), cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    svc = SegmentedQueryService(root, cfg)
    try:
        hits = svc.search(queries)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_federated(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """Same query as bm25_topk but through the CROSS-CLUSTER path: the
    documents table is split into two disjoint halves, each indexed as its
    OWN independent segment root ("cluster"), and the query fans out via
    FederatedQueryService with federation-wide union stats. The identical
    SQL oracle certifies federated search == one monolithic index over the
    union — the ES cross-cluster-search contract."""
    from clip_as_service_ray.pipelines.segments import (
        FederatedQueryService,
        add_segment,
        segment_dirs,
    )

    cfg = EngineConfig(num_index_partitions=4)
    roots = [
        _index_dir_for(sf_dir) + "_fedA",
        _index_dir_for(sf_dir) + "_fedB",
    ]
    for parity, root in enumerate(roots):
        if not segment_dirs(root):
            add_segment(root, _docs_as_transcripts(sf_dir, parity=parity), cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    svc = FederatedQueryService(roots, cfg, federation_dir="/tmp/cas_ray_fed")
    try:
        hits = svc.search(queries)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def exact_dedup(sf_dir: str):
    """Exact dedup: keep min doc_id per distinct text (§2.8, last-write-wins
    by id analog -> first-write-wins deterministic).

    The shuffle key is a 128-bit CONTENT HASH (two independent 64-bit
    vectorized hashes), not the text itself: only (h1, h2, doc_id) rows move
    through the groupby, so at 100 TB the exchange ships ~24 B/doc instead
    of re-shuffling the corpus. Collision probability over n docs is
    ~n^2/2^129 (≈1e-21 at 10^9 docs); the DuckDB oracle groups by the full
    text, so the driver check also verifies no collision occurred."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        # NOTE (24M rehearsal, round 5): a buffer-level vectorized hash
        # was 4.8x faster single-process but 3-4x SLOWER inside the Ray
        # pipeline on this box (temporary-matrix first-touch + per-length
        # block overhead at real batch shapes) — measured old 3.2-4.8 s vs
        # new 14.2-14.3 s for the full 24M hash stage, reversed-order
        # controlled. The object-array path stays; the dedup leg's cost
        # is the groupby exchange, not this map.
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        h1 = pd.util.hash_array(texts, hash_key="cas_ray_dedup_01")
        h2 = pd.util.hash_array(texts, hash_key="cas_ray_dedup_02")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
            }
        )

    agg = (
        _documents(sf_dir)
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby(["h1", "h2"], num_partitions=_nparts(sf_dir))
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count"))
    )
    return agg.select_columns(["doc_id", "dup_count"])


# ---------------------------------------------------------------------------
# text analysis over `documents`

STOPWORDS = ("the", "a", "of", "to", "and", "in")


def doc_string_stats(sf_dir: str):
    """ES ``string_stats`` aggregation (with show_distribution's entropy)
    over documents.text: count, min/max/avg character length, and the
    Shannon entropy (base 2) of the corpus character distribution.
    Distributed shape: each batch emits ONE partial row of (count,
    len_sum, len_min, len_max) plus a tiny per-codepoint count table
    (codepoints via a vectorized utf-32 reinterpretation — no Python char
    loop); integer partials merge exactly, so only the final avg division
    and the entropy sum are float (entropy terms are summed in codepoint
    order on the engine; the 6-dp round absorbs the SQL engine's
    association difference)."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        lens = pc.utf8_length(texts).to_numpy().astype(np.int64)
        joined = "".join(texts.to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        u, cnt = np.unique(cps, return_counts=True)
        k = len(u)
        return pa.table(
            {
                "cp": pa.array(
                    np.concatenate([u.astype(np.int64), [-1]]), pa.int64()
                ),
                "n": pa.array(
                    np.concatenate([cnt.astype(np.int64), [len(lens)]]),
                    pa.int64(),
                ),
                "len_sum": pa.array(
                    np.concatenate([np.zeros(k, np.int64), [lens.sum()]]),
                    pa.int64(),
                ),
                "len_min": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int64), [lens.min() if len(lens) else 0]]
                    ),
                    pa.int64(),
                ),
                "len_max": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int64), [lens.max() if len(lens) else 0]]
                    ),
                    pa.int64(),
                ),
            }
        )

    parts = (
        _documents(sf_dir)
        .map_batches(stats, batch_format="pyarrow")
        .to_pandas()
    )
    doc_rows = parts[parts["cp"] == -1]
    count = int(doc_rows["n"].sum())
    len_sum = int(doc_rows["len_sum"].sum())
    len_min = int(doc_rows["len_min"].min()) if count else 0
    len_max = int(doc_rows["len_max"].max()) if count else 0
    cp_rows = (
        parts[parts["cp"] >= 0].groupby("cp", as_index=False)["n"].sum()
    ).sort_values("cp")
    total = float(cp_rows["n"].sum())
    p = cp_rows["n"].to_numpy().astype(np.float64) / total
    entropy = float(np.sum(-(p * np.log2(p))))
    return pa.table(
        {
            "doc_count": pa.array([count], pa.int64()),
            "min_length": pa.array([len_min], pa.int64()),
            "max_length": pa.array([len_max], pa.int64()),
            "avg_length": pa.array(
                [round(float(len_sum) / count, 6)], pa.float64()
            ),
            "entropy": pa.array([round(entropy, 6)], pa.float64()),
        }
    )


def gopher_quality_filter(sf_dir: str):
    """Gopher/MassiveText-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1, adapted to this corpus' token stream), all
    expressed in EXACT integer arithmetic so engine and SQL agree on every
    boundary: keep a doc iff
      5 <= n_words <= 200              (alpha-token count)
      3 <= mean word length <= 10      (as 3*n_words <= sum_len <= 10*n_words)
      symbol ratio <= 0.2              (as 5*(n_tot - n_words) <= n_tot)
      >= 2 stopword occurrences        (STOPWORDS list)
    One vectorized pass: flat tokenize, regex alpha mask, per-row
    reductions via bincount over the row index — no Python row loop."""

    def rules(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        tokens, lens = tokenize_column_flat(batch.column("text"))
        n_rows = len(doc_ids)
        row_of = np.repeat(np.arange(n_rows), lens)
        alpha = pc.match_substring_regex(tokens, r"^[a-z]+$").to_numpy(
            zero_copy_only=False
        )
        tok_len = pc.utf8_length(tokens).to_numpy().astype(np.int64)
        stop = pc.is_in(tokens, value_set=pa.array(list(STOPWORDS))).to_numpy(
            zero_copy_only=False
        )
        n_tot = np.bincount(row_of, minlength=n_rows).astype(np.int64)
        n_words = np.bincount(
            row_of, weights=alpha.astype(np.float64), minlength=n_rows
        ).astype(np.int64)
        sum_len = np.bincount(
            row_of, weights=(tok_len * alpha), minlength=n_rows
        ).astype(np.int64)
        stop_cnt = np.bincount(
            row_of, weights=stop.astype(np.float64), minlength=n_rows
        ).astype(np.int64)
        kept = (
            (n_words >= 5)
            & (n_words <= 200)
            & (3 * n_words <= sum_len)
            & (sum_len <= 10 * n_words)
            & (5 * (n_tot - n_words) <= n_tot)
            & (stop_cnt >= 2)
        )
        m = n_tot > 0  # zero-token docs drop (match the SQL token stream)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[m], pa.int64()),
                "n_words": pa.array(n_words[m], pa.int64()),
                "stop_count": pa.array(stop_cnt[m], pa.int64()),
                "kept": pa.array(kept[m], pa.bool_()),
            }
        )

    out = _documents(sf_dir).map_batches(rules, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def doc_quality(sf_dir: str):
    """Per-doc quality features: token count, char count, stopword ratio —
    the quality-scoring stage of a training-data pipeline (vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens, n_stop = [], []
        stop = set(STOPWORDS)
        for t in texts:
            toks = (t or "").lower().split()
            n_tokens.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in stop))
        n_tokens = np.asarray(n_tokens, dtype=np.int64)
        n_stop = np.asarray(n_stop, dtype=np.float64)
        ratio = np.round(np.divide(n_stop, np.maximum(n_tokens, 1)), 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                "stop_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return _documents(sf_dir).map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped / windowed aggregates over `events` and `lineitem`


def events_type_agg(sf_dir: str):
    """Grouped aggregate with per-batch combiner (A-new pattern)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    agg = ds.groupby("event_type", num_partitions=_nparts(sf_dir)).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "event_type": tbl.column("event_type"),
            "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
            "sum_value": pa.array(
                np.round(tbl.column("sum_value").to_numpy(), 4), pa.float64()
            ),
        }
    )


def events_hourly_windows(sf_dir: str):
    """Tumbling 1h event-time windows per user (streaming-shaped workload on
    a batch engine: groupby(key, window) — ray_guide 'streaming-shaped')."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = batch.append_column("window_start", w)
        g = t.group_by(["user_id", "window_start"]).aggregate([("ts", "count")])
        return g.rename_columns(["user_id", "window_start", "n_part"])

    partials = ds.map_batches(add_window, batch_format="pyarrow")
    agg = partials.groupby(["user_id", "window_start"], num_partitions=_nparts(sf_dir)).aggregate(
        Sum("n_part", alias_name="n_events")
    )
    return agg


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """SESSION windows over events: gap-based sessionization per user
    (30-min inactivity gap) — the ordered streaming-window operator
    (tumbling windows are events_hourly_windows). One row per session."""
    import ray.data

    from clip_as_service_ray.stages.windows import sessionize

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    out = sessionize(ds, key="user_id", ts="ts", gap_s=gap_minutes * 60)
    return out


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped numeric aggregate over lineitem."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        return batch.append_column("revenue", rev)

    agg = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=_nparts(sf_dir))
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "l_linestatus": tbl.column("l_linestatus"),
            "sum_qty": pa.array(np.round(tbl.column("sum_qty").to_numpy(), 2), pa.float64()),
            "sum_revenue": pa.array(np.round(tbl.column("sum_revenue").to_numpy(), 2), pa.float64()),
            "n_rows": pc.cast(tbl.column("n_rows"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# joins (SURVEY §2.5 — beyond the reference's id-keyed gathers)


def customer_segment_revenue(sf_dir: str):
    """BROADCAST hash join exemplar: the customer dimension is ray.put once
    (sorted key + payload arrays) and the orders fact stream probes it with
    vectorized searchsorted — no shuffle. Grouped by market segment."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Count, Sum

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    joined = broadcast_hash_join(orders, cust, left_key="o_custkey", right_key="c_custkey")
    agg = joined.groupby("c_mktsegment", num_partitions=_nparts(sf_dir)).aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_total")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "c_mktsegment": tbl.column("c_mktsegment"),
            "n_orders": pc.cast(tbl.column("n_orders"), pa.int64()),
            "sum_total": pa.array(
                np.round(tbl.column("sum_total").to_numpy(), 2), pa.float64()
            ),
        }
    )


def order_priority_revenue(sf_dir: str):
    """SHUFFLE hash join exemplar with pre-aggregation: lineitem revenue is
    combined per order BEFORE the join (the combiner-before-wide-step rule),
    then big-big joined to orders on the order key (tagged union + one
    co-partitioning groupby), grouped by priority."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"o_orderkey": batch.column("l_orderkey"), "rev": rev})
        g = t.group_by("o_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "rev_part"])

    rev = (
        li.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("o_orderkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("rev_part", alias_name="rev"))
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    joined = shuffle_hash_join(orders, rev, on="o_orderkey")
    agg = joined.groupby("o_orderpriority", num_partitions=_nparts(sf_dir)).aggregate(
        Count(alias_name="n_orders"), Sum("rev", alias_name="sum_revenue")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "o_orderpriority": tbl.column("o_orderpriority"),
            "n_orders": pc.cast(tbl.column("n_orders"), pa.int64()),
            "sum_revenue": pa.array(
                np.round(tbl.column("sum_revenue").to_numpy(), 2), pa.float64()
            ),
        }
    )


def purchase_click_asof(sf_dir: str):
    """AS-OF join: for each purchase event, the latest click by the same
    user at or before the purchase time (point-in-time join; salted-bucket
    shuffle, per-key vectorized searchsorted). DuckDB's native ASOF JOIN is
    the oracle."""
    import ray.data

    from clip_as_service_ray.stages.joins import asof_join_by_user

    def typed(event_type: str):
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )

        def f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column("event_type"), pa.scalar(event_type))
            return batch.filter(mask).drop_columns(["event_type"])

        return ds.map_batches(f, batch_format="pyarrow")

    out = asof_join_by_user(
        typed("purchase"), typed("click"),
        key="user_id", ts="ts", left_id="event_id", right_id="event_id",
    )
    # rename stays streaming — one row per matched purchase is corpus-sized
    return out.map_batches(
        lambda b: b.rename_columns(
            ["purchase_event_id", "click_event_id", "wait_s"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# embeddings: ANN + near-dup


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    # row-group predicate pushdown: only the matching row group leaves disk
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    return np.asarray(t.column("embedding").to_pylist()[0], dtype=np.float64)


def ann_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k against a broadcast query vector (the C6
    /search baseline: per-batch numpy matmul -> per-batch top-k -> tiny
    driver merge; no global sort)."""
    import ray

    q = _query_vector(sf_dir, 0)
    q_ref = ray.put(q / np.linalg.norm(q))

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1.0, norms)
            top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
            return pa.table(
                {"vec_id": pa.array(vec_ids[top], pa.int64()),
                 "sim": pa.array(sims[top], pa.float64())}
            )

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    sims = tbl.column("sim").to_numpy()
    vec_ids = tbl.column("vec_id").to_numpy()
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


def ann_matryoshka_topk(
    sf_dir: str, k: int = 10, trunc_dims: int = 16, n_candidates: int = 50,
):
    """Matryoshka two-stage retrieval (Kusupati et al. 2022, MRL — the
    truncate-then-rerank pattern of adaptive-dimension embeddings): stage 1
    scans with the FIRST ``trunc_dims`` components only (a 4x-cheaper
    matmul and, on disk, a 4x-smaller read) for ``n_candidates``; stage 2
    reranks just those candidates at full dimension. Per-batch partial
    top-n in both stages — no global sort; the candidate set broadcasts."""
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    qt = q[:trunc_dims]
    qt_ref = ray.put(qt / np.linalg.norm(qt))
    q_ref = ray.put(q / np.linalg.norm(q))

    class Stage1:
        def __init__(self):
            self.q = ray.get(qt_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb_col = batch.column("embedding").combine_chunks()
            flat = emb_col.flatten().to_numpy(zero_copy_only=False)
            emb = flat.reshape(batch.num_rows, -1)[:, :trunc_dims].astype(np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1.0, norms)
            top = np.lexsort((vec_ids, -sims))[: min(n_candidates, len(vec_ids))]
            return pa.table(
                {"vec_id": pa.array(vec_ids[top], pa.int64()),
                 "ts": pa.array(sims[top], pa.float64())}
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    p1 = pa.Table.from_pandas(
        ds.map_batches(Stage1, batch_format="pyarrow", batch_size=4096,
                       concurrency=2).to_pandas(),
        preserve_index=False,
    )
    ts_all = p1.column("ts").to_numpy()
    ids_all = p1.column("vec_id").to_numpy()
    keep = np.lexsort((ids_all, -ts_all))[: min(n_candidates, len(ids_all))]
    cand_ids = ids_all[keep]
    ts_of = dict(zip(cand_ids.tolist(), ts_all[keep].tolist()))
    cand_set = pa.array(np.sort(cand_ids), pa.int64())

    class Stage2:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sub = batch.filter(pc.is_in(batch.column("vec_id"), value_set=cand_set))
            if sub.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            vec_ids = sub.column("vec_id").to_numpy()
            emb = np.array(sub.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1.0, norms)
            return pa.table(
                {"vec_id": pa.array(vec_ids, pa.int64()),
                 "sim": pa.array(sims, pa.float64())}
            )

    p2 = pa.Table.from_pandas(
        ds.map_batches(Stage2, batch_format="pyarrow", batch_size=4096,
                       concurrency=2).to_pandas(),
        preserve_index=False,
    )
    sims = p2.column("sim").to_numpy()
    ids = p2.column("vec_id").to_numpy()
    top = np.lexsort((ids, -sims))[: min(k, len(ids))]
    return pa.table(
        {"vec_id": pa.array(ids[top], pa.int64()),
         "trunc_sim": pa.array(
             np.round([ts_of[int(i)] for i in ids[top]], 6), pa.float64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


def cosine_dup_pairs(sf_dir: str, max_id: int = 1000, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs among vec_id < max_id: block-matmul
    per batch against the broadcast candidate matrix."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    mask = t.column("vec_id").to_numpy() < max_id
    sub = t.filter(pa.array(mask))
    ids = sub.column("vec_id").to_numpy().astype(np.int64)
    m = np.array(sub.column("embedding").to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, m))

    class Pairs:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids = batch.column("vec_id").to_numpy().astype(np.int64)
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = emb @ self.m.T
            rows, cols_ = np.nonzero((sims >= threshold) & (b_ids[:, None] < self.ids[None, :]))
            return pa.table(
                {
                    "vec_a": pa.array(b_ids[rows], pa.int64()),
                    "vec_b": pa.array(self.ids[cols_], pa.int64()),
                    "sim": pa.array(np.round(sims[rows, cols_], 6), pa.float64()),
                }
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).filter(expr=f"vec_id < {max_id}")
    out = ds.map_batches(Pairs, batch_format="pyarrow", batch_size=2048, concurrency=2)
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:  # keep a stable schema even when empty
        return pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    return tbl.select(["vec_a", "vec_b", "sim"])


def cosine_lsh_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs over the WHOLE embeddings table via
    random-hyperplane LSH + pair-keyed exact verify — the scale path of
    cosine_dup_pairs (no broadcast candidate matrix, no max_id bound). The
    SQL oracle computes exact all-pairs cosine; equality certifies LSH
    recall = 1.0 on this corpus at this threshold."""
    import ray.data

    from clip_as_service_ray.stages.ann import cosine_lsh_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return cosine_lsh_pairs(ds, threshold=threshold)


# ---------------------------------------------------------------------------
# dedup suite + text analysis (rows-only unless noted)


def minhash_dup_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs over documents (rows-only: LSH is not
    SQL-expressible; exactness is pinned by tests/test_dedup.py)."""
    from clip_as_service_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_documents(sf_dir), threshold=0.8)


def simhash_dup_pairs(sf_dir: str):
    """SimHash near-dup pairs over documents (rows-only)."""
    from clip_as_service_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_documents(sf_dir), max_hamming=3)


def jaccard_dup_pairs(sf_dir: str):
    """Exact word-set Jaccard pairs among doc_id < 150 (SQL-checkable)."""
    from clip_as_service_ray.stages.dedup import word_jaccard_pairs

    return word_jaccard_pairs(_documents(sf_dir), max_id=150, threshold=0.75)


def langid_distribution(sf_dir: str):
    """Predicted-language distribution over documents via the stopword-hit
    heuristic (rows-only; heuristic pinned by tests/test_textstats.py)."""
    from ray.data.aggregate import Sum

    from clip_as_service_ray.functions.textstats import detect_language

    def fn(batch: pa.Table) -> pa.Table:
        langs = [
            detect_language((t or "").lower().split())
            for t in batch.column("text").to_pylist()
        ]
        u, c = np.unique(np.asarray(langs, dtype=object), return_counts=True)
        return pa.table({"pred_lang": pa.array(u, pa.string()),
                         "n_part": pa.array(c.astype(np.int64), pa.int64())})

    ds = _documents(sf_dir).map_batches(fn, batch_format="pyarrow")
    return ds.groupby("pred_lang", num_partitions=_nparts(sf_dir)).aggregate(Sum("n_part", alias_name="n_docs"))


def doc_fingerprints(sf_dir: str):
    """Order-sensitive rolling-hash fingerprint per document (rows-only;
    determinism pinned by tests). Returns fingerprint as decimal string to
    stay uint64-safe across pandas conversions."""
    from clip_as_service_ray.functions.minhash import hash_terms
    from clip_as_service_ray.functions.textstats import fingerprint

    def fn(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        if len(tokens):
            denc = tokens.dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            uniq_h = hash_terms(np.asarray(denc.dictionary.to_pylist(), dtype=object))
            tok_h = uniq_h[codes]  # hash once per DISTINCT token, gather
        fps = []
        p = 0
        for n in lens:
            q = p + int(n)
            fps.append(str(int(fingerprint(tok_h[p:q]))) if n else "0")
            p = q
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.string())})

    return _documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def ann_ivf_topk(sf_dir: str, k: int = 10, n_centroids: int = 16):
    """IVF ANN through the cell-PARTITIONED on-disk index: train on a
    first-row-group sample, build (cached) the cell=K/ parquet layout, probe
    by reading only the probed cell directories. nprobe == n_centroids here
    (full probe => exact), so the same SQL oracle as ann_topk verifies the
    whole IVF train/assign/build/probe path; partial-probe recall and
    probe-cost scaling are pinned by tests/test_ann.py."""
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.stages.ann import ivf_build, ivf_search, train_centroids

    path = os.path.join(sf_dir, "embeddings.parquet")
    pf = pq.ParquetFile(path)
    first = next(pf.iter_batches(batch_size=256, columns=["embedding"]))
    sample = np.array(first.column("embedding").to_pylist(), dtype=np.float64)
    cents = train_centroids(sample, n_centroids)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = f"/tmp/cas_ray_ann/ivf_{tag}_c{n_centroids}"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ivf_build(ds, cents, index_dir)
    q = _query_vector(sf_dir, 0)
    out = ivf_search(index_dir, q, k=k, nprobe=n_centroids)
    return pa.table(
        {
            "vec_id": out.column("vec_id"),
            "sim": pa.array(np.round(out.column("sim").to_numpy(), 6), pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# token counting / distinct counts / per-group top-k / percentiles (round 2+)

# RE2 form of the reference tokenizer pattern (simple_tokenizer.py:89-92),
# applied to lower(text) on both the Arrow and DuckDB sides so IGNORECASE
# is unnecessary (RE2 on both sides => identical alternation semantics).
TOKEN_PATTERN_RE2 = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)


def token_counts(sf_dir: str):
    """Per-document token counting: whitespace tokens + the reference's
    BPE-ish regex tokens + char length. Fully vectorized Arrow kernels
    (pc.count_substring_regex / utf8_length run RE2 over the whole column
    buffer) — zero Python per row, so this is the 100-TB-safe form."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ws_tokens": pc.cast(
                    pc.count_substring_regex(text, r"\S+"), pa.int64()
                ),
                "bpe_tokens": pc.cast(
                    pc.count_substring_regex(lower, TOKEN_PATTERN_RE2), pa.int64()
                ),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def distinct_users_daily(sf_dir: str):
    """COUNT(DISTINCT user_id) per day, distributed: per-batch combiner
    collapses to unique (day, user) pairs first, the pair groupby is the
    one necessary distinct-shuffle, and the final per-day rollup is tiny.
    The raw event payload never moves — only (day, user_id, n_part) rows."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "user_id": batch.column("user_id")})
        g = t.group_by(["day", "user_id"]).aggregate([("user_id", "count")])
        return g.rename_columns(["day", "user_id", "n_part"])

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    per_pair = pairs.groupby(["day", "user_id"], num_partitions=_nparts(sf_dir)).aggregate(
        Sum("n_part", alias_name="n_ev")
    )
    agg = per_pair.groupby("day", num_partitions=_nparts(sf_dir)).aggregate(
        Count(alias_name="n_users"), Sum("n_ev", alias_name="n_events")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "day": tbl.column("day"),
            "n_users": pc.cast(tbl.column("n_users"), pa.int64()),
            "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
        }
    )


def _topk_per_type(batch: pa.Table, k: int, with_rank: bool) -> pa.Table:
    """Vectorized top-k rows per event_type within one table: lexsort by
    (type ASC, value DESC, event_id ASC), keep the first k of each run."""
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    val = batch.column("value").to_numpy()
    eid = batch.column("event_id").to_numpy()
    order = np.lexsort((eid, -val, et))
    et_s, val_s, eid_s = et[order], val[order], eid[order]
    _, starts = np.unique(et_s, return_index=True)
    starts = np.sort(starts)
    run_len = np.diff(np.append(starts, len(et_s)))
    rank = np.arange(len(et_s), dtype=np.int64) - np.repeat(starts, run_len)
    keep = rank < k
    cols = {
        "event_type": pa.array(et_s[keep], pa.string()),
        "event_id": pa.array(eid_s[keep], pa.int64()),
        "value": pa.array(val_s[keep], pa.float64()),
    }
    if with_rank:
        cols["rank"] = pa.array(rank[keep] + 1, pa.int64())
    return pa.table(cols)


def top_events_per_type(sf_dir: str, k: int = 5):
    """Top-k rows per group (row_number() window analog): per-batch combiner
    keeps at most k rows per type (bounded output regardless of input
    size), then a small groupby finalizes — no global sort, no full
    shuffle of the events table. Tie-break (value DESC, event_id ASC)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    partials = ds.map_batches(
        lambda b: _topk_per_type(b, k, with_rank=False), batch_format="pyarrow"
    )

    def final(group: pa.Table) -> pa.Table:
        out = _topk_per_type(group, k, with_rank=True)
        return out.set_column(
            out.schema.get_field_index("value"),
            "value",
            pa.array(np.round(out.column("value").to_numpy(), 6), pa.float64()),
        )

    return partials.groupby("event_type", num_partitions=_nparts(sf_dir)).map_groups(
        final, batch_format="pyarrow"
    )


def event_value_percentiles(sf_dir: str):
    """Exact per-group percentiles (p50/p90/p99, linear interpolation —
    numpy's and DuckDB quantile_cont's shared definition). map_groups holds
    one group per task; the documented scale path for groups that exceed a
    worker is a t-digest/KLL sketch partial (the HLL entry below shows the
    sketch-partial pattern on this engine)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def final(group: pa.Table) -> pa.Table:
        vals = group.column("value").to_numpy()
        qs = np.quantile(vals, [0.5, 0.9, 0.99], method="linear")
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "p50": pa.array([round(float(qs[0]), 6)], pa.float64()),
                "p90": pa.array([round(float(qs[1]), 6)], pa.float64()),
                "p99": pa.array([round(float(qs[2]), 6)], pa.float64()),
            }
        )

    return ds.groupby("event_type", num_partitions=_nparts(sf_dir)).map_groups(
        final, batch_format="pyarrow"
    )


def approx_distinct_users(sf_dir: str, p: int = 14):
    """Approximate COUNT(DISTINCT user_id) via HyperLogLog sketch partials
    (functions/sketches.py): each batch folds into a 2^p-byte register row,
    the driver max-merges the tiny partials (one 16 KiB row per block —
    independent of cardinality). Rows-only by nature (approximate); the
    error bound vs the exact count is pinned by tests/test_textstats.py."""
    import ray.data

    from clip_as_service_ray.functions.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch.column("user_id").to_numpy(), p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = hll_merge([np.frombuffer(r["regs"], dtype=np.uint8) for r in rows])
    return pa.table(
        {"n_users_approx": pa.array([int(round(hll_estimate(merged)))], pa.int64())}
    )


def purchase_click_counts(sf_dir: str, window_minutes: int = 5):
    """Distributed RANGE JOIN: for each purchase, the number of clicks by
    the same user within the following 5 minutes (window-aligned time-bucket
    partitioning, replication factor 2 on the right side only —
    stages/joins.range_join_count). Both sides are predicate-pushed at the
    read (pyarrow dataset filter), so only purchase/click rows leave
    storage."""
    import ray.data

    from clip_as_service_ray.stages.joins import range_join_count

    path = os.path.join(sf_dir, "events.parquet")
    cols = ["event_id", "user_id", "ts"]
    left = ray.data.read_parquet(
        path, columns=cols, filter=pc.field("event_type") == "purchase"
    )
    right = ray.data.read_parquet(
        path, columns=cols, filter=pc.field("event_type") == "click"
    )
    out = range_join_count(
        left,
        right,
        key="user_id",
        ts="ts",
        left_id="event_id",
        window_s=window_minutes * 60.0,
    )
    # rename stays streaming — one row per purchase is still corpus-sized
    # at scale, so never funnel it through the driver
    return out.map_batches(
        lambda b: b.rename_columns(["event_id", "n_clicks"]),
        batch_format="pyarrow",
    )


def revenue_filter_q6(sf_dir: str):
    """TPC-H Q6 analog: highly-selective filter + global sum. The filter is
    pushed INTO the parquet read (columns= + pyarrow dataset filter =>
    row-group pruning / late materialization), the sum is a per-batch
    partial folded by a tiny driver-side add — the whole table never
    reaches workers' heaps, let alone the driver."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(np.datetime64("1996-01-01", "us")))
            & (pc.field("l_shipdate") < pa.scalar(np.datetime64("1997-01-01", "us")))
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24.0)
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = np.dot(
            batch.column("l_extendedprice").to_numpy(),
            batch.column("l_discount").to_numpy(),
        )
        return pa.table(
            {
                "rev": pa.array([float(rev)], pa.float64()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "revenue": pa.array(
                [round(float(sum(r["rev"] for r in rows)), 2)], pa.float64()
            ),
            "n_rows": pa.array([int(sum(r["n"] for r in rows))], pa.int64()),
        }
    )


def shipping_priority_q3(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1997-01-01", k: int = 10
):
    """TPC-H Q3 analog — a 3-table join pipeline composing BOTH join shapes
    by side size: customer (filtered dimension, ~0.1% of lineitem bytes) is
    a broadcast semi-join probe into orders; orders⋈lineitem is the big-big
    shuffle_hash_join; lineitem is pre-aggregated per order INSIDE
    map_batches before the shuffle (combiner), so only (okey, rev_part)
    rows move. Final top-k = bounded per-batch partials + driver merge of
    <= k rows per block (no global sort)."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import (
        broadcast_hash_join,
        shuffle_hash_join,
    )

    cut = pa.scalar(np.datetime64(cutoff, "us"))
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"],
        filters=[("c_mktsegment", "==", segment)],
    ).rename_columns(["o_custkey"])

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cut,
    )
    orders_sel = broadcast_hash_join(
        orders, cust, left_key="o_custkey", right_key="o_custkey"
    ).map_batches(
        lambda b: pa.table(
            {"okey": b.column("o_orderkey"), "o_orderdate": b.column("o_orderdate")}
        ),
        batch_format="pyarrow",
    )

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > cut,
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        t = pa.table(
            {"okey": batch.column("l_orderkey"), "rev_part": pa.array(rev, pa.float64())}
        )
        g = t.group_by("okey").aggregate([("rev_part", "sum")])
        return g.rename_columns(["okey", "rev_part"])

    joined = shuffle_hash_join(
        line.map_batches(rev_partial, batch_format="pyarrow"), orders_sel, on="okey"
    )
    agg = joined.groupby(["okey", "o_orderdate"], num_partitions=_nparts(sf_dir)).aggregate(
        Sum("rev_part", alias_name="rev")
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy()
        okey = batch.column("okey").to_numpy()
        order = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(np.sort(order), pa.int64())).select(
            ["okey", "o_orderdate", "rev"]
        )

    parts = agg.map_batches(topk_partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "revenue": pa.array([], pa.float64())}
        )
    okey = np.array([r["okey"] for r in parts], dtype=np.int64)
    od = np.array([r["o_orderdate"] for r in parts])
    rev = np.array([r["rev"] for r in parts], dtype=np.float64)
    top = np.lexsort((okey, -rev))[:k]  # full-precision sort; round only below
    return pa.table(
        {
            "l_orderkey": pa.array(okey[top], pa.int64()),
            "o_orderdate": pa.array(od[top]).cast(pa.timestamp("us")),
            "revenue": pa.array(np.round(rev[top], 2), pa.float64()),
        }
    )


def label_centroid_dims(sf_dir: str, dims: int = 4):
    """Per-label embedding centroid (mean pooling over a list<float> column
    — the class-prototype op of a training pipeline), first ``dims``
    components. Fully vectorized: the list column flattens zero-copy to one
    float32 buffer, per-batch per-label sums ride a tiny groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        emb_col = batch.column("embedding").combine_chunks()
        flat = emb_col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(batch.num_rows, -1)[:, :dims].astype(np.float64)
        labels = batch.column("label").to_numpy()
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), dims), dtype=np.float64)
        np.add.at(sums, inv, mat)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        cols = {"label": pa.array(u.astype(np.int32), pa.int32()),
                "n_part": pa.array(n, pa.int64())}
        for d in range(dims):
            cols[f"s{d}"] = pa.array(sums[:, d], pa.float64())
        return pa.table(cols)

    aggs = [Sum("n_part", alias_name="n")] + [
        Sum(f"s{d}", alias_name=f"ss{d}") for d in range(dims)
    ]
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "label", num_partitions=_nparts(sf_dir)
    ).aggregate(*aggs)
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    n = tbl.column("n").to_numpy().astype(np.float64)
    cols = {"label": pc.cast(tbl.column("label"), pa.int32()),
            "n_vecs": pc.cast(tbl.column("n"), pa.int64())}
    for d in range(dims):
        cols[f"d{d}"] = pa.array(
            np.round(tbl.column(f"ss{d}").to_numpy() / n, 6), pa.float64()
        )
    return pa.table(cols)


def semdedup_keep(sf_dir: str, threshold: float = 0.42):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding space,
    then drop within-cluster semantic near-duplicates, keeping the lowest
    vec_id of each duplicate pair. Deterministic cluster model so the SQL
    twin can replicate it: per-label mean centroids (rounded to 6 — both
    engines see identical prototypes), each vector assigned to its
    max-cosine centroid (rounded sims; ties -> lowest label). The
    in-cluster dedup is a vectorized gram matrix inside
    ``groupby(cluster).map_groups`` — the SemDeDup partitioning assumption
    (one cluster fits a worker; k scales with the corpus so n/k stays
    bounded). Only (cluster, vec_id, embedding) rows shuffle; centroids are
    a k x d broadcast."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"],
    )

    def cent_partial(batch: pa.Table) -> pa.Table:
        emb_col = batch.column("embedding").combine_chunks()
        flat = emb_col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(batch.num_rows, -1).astype(np.float64)
        labels = batch.column("label").to_numpy()
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        cols = {"label": pa.array(u.astype(np.int32), pa.int32()),
                "n_part": pa.array(n, pa.int64())}
        for d in range(mat.shape[1]):
            cols[f"s{d}"] = pa.array(sums[:, d], pa.float64())
        return pa.table(cols)

    import pyarrow.parquet as pq

    # dims from ONE record batch, not a full-column read (the embedding
    # column at scale is the biggest thing in the table)
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dims = len(first.column("embedding")[0])
    aggs = [Sum("n_part", alias_name="n")] + [
        Sum(f"s{d}", alias_name=f"ss{d}") for d in range(dims)
    ]
    agg = (
        ds.map_batches(cent_partial, batch_format="pyarrow")
        .groupby("label", num_partitions=_nparts(sf_dir))
        .aggregate(*aggs)
        .to_pandas()
        .sort_values("label")
    )
    labels = agg["label"].to_numpy().astype(np.int32)
    n = agg["n"].to_numpy().astype(np.float64)
    cent = np.stack(
        [np.round(agg[f"ss{d}"].to_numpy() / n, 6) for d in range(dims)], axis=1
    )
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    ref = ray.put((labels, cent_n))

    class Assign:
        def __init__(self):
            self.labels, self.cent_n = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb_col = batch.column("embedding").combine_chunks()
            flat = emb_col.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(batch.num_rows, -1).astype(np.float64)
            mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = np.round(mat_n @ self.cent_n.T, 6)
            best = np.argmax(sims, axis=1)  # first max == lowest label
            return pa.table(
                {"cluster": pa.array(self.labels[best], pa.int32()),
                 "vec_id": batch.column("vec_id"),
                 "embedding": emb_col})

    def dedup_group(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        emb_col = g.column("embedding").combine_chunks()
        flat = emb_col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(g.num_rows, -1).astype(np.float64)[order]
        mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat_n @ mat_n.T
        over = sims >= threshold
        # dropped[j]: some i<j (in vec_id order) with sim >= threshold
        dropped = np.triu(over, k=1).any(axis=0)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(
                 np.repeat(g.column("cluster")[0].as_py(), len(ids)), pa.int32()
             ),
             "keep": pa.array(~dropped, pa.bool_())})

    return (
        ds.map_batches(Assign, batch_format="pyarrow", concurrency=2)
        .groupby("cluster", num_partitions=_nparts(sf_dir))
        .map_groups(dedup_group, batch_format="pyarrow")
    )


def parts_never_shipped_late(sf_dir: str, cutoff: str = "2000-06-01"):
    """ANTI join (NOT EXISTS): parts with no lineitem shipped on/after the
    cutoff. The right side is filtered AT THE READ (only late lineitems
    leave storage) and collapsed to unique keys per batch before the
    shuffle — stages/joins.shuffle_anti_join."""
    import ray.data

    from clip_as_service_ray.stages.joins import shuffle_anti_join

    cut = pa.scalar(np.datetime64(cutoff, "us"))
    parts = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    late = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey"],
        filter=pc.field("l_shipdate") >= cut,
    ).map_batches(
        lambda b: b.rename_columns(["p_partkey"]), batch_format="pyarrow"
    )
    out = shuffle_anti_join(parts, late, on="p_partkey").materialize()
    if out.count() == 0:
        # a legitimately-empty anti join (every part shipped late, e.g. tiny
        # scale factors) must still carry its schema: empty map_groups
        # partitions emit schema-less blocks and Dataset.to_pandas() would
        # return a zero-COLUMN frame, failing the driver's column check
        return pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "p_brand": pa.array([], pa.string()),
            }
        )
    return out


def sample_documents(sf_dir: str, mod: int = 97, keep: int = 10):
    """Deterministic hash sampling (the seeded-sampling operator O4 as a
    dataset op): keep rows where (doc_id * KNUTH) % mod < keep. Pure int64
    arithmetic so the DuckDB twin is the IDENTICAL expression — the sample
    is reproducible across engines, runs, and partitionings (the property
    that makes hash sampling the 100-TB choice over random_sample)."""
    KNUTH = 2654435761  # Knuth multiplicative hash constant (public)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep_mask = (ids * KNUTH) % mod < keep
        return batch.filter(pa.array(keep_mask))

    return _documents(sf_dir, columns=("doc_id", "source", "n_chars")).map_batches(
        fn, batch_format="pyarrow"
    )


def deterministic_shuffle(sf_dir: str, seed: int = 7):
    """Seeded global shuffle (the epoch-shuffle every training pipeline
    needs, reproducible across engines, runs, and partitionings): shuffle
    position = rank under the Knuth multiplicative hash of doc_id + seed —
    pure int64 arithmetic, so the SQL twin is the identical expression.
    Distributed shape: per-batch key compute, ONE distributed sort, then
    per-block positions from count-only block summaries (driver prefix-sums
    counts, never rows — the ccnet/rank machinery)."""
    import ray

    KNUTH = 2654435761
    MOD = np.int64(1) << 32

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        key = (ids * KNUTH + seed) % MOD
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "key": pa.array(key, pa.int64())}
        )

    refs = (
        _documents(sf_dir, columns=("doc_id",))
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["key", "doc_id"])
        .to_arrow_refs()
    )
    if not refs:
        return pa.table(
            {"pos": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "key": pa.array([], pa.int64())}
        )

    @ray.remote(num_cpus=0.25)
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote(num_cpus=0.25)
    def with_pos(t: pa.Table, offset: int) -> pa.Table:
        return pa.table(
            {"pos": pa.array(
                offset + np.arange(t.num_rows, dtype=np.int64), pa.int64()),
             "doc_id": t.column("doc_id"),
             "key": t.column("key")}
        )

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    return pa.concat_tables(ray.get([
        with_pos.remote(r, int(offsets[i])) for i, r in enumerate(refs)
    ]))


def event_value_percentiles_sketch(sf_dir: str, k_sketch: int = 256):
    """Per-group percentiles via the mergeable deterministic KLL-style
    sketch (functions/sketches.py): per-batch per-group sketch partials
    shuffle as (event_type, level, blob) rows — bounded bytes per group
    regardless of group size — and each group folds+queries its sketch in
    map_groups. Rows-only (approximate); accuracy vs the exact operator is
    pinned by tests/test_sketches.py."""
    import ray.data

    from clip_as_service_ray.functions.sketches import (
        quantile_sketch_from_rows,
        quantile_sketch_merge,
        quantile_sketch_partial,
        quantile_sketch_query,
        quantile_sketch_to_rows,
    )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy()
        types, levels, blobs = [], [], []
        for t in np.unique(et):
            sk = quantile_sketch_partial(val[et == t], k=k_sketch)
            for lvl, blob in quantile_sketch_to_rows(sk):
                types.append(t)
                levels.append(lvl)
                blobs.append(blob)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "level": pa.array(levels, pa.int32()),
                "blob": pa.array(blobs, pa.binary()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        rows = list(
            zip(group.column("level").to_pylist(), group.column("blob").to_pylist())
        )
        sk = quantile_sketch_merge([quantile_sketch_from_rows(rows)], k=k_sketch)
        qs = quantile_sketch_query(sk, [0.5, 0.9, 0.99])
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "p50": pa.array([round(float(qs[0]), 6)], pa.float64()),
                "p90": pa.array([round(float(qs[1]), 6)], pa.float64()),
                "p99": pa.array([round(float(qs[2]), 6)], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .map_groups(final, batch_format="pyarrow")
    )


def events_sliding_windows(sf_dir: str):
    """SLIDING (hopping) windows: events per 1h window hopping every 15min.
    Window replication is done vectorized per batch (each event emits its 4
    covering window starts via one tile+repeat), counts are pre-aggregated
    per batch (combiner), and only (window_start, n_part) rows shuffle.
    Completes the window family: tumbling (events_hourly_windows), session
    (user_sessions), sliding (here)."""
    import ray.data
    from ray.data.aggregate import Sum

    hop_us = 15 * 60 * 1_000_000
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        tb = (t // hop_us) * hop_us  # floor to the hop grid
        ws = np.repeat(tb, 4) - np.tile(
            np.arange(4, dtype=np.int64) * hop_us, len(tb)
        )
        u, c = np.unique(ws, return_counts=True)
        return pa.table(
            {
                "ws": pa.array(u, pa.int64()).cast(pa.timestamp("us")),
                "n_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "ws", num_partitions=_nparts(sf_dir)
    ).aggregate(Sum("n_part", alias_name="n"))
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {"ws": tbl.column("ws"), "n": pc.cast(tbl.column("n"), pa.int64())}
    )


def user_rolling_revenue(sf_dir: str, window_days: float = 1.0):
    """Trailing 1-day rolling sum of event value per user at every event —
    the RANGE-window aggregate (stages/windows.rolling_sum_by_key). The SQL
    twin is the textbook window function; the Ray form is a salted-bucket
    shuffle + cumsum/searchsorted per key segment."""
    import ray.data

    from clip_as_service_ray.stages.windows import rolling_sum_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = rolling_sum_by_key(
        ds,
        key="user_id",
        ts="ts",
        value="value",
        id_col="event_id",
        window_s=window_days * 86400.0,
    )

    def finish(b: pa.Table) -> pa.Table:
        # round distributed; output is per-event (corpus-sized at scale)
        return pa.table(
            {
                "event_id": b.column("_id"),
                "roll_sum": pa.array(
                    np.round(b.column("roll_sum").to_numpy(), 6), pa.float64()
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def order_price_percentile(sf_dir: str):
    """percent_rank() OVER (PARTITION BY priority ORDER BY totalprice) —
    the rank-window analog of the percentile family, on the DISTRIBUTED
    rank path (stages/rank.py): global sort + per-block boundary summaries
    + driver prefix scan over summaries only + per-block correction. No
    partition-key group is ever held whole in one worker, so a key owning
    billions of rows costs no more than its share of sorted blocks."""
    import ray.data

    from clip_as_service_ray.stages.rank import percent_rank_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    ranked = percent_rank_by_key(
        ds, key="o_orderpriority", value="o_totalprice", id_col="o_orderkey"
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "pr": pa.array(
                    np.round(batch.column("pr").to_numpy(), 6), pa.float64()
                ),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def training_data_pipeline(sf_dir: str, sample_mod: int = 97, sample_keep: int = 60):
    """End-to-end training-data curation over `documents` — the composite
    the other operators exist for, in one streaming lineage:

      read -> exact-dedup keep-first (128-bit content-hash groupby -> keeper
      ids; text ships ONCE, through the semi-join shuffle) -> quality filter
      (vectorized stopword/len bounds) -> language tag -> token counts ->
      deterministic hash sample -> partitioned parquet sink
      (pred_lang=*/ dirs — the resumable output layout).

    Returns a one-row summary (rows-only entry: the sink is the product;
    stage counts are pinned by tests/test_relational.py). The keeper-id set
    is materialize()d once — it is ids-only (~16 B/doc), so the reuse
    avoids re-running the hash aggregation for its count."""
    import ray.data
    from ray.data.aggregate import Min

    from clip_as_service_ray.functions.textstats import detect_language
    from clip_as_service_ray.stages.joins import shuffle_semi_join

    KNUTH = 2654435761
    path = os.path.join(sf_dir, "documents.parquet")
    docs = ray.data.read_parquet(path, columns=["doc_id", "text", "source"])

    def add_hash(batch: pa.Table) -> pa.Table:
        # object-array path kept deliberately — see exact_dedup's note
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        h1 = pd.util.hash_array(texts, hash_key="cas_ray_dedup_01")
        h2 = pd.util.hash_array(texts, hash_key="cas_ray_dedup_02")
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "h1": pa.array(h1.view(np.int64), pa.int64()),
             "h2": pa.array(h2.view(np.int64), pa.int64())}
        )

    keepers = (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby(["h1", "h2"], num_partitions=_nparts(sf_dir))
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
        .materialize()
    )
    n_unique = keepers.count()
    kept = shuffle_semi_join(docs, keepers, on="doc_id")

    def curate(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_tok = pc.count_substring_regex(text, r"\S+").to_numpy()
        n_chars = pc.utf8_length(text).to_numpy()
        # language-agnostic quality gate (length bounds + sane avg token
        # size); language-specific scoring happens downstream per shard
        avg_tok = n_chars / np.maximum(n_tok, 1)
        ok = (n_tok >= 3) & (avg_tok >= 2.0) & (avg_tok <= 40.0)
        sub = batch.filter(pa.array(ok))
        langs = [
            detect_language((t or "").lower().split())
            for t in sub.column("text").to_pylist()
        ]
        ids = sub.column("doc_id").to_numpy()
        sampled = (ids * KNUTH) % sample_mod < sample_keep
        sub = sub.filter(pa.array(sampled))
        keep_langs = [l for l, s in zip(langs, sampled) if s]
        low2 = pc.utf8_lower(sub.column("text"))
        return pa.table(
            {
                "doc_id": sub.column("doc_id"),
                "text": sub.column("text"),
                "source": sub.column("source"),
                "pred_lang": pa.array(keep_langs, pa.string()),
                "bpe_tokens": pc.cast(
                    pc.count_substring_regex(low2, TOKEN_PATTERN_RE2), pa.int64()
                ),
            }
        )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/cas_ray_pipeline/curated_{tag}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    curated = kept.map_batches(curate, batch_format="pyarrow")
    curated.write_parquet(out_dir, partition_cols=["pred_lang"])

    import pyarrow.dataset as pds

    written = pds.dataset(out_dir, format="parquet", partitioning="hive")
    n_written = written.count_rows()
    n_input = pq_metadata_rows(path)
    return pa.table(
        {
            "n_input": pa.array([n_input], pa.int64()),
            "n_unique": pa.array([n_unique], pa.int64()),
            "n_written": pa.array([n_written], pa.int64()),
            "n_lang_partitions": pa.array(
                [len([d for d in os.listdir(out_dir) if d.startswith("pred_lang=")])],
                pa.int64(),
            ),
        }
    )


def pq_metadata_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata — no data pages read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def kmeans_embeddings(sf_dir: str, k: int = 8, n_iters: int = 5):
    """Iterative-algorithm operator: distributed spherical k-means over the
    embeddings table (stages/ann.kmeans_fit — broadcast centroids, tiny
    mergeable partials, re-read per sweep). Rows-only: per-cluster sizes +
    final inertia; convergence (non-increasing inertia) and determinism are
    pinned by tests/test_ann.py."""
    import ray.data

    from clip_as_service_ray.stages.ann import kmeans_fit

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    _, counts, history = kmeans_fit(ds, k, n_iters=n_iters)
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int32), pa.int32()),
            "n_vecs": pa.array(counts, pa.int64()),
            "final_inertia": pa.array(
                np.full(k, round(history[-1], 6)), pa.float64()
            ),
        }
    )


def ann_topk_batch(sf_dir: str, n_queries: int = 8, k: int = 3):
    """BATCHED brute-force ANN: top-k per query for a query MATRIX — the
    serving shape (one D x Q matmul per batch amortizes the corpus scan
    over all queries, exactly why the reference batches /search requests).
    Per-batch per-query top-k partials -> tiny driver merge. The query
    matrix broadcasts once via ray.put."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    pf = pq.ParquetFile(path)
    first = next(pf.iter_batches(batch_size=4096, columns=["vec_id", "embedding"]))
    ids0 = first.column("vec_id").to_numpy()
    sel = np.nonzero(ids0 < n_queries)[0]
    qm = np.array(
        [first.column("embedding")[int(i)].as_py() for i in sel], dtype=np.float64
    )
    qids = ids0[sel]
    order = np.argsort(qids)
    qm, qids = qm[order], qids[order]
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = ray.put((qm, qids))

    class Score:
        def __init__(self):
            self.qm, self.qids = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb / np.where(norms == 0, 1.0, norms)[:, None]) @ self.qm.T
            out_q, out_v, out_s = [], [], []
            for c, qid in enumerate(self.qids):
                col = sims[:, c]
                top = np.lexsort((vec_ids, -col))[: min(k, len(vec_ids))]
                out_q.append(np.full(len(top), qid, dtype=np.int64))
                out_v.append(vec_ids[top])
                out_s.append(col[top])
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    qcol = tbl.column("qid").to_numpy()
    vcol = tbl.column("vec_id").to_numpy()
    scol = tbl.column("sim").to_numpy()
    out_q, out_v, out_s, out_r = [], [], [], []
    for qid in np.unique(qcol):
        m = qcol == qid
        top = np.lexsort((vcol[m], -scol[m]))[: min(k, int(m.sum()))]
        out_q.append(np.full(len(top), qid, dtype=np.int64))
        out_v.append(vcol[m][top])
        out_s.append(scol[m][top])
        out_r.append(np.arange(1, len(top) + 1, dtype=np.int64))
    return pa.table(
        {
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.round(np.concatenate(out_s), 6), pa.float64()),
            "rank": pa.array(np.concatenate(out_r), pa.int64()),
        }
    )


def approx_top_terms(sf_dir: str, k: int = 20, width: int = 16384, depth: int = 4):
    """Heavy hitters via count-min sketch + candidate ride-along (the third
    sketch family: HLL=distinct, KLL=quantiles, CMS=frequencies). Each
    batch emits one depth x width count matrix (mergeable by ADD) plus its
    local top candidates; the driver merges the fixed-size matrices and
    ranks the candidate union by sketch estimate. Rows-only (upper-bound
    estimates); agreement with the exact combiner path is pinned by
    tests/test_sketches.py."""
    import ray.data

    from clip_as_service_ray.functions.sketches import (
        cms_merge,
        cms_partial,
        cms_query,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        g = t.group_by("term").aggregate([("tf", "sum")])
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        tf = g.column("tf_sum").to_numpy()
        hashed = pd.util.hash_array(terms, hash_key="cas_ray_cms_0001")
        m = cms_partial(hashed, tf, width=width, depth=depth)
        top = np.argsort(-tf, kind="stable")[: 4 * k]
        return pa.table(
            {
                "kind": pa.array(["cms"] + ["cand"] * len(top), pa.string()),
                "blob": pa.array([m.tobytes()] + [b""] * len(top), pa.binary()),
                "term": pa.array(
                    np.concatenate([[""], terms[top]]), pa.string()
                ),
            }
        )

    rows = (
        _documents(sf_dir).map_batches(partial, batch_format="pyarrow").take_all()
    )
    mats = [
        np.frombuffer(r["blob"], np.int64).reshape(depth, width)
        for r in rows
        if r["kind"] == "cms"
    ]
    cands = sorted({r["term"] for r in rows if r["kind"] == "cand"})
    merged = cms_merge(mats)
    carr = np.asarray(cands, dtype=object)
    est = cms_query(merged, pd.util.hash_array(carr, hash_key="cas_ray_cms_0001"))
    top = np.lexsort((carr, -est))[:k]
    return pa.table(
        {
            "term": pa.array(carr[top], pa.string()),
            "est_tf": pa.array(est[top], pa.int64()),
        }
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_daily_pivot(sf_dir: str):
    """PIVOT (long -> wide reshaping): per-day event counts spread into one
    column per event type. Per-batch combiner counts (day, type) pairs,
    the tiny pair table shuffles, and the final per-day group emits the
    wide row — the classic pivot without ever materializing the long table
    twice. Unknown types would raise (schema is the contract)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "event_type": batch.column("event_type")})
        g = t.group_by(["day", "event_type"]).aggregate([("event_type", "count")])
        return g.rename_columns(["day", "event_type", "n_part"])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def widen(group: pa.Table) -> pa.Table:
        types = group.column("event_type").to_pylist()
        ns = group.column("n").to_numpy()
        unknown = set(types) - set(EVENT_TYPES)
        if unknown:
            raise ValueError(f"unexpected event types: {sorted(unknown)}")
        counts = {t: 0 for t in EVENT_TYPES}
        for t, n in zip(types, ns):
            counts[t] = int(n)
        cols = {"day": pa.array([group.column("day")[0].as_py()], pa.timestamp("us"))}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pa.array([counts[t]], pa.int64())
        return pa.table(cols)

    return pairs.groupby("day", num_partitions=_nparts(sf_dir)).map_groups(
        widen, batch_format="pyarrow"
    )


def events_daily_unpivot(sf_dir: str):
    """UNPIVOT (wide -> long): melt the pivoted per-day table back into
    (day, event_type, n) rows — the flat_map reshaping direction. Done with
    one vectorized repeat/tile per batch (no per-row Python); the oracle is
    the plain pair-groupby SQL, so the pivot∘unpivot round trip is
    value-checked end to end."""

    wide = events_daily_pivot(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        day = batch.column("day")
        days = pa.concat_arrays(
            [day.combine_chunks()] * len(EVENT_TYPES)
        ) if n else day.combine_chunks()
        types = np.repeat(np.asarray(EVENT_TYPES, dtype=object), n)
        counts = np.concatenate(
            [batch.column(f"n_{t}").to_numpy() for t in EVENT_TYPES]
        ) if n else np.array([], dtype=np.int64)
        out = pa.table(
            {
                "day": days,
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )
        return out.filter(pc.greater(out.column("n"), 0))

    return wide.map_batches(melt, batch_format="pyarrow")


def events_type_rollup(sf_dir: str):
    """ROLLUP (hierarchical aggregate): value sums at (event_type), plus
    the grand total as the 'ALL' sentinel row — GROUP BY ROLLUP re-expressed
    as combiner partials feeding BOTH granularities in one pass (the
    per-batch partial is shared; only (event_type, n, s) pair rows
    shuffle, and the grand total folds from the same tiny table)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"event_type": batch.column("event_type"),
                 "value": batch.column("value")}
            )
            .group_by("event_type")
            .aggregate([("value", "count"), ("value", "sum")])
        )
        return g.rename_columns(["event_type", "n_part", "s_part"])

    per_type = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"), Sum("s_part", alias_name="s"))
    )
    tbl = pa.Table.from_pandas(per_type.to_pandas(), preserve_index=False)
    types = tbl.column("event_type").to_pylist() + ["ALL"]
    ns = tbl.column("n").to_numpy()
    ss = tbl.column("s").to_numpy()
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(
                np.concatenate([ns, [ns.sum()]]).astype(np.int64), pa.int64()
            ),
            "sum_value": pa.array(
                np.round(np.concatenate([ss, [ss.sum()]]), 4), pa.float64()
            ),
        }
    )


def event_prop_stats(sf_dir: str):
    """Semi-structured extraction (the parser operator class): pull the
    numeric ``k`` out of the JSON ``props`` string with ONE vectorized RE2
    kernel (pc.extract_regex — no per-row json.loads), then a combiner
    aggregate per event type. Rows without the key drop out (null-safe),
    matching the SQL twin's json_extract + IS NOT NULL."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        t = t.filter(pc.is_valid(t.column("k")))
        g = t.group_by("event_type").aggregate([("k", "count"), ("k", "sum")])
        return g.rename_columns(["event_type", "n_part", "s_part"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"), Sum("s_part", alias_name="s"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    n = tbl.column("n").to_numpy().astype(np.float64)
    s = tbl.column("s").to_numpy().astype(np.float64)
    return pa.table(
        {
            "event_type": tbl.column("event_type"),
            "n_with_k": pc.cast(tbl.column("n"), pa.int64()),
            "avg_k": pa.array(np.round(s / n, 6), pa.float64()),
        }
    )


def stratified_sample_documents(sf_dir: str, mod: int = 97):
    """STRATIFIED deterministic sampling: per-stratum rates (40/97 for
    even-numbered sources, 10/97 for odd) on the same Knuth-hash predicate
    as sample_documents — rates differ per group, membership stays
    reproducible across engines/partitionings. All vectorized Arrow
    (utf8_slice + cast + int arithmetic)."""
    KNUTH = 2654435761

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src_num = pc.cast(
            pc.utf8_slice_codeunits(batch.column("source"), 3, 32), pa.int64()
        ).to_numpy()
        keep_rate = np.where(src_num % 2 == 0, 40, 10)
        keep = (ids * KNUTH) % mod < keep_rate
        return batch.filter(pa.array(keep))

    return _documents(sf_dir, columns=("doc_id", "source", "n_chars")).map_batches(
        fn, batch_format="pyarrow"
    )


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01", date_to: str = "1998-01-01"):
    """TPC-H Q5 analog — revenue per nation where the ordering customer and
    the supplying supplier share a nation inside one region. Six tables,
    ONE shuffle: region/nation/supplier/customer are dimension maps
    broadcast into the fact scans (at 100-TB proportions customer is the
    first map to outgrow a broadcast; the swap is a shuffle_hash_join on
    custkey, same downstream shape), lineitem pre-aggregates
    (okey, supp-nation) partials inside map_batches, and the only
    all-to-all is the orderkey-keyed shuffle_hash_join against the
    filtered orders. Output: (n_name, revenue) ordered by revenue DESC."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import (
        broadcast_hash_join,
        shuffle_hash_join,
    )

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), filters=[("r_name", "==", region)]
    )
    rk = set(reg.column("r_regionkey").to_pylist())
    nmask = pa.array([k in rk for k in nation.column("n_regionkey").to_pylist()])
    nat = nation.filter(nmask)
    nat_keys = set(nat.column("n_nationkey").to_pylist())
    name_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    supp = supp.filter(
        pc.is_in(supp.column("s_nationkey"), value_set=pa.array(sorted(nat_keys)))
    ).rename_columns(["l_suppkey", "s_nat"])

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(cust.column("c_nationkey"), value_set=pa.array(sorted(nat_keys)))
    ).rename_columns(["o_custkey", "c_nat"])

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )
    orders_sel = broadcast_hash_join(
        orders, cust, left_key="o_custkey", right_key="o_custkey"
    ).map_batches(
        lambda b: pa.table({"okey": b.column("o_orderkey"), "c_nat": b.column("c_nat")}),
        batch_format="pyarrow",
    )

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    line = broadcast_hash_join(line, supp, left_key="l_suppkey", right_key="l_suppkey")

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        t = pa.table(
            {
                "okey": batch.column("l_orderkey"),
                "s_nat": batch.column("s_nat"),
                "rev": pa.array(rev, pa.float64()),
            }
        )
        g = t.group_by(["okey", "s_nat"]).aggregate([("rev", "sum")])
        return g.rename_columns(["okey", "s_nat", "rev"])

    joined = shuffle_hash_join(
        line.map_batches(rev_partial, batch_format="pyarrow"), orders_sel, on="okey"
    )

    def same_nation_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("s_nat"), batch.column("c_nat"))
        sub = batch.filter(keep)
        g = (
            pa.table({"nat": sub.column("s_nat"), "rev": sub.column("rev")})
            .group_by("nat")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["nat", "rev"])

    agg = (
        joined.map_batches(same_nation_partial, batch_format="pyarrow")
        .groupby("nat", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    t = agg.to_pandas()  # <= one row per nation in the region
    t["n_name"] = [name_of[int(k)] for k in t["nat"]]
    t["revenue"] = np.round(t["revenue"].to_numpy(), 2)
    t = t.sort_values("revenue", ascending=False).reset_index(drop=True)
    return pa.table(
        {
            "n_name": pa.array(t["n_name"], pa.string()),
            "revenue": pa.array(t["revenue"], pa.float64()),
        }
    )


def large_order_customers(sf_dir: str, qty_threshold: float = 300.0, k: int = 20):
    """TPC-H Q18 analog — customers with orders whose total quantity
    exceeds a threshold. lineitem pre-aggregates sum(qty) per order inside
    map_batches (combiner), one small groupby finishes the per-order sums,
    the HAVING filter shrinks the result to a driver-safe set (threshold
    semantics guarantee it), and the survivors broadcast back into orders.
    Top-k by (o_totalprice DESC, o_orderkey ASC) via per-batch partial
    top-k + driver merge — no global sort."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderkey": batch.column("l_orderkey"),
                    "q": batch.column("l_quantity").cast(pa.float64()),
                }
            )
            .group_by("o_orderkey")
            .aggregate([("q", "sum")])
        )
        return g.rename_columns(["o_orderkey", "q"])

    sums = (
        line.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("o_orderkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("q", alias_name="sum_qty"))
    )
    big_df = sums.filter(
        expr=f"sum_qty > {qty_threshold}"
    ).to_pandas()  # HAVING keeps this driver-small by construction
    big = pa.Table.from_pandas(big_df, preserve_index=False)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    joined = broadcast_hash_join(
        orders, big, left_key="o_orderkey", right_key="o_orderkey"
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        order = np.lexsort((okey, -price))[:k]
        return batch.take(pa.array(np.sort(order), pa.int64()))

    df = joined.map_batches(topk_partial, batch_format="pyarrow").to_pandas().sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k)

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    cname = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist()))
    return pa.table(
        {
            "c_name": pa.array([cname[int(c)] for c in df["o_custkey"]], pa.string()),
            "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
            "o_totalprice": pa.array(
                np.round(df["o_totalprice"].to_numpy(), 2), pa.float64()
            ),
            "sum_qty": pa.array(df["sum_qty"].to_numpy(), pa.float64()),
        }
    )


def promo_revenue(sf_dir: str, date_from: str = "1996-01-01", date_to: str = "1997-01-01"):
    """TPC-H Q14 analog — promo part types' share of revenue in a shipdate
    window. part is a broadcast dimension map (p_partkey -> is-promo flag);
    the whole aggregate is two floats per batch folded by one tiny
    driver-side sum — no shuffle at all. Output: one row
    (promo_revenue_pct:float64)."""
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    dim = pa.table(
        {
            "l_partkey": part.column("p_partkey"),
            "is_promo": pc.equal(part.column("p_type"), pa.scalar("PROMO")),
        }
    )

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )
    joined = broadcast_hash_join(line, dim, left_key="l_partkey", right_key="l_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        promo = batch.column("is_promo").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_rev": pa.array([float(rev[promo].sum())], pa.float64()),
                "total_rev": pa.array([float(rev.sum())], pa.float64()),
            }
        )

    t = pa.concat_tables(
        ray.get(joined.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
    )
    promo_rev = float(np.sum(t.column("promo_rev").to_numpy()))
    total_rev = float(np.sum(t.column("total_rev").to_numpy()))
    pct = 100.0 * promo_rev / total_rev if total_rev else 0.0
    return pa.table({"promo_revenue_pct": pa.array([round(pct, 6)], pa.float64())})


def bpe_vocab_top_tokens(
    sf_dir: str, num_merges: int = 200, min_count: int = 2, k: int = 30
):
    """M5 closure — learn a BPE merge table FROM the documents corpus, then
    encode the corpus with it and report the top-k subword tokens.

    Ray-Data split (stages/bpe.py): the two corpus-sized passes (word
    count, token count) are combiner-map_batches + one small groupby each;
    the merge loop runs over the weighted distinct-word table
    (corpus-size-independent). Encoding is the reference's load-once +
    per-token-cache shape (simple_tokenizer.py:71-92) as an actor pool.
    Non-SQL-expressible (iterative subword learning) -> rows-only entry;
    pinned by tests/test_bpe.py against a pure-Python end-to-end twin.
    Output: (token:string, n:int64), (n DESC, token ASC), k rows."""
    from clip_as_service_ray.stages.bpe import (
        bpe_token_counts,
        train_bpe_from_dataset,
    )

    ds = _documents(sf_dir, columns=("text",))
    merges = train_bpe_from_dataset(
        ds, num_merges=num_merges, min_count=min_count
    )
    counts = bpe_token_counts(
        _documents(sf_dir, columns=("text",)), merges
    )
    df = counts.to_pandas().sort_values(
        ["n", "token"], ascending=[False, True]
    ).head(k)
    return pa.table(
        {
            "token": pa.array(df["token"].tolist(), pa.string()),
            "n": pa.array(df["n"].to_numpy(), pa.int64()),
        }
    )


def ann_ivfpq_topk(
    sf_dir: str, k: int = 10, n_centroids: int = 16, m: int = 8
):
    """IVF-PQ ANN (stages/pq.py): codes built cell-partitioned on top of the
    IVF index, per-query ADC lookup table, scan reads ONLY code files, then
    exact refine re-reads just the candidates' full vectors. Full probe +
    refine >= candidate count => exact, so the brute-force SQL oracle
    verifies the entire train/encode/ADC/refine path; compressed-scan
    recall and code-vs-vector bytes are pinned by tests/test_pq.py."""
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.stages.ann import ivf_build, train_centroids
    from clip_as_service_ray.stages.pq import ivfpq_build, ivfpq_search

    path = os.path.join(sf_dir, "embeddings.parquet")
    pf = pq.ParquetFile(path)
    first = next(pf.iter_batches(batch_size=256, columns=["embedding"]))
    sample = np.array(first.column("embedding").to_pylist(), dtype=np.float64)
    cents = train_centroids(sample, n_centroids)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_dir = f"/tmp/cas_ray_ann/ivfpq_{tag}_c{n_centroids}_m{m}"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ivf_build(ds, cents, index_dir)
    ivfpq_build(ds, index_dir, m=m)
    q = _query_vector(sf_dir, 0)
    n_rows = pf.metadata.num_rows
    out = ivfpq_search(index_dir, q, k=k, nprobe=n_centroids, refine=n_rows)
    return pa.table(
        {
            "vec_id": out.column("vec_id"),
            "sim": pa.array(np.round(out.column("sim").to_numpy(), 6), pa.float64()),
        }
    )


def returned_item_revenue(
    sf_dir: str, date_from: str = "1996-01-01", date_to: str = "1996-07-01",
    k: int = 20,
):
    """TPC-H Q10 analog — customers ranked by revenue lost to returns in a
    date window. lineitem (returnflag='R') pre-aggregates revenue per order
    inside map_batches; the only shuffle is the orderkey join against the
    date-filtered orders; the per-customer rollup is a small groupby whose
    result broadcasts against the customer+nation dims. Top-k by
    (revenue DESC, c_custkey ASC) via per-batch partials + driver merge."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == pa.scalar("R"),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        g = (
            pa.table({"okey": batch.column("l_orderkey"),
                      "rev": pa.array(rev, pa.float64())})
            .group_by("okey")
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["okey", "rev"])

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(
        lambda b: pa.table(
            {"okey": b.column("o_orderkey"), "o_custkey": b.column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    joined = shuffle_hash_join(
        line.map_batches(rev_partial, batch_format="pyarrow"), orders, on="okey"
    )
    per_cust = joined.groupby("o_custkey", num_partitions=_nparts(sf_dir)).aggregate(
        Sum("rev", alias_name="revenue")
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue").to_numpy()
        ck = batch.column("o_custkey").to_numpy()
        order = np.lexsort((ck, -rev))[:k]
        return batch.take(pa.array(np.sort(order), pa.int64()))

    df = (
        per_cust.map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(k)
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nname = dict(zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()))
    cinfo = {
        int(ck): (nm, nname[int(nk)])
        for ck, nm, nk in zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_name").to_pylist(),
            cust.column("c_nationkey").to_pylist(),
        )
    }
    names = [cinfo[int(c)] for c in df["o_custkey"]]
    return pa.table(
        {
            "c_custkey": pa.array(df["o_custkey"].to_numpy(), pa.int64()),
            "c_name": pa.array([n for n, _ in names], pa.string()),
            "n_name": pa.array([r for _, r in names], pa.string()),
            "revenue": pa.array(np.round(df["revenue"].to_numpy(), 2), pa.float64()),
        }
    )


def brand_quantity_revenue(sf_dir: str):
    """TPC-H Q19 analog — disjunctive part/lineitem predicates: revenue from
    (Brand#1, p_size<=10, qty 1..20) OR (Brand#2, p_size<=25, qty 10..35).
    part is a broadcast dim carrying (brand-class, size); the OR predicate
    evaluates vectorized per batch; the aggregate is one float per batch
    folded on the driver — no shuffle."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    dim = pa.table(
        {
            "l_partkey": part.column("p_partkey"),
            "p_brand": part.column("p_brand"),
            "p_size": part.column("p_size"),
        }
    )
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_hash_join(line, dim, left_key="l_partkey", right_key="l_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy()
        size = batch.column("p_size").to_numpy()
        b1 = pc.equal(batch.column("p_brand"), pa.scalar("Brand#1")).to_numpy(
            zero_copy_only=False
        )
        b2 = pc.equal(batch.column("p_brand"), pa.scalar("Brand#2")).to_numpy(
            zero_copy_only=False
        )
        keep = (b1 & (size <= 10) & (qty >= 1) & (qty <= 20)) | (
            b2 & (size <= 25) & (qty >= 10) & (qty <= 35)
        )
        rev = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        return pa.table(
            {
                "rev": pa.array([float(rev[keep].sum())], pa.float64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    t = pa.concat_tables(
        ray.get(joined.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
    )
    return pa.table(
        {
            "revenue": pa.array(
                [round(float(np.sum(t.column("rev").to_numpy())), 2)], pa.float64()
            ),
            "n_rows": pa.array([int(np.sum(t.column("n").to_numpy()))], pa.int64()),
        }
    )


def dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: MinHash+LSH candidate pairs (distributed,
    exact-Jaccard verified >= 0.8) collapsed into connected components, each
    doc labeled with its component's min doc_id (the canonical survivor).
    This is the dedup family's capstone: pairs alone under-deduplicate
    chains (a~b, b~c with a!~c must form ONE cluster).

    Components run alternating large-star/small-star (stages/components.py)
    — every shuffle is over the candidate-pair graph, never the corpus.
    Oracle twin: recursive-CTE transitive closure over the same exact
    Jaccard pair predicate (LSH recall 1.0 on this corpus is certified by
    the minhash_dup_pairs entry's equality)."""
    import ray.data

    from clip_as_service_ray.stages.components import connected_components
    from clip_as_service_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_documents(sf_dir), threshold=0.8)
    if pairs.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    edges = ray.data.from_arrow(
        pa.table({"src": pairs.column("doc_a"), "dst": pairs.column("doc_b")})
    )
    labels = connected_components(edges).to_pandas()
    labels = labels.sort_values("node").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(labels["node"].to_numpy(), pa.int64()),
            "cluster_id": pa.array(labels["component"].to_numpy(), pa.int64()),
        }
    )


# Scrub patterns (RE2-safe: identical semantics in pyarrow.compute and
# DuckDB regexp_replace, proven by test_clean_documents_matches_duckdb).
URL_RE2 = r"https?://\S+"
EMAIL_RE2 = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def clean_documents(sf_dir: str):
    """Text scrub for training-data prep: remove URLs and email addresses
    (PII/noise), collapse whitespace, trim. Entirely pyarrow.compute RE2
    kernels over the text column — no Python-level row loop; the reference's
    normalization analog is simple_tokenizer.py:58-67 (whitespace_clean).
    n_scrubbed counts pattern hits on the ORIGINAL text (both patterns)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        u = pc.replace_substring_regex(text, pattern=URL_RE2, replacement=" ")
        e = pc.replace_substring_regex(u, pattern=EMAIL_RE2, replacement=" ")
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(e, pattern=r"\s+", replacement=" ")
        )
        n = pc.add(
            pc.count_substring_regex(text, pattern=URL_RE2),
            pc.count_substring_regex(text, pattern=EMAIL_RE2),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": clean,
                "n_scrubbed": n.cast(pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def bigram_counts(sf_dir: str, k: int = 50):
    """Top-k BIGRAM counts over the corpus (language-model count table,
    the n=2 slice of the n-gram family; shingle machinery in
    functions/minhash.py covers n=3 hashes). Per-batch combiner: tokenize
    (reference regex, lowered), form adjacent pairs per doc with one numpy
    concat + offset slice, pre-count inside the batch, then a small
    groupby(sum) over the pre-aggregated (bigram, n) rows — the shuffle
    carries unique bigrams per batch, not one row per token position."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _left, grams, _nb = _flat_bigrams(batch.column("text"))
        if len(grams) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        vc = grams.value_counts()
        u = vc.field("values").to_numpy(zero_copy_only=False)
        c = vc.field("counts").to_numpy()
        o = np.argsort(u)  # np.unique parity: sorted keys
        u, c = u[o], c[o]
        return pa.table(
            {
                "bigram": pa.array(u, pa.string()),
                "n_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
    )
    df = agg.to_pandas().sort_values(["n", "bigram"], ascending=[False, True]).head(k)
    return pa.table(
        {
            "bigram": pa.array(df["bigram"].tolist(), pa.string()),
            "n": pa.array(df["n"].to_numpy(), pa.int64()),
        }
    )


def near_dedup_keep(sf_dir: str):
    """Apply near-dup clustering as a corpus FILTER: drop every document
    that belongs to a dup cluster but is not its canonical (min-id) member.
    The drop-set (non-canonical ids) is tiny relative to the corpus, so it
    broadcasts into a vectorized pc.is_in anti-filter over the streaming
    documents read — no shuffle of the corpus at all."""
    labels = dup_clusters(sf_dir)
    node = labels.column("doc_id").to_numpy(zero_copy_only=False)
    comp = labels.column("cluster_id").to_numpy(zero_copy_only=False)
    drop = pa.array(np.sort(node[node != comp]), pa.int64())

    def keep_fn(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("doc_id"), value_set=drop))
        kept = batch.filter(mask)
        return pa.table(
            {"doc_id": kept.column("doc_id"), "n_chars": kept.column("n_chars")}
        )

    return _documents(sf_dir, columns=["doc_id", "n_chars"]).map_batches(
        keep_fn, batch_format="pyarrow"
    )


def user_cumulative_value(sf_dir: str):
    """Running per-user total: SUM(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) — the cumulative-window analog of
    order_price_percentile, on the DISTRIBUTED sort + block-offset
    prefix-scan path (stages/rank.py cumsum_by_key: one range-shuffle sort,
    O(1)-size block summaries to the driver, per-block vectorized cumsum;
    row data never gathers). ORDER BY is unique per partition (event_id),
    so SQL RANGE and ROWS framings coincide."""
    import ray.data

    from clip_as_service_ray.stages.rank import cumsum_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    out = cumsum_by_key(
        ds,
        key="user_id",
        value="value",
        id_col="event_id",
        sort_cols=["user_id", "ts", "event_id"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "cum_value": pa.array(
                    np.round(batch.column("cum").to_numpy(), 6), pa.float64()
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def bm25_topk_deleted(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """Full delete lifecycle, ORACLE-CHECKED: build two segments over the
    documents corpus, tombstone every doc_id % 7 == 3 (delete_convs),
    PHYSICALLY purge them (compact_segments — postings-level rewrite, no
    re-tokenize), then search. BM25 stats (N, avgdl, df) must all reflect
    the surviving corpus, which is exactly what the SQL twin computes over
    ``documents WHERE doc_id % 7 != 3`` — so the hash check certifies the
    whole delete path end-to-end, not just query-time filtering."""
    import pyarrow.parquet as pq

    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
        compact_segments,
        delete_convs,
        load_tombstones,
        segment_dirs,
    )

    cfg = EngineConfig(num_index_partitions=4)
    root = _index_dir_for(sf_dir) + "_lifecycle"
    if len(segment_dirs(root)) < 2:
        add_segment(root, _docs_as_transcripts(sf_dir, parity=0), cfg)
        add_segment(root, _docs_as_transcripts(sf_dir, parity=1), cfg)
        ids = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).column("doc_id").to_numpy(zero_copy_only=False)
        dead = ids[ids % 7 == 3]
        delete_convs(root, [f"doc-{int(d):012d}" for d in dead])
        compact_segments(root, cfg)
    assert not load_tombstones(root), "compact must clear tombstones"

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    svc = SegmentedQueryService(root, cfg)
    try:
        hits = svc.search(queries)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def event_value_percentiles_distributed(sf_dir: str):
    """Same result as ``event_value_percentiles`` via the DISTRIBUTED exact
    path (stages/rank.quantiles_by_key): one global sort + per-block order
    statistics, so a partition key owning billions of rows never has to fit
    one worker — this closes the scale gap the map_groups form documents.
    Interpolation is quantile_cont / np.quantile(method="linear") on both
    engines."""
    import ray.data

    from clip_as_service_ray.stages.rank import quantiles_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    res = quantiles_by_key(
        ds, key="event_type", value="value", quantiles=[0.5, 0.9, 0.99]
    )
    keys = sorted(res)
    return pa.table(
        {
            "event_type": pa.array([str(k) for k in keys]),
            "p50": pa.array([round(float(res[k][0]), 6) for k in keys], pa.float64()),
            "p90": pa.array([round(float(res[k][1]), 6) for k in keys], pa.float64()),
            "p99": pa.array([round(float(res[k][2]), 6) for k in keys], pa.float64()),
        }
    )


def event_value_mad(sf_dir: str):
    """ES ``median_absolute_deviation`` aggregation, EXACT and distributed:
    per event_type, MAD = median(|value - median(value)|) via two passes of
    the distributed exact-quantile machinery (stages/rank.quantiles_by_key:
    global sort + per-block order statistics — no group ever materializes
    on one worker). The per-type medians from pass 1 are a tiny broadcast
    map; the deviation column is computed per batch in the scan of pass 2.
    Both engines interpolate quantile_cont-style, and |value - med| is the
    same two-operand float expression on both sides."""
    import ray.data

    from clip_as_service_ray.stages.rank import quantiles_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    med = quantiles_by_key(ds, key="event_type", value="value", quantiles=[0.5])
    med_map = {str(key): float(v[0]) for key, v in med.items()}
    type_arr = pa.array(sorted(med_map), pa.string())
    med_arr = np.array([med_map[t] for t in sorted(med_map)], np.float64)

    def dev(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(
            batch.column("event_type"), value_set=type_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("value").to_numpy().astype(np.float64)
        return pa.table(
            {"event_type": batch.column("event_type"),
             "dev": pa.array(np.abs(v - med_arr[codes]), pa.float64())}
        )

    ds2 = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    ).map_batches(dev, batch_format="pyarrow")
    mad = quantiles_by_key(ds2, key="event_type", value="dev", quantiles=[0.5])
    keys = sorted(med_map)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "med": pa.array(
                [round(med_map[key], 6) for key in keys], pa.float64()
            ),
            "mad": pa.array(
                [round(float(mad[key][0]), 6) for key in keys], pa.float64()
            ),
        }
    )


def user_interevent_gap(sf_dir: str):
    """Per-user inter-event time stats via the DISTRIBUTED lag(1) window
    (stages/rank.lag_by_key): gap = ts - lag(ts) OVER (PARTITION BY user_id
    ORDER BY ts, event_id). One global sort; the per-block carry is a single
    scalar, so a user's event history never has to fit one worker. Gaps are
    integer microseconds held in float64 (exact < 2^53), so the partial sums
    are order-independent and the avg is bit-stable."""
    import ray.data

    from clip_as_service_ray.stages.rank import lag_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "t": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    lagged = lag_by_key(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key="user_id", value="t", id_col="event_id",
        sort_cols=["user_id", "t", "event_id"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("lag")))
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                    "c": pa.array([], pa.int64()),
                    "m": pa.array([], pa.float64()),
                }
            )
        gap = pc.subtract(t.column("value"), t.column("lag"))
        g = (
            pa.table({"user_id": t.column("user_id"), "gap": gap})
            .group_by("user_id")
            .aggregate([("gap", "sum"), ("gap", "count"), ("gap", "max")])
        )
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "s": g.column("gap_sum"),
                "c": pc.cast(g.column("gap_count"), pa.int64()),
                "m": g.column("gap_max"),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        s = float(np.sum(group.column("s").to_numpy()))
        c = int(np.sum(group.column("c").to_numpy()))
        m = float(np.max(group.column("m").to_numpy()))
        return pa.table(
            {
                "user_id": pa.array([group.column("user_id")[0].as_py()], pa.int64()),
                "n_gaps": pa.array([c], pa.int64()),
                "avg_gap_s": pa.array([round(s / c / 1e6, 6)], pa.float64()),
                "max_gap_us": pa.array([int(m)], pa.int64()),
            }
        )

    return (
        lagged.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=_nparts(sf_dir))
        .map_groups(finalize, batch_format="pyarrow")
    )


def order_value_quartiles(sf_dir: str):
    """ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice,
    o_orderkey) via the DISTRIBUTED row_number/ntile window
    (stages/rank.ntile_by_key): per-key group sizes come from the forward +
    backward block-summary scan, so there is no per-key broadcast and no
    per-group materialization at any key cardinality. The order includes
    o_orderkey so both engines see a unique (deterministic) NTILE order."""
    import ray.data

    from clip_as_service_ray.stages.rank import ntile_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice", "o_orderkey"],
    )
    out = ntile_by_key(
        ds, key="o_custkey", value="o_totalprice", id_col="o_orderkey",
        n_tiles=4, sort_cols=["o_custkey", "o_totalprice", "o_orderkey"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "rn": batch.column("rn"),
                "quartile": batch.column("tile"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def order_priority_check_q4(
    sf_dir: str,
    date_from: str = "1996-07-01",
    date_to: str = "1996-10-01",
    ship_cut: str = "1996-08-01",
):
    """TPC-H Q4 analog (the driver's lineitem has no commit/receipt dates,
    so the EXISTS predicate is "some lineitem shipped on/after ship_cut"):
    one quarter of orders, kept only when a matching lineitem exists (semi
    join — the right side is filtered AT THE READ and collapsed to unique
    keys per batch before the shuffle), counted per o_orderpriority."""
    import ray.data
    from ray.data.aggregate import Count

    from clip_as_service_ray.stages.joins import shuffle_semi_join

    f = pa.scalar(np.datetime64(date_from, "us"))
    t = pa.scalar(np.datetime64(date_to, "us"))
    cut = pa.scalar(np.datetime64(ship_cut, "us"))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= f) & (pc.field("o_orderdate") < t),
    )
    shipped = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey"],
        filter=pc.field("l_shipdate") >= cut,
    ).map_batches(lambda b: b.rename_columns(["o_orderkey"]), batch_format="pyarrow")
    agg = (
        shuffle_semi_join(orders, shipped, on="o_orderkey")
        .groupby("o_orderpriority", num_partitions=_nparts(sf_dir))
        .aggregate(Count(alias_name="order_count"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "o_orderpriority": tbl.column("o_orderpriority"),
            "order_count": pc.cast(tbl.column("order_count"), pa.int64()),
        }
    )


def returnflag_priority_share_q12(sf_dir: str, date_from: str = "1997-01-01", date_to: str = "1998-01-01"):
    """TPC-H Q12 analog (no l_shipmode in the driver tables: group by
    l_returnflag instead): lineitem∞orders big-big shuffle join, then the
    Q12 conditional aggregation — per group, how many orders were
    high-priority (1-URGENT/2-HIGH) vs not. The join ships only the two key
    columns + priority; the CASE WHEN runs vectorized per batch."""
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    f = pa.scalar(np.datetime64(date_from, "us"))
    t = pa.scalar(np.datetime64(date_to, "us"))
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag"],
        filter=(pc.field("l_shipdate") >= f) & (pc.field("l_shipdate") < t),
    ).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_returnflag"]),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = shuffle_hash_join(li, orders, on="o_orderkey")

    def flags(batch: pa.Table) -> pa.Table:
        hi = pc.is_in(
            batch.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        ones = pc.cast(hi, pa.int64())
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "high_line_count": ones,
                "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), ones),
            }
        )

    agg = (
        joined.map_batches(flags, batch_format="pyarrow")
        .groupby("l_returnflag", num_partitions=_nparts(sf_dir))
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "high_line_count": pc.cast(tbl.column("high_line_count"), pa.int64()),
            "low_line_count": pc.cast(tbl.column("low_line_count"), pa.int64()),
        }
    )


def doc_repetition(sf_dir: str):
    """Per-document repetition / lexical-diversity signals (the Gopher-style
    quality gates a curation pipeline filters on): token count, distinct
    terms, max term frequency, top-term share and type-token ratio — ONE
    tokenize pass, aggregated per doc inside the batch UDF with reduceat
    over run boundaries (docs never span batches), so the stage is
    embarrassingly parallel: no shuffle at all."""

    def stats(batch: pa.Table) -> pa.Table:
        tf_rows = _tokens_flat(batch)
        n = tf_rows.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct_terms": pa.array([], pa.int64()),
                    "max_tf": pa.array([], pa.int64()),
                    "top_term_share": pa.array([], pa.float64()),
                    "ttr": pa.array([], pa.float64()),
                }
            )
        doc = tf_rows.column("doc_id").to_numpy()
        tf = tf_rows.column("tf").to_numpy()
        starts = np.concatenate([[0], np.nonzero(np.diff(doc))[0] + 1])
        n_tokens = np.add.reduceat(tf, starts)
        max_tf = np.maximum.reduceat(tf, starts)
        n_distinct = np.diff(np.append(starts, n))
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_distinct_terms": pa.array(n_distinct, pa.int64()),
                "max_tf": pa.array(max_tf, pa.int64()),
                "top_term_share": pa.array(
                    np.round(max_tf.astype(np.float64) / n_tokens, 6), pa.float64()
                ),
                "ttr": pa.array(
                    np.round(n_distinct.astype(np.float64) / n_tokens, 6), pa.float64()
                ),
            }
        )

    return _documents(sf_dir).map_batches(stats, batch_format="pyarrow")


def user_top_event_type(sf_dir: str):
    """Grouped MODE with deterministic tie-break (min event_type among max
    counts): per-batch (user, type) count combiner shrinks the shuffle to
    distinct pairs; the per-user finalize sees only that user's per-type
    partials (bounded by #event types, not #events)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        c = group.column("c").to_numpy()
        # partials of the same type may repeat across batches: fold first,
        # then tie-break (count DESC, event_type ASC)
        agg: dict = {}
        for t, cnt in zip(et, c):
            agg[t] = agg.get(t, 0) + int(cnt)
        top = min((t for t in agg), key=lambda t: (-agg[t], t))
        return pa.table(
            {
                "user_id": pa.array([group.column("user_id")[0].as_py()], pa.int64()),
                "top_event_type": pa.array([top], pa.string()),
                "cnt": pa.array([agg[top]], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=_nparts(sf_dir))
        .map_groups(finalize, batch_format="pyarrow")
    )


def embedding_moments(sf_dir: str):
    """First/second moments of the embedding matrix (the sanity stats an
    embedding pipeline checks before ANN/PCA): per-batch float64 partial
    sums (n, Σx, Σx², Σx₀x₁) for the first two dimensions — a handful of
    scalars per block regardless of corpus size — folded on the driver.
    Variance/covariance use the E[x²]−μ² identity; values are O(1) and the
    result is rounded to 6 on both engines."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(col[0]) if len(col) else 1
        m = flat.reshape(-1, dim)
        x0, x1 = m[:, 0], m[:, 1]
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s0": pa.array([float(x0.sum())], pa.float64()),
                "s1": pa.array([float(x1.sum())], pa.float64()),
                "ss0": pa.array([float((x0 * x0).sum())], pa.float64()),
                "ss1": pa.array([float((x1 * x1).sum())], pa.float64()),
                "s01": pa.array([float((x0 * x1).sum())], pa.float64()),
            }
        )

    tot = {"n": 0, "s0": 0.0, "s1": 0.0, "ss0": 0.0, "ss1": 0.0, "s01": 0.0}
    for part in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k in tot:
            tot[k] += part.column(k).to_numpy().sum()
    n = float(tot["n"])
    m0, m1 = tot["s0"] / n, tot["s1"] / n
    return pa.table(
        {
            "n": pa.array([int(n)], pa.int64()),
            "mean_0": pa.array([round(m0, 6)], pa.float64()),
            "mean_1": pa.array([round(m1, 6)], pa.float64()),
            "var_0": pa.array([round(tot["ss0"] / n - m0 * m0, 6)], pa.float64()),
            "var_1": pa.array([round(tot["ss1"] / n - m1 * m1, 6)], pa.float64()),
            "cov_01": pa.array([round(tot["s01"] / n - m0 * m1, 6)], pa.float64()),
        }
    )


def embedding_pca(sf_dir: str, k: int = 8):
    """Distributed PCA (rows-only: eigendecomposition is not
    SQL-expressible): per-batch (n, Σx, XᵀX) partials — O(d²) scalars per
    block — folded into the exact covariance, then a driver-side eigh on
    the d×d matrix (d=64 here; the d×d problem is always driver-sized even
    when the corpus is not). Returns the top-k eigenvalue spectrum and
    explained-variance ratios; eigenvector signs are not part of the
    contract (they are basis-ambiguous)."""
    from clip_as_service_ray.stages.ann import pca_fit

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    eigvals, _components, total_var = pca_fit(ds, column="embedding")
    topk = eigvals[:k]
    return pa.table(
        {
            "component": pa.array(np.arange(len(topk)), pa.int64()),
            "eigenvalue": pa.array(np.round(topk, 6), pa.float64()),
            "explained_ratio": pa.array(np.round(topk / total_var, 6), pa.float64()),
        }
    )


def phrase_search(sf_dir: str, phrase: str = "merge part", limit: int = 10):
    """Exact token-phrase top-k over `documents` THROUGH the positional
    index: build main index (doc-id scheme) + POSITIONS artifact (both
    cached/resumable), run the phrase through the PhraseScorer actor pool,
    rank by (phrase_tf DESC, doc_id ASC). The DuckDB oracle recomputes
    phrase occurrences with a positional self-join over zipped-unnest
    (term, pos) rows — overlapping occurrences count on both sides."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([phrase]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "phrase_tf": hits.column("phrase_tf"),
        }
    )


def span_or_search(
    sf_dir: str, clauses: tuple[str, ...] = ("merge part", "hash join"),
    limit: int = 10,
):
    """Lucene SpanOrQuery over exact-phrase clauses through the positional
    index: hits carry the UNION of the clauses' verified start sets
    (span_tf = total occurrences across clauses, first_pos = earliest
    start). SQL twin: UNION ALL of per-clause positional self-joins,
    grouped per doc."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" | ".join(clauses)]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg, span_or=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "span_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def span_not_search(
    sf_dir: str, include: str = "merge part", exclude: str = "slow",
    pre: int = 2, post: int = 2, limit: int = 10,
):
    """Lucene SpanNotQuery through the positional index: occurrences of the
    ``include`` phrase whose ``pre``/``post``-widened neighborhood contains
    NO occurrence of the ``exclude`` phrase; docs whose every occurrence is
    excluded drop out. SQL twin: positional self-join for the include
    starts, NOT EXISTS range probe for the exclusion window."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([include]),
            "limit": pa.array([limit], pa.int32()),
            "not_phrase": pa.array([exclude], pa.string()),
        }
    )
    hits = phrase_search_table(
        index_dir, q, cfg, span_not_pre=pre, span_not_post=post
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "span_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def bm25_topk_pinned(
    sf_dir: str, terms=BM25_QUERY_TERMS, pinned: tuple[int, ...] = (42, 7),
    limit: int = 10,
):
    """ES ``pinned`` query: the given doc ids occupy the top ranks in the
    order listed (whether or not they match the organic query — the ES
    contract), followed by the organic BM25 ranking with pinned docs
    removed. Rank-only output (ES synthesizes giant sentinel scores for
    the pinned slots; ranks are the portable contract). Organic scores are
    the engine's own exhaustive hit table."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([1 << 30], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()],
        dtype=np.int64,
    )
    pin = [int(p) for p in pinned]
    organic = [int(d) for d in ids if int(d) not in set(pin)]
    ordered = (pin + organic)[:limit]
    return pa.table(
        {
            "doc_id": pa.array(ordered, pa.int64()),
            "rank": pa.array(np.arange(len(ordered), dtype=np.int64), pa.int64()),
            "pinned": pa.array(
                [d in set(pin) for d in ordered], pa.bool_()
            ),
        }
    )


def interval_search(
    sf_dir: str, first: str = "merge", second: str = "part",
    max_gaps: int = 3, limit: int = 10,
):
    """ES ``intervals`` query (ordered match with max_gaps) through the
    positional index: docs where ``second`` occurs AFTER ``first`` with at
    most ``max_gaps`` tokens between them; interval_tf counts all ordered
    qualifying pairs, first_pos = the earliest qualifying ``first``
    position. SQL twin: one-sided positional self-join."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([f"{first} {second}"]),
            "limit": pa.array([limit], pa.int32()),
            "max_gaps": pa.array([max_gaps], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "interval_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def rare_terms(sf_dir: str, inv_ratio: int = 20, k: int = 20):
    """ES ``rare_terms`` aggregation: long-tail vocabulary terms whose
    document frequency is at most 1/``inv_ratio`` of the corpus (the
    max_doc_count contract made scale-free: ``df * inv_ratio <= n_docs``
    is exact integer arithmetic on both engines). Built on the distributed
    term_df pass; only survivors (long-tail-sized) reach the driver."""
    n_docs = int(_documents(sf_dir, columns=("doc_id",)).count())

    def keep(batch: pa.Table) -> pa.Table:
        df = batch.column("df").to_numpy()
        return batch.filter(pa.array(df * inv_ratio <= n_docs))

    surv = term_df(sf_dir).map_batches(keep, batch_format="pyarrow")
    tbl = pa.Table.from_pandas(surv.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    tbl = tbl.sort_by([("df", "ascending"), ("term", "ascending")])
    return tbl.slice(0, k)


def bm25_topk_conjunctive(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """Boolean-AND BM25 top-k over `documents` through the engine's
    conjunctive path (rarest-first candidate intersection with selective
    block decode, then canonical-order exact scoring). The SQL twin adds
    HAVING count(*) = n_terms to the bm25_topk oracle."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(terms)]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = search_table(index_dir, queries, cfg, conjunctive=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def bm25_topk_conjunctive_segmented(
    sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10
):
    """Boolean-AND BM25 top-k through the SEGMENTED scatter path: two
    disjoint segments + union stats + conjunctive QueryScorer replicas.
    The SQL twin is the monolithic conjunctive oracle — every query mode
    against shards must equal the one-index result (the reference serves
    all modes against shards, retriever.md:180-225)."""
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
        segment_dirs,
    )

    cfg = EngineConfig(num_index_partitions=4)
    root = _index_dir_for(sf_dir) + "_segmented"
    if len(segment_dirs(root)) < 2:
        add_segment(root, _docs_as_transcripts(sf_dir, parity=0), cfg)
        add_segment(root, _docs_as_transcripts(sf_dir, parity=1), cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(terms)]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    svc = SegmentedQueryService(root, cfg, conjunctive=True)
    try:
        hits = svc.search(queries)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


# per-worker-process cache of deserialized broadcast objects: map_batches
# tasks call this per batch; without it every batch re-fetches/deserializes
# the broadcast table from the object store
_BROADCAST_CACHE: dict[str, object] = {}


def _broadcast_get(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _BROADCAST_CACHE.clear()  # one live broadcast per operator run
        _BROADCAST_CACHE[key] = hit
    return hit


def proximity_search(
    sf_dir: str, term_a: str = "merge", term_b: str = "window",
    window: int = 4, limit: int = 10,
):
    """Proximity top-k over `documents` through the positional index: docs
    where the two terms co-occur within `window` tokens (any order), ranked
    by qualifying (occurrence_a, occurrence_b) pair count. The SQL twin is
    a positional self-join with abs(pos_a - pos_b) <= window."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([f"{term_a} {term_b}"]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg, window=window)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pair_count": hits.column("phrase_tf"),
        }
    )


def doc_keywords(sf_dir: str, k: int = 3):
    """Top-k TF-IDF keywords per document (keyword extraction): pass 1 =
    distributed df + doc count; the (term -> idf) map is RANGE-SHARDED in
    the object store (state/kvmap.py, the ShardedConvBase pattern) — the
    driver holds one boundary key per shard, never the vocabulary, and each
    scoring batch fetches only the idf shards its terms touch; pass 2 =
    per-batch tf * idf with a vectorized per-doc top-k — no shuffle, the
    per-doc result is emitted by the same batch that read the doc."""
    import ray.data

    from clip_as_service_ray.state.kvmap import build_sharded_float_map

    # ---- pass 1: global df per term and N = docs with >= 1 term
    def nonempty(batch: pa.Table) -> pa.Table:
        _tokens, lens = tokenize_column_flat(batch.column("text"))
        return pa.table({"n": pa.array([int((lens > 0).sum())], pa.int64())})

    n_docs = float(
        _documents(sf_dir)
        .map_batches(nonempty, batch_format="pyarrow")
        .sum("n")
    )

    def to_idf(batch: pa.Table) -> pa.Table:
        df = batch.column("df").to_numpy().astype(np.float64)
        return pa.table(
            {"key": batch.column("term").cast(pa.string()),
             "val": pa.array(np.log(n_docs / df), pa.float64())}
        )

    idf_map = build_sharded_float_map(
        term_df(sf_dir).map_batches(to_idf, batch_format="pyarrow")
    )

    # ---- pass 2: tf * idf, per-doc top-k inside the batch
    def topk_batch(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tfidf": pa.array([], pa.float64()),
                    "kw_rank": pa.array([], pa.int64()),
                }
            )
        docs = t.column("doc_id").to_numpy()
        terms = t.column("term").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy().astype(np.float64)
        tfidf = tf * idf_map.lookup(terms)
        codes, _ = pd.factorize(terms, sort=True)  # lex order for ties
        o = np.lexsort((codes, -tfidf, docs))
        d_s = docs[o]
        starts = np.concatenate([[0], np.nonzero(np.diff(d_s) != 0)[0] + 1])
        rank = np.arange(len(d_s), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(d_s)]]))
        )
        keep = rank < k
        sel = o[keep]
        return pa.table(
            {
                "doc_id": pa.array(docs[sel], pa.int64()),
                "term": pa.array(terms[sel], pa.string()),
                "tfidf": pa.array(np.round(tfidf[sel], 6), pa.float64()),
                "kw_rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(topk_batch, batch_format="pyarrow")


def customer_orders_full_outer(sf_dir: str):
    """FULL OUTER join exemplar over two filtered sides with genuine
    one-sided rows on both ends: BUILDING-segment customers vs per-customer
    urgent-order aggregates. Predicate pushdown at both reads; the right
    side is pre-aggregated per key BEFORE the shuffle (combiner); nulls
    from the outer join are coalesced to sentinels so the comparison
    carries no NULL-representation ambiguity."""
    import pyarrow.dataset as pads
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda b: b.rename_columns(["custkey", "acctbal"]),
        batch_format="pyarrow",
    )

    def order_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return g.rename_columns(["custkey", "total_part", "n_part"])

    urgent = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        )
        .map_batches(order_partial, batch_format="pyarrow")
        .groupby("custkey", num_partitions=_nparts(sf_dir))
        .aggregate(
            Sum("n_part", alias_name="urgent_orders"),
            Sum("total_part", alias_name="urgent_total"),
        )
    )
    joined = shuffle_hash_join(cust, urgent, on="custkey", how="full")

    def finish(batch: pa.Table) -> pa.Table:
        # np.round (not pc.round): numpy's scaled rounding lands on the same
        # float64 representation as DuckDB's round(), pyarrow's does not
        acct = pc.coalesce(
            pc.cast(batch.column("acctbal"), pa.float64()), pa.scalar(-1.0)
        ).to_numpy(zero_copy_only=False)
        total = pc.coalesce(
            pc.cast(batch.column("urgent_total"), pa.float64()), pa.scalar(0.0)
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "custkey": pc.cast(batch.column("custkey"), pa.int64()),
                "acctbal": pa.array(np.round(acct, 2), pa.float64()),
                "urgent_orders": pc.coalesce(
                    pc.cast(batch.column("urgent_orders"), pa.int64()),
                    pa.scalar(0, pa.int64()),
                ),
                "urgent_total": pa.array(np.round(total, 2), pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def doc_perplexity(sf_dir: str):
    """Per-document bigram language-model score (the perplexity-style
    quality signal of training-data pipelines): pass 1 learns add-one
    smoothed bigram/unigram counts from the corpus itself in ONE combined
    combiner pass (kind-prefixed keys, one small groupby); the count table
    is RANGE-SHARDED in the object store (state/kvmap.py) — the bigram
    vocabulary never funnels through the driver and a scoring batch fetches
    only the count shards its n-grams touch; pass 2 scores each doc
    shuffle-free as avg(-ln((c(w1,w2)+1)/(c(w1)+V))) over its adjacent
    token pairs."""
    from ray.data.aggregate import Sum

    from clip_as_service_ray.state.kvmap import build_sharded_float_map

    def count_partial(batch: pa.Table) -> pa.Table:
        tokens, _lens = tokenize_column_flat(batch.column("text"))
        _left, grams, _nb = _flat_bigrams(batch.column("text"))
        keys = pa.concat_arrays(
            [
                pc.binary_join_element_wise(
                    pa.array(["u\x00"] * len(tokens), pa.string()), tokens, ""
                ),
                pc.binary_join_element_wise(
                    pa.array(["b\x00"] * len(grams), pa.string()), grams, ""
                ),
            ]
        )
        if len(keys) == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        vc = keys.value_counts()
        u = vc.field("values").to_numpy(zero_copy_only=False)
        c = vc.field("counts").to_numpy()
        o = np.argsort(u)
        return pa.table(
            {"key": pa.array(u[o], pa.string()),
             "n_part": pa.array(c[o].astype(np.int64), pa.int64())}
        )

    counts_ds = (
        _documents(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("key", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
        .materialize()  # consumed twice (V count + map build): run the groupby once
    )
    # V = |unigram vocabulary|: a tiny distributed count, not a driver table
    def uni_count(batch: pa.Table) -> pa.Table:
        m = pc.starts_with(batch.column("key"), "u\x00")
        return pa.table({"n": pa.array([int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)], pa.int64())})

    vocab_v = float(counts_ds.map_batches(uni_count, batch_format="pyarrow").sum("n"))
    lm_map = build_sharded_float_map(counts_ds, key_col="key", val_col="n")

    def score(batch: pa.Table) -> pa.Table:
        v = vocab_v
        doc_ids = batch.column("doc_id").to_numpy()
        left, grams, lens = _flat_bigrams(batch.column("text"))
        if len(grams) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "avg_nll": pa.array([], pa.float64()),
                 "n_bigrams": pa.array([], pa.int64())}
            )
        # dictionary-encoded probes (unique-dictionary object hop only)
        c2 = lm_map.lookup_tokens(grams, "b\x00")  # missing bigram -> 0 (+1)
        c1 = lm_map.lookup_tokens(left, "u\x00")   # always present (from corpus)
        nll = -np.log((c2 + 1.0) / (c1 + v))
        keep = lens > 0
        bounds = np.concatenate([[0], np.cumsum(lens[keep])])
        sums = np.add.reduceat(nll, bounds[:-1])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], pa.int64()),
                "avg_nll": pa.array(
                    np.round(sums / lens[keep], 6), pa.float64()
                ),
                "n_bigrams": pa.array(lens[keep], pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(score, batch_format="pyarrow")


def corpus_ngram_diversity(sf_dir: str):
    """Corpus-level distinct-n diversity (Li et al. 2016's distinct-1/2/3
    — the generation-diversity / memorization metric applied to a training
    corpus): total and distinct n-gram counts for n = 1..3 and their
    ratios. ONE combined pass emits kind-prefixed per-batch gram counts
    (the doc_perplexity key trick); a single groupby makes them global;
    distinct = surviving rows per kind, total = their count sums — two
    tiny follow-up aggregates, all integers until the final division."""
    from ray.data.aggregate import Count, Sum

    def gram_partial(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table(
                {"key": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64())}
            )
        row = np.repeat(np.arange(len(lens)), lens)
        parts = [pc.binary_join_element_wise(
            pa.array(["1\x00"] * len(tokens), pa.string()), tokens, "")]
        if len(tokens) >= 2:
            ok2 = pa.array(row[:-1] == row[1:])
            l2 = tokens.slice(0, len(tokens) - 1).filter(ok2)
            r2 = tokens.slice(1).filter(ok2)
            parts.append(pc.binary_join_element_wise(
                pa.array(["2\x00"] * len(l2), pa.string()), l2, r2, " "))
        if len(tokens) >= 3:
            ok3 = pa.array((row[:-2] == row[1:-1]) & (row[:-2] == row[2:]))
            a3 = tokens.slice(0, len(tokens) - 2).filter(ok3)
            b3 = tokens.slice(1, len(tokens) - 2).filter(ok3)
            c3 = tokens.slice(2).filter(ok3)
            parts.append(pc.binary_join_element_wise(
                pa.array(["3\x00"] * len(a3), pa.string()), a3, b3, c3, " "))
        keys = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])
        vc = keys.value_counts()
        u = vc.field("values").to_numpy(zero_copy_only=False)
        c = vc.field("counts").to_numpy()
        o = np.argsort(u)
        return pa.table(
            {"key": pa.array(u[o], pa.string()),
             "n_part": pa.array(c[o].astype(np.int64), pa.int64())}
        )

    grams = (
        _documents(sf_dir)
        .map_batches(gram_partial, batch_format="pyarrow")
        .groupby("key", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def kind_partial(batch: pa.Table) -> pa.Table:
        kind = pc.utf8_slice_codeunits(batch.column("key"), 0, 1)
        g = pa.table({"kind": kind, "n": batch.column("n")}).group_by(
            "kind"
        ).aggregate([("n", "sum"), ("n", "count")])
        return g.rename_columns(["kind", "total_part", "distinct_part"])

    agg = (
        grams.map_batches(kind_partial, batch_format="pyarrow")
        .groupby("kind", num_partitions=2)
        .aggregate(Sum("total_part", alias_name="total"),
                   Sum("distinct_part", alias_name="distinct"))
        .to_pandas()
        .set_index("kind")
    )
    cols: dict[str, pa.Array] = {}
    out_n, out_tot, out_dist, out_ratio = [], [], [], []
    for n in ("1", "2", "3"):
        t = int(agg.loc[n, "total"]) if n in agg.index else 0
        d = int(agg.loc[n, "distinct"]) if n in agg.index else 0
        out_n.append(int(n))
        out_tot.append(t)
        out_dist.append(d)
        # _sql_round: DuckDB-parity half handling for exact divisions
        out_ratio.append(float(_sql_round(np.float64(d / t), 6)) if t else 0.0)
    return pa.table(
        {"n": pa.array(out_n, pa.int64()),
         "total": pa.array(out_tot, pa.int64()),
         "n_distinct": pa.array(out_dist, pa.int64()),
         "distinct_ratio": pa.array(out_ratio, pa.float64())}
    )


def dsir_importance_weights(sf_dir: str, target_lang: str = "en"):
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): per-doc log importance w(d) = sum over tokens of
    ln p_target(t) - ln p_raw(t), with add-one smoothed unigram models.
    Target = documents whose ``lang`` column equals ``target_lang``; raw =
    the whole corpus. ONE combined count pass emits per-term (raw, target)
    partials; the count table is range-sharded in the object store
    (state/kvmap.py, same scale path as doc_perplexity) and scoring is a
    second shuffle-free pass. Expression per token is
    ln((c_tgt+1)/(T_tgt+V)) - ln((c_raw+1)/(T_raw+V)) in exactly the SQL
    twin's order; per-doc sums round to 6 (reduceat-vs-SQL sum-order
    tolerance, the doc_perplexity precedent)."""
    from ray.data.aggregate import Sum

    from clip_as_service_ray.state.kvmap import build_sharded_float_map

    def count_partial(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        is_tgt = pc.equal(batch.column("lang"), target_lang).to_numpy(
            zero_copy_only=False
        )
        tgt_rows = np.repeat(is_tgt, lens)
        raw_keys = pc.binary_join_element_wise(
            pa.array(["r\x00"] * len(tokens), pa.string()), tokens, ""
        )
        tgt_tokens = tokens.filter(pa.array(tgt_rows))
        tgt_keys = pc.binary_join_element_wise(
            pa.array(["t\x00"] * len(tgt_tokens), pa.string()), tgt_tokens, ""
        )
        keys = pa.concat_arrays([raw_keys, tgt_keys])
        vc = keys.value_counts()
        u = vc.field("values").to_numpy(zero_copy_only=False)
        c = vc.field("counts").to_numpy()
        o = np.argsort(u)
        return pa.table(
            {"key": pa.array(u[o], pa.string()),
             "n_part": pa.array(c[o].astype(np.int64), pa.int64())}
        )

    counts_ds = (
        _documents(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("key", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
        .materialize()  # consumed twice (totals + map build)
    )

    def totals(batch: pa.Table) -> pa.Table:
        raw = pc.starts_with(batch.column("key"), "r\x00")
        n = batch.column("n")
        return pa.table({
            "t_raw": pa.array([int(pc.sum(pc.if_else(raw, n, pa.scalar(0, pa.int64()))).as_py() or 0)], pa.int64()),
            "t_tgt": pa.array([int(pc.sum(pc.if_else(pc.invert(raw), n, pa.scalar(0, pa.int64()))).as_py() or 0)], pa.int64()),
            "v": pa.array([int(pc.sum(pc.cast(raw, pa.int64())).as_py() or 0)], pa.int64()),
        })

    tot = counts_ds.map_batches(totals, batch_format="pyarrow").to_pandas().sum()
    t_raw, t_tgt, v = float(tot["t_raw"]), float(tot["t_tgt"]), float(tot["v"])
    cnt_map = build_sharded_float_map(counts_ds, key_col="key", val_col="n")

    def score(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        tokens, lens = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "log_w": pa.array([], pa.float64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        # dictionary-encoded probe: only the unique token dictionary
        # round-trips to object keys, not the full stream
        c_raw = cnt_map.lookup_tokens(tokens, "r\x00")  # always present
        c_tgt = cnt_map.lookup_tokens(tokens, "t\x00")  # missing -> 0 (+1)
        ll = np.log((c_tgt + 1.0) / (t_tgt + v)) - np.log(
            (c_raw + 1.0) / (t_raw + v)
        )
        keep = lens > 0
        bounds = np.concatenate([[0], np.cumsum(lens[keep])])
        sums = np.add.reduceat(ll, bounds[:-1])
        return pa.table(
            {"doc_id": pa.array(doc_ids[keep], pa.int64()),
             "log_w": pa.array(np.round(sums, 6), pa.float64()),
             "n_tokens": pa.array(lens[keep], pa.int64())}
        )

    return _documents(sf_dir).map_batches(score, batch_format="pyarrow")


def ccnet_perplexity_buckets(sf_dir: str):
    """CCNet perplexity bucketing (Wenzek et al. 2020: corpus split into
    head/middle/tail by LM perplexity terciles, the canonical quality
    stratification of web-crawl pipelines). Per-doc score = the bigram-LM
    avg NLL of ``doc_perplexity``; bucket = ((rn-1)*3)//n over the global
    (avg_nll ASC, doc_id ASC) order — the exact integer rule the SQL twin
    applies, no float boundary. Distributed shape: one sort of the ppl
    Dataset; O(1) per-block row counts give each block its global offset
    (driver prefix-sums counts only); per-block passes emit (bucket, n,
    sum) partials — 3 rows per block leave the workers."""
    import ray

    ppl = doc_perplexity(sf_dir)  # (doc_id, avg_nll, n_bigrams)
    refs = ppl.sort(["avg_nll", "doc_id"]).to_arrow_refs()
    if not refs:
        return pa.table(
            {"bucket": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "avg_nll": pa.array([], pa.float64())}
        )

    @ray.remote(num_cpus=0.25)
    def block_rows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([block_rows.remote(r) for r in refs])
    n_total = int(sum(counts))
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.25)
    def block_partial(t: pa.Table, offset: int, n: int) -> pa.Table:
        rn = offset + np.arange(t.num_rows, dtype=np.int64)  # rn-1, 0-based
        bucket = (rn * 3) // n
        nll = t.column("avg_nll").to_numpy()
        s = np.zeros(3, dtype=np.float64)
        np.add.at(s, bucket, nll)
        c = np.bincount(bucket, minlength=3).astype(np.int64)
        return pa.table(
            {"b": pa.array(np.arange(3, dtype=np.int64), pa.int64()),
             "n_part": pa.array(c, pa.int64()),
             "s_part": pa.array(s, pa.float64())}
        )

    parts = pa.concat_tables(ray.get([
        block_partial.remote(r, int(offsets[i]), n_total)
        for i, r in enumerate(refs)
    ]))
    b = parts.column("b").to_numpy()
    n_parts = parts.column("n_part").to_numpy()
    s_parts = parts.column("s_part").to_numpy()
    n_docs = np.zeros(3, dtype=np.int64)
    sums = np.zeros(3, dtype=np.float64)
    np.add.at(n_docs, b, n_parts)
    np.add.at(sums, b, s_parts)
    names = np.array(["head", "middle", "tail"], dtype=object)
    keep = n_docs > 0
    return pa.table(
        {"bucket": pa.array(names[keep], pa.string()),
         "n_docs": pa.array(n_docs[keep], pa.int64()),
         "avg_nll": pa.array(
             np.round(sums[keep] / n_docs[keep], 6), pa.float64()
         )}
    )


def chunk_documents(sf_dir: str, size: int = 32, stride: int = 16):
    """Overlapping token-window chunking (the training-data prep step that
    turns documents into fixed-budget model samples): whitespace tokens,
    windows of ``size`` every ``stride``. Fully vectorized per batch — one
    trim+split, then per chunk-start a list_slice + binary_join over ONLY
    the rows long enough (the loop is over window starts, bounded by the
    longest doc in the batch, never over rows)."""
    import ray.data

    def chunks(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        lists = pc.utf8_split_whitespace(trimmed)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        lens[pc.equal(trimmed, "").to_numpy(zero_copy_only=False)] = 0
        doc_ids = batch.column("doc_id").to_numpy()
        out_docs, out_idx, out_n, out_chunks = [], [], [], []
        max_len = int(lens.max()) if len(lens) else 0
        for s in range(0, max_len, stride):
            m = lens > s
            if not m.any():
                break
            sel = pa.array(np.nonzero(m)[0], pa.int64())
            sub = pc.list_slice(lists.take(sel), s, s + size)
            out_chunks.append(pc.binary_join(sub, " "))
            out_docs.append(doc_ids[m])
            out_idx.append(np.full(int(m.sum()), s // stride, np.int64))
            out_n.append(np.minimum(lens[m] - s, size))
        if not out_docs:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "chunk": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_docs), pa.int64()),
                "chunk_idx": pa.array(np.concatenate(out_idx), pa.int64()),
                "n_tokens": pa.array(np.concatenate(out_n), pa.int64()),
                "chunk": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in out_chunks]
                ),
            }
        )

    return _documents(sf_dir).map_batches(chunks, batch_format="pyarrow")


def phrase_search_segmented(sf_dir: str, phrase: str = "merge part", limit: int = 10):
    """Same phrase query as phrase_search but through INCREMENTAL SEGMENTS
    (two disjoint halves added via add_segment, per-segment positional
    artifacts) — the identical SQL oracle certifies segmented phrase ==
    one-shot positional index over the union."""
    from clip_as_service_ray.pipelines.phrase import (
        SegmentedPhraseService,
        build_positions,
    )
    from clip_as_service_ray.pipelines.segments import add_segment, segment_dirs

    cfg = EngineConfig(num_index_partitions=4)
    root = _index_dir_for(sf_dir) + "_segmented"
    if len(segment_dirs(root)) < 2:
        add_segment(root, _docs_as_transcripts(sf_dir, parity=0), cfg, positions=True)
        add_segment(root, _docs_as_transcripts(sf_dir, parity=1), cfg, positions=True)
    else:
        # segments already built by bm25_topk_segmented: extend them with
        # the positional artifact (resumable no-op when present)
        for parity, seg in enumerate(segment_dirs(root)[:2]):
            build_positions(_docs_as_transcripts(sf_dir, parity=parity), seg, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([phrase]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    svc = SegmentedPhraseService(root, cfg)
    try:
        hits = svc.search(q)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "phrase_tf": hits.column("phrase_tf"),
        }
    )


def regex_search_documents(sf_dir: str, pattern: str = "merge[ ]part|hash[ ]join"):
    """Vectorized regex grep over the corpus (the data-exploration scan):
    one RE2 kernel per batch (pc.count_substring_regex — zero Python per
    row), emit matching docs with their match counts."""

    def scan(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), pattern=pattern)
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_matches": pc.cast(n, pa.int64()),
            }
        )
        return t.filter(pc.greater(t.column("n_matches"), 0))

    return _documents(sf_dir).map_batches(scan, batch_format="pyarrow")


def profile_lineitem(sf_dir: str):
    """Column-level data profiling (the quality-report pass every ingest
    runs): per numeric column of `lineitem` -> count, nulls, min, max, sum;
    per-batch partials folded driver-side (output is O(columns), tiny)."""
    import ray.data

    cols = ["l_quantity", "l_extendedprice", "l_discount"]

    def partial(batch: pa.Table) -> pa.Table:
        out = {"col": [], "n_part": [], "nulls_part": [], "min_part": [],
               "max_part": [], "sum_part": []}
        for c in cols:
            arr = batch.column(c)
            out["col"].append(c)
            out["n_part"].append(len(arr))
            out["nulls_part"].append(arr.null_count)
            out["min_part"].append(float(pc.min(arr).as_py() or 0.0))
            out["max_part"].append(float(pc.max(arr).as_py() or 0.0))
            out["sum_part"].append(float(pc.sum(arr).as_py() or 0.0))
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n_part": pa.array(out["n_part"], pa.int64()),
                "nulls_part": pa.array(out["nulls_part"], pa.int64()),
                "min_part": pa.array(out["min_part"], pa.float64()),
                "max_part": pa.array(out["max_part"], pa.float64()),
                "sum_part": pa.array(out["sum_part"], pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=cols
    ).map_batches(partial, batch_format="pyarrow")
    pdf = ds.to_pandas()
    g = pdf.groupby("col", sort=True)
    return pa.table(
        {
            "col": pa.array(sorted(cols), pa.string()),
            "n_rows": pa.array(
                g["n_part"].sum().loc[sorted(cols)].to_numpy(), pa.int64()
            ),
            "n_nulls": pa.array(
                g["nulls_part"].sum().loc[sorted(cols)].to_numpy(), pa.int64()
            ),
            "min_v": pa.array(
                np.round(g["min_part"].min().loc[sorted(cols)].to_numpy(), 6),
                pa.float64(),
            ),
            "max_v": pa.array(
                np.round(g["max_part"].max().loc[sorted(cols)].to_numpy(), 6),
                pa.float64(),
            ),
            "sum_v": pa.array(
                np.round(g["sum_part"].sum().loc[sorted(cols)].to_numpy(), 2),
                pa.float64(),
            ),
        }
    )


def phrase_snippets(sf_dir: str, phrase: str = "merge part", context: int = 3, limit: int = 10):
    """Search + fetch + highlight: top-k phrase hits with a token-window
    SNIPPET around each doc's first match — the result-presentation step of
    a search engine. The hit list (doc, tf, first match position) comes from
    the positional index; snippet extraction is a shuffle-free filtered scan
    of the source (broadcast hit set, pc.is_in, re-tokenize only the <=k
    matching docs)."""
    import ray

    from clip_as_service_ray.functions.tokenizer import tokenize, tokenize_texts
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([phrase]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg)
    doc_ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], dtype=np.int64
    )
    order = np.argsort(doc_ids, kind="stable")
    hit_ref = ray.put(
        (
            doc_ids[order],
            hits.column("phrase_tf").to_numpy()[order],
            hits.column("first_pos").to_numpy()[order],
        )
    )
    plen = len(tokenize(phrase))

    def snip(batch: pa.Table) -> pa.Table:
        d, tf, fp = _broadcast_get(hit_ref)
        mask = pc.is_in(batch.column("doc_id"), value_set=pa.array(d, pa.int64()))
        b = batch.filter(mask)
        out = {
            "doc_id": [], "phrase_tf": [], "first_pos": [], "snippet": [],
        }
        if b.num_rows:
            toks = tokenize_texts(b.column("text").to_pylist())
            ids = b.column("doc_id").to_numpy()
            pos = np.searchsorted(d, ids)
            for i in range(b.num_rows):
                s = int(fp[pos[i]])
                window = toks[i][max(0, s - context) : s + plen + context]
                out["doc_id"].append(int(ids[i]))
                out["phrase_tf"].append(int(tf[pos[i]]))
                out["first_pos"].append(s)
                out["snippet"].append(" ".join(window))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "phrase_tf": pa.array(out["phrase_tf"], pa.int64()),
                "first_pos": pa.array(out["first_pos"], pa.int64()),
                "snippet": pa.array(out["snippet"], pa.string()),
            }
        )

    return _documents(sf_dir).map_batches(snip, batch_format="pyarrow")


def edit_distance_dup_pairs(sf_dir: str, max_dist: int = 60, max_id: int = 1000):
    """Edit-distance near-dup pairs (the fuzzy-matching member of the §2.8
    dedup family): length-band blocking + exact banded Levenshtein verify;
    the DuckDB twin recomputes levenshtein() over the same length-pruned
    pairs. Round-3: the certified subset covers the ENTIRE sf0.01 table
    (500 docs, 331 pairs at max_dist=60 — 47x the round-2 pair volume of 7)
    so the band-blocking recall argument is SQL-certified at a non-trivial
    scale; max_id bounds the all-pairs SQL twin at larger sf."""
    import pyarrow.dataset as pads

    from clip_as_service_ray.stages.dedup import edit_distance_pairs

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < max_id,
    )
    return edit_distance_pairs(ds, max_dist=max_dist)


def bm25_topk_negated(sf_dir: str, terms=BM25_QUERY_TERMS, exclude: str = "part", limit: int = 10):
    """Boolean NOT: bm25_topk over docs that contain NO token of `exclude`
    (candidate filter applied before top-k, survivor scores unchanged) —
    completes the boolean retrieval family (OR / AND / NOT)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(terms)]),
            "limit": pa.array([limit], pa.int32()),
            "exclude": pa.array([exclude]),
        }
    )
    hits = search_table(index_dir, queries, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_bool_prefix(
    sf_dir: str, text: str = "merge win", limit: int = 10,
):
    """ES ``match_bool_prefix`` (search-as-you-type): every term of the
    text is a plain OR term except the LAST, which matches as a prefix
    over the dictionary — "merge win" scores merge OR win*. The SQL twin
    ORs the exact term predicate with a LIKE on the last term."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([text]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, bool_prefix=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_prefix(sf_dir: str, prefix: str = "s", limit: int = 10):
    """Wildcard query `prefix*`: BM25 over every dictionary term with the
    prefix (one searchsorted range over the sorted vocabulary, each expanded
    term scored with its own idf) — the classic prefix-search feature."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([prefix]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = search_table(index_dir, queries, cfg, prefix=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_fuzzy(sf_dir: str, text: str = "srt", max_dist: int = 2, limit: int = 10):
    """Fuzzy query (Lucene FuzzyQuery analog): each token expands to its
    edit-distance-<=2 vocabulary neighborhood ('srt' -> {part, sort} here),
    the union scored with per-term idf."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([text]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = search_table(index_dir, queries, cfg, fuzzy=max_dist)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def more_like_this(sf_dir: str, doc_id: int = 42, m: int = 3, limit: int = 10):
    """Query-by-example (Lucene MoreLikeThis analog): the query doc's top-m
    TF-IDF terms (idf from the index dictionary — the same broadcast table
    the engine serves from) become an OR query; the doc itself is excluded
    from the hits. Composes keyword extraction with BM25 search end-to-end
    through the real engine."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.state import manifest as mf

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    row = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pads.field("doc_id") == doc_id,
        ).take(1)
    )
    toks = tokenize(row[0]["text"])
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    # predicate-pushdown dictionary read: only the QUERY DOC's terms leave
    # storage (one doc's vocabulary, never the index's) — the scale-safe
    # replacement for materializing the full dictionary on the driver
    dict_tbl = pq.read_table(
        os.path.join(index_dir, "dictionary"),
        filters=[("term", "in", terms.tolist())],
    )
    dterms = dict_tbl.column("term").to_numpy(zero_copy_only=False)
    ddf = dict_tbl.column("df").to_numpy().astype(np.float64)
    order = np.argsort(dterms, kind="stable")
    dterms, ddf = dterms[order], ddf[order]
    n_docs = float(mf.read_json(os.path.join(index_dir, "stats.json"))["n_docs"])
    pos = np.searchsorted(dterms, terms)
    pos_c = np.minimum(pos, max(len(dterms) - 1, 0))
    # terms absent from the dictionary (not indexed) get df = n_docs -> idf 0
    df = np.where(
        (len(dterms) > 0) & (dterms[pos_c] == terms), ddf[pos_c], n_docs
    ) if len(dterms) else np.full(len(terms), n_docs)
    tfidf = tfs * np.log(n_docs / df)
    top = np.lexsort((terms, -tfidf))[:m]
    kw = sorted(terms[top].tolist())

    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(kw)]),
            "limit": pa.array([limit + 1], pa.int32()),  # self may rank
        }
    )
    hits = search_table(index_dir, queries, cfg)
    ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], dtype=np.int64
    )
    scores = np.round(hits.column("score").to_numpy(), 6)
    keep = ids != doc_id
    return pa.table(
        {
            "doc_id": pa.array(ids[keep][:limit], pa.int64()),
            "score": pa.array(scores[keep][:limit], pa.float64()),
        }
    )


def event_value_histogram(sf_dir: str, width: float = 10.0):
    """Fixed-width histogram over `events.value` (the distribution-profiling
    companion of profile_lineitem): per-batch bincount partials — each batch
    ships O(bins) rows — folded by one tiny groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy().astype(np.float64)
        bins = np.floor(v / width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(u, pa.int64()),
             "n_part": pa.array(c.astype(np.int64), pa.int64())}
        )

    agg = (
        ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "bin": pc.cast(tbl.column("bin"), pa.int64()),
            "n": pc.cast(tbl.column("n"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# query-assist surface: did-you-mean, autocomplete, facets, decontamination


SUGGEST_QUERIES = ("merg", "windw", "tabel", "jon", "sot", "kay", "vale", "prt")
AUTOCOMPLETE_PREFIXES = ("s", "wi")


def spell_suggest(
    sf_dir: str,
    queries: tuple[str, ...] = SUGGEST_QUERIES,
    max_dist: int = 2,
    k: int = 5,
):
    """Did-you-mean: for each (misspelled) query string, the top-k vocabulary
    terms within ``max_dist`` edits ranked by (dist ASC, df DESC, term ASC).

    Ray-first shape: the vocabulary is the DISTRIBUTED (term, df) table from
    ``term_df`` — candidate generation runs inside map_batches against the
    tiny broadcast query list (vectorized length-band prefilter, capped-DP
    verify only inside the band), and only survivors (a few rows per query)
    reach the driver for the final top-k sort. At a 10^8-term vocabulary the
    same pass just has more blocks; nothing vocabulary-sized is collected.

    Reference analog: fuzzy query expansion (SURVEY §2 C4 query modes);
    ranking by collection df is the standard speller prior.
    """
    qlist = [str(q) for q in queries]
    qlens = np.array([len(q) for q in qlist], np.int64)

    def cand(batch: pa.Table) -> pa.Table:
        from clip_as_service_ray.stages.dedup import _levenshtein_capped

        terms = batch.column("term")
        tlens = pc.utf8_length(terms).to_numpy().astype(np.int64)
        dfs = batch.column("df").to_numpy()
        out_q: list[str] = []
        out_t: list[str] = []
        out_d: list[int] = []
        out_df: list[int] = []
        for q, lq in zip(qlist, qlens):
            band = np.nonzero(np.abs(tlens - lq) <= max_dist)[0]
            if len(band) == 0:
                continue
            band_terms = terms.take(pa.array(band)).to_pylist()
            for j, t in zip(band, band_terms):
                d = _levenshtein_capped(q, t, max_dist)
                if d <= max_dist:
                    out_q.append(q)
                    out_t.append(t)
                    out_d.append(d)
                    out_df.append(int(dfs[j]))
        return pa.table(
            {
                "query": pa.array(out_q, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "dist": pa.array(out_d, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    surv = term_df(sf_dir).map_batches(cand, batch_format="pyarrow")
    tbl = pa.Table.from_pandas(surv.to_pandas(), preserve_index=False)
    if len(tbl) == 0:
        return pa.table(
            {"query": pa.array([], pa.string()), "term": pa.array([], pa.string()),
             "dist": pa.array([], pa.int64()), "df": pa.array([], pa.int64())}
        )
    tbl = tbl.sort_by(
        [("query", "ascending"), ("dist", "ascending"),
         ("df", "descending"), ("term", "ascending")]
    )
    qcol = np.asarray(tbl.column("query").to_pylist())
    # rank within query group = position - group start (groups are contiguous)
    starts = np.nonzero(np.concatenate(([True], qcol[1:] != qcol[:-1])))[0]
    grp = np.cumsum(np.concatenate(([0], (qcol[1:] != qcol[:-1]).astype(np.int64))))
    rank = np.arange(len(qcol)) - starts[grp]
    return tbl.filter(pa.array(rank < k))


def autocomplete_prefix(
    sf_dir: str,
    prefixes: tuple[str, ...] = AUTOCOMPLETE_PREFIXES,
    k: int = 5,
):
    """Autocomplete: top-k vocabulary completions per prefix by (df DESC,
    term ASC). Same distributed-vocabulary shape as ``spell_suggest``; the
    per-batch filter is a vectorized ``starts_with`` (on the sorted on-disk
    dictionary this is a searchsorted range — ``IndexReader.expand_prefix``
    is the serving-path twin of this operator)."""
    plist = [str(p) for p in prefixes]

    def cand(batch: pa.Table) -> pa.Table:
        terms = batch.column("term")
        dfs = batch.column("df")
        parts = []
        for p in plist:
            m = pc.starts_with(terms, p)
            t = terms.filter(m)
            parts.append(
                pa.table(
                    {
                        "prefix": pa.array([p] * len(t), pa.string()),
                        "term": t,
                        "df": pc.cast(dfs.filter(m), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table(
            {"prefix": pa.array([], pa.string()), "term": pa.array([], pa.string()),
             "df": pa.array([], pa.int64())}
        )

    surv = term_df(sf_dir).map_batches(cand, batch_format="pyarrow")
    tbl = pa.Table.from_pandas(surv.to_pandas(), preserve_index=False)
    if len(tbl) == 0:
        return pa.table(
            {"prefix": pa.array([], pa.string()), "term": pa.array([], pa.string()),
             "df": pa.array([], pa.int64())}
        )
    tbl = tbl.sort_by(
        [("prefix", "ascending"), ("df", "descending"), ("term", "ascending")]
    )
    pcol = np.asarray(tbl.column("prefix").to_pylist())
    starts = np.nonzero(np.concatenate(([True], pcol[1:] != pcol[:-1])))[0]
    grp = np.cumsum(np.concatenate(([0], (pcol[1:] != pcol[:-1]).astype(np.int64))))
    rank = np.arange(len(pcol)) - starts[grp]
    return tbl.filter(pa.array(rank < k))


PHRASE_SUGGEST_QUERIES = ("merg windw", "hach jion", "sot tabel")


def phrase_suggest(
    sf_dir: str,
    queries: tuple[str, ...] = PHRASE_SUGGEST_QUERIES,
    max_dist: int = 2,
    n_cand: int = 5,
    k: int = 3,
):
    """ES phrase suggester ("did you mean" over whole query strings): each
    whitespace slot gets fuzzy vocabulary candidates (same distributed
    kernel and cap rule as spell_suggest: dist ASC, df DESC, term ASC,
    first n_cand), then every candidate CHAIN is re-ranked by an add-one-
    smoothed bigram language model learned from the corpus in one
    distributed pass:

        score = ln(tf(c1)/T) + sum_i ln((bigram(ci, ci+1) + 1) / (tf(ci) + V))

    (T = total corpus tokens, V = vocabulary size). Scale shape: only
    candidate-vocabulary unigram/bigram partial counts leave the workers —
    bounded by (n_cand * slots * len(queries))^2 rows per batch, never the
    LM itself. Reference analog: query-assist family next to fuzzy
    expansion (SURVEY §2 C4); the ES phrase_suggester contract is the
    candidate-generator x LM-rescore split implemented here."""
    slots_per_q = [q.split() for q in queries]
    slot_terms = sorted({t for slots in slots_per_q for t in slots})
    cands_tbl = spell_suggest(
        sf_dir, queries=tuple(slot_terms), max_dist=max_dist, k=n_cand
    )
    cand_of: dict[str, list[str]] = {t: [] for t in slot_terms}
    for qt, term in zip(
        cands_tbl.column("query").to_pylist(), cands_tbl.column("term").to_pylist()
    ):
        cand_of[qt].append(term)
    vocab = sorted({t for lst in cand_of.values() for t in lst})
    if not vocab:
        return pa.table(
            {"query": pa.array([], pa.string()),
             "suggestion": pa.array([], pa.string()),
             "score": pa.array([], pa.float64())}
        )
    C = len(vocab)
    vocab_arr = pa.array(vocab, pa.string())

    def stats(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        n_tok = len(tokens)
        codes = pc.fill_null(
            pc.index_in(tokens, value_set=vocab_arr), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        t1: list[str] = []
        t2: list[str] = []
        kind: list[str] = []
        n: list[int] = []
        matched = codes >= 0
        if matched.any():
            uc = np.bincount(codes[matched], minlength=C)
            for i in np.nonzero(uc)[0]:
                t1.append(vocab[i]); t2.append(""); kind.append("u")
                n.append(int(uc[i]))
            row_of = np.repeat(np.arange(len(lens)), lens)
            if n_tok > 1:
                a, b = codes[:-1], codes[1:]
                ok = (a >= 0) & (b >= 0) & (row_of[:-1] == row_of[1:])
                if ok.any():
                    comb = a[ok] * C + b[ok]
                    u, cnt = np.unique(comb, return_counts=True)
                    for code, c_ in zip(u, cnt):
                        t1.append(vocab[code // C]); t2.append(vocab[code % C])
                        kind.append("b"); n.append(int(c_))
        t1.append(""); t2.append(""); kind.append("T"); n.append(n_tok)
        return pa.table(
            {"kind": pa.array(kind, pa.string()), "t1": pa.array(t1, pa.string()),
             "t2": pa.array(t2, pa.string()), "n": pa.array(n, pa.int64())}
        )

    parts = (
        _documents(sf_dir)
        .map_batches(stats, batch_format="pyarrow")
        .to_pandas()
    )
    summed = parts.groupby(["kind", "t1", "t2"], as_index=False)["n"].sum()
    T = float(summed.loc[summed["kind"] == "T", "n"].sum())
    uni = {
        r.t1: float(r.n) for r in summed[summed["kind"] == "u"].itertuples()
    }
    big = {
        (r.t1, r.t2): float(r.n)
        for r in summed[summed["kind"] == "b"].itertuples()
    }
    V = float(term_df(sf_dir).count())

    out_q: list[str] = []
    out_s: list[str] = []
    out_sc: list[float] = []
    import itertools

    for q, slots in zip(queries, slots_per_q):
        chains = [cand_of.get(t, []) for t in slots]
        if any(len(c) == 0 for c in chains):
            continue
        rows = []
        for chain in itertools.product(*chains):
            tf1 = uni.get(chain[0], 0.0)
            if tf1 == 0.0:
                continue
            s = np.log(tf1 / T)
            ok = True
            for ci, cj in zip(chain, chain[1:]):
                tfi = uni.get(ci, 0.0)
                if tfi == 0.0:
                    ok = False
                    break
                bc = big.get((ci, cj), 0.0)
                s = s + np.log((bc + 1.0) / (tfi + V))
            if ok:
                rows.append((" ".join(chain), round(float(s), 6)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        for sug, sc in rows[:k]:
            out_q.append(q); out_s.append(sug); out_sc.append(sc)
    return pa.table(
        {"query": pa.array(out_q, pa.string()),
         "suggestion": pa.array(out_s, pa.string()),
         "score": pa.array(out_sc, pa.float64())}
    )


def search_facets(sf_dir: str, terms: tuple[str, ...] = BM25_QUERY_TERMS):
    """Faceted search: for documents matching ANY query term, document counts
    per facet value over the ``lang`` and ``source`` dimensions — the facet
    panel next to a result list.

    One streaming corpus pass: per batch, vectorized match-any (is_in over the
    flat token stream, OR-reduced per row via bincount) then O(facet-values)
    partial count rows; a tiny groupby folds partials. Text never shuffles;
    the exchange is facet-cardinality-sized regardless of corpus size.
    """
    import ray.data
    from ray.data.aggregate import Sum

    tset = pa.array(sorted(set(terms)), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        tokens, lens = tokenize_column_flat(batch.column("text"))
        n_rows = len(lens)
        if len(tokens) == 0 or n_rows == 0:
            return pa.table(
                {"facet": pa.array([], pa.string()),
                 "value": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64())}
            )
        hit = pc.is_in(tokens, value_set=tset).to_numpy(zero_copy_only=False)
        row_of_tok = np.repeat(np.arange(n_rows), lens)
        matched = np.bincount(row_of_tok, weights=hit, minlength=n_rows) > 0
        parts = []
        for facet in ("lang", "source"):
            vals = batch.column(facet).filter(pa.array(matched))
            vc = vals.combine_chunks().value_counts()
            if isinstance(vc, pa.ChunkedArray):
                vc = vc.combine_chunks()
            parts.append(
                pa.table(
                    {
                        "facet": pa.array([facet] * len(vc), pa.string()),
                        "value": vc.field("values"),
                        "n_part": vc.field("counts").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    ds = _documents(sf_dir, columns=("doc_id", "text", "lang", "source"))
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["facet", "value"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "facet": pc.cast(tbl.column("facet"), pa.string()),
            "value": pc.cast(tbl.column("value"), pa.string()),
            "n_docs": pc.cast(tbl.column("n_docs"), pa.int64()),
        }
    )


def _flat_ngrams(col, n: int):
    """(gram_strings, row_of_gram, n_rows) for a text column: n-token
    shingles joined with ' ', built from n shifted slices of the flat token
    stream with a row-boundary validity mask (the _flat_bigrams pattern
    generalized)."""
    tokens, lens = tokenize_column_flat(col)
    n_rows = len(lens)
    L = len(tokens)
    if L < n:
        return pa.array([], pa.string()), np.array([], np.int64), n_rows
    row = np.repeat(np.arange(n_rows), lens)
    ok = row[: L - n + 1] == row[n - 1 :]
    if not ok.any():
        return pa.array([], pa.string()), np.array([], np.int64), n_rows
    okp = pa.array(ok)
    slices = [tokens.slice(j, L - n + 1).filter(okp) for j in range(n)]
    grams = pc.binary_join_element_wise(*slices, " ")
    return grams, row[: L - n + 1][ok], n_rows


def ngram_contamination(
    sf_dir: str,
    n: int = 4,
    bench_source: str = "src0",
):
    """Benchmark decontamination (GPT-3 appendix-C style): flag corpus
    documents sharing at least one n-token shingle with a held-out benchmark
    partition, with the count of DISTINCT shared shingles per document.

    Two passes, no shuffle: (1) the benchmark partition (an eval set — small
    by nature, and read with a pushed-down source filter) reduces to its
    distinct shingle set, which is ray.put ONCE; (2) one streaming corpus
    pass computes per-row distinct shingles (vectorized; a document's
    shingles live entirely in its row, so batch-local dedupe is globally
    exact) and counts hash-lookup membership hits. If the benchmark side ever
    outgrew one object, the same pass becomes a shingle-keyed groupby join —
    documented, not needed for eval-set-sized inputs.
    """
    import ray
    import ray.data

    bench = (
        _documents(sf_dir, columns=("text", "source"))
        .filter(expr=f"source == '{bench_source}'")
    )

    def bench_part(batch: pa.Table) -> pa.Table:
        grams, _rows, _n = _flat_ngrams(batch.column("text"), n)
        u = pc.unique(grams)
        return pa.table({"shingle": u})

    bench_tbl = pa.Table.from_pandas(
        bench.map_batches(bench_part, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    bench_set = pc.unique(
        bench_tbl.column("shingle").combine_chunks()
        if len(bench_tbl)
        else pa.array([], pa.string())
    )
    set_ref = ray.put(bench_set)

    class CountOverlap:
        def __init__(self, set_ref):
            self.bench = ray.get(set_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            grams, row_of_gram, n_rows = _flat_ngrams(batch.column("text"), n)
            doc_ids = batch.column("doc_id").to_numpy()
            if len(grams) == 0 or len(self.bench) == 0:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "n_overlap": pa.array([], pa.int64())}
                )
            denc = grams.dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            n_codes = len(denc.dictionary)
            # distinct (row, gram) pairs: a doc's shingles are batch-local
            pair = np.unique(row_of_gram * n_codes + codes)
            urow = pair // n_codes
            ucode = pair % n_codes
            hit = pc.is_in(
                denc.dictionary.take(pa.array(ucode)), value_set=self.bench
            ).to_numpy(zero_copy_only=False)
            n_ov = np.bincount(urow, weights=hit, minlength=n_rows).astype(np.int64)
            keep = n_ov > 0
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[keep], pa.int64()),
                    "n_overlap": pa.array(n_ov[keep], pa.int64()),
                }
            )

    corpus = (
        _documents(sf_dir, columns=("doc_id", "text", "source"))
        .filter(expr=f"source != '{bench_source}'")
        .map_batches(
            CountOverlap,
            fn_constructor_kwargs={"set_ref": set_ref},
            batch_format="pyarrow",
            concurrency=2,
        )
    )
    tbl = pa.Table.from_pandas(corpus.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "doc_id": pc.cast(tbl.column("doc_id"), pa.int64()),
            "n_overlap": pc.cast(tbl.column("n_overlap"), pa.int64()),
        }
    )


def hybrid_rrf_topk(
    sf_dir: str, n: int = 30, k: int = 10, kappa: int = 60
):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al., SIGIR'09):
    the sparse leg is BM25 top-n THROUGH the real engine (``bm25_topk``) and
    the dense leg is cosine top-n over the embedding column (``ann_topk``,
    query = vec 0); fused score = sum over legs of 1 / (kappa + rank). Both
    legs are distributed passes that return only n rows, so the fusion
    itself is a driver-side merge of two k-sized lists — the standard shape
    for hybrid search at any corpus size (the engine's /search + the ANN
    index each do their own top-n; fusion cost is O(n)).

    doc_id and vec_id share the entity space in the driver tables; rrf is a
    sum of two fixed-point-free reciprocals (order-independent)."""
    sparse = bm25_topk(sf_dir, limit=n)  # rows already in rank order
    dense = ann_topk(sf_dir, k=n)  # rows already in (sim DESC, id ASC) order
    rrf: dict[int, float] = {}
    for r, d in enumerate(sparse.column("doc_id").to_pylist(), start=1):
        rrf[int(d)] = rrf.get(int(d), 0.0) + 1.0 / (kappa + r)
    for r, d in enumerate(dense.column("vec_id").to_pylist(), start=1):
        rrf[int(d)] = rrf.get(int(d), 0.0) + 1.0 / (kappa + r)
    ranked = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in ranked], pa.int64()),
            "rrf": pa.array([round(s, 6) for _, s in ranked], pa.float64()),
        }
    )


def events_composite_agg(
    sf_dir: str, size: int = 10, after=("click", "2024-01-20"),
):
    """ES composite aggregation with after_key cursor paging: multi-source
    buckets (event_type, day) ordered by the composite key, returning the
    ``size`` buckets strictly AFTER the cursor. The cursor predicate is
    pushed into the per-batch pre-aggregation (rows before the cursor never
    enter the shuffle — the reason ES composite paging scales), partial
    (count, sum) per key per batch, one small keyed groupby finishes."""
    import ray.data
    from ray.data.aggregate import Sum

    a_type, a_day = after

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        day = pc.strftime(batch.column("ts"), "%Y-%m-%d")
        keep = pc.or_(
            pc.greater(et, pa.scalar(a_type)),
            pc.and_(pc.equal(et, pa.scalar(a_type)),
                    pc.greater(day, pa.scalar(a_day))),
        )
        t = pa.table(
            {"event_type": et, "day": day, "value": batch.column("value")}
        ).filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "day": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64()),
                 "v_part": pa.array([], pa.float64())}
            )
        g = t.group_by(["event_type", "day"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {"event_type": g.column("event_type"),
             "day": g.column("day"),
             "n_part": g.column("value_count").cast(pa.int64()),
             "v_part": g.column("value_sum").cast(pa.float64())}
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part"), Sum("v_part"))
    )
    df = agg.to_pandas().sort_values(["event_type", "day"]).head(size)
    return pa.table(
        {"event_type": pa.array(df["event_type"].tolist(), pa.string()),
         "day": pa.array(df["day"].tolist(), pa.string()),
         "n": pa.array(df["sum(n_part)"].to_numpy().astype(np.int64), pa.int64()),
         "sum_value": pa.array(
             np.round(df["sum(v_part)"].to_numpy(), 2), pa.float64())}
    )


def hybrid_linear_topk(
    sf_dir: str, n: int = 30, k: int = 10,
    w_sparse: float = 0.7, w_dense: float = 0.3,
):
    """Hybrid retrieval via normalized linear fusion (the ES 8.x 'linear
    retriever' / normalizer=minmax): each leg's top-n scores min-max
    normalize to [0, 1], fused = w_sparse·norm(bm25) + w_dense·norm(cos);
    a doc absent from a leg contributes 0 from it. Same two distributed
    legs as hybrid_rrf_topk (engine BM25 + ANN cosine), O(n) driver fusion.
    Legs normalize over their ROUNDED scores so the SQL twin sees identical
    inputs; a degenerate leg (max == min) normalizes to all-1.0."""
    sparse = bm25_topk(sf_dir, limit=n)
    dense = ann_topk(sf_dir, k=n)

    def norm(x: np.ndarray) -> np.ndarray:
        if len(x) == 0:
            return x
        lo, hi = float(x.min()), float(x.max())
        if hi == lo:
            return np.ones_like(x)
        return (x - lo) / (hi - lo)

    fused: dict[int, float] = {}
    ns = norm(sparse.column("score").to_numpy())
    for d, v in zip(sparse.column("doc_id").to_pylist(), ns):
        fused[int(d)] = fused.get(int(d), 0.0) + w_sparse * float(v)
    nd = norm(dense.column("sim").to_numpy())
    for d, v in zip(dense.column("vec_id").to_pylist(), nd):
        fused[int(d)] = fused.get(int(d), 0.0) + w_dense * float(v)
    ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {"doc_id": pa.array([d for d, _ in ranked], pa.int64()),
         "fused": pa.array([round(s, 6) for _, s in ranked], pa.float64())}
    )


def stem_counts(sf_dir: str, min_count: int = 1):
    """Porter-stem frequency table over the corpus (functions/stem.py): per
    batch, each DISTINCT token is stemmed once (dictionary_encode, then the
    per-code stem maps back through the code array — zipfian text makes this
    a large constant factor), counts pre-aggregate per batch, one small
    groupby(stem) finishes. Rows-only entry: DuckDB has no offline stemmer
    (the fts extension's stem() needs a network INSTALL), so correctness is
    pinned by the paper-example suite in tests/test_stem.py instead."""
    from ray.data.aggregate import Sum

    from clip_as_service_ray.functions.stem import porter_stem

    def partial(batch: pa.Table) -> pa.Table:
        tokens, _lens = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table({"stem": pa.array([], pa.string()),
                             "n_part": pa.array([], pa.int64())})
        denc = tokens.dictionary_encode()
        stems = [
            porter_stem(t) if t.isalpha() else t
            for t in denc.dictionary.to_pylist()
        ]
        codes = denc.indices.to_numpy().astype(np.int64)
        counts = np.bincount(codes, minlength=len(stems)).astype(np.int64)
        t = pa.table({"stem": pa.array(stems, pa.string()),
                      "n_part": pa.array(counts, pa.int64())})
        # same stem from several surface forms within the batch: pre-sum
        g = t.group_by("stem").aggregate([("n_part", "sum")])
        return g.rename_columns(["stem", "n_part"])

    agg = (
        _documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("stem", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    if min_count > 1:
        tbl = tbl.filter(pc.greater_equal(tbl.column("n"), min_count))
    return pa.table(
        {"stem": pc.cast(tbl.column("stem"), pa.string()),
         "n": pc.cast(tbl.column("n"), pa.int64())}
    )


def bm25_topk_stemmed(sf_dir: str, text: str = "merging windows", limit: int = 10):
    """BM25 top-k through a Porter-STEMMED index (EngineConfig(analyzer=
    "stem"), functions/analyzers.py): the index folds every term at build
    time, the reader auto-folds the query (stats.json records the analyzer),
    so morphological variants — "merging windows" vs corpus "merge window" —
    retrieve like exact terms. Rows-only entry: no offline SQL stemmer
    exists (DuckDB's fts stem() needs a network INSTALL); correctness is
    pinned by the Porter paper-example suite (tests/test_stem.py) plus the
    engine-vs-oracle stemmed parity tests (tests/test_analyzer.py)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4, analyzer="stem")
    index_dir = _index_dir_for(sf_dir) + "_stem"
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([text]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_synonyms(
    sf_dir: str, text: str = "merge", synonyms=None, limit: int = 10,
):
    """Query-time synonym expansion (Lucene's SynonymGraph-at-query-time
    model): each query term adds its curated synonym group as independent
    OR terms, so scores are plain BM25 over the expanded set — the SQL twin
    is the ordinary formula with a longer IN list. 'combine' is absent from
    the corpus vocabulary on purpose (a zero-df expansion term contributes
    nothing on either side)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    if synonyms is None:
        synonyms = {"merge": ["join", "combine"]}
    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([text]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, synonyms=synonyms)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def top_supplier_revenue(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01"):
    """TPC-H Q15 analog — the supplier(s) with MAX revenue over a quarter.
    One column-pruned, predicate-pushed lineitem scan with per-batch partial
    sums, a supplier-cardinality groupby, then a driver-side max over the
    (tiny) per-supplier table; names come from a broadcast supplier dim.
    The max/equality is taken over CENT-ROUNDED revenue so the winner is
    engine-independent (ulp-order noise in float sums can't flip it)."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(np.datetime64(date_from, "us")))
            & (pc.field("l_shipdate") < pa.scalar(np.datetime64(date_to, "us")))
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"l_suppkey": batch.column("l_suppkey"), "rev": rev})
        g = t.group_by("l_suppkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev_part"])

    agg = (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("rev_part", alias_name="total_revenue"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    rev2 = np.round(tbl.column("total_revenue").to_numpy(), 2)
    best = rev2.max() if len(rev2) else 0.0
    keep = np.nonzero(rev2 == best)[0]
    skeys = tbl.column("l_suppkey").to_numpy()[keep]
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    names = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_name").to_pylist()))
    order = np.argsort(skeys)
    return pa.table(
        {
            "s_suppkey": pa.array(skeys[order].astype(np.int64), pa.int64()),
            "s_name": pa.array([names[int(k)] for k in skeys[order]], pa.string()),
            "total_revenue": pa.array(rev2[keep][order], pa.float64()),
        }
    )


def small_quantity_order_revenue(sf_dir: str, brand: str = "Brand#13"):
    """TPC-H Q17 analog — average yearly revenue lost by refusing small
    orders of one brand's parts. Two column-pruned lineitem scans, zero
    all-to-all: the brand's partkey set broadcasts into scan 1 (per-part
    qty sums -> exact avg: quantities are integral doubles, so sum/count is
    bit-identical across engines), the 0.2*avg threshold map broadcasts
    into scan 2 which keeps rows with l_quantity < threshold and partial-
    sums extendedprice. At 100 TB both maps stay |parts-of-one-brand|-sized."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    pkeys = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
        filters=[("p_brand", "==", brand)],
    ).column("p_partkey")
    pk_arr = pkeys.combine_chunks()

    line1 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity"],
        filter=pc.field("l_partkey").isin(pk_arr),
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_partkey").aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(["l_partkey", "q_sum", "q_cnt"])

    qt = pa.Table.from_pandas(
        line1.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey", num_partitions=_nparts(sf_dir))
        .sum(["q_sum", "q_cnt"])
        .to_pandas(),
        preserve_index=False,
    )
    pk = qt.column("l_partkey").to_numpy()
    thr = 0.2 * (
        qt.column("sum(q_sum)").to_numpy() / qt.column("sum(q_cnt)").to_numpy()
    )
    thr_ref = ray.put(dict(zip(pk.tolist(), thr.tolist())))

    def rev_partial(batch: pa.Table) -> pa.Table:
        tmap = ray.get(thr_ref)
        pks = batch.column("l_partkey").to_numpy()
        qty = batch.column("l_quantity").to_numpy()
        lim = np.fromiter((tmap.get(int(p), 0.0) for p in pks), np.float64, len(pks))
        keep = qty < lim
        s = float(batch.column("l_extendedprice").to_numpy()[keep].sum())
        return pa.table({"s": pa.array([s], pa.float64())})

    line2 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
        filter=pc.field("l_partkey").isin(pk_arr),
    )
    rows = line2.map_batches(rev_partial, batch_format="pyarrow").take_all()
    total = sum(r["s"] for r in rows)
    return pa.table(
        {"avg_yearly": pa.array([round(total / 7.0, 2)], pa.float64())}
    )


def sole_late_supplier(sf_dir: str, days: int = 90, limit: int = 10):
    """TPC-H Q21 analog (adapted: no commit/receipt dates in this schema —
    'late' means shipped > ``days`` after the order date): suppliers who
    were the ONLY late supplier on a multi-supplier order. Shape: one
    orderkey shuffle join (lineitem x orders), then a composite-key
    (order, supplier) exchange collapsing to per-order counters where
    sum(suppkey*late) IS the sole late supplier's key when exactly one
    supplier was late — no per-order group UDF, everything stays in Sum/
    Count aggregates."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Max, Sum

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )
    joined = shuffle_hash_join(line, orders, on="l_orderkey", num_partitions=_nparts(sf_dir))

    SHIFT = 1 << 20  # suppkey < 2^20 by construction of the generator

    def per_pair(batch: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.greater(
                batch.column("l_shipdate"),
                pc.add(
                    batch.column("o_orderdate"),
                    pa.scalar(np.timedelta64(days, "D").astype("timedelta64[us]")),
                ),
            ),
            pa.int64(),
        )
        okey = batch.column("l_orderkey").to_numpy()
        skey = batch.column("l_suppkey").to_numpy()
        t = pa.table(
            {"pair": pa.array(okey * SHIFT + skey, pa.int64()), "late": late}
        )
        g = t.group_by("pair").aggregate([("late", "max")])
        return g.rename_columns(["pair", "late_part"])

    pairs = (
        joined.map_batches(per_pair, batch_format="pyarrow")
        .groupby("pair", num_partitions=_nparts(sf_dir))
        .aggregate(Max("late_part", alias_name="late"))
    )

    def per_order(batch) -> pa.Table:
        pair = batch["pair"].to_numpy() if hasattr(batch["pair"], "to_numpy") else np.asarray(batch["pair"])
        late = batch["late"].to_numpy() if hasattr(batch["late"], "to_numpy") else np.asarray(batch["late"])
        okey = pair // SHIFT
        skey = pair - okey * SHIFT
        return pa.table(
            {
                "okey": pa.array(okey, pa.int64()),
                "one": pa.array(np.ones(len(okey), np.int64), pa.int64()),
                "late": pa.array(late.astype(np.int64), pa.int64()),
                "skl": pa.array(skey * late.astype(np.int64), pa.int64()),
            }
        )

    po = (
        pairs.map_batches(per_order, batch_format="pyarrow")
        .groupby("okey", num_partitions=_nparts(sf_dir))
        .aggregate(
            Sum("one", alias_name="n_supp"),
            Sum("late", alias_name="n_late"),
            Sum("skl", alias_name="late_key"),
        )
    )

    def winners(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("n_supp"), pa.scalar(2, pa.int64())),
            pc.equal(batch.column("n_late"), pa.scalar(1, pa.int64())),
        )
        b = batch.filter(keep)
        t = pa.table(
            {"s_suppkey": b.column("late_key"),
             "w": pa.array(np.ones(b.num_rows, np.int64), pa.int64())}
        )
        g = t.group_by("s_suppkey").aggregate([("w", "sum")])
        return g.rename_columns(["s_suppkey", "w_part"])

    agg = (
        po.map_batches(winners, batch_format="pyarrow")
        .groupby("s_suppkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("w_part", alias_name="numwait"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    names = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_name").to_pylist()))
    sk = tbl.column("s_suppkey").to_numpy().astype(np.int64)
    nw = tbl.column("numwait").to_numpy().astype(np.int64)
    order = np.lexsort((sk, -nw))[:limit]
    return pa.table(
        {
            "s_suppkey": pa.array(sk[order], pa.int64()),
            "s_name": pa.array([names[int(k)] for k in sk[order]], pa.string()),
            "numwait": pa.array(nw[order], pa.int64()),
        }
    )


def idle_rich_customers(sf_dir: str, since: str = "2000-01-01"):
    """TPC-H Q22 analog (no phone column — grouped by nation instead):
    customers with above-average positive balance and NO orders since
    ``since``. The global avg is one tiny aggregate; the existence check is
    a custkey-hash shuffle ANTI join over the date-filtered orders (scale
    path: neither side broadcasts); the output is a nation-cardinality
    groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import shuffle_anti_join

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy()
        pos = bal[bal > 0.0]
        return pa.table(
            {"s": pa.array([float(pos.sum())], pa.float64()),
             "n": pa.array([len(pos)], pa.int64())}
        )

    rows = cust.map_batches(bal_partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    avg_bal = (sum(r["s"] for r in rows) / n) if n else 0.0

    rich = cust.filter(expr=f"c_acctbal > {avg_bal!r}")
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
        filter=pc.field("o_orderdate") >= pa.scalar(np.datetime64(since, "us")),
    ).map_batches(
        lambda b: b.select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
    )
    idle = shuffle_anti_join(rich, orders, on="c_custkey", num_partitions=_nparts(sf_dir))

    def nat_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_nationkey").aggregate(
            [("c_acctbal", "sum"), ("c_acctbal", "count")]
        )
        return g.rename_columns(["c_nationkey", "bal_part", "n_part"])

    agg = (
        idle.map_batches(nat_partial, batch_format="pyarrow")
        .groupby("c_nationkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("bal_part", alias_name="totacctbal"),
                   Sum("n_part", alias_name="numcust"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.sort_by("c_nationkey")
    return pa.table(
        {
            "c_nationkey": pc.cast(tbl.column("c_nationkey"), pa.int64()),
            "numcust": pc.cast(tbl.column("numcust"), pa.int64()),
            "totacctbal": pa.array(
                np.round(tbl.column("totacctbal").to_numpy(), 2), pa.float64()
            ),
        }
    )


def search_snippets(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10,
                    width: int = 3):
    """Highlighted snippets for ranked search (the Lucene highlighter
    analog, completing phrase_snippets for the OR path): BM25 top-k through
    the real engine, then ONE predicate-pushed read of just the hit rows
    (is_in on doc_id — hits-sized, never a corpus scan) and a ±``width``
    token window around the first occurrence of any query term. The window
    is cut on the tokenized stream, so the SQL twin reproduces it exactly
    with list_position + 1-based inclusive list slicing."""
    import ray.data

    hits = bm25_topk(sf_dir, terms, limit)
    if hits.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64()),
             "snippet": pa.array([], pa.string())}
        )
    id_arr = hits.column("doc_id").combine_chunks()
    docs = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(id_arr),
        )
        .take_all()
    )  # hits-sized (<= limit rows) by construction
    text_of = {int(r["doc_id"]): r["text"] for r in docs}
    term_set = set(terms)
    snippets = []
    for d in hits.column("doc_id").to_pylist():
        toks = tokenize(text_of[int(d)])
        p0 = next((i for i, t in enumerate(toks) if t in term_set), 0)
        snippets.append(" ".join(toks[max(0, p0 - width): p0 + width + 1]))
    return pa.table(
        {"doc_id": hits.column("doc_id"),
         "score": hits.column("score"),
         "snippet": pa.array(snippets, pa.string())}
    )


def eql_sequence_pairs(
    sf_dir: str, first: str = "click", then: str = "purchase",
    maxspan_s: int = 14_400,
):
    """EQL ``sequence by user_id with maxspan`` (the Elastic Event Query
    Language join): per user, the EARLIEST ``first`` event that is
    followed by a ``then`` event within ``maxspan``, and that follower's
    earliest timestamp. All-integer microsecond arithmetic (no float
    boundary). Same distributed shape as funnel_counts: predicate-pushed
    read of just the two event types, user-bucket shuffle (a user's
    history lands in one group), then one vectorized composite-key
    searchsorted per bucket — no per-user Python."""
    import ray.data

    from clip_as_service_ray.stages.windows import _scaled_buckets

    num_buckets, num_partitions = _scaled_buckets(None)
    span_us = np.int64(maxspan_s) * 1_000_000

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(pa.array([first, then])),
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        return pa.table(
            {"_bucket": pa.array(u % num_buckets, pa.int64()),
             "user_id": batch.column("user_id"),
             "t": batch.column("ts").cast(pa.int64()),
             "is_first": pc.equal(batch.column("event_type"), first)}
        )

    def seq_group(g: pa.Table) -> pa.Table:
        isf = g.column("is_first").to_numpy(zero_copy_only=False)
        u = g.column("user_id").to_numpy().astype(np.int64)
        t = g.column("t").to_numpy().astype(np.int64)
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "t1": pa.array([], pa.int64()),
             "t2": pa.array([], pa.int64())}
        )
        cu, ct = u[isf], t[isf]
        pu, pt = u[~isf], t[~isf]
        if not len(cu) or not len(pu):
            return empty
        # composite keys use GROUP-RELATIVE microseconds: raw epoch-us is
        # ~2^51 and user_id*BIG + t would overflow int64 (the serial_diff
        # lesson); the fixture spans ~30 days so rel-us < 2^42
        tmin = np.int64(t.min())
        BIG = np.int64(1) << 42
        c_key = cu * BIG + (ct - tmin)
        p_key = pu * BIG + (pt - tmin)
        co = np.argsort(c_key, kind="stable")
        po = np.argsort(p_key, kind="stable")
        cu, ct, c_key = cu[co], ct[co], c_key[co]
        pu, pt, p_key = pu[po], pt[po], p_key[po]
        # follower = first p event with key > (user, t1): strictly after
        idx = np.searchsorted(p_key, c_key, side="right")
        ok = idx < len(p_key)
        idx_c = np.minimum(idx, len(p_key) - 1)
        ok &= (pu[idx_c] == cu) & (pt[idx_c] - ct <= span_us) & (pt[idx_c] > ct)
        # earliest qualifying first-event per user: clicks sorted (user, t)
        # -> first ok row in each user run
        if not ok.any():
            return empty
        cu_ok, ct_ok, t2_ok = cu[ok], ct[ok], pt[idx_c[ok]]
        firsts = np.concatenate([[0], np.nonzero(np.diff(cu_ok))[0] + 1])
        return pa.table(
            {"user_id": pa.array(cu_ok[firsts], pa.int64()),
             "t1": pa.array(ct_ok[firsts], pa.int64()),
             "t2": pa.array(t2_ok[firsts], pa.int64())}
        )

    out = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(seq_group, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
    )
    return pa.table(
        {"user_id": pa.array(out.user_id.to_numpy().astype(np.int64), pa.int64()),
         "t1": pa.array(out.t1.to_numpy().astype(np.int64), pa.int64()),
         "t2": pa.array(out.t2.to_numpy().astype(np.int64), pa.int64())}
    )


def funnel_counts(sf_dir: str, steps=("view", "click", "purchase")):
    """Ordered funnel analysis (the product-analytics staple): how many
    users completed step 1, then step 2 STRICTLY AFTER their first step 1,
    then step 3 strictly after that, each time taking the user's EARLIEST
    qualifying event. Same distributed shape as sessionize: predicate-pushed
    read of just the step events, salted-bucket shuffle on user_id (a user's
    history lands in one group), then ONE vectorized lexsort + per-step
    first-qualifying scan per bucket — the cascade loop runs len(steps)
    times over numpy arrays, never per user. Per-bucket step counts are
    additive partials (each user lives in exactly one bucket)."""
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.windows import _scaled_buckets

    num_buckets, num_partitions = _scaled_buckets(None)
    step_of = {s: i for i, s in enumerate(steps)}
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(pa.array(list(steps))),
    )

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column("user_id").to_numpy().astype(np.int64)
        s = np.fromiter(
            (step_of[t] for t in batch.column("event_type").to_pylist()),
            np.int8, batch.num_rows,
        )
        return pa.table(
            {
                "_bucket": pa.array(k % num_buckets, pa.int64()),
                "user_id": pa.array(k, pa.int64()),
                "_ts": batch.column("ts").cast(pa.int64()),
                "_step": pa.array(s, pa.int8()),
            }
        )

    n_steps = len(steps)

    def cascade(group: pa.Table) -> pa.Table:
        k = group.column("user_id").to_numpy()
        t = group.column("_ts").to_numpy()
        s = group.column("_step").to_numpy()
        counts = np.zeros(n_steps, np.int64)
        if len(k):
            order = np.lexsort((t, k))
            ks, ts_, ss = k[order], t[order], s[order]
            users = np.unique(ks)
            cur = np.full(len(users), np.iinfo(np.int64).min, np.int64)
            alive = np.ones(len(users), bool)
            uidx_all = np.searchsorted(users, ks)
            for i in range(n_steps):
                rows = np.nonzero(ss == i)[0]
                u = uidx_all[rows]
                valid = alive[u] & (ts_[rows] > cur[u])
                vu = u[valid]
                # rows are (user, ts)-sorted: first valid row per user IS
                # the user's earliest qualifying event for this step
                uu, first = np.unique(vu, return_index=True)
                nxt = np.zeros(len(users), bool)
                nxt[uu] = True
                cur[uu] = ts_[rows[valid][first]]
                alive &= nxt
                counts[i] = int(alive.sum())
        return pa.table(
            {
                "step_idx": pa.array(np.arange(n_steps, dtype=np.int64), pa.int64()),
                "step": pa.array(list(steps), pa.string()),
                "n_part": pa.array(counts, pa.int64()),
            }
        )

    agg = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(cascade, batch_format="pyarrow")
        .groupby("step_idx", num_partitions=1)
        .aggregate(Sum("n_part", alias_name="n_users"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.sort_by("step_idx")
    return pa.table(
        {
            "step_idx": pc.cast(tbl.column("step_idx"), pa.int64()),
            "step": pa.array(list(steps), pa.string()),
            "n_users": pc.cast(tbl.column("n_users"), pa.int64()),
        }
    )


def collocations(sf_dir: str, k: int = 20, min_count: int = 5):
    """PMI-ranked collocations (Church & Hanks 1990): for adjacent token
    pairs with n_ab >= ``min_count``, pmi = ln(p(ab) / (p(a) p(b))) with
    p(ab) over the bigram total and p(a) over the unigram total. Three
    pre-aggregated count passes share the distributed shape of
    bigram_counts (per-batch combiners -> tiny groupby); the PMI math runs
    on the driver over the top-candidate table (vocabulary-sized, ~31 terms
    here, bounded by min_count at scale). The SQL twin computes the SAME
    float expression left-to-right, so round(...,6) hashes identically."""
    from ray.data.aggregate import Sum

    def bg_partial(batch: pa.Table) -> pa.Table:
        _left, grams, _nb = _flat_bigrams(batch.column("text"))
        if len(grams) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64())}
            )
        vc = grams.value_counts()
        return pa.table(
            {"bigram": vc.field("values").cast(pa.string()),
             "n_part": vc.field("counts").cast(pa.int64())}
        )

    bg = pa.Table.from_pandas(
        _documents(sf_dir)
        .map_batches(bg_partial, batch_format="pyarrow")
        .groupby("bigram", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n_ab"))
        .to_pandas(),
        preserve_index=False,
    )

    def ug_partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        g = t.group_by("term").aggregate([("tf", "sum")])
        return g.rename_columns(["term", "n_part"])

    ug = pa.Table.from_pandas(
        _documents(sf_dir)
        .map_batches(ug_partial, batch_format="pyarrow")
        .groupby("term", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="c"))
        .to_pandas(),
        preserve_index=False,
    )
    n_bi = float(np.sum(bg.column("n_ab").to_numpy()))
    n_uni = float(np.sum(ug.column("c").to_numpy()))
    cmap = dict(zip(ug.column("term").to_pylist(),
                    ug.column("c").to_numpy().astype(np.float64).tolist()))

    keep = pc.greater_equal(bg.column("n_ab"), pa.scalar(min_count, pa.int64()))
    bg = bg.filter(keep)
    grams = bg.column("bigram").to_pylist()
    n_ab = bg.column("n_ab").to_numpy().astype(np.float64)
    pmi = np.empty(len(grams), np.float64)
    for i, g in enumerate(grams):
        a, b = g.split(" ", 1)
        # EXACT expression order mirrored in the SQL twin
        pmi[i] = np.log((n_ab[i] / n_bi) / ((cmap[a] / n_uni) * (cmap[b] / n_uni)))
    pmi = np.round(pmi, 6)
    order = np.lexsort((np.asarray(grams, dtype=object), -pmi))[:k]
    return pa.table(
        {
            "bigram": pa.array([grams[i] for i in order], pa.string()),
            "n_ab": pa.array(n_ab[order].astype(np.int64), pa.int64()),
            "pmi": pa.array(pmi[order], pa.float64()),
        }
    )


def lineitem_correlations(
    sf_dir: str,
    cols=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
):
    """Pearson correlation matrix over lineitem's numeric columns via
    DISTRIBUTED sufficient statistics: each batch contributes one row of
    (n, sum_i, sum_i*j) moments — a fixed O(k^2)-sized partial regardless
    of data volume — and the driver combines + evaluates
    r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)).
    The SQL twin evaluates the SAME expression from the same moments (not
    DuckDB's corr(), whose internal streaming formula differs in float
    ordering), so round(...,6) hashes identically."""
    import ray.data

    k = len(cols)
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]

    def moments(batch: pa.Table) -> pa.Table:
        x = np.stack([batch.column(c).to_numpy() for c in cols])
        out = {"n": pa.array([batch.num_rows], pa.int64())}
        for i in range(k):
            out[f"s{i}"] = pa.array([float(x[i].sum())], pa.float64())
            out[f"s{i}{i}"] = pa.array([float(np.dot(x[i], x[i]))], pa.float64())
        for i, j in pairs:
            out[f"s{i}{j}"] = pa.array([float(np.dot(x[i], x[j]))], pa.float64())
        return pa.table(out)

    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=list(cols)
        )
        .map_batches(moments, batch_format="pyarrow")
        .take_all()
    )
    n = float(sum(r["n"] for r in rows))
    s = {key: sum(r[key] for r in rows) for key in rows[0] if key != "n"}
    out_x, out_y, out_r = [], [], []
    for i, j in pairs:
        num = n * s[f"s{i}{j}"] - s[f"s{i}"] * s[f"s{j}"]
        den = np.sqrt(n * s[f"s{i}{i}"] - s[f"s{i}"] * s[f"s{i}"]) * np.sqrt(
            n * s[f"s{j}{j}"] - s[f"s{j}"] * s[f"s{j}"]
        )
        out_x.append(cols[i])
        out_y.append(cols[j])
        out_r.append(round(float(num / den), 6))
    return pa.table(
        {
            "col_x": pa.array(out_x, pa.string()),
            "col_y": pa.array(out_y, pa.string()),
            "r": pa.array(out_r, pa.float64()),
        }
    )


def user_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics classic): users are
    cohorted by their signup WEEK (integer epoch-week arithmetic — exact on
    both sides), and each (cohort_week, week_offset) cell counts cohort
    members active in that later week. Shape: two pre-aggregated passes
    (per-user signup week; distinct (user, week) activity pairs — both
    per-batch combiners before small groupbys) joined on the user-id hash
    (shuffle join: at scale neither side broadcasts), then a
    cells-cardinality count."""
    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    WEEK_US = 604800 * 1_000_000

    su_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
        filter=pc.field("event_type") == "signup",
    )

    def su_partial(batch: pa.Table) -> pa.Table:
        w = batch.column("ts").cast(pa.int64()).to_numpy() // WEEK_US
        t = pa.table({"user_id": batch.column("user_id"),
                      "w": pa.array(w, pa.int64())})
        g = t.group_by("user_id").aggregate([("w", "min")])
        return g.rename_columns(["user_id", "w_part"])

    signup = (
        su_ds.map_batches(su_partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=_nparts(sf_dir))
        .aggregate(Min("w_part", alias_name="w0"))
    )

    act_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def act_partial(batch: pa.Table) -> pa.Table:
        w = batch.column("ts").cast(pa.int64()).to_numpy() // WEEK_US
        t = pa.table({"user_id": batch.column("user_id"),
                      "w": pa.array(w, pa.int64())})
        # batch-local distinct (user, week): shrinks the shuffle to unique
        # pairs per batch
        return t.group_by(["user_id", "w"]).aggregate([])

    # distinct pairs across batches: one groupby on the composite key
    def pair_key(batch) -> pa.Table:
        u = batch["user_id"].to_numpy() if hasattr(batch["user_id"], "to_numpy") else np.asarray(batch["user_id"])
        w = batch["w"].to_numpy() if hasattr(batch["w"], "to_numpy") else np.asarray(batch["w"])
        return pa.table(
            {"pair": pa.array(u.astype(np.int64) * (1 << 20) + w.astype(np.int64), pa.int64())}
        )

    pairs = (
        act_ds.map_batches(act_partial, batch_format="pyarrow")
        .map_batches(pair_key, batch_format="pyarrow")
        .groupby("pair", num_partitions=_nparts(sf_dir))
        .aggregate(Count(alias_name="_c"))  # distinct pairs; count unused
    )

    def unkey(batch) -> pa.Table:
        p = batch["pair"].to_numpy() if hasattr(batch["pair"], "to_numpy") else np.asarray(batch["pair"])
        return pa.table(
            {"user_id": pa.array(p // (1 << 20), pa.int64()),
             "w": pa.array(p - (p // (1 << 20)) * (1 << 20), pa.int64())}
        )

    from clip_as_service_ray.stages.joins import shuffle_hash_join

    act = pairs.map_batches(unkey, batch_format="pyarrow")
    joined = shuffle_hash_join(act, signup, on="user_id", num_partitions=_nparts(sf_dir))

    def cell_partial(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy()
        w0 = batch.column("w0").to_numpy()
        keep = w >= w0
        t = pa.table(
            {"cohort_week": pa.array(w0[keep], pa.int64()),
             "week_offset": pa.array((w - w0)[keep], pa.int64()),
             "one": pa.array(np.ones(int(keep.sum()), np.int64), pa.int64())}
        )
        g = t.group_by(["cohort_week", "week_offset"]).aggregate([("one", "sum")])
        return g.rename_columns(["cohort_week", "week_offset", "n_part"])

    def cell_key(batch) -> pa.Table:
        c = batch["cohort_week"].to_numpy() if hasattr(batch["cohort_week"], "to_numpy") else np.asarray(batch["cohort_week"])
        o = batch["week_offset"].to_numpy() if hasattr(batch["week_offset"], "to_numpy") else np.asarray(batch["week_offset"])
        n = batch["n_part"].to_numpy() if hasattr(batch["n_part"], "to_numpy") else np.asarray(batch["n_part"])
        return pa.table(
            {"cell": pa.array(c.astype(np.int64) * (1 << 20) + o.astype(np.int64), pa.int64()),
             "n_part": pa.array(n.astype(np.int64), pa.int64())}
        )

    agg = (
        joined.map_batches(cell_partial, batch_format="pyarrow")
        .map_batches(cell_key, batch_format="pyarrow")
        .groupby("cell", num_partitions=1)
        .aggregate(Sum("n_part", alias_name="n_users"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    cell = tbl.column("cell").to_numpy().astype(np.int64)
    cohort = cell // (1 << 20)
    off = cell - cohort * (1 << 20)
    n = tbl.column("n_users").to_numpy().astype(np.int64)
    order = np.lexsort((off, cohort))
    return pa.table(
        {"cohort_week": pa.array(cohort[order], pa.int64()),
         "week_offset": pa.array(off[order], pa.int64()),
         "n_users": pa.array(n[order], pa.int64())}
    )


def customer_rfm(sf_dir: str, n_tiles: int = 5):
    """RFM segmentation (recency / frequency / monetary, the classic CRM
    scoring): per-customer order aggregates (one custkey groupby with
    per-batch combiners), then THREE distributed NTILE passes through
    stages/rank.py's sort + block-offset machinery — ties broken by
    (metric, custkey) so both engines bucket identically (SQL leaves NTILE
    ties unspecified). Scores are 1..n ascending in the metric; the three
    customers-sized score tables meet in driver dict joins — legitimate
    because the RESULT is |customers| rows by definition (the operator
    returns that table); a 10^9-customer deployment would keep the final
    assembly as a shuffle join + write_parquet instead of materializing."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    from clip_as_service_ray.stages.rank import ntile_by_key

    DAY_US = 86400 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("o_orderdate").cast(pa.int64()).to_numpy() // DAY_US
        t = pa.table(
            {"c_custkey": batch.column("o_custkey"),
             "day": pa.array(day, pa.int64()),
             "price": batch.column("o_totalprice"),
             "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64())}
        )
        g = t.group_by("c_custkey").aggregate(
            [("day", "max"), ("one", "sum"), ("price", "sum")]
        )
        return g.rename_columns(["c_custkey", "day_p", "n_p", "m_p"])

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey", num_partitions=_nparts(sf_dir))
        .aggregate(
            Max("day_p", alias_name="recency_day"),
            Sum("n_p", alias_name="frequency"),
            Sum("m_p", alias_name="monetary_raw"),
        )
    )
    base = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    monetary = np.round(base.column("monetary_raw").to_numpy(), 2)
    base = pa.table(
        {
            "c_custkey": pc.cast(base.column("c_custkey"), pa.int64()),
            "recency_day": pc.cast(base.column("recency_day"), pa.int64()),
            "frequency": pc.cast(base.column("frequency"), pa.int64()),
            "monetary": pa.array(monetary, pa.float64()),
            "_k": pa.array(np.zeros(base.num_rows, np.int64), pa.int64()),
        }
    )
    scores: dict[str, dict[int, int]] = {}
    for metric, name in (
        ("recency_day", "r_score"), ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        out = pa.Table.from_pandas(
            ntile_by_key(
                ray.data.from_arrow(base.select(["_k", metric, "c_custkey"])),
                key="_k", value=metric, id_col="c_custkey", n_tiles=n_tiles,
                sort_cols=["_k", metric, "c_custkey"],
            ).to_pandas(),
            preserve_index=False,
        )
        scores[name] = dict(
            zip(out.column("c_custkey").to_pylist(),
                out.column("tile").to_pylist())
        )
    keys = base.column("c_custkey").to_pylist()
    tbl = base.drop(["_k"])
    for name in ("r_score", "f_score", "m_score"):
        tbl = tbl.append_column(
            name, pa.array([int(scores[name][k]) for k in keys], pa.int64())
        )
    return tbl.sort_by("c_custkey")


def bm25_topk_plus(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10,
                   delta: float = 1.0):
    """BM25+ top-k (Lv & Zhai, CIKM 2011) — the alternate scoring model
    behind the same index artifact: contribution = idf * (tf_norm + delta),
    so a matched term always adds at least idf*delta (fixes BM25's
    over-penalty of very long documents). Same pool, same pruning (the
    term upper bound carries the delta), query-time strategy dispatch."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, delta=delta)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def events_t_test(sf_dir: str, type_a: str = "click", type_b: str = "purchase"):
    """ES ``t_test`` aggregation (Welch's unequal-variance two-sample
    t-test) between the values of two event types: one distributed
    moment-partials pass (n, sum, sum-of-squares per type — the same
    combiner shape as event_value_outliers), then the explicit Welch
    formula on the driver. The SQL twin evaluates the IDENTICAL expression
    chain from the same three sums, so t and the Welch-Satterthwaite df
    match to the 6-dp round."""
    import ray.data
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("event_type"), value_set=pa.array([type_a, type_b])
        )
        b = batch.filter(mask)
        t = pa.table(
            {"event_type": b.column("event_type"),
             "v": b.column("value"),
             "v2": pc.multiply(b.column("value"), b.column("value")),
             "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64())}
        )
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("v", "sum"), ("v2", "sum")]
        )
        return g.rename_columns(["event_type", "n_p", "s_p", "s2_p"])

    mom = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_p", alias_name="n"), Sum("s_p", alias_name="s"),
                   Sum("s2_p", alias_name="s2"))
        .to_pandas()
    )
    rows = {r.event_type: r for r in mom.itertuples()}
    ra, rb = rows[type_a], rows[type_b]
    na, nb = float(ra.n), float(rb.n)
    ma, mb = ra.s / na, rb.s / nb
    va = (ra.s2 - ra.s * ra.s / na) / (na - 1.0)
    vb = (rb.s2 - rb.s * rb.s / nb) / (nb - 1.0)
    sea, seb = va / na, vb / nb
    t_stat = (ma - mb) / np.sqrt(sea + seb)
    df = (sea + seb) * (sea + seb) / (
        sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)
    )
    return pa.table(
        {
            "type_a": pa.array([type_a], pa.string()),
            "type_b": pa.array([type_b], pa.string()),
            "mean_a": pa.array([round(float(ma), 6)], pa.float64()),
            "mean_b": pa.array([round(float(mb), 6)], pa.float64()),
            "t_stat": pa.array([round(float(t_stat), 6)], pa.float64()),
            "welch_df": pa.array([round(float(df), 6)], pa.float64()),
        }
    )


def event_value_percentile_ranks(
    sf_dir: str, thresholds: tuple[float, ...] = (50.0, 100.0, 200.0)
):
    """ES ``percentile_ranks`` aggregation per event_type: for each
    threshold x, the percentage of values <= x. Exact (count-based, the
    inverse-CDF-at-a-point contract): integer counts merge exactly across
    batches and the final 100*c/n is a single division on both engines.
    One distributed pass of per-type (n, c_1..c_k) partials."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"event_type": batch.column("event_type")}
        v = batch.column("value")
        cols["n_p"] = pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        for i, x in enumerate(thresholds):
            cols[f"c{i}_p"] = pc.cast(
                pc.less_equal(v, pa.scalar(float(x))), pa.int64()
            )
        t = pa.table(cols)
        g = t.group_by("event_type").aggregate(
            [("n_p", "sum")] + [(f"c{i}_p", "sum") for i in range(len(thresholds))]
        )
        return g.rename_columns(
            ["event_type", "n_p"] + [f"c{i}_p" for i in range(len(thresholds))]
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .aggregate(
            Sum("n_p", alias_name="n"),
            *[Sum(f"c{i}_p", alias_name=f"c{i}") for i in range(len(thresholds))],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    out = {"event_type": pa.array(agg["event_type"].tolist(), pa.string())}
    n = agg["n"].to_numpy().astype(np.float64)
    for i, x in enumerate(thresholds):
        c = agg[f"c{i}"].to_numpy().astype(np.float64)
        out[f"rank_{int(x)}"] = pa.array(
            np.round(100.0 * c / n, 6), pa.float64()
        )
    return pa.table(out)


def events_daily_derivative(sf_dir: str):
    """ES ``derivative`` pipeline aggregation over a daily date_histogram:
    per-day event counts (distributed per-batch partials, exact integers)
    with deriv = cnt - lag(cnt) ordered by day; the first bucket has no
    parent value and is NULL (the ES contract). The derivative runs on the
    bucket-sized result — never on raw rows."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        b = (e // DAY_US) * DAY_US
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False)["n"].sum().sort_values("b")
    cnt = agg["n"].to_numpy().astype(np.int64)
    deriv = [None] + (cnt[1:] - cnt[:-1]).tolist()
    return pa.table(
        {
            "day": pa.array(
                agg["b"].to_numpy().astype(np.int64), pa.timestamp("us")
            ),
            "cnt": pa.array(cnt, pa.int64()),
            "deriv": pa.array(deriv, pa.int64()),
        }
    )


def events_auto_date_histogram(sf_dir: str, target_buckets: int = 20):
    """ES ``auto_date_histogram``: pick the coarsest calendar-ish interval
    from a fixed ladder (minute, hour, day, week, 30-day month) such that
    the bucket-aligned bucket count ``mx//i - mn//i + 1`` stays within
    ``target_buckets``, then histogram on ``(epoch_us // i) * i``. Every
    step is exact int64 arithmetic, so engine and SQL pick the SAME
    interval and the SAME buckets. Pass 1 = distributed min/max partials;
    pass 2 = per-batch bucket partial counts (<= target+1 rows per batch)."""
    import ray.data

    LADDER_US = (
        60_000_000,
        3_600_000_000,
        86_400_000_000,
        604_800_000_000,
        2_592_000_000_000,
    )

    def minmax(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table(
            {"mn": pa.array([int(e.min())], pa.int64()),
             "mx": pa.array([int(e.max())], pa.int64())}
        )

    ev_path = os.path.join(sf_dir, "events.parquet")
    mm = (
        ray.data.read_parquet(ev_path, columns=["ts"])
        .map_batches(minmax, batch_format="pyarrow")
        .to_pandas()
    )
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())
    ivl = LADDER_US[-1]
    for i in LADDER_US:
        if mx // i - mn // i + 1 <= target_buckets:
            ivl = i
            break

    def buckets(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        b = (e // ivl) * ivl
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(ev_path, columns=["ts"])
        .map_batches(buckets, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False)["n"].sum().sort_values("b")
    return pa.table(
        {
            "bucket": pa.array(
                agg["b"].to_numpy().astype(np.int64), pa.timestamp("us")
            ),
            "cnt": pa.array(agg["n"].astype("int64").tolist(), pa.int64()),
            "interval_s": pa.array(
                [ivl // 1_000_000] * len(agg), pa.int64()
            ),
        }
    )


def event_value_outliers(sf_dir: str, z: float = 3.0):
    """Z-score outlier detection per event type (the monitoring staple):
    pass 1 collects per-type moment partials (n, sum, sum-of-squares —
    type-cardinality rows per batch), the driver evaluates mean/std with
    the explicit population formula, and pass 2 broadcasts the tiny
    (type -> mean, std) map and keeps |v - mean| > z * std rows. Both
    engines evaluate the SAME expressions from the same moments, so the
    flagged SET matches exactly (boundary floats land identically)."""
    import ray
    import ray.data

    def moments(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"event_type": batch.column("event_type"),
             "v": batch.column("value"),
             "v2": pc.multiply(batch.column("value"), batch.column("value")),
             "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64())}
        )
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("v", "sum"), ("v2", "sum")]
        )
        return g.rename_columns(["event_type", "n_p", "s_p", "s2_p"])

    from ray.data.aggregate import Sum

    ev_path = os.path.join(sf_dir, "events.parquet")
    mom = pa.Table.from_pandas(
        ray.data.read_parquet(ev_path, columns=["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_p", alias_name="n"),
                   Sum("s_p", alias_name="s"),
                   Sum("s2_p", alias_name="s2"))
        .to_pandas(),
        preserve_index=False,
    )
    stats = {}
    for r in mom.to_pylist():
        n = float(r["n"])
        mean = r["s"] / n
        std = np.sqrt(r["s2"] / n - mean * mean)
        stats[r["event_type"]] = (mean, float(std))
    stats_ref = ray.put(stats)

    def flag(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        types = batch.column("event_type").to_pylist()
        v = batch.column("value").to_numpy()
        mean = np.fromiter((st[t][0] for t in types), np.float64, len(types))
        std = np.fromiter((st[t][1] for t in types), np.float64, len(types))
        keep = np.abs(v - mean) > z * std
        b = batch.filter(pa.array(keep))
        zs = (b.column("value").to_numpy()
              - np.fromiter((st[t][0] for t in b.column("event_type").to_pylist()),
                            np.float64, b.num_rows)) / np.fromiter(
            (st[t][1] for t in b.column("event_type").to_pylist()),
            np.float64, b.num_rows)
        return pa.table(
            {"event_id": b.column("event_id"),
             "event_type": b.column("event_type"),
             "value": b.column("value"),
             "z": pa.array(np.round(zs, 6), pa.float64())}
        )

    out = pa.Table.from_pandas(
        ray.data.read_parquet(ev_path, columns=["event_id", "event_type", "value"])
        .map_batches(flag, batch_format="pyarrow")
        .to_pandas(),
        preserve_index=False,
    )
    return out.sort_by("event_id") if out.num_rows else pa.table(
        {"event_id": pa.array([], pa.int64()),
         "event_type": pa.array([], pa.string()),
         "value": pa.array([], pa.float64()),
         "z": pa.array([], pa.float64())}
    )


def bm25_topk_plus_segmented(sf_dir: str, terms=BM25_QUERY_TERMS,
                             limit: int = 10, delta: float = 1.0):
    """BM25+ through the incremental-segment scatter path: the per-segment
    scorer pools carry the delta, union stats stay global — segmented
    BM25+ == one-shot BM25+ over the union corpus (same SQL twin as
    bm25_topk_plus)."""
    from clip_as_service_ray.pipelines.segments import (
        SegmentedQueryService,
        add_segment,
        segment_dirs,
    )

    cfg = EngineConfig(num_index_partitions=4)
    root = _index_dir_for(sf_dir) + "_segmented"
    if len(segment_dirs(root)) < 2:
        add_segment(root, _docs_as_transcripts(sf_dir, parity=0), cfg)
        add_segment(root, _docs_as_transcripts(sf_dir, parity=1), cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    svc = SegmentedQueryService(root, cfg, delta=delta)
    try:
        hits = svc.search(queries)
    finally:
        svc.shutdown()
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


PERCOLATE_QUERIES = {
    # name -> (terms, conjunctive): the registered-query registry
    "merge_window_and": (("merge", "window"), True),
    "hash_or_sort": (("hash", "sort"), False),
    "stream_and": (("stream",), True),
}


def percolate_documents(sf_dir: str, queries=None):
    """Percolation (reverse search, the Elasticsearch `percolate` analog):
    a REGISTERED query set is matched against every incoming document in
    one streaming pass — the shape of alert routing / saved-search
    notification at ingest. Per batch: one flat-token pass to per-doc
    DISTINCT terms, then a vectorized membership count per registered
    query (the registry is tiny and iterated per query; each iteration is
    pure Arrow/numpy over the whole batch). AND queries need their full
    term count, OR queries any hit. No shuffle: a doc's tokens are
    row-local, so matching is batch-local and the output streams."""
    if queries is None:
        queries = PERCOLATE_QUERIES

    def match(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "query_name": pa.array([], pa.string())}
        )
        t = _tokens_flat(batch)  # (doc_id, term, tf): term DISTINCT per doc
        if t.num_rows == 0:
            return empty
        docs = t.column("doc_id").to_numpy()
        udocs = np.unique(docs)
        dpos = np.searchsorted(udocs, docs)
        out_docs: list[np.ndarray] = []
        out_names: list[str] = []
        for name in sorted(queries):
            terms, conj = queries[name]
            inq = pc.is_in(
                t.column("term"), value_set=pa.array(sorted(terms), pa.string())
            ).to_numpy(zero_copy_only=False)
            n_match = np.bincount(dpos[inq], minlength=len(udocs))
            need = len(terms) if conj else 1
            sel = udocs[n_match >= need]
            if len(sel):
                out_docs.append(sel)
                out_names.extend([name] * len(sel))
        if not out_docs:
            return empty
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out_docs), pa.int64()),
             "query_name": pa.array(out_names, pa.string())}
        )

    tbl = pa.Table.from_pandas(
        _documents(sf_dir).map_batches(match, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    if tbl.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "query_name": pa.array([], pa.string())}
        )
    return pa.table(
        {"doc_id": pc.cast(tbl.column("doc_id"), pa.int64()),
         "query_name": pc.cast(tbl.column("query_name"), pa.string())}
    ).sort_by([("doc_id", "ascending"), ("query_name", "ascending")])


def duplicate_passages(sf_dir: str, n: int = 8, min_docs: int = 2, k: int = 20):
    """Corpus-internal repeated-passage detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    n-token shingle that appears in >= ``min_docs`` DISTINCT documents,
    ranked by document count. Per batch: vectorized shingling
    (_flat_ngrams), per-doc DISTINCT shingles via one Arrow group_by (a
    doc's shingles are row-local, so the distinct is exact in-batch), then
    one shingle-keyed groupby sums doc counts — the shuffle carries one row
    per distinct (doc, shingle), the standard cost of exact passage dedup;
    the scale lever is a first hash pass that keeps only shingles whose
    count sketch says >= min_docs (the documented pre-filter), not a
    different algorithm."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        grams, row, _n_rows = _flat_ngrams(batch.column("text"), n)
        if len(grams) == 0:
            return pa.table(
                {"passage": pa.array([], pa.string()),
                 "nd_part": pa.array([], pa.int64())}
            )
        t = pa.table({"passage": grams, "row": pa.array(row, pa.int64())})
        dt = t.group_by(["passage", "row"]).aggregate([])  # per-doc distinct
        g = dt.group_by("passage").aggregate([("row", "count")])
        return g.rename_columns(["passage", "nd_part"])

    agg = (
        _documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("passage", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("nd_part", alias_name="n_docs"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.filter(pc.greater_equal(tbl.column("n_docs"), pa.scalar(min_docs)))
    p = np.asarray(tbl.column("passage").to_pylist(), dtype=object)
    c = tbl.column("n_docs").to_numpy().astype(np.int64)
    order = np.lexsort((p, -c))[:k]
    return pa.table(
        {"passage": pa.array(p[order].tolist(), pa.string()),
         "n_docs": pa.array(c[order], pa.int64())}
    )


def part_copurchase_bfs(sf_dir: str, max_hops: int = 3):
    """Multi-hop graph traversal (shortest paths / BFS — the recursive-CTE
    workload) over the co-purchase graph: parts are adjacent when they
    share an order; distances from the smallest partkey, capped at
    ``max_hops``. Distributed shape: the edge list materializes ONCE via
    the same orderkey-bucket expansion as parts_bought_together (both
    directions); each hop is one broadcast-frontier pass over the edge
    Dataset (``pc.is_in`` on src, project dst) — the frontier/visited sets
    are node-dimension-bounded (parts ≪ lineitems), which is the standard
    BFS-on-Pregel memory assumption. SQL twin: WITH RECURSIVE + min(dist)."""
    import ray
    import ray.data

    SHIFT = 1 << 20
    num_buckets = 64

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        return pa.table(
            {"_bucket": pa.array((o % num_buckets), pa.int64()),
             "op": pa.array(o * SHIFT + p, pa.int64())}
        )

    def edges_of(group: pa.Table) -> pa.Table:
        op = np.unique(group.column("op").to_numpy())
        okey = op // SHIFT
        part = op - okey * SHIFT
        n = len(op)
        if n == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        seg_start = np.concatenate([[0], np.nonzero(np.diff(okey))[0] + 1])
        seg_end = np.concatenate([seg_start[1:], [n]])
        seg_of = np.repeat(np.arange(len(seg_start)), seg_end - seg_start)
        partners = seg_end[seg_of] - np.arange(n) - 1
        total = int(partners.sum())
        a_idx = np.repeat(np.arange(n), partners)
        csum = np.concatenate([[0], np.cumsum(partners)])
        off = np.arange(total) - np.repeat(csum[:-1], partners) + 1
        b_idx = a_idx + off
        # both directions, deduped per bucket
        key = np.unique(np.concatenate(
            [part[a_idx] * SHIFT + part[b_idx],
             part[b_idx] * SHIFT + part[a_idx]]
        ))
        return pa.table(
            {"src": pa.array(key // SHIFT, pa.int64()),
             "dst": pa.array(key % SHIFT, pa.int64())}
        )

    edges = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(edges_of, batch_format="pyarrow")
        .materialize()  # traversed once per hop
    )
    seed = int(edges.min("src"))
    dist: dict[int, int] = {seed: 0}
    frontier = np.array([seed], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        fr_ref = ray.put(pa.array(frontier, pa.int64()))

        def step(batch: pa.Table) -> pa.Table:
            fr = ray.get(fr_ref)
            hit = batch.filter(pc.is_in(batch.column("src"), value_set=fr))
            d = np.unique(hit.column("dst").to_numpy())
            return pa.table({"dst": pa.array(d, pa.int64())})

        reached = np.unique(
            pa.Table.from_pandas(
                edges.map_batches(step, batch_format="pyarrow").to_pandas(),
                preserve_index=False,
            ).column("dst").to_numpy()
        )
        new = np.array([d for d in reached if d not in dist], dtype=np.int64)
        if not len(new):
            break
        for d in new:
            dist[int(d)] = hop
        frontier = new
    nodes = np.array(sorted(dist), dtype=np.int64)
    return pa.table(
        {"partkey": pa.array(nodes, pa.int64()),
         "dist": pa.array([dist[int(n)] for n in nodes], pa.int64())}
    )


def frequent_itemsets(
    sf_dir: str, min_support_frac: float = 0.002, k_per_size: int = 15,
):
    """Frequent itemsets over order baskets (the ES ``frequent_item_sets``
    aggregation / classic Apriori): brand sets per order, itemsets of size
    1-3 with support >= ceil(min_support_frac * n_baskets), top
    ``k_per_size`` per size by (support DESC, itemset ASC).

    Proper two-pass Apriori shape: pass 1 counts singles (and baskets)
    through the same orderkey-bucket shuffle parts_bought_together uses
    (an order's lines land in ONE bucket, so in-bucket dedup == global
    dedup); the L1 survivor set broadcasts; pass 2 expands pairs AND
    triples only over L1 items with the vectorized segment-expansion
    trick (no per-order Python; an order with L frequent brands emits
    C(L,2)+C(L,3) combinations, the inherent output). The item dictionary
    (partkey -> brand code) is a broadcast small side; at web scale the
    item-cardinality reduction (parts -> brands) is exactly why Apriori's
    candidate space stays bounded."""
    import ray
    import ray.data
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    part_t = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    # brand coding via Arrow kernels (no driver Python loop over parts):
    # the distinct-brand list is tiny (TPC-H: 25), only IT round-trips to
    # Python for the sorted deterministic code order
    import pyarrow.compute as pc

    brand_col = part_t.column("p_brand")
    sorted_brands = pa.array(sorted(pc.unique(brand_col).to_pylist()))
    brands = np.asarray(sorted_brands.to_pylist(), dtype=object)
    pcode = pc.index_in(brand_col, value_set=sorted_brands).to_numpy().astype(
        np.int64
    )
    pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
    # partkey -> code as a broadcast SORTED-array map (termmap.py precedent):
    # memory is O(n_parts), not O(max partkey) — a sparse 2B-id catalog no
    # longer allocates a multi-GB dense LUT per worker. (Past broadcast
    # scale, shard it with state/kvmap.py like DSIR's count maps.)
    order = np.argsort(pk, kind="stable")
    pk_ref = ray.put(np.ascontiguousarray(pk[order]))
    code_ref = ray.put(np.ascontiguousarray(pcode[order]))
    NB = 64  # bucket count; brand codes < 64 (6 bits)
    num_buckets = 64

    class DistinctCodes:
        def __init__(self):
            self.pk = ray.get(pk_ref)
            self.code = ray.get(code_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            o = batch.column("l_orderkey").to_numpy().astype(np.int64)
            p = batch.column("l_partkey").to_numpy().astype(np.int64)
            ix = np.searchsorted(self.pk, p)
            ix_ok = (ix < len(self.pk))
            if not ix_ok.all() or not (self.pk[ix[ix_ok]] == p[ix_ok]).all():
                raise KeyError(
                    "lineitem references partkeys absent from part "
                    "(dict-miss raises rather than mis-coding)"
                )
            key = np.unique(o * NB + self.code[ix])
            ok = key // NB
            return pa.table(
                {"_bucket": pa.array((ok % num_buckets), pa.int64()),
                 "oc": pa.array(key, pa.int64())}
            )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    dcodes = li.map_batches(DistinctCodes, batch_format="pyarrow",
                            concurrency=2)

    # ---- pass 1: basket count + single supports (Apriori L1)
    def singles(group: pa.Table) -> pa.Table:
        oc = np.unique(group.column("oc").to_numpy())
        codes = oc % NB
        c = np.bincount(codes, minlength=len(brands)).astype(np.int64)
        n_baskets = len(np.unique(oc // NB))
        return pa.table(
            {"code": pa.array(
                np.concatenate([np.arange(len(brands)), [-1]]), pa.int64()
             ),
             "n_part": pa.array(np.concatenate([c, [n_baskets]]), pa.int64())}
        )

    s_agg = (
        dcodes.groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(singles, batch_format="pyarrow")
        .groupby("code", num_partitions=2)
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    n_baskets = int(s_agg[s_agg.code == -1].n.iloc[0])
    minsup = int(np.ceil(min_support_frac * n_baskets))
    s1 = s_agg[s_agg.code >= 0]
    l1_counts = np.zeros(len(brands), dtype=np.int64)
    l1_counts[s1.code.to_numpy()] = s1.n.to_numpy()
    l1_mask = l1_counts >= minsup
    l1_ref = ray.put(l1_mask)

    # ---- pass 2: pair + triple candidates over L1 items only
    def expand(group: pa.Table) -> pa.Table:
        keep = ray.get(l1_ref)
        oc = np.unique(group.column("oc").to_numpy())
        codes = oc % NB
        m = keep[codes]
        oc, codes = oc[m], codes[m]
        okey = oc // NB
        n = len(oc)
        empty = pa.table({"iset": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        if n == 0:
            return empty
        seg_start = np.concatenate([[0], np.nonzero(np.diff(okey))[0] + 1])
        seg_end = np.concatenate([seg_start[1:], [n]])
        seg_of = np.repeat(np.arange(len(seg_start)), seg_end - seg_start)
        partners = seg_end[seg_of] - np.arange(n) - 1
        total = int(partners.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), partners)
        csum = np.concatenate([[0], np.cumsum(partners)])
        off = np.arange(total) - np.repeat(csum[:-1], partners) + 1
        b_idx = a_idx + off
        pair_key = (np.int64(2) << 18) | (codes[a_idx] * NB + codes[b_idx])
        # triples: for each (a, b) pair, every element after b in the
        # same order segment is a third item
        thirds = seg_end[seg_of[b_idx]] - b_idx - 1
        tri_total = int(thirds.sum())
        keys = [pair_key]
        if tri_total:
            p_idx = np.repeat(np.arange(len(a_idx)), thirds)
            csum3 = np.concatenate([[0], np.cumsum(thirds)])
            off3 = np.arange(tri_total) - np.repeat(csum3[:-1], thirds) + 1
            c_idx = b_idx[p_idx] + off3
            tri_key = (np.int64(3) << 18) | (
                codes[a_idx[p_idx]] * NB * NB
                + codes[b_idx[p_idx]] * NB + codes[c_idx]
            )
            keys.append(tri_key)
        key_all = np.concatenate(keys)
        u, c = np.unique(key_all, return_counts=True)
        return pa.table(
            {"iset": pa.array(u, pa.int64()),
             "n_part": pa.array(c.astype(np.int64), pa.int64())}
        )

    agg = (
        dcodes.groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(expand, batch_format="pyarrow")
        .groupby("iset", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="support"))
        .to_pandas()
    )
    # assemble: singles from pass 1 + filtered pairs/triples from pass 2
    rows: list[tuple[int, str, int]] = []
    for code in np.nonzero(l1_mask)[0]:
        rows.append((1, str(brands[code]), int(l1_counts[code])))
    for iset, sup in zip(agg.iset.to_numpy(), agg.support.to_numpy()):
        if sup < minsup:
            continue
        size = int(iset) >> 18
        packed = int(iset) & ((1 << 18) - 1)
        if size == 2:
            items = [packed // NB, packed % NB]
        else:
            items = [packed // (NB * NB), (packed // NB) % NB, packed % NB]
        rows.append((size, "|".join(str(brands[i]) for i in items), int(sup)))
    # top k per size by (support DESC, itemset ASC)
    out: list[tuple[int, str, int]] = []
    for size in (1, 2, 3):
        grp = sorted((r for r in rows if r[0] == size),
                     key=lambda r: (-r[2], r[1]))[:k_per_size]
        out.extend(grp)
    return pa.table(
        {"size": pa.array([r[0] for r in out], pa.int64()),
         "itemset": pa.array([r[1] for r in out], pa.string()),
         "support": pa.array([r[2] for r in out], pa.int64())}
    )


def parts_bought_together(sf_dir: str, k: int = 20):
    """Market-basket affinity: part pairs co-occurring in the same order,
    ranked by order count. Shape: distinct (order, part) rows bucket-shuffle
    on orderkey (an order's lines land in one group), then ONE vectorized
    pair expansion per bucket — for elements sorted by (order, part), each
    element's partner count is (segment_end - position - 1), and the
    (a, b) index pairs fall out of two arange/repeat expressions (no
    per-order Python; an order with L lines emits L(L-1)/2 pairs, the
    inherent output size). Pair counts pre-aggregate per bucket before the
    tiny final groupby.

    TWO shuffles total: the bucket key is derived from orderkey, so every
    line of an order lands in ONE bucket and in-bucket (order, part) dedup
    equals global dedup — no separate global-distinct groupby needed (the
    original 3-shuffle form cost ~30 s of barrier overhead at sf0.01)."""
    import ray.data
    from ray.data.aggregate import Sum

    SHIFT = 1 << 20  # partkey < 2^20 by generator construction
    num_buckets = 64

    lp = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        # per-batch dedup shrinks the shuffle; final dedup happens in-bucket
        t = batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        op = o * SHIFT + p
        return pa.table(
            {"_bucket": pa.array((o % num_buckets).astype(np.int64), pa.int64()),
             "op": pa.array(op, pa.int64())}
        )

    dpairs = lp.map_batches(distinct_partial, batch_format="pyarrow")

    def expand(group: pa.Table) -> pa.Table:
        # in-bucket dedup IS global dedup (order -> one bucket)
        op = np.unique(group.column("op").to_numpy())  # sorted (order, part)
        okey = op // SHIFT
        part = op - okey * SHIFT
        n = len(op)
        if n == 0:
            return pa.table(
                {"pair": pa.array([], pa.int64()),
                 "n_part": pa.array([], pa.int64())}
            )
        seg_start = np.concatenate([[0], np.nonzero(np.diff(okey))[0] + 1])
        seg_end = np.concatenate([seg_start[1:], [n]])
        seg_of = np.repeat(np.arange(len(seg_start)), seg_end - seg_start)
        partners = seg_end[seg_of] - np.arange(n) - 1
        total = int(partners.sum())
        a_idx = np.repeat(np.arange(n), partners)
        csum = np.concatenate([[0], np.cumsum(partners)])
        off = np.arange(total) - np.repeat(csum[:-1], partners) + 1
        b_idx = a_idx + off
        key = part[a_idx] * SHIFT + part[b_idx]
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"pair": pa.array(u, pa.int64()),
             "n_part": pa.array(c.astype(np.int64), pa.int64())}
        )

    agg = (
        dpairs.groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(expand, batch_format="pyarrow")
        .groupby("pair", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n_orders"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    pair = tbl.column("pair").to_numpy().astype(np.int64)
    a = pair // SHIFT
    b = pair - a * SHIFT
    n_ord = tbl.column("n_orders").to_numpy().astype(np.int64)
    order = np.lexsort((b, a, -n_ord))[:k]
    return pa.table(
        {"part_a": pa.array(a[order], pa.int64()),
         "part_b": pa.array(b[order], pa.int64()),
         "n_orders": pa.array(n_ord[order], pa.int64())}
    )


def nation_volume_shipping(sf_dir: str, nation_a: str = "NATION_3",
                           nation_b: str = "NATION_8"):
    """TPC-H Q7 analog — bilateral trade volume: revenue shipped between
    two nations (supplier in one, ordering customer in the other, both
    directions) per ship year. Supplier and customer nation maps are tiny
    dimension broadcasts folded into the two fact scans; the only
    all-to-all is the orderkey shuffle join between the pre-filtered,
    pre-projected lineitem and orders streams; the final groupby has
    2 x years cells."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import (
        broadcast_hash_join,
        shuffle_hash_join,
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nk = dict(zip(nation.column("n_name").to_pylist(),
                  nation.column("n_nationkey").to_pylist()))
    keys = pa.array([nk[nation_a], nk[nation_b]], pa.int64())

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    supp = supp.filter(pc.is_in(supp.column("s_nationkey").cast(pa.int64()), value_set=keys))
    name_of = {int(nk[nation_a]): nation_a, int(nk[nation_b]): nation_b}
    supp = pa.table(
        {"l_suppkey": supp.column("s_suppkey"),
         "supp_nation": pa.array(
             [name_of[int(x)] for x in supp.column("s_nationkey").to_pylist()],
             pa.string())}
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(pc.is_in(cust.column("c_nationkey").cast(pa.int64()), value_set=keys))
    cust = pa.table(
        {"o_custkey": cust.column("c_custkey"),
         "cust_nation": pa.array(
             [name_of[int(x)] for x in cust.column("c_nationkey").to_pylist()],
             pa.string())}
    )

    orders = broadcast_hash_join(
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
        ),
        cust, left_key="o_custkey", right_key="o_custkey",
    ).map_batches(
        lambda b: pa.table({"l_orderkey": b.column("o_orderkey"),
                            "cust_nation": b.column("cust_nation")}),
        batch_format="pyarrow",
    )

    def line_prep(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        year = pc.year(batch.column("l_shipdate"))
        return pa.table(
            {"l_orderkey": batch.column("l_orderkey"),
             "supp_nation": batch.column("supp_nation"),
             "l_year": pc.cast(year, pa.int64()),
             "rev": rev}
        )

    line = broadcast_hash_join(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_shipdate"],
        ),
        supp, left_key="l_suppkey", right_key="l_suppkey",
    ).map_batches(line_prep, batch_format="pyarrow")

    joined = shuffle_hash_join(line, orders, on="l_orderkey", num_partitions=_nparts(sf_dir))

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(batch.column("supp_nation"), batch.column("cust_nation"))
        )
        b = batch.filter(keep)
        t = pa.table(
            {"supp_nation": b.column("supp_nation"),
             "cust_nation": b.column("cust_nation"),
             "l_year": b.column("l_year"),
             "rev": b.column("rev")}
        )
        g = t.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("rev", "sum")]
        )
        return g.rename_columns(["supp_nation", "cust_nation", "l_year", "rev_part"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("rev_part", alias_name="revenue"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"),
         ("l_year", "ascending")]
    )
    return pa.table(
        {"supp_nation": pc.cast(tbl.column("supp_nation"), pa.string()),
         "cust_nation": pc.cast(tbl.column("cust_nation"), pa.string()),
         "l_year": pc.cast(tbl.column("l_year"), pa.int64()),
         "revenue": pa.array(
             np.round(tbl.column("revenue").to_numpy(), 2), pa.float64())}
    )


def nation_market_share_q8(
    sf_dir: str,
    nation: str = "NATION_3",
    region: str = "EUROPE",
    ptype: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
):
    """TPC-H Q8 analog — a nation's market share (revenue fraction supplied
    by ``nation``) by order year, over orders placed by customers in
    ``region`` for parts of ``ptype``. ONE shuffle: part/supplier/customer
    are broadcast dimension maps (the part filter shrinks the partkey set
    before ray.put; at 100-TB proportions customer flips to a
    shuffle_hash_join on custkey), lineitem pre-aggregates
    (okey, vol, vol_nation) partials inside map_batches, and the only
    all-to-all is the orderkey join against date-filtered orders carrying
    the order year. Output: (o_year, mkt_share) ordered by o_year."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import (
        broadcast_hash_join,
        shuffle_hash_join,
    )

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), filters=[("r_name", "==", region)]
    )
    rk = set(reg.column("r_regionkey").to_pylist())
    region_nations = {
        int(k)
        for k, g in zip(
            nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()
        )
        if g in rk
    }
    target_key = nat.filter(pc.equal(nat.column("n_name"), nation)).column(
        "n_nationkey"
    ).to_pylist()
    if not target_key:
        raise ValueError(f"unknown nation {nation!r}")
    target_key = int(target_key[0])

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"],
        filters=[("p_type", "==", ptype)],
    ).select(["p_partkey"]).rename_columns(["l_partkey"])

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nat"])

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(
            cust.column("c_nationkey"),
            value_set=pa.array(sorted(region_nations)),
        )
    ).select(["c_custkey"]).rename_columns(["o_custkey"])

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )
    orders_sel = broadcast_hash_join(
        orders, cust, left_key="o_custkey", right_key="o_custkey"
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b.column("o_orderkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    line = broadcast_hash_join(line, part, left_key="l_partkey", right_key="l_partkey")
    line = broadcast_hash_join(line, supp, left_key="l_suppkey", right_key="l_suppkey")

    def vol_partial(batch: pa.Table) -> pa.Table:
        vol = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        )
        is_target = batch.column("s_nat").to_numpy() == target_key
        t = pa.table(
            {
                "okey": batch.column("l_orderkey"),
                "vol": pa.array(vol, pa.float64()),
                "vol_nat": pa.array(np.where(is_target, vol, 0.0), pa.float64()),
            }
        )
        g = t.group_by("okey").aggregate([("vol", "sum"), ("vol_nat", "sum")])
        return g.rename_columns(["okey", "vol", "vol_nat"])

    joined = shuffle_hash_join(
        line.map_batches(vol_partial, batch_format="pyarrow"), orders_sel, on="okey"
    )

    def year_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_year": batch.column("o_year"),
                "vol": batch.column("vol"),
                "vol_nat": batch.column("vol_nat"),
            }
        )
        g = t.group_by("o_year").aggregate([("vol", "sum"), ("vol_nat", "sum")])
        return g.rename_columns(["o_year", "vol", "vol_nat"])

    agg = (
        joined.map_batches(year_partial, batch_format="pyarrow")
        .groupby("o_year", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("vol", alias_name="vol"), Sum("vol_nat", alias_name="vol_nat"))
    )
    t = agg.to_pandas().sort_values("o_year").reset_index(drop=True)
    share = np.round(t["vol_nat"].to_numpy() / t["vol"].to_numpy(), 6)
    return pa.table(
        {
            "o_year": pa.array(t["o_year"].to_numpy().astype(np.int64), pa.int64()),
            "mkt_share": pa.array(share, pa.float64()),
        }
    )


def nation_year_profit_q9(sf_dir: str, name_prefix: str = "red"):
    """TPC-H Q9 analog — per (supplier nation, order year) profit for parts
    whose name starts with ``name_prefix``. The testdata has no partsupp
    table, so supply cost is proxied as 10% of p_retailprice per unit:
    profit = l_extendedprice*(1-l_discount) - 0.1*p_retailprice*l_quantity.
    Broadcast part (filtered) + supplier dims into the lineitem scan,
    pre-aggregate (okey, nation, profit), ONE orderkey shuffle join to pick
    up the year, then a tiny (nation, year) groupby. Output:
    (nation, o_year, sum_profit) ordered by nation ASC, o_year DESC."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import (
        broadcast_hash_join,
        shuffle_hash_join,
    )

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name", "p_retailprice"]
    )
    part = part.filter(pc.starts_with(part.column("p_name"), name_prefix))
    part = part.select(["p_partkey", "p_retailprice"]).rename_columns(
        ["l_partkey", "p_retail"]
    )

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    name_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nat"])

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b.column("o_orderkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        ],
    )
    line = broadcast_hash_join(line, part, left_key="l_partkey", right_key="l_partkey")
    line = broadcast_hash_join(line, supp, left_key="l_suppkey", right_key="l_suppkey")

    def profit_partial(batch: pa.Table) -> pa.Table:
        profit = batch.column("l_extendedprice").to_numpy() * (
            1.0 - batch.column("l_discount").to_numpy()
        ) - 0.1 * batch.column("p_retail").to_numpy() * batch.column(
            "l_quantity"
        ).to_numpy()
        t = pa.table(
            {
                "okey": batch.column("l_orderkey"),
                "s_nat": batch.column("s_nat"),
                "profit": pa.array(profit, pa.float64()),
            }
        )
        g = t.group_by(["okey", "s_nat"]).aggregate([("profit", "sum")])
        return g.rename_columns(["okey", "s_nat", "profit"])

    joined = shuffle_hash_join(
        line.map_batches(profit_partial, batch_format="pyarrow"), orders, on="okey"
    )

    def ny_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "s_nat": batch.column("s_nat"),
                "o_year": batch.column("o_year"),
                "profit": batch.column("profit"),
            }
        )
        g = t.group_by(["s_nat", "o_year"]).aggregate([("profit", "sum")])
        return g.rename_columns(["s_nat", "o_year", "profit"])

    agg = (
        joined.map_batches(ny_partial, batch_format="pyarrow")
        .groupby(["s_nat", "o_year"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("profit", alias_name="sum_profit"))
    )
    t = agg.to_pandas()
    t["nation"] = [name_of[int(k)] for k in t["s_nat"]]
    t = t.sort_values(
        ["nation", "o_year"], ascending=[True, False]
    ).reset_index(drop=True)
    return pa.table(
        {
            "nation": pa.array(t["nation"], pa.string()),
            "o_year": pa.array(t["o_year"].to_numpy().astype(np.int64), pa.int64()),
            "sum_profit": pa.array(
                np.round(t["sum_profit"].to_numpy(), 2), pa.float64()
            ),
        }
    )


def customer_order_distribution_q13(sf_dir: str, exclude_priority: str = "1-URGENT"):
    """TPC-H Q13 analog — distribution of customers by order count,
    excluding orders of ``exclude_priority``. No customer-side join at all:
    per-customer order counts come from a custkey-keyed groupby over the
    filtered orders scan (per-batch count partials first), the zero bucket
    is n_customers - n_customers_with_orders (FK containment: every
    o_custkey exists in customer), and the count-of-counts distribution is
    another per-batch partial + tiny groupby. Output: (c_count, custdist)
    ordered by custdist DESC, c_count DESC."""
    import ray.data
    from ray.data.aggregate import Sum

    n_customers = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).count()

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") != exclude_priority,
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"cust": batch.column("o_custkey")}).group_by("cust").aggregate(
            [("cust", "count")]
        )
        return g.rename_columns(["cust", "n"])

    per_cust = (
        orders.map_batches(count_partial, batch_format="pyarrow")
        .groupby("cust", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def dist_partial(batch: pa.Table) -> pa.Table:
        g = pa.table({"c_count": batch.column("c_count")}).group_by(
            "c_count"
        ).aggregate([("c_count", "count")])
        return g.rename_columns(["c_count", "d"])

    dist = (
        per_cust.map_batches(dist_partial, batch_format="pyarrow")
        .groupby("c_count", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("d", alias_name="custdist"))
    )
    t = dist.to_pandas()
    n_with_orders = int(t["custdist"].sum())
    zero = n_customers - n_with_orders
    if zero > 0:
        import pandas as pd

        t = pd.concat(
            [t, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    t = t.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)
    return pa.table(
        {
            "c_count": pa.array(t["c_count"].to_numpy().astype(np.int64), pa.int64()),
            "custdist": pa.array(
                t["custdist"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def supplier_part_variety_q16(
    sf_dir: str, exclude_brand: str = "Brand#1", max_size: int = 25, k: int = 30
):
    """TPC-H Q16 analog — distinct supplier count per (brand, type, size)
    combo, witnessed through lineitem (the testdata has no partsupp table),
    excluding ``exclude_brand`` and sizes above ``max_size``. part is a
    broadcast dimension map; lineitem per-batch dedups (partkey, suppkey),
    maps to an attr-composite int64 key, and distinct-ness resolves in ONE
    key groupby; the count-per-combo is a second tiny groupby over the
    distinct keys. Output: (p_brand, p_type, p_size, supplier_cnt) ordered
    by supplier_cnt DESC, p_brand, p_type, p_size, top-k."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    keep = pc.and_(
        pc.not_equal(part.column("p_brand"), exclude_brand),
        pc.less_equal(part.column("p_size"), max_size),
    )
    part = part.filter(keep)
    brands = sorted(set(part.column("p_brand").to_pylist()))
    types = sorted(set(part.column("p_type").to_pylist()))
    b_idx = {b: i for i, b in enumerate(brands)}
    t_idx = {t: i for i, t in enumerate(types)}
    # attr composite: ((brand * n_types + type) * 64 + size); suppkey rides
    # in the low 2^20 bits of the distinct key
    SUPP_SHIFT = 1 << 20
    combo = np.array(
        [
            (b_idx[b] * len(types) + t_idx[t]) * 64 + s
            for b, t, s in zip(
                part.column("p_brand").to_pylist(),
                part.column("p_type").to_pylist(),
                part.column("p_size").to_pylist(),
            )
        ],
        dtype=np.int64,
    )
    pmap = pa.table(
        {
            "l_partkey": part.column("p_partkey"),
            "combo": pa.array(combo, pa.int64()),
        }
    )

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_suppkey"]
    )
    line = broadcast_hash_join(line, pmap, left_key="l_partkey", right_key="l_partkey")

    def distinct_partial(batch: pa.Table) -> pa.Table:
        key = (
            batch.column("combo").to_numpy().astype(np.int64) * SUPP_SHIFT
            + batch.column("l_suppkey").to_numpy().astype(np.int64)
        )
        return pa.table({"key": pa.array(np.unique(key), pa.int64())})

    from ray.data.aggregate import Count

    distinct = (
        line.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("key", num_partitions=_nparts(sf_dir))
        .aggregate(Count(alias_name="_c"))
    )

    def combo_partial(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy().astype(np.int64) // SUPP_SHIFT
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "combo": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        distinct.map_batches(combo_partial, batch_format="pyarrow")
        .groupby("combo", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n", alias_name="supplier_cnt"))
    )
    t = agg.to_pandas()
    c = t["combo"].to_numpy().astype(np.int64)
    size = c % 64
    bt = c // 64
    ty = bt % len(types)
    br = bt // len(types)
    t["p_brand"] = [brands[i] for i in br]
    t["p_type"] = [types[i] for i in ty]
    t["p_size"] = size
    t = t.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).head(k).reset_index(drop=True)
    return pa.table(
        {
            "p_brand": pa.array(t["p_brand"], pa.string()),
            "p_type": pa.array(t["p_type"], pa.string()),
            "p_size": pa.array(t["p_size"].to_numpy().astype(np.int64), pa.int64()),
            "supplier_cnt": pa.array(
                t["supplier_cnt"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def bm25_topk_boosted(sf_dir: str, query: str = "merge^2 window", limit: int = 10):
    """Caret-boosted BM25 top-k over `documents` through the engine's
    weighted-OR path: 'merge^2 window' doubles merge's per-doc BM25
    contribution before the canonical accumulation (Lucene boost-query
    analog). Boost weight 2.0 is a power of two, so the multiply is exact
    in float64 and the SQL twin's CASE-weighted sum lands bit-identically
    (pre-round)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([query]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, boosted=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_msm(
    sf_dir: str, terms=("merge", "window", "join"), min_match: int = 2,
    limit: int = 10,
):
    """minimum_should_match BM25 top-k over `documents`: OR retrieval where
    only docs matching >= min_match distinct query terms survive to top-k
    (the Lucene/ES minimum_should_match contract). The floor is a candidate
    filter — surviving docs score exactly like plain OR — so the SQL twin
    is the bm25_topk formula plus HAVING count(*) >= min_match."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, min_match=min_match)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_collapse_inner(
    sf_dir: str, terms=BM25_QUERY_TERMS, group: int = 10,
    limit: int = 10, inner_n: int = 2,
):
    """ES ``collapse`` WITH ``inner_hits``: the top-``limit`` groups (by
    their best doc, exactly the collapsed ranking) each return their top
    ``inner_n`` matching docs, every doc carrying its OWN score. Engine:
    IndexReader.collapse_inner_hits — per-chunk state is inner_n rows per
    group (distributive), group-major output (the ES inner_hits layout)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir) + f"_grp{group}"
    build_index(_docs_as_grouped_transcripts(sf_dir, group), index_dir, cfg)
    reader = IndexReader(index_dir)
    docs, scores, grp = reader.collapse_inner_hits(
        " ".join(terms), limit, inner_n=inner_n
    )
    # inner rank: position within each group run (group-major output)
    if len(grp):
        first = np.concatenate([[0], np.nonzero(np.diff(grp))[0] + 1])
        seg_of = np.repeat(
            np.arange(len(first)), np.diff(np.concatenate([first, [len(grp)]]))
        )
        inner_rank = np.arange(len(grp)) - first[seg_of]
    else:
        inner_rank = np.array([], dtype=np.int64)
    return pa.table(
        {"group_id": pa.array(grp, pa.int64()),
         "doc_id": pa.array(docs, pa.int64()),
         "score": pa.array(np.round(scores, 6), pa.float64()),
         "inner_rank": pa.array(inner_rank.astype(np.int64), pa.int64())}
    )


def bm25_topk_collapsed(
    sf_dir: str, terms=BM25_QUERY_TERMS, group: int = 10, limit: int = 10
):
    """Field-collapsed BM25 top-k (the ES ``collapse`` analog): docs are
    grouped ``group`` per conversation and each conversation is represented
    by its single best-scoring doc; top-k ranks the winners. The SQL twin
    is the bm25_topk formula + row_number() OVER (PARTITION BY doc_id //
    group ORDER BY score DESC, doc_id) = 1."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir) + f"_grp{group}"
    build_index(_docs_as_grouped_transcripts(sf_dir, group), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, collapse=True)
    grp = np.array([int(c[4:]) for c in hits.column("conv_id").to_pylist()],
                   dtype=np.int64)
    doc_ids = grp * group + hits.column("turn_idx").to_numpy().astype(np.int64)
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_page2(sf_dir: str, terms=BM25_QUERY_TERMS, page_size: int = 10):
    """Cursor pagination (the ES ``search_after`` contract): page 1's last
    hit becomes the (after_score, after_doc) cursor and page 2 continues
    with no duplicate and no gap — the engine recomputes page 2
    independently, so the SQL twin is simply OFFSET page_size."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q1 = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([page_size], pa.int32())}
    )
    page1 = search_table(index_dir, q1, cfg)
    assert page1.num_rows == page_size
    last_score = float(page1.column("score")[-1].as_py())
    last_conv = page1.column("conv_id")[-1].as_py()
    last_turn = int(page1.column("turn_idx")[-1].as_py())
    q2 = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([page_size], pa.int32()),
         "after_score": pa.array([last_score], pa.float64()),
         "after_conv": pa.array([last_conv], pa.string()),
         "after_turn": pa.array([last_turn], pa.int32())}
    )
    page2 = search_table(index_dir, q2, cfg)
    doc_ids = [int(c[4:]) for c in page2.column("conv_id").to_pylist()]
    scores = np.round(page2.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def events_cube(sf_dir: str):
    """GROUP BY CUBE (event_type, day): all four grouping sets from ONE
    corpus pass. Per-batch combiner partials aggregate at the FINEST grain
    (type, day); after the single small groupby, the three coarser sets —
    (type), (day), () — fold from the finest table, which has grouping-set
    cardinality rows (types x days), driver-safe at any corpus size. 'ALL'
    is the sentinel for a rolled-up dimension, mirroring the SQL twin's
    COALESCE over CUBE nulls."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="day"), "%Y-%m-%d")
        g = (
            pa.table(
                {"event_type": batch.column("event_type"), "day": day,
                 "value": batch.column("value")}
            )
            .group_by(["event_type", "day"])
            .aggregate([("value", "count"), ("value", "sum")])
        )
        return g.rename_columns(["event_type", "day", "n", "s"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))
    ).to_pandas()

    import pandas as pd

    by_type = fine.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )
    by_type["day"] = "ALL"
    by_day = fine.groupby("day", as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )
    by_day["event_type"] = "ALL"
    total = pd.DataFrame(
        {"event_type": ["ALL"], "day": ["ALL"],
         "n_events": [fine["n_events"].sum()],
         "sum_value": [fine["sum_value"].sum()]}
    )
    out = pd.concat([fine, by_type, by_day, total], ignore_index=True)
    out = out.sort_values(["event_type", "day"]).reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"], pa.string()),
            "n_events": pa.array(out["n_events"].to_numpy().astype(np.int64), pa.int64()),
            "sum_value": pa.array(
                np.round(out["sum_value"].to_numpy(), 4), pa.float64()
            ),
        }
    )


def pack_sequences(sf_dir: str, seq_len: int = 512):
    """GPT-style sequence-packing manifest (the LLM training-data staple):
    the corpus token stream — documents concatenated in doc_id order,
    reference-regex tokens — is cut into fixed ``seq_len``-token training
    sequences, documents straddling cuts. Each doc's placement is pure
    arithmetic over the exclusive prefix sum of token counts:
    first_seq = cum_before // L, last_seq = (cum_before + n_tokens - 1) // L
    (a zero-token doc reports the sequence it would start in).

    Distributed shape: vectorized RE2 token counts per batch; ONE global
    sort by doc_id; then the stages/rank.py block-summary pattern — O(1)
    per-block token-sum summaries scan on the driver (O(blocks), never the
    rows) and each block finishes independently with its carried offset.
    Text never shuffles; no all-to-all beyond the sort of (doc_id, count)
    pairs. Output: (doc_id, n_tokens, first_seq, last_seq)."""
    import ray
    import ray.data

    from clip_as_service_ray.stages.rank import scan_sum_offsets, summarize_sums

    def count_fn(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column("text"))
        return pa.table(
            {
                "_k": pa.array(np.zeros(batch.num_rows, dtype=np.int64), pa.int64()),
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(lower, TOKEN_PATTERN_RE2), pa.int64()
                ),
            }
        )

    counts = (
        _documents(sf_dir).map_batches(count_fn, batch_format="pyarrow").sort("doc_id")
    )
    refs = counts.to_arrow_refs()
    if not refs:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64()),
             "first_seq": pa.array([], pa.int64()), "last_seq": pa.array([], pa.int64())}
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_sums)
    offs = scan_sum_offsets(
        ray.get([summarize.remote(r, "_k", "n_tokens") for r in refs])
    )

    def pack_block(tbl: pa.Table, prev_sum: float, L: int) -> pa.Table:
        n_tok = tbl.column("n_tokens").to_numpy().astype(np.int64)
        cum_excl = int(round(prev_sum)) + np.cumsum(n_tok) - n_tok
        first = cum_excl // L
        last = (cum_excl + np.maximum(n_tok, 1) - 1) // L
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
            }
        )

    pb = ray.remote(num_cpus=0.5)(pack_block)
    return ray.data.from_arrow_refs(
        [pb.remote(refs[i], offs[i], seq_len) for i in range(len(refs))]
    )


def ann_range_search(sf_dir: str, threshold: float = 0.1):
    """Range search (the radius-query member of the similarity family):
    ALL vectors with cosine >= threshold against the broadcast query — the
    per-batch matmul filters locally, so only qualifying (vec_id, sim) rows
    ever leave a worker (result-sized output, corpus never gathers).
    Output ordered (sim DESC, vec_id ASC)."""
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    q_ref = ray.put(q / np.linalg.norm(q))

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1.0, norms)
            keep = sims >= threshold
            return pa.table(
                {"vec_id": pa.array(vec_ids[keep], pa.int64()),
                 "sim": pa.array(sims[keep], pa.float64())}
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    sims = tbl.column("sim").to_numpy()
    vec_ids = tbl.column("vec_id").to_numpy()
    order = np.lexsort((vec_ids, -sims))
    return pa.table(
        {"vec_id": pa.array(vec_ids[order], pa.int64()),
         "sim": pa.array(np.round(sims[order], 6), pa.float64())}
    )


def ann_topk_mmr(sf_dir: str, k: int = 10, pool: int = 50, lam: float = 0.7):
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein,
    SIGIR 1998): greedy selection maximizing
    lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s).
    Distributed shape: the EXPENSIVE part — scoring the whole corpus — is
    the same per-batch broadcast-matmul scan as ann_topk, keeping only a
    ``pool``-sized candidate set per batch; the greedy re-rank is an
    O(pool * k) driver-side loop over the tiny merged pool (pool-sized
    matrices, corpus-size-independent). Iterative greedy selection has no
    SQL analog — rows-only entry. Output: (rank, vec_id, sim)."""
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    q_ref = ray.put(q / np.linalg.norm(q))

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            unit = emb / np.where(norms == 0, 1.0, norms)[:, None]
            sims = unit @ self.q
            top = np.lexsort((vec_ids, -sims))[: min(pool, len(vec_ids))]
            return pa.table(
                {"vec_id": pa.array(vec_ids[top], pa.int64()),
                 "sim": pa.array(sims[top], pa.float64()),
                 "unit": pa.array(list(unit[top]), pa.list_(pa.float64()))}
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    sims = np.asarray(tbl.column("sim").to_pylist(), dtype=np.float64)
    vec_ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    units = np.array(tbl.column("unit").to_pylist(), dtype=np.float64)
    order = np.lexsort((vec_ids, -sims))[: min(pool, len(vec_ids))]
    sims, vec_ids, units = sims[order], vec_ids[order], units[order]

    n = len(vec_ids)
    k = min(k, n)
    selected: list[int] = []
    max_to_sel = np.full(n, -np.inf)
    picked = np.zeros(n, dtype=bool)
    for _ in range(k):
        mmr = np.where(
            picked, -np.inf,
            lam * sims - (0.0 if not selected else (1.0 - lam) * max_to_sel),
        )
        # tie-break: highest mmr, then vec_id ASC (lexsort on masked array)
        i = int(np.lexsort((vec_ids, -mmr))[0])
        selected.append(i)
        picked[i] = True
        max_to_sel = np.maximum(max_to_sel, units @ units[i])
    sel = np.asarray(selected)
    return pa.table(
        {"rank": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
         "vec_id": pa.array(vec_ids[sel], pa.int64()),
         "sim": pa.array(np.round(sims[sel], 6), pa.float64())}
    )


def min_cost_supplier(sf_dir: str, size: int = 7, region: str = "ASIA"):
    """TPC-H Q2 analog (no partsupp table — the part↔supplier link is the
    lineitem fact, cost(part, supp) = min observed unit price
    l_extendedprice / l_quantity): for every part of one size, the
    cheapest in-region supplier, tie-break s_suppkey ASC. Shape: both
    dimension sides (region suppliers; size-matched partkeys) are tiny and
    broadcast into ONE column-pruned lineitem scan; per-batch partial min
    on a composite (part, supp) key, one small groupby-min, then the
    argmin-with-tiebreak over the |parts|x|region suppliers| pairs table
    on the driver (dimension-sized, never fact-sized). Unit price and min
    are exact selections (no accumulation) so equality with the SQL twin
    is float-exact before the final display rounding."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    SHIFT = 1 << 20

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rk = reg.filter(pc.equal(reg.column("r_name"), region)).column(
        "r_regionkey"
    ).to_numpy()
    nkeys = nat.filter(
        pc.is_in(nat.column("n_regionkey"), pa.array(rk, pa.int64()))
    ).column("n_nationkey")
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
    sup = sup.filter(pc.is_in(sup.column("s_nationkey"), nkeys.combine_chunks()))
    skeys = sup.column("s_suppkey").combine_chunks()
    sname = dict(zip(sup.column("s_suppkey").to_pylist(),
                     sup.column("s_name").to_pylist()))
    sbal = dict(zip(sup.column("s_suppkey").to_pylist(),
                    sup.column("s_acctbal").to_pylist()))

    pkeys = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_size"],
        filters=[("p_size", "==", size)],
    ).column("p_partkey").combine_chunks()

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        filter=pc.field("l_partkey").isin(pkeys) & pc.field("l_suppkey").isin(skeys),
    )

    def unit_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy().astype(np.int64)
        s = batch.column("l_suppkey").to_numpy().astype(np.int64)
        unit = (
            batch.column("l_extendedprice").to_numpy()
            / batch.column("l_quantity").to_numpy()
        )
        t = pa.table({"ps": pa.array(p * SHIFT + s, pa.int64()),
                      "unit": pa.array(unit, pa.float64())})
        g = t.group_by("ps").aggregate([("unit", "min")])
        return g.rename_columns(["ps", "unit"])

    pairs = pa.Table.from_pandas(
        line.map_batches(unit_partial, batch_format="pyarrow")
        .groupby("ps", num_partitions=_nparts(sf_dir))
        .min("unit")
        .to_pandas(),
        preserve_index=False,
    )
    if pairs.num_rows == 0:
        return pa.table(
            {"p_partkey": pa.array([], pa.int64()),
             "s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "s_acctbal": pa.array([], pa.float64()),
             "cost": pa.array([], pa.float64())}
        )
    ps = pairs.column("ps").to_numpy()
    cost = pairs.column("min(unit)").to_numpy()
    pk = ps // SHIFT
    sk = ps - pk * SHIFT
    # argmin per part with (cost ASC, suppkey ASC) tie-break
    order = np.lexsort((sk, cost, pk))
    pk, sk, cost = pk[order], sk[order], cost[order]
    first = np.concatenate([[True], np.diff(pk) != 0])
    pk, sk, cost = pk[first], sk[first], cost[first]
    return pa.table(
        {"p_partkey": pa.array(pk, pa.int64()),
         "s_suppkey": pa.array(sk, pa.int64()),
         "s_name": pa.array([sname[int(s)] for s in sk], pa.string()),
         "s_acctbal": pa.array(
             _sql_round([sbal[int(s)] for s in sk], 2), pa.float64()),
         "cost": pa.array(_sql_round(cost, 6), pa.float64())}
    )


def important_part_values(sf_dir: str, nation: str = "NATION_3"):
    """TPC-H Q11 analog (no partsupp — value of a part is its shipped
    revenue sum(l_extendedprice * (1 - l_discount)) via one nation's
    suppliers): parts whose value exceeds the mean per-part value, ordered
    value DESC. The TPC-H fraction threshold is replaced by the scale-free
    above-the-mean rule so the entry is meaningful at every sf. Shape: the
    nation's suppkey set broadcasts into one pruned lineitem scan;
    per-part partial sums -> one part-cardinality groupby; the
    mean-threshold filter runs on the (tiny) per-part value table. Both
    sides round values to 2 and the mean to 6 before comparing."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nk = nat.filter(pc.equal(nat.column("n_name"), nation)).column("n_nationkey")
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.filter(
        pc.is_in(sup.column("s_nationkey"), nk.combine_chunks())
    ).column("s_suppkey").combine_chunks()

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_suppkey").isin(skeys),
    )

    def val_partial(batch: pa.Table) -> pa.Table:
        # cent-round each line's revenue BEFORE summing (bookkeeping
        # semantics): per-line products are computed identically on both
        # engines, and sums of cent multiples are order-independent far
        # beyond float noise — partial-sum order can no longer flip a
        # 0.005 boundary against the SQL twin's sequential sum
        rev = _sql_round(
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy()),
            2,
        )
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "v": pa.array(rev, pa.float64())})
        g = t.group_by("l_partkey").aggregate([("v", "sum")])
        return g.rename_columns(["l_partkey", "v"])

    agg = pa.Table.from_pandas(
        line.map_batches(val_partial, batch_format="pyarrow")
        .groupby("l_partkey", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("v", alias_name="value"))
        .to_pandas(),
        preserve_index=False,
    )
    pk = agg.column("l_partkey").to_numpy().astype(np.int64)
    val = _sql_round(agg.column("value").to_numpy(), 2)
    if len(val) == 0:
        return pa.table({"p_partkey": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    thr = float(_sql_round(val.sum() / len(val), 6))
    keep = val > thr
    pk, val = pk[keep], val[keep]
    order = np.lexsort((pk, -val))
    return pa.table({"p_partkey": pa.array(pk[order], pa.int64()),
                     "value": pa.array(val[order], pa.float64())})


def promo_part_suppliers(sf_dir: str, prefix: str = "large",
                         region: str = "EUROPE"):
    """TPC-H Q20 analog (no partsupp/availqty — a supplier 'has excess
    stock' of a part when their shipped quantity of it exceeds half the
    part's per-supplier average): in-region suppliers who over-shipped any
    name-prefixed part. Shape: the prefix partkey set broadcasts into one
    pruned lineitem scan; (supp, part) composite-key partial sums -> one
    small groupby; the per-part totals, the 0.5 * total / n_suppliers
    threshold, and the qualifying-supplier distinct all run on the
    dimension-sized pairs table. Quantity sums are integral doubles so the
    threshold comparison is exact (expression order 0.5*tq/ns matches the
    SQL twin)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    SHIFT = 1 << 20

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_name"])
    pkeys = pt.filter(
        pc.starts_with(pt.column("p_name"), prefix)
    ).column("p_partkey").combine_chunks()

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=pc.field("l_partkey").isin(pkeys),
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy().astype(np.int64)
        s = batch.column("l_suppkey").to_numpy().astype(np.int64)
        t = pa.table({"sp": pa.array(s * SHIFT + p, pa.int64()),
                      "q": batch.column("l_quantity")})
        g = t.group_by("sp").aggregate([("q", "sum")])
        return g.rename_columns(["sp", "q"])

    pairs = pa.Table.from_pandas(
        line.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("sp", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("q", alias_name="q"))
        .to_pandas(),
        preserve_index=False,
    )
    out_schema = {"s_suppkey": pa.array([], pa.int64()),
                  "s_name": pa.array([], pa.string()),
                  "s_acctbal": pa.array([], pa.float64())}
    if pairs.num_rows == 0:
        return pa.table(out_schema)
    sp = pairs.column("sp").to_numpy()
    q = pairs.column("q").to_numpy()
    sk = sp // SHIFT
    pk = sp - sk * SHIFT
    # per-part total + supplier count over the pairs table (tiny)
    upk, inv = np.unique(pk, return_inverse=True)
    tq = np.bincount(inv, weights=q)
    ns = np.bincount(inv)
    qual = np.unique(sk[q > 0.5 * tq[inv] / ns[inv]])

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rk = reg.filter(pc.equal(reg.column("r_name"), region)).column("r_regionkey")
    nkeys = nat.filter(
        pc.is_in(nat.column("n_regionkey"), rk.combine_chunks())
    ).column("n_nationkey")
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
    sup = sup.filter(
        pc.and_(
            pc.is_in(sup.column("s_nationkey"), nkeys.combine_chunks()),
            pc.is_in(sup.column("s_suppkey"), pa.array(qual, pa.int64())),
        )
    ).sort_by("s_suppkey")
    return pa.table(
        {"s_suppkey": sup.column("s_suppkey"),
         "s_name": sup.column("s_name"),
         "s_acctbal": pa.array(
             np.round(sup.column("s_acctbal").to_numpy(), 2), pa.float64())}
    )


def _match_doc_ids(index_dir: str, terms) -> np.ndarray:
    """Sorted documents.doc_id array of docs containing ANY query term —
    the OR-retrieval match set, read from the engine's own postings (only
    the query terms' posting lists leave disk; at scale this runs per
    shard inside the scatter service, here the reader union is the
    driver-side equivalent). conv names invert to doc ids by the
    zero-padded 'doc-NNN' construction of _docs_as_transcripts."""
    from clip_as_service_ray.stages.query import IndexReader

    reader = IndexReader(index_dir)
    docs = reader.excluded_docs(" ".join(terms))  # union of postings
    if len(docs) == 0:
        return np.array([], dtype=np.int64)
    convs, _turns = reader.invert_doc_ids(docs)
    return np.array([int(c[4:]) for c in convs], dtype=np.int64)


def search_count(sf_dir: str, terms=BM25_QUERY_TERMS):
    """The ES `_count` API analog: number of docs matching >= 1 query term
    (OR retrieval), counted from the inverted index WITHOUT materializing
    hits — a posting-list union per term, never a corpus scan."""
    from clip_as_service_ray.pipelines.build_index import build_index

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    n = len(_match_doc_ids(index_dir, terms))
    return pa.table({"n_matches": pa.array([n], pa.int64())})


def query_facets(sf_dir: str, terms=BM25_QUERY_TERMS):
    """ES terms-aggregation on a query (facets): per `source` value, how
    many docs match the OR query — counted over the FULL match set (not
    the top-k page), the way ES aggregations run alongside hits. The match
    set comes from the INDEX posting union (vs ``search_facets``, the
    corpus-scan form of the same aggregation); the facet field is read
    with doc-id predicate pushdown (only matching rows leave storage) and
    reduced by a source-cardinality groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.pipelines.build_index import build_index

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    ids = _match_doc_ids(index_dir, terms)
    if len(ids) == 0:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64())})
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
        filter=pc.field("doc_id").isin(pa.array(ids, pa.int64())),
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source").aggregate([("doc_id", "count")])
        return g.rename_columns(["source", "n_part"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return tbl.sort_by("source")


def significant_terms(sf_dir: str, fg_term: str = "merge", k: int = 10):
    """ES significant-terms aggregation (JLH score): terms over-represented
    in the docs matching ``fg_term`` vs the whole corpus.
    JLH = (fg% - bg%) * (fg% / bg%) with fg% = fg_df / n_fg,
    bg% = df / n_docs. Shape: the foreground doc set is the term's posting
    list (index read); foreground term df's come from ONE pushdown-filtered
    scan over just those docs (per-batch distinct (doc, term) partials ->
    term groupby); background df's are a predicate-pushdown dictionary
    read of only the foreground's vocabulary. The score math runs on the
    fg-vocabulary-sized table."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    reader = IndexReader(index_dir)
    n_docs = float(reader.n_docs)
    ids = _match_doc_ids(index_dir, [fg_term])
    n_fg = float(len(ids))
    if n_fg == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "fg_df": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(pa.array(ids, pa.int64())),
    )

    def fg_partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)  # per-doc distinct terms
        g = t.group_by("term").aggregate([("doc_id", "count")])
        return g.rename_columns(["term", "df_part"])

    fg = pa.Table.from_pandas(
        ds.map_batches(fg_partial, batch_format="pyarrow")
        .groupby("term", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("df_part", alias_name="fg_df"))
        .to_pandas(),
        preserve_index=False,
    )
    terms = fg.column("term").to_numpy(zero_copy_only=False)
    fg_df = fg.column("fg_df").to_numpy().astype(np.float64)
    # background df for exactly the foreground vocabulary
    dict_tbl = pq.read_table(
        os.path.join(index_dir, "dictionary"),
        filters=[("term", "in", terms.tolist())],
    )
    dterms = dict_tbl.column("term").to_numpy(zero_copy_only=False)
    ddf = dict_tbl.column("df").to_numpy().astype(np.float64)
    order = np.argsort(dterms, kind="stable")
    dterms, ddf = dterms[order], ddf[order]
    pos = np.searchsorted(dterms, terms)
    df = ddf[pos]  # every fg term is indexed by construction

    fgp = fg_df / n_fg
    bgp = df / n_docs
    score = (fgp - bgp) * (fgp / bgp)
    keep = terms != fg_term
    terms, fg_df, score = terms[keep], fg_df[keep], score[keep]
    score = np.round(score, 6)
    top = np.lexsort((terms, -score))[:k]
    return pa.table(
        {"term": pa.array(terms[top], pa.string()),
         "fg_df": pa.array(fg_df[top].astype(np.int64), pa.int64()),
         "score": pa.array(score[top], pa.float64())}
    )


def bm25_topk_rescored(sf_dir: str, terms=BM25_QUERY_TERMS,
                       window: int = 100, k: int = 10):
    """ES rescore-window + function_score(field_value_factor) composed:
    BM25 retrieves a ``window`` of candidates, then only that window is
    re-scored by combined = score * ln(1 + n_chars) (a doc-field factor —
    the 'boost long documents' shape) and the top-k of the window is
    returned. The factor field is read with doc-id pushdown (window-sized,
    never corpus-sized). Both factors round to 6 before the multiply so
    the product is bit-reproducible against the SQL twin."""
    import pyarrow.parquet as pq

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([window], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    ids = np.array(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], np.int64
    )
    score = np.round(hits.column("score").to_numpy(), 6)
    nc = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
        filters=[("doc_id", "in", ids.tolist())],
    )
    nid = nc.column("doc_id").to_numpy()
    nch = nc.column("n_chars").to_numpy().astype(np.float64)
    o = np.argsort(nid)
    nid, nch = nid[o], nch[o]
    factor = np.round(np.log1p(nch[np.searchsorted(nid, ids)]), 6)
    combined = np.round(score * factor, 6)
    top = np.lexsort((ids, -combined))[:k]
    return pa.table(
        {"doc_id": pa.array(ids[top], pa.int64()),
         "combined": pa.array(combined[top], pa.float64()),
         "score": pa.array(score[top], pa.float64())}
    )


def doc_term_vectors(sf_dir: str, doc_id: int = 42):
    """The ES/Lucene _termvectors API analog: one doc's (term, tf, df)
    rows with token positions — tf/positions from analyzing the document,
    df from the index dictionary via predicate-pushdown (only this doc's vocabulary leaves storage,
    the more_like_this access path). Ordered by term."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.pipelines.build_index import build_index

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    row = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") == doc_id,
    ).take(1)
    toks = tokenize(row[0]["text"])
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    pos_by_term = {}
    for p_, t_ in enumerate(toks):
        pos_by_term.setdefault(t_, []).append(p_)
    dict_tbl = pq.read_table(
        os.path.join(index_dir, "dictionary"),
        filters=[("term", "in", terms.tolist())],
    )
    dterms = dict_tbl.column("term").to_numpy(zero_copy_only=False)
    ddf = dict_tbl.column("df").to_numpy().astype(np.int64)
    order = np.argsort(dterms, kind="stable")
    dterms, ddf = dterms[order], ddf[order]
    pos = np.searchsorted(dterms, terms)
    df = ddf[pos]
    return pa.table(
        {"term": pa.array(terms.astype(str), pa.string()),
         "tf": pa.array(tfs.astype(np.int64), pa.int64()),
         "df": pa.array(df, pa.int64()),
         "positions": pa.array(
             [",".join(map(str, pos_by_term[t])) for t in terms], pa.string()
         )}
    )


def bm25_topk_suffix(sf_dir: str, suffix: str = "er", limit: int = 10):
    """Leading-wildcard query `*suffix` (Lucene ReverseStringFilter use
    case): BM25 over every dictionary term ending with the suffix, each
    with its own idf — same OR accumulation as the prefix mode."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([suffix]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, suffix=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def duplicate_span_coverage(sf_dir: str, n: int = 8):
    """Exact duplicated-substring coverage per document (Lee et al. 2021
    span-removal dedup): token positions covered by an n-gram that occurs
    in >= 2 distinct docs. Distributed shape in
    stages/dedup.py::dup_span_coverage (gram-routed shuffle + interval
    union); the SQL twin rebuilds shingles with 7 window leads and counts
    DISTINCT covered positions."""
    from clip_as_service_ray.stages.dedup import dup_span_coverage

    out = dup_span_coverage(_documents(sf_dir), n=n).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
         "dup_tokens": pa.array(out["dup_tokens"].to_numpy(), pa.int64())}
    )


def bm25_topk_rm3(
    sf_dir: str, terms=BM25_QUERY_TERMS, fb_docs: int = 5,
    fb_terms: int = 3, alpha: float = 0.6, limit: int = 10,
):
    """RM3-style pseudo-relevance feedback (Lavrenko & Croft relevance
    models; the ES/Anserini PRF analog), two engine passes:

    1. initial BM25 top-``fb_docs``;
    2. relevance model over the feedback docs — P(w|R) = Σ_d w_d·tf/dl with
       w_d = normalized BM25 score; expansion = top-``fb_terms`` NON-query,
       non-stopword terms by TOTAL feedback tf (integer selection keeps the
       term choice exactly reproducible by the SQL twin; P weights the
       final query);
    3. final weighted-OR query: weight(w) = alpha·qtf/|q| + (1-alpha)·P(w|R),
       served through the boosted kernel (float weights round-trip exactly
       via repr).

    Feedback texts are fetched by a doc-id pushdown read (hits-sized, the
    more_like_this pattern) and re-tokenized — the ES term-vectors route."""
    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    import pyarrow.dataset as pads
    import ray.data

    STOP = ("the", "a", "of", "to", "and", "in")
    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    q1 = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([fb_docs], pa.int32())}
    )
    fb = search_table(index_dir, q1, cfg)
    fb_ids = np.asarray(
        [int(c[4:]) for c in fb.column("conv_id").to_pylist()], dtype=np.int64
    )
    fb_scores = fb.column("score").to_numpy()
    w_by_id = dict(zip(fb_ids.tolist(), (fb_scores / fb_scores.sum()).tolist()))

    rows = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(fb_ids.tolist()),
        ).take_all()
    )
    rows.sort(key=lambda r: r["doc_id"])  # canonical doc-ASC accumulation
    p_rm: dict[str, float] = {}
    tf_tot: dict[str, int] = {}
    for r in rows:
        toks = tokenize(r["text"])
        dl = len(toks)
        wd = w_by_id[int(r["doc_id"])]
        tfs: dict[str, int] = {}
        for t in toks:
            tfs[t] = tfs.get(t, 0) + 1
        for t in sorted(tfs):
            p_rm[t] = p_rm.get(t, 0.0) + wd * tfs[t] / dl
            tf_tot[t] = tf_tot.get(t, 0) + tfs[t]

    qset = set(terms)
    cand = [t for t in tf_tot if t not in qset and t not in STOP]
    cand.sort(key=lambda t: (-tf_tot[t], t))
    expansion = cand[:fb_terms]

    weights = {t: alpha / len(terms) + (1.0 - alpha) * p_rm.get(t, 0.0)
               for t in terms}
    for t in expansion:
        weights[t] = (1.0 - alpha) * p_rm[t]
    boosted = " ".join(f"{t}^{w!r}" for t, w in sorted(weights.items()))

    q2 = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([boosted]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, q2, cfg, boosted=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_decay(
    sf_dir: str, terms=BM25_QUERY_TERMS, field: str = "n_chars",
    origin: float = 150.0, scale: float = 80.0, limit: int = 10,
):
    """function_score gauss decay (ES decay query, multiply mode): every
    matching doc's BM25 score is multiplied by exp(-d²/2σ²) of its
    ``n_chars`` doc value around ``origin`` BEFORE top-k — shorter-than- or
    longer-than-typical docs decay. The numeric field is an index-time
    doc-values artifact (build_doc_values), not a per-query table read."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    def fmt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                field: batch.column(field),
            }
        )

    import ray.data

    src = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", field]
    ).map_batches(fmt, batch_format="pyarrow")
    build_doc_values(src, index_dir, field, cfg)

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg,
        decay={"field": field, "origin": origin, "scale": scale},
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def search_random_score(
    sf_dir: str, terms=BM25_QUERY_TERMS, seed: int = 13, limit: int = 10,
):
    """function_score random_score (ES boost_mode=replace): matching docs
    ranked by a DETERMINISTIC Knuth multiplicative hash of (doc_id, seed)
    in [0, 1) — reproducible sampling of a match set, the standard ES trick
    for serving stable random result pages. No doc-values artifact needed;
    the SQL twin recomputes the identical integer hash."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg, decay={"kind": "random", "seed": seed}
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_fvf(
    sf_dir: str, terms=BM25_QUERY_TERMS, field: str = "n_chars",
    factor: float = 0.5, modifier: str = "log2p", limit: int = 10,
):
    """function_score field_value_factor (ES fvf, multiply mode): every
    matching doc's BM25 score is multiplied by modifier(factor * doc value)
    BEFORE top-k — here log10(0.5 * n_chars + 2), the classic
    popularity-boost shape. Same index-time doc-values artifact as the
    decay query; only the multiplier function differs (kind="fvf")."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    def fmt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                field: batch.column(field),
            }
        )

    import ray.data

    src = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", field]
    ).map_batches(fmt, batch_format="pyarrow")
    build_doc_values(src, index_dir, field, cfg)

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg,
        decay={"kind": "fvf", "field": field, "factor": factor,
               "modifier": modifier},
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_has_parent(
    sf_dir: str, terms=BM25_QUERY_TERMS, group_size: int = 8, limit: int = 10,
):
    """ES ``has_parent`` (score=true) through the real engine: documents
    grouped 8-per-conversation; the PARENT is turn 0 of each group; the
    query returns CHILD docs of matching parents, each carrying the
    parent's BM25 score (rank: parent score DESC, child doc ASC). The SQL
    twin scores only doc_id % group_size == 0 docs and fans out to their
    siblings."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir) + f"_grp{group_size}"
    build_index(_docs_as_grouped_transcripts(sf_dir, group_size), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, block_join="parent")
    parents = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], dtype=np.int64
    )
    child = parents * group_size + hits.column("turn_idx").to_numpy().astype(np.int64)
    return pa.table(
        {"child_doc_id": pa.array(child, pa.int64()),
         "parent_id": pa.array(parents, pa.int64()),
         "score": pa.array(
             np.round(hits.column("score").to_numpy(), 6), pa.float64()
         )}
    )


def _docs_as_grouped_transcripts(sf_dir: str, group_size: int = 8):
    """Documents as MULTI-TURN conversations: doc_id // group_size is the
    conversation, doc_id % group_size the turn — the parent/child block
    layout of Lucene's index-time join (parents are contiguous doc blocks).
    Streaming map_batches like _docs_as_transcripts; conv ids zero-padded so
    lexicographic conv order == numeric group order, which keeps index
    doc_id == original doc_id (groups are dense and contiguous)."""

    def fmt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        grp = ids // group_size
        n = batch.num_rows
        padded = pc.utf8_lpad(pc.cast(pa.array(grp, pa.int64()), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("grp"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array((ids % group_size).astype(np.int32), pa.int32()),
                "role": pa.array(["user"] * n),
                "text": batch.column("text"),
                "tool": pa.array([""] * n),
                "ts": pa.array(np.zeros(n, dtype=np.int64), pa.timestamp("us")),
            }
        )

    return _documents(sf_dir).map_batches(fmt, batch_format="pyarrow")


def bm25_topk_blockjoin(
    sf_dir: str, terms=BM25_QUERY_TERMS, mode: str = "sum",
    group_size: int = 8, limit: int = 10,
):
    """Parent/child block join (ES has_child / Lucene
    ToParentBlockJoinQuery): documents grouped group_size-per-parent rank
    PARENTS by aggregating their matching children's BM25 scores
    (score_mode="sum" by default); the returned child is the parent's best
    turn (inner_hits representative). The SQL twin aggregates the per-doc
    BM25 CTE by doc_id // group_size."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir) + f"_grp{group_size}"
    build_index(_docs_as_grouped_transcripts(sf_dir, group_size), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, block_join=mode)
    parents = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], dtype=np.int64
    )
    best = parents * group_size + hits.column("turn_idx").to_numpy().astype(np.int64)
    return pa.table(
        {"parent_id": pa.array(parents, pa.int64()),
         "score": pa.array(np.round(hits.column("score").to_numpy(), 6), pa.float64()),
         "best_doc_id": pa.array(best, pa.int64())}
    )


def bm25_topk_term_range(
    sf_dir: str, query: str = "[scan TO sort}", limit: int = 10
):
    """Term-range query (Lucene TermRangeQuery analog): BM25 over every
    dictionary term lexicographically inside the range — `[` inclusive,
    `{`/`}` exclusive, `*` unbounded — each with its own idf, scored as an
    OR query. The default `[scan TO sort}` is a half-open range (>= scan,
    < sort), exercising mixed bracket inclusivity."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([query]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, term_range=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_regex(sf_dir: str, pattern: str = "s.*t", limit: int = 10):
    """Regexp term query (Lucene RegexpQuery analog): the pattern expands
    over the term dictionary (full match), the matched set scored as an OR
    query with per-term idf."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([pattern]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, regex=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def search_sort_by_field(sf_dir: str, terms=BM25_QUERY_TERMS, limit: int = 10):
    """ES sort-by-field: hits of the OR query ordered by a DOC FIELD
    (doc_id DESC — 'newest first' under the monotonic-id convention)
    instead of relevance. The match set is the index posting union; no
    scores are computed at all (ES skips scoring when sorting by field)."""
    from clip_as_service_ray.pipelines.build_index import build_index

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    ids = np.sort(_match_doc_ids(index_dir, terms))[::-1][:limit]
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def ann_topk_sq8(sf_dir: str, k: int = 10, pool_per_batch: int = 64):
    """Scalar-quantized (SQ8) ANN: the int8-compressed scan + exact-refine
    pattern (FAISS SQ8 / Lucene scalar quantization). Coarse phase scans
    int8 codes (4x smaller than float32, 8x than float64 — at 100 TB the
    codes fit where raw vectors do not), keeping a generous per-batch
    candidate pool by approximate score; refine reads ONLY the pooled
    candidates' exact vectors (vec-id pushdown) and returns their exact
    cosine top-k. With the pool >> k the quantization margin keeps the
    true top-k inside the pool, so the result — and the SQL twin — are
    EXACTLY ann_topk's (the pytest pins equality; a recall-vs-pool knob is
    the honest failure mode, not silently approximate scores)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    qu = q / np.linalg.norm(q)
    qs = float(np.abs(qu).max() / 127.0)
    qq = np.round(qu / qs).astype(np.int32)  # int8-ranged codes
    q_ref = ray.put((qq, qs))

    class Coarse:
        def __init__(self):
            self.qq, self.qs = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            unit = emb / np.where(norms == 0, 1.0, norms)[:, None]
            # per-vector symmetric int8 quantization of the UNIT vectors
            xs = np.abs(unit).max(axis=1) / 127.0
            xs = np.where(xs == 0, 1.0, xs)
            codes = np.round(unit / xs[:, None]).astype(np.int32)
            approx = (codes @ self.qq).astype(np.float64) * xs * self.qs
            top = np.argsort(-approx, kind="stable")[: min(pool_per_batch, len(vec_ids))]
            return pa.table({"vec_id": pa.array(vec_ids[top], pa.int64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pool_ids = (
        pa.Table.from_pandas(
            ds.map_batches(Coarse, batch_format="pyarrow",
                           batch_size=4096, concurrency=2).to_pandas(),
            preserve_index=False,
        ).column("vec_id").to_numpy()
    )
    # exact refine over the pooled candidates only
    ref = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", np.unique(pool_ids).tolist())],
    )
    vec_ids = ref.column("vec_id").to_numpy()
    emb = np.array(ref.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    sims = (emb @ (q / np.linalg.norm(q))) / np.where(norms == 0, 1.0, norms)
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


def pagerank_parts(sf_dir: str, damping: float = 0.85, iters: int = 5,
                   k: int = 20):
    """PageRank over the part co-purchase graph (edges = distinct part
    pairs sharing an order, both directions): ``iters`` power iterations
    at the classic damping. Distributed shape: the edge list is built by
    the parts_bought_together bucket expansion then made globally distinct
    by ONE composite-key groupby; each iteration broadcasts the
    node-sized (rank/deg) map and reduces per-dst partial sums with a
    node-cardinality groupby — edges never leave the cluster, only the
    O(nodes) rank table moves (web-scale graphs would range-shard the
    rank table ShardedConvBase-style instead of broadcasting). The SQL
    twin unrolls the same ``iters`` updates as chained CTEs."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    SHIFT = 1 << 20
    num_buckets = 64

    lp = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        return pa.table(
            {"_bucket": pa.array((o % num_buckets).astype(np.int64), pa.int64()),
             "op": pa.array(o * SHIFT + p, pa.int64())}
        )

    def expand(group: pa.Table) -> pa.Table:
        op = np.unique(group.column("op").to_numpy())
        okey = op // SHIFT
        part = op - okey * SHIFT
        n = len(op)
        if n == 0:
            return pa.table({"edge": pa.array([], pa.int64())})
        seg_start = np.concatenate([[0], np.nonzero(np.diff(okey))[0] + 1])
        seg_end = np.concatenate([seg_start[1:], [n]])
        seg_of = np.repeat(np.arange(len(seg_start)), seg_end - seg_start)
        partners = seg_end[seg_of] - np.arange(n) - 1
        total = int(partners.sum())
        a_idx = np.repeat(np.arange(n), partners)
        csum = np.concatenate([[0], np.cumsum(partners)])
        off = np.arange(total) - np.repeat(csum[:-1], partners) + 1
        b_idx = a_idx + off
        a, b = part[a_idx], part[b_idx]
        both = np.unique(np.concatenate([a * SHIFT + b, b * SHIFT + a]))
        return pa.table({"edge": pa.array(both, pa.int64())})

    def _expand_groups(group: pa.Table) -> pa.Table:
        return expand(group)

    edges = (
        lp.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(_expand_groups, batch_format="pyarrow")
        .groupby("edge", num_partitions=_nparts(sf_dir))
        # global distinct (the same pair can arise in many order buckets);
        # Ray's aggregate() needs >=1 agg, so a throwaway Count rides along
        .aggregate(Count(alias_name="_c"))
        .materialize()  # re-read every iteration without recomputing
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        e = batch.column("edge").to_numpy()
        srcs, cnt = np.unique(e // SHIFT, return_counts=True)
        return pa.table({"node": pa.array(srcs, pa.int64()),
                         "d_part": pa.array(cnt, pa.int64())})

    deg_tbl = pa.Table.from_pandas(
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("d_part", alias_name="deg"))
        .to_pandas(),
        preserve_index=False,
    )
    nodes = np.sort(deg_tbl.column("node").to_numpy().astype(np.int64))
    if len(nodes) == 0:
        return pa.table({"p_partkey": pa.array([], pa.int64()),
                         "pr": pa.array([], pa.float64())})
    order = np.argsort(deg_tbl.column("node").to_numpy())
    deg = deg_tbl.column("deg").to_numpy().astype(np.float64)[order]
    n = float(len(nodes))
    rank = np.full(len(nodes), 1.0 / n)
    base = (1.0 - damping) / n

    for _ in range(iters):
        state_ref = ray.put((nodes, rank / deg))  # O(nodes), once per sweep

        def contrib_partial(batch: pa.Table, _ref=state_ref) -> pa.Table:
            nd, rd = ray.get(_ref)
            e = batch.column("edge").to_numpy()
            s = e // SHIFT
            d = e - s * SHIFT
            t = pa.table({"node": pa.array(d, pa.int64()),
                          "c": pa.array(rd[np.searchsorted(nd, s)], pa.float64())})
            g = t.group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c_part"])

        agg = pa.Table.from_pandas(
            edges.map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("node", num_partitions=_nparts(sf_dir))
            .aggregate(Sum("c_part", alias_name="c"))
            .to_pandas(),
            preserve_index=False,
        )
        rank = np.full(len(nodes), base)
        idx = np.searchsorted(nodes, agg.column("node").to_numpy())
        rank[idx] = base + damping * agg.column("c").to_numpy()
    rank = np.round(rank, 6)
    top = np.lexsort((nodes, -rank))[:k]
    return pa.table(
        {"p_partkey": pa.array(nodes[top], pa.int64()),
         "pr": pa.array(rank[top], pa.float64())}
    )


def bm25f_topk(sf_dir: str, terms=BM25_QUERY_TERMS, title_tokens: int = 8,
               title_weight: int = 2, limit: int = 10):
    """BM25F (simple variant / ES combined_fields): two fields per doc —
    'title' (the first ``title_tokens`` tokens) at weight 2 and 'body' at
    weight 1 — with field-weighted tf and a COMBINED weighted length norm.
    For integer weights this equals plain BM25 over the pseudo-document
    whose title repeats ``title_weight`` times (tf, dl, df, avgdl all
    transform consistently), so the REAL engine serves it end to end: the
    corpus adapter rebuilds each doc's text as title x2 + body (a
    streaming map_batches — token order is irrelevant to the bag-of-words
    model), the normal index/build/search path does the rest. The SQL
    twin recomputes from the weighted token multiset."""
    import ray.data

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir) + "_bm25f"

    def fields(batch: pa.Table) -> pa.Table:
        # vectorized pseudo-doc assembly over the flat token stream: slice
        # each row's token list into title/body, join, and concatenate
        # title x weight + body — no per-row Python tokenize
        n = batch.num_rows
        tokens, lens = tokenize_column_flat(batch.column("text"))
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        lists = pa.ListArray.from_arrays(offsets, tokens)
        title = pc.binary_join(pc.list_slice(lists, 0, title_tokens), " ")
        body = pc.binary_join(
            pc.list_slice(lists, title_tokens, (1 << 30)), " "
        )
        pieces = [title] * title_weight + [body]
        out = pc.binary_join_element_wise(
            *pieces, pa.scalar(" ")  # extra spaces tokenize away
        )
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {"conv_id": pc.cast(conv, pa.string()),
             "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
             "role": pa.array(["doc"] * n, pa.string()),
             "text": pc.cast(out, pa.string())}
        )

    src = _documents(sf_dir).map_batches(fields, batch_format="pyarrow")
    build_index(src, index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def sentence_dedup(sf_dir: str, min_chars: int = 20, k: int = 20):
    """Sentence-level exact dedup (the C4 / RefinedWeb 'repeated lines'
    curation pass): split every doc into sentences on terminal
    punctuation runs, normalize (lower + trim), and count DISTINCT docs
    per sentence; sentences appearing in >= 2 docs are the boilerplate /
    contamination candidates. Vectorized split via Arrow
    split_pattern_regex over the batch (RE2 '[.!?]+' — no lookbehind, so
    the SQL twin's regexp_split_to_array matches exactly); per-batch
    (sentence, doc) distinct partials -> one sentence-keyed groupby. Only
    sentence/count pairs shuffle, never full texts."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        low = pc.utf8_lower(batch.column("text"))
        sents = pc.split_pattern_regex(low, "[.!?]+")
        flat = pc.list_flatten(sents)
        lens = pc.list_value_length(sents).to_numpy()
        row_of = np.repeat(np.arange(len(doc_ids)), lens)
        trimmed = pc.utf8_trim_whitespace(flat)
        keep = pc.greater_equal(
            pc.utf8_length(trimmed), pa.scalar(min_chars)
        ).to_numpy(zero_copy_only=False)
        if not keep.any():
            return pa.table({"sentence": pa.array([], pa.string()),
                             "d_part": pa.array([], pa.int64())})
        t = pa.table(
            {"sentence": trimmed.filter(pa.array(keep)),
             "doc_id": pa.array(doc_ids[row_of[keep]], pa.int64())}
        )
        # per-batch distinct (sentence, doc): one row per doc is enough
        g = t.group_by(["sentence", "doc_id"]).aggregate([])
        g2 = g.group_by("sentence").aggregate([("doc_id", "count")])
        return g2.rename_columns(["sentence", "d_part"])

    agg = (
        _documents(sf_dir).map_batches(partial, batch_format="pyarrow")
        .groupby("sentence", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("d_part", alias_name="n_docs"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = tbl.filter(pc.greater_equal(tbl.column("n_docs"), pa.scalar(2)))
    tbl = tbl.sort_by([("n_docs", "descending"), ("sentence", "ascending")])
    return tbl.slice(0, k)


def basket_lift(sf_dir: str, min_pair_orders: int = 3, k: int = 20):
    """Association rules over co-purchased parts: for part pairs sharing
    >= ``min_pair_orders`` orders, support / confidence / lift. Reuses the
    parts_bought_together exchange (order-bucket pair expansion, two
    shuffles); per-part order counts ride the same distinct (order, part)
    partials, so the whole operator reads lineitem ONCE. The rule stats
    run on the pair-cardinality table. Expression order matches the SQL
    twin: support = pair/n, conf = pair/cnt_a, lift = (pair*n)/(cnt_a*cnt_b)."""
    import ray.data
    from ray.data.aggregate import Sum

    SHIFT = 1 << 20
    num_buckets = 64

    lp = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        o = t.column("l_orderkey").to_numpy().astype(np.int64)
        p = t.column("l_partkey").to_numpy().astype(np.int64)
        return pa.table(
            {"_bucket": pa.array((o % num_buckets).astype(np.int64), pa.int64()),
             "op": pa.array(o * SHIFT + p, pa.int64())}
        )

    def expand(group: pa.Table) -> pa.Table:
        # in-bucket distinct == global distinct (order -> one bucket); emits
        # ordered pairs a<b plus per-part order-count partials (part, -1)
        op = np.unique(group.column("op").to_numpy())
        okey = op // SHIFT
        part = op - okey * SHIFT
        n = len(op)
        if n == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        seg_start = np.concatenate([[0], np.nonzero(np.diff(okey))[0] + 1])
        seg_end = np.concatenate([seg_start[1:], [n]])
        seg_of = np.repeat(np.arange(len(seg_start)), seg_end - seg_start)
        partners = seg_end[seg_of] - np.arange(n) - 1
        total = int(partners.sum())
        a_idx = np.repeat(np.arange(n), partners)
        csum = np.concatenate([[0], np.cumsum(partners)])
        off = np.arange(total) - np.repeat(csum[:-1], partners) + 1
        b_idx = a_idx + off
        pk, ck = np.unique(part[a_idx] * SHIFT + part[b_idx], return_counts=True)
        # per-part order counts share the exchange under key = part (SHIFT=0 lane)
        sk, sc = np.unique(part, return_counts=True)
        return pa.table(
            {"key": pa.array(np.concatenate([pk, -sk - 1]), pa.int64()),
             "c": pa.array(np.concatenate([ck, sc]), pa.int64())}
        )

    def _expand_groups(group: pa.Table) -> pa.Table:
        return expand(group)

    agg = pa.Table.from_pandas(
        lp.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(_expand_groups, batch_format="pyarrow")
        .groupby("key", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas(),
        preserve_index=False,
    )
    key = agg.column("key").to_numpy()
    cnt = agg.column("n").to_numpy().astype(np.float64)
    is_part = key < 0
    pids = (-key[is_part] - 1).astype(np.int64)
    order_cnt = dict(zip(pids.tolist(), cnt[is_part].tolist()))
    pk = key[~is_part]
    pair_n = cnt[~is_part]
    a = (pk // SHIFT).astype(np.int64)
    b = (pk - a * SHIFT).astype(np.int64)
    keep = pair_n >= min_pair_orders
    a, b, pair_n = a[keep], b[keep], pair_n[keep]
    n_orders = float(
        pa.Table.from_pandas(
            ray.data.read_parquet(
                os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
            ).map_batches(
                lambda t: pa.table(
                    {"o": pa.array(np.unique(t.column("l_orderkey").to_numpy()))}
                ),
                batch_format="pyarrow",
            ).groupby("o", num_partitions=_nparts(sf_dir)).count().to_pandas(),
            preserve_index=False,
        ).num_rows
    )
    ca = np.array([order_cnt[int(x)] for x in a])
    cb = np.array([order_cnt[int(x)] for x in b])
    support = np.round(pair_n / n_orders, 6)
    conf = np.round(pair_n / ca, 6)
    lift = np.round(pair_n * n_orders / (ca * cb), 6)
    order = np.lexsort((b, a, -lift))[:k]
    return pa.table(
        {"part_a": pa.array(a[order], pa.int64()),
         "part_b": pa.array(b[order], pa.int64()),
         "n_orders": pa.array(pair_n[order].astype(np.int64), pa.int64()),
         "support": pa.array(support[order], pa.float64()),
         "confidence": pa.array(conf[order], pa.float64()),
         "lift": pa.array(lift[order], pa.float64())}
    )


def event_type_transitions(sf_dir: str, k: int = 20):
    """First-order Markov transitions over each user's time-ordered event
    stream: count (prev_type -> type) pairs and the per-source transition
    probability. Shape: user-hash bucket shuffle (a user's events land in
    one group), in-group vectorized lexsort + shift for the lag — the
    same distributed-lag structure as user_interevent_gap — then a tiny
    (type x type) aggregate. Ties inside a user's identical timestamps
    break by event_id, matching the SQL twin's ORDER BY (ts, event_id)."""
    import ray.data
    from ray.data.aggregate import Sum

    num_buckets = 64

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return batch.append_column(
            "_bucket", pa.array((u % num_buckets).astype(np.int64), pa.int64())
        )

    def trans(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy()
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = np.concatenate([[False], u[1:] == u[:-1]])
        # rows i with same[i]: (prev=et[i-1], cur=et[i]) within one user
        idx = np.nonzero(same)[0]
        if len(idx) == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"src": et[idx - 1], "dst": et[idx]})
        g = pairs.groupby(["src", "dst"], as_index=False).size()
        return pa.table(
            {"src": pa.array(g["src"], pa.string()),
             "dst": pa.array(g["dst"], pa.string()),
             "c": pa.array(g["size"].to_numpy(), pa.int64())}
        )

    def _trans_groups(group: pa.Table) -> pa.Table:
        return trans(group)

    agg = pa.Table.from_pandas(
        ev.map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_nparts(sf_dir))
        .map_groups(_trans_groups, batch_format="pyarrow")
        .to_pandas(),
        preserve_index=False,
    )
    df = agg.to_pandas().groupby(["src", "dst"], as_index=False)["c"].sum()
    tot = df.groupby("src")["c"].transform("sum").to_numpy().astype(np.float64)
    cnt = df["c"].to_numpy().astype(np.float64)
    prob = np.round(cnt / tot, 6)
    out = pa.table(
        {"src": pa.array(df["src"], pa.string()),
         "dst": pa.array(df["dst"], pa.string()),
         "n": pa.array(cnt.astype(np.int64), pa.int64()),
         "p": pa.array(prob, pa.float64())}
    )
    idx = np.lexsort((df["dst"].to_numpy(), df["src"].to_numpy(), -cnt))[:k]
    return out.take(pa.array(idx, pa.int64()))


def ann_topk_filtered(sf_dir: str, label: int = 3, k: int = 10):
    """Metadata-FILTERED vector search (the filtered-ANN problem): cosine
    top-k restricted to rows with a given ``label``. Pre-filtering at the
    READ (label predicate pushdown — only matching row groups leave
    storage) then the same broadcast-query matmul scan as ann_topk; the
    selective-filter regime where post-filtering an unfiltered ANN result
    under-fills k."""
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    q_ref = ray.put(q / np.linalg.norm(q))

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ self.q) / np.where(norms == 0, 1.0, norms)
            top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
            return pa.table(
                {"vec_id": pa.array(vec_ids[top], pa.int64()),
                 "sim": pa.array(sims[top], pa.float64())}
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("label") == label,
    )
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096,
                           concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    sims = tbl.column("sim").to_numpy()
    vec_ids = tbl.column("vec_id").to_numpy()
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


def span_first_search(
    sf_dir: str, term: str = "merge", end: int = 5, limit: int = 10
):
    """Lucene SpanFirstQuery analog through the positional index: docs
    where ``term`` occurs before token position ``end`` (0-based), ranked
    by qualifying occurrence count; first_pos = first qualifying position.
    The SQL twin filters the tokenized position stream with pos < end."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([term]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = phrase_search_table(index_dir, q, cfg, span_first=end)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "n_occ": hits.column("phrase_tf"),
         "first_pos": hits.column("first_pos")}
    )


def proximity_search_span(
    sf_dir: str, terms=("merge", "window", "join"), window: int = 6,
    limit: int = 10,
):
    """N-term proximity (Lucene span_near analog, anchored form) through
    the positional index: docs where every term occurs within ``window``
    tokens of some occurrence of the FIRST term, ranked by anchored tuple
    count — the SQL twin is the N-way positional self-join with
    abs(pos_anchor - pos_i) <= window per other term."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = phrase_search_table(index_dir, q, cfg, window=window)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "n_tuples": hits.column("phrase_tf")}
    )


def nb_train_documents(sf_dir: str, label_col: str = "lang", test_mod: int = 10):
    """Distributed multinomial Naive Bayes TRAINING over documents: the
    model is exactly the sufficient statistics, so training is one
    combiner-shaped count aggregation — per-batch (label, term, n)
    occurrence partials (vectorized over the flat Arrow token stream),
    folded by a (label, term) groupby. Returns everything inference needs:

      counts_map  ShardedFloatMap  "label\\x1fterm" -> occurrence count
                  (range-sharded in the object store — the vocabulary
                  never lands on the driver; state/kvmap.py)
      labels      sorted label list (ASC — the argmax tie-break order)
      ctot        per-label total token occurrences (len == len(labels))
      priors      per-label TRAIN doc counts
      n_train     total train docs;  v  distinct-term count (Laplace V)

    Docs with doc_id % test_mod == 0 are HELD OUT (the test split scored
    by nb_classify_documents). Laplace(+1) smoothing over the train
    vocabulary; multinomial event model (token occurrences, not presence).
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    from clip_as_service_ray.functions.tokenizer import tokenize_column_flat
    from clip_as_service_ray.state.kvmap import build_sharded_float_map

    SEP = "\x1f"
    docs = _documents(sf_dir, columns=("doc_id", label_col, "text"))

    def count_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sub = batch.filter(pa.array(ids % test_mod != 0))
        empty = pa.table(
            {"label": pa.array([], pa.string()),
             "term": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "docs_part": pa.array([], pa.int64())}
        )
        if sub.num_rows == 0:
            return empty
        tokens, lens = tokenize_column_flat(sub.column("text"))
        lab = sub.column(label_col).to_numpy(zero_copy_only=False)
        lcodes, luniq = pd.factorize(lab, sort=True)
        # per-label train-doc counts ride along under term="" (never a real
        # token: the tokenizer never emits an empty string)
        ldocs = np.bincount(lcodes, minlength=len(luniq)).astype(np.int64)
        if len(tokens) == 0:
            return pa.table(
                {"label": pa.array(luniq, pa.string()),
                 "term": pa.array([""] * len(luniq), pa.string()),
                 "n": pa.array(np.zeros(len(luniq), np.int64), pa.int64()),
                 "docs_part": pa.array(ldocs, pa.int64())}
            )
        denc = tokens.dictionary_encode()
        tcodes = denc.indices.to_numpy().astype(np.int64)
        nt = len(denc.dictionary)
        row_of_tok = np.repeat(np.arange(sub.num_rows), lens)
        combined = lcodes[row_of_tok] * nt + tcodes
        u, c = np.unique(combined, return_counts=True)
        terms = denc.dictionary.take(pa.array(u % nt, pa.int64()))
        out_labels = np.concatenate([luniq[u // nt], luniq])
        return pa.table(
            {
                "label": pa.array(out_labels, pa.string()),
                "term": pa.concat_arrays(
                    [terms.combine_chunks() if isinstance(terms, pa.ChunkedArray)
                     else terms,
                     pa.array([""] * len(luniq), pa.string())]
                ),
                "n": pa.array(
                    np.concatenate([c, np.zeros(len(luniq), np.int64)]),
                    pa.int64(),
                ),
                "docs_part": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64), ldocs]),
                    pa.int64(),
                ),
            }
        )

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["label", "term"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n", alias_name="n"), Sum("docs_part", alias_name="docs"))
        .materialize()
    )

    # small per-label reductions (L rows) + the Laplace V (one scalar)
    def label_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("label").aggregate([("n", "sum"), ("docs", "sum")])
        return g.rename_columns(["label", "tok_part", "doc_part"])

    lab_tbl = (
        counts.map_batches(label_partial, batch_format="pyarrow")
        .groupby("label", num_partitions=1)
        .aggregate(Sum("tok_part", alias_name="tot"), Sum("doc_part", alias_name="docs"))
        .to_pandas()
        .sort_values("label")
    )
    labels = lab_tbl["label"].tolist()
    ctot = lab_tbl["tot"].to_numpy().astype(np.float64)
    priors = lab_tbl["docs"].to_numpy().astype(np.float64)

    def vocab_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("term"), ""))
        u = pc.unique(t.column("term"))
        return pa.table({"term": u})

    v = float(
        counts.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("term", num_partitions=_nparts(sf_dir))
        .count()
        .count()
    )

    def to_kv(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("term"), ""))
        key = pc.binary_join_element_wise(
            t.column("label").cast(pa.string()),
            t.column("term").cast(pa.string()),
            SEP,
        )
        return pa.table({"key": key, "val": t.column("n").cast(pa.float64())})

    counts_map = build_sharded_float_map(
        counts.map_batches(to_kv, batch_format="pyarrow")
    )
    return {
        "counts_map": counts_map,
        "labels": labels,
        "ctot": ctot,
        "priors": priors,
        "n_train": float(priors.sum()),
        "v": v,
        "sep": SEP,
    }


def nb_classify_documents(sf_dir: str, label_col: str = "lang", test_mod: int = 10):
    """Train-then-score Naive Bayes text classification (the model-scoring
    operator of a training-data curation pipeline): nb_train_documents
    learns P(term|label) from the train split; this stage scores the HELD
    OUT docs (doc_id % test_mod == 0) in one streaming map_batches pass —
    per batch, per label: range-sharded count lookups, vectorized
    log-likelihoods, bincount fold to per-doc sums. Tokens outside the
    train vocabulary are dropped (standard multinomial NB); test docs with
    zero in-vocab tokens are dropped on both sides. score = round(sum ln
    P(tok|label) + ln prior, 6); pred = argmax with label-ASC tie-break on
    the ROUNDED scores (both deterministic under float reassociation).
    Fully SQL-expressible — train AND inference — so the DuckDB twin
    certifies the whole learned model, not just the plumbing."""
    model = nb_train_documents(sf_dir, label_col=label_col, test_mod=test_mod)
    from clip_as_service_ray.functions.tokenizer import tokenize_column_flat

    cmap = model["counts_map"]
    labels = model["labels"]
    ctot, priors = model["ctot"], model["priors"]
    v, n_train, sep = model["v"], model["n_train"], model["sep"]
    log_prior = np.log(priors / n_train)
    denom = np.log(ctot + v)

    def score_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sub = batch.filter(pa.array(ids % test_mod == 0))
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "pred": pa.array([], pa.string()),
             "score": pa.array([], pa.float64())}
        )
        if sub.num_rows == 0:
            return empty
        tokens, lens = tokenize_column_flat(sub.column("text"))
        if len(tokens) == 0:
            return empty
        sub_ids = sub.column("doc_id").to_numpy()
        row_of_tok = np.repeat(np.arange(sub.num_rows), lens)
        # one lookup pass per label over the batch's flat token stream;
        # the kvmap fetches only the count shards these tokens touch
        toks = tokens.to_numpy(zero_copy_only=False)
        n_tok = len(toks)
        vals = np.empty((len(labels), n_tok), dtype=np.float64)
        for i, lab in enumerate(labels):
            needles = np.asarray(
                pc.binary_join_element_wise(
                    pa.array([lab] * n_tok, pa.string()), tokens, sep
                ).to_pylist(),
                dtype=object,
            )
            vals[i] = cmap.lookup(needles)
        member = vals.sum(axis=0) > 0  # token in the train vocabulary
        scores = np.empty((len(labels), sub.num_rows), dtype=np.float64)
        for i in range(len(labels)):
            contrib = np.log(vals[i][member] + 1.0) - denom[i]
            scores[i] = (
                np.bincount(
                    row_of_tok[member], weights=contrib, minlength=sub.num_rows
                )
                + log_prior[i]
            )
        scores = np.round(scores, 6)
        has_tok = np.bincount(row_of_tok[member], minlength=sub.num_rows) > 0
        pred_idx = np.argmax(scores, axis=0)  # first max == label-ASC ties
        best = scores[pred_idx, np.arange(sub.num_rows)]
        lab_arr = np.asarray(labels, dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(sub_ids[has_tok], pa.int64()),
                "pred": pa.array(lab_arr[pred_idx][has_tok], pa.string()),
                "score": pa.array(best[has_tok], pa.float64()),
            }
        )

    return _documents(sf_dir, columns=("doc_id", "text")).map_batches(
        score_batch, batch_format="pyarrow"
    )


def ann_hnsw_topk(
    sf_dir: str,
    k: int = 10,
    n_shards: int = 4,
    m: int = 8,
    ef: int = 128,
):
    """Graph ANN: shard-partitioned HNSW (stages/hnsw.py) — build the
    per-shard navigable-small-world graphs and score the query INSIDE one
    streaming groupby pass, merge the k-sized shard partials. With ef >=
    shard size the beam visits every reachable node, so on this corpus the
    result is the EXACT cosine top-k (pinned by tests + the brute-force SQL
    twin); at scale ef << n is the knob that buys O(ef*M*log n) search.
    Final sims recompute ann_topk's exact expression (emb @ q_unit /
    |emb|) so the twin sees identical float inputs."""
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.stages.hnsw import hnsw_topk_table

    q = _query_vector(sf_dir, 0)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    hits = hnsw_topk_table(
        ds, q, k=k, n_shards=n_shards, m=m, ef=ef
    )
    ids = hits.column("vec_id").to_numpy()
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", ids.tolist())],
    )
    vids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    qn = q / np.linalg.norm(q)
    sims = (emb @ qn) / np.where(norms == 0, 1.0, norms)
    top = np.lexsort((vids, -sims))[: min(k, len(vids))]
    return pa.table(
        {"vec_id": pa.array(vids[top], pa.int64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


# default domain-mixture weights for mixture_sample_documents: up-weight
# curated-looking sources, down-weight the rest (the "data mixture" knob of
# a training-data pipeline); any source absent from the dict gets `default`
MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.8, "src2": 0.5, "src3": 0.25}


def mixture_sample_documents(
    sf_dir: str, weights: dict | None = None, default: float = 0.1,
    mod: int = 10000,
):
    """Domain-mixture sampling (training-data mixture reweighting): each
    source s keeps a deterministic hash-fraction weights[s] of its docs —
    keep iff (doc_id * KNUTH) % mod < floor(w_s * mod). Pure int64
    arithmetic + a tiny per-source threshold map in the closure, so the
    mixture is reproducible across engines/runs/partitionings and the
    DuckDB twin is the identical expression. One streaming pass, no
    shuffle; at 100 TB this is the op that turns 'weights per domain' into
    an actual sampled corpus without materializing anything."""
    KNUTH = 2654435761
    w = dict(MIXTURE_WEIGHTS if weights is None else weights)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        src = batch.column("source").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(src, sort=True)
        thr = np.asarray(
            [int(float(w.get(s, default)) * mod) for s in uniq], dtype=np.int64
        )
        keep = (ids * KNUTH) % mod < thr[codes]
        return batch.filter(pa.array(keep))

    return _documents(sf_dir, columns=("doc_id", "source")).map_batches(
        fn, batch_format="pyarrow"
    )


def phrase_prefix_search(
    sf_dir: str, phrase: str = "merge pa*", limit: int = 10,
    max_expansions: int = 50,
):
    """match_phrase_prefix (Elasticsearch analog / Lucene MultiPhraseQuery):
    exact leading tokens followed by ANY vocabulary expansion of the final
    prefix (first `max_expansions`, lex ASC — the ES default cap of 50).
    Runs through the positional index's phrase_prefix_docs kernel: leading
    run verified exactly like phrase_docs, the prefix slot is a mask UNION
    of binary searches into each expansion's cached composite-key array
    (positions hold one token, so expansion matches are disjoint)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([phrase]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(
        index_dir, q, cfg, prefix_last=True, max_expansions=max_expansions
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "phrase_tf": hits.column("phrase_tf"),
        }
    )


def _field_slice_indexes(sf_dir: str, title_tokens: int, cfg):
    """Build (once, resumable) the two field-slice indexes shared by the
    multi_match family: ``title`` = first `title_tokens` tokens of each
    document, ``body`` = the rest, each indexed by the real pipeline with
    its OWN df/dl/avgdl statistics (the Lucene per-field model). Returns
    ``[(name, index_dir), ...]``."""
    from clip_as_service_ray.pipelines.build_index import build_index

    def field_adapter(lo: int, hi: int):
        def fields(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            tokens, lens = tokenize_column_flat(batch.column("text"))
            offsets = pa.array(
                np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            )
            lists = pa.ListArray.from_arrays(offsets, tokens)
            out = pc.binary_join(pc.list_slice(lists, lo, hi), " ")
            padded = pc.utf8_lpad(
                pc.cast(batch.column("doc_id"), pa.string()), 12, "0"
            )
            conv = pc.binary_join_element_wise(
                pa.scalar("doc"), padded, pa.scalar("-")
            )
            return pa.table(
                {"conv_id": pc.cast(conv, pa.string()),
                 "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                 "role": pa.array(["doc"] * n, pa.string()),
                 "text": pc.cast(out, pa.string())}
            )

        return fields

    out = []
    for name, lo, hi in (
        ("title", 0, title_tokens), ("body", title_tokens, 1 << 30)
    ):
        index_dir = _index_dir_for(sf_dir) + f"_dismax_{name}{title_tokens}"
        src = _documents(sf_dir).map_batches(
            field_adapter(lo, hi), batch_format="pyarrow"
        )
        build_index(src, index_dir, cfg)
        out.append((name, index_dir))
    return out


def _field_search(index_dir: str, text: str, cfg):
    """Exhaustive-limit engine search of one field index for one query
    string; returns (doc_ids int64, scores float64). Exhaustive is the
    multi_match contract: every doc matching the field participates in the
    cross-field combine (the same rows BM25 had to score anyway)."""
    from clip_as_service_ray.pipelines.search import search_table

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([text]),
         "limit": pa.array([1 << 30], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()],
        dtype=np.int64,
    )
    return ids, hits.column("score").to_numpy()


def dismax_topk(
    sf_dir: str, terms=BM25_QUERY_TERMS, title_tokens: int = 8,
    tie_breaker: float = 0.3, limit: int = 10,
):
    """multi_match best_fields / Lucene DisjunctionMaxQuery: per-FIELD BM25
    (title = first `title_tokens` tokens, body = the rest, each its own
    index with its own df/dl/avgdl statistics), combined per doc as
    best + tie_breaker * (sum - best). Each field index is built by the
    real pipeline from a streaming field-slice adapter; both field score
    sets are the engine's own hit tables (exhaustive limit), merged with
    one vectorized outer combine. Missing-field scores contribute 0
    (BM25 scores are strictly positive)."""
    cfg = EngineConfig(num_index_partitions=4)
    field_scores = {
        name: _field_search(index_dir, " ".join(terms), cfg)
        for name, index_dir in _field_slice_indexes(sf_dir, title_tokens, cfg)
    }

    all_ids = np.unique(
        np.concatenate([ids for ids, _ in field_scores.values()])
    )
    per_field = np.zeros((len(field_scores), len(all_ids)), dtype=np.float64)
    for i, (ids, sc) in enumerate(field_scores.values()):
        per_field[i, np.searchsorted(all_ids, ids)] = sc
    best = per_field.max(axis=0)
    total = per_field.sum(axis=0)
    score = np.round(best + tie_breaker * (total - best), 6)
    top = np.lexsort((all_ids, -score))[: min(limit, len(all_ids))]
    return pa.table(
        {"doc_id": pa.array(all_ids[top], pa.int64()),
         "score": pa.array(score[top], pa.float64())}
    )


def multi_match_most_fields(
    sf_dir: str, terms=BM25_QUERY_TERMS, title_tokens: int = 8,
    limit: int = 10,
):
    """ES multi_match ``most_fields``: per-field BM25 over the same
    title/body field-slice indexes as dismax_topk (each field its own
    df/dl/avgdl), combined per doc as the SUM of field scores — the
    "more fields that match, the better" mode (vs best_fields' max +
    tie_breaker). Sum of two per-field totals is order-independent in
    IEEE, so the 6-dp round matches the SQL twin exactly."""
    cfg = EngineConfig(num_index_partitions=4)
    field_scores = {
        name: _field_search(index_dir, " ".join(terms), cfg)
        for name, index_dir in _field_slice_indexes(sf_dir, title_tokens, cfg)
    }

    all_ids = np.unique(
        np.concatenate([ids for ids, _ in field_scores.values()])
    )
    total = np.zeros(len(all_ids), dtype=np.float64)
    for ids, sc in field_scores.values():
        total[np.searchsorted(all_ids, ids)] += sc
    score = np.round(total, 6)
    top = np.lexsort((all_ids, -score))[: min(limit, len(all_ids))]
    return pa.table(
        {"doc_id": pa.array(all_ids[top], pa.int64()),
         "score": pa.array(score[top], pa.float64())}
    )


def multi_match_cross_fields(
    sf_dir: str, terms=BM25_QUERY_TERMS, title_tokens: int = 8,
    limit: int = 10,
):
    """ES multi_match ``cross_fields`` / Lucene BlendedTermQuery: term-
    centric scoring where per-term document frequencies are BLENDED across
    fields so a term that is rare in every single field but common across
    the pair stops being over-weighted. Contract (documented, SQL-certified):

      df_blend(t) = max over fields of df_field(t)      (ES blended-df rule)
      N_blend     = max over fields of N_field
      score(d)    = sum over terms t of
                      max over fields f of
                        [engine BM25 score of t in f] * (idf_blend / idf_f)

    The per-field, per-term leg is the engine's OWN single-term hit table
    (exhaustive limit) — the rescale multiplies each field score by one
    scalar ratio, so the float expression order (field_score * (idf_b /
    idf_f)) is replicated verbatim in the SQL twin. Per-term max across
    fields is exact; the final sum over the two query terms is order-
    independent in IEEE."""
    import pyarrow.parquet as pq

    from clip_as_service_ray.functions import bm25
    from clip_as_service_ray.state import manifest as mf

    cfg = EngineConfig(num_index_partitions=4)
    field_dirs = _field_slice_indexes(sf_dir, title_tokens, cfg)

    # per-field integer stats (exact): N_f from stats.json, df_f(t) from the
    # dictionary parquet — no reader construction, no postings touched
    stats = {}
    for name, index_dir in field_dirs:
        st = mf.read_json(os.path.join(index_dir, "stats.json"))
        dic = pq.read_table(
            os.path.join(index_dir, "dictionary"), columns=["term", "df"]
        )
        mask = pc.is_in(dic.column("term"), pa.array(list(terms)))
        dic = dic.filter(mask)
        dfs = dict(zip(dic.column("term").to_pylist(),
                       dic.column("df").to_numpy().tolist()))
        stats[name] = (int(st["n_docs"]), dfs)

    n_blend = max(n for n, _ in stats.values())
    per_term_field = {}  # (term, field) -> (ids, rescaled scores)
    for term in terms:
        df_blend = max(dfs.get(term, 0) for _, dfs in stats.values())
        idf_blend = float(bm25.idf(float(df_blend), n_blend))
        for name, index_dir in field_dirs:
            n_f, dfs = stats[name]
            df_f = dfs.get(term, 0)
            if df_f == 0:
                continue
            ids, sc = _field_search(index_dir, term, cfg)
            idf_f = float(bm25.idf(float(df_f), n_f))
            per_term_field[(term, name)] = (ids, sc * (idf_blend / idf_f))

    if not per_term_field:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    all_ids = np.unique(
        np.concatenate([ids for ids, _ in per_term_field.values()])
    )
    total = np.zeros(len(all_ids), dtype=np.float64)
    for term in sorted(set(terms)):
        best = np.zeros(len(all_ids), dtype=np.float64)
        for name, _ in field_dirs:
            leg = per_term_field.get((term, name))
            if leg is None:
                continue
            ids, sc = leg
            cur = np.zeros(len(all_ids), dtype=np.float64)
            cur[np.searchsorted(all_ids, ids)] = sc
            best = np.maximum(best, cur)
        total += best
    score = np.round(total, 6)
    top = np.lexsort((all_ids, -score))[: min(limit, len(all_ids))]
    return pa.table(
        {"doc_id": pa.array(all_ids[top], pa.int64()),
         "score": pa.array(score[top], pa.float64())}
    )


def bm25_topk_boosting(
    sf_dir: str, terms=BM25_QUERY_TERMS, negative: str = "slow",
    negative_boost: float = 0.5, limit: int = 10,
):
    """ES `boosting` query (soft NOT): exact OR-semantics BM25 where docs
    matching ANY token of the per-query ``negative`` text keep their slot
    but have their score multiplied by ``negative_boost`` BEFORE top-k —
    demotion, not exclusion (the `exclude` column is the hard form).
    Non-demoted survivor scores are bit-identical to bm25_topk's; demoted
    scores are exactly score * negative_boost (one multiply on both
    engines, exact for 0.5)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32()),
         "negative": pa.array([negative], pa.string())}
    )
    hits = search_table(index_dir, queries, cfg, boosting=negative_boost)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_rank_feature(
    sf_dir: str, terms=BM25_QUERY_TERMS, field: str = "n_chars",
    pivot: float = 150.0, weight: float = 2.0, limit: int = 10,
):
    """ES ``rank_feature`` query (boost_mode sum): every matching doc's BM25
    score gets weight * saturation(v) = weight * v/(v+pivot) ADDED before
    top-k — the additive static-signal boost (pagerank/popularity shape),
    vs the multiplicative decay/fvf curves. Same index-time doc-values
    artifact as the decay query; only the combine differs
    (kind="rank_feature")."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    def fmt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                field: batch.column(field),
            }
        )

    import ray.data

    src = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", field]
    ).map_batches(fmt, batch_format="pyarrow")
    build_doc_values(src, index_dir, field, cfg)

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg,
        decay={"kind": "rank_feature", "field": field,
               "function": "saturation", "pivot": pivot, "weight": weight},
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def customers_near_point(
    sf_dir: str, lat0: float = 12.0, lon0: float = 77.0,
    radius_km: float = 2500.0,
):
    """Geo-distance query (the ES geo_distance filter + sort): customers
    within ``radius_km`` of a point, nearest first. The tables carry no
    coordinates, so each customer gets DETERMINISTIC synthetic ones derived
    from c_custkey (exact integer arithmetic, reproducible in SQL), and the
    great-circle distance is the standard haversine — float parity with the
    SQL twin comes from the identical expression shape on both sides
    (deg2rad as the same double literal, explicit multiplications, no
    pow/radians). Per-batch vectorized trig; the filter runs in the scan,
    so the result is selectivity-sized."""
    import ray.data

    R = 6371.0
    # pi/180 as an explicit double literal: both engines multiply by the
    # SAME constant (radians() could associate (x*pi)/180 differently)
    DEG = 0.017453292519943295

    def within(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        lat = (ck * 7919 % 18000) / 100.0 - 90.0
        lon = (ck * 104729 % 36000) / 100.0 - 180.0
        sdp = np.sin((lat - lat0) * DEG / 2.0)
        sdl = np.sin((lon - lon0) * DEG / 2.0)
        a = sdp * sdp + np.cos(lat0 * DEG) * np.cos(lat * DEG) * (sdl * sdl)
        d = 2.0 * R * np.arcsin(np.sqrt(a))
        keep = d <= radius_km
        return pa.table(
            {"c_custkey": pa.array(ck[keep], pa.int64()),
             "dist_km": pa.array(np.round(d[keep], 6), pa.float64())}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    out = ds.map_batches(within, batch_format="pyarrow")
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if not tbl.num_rows:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "dist_km": pa.array([], pa.float64())}
        )
    return tbl.sort_by([("dist_km", "ascending"), ("c_custkey", "ascending")])


def customer_geotile_grid(sf_dir: str, zoom: int = 5, k: int = 20):
    """ES ``geotile_grid`` aggregation: bucket every customer's synthetic
    coordinate (same deterministic c_custkey derivation as
    customers_near_point) into a web-mercator z/x/y tile and count per
    cell, top-k by count. The tile math is the standard slippy-map formula
    with ES's latitude clamp (±85.05112878); the SQL twin replicates the
    exact expression shape (same double literals for deg2rad and pi,
    identical clamp/floor order), and both sides clip the tile index into
    [0, 2^zoom - 1] so boundary rounding cannot produce an out-of-range
    cell. Per-batch partial counts (at most 4^zoom tiny rows per batch)
    are the only thing shuffled."""
    import ray.data

    DEG = 0.017453292519943295
    PI = 3.141592653589793
    n = float(1 << zoom)

    def tiles(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        lat = (ck * 7919 % 18000) / 100.0 - 90.0
        lon = (ck * 104729 % 36000) / 100.0 - 180.0
        latc = np.minimum(np.maximum(lat, -85.05112878), 85.05112878)
        x = np.floor((lon + 180.0) / 360.0 * n)
        rad = latc * DEG
        y = np.floor(
            (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / PI) / 2.0 * n
        )
        x = np.minimum(np.maximum(x, 0.0), n - 1.0).astype(np.int64)
        y = np.minimum(np.maximum(y, 0.0), n - 1.0).astype(np.int64)
        comb = x * (1 << zoom) + y
        u, cnt = np.unique(comb, return_counts=True)
        return pa.table(
            {"x": pa.array(u // (1 << zoom), pa.int64()),
             "y": pa.array(u % (1 << zoom), pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    parts = ds.map_batches(tiles, batch_format="pyarrow").to_pandas()
    summed = parts.groupby(["x", "y"], as_index=False)["n"].sum()
    summed["tile"] = (
        str(zoom) + "/" + summed["x"].astype(str) + "/" + summed["y"].astype(str)
    )
    summed = summed.sort_values(
        ["n", "tile"], ascending=[False, True]
    ).head(k)
    return pa.table(
        {"tile": pa.array(summed["tile"].tolist(), pa.string()),
         "cnt": pa.array(summed["n"].astype("int64").tolist(), pa.int64())}
    )


def dominant_part_suppliers_q20(
    sf_dir: str, name_like: str = "widget", year: int = 1997,
    share: float = 0.25,
):
    """TPC-H Q20 analog — suppliers dominating a part's supply: suppliers
    who shipped more than ``share`` of a matching part's total shipped
    quantity in ``year`` (no partsupp table in this corpus; Q20's
    availqty-vs-half-shipped test becomes a shipped-share test over the
    same join graph). Matching parts broadcast into the fact scan;
    per-(part, supplier) sums are a combiner + one groupby; the per-part
    total and share test run on the aggregate-sized result; survivors (a
    handful of supplier keys) map to names via a filtered dimension read.
    The share compare is exact both sides: integral quantity sums and
    share=0.25 make q > share*total order-independent."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    part = part.filter(
        pc.match_substring(part.column("p_name"), name_like)
    ).select(["p_partkey"]).rename_columns(["l_partkey"])
    part = part.append_column(
        "_m", pa.array(np.ones(part.num_rows, dtype=np.int8))
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
             "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
             "q": pc.cast(batch.column("l_quantity"), pa.float64())}
        )
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "q_part"])

    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))
    per_ps = (
        broadcast_hash_join(
            ray.data.read_parquet(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_partkey", "l_suppkey", "l_quantity"],
                filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
            ),
            part, left_key="l_partkey", right_key="l_partkey",
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"], num_partitions=_nparts(sf_dir))
        .aggregate(Sum("q_part", alias_name="q"))
    )
    ps = pa.Table.from_pandas(per_ps.to_pandas(), preserve_index=False)
    if not ps.num_rows:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string())}
        )
    tot = ps.group_by("l_partkey").aggregate([("q", "sum")])
    tot_map = dict(
        zip(tot.column("l_partkey").to_pylist(), tot.column("q_sum").to_pylist())
    )
    pk = ps.column("l_partkey").to_pylist()
    q = ps.column("q").to_numpy()
    tq = np.array([tot_map[k] for k in pk], dtype=np.float64)
    winners = sorted(
        {int(s) for s, keep in
         zip(ps.column("l_suppkey").to_pylist(), q > share * tq) if keep}
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    supp = supp.filter(
        pc.is_in(supp.column("s_suppkey").cast(pa.int64()),
                 value_set=pa.array(winners, pa.int64()))
    ).sort_by("s_suppkey")
    return pa.table(
        {"s_suppkey": supp.column("s_suppkey").cast(pa.int64()),
         "s_name": supp.column("s_name").cast(pa.string())}
    )


def bm25_topk_terms_set(
    sf_dir: str, terms=("merge", "window", "scan"), field: str = "req_terms",
    limit: int = 10,
):
    """ES ``terms_set`` query: each doc carries its OWN
    minimum_should_match floor in a doc-values field
    (minimum_should_match_field) — here req = doc_id % 2 + 1, so even docs
    need any 1 of the 3 query terms and odd docs need 2 distinct ones.
    Survivor scores are bit-identical to plain OR scores (the floor is a
    candidate filter, not a scoring change)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.docvalues import build_doc_values
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    def fmt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 12, "0")
        conv = pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))
        return pa.table(
            {
                "conv_id": pc.cast(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(len(ids), dtype=np.int32), pa.int32()),
                field: pa.array((ids % 2 + 1).astype(np.float64), pa.float64()),
            }
        )

    import ray.data

    src = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(fmt, batch_format="pyarrow")
    build_doc_values(src, index_dir, field, cfg)

    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, terms_set=field)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "score": pa.array(scores, pa.float64())}
    )


def ann_topk_bq(sf_dir: str, k: int = 10, pool_per_batch: int = 96):
    """Binary-quantized (1-bit) ANN: the sign-bit Hamming scan + exact
    refine (Lucene BQ / FAISS binary index family — 32x smaller than
    float32, the most compressed member next to ann_topk_sq8's int8).
    Coarse phase packs each unit vector's signs into bytes and ranks by
    Hamming distance to the query's sign pattern (vectorized XOR +
    per-byte popcount lookup); a generous per-batch pool then gets an
    exact-cosine refine over ONLY the pooled ids (vec-id pushdown). With
    pool >> k the 1-bit margin keeps the true top-k inside the pool, so
    the result — and the SQL twin — are EXACTLY ann_topk's (pytest pins
    equality vs sq8/exact; pool size is the honest recall knob)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    qu = q / np.linalg.norm(q)
    qcode = np.packbits(qu >= 0.0)
    q_ref = ray.put(qcode)
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
        axis=1
    ).astype(np.int32)

    class Coarse:
        def __init__(self):
            self.qcode = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            codes = np.packbits(emb >= 0.0, axis=1)  # sign bits; norm-free
            ham = popcnt[np.bitwise_xor(codes, self.qcode[None, :])].sum(axis=1)
            order = np.lexsort((vec_ids, ham))  # Hamming ASC, id ASC
            top = order[: min(pool_per_batch, len(vec_ids))]
            return pa.table({"vec_id": pa.array(vec_ids[top], pa.int64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pool_ids = (
        pa.Table.from_pandas(
            ds.map_batches(Coarse, batch_format="pyarrow",
                           batch_size=4096, concurrency=2).to_pandas(),
            preserve_index=False,
        ).column("vec_id").to_numpy()
    )
    ref = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", np.unique(pool_ids).tolist())],
    )
    vec_ids = ref.column("vec_id").to_numpy()
    emb = np.array(ref.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    sims = (emb @ qu) / np.where(norms == 0, 1.0, norms)
    top = np.lexsort((vec_ids, -sims))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "sim": pa.array(np.round(sims[top], 6), pa.float64())}
    )


def event_value_dense_rank(sf_dir: str):
    """dense_rank() OVER (PARTITION BY event_type ORDER BY value) via the
    DISTRIBUTED dense-rank window (stages/rank.dense_rank_by_key): one
    global (key, value) sort, O(1)-size block summaries carrying the
    boundary runs' distinct-pair counts, a driver scan, then one vectorized
    segmented-cumsum pass per block — no per-group materialization at any
    key cardinality. Output is bounded by the event_id % 97 == 0 sample
    (applied AFTER ranking; the rank depends on every row)."""
    import ray.data

    from clip_as_service_ray.stages.rank import dense_rank_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value", "event_id"],
    )
    ranked = dense_rank_by_key(
        ds, key="event_type", value="value", id_col="event_id"
    )

    def sample(batch: pa.Table) -> pa.Table:
        keep = (batch.column("event_id").to_numpy() % 97) == 0
        return batch.filter(pa.array(keep))

    out = ranked.map_batches(sample, batch_format="pyarrow").sort("event_id")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()), "dr": pa.array([], pa.int64())}
        )
    return t.select(["event_id", "dr"])


def event_next_value_drop(sf_dir: str):
    """lead(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id)
    via the DISTRIBUTED lead window (stages/rank.lead_by_key — the backward
    mirror of lag_by_key: the only cross-block state is the next block's
    first value). Per event_type: adjacent descents / ascents and the
    largest single-step drop. Counts are exact integers; max picks one
    bit-identical subtraction, so no rounding is needed on either side."""
    import ray.data

    from clip_as_service_ray.stages.rank import lead_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value", "event_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "t": pc.cast(batch.column("ts"), pa.int64()),
                "value": batch.column("value"),
                "event_id": batch.column("event_id"),
            }
        )

    led = lead_by_key(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="event_type", value="value", id_col="event_id",
        sort_cols=["event_type", "t", "event_id"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("lead")))
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "d": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "m": pa.array([], pa.float64()),
                }
            )
        v = t.column("value").to_numpy()
        nxt = t.column("lead").to_numpy()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        diff = v - nxt
        types, codes = np.unique(et, return_inverse=True)
        drops = np.bincount(codes, weights=(diff > 0), minlength=len(types))
        rises = np.bincount(codes, weights=(diff < 0), minlength=len(types))
        mx = np.full(len(types), -np.inf)
        dmask = diff > 0
        np.maximum.at(mx, codes[dmask], diff[dmask])
        return pa.table(
            {
                "event_type": pa.array(types.tolist(), pa.string()),
                "d": pa.array(drops.astype(np.int64), pa.int64()),
                "r": pa.array(rises.astype(np.int64), pa.int64()),
                "m": pa.array(mx, pa.float64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        d = int(np.sum(group.column("d").to_numpy()))
        r = int(np.sum(group.column("r").to_numpy()))
        m = float(np.max(group.column("m").to_numpy()))
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_drops": pa.array([d], pa.int64()),
                "n_rises": pa.array([r], pa.int64()),
                "max_drop": pa.array(
                    [m] if np.isfinite(m) else [None], pa.float64()
                ),
            }
        )

    out = (
        led.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .map_groups(finalize, batch_format="pyarrow")
        .sort("event_type")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_drops": pa.array([], pa.int64()),
                "n_rises": pa.array([], pa.int64()),
                "max_drop": pa.array([], pa.float64()),
            }
        )
    return t.select(["event_type", "n_drops", "n_rises", "max_drop"])


def user_above_first_count(sf_dir: str):
    """first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    via the DISTRIBUTED first-value window (stages/rank.first_value_by_key:
    one carried (key, first) pair of cross-block state). Per user: the
    first event's value and how many later events exceeded it. The first
    value is a raw parquet double and the comparison is exact, so both
    engines agree bit-for-bit with no rounding."""
    import ray.data

    from clip_as_service_ray.stages.rank import first_value_by_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value", "event_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "t": pc.cast(batch.column("ts"), pa.int64()),
                "value": batch.column("value"),
                "event_id": batch.column("event_id"),
            }
        )

    fv = first_value_by_key(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id", value="value", id_col="event_id",
        sort_cols=["user_id", "t", "event_id"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "f": pa.array([], pa.float64()),
                    "a": pa.array([], pa.int64()),
                }
            )
        uid = batch.column("user_id").to_numpy()
        v = batch.column("value").to_numpy()
        f = batch.column("first").to_numpy()
        users, codes = np.unique(uid, return_inverse=True)
        above = np.bincount(codes, weights=(v > f), minlength=len(users))
        firsts = np.empty(len(users))
        firsts[codes] = f  # constant per user; any element works
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "f": pa.array(firsts, pa.float64()),
                "a": pa.array(above.astype(np.int64), pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array(
                    [group.column("user_id")[0].as_py()], pa.int64()
                ),
                "first_val": pa.array(
                    [float(group.column("f")[0].as_py())], pa.float64()
                ),
                "n_above": pa.array(
                    [int(np.sum(group.column("a").to_numpy()))], pa.int64()
                ),
            }
        )

    out = (
        fv.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=_nparts(sf_dir))
        .map_groups(finalize, batch_format="pyarrow")
        .sort("user_id")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "first_val": pa.array([], pa.float64()),
                "n_above": pa.array([], pa.int64()),
            }
        )
    return t.select(["user_id", "first_val", "n_above"])


def events_moving_median(sf_dir: str, window: int = 7):
    """ES ``moving_percentiles`` pipeline aggregation: exact p25/median/p75
    over a trailing ``window``-day frame of the daily value sums. Daily
    sums come from distributed per-batch partials and ROUND to 6 BEFORE the
    window pass, so the engine and the SQL twin interpolate over identical
    inputs (a raw float daily sum could differ in the last ulp between
    summation orders); the window statistics are np.quantile
    method='linear' == quantile_cont (the stages/rank.py equivalence)."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        day = e // DAY_US
        v = batch.column("value").to_numpy()
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), dtype=np.float64)
        np.add.at(s, inv, v)
        return pa.table(
            {"day": pa.array(u, pa.int64()),
             "s": pa.array(s, pa.float64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("day", as_index=False)["s"].sum().sort_values("day")
    days = agg["day"].to_numpy().astype(np.int64)
    sv = np.round(agg["s"].to_numpy(), 6)  # shared inputs with the twin
    med = np.empty(len(sv))
    p25 = np.empty(len(sv))
    p75 = np.empty(len(sv))
    for i in range(len(sv)):
        w = sv[max(0, i - (window - 1)) : i + 1]
        p25[i], med[i], p75[i] = np.quantile(w, [0.25, 0.5, 0.75],
                                             method="linear")
    return pa.table(
        {"day": pa.array(days, pa.int64()),
         "sv": pa.array(sv, pa.float64()),
         "p25": pa.array(np.round(p25, 6), pa.float64()),
         "med": pa.array(np.round(med, 6), pa.float64()),
         "p75": pa.array(np.round(p75, 6), pa.float64())}
    )


def events_moving_avg(sf_dir: str, window: int = 3):
    """ES ``moving_fn`` / moving-average pipeline aggregation over a daily
    date_histogram: per-day counts from distributed per-batch partials
    (exact integers), then a trailing ROWS window-1 PRECEDING..CURRENT ROW
    average computed on the bucket-sized histogram — integer window sum
    divided once, so engine and SQL produce the identical float."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        b = (e // DAY_US) * DAY_US
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False)["n"].sum().sort_values("b")
    cnt = agg["n"].to_numpy().astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(cnt)])
    lo = np.maximum(np.arange(len(cnt)) - (window - 1), 0)
    wsum = csum[np.arange(1, len(cnt) + 1)] - csum[lo]
    wlen = np.arange(1, len(cnt) + 1) - lo
    mavg = wsum.astype(np.float64) / wlen
    return pa.table(
        {
            "day": pa.array(
                agg["b"].to_numpy().astype(np.int64), pa.timestamp("us")
            ),
            "cnt": pa.array(cnt, pa.int64()),
            "mavg": pa.array(mavg, pa.float64()),
        }
    )


def events_adjacency_matrix(sf_dir: str):
    """ES ``adjacency_matrix`` aggregation: three filters over events —
    a: value > 60, b: event_type IN ('click','view'), c: user_id % 3 == 0 —
    and the doc count of every filter and pairwise intersection ('a&b'
    keys, ES naming). Per batch the (n, 3) boolean matrix collapses to one
    3x3 integer partial (bools.T @ bools); only those 9 scalars leave the
    worker. Empty intersections are dropped (the ES contract)."""
    import ray.data

    names = ["a", "b", "c"]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        et = batch.column("event_type")
        u = batch.column("user_id").to_numpy()
        b0 = v > 60
        b1 = pc.is_in(
            et, value_set=pa.array(["click", "view"])
        ).to_numpy(zero_copy_only=False)
        b2 = (u % 3) == 0
        m = np.stack([b0, b1, b2], axis=1).astype(np.int64)
        g = m.T @ m  # 3x3 co-occurrence counts
        return pa.table({"cell": pa.array(g.reshape(-1), pa.int64())})

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["value", "event_type", "user_id"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()["cell"]
        .to_numpy()
        .reshape(-1, 9)
        .sum(axis=0)
        .reshape(3, 3)
    )
    keys, counts = [], []
    for i in range(3):
        for j in range(i, 3):
            c = int(parts[i, j])
            if c > 0:
                keys.append(names[i] if i == j else f"{names[i]}&{names[j]}")
                counts.append(c)
    order = np.argsort(np.asarray(keys, dtype=object))
    return pa.table(
        {
            "key": pa.array([keys[i] for i in order], pa.string()),
            "cnt": pa.array([counts[i] for i in order], pa.int64()),
        }
    )


RANK_EVAL_PAIRS = (
    ("merge", "sort"),
    ("window", "scan"),
    ("hash", "join"),
    ("vector", "batch"),
    ("stream", "filter"),
)


def search_rank_eval(sf_dir: str, pairs=RANK_EVAL_PAIRS, k: int = 10):
    """ES ``_rank_eval`` API analog: NDCG@k, MRR, and precision@k for a set
    of single-term queries scored BY THE ENGINE against graded relevance
    judgments rel(q, doc) = tf of the query's paired intent term (exact
    integers both engines can recompute). One distributed pass computes the
    judgments: per batch, the retrieved docs' gains (the retrieved set is a
    Q*k broadcast) plus a per-batch partial top-k per query for the IDEAL
    ranking — only O(Q*k) rows leave any worker, never the corpus. DCG uses
    position weights 1/log2(pos+1) added in ascending-position order with
    ``math.log2`` literals, so the SQL twin (same literal constants, same
    left-associated chain) produces bit-identical sums."""
    import math

    import ray
    import ray.data

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    Q = len(pairs)
    queries = pa.table(
        {
            "query_id": pa.array(range(Q), pa.int64()),
            "text": pa.array([p[0] for p in pairs]),
            "limit": pa.array([k] * Q, pa.int32()),
        }
    )
    hits = search_table(index_dir, queries, cfg)
    hq = hits.column("query_id").to_numpy()
    hd = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], dtype=np.int64
    )
    hs = hits.column("score").to_numpy()
    retrieved = {}  # query_id -> doc_ids in rank order (score DESC, doc ASC)
    for qi in range(Q):
        m = hq == qi
        order = np.lexsort((hd[m], -hs[m]))
        retrieved[qi] = hd[m][order][:k]

    intent_terms = [p[1] for p in pairs]
    retr_ref = ray.put({qi: np.sort(v) for qi, v in retrieved.items()})

    def judge(batch: pa.Table) -> pa.Table:
        """Emit (kind, query_id, doc_id, g): kind 0 = retrieved-doc gain,
        kind 1 = ideal-ranking candidate (per-batch top-k by gain)."""
        retr = ray.get(retr_ref)
        doc_ids = batch.column("doc_id").to_numpy()
        tokens, lens = tokenize_column_flat(batch.column("text"))
        row_of_tok = np.repeat(np.arange(len(doc_ids)), lens)
        toks = tokens.to_numpy(zero_copy_only=False)
        kinds, qids, dids, gs = [], [], [], []
        for qi, term in enumerate(intent_terms):
            m = toks == term
            tf = np.bincount(row_of_tok[m], minlength=len(doc_ids))
            nz = np.nonzero(tf)[0]
            if len(nz) == 0:
                continue
            # ideal candidates: this batch's top-k by (gain DESC, doc ASC)
            cand = nz[np.lexsort((doc_ids[nz], -tf[nz]))][:k]
            kinds.append(np.ones(len(cand), np.int8))
            qids.append(np.full(len(cand), qi, np.int64))
            dids.append(doc_ids[cand])
            gs.append(tf[cand].astype(np.int64))
            # retrieved-doc gains
            rmask = np.isin(doc_ids[nz], retr[qi])
            if rmask.any():
                rn = nz[rmask]
                kinds.append(np.zeros(len(rn), np.int8))
                qids.append(np.full(len(rn), qi, np.int64))
                dids.append(doc_ids[rn])
                gs.append(tf[rn].astype(np.int64))
        if not kinds:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds), pa.int8()),
                "query_id": pa.array(np.concatenate(qids), pa.int64()),
                "doc_id": pa.array(np.concatenate(dids), pa.int64()),
                "g": pa.array(np.concatenate(gs), pa.int64()),
            }
        )

    rows = (
        _documents(sf_dir)
        .map_batches(judge, batch_format="pyarrow")
        .to_pandas()
    )
    weights = [math.log2(p + 1) for p in range(1, k + 1)]

    def dcg_of(gains: list[float]) -> float:
        acc = 0.0
        for p in range(k):
            g = gains[p] if p < len(gains) else 0.0
            acc = acc + g / weights[p]
        return acc

    out_q, out_t, out_ndcg, out_mrr, out_p = [], [], [], [], []
    for qi, (qterm, _iterm) in enumerate(pairs):
        sub = rows[rows["query_id"] == qi]
        got = sub[sub["kind"] == 0]
        gain_by_doc = dict(zip(got["doc_id"].tolist(), got["g"].tolist()))
        gains = [float(gain_by_doc.get(int(d), 0)) for d in retrieved[qi]]
        ideal = sub[sub["kind"] == 1]
        iv = ideal["g"].to_numpy()
        idoc = ideal["doc_id"].to_numpy()
        top = np.lexsort((idoc, -iv))[:k]
        dcg = dcg_of(gains)
        idcg = dcg_of(iv[top].astype(np.float64).tolist())
        ndcg = float(np.round(dcg / idcg, 6)) if idcg > 0 else 0.0
        rel_pos = [p + 1 for p, g in enumerate(gains) if g > 0]
        out_q.append(qi)
        out_t.append(qterm)
        out_ndcg.append(ndcg)
        out_mrr.append(1.0 / rel_pos[0] if rel_pos else 0.0)
        out_p.append(len(rel_pos) / float(k))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "query": pa.array(out_t, pa.string()),
            "ndcg": pa.array(out_ndcg, pa.float64()),
            "mrr": pa.array(out_mrr, pa.float64()),
            "p10": pa.array(out_p, pa.float64()),
        }
    )


def span_within_search(
    sf_dir: str, little: str = "join", big: str = "window join",
    limit: int = 10,
):
    """Lucene SpanWithinQuery through the positional index: occurrences of
    the ``little`` phrase ENCLOSED by an occurrence of the ``big`` phrase
    (two searchsorted probes per little start against the big phrase's
    verified start keys). SQL twin: positional self-join for the big
    starts, EXISTS range probe for the enclosure."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([little]),
            "limit": pa.array([limit], pa.int32()),
            "within_phrase": pa.array([big], pa.string()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "span_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def span_containing_search(
    sf_dir: str, term_a: str = "stream", term_b: str = "column",
    window: int = 6, little: str = "agg", limit: int = 10,
):
    """Lucene SpanContainingQuery (big = span_near(a, b, window,
    unordered)) through the positional index: qualifying (a, b) pairs whose
    position envelope contains an occurrence of the ``little`` phrase.
    span_tf = qualifying pair count, first_pos = the smallest envelope
    start. SQL twin: pair self-join + EXISTS range probe."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([f"{term_a} {term_b}"]),
            "limit": pa.array([limit], pa.int32()),
            "window": pa.array([window], pa.int32()),
            "contains_phrase": pa.array([little], pa.string()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "span_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def events_top_metrics(sf_dir: str):
    """ES ``top_metrics`` aggregation (metric at the per-group sort
    extremum, = arg_max): for each event_type, the value and event_id of
    its LATEST event, ties broken by event_id ASC so both engines are
    deterministic. Distributed argmax: each batch keeps one candidate row
    per type (vectorized lexsort-first), the tiny partials merge with the
    same rule — no sort of the raw table, no per-group materialization."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy()
        val = batch.column("value").to_numpy()
        order = np.lexsort((eid, -ts))  # ts DESC, event_id ASC
        _types, first = np.unique(et[order], return_index=True)
        pick = order[first]
        return pa.table(
            {
                "event_type": pa.array(et[pick].tolist(), pa.string()),
                "t": pa.array(ts[pick], pa.int64()),
                "event_id": pa.array(eid[pick], pa.int64()),
                "value": pa.array(val[pick], pa.float64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        ts = group.column("t").to_numpy()
        eid = group.column("event_id").to_numpy()
        i = int(np.lexsort((eid, -ts))[0])
        return pa.table(
            {
                "event_type": pa.array(
                    [group.column("event_type")[0].as_py()], pa.string()
                ),
                "latest_ts": pa.array([int(ts[i])], pa.timestamp("us")),
                "event_id": pa.array([int(eid[i])], pa.int64()),
                "value": pa.array(
                    [float(group.column("value")[i].as_py())], pa.float64()
                ),
            }
        )

    out = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "event_id", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=_nparts(sf_dir))
        .map_groups(finalize, batch_format="pyarrow")
        .sort("event_type")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "latest_ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
    return t.select(["event_type", "latest_ts", "event_id", "value"])


def terms_agg_sharded(
    sf_dir: str, n_shards: int = 4, shard_size: int = 8, size: int = 10,
):
    """ES ``terms`` aggregation EXACTLY as a sharded cluster computes it,
    including ``doc_count_error_upper_bound``: each shard (deterministic
    doc_id % n_shards routing) returns only its top ``shard_size`` terms by
    (doc count DESC, term ASC); the coordinator sums the RETURNED counts
    per candidate term and, for every shard that did not return the term,
    adds that shard's last-returned (rank shard_size) count to the term's
    error bound — the documented ES approximation contract, reproduced
    bit-for-bit in integers. The distributed piece is the per-(shard, term)
    doc-count word-count shuffle (per-batch pre-agg partials); per-shard
    tops are aggregate-sized."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_flat(batch)
        if t.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        shard = (t.column("doc_id").to_numpy() % n_shards).astype(np.int64)
        g = (
            pa.table({"shard": pa.array(shard), "term": t.column("term")})
            .group_by(["shard", "term"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "shard": g.column("shard"),
                "term": g.column("term"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    parts = (
        _documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    sh = parts.groupby(["shard", "term"], as_index=False)["c"].sum()
    returned = {}
    last_c = {}
    for s, grp in sh.groupby("shard"):
        grp = grp.sort_values(["c", "term"], ascending=[False, True])
        top = grp.head(shard_size)
        returned[int(s)] = dict(zip(top["term"], top["c"].astype(int)))
        last_c[int(s)] = (
            int(top["c"].iloc[-1]) if len(grp) >= shard_size else 0
        )
    cand: dict[str, int] = {}
    for s, tops in returned.items():
        for term, c in tops.items():
            cand[term] = cand.get(term, 0) + c
    bounds = {
        term: sum(
            lc for s, lc in last_c.items() if term not in returned[s]
        )
        for term in cand
    }
    ordered = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return pa.table(
        {
            "term": pa.array([t for t, _ in ordered], pa.string()),
            "doc_count": pa.array([c for _, c in ordered], pa.int64()),
            "doc_count_error_upper_bound": pa.array(
                [bounds[t] for t, _ in ordered], pa.int64()
            ),
        }
    )


def benchmark_contamination(sf_dir: str, n: int = 8, mod: int = 20):
    """Benchmark-contamination check (the GPT-3 / Brown et al. 2020
    appendix-C n-gram overlap protocol): the 'benchmark' set is the docs
    with doc_id % mod == 0; every other doc reports how many of its n-token
    shingles also occur in ANY benchmark doc. The benchmark gram set is a
    one-time broadcast (``ray.put``; benchmark sets are tiny next to the
    corpus), the corpus pass is one vectorized map_batches — shingles built
    from n shifted Arrow slices, membership via one ``pc.is_in`` per batch,
    per-doc totals via bincount. Exact string equality (no hashing), exact
    integer counts."""
    import ray
    import ray.data

    def grams_of(batch: pa.Table):
        """(grams pa.StringArray, row index per gram) for complete n-grams."""
        tokens, lens = tokenize_column_flat(batch.column("text"))
        L = len(tokens)
        n_rows = len(lens)
        if L < n or n_rows == 0:
            return None, None
        row = np.repeat(np.arange(n_rows), lens)
        ok = row[: L - n + 1] == row[n - 1:]
        if not ok.any():
            return None, None
        okp = pa.array(ok)
        slices = [tokens.slice(j, L - n + 1).filter(okp) for j in range(n)]
        grams = pc.binary_join_element_wise(*slices, " ")
        return grams, row[: L - n + 1][ok]

    # ---- benchmark gram set (driver-side: the benchmark is tiny)
    bench = _documents(sf_dir).map_batches(
        lambda b: b.filter(pa.array((b.column("doc_id").to_numpy() % mod) == 0)),
        batch_format="pyarrow",
    ).to_pandas()
    bt = pa.table(
        {"doc_id": pa.array(bench["doc_id"], pa.int64()),
         "text": pa.array(bench["text"], pa.string())}
    )
    bgrams, _ = grams_of(bt)
    if bgrams is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_shared": pa.array([], pa.int64())}
        )
    bset = pc.unique(
        bgrams.combine_chunks() if isinstance(bgrams, pa.ChunkedArray) else bgrams
    )
    bref = ray.put(bset)

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_shared": pa.array([], pa.int64())}
        )
        ids = batch.column("doc_id").to_numpy()
        keep = (ids % mod) != 0
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return empty
        grams, rows = grams_of(batch)
        if grams is None:
            return empty
        hit = pc.is_in(grams, value_set=ray.get(bref)).to_numpy(
            zero_copy_only=False
        )
        if not hit.any():
            return empty
        cnt = np.bincount(rows[hit], minlength=batch.num_rows)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"doc_id": pa.array(batch.column("doc_id").to_numpy()[nz], pa.int64()),
             "n_shared": pa.array(cnt[nz].astype(np.int64), pa.int64())}
        )

    out = (
        _documents(sf_dir)
        .map_batches(scan, batch_format="pyarrow")
        .sort("doc_id")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_shared": pa.array([], pa.int64())}
        )
    return t.select(["doc_id", "n_shared"])


def bm25_topk_fuzzy_transpositions(
    sf_dir: str, text: str = "lswo mrege", max_dist: int = 2, limit: int = 10,
):
    """ES-default fuzziness (Lucene FuzzyQuery ``transpositions=true``):
    expansion uses optimal-string-alignment distance, where an adjacent
    character swap costs ONE edit — 'lswo' reaches 'slow' at distance 2
    (two swaps) which plain Levenshtein prices at 3, so the expansion SET
    differs from the levenshtein mode, not just the distances. SQL twin
    expands with DuckDB's damerau_levenshtein (== OSA over this vocab)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([text]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = search_table(
        index_dir, queries, cfg, fuzzy=max_dist, fuzzy_transpositions=True
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def embedding_matrix_stats(sf_dir: str, dims: int = 4):
    """ES ``matrix_stats`` aggregation over the first ``dims`` embedding
    components: pairwise sample covariance and correlation from ONE
    distributed moment pass — each batch emits 1 + dims + dims*(dims+1)/2
    scalars (n, sums, cross-products), nothing else leaves the workers.
    Final formulas use the exact expression chain the SQL twin spells out
    (cov = (sxy - sx*sy/n) / (n-1); corr = cov / sqrt(cov_ii * cov_jj)),
    rounded to 6 decimals on both sides (the moment-partial float-parity
    pattern of events_t_test / lineitem_correlations)."""
    import ray.data

    D = dims
    pairs = [(i, j) for i in range(D) for j in range(i, D)]

    def partial(batch: pa.Table) -> pa.Table:
        emb = np.array(
            batch.column("embedding").to_pylist(), dtype=np.float64
        )[:, :D]
        n = float(len(emb))
        sx = emb.sum(axis=0)
        cross = emb.T @ emb
        vals = [n] + sx.tolist() + [cross[i, j] for i, j in pairs]
        return pa.table({"v": pa.array(vals, pa.float64())})

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()["v"]
        .to_numpy()
        .reshape(-1, 1 + D + len(pairs))
        .sum(axis=0)
    )
    n = parts[0]
    sx = parts[1 : 1 + D]
    s = {}
    for k, (i, j) in enumerate(pairs):
        s[(i, j)] = parts[1 + D + k]
    cov = {
        (i, j): (s[(i, j)] - sx[i] * sx[j] / n) / (n - 1.0) for i, j in pairs
    }
    out_i, out_j, out_cov, out_corr = [], [], [], []
    for i, j in pairs:
        out_i.append(i)
        out_j.append(j)
        out_cov.append(float(np.round(cov[(i, j)], 6)))
        out_corr.append(
            float(np.round(
                cov[(i, j)] / np.sqrt(cov[(i, i)] * cov[(j, j)]), 6
            ))
        )
    return pa.table(
        {
            "di": pa.array(out_i, pa.int64()),
            "dj": pa.array(out_j, pa.int64()),
            "cov": pa.array(out_cov, pa.float64()),
            "corr": pa.array(out_corr, pa.float64()),
        }
    )



def c4_quality_filter(sf_dir: str):
    """C4-style document cleaning rules (Raffel et al. 2020, arXiv:1910.10683
    §2.2, adapted to single-line docs), every boundary EXACT so engine and
    SQL agree bit-for-bit: keep a doc iff
      terminal punctuation count ('.'+'!'+'?') >= 3   (the ">= 3 sentences" rule)
      whitespace word count >= 5                      (the short-line rule)
      no '{'                                          (the code filter)
      no 'lorem ipsum', no 'javascript' (lowercased)  (the boilerplate filters)
    All rules are substring counts / containment — one vectorized Arrow pass,
    zero float arithmetic."""

    def rules(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        n_sent = pc.add(
            pc.add(pc.count_substring(text, "."), pc.count_substring(text, "!")),
            pc.count_substring(text, "?"),
        )
        # whitespace words = single-space runs + 1 (corpus is single-spaced;
        # the SQL twin counts the identical ' ' occurrences)
        n_words = pc.add(pc.count_substring(text, " "), 1)
        kept = pc.and_(
            pc.and_(
                pc.greater_equal(n_sent, 3),
                pc.greater_equal(n_words, 5),
            ),
            pc.and_(
                pc.equal(pc.count_substring(text, "{"), 0),
                pc.and_(
                    pc.equal(pc.count_substring(lower, "lorem ipsum"), 0),
                    pc.equal(pc.count_substring(lower, "javascript"), 0),
                ),
            ),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_sentences": pc.cast(n_sent, pa.int64()),
                "n_words": pc.cast(n_words, pa.int64()),
                "kept": kept,
            }
        )

    out = _documents(sf_dir).map_batches(rules, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_weighted_avg(sf_dir: str):
    """ES ``weighted_avg`` aggregation per event_type: value weighted by the
    deterministic integer weight ``event_id % 7 + 1``. Per-batch partials
    (sum_vw, sum_w) shuffle O(types) rows; the final divide + round(6) is
    the parity layer (partial-sum order differs from SQL's by design)."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        types, codes = np.unique(
            batch.column("event_type").to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        v = batch.column("value").to_numpy().astype(np.float64)
        w = (batch.column("event_id").to_numpy() % 7 + 1).astype(np.float64)
        return pa.table(
            {
                "event_type": pa.array(types),
                "sum_vw": pa.array(np.bincount(codes, weights=v * w), pa.float64()),
                "sum_w": pa.array(np.bincount(codes, weights=w), pa.float64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("event_type", as_index=False).sum().sort_values("event_type")
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "w_avg": pa.array(
                np.round(agg["sum_vw"].to_numpy() / agg["sum_w"].to_numpy(), 6),
                pa.float64(),
            ),
            "sum_w": pa.array(agg["sum_w"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


def customer_geo_bounds(sf_dir: str):
    """ES ``geo_bounds`` + ``geo_centroid`` aggregations per market segment
    over the same deterministic synthetic coordinates as
    ``customers_near_point`` (lat = (key*7919 % 18000)/100 - 90, lon =
    (key*104729 % 36000)/100 - 180 — exact integer derivation, so min/max
    bounds are bit-identical; centroids round(6) over the float mean)."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        seg, codes = np.unique(
            batch.column("c_mktsegment").to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        lat = (ck * 7919 % 18000) / 100.0 - 90.0
        lon = (ck * 104729 % 36000) / 100.0 - 180.0
        n = len(seg)
        top = np.full(n, -np.inf)
        bottom = np.full(n, np.inf)
        left = np.full(n, np.inf)
        right = np.full(n, -np.inf)
        np.maximum.at(top, codes, lat)
        np.minimum.at(bottom, codes, lat)
        np.minimum.at(left, codes, lon)
        np.maximum.at(right, codes, lon)
        return pa.table(
            {
                "seg": pa.array(seg),
                "top": pa.array(top, pa.float64()),
                "bottom": pa.array(bottom, pa.float64()),
                "left": pa.array(left, pa.float64()),
                "right": pa.array(right, pa.float64()),
                "sum_lat": pa.array(np.bincount(codes, weights=lat), pa.float64()),
                "sum_lon": pa.array(np.bincount(codes, weights=lon), pa.float64()),
                "n": pa.array(np.bincount(codes).astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("seg", as_index=False).agg(
        top=("top", "max"), bottom=("bottom", "min"), left=("left", "min"),
        right=("right", "max"), sum_lat=("sum_lat", "sum"),
        sum_lon=("sum_lon", "sum"), n=("n", "sum"),
    ).sort_values("seg")
    return pa.table(
        {
            "c_mktsegment": pa.array(agg["seg"].tolist(), pa.string()),
            "top": pa.array(np.round(agg["top"].to_numpy(), 6), pa.float64()),
            "bottom": pa.array(np.round(agg["bottom"].to_numpy(), 6), pa.float64()),
            "left": pa.array(np.round(agg["left"].to_numpy(), 6), pa.float64()),
            "right": pa.array(np.round(agg["right"].to_numpy(), 6), pa.float64()),
            "centroid_lat": pa.array(
                np.round(agg["sum_lat"].to_numpy() / agg["n"].to_numpy(), 6),
                pa.float64(),
            ),
            "centroid_lon": pa.array(
                np.round(agg["sum_lon"].to_numpy() / agg["n"].to_numpy(), 6),
                pa.float64(),
            ),
        }
    )


def events_weekly_serial_diff(sf_dir: str):
    """ES ``serial_diff`` pipeline aggregation (lag = 7 buckets) over the
    daily distinct-user histogram: diff[i] = users[i] - users[i-7] in bucket
    order, NULL for the first 7 buckets (the ES lag contract). Distinct
    users per day shuffle as (day, user) pairs — exact integers end to end."""
    import ray.data

    DAY_US = 86_400_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        u = batch.column("user_id").to_numpy().astype(np.int64)
        d = e // DAY_US  # day INDEX (small), not epoch-us: the composite
        # key d*2^20 + u stays far below 2^63 (user_id < 2^20 by fixture)
        key = np.unique(d * (1 << 20) + u)
        return pa.table(
            {"day": pa.array(key >> 20, pa.int64()),
             "user": pa.array(key & ((1 << 20) - 1), pa.int64())}
        )

    ds = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
        )
        .map_batches(pairs, batch_format="pyarrow")
    )
    from ray.data.aggregate import Count

    # distinct (day, user) pairs survive the unique(); count per day after a
    # pair-keyed groupby dedup
    parts = ds.groupby(["day", "user"], num_partitions=_nparts(sf_dir)).aggregate(
        Count(alias_name="c")
    ).to_pandas()
    per_day = parts.groupby("day", as_index=False)["user"].count().rename(
        columns={"user": "users"}
    ).sort_values("day")
    users = per_day["users"].to_numpy().astype(np.int64)
    diff = [None] * min(7, len(users)) + (users[7:] - users[:-7]).tolist()
    return pa.table(
        {
            "day": pa.array(
                (per_day["day"].to_numpy() * DAY_US).astype(np.int64),
                pa.int64(),
            ),
            "users": pa.array(users, pa.int64()),
            "diff7": pa.array(diff, pa.int64()),
        }
    )


def events_value_boxplot(sf_dir: str):
    """ES ``boxplot`` aggregation per event_type, EXACT and distributed:
    q1/q2/q3 via the distributed order-statistics pass
    (stages/rank.quantiles_by_key — no group materializes on one worker),
    min/max via per-batch partials, and the Tukey whiskers as the nearest
    data points inside 1.5*IQR. Whisker bounds are computed from the
    ROUND(6) quartiles on BOTH engines (identical double arithmetic), so
    the in/out verdict of every data point matches the SQL twin exactly."""
    import ray.data

    from clip_as_service_ray.stages.rank import quantiles_by_key

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])
    qs = quantiles_by_key(ds, key="event_type", value="value",
                          quantiles=[0.25, 0.5, 0.75])
    keys = sorted(qs)
    r6 = lambda x: float(np.round(float(x), 6))
    q1 = {k: r6(qs[k][0]) for k in keys}
    q2 = {k: r6(qs[k][1]) for k in keys}
    q3 = {k: r6(qs[k][2]) for k in keys}
    lo_bound = {k: q1[k] - 1.5 * (q3[k] - q1[k]) for k in keys}
    hi_bound = {k: q3[k] + 1.5 * (q3[k] - q1[k]) for k in keys}
    type_arr = pa.array([str(k) for k in keys], pa.string())
    lo_arr = np.array([lo_bound[k] for k in keys], np.float64)
    hi_arr = np.array([hi_bound[k] for k in keys], np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(
            batch.column("event_type"), value_set=type_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("value").to_numpy().astype(np.float64)
        n = len(keys)
        mn = np.full(n, np.inf)
        mx = np.full(n, -np.inf)
        np.minimum.at(mn, codes, v)
        np.maximum.at(mx, codes, v)
        # whisker candidates: values inside the per-type Tukey bounds
        wlo = np.full(n, np.inf)
        whi = np.full(n, -np.inf)
        in_lo = v >= lo_arr[codes]
        in_hi = v <= hi_arr[codes]
        np.minimum.at(wlo, codes[in_lo], v[in_lo])
        np.maximum.at(whi, codes[in_hi], v[in_hi])
        return pa.table(
            {"k": pa.array(np.arange(n), pa.int64()),
             "mn": pa.array(mn, pa.float64()), "mx": pa.array(mx, pa.float64()),
             "wlo": pa.array(wlo, pa.float64()), "whi": pa.array(whi, pa.float64())}
        )

    parts = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("k").agg(
        mn=("mn", "min"), mx=("mx", "max"), wlo=("wlo", "min"), whi=("whi", "max")
    )
    return pa.table(
        {
            "event_type": pa.array([str(k) for k in keys], pa.string()),
            "vmin": pa.array([r6(agg.loc[i, "mn"]) for i in range(len(keys))], pa.float64()),
            "vmax": pa.array([r6(agg.loc[i, "mx"]) for i in range(len(keys))], pa.float64()),
            "q1": pa.array([q1[k] for k in keys], pa.float64()),
            "q2": pa.array([q2[k] for k in keys], pa.float64()),
            "q3": pa.array([q3[k] for k in keys], pa.float64()),
            "lower": pa.array([r6(agg.loc[i, "wlo"]) for i in range(len(keys))], pa.float64()),
            "upper": pa.array([r6(agg.loc[i, "whi"]) for i in range(len(keys))], pa.float64()),
        }
    )


def search_sampler_facets(
    sf_dir: str, terms=BM25_QUERY_TERMS, shard_size: int = 100,
):
    """ES ``sampler`` aggregation: the facet (terms agg on `source`) runs
    over only the TOP ``shard_size`` best-scoring matches instead of the
    full match set (``query_facets`` is the unsampled form) — the ES trick
    for cheap aggregations on huge low-quality match tails. The sample is
    the engine's own top-k (bit-identical scores to the SQL twin's BM25
    expression, 2-term sum), so the sampled set matches exactly."""
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([shard_size], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    if not ids:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64())})
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
        filter=pc.field("doc_id").isin(pa.array(ids, pa.int64())),
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("source").aggregate([("doc_id", "count")])
        return g.rename_columns(["source", "n_part"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source", num_partitions=_nparts(sf_dir))
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return tbl.sort_by("source")


def search_diversified_sample(
    sf_dir: str, terms=BM25_QUERY_TERMS, shard_size: int = 100,
    max_per_source: int = 2, k: int = 20,
):
    """ES ``diversified_sampler``: from the top ``shard_size`` matches, keep
    at most ``max_per_source`` docs per `source` (in best-score order), then
    the best ``k`` survivors — the de-biased sample that stops one dominant
    source from flooding downstream aggregations. Hit order is the engine's
    (score DESC, doc_id ASC); survivors' scores round(6) for the wire."""
    import ray.data

    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([shard_size], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    ids = np.array([int(c[4:]) for c in hits.column("conv_id").to_pylist()],
                   np.int64)
    scores = hits.column("score").to_numpy()
    if not len(ids):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "source": pa.array([], pa.string()),
                         "score": pa.array([], pa.float64())})
    src_tbl = pa.Table.from_pandas(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source"],
            filter=pc.field("doc_id").isin(pa.array(ids, pa.int64())),
        ).to_pandas(),
        preserve_index=False,
    )
    src_of = dict(zip(src_tbl.column("doc_id").to_pylist(),
                      src_tbl.column("source").to_pylist()))
    seen: dict = {}
    out_id, out_src, out_sc = [], [], []
    for d, s in zip(ids.tolist(), scores.tolist()):
        src = src_of[d]
        c = seen.get(src, 0)
        if c < max_per_source:
            seen[src] = c + 1
            out_id.append(d)
            out_src.append(src)
            out_sc.append(round(s, 6))
            if len(out_id) == k:
                break
    return pa.table(
        {"doc_id": pa.array(out_id, pa.int64()),
         "source": pa.array(out_src, pa.string()),
         "score": pa.array(out_sc, pa.float64())}
    )


def _docs_alt_format_dir(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/cas_ray_src/{fmt}_documents_{tag}"


def _documents_as(sf_dir: str, fmt: str):
    """The documents table through an ALTERNATE source format (S1 source
    breadth): parquet -> {jsonl, csv} written ONCE per sf dir (resumable:
    skip-if-present, the T3 pattern), read back with the matching Ray Data
    reader. Both writers shard the output (one file per input block), so
    the read side parallelizes exactly like the parquet path."""
    import ray.data

    out = _docs_alt_format_dir(sf_dir, fmt)
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        ds = _documents(sf_dir)
        if fmt == "jsonl":
            ds.write_json(out)
        else:
            ds.write_csv(out)
        with open(done, "w") as f:
            f.write("ok")
    if fmt == "jsonl":
        return ray.data.read_json(
            out, file_extensions=["json", "jsonl"]
        )
    return ray.data.read_csv(out, file_extensions=["csv"])


def tokenize_terms_jsonl(sf_dir: str):
    """tokenize_terms through the JSONL source reader: identical output to
    the parquet path (the SQL twin is the same query over the same logical
    table) — certifies the JSON ingestion path end to end."""

    def fix(batch: pa.Table) -> pa.Table:
        # JSON readers may widen ints; normalize to the parquet schema
        return pa.table(
            {"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
             "text": pc.cast(batch.column("text"), pa.string())}
        )

    return (
        _documents_as(sf_dir, "jsonl")
        .map_batches(fix, batch_format="pyarrow")
        .map_batches(_tokens_flat, batch_format="pyarrow")
    )


def term_df_csv(sf_dir: str):
    """term_df through the CSV source reader (quoted-field round trip):
    identical output to the parquet path — certifies CSV ingestion."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = pa.table(
            {"doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
             "text": pc.cast(batch.column("text"), pa.string())}
        )
        t = _tokens_flat(b)
        g = t.group_by("term").aggregate([("doc_id", "count")])
        return g.rename_columns(["term", "df_part"])

    ds = _documents_as(sf_dir, "csv").map_batches(partial, batch_format="pyarrow")
    return ds.groupby("term", num_partitions=_nparts(sf_dir)).aggregate(
        Sum("df_part", alias_name="df")
    )


def doc_readability(sf_dir: str):
    """Flesch-Kincaid grade level per document (the classic readability
    score a curation pipeline gates on): grade = 0.39 * (words/sentences)
    + 11.8 * (syllables/words) - 15.59, with the standard computable
    proxies — whitespace words, terminal-punctuation sentences (floored at
    1), and vowel-group syllables ([aeiouy]+ runs, floored at 1/word ...
    approximated corpus-wide as max(groups, words)). Every count is an
    exact integer on both engines; the grade is the identical float
    expression, round(6)."""

    def fk(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        lower = pc.utf8_lower(text)
        words = pc.add(pc.count_substring(text, " "), 1).to_numpy().astype(np.int64)
        sents = pc.add(
            pc.add(pc.count_substring(text, "."), pc.count_substring(text, "!")),
            pc.count_substring(text, "?"),
        ).to_numpy().astype(np.int64)
        sents = np.maximum(sents, 1)
        syl = pc.count_substring_regex(lower, "[aeiouy]+").to_numpy().astype(np.int64)
        syl = np.maximum(syl, words)  # >= 1 syllable per word
        grade = (
            0.39 * (words.astype(np.float64) / sents.astype(np.float64))
            + 11.8 * (syl.astype(np.float64) / words.astype(np.float64))
            - 15.59
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(words, pa.int64()),
                "n_sentences": pa.array(sents, pa.int64()),
                "n_syllables": pa.array(syl, pa.int64()),
                "fk_grade": pa.array(np.round(grade, 6), pa.float64()),
            }
        )

    out = _documents(sf_dir).map_batches(fk, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def mine_hard_negatives(
    sf_dir: str, every: int = 100, offset: int = 7, m: int = 3, k: int = 5,
):
    """Hard-negative mining for contrastive training data (the DPR /
    sentence-transformers recipe): for each query doc (doc_id % every ==
    offset), its top-m TF-IDF terms become an OR query through the REAL
    engine, and the best k hits that are neither the doc itself nor an
    EXACT TEXT DUPLICATE of it are its hard negatives — high-BM25
    lookalikes that teach the embedding model fine distinctions. All query
    docs ride ONE multi-query search batch; per-qdoc term selection is
    bit-identical to the SQL twin (integer tf/df -> identical tf*ln(N/df),
    ties by term ASC)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from clip_as_service_ray.functions.tokenizer import tokenize
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table
    from clip_as_service_ray.state import manifest as mf

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)

    def pick(batch: pa.Table) -> pa.Table:
        # modulo predicate in the scan (Expression % is unsupported; this
        # filter still runs inside the read tasks, so only query docs leave)
        return batch.filter(
            pa.array(batch.column("doc_id").to_numpy() % every == offset)
        )

    qdocs = pa.Table.from_pandas(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ).map_batches(pick, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    ).sort_by("doc_id")
    qids = qdocs.column("doc_id").to_pylist()
    qtexts = dict(zip(qids, qdocs.column("text").to_pylist()))

    # one pushdown dictionary read for the UNION of all query docs' terms
    per_q: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    all_terms: set = set()
    for qid in qids:
        toks = tokenize(qtexts[qid])
        terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        per_q[qid] = (terms, tfs)
        all_terms.update(terms.tolist())
    dict_tbl = pq.read_table(
        os.path.join(index_dir, "dictionary"),
        filters=[("term", "in", sorted(all_terms))],
    )
    dterms = dict_tbl.column("term").to_numpy(zero_copy_only=False)
    ddf = dict_tbl.column("df").to_numpy().astype(np.float64)
    order = np.argsort(dterms, kind="stable")
    dterms, ddf = dterms[order], ddf[order]
    n_docs = float(mf.read_json(os.path.join(index_dir, "stats.json"))["n_docs"])

    slack = k + 50  # self + exact-text duplicates are filtered post-search
    q_texts_out = []
    for qid in qids:
        terms, tfs = per_q[qid]
        pos = np.searchsorted(dterms, terms)
        pos_c = np.minimum(pos, max(len(dterms) - 1, 0))
        df = np.where(
            (len(dterms) > 0) & (dterms[pos_c] == terms), ddf[pos_c], n_docs
        ) if len(dterms) else np.full(len(terms), n_docs)
        tfidf = tfs * np.log(n_docs / df)
        top = np.lexsort((terms, -tfidf))[:m]
        q_texts_out.append(" ".join(sorted(terms[top].tolist())))
    queries = pa.table(
        {"query_id": pa.array(qids, pa.int64()),
         "text": pa.array(q_texts_out, pa.string()),
         "limit": pa.array([slack] * len(qids), pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg)
    hit_q = hits.column("query_id").to_numpy()
    hit_ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], np.int64
    )
    hit_scores = hits.column("score").to_numpy()

    # texts of every hit, one pushdown read (hits-sized, not corpus-sized)
    need = sorted(set(hit_ids.tolist()))
    texts_tbl = pa.Table.from_pandas(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(need),
        ).to_pandas(),
        preserve_index=False,
    )
    text_of = dict(zip(texts_tbl.column("doc_id").to_pylist(),
                       texts_tbl.column("text").to_pylist()))

    out_q, out_d, out_r, out_s = [], [], [], []
    for qid in qids:
        sel = np.nonzero(hit_q == qid)[0]
        rank = 0
        for i in sel:  # hits are (score DESC, doc ASC) within the query
            d = int(hit_ids[i])
            if d == qid or text_of[d] == qtexts[qid]:
                continue
            out_q.append(qid)
            out_d.append(d)
            out_r.append(rank)
            out_s.append(round(float(hit_scores[i]), 6))
            rank += 1
            if rank == k:
                break
    return pa.table(
        {"query_doc": pa.array(out_q, pa.int64()),
         "neg_doc": pa.array(out_d, pa.int64()),
         "rank": pa.array(out_r, pa.int64()),
         "score": pa.array(out_s, pa.float64())}
    )


def bm25_topk_bool(
    sf_dir: str, must: str = "dup", should: str = "merge window",
    min_should: int = 1, limit: int = 10,
):
    """Full Lucene/ES BooleanQuery through the engine: must clause ('dup')
    gates candidates AND scores, should clauses ('merge window') add score
    with a minimum_should_match floor of 1 — the composite query shape every
    ES `bool` request uses. The SQL twin replicates the clause algebra with
    integer flag counts and sums BM25 over every matched clause term."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([must]),
         "should": pa.array([should]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(
        index_dir, queries, cfg, bool_query=True, min_should=min_should
    )
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def bm25_topk_phrase_rescored(
    sf_dir: str, phrase: str = "merge part", window: int = 50,
    weight: float = 2.0, limit: int = 10,
):
    """The canonical ES rescore: BM25 retrieves a top-``window`` candidate
    set, a match_phrase rescorer re-ranks it — final = bm25 + weight *
    phrase_tf (score_mode total). Exercises the retrieval index AND the
    positional artifact in one pipeline; the window selection and the
    combine are float-identical to the SQL twin (2-term BM25 parity +
    exact integer phrase counts)."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)

    q = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([phrase]),
         "limit": pa.array([window], pa.int32())}
    )
    hits = search_table(index_dir, q, cfg)
    ids = np.asarray(
        [int(c[4:]) for c in hits.column("conv_id").to_pylist()], np.int64
    )
    raw = hits.column("score").to_numpy()

    pq_ = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([phrase]),
         "limit": pa.array([1_000_000_000], pa.int32())}
    )
    ph = phrase_search_table(index_dir, pq_, cfg)
    ptf = {
        int(c[4:]): int(t)
        for c, t in zip(ph.column("conv_id").to_pylist(),
                        ph.column("phrase_tf").to_pylist())
    }
    final = raw + weight * np.array([float(ptf.get(int(d), 0)) for d in ids])
    order = np.lexsort((ids, -final))[:limit]
    return pa.table(
        {"doc_id": pa.array(ids[order], pa.int64()),
         "score": pa.array(np.round(final[order], 6), pa.float64())}
    )


def customers_distance_rings(
    sf_dir: str, lat0: float = 12.0, lon0: float = 77.0,
    bounds=(1000.0, 2000.0, 4000.0, 8000.0),
):
    """ES ``geo_distance`` aggregation: customers bucketed into distance
    RINGS from a point (same deterministic synthetic coordinates and the
    same haversine expression shape as customers_near_point). Per ring:
    exact count + the nearest customer's distance (min — exact double, no
    sum-order drift). Ring edges use strict ``<`` on both engines."""
    import ray.data

    R = 6371.0
    DEG = 0.017453292519943295
    b = np.asarray(bounds, np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        lat = (ck * 7919 % 18000) / 100.0 - 90.0
        lon = (ck * 104729 % 36000) / 100.0 - 180.0
        sdp = np.sin((lat - lat0) * DEG / 2.0)
        sdl = np.sin((lon - lon0) * DEG / 2.0)
        a = sdp * sdp + np.cos(lat0 * DEG) * np.cos(lat * DEG) * (sdl * sdl)
        d = 2.0 * R * np.arcsin(np.sqrt(a))
        ring = np.searchsorted(b, d, side="right")
        n = len(b) + 1
        mn = np.full(n, np.inf)
        np.minimum.at(mn, ring, d)
        return pa.table(
            {"ring": pa.array(np.arange(n), pa.int64()),
             "cnt": pa.array(np.bincount(ring, minlength=n).astype(np.int64), pa.int64()),
             "mn": pa.array(mn, pa.float64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("ring", as_index=False).agg(
        cnt=("cnt", "sum"), mn=("mn", "min")
    ).sort_values("ring")
    agg = agg[agg["cnt"] > 0]
    return pa.table(
        {"ring": pa.array(agg["ring"].to_numpy().astype(np.int64), pa.int64()),
         "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64), pa.int64()),
         "nearest_km": pa.array(np.round(agg["mn"].to_numpy(), 6), pa.float64())}
    )


def bm25_topk_tuned(
    sf_dir: str, terms=BM25_QUERY_TERMS, k1: float = 0.9, b: float = 0.4,
    limit: int = 10,
):
    """BM25 with TUNED parameters (the ES per-index similarity setting
    ``{type: BM25, k1: 0.9, b: 0.4}`` — the classic short-field tuning):
    same index artifact, per-pool constant override, exact dense path
    (build-time block-max metadata assumes the build k1/b). The SQL twin
    swaps the constants into the same expression."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.search import search_table

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    queries = pa.table(
        {"query_id": pa.array([0], pa.int64()),
         "text": pa.array([" ".join(terms)]),
         "limit": pa.array([limit], pa.int32())}
    )
    hits = search_table(index_dir, queries, cfg, k1=k1, b=b)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    scores = np.round(hits.column("score").to_numpy(), 6)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "score": pa.array(scores, pa.float64())}
    )


def _ann_topk_metric(sf_dir: str, metric: str, k: int = 10):
    """Brute-force top-k under an alternative vector metric (the ES dense
    vector ``similarity`` options beside cosine): ``dot`` = raw inner
    product (DESC), ``l2`` = euclidean distance (ASC). Same
    per-batch-partials shape as ann_topk — per-batch numpy kernel,
    per-batch top-k, tiny driver merge, no global sort."""
    import ray
    import ray.data

    q = _query_vector(sf_dir, 0)
    q_ref = ray.put(q)
    asc = metric == "l2"

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            if metric == "dot":
                s = emb @ self.q
            else:
                d = emb - self.q
                s = np.sqrt(np.sum(d * d, axis=1))
            key = s if asc else -s
            top = np.lexsort((vec_ids, key))[: min(k, len(vec_ids))]
            return pa.table(
                {"vec_id": pa.array(vec_ids[top], pa.int64()),
                 "score": pa.array(s[top], pa.float64())}
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    parts = ds.map_batches(Score, batch_format="pyarrow", batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    s = tbl.column("score").to_numpy()
    vec_ids = tbl.column("vec_id").to_numpy()
    key = s if asc else -s
    top = np.lexsort((vec_ids, key))[: min(k, len(vec_ids))]
    return pa.table(
        {"vec_id": pa.array(vec_ids[top], pa.int64()),
         "score": pa.array(np.round(s[top], 6), pa.float64())}
    )


def ann_topk_dot(sf_dir: str, k: int = 10):
    return _ann_topk_metric(sf_dir, "dot", k)


def ann_topk_l2(sf_dir: str, k: int = 10):
    return _ann_topk_metric(sf_dir, "l2", k)


def event_value_extended_stats(sf_dir: str):
    """ES ``extended_stats`` aggregation per event_type: count/min/max/sum/
    avg plus sum_of_squares, variance ((sum_sq - sum*sum/n) / n — the exact
    ES expression), std_deviation, and the ±2σ bounds. One moment pass
    (per-batch partials, O(types) rows shuffled); every derived value uses
    the identical expression chain as the SQL twin, round(6)."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        types, codes = np.unique(
            batch.column("event_type").to_numpy(zero_copy_only=False),
            return_inverse=True,
        )
        v = batch.column("value").to_numpy().astype(np.float64)
        n = len(types)
        mn = np.full(n, np.inf)
        mx = np.full(n, -np.inf)
        np.minimum.at(mn, codes, v)
        np.maximum.at(mx, codes, v)
        return pa.table(
            {"event_type": pa.array(types),
             "cnt": pa.array(np.bincount(codes).astype(np.int64), pa.int64()),
             "s1": pa.array(np.bincount(codes, weights=v), pa.float64()),
             "s2": pa.array(np.bincount(codes, weights=v * v), pa.float64()),
             "mn": pa.array(mn, pa.float64()),
             "mx": pa.array(mx, pa.float64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("event_type", as_index=False).agg(
        cnt=("cnt", "sum"), s1=("s1", "sum"), s2=("s2", "sum"),
        mn=("mn", "min"), mx=("mx", "max"),
    ).sort_values("event_type")
    n = agg["cnt"].to_numpy().astype(np.float64)
    s1 = agg["s1"].to_numpy()
    s2 = agg["s2"].to_numpy()
    avg = s1 / n
    var = (s2 - s1 * s1 / n) / n
    std = np.sqrt(var)
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "cnt": pa.array(agg["cnt"].to_numpy().astype(np.int64), pa.int64()),
            "vmin": pa.array(np.round(agg["mn"].to_numpy(), 6), pa.float64()),
            "vmax": pa.array(np.round(agg["mx"].to_numpy(), 6), pa.float64()),
            "vsum": pa.array(np.round(s1, 6), pa.float64()),
            "vavg": pa.array(np.round(avg, 6), pa.float64()),
            "sum_sq": pa.array(np.round(s2, 6), pa.float64()),
            "variance": pa.array(np.round(var, 6), pa.float64()),
            "std_dev": pa.array(np.round(std, 6), pa.float64()),
            "upper": pa.array(np.round(avg + 2.0 * std, 6), pa.float64()),
            "lower": pa.array(np.round(avg - 2.0 * std, 6), pa.float64()),
        }
    )


def _daily_counts(sf_dir: str):
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        b = (e // DAY_US) * DAY_US
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"day": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return parts.groupby("day", as_index=False)["n"].sum().sort_values("day")


def events_daily_stats_bucket(sf_dir: str):
    """ES ``stats_bucket`` pipeline aggregation: min/max/avg/sum/count OVER
    the daily doc-count histogram's buckets (a metric of the bucket values,
    not the rows). Bucket counts are exact integers; only avg divides."""
    agg = _daily_counts(sf_dir)
    n = agg["n"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "n_buckets": pa.array([len(n)], pa.int64()),
            "bmin": pa.array([int(n.min())], pa.int64()),
            "bmax": pa.array([int(n.max())], pa.int64()),
            "bsum": pa.array([int(n.sum())], pa.int64()),
            "bavg": pa.array(
                [round(float(int(n.sum()) / len(n)), 6)], pa.float64()
            ),
        }
    )


def events_bucket_sort(sf_dir: str, k: int = 5):
    """ES ``bucket_sort`` pipeline aggregation: the daily histogram's
    buckets re-sorted by doc count (DESC, day ASC) and truncated to the
    top-k — the 'busiest days' query. All integers."""
    agg = _daily_counts(sf_dir)
    n = agg["n"].to_numpy().astype(np.int64)
    days = agg["day"].to_numpy().astype(np.int64)
    top = np.lexsort((days, -n))[:k]
    return pa.table(
        {"day": pa.array(days[top], pa.int64()),
         "cnt": pa.array(n[top], pa.int64())}
    )


def events_cumulative_cardinality(sf_dir: str):
    """ES ``cumulative_cardinality`` pipeline aggregation: per day, the
    running count of DISTINCT users ever seen — growth analytics (how many
    NEW users does each day add). Distributed shape: per-batch (user, day)
    min-partials -> per-user global first day (one small groupby) -> exact
    integer histogram + cumsum of first-seen counts."""
    import ray.data
    from ray.data.aggregate import Min

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        u = batch.column("user_id").to_numpy().astype(np.int64)
        d = (e // DAY_US) * DAY_US
        # day_index*2^20 + user (same bit budget as events_weekly_serial_diff:
        # user_id < 2^20 fixture invariant, day index has 2^43 headroom) —
        # user-major packing would wrap int64 already at user_id >= 2^18
        if u.size and int(u.max()) >= (1 << 20):
            raise ValueError("user_id >= 2^20 breaks composite-key packing")
        key = (d // DAY_US) * (1 << 20) + u
        uk = np.unique(key)
        return pa.table(
            {"user": pa.array(uk & ((1 << 20) - 1), pa.int64()),
             "day_part": pa.array(uk >> 20, pa.int64())}
        )

    first = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user", num_partitions=_nparts(sf_dir))
        .aggregate(Min("day_part", alias_name="first_day"))
        .to_pandas()
    )
    per_day = first.groupby("first_day", as_index=False)["user"].count().rename(
        columns={"user": "new_users"}
    ).sort_values("first_day")
    new = per_day["new_users"].to_numpy().astype(np.int64)
    # the histogram covers ALL days with events; days adding no new users
    # still appear (cumulative value carries) — rebuild over the full span
    all_days = _daily_counts(sf_dir)["day"].to_numpy().astype(np.int64)
    first_days = per_day["first_day"].to_numpy().astype(np.int64) * DAY_US
    new_map = dict(zip(first_days.tolist(), new.tolist()))
    cum, out = 0, []
    for d in all_days.tolist():
        cum += new_map.get(d, 0)
        out.append(cum)
    return pa.table(
        {"day": pa.array(all_days, pa.int64()),
         "distinct_users": pa.array(out, pa.int64())}
    )


def events_monthly_histogram(sf_dir: str):
    """ES ``date_histogram`` with calendar_interval=month — REAL calendar
    months (28/29/30/31 days), not fixed 30-day windows: the civil-date
    algorithm (Howard Hinnant's days-to-civil, exact integer arithmetic)
    converts each epoch day to (year, month) entirely in numpy, so the
    bucket key matches SQL date_trunc('month') bit-for-bit. Per-batch
    partial counts + value sums; sums round(6)."""
    import ray.data

    DAY_US = 86_400_000_000

    def civil_ym(days: np.ndarray) -> np.ndarray:
        """epoch days -> year*12 + (month-1), exact (Hinnant 2014)."""
        z = days + 719468
        era = np.floor_divide(z, 146097)
        doe = z - era * 146097
        yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        m = mp + np.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        return y * 12 + (m - 1)

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        v = batch.column("value").to_numpy().astype(np.float64)
        ym = civil_ym(e // DAY_US)
        u, inv = np.unique(ym, return_inverse=True)
        return pa.table(
            {"ym": pa.array(u, pa.int64()),
             "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
             "s": pa.array(np.bincount(inv, weights=v), pa.float64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("ym", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum")
    ).sort_values("ym")
    ym = agg["ym"].to_numpy().astype(np.int64)
    months = [f"{y}-{m:02d}" for y, m in zip((ym // 12).tolist(),
                                             (ym % 12 + 1).tolist())]
    return pa.table(
        {"month": pa.array(months, pa.string()),
         "cnt": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
         "value_sum": pa.array(np.round(agg["s"].to_numpy(), 6), pa.float64())}
    )


def events_value_histogram_dense(sf_dir: str, width: float = 25.0):
    """ES ``histogram`` with min_doc_count=0: fixed-width value buckets
    INCLUDING the empty ones between the min and max bucket (the ES
    gap-filling contract that chart consumers rely on). Bucket index =
    floor(value / width) — exact on both engines; empty rows generated
    with np.arange / generate_series."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy().astype(np.float64)
        b = np.floor(v / width).astype(np.int64)
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False)["n"].sum()
    have = dict(zip(agg["b"].astype(int), agg["n"].astype(int)))
    lo, hi = min(have), max(have)
    buckets = list(range(lo, hi + 1))
    return pa.table(
        {"bucket": pa.array([b * width for b in buckets], pa.float64()),
         "cnt": pa.array([have.get(b, 0) for b in buckets], pa.int64())}
    )


def events_daily_percent_of_total(sf_dir: str):
    """ES ``normalize`` pipeline aggregation (method percent_of_sum): each
    daily bucket's doc count as a share of the total — exact integer counts,
    one division per bucket, round(6)."""
    agg = _daily_counts(sf_dir)
    n = agg["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    return pa.table(
        {
            "day": pa.array(agg["day"].to_numpy().astype(np.int64), pa.int64()),
            "cnt": pa.array(n, pa.int64()),
            "pct": pa.array(
                np.round(n.astype(np.float64) / total, 6), pa.float64()
            ),
        }
    )


def render_sft_conversations(
    sf_dir: str, group_size: int = 8, max_chars: int = 2400,
):
    """SFT conversation assembly — the chat-template rendering step of an
    instruction-tuning data pipeline (each conversation becomes ONE
    training string). Documents grouped ``group_size``-per-conversation
    (the block-join layout: conv = doc_id // G, turn = doc_id % G), roles
    alternate user/assistant by turn parity, render =
    ``<|role|>text`` parts concatenated in turn order. Conversations whose
    rendered length exceeds ``max_chars`` drop (the context-window gate) —
    an integer codepoint-count boundary on both sides.

    Distributed shape: the one unavoidable shuffle moves each text exactly
    once, keyed by conversation (assembly NEEDS co-located turns); part
    strings are built vectorized per batch BEFORE the shuffle, and each
    group's output is a single row, so the wide stage emits one row per
    conversation."""

    def parts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        turn = ids % group_size
        role = np.where(turn % 2 == 0, "<|user|>", "<|assistant|>")
        part = pc.binary_join_element_wise(
            pa.array(role, pa.string()), batch.column("text"), ""
        )
        return pa.table(
            {"conv_id": pa.array(ids // group_size, pa.int64()),
             "turn": pa.array(turn, pa.int64()),
             "part": part}
        )

    def render(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_id": pa.array([], pa.int64()),
             "n_turns": pa.array([], pa.int64()),
             "n_chars": pa.array([], pa.int64()),
             "rendered": pa.array([], pa.string())}
        )
        if group.num_rows == 0:
            return empty
        o = np.argsort(group.column("turn").to_numpy(), kind="stable")
        texts = group.column("part").to_pylist()
        s = "".join(texts[i] for i in o)
        if len(s) > max_chars:  # len() counts codepoints, like SQL length()
            return empty
        return pa.table(
            {"conv_id": pa.array([group.column("conv_id")[0].as_py()], pa.int64()),
             "n_turns": pa.array([len(o)], pa.int64()),
             "n_chars": pa.array([len(s)], pa.int64()),
             "rendered": pa.array([s], pa.string())}
        )

    return (
        _documents(sf_dir)
        .map_batches(parts, batch_format="pyarrow")
        .groupby("conv_id", num_partitions=_nparts(sf_dir))
        .map_groups(render, batch_format="pyarrow")
    )


def gopher_repetition_signals(sf_dir: str, dup_n: int = 3):
    """Gopher n-gram repetition rules (Rae et al. 2021 Table A1 — the
    half of the repetition family ``doc_repetition``'s unigram stats do
    not cover): per doc, for n in {2,3,4} the fraction of characters
    covered by the highest-coverage n-gram (count x gram char length,
    deterministic under count ties), and for n = 5 the occurrence-weighted
    fraction of characters in DUPLICATED n-grams (sum of count x chars
    over grams appearing >= 2 times). Character length = token codepoints,
    no separators; fractions round(6).

    Embarrassingly parallel: docs never span batches, so one vectorized
    pass per batch and NO shuffle. Per-batch n-gram grouping is exact
    lexsort over (doc, code_0..code_{n-1}) dictionary-code columns — no
    polynomial key, so it cannot overflow at any vocabulary size."""
    NS = (2, 3, 4)
    DUP_N = int(dup_n)

    def stats(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        tokens, lens = tokenize_column_flat(batch.column("text"))
        ndocs = len(doc_ids)
        top = {n: np.zeros(ndocs, np.float64) for n in NS}
        dup = np.zeros(ndocs, np.float64)
        total_chars = np.zeros(ndocs, np.float64)
        if len(tokens):
            d = tokens.dictionary_encode()
            codes = d.indices.to_numpy().astype(np.int64)
            tlen = pc.utf8_length(d.dictionary).to_numpy().astype(np.int64)
            tok_doc = np.repeat(np.arange(ndocs), lens)
            tok_chars = tlen[codes]
            total_chars = np.bincount(
                tok_doc, weights=tok_chars, minlength=ndocs
            )
            m = len(codes)
            for n in sorted(set(NS + (DUP_N,))):
                if m < n:
                    continue
                idx = np.arange(m - n + 1)
                valid = tok_doc[idx] == tok_doc[idx + n - 1]
                vi = idx[valid]
                if len(vi) == 0:
                    continue
                cols = [codes[vi + j] for j in range(n)]
                docv = tok_doc[vi]
                gch = np.zeros(len(vi), np.int64)
                for j in range(n):
                    gch += tok_chars[vi + j]
                order = np.lexsort(tuple(reversed(cols)) + (docv,))
                arr = np.stack([docv[order]] + [c[order] for c in cols])
                change = np.any(arr[:, 1:] != arr[:, :-1], axis=0)
                run_starts = np.concatenate([[0], np.nonzero(change)[0] + 1])
                run_counts = np.diff(np.append(run_starts, len(vi)))
                run_doc = docv[order][run_starts]
                cov = run_counts * gch[order][run_starts]
                if n in NS:
                    np.maximum.at(top[n], run_doc, cov.astype(np.float64))
                if n == DUP_N:
                    dmask = run_counts >= 2
                    np.add.at(
                        dup, run_doc[dmask], cov[dmask].astype(np.float64)
                    )
        safe = np.where(total_chars > 0, total_chars, 1.0)
        out = {"doc_id": pa.array(doc_ids, pa.int64()),
               "n_tokens": pa.array(lens.astype(np.int64), pa.int64())}
        # _sql_round: the quotients are dyadic rationals whenever
        # total_chars is a power of two, and exact 6dp halves DO occur
        # (17/128) — DuckDB half-away vs np.round half-even would flip
        # the last digit
        for n in NS:
            out[f"top{n}_frac"] = pa.array(
                _sql_round(top[n] / safe, 6), pa.float64()
            )
        out[f"dup{DUP_N}_frac"] = pa.array(
            _sql_round(dup / safe, 6), pa.float64()
        )
        return pa.table(out)

    return _documents(sf_dir).map_batches(stats, batch_format="pyarrow")


def events_rate(sf_dir: str):
    """ES ``rate`` aggregation inside a daily ``date_histogram``
    (rate unit = hour, bucket = day -> value / 24): per-day event count
    and count-rate-per-hour, plus the value-sum rate. Counts are exact
    integers; value sums accumulate in exact integer CENTS (the events
    fixture carries 2-dp values) so partial-sum order cannot flip a digit;
    the final divides round 6 with ``_sql_round`` (exact 6-dp halves occur
    for cnt divisible by lcm factors of 24). Per-batch partials shuffle
    O(days) rows — the rate math runs on the bucket-sized result."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        b = (e // DAY_US) * DAY_US
        u, inv, cnt = np.unique(b, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "b": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64), pa.int64()
                ),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False).sum().sort_values("b")
    cnt = agg["n"].to_numpy().astype(np.int64)
    cents = agg["cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "day": pa.array(agg["b"].to_numpy().astype(np.int64), pa.timestamp("us")),
            "cnt": pa.array(cnt, pa.int64()),
            "events_per_hour": pa.array(
                _sql_round(cnt / 24.0, 6), pa.float64()
            ),
            "value_per_hour": pa.array(
                _sql_round(cents / 100.0 / 24.0, 6), pa.float64()
            ),
        }
    )


def events_bucket_script(sf_dir: str):
    """ES ``bucket_script`` + ``bucket_selector`` pipeline aggregations over
    a daily date_histogram: per-day 'purchase' and 'click' counts, a
    derived purchase/click ratio (bucket_script), and a selector that keeps
    only days where ``purchases * 20 > clicks * 19`` — the ratio > 0.95
    predicate cross-multiplied into EXACT integer arithmetic so engine and
    SQL agree on the keep set with zero float-boundary risk (the
    ``gopher_quality_filter`` pattern). The ratio column itself rounds 6
    via ``_sql_round`` (quotients of small integers hit exact halves)."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        ty = batch.column("event_type").to_numpy(zero_copy_only=False)
        b = (e // DAY_US) * DAY_US
        u = np.unique(b)
        pos = np.searchsorted(u, b)
        purch = np.bincount(pos[ty == "purchase"], minlength=len(u))
        click = np.bincount(pos[ty == "click"], minlength=len(u))
        keep = (purch > 0) | (click > 0)
        return pa.table(
            {
                "b": pa.array(u[keep], pa.int64()),
                "purchases": pa.array(purch[keep].astype(np.int64), pa.int64()),
                "clicks": pa.array(click[keep].astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False).sum().sort_values("b")
    purch = agg["purchases"].to_numpy().astype(np.int64)
    click = agg["clicks"].to_numpy().astype(np.int64)
    sel = (purch * 20 > click * 19) & (click > 0)
    return pa.table(
        {
            "day": pa.array(
                agg["b"].to_numpy().astype(np.int64)[sel], pa.timestamp("us")
            ),
            "purchases": pa.array(purch[sel], pa.int64()),
            "clicks": pa.array(click[sel], pa.int64()),
            "ratio": pa.array(
                _sql_round(purch[sel] / click[sel], 6), pa.float64()
            ),
        }
    )


def events_date_range(sf_dir: str):
    """ES ``date_range`` aggregation: fixed half-open [from, to) buckets
    (first 10 days of 2024-01 / next 10 / open-ended tail) with per-bucket
    event count and value sum. Bucket membership is exact int64 epoch-us
    comparison; value sums accumulate in integer cents (2-dp fixture
    values) so the sum is order-independent and the /100 render exact.
    Per-batch partials shuffle exactly 3 rows per batch."""
    import ray.data

    DAY_US = 86_400_000_000
    BASE = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch us
    EDGES = [
        (None, BASE + 10 * DAY_US),
        (BASE + 10 * DAY_US, BASE + 20 * DAY_US),
        (BASE + 20 * DAY_US, None),
    ]

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        ns, cs = [], []
        for lo, hi in EDGES:
            m = np.ones(len(e), bool)
            if lo is not None:
                m &= e >= lo
            if hi is not None:
                m &= e < hi
            ns.append(int(m.sum()))
            cs.append(int(cents[m].sum()))
        return pa.table(
            {
                "bucket": pa.array(np.arange(len(EDGES)), pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "cents": pa.array(cs, pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("bucket", as_index=False).sum().sort_values("bucket")
    cents = agg["cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "bucket": pa.array(agg["bucket"].to_numpy().astype(np.int64), pa.int64()),
            "from_ts": pa.array(
                [None if lo is None else lo for lo, _ in EDGES], pa.timestamp("us")
            ),
            "to_ts": pa.array(
                [None if hi is None else hi for _, hi in EDGES], pa.timestamp("us")
            ),
            "cnt": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
            "sum_value": pa.array(cents / 100.0, pa.float64()),
        }
    )


def events_multi_terms(sf_dir: str, k: int = 20):
    """ES ``multi_terms`` aggregation: terms over the COMPOSITE key
    (event_type, user_id % 10) ordered by doc_count DESC (ES default),
    ties broken (event_type ASC, user_bucket ASC), top ``k``. All-integer:
    per-batch partial counts on the composite key shuffle O(types * 10)
    rows; the ordering happens on the bucket-sized result."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        ty = batch.column("event_type").to_numpy(zero_copy_only=False)
        ub = (batch.column("user_id").to_numpy() % 10).astype(np.int64)
        types, tcodes = np.unique(ty, return_inverse=True)
        key = tcodes * 10 + ub
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[u // 10]),
                "user_bucket": pa.array((u % 10).astype(np.int64), pa.int64()),
                "doc_count": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "user_id"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby(["event_type", "user_bucket"], as_index=False).sum()
    agg = agg.sort_values(
        ["doc_count", "event_type", "user_bucket"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(k)
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
            "user_bucket": pa.array(
                agg["user_bucket"].to_numpy().astype(np.int64), pa.int64()
            ),
            "doc_count": pa.array(
                agg["doc_count"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def _wildcard_to_regex(pattern: str) -> str:
    """Canonical translation lives with the query language
    (``pipelines/querylang.py::wildcard_to_regex``)."""
    from clip_as_service_ray.pipelines.querylang import wildcard_to_regex

    return wildcard_to_regex(pattern)


def bm25_topk_wildcard(sf_dir: str, pattern: str = "s?a*", limit: int = 10):
    """ES ``wildcard`` term query: the pattern expands over the term
    dictionary (``*``/``?`` translated to the regex automaton, exactly how
    Lucene's WildcardQuery compiles) and the matched term set scores as an
    OR query with per-term idf — delegated to ``bm25_topk_regex`` so there
    is one regex-query plumbing block to maintain; the SQL twin uses the
    LIKE translation (``*``->``%``, ``?``->``_``) over the same
    vocabulary."""
    return bm25_topk_regex(sf_dir, _wildcard_to_regex(pattern), limit)


def exact_substring_lrs(sf_dir: str):
    """Corpus-wide longest repeated token sequence via the DISTRIBUTED
    suffix array (stages/suffix.py: Manber-Myers prefix doubling expressed
    as Ray Data sorts + bucket-routed exchanges) — the variable-length
    core of Lee et al. 2022's ExactSubstr dedup that the fixed-length
    gram-routed span pass (``duplicate_span_coverage``) approximates.

    Returns one row (len, seq, cnt): the longest token sequence occurring
    at >= 2 (doc, start) positions (overlaps counted, never crossing a
    document boundary), lexicographic-min on ties, with its corpus-wide
    occurrence count. The SQL twin enumerates every substring — O(sum
    len^2) rows, viable only at test scale, which is exactly why the
    engine side exists."""
    from clip_as_service_ray.stages.suffix import longest_repeated_sequence

    length, terms, cnt = longest_repeated_sequence(_documents(sf_dir))
    if length == 0:
        return pa.table(
            {"len": pa.array([], pa.int64()), "seq": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "len": pa.array([length], pa.int64()),
            "seq": pa.array([" ".join(terms)], pa.string()),
            "cnt": pa.array([cnt], pa.int64()),
        }
    )


def unigram_lm_vocab(
    sf_dir: str,
    vocab_size: int = 48,
    seed_size: int = 400,
    max_len: int = 6,
    em_rounds: int = 2,
    prune_rounds: int = 3,
    keep_fraction: float = 0.75,
):
    """SentencePiece unigram-LM tokenizer trainer (Kudo 2018,
    arXiv:1804.10959) as a distributed EM over Ray Data — the third
    tokenizer family next to the reference regex tokenizer and the learned
    BPE (``functions/bpe.py``).

    Scale shape: the corpus collapses ONCE into the deduplicated
    (word, freq) table (a distributed groupby); every subsequent pass —
    seed substring counting, each E-step — is a map_batches over that
    table with the current piece log-probs broadcast via ray.put, shipping
    only piece-vocabulary-sized partials. EM cost is O(distinct words x
    len x max_len), independent of corpus size (the standard unigram
    working-set trick; SentencePiece trains on unique sentences with
    counts the same way). The driver holds only piece-sized dicts.
    Deterministic run-to-run (fixed block order, fixed schedule); the
    differential test pins the selected vocabulary + probs against the
    local reference trainer ``functions/unigram.py:train_unigram`` to 1e-9
    (partial-sum ORDER differs between the two, so exact bit-equality is
    not the contract — the test corpus keeps counts well separated).

    Rows-only oracle entry (EM is not SQL-expressible); correctness comes
    from the distributed==local differential test plus lattice unit tests."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.functions.unigram import (
        forward_backward,
        normalize_logprobs,
        prune,
    )

    def word_partial(batch: pa.Table) -> pa.Table:
        tokens, _ = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        vc = tokens.value_counts()
        return pa.table({"word": vc.field("values"), "freq": vc.field("counts").cast(pa.int64())})

    nparts = _nparts(sf_dir)
    words = (
        _documents(sf_dir)
        .map_batches(word_partial, batch_format="pyarrow")
        .groupby("word", num_partitions=nparts)
        .aggregate(Sum("freq", alias_name="freq"))
        .materialize()
    )

    # seed: freq-weighted substring counts (distributed partials) + full
    # single-char coverage, top seed_size with (-count, piece) tie-break
    def substr_partial(batch: pa.Table) -> pa.Table:
        wlist = batch.column("word").to_pylist()
        freqs = batch.column("freq").to_numpy()
        acc: dict[str, float] = {}
        for w, f in zip(wlist, freqs):
            n = len(w)
            f = float(f)
            for i in range(n):
                for j in range(i + 1, min(n, i + max_len) + 1):
                    s = w[i:j]
                    acc[s] = acc.get(s, 0.0) + f
        return pa.table(
            {"piece": pa.array(list(acc.keys()), pa.string()),
             "cnt": pa.array(list(acc.values()), pa.float64())}
        )

    sub = (
        words.map_batches(substr_partial, batch_format="pyarrow")
        .groupby("piece", num_partitions=nparts)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    by_piece = dict(zip(sub["piece"], sub["cnt"].astype(float)))
    chars = sorted({p for p in by_piece if len(p) == 1})
    multi = sorted(
        (p for p in by_piece if len(p) > 1),
        key=lambda s: (-by_piece[s], s),
    )[: max(0, seed_size - len(chars))]
    counts = {s: by_piece[s] for s in sorted(set(chars) | set(multi))}
    logprob = normalize_logprobs(counts)

    def e_step(lp_ref):
        def expected_partial(batch: pa.Table) -> pa.Table:
            lp = ray.get(lp_ref)
            wlist = batch.column("word").to_pylist()
            freqs = batch.column("freq").to_numpy()
            acc: dict[str, float] = {}
            for w, f in zip(wlist, freqs):
                c, _ = forward_backward(w, lp, max_len)
                f = float(f)
                for p, v in c.items():
                    acc[p] = acc.get(p, 0.0) + f * v
            return pa.table(
                {"piece": pa.array(list(acc.keys()), pa.string()),
                 "cnt": pa.array(list(acc.values()), pa.float64())}
            )

        parts = words.map_batches(
            expected_partial, batch_format="pyarrow"
        ).to_pandas()
        agg = parts.groupby("piece", sort=True)["cnt"].sum()
        return dict(zip(agg.index, agg.to_numpy()))

    expected: dict[str, float] = {}
    for _ in range(prune_rounds):
        for _ in range(em_rounds):
            expected = e_step(ray.put(logprob))
            logprob = normalize_logprobs(expected)
        expected = prune(expected, keep_fraction, vocab_size)
        logprob = normalize_logprobs(expected)
    final = prune(expected, 0.0, vocab_size)
    probs = {p: float(np.exp(lp)) for p, lp in normalize_logprobs(final).items()}
    order = sorted(probs, key=lambda p: (-probs[p], p))
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order), dtype=np.int64), pa.int64()),
            "piece": pa.array(order, pa.string()),
            "prob": pa.array(
                np.round([probs[p] for p in order], 6), pa.float64()
            ),
        }
    )


def user_ip_ranges(sf_dir: str):
    """ES ``ip_range`` aggregation analog over deterministic synthetic IPs
    (no IP column in the fixture — derived ``ip32 = (user_id * 2654435761)
    mod 2^32``, the Knuth-hash synthetic-column precedent of
    ``customers_near_point``). Three half-open ranges with ES's key
    rendering (dotted quads, NULL for open ends); per-bucket event count
    and exact distinct-user count — every comparison int64, zero float
    risk. Per-batch partials ship (bucket, user) uniques, bounded by the
    user population."""
    import ray.data

    K = 2654435761
    M = 4294967296
    EDGES = [
        (None, 1 << 30),
        (1 << 30, 3 << 30),
        (3 << 30, None),
    ]

    def quad(ip):
        if ip is None:
            return None
        return ".".join(
            str((ip >> s) & 255) for s in (24, 16, 8, 0)
        )

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        users, counts = np.unique(uid, return_counts=True)
        ip = (users * K) % M
        bucket = np.full(len(users), len(EDGES) - 1, np.int64)
        for b, (lo, hi) in enumerate(EDGES):
            m = np.ones(len(ip), bool)
            if lo is not None:
                m &= ip >= lo
            if hi is not None:
                m &= ip < hi
            bucket[m] = b
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "user_id": pa.array(users.astype(np.int64), pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for b, (lo, hi) in enumerate(EDGES):
        g = parts[parts["bucket"] == b]
        rows.append(
            {
                "bucket": b,
                "from_ip": quad(lo),
                "to_ip": quad(hi),
                "cnt": int(g["c"].sum()),
                "users": int(g["user_id"].nunique()),
            }
        )
    return pa.table(
        {
            "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
            "from_ip": pa.array([r["from_ip"] for r in rows], pa.string()),
            "to_ip": pa.array([r["to_ip"] for r in rows], pa.string()),
            "cnt": pa.array([r["cnt"] for r in rows], pa.int64()),
            "users": pa.array([r["users"] for r in rows], pa.int64()),
        }
    )


def events_filters_agg(sf_dir: str):
    """ES ``filters`` aggregation with ``other_bucket``: three NAMED (and
    deliberately overlapping, as ES allows) predicates —
    ``purchase`` (event_type), ``high_value`` (value >= 400.00, compared
    in integer cents), ``weekend`` (epoch-day Hinnant-style dow, all
    int64) — plus ``_other_`` for rows matching none. Counts and
    value-cent sums are exact integers end to end."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ty = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        dow = ((e // DAY_US) + 4) % 7  # 1970-01-01 = Thursday = 4, 0 = Sunday
        masks = {
            "purchase": ty == "purchase",
            "high_value": cents >= 40000,
            "weekend": (dow == 0) | (dow == 6),
        }
        masks["_other_"] = ~(
            masks["purchase"] | masks["high_value"] | masks["weekend"]
        )
        names = sorted(masks)
        return pa.table(
            {
                "bucket": pa.array(names, pa.string()),
                "n": pa.array(
                    [int(masks[k].sum()) for k in names], pa.int64()
                ),
                "cents": pa.array(
                    [int(cents[masks[k]].sum()) for k in names], pa.int64()
                ),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("bucket", as_index=False).sum().sort_values("bucket")
    cents = agg["cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "bucket": pa.array(agg["bucket"].tolist(), pa.string()),
            "cnt": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
            "sum_value": pa.array(cents / 100.0, pa.float64()),
        }
    )


def doc_token_entropy(sf_dir: str):
    """Per-document unigram (token) entropy — the Dolma/RefinedWeb-style
    "unigram entropy" quality signal: low-entropy documents are
    boilerplate/repetition candidates. Fully shuffle-free: documents never
    split across batches, so the per-batch ``_tokens_flat`` rows (already
    lexsorted by (doc, term)) feed one bincount chain per batch — the
    entropy sum accumulates in sorted-term order (deterministic); round(6)
    absorbs the hash-order difference of the SQL twin's aggregate."""

    def ent(batch: pa.Table) -> pa.Table:
        flat = _tokens_flat(batch)
        if flat.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "n_distinct": pa.array([], pa.int64()),
                 "entropy": pa.array([], pa.float64())}
            )
        doc = flat.column("doc_id").to_numpy()
        tf = flat.column("tf").to_numpy().astype(np.float64)
        udocs, codes = np.unique(doc, return_inverse=True)
        n = np.bincount(codes, weights=tf)
        n_distinct = np.bincount(codes).astype(np.int64)
        p = tf / n[codes]
        h = np.bincount(codes, weights=-(p * np.log(p)))
        return pa.table(
            {
                "doc_id": pa.array(udocs.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "entropy": pa.array(np.round(h, 6), pa.float64()),
            }
        )

    return _documents(sf_dir).map_batches(ent, batch_format="pyarrow")


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def customer_geohash_grid(sf_dir: str, precision: int = 5, k: int = 20):
    """ES ``geohash_grid`` aggregation (the base-32 sibling of
    ``customer_geotile_grid``): bucket every customer's synthetic
    coordinate (same deterministic c_custkey derivation as
    customers_near_point) into a precision-5 geohash and count per cell,
    top-k by (count DESC, hash ASC). The quantization is EXACT integer
    arithmetic on both sides: the synthetic coords are rationals
    (hundredths of a degree), so ``floor((lon+180)/360 * 2^13)`` ==
    ``(m * 8192) // 36000`` with ``m = c_custkey*104729 % 36000`` — no
    float boundary anywhere. Standard geohash bit layout: 25 bits for
    precision 5, alternating lon/lat starting with lon (13 lon, 12 lat),
    5-bit groups through the classic base-32 alphabet. Per-batch partial
    counts are the only shuffle."""
    import ray.data

    assert precision == 5, "bit-split below is precision-5 (13 lon / 12 lat)"

    def cells(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        m_lon = ck * 104729 % 36000  # (lon + 180) in hundredths of degrees
        n_lat = ck * 7919 % 18000  # (lat + 90) in hundredths of degrees
        lon_q = (m_lon * 8192) // 36000  # 13 bits
        lat_q = (n_lat * 4096) // 18000  # 12 bits
        code = np.zeros(len(ck), np.int64)
        for i in range(25):
            if i % 2 == 0:
                bit = (lon_q >> (12 - i // 2)) & 1
            else:
                bit = (lat_q >> (11 - i // 2)) & 1
            code = (code << 1) | bit
        u, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {"code": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
        )
        .map_batches(cells, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("code", as_index=False)["n"].sum()
    codes = agg["code"].to_numpy().astype(np.int64)
    hashes = [
        "".join(
            _GEOHASH32[(int(c) >> (5 * (4 - g))) & 31] for g in range(5)
        )
        for c in codes
    ]
    agg["geohash"] = hashes
    agg = agg.sort_values(
        ["n", "geohash"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            "geohash": pa.array(agg["geohash"].tolist(), pa.string()),
            "doc_count": pa.array(
                agg["n"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def span_multi_search(
    sf_dir: str, first: str = "the", prefix: str = "s", limit: int = 10
):
    """Lucene SpanMultiTermQueryWrapper: a span_near whose second slot is a
    MULTI-TERM query (here ``prefix*``), rewritten — exactly as Lucene's
    SpanRewriteMethod does — into a SpanOr over the dictionary expansion:
    ``first X`` for every vocabulary term X with the prefix. The expansion
    comes from the positional index's sorted dictionary (one searchsorted
    range); the verified union reuses the span_or kernel. Distinct clause
    starts can never collide (one term occupies a position), so the SQL
    twin is a single positional self-join with a LIKE predicate."""
    from clip_as_service_ray.pipelines.build_index import build_index
    from clip_as_service_ray.pipelines.phrase import (
        build_positions,
        phrase_search_table,
    )
    from clip_as_service_ray.stages.query import IndexReader

    cfg = EngineConfig(num_index_partitions=4)
    index_dir = _index_dir_for(sf_dir)
    build_index(_docs_as_transcripts(sf_dir), index_dir, cfg)
    build_positions(_docs_as_transcripts(sf_dir), index_dir, cfg)
    terms = IndexReader(index_dir).expand_prefix(prefix)
    if not terms:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "span_tf": pa.array([], pa.int64()),
             "first_pos": pa.array([], pa.int64())}
        )
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "text": pa.array([" | ".join(f"{first} {t}" for t in terms)]),
            "limit": pa.array([limit], pa.int32()),
        }
    )
    hits = phrase_search_table(index_dir, q, cfg, span_or=True)
    doc_ids = [int(c[4:]) for c in hits.column("conv_id").to_pylist()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "span_tf": hits.column("phrase_tf"),
            "first_pos": hits.column("first_pos"),
        }
    )


def events_hour_of_day(sf_dir: str):
    """Hour-of-day activity profile (the ES date_histogram hour rollup /
    classic time-of-day analytics): per hour 0-23, event count and exact
    value sum in integer cents. hour = (epoch_us // 3600e6) % 24 — all
    int64; per-batch partials shuffle <= 24 rows each."""
    import ray.data

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(
            batch.column("value").to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        hour = ((e // HOUR_US) % 24).astype(np.int64)
        n = np.bincount(hour, minlength=24).astype(np.int64)
        c = np.bincount(hour, weights=cents, minlength=24).astype(np.int64)
        return pa.table(
            {"hour": pa.array(np.arange(24, dtype=np.int64), pa.int64()),
             "n": pa.array(n, pa.int64()),
             "cents": pa.array(c, pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("hour", as_index=False).sum().sort_values("hour")
    return pa.table(
        {
            "hour": pa.array(agg["hour"].to_numpy().astype(np.int64), pa.int64()),
            "cnt": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
            "sum_value": pa.array(
                agg["cents"].to_numpy().astype(np.int64) / 100.0, pa.float64()
            ),
        }
    )


def token_length_histogram(sf_dir: str):
    """Token-length distribution over the corpus (tokenizer fertility — the
    signal behind max_token_length / long-word quality rules): codepoint
    length of every token -> exact counts. One vectorized pass (flat token
    stream + utf8_length + bincount partials); all integer."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens, _ = tokenize_column_flat(batch.column("text"))
        if len(tokens) == 0:
            return pa.table(
                {"len": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        lens = pc.utf8_length(tokens).to_numpy().astype(np.int64)
        cnt = np.bincount(lens)
        keep = cnt > 0
        return pa.table(
            {
                "len": pa.array(np.nonzero(keep)[0].astype(np.int64), pa.int64()),
                "n": pa.array(cnt[keep].astype(np.int64), pa.int64()),
            }
        )

    parts = _documents(sf_dir).map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("len", as_index=False)["n"].sum().sort_values("len")
    return pa.table(
        {
            "len": pa.array(agg["len"].to_numpy().astype(np.int64), pa.int64()),
            "cnt": pa.array(agg["n"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


def events_change_point(sf_dir: str):
    """ES ``change_point`` aggregation analog over the daily event-count
    histogram: the split day maximizing the mean shift between the before
    and after segments. Honest simplification vs ES's p-value machinery,
    made EXACT: the objective |mean_b - mean_a| is cross-multiplied into
    the integer |S_k*(m-k) - (S_m-S_k)*k| (same argmax), so engine and SQL
    pick the SAME split with zero float-boundary risk; the reported means
    round 6. Distributed per-batch partials -> bucket-sized driver math."""
    import ray.data

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("ts").cast(pa.int64()).to_numpy()
        b = (e // DAY_US) * DAY_US
        u, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"b": pa.array(u, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("b", as_index=False).sum().sort_values("b")
    days = agg["b"].to_numpy().astype(np.int64)
    cnt = agg["n"].to_numpy().astype(np.int64)
    m = len(cnt)
    if m < 2:
        return pa.table(
            {"split_day": pa.array([], pa.timestamp("us")),
             "before_mean": pa.array([], pa.float64()),
             "after_mean": pa.array([], pa.float64()),
             "shift_score": pa.array([], pa.int64())}
        )
    s = np.cumsum(cnt)
    k = np.arange(1, m)  # before = first k days
    score = np.abs(s[:-1] * (m - k) - (s[-1] - s[:-1]) * k)
    best = int(np.argmax(score))  # argmax keeps the FIRST max = earliest day
    kb = best + 1
    return pa.table(
        {
            # the split day = last day of the before segment
            "split_day": pa.array([int(days[best])], pa.timestamp("us")),
            "before_mean": pa.array(
                [float(_sql_round(s[best] / kb, 6))], pa.float64()
            ),
            "after_mean": pa.array(
                [float(_sql_round((s[-1] - s[best]) / (m - kb), 6))],
                pa.float64(),
            ),
            "shift_score": pa.array([int(score[best])], pa.int64()),
        }
    )


def html_strip_documents(sf_dir: str):
    """ES ``html_strip`` char filter: tag removal + the 5 standard entity
    decodes, exercised NON-trivially on the plain-text fixture by first
    wrapping each doc in deterministic doc_id-derived markup (the SQL twin
    constructs the IDENTICAL wrapped text, so the check certifies the
    stripping logic itself, not an identity pass). Vectorized Arrow
    replace/regex kernels; output = (doc_id, stripped, n_stripped)."""

    def strip(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        tag = pc.binary_join_element_wise(
            pa.array(["<p class=\"d"] * batch.num_rows),
            pc.cast(ids, pa.string()),
            "\">",
            "",
        )
        wrapped = pc.binary_join_element_wise(
            tag,
            pc.replace_substring(batch.column("text"), " ", " &amp; ", max_replacements=1),
            "</p><br/>",
            "",
        )
        stripped = pc.replace_substring_regex(wrapped, "<[^>]*>", "")
        for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                        ("&quot;", "\""), ("&#39;", "'")]:
            stripped = pc.replace_substring(stripped, ent, ch)
        return pa.table(
            {
                "doc_id": ids,
                "stripped": stripped,
                "n_stripped": pc.cast(
                    pc.subtract(
                        pc.utf8_length(wrapped), pc.utf8_length(stripped)
                    ),
                    pa.int64(),
                ),
            }
        )

    return _documents(sf_dir).map_batches(strip, batch_format="pyarrow")

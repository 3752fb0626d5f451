"""Search pipeline: queries Dataset -> ranked hits Dataset.

The /search path (``client.py:785-820``; ``retriever.md:203-225``) as a Ray
Data pipeline: queries stream through a ``QueryScorer`` actor pool whose
actors hold the index (state loaded once per actor, the T1/T5 ctor pattern).
Output rows are keyed by ``query_id`` so order restoration is a cheap final
sort of the small result — the analog of the reference's id-join order
restoration (``client.py:160-166``), which never relies on stream order.
"""

from __future__ import annotations

import pyarrow as pa

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.stages.query import QueryScorer


def search(
    index_dir: str,
    queries,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    conjunctive: bool = False,
    prefix: bool = False,
    fuzzy: int = 0,
    synonyms: dict | None = None,
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
    """queries: pa.Table | ray.data.Dataset with (query_id, text[, limit,
    exclude]). Returns a lazy Dataset of flat ranked hits.
    ``conjunctive=True`` switches to boolean-AND semantics; ``prefix=True``
    treats each query text as a term prefix (wildcard expansion); an
    ``exclude`` column applies boolean NOT per query; ``synonyms`` expands
    OR-query terms by a curated term->[terms] map at query time;
    ``boosted=True`` parses Lucene caret boosts in the query text
    ("merge^2 window"); ``min_match=N`` applies a minimum_should_match
    floor of N distinct matched terms; ``collapse=True`` returns one best
    turn per conversation (ES field-collapse); per-query ``after_score`` /
    ``after_doc`` columns page with a search_after cursor (default OR mode
    only)."""
    import ray.data

    qds = ray.data.from_arrow(queries) if isinstance(queries, pa.Table) else queries
    return qds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "default_limit": config.limit,
            "pruning": config.query_pruning,
            "conjunctive": conjunctive,
            "prefix": prefix,
            "fuzzy": fuzzy,
            "fuzzy_transpositions": fuzzy_transpositions,
            "synonyms": synonyms,
            "delta": delta,
            "boosted": boosted,
            "min_match": min_match,
            "collapse": collapse,
            "suffix": suffix,
            "regex": regex,
            "term_range": term_range,
            "block_join": block_join,
            "decay": decay,
            "boosting": boosting,
            "terms_set": terms_set,
            "similarity": similarity,
            "sim_param": sim_param,
            "common_terms": common_terms,
            "bool_query": bool_query,
            "min_should": min_should,
            "k1": k1,
            "b": b,
            "bool_prefix": bool_prefix,
        },
        batch_format="pyarrow",
        batch_size=config.query_batch_size,
        concurrency=config.query_concurrency,
    )


def search_table(
    index_dir: str,
    queries: pa.Table,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    conjunctive: bool = False,
    prefix: bool = False,
    fuzzy: int = 0,
    synonyms: dict | None = None,
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
) -> pa.Table:
    """Materialized convenience wrapper: hits sorted (query_id ASC, rank ASC)
    — the order/identity-preservation contract (test_ranker.py:233-239)."""
    ds = search(
        index_dir, queries, config,
        conjunctive=conjunctive, prefix=prefix, fuzzy=fuzzy,
        fuzzy_transpositions=fuzzy_transpositions,
        synonyms=synonyms, delta=delta, boosted=boosted, min_match=min_match,
        collapse=collapse, suffix=suffix, regex=regex, term_range=term_range,
        block_join=block_join, decay=decay, boosting=boosting,
        terms_set=terms_set, similarity=similarity, sim_param=sim_param,
        common_terms=common_terms, bool_query=bool_query,
        min_should=min_should, k1=k1, b=b, bool_prefix=bool_prefix,
    )
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        from clip_as_service_ray.pipelines.oracle import HITS_SCHEMA

        return HITS_SCHEMA.empty_table()
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])


HIT_STRUCT = pa.struct(
    [("conv_id", pa.string()), ("turn_idx", pa.int32()),
     ("score", pa.float64()), ("rank", pa.int32())]
)


def search_nested(
    index_dir: str, queries: pa.Table, config: EngineConfig = DEFAULT_CONFIG
) -> pa.Table:
    """One row per query with a ``hits: list<struct>`` column — the direct
    mapping of the reference's nested ``doc.matches`` DocumentArray
    (SURVEY.md §1.4): every input query appears exactly once, in input
    order, with its ranked (possibly empty) match list. Assembly is
    vectorized: hits are permuted into input-query order once and wrapped
    as a ListArray over a StructArray (no per-row Python)."""
    import numpy as np

    flat = search_table(index_dir, queries, config).combine_chunks()
    qids = queries.column("query_id").to_numpy()
    n_q = len(qids)
    hit_qids = flat.column("query_id").to_numpy()
    # map each hit to its input-query position (query_id unique per contract)
    order = np.argsort(qids, kind="stable")
    inp_pos = order[np.searchsorted(qids[order], hit_qids)]
    counts = np.zeros(n_q, dtype=np.int64)
    np.add.at(counts, inp_pos, 1)
    perm = np.lexsort((flat.column("rank").to_numpy(), inp_pos))
    taken = flat.take(pa.array(perm, pa.int64()))
    struct = pa.StructArray.from_arrays(
        [
            taken.column("conv_id").combine_chunks(),
            taken.column("turn_idx").combine_chunks(),
            taken.column("score").combine_chunks(),
            taken.column("rank").combine_chunks(),
        ],
        fields=list(HIT_STRUCT),
    )
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32), pa.int32()
    )
    return pa.table(
        {
            "query_id": queries.column("query_id"),
            "text": queries.column("text"),
            "hits": pa.ListArray.from_arrays(offsets, struct),
        }
    )

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
):
    """queries: pa.Table | ray.data.Dataset with (query_id, text[, limit]).
    Returns a lazy Dataset of flat ranked hits."""
    import ray.data

    qds = ray.data.from_arrow(queries) if isinstance(queries, pa.Table) else queries
    return qds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "default_limit": config.limit,
            "pruning": config.query_pruning,
        },
        batch_format="pyarrow",
        batch_size=config.query_batch_size,
        concurrency=config.query_concurrency,
    )


def search_table(index_dir: str, queries: pa.Table, config: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Materialized convenience wrapper: hits sorted (query_id ASC, rank ASC)
    — the order/identity-preservation contract (test_ranker.py:233-239)."""
    ds = search(index_dir, queries, config)
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
    order, with its ranked (possibly empty) match list."""
    flat = search_table(index_dir, queries, config)
    by_qid: dict[int, list[dict]] = {}
    for row in flat.to_pylist():
        by_qid.setdefault(row["query_id"], []).append(
            {"conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
             "score": row["score"], "rank": row["rank"]}
        )
    qids = queries.column("query_id").to_pylist()
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "text": queries.column("text"),
            "hits": pa.array([by_qid.get(q, []) for q in qids], pa.list_(HIT_STRUCT)),
        }
    )

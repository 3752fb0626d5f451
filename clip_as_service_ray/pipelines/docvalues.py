"""Index-time numeric doc values + decay scoring support.

The ES/Lucene analog: a per-document numeric column stored COLUMNAR next to
the inverted index (Lucene doc values), read by scoring features that need a
field per candidate — function_score decay (gauss/exp/linear), field-value
boosts, sort-by-field with scores. The reference has no index (it serves
dense vectors), but its rank path reads per-candidate payloads the same way
(client.py:160-166 re-joins scores onto documents); this is the engine-side
generalization.

Layout: ``<index_dir>/doc_values/field=<name>/`` parquet rows
(bucket, doc_id, value), hive-partitioned by doc bucket (doc_id //
doc_bucket_size) — the SAME bucket scheme as the postings exchange, so a
range-sharded reader at 10^11 docs loads only its doc range; the sandbox
reader materializes one float64 array of n_docs (8 B/doc).

Build is a single streaming pass: (conv_id, turn_idx, value) batches map to
(doc_id, value) via the broadcast conv-base lookup (ray.put once, resolved
lazily per worker), written hive-partitioned, resumable via the stage
manifest like every other artifact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.state import manifest as mf

DOC_VALUES = "doc_values"


class EmitDocValues:
    """map_batches UDF: (conv_id, turn_idx, <value>) -> (bucket, doc_id,
    value) rows. Conv-base ref resolved lazily per worker (T1 pattern)."""

    def __init__(self, conv_base_ref, value_column: str, doc_bucket_size: int):
        self.conv_base_ref = conv_base_ref
        self.value_column = value_column
        self.doc_bucket_size = doc_bucket_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from clip_as_service_ray.stages.tokenize import _get_conv_base

        conv_base = _get_conv_base(self.conv_base_ref)
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        doc = conv_base.lookup(conv) + turn
        val = batch.column(self.value_column).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(doc // self.doc_bucket_size, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "value": pa.array(val.astype(np.float64), pa.float64()),
            }
        )


def build_doc_values(
    source,
    index_dir: str,
    field: str,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    value_column: str | None = None,
) -> dict:
    """Build (or resume) the ``field`` doc-values artifact inside an
    existing index dir. ``source``: path / pa.Table / Dataset with
    (conv_id, turn_idx, <value_column or field>)."""
    import ray
    import ray.data

    from clip_as_service_ray.pipelines.build_index import _prep_from_extents

    vcol = value_column or field
    out_dir = os.path.join(index_dir, DOC_VALUES, f"field={field}")
    if config.resume and mf.stage_done(out_dir):
        return mf.read_stage(out_dir)

    convmap_path = os.path.join(index_dir, "convmap.parquet")
    if not os.path.exists(convmap_path):
        raise FileNotFoundError(
            f"{convmap_path} missing: build_index must run before "
            "build_doc_values"
        )
    prep = _prep_from_extents(
        pq.read_table(convmap_path).select(["conv_id", "max_turn"]),
        config.doc_bucket_size,
        config.merge_groups_per_part,
    )
    prep_ref = ray.put(prep)

    if isinstance(source, (str, list)):
        ds = ray.data.read_parquet(
            source, columns=["conv_id", "turn_idx", vcol]
        )
    elif isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source.select(["conv_id", "turn_idx", vcol]))
    else:
        ds = source

    mf.reset_stage(out_dir)
    ds.map_batches(
        EmitDocValues(prep_ref, vcol, config.doc_bucket_size),
        batch_format="pyarrow",
        batch_size=config.tokenize_batch_size,
    ).write_parquet(out_dir, partition_cols=["bucket"])
    info = {"stage": "doc_values", "field": field,
            "bytes": mf.dir_bytes(out_dir)}
    mf.mark_stage_done(out_dir, info)
    return info


def load_doc_values(index_dir: str, field: str, n_slots: int) -> np.ndarray:
    """Read a doc-values field into a doc-indexed float64 array (NaN where
    a doc has no value). Sandbox form of the range-sharded reader: at
    10^11 docs each query worker loads only the buckets of its doc range
    (the hive partition IS the range key)."""
    dv_dir = os.path.join(index_dir, DOC_VALUES, f"field={field}")
    if not mf.stage_done(dv_dir):
        raise FileNotFoundError(
            f"no doc-values artifact for field {field!r} under {index_dir!r}:"
            " run build_doc_values first"
        )
    t = pq.read_table(dv_dir, columns=["doc_id", "value"])
    arr = np.full(n_slots, np.nan, dtype=np.float64)
    arr[t.column("doc_id").to_numpy()] = t.column("value").to_numpy()
    return arr


def decay_multiplier(
    values: np.ndarray,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
) -> np.ndarray:
    """ES function_score decay curves (all three kinds, exact formulas from
    the ES docs): multiplier 1.0 at |v-origin| <= offset, ``decay`` at
    distance ``scale`` past the offset. NaN values (doc has no field) decay
    to 1.0 — missing fields leave the BM25 score unchanged."""
    d = np.maximum(np.abs(values - origin) - offset, 0.0)
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * np.log(decay))
        m = np.exp(-(d * d) / (2.0 * sigma2))
    elif kind == "exp":
        m = np.exp(np.log(decay) / scale * d)
    elif kind == "linear":
        s = scale / (1.0 - decay)
        m = np.maximum((s - d) / s, 0.0)
    else:
        raise ValueError(f"unknown decay kind {kind!r}")
    return np.where(np.isnan(values), 1.0, m)


def fvf_multiplier(
    values: np.ndarray,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
) -> np.ndarray:
    """ES function_score ``field_value_factor``: multiplier =
    modifier(factor * field_value), with the full ES modifier set (log* are
    base-10 per the ES docs, ln* natural). NaN values (doc has no field)
    take ``missing`` BEFORE factor/modifier — the ES missing-param
    contract."""
    v = np.where(np.isnan(values), float(missing), values) * float(factor)
    if modifier == "none":
        return v
    if modifier == "log":
        return np.log10(v)
    if modifier == "log1p":
        return np.log10(v + 1.0)
    if modifier == "log2p":
        return np.log10(v + 2.0)
    if modifier == "ln":
        return np.log(v)
    if modifier == "ln1p":
        return np.log(v + 1.0)
    if modifier == "ln2p":
        return np.log(v + 2.0)
    if modifier == "square":
        return v * v
    if modifier == "sqrt":
        return np.sqrt(v)
    if modifier == "reciprocal":
        return 1.0 / v
    raise ValueError(f"unknown field_value_factor modifier {modifier!r}")


def rank_feature_boost(
    values: np.ndarray,
    function: str = "saturation",
    pivot: float = 1.0,
    weight: float = 1.0,
    exponent: float = 0.6,
    scaling_factor: float = 1.0,
) -> np.ndarray:
    """ES ``rank_feature`` query: an ADDITIVE score contribution
    weight * S(v) where S is saturation v/(v+pivot), log
    ln(scaling_factor + v), or sigmoid v^a/(v^a + pivot^a) — the boost_mode
    "sum" counterpart of the multiplicative decay/fvf curves. NaN (doc has
    no feature value) contributes exactly 0.0, so feature-less docs keep
    their BM25 score bit-identical (x + 0.0 == x)."""
    v = values
    if function == "saturation":
        s = v / (v + pivot)
    elif function == "log":
        s = np.log(scaling_factor + v)
    elif function == "sigmoid":
        vp = v ** exponent
        s = vp / (vp + pivot ** exponent)
    else:
        raise ValueError(f"unknown rank_feature function {function!r}")
    return np.where(np.isnan(values), 0.0, weight * s)

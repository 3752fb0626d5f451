"""Config-driven pipeline builder — the Flow-YAML analog.

The reference wires its serving pipeline from YAML (executors, replicas,
shards — ``server/clip_server/__main__.py:21-27``, ``torch-flow.yml``).
Our batch-engine equivalent: a plain dict describes a sequence of stages;
each stage names an operator, its arguments, and (optionally) consumes the
output of an earlier stage via ``"$stage_name"`` references. No new
execution machinery — this just assembles calls into the pipelines/stages
API, which is exactly what the Flow YAML does for executors.

Example:

    flow = {
        "stages": [
            {"name": "dedup", "op": "dedup_turns", "args": {"source": "/data/t.parquet"}},
            {"name": "index", "op": "build_index",
             "args": {"source": "$dedup", "index_dir": "/tmp/idx"}},
            {"name": "hits", "op": "search",
             "args": {"index_dir": "/tmp/idx", "queries": "$queries"}},
        ],
    }
    results = run_flow(flow, inputs={"queries": queries_table})
"""

from __future__ import annotations

from typing import Any

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig


def _op_build_index(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.build_index import build_index

    return build_index(args["source"], args["index_dir"], cfg,
                       overwrite=args.get("overwrite", False))


def _op_search(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.search import search_table

    # optional query-mode passthrough: any search_table keyword works from
    # YAML (conjunctive/prefix/fuzzy/bool_query/min_should/similarity/
    # sim_param/common_terms/delta/...)
    kw = {
        k: v for k, v in args.items() if k not in ("index_dir", "queries")
    }
    return search_table(args["index_dir"], args["queries"], cfg, **kw)


def _op_dedup_turns(args: dict, cfg: EngineConfig):
    import ray.data

    from clip_as_service_ray.stages.dedup import dedup_turns

    src = args["source"]
    ds = ray.data.read_parquet(src) if isinstance(src, str) else src
    if not hasattr(ds, "map_batches"):
        ds = ray.data.from_arrow(ds)
    return dedup_turns(ds)


def _op_minhash_dedup(args: dict, cfg: EngineConfig):
    import ray.data

    from clip_as_service_ray.stages.dedup import minhash_lsh_pairs

    src = args["source"]
    ds = ray.data.read_parquet(src) if isinstance(src, str) else src
    return minhash_lsh_pairs(ds, threshold=args.get("threshold", 0.8))


def _as_ds(src):
    import ray.data

    if isinstance(src, str):
        return ray.data.read_parquet(src)
    if hasattr(src, "map_batches"):
        return src
    return ray.data.from_arrow(src)


def _op_add_segment(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.segments import add_segment

    return add_segment(args["index_root"], args["source"], cfg)


def _op_segmented_search(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.segments import SegmentedQueryService

    svc = SegmentedQueryService(args["index_root"], cfg)
    try:
        return svc.search(args["queries"])
    finally:
        svc.shutdown()


def _op_merge_segments(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.segments import merge_segments

    return merge_segments(args["index_root"], args["out_dir"], cfg)


def _op_simhash_dedup(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_as_ds(args["source"]), max_hamming=args.get("max_hamming", 3))


def _op_audio_features(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.multimodal import extract_audio_features

    return extract_audio_features(
        _as_ds(args["source"]), sample_rate=args.get("sample_rate", 16000)
    )


def _op_image_preprocess(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.multimodal import preprocess_images

    return preprocess_images(
        _as_ds(args["source"]),
        size=args.get("size", 224),
        decode=args.get("decode", "fake"),
    )


def _op_sessionize(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.windows import sessionize

    return sessionize(
        _as_ds(args["source"]),
        key=args.get("key", "user_id"),
        ts=args.get("ts", "ts"),
        gap_s=args.get("gap_s", 1800.0),
    )


def _op_rolling_sum(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.windows import rolling_sum_by_key

    return rolling_sum_by_key(
        _as_ds(args["source"]),
        key=args["key"],
        ts=args.get("ts", "ts"),
        value=args["value"],
        id_col=args["id_col"],
        window_s=args["window_s"],
    )


def _op_range_join_count(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.joins import range_join_count

    return range_join_count(
        _as_ds(args["left"]),
        _as_ds(args["right"]),
        key=args["key"],
        ts=args.get("ts", "ts"),
        left_id=args["left_id"],
        window_s=args["window_s"],
    )


def _op_semi_join(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.joins import shuffle_semi_join

    return shuffle_semi_join(_as_ds(args["left"]), _as_ds(args["right"]), on=args["on"])


def _op_anti_join(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.stages.joins import shuffle_anti_join

    return shuffle_anti_join(_as_ds(args["left"]), _as_ds(args["right"]), on=args["on"])


def _op_build_positions(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.phrase import build_positions

    return build_positions(args["source"], args["index_dir"], cfg)


def _op_phrase_search(args: dict, cfg: EngineConfig):
    from clip_as_service_ray.pipelines.phrase import phrase_search_table

    return phrase_search_table(
        args["index_dir"], args["queries"], cfg,
        window=args.get("window", 0),
    )


OPS = {
    "build_index": _op_build_index,
    "search": _op_search,
    "dedup_turns": _op_dedup_turns,
    "minhash_dedup": _op_minhash_dedup,
    "simhash_dedup": _op_simhash_dedup,
    "add_segment": _op_add_segment,
    "segmented_search": _op_segmented_search,
    "merge_segments": _op_merge_segments,
    "audio_features": _op_audio_features,
    "image_preprocess": _op_image_preprocess,
    "sessionize": _op_sessionize,
    "rolling_sum": _op_rolling_sum,
    "range_join_count": _op_range_join_count,
    "semi_join": _op_semi_join,
    "anti_join": _op_anti_join,
    "build_positions": _op_build_positions,
    "phrase_search": _op_phrase_search,
}


def run_flow(
    flow: dict,
    inputs: dict[str, Any] | None = None,
    config: EngineConfig | None = None,
) -> dict[str, Any]:
    """Execute a stage list; returns {stage_name: result}. ``$name`` in any
    arg value resolves to a prior stage's result or a caller input."""
    cfg = config or (
        EngineConfig(**flow["config"]) if "config" in flow else DEFAULT_CONFIG
    )
    results: dict[str, Any] = dict(inputs or {})
    for stage in flow["stages"]:
        op = OPS.get(stage["op"])
        if op is None:
            raise ValueError(f"unknown op {stage['op']!r}; known: {sorted(OPS)}")
        args = {
            k: (results[v[1:]] if isinstance(v, str) and v.startswith("$") else v)
            for k, v in stage.get("args", {}).items()
        }
        results[stage["name"]] = op(args, cfg)
    return {s["name"]: results[s["name"]] for s in flow["stages"]}

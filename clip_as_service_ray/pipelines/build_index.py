"""Offline index build — the /index pipeline (SURVEY.md §3.3, C7).

Ray-Data-first dataflow (every wide step is an explicit, keyed exchange,
SURVEY.md §7.4):

    read_parquet(transcripts, columns=[conv_id, turn_idx, text])
      ├─ conv extents → prefix-sum → broadcast ConvBase           [small]
      ├─ ONE fused pass: TokenizeEmitPartials (SPIMI
      │    per-batch local index, combiner pre-aggregation)
      │    → partials/part=K/bgrp=J/ parquet                      [map side]
      │    (corpus stats ride along as 1 tiny row per batch under
      │     part=-1 — no second pass, no staging barrier)
      ├─ stats.json ← sum of the part=-1 pseudo-partition         [tiny read]
      ├─ merge_partition × 1 Ray task per (part, bgrp) grid cell  [reduce side]
      │    → postings/part=K/ block-max parquet (+ per-part manifest)
      └─ dictionary: sum(n) per term over postings block metadata [small agg]

    The wide exchange is DISK-PARTITIONED (partition_cols on the map side,
    one reduce task per grid cell) — the SPIMI spill-file model: sequential
    IO, no in-memory sort shuffle, per-partition resume + lineage. The
    tiny side-aggregations run driver-side below DRIVER_AGG_MAX_BYTES and
    as distributed groupbys above it.

Resumability: each stage output directory carries a ``_DONE.json`` manifest
with counters (terms, postings, bytes, seconds — the north rule's lineage
requirement); a restarted build skips completed stages (skip-if-valid,
mirroring ``pretrained_models.py:161-167``).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.config import DEFAULT_CONFIG, EngineConfig
from clip_as_service_ray.stages.merge import (
    STATS_PART,
    TokenizeEmitPartials,
    merge_partition,
)
from clip_as_service_ray.stages.tokenize import (
    build_sharded_conv_base,
    compute_conv_bases,
)
from clip_as_service_ray.state import manifest as mf

STAGING = "staging"
PARTIALS = "partials"
POSTINGS = "postings"
DICTIONARY = "dictionary"


def _num_cpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8))


def _as_dataset(source, roles: tuple | None = None):
    import ray.data

    if isinstance(source, (str, list)):
        # override_num_blocks: split few-file inputs on row-group boundaries
        # so the tokenize stage parallelizes; no-op when files >= blocks
        cols = ["conv_id", "turn_idx", "text"] + (["role"] if roles else [])
        ds = ray.data.read_parquet(
            source, columns=cols, override_num_blocks=2 * _num_cpus()
        )
    elif isinstance(source, pa.Table):
        cols = ["conv_id", "turn_idx", "text"] + (["role"] if roles else [])
        ds = ray.data.from_arrow(source.select(cols))
    else:
        ds = source  # already a Dataset
    if roles:
        # M1 modality-split analog: route/keep only the requested roles
        keep = set(roles)

        def role_filter(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(batch.column("role"), value_set=pa.array(sorted(keep)))
            return batch.filter(mask).drop_columns(["role"])

        ds = ds.map_batches(role_filter, batch_format="pyarrow")
    return ds


# below this many input bytes, the tiny side-aggregations (conv extents,
# corpus stats, dictionary) run driver-side with plain pyarrow — a Ray job's
# fixed scheduling cost dwarfs the compute there and flattens the scaling
# curve. Above it, the distributed paths run.
DRIVER_AGG_MAX_BYTES = 4 << 30


def _source_bytes(source) -> int:
    if isinstance(source, str):
        if os.path.isdir(source):
            return mf.dir_bytes(source)
        try:
            return os.path.getsize(source)
        except OSError:
            return 1 << 62
    if isinstance(source, list):
        return sum(_source_bytes(s) for s in source)
    if isinstance(source, pa.Table):
        return source.nbytes
    return 1 << 62  # unknown (Dataset) -> use the distributed path


def _conv_extents_driver(source) -> pa.Table:
    """Single-task (conv_id, max_turn): column-pruned read + C++ group-max.
    Runs as ONE Ray task overlapped with the fused tokenize pass for
    path-like small inputs (not on the driver)."""
    if isinstance(source, pa.Table):
        t = source.select(["conv_id", "turn_idx"])
    else:
        t = pq.read_table(source, columns=["conv_id", "turn_idx"])
    g = t.group_by("conv_id").aggregate([("turn_idx", "max")])
    g = g.rename_columns(["conv_id", "max_turn"])
    return g.set_column(
        1, "max_turn", g.column("max_turn").cast(pa.int64())
    ).sort_by("conv_id")


def _prep_from_extents(
    extents: pa.Table, doc_bucket_size: int, merge_groups_per_part: int
) -> dict:
    """Build-planning state derived from the conv extents: the broadcast
    ConvBase plus the 2-D grid's doc-range group width (from the doc-id
    SPAN — a tight upper bound on n_docs, known before the pass runs)."""
    n_slots = (
        int(np.sum(extents.column("max_turn").to_numpy() + 1))
        if extents.num_rows
        else 0
    )
    n_buckets = max(1, -(-n_slots // doc_bucket_size))
    grp_width = max(1, -(-n_buckets // merge_groups_per_part))
    return {
        "conv_base": compute_conv_bases(extents),
        "grp_width": grp_width,
        "n_slots": n_slots,
        "extents": extents,
    }


def _probe_path(path: str) -> bool:
    return os.path.exists(path)


def _assert_shared_storage(index_dir: str) -> None:
    """The disk-partitioned exchange passes ``index_dir`` paths between the
    driver and remote tasks, so on a multi-node cluster ``index_dir`` MUST
    live on storage visible to every node (NFS/EFS/fuse-mounted object
    store). Single node: trivially true, probe skipped. Multi node: a
    write->remote-read probe per node turns silent data loss into a clear
    error at build start."""
    import ray

    alive = [n for n in ray.nodes() if n.get("Alive")]
    if len(alive) <= 1:
        return
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    token = os.path.join(index_dir, ".storage_probe")
    with open(token, "w") as f:
        f.write("probe")
    probe = ray.remote(num_cpus=0)(_probe_path)
    for n in alive:
        ok = ray.get(
            probe.options(
                scheduling_strategy=NodeAffinitySchedulingStrategy(n["NodeID"], soft=True)
            ).remote(token)
        )
        if not ok:
            raise RuntimeError(
                f"index_dir {index_dir!r} is not visible from node "
                f"{n.get('NodeManagerAddress')}: the build's disk exchange "
                "requires index_dir on shared storage (NFS/EFS/fuse object "
                "store) when running multi-node"
            )


def _file_extents(path: str) -> pa.Table:
    """(conv_id, max_turn) for ONE parquet file — the per-file leg of the
    parallel extents scan."""
    t = pq.read_table(path, columns=["conv_id", "turn_idx"])
    g = t.group_by("conv_id").aggregate([("turn_idx", "max")])
    return g.rename_columns(["conv_id", "max_turn"])


def _source_files(source) -> list[str]:
    """Parquet files of a path-like source ([] when not path-like)."""
    if isinstance(source, str):
        if os.path.isdir(source):
            return sorted(
                os.path.join(source, f)
                for f in os.listdir(source)
                if f.endswith(".parquet")
            )
        return [source] if os.path.isfile(source) else []
    if isinstance(source, list):
        out: list[str] = []
        for s in source:
            out.extend(_source_files(s))
        return out
    return []


def _rg_work_items(source) -> list[dict]:
    """(file, row-group) work items — the read-in-task plan. Footer-only
    metadata reads; [] when the source is not path-like."""
    items: list[dict] = []
    for f in _source_files(source):
        try:
            n_rg = pq.ParquetFile(f).metadata.num_row_groups
        except Exception:
            return []
        items.extend({"path": f, "rg": rg} for rg in range(n_rg))
    return items


class _ReadThenEmit:
    """Read-in-task fused UDF: one (file, row-group) item -> read the rows
    INSIDE the task -> tokenize+emit partial runs.

    Why not read_parquet().map_batches(...): Ray Data 2.49 does not fuse the
    read operator with a downstream map, so every text byte would cross the
    object store between the read task and the tokenize task. Under
    first-touch-throttled memory that transfer is the build's largest cost
    at scale (measured: the plasma hop saturates before the CPUs do). With
    the read inside the task, only the compact partial runs (~5.6 B/posting)
    ever enter the object store; parallelism = row groups, the same
    granularity read_parquet can split to anyway. Peak task memory is one
    row group, sub-batched to ``batch_size`` rows per emit call."""

    def __init__(self, emit, roles: tuple | None, batch_size: int):
        self.emit = emit
        self.roles = tuple(sorted(roles)) if roles else None
        self.batch_size = batch_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = ["conv_id", "turn_idx", "text"] + (["role"] if self.roles else [])
        outs = []
        for i in range(batch.num_rows):
            path = batch.column("path")[i].as_py()
            rg = batch.column("rg")[i].as_py()
            t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
            if self.roles:
                mask = pc.is_in(t.column("role"), value_set=pa.array(list(self.roles)))
                t = t.filter(mask).drop_columns(["role"])
            for s in range(0, max(t.num_rows, 1), self.batch_size):
                outs.append(self.emit(t.slice(s, self.batch_size)))
        return pa.concat_tables(outs)


def _prep_task(source, doc_bucket_size: int, merge_groups_per_part: int) -> dict:
    """Ray-task body: extents scan + planning (off the driver, overlapped
    with the fused tokenize pass).

    The scan fans out one task per input FILE (max of per-file maxes is the
    max — conversations straddling file boundaries combine correctly), so
    the tokenize pass's first batch blocks on ~extents(one file), not
    extents(corpus): the prep used to be a 1-2 s serial prefix on the whole
    build at every parallelism level."""
    import ray

    files: list[str] = []
    if isinstance(source, str) and os.path.isdir(source):
        files = sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.endswith(".parquet")
        )
    elif isinstance(source, list):
        files = [s for s in source if isinstance(s, str) and os.path.isfile(s)]
    if len(files) > 1:
        fx = ray.remote(num_cpus=1)(_file_extents)
        parts = pa.concat_tables(ray.get([fx.remote(f) for f in files]))
        g = parts.group_by("conv_id").aggregate([("max_turn", "max")])
        extents = (
            g.rename_columns(["conv_id", "max_turn"])
            .set_column(1, "max_turn", g.column("max_turn_max").cast(pa.int64()))
            .sort_by("conv_id")
        )
    else:
        extents = _conv_extents_driver(source)
    return _prep_from_extents(extents, doc_bucket_size, merge_groups_per_part)


def _source_rows(source) -> int | None:
    """Total input rows from parquet footers only (cheap); None if unknown."""
    if isinstance(source, pa.Table):
        return source.num_rows
    if isinstance(source, list):
        subs = [_source_rows(s) for s in source]
        return None if any(s is None for s in subs) else sum(subs)
    if isinstance(source, str):
        try:
            if os.path.isdir(source):
                return sum(
                    pq.ParquetFile(os.path.join(source, f)).metadata.num_rows
                    for f in os.listdir(source)
                    if f.endswith(".parquet")
                )
            return pq.ParquetFile(source).metadata.num_rows
        except Exception:
            return None
    return None


def _conv_extents_ds(ds):
    """(conv_id, max_turn) as a DATASET via per-batch partial max then a
    groupby — the input to the distributed prefix-sum; never collected."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("conv_id").aggregate([("turn_idx", "max")])
        return g.rename_columns(["conv_id", "max_turn"])

    partials = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    # num_partitions: bound the tiny-data shuffle (default 200 partitions of
    # near-empty blocks dominates wall time at test scale)
    return partials.groupby("conv_id", num_partitions=_num_cpus()).aggregate(
        Max("max_turn", alias_name="max_turn")
    )


def _write_convmap_shard(tbl: pa.Table, path: str) -> None:
    pq.write_table(tbl.select(["conv_id", "max_turn"]), path)


def _write_empty_index(
    index_dir: str, config: EngineConfig, timings: dict, t0: float,
    positions: bool = False,
) -> dict:
    """Empty-corpus short circuit (M9 contract: empty in -> empty out):
    write explicit empty artifacts so the query side loads cleanly."""
    from clip_as_service_ray.state.postings import BLOCK_SCHEMA

    if positions:
        from clip_as_service_ray.state.positions import POS_BLOCK_SCHEMA

        pos0 = os.path.join(index_dir, "positions", "part=0")
        os.makedirs(pos0, exist_ok=True)
        pq.write_table(
            POS_BLOCK_SCHEMA.empty_table(), os.path.join(pos0, "blocks.parquet")
        )
        mf.mark_stage_done(pos0, {"stage": "positions_part", "postings": 0})
        mf.mark_stage_done(
            os.path.join(index_dir, "positions"),
            {"stage": "positions", "postings": 0, "blocks": 0, "bytes": 0},
        )
    postings_dir = os.path.join(index_dir, POSTINGS)
    part0 = os.path.join(postings_dir, "part=0")
    os.makedirs(part0, exist_ok=True)
    pq.write_table(BLOCK_SCHEMA.empty_table(), os.path.join(part0, "blocks.parquet"))
    mf.mark_stage_done(part0, {"stage": "postings_part", "postings": 0})
    mf.mark_stage_done(postings_dir, {"stage": "postings", "postings": 0})
    dict_dir = os.path.join(index_dir, DICTIONARY)
    os.makedirs(dict_dir, exist_ok=True)
    pq.write_table(
        pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}),
        os.path.join(dict_dir, "dictionary.parquet"),
    )
    mf.mark_stage_done(dict_dir, {"stage": "dictionary"})
    stats_path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(stats_path):
        mf.write_json(
            stats_path,
            {"n_docs": 0, "sum_dl": 0, "avgdl": 0.0, "k1": config.k1,
             "b": config.b, "analyzer": config.analyzer},
        )
    convmap_path = os.path.join(index_dir, "convmap.parquet")
    if not os.path.exists(convmap_path):
        pq.write_table(
            pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "max_turn": pa.array([], pa.int64())}
            ),
            convmap_path,
        )
    payload = {
        "engine": "clip_as_service_ray",
        "n_docs": 0, "avgdl": 0.0, "n_terms": 0, "n_postings": 0,
        "index_bytes": mf.dir_bytes(postings_dir),
        "config": {"k1": config.k1, "b": config.b},
        "timings_s": timings,
        "total_seconds": time.time() - t0,
    }
    mf.write_json(os.path.join(index_dir, "manifest.json"), payload)
    return payload


def _partials_fused(partials_dir: str) -> bool:
    """True when the partials on disk carry the positions lane (written by
    TokenizeEmitFused): any one file's schema decides (batch-uniform)."""
    for p in range(64):
        d = os.path.join(partials_dir, f"part={p}")
        if not os.path.isdir(d):
            continue
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    names = pq.ParquetFile(os.path.join(root, f)).schema_arrow.names
                    return "poss" in names
    return False


def build_index(
    source,
    index_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    overwrite: bool = False,
    positions: bool = False,
) -> dict:
    """Build (or resume) the inverted index at ``index_dir``. Returns the
    final manifest dict. Ray must already be initialised by the caller.

    ``positions=True`` also builds the positional artifact from the SAME
    single tokenize pass (TokenizeEmitFused): the fused partials carry the
    occurrence-position lane alongside the postings lane, and the positions
    merge reads the same files — one corpus read, one tokenize, two artifact
    sinks (round-2 VERDICT: the standalone ``build_positions`` re-tokenized
    the whole corpus in a second pass costing more than the main build)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from clip_as_service_ray.functions.analyzers import check_analyzer

    check_analyzer(config.analyzer)  # fail fast, not inside a worker
    t0 = time.time()
    os.makedirs(index_dir, exist_ok=True)
    _assert_shared_storage(index_dir)
    final_path = os.path.join(index_dir, "manifest.json")
    if overwrite:
        for sub in (STAGING, PARTIALS, POSTINGS, DICTIONARY, "positions", "pos_partials"):
            mf.reset_stage(os.path.join(index_dir, sub))
        for f in ("manifest.json", "stats.json", "convmap.parquet"):
            p = os.path.join(index_dir, f)
            if os.path.exists(p):
                os.remove(p)
    elif config.resume and os.path.exists(final_path):
        payload = mf.read_json(final_path)  # skip-if-valid
        if positions and not mf.stage_done(os.path.join(index_dir, "positions")):
            # index complete but positions missing: merge them from the fused
            # partials when available (no re-tokenize), else fall back to the
            # standalone second-pass build
            from clip_as_service_ray.pipelines.phrase import (
                build_positions,
                merge_positions_grid,
            )

            partials_dir = os.path.join(index_dir, PARTIALS)
            if mf.stage_done(partials_dir) and _partials_fused(partials_dir):
                merge_positions_grid(
                    partials_dir, index_dir, config, cnt_cols=("tf_w", "tfs")
                )
            else:
                build_positions(source, index_dir, config)
        return payload

    timings: dict[str, float] = {}
    ds = _as_dataset(source, roles=config.index_roles)

    # ---- stage 1: conv extents -> planning state (ConvBase + grid) ----
    # For fresh path-like small inputs the extents scan runs as ONE Ray task
    # OVERLAPPED with the fused pass below: tokenize workers block on the
    # prep ref only when their first batch arrives, by which time the
    # column-pruned 2-column scan has typically finished — the driver never
    # reads the corpus.
    t = time.time()
    convmap_path = os.path.join(index_dir, "convmap.parquet")
    small_input = _source_bytes(source) < DRIVER_AGG_MAX_BYTES
    if _source_rows(source) == 0:
        # zero input rows (no conversations at all): M9 empty-in/empty-out
        return _write_empty_index(index_dir, config, timings, t0, positions=positions)
    prep = None
    if config.resume and os.path.exists(convmap_path):
        prep = _prep_from_extents(
            pq.read_table(convmap_path),
            config.doc_bucket_size, config.merge_groups_per_part,
        )
        prep_ref = ray.put(prep)
    elif small_input and isinstance(source, (str, list)):
        prep_task = ray.remote(num_cpus=1)(_prep_task)
        prep_ref = prep_task.remote(
            source, config.doc_bucket_size, config.merge_groups_per_part
        )
    elif isinstance(source, pa.Table):
        prep = _prep_from_extents(
            _conv_extents_driver(source),
            config.doc_bucket_size, config.merge_groups_per_part,
        )
        prep_ref = ray.put(prep)
    else:
        # large / Dataset inputs: DISTRIBUTED two-pass block prefix-sum —
        # no conversation id ever funnels through the driver (the driver
        # sees one summary row per BLOCK); tokenize workers fetch only the
        # conv-base shards their batches touch
        scb, n_slots = build_sharded_conv_base(_conv_extents_ds(ds))
        if scb is None:
            return _write_empty_index(index_dir, config, timings, t0, positions=positions)
        n_buckets = max(1, -(-n_slots // config.doc_bucket_size))
        grp_width = max(1, -(-n_buckets // config.merge_groups_per_part))
        prep = {
            "conv_base": scb,
            "grp_width": grp_width,
            "n_slots": n_slots,
            "extents": None,
        }
        prep_ref = ray.put(prep)
    timings["conv_extents_s"] = time.time() - t

    # ---- stage 2 (FUSED): tokenize -> partial postings, ONE streaming pass
    # No staging checkpoint and no separate stats pass: the tokenize UDF and
    # the SPIMI partials emit run fused in a single map chain (Ray Data fuses
    # consecutive map_batches into one task), and corpus stats (n_docs,
    # sum_dl) ride along as one tiny row per batch under the part=STATS_PART
    # pseudo-partition. This removes the staging write->read barrier and the
    # second stats pass over the corpus — the round-1 serial component. The
    # grid's doc-range group width comes from the prep ref (doc-id SPAN — a
    # tight upper bound on n_docs, reproducible across resumes).
    t = time.time()
    partials_dir = os.path.join(index_dir, PARTIALS)
    if not (config.resume and mf.stage_done(partials_dir)):
        mf.reset_stage(partials_dir)
        if positions:
            # fused dual-sink pass: the partials carry the positions lane
            # too (tfs double as occurrence counts; poss is the only extra
            # shuffle payload) — stats ride along identically
            from clip_as_service_ray.stages.positions import TokenizeEmitFused

            emit = TokenizeEmitFused(
                prep_ref,
                config.num_index_partitions,
                config.doc_bucket_size,
                bucket_grp_width=prep_ref,
                lowercase=config.lowercase,
                analyzer=config.analyzer,
            )
        else:
            emit = TokenizeEmitPartials(
                config.num_index_partitions,
                config.doc_bucket_size,
                prep_ref,
                lowercase=config.lowercase,
                analyzer=config.analyzer,
            )
        work_items = _rg_work_items(source)
        if len(work_items) > 1:
            # read-in-task: text bytes never enter the object store (see
            # _ReadThenEmit); one task per parquet row group
            emitted = ray.data.from_items(
                work_items, override_num_blocks=len(work_items)
            ).map_batches(
                _ReadThenEmit(emit, config.index_roles, config.tokenize_batch_size),
                batch_format="pyarrow",
            )
        else:
            emitted = ds.map_batches(
                emit,
                batch_format="pyarrow",
                batch_size=config.tokenize_batch_size,
            )
        emitted.write_parquet(partials_dir, partition_cols=["part", "bgrp"])
        mf.mark_stage_done(
            partials_dir,
            {"stage": "partials", "bytes": mf.dir_bytes(partials_dir), "seconds": time.time() - t},
        )
    timings["tokenize_s"] = time.time() - t

    # collect the (long-finished) prep state; persist convmap for the query
    # side if this is a fresh build
    t = time.time()
    if prep is None:
        prep = ray.get(prep_ref)
    if not os.path.exists(convmap_path):
        if prep.get("extents") is not None:
            tmp = convmap_path + f".tmp.{os.getpid()}"
            pq.write_table(prep["extents"], tmp)
            os.replace(tmp, convmap_path)
        else:
            # sharded conv base: one parquet part per shard, written by the
            # shard owners (convmap.parquet becomes a directory)
            scb = prep["conv_base"]
            tmp = convmap_path + f".tmp.{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)
            writer = ray.remote(num_cpus=1)(_write_convmap_shard)
            ray.get(
                [
                    writer.remote(ref, os.path.join(tmp, f"part-{i:05d}.parquet"))
                    for i, ref in enumerate(scb.shard_refs)
                ]
            )
            os.replace(tmp, convmap_path)
    timings["convmap_write_s"] = time.time() - t

    # ---- stage 3: corpus stats (N, avgdl) from the stats pseudo-partition
    t = time.time()
    stats_path = os.path.join(index_dir, "stats.json")
    if config.resume and os.path.exists(stats_path):
        stats = mf.read_json(stats_path)
    else:
        n_docs, sum_dl = 0, 0
        stats_dir = os.path.join(partials_dir, f"part={STATS_PART}")
        if os.path.isdir(stats_dir):
            st = pq.read_table(stats_dir, columns=["n", "bucket"])
            if st.num_rows:
                n_docs = int(np.sum(st.column("n").to_numpy()))
                sum_dl = int(np.sum(st.column("bucket").to_numpy()))
        stats = {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
            "k1": config.k1,
            "b": config.b,
            "block_size": config.postings_block_size,
            "doc_bucket_size": config.doc_bucket_size,
            "num_index_partitions": config.num_index_partitions,
            "analyzer": config.analyzer,
        }
        mf.write_json(stats_path, stats)
    timings["stats_s"] = time.time() - t

    if stats["n_docs"] == 0:
        # rows existed but zero indexable turns (all empty/whitespace)
        return _write_empty_index(index_dir, config, timings, t0, positions=positions)

    # ---- stage 4b: per-partition merge (one Ray task per partition, skew
    # partitions split by doc-bucket range; each partition independently
    # resumable with lineage counters) ----
    t = time.time()
    postings_dir = os.path.join(index_dir, POSTINGS)
    os.makedirs(postings_dir, exist_ok=True)
    merge_remote = ray.remote(num_cpus=1)(merge_partition)
    merge_kwargs = dict(
        avgdl=stats["avgdl"],
        block_size=config.postings_block_size,
        doc_bucket_size=config.doc_bucket_size,
        k1=config.k1,
        b=config.b,
    )
    futs = []
    part_futs_map: dict[str, list] = {}
    df_tables: list[pa.Table] = []  # per-cell df contributions (stage 5)
    merge_all_fresh = True  # df_tables cover every cell only on a full run
    for p in range(config.num_index_partitions):
        part_in = os.path.join(partials_dir, f"part={p}")
        part_out = os.path.join(postings_dir, f"part={p}")
        if config.resume and mf.stage_done(part_out):
            merge_all_fresh = False
            continue  # per-partition skip-if-valid
        if os.path.exists(part_out):
            mf.reset_stage(part_out)
        grp_dirs = (
            sorted(
                os.path.join(part_in, d)
                for d in os.listdir(part_in)
                if d.startswith("bgrp=")
            )
            if os.path.isdir(part_in)
            else []
        )
        pf = []
        if not grp_dirs:
            pf.append(merge_remote.remote([], part_out, **merge_kwargs))
        for gd in grp_dirs:
            files = sorted(
                os.path.join(gd, f) for f in os.listdir(gd) if f.endswith(".parquet")
            )
            grp_tag = os.path.basename(gd).split("=")[1]
            pf.append(
                merge_remote.remote(
                    files, part_out, out_suffix=f"_g{grp_tag}", **merge_kwargs
                )
            )
        futs.extend(pf)
        part_futs_map[part_out] = pf
    if futs:
        ray.get(futs)
    for part_out, pf in part_futs_map.items():
        results = ray.get(pf)
        counters = [r[0] for r in results]
        df_tables.extend(r[1] for r in results)
        mf.mark_stage_done(
            part_out,
            {
                "stage": "postings_part",
                "cells": len(counters),
                "term_runs": sum(c["term_runs"] for c in counters),
                "postings": sum(c["postings"] for c in counters),
                "blocks": sum(c["blocks"] for c in counters),
                "bytes": sum(c["bytes"] for c in counters),
                "seconds": max(c["seconds"] for c in counters),
            },
        )
    mf.mark_stage_done(
        postings_dir,
        {"stage": "postings", "bytes": mf.dir_bytes(postings_dir), "seconds": time.time() - t},
    )
    timings["merge_s"] = time.time() - t

    # ---- stage 5: term dictionary (term -> df) from block metadata ----
    t = time.time()
    dict_dir = os.path.join(index_dir, DICTIONARY)
    if not (config.resume and mf.stage_done(dict_dir)):
        mf.reset_stage(dict_dir)
        if merge_all_fresh and small_input:
            # df straight from the merge tasks' returned per-cell tables —
            # no re-read of the postings files (cells are doc-disjoint, so
            # per-term df sums across cells)
            cat = pa.concat_tables(df_tables) if df_tables else pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
            g = cat.group_by("term").aggregate([("df", "sum")])
            g = g.rename_columns(["term", "df"]).sort_by("term")
            pq.write_table(
                g.set_column(1, "df", g.column("df").cast(pa.int64())),
                os.path.join(dict_dir, "dictionary.parquet"),
            )
        elif small_input:
            meta = pq.read_table(postings_dir, columns=["term", "n"])
            terms = np.asarray(meta.column("term").to_pylist(), dtype=object)
            ns = meta.column("n").to_numpy().astype(np.int64)
            order = np.argsort(terms, kind="stable")
            t_s, n_s = terms[order], ns[order]
            starts = np.concatenate(
                [[0], np.nonzero(t_s[1:] != t_s[:-1])[0] + 1]
            ) if len(t_s) else np.array([], dtype=np.int64)
            df_pa = pa.table(
                {
                    "term": pa.array(t_s[starts] if len(t_s) else [], pa.string()),
                    "df": pa.array(
                        np.add.reduceat(n_s, starts) if len(t_s) else [], pa.int64()
                    ),
                }
            )
            pq.write_table(df_pa, os.path.join(dict_dir, "dictionary.parquet"))
        else:
            blocks_meta = ray.data.read_parquet(postings_dir, columns=["term", "n"])
            df_tbl = blocks_meta.groupby("term", num_partitions=_num_cpus()).aggregate(
                Sum("n", alias_name="df")
            )
            df_tbl.write_parquet(dict_dir)
        mf.mark_stage_done(
            dict_dir,
            {"stage": "dictionary", "bytes": mf.dir_bytes(dict_dir), "seconds": time.time() - t},
        )
    timings["dictionary_s"] = time.time() - t

    # ---- stage 6 (positions=True): positional merge over the SAME fused
    # partials — no second corpus read/tokenize; per-partition resumable ----
    if positions:
        t = time.time()
        positions_dir = os.path.join(index_dir, "positions")
        if not (config.resume and mf.stage_done(positions_dir)):
            from clip_as_service_ray.pipelines.phrase import merge_positions_grid

            merge_positions_grid(
                partials_dir, index_dir, config, cnt_cols=("tf_w", "tfs")
            )
        timings["positions_merge_s"] = time.time() - t

    # ---- final manifest with lineage counters ----
    dict_tbl = pq.read_table(dict_dir, columns=["df"])
    n_terms = dict_tbl.num_rows
    n_postings = int(np.sum(dict_tbl.column("df").to_numpy())) if n_terms else 0
    payload = {
        "engine": "clip_as_service_ray",
        "n_docs": stats["n_docs"],
        "avgdl": stats["avgdl"],
        "n_terms": n_terms,
        "n_postings": n_postings,
        "index_bytes": mf.dir_bytes(os.path.join(index_dir, POSTINGS)),
        "partials_bytes": mf.dir_bytes(os.path.join(index_dir, PARTIALS)),
        "config": {
            "k1": config.k1,
            "b": config.b,
            "num_index_partitions": config.num_index_partitions,
            "postings_block_size": config.postings_block_size,
            "doc_bucket_size": config.doc_bucket_size,
        },
        "positions": bool(positions),
        "timings_s": timings,
        "total_seconds": time.time() - t0,
    }
    mf.write_json(final_path, payload)
    return payload

"""Windowed aggregation stages beyond plain tumbling windows.

Tumbling windows are a groupby on a derived key (``events_hourly_windows``);
SESSION windows are gap-based and need per-key ORDER — the streaming-shaped
operator a batch engine expresses as: salted-bucket shuffle on the key, then
ONE vectorized lexsort + gap-scan per bucket (many keys per UDF call, no
per-key Python). Same shape as ``dedup_turns``/``asof_join_by_user``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scaled_buckets(num_buckets: int | None) -> tuple[int, int]:
    """(num_buckets, num_partitions) sized to the CLUSTER, not a constant:
    at a fixed 32 buckets, 100x the data makes each bucket 1/32 of the
    corpus materialized inside a single map_groups call. 4 buckets per CPU
    keeps per-group working sets bounded as nodes are added; partitions
    track CPUs so the shuffle fans out with the cluster. Bucket count never
    changes RESULTS (key % buckets only co-locates keys; each kernel sorts
    within its group) — test-pinned at two bucket counts. A single hot KEY
    still serializes into one group by construction (per-key order is the
    semantics); keys hotter than a worker's memory need the windowed
    pre-aggregation path, not more buckets."""
    if num_buckets is None:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        num_buckets = max(32, 4 * cpus)
    return num_buckets, max(8, num_buckets // 4)


def sessionize(
    ds,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
    num_buckets: int | None = None,
):
    """Gap-based sessions per key: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_s`` seconds. Returns one
    row per session: (key, session_start:timestamp[us], n_events:int64,
    duration_s:float64)."""
    gap_us = int(gap_s * 1_000_000)
    num_buckets, num_partitions = _scaled_buckets(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy().astype(np.int64)
        return pa.table(
            {
                "_bucket": pa.array(k % num_buckets, pa.int64()),
                key: pa.array(k, pa.int64()),
                "_ts": batch.column(ts).cast(pa.int64()),
            }
        )

    def sessions(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy()
        t = group.column("_ts").to_numpy()
        if len(k) == 0:
            return pa.table(
                {key: pa.array([], pa.int64()),
                 "session_start": pa.array([], pa.timestamp("us")),
                 "n_events": pa.array([], pa.int64()),
                 "duration_s": pa.array([], pa.float64())}
            )
        order = np.lexsort((t, k))
        ks, tss = k[order], t[order]
        new_sess = np.concatenate(
            [[True], (ks[1:] != ks[:-1]) | (np.diff(tss) > gap_us)]
        )
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate([starts[1:], [len(ks)]])
        return pa.table(
            {
                key: pa.array(ks[starts], pa.int64()),
                "session_start": pa.array(tss[starts], pa.timestamp("us")),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "duration_s": pa.array(
                    np.round((tss[ends - 1] - tss[starts]) / 1e6, 6), pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(sessions, batch_format="pyarrow")
    )


def rolling_sum_by_key(
    ds,
    *,
    key: str,
    ts: str,
    value: str,
    id_col: str,
    window_s: float,
    num_buckets: int | None = None,
):
    """Trailing RANGE-window aggregate: for each row, sum(value) over rows
    of the same key with ts in [row.ts - window, row.ts] — including
    timestamp peers, matching SQL ``RANGE BETWEEN INTERVAL .. PRECEDING AND
    CURRENT ROW``. Salted-bucket shuffle + one lexsort per bucket; per key
    segment the whole window column resolves with a cumsum + two
    vectorized searchsorted (no per-row work, no per-key re-sort).
    Output: (id_col, roll_sum:float64)."""
    w_us = np.int64(round(window_s * 1e6))
    num_buckets, num_partitions = _scaled_buckets(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy().astype(np.int64)
        return pa.table(
            {
                "_bucket": pa.array(k % num_buckets, pa.int64()),
                "_key": pa.array(k, pa.int64()),
                "_ts": batch.column(ts).cast(pa.int64()),
                "_val": batch.column(value).cast(pa.float64()),
                "_id": batch.column(id_col).cast(pa.int64()),
            }
        )

    def roll(group: pa.Table) -> pa.Table:
        keys = group.column("_key").to_numpy()
        tss = group.column("_ts").to_numpy()
        vals = group.column("_val").to_numpy()
        ids = group.column("_id").to_numpy()
        order = np.lexsort((tss, keys))
        k_s, t_s, v_s, i_s = keys[order], tss[order], vals[order], ids[order]
        out = np.empty(len(k_s), dtype=np.float64)
        bounds = np.concatenate([[0], np.nonzero(np.diff(k_s))[0] + 1, [len(k_s)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            # PER-KEY cumsum (restarted at each segment): a group-wide cumsum
            # would leak float rounding from whichever OTHER keys share the
            # bucket, making results depend on the bucket count
            seg_t = t_s[s:e]
            seg_c = np.concatenate([[0.0], np.cumsum(v_s[s:e])])
            lo = np.searchsorted(seg_t, seg_t - w_us, side="left")
            hi = np.searchsorted(seg_t, seg_t, side="right")
            out[s:e] = seg_c[hi] - seg_c[lo]
        return pa.table(
            {
                "_id": pa.array(i_s, pa.int64()),
                "roll_sum": pa.array(out, pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(roll, batch_format="pyarrow")
    )

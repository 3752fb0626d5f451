"""Join operators the Dataset API lacks, expressed Ray-Data-first.

The reference's only joins are id-keyed result gathers (J1-J3 in SURVEY §2.5);
a general data engine needs the real thing. Three shapes, each picked by the
side sizes — the partitioning assumptions are the contract:

- ``broadcast_hash_join``: small side (fits the object store comfortably)
  is ``ray.put`` ONCE as sorted key/value arrays; the big side streams
  through ``map_batches`` with a vectorized ``np.searchsorted`` probe. No
  shuffle at all — the canonical small-side join from the Ray guide.
- ``shuffle_hash_join``: big-big equi-join as a tagged UNION + one
  ``groupby(key)`` — both sides co-partition on the join key, the group UDF
  emits the vectorized cross product per key. Assumes per-key match groups
  are small relative to a worker (true for key-unique or low-fanout joins;
  pre-aggregate a side first when it is not — see order_priority_revenue).
- ``asof_join_by_user``: per-key ordered as-of join (for each left event,
  the latest right event with ts <= left.ts) via the salted-bucket pattern:
  hash-bucket by key so the group UDF sees MANY keys at once and resolves
  each with one sort + per-key ``np.searchsorted`` — the streaming-window
  family's point-in-time join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.partitions import parts_for_dataset


# Per-worker-process cache of fetched broadcast sides. ray.get on a plasma
# object is zero-copy shared memory, but deserializing the (keys, payload)
# tuple per batch still costs; one fetch per worker is the right amount.
# Bounded so long-lived workers serving many distinct joins don't grow it.
_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_MAX = 8


def broadcast_hash_join(ds, small_table: pa.Table, *, left_key: str, right_key: str):
    """Inner equi-join: stream ``ds`` against a broadcast ``small_table``.
    Right keys must be unique (dimension-table contract; asserted).

    Task-based on purpose: an actor-pool probe pins CPUs for the lifetime
    of the stage, and a plan composing several broadcast joins (e.g. TPC-H
    Q5's supplier+customer dims) would pin pool×2 CPUs and starve the read
    tasks on small clusters — a deadlock we hit at num_cpus=4. Plain tasks
    fetch the broadcast once per worker process (module cache below) and
    release their CPU between batches."""
    import ray

    st = small_table.sort_by(right_key)
    keys = st.column(right_key).to_numpy()
    if len(keys) and np.any(keys[1:] == keys[:-1]):
        raise ValueError(f"broadcast side has duplicate keys in {right_key!r}")
    payload_cols = [c for c in st.column_names if c != right_key]
    ref = ray.put((keys, {c: st.column(c) for c in payload_cols}))

    def probe_fn(batch: pa.Table) -> pa.Table:
        cache_key = ref.hex()
        state = _BROADCAST_CACHE.get(cache_key)
        if state is None:
            if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
                _BROADCAST_CACHE.clear()
            state = _BROADCAST_CACHE[cache_key] = ray.get(ref)
        skeys, payload = state
        if len(skeys) == 0:  # empty dimension side: inner join is empty
            sub = batch.slice(0, 0)
            for c, arr in payload.items():
                sub = sub.append_column(c, arr.slice(0, 0))
            return sub
        probe = batch.column(left_key).to_numpy()
        pos = np.searchsorted(skeys, probe)
        ok = (pos < len(skeys)) & (skeys[np.minimum(pos, len(skeys) - 1)] == probe)
        sub = batch.filter(pa.array(ok))
        take = pa.array(pos[ok], pa.int64())
        for c, arr in payload.items():
            sub = sub.append_column(c, arr.take(take))
        return sub

    return ds.map_batches(probe_fn, batch_format="pyarrow")


def shuffle_hash_join(
    left_ds,
    right_ds,
    *,
    on: str,
    num_partitions: int | None = None,
    how: str = "inner",
):
    """Big-big equi-join (``how``: inner | left | right | full): tag sides,
    union, one groupby(on) shuffle, vectorized per-key cross product in the
    group UDF; outer variants keep unmatched rows of the named side(s) with
    nulls in the other side's columns. Column name collisions (other than
    the key) must be resolved by the caller."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"how must be 'inner', 'left', 'right' or 'full', got {how!r}"
        )
    if num_partitions is None:
        num_partitions = parts_for_dataset(left_ds)
    l_cols = r_cols = None

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_side", pa.array(np.full(batch.num_rows, side, np.int8), pa.int8())
            )

        return fn

    # align schemas: each side carries the other's columns as nulls
    l_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    overlap = (set(l_schema) & set(r_schema)) - {on}
    if overlap:
        raise ValueError(f"column collision outside the join key: {sorted(overlap)}")

    l_only = [c for c in l_schema if c != on]
    r_only = [c for c in r_schema if c != on]
    canon = [on] + l_only + r_only + ["_side"]

    def pad(missing: dict):
        def fn(batch: pa.Table) -> pa.Table:
            for c, t in missing.items():
                batch = batch.append_column(c, pa.nulls(batch.num_rows, t))
            return batch.select(canon)  # canonical column order for union

        return fn

    l = left_ds.map_batches(tag(0), batch_format="pyarrow").map_batches(
        pad({c: t for c, t in r_schema.items() if c not in l_schema}),
        batch_format="pyarrow",
    )
    r = right_ds.map_batches(tag(1), batch_format="pyarrow").map_batches(
        pad({c: t for c, t in l_schema.items() if c not in r_schema}),
        batch_format="pyarrow",
    )

    def join_group(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy()
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        if len(li) and len(ri) == 0:
            if how in ("left", "full"):
                # unmatched lefts survive with nulls in the right columns
                return group.take(pa.array(li, pa.int64())).drop_columns(["_side"])
            return group.drop_columns(["_side"]).slice(0, 0)
        if len(ri) and len(li) == 0:
            if how in ("right", "full"):
                # unmatched rights survive with nulls in the left columns
                return group.take(pa.array(ri, pa.int64())).drop_columns(["_side"])
            return group.drop_columns(["_side"]).slice(0, 0)
        if len(li) == 0 and len(ri) == 0:
            return group.drop_columns(["_side"]).slice(0, 0)
        # vectorized cross product of the (small) per-key match groups
        lrep = np.repeat(li, len(ri))
        rtil = np.tile(ri, len(li))
        out = group.select([on] + l_only).take(pa.array(lrep, pa.int64()))
        rpart = group.select(r_only).take(pa.array(rtil, pa.int64()))
        for c in r_only:
            out = out.append_column(c, rpart.column(c))
        return out

    return (
        l.union(r)
        .groupby(on, num_partitions=num_partitions)
        .map_groups(join_group, batch_format="pyarrow")
    )


def asof_join_by_user(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    left_id: str,
    right_id: str,
    num_buckets: int = 32,
):
    """Inner as-of join: for each left row, the LATEST right row of the same
    ``key`` with ``right.ts <= left.ts``. Output: (left_id, right_id_matched,
    wait_s). Salted-bucket shuffle: the group UDF handles a whole hash
    bucket of keys with one lexsort + per-key searchsorted."""

    def tag_and_bucket(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy().astype(np.int64)
            out = pa.table(
                {
                    "_bucket": pa.array(k % num_buckets, pa.int64()),
                    key: pa.array(k, pa.int64()),
                    "_ts": batch.column(ts).cast(pa.int64()),
                    "_id": batch.column(left_id if side == 0 else right_id).cast(pa.int64()),
                    "_side": pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()),
                }
            )
            return out

        return fn

    def asof_group(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy()
        keys = group.column(key).to_numpy()
        tss = group.column("_ts").to_numpy()
        ids = group.column("_id").to_numpy()
        li = side == 0
        ri = side == 1
        empty = pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "wait_s": pa.array([], pa.float64()),
            }
        )
        if not li.any() or not ri.any():
            return empty
        # both sides sorted by (key, ts); per UNIQUE key one vectorized
        # searchsorted resolves every left probe of that key at once
        lo = np.lexsort((tss[li], keys[li]))
        lk, lt, lid = keys[li][lo], tss[li][lo], ids[li][lo]
        ro = np.lexsort((tss[ri], keys[ri]))
        rk, rt, rid = keys[ri][ro], tss[ri][ro], ids[ri][ro]
        out_l, out_r, out_w = [], [], []
        l_bounds = np.concatenate(
            [[0], np.nonzero(np.diff(lk))[0] + 1, [len(lk)]]
        )
        for s, e in zip(l_bounds[:-1], l_bounds[1:]):
            k = lk[s]
            rs = np.searchsorted(rk, k, side="left")
            re_ = np.searchsorted(rk, k, side="right")
            if re_ == rs:
                continue
            pos = np.searchsorted(rt[rs:re_], lt[s:e], side="right")
            ok = pos > 0
            idx = rs + pos[ok] - 1
            out_l.append(lid[s:e][ok])
            out_r.append(rid[idx])
            out_w.append((lt[s:e][ok] - rt[idx]) / 1e6)
        if not out_l:
            return empty
        return pa.table(
            {
                "left_id": pa.array(np.concatenate(out_l), pa.int64()),
                "right_id": pa.array(np.concatenate(out_r), pa.int64()),
                "wait_s": pa.array(
                    np.round(np.concatenate(out_w), 6), pa.float64()
                ),
            }
        )

    l = left_ds.map_batches(tag_and_bucket(0), batch_format="pyarrow")
    r = right_ds.map_batches(tag_and_bucket(1), batch_format="pyarrow")
    return (
        l.union(r)
        .groupby("_bucket", num_partitions=parts_for_dataset(left_ds))
        .map_groups(asof_group, batch_format="pyarrow")
    )


def range_join_count(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    left_id: str,
    window_s: float,
    num_partitions: int | None = None,
):
    """Interval/range join (count form): for each left row, the number of
    right rows with the SAME ``key`` and ``ts`` in [left.ts, left.ts + w).

    Non-equi joins have no shuffle key, so the distributed trick is
    window-aligned TIME BUCKETS of width w: a left probe window spans at
    most bucket(t) and bucket(t)+1, so RIGHT rows are replicated into their
    own bucket and the previous one (replication factor exactly 2,
    independent of data size or window count), lefts stay single-copy, and
    every (left, matching-right) pair is co-located in the left's bucket.
    The group UDF resolves a whole bucket with one lexsort + two
    ``np.searchsorted`` calls per unique key — no pair materialization.
    Lefts with zero matches are kept (count 0), matching LEFT JOIN..COUNT.
    """
    w_us = np.int64(round(window_s * 1e6))
    if num_partitions is None:
        num_partitions = parts_for_dataset(left_ds)

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy().astype(np.int64)
            t = batch.column(ts).cast(pa.int64()).to_numpy()
            ids = (
                batch.column(left_id).to_numpy().astype(np.int64)
                if side == 0
                else np.zeros(len(k), np.int64)
            )
            b = t // w_us
            if side == 0:
                bucket, kk, tt, ii = b, k, t, ids
            else:
                # replicate each right row into bucket(t) and bucket(t)-1
                bucket = np.concatenate([b, b - 1])
                kk = np.concatenate([k, k])
                tt = np.concatenate([t, t])
                ii = np.concatenate([ids, ids])
            return pa.table(
                {
                    "_bucket": pa.array(bucket, pa.int64()),
                    "_key": pa.array(kk, pa.int64()),
                    "_ts": pa.array(tt, pa.int64()),
                    "_id": pa.array(ii, pa.int64()),
                    "_side": pa.array(
                        np.full(len(kk), side, np.int8), pa.int8()
                    ),
                }
            )

        return fn

    def count_group(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy()
        keys = group.column("_key").to_numpy()
        tss = group.column("_ts").to_numpy()
        ids = group.column("_id").to_numpy()
        li, ri = side == 0, side == 1
        empty = pa.table(
            {"left_id": pa.array([], pa.int64()), "n_matches": pa.array([], pa.int64())}
        )
        if not li.any():
            return empty
        lk, lt, lid = keys[li], tss[li], ids[li]
        if not ri.any():
            return pa.table(
                {"left_id": pa.array(lid, pa.int64()),
                 "n_matches": pa.array(np.zeros(len(lid), np.int64), pa.int64())}
            )
        ro = np.lexsort((tss[ri], keys[ri]))
        rk, rt = keys[ri][ro], tss[ri][ro]
        # per-left key segment bounds in the sorted right arrays
        seg_lo = np.searchsorted(rk, lk, side="left")
        seg_hi = np.searchsorted(rk, lk, side="right")
        # counts via positional searchsorted inside each segment: do it
        # globally with offset trick — rt is only key-sorted globally, so
        # probe within [seg_lo, seg_hi) slices per unique left key
        counts = np.zeros(len(lk), dtype=np.int64)
        order = np.argsort(lk, kind="stable")
        bounds = np.concatenate(
            [[0], np.nonzero(np.diff(lk[order]))[0] + 1, [len(lk)]]
        )
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            lo_, hi_ = seg_lo[sel[0]], seg_hi[sel[0]]
            if hi_ == lo_:
                continue
            seg = rt[lo_:hi_]
            counts[sel] = np.searchsorted(
                seg, lt[sel] + w_us, side="left"
            ) - np.searchsorted(seg, lt[sel], side="left")
        return pa.table(
            {"left_id": pa.array(lid, pa.int64()),
             "n_matches": pa.array(counts, pa.int64())}
        )

    l = left_ds.map_batches(prep(0), batch_format="pyarrow")
    r = right_ds.map_batches(prep(1), batch_format="pyarrow")
    return (
        l.union(r)
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(count_group, batch_format="pyarrow")
    )


def shuffle_anti_join(left_ds, right_ds, *, on: str, num_partitions: int | None = None):
    """ANTI join (NOT EXISTS): left rows whose ``on`` key never appears in
    ``right_ds``. Right side collapses to unique keys per batch FIRST
    (combiner), so only distinct keys shuffle; the group UDF drops the
    whole group when any right row is present. Semi join = same shape with
    the predicate flipped (``keep_matches=True``)."""
    return _shuffle_existence_join(
        left_ds, right_ds, on=on, num_partitions=num_partitions, keep_matches=False
    )


def shuffle_semi_join(left_ds, right_ds, *, on: str, num_partitions: int | None = None):
    """SEMI join (EXISTS): left rows whose key appears in right_ds; left
    rows come through at most once regardless of right-side fanout."""
    return _shuffle_existence_join(
        left_ds, right_ds, on=on, num_partitions=num_partitions, keep_matches=True
    )


def _shuffle_existence_join(left_ds, right_ds, *, on, num_partitions, keep_matches):
    if num_partitions is None:
        num_partitions = parts_for_dataset(left_ds)
    l_names = list(left_ds.schema().names)
    l_types = dict(zip(left_ds.schema().names, left_ds.schema().types))
    payload = [c for c in l_names if c != on]
    canon = [on] + payload + ["_side"]

    def l_tag(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_side", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        )
        return batch.select(canon)

    def r_tag(batch: pa.Table) -> pa.Table:
        # combiner: unique keys only — the right payload never shuffles
        keys = pa.table({on: batch.column(on)}).group_by(on).aggregate([])
        out = pa.table({on: keys.column(on)})
        for c in payload:
            out = out.append_column(c, pa.nulls(out.num_rows, l_types[c]))
        return out.append_column(
            "_side", pa.array(np.ones(out.num_rows, np.int8), pa.int8())
        )

    def fin(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy()
        has_right = bool((side == 1).any())
        keep = has_right if keep_matches else not has_right
        lmask = side == 0
        if not keep or not lmask.any():
            return group.drop_columns(["_side"]).slice(0, 0)
        return group.filter(pa.array(lmask)).drop_columns(["_side"])

    l = left_ds.map_batches(l_tag, batch_format="pyarrow")
    r = right_ds.map_batches(r_tag, batch_format="pyarrow")
    return (
        l.union(r)
        .groupby(on, num_partitions=num_partitions)
        .map_groups(fin, batch_format="pyarrow")
    )

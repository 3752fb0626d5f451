"""Distributed rank windows: percent_rank() OVER (PARTITION BY k ORDER BY v)
without per-group materialization.

The per-group ``map_groups`` form (round 2's ``order_price_percentile``)
holds one whole partition-key group in one UDF call — fine while every
group fits a worker, wrong when one key owns billions of rows. The
distributed form here is the sort + block-offset prefix-sum pattern
(same shape as ``ShardedConvBase`` in stages/tokenize.py):

1. global ``ds.sort([key, value])`` — Ray Data's range shuffle; the only
   all-to-all exchange in the operator;
2. one TINY metadata task per sorted block: row count plus the boundary
   runs (how many leading rows share the first key / first (key, value)
   pair, same for the trailing rows). O(1) numbers per block, never rows;
3. a driver prefix scan over those summaries — forward for "rows of my
   first key in earlier blocks" and its tie count, backward for "rows of
   my last key in later blocks" — O(#blocks), no row data;
4. one rank task per block: vectorized run-length rank within the block,
   corrected at the two boundary keys by the scanned offsets. Emits
   (id, pr) and the blocks go straight back into a Dataset via
   ``from_arrow_refs`` — row data never touches the driver.

Raw Ray tasks are used (not ``map_batches``) because the correction per
block depends on the block's POSITION in the sorted order, which the
Dataset API does not expose to a batch UDF. Blocks stay in the object
store end-to-end; peak driver state is the summary list.

SQL semantics: rank() ties share the min rank; percent_rank =
(rank - 1) / (n_partition - 1), 0 for singleton partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class BlockSummary:
    n: int
    first_key: object = None
    first_val: float = 0.0
    last_key: object = None
    last_val: float = 0.0
    head_k: int = 0  # leading rows with key == first_key
    head_kv: int = 0  # leading rows with (key, value) == (first_key, first_val)
    tail_k: int = 0  # trailing rows with key == last_key
    tail_kv: int = 0  # trailing rows with (key, value) == (last_key, last_val)


def _col_np(tbl: pa.Table, name: str) -> np.ndarray:
    arr = tbl.column(name)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return np.asarray(arr.to_pylist(), dtype=object)
    return arr.to_numpy(zero_copy_only=False)


def summarize_block(tbl: pa.Table, key: str, value: str) -> BlockSummary:
    n = tbl.num_rows
    if n == 0:
        return BlockSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    same_k_head = k == k[0]
    head_k = int(np.argmin(same_k_head)) if not same_k_head.all() else n
    same_kv_head = same_k_head[:head_k] & (v[:head_k] == v[0])
    head_kv = int(np.argmin(same_kv_head)) if not same_kv_head.all() else head_k
    same_k_tail = k == k[-1]
    tail_k = int(np.argmin(same_k_tail[::-1])) if not same_k_tail.all() else n
    same_kv_tail = same_k_tail[n - tail_k:] & (v[n - tail_k:] == v[-1])
    rev = same_kv_tail[::-1]
    tail_kv = int(np.argmin(rev)) if not rev.all() else tail_k
    return BlockSummary(
        n=n,
        first_key=k[0], first_val=float(v[0]),
        last_key=k[-1], last_val=float(v[-1]),
        head_k=head_k, head_kv=head_kv, tail_k=tail_k, tail_kv=tail_kv,
    )


def scan_offsets(summaries: list[BlockSummary]):
    """Driver-side prefix scan over block summaries (sorted block order).

    Returns per block: (prev_rows, prev_ties, total_first_key,
    total_last_key) — rows of the block's first key in EARLIER blocks, rows
    of its exact first (key, value) pair in earlier blocks, and the GLOBAL
    totals of its first / last keys. Empty blocks pass chains through."""
    B = len(summaries)
    prev_rows = [0] * B
    prev_ties = [0] * B
    after_rows = [0] * B

    cur_key = None
    cur_rows = 0
    cur_val = None
    cur_pair = 0
    started = False
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if started and s.first_key == cur_key:
            prev_rows[i] = cur_rows
            prev_ties[i] = cur_pair if s.first_val == cur_val else 0
        if started and s.first_key == cur_key and s.head_k == s.n:
            cur_rows += s.n
            if s.first_val == cur_val and s.head_kv == s.n:
                cur_pair += s.n
            else:
                cur_val = s.last_val
                cur_pair = s.tail_kv
        else:
            cur_key = s.last_key
            cur_val = s.last_val
            cur_rows = s.tail_k
            cur_pair = s.tail_kv
            started = True

    cur_key = None
    cur_rows = 0
    started = False
    for i in range(B - 1, -1, -1):
        s = summaries[i]
        if s.n == 0:
            continue
        if started and s.last_key == cur_key:
            after_rows[i] = cur_rows
        if started and s.last_key == cur_key and s.tail_k == s.n:
            cur_rows += s.n
        else:
            cur_key = s.first_key
            cur_rows = s.head_k
            started = True

    total_fk = [0] * B
    total_lk = [0] * B
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        single_key = s.head_k == s.n
        total_fk[i] = prev_rows[i] + s.head_k + (after_rows[i] if single_key else 0)
        total_lk[i] = (prev_rows[i] if single_key else 0) + s.tail_k + after_rows[i]
    return prev_rows, prev_ties, total_fk, total_lk


def rank_block(
    tbl: pa.Table,
    key: str,
    value: str,
    id_col: str,
    prev_rows: int,
    prev_ties: int,
    total_fk: int,
    total_lk: int,
) -> pa.Table:
    """Vectorized within-block min-rank, corrected at the boundary keys.

    Rows are already globally sorted by (key, value); for a row with value
    v in the block's FIRST key, earlier blocks contribute ``prev_rows``
    rows all <= v, of which exactly ``prev_ties`` equal v when
    v == first_val (so they are subtracted from the strict-less count)."""
    n = tbl.num_rows
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "pr": pa.array([], pa.float64())}
    )
    if n == 0:
        return empty
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    idx = np.arange(n, dtype=np.int64)
    key_change = np.concatenate([[True], k[1:] != k[:-1]])
    pair_change = key_change | np.concatenate([[True], v[1:] != v[:-1]])[0:]
    key_start = np.maximum.accumulate(np.where(key_change, idx, 0))
    run_first = np.maximum.accumulate(np.where(pair_change, idx, 0))
    less = (run_first - key_start).astype(np.float64)

    bounds = np.concatenate([np.nonzero(key_change)[0], [n]])
    seg_counts = np.diff(bounds)
    n_key = np.repeat(seg_counts, seg_counts).astype(np.float64)

    seg0 = int(bounds[1])
    less[:seg0] += prev_rows
    if prev_ties:
        less[:seg0][v[:seg0] == v[0]] -= prev_ties
    n_key[:seg0] = total_fk
    n_key[int(bounds[-2]):] = total_lk

    pr = np.where(n_key > 1, less / np.maximum(n_key - 1, 1), 0.0)
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            "pr": pa.array(pr, pa.float64()),
        }
    )


def rank_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Pure-local reference driver over pre-sorted block tables (test hook
    for adversarial block splits: tie runs and keys spanning blocks)."""
    summaries = [summarize_block(t, key, value) for t in tables]
    pr, pt, tf, tl = scan_offsets(summaries)
    return [
        rank_block(t, key, value, id_col, pr[i], pt[i], tf[i], tl[i])
        for i, t in enumerate(tables)
    ]


def percent_rank_by_key(ds, *, key: str, value: str, id_col: str):
    """percent_rank() OVER (PARTITION BY key ORDER BY value) as a Dataset ->
    Dataset operator. See module docstring for the distributed shape."""
    import ray
    import ray.data

    sorted_ds = ds.sort([key, value])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "pr": pa.array([], pa.float64())})
        )

    summarize = ray.remote(num_cpus=0.5)(summarize_block)
    rank = ray.remote(num_cpus=0.5)(rank_block)

    summaries = ray.get([summarize.remote(r, key, value) for r in refs])
    prev_rows, prev_ties, total_fk, total_lk = scan_offsets(summaries)
    out_refs = [
        rank.remote(
            refs[i], key, value, id_col,
            prev_rows[i], prev_ties[i], total_fk[i], total_lk[i],
        )
        for i in range(len(refs))
    ]
    return ray.data.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------------
# Cumulative windowed SUM — same distributed shape as percent_rank above:
# one global sort, O(1)-size block summaries, a driver scan over summaries,
# then an embarrassingly-parallel per-block pass. The ORDER BY tuple must be
# unique within each partition key (caller includes a tiebreaker column) so
# SQL's RANGE and ROWS framings coincide.


@dataclass
class SumSummary:
    n: int
    first_key: object = None
    last_key: object = None
    head_k: int = 0       # leading rows sharing first_key
    tail_k: int = 0       # trailing rows sharing last_key
    head_sum: float = 0.0  # sum(value) over the leading run
    tail_sum: float = 0.0  # sum(value) over the trailing run


def summarize_sums(tbl: pa.Table, key: str, value: str) -> SumSummary:
    n = tbl.num_rows
    if n == 0:
        return SumSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value).astype(np.float64)
    same_head = k == k[0]
    head_k = int(np.argmin(same_head)) if not same_head.all() else n
    same_tail = k == k[-1]
    tail_k = int(np.argmin(same_tail[::-1])) if not same_tail.all() else n
    return SumSummary(
        n=n,
        first_key=k[0], last_key=k[-1],
        head_k=head_k, tail_k=tail_k,
        head_sum=float(np.sum(v[:head_k])),
        tail_sum=float(np.sum(v[n - tail_k:])),
    )


def scan_sum_offsets(summaries: list[SumSummary]) -> list[float]:
    """Per block: sum of value over EARLIER rows of the block's first key.
    Float note: the carry adds per-block run sums left-to-right, so low-bit
    results depend on the block split (as any distributed float sum does);
    consumers round (the oracle twin rounds to 6 decimals on both sides)."""
    out = [0.0] * len(summaries)
    cur_key, cur_sum, started = None, 0.0, False
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if started and s.first_key == cur_key:
            out[i] = cur_sum
        if started and s.first_key == cur_key and s.head_k == s.n:
            cur_sum += s.head_sum
        else:
            cur_key = s.last_key
            cur_sum = s.tail_sum
            started = True
    return out


def cumsum_block(
    tbl: pa.Table, key: str, value: str, id_col: str, prev_sum: float
) -> pa.Table:
    """Within-block running sum restarting at key changes; the first key's
    segment starts from ``prev_sum`` carried in from earlier blocks."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "cum": pa.array([], pa.float64())}
        )
    k = _col_np(tbl, key)
    v = _col_np(tbl, value).astype(np.float64)
    cs = np.cumsum(v)
    idx = np.arange(n, dtype=np.int64)
    key_change = np.concatenate([[True], k[1:] != k[:-1]])
    seg_start = np.maximum.accumulate(np.where(key_change, idx, 0))
    base = np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0.0)
    cum = cs - base
    head = k == k[0]
    head_run = int(np.argmin(head)) if not head.all() else n
    cum[:head_run] += prev_sum
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            "cum": pa.array(cum, pa.float64()),
        }
    )


def cumsum_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Local reference driver over pre-sorted blocks (test hook)."""
    offs = scan_sum_offsets([summarize_sums(t, key, value) for t in tables])
    return [
        cumsum_block(t, key, value, id_col, offs[i]) for i, t in enumerate(tables)
    ]


def cumsum_by_key(ds, *, key: str, value: str, id_col: str, sort_cols=None):
    """SUM(value) OVER (PARTITION BY key ORDER BY sort_cols ROWS UNBOUNDED
    PRECEDING AND CURRENT ROW) as a Dataset -> Dataset operator. sort_cols
    defaults to [key, id_col]; it must make the order unique per key."""
    import ray
    import ray.data

    sorted_ds = ds.sort(sort_cols or [key, id_col])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "cum": pa.array([], pa.float64())})
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_sums)
    cblock = ray.remote(num_cpus=0.5)(cumsum_block)
    offs = scan_sum_offsets(ray.get([summarize.remote(r, key, value) for r in refs]))
    return ray.data.from_arrow_refs(
        [cblock.remote(refs[i], key, value, id_col, offs[i]) for i in range(len(refs))]
    )


# ---------------------------------------------------------------------------
# Distributed EXACT per-group quantiles (quantile_cont semantics) — the
# over-worker-size path that `event_value_percentiles` (map_groups, one
# group per task) documents but does not provide. Same distributed shape as
# percent_rank above: one global sort by (key, value), O(1)-size block
# summaries, a driver prefix scan, then one embarrassingly-parallel pass
# that extracts ONLY the rows sitting at the pre-computed per-group order
# statistics. Rows never gather anywhere: the per-block output is at most
# 2 × |quantiles| × (groups present in the block) scalars.
#
# quantile_cont / np.quantile(method="linear"): for group size n and
# fraction q, pos = q·(n-1); result = v[floor(pos)]·(1-frac) + v[ceil(pos)]·frac.
# So each (group, q) needs at most TWO order statistics — we compute the
# global per-group indices up front from a per-group count table (an
# aggregate-sized broadcast: quantile output is O(groups) anyway), and each
# sorted block emits the values whose per-group rank lands inside it.


@dataclass
class KeySummary:
    n: int
    first_key: object = None
    last_key: object = None
    head_k: int = 0  # leading rows sharing first_key
    tail_k: int = 0  # trailing rows sharing last_key


def summarize_keys(tbl: pa.Table, key: str) -> KeySummary:
    n = tbl.num_rows
    if n == 0:
        return KeySummary(n=0)
    k = _col_np(tbl, key)
    same_head = k == k[0]
    head_k = int(np.argmin(same_head)) if not same_head.all() else n
    same_tail = k == k[-1]
    tail_k = int(np.argmin(same_tail[::-1])) if not same_tail.all() else n
    return KeySummary(n=n, first_key=k[0], last_key=k[-1], head_k=head_k, tail_k=tail_k)


def scan_key_offsets(summaries: list[KeySummary]) -> list[int]:
    """Per block: rows of the block's FIRST key in earlier blocks (the only
    key in a sorted block whose per-group rank does not start at 0)."""
    out = [0] * len(summaries)
    cur_key, cur_rows, started = None, 0, False
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if started and s.first_key == cur_key:
            out[i] = cur_rows
        if started and s.first_key == cur_key and s.head_k == s.n:
            cur_rows += s.n
        else:
            cur_key = s.last_key
            cur_rows = s.tail_k
            started = True
    return out


def order_stats_block(
    tbl: pa.Table, key: str, value: str, prev_rows: int, targets: dict
) -> pa.Table:
    """Emit (key, gidx, value) for every requested per-group order statistic
    whose global per-group rank falls inside this sorted block.

    ``targets``: key -> SORTED np.int64 array of needed per-group ranks.
    The loop is over KEY RUNS (distinct keys in the block), not rows; work
    per run is two searchsorteds into that key's tiny target array."""
    n = tbl.num_rows
    if n == 0 or not targets:
        return pa.table(
            {"key_pos": pa.array([], pa.int64()), "gidx": pa.array([], pa.int64())}
        )
    k = _col_np(tbl, key)
    change = np.concatenate([[True], k[1:] != k[:-1]])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)
    pos_chunks, gidx_chunks = [], []
    for s0, e0 in zip(starts, ends):
        t = targets.get(k[s0])
        if t is None:
            continue
        g0 = prev_rows if s0 == 0 else 0
        lo = int(np.searchsorted(t, g0))
        hi = int(np.searchsorted(t, g0 + (e0 - s0)))
        if hi > lo:
            sel = t[lo:hi]
            pos_chunks.append(s0 + (sel - g0))
            gidx_chunks.append(sel)
    if not pos_chunks:
        return pa.table(
            {"key_pos": pa.array([], pa.int64()), "gidx": pa.array([], pa.int64())}
        )
    pos = np.concatenate(pos_chunks)
    out = tbl.select([key, value]).take(pa.array(pos, pa.int64()))
    return pa.table(
        {
            "key": out.column(key),
            "gidx": pa.array(np.concatenate(gidx_chunks), pa.int64()),
            "value": pc.cast(out.column(value), pa.float64()),
        }
    )


def quantile_targets(counts: dict, quantiles) -> dict:
    """key -> sorted unique per-group ranks needed for quantile_cont."""
    out = {}
    for kk, n in counts.items():
        pos = np.asarray(quantiles, dtype=np.float64) * (n - 1)
        idx = np.unique(np.concatenate([np.floor(pos), np.ceil(pos)]).astype(np.int64))
        out[kk] = idx
    return out


def interpolate_quantiles(counts: dict, quantiles, stats: dict) -> dict:
    """(key -> n), [q...], ((key, gidx) -> value) -> key -> [vq...]."""
    res = {}
    for kk, n in counts.items():
        vals = []
        for q in quantiles:
            pos = q * (n - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            vlo, vhi = stats[(kk, lo)], stats[(kk, hi)]
            vals.append(vlo + (pos - lo) * (vhi - vlo))
        res[kk] = vals
    return res


def quantile_tables(tables: list[pa.Table], key: str, value: str, quantiles):
    """Local reference driver over pre-sorted blocks (test hook for
    adversarial splits: key runs and target ranks spanning blocks)."""
    counts = {}
    for t in tables:
        for kk in _col_np(t, key) if t.num_rows else []:
            counts[kk] = counts.get(kk, 0) + 1
    targets = quantile_targets(counts, quantiles)
    offs = scan_key_offsets([summarize_keys(t, key) for t in tables])
    stats = {}
    for i, t in enumerate(tables):
        out = order_stats_block(t, key, value, offs[i], targets)
        if "key" in out.column_names:
            for kk, g, v in zip(
                _col_np(out, "key"), out.column("gidx").to_pylist(),
                out.column("value").to_pylist(),
            ):
                stats[(kk, g)] = v
    return interpolate_quantiles(counts, quantiles, stats)


def quantiles_by_key(ds, *, key: str, value: str, quantiles) -> dict:
    """quantile_cont(value, q) GROUP BY key with NO per-group
    materialization: groups may exceed any single worker. Returns
    key -> [v_q ...] (aggregate-sized).

    Stages: (1) per-batch count combiner -> per-group totals (the result is
    O(groups), the same size as the operator's output, so driver-held and
    broadcast by design); (2) global sort by (key, value) — the one
    all-to-all; (3) O(1) block summaries + driver scan (same machinery as
    percent_rank_by_key); (4) one task per block extracts only the rows at
    the needed per-group ranks (≤ 2·|q| rows per group TOTAL across all
    blocks)."""
    import ray

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table({"key": g.column(key), "n": g.column("count_all")})

    counts: dict = {}
    for part in ds.map_batches(count_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for kk, nn in zip(_col_np(part, "key"), part.column("n").to_pylist()):
            counts[kk] = counts.get(kk, 0) + int(nn)
    if not counts:
        return {}

    targets_ref = ray.put(quantile_targets(counts, quantiles))

    sorted_ds = ds.sort([key, value])
    refs = sorted_ds.to_arrow_refs()
    summarize = ray.remote(num_cpus=0.5)(summarize_keys)
    extract = ray.remote(num_cpus=0.5)(order_stats_block)
    offs = scan_key_offsets(ray.get([summarize.remote(r, key) for r in refs]))
    outs = ray.get(
        [extract.remote(refs[i], key, value, offs[i], targets_ref) for i in range(len(refs))]
    )
    stats = {}
    for out in outs:
        if "key" not in out.column_names:
            continue
        for kk, g, v in zip(
            _col_np(out, "key"), out.column("gidx").to_pylist(),
            out.column("value").to_pylist(),
        ):
            stats[(kk, g)] = v
    return interpolate_quantiles(counts, quantiles, stats)


# ---------------------------------------------------------------------------
# Distributed LAG(1) — value - lag(value) OVER (PARTITION BY key ORDER BY
# sort_cols) without per-group materialization. The carry per block is a
# single scalar (the last row of the nearest earlier non-empty block, used
# only when its key matches this block's first key), so the driver scan is
# O(#blocks) and each block then lags independently.


@dataclass
class LagSummary:
    n: int
    first_key: object = None
    last_key: object = None
    last_val: float = 0.0


def summarize_lag(tbl: pa.Table, key: str, value: str) -> LagSummary:
    n = tbl.num_rows
    if n == 0:
        return LagSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    return LagSummary(n=n, first_key=k[0], last_key=k[-1], last_val=float(v[-1]))


def scan_lag_carry(summaries: list[LagSummary]):
    """Per block: (has_carry, carry_value) for its first row — the value of
    the globally preceding row when that row shares the block's first key."""
    out = [(False, 0.0)] * len(summaries)
    prev: LagSummary | None = None
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if prev is not None and prev.last_key == s.first_key:
            out[i] = (True, prev.last_val)
        prev = s
    return out


def lag_block(
    tbl: pa.Table, key: str, value: str, id_col: str,
    has_carry: bool, carry: float,
) -> pa.Table:
    """Vectorized within-block lag; null where a key's first row has no
    predecessor. Emits (id, key, value, lag)."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key: tbl.column(key),
                "value": pa.array([], pa.float64()),
                "lag": pa.array([], pa.float64()),
            }
        )
    k = _col_np(tbl, key)
    v = _col_np(tbl, value).astype(np.float64)
    lagv = np.empty(n, dtype=np.float64)
    lagv[1:] = v[:-1]
    lagv[0] = carry
    valid = np.concatenate([[has_carry], k[1:] == k[:-1]])
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            key: tbl.column(key),
            "value": pa.array(v, pa.float64()),
            "lag": pa.array(np.where(valid, lagv, np.nan), pa.float64(), mask=~valid),
        }
    )


def lag_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Local reference driver over pre-sorted blocks (test hook)."""
    carries = scan_lag_carry([summarize_lag(t, key, value) for t in tables])
    return [
        lag_block(t, key, value, id_col, carries[i][0], carries[i][1])
        for i, t in enumerate(tables)
    ]


def lag_by_key(ds, *, key: str, value: str, id_col: str, sort_cols=None):
    """lag(value, 1) OVER (PARTITION BY key ORDER BY sort_cols) as a
    Dataset -> Dataset operator; sort_cols defaults to [key, value, id_col]
    and must order rows uniquely per key."""
    import ray
    import ray.data

    sorted_ds = ds.sort(sort_cols or [key, value, id_col])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "lag": pa.array([], pa.float64()),
                }
            )
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_lag)
    lblock = ray.remote(num_cpus=0.5)(lag_block)
    carries = scan_lag_carry(
        ray.get([summarize.remote(r, key, value) for r in refs])
    )
    return ray.data.from_arrow_refs(
        [
            lblock.remote(refs[i], key, value, id_col, carries[i][0], carries[i][1])
            for i in range(len(refs))
        ]
    )


# ---------------------------------------------------------------------------
# Distributed ROW_NUMBER / NTILE — reuses percent_rank's BlockSummary scan:
# prev_rows gives the block's first key its starting row_number, total_fk /
# total_lk give the boundary keys their GROUP SIZES (interior keys are fully
# contained, so both are block-local). No per-key broadcast at any size.


def ntile_block(
    tbl: pa.Table,
    key: str,
    value: str,
    id_col: str,
    prev_rows: int,
    total_fk: int,
    total_lk: int,
    n_tiles: int,
) -> pa.Table:
    """Emit (id, rn, tile): 1-based row_number per key and SQL NTILE(n)
    bucket (first c % n buckets get size c//n + 1)."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
        )
    k = _col_np(tbl, key)
    idx = np.arange(n, dtype=np.int64)
    key_change = np.concatenate([[True], k[1:] != k[:-1]])
    key_start = np.maximum.accumulate(np.where(key_change, idx, 0))
    rn = idx - key_start  # 0-based within block
    bounds = np.concatenate([np.nonzero(key_change)[0], [n]])
    seg_counts = np.diff(bounds)
    c = np.repeat(seg_counts, seg_counts).astype(np.int64)  # group sizes
    seg0 = int(bounds[1])
    rn[:seg0] += prev_rows
    c[:seg0] = total_fk
    c[int(bounds[-2]):] = total_lk

    q, r = c // n_tiles, c % n_tiles
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    in_big = rn < big
    tile = np.where(
        in_big,
        rn // np.maximum(q + 1, 1),
        r + np.where(q > 0, (rn - big) // np.maximum(q, 1), 0),
    ) + 1
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            "rn": pa.array(rn + 1, pa.int64()),
            "tile": pa.array(tile, pa.int64()),
        }
    )


def ntile_tables(
    tables: list[pa.Table], key: str, value: str, id_col: str, n_tiles: int
):
    """Local reference driver over pre-sorted blocks (test hook)."""
    summaries = [summarize_block(t, key, value) for t in tables]
    pr, _pt, tf, tl = scan_offsets(summaries)
    return [
        ntile_block(t, key, value, id_col, pr[i], tf[i], tl[i], n_tiles)
        for i, t in enumerate(tables)
    ]


def ntile_by_key(ds, *, key: str, value: str, id_col: str, n_tiles: int, sort_cols=None):
    """row_number()/ntile(n) OVER (PARTITION BY key ORDER BY sort_cols) as a
    Dataset -> Dataset operator. sort_cols defaults to [key, value, id_col]
    and MUST order rows uniquely per key (SQL leaves NTILE ties unspecified;
    a unique order makes both engines deterministic)."""
    import ray
    import ray.data

    sorted_ds = ds.sort(sort_cols or [key, value, id_col])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_block)
    nblock = ray.remote(num_cpus=0.5)(ntile_block)
    pr, _pt, tf, tl = scan_offsets(
        ray.get([summarize.remote(r, key, value) for r in refs])
    )
    return ray.data.from_arrow_refs(
        [
            nblock.remote(refs[i], key, value, id_col, pr[i], tf[i], tl[i], n_tiles)
            for i in range(len(refs))
        ]
    )


# ---------------------------------------------------------------------------
# Distributed DENSE_RANK — same sort + O(1)-summary + driver-scan shape as
# percent_rank above. dense_rank() OVER (PARTITION BY key ORDER BY value) =
# 1 + number of DISTINCT values of the key strictly before the row's value.
# The per-block summary carries the distinct-pair counts of the boundary
# key runs; the driver chain tracks (key, distinct-so-far, last value seen)
# so a partition key spanning any number of blocks costs three scalars.


@dataclass
class DenseSummary:
    n: int
    first_key: object = None
    first_val: float = 0.0
    last_key: object = None
    last_val: float = 0.0
    head_k: int = 0          # leading rows sharing first_key
    head_distinct: int = 0   # distinct (key, value) pairs in that leading run
    tail_k: int = 0          # trailing rows sharing last_key
    tail_distinct: int = 0   # distinct pairs in that trailing run


def summarize_dense(tbl: pa.Table, key: str, value: str) -> DenseSummary:
    n = tbl.num_rows
    if n == 0:
        return DenseSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    same_head = k == k[0]
    head_k = int(np.argmin(same_head)) if not same_head.all() else n
    hv = v[:head_k]
    head_distinct = 1 + int((hv[1:] != hv[:-1]).sum()) if head_k else 0
    same_tail = k == k[-1]
    tail_k = int(np.argmin(same_tail[::-1])) if not same_tail.all() else n
    tv = v[n - tail_k:]
    tail_distinct = 1 + int((tv[1:] != tv[:-1]).sum()) if tail_k else 0
    return DenseSummary(
        n=n,
        first_key=k[0], first_val=float(v[0]),
        last_key=k[-1], last_val=float(v[-1]),
        head_k=head_k, head_distinct=head_distinct,
        tail_k=tail_k, tail_distinct=tail_distinct,
    )


def scan_dense_offsets(summaries: list[DenseSummary]):
    """Per block: (prev_distinct, boundary_continues) for its first key —
    distinct values of that key in EARLIER blocks, and whether the first
    value of this block already appeared there (so the block-local count
    double-counts it by one)."""
    B = len(summaries)
    prev_distinct = [0] * B
    cont = [False] * B
    cur_key, cur_distinct, cur_last_val, started = None, 0, 0.0, False
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if started and s.first_key == cur_key:
            prev_distinct[i] = cur_distinct
            cont[i] = s.first_val == cur_last_val
        if started and s.first_key == cur_key and s.head_k == s.n:
            cur_distinct += s.head_distinct - (1 if s.first_val == cur_last_val else 0)
            cur_last_val = s.last_val
        else:
            cur_key = s.last_key
            cur_distinct = s.tail_distinct
            cur_last_val = s.last_val
            started = True
    return prev_distinct, cont


def dense_rank_block(
    tbl: pa.Table, key: str, value: str, id_col: str,
    prev_distinct: int, cont: bool,
) -> pa.Table:
    """Within-block dense rank (segmented cumsum of pair changes), shifted
    at the block's first key by the carried distinct count."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "dr": pa.array([], pa.int64())}
        )
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    idx = np.arange(n, dtype=np.int64)
    key_change = np.concatenate([[True], k[1:] != k[:-1]])
    pair_change = key_change | np.concatenate([[True], v[1:] != v[:-1]])
    cum = np.cumsum(pair_change.astype(np.int64))
    key_start = np.maximum.accumulate(np.where(key_change, idx, 0))
    dr = cum - cum[key_start] + 1  # pair_change[key_start] is always True
    head = k == k[0]
    seg0 = int(np.argmin(head)) if not head.all() else n
    dr[:seg0] += prev_distinct - (1 if cont else 0)
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            "dr": pa.array(dr, pa.int64()),
        }
    )


def dense_rank_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Local reference driver over pre-sorted blocks (test hook)."""
    pd_, cont = scan_dense_offsets([summarize_dense(t, key, value) for t in tables])
    return [
        dense_rank_block(t, key, value, id_col, pd_[i], cont[i])
        for i, t in enumerate(tables)
    ]


def dense_rank_by_key(ds, *, key: str, value: str, id_col: str):
    """dense_rank() OVER (PARTITION BY key ORDER BY value) as a Dataset ->
    Dataset operator. The sort key is exactly (key, value): a unique
    tiebreaker would turn dense_rank into row_number."""
    import ray
    import ray.data

    sorted_ds = ds.sort([key, value])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "dr": pa.array([], pa.int64())})
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_dense)
    dblock = ray.remote(num_cpus=0.5)(dense_rank_block)
    pd_, cont = scan_dense_offsets(
        ray.get([summarize.remote(r, key, value) for r in refs])
    )
    return ray.data.from_arrow_refs(
        [
            dblock.remote(refs[i], key, value, id_col, pd_[i], cont[i])
            for i in range(len(refs))
        ]
    )


# ---------------------------------------------------------------------------
# Distributed LEAD(1) — the mirror of lag_by_key: the only cross-block state
# is the FIRST value of the next block when it continues the same key, found
# by one backward pass over the O(1) summaries.


@dataclass
class LeadSummary:
    n: int
    first_key: object = None
    last_key: object = None
    first_val: float = 0.0


def summarize_lead(tbl: pa.Table, key: str, value: str) -> LeadSummary:
    n = tbl.num_rows
    if n == 0:
        return LeadSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    return LeadSummary(n=n, first_key=k[0], last_key=k[-1], first_val=float(v[0]))


def scan_lead_carry(summaries: list[LeadSummary]):
    """Per block: (has_carry, carry_value) for its LAST row — the value of
    the globally following row when that row shares the block's last key."""
    out = [(False, 0.0)] * len(summaries)
    nxt: LeadSummary | None = None
    for i in range(len(summaries) - 1, -1, -1):
        s = summaries[i]
        if s.n == 0:
            continue
        if nxt is not None and nxt.first_key == s.last_key:
            out[i] = (True, nxt.first_val)
        nxt = s
    return out


def lead_block(
    tbl: pa.Table, key: str, value: str, id_col: str,
    has_carry: bool, carry: float,
) -> pa.Table:
    """Vectorized within-block lead; null where a key's last row has no
    successor. Emits (id, key, value, lead)."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key: tbl.column(key),
                "value": pa.array([], pa.float64()),
                "lead": pa.array([], pa.float64()),
            }
        )
    k = _col_np(tbl, key)
    v = _col_np(tbl, value).astype(np.float64)
    leadv = np.empty(n, dtype=np.float64)
    leadv[:-1] = v[1:]
    leadv[-1] = carry
    valid = np.concatenate([k[1:] == k[:-1], [has_carry]])
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            key: tbl.column(key),
            "value": pa.array(v, pa.float64()),
            "lead": pa.array(np.where(valid, leadv, np.nan), pa.float64(), mask=~valid),
        }
    )


def lead_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Local reference driver over pre-sorted blocks (test hook)."""
    carries = scan_lead_carry([summarize_lead(t, key, value) for t in tables])
    return [
        lead_block(t, key, value, id_col, carries[i][0], carries[i][1])
        for i, t in enumerate(tables)
    ]


def lead_by_key(ds, *, key: str, value: str, id_col: str, sort_cols=None):
    """lead(value, 1) OVER (PARTITION BY key ORDER BY sort_cols) as a
    Dataset -> Dataset operator; sort_cols defaults to [key, value, id_col]
    and must order rows uniquely per key."""
    import ray
    import ray.data

    sorted_ds = ds.sort(sort_cols or [key, value, id_col])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "lead": pa.array([], pa.float64()),
                }
            )
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_lead)
    lblock = ray.remote(num_cpus=0.5)(lead_block)
    carries = scan_lead_carry(
        ray.get([summarize.remote(r, key, value) for r in refs])
    )
    return ray.data.from_arrow_refs(
        [
            lblock.remote(refs[i], key, value, id_col, carries[i][0], carries[i][1])
            for i in range(len(refs))
        ]
    )


# ---------------------------------------------------------------------------
# Distributed FIRST_VALUE — for every row, the value at its partition key's
# FIRST row in the global sort order (SQL first_value with the default
# RANGE UNBOUNDED PRECEDING frame, which is frame-independent for the first
# value). Cross-block state: one (key, first value) pair carried forward.


@dataclass
class FirstSummary:
    n: int
    first_key: object = None
    last_key: object = None
    single_key: bool = False      # whole block is one key
    last_key_first_val: float = 0.0  # value at the first row of last_key


def summarize_first(tbl: pa.Table, key: str, value: str) -> FirstSummary:
    n = tbl.num_rows
    if n == 0:
        return FirstSummary(n=0)
    k = _col_np(tbl, key)
    v = _col_np(tbl, value)
    same_tail = k == k[-1]
    tail_k = int(np.argmin(same_tail[::-1])) if not same_tail.all() else n
    return FirstSummary(
        n=n,
        first_key=k[0], last_key=k[-1],
        single_key=bool((k == k[0]).all()),
        last_key_first_val=float(v[n - tail_k]),
    )


def scan_first_carry(summaries: list[FirstSummary]):
    """Per block: (has_carry, first value) for its first key when that key
    started in an earlier block."""
    out = [(False, 0.0)] * len(summaries)
    cur_key, cur_first, started = None, 0.0, False
    for i, s in enumerate(summaries):
        if s.n == 0:
            continue
        if started and s.first_key == cur_key:
            out[i] = (True, cur_first)
        if not (started and s.first_key == cur_key and s.single_key):
            cur_key = s.last_key
            cur_first = s.last_key_first_val
            started = True
    return out


def first_value_block(
    tbl: pa.Table, key: str, value: str, id_col: str,
    has_carry: bool, carry: float,
) -> pa.Table:
    """Emit (id, key, value, first): each key segment's first value within
    the block, overridden at the first key by the carried global first."""
    n = tbl.num_rows
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key: tbl.column(key),
                "value": pa.array([], pa.float64()),
                "first": pa.array([], pa.float64()),
            }
        )
    k = _col_np(tbl, key)
    v = _col_np(tbl, value).astype(np.float64)
    idx = np.arange(n, dtype=np.int64)
    key_change = np.concatenate([[True], k[1:] != k[:-1]])
    key_start = np.maximum.accumulate(np.where(key_change, idx, 0))
    fv = v[key_start]
    if has_carry:
        head = k == k[0]
        seg0 = int(np.argmin(head)) if not head.all() else n
        fv[:seg0] = carry
    return pa.table(
        {
            id_col: tbl.column(id_col).cast(pa.int64()),
            key: tbl.column(key),
            "value": pa.array(v, pa.float64()),
            "first": pa.array(fv, pa.float64()),
        }
    )


def first_value_tables(tables: list[pa.Table], key: str, value: str, id_col: str):
    """Local reference driver over pre-sorted blocks (test hook)."""
    carries = scan_first_carry([summarize_first(t, key, value) for t in tables])
    return [
        first_value_block(t, key, value, id_col, carries[i][0], carries[i][1])
        for i, t in enumerate(tables)
    ]


def first_value_by_key(ds, *, key: str, value: str, id_col: str, sort_cols=None):
    """first_value(value) OVER (PARTITION BY key ORDER BY sort_cols) as a
    Dataset -> Dataset operator; sort_cols defaults to [key, value, id_col]
    and must order rows uniquely per key."""
    import ray
    import ray.data

    sorted_ds = ds.sort(sort_cols or [key, value, id_col])
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "first": pa.array([], pa.float64()),
                }
            )
        )
    summarize = ray.remote(num_cpus=0.5)(summarize_first)
    fblock = ray.remote(num_cpus=0.5)(first_value_block)
    carries = scan_first_carry(
        ray.get([summarize.remote(r, key, value) for r in refs])
    )
    return ray.data.from_arrow_refs(
        [
            fblock.remote(refs[i], key, value, id_col, carries[i][0], carries[i][1])
            for i in range(len(refs))
        ]
    )

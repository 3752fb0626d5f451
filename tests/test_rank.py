"""Distributed percent_rank (stages/rank.py): block-split fuzz vs brute
force, plus the Ray end-to-end operator vs DuckDB percent_rank()."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _brute_pr(k: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.zeros(len(k))
    for i in range(len(k)):
        m = k == k[i]
        nk = m.sum()
        out[i] = (v[m] < v[i]).sum() / (nk - 1) if nk > 1 else 0.0
    return out


def test_rank_tables_fuzz_block_splits():
    """Pure-local check: arbitrary block cuts (tie runs and keys spanning
    blocks, empty blocks) give exactly the brute-force percent_rank."""
    from clip_as_service_ray.stages.rank import rank_tables

    rng = np.random.default_rng(11)
    for _ in range(150):
        n = int(rng.integers(1, 60))
        k = rng.integers(0, 4, n)
        v = rng.integers(0, 6, n).astype(float)  # heavy ties
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        ids = np.arange(n)
        exp = _brute_pr(k, v)
        cuts = np.sort(rng.integers(0, n + 1, int(rng.integers(0, 6))))
        bounds = [0, *cuts.tolist(), n]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = rank_tables(tables, "k", "v", "id")
        got = np.concatenate([t.column("pr").to_numpy() for t in outs])
        gid = np.concatenate([t.column("id").to_numpy() for t in outs])
        assert (gid == ids).all()
        np.testing.assert_allclose(got, exp)


def test_rank_tables_one_key_spanning_all_blocks():
    """One partition key across every block — the case the per-group form
    cannot distribute."""
    from clip_as_service_ray.stages.rank import rank_tables

    v = np.repeat(np.arange(10.0), 3)  # ties of 3, one key
    k = np.zeros(len(v), dtype=np.int64)
    ids = np.arange(len(v))
    tables = [
        pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
        for a, b in [(0, 7), (7, 8), (8, 8), (8, 20), (20, 30)]
    ]
    outs = rank_tables(tables, "k", "v", "id")
    got = np.concatenate([t.column("pr").to_numpy() for t in outs])
    np.testing.assert_allclose(got, _brute_pr(k, v))


def test_order_price_percentile_distributed_vs_duckdb(ray_session):
    from clip_as_service_ray.pipelines.operators import order_price_percentile

    got = (
        order_price_percentile(SF)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    want = con.execute(
        "SELECT o_orderkey, round(percent_rank() OVER ("
        "PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)::DOUBLE AS pr "
        "FROM orders ORDER BY o_orderkey"
    ).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    np.testing.assert_allclose(got["pr"], want["pr"], atol=1e-9)


def test_percent_rank_by_key_string_partition(ray_session):
    """String partition keys route through the object-dtype path."""
    import ray.data

    from clip_as_service_ray.stages.rank import percent_rank_by_key

    rng = np.random.default_rng(3)
    n = 500
    k = np.array(["alpha", "beta", "gamma"])[rng.integers(0, 3, n)]
    v = rng.integers(0, 40, n).astype(float)
    t = pa.table({"grp": k, "val": v, "rid": np.arange(n, dtype=np.int64)})
    out = (
        percent_rank_by_key(
            ray.data.from_arrow(t).repartition(9),
            key="grp", value="val", id_col="rid",
        )
        .to_pandas()
        .sort_values("rid")
    )
    np.testing.assert_allclose(out["pr"].to_numpy(), _brute_pr(k, v))


def test_cumsum_tables_fuzz_block_splits():
    """Arbitrary block cuts (keys spanning blocks, single-key middle blocks,
    empty blocks) match a brute-force per-key running sum."""
    from clip_as_service_ray.stages.rank import cumsum_tables

    rng = np.random.default_rng(23)
    for _ in range(25):
        n = int(rng.integers(1, 120))
        k = np.sort(rng.integers(0, 6, n))
        v = np.round(rng.normal(size=n), 3)
        ids = np.arange(n, dtype=np.int64)
        # brute force over the sorted stream
        want = np.zeros(n)
        for key in np.unique(k):
            m = k == key
            want[m] = np.cumsum(v[m])
        # random cuts, including empty blocks
        cuts = np.unique(rng.integers(0, n + 1, size=int(rng.integers(0, 6))))
        bounds = [0, *cuts.tolist(), n]
        tables = [
            pa.table(
                {
                    "k": pa.array(k[a:b], pa.int64()),
                    "v": pa.array(v[a:b], pa.float64()),
                    "id": pa.array(ids[a:b], pa.int64()),
                }
            )
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = [t.to_pandas() for t in cumsum_tables(tables, "k", "v", "id")]
        import pandas as pd

        got = pd.concat(outs).sort_values("id")["cum"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_user_cumulative_value_vs_duckdb(ray_session):
    import __ray_entry__ as e

    got = (
        e.queries()["user_cumulative_value"](SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = (
        con.execute(e.oracle_sql()["user_cumulative_value"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
    np.testing.assert_allclose(got["cum_value"], want["cum_value"], atol=1e-6)


def test_quantile_tables_fuzz_block_splits():
    """Distributed exact quantiles: arbitrary block cuts (tie runs, keys and
    target ranks spanning blocks, empty blocks) match np.quantile exactly."""
    from clip_as_service_ray.stages.rank import quantile_tables

    rng = np.random.default_rng(23)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    for _ in range(150):
        nkeys = int(rng.integers(1, 5))
        k_all, v_all = [], []
        for ki in range(nkeys):
            n = int(rng.integers(1, 50))
            k_all += [f"k{ki}"] * n
            v_all += rng.choice([0.0, 1.5, 2.0, 7.25, -3.0], size=n).tolist()
        order = np.lexsort((v_all, k_all))
        k = np.array(k_all)[order]
        v = np.array(v_all)[order]
        cuts = np.sort(rng.integers(0, len(k) + 1, int(rng.integers(0, 7))))
        bounds = [0, *cuts.tolist(), len(k)]
        tables = [
            pa.table({"g": pa.array(k[a:b]), "v": pa.array(v[a:b], pa.float64())})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        got = quantile_tables(tables, "g", "v", qs)
        for ki in set(k_all):
            exp = np.quantile(v[k == ki], qs, method="linear")
            np.testing.assert_allclose(got[ki], exp, atol=1e-12)


def test_quantiles_by_key_vs_duckdb(ray_session):
    """End-to-end distributed quantiles over events vs DuckDB quantile_cont."""
    import ray.data

    from clip_as_service_ray.stages.rank import quantiles_by_key

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"],
        override_num_blocks=8,
    )
    got = quantiles_by_key(
        ds, key="event_type", value="value", quantiles=[0.5, 0.9, 0.99]
    )
    exp = duckdb.sql(
        "SELECT event_type, quantile_cont(value, 0.5) p50, "
        "quantile_cont(value, 0.9) p90, quantile_cont(value, 0.99) p99 "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).fetchall()
    assert len(exp) == len(got)
    for et, p50, p90, p99 in exp:
        np.testing.assert_allclose(got[et], [p50, p90, p99], rtol=1e-12)


def test_lag_tables_fuzz_block_splits():
    """Distributed lag(1): arbitrary block cuts (keys spanning blocks, empty
    blocks, singleton keys) match the brute-force previous-row-of-same-key."""
    from clip_as_service_ray.stages.rank import lag_tables

    rng = np.random.default_rng(31)
    for _ in range(150):
        nkeys = int(rng.integers(1, 5))
        k_all, v_all, id_all = [], [], []
        nid = 0
        for ki in range(nkeys):
            n = int(rng.integers(1, 30))
            k_all += [ki] * n
            v_all += sorted(rng.integers(0, 50, n).tolist())
            id_all += list(range(nid, nid + n))
            nid += n
        k = np.array(k_all)
        v = np.array(v_all, float)
        ids = np.array(id_all)
        exp = {
            ids[i]: (v[i - 1] if i > 0 and k[i - 1] == k[i] else None)
            for i in range(len(k))
        }
        cuts = np.sort(rng.integers(0, len(k) + 1, int(rng.integers(0, 7))))
        bounds = [0, *cuts.tolist(), len(k)]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        for out in lag_tables(tables, "k", "v", "id"):
            for rid, lag in zip(
                out.column("id").to_pylist(), out.column("lag").to_pylist()
            ):
                assert lag == exp[rid]


def test_user_interevent_gap_vs_duckdb(ray_session):
    """E2E distributed-lag operator vs DuckDB's window lag()."""
    from clip_as_service_ray.pipelines.operators import user_interevent_gap

    got = (
        user_interevent_gap(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "WITH o AS (SELECT user_id, epoch_us(ts) AS t, event_id "
        f"  FROM read_parquet('{SF}/events.parquet')), "
        "d AS (SELECT user_id, t - lag(t) OVER "
        "  (PARTITION BY user_id ORDER BY t, event_id) AS gap FROM o) "
        "SELECT user_id, count(*)::BIGINT AS n_gaps, "
        "round(avg(gap) / 1e6, 6)::DOUBLE AS avg_gap_s, max(gap)::BIGINT AS max_gap_us "
        "FROM d WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ).df()
    assert (got["user_id"].values == exp["user_id"].values).all()
    assert (got["n_gaps"].values == exp["n_gaps"].values).all()
    np.testing.assert_array_equal(got["avg_gap_s"].values, exp["avg_gap_s"].values)
    assert (got["max_gap_us"].values == exp["max_gap_us"].values).all()


def test_ntile_tables_fuzz_block_splits():
    """Distributed row_number/ntile: arbitrary block cuts match brute-force
    SQL NTILE sizing (first c % n buckets get c // n + 1 rows)."""
    from clip_as_service_ray.stages.rank import ntile_tables

    rng = np.random.default_rng(41)
    for _ in range(150):
        nkeys = int(rng.integers(1, 5))
        n_tiles = int(rng.integers(1, 6))
        k_all, v_all, id_all = [], [], []
        nid = 0
        for ki in range(nkeys):
            n = int(rng.integers(1, 30))
            k_all += [ki] * n
            v_all += sorted(rng.integers(0, 50, n).tolist())
            id_all += list(range(nid, nid + n))
            nid += n
        k = np.array(k_all)
        v = np.array(v_all, float)
        ids = np.array(id_all)
        exp_rn, exp_tile = {}, {}
        for ki in set(k_all):
            rows = ids[k == ki]
            c = len(rows)
            q, r = divmod(c, n_tiles)
            for j, rid in enumerate(rows):
                exp_rn[rid] = j + 1
                if j < r * (q + 1):
                    exp_tile[rid] = j // (q + 1) + 1
                else:
                    exp_tile[rid] = r + (j - r * (q + 1)) // max(q, 1) + 1
        cuts = np.sort(rng.integers(0, len(k) + 1, int(rng.integers(0, 7))))
        bounds = [0, *cuts.tolist(), len(k)]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        for out in ntile_tables(tables, "k", "v", "id", n_tiles):
            for rid, rn, tile in zip(
                out.column("id").to_pylist(),
                out.column("rn").to_pylist(),
                out.column("tile").to_pylist(),
            ):
                assert rn == exp_rn[rid] and tile == exp_tile[rid]


# ---------------------------------------------------------------------------
# dense_rank / lead / first_value (round-3 additions, same block-split fuzz)


def _brute_dense(k: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.zeros(len(k), dtype=np.int64)
    for i in range(len(k)):
        m = k == k[i]
        out[i] = len(np.unique(v[m][v[m] < v[i]])) + 1
    return out


def test_dense_rank_tables_fuzz_block_splits():
    """Arbitrary block cuts (tie runs / keys spanning blocks, empty blocks)
    reproduce brute-force dense_rank exactly."""
    from clip_as_service_ray.stages.rank import dense_rank_tables

    rng = np.random.default_rng(23)
    for _ in range(150):
        n = int(rng.integers(1, 60))
        k = rng.integers(0, 4, n)
        v = rng.integers(0, 6, n).astype(float)  # heavy ties
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        ids = np.arange(n)
        exp = _brute_dense(k, v)
        cuts = np.sort(rng.integers(0, n + 1, int(rng.integers(0, 6))))
        bounds = [0, *cuts.tolist(), n]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = dense_rank_tables(tables, "k", "v", "id")
        got = np.concatenate([t.column("dr").to_numpy() for t in outs])
        gid = np.concatenate([t.column("id").to_numpy() for t in outs])
        assert (gid == ids).all()
        np.testing.assert_array_equal(got, exp)


def test_dense_rank_one_key_spanning_all_blocks():
    from clip_as_service_ray.stages.rank import dense_rank_tables

    v = np.repeat(np.arange(10.0), 3)  # ties of 3, one key
    k = np.zeros(len(v), dtype=np.int64)
    ids = np.arange(len(v))
    tables = [
        pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
        for a, b in [(0, 7), (7, 8), (8, 8), (8, 20), (20, 30)]
    ]
    outs = dense_rank_tables(tables, "k", "v", "id")
    got = np.concatenate([t.column("dr").to_numpy() for t in outs])
    np.testing.assert_array_equal(got, np.repeat(np.arange(1, 11), 3))


def test_lead_tables_fuzz_block_splits():
    """lead(1) over arbitrary splits == shifted values, null at each key's
    last row."""
    from clip_as_service_ray.stages.rank import lead_tables

    rng = np.random.default_rng(31)
    for _ in range(120):
        n = int(rng.integers(1, 50))
        k = np.sort(rng.integers(0, 4, n))
        v = rng.normal(size=n)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        ids = np.arange(n)
        cuts = np.sort(rng.integers(0, n + 1, int(rng.integers(0, 5))))
        bounds = [0, *cuts.tolist(), n]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = lead_tables(tables, "k", "v", "id")
        lead = np.concatenate(
            [t.column("lead").to_numpy(zero_copy_only=False) for t in outs]
        )
        for i in range(n):
            if i + 1 < n and k[i + 1] == k[i]:
                assert lead[i] == v[i + 1]
            else:
                assert np.isnan(lead[i])


def test_first_value_tables_fuzz_block_splits():
    """first_value over arbitrary splits == each key's globally first value."""
    from clip_as_service_ray.stages.rank import first_value_tables

    rng = np.random.default_rng(37)
    for _ in range(120):
        n = int(rng.integers(1, 50))
        k = np.sort(rng.integers(0, 4, n))
        v = rng.normal(size=n)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        ids = np.arange(n)
        exp = np.empty(n)
        for i in range(n):
            exp[i] = v[k == k[i]][0]
        cuts = np.sort(rng.integers(0, n + 1, int(rng.integers(0, 5))))
        bounds = [0, *cuts.tolist(), n]
        tables = [
            pa.table({"k": k[a:b], "v": v[a:b], "id": ids[a:b]})
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = first_value_tables(tables, "k", "v", "id")
        got = np.concatenate([t.column("first").to_numpy() for t in outs])
        np.testing.assert_array_equal(got, exp)

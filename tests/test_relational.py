"""Relational pipeline operators (Q3 3-table join, label centroids, range
join operator) vs DuckDB at sf0.001 — fast in-suite twins of the driver
oracle entries."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _view(con, name):
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
    )


def test_shipping_priority_q3(ray_session):
    from clip_as_service_ray.pipelines.operators import shipping_priority_q3

    got = shipping_priority_q3(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        _view(con, t)
    want = con.execute(
        "SELECT l_orderkey, o_orderdate, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2)::DOUBLE AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < DATE '1997-01-01' AND l_shipdate > DATE '1997-01-01' "
        "GROUP BY l_orderkey, o_orderdate "
        "ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey LIMIT 10"
    ).df()
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    np.testing.assert_allclose(got["revenue"], want["revenue"], atol=1e-6)


def test_label_centroid_dims(ray_session):
    from clip_as_service_ray.pipelines.operators import label_centroid_dims

    got = label_centroid_dims(SF).to_pandas().sort_values("label").reset_index(drop=True)
    con = duckdb.connect()
    _view(con, "embeddings")
    want = con.execute(
        "SELECT label, count(*)::BIGINT AS n_vecs, "
        "round(avg(embedding[1]::DOUBLE), 6) AS d0, "
        "round(avg(embedding[2]::DOUBLE), 6) AS d1, "
        "round(avg(embedding[3]::DOUBLE), 6) AS d2, "
        "round(avg(embedding[4]::DOUBLE), 6) AS d3 "
        "FROM embeddings GROUP BY label ORDER BY label"
    ).df()
    assert got["label"].tolist() == want["label"].tolist()
    assert got["n_vecs"].tolist() == want["n_vecs"].tolist()
    for c in ("d0", "d1", "d2", "d3"):
        np.testing.assert_allclose(got[c], want[c], atol=2e-6)


def test_purchase_click_counts(ray_session):
    from clip_as_service_ray.pipelines.operators import purchase_click_counts

    got = (
        purchase_click_counts(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    _view(con, "events")
    want = con.execute(
        "SELECT p.event_id, count(c.event_id)::BIGINT AS n_clicks "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON c.user_id = p.user_id AND c.ts >= p.ts "
        "AND c.ts < p.ts + INTERVAL 5 MINUTE "
        "GROUP BY p.event_id ORDER BY p.event_id"
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["n_clicks"].tolist() == want["n_clicks"].tolist()


def test_revenue_filter_q6(ray_session):
    from clip_as_service_ray.pipelines.operators import revenue_filter_q6

    got = revenue_filter_q6(SF)
    con = duckdb.connect()
    _view(con, "lineitem")
    want = con.execute(
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
        "count(*)::BIGINT AS n FROM lineitem "
        "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ).fetchone()
    assert got.column("n_rows")[0].as_py() == want[1]
    assert abs(got.column("revenue")[0].as_py() - float(want[0])) < 1e-4

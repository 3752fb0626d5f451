"""Connected components (large-star/small-star) vs a pure-Python union-find,
plus the dup_clusters operator vs DuckDB's recursive-CTE transitive closure."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(int(a), int(b))
    return {x: find(x) for x in list(parent)}


def _cc(edges_np, **kw):
    import ray.data

    from clip_as_service_ray.stages.components import connected_components

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(edges_np[:, 0], pa.int64()),
                "dst": pa.array(edges_np[:, 1], pa.int64()),
            }
        )
    )
    out = connected_components(ds, **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["component"].astype(int)))


def test_components_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(20, 400))
        m = int(rng.integers(n // 2, 2 * n))
        edges = rng.integers(0, 10 * n, size=(m, 2)).astype(np.int64)
        got = _cc(edges)
        want = _union_find(edges[edges[:, 0] != edges[:, 1]])
        # min-of-component canonicalization on both sides
        assert got == want, f"trial {trial}"


def test_components_long_chain(ray_session):
    # worst case for naive min-label propagation: a 300-node path; the star
    # algorithm must converge well inside the round cap
    n = 300
    edges = np.stack([np.arange(1, n), np.arange(0, n - 1)], axis=1).astype(np.int64)
    got = _cc(edges, num_partitions=4)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_components_self_loops_and_dups(ray_session):
    edges = np.array(
        [[5, 5], [1, 2], [2, 1], [1, 2], [9, 9], [7, 8]], dtype=np.int64
    )
    got = _cc(edges)
    # pure self-loop nodes carry no connectivity information and are dropped
    assert got == {1: 1, 2: 1, 7: 7, 8: 7}


def test_dup_clusters_matches_recursive_cte(ray_session):
    import __ray_entry__ as e

    got = e.queries()["dup_clusters"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["dup_clusters"]).df()
    assert len(got) > 0, "fixture should contain planted near-duplicates"
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
    # every cluster representative is a member of its own cluster
    reps = set(got["cluster_id"])
    assert reps <= set(got["doc_id"])


def test_near_dedup_keep_drops_non_canonical(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    labels = q["dup_clusters"](SF).to_pandas()
    kept = set(q["near_dedup_keep"](SF).to_pandas()["doc_id"])
    non_canon = set(labels.loc[labels.doc_id != labels.cluster_id, "doc_id"])
    canon = set(labels.loc[labels.doc_id == labels.cluster_id, "doc_id"])
    assert kept.isdisjoint(non_canon)
    assert canon <= kept


def test_bigram_counts_deterministic_tiebreak(ray_session):
    import __ray_entry__ as e

    t = e.queries()["bigram_counts"](SF)
    ns = t.column("n").to_pylist()
    bgs = t.column("bigram").to_pylist()
    assert ns == sorted(ns, reverse=True)
    for i in range(1, len(ns)):
        if ns[i] == ns[i - 1]:
            assert bgs[i] > bgs[i - 1]

"""Distributed connected components over a candidate-pair graph.

Capstone for the dedup family (SURVEY.md §2.8): near-dup detection emits
PAIRS (minhash/simhash/jaccard/cosine); collapsing pairs into CLUSTERS and
electing one canonical document per cluster is what actually deduplicates a
corpus. Pairwise "keep the smaller id" is wrong for chains (a~b, b~c must
put a,b,c in ONE cluster even though a!~c).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC'14). Both operations are a single groupby over the EDGE set:

  large-star(c): m = min(N(c) ∪ {c}); emit (n, m) for n in N(c), n > c
  small-star(c): over edges oriented hi→lo, m = min(N(c) ∪ {c});
                 emit (n, m) for n in N(c) ∪ {c}, n != m

Alternating the two converges in O(log^2 n) rounds (O(log n) in practice)
to a star forest in which every node points directly at its component
minimum — robust to long chains where naive min-label propagation needs
O(diameter) rounds.

Scale notes: every shuffle here is over the candidate-PAIR graph, never the
corpus — at 100 TB the dup graph is orders of magnitude smaller than the
input (and must fit the cluster regardless, since it IS the dedup decision
set). Edges are deduped for free by the groupby itself (duplicates of
(u, v) share the group key), so no extra distinct pass. Convergence is
detected by a multiset checksum (count + sum of a splitmix-style pair hash)
computed from per-group partials riding along with the edges — one small
driver-side fold per round, no row data on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clip_as_service_ray.functions.partitions import parts_for_dataset

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _empty_edges() -> pa.Table:
    return _EDGE_SCHEMA.empty_table()


def _pair_hash(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit mix of an edge list (splitmix64 finalizer)."""
    z = (u.astype(np.uint64) << np.uint64(32)) ^ v.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sym(batch: pa.Table) -> pa.Table:
    """Emit both orientations of each edge, keyed by the grouping center."""
    u = batch.column("src").to_numpy(zero_copy_only=False)
    v = batch.column("dst").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "ctr": pa.array(np.concatenate([u, v]), pa.int64()),
            "nbr": pa.array(np.concatenate([v, u]), pa.int64()),
        }
    )


def _orient_hi_lo(batch: pa.Table) -> pa.Table:
    """Key each edge by its larger endpoint (small-star orientation)."""
    u = batch.column("src").to_numpy(zero_copy_only=False)
    v = batch.column("dst").to_numpy(zero_copy_only=False)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    return pa.table({"ctr": pa.array(hi, pa.int64()), "nbr": pa.array(lo, pa.int64())})


def _large_star_group(tbl: pa.Table) -> pa.Table:
    c = int(tbl.column("ctr")[0].as_py())
    nbrs = np.unique(tbl.column("nbr").to_numpy(zero_copy_only=False))
    m = min(c, int(nbrs[0]))
    out = nbrs[nbrs > c]
    if out.size == 0:
        # keep the node's attachment alive so roots aren't dropped mid-run
        if c != m:
            return pa.table(
                {"src": pa.array([c], pa.int64()), "dst": pa.array([m], pa.int64())}
            )
        return _empty_edges()
    return pa.table(
        {
            "src": pa.array(out, pa.int64()),
            "dst": pa.array(np.full(out.size, m, np.int64), pa.int64()),
        }
    )


def _small_star_group(tbl: pa.Table) -> pa.Table:
    c = int(tbl.column("ctr")[0].as_py())
    nbrs = np.unique(tbl.column("nbr").to_numpy(zero_copy_only=False))
    m = int(nbrs[0])  # all nbrs <= c by orientation, so min(N ∪ {c}) = nbrs[0]
    xs = nbrs[nbrs != m]
    if c != m:
        xs = np.concatenate([xs, [c]])
    xs = xs[xs != m]
    if xs.size == 0:
        return _empty_edges()
    return pa.table(
        {
            "src": pa.array(np.unique(xs), pa.int64()),
            "dst": pa.array(np.full(len(np.unique(xs)), m, np.int64), pa.int64()),
        }
    )


def _checksum(ds) -> tuple[int, int]:
    """(n_edges, multiset hash-sum) via per-batch partials; edges stay remote."""

    def part(batch: pa.Table) -> pa.Table:
        u = batch.column("src").to_numpy(zero_copy_only=False)
        v = batch.column("dst").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            s = int(np.sum(_pair_hash(u, v), dtype=np.uint64))
        return pa.table(
            {"n": pa.array([len(u)], pa.int64()), "h": pa.array([s], pa.uint64())}
        )

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in parts)
    h = 0
    for r in parts:
        h = (h + int(r["h"])) & 0xFFFFFFFFFFFFFFFF
    return n, h


def connected_components(
    edges, *, num_partitions: int | None = None, max_rounds: int = 64
):
    """edges: Dataset with int64 columns (src, dst); returns a Dataset of
    (node, component) for every node that appears in an edge, component =
    min node id of its connected component.

    Each round is two groupbys over the current edge set (large-star then
    small-star); duplicate edges collapse inside the groups (np.unique on a
    shared key), so the edge set stays within a small factor of the input.
    """
    if num_partitions is None:
        num_partitions = parts_for_dataset(edges)
    import ray.data

    ds = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src").cast(pa.int64()),
                "dst": t.column("dst").cast(pa.int64()),
            }
        ).filter(pa.compute.invert(pa.compute.equal(t.column("src"), t.column("dst")))),
        batch_format="pyarrow",
    ).materialize()
    if ds.count() == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("component", pa.int64())]).empty_table()
        )

    prev = None
    for _ in range(max_rounds):
        ds = (
            ds.map_batches(_sym, batch_format="pyarrow")
            .groupby("ctr", num_partitions=num_partitions)
            .map_groups(_large_star_group, batch_format="pyarrow")
        )
        ds = (
            ds.map_batches(_orient_hi_lo, batch_format="pyarrow")
            .groupby("ctr", num_partitions=num_partitions)
            .map_groups(_small_star_group, batch_format="pyarrow")
        ).materialize()
        chk = _checksum(ds)
        if chk == prev:
            break
        prev = chk
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    def to_labels(batch: pa.Table) -> pa.Table:
        # star forest: (x, root). Emit x->root and root->root; the groupby
        # below collapses duplicate root rows and any residual multi-edges.
        u = batch.column("src").to_numpy(zero_copy_only=False)
        v = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "component": pa.array(np.concatenate([v, v]), pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(to_labels, batch_format="pyarrow")
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("component", alias_name="component"))
    )

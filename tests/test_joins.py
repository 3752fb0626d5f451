"""Join operators: broadcast probe, shuffle tagged-union join, as-of join —
semantics pinned against plain pandas reference implementations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.joins import (
    asof_join_by_user,
    broadcast_hash_join,
    shuffle_hash_join,
)


@pytest.fixture()
def rds(ray_session):
    import ray.data

    return ray.data


def test_broadcast_hash_join(rds):
    big = rds.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 2, 9], pa.int64()),
                  "x": pa.array([10, 20, 30, 21, 90], pa.int64())})
    )
    dim = pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                    "name": pa.array(["c", "a", "b"], pa.string())})
    out = (
        broadcast_hash_join(big, dim, left_key="k", right_key="k")
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    # unmatched key 9 dropped (inner); payload attached
    assert out.k.tolist() == [1, 2, 2, 3]
    assert out.name.tolist() == ["a", "b", "b", "c"]
    dup = pa.table({"k": pa.array([1, 1], pa.int64()), "name": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_hash_join(big, dup, left_key="k", right_key="k")


def test_shuffle_hash_join(rds):
    rng = np.random.default_rng(8)
    lk = rng.integers(0, 50, 300)
    rk = rng.integers(0, 50, 80)
    left = pd.DataFrame({"k": lk, "lv": np.arange(300)})
    right = pd.DataFrame({"k": rk, "rv": np.arange(80) * 10})
    got = (
        shuffle_hash_join(
            rds.from_pandas(left), rds.from_pandas(right), on="k"
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]].astype("int64"), want.astype("int64")
    )
    # column collision outside the key is rejected
    with pytest.raises(ValueError, match="collision"):
        shuffle_hash_join(
            rds.from_pandas(left), rds.from_pandas(left), on="k"
        )


def test_asof_join(rds):
    rng = np.random.default_rng(5)
    n_l, n_r = 200, 150
    left = pd.DataFrame(
        {"u": rng.integers(0, 9, n_l), "ts": rng.integers(0, 10_000_000, n_l),
         "lid": np.arange(n_l)}
    )
    right = pd.DataFrame(
        {"u": rng.integers(0, 9, n_r), "ts": rng.integers(0, 10_000_000, n_r),
         "rid": np.arange(n_r) + 1000}
    )
    lt = pa.table(
        {"u": pa.array(left.u, pa.int64()),
         "ts": pa.array(left.ts, pa.int64()),
         "lid": pa.array(left.lid, pa.int64())}
    )
    rt = pa.table(
        {"u": pa.array(right.u, pa.int64()),
         "ts": pa.array(right.ts, pa.int64()),
         "rid": pa.array(right.rid, pa.int64())}
    )
    got = (
        asof_join_by_user(
            rds.from_arrow(lt), rds.from_arrow(rt),
            key="u", ts="ts", left_id="lid", right_id="rid",
        )
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    # pandas reference: latest right with ts <= left ts per user
    want_rows = []
    for _, lr in left.iterrows():
        cand = right[(right.u == lr.u) & (right.ts <= lr.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            want_rows.append((lr.lid, best.rid, round((lr.ts - best.ts) / 1e6, 6)))
    want = (
        pd.DataFrame(want_rows, columns=["left_id", "right_id", "wait_s"])
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    assert got.left_id.tolist() == want.left_id.tolist()
    assert got.right_id.tolist() == want.right_id.tolist()
    np.testing.assert_allclose(got.wait_s.to_numpy(), want.wait_s.to_numpy(), atol=1e-9)


def test_range_join_count_boundaries(rds):
    from clip_as_service_ray.stages.joins import range_join_count

    US = 1_000_000
    w = 10.0  # seconds -> bucket width 10s
    # lefts: probe windows crossing bucket boundaries; rights at exact
    # boundary instants (ts == t inclusive, ts == t+w exclusive)
    left = pa.table(
        {
            "u": pa.array([1, 1, 2, 3], pa.int64()),
            "ts": pa.array([5 * US, 9 * US, 50 * US, 7 * US], pa.timestamp("us")),
            "id": pa.array([100, 101, 102, 103], pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 2, 9], pa.int64()),
            "ts": pa.array(
                [5 * US, 14 * US, 15 * US, 19 * US, 55 * US, 5 * US],
                pa.timestamp("us"),
            ),
            "id": pa.array([0] * 6, pa.int64()),
        }
    )
    out = (
        range_join_count(
            rds.from_arrow(left),
            rds.from_arrow(right),
            key="u",
            ts="ts",
            left_id="id",
            window_s=w,
        )
        .to_pandas()
        .set_index("left_id")["n_matches"]
        .to_dict()
    )
    # id=100 window [5,15): rights at 5,14 -> 2 (15 excluded)
    # id=101 window [9,19): rights at 14,15 -> 2 (19 excluded, 5 before)
    # id=102 window [50,60): right at 55 (user 2) -> 1
    # id=103 user 3: no rights -> 0 (left-join semantics)
    assert out == {100: 2, 101: 2, 102: 1, 103: 0}


def test_range_join_count_matches_pandas(rds):
    from clip_as_service_ray.stages.joins import range_join_count

    rng = np.random.default_rng(17)
    n_l, n_r, w = 300, 1200, 37.0
    lt = rng.integers(0, 3600 * 1_000_000, n_l)
    rt = rng.integers(0, 3600 * 1_000_000, n_r)
    lu = rng.integers(0, 20, n_l)
    ru = rng.integers(0, 20, n_r)
    left = pa.table(
        {"u": pa.array(lu, pa.int64()), "ts": pa.array(lt, pa.timestamp("us")),
         "id": pa.array(np.arange(n_l), pa.int64())}
    )
    right = pa.table(
        {"u": pa.array(ru, pa.int64()), "ts": pa.array(rt, pa.timestamp("us")),
         "id": pa.array(np.zeros(n_r), pa.int64())}
    )
    got = (
        range_join_count(
            rds.from_arrow(left), rds.from_arrow(right),
            key="u", ts="ts", left_id="id", window_s=w,
        )
        .to_pandas().set_index("left_id")["n_matches"].sort_index()
    )
    w_us = int(w * 1e6)
    want = np.array(
        [((ru == u) & (rt >= t) & (rt < t + w_us)).sum() for u, t in zip(lu, lt)]
    )
    assert len(got) == n_l
    np.testing.assert_array_equal(got.to_numpy(), want)


def test_semi_and_anti_join(rds):
    from clip_as_service_ray.stages.joins import shuffle_anti_join, shuffle_semi_join

    left = rds.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 3, 4], pa.int64()),
                  "v": pa.array(["a", "b", "c", "c2", "d"], pa.string())})
    )
    # right has fanout (duplicate keys) — semi must NOT duplicate lefts
    right = rds.from_arrow(
        pa.table({"k": pa.array([2, 2, 3, 9], pa.int64()),
                  "w": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())})
    )
    semi = (
        shuffle_semi_join(left, right.select_columns(["k"]), on="k")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert semi["k"].tolist() == [2, 3, 3]
    assert semi["v"].tolist() == ["b", "c", "c2"]
    anti = (
        shuffle_anti_join(left, right.select_columns(["k"]), on="k")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert anti["k"].tolist() == [1, 4]
    assert anti["v"].tolist() == ["a", "d"]


def test_shuffle_left_outer_join(rds):
    left = rds.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "x": pa.array([10, 20, 30], pa.int64())})
    )
    right = rds.from_arrow(
        pa.table({"k": pa.array([2, 2], pa.int64()),
                  "y": pa.array([5.0, 6.0], pa.float64())})
    )
    out = (
        shuffle_hash_join(left, right, on="k", how="left")
        .to_pandas().sort_values(["k", "y"]).reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 2, 3]
    assert out["y"].tolist()[1:3] == [5.0, 6.0]
    assert np.isnan(out["y"][0]) and np.isnan(out["y"][3])
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, on="k", how="cross")


def test_shuffle_outer_join_variants_match_pandas(rds):
    """full / right / left / inner against pandas merge on a random keyed
    pair with one-sided keys on both ends and duplicate keys."""
    rng = np.random.default_rng(3)
    lk = rng.integers(0, 20, 40)
    rk = rng.integers(10, 30, 35)  # overlap [10,20), one-sided both ends
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "x": pa.array(rng.integers(0, 100, 40), pa.int64())})
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "y": pa.array(rng.random(35), pa.float64())})
    lpd, rpd = lt.to_pandas(), rt.to_pandas()
    for how, pd_how in [("inner", "inner"), ("left", "left"),
                        ("right", "right"), ("full", "outer")]:
        got = (
            shuffle_hash_join(rds.from_arrow(lt), rds.from_arrow(rt),
                              on="k", how=how)
            .to_pandas()
            .sort_values(["k", "x", "y"])
            .reset_index(drop=True)
        )
        want = (
            lpd.merge(rpd, on="k", how=pd_how)
            .sort_values(["k", "x", "y"])
            .reset_index(drop=True)[["k", "x", "y"]]
        )
        assert len(got) == len(want), how
        for c in ("k", "x", "y"):
            a = got[c].to_numpy(dtype=float)
            b = want[c].to_numpy(dtype=float)
            assert np.allclose(a, b, rtol=0, atol=0, equal_nan=True), (how, c)


def test_broadcast_join_empty_dimension_side(ray_session):
    """An empty broadcast side yields an empty inner join with the full
    joined schema (regression: probe_fn indexed skeys[-1] on size 0)."""
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.joins import broadcast_hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array(["a", "b", "c"])})
    )
    dim = pa.table({"k": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string())})
    out = broadcast_hash_join(left, dim, left_key="k", right_key="k")
    tbl = out.take_all()
    assert tbl == []

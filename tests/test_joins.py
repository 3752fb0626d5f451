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

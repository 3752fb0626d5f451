"""frequent_itemsets (Apriori) — sparse-partkey scale regression.

VERDICT r04 flagged the partkey->brand lookup as a dense O(max partkey)
LUT broadcast; it is now a broadcast sorted-array map (termmap precedent).
This fixture's partkeys are ~1e12 with only 4 parts — the dense LUT would
have tried an ~8 TB allocation, the sorted map holds 4 entries."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clip_as_service_ray.pipelines.operators import frequent_itemsets

PK_A = 10**12 + 1
PK_B = 5 * 10**12 + 3
PK_C = 9 * 10**12 + 9
PK_D = 7 * 10**12  # never purchased


@pytest.fixture(scope="module")
def sparse_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("sparse_sf")
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([PK_A, PK_B, PK_C, PK_D], pa.int64()),
                "p_brand": pa.array(
                    ["Brand#A", "Brand#B", "Brand#C", "Brand#D"]
                ),
            }
        ),
        os.path.join(root, "part.parquet"),
    )
    # baskets: o1={A,B} o2={A,B} o3={A,B,C} o4={A} o5={C}; o3 carries a
    # duplicate A line (distinct-codes dedup must collapse it)
    orders = [1, 1, 2, 2, 3, 3, 3, 3, 4, 5]
    parts = [PK_A, PK_B, PK_A, PK_B, PK_A, PK_B, PK_C, PK_A, PK_A, PK_C]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orders, pa.int64()),
                "l_partkey": pa.array(parts, pa.int64()),
            }
        ),
        os.path.join(root, "lineitem.parquet"),
    )
    return str(root)


def test_frequent_itemsets_sparse_partkeys(sparse_dir):
    out = frequent_itemsets(sparse_dir).to_pandas()
    got = list(zip(out["size"], out["itemset"], out["support"]))
    assert got == [
        (1, "Brand#A", 4),
        (1, "Brand#B", 3),
        (1, "Brand#C", 2),
        (2, "Brand#A|Brand#B", 3),
        (2, "Brand#A|Brand#C", 1),
        (2, "Brand#B|Brand#C", 1),
        (3, "Brand#A|Brand#B|Brand#C", 1),
    ]


def test_frequent_itemsets_unknown_partkey_raises(sparse_dir, tmp_path):
    import shutil

    bad = tmp_path / "bad_sf"
    shutil.copytree(sparse_dir, bad)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1], pa.int64()),
                "l_partkey": pa.array([424242], pa.int64()),  # not in part
            }
        ),
        os.path.join(bad, "lineitem.parquet"),
    )
    with pytest.raises(Exception, match="partkeys absent"):
        frequent_itemsets(str(bad))

"""Size-derived shuffle partition helper (functions/partitions.py).

The round-3 verdict's scale item: partition counts must grow with input
bytes and cluster CPUs instead of being pinned at 2/4/8, while keeping the
small-data floor that avoids Ray's tiny-block overhead."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from clip_as_service_ray.functions.partitions import (
    CAP_PER_CPU,
    DEFAULT_TARGET_PARTITION_BYTES,
    parts_for_dataset,
    parts_for_path,
    shuffle_partitions,
)


def test_floor_on_tiny_input():
    assert shuffle_partitions(0, cpus=32) == 2
    assert shuffle_partitions(1, cpus=32) == 2
    assert shuffle_partitions(10 << 20, cpus=32) == 2


def test_scales_with_bytes():
    t = DEFAULT_TARGET_PARTITION_BYTES
    # one partition per target-chunk, monotone in input size
    assert shuffle_partitions(3 * t, cpus=1000) == 3
    assert shuffle_partitions(30 * t, cpus=1000) == 30
    small = shuffle_partitions(4 * t, cpus=10_000)
    big = shuffle_partitions(400 * t, cpus=10_000)
    assert big == 100 * small


def test_caps_at_cluster_cpus():
    # 100 TB on a 16k-CPU cluster: the cap binds, not the byte count
    assert shuffle_partitions(100 << 40, cpus=16_384) == CAP_PER_CPU * 16_384
    # same bytes on a laptop: still bounded
    assert shuffle_partitions(100 << 40, cpus=8) == CAP_PER_CPU * 8


def test_unknown_size_scales_with_cluster():
    assert shuffle_partitions(None, cpus=8) == 8
    assert shuffle_partitions(None, cpus=4096) == 4096
    assert shuffle_partitions(None, cpus=1) == 2  # floor


def test_scale_multiplier_for_expansions():
    t = DEFAULT_TARGET_PARTITION_BYTES
    assert shuffle_partitions(2 * t, scale=4.0, cpus=1000) == 8


def test_parts_for_path(tmp_path):
    # a real parquet file: tiny -> floor
    p = os.path.join(tmp_path, "events.parquet")
    pq.write_table(pa.table({"x": list(range(100))}), p)
    assert parts_for_path(str(tmp_path), "events", floor=2) == 2
    assert parts_for_path(str(tmp_path)) == 2
    # missing table contributes nothing (falls through to unknown-size floor)
    assert parts_for_path(str(tmp_path), "nope") >= 2


def test_parts_for_dataset_never_materializes(ray_session):
    import ray.data

    # read_parquet infers size from metadata without executing
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.parquet")
        pq.write_table(pa.table({"x": list(range(1000))}), p)
        ds = ray.data.read_parquet(p)
        n = parts_for_dataset(ds)
        assert n >= 2
        # post-map metadata is unknown -> cluster-CPU fallback, still >= floor
        ds2 = ds.map_batches(lambda b: b, batch_format="pyarrow")
        assert parts_for_dataset(ds2) >= 2

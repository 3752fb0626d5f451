"""Size-derived shuffle partition counts (round-3 verdict item 2).

Ray Data's default shuffle fans out to 200 partitions; on small inputs that
drowns useful work in tiny-block overhead (the documented Ray 2.49 gotcha),
which is why call sites historically pinned ``num_partitions=2/4/8``. Those
constants are right at sf0.01-0.1 and wrong at 100x the data: they cap every
shuffle at a handful of reducers no matter how many nodes the cluster has.

This module keeps the small-data floor and scales with (a) the bytes
actually entering the shuffle and (b) the cluster size::

    max(floor, min(cap_per_cpu * cluster_CPUs, ceil(bytes / target_bytes)))

- tiny input  -> ``floor`` (2) partitions, exactly the old constants' regime
- medium      -> one reducer partition per ~64 MiB of in-memory data
- huge input  -> capped at 2 partitions per cluster CPU, so a 256-node
  cluster gets thousands of reducers while a laptop still gets a handful.

Correctness note: for a given key, Ray Data's sort-based groupby feeds the
reducer the same per-upstream-block row slices in the same block order no
matter how many reducer partitions exist, so per-key aggregation order (and
therefore float parity with the DuckDB twins) is invariant to this count.
"""

from __future__ import annotations

import os

DEFAULT_TARGET_PARTITION_BYTES = 64 << 20  # in-memory bytes per reducer
DISK_TO_MEM = 3  # rough parquet-on-disk -> in-memory expansion
DEFAULT_FLOOR = 2
CAP_PER_CPU = 2


def cluster_cpus() -> int:
    """Total CPUs in the Ray cluster (all nodes), or the local count when
    Ray is not up (import-time / unit-test contexts)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or (
                os.cpu_count() or 8
            )
    except Exception:
        pass
    return os.cpu_count() or 8


def shuffle_partitions(
    nbytes: int | None = None,
    *,
    floor: int = DEFAULT_FLOOR,
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES,
    scale: float = 1.0,
    cpus: int | None = None,
) -> int:
    """Partition count for a shuffle over ``nbytes`` in-memory bytes.

    ``scale`` multiplies the byte estimate for shuffles whose input is an
    expansion of the measured source (e.g. pair expansion); ``nbytes=None``
    means the size is unknown -> one partition per cluster CPU (scales with
    the cluster, still far below Ray's 200-partition default on a laptop).

    Known trade-off (round-4 review): the unknown-size fallback and the
    whole-directory ``parts_for_path(sf_dir)`` estimate both lean HIGH for
    small post-aggregation shuffles (a few extra near-empty reducers at
    bench scale — measured harmless: the full board's wall time was
    unchanged when these replaced the hand-tuned constants). They lean
    high deliberately: under-partitioning at 100x the data caps shuffle
    parallelism, which is the expensive direction. Call sites that know
    their table should pass it (``parts_for_path(sf_dir, "events")``).
    """
    n_cpus = cpus if cpus is not None else cluster_cpus()
    cap = max(floor, CAP_PER_CPU * n_cpus)
    if nbytes is None:
        return max(floor, min(cap, n_cpus))
    need = -(-int(nbytes * scale) // target_partition_bytes)  # ceil div
    return max(floor, min(cap, need))


def path_bytes(path: str) -> int:
    """On-disk bytes of a parquet file or directory of shards."""
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def parts_for_path(
    sf_dir_or_path: str,
    *tables: str,
    scale: float = 1.0,
    floor: int = DEFAULT_FLOOR,
) -> int:
    """Partition count derived from on-disk parquet bytes.

    ``parts_for_path(sf_dir, "events")`` sizes by that table;
    ``parts_for_path(sf_dir)`` sizes by the whole directory (upper bound);
    a direct file/dir path works too. Disk bytes are inflated by
    ``DISK_TO_MEM`` to approximate the in-memory shuffle payload.
    """
    if tables:
        nbytes = 0
        for t in tables:
            p = os.path.join(sf_dir_or_path, f"{t}.parquet")
            if not os.path.exists(p):
                p = os.path.join(sf_dir_or_path, t)
            nbytes += path_bytes(p)
    else:
        nbytes = path_bytes(sf_dir_or_path)
    return shuffle_partitions(nbytes * DISK_TO_MEM, scale=scale, floor=floor)


def parts_for_dataset(
    ds, *, scale: float = 1.0, floor: int = DEFAULT_FLOOR
) -> int:
    """Partition count from a Dataset's statically-known size.

    Uses only the lazily-inferable metadata (never executes the plan — the
    public ``Dataset.size_bytes()`` materializes when metadata is missing,
    which would break streaming). Post-map datasets usually infer ``None``
    -> the cluster-CPU fallback.
    """
    nbytes = None
    try:
        nbytes = ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        nbytes = None
    return shuffle_partitions(nbytes, scale=scale, floor=floor)

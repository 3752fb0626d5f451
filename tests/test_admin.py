"""Snapshot/restore + alias swap (the ES _snapshot/_aliases surface):
a restored snapshot serves bit-identical hits; an alias swap repoints
searches with no reader restart (zero-downtime reindex)."""

import os

import numpy as np
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.admin import (
    drop_alias,
    list_aliases,
    resolve_alias,
    restore_index,
    set_alias,
    snapshot_index,
)
from clip_as_service_ray.pipelines.build_index import build_index
from clip_as_service_ray.pipelines.search import search_table
from clip_as_service_ray.sources.transcripts import (
    reference_query_table,
    synthesize_transcripts,
)

CFG = EngineConfig(num_index_partitions=2, postings_block_size=64)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("admin")
    idx = str(root / "index")
    build_index(synthesize_transcripts(800, seed=21), idx, CFG, overwrite=True)
    return root, idx


def test_snapshot_restore_bit_identical(built):
    root, idx = built
    snap = str(root / "snap")
    man = snapshot_index(idx, snap)
    assert len(man["files"]) > 0 and "stats.json" in man["files"]
    dest = str(root / "restored")
    restore_index(snap, dest)
    q = reference_query_table()
    want = search_table(idx, q, CFG)
    got = search_table(dest, q, CFG)
    assert got.column("conv_id").to_pylist() == want.column("conv_id").to_pylist()
    np.testing.assert_array_equal(
        got.column("score").to_numpy(), want.column("score").to_numpy()
    )


def test_snapshot_verifies_on_restore(built, tmp_path):
    root, idx = built
    snap = str(tmp_path / "snap2")
    snapshot_index(idx, snap)
    # truncate one artifact -> restore must refuse
    victim = os.path.join(snap, "stats.json")
    data = open(victim, "rb").read()
    # the file may be hardlinked from the live index: replace, don't edit
    os.remove(victim)
    with open(victim, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="bytes"):
        restore_index(snap, str(tmp_path / "restored2"))
    # target-exists and not-a-snapshot guards
    with pytest.raises(FileNotFoundError):
        restore_index(str(tmp_path), str(tmp_path / "x"))
    with pytest.raises(FileExistsError):
        snapshot_index(idx, snap)


def test_alias_swap_zero_downtime_reindex(built, tmp_path):
    """Reindex with a different analyzer under a NEW dir, swap the alias:
    the next resolve serves the new index; the old dir is untouched."""
    root, idx = built
    reg = str(tmp_path / "registry")
    set_alias(reg, "prod", idx)
    assert resolve_alias(reg, "prod") == os.path.abspath(idx)
    # a plain path passes through (ES: name-or-alias)
    assert resolve_alias(reg, idx) == idx

    idx2 = str(tmp_path / "index-stem")
    cfg2 = EngineConfig(num_index_partitions=2, postings_block_size=64,
                        analyzer="stem")
    build_index(synthesize_transcripts(800, seed=21), idx2, cfg2,
                overwrite=True)
    set_alias(reg, "prod", idx2)
    served = resolve_alias(reg, "prod")
    assert served == os.path.abspath(idx2)
    q = reference_query_table()
    hits_new = search_table(served, q, cfg2)
    want_new = search_table(idx2, q, cfg2)
    assert hits_new.column("score").to_pylist() == want_new.column("score").to_pylist()
    assert list_aliases(reg) == {"prod": os.path.abspath(idx2)}
    drop_alias(reg, "prod")
    with pytest.raises(KeyError):
        resolve_alias(reg, "prod")


def test_slm_retention(built, tmp_path):
    """SLM (snapshot lifecycle): monotone snapshot names, exact retention
    pruning, and the newest retained snapshot restores to a working index."""
    from clip_as_service_ray.pipelines.admin import slm_run

    root, idx = built
    policy = str(tmp_path / "slm")
    names = []
    for i in range(5):
        r = slm_run(policy, idx, keep=3)
        names.append(r["snapshot"])
        assert len(r["retained"]) <= 3
    assert names == [f"snap-{i:06d}" for i in range(5)]
    # the two oldest were pruned, the three newest remain on disk
    assert sorted(
        d for d in os.listdir(policy) if d.startswith("snap-")
    ) == ["snap-000002", "snap-000003", "snap-000004"]
    dest = str(tmp_path / "slm_restore")
    restore_index(os.path.join(policy, "snap-000004"), dest)
    q = reference_query_table()
    want = search_table(idx, q, CFG)
    got = search_table(dest, q, CFG)
    assert got.column("conv_id").to_pylist() == want.column("conv_id").to_pylist()

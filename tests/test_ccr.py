"""Cross-cluster replication (ES CCR analog, pipelines/ccr.py): a follower
root converges to the leader's segments + tombstones, incrementally, and
serves identical results."""

import os

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.config import EngineConfig
from clip_as_service_ray.pipelines.ccr import follower_status, replicate
from clip_as_service_ray.pipelines.segments import (
    SegmentedQueryService,
    add_segment,
    compact_segments,
    delete_convs,
)

CFG = EngineConfig(
    num_index_partitions=2, doc_bucket_size=256, postings_block_size=64,
    query_concurrency=1,
)


def _corpus(convs: dict[str, str]) -> pa.Table:
    rows = sorted(convs.items())
    return pa.table(
        {
            "conv_id": pa.array([c for c, _ in rows]),
            "turn_idx": pa.array([0] * len(rows), pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([t for _, t in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array(np.zeros(len(rows), np.int64), pa.timestamp("us")),
        }
    )


def _search(root, text="merge window", k=20):
    svc = SegmentedQueryService(root, CFG)
    try:
        q = pa.table(
            {"query_id": pa.array([0], pa.int64()),
             "text": pa.array([text]),
             "limit": pa.array([k], pa.int32())}
        )
        return svc.search(q).to_pandas()
    finally:
        svc.shutdown()


def test_ccr_lifecycle(ray_session, tmp_path):
    leader = str(tmp_path / "leader")
    follower = str(tmp_path / "follower")
    add_segment(leader, _corpus({"conva": "merge the window",
                                 "convb": "data stream"}), CFG)
    add_segment(leader, _corpus({"convc": "merge merge window",
                                 "convcc": "window of the merge"}), CFG)

    r1 = replicate(leader, follower)
    assert sorted(r1["added"]) == ["seg-0000", "seg-0001"]
    assert r1["removed"] == [] and r1["n_segments"] == 2
    got = _search(follower)
    want = _search(leader)
    assert got.conv_id.tolist() == want.conv_id.tolist()
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())

    # incremental: nothing changed -> nothing ships
    r2 = replicate(leader, follower)
    assert r2["added"] == [] and r2["removed"] == [] and r2["sync"] == 2

    # leader advances: new segment + a tombstoned conv
    add_segment(leader, _corpus({"convd": "window window window"}), CFG)
    delete_convs(leader, ["convc"])
    r3 = replicate(leader, follower)
    assert r3["added"] == ["seg-0002"]
    got = _search(follower)
    assert "convc" not in set(got.conv_id)  # tombstone replicated
    assert "convd" in set(got.conv_id)
    want = _search(leader)
    assert got.conv_id.tolist() == want.conv_id.tolist()
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())

    # compaction rewrites seg-0001 IN PLACE on the leader (convcc survives,
    # convc is purged); the signature check must detect and re-ship it
    compact_segments(leader, CFG)
    r4 = replicate(leader, follower)
    assert "seg-0001" in r4["added"], "compacted segment must re-ship"
    got = _search(follower)
    want = _search(leader)
    assert got.conv_id.tolist() == want.conv_id.tolist()
    np.testing.assert_array_equal(got.score.to_numpy(), want.score.to_numpy())
    assert follower_status(follower)["syncs"] == 4


def test_ccr_refuses_independent_root_and_foreign_leader(ray_session, tmp_path):
    leader = str(tmp_path / "leader")
    other = str(tmp_path / "other")
    add_segment(leader, _corpus({"conva": "merge window"}), CFG)
    add_segment(other, _corpus({"convz": "standalone index"}), CFG)

    with pytest.raises(ValueError, match="independent root"):
        replicate(leader, other)

    follower = str(tmp_path / "f2")
    replicate(leader, follower)
    with pytest.raises(ValueError, match="tracks leader"):
        replicate(other, follower)

    with pytest.raises(FileNotFoundError):
        replicate(str(tmp_path / "nope"), str(tmp_path / "f3"))


def test_ccr_failed_first_sync_is_retryable(ray_session, tmp_path, monkeypatch):
    """ADVICE r04: the _CCR.json marker lands BEFORE any segment ships, so
    a crash mid-first-replication leaves a retryable follower instead of an
    unmarked directory the next replicate() refuses as independent."""
    import clip_as_service_ray.pipelines.ccr as ccr

    leader = str(tmp_path / "leader")
    follower = str(tmp_path / "follower")
    add_segment(leader, _corpus({"conva": "merge window retry"}), CFG)

    real_copy = ccr._copy_tree

    def boom(src, dest):
        raise OSError("simulated crash mid-copy")

    monkeypatch.setattr(ccr, "_copy_tree", boom)
    with pytest.raises(OSError, match="simulated crash"):
        replicate(leader, follower)
    st = follower_status(follower)
    assert st is not None and st["syncs"] == 0  # marker survived the crash

    monkeypatch.setattr(ccr, "_copy_tree", real_copy)
    out = replicate(leader, follower)  # retry converges, no refusal
    assert out["sync"] == 1 and out["n_segments"] == 1
    assert len(_search(follower)) > 0


def test_ccr_signature_catches_count_preserving_rewrite(ray_session, tmp_path):
    """ADVICE r04: an in-place leader rewrite that leaves stats.json
    byte-identical must still re-ship (signature = file sizes+mtimes,
    not stats content)."""
    import glob

    leader = str(tmp_path / "leader")
    follower = str(tmp_path / "follower")
    add_segment(leader, _corpus({"conva": "merge window alpha"}), CFG)
    replicate(leader, follower)

    seg = sorted(os.listdir(os.path.join(leader, "segments")))[0]
    seg_dir = os.path.join(leader, "segments", seg)
    # rewrite one postings artifact with IDENTICAL bytes: only mtime moves
    target = sorted(
        glob.glob(os.path.join(seg_dir, "**", "*.parquet"), recursive=True)
        or glob.glob(os.path.join(seg_dir, "**", "*"), recursive=True)
    )
    target = [p for p in target if os.path.isfile(p)][0]
    with open(target, "rb") as f:
        payload = f.read()
    os.remove(target)  # new inode: hardlinked follower copy keeps old one
    with open(target, "wb") as f:
        f.write(payload)

    out = replicate(leader, follower)
    assert seg in out["added"], "byte-identical rewrite must re-ship"
    out2 = replicate(leader, follower)
    assert out2["added"] == []  # converged: signatures equal again

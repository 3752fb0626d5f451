"""Cross-cluster replication (the ES CCR analog): a FOLLOWER index root
mirrors a LEADER segmented root by shipping whole segments.

ES CCR replays the leader's operation log into follower shards; in this
engine the natural replication unit is the immutable SEGMENT directory —
every write lands as a new segment (add_segment / update_convs) or a
segment replacement (compact_segments), and deletes are the tombstone
file. ``replicate`` therefore:

- hardlinks (or copies, cross-device) every leader segment the follower
  does not have yet — incremental by construction, O(new data);
- drops follower segments the leader no longer lists (compaction on the
  leader converges the follower the same way);
- orders mutations so a follower manifest NEVER names a missing segment:
  new segments land first, then the manifest (+ tombstones / union
  artifacts), and only then do leader-dropped segments delete; an
  in-place compaction rewrite swaps via rename-aside + rename-in (the
  absent window is two renames, not a copy);
- refuses to replicate into a root it does not manage: the follower is
  marked by ``_CCR.json`` (leader path + sync counter). An existing
  segmented root without that marker is an independent index — mirroring
  would destroy it, so that's a loud error, not a merge.

Followers are read-only replicas: serve them with SegmentedQueryService /
the HTTP/WS/gRPC front doors; local writes belong on the leader.
"""

from __future__ import annotations

import json
import os
import shutil

_MARKER = "_CCR.json"


def _copy_tree(src: str, dest: str) -> int:
    """Hardlink-or-copy a segment directory; returns file count."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel_root = os.path.relpath(root, src)
        out_root = os.path.join(dest, rel_root) if rel_root != "." else dest
        os.makedirs(out_root, exist_ok=True)
        for f in files:
            full = os.path.join(root, f)
            out = os.path.join(out_root, f)
            try:
                os.link(full, out)  # immutable artifact: O(metadata)
            except OSError:
                shutil.copy2(full, out)
            n += 1
    return n


def _seg_signature(seg_dir: str) -> tuple | None:
    """Cheap change detector for a segment: every file's (relpath, size,
    mtime_ns). Hardlinks share the leader inode and ``copy2`` preserves
    mtimes, so an unchanged segment compares equal — while ANY in-place
    rewrite (even one that leaves doc/posting counts byte-identical in
    stats.json) perturbs an mtime and triggers a re-ship. stats.json
    content alone was not enough: a count-preserving rewrite would have
    been silently skipped, leaving the follower stale."""
    try:
        sig = []
        for root, _dirs, files in os.walk(seg_dir):
            rel_root = os.path.relpath(root, seg_dir)
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                sig.append((rel_root, f, st.st_size, st.st_mtime_ns))
        return tuple(sorted(sig))
    except OSError:
        return None


def follower_status(follower_root: str) -> dict | None:
    p = os.path.join(follower_root, _MARKER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def replicate(leader_root: str, follower_root: str) -> dict:
    """One replication round: converge ``follower_root`` to the leader's
    current segment set + tombstones. Returns {added, removed, n_segments,
    sync}. Idempotent; each call ships only what changed."""
    lman_path = os.path.join(leader_root, "manifest.json")
    if not os.path.exists(lman_path):
        raise FileNotFoundError(f"leader has no manifest: {lman_path}")
    with open(lman_path) as f:
        leader_man = json.load(f)
    leader_segs = list(leader_man.get("segments", []))

    os.makedirs(follower_root, exist_ok=True)
    status = follower_status(follower_root)
    f_seg_dir = os.path.join(follower_root, "segments")
    has_segments = os.path.isdir(f_seg_dir) and any(
        os.scandir(f_seg_dir)
    ) if os.path.isdir(f_seg_dir) else False
    if status is None:
        if has_segments or os.path.exists(
            os.path.join(follower_root, "manifest.json")
        ):
            raise ValueError(
                f"{follower_root!r} holds an index but no {_MARKER} marker — "
                "refusing to mirror over an independent root (create a fresh "
                "follower directory, or delete the old index explicitly)"
            )
        status = {"leader": os.path.abspath(leader_root), "syncs": 0}
        # land the marker BEFORE shipping anything: a crash mid-first-sync
        # must leave a retryable CCR follower, not an unmarked directory
        # that the next replicate() refuses as an independent index
        tmp = os.path.join(follower_root, _MARKER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(status, f)
        os.replace(tmp, os.path.join(follower_root, _MARKER))
    elif os.path.abspath(leader_root) != status["leader"]:
        raise ValueError(
            f"follower tracks leader {status['leader']!r}; refusing to "
            f"replicate from {os.path.abspath(leader_root)!r}"
        )

    os.makedirs(f_seg_dir, exist_ok=True)
    have = set(os.listdir(f_seg_dir))
    added: list[str] = []
    for seg in leader_segs:
        src = os.path.join(leader_root, "segments", seg)
        dst = os.path.join(f_seg_dir, seg)
        if seg in have and _seg_signature(src) == _seg_signature(dst):
            continue  # unchanged segment: nothing ships
        tmp = os.path.join(f_seg_dir, f".{seg}.tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        _copy_tree(src, tmp)
        if os.path.exists(dst):
            # compaction rewrote this segment under the same name on the
            # leader: rename-aside + rename-in keeps the absent window at
            # two renames (µs), not the whole copy duration
            aside = os.path.join(f_seg_dir, f".{seg}.old")
            if os.path.exists(aside):
                shutil.rmtree(aside)
            os.replace(dst, aside)
            os.replace(tmp, dst)
            shutil.rmtree(aside)
        else:
            os.replace(tmp, dst)  # atomic land
        added.append(seg)
    # segments the leader dropped are removed ONLY AFTER the new manifest
    # lands (below) — a reader must never hold a manifest naming a missing
    # segment; collect them now, delete at the end
    removed: list[str] = [
        seg for seg in sorted(have)
        if not seg.startswith(".") and seg not in leader_segs
    ]

    # remaining root-level state (union stats/dictionary dirs, doc values,
    # ...) mirrors next; manifest.json lands LAST so it only ever names
    # artifacts that are already on disk
    leader_entries = set(os.listdir(leader_root))
    for name in sorted(leader_entries):
        if name in ("segments", "manifest.json", _MARKER):
            continue
        src = os.path.join(leader_root, name)
        dst = os.path.join(follower_root, name)
        if os.path.isdir(src):
            tmp = os.path.join(follower_root, f".{name}.tmp")
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            _copy_tree(src, tmp)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.replace(tmp, dst)
        else:
            tmp = dst + ".tmp"
            shutil.copy2(src, tmp)
            os.replace(tmp, dst)
    for name in sorted(os.listdir(follower_root)):
        if name in leader_entries or name in ("segments", _MARKER):
            continue
        if name.endswith(".tmp") or name.startswith("."):
            continue
        p = os.path.join(follower_root, name)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    # manifest lands before any segment REMOVAL: new segments are already
    # on disk (above), so the freshly-copied manifest only names present
    # dirs; only then is it safe to delete what the leader dropped
    src = os.path.join(leader_root, "manifest.json")
    tmp = os.path.join(follower_root, "manifest.json.tmp")
    shutil.copy2(src, tmp)
    os.replace(tmp, os.path.join(follower_root, "manifest.json"))
    for seg in removed:
        shutil.rmtree(os.path.join(f_seg_dir, seg), ignore_errors=True)

    status["syncs"] = int(status.get("syncs", 0)) + 1
    tmp = os.path.join(follower_root, _MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(status, f)
    os.replace(tmp, os.path.join(follower_root, _MARKER))
    return {
        "added": added,
        "removed": removed,
        "n_segments": len(leader_segs),
        "sync": status["syncs"],
    }

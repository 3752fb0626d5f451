"""Checkpoint manifests: skip-if-valid resume + per-stage lineage counters.

Mirrors the reference's resumable-download contract
(``/root/reference/server/clip_server/model/pretrained_models.py:149-241``):
partial work lands in a temp location, a validity marker
(there: md5; here: a ``_DONE.json`` manifest with counters) gates skipping on
restart (skip-if-valid at ``pretrained_models.py:161-167``), and incomplete
stages are redone, not duplicated.

Granularity: one manifest per STAGE OUTPUT directory (post-tokenize staging,
postings, dictionary) — checkpoint boundaries sit at stage outputs, never
mid-shuffle (SURVEY.md §7.5). Multi-shard builds get per-shard index dirs,
each independently resumable, which is the per-partition resume story at
cluster scale.
"""

from __future__ import annotations

import json
import os
import shutil
import time

DONE_NAME = "_DONE.json"


def stage_done(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, DONE_NAME))


def read_stage(stage_dir: str) -> dict:
    with open(os.path.join(stage_dir, DONE_NAME)) as f:
        return json.load(f)


def mark_stage_done(stage_dir: str, counters: dict) -> dict:
    """Atomically write the stage manifest (tmp + rename)."""
    payload = {"completed_at_unix": time.time(), **counters}
    path = os.path.join(stage_dir, DONE_NAME)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, path)
    return payload


def reset_stage(stage_dir: str) -> None:
    """Remove a stale / partial stage output before rebuilding."""
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                total += os.path.getsize(os.path.join(root, name))
            except OSError:
                pass
    return total


def write_json(path: str, payload: dict) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, path)


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)

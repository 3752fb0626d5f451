"""Index administration: snapshots, restore, and aliases.

The ES operations surface the reference deployment relies on around its
serving path (snapshot/restore for backup, alias swap for zero-downtime
reindex — the `_aliases` + `_snapshot` APIs):

- ``snapshot_index(src, snap_dir)`` — consistent point-in-time copy of an
  index or segmented root. Files HARDLINK into the snapshot when the
  filesystem allows (the artifact files are immutable once written —
  build/merge only ever create new files — so a link-based snapshot is
  safe and O(metadata), the same trick ES uses for incremental snapshots);
  cross-device falls back to copy. A ``_SNAPSHOT.json`` manifest records
  every file with its size for restore-time verification.
- ``restore_index(snap_dir, dest)`` — materialize a snapshot into a fresh
  directory, verifying the manifest (missing/truncated files fail loudly
  rather than restoring a corrupt index).
- ``set_alias / resolve_alias / list_aliases`` — a tiny alias registry
  (``aliases.json`` under a registry dir) with ATOMIC swap via
  write-temp + ``os.replace``: a reindex builds a NEW index dir (new
  analyzer, new config), then one rename repoints the alias; readers
  resolve per request and never observe a half-written registry.

Mutable state at the ROOT level (``tombstones.json``, ``aliases.json``)
is snapshotted by VALUE (copied, not linked) since it can be rewritten
in place later.
"""

from __future__ import annotations

import json
import os
import shutil

_MUTABLE = {"tombstones.json"}  # rewritten in place -> never hardlink


def _iter_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            full = os.path.join(dirpath, f)
            yield os.path.relpath(full, root), full


def snapshot_index(src: str, snap_dir: str) -> dict:
    """Point-in-time copy of ``src`` into ``snap_dir`` (must not exist).
    Returns the manifest dict. Callers coordinate with writers the same
    way searches do (segment writes swap new directories in atomically,
    so a snapshot taken between writes is always consistent)."""
    if os.path.exists(snap_dir):
        raise FileExistsError(f"snapshot target {snap_dir!r} already exists")
    os.makedirs(snap_dir)
    files = {}
    for rel, full in _iter_files(src):
        dest = os.path.join(snap_dir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.basename(rel) in _MUTABLE:
            shutil.copy2(full, dest)
        else:
            try:
                os.link(full, dest)  # immutable artifact: O(metadata)
            except OSError:
                shutil.copy2(full, dest)
        files[rel] = os.path.getsize(full)
    manifest = {"source": os.path.abspath(src), "files": files}
    with open(os.path.join(snap_dir, "_SNAPSHOT.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def restore_index(snap_dir: str, dest: str) -> dict:
    """Restore a snapshot into ``dest`` (must not exist), verifying every
    manifest entry's presence and size first."""
    mp = os.path.join(snap_dir, "_SNAPSHOT.json")
    if not os.path.exists(mp):
        raise FileNotFoundError(f"{snap_dir!r} is not a snapshot (no _SNAPSHOT.json)")
    with open(mp) as f:
        manifest = json.load(f)
    for rel, size in manifest["files"].items():
        full = os.path.join(snap_dir, rel)
        if not os.path.exists(full):
            raise FileNotFoundError(f"snapshot is missing {rel!r}")
        got = os.path.getsize(full)
        if got != size:
            raise ValueError(
                f"snapshot file {rel!r} is {got} bytes, manifest says {size}"
            )
    if os.path.exists(dest):
        raise FileExistsError(f"restore target {dest!r} already exists")
    os.makedirs(dest)
    for rel in manifest["files"]:
        src = os.path.join(snap_dir, rel)
        out = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy2(src, out)
    return manifest


def _aliases_path(registry_dir: str) -> str:
    return os.path.join(registry_dir, "aliases.json")


def list_aliases(registry_dir: str) -> dict[str, str]:
    p = _aliases_path(registry_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_alias(registry_dir: str, alias: str, index_dir: str) -> dict[str, str]:
    """Atomically point ``alias`` at ``index_dir`` (write-temp +
    os.replace — concurrent readers see the old or the new map, never a
    torn file). The zero-downtime reindex primitive: build the new index
    under a fresh dir, then swap."""
    os.makedirs(registry_dir, exist_ok=True)
    aliases = list_aliases(registry_dir)
    aliases[alias] = os.path.abspath(index_dir)
    tmp = _aliases_path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f)
    os.replace(tmp, _aliases_path(registry_dir))
    return aliases


def drop_alias(registry_dir: str, alias: str) -> dict[str, str]:
    aliases = list_aliases(registry_dir)
    aliases.pop(alias, None)
    tmp = _aliases_path(registry_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f)
    os.replace(tmp, _aliases_path(registry_dir))
    return aliases


def resolve_alias(registry_dir: str, name: str) -> str:
    """Alias -> index dir; a plain existing path passes through unchanged
    (the ES convention: APIs accept an index name or an alias)."""
    aliases = list_aliases(registry_dir)
    if name in aliases:
        return aliases[name]
    if os.path.exists(name):
        return name
    raise KeyError(f"unknown alias {name!r} (registry {registry_dir!r})")


# --------------------------------------------------------------- SLM ------


def slm_run(policy_dir: str, src: str, *, keep: int = 3) -> dict:
    """Snapshot-lifecycle management (the ES SLM analog): take the next
    numbered snapshot of ``src`` under ``policy_dir`` and prune the oldest
    beyond ``keep``. Snapshot names are a monotone counter persisted in
    ``_SLM.json`` (deterministic — no wall-clock in the name), so a
    scheduler can call this repeatedly and retention stays exact. Returns
    {snapshot, pruned, retained}."""
    os.makedirs(policy_dir, exist_ok=True)
    state_path = os.path.join(policy_dir, "_SLM.json")
    state = {"next": 0, "snapshots": []}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    name = f"snap-{state['next']:06d}"
    snapshot_index(src, os.path.join(policy_dir, name))
    state["next"] += 1
    state["snapshots"].append(name)
    pruned: list[str] = []
    while len(state["snapshots"]) > keep:
        old = state["snapshots"].pop(0)
        shutil.rmtree(os.path.join(policy_dir, old), ignore_errors=True)
        pruned.append(old)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, state_path)
    return {"snapshot": name, "pruned": pruned,
            "retained": list(state["snapshots"])}

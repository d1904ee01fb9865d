"""Snapshot expiry with reachability GC + orphan cleanup.

Mirrors Iceberg's expire_snapshots/remove_orphan_files; the reference
relies on Delta VACUUM (not available OSS). Algorithm:

  1. Retain: the current snapshot and TAGGED snapshots (named refs,
     ``Table.create_tag``) always, plus snapshots newer than
     ``older_than_ms`` / the last ``keep_last``.
  2. MARK: walk retained snapshots' manifests → reachable data files
     and manifest files (pure metadata, driver-side).
  3. SWEEP: delete data/manifest files on disk that are unreachable and
     older than ``grace_s`` (grace protects in-flight uncommitted
     writes), plus stale _staging directories.

Metadata history is rewritten FIRST via the optimistic CAS commit (so
expiry serializes with writers lock-free), then the sweep runs against
the post-expiry reachability set; concurrent writers' fresh files are
protected by grace_s at all times."""

from __future__ import annotations

import os
import shutil
import time

from medalforge_lakehouse_data_spark.format.metadata import (
    manifest_path,
    read_manifest,
)
from medalforge_lakehouse_data_spark.format.table import Table


def expire_snapshots(
    table: Table,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
    grace_s: float = 3600.0,
    dry_run: bool = False,
) -> dict:
    """grace_s guards a real race: a concurrent writer stages data files
    BEFORE its commit, and those files are unreachable until the commit
    lands — a zero-grace sweep would delete them and the commit would
    then reference missing files. Default one hour; tests that own the
    table exclusively pass grace_s=0."""
    if keep_last is None and older_than_ms is None:
        keep_last = 1

    picked: dict = {}

    def pick(snaps, current_id, tagged=()):
        retained, expired = [], []
        for idx, s in enumerate(snaps):
            keep = s.snapshot_id == current_id or s.snapshot_id in tagged
            if keep_last is not None and idx >= len(snaps) - keep_last:
                keep = True
            if older_than_ms is not None and s.timestamp_ms >= older_than_ms:
                keep = True
            (retained if keep else expired).append(s)
        return retained, expired

    if dry_run:
        meta = table.metadata()
        retained, expired = pick(meta.snapshots, meta.current_snapshot_id,
                                 set(meta.refs.values()))
        picked.update(retained=retained, expired=expired)
    else:
        # 1. drop expired snapshots from metadata FIRST (optimistic CAS —
        #    serializes against concurrent commits without a lock)
        def mutate(meta):
            retained, expired = pick(meta.snapshots, meta.current_snapshot_id,
                                     set(meta.refs.values()))
            picked.update(retained=retained, expired=expired)
            if not expired:
                return False, None
            meta.snapshots = retained
            return True, None

        table._commit_metadata(mutate)

    retained, expired = picked["retained"], picked["expired"]
    # 2. MARK from the POST-expiry metadata (dry run: the would-be-retained
    #    set): anything newer a concurrent commit adds is protected by
    #    grace_s (files younger than the grace are never swept)
    mark_snaps = retained if dry_run else table.metadata().snapshots
    reachable_manifests: set[str] = set()
    reachable_data: set[str] = set()
    for s in mark_snaps:
        for m in s.manifest_list:
            reachable_manifests.add(manifest_path(m))
    for m in reachable_manifests:
        for e in read_manifest(table.root, m):
            reachable_data.add(e.path)

    # 3. SWEEP unreachable files on disk
    deleted_data, deleted_manifests, freed = [], [], 0
    now = time.time()
    data_dir = os.path.join(table.root, "data")
    for dirpath, _dirs, fnames in os.walk(data_dir):
        for fn in fnames:
            abs_p = os.path.join(dirpath, fn)
            rel = os.path.relpath(abs_p, table.root)
            if rel in reachable_data:
                continue
            if now - os.path.getmtime(abs_p) < grace_s:
                continue
            freed += os.path.getsize(abs_p)
            deleted_data.append(rel)
            if not dry_run:
                os.unlink(abs_p)
    man_dir = os.path.join(table.root, "metadata", "manifests")
    if os.path.isdir(man_dir):
        for fn in os.listdir(man_dir):
            rel = os.path.join("metadata", "manifests", fn)
            if rel in reachable_manifests:
                continue
            abs_p = os.path.join(table.root, rel)
            if now - os.path.getmtime(abs_p) < grace_s:
                continue
            deleted_manifests.append(rel)
            if not dry_run:
                os.unlink(abs_p)
    # stale staging dirs (crashed writers)
    staging = os.path.join(table.root, "_staging")
    staging_removed = 0
    if os.path.isdir(staging):
        for fn in os.listdir(staging):
            p = os.path.join(staging, fn)
            if now - os.path.getmtime(p) >= grace_s:
                staging_removed += 1
                if not dry_run:
                    shutil.rmtree(p, ignore_errors=True)

    return {
        "expired_snapshots": [s.snapshot_id for s in expired],
        "retained_snapshots": [s.snapshot_id for s in retained],
        "deleted_data_files": len(deleted_data),
        "deleted_manifests": len(deleted_manifests),
        "freed_bytes": freed,
        "staging_dirs_removed": staging_removed,
        "dry_run": dry_run,
    }

"""Filesystem shim for persisted-index maintenance (dedup index, ANN
vector store).

The maintenance operations need exactly three primitives beyond what
Spark's own parquet IO provides:

  - exists / delete (recursive)
  - rename(dir)          — POSIX/HDFS have it atomically; object stores DON'T
  - put_atomic(file)     — a small single-object write that is all-or-nothing
                           (POSIX: write-temp + os.replace; S3/GCS: a PUT)

Two swap strategies route through them:

  * rename swap (LocalFS / HDFS-like): the staged-rewrite double rename the
    compactors have always used — recoverable, one short two-rename window.
  * pointer commit (rename-less stores): each compaction writes a brand-new
    GENERATION directory (`<table>__g<N>`) and then atomically PUTs a tiny
    pointer file `<table>.ptr` naming it — the same metadata-commit shape a
    lakehouse table (Delta/Iceberg) provides, minus the transaction log.
    Readers resolve the pointer first (`live_table_dir`); a crash before
    the PUT leaves the old generation live and the orphan generation is
    garbage-collected by the next successful commit. Nothing is ever
    renamed, so this runs on S3/GCS as-is.

At 100 TB the recommended production route is still a real lakehouse table
(sources/sinks.py); this shim is the dependency-free fallback that keeps
the index correct on any store. Reference parity note: the reference
engine keeps its artifacts on a local POSIX path only
(src/travel_time_extension.cpp load paths); multi-store durability is an
addition this engine needs because its indexes live where the corpus does.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable


class LocalFS:
    """POSIX/HDFS-semantics filesystem: atomic directory rename exists."""

    atomic_rename = True

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    def put_atomic(self, path: str, data: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_siblings(self, path: str, prefix: str) -> list[str]:
        """Entries of path's parent directory starting with prefix —
        object stores implement this as a prefix listing (S3 ListObjectsV2),
        so it stays available where rename is not."""
        parent = os.path.dirname(path) or "."
        if not os.path.isdir(parent):
            return []
        return [
            os.path.join(parent, d) for d in os.listdir(parent) if d.startswith(prefix)
        ]


class RenamelessFS(LocalFS):
    """Object-store semantics over the local disk: rename is UNAVAILABLE
    and put_atomic is a plain single-object write (an S3 PUT is atomic).
    Used by tests to prove the pointer-commit path never renames; also the
    template for a real s3fs/gcsfs adapter (swap the os.* calls)."""

    atomic_rename = False

    def rename(self, src: str, dst: str) -> None:  # noqa: ARG002 — signature parity
        raise NotImplementedError("object stores do not support rename")

    def put_atomic(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:  # a PUT: single-object, all-or-nothing
            f.write(data)


DEFAULT_FS = LocalFS()


def _ptr_path(table_dir: str) -> str:
    return table_dir + ".ptr"


def live_table_dir(table_dir: str, fs: LocalFS | None = None) -> str:
    """Resolve the CURRENT physical directory of a logical table path.

    Plain path when no pointer file exists (the universal initial state —
    zero behavior change for existing indexes); otherwise the generation
    directory the pointer names. Every index read AND append must resolve
    through this so post-compaction writes land in the live generation."""
    fs = fs or DEFAULT_FS
    ptr = _ptr_path(table_dir)
    if fs.exists(ptr):
        rel = json.loads(fs.read(ptr).decode("utf-8"))["dir"]
        return os.path.join(os.path.dirname(table_dir), rel)
    return table_dir


def swap_in_compacted(
    table_dir: str, write_fn: Callable[[str], None], fs: LocalFS | None = None
) -> None:
    """Replace a table directory's contents with a compacted rewrite,
    crash-safely, on either filesystem class.

    write_fn(staging_dir) must write the full compacted copy (it reads
    from live_table_dir(table_dir), which is still untouched).

    Rename-capable FS: the staged-rewrite double rename (recover a lone
    .old first, so the operation is always re-runnable).
    Rename-less FS: write generation N+1, atomically PUT the pointer at
    it, then best-effort delete the previous generation — a crash leaves
    either the old state fully live (pointer not yet PUT) or the new state
    fully live plus unreferenced garbage, never a torn table."""
    fs = fs or DEFAULT_FS
    live = live_table_dir(table_dir, fs)

    if fs.atomic_rename:
        staged, old = table_dir + ".compacting", table_dir + ".old"
        if not fs.exists(live) and fs.exists(old):
            fs.rename(old, live)  # crashed between renames: .old IS the table
        for stale in (staged, old):
            if fs.exists(stale):
                fs.delete(stale)
        write_fn(staged)
        fs.rename(live, old)
        if live != table_dir and fs.exists(table_dir):
            fs.delete(table_dir)  # stale pre-pointer plain dir from mixed history
        fs.rename(staged, table_dir)
        if live != table_dir:
            # index previously maintained pointer-style (mixed history): the
            # plain path is live again, so retire the pointer BEFORE deleting
            # .old — in the reverse order a crash between the two deletes
            # leaves the pointer naming the renamed-away generation with no
            # .old left to recover it from (an unreadable table); in this
            # order every crash point is re-runnable (a dangling pointer
            # always coexists with .old, which the recovery above restores)
            fs.delete(_ptr_path(table_dir))
        fs.delete(old)
        return

    # pointer commit: parse the current generation number off the live dir
    base = os.path.basename(table_dir)
    cur = os.path.basename(live)
    gen = int(cur.rsplit("__g", 1)[1]) if "__g" in cur else 0
    nxt = os.path.join(os.path.dirname(table_dir), f"{base}__g{gen + 1}")
    if fs.exists(nxt):  # debris from a crashed previous attempt
        fs.delete(nxt)
    write_fn(nxt)
    fs.put_atomic(
        _ptr_path(table_dir),
        json.dumps({"dir": os.path.basename(nxt)}).encode("utf-8"),
    )
    # GC every superseded generation AND the pre-pointer plain dir — a
    # prefix listing (available on object stores) rather than just `live`,
    # so an orphan from a crash between a previous PUT and its delete is
    # swept by the next successful commit, not leaked forever
    import re

    gen_pat = re.compile(re.escape(base) + r"__g\d+$")
    for stale in fs.list_siblings(table_dir, base):
        if stale == nxt:
            continue
        if stale == table_dir or gen_pat.fullmatch(os.path.basename(stale)):
            fs.delete(stale)

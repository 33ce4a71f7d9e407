"""Transaction-log tables: atomic commits, snapshot isolation, and
time travel over vanilla parquet.

The reference marks tables ``transactional=true`` and delegates ACID
upserts to the remote engine (create.sql:2-4,44-49); SURVEY §4.3 left
"optionally back transactional tables with Delta" as the stretch.
delta-io is not installable here, so this module implements the core
of that design directly — the publicly documented Delta/Iceberg
recipe (Armbrust et al., "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores", VLDB 2020):

- the table state is an append-only LOG of versioned commits, each a
  JSON file of add/remove-file actions; data files are immutable,
  uniquely named parquet;
- a commit is ATOMIC because it is one ``os.rename`` of a staged log
  entry into ``_txn_log/{version:08d}.json`` — rename-if-absent is the
  optimistic-concurrency primitive (two writers racing the same
  version: exactly one rename wins, the loser re-reads and retries or
  aborts);
- readers resolve a SNAPSHOT (latest or pinned version) by replaying
  the log — never by listing the data directory, which is the 100 TB
  metadata win: directory listing over millions of files is replaced
  by reading ~version/K log files;
- every K commits a CHECKPOINT file collapses the replay prefix, so
  resolution cost stays O(K) regardless of table age;
- VACUUM deletes files no live snapshot references, bounded by a
  retention horizon.

Deliberately file-granular copy-on-write (like Delta without deletion
vectors): overwrite/delete rewrite whole files, reads are plain
``spark.read.parquet(active_files)``. The DML planner's
merge-as-rewrite output can land through ``overwrite`` to become
atomic + time-travelable with no planner changes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_txn_log"
CHECKPOINT_EVERY = 10


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency loss). Re-read the snapshot and retry."""


@dataclass
class Snapshot:
    version: int
    files: list[str]  # relative to table root
    schema_json: str | None


class TxnTable:
    """A transaction-log table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_path = os.path.join(path, LOG_DIR)

    # -- log plumbing ---------------------------------------------------------

    def _entry_path(self, version: int) -> str:
        return os.path.join(self.log_path, f"{version:08d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_path, f"{version:08d}.checkpoint.json")

    def exists(self) -> bool:
        return os.path.isdir(self.log_path) and bool(self._versions())

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_path):
            return []
        out = []
        for f in os.listdir(self.log_path):
            if not f.endswith(".json") or f.endswith(".checkpoint.json"):
                continue
            # only 8-digit version entries count: a concurrent writer's
            # staged .tmp-<hex>.json (or one left by a crash) must never
            # make the log unreadable
            stem = f.split(".")[0]
            if not (len(stem) == 8 and stem.isdigit()):
                continue
            out.append(int(stem))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no transaction log at {self.log_path}")
        return vs[-1]

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Resolve the file set at ``version`` (default: latest) by
        replaying checkpoint + tail — never by listing data files."""
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no transaction log at {self.log_path}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in log (have {vs[0]}..{vs[-1]})")
        # newest checkpoint at or below v collapses the prefix
        start = 0
        files: dict[str, None] = {}
        schema_json = None
        for cv in sorted(vs, reverse=True):
            cp = self._checkpoint_path(cv)
            if cv <= v and os.path.exists(cp):
                with open(cp) as fh:
                    state = json.load(fh)
                files = dict.fromkeys(state["files"])
                schema_json = state.get("schema_json")
                start = cv + 1
                break
        for ev in vs:
            if ev < start or ev > v:
                continue
            with open(self._entry_path(ev)) as fh:
                entry = json.load(fh)
            for a in entry["actions"]:
                if "add" in a:
                    files[a["add"]] = None
                elif "remove" in a:
                    files.pop(a["remove"], None)
            schema_json = entry.get("schema_json") or schema_json
        return Snapshot(version=v, files=list(files), schema_json=schema_json)

    def _commit(
        self,
        expected_version: int,
        actions: list[dict[str, Any]],
        schema_json: str | None,
    ) -> int:
        """Atomic rename-if-absent commit of ``expected_version``."""
        os.makedirs(self.log_path, exist_ok=True)
        entry = {
            "version": expected_version,
            "actions": actions,
            "schema_json": schema_json,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        target = self._entry_path(expected_version)
        try:
            # link+unlink = rename that FAILS if target exists (os.rename
            # silently replaces on POSIX; link is the atomic primitive)
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"version {expected_version} already committed at {self.log_path}"
            ) from None
        finally:
            os.unlink(tmp)
        if expected_version % CHECKPOINT_EVERY == 0 and expected_version > 0:
            snap = self.snapshot(expected_version)
            cp_tmp = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}.json")
            with open(cp_tmp, "w") as fh:
                json.dump(
                    {"files": snap.files, "schema_json": snap.schema_json}, fh
                )
            os.replace(cp_tmp, self._checkpoint_path(expected_version))
        return expected_version

    # -- data paths -----------------------------------------------------------

    def _stage_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable uniquely-named parquet under the table
        root; return the new file names (relative). Files are invisible
        to every reader until a commit references them."""
        stage = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(stage)
        out = []
        for f in os.listdir(stage):
            if not f.endswith(".parquet"):
                continue
            new = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(stage, f), os.path.join(self.path, new))
            out.append(new)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        return out

    def create(self, df: DataFrame) -> int:
        os.makedirs(self.path, exist_ok=True)
        if self.exists():
            raise ValueError(f"transaction log already exists at {self.log_path}")
        adds = [{"add": f} for f in self._stage_files(df)]
        return self._commit(0, adds, df.schema.json())

    def append(self, df: DataFrame) -> int:
        base = self.latest_version()
        adds = [{"add": f} for f in self._stage_files(df)]
        return self._commit(base + 1, adds, df.schema.json())

    def overwrite(self, df: DataFrame) -> int:
        base_snap = self.snapshot()
        adds = [{"add": f} for f in self._stage_files(df)]
        removes = [{"remove": f} for f in base_snap.files]
        return self._commit(base_snap.version + 1, adds + removes, df.schema.json())

    def overwrite_from(self, base_version: int, df: DataFrame) -> int:
        """Overwrite pinned to the snapshot the caller COMPUTED from.

        A read-compute-commit writer (merge, delete+insert) must not
        land on top of a version it never saw — plain ``overwrite``
        resolves "latest" at commit time and would silently erase a
        commit that interleaved between the caller's read and its write
        (lost update). Committing ``base_version + 1`` makes any
        interleaving a :class:`CommitConflict`: the caller re-reads,
        recomputes, retries — the Delta-paper optimistic-concurrency
        loop."""
        base_snap = self.snapshot(base_version)
        adds = [{"add": f} for f in self._stage_files(df)]
        removes = [{"remove": f} for f in base_snap.files]
        return self._commit(base_version + 1, adds + removes, df.schema.json())

    def delete_where(self, condition: str) -> int:
        """Copy-on-write delete: keep rows NOT matching ``condition``.
        File-granular — untouched files are carried over, only the
        survivor set is rewritten (coarse but correct; deletion vectors
        are the finer-grained extension)."""
        snap = self.snapshot()
        # SQL DELETE semantics: only rows where the condition is TRUE go;
        # NULL-condition rows stay (bare NOT(cond) would drop them)
        keep = self.read().filter(f"NOT coalesce(({condition}), false)")
        adds = [{"add": f} for f in self._stage_files(keep)]
        removes = [{"remove": f} for f in snap.files]
        return self._commit(snap.version + 1, adds + removes, keep.schema.json())

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: exactly the files the log names — a file
        appearing mid-read (concurrent commit) is invisible, so readers
        get snapshot isolation for free from file immutability."""
        snap = self.snapshot(version)
        if not snap.files:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(snap.schema_json))
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f) for f in snap.files]
        return self.spark.read.parquet(*paths)

    def history(self) -> list[dict[str, Any]]:
        out = []
        for v in self._versions():
            with open(self._entry_path(v)) as fh:
                e = json.load(fh)
            out.append(
                {
                    "version": v,
                    "n_add": sum(1 for a in e["actions"] if "add" in a),
                    "n_remove": sum(1 for a in e["actions"] if "remove" in a),
                    "committed_at": e.get("committed_at"),
                }
            )
        return out

    def vacuum(
        self, retain_versions: int = 1, retention_seconds: float = 3600.0
    ) -> list[str]:
        """Delete data files referenced by NO snapshot newer than
        (latest - retain_versions). Old log entries stay (history is
        cheap); old files go (bytes are not).

        ``retention_seconds`` is the Delta-style age guard: a file is
        only eligible if its mtime is older than the horizon. Staged
        files land in the table root BEFORE their commit's log rename,
        so an unguarded vacuum racing an in-flight writer would delete
        files the imminent commit references; the age guard makes that
        window (seconds) and the guard (an hour) non-overlapping."""
        latest = self.latest_version()
        horizon = max(0, latest - retain_versions + 1)
        live: set[str] = set()
        for v in range(horizon, latest + 1):
            if v in self._versions():
                live.update(self.snapshot(v).files)
        removed = []
        now = time.time()
        for f in os.listdir(self.path):
            if not f.endswith(".parquet") or f in live:
                continue
            full = os.path.join(self.path, f)
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # already gone (concurrent vacuum)
            if age < retention_seconds:
                continue
            os.unlink(full)
            removed.append(f)
        return removed

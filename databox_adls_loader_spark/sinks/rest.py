"""K3-K7: tolerant parallel REST-style sinks as foreachPartition writers.

Reference semantics being preserved (SURVEY §2.8):
  * per-row PATCH/PUT against ADLS/Blob endpoints
    (copy-acls.py:22-68, copy-to-adls.py:19-46, identity-mapper.py:9-35)
  * tolerant error channel: failures are logged and skipped, PathNotFound
    silently (copy-acls.py:53-57,66-67); at-most-once + idempotent rerun
    (the dead `require_retry` flag, copy-acls.py:47,62)
  * per-process auth singleton with expiry-checked refresh
    (adls_copy_utils.py:147-178)

Spark-first design: the reference's 10-thread WorkQueue becomes partition
parallelism — `foreachPartition` gives one connection/auth context per
task, rows stream through without driver involvement, and Spark task retry
supplies the fault tolerance (which is why the sink must stay idempotent,
exactly as the reference's reruns are).  Failures go to a JSON-lines side
channel ("effects log") instead of being swallowed, so a rerun can
anti-join against successes.

The transport is injected (``sender``) so tests swap a filesystem-backed
fake for Azure — the engine logic (batching, tolerance, idempotence,
auth lifecycle) is what's under test, not HTTP.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class SinkResult:
    ok: int = 0
    skipped_not_found: int = 0
    failed: int = 0
    errors: list[dict] = field(default_factory=list)


class PathNotFound(Exception):
    """Target path missing — silently skipped (F8, copy-acls.py:53-57)."""


def _write_effects(effects_dir: str | None, records: list[dict]) -> None:
    """Append-free effects log: one NEW uniquely-named file per partition
    attempt (uuid + partition/attempt ids from TaskContext).  id()-based
    names get recycled by CPython and append mode would mix a retried
    attempt's records into its predecessor's file — a rerun anti-joining
    the log would then see phantom successes."""
    if not effects_dir or not records:
        return
    import uuid

    from pyspark import TaskContext
    tc = TaskContext.get()
    pid = tc.partitionId() if tc else -1
    att = tc.attemptNumber() if tc else 0
    os.makedirs(effects_dir, exist_ok=True)
    fname = os.path.join(
        effects_dir, f"part-{pid:05d}-a{att}-{uuid.uuid4().hex[:12]}.jsonl")
    with open(fname, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


class TokenProvider:
    """Per-executor auth singleton with expiry refresh — the Spark analog
    of OAuthBearerToken's double-checked caching
    (adls_copy_utils.py:147-178).  One instance per Python worker."""

    _instance: "TokenProvider | None" = None

    def __init__(self, ttl_s: float = 3600.0):
        self.ttl_s = ttl_s
        self._token: str | None = None
        self._expiry = 0.0
        self.refreshes = 0

    @classmethod
    def get(cls) -> "TokenProvider":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def token(self) -> str:
        now = time.monotonic()
        if self._token is None or now >= self._expiry:
            self.refreshes += 1
            self._token = f"tok-{os.getpid()}-{self.refreshes}"
            self._expiry = now + self.ttl_s
        return self._token


def apply_acl_sink(remapped: DataFrame,
                   sender: Callable[[dict], None],
                   effects_dir: str | None = None) -> None:
    """K5: per-path setAccessControl over the remapped ACL DataFrame.

    ``sender`` receives {path, acl, owner, group, token} and raises
    PathNotFound / Exception; tolerance semantics match K7.  Effects and
    errors are appended to per-partition JSON-lines files under
    ``effects_dir`` (the side channel a rerun anti-joins against).
    """
    cols = remapped.select("file", "acl", "owner", "group")

    def run(rows: Iterator) -> None:
        tp = TokenProvider.get()
        res = SinkResult()
        records = []
        for row in rows:
            req = {
                "path": row["file"] if row["file"] else "/",
                "acl": ",".join(row["acl"] or []),
                "owner": row["owner"],
                "group": row["group"],
                "token": tp.token(),
            }
            try:
                sender(req)
                res.ok += 1
                records.append({"path": req["path"], "status": "ok"})
            except PathNotFound:
                res.skipped_not_found += 1
                records.append({"path": req["path"], "status": "not_found"})
            except Exception as e:  # noqa: BLE001 — tolerant sink (K7)
                res.failed += 1
                records.append({"path": req["path"], "status": "error",
                                "error": str(e)[:500],
                                "owner": req["owner"], "group": req["group"],
                                "acl": req["acl"]})
        _write_effects(effects_dir, records)

    cols.foreachPartition(run)


def copy_files_sink(inventory: DataFrame,
                    copier: Callable[[str, int], None],
                    parallelism: int | None = None,
                    effects_dir: str | None = None) -> None:
    """K4: distribute the *file list*, not the bytes — each task streams
    its files through the storage connector (the reference's 20 MiB
    GET→append chunk loop collapses into the connector's own streaming,
    copy-to-adls.py:63-91 ↔ SURVEY K4).

    ``copier(path, length)`` performs one file copy (Hadoop
    FileSystem.open/create in production; a fake in tests).  Failures land
    in the effects log (K7) — a systematic outage must not let the job
    "succeed" with zero copies and no record of the loss."""
    files = inventory.filter(~inventory["is_folder"]).select("name", "length")
    if parallelism:
        files = files.repartition(parallelism)

    def run(rows: Iterator) -> None:
        records = []
        for row in rows:
            try:
                copier(row["name"], row["length"] or 0)
            except Exception as e:  # noqa: BLE001 — tolerant (K7), logged
                records.append({"path": row["name"], "status": "error",
                                "error": str(e)[:500]})
        _write_effects(effects_dir, records)

    files.foreachPartition(run)


def create_directories_ordered(inventory: DataFrame,
                               creator: Callable[[str], None]) -> int:
    """K3 (directory pass): parents strictly before children.

    The reference relies on listing order implicitly (copy-to-adls.py:
    117-126); here the ordering contract is explicit and DISTRIBUTED:
    one Spark job per path-depth level, shallowest first.  Within a level
    no directory can be another's parent, so the creates fan out across
    partitions; the job barrier between levels is the parent-before-child
    guarantee.  Only the per-depth counts ever reach the driver (one row
    per level — O(tree height), not O(directories)), so the sink survives
    10⁸-directory inventories where a full driver-side collect+sort
    would not.  Returns the number of directories created.

    Executor-side contract (differs from the reference's sequential
    driver loop): ``creator`` runs on executor Python workers via
    ``foreachPartition``, so it must be PICKLABLE and IDEMPOTENT
    (mkdir-if-absent semantics; Spark task retries re-invoke it), should
    open its own connection per partition (driver-side sessions/counters
    don't travel), and creates WITHIN a level run concurrently in no
    deterministic order — only the level-by-level parent-before-child
    ordering is guaranteed."""
    from pyspark.sql import functions as F

    dirs = (
        inventory.filter(inventory["is_folder"])
        .select("name",
                (F.size(F.split(F.col("name"), "/")) - 1).alias("__depth"))
        .persist()
    )
    try:
        level_counts = {r["__depth"]: r["cnt"] for r in
                        dirs.groupBy("__depth")
                        .agg(F.count(F.lit(1)).alias("cnt")).collect()}

        def run(rows: Iterator) -> None:
            for row in rows:
                creator(row["name"])

        for depth in sorted(level_counts):
            (dirs.filter(F.col("__depth") == depth)
             .select("name")
             .foreachPartition(run))
        return sum(level_counts.values())
    finally:
        # consumption finished inside this function — safe to release
        dirs.unpersist()


def update_metadata_sink(inv_remapped: DataFrame,
                         sender: Callable[[dict], None],
                         effects_dir: str | None = None) -> None:
    """K6: per-blob metadata PUT with remapped permissions re-embedded
    (P5) and keys prefixed x-ms-meta- (identity-mapper.py:17-35).
    Reserved keys come from schemas.py so the P1 strip and this re-embed
    can never drift apart."""
    from pyspark.sql.functions import to_json

    from ..schemas import HDI_ISFOLDER_KEY, HDI_PERMISSION_KEY

    rows_df = inv_remapped.select(
        "name",
        to_json("permissions").alias("perm_json"),
        "is_folder",
        "metadata",
    )

    def run(rows: Iterator) -> None:
        tp = TokenProvider.get()
        records = []
        for row in rows:
            meta = dict(row["metadata"] or {})
            meta[HDI_PERMISSION_KEY] = row["perm_json"]     # P5 re-embed
            if row["is_folder"]:
                meta[HDI_ISFOLDER_KEY] = "true"             # P5 re-add flag
            headers = {f"x-ms-meta-{k}": v for k, v in meta.items()}
            headers["Authorization"] = tp.token()
            try:
                sender({"path": row["name"], "headers": headers})
            except Exception as e:  # noqa: BLE001 — tolerant (K7), logged
                records.append({"path": row["name"], "status": "error",
                                "error": str(e)[:500]})
        _write_effects(effects_dir, records)

    rows_df.foreachPartition(run)

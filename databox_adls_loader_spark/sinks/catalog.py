"""Multi-table transactional catalog over versioned tables.

A catalog is its own tiny manifest log (the same exclusive-create +
pointer-hint machinery `sinks/versioned` uses for one table) whose
entries map table NAME -> (path, pinned version).  One catalog commit
pins the versions of EVERY table it names, so a transaction spanning
tables — fact + its materialized view, corpus + its ANN index, packed
shards + their manifest — becomes atomic for every reader who resolves
tables THROUGH the catalog:

  * per-table commits land first through the existing table logs
    (producing versions that exist but are INVISIBLE to catalog
    readers — exactly like a staged-but-unpublished Iceberg snapshot),
  * then ONE catalog manifest is exclusive-created pinning all the new
    versions together.

A crash between the two phases leaves the table logs ahead of the
catalog: catalog readers keep seeing the old, mutually-consistent pair
(`catalog_status` surfaces the drift; the next successful transaction
simply pins past it).  Readers never observe fact-new with view-old.

This is the Nessie / Unity / Iceberg-REST-catalog idea re-expressed on
the engine's own storage seam — no service, just one more conditional
put.  Concurrency follows the table rules: catalog commits
exclusive-create their version file; a loser whose transaction touched
DISJOINT table names rebases over the winner and retries, an
overlapping writer gets `ConcurrentCommitError` (the caller must re-run
its table ops against the new state).  Transactions may carry a
``txn_id`` (recorded on the transaction's own manifest; the replay
check scans the retained manifests) so a crash-replayed driver re-runs
as a no-op instead of double-applying — replay protection spans the
retained-catalog horizon, the analogue of the table ledger's
vacuum-window contract.

Reference boundary: the reference's multi-step jobs (copy THEN acl
apply, `adls_copy_utils.py`) leave the destination observable between
steps; the catalog is the engine's answer — publish related state in
one atomic step.

Scale notes (100 TB): a catalog commit writes one small JSON whatever
the table sizes; resolution is one read of one manifest.  Table-level
`vacuum` must not reclaim versions an older catalog snapshot still
pins — `vacuum_table` computes the pinned set across retained catalog
versions and passes it through `versioned.vacuum(pin_versions=...)`.
"""

from __future__ import annotations

import datetime
import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import versioned as V
from .storage import storage_for
from .versioned import ConcurrentCommitError


def _cmdir(st, cat_dir: str) -> str:
    return st.join(cat_dir, "_catalog")


def _cpath(st, cat_dir: str, version: int) -> str:
    return st.join(_cmdir(st, cat_dir), f"v{version:05d}.json")


def catalog_versions(cat_dir: str) -> list[int]:
    """All retained catalog versions, ascending (manifest set is the
    authority, same as the table log)."""
    st = storage_for(cat_dir)
    return sorted(
        int(st.basename(p)[1:-5])
        for p in st.list_glob(st.join(_cmdir(st, cat_dir), "v*.json")))


def catalog_latest(cat_dir: str) -> int | None:
    vs = catalog_versions(cat_dir)
    return vs[-1] if vs else None


def _read_cat_doc(cat_dir: str, version: int) -> dict:
    st = storage_for(cat_dir)
    try:
        return json.loads(st.read_text(_cpath(st, cat_dir, version)))
    except FileNotFoundError:
        retained = catalog_versions(cat_dir)
        raise KeyError(
            f"catalog version {version} is not retained in {cat_dir!r} "
            f"(retained: {retained}) — it was never committed or "
            "`vacuum_catalog` dropped it") from None


def catalog_tables(cat_dir: str, version: int | None = None
                   ) -> dict[str, dict]:
    """name -> {"path": table_dir, "version": pinned table version} at a
    catalog snapshot (default latest).  The returned pair set is
    guaranteed mutually consistent: it was pinned by one commit."""
    if version is None:
        version = catalog_latest(cat_dir)
    if version is None:
        return {}
    return dict(_read_cat_doc(cat_dir, version)["tables"])


def _ledger_path(st, cat_dir: str) -> str:
    return st.join(_cmdir(st, cat_dir), "_txns.json")


def _ledger_gen_path(st, cat_dir: str, gen: int,
                     uid: str | None = None) -> str:
    name = (f"_txns-g{gen:05d}.json" if uid is None
            else f"_txns-g{gen:05d}-{uid}.json")
    return st.join(_cmdir(st, cat_dir), name)


def _ledger_gen_of(st, path: str) -> int:
    """Generation number of a ledger file — `_txns-gNNNNN.json`
    (pre-round-13 form) or `_txns-gNNNNN-<uid>.json`."""
    stem = st.basename(path)[7:-5]          # NNNNN or NNNNN-<uid>
    return int(stem.split("-", 1)[0])


def _ledger_files(st, cat_dir: str) -> list[str]:
    return sorted(st.list_glob(st.join(_cmdir(st, cat_dir),
                                       "_txns-g*.json")))


def _ledger_gens(st, cat_dir: str) -> list[int]:
    return sorted(_ledger_gen_of(st, p)
                  for p in _ledger_files(st, cat_dir))


def _ledger_txn_ids(cat_dir: str) -> set[str]:
    """txn_ids persisted in the compact side ledger — written by
    `vacuum_catalog` BEFORE it drops a manifest, so dropping a manifest
    never forgets its transaction.  The ledger is a set of UNIQUELY
    NAMED generation files (`_txns-gNNNNN-<uid>.json`): each writer
    folds every file it can read into one new file and deletes exactly
    those source files, so every id is always present in at least one
    retained file (see `_ledger_append` for the invariant argument).
    Reading unions all retained files; a file deleted mid-read by a
    concurrent writer's fold implies a NEWER file carrying its union
    exists — re-list and retry.  The legacy single-file `_txns.json`
    and the pre-round-13 `_txns-gNNNNN.json` form are still read for
    catalogs written before the unique-name scheme."""
    st = storage_for(cat_dir)
    legacy: set[str] = set()
    try:
        legacy = set(json.loads(st.read_text(_ledger_path(st, cat_dir)))
                     .get("txn_ids", []))
    except FileNotFoundError:
        pass
    for _ in range(64):
        ids = set(legacy)
        try:
            for p in _ledger_files(st, cat_dir):
                ids |= set(json.loads(st.read_text(p))
                           .get("txn_ids", []))
            return ids
        except FileNotFoundError:
            continue
    raise RuntimeError(
        f"catalog txn ledger in {cat_dir!r} kept changing under 64 "
        "read attempts — runaway concurrent vacuum?")


def _ledger_append(cat_dir: str, new_ids: set[str]) -> None:
    """Durably add ``new_ids`` to the side ledger, safe under ANY
    interleaving of concurrent appenders: list the retained generation
    files, fold their union (plus the legacy single file) together
    with ``new_ids`` into ONE new file under a name no other writer
    can ever have listed (next generation number + a fresh uid —
    `create_exclusive` cannot collide), then delete EXACTLY the files
    that were read.

    Why no id can be lost: a writer only deletes files it read and
    folded into its own new file, and file names are never reused — so
    a file created concurrently (which a stale writer never listed)
    cannot be deleted by it.  Every id therefore stays present in at
    least one retained file at all times; readers union the retained
    set.  The earlier numbered-slot scheme (exclusive-create
    `_txns-gN.json`, retry on collision, GC by number) lost this under
    contention: generation NUMBERS were reused after GC, so a writer
    holding a stale listing could delete a slot that had been
    re-created with ids it never unioned (caught by the round-13
    thread-pool torture test).  Generation numbers remain for
    ordering/debugging only; correctness rides on name uniqueness.

    The loop retries only the read phase (a source file deleted
    mid-read by a concurrent fold); the create itself cannot fail."""
    import uuid

    st = storage_for(cat_dir)
    legacy: set[str] = set()
    try:
        legacy = set(json.loads(st.read_text(_ledger_path(st, cat_dir)))
                     .get("txn_ids", []))
    except FileNotFoundError:
        pass
    for _ in range(64):
        files = _ledger_files(st, cat_dir)
        ids = set(legacy)
        try:
            for p in files:
                ids |= set(json.loads(st.read_text(p))
                           .get("txn_ids", []))
        except FileNotFoundError:
            continue                    # concurrent fold GC'd a source
        gen = max((_ledger_gen_of(st, p) for p in files), default=0) + 1
        st.create_exclusive(
            _ledger_gen_path(st, cat_dir, gen, uuid.uuid4().hex[:12]),
            json.dumps({"txn_ids": sorted(ids | new_ids)}))
        for p in files:
            st.delete(p)
        return
    raise RuntimeError(
        f"catalog txn ledger in {cat_dir!r} kept changing under 64 "
        "read attempts — runaway concurrent vacuum?")


def catalog_txn_ids(cat_dir: str) -> set[str]:
    """The transaction ledger: every txn_id carried by a RETAINED
    catalog manifest, UNION the compact side ledger (the
    `_txns-g*.json` generation chain; legacy `_txns.json`).  Each
    manifest records only its OWN txn_id — cumulative inheritance would
    make a per-micro-batch streaming publisher's manifests grow O(total
    batches ever) — and `vacuum_catalog` persists the txn_ids of every
    manifest it drops into the side ledger first, so replay protection
    survives manifest reclaim: a crash-replayed `commit_txn` stays a
    no-op however aggressively the catalog was vacuumed."""
    ids = {tid for tid in
           (_read_cat_doc(cat_dir, v).get("txn_id")
            for v in catalog_versions(cat_dir))
           if tid is not None}
    return ids | _ledger_txn_ids(cat_dir)


def catalog_history(cat_dir: str) -> list[dict]:
    """Per-catalog-version audit: which tables each commit (re)pinned."""
    out = []
    prev: dict[str, dict] = {}
    for v in catalog_versions(cat_dir):
        doc = _read_cat_doc(cat_dir, v)
        tabs = doc["tables"]
        changed = sorted(n for n in tabs
                         if prev.get(n) != tabs[n])
        out.append({"version": v,
                    "committed_at": doc.get("committed_at"),
                    "txn_id": doc.get("txn_id"),
                    "tables": {n: tabs[n]["version"] for n in sorted(tabs)},
                    "changed": changed})
        prev = tabs
    return out


def _resolve_op(name: str, spec) -> dict:
    """One transaction entry -> its pinned {"path", "version"}.

    spec is ``(table_dir, op)`` with op one of
      * None          — pin the table's CURRENT latest version,
      * int           — pin that explicit retained version,
      * callable()    — run the table mutation(s); it returns the new
                        table version (or None, meaning "pin whatever
                        latest is now" — e.g. a refresh that was
                        already current)."""
    table_dir, op = spec
    if callable(op):
        v = op()
        if v is None:
            v = V.latest_version(table_dir)
    elif op is None:
        v = V.latest_version(table_dir)
    else:
        v = int(op)
    if v is None:
        raise ValueError(
            f"catalog txn: table {name!r} at {table_dir!r} has no "
            "versions to pin")
    if v not in V.versions(table_dir):
        raise ValueError(
            f"catalog txn: version {v} of {name!r} is not retained "
            f"in {table_dir!r}")
    return {"path": table_dir, "version": int(v)}


def commit_txn(cat_dir: str,
               ops: dict[str, tuple[str, int | None | Callable[[], int | None]]],
               txn_id: str | None = None,
               retries: int = 20) -> int | None:
    """Atomically (re)pin every table in ``ops`` in ONE catalog commit.

    Phase 1 runs each op (table-level commits land through the normal
    table logs — visible to direct-path readers, INVISIBLE through the
    catalog); phase 2 exclusive-creates the next catalog manifest
    carrying the new pins plus every other table's pin unchanged.

    ``txn_id``: idempotence ledger — when a retained catalog manifest
    already records it, the whole call is a replay and returns None
    WITHOUT running any op (the crash-replay contract; same shape as
    the streaming batch-id ledger).

    Losing the manifest race to a transaction over DISJOINT table
    names rebases over the winner's pins and retries; an OVERLAPPING
    winner raises `ConcurrentCommitError` — the caller's table ops were
    derived from a state that no longer holds, so they must be re-run,
    not re-pinned.

    Returns the new catalog version."""
    if txn_id is not None and txn_id in catalog_txn_ids(cat_dir):
        return None
    # the state this transaction's ops are ABOUT to be derived from —
    # any later commit that re-pins one of OUR tables relative to this
    # snapshot is a lost-update hazard, whether it lands during phase 1
    # or in the manifest race, and must raise rather than be silently
    # overwritten
    base_v0 = catalog_latest(cat_dir)
    base0 = {} if base_v0 is None else catalog_tables(cat_dir, base_v0)
    updated = {name: _resolve_op(name, spec)
               for name, spec in ops.items()}
    st = storage_for(cat_dir)
    st.mkdirs(_cmdir(st, cat_dir))
    for _ in range(retries):
        cur = catalog_latest(cat_dir)
        base = {} if cur is None else catalog_tables(cat_dir, cur)
        if txn_id is not None and txn_id in catalog_txn_ids(cat_dir):
            return None                          # landed under our feet
        clash_set = {n for n in updated if base.get(n) != base0.get(n)}
        # ABA guard: entry equality alone misses a concurrent txn that
        # re-pinned one of OUR tables followed by another that pinned it
        # back to the identical {path, version} — walk the INTERVENING
        # commits' changed sets instead, so any commit in (base_v0, cur]
        # touching one of this txn's tables raises, whatever the final
        # entry looks like.  (A manifest vacuumed out of the window
        # mid-walk degrades to the entry check already taken above.)
        prev = base0
        for v in catalog_versions(cat_dir):
            if (base_v0 is not None and v <= base_v0) \
                    or (cur is None or v > cur):
                continue
            try:
                tabs = _read_cat_doc(cat_dir, v)["tables"]
            except KeyError:
                continue
            clash_set |= {n for n in updated if prev.get(n) != tabs.get(n)}
            prev = tabs
        clash = sorted(clash_set)
        if clash:
            raise ConcurrentCommitError(
                f"catalog txn lost the race on table(s) {clash} in "
                f"{cat_dir!r}; re-run the transaction against the "
                "new state")
        doc = {"version": 0 if cur is None else cur + 1,
               "committed_at": datetime.datetime.now(
                   datetime.timezone.utc).isoformat(),
               "tables": {n: {**base, **updated}[n]
                          for n in sorted({**base, **updated})}}
        if txn_id is not None:
            doc["txn_id"] = txn_id
        try:
            st.create_exclusive(_cpath(st, cat_dir, doc["version"]),
                                json.dumps(doc, indent=1))
        except FileExistsError:
            continue                             # disjoint: rebase+retry
        st.replace_text(st.join(_cmdir(st, cat_dir), "_latest.json"),
                        json.dumps({"version": doc["version"]}))
        return doc["version"]
    raise ConcurrentCommitError(
        f"catalog txn in {cat_dir!r} kept losing the manifest race "
        f"after {retries} rebases")


def read_table(spark: SparkSession, cat_dir: str, name: str,
               catalog_version: int | None = None,
               **read_kwargs) -> DataFrame:
    """Read a table AT ITS PINNED VERSION through the catalog (default:
    latest catalog snapshot) — the only resolution path with cross-table
    consistency.  Extra kwargs pass through to `versioned.read_version`
    (predicates/data skipping etc.)."""
    tabs = catalog_tables(cat_dir, catalog_version)
    if name not in tabs:
        raise KeyError(
            f"table {name!r} not in catalog {cat_dir!r} at version "
            f"{catalog_version if catalog_version is not None else 'latest'}")
    ent = tabs[name]
    return V.read_version(spark, ent["path"], ent["version"],
                          **read_kwargs)


def catalog_status(cat_dir: str) -> list[dict]:
    """Per-table drift report: pinned catalog version vs the table
    log's latest.  ``drift > 0`` means table commits landed that no
    catalog transaction has published yet — the normal signature of a
    crash between phase 1 and phase 2 (or of a direct-path writer)."""
    out = []
    for name, ent in sorted(catalog_tables(cat_dir).items()):
        latest = V.latest_version(ent["path"])
        out.append({"name": name, "path": ent["path"],
                    "pinned": ent["version"], "latest": latest,
                    "drift": (0 if latest is None
                              else latest - ent["version"])})
    return out


def pinned_versions(cat_dir: str, name: str) -> set[int]:
    """Every version of ``name`` pinned by ANY retained catalog
    version — the set a table-level vacuum must keep for catalog time
    travel to stay sound."""
    pins = set()
    for v in catalog_versions(cat_dir):
        ent = _read_cat_doc(cat_dir, v)["tables"].get(name)
        if ent is not None:
            pins.add(int(ent["version"]))
    return pins


def vacuum_table(cat_dir: str, name: str, **vacuum_kwargs) -> int:
    """Catalog-aware storage reclaim: `versioned.vacuum` on the named
    table with every catalog-pinned version exempt from the retention
    window.  Shrink the pinned set first by vacuuming the CATALOG
    (`vacuum_catalog`) if old cross-table snapshots are no longer
    needed."""
    ent = catalog_tables(cat_dir).get(name)
    if ent is None:
        raise KeyError(f"table {name!r} not in catalog {cat_dir!r}")
    return V.vacuum(ent["path"],
                    pin_versions=pinned_versions(cat_dir, name),
                    **vacuum_kwargs)


def publish_stream_batch(batch_df: DataFrame, batch_id: int,
                         cat_dir: str, name: str, table_dir: str,
                         mode: str = "append") -> int | None:
    """EXACTLY-ONCE streaming publish THROUGH the catalog — the
    foreachBatch body that makes each micro-batch atomic for catalog
    readers:

        .writeStream.foreachBatch(
            lambda df, bid: catalog.publish_stream_batch(
                df, bid, cat, "events", table_dir))

    Phase 1 commits the batch to the TABLE under the streaming batch-id
    ledger (`versioned.commit_stream_batch` — a replayed batch is a
    table no-op); phase 2 pins the table's new version in the catalog
    under txn id ``stream:{name}:{batch_id}``.  Crash anywhere and the
    rerun completes exactly the missing phase: table landed + catalog
    missed -> the pin commits (the drift window closes); both landed ->
    full no-op.  Readers THROUGH the catalog see each micro-batch in
    its entirety or not at all — `versioned`'s exactly-once contract
    lifted from table contents to published state.

    Returns the new catalog version (None: complete replay)."""
    from .versioned import commit_stream_batch

    commit_stream_batch(batch_df, batch_id, table_dir, mode=mode)
    return commit_txn(cat_dir, {name: (table_dir, None)},
                      txn_id=f"stream:{name}:{int(batch_id)}")


def vacuum_catalog(cat_dir: str, keep_versions: int = 2) -> int:
    """Drop old catalog manifests (old cross-table snapshots), keeping
    the newest ``keep_versions``.  The LATEST catalog version is always
    retained regardless (same guard as `versioned.vacuum` — a catalog
    with no manifest is bricked).  Before anything is deleted, the
    to-be-dropped manifests' txn_ids are persisted into the compact
    side ledger (`_txns.json`), so replay protection is NOT bounded by
    manifest retention: a crash-replayed `commit_txn` whose manifest
    was vacuumed still no-ops instead of double-applying its phase-1
    table mutations.  (Crash between the ledger write and a delete
    leaves an id in both places — a harmless set union.)  Table DATA is
    untouched — run `vacuum_table` afterwards to reclaim table versions
    the shrunken pin set no longer protects.  Returns manifests
    dropped.

    Concurrency: the ledger write goes through `_ledger_append` (an
    exclusive-create generation chain), so two vacuums racing each
    other cannot last-writer-wins away the other's txn_ids; a manifest
    the OTHER vacuum already deleted between our listing and our read
    is skipped — the deleter persisted its txn_id before deleting, so
    the id is already in the ledger generation we union with."""
    st = storage_for(cat_dir)
    vs = catalog_versions(cat_dir)
    drop = vs[:-max(1, keep_versions)]
    dropped_ids = set()
    for v in drop:
        try:
            tid = _read_cat_doc(cat_dir, v).get("txn_id")
        except KeyError:
            continue                       # concurrent vacuum got there
        if tid is not None:
            dropped_ids.add(tid)
    if dropped_ids:
        _ledger_append(cat_dir, dropped_ids)
    n = 0
    for v in drop:
        n += bool(st.delete(_cpath(st, cat_dir, v)))
    return n

"""CDC apply: land a change-data-capture feed (Debezium-ish rows:
key, payload columns, an op code, an optional sequence column) onto a
versioned table — upserts as a scoped MERGE, deletes as EQUALITY
tombstones (`versioned.delete_where_keys`, O(keys) commits), with
exactly-once replay protection through the table's stream-batch ledger.

This is the streaming half of the equality-delete design: a CDC
micro-batch containing deletes costs metadata (one key file + one
manifest commit), never a table scan, and compaction materializes the
tombstones asynchronously.  Pair with Structured Streaming's
``foreachBatch``:

    q = (changes.writeStream
         .foreachBatch(lambda df, bid: apply_cdc_batch(
             df, table_dir, key="id", batch_id=bid))
         .option("checkpointLocation", ck).start())

Reference parity note: the reference applies changes in place with no
replay protection (copy-acls.py); the ledger + tombstone discipline is
what a restartable 100 TB CDC pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import versioned as V

#: Debezium-compatible op codes treated as upserts (create / update /
#: snapshot-read) vs deletes.
UPSERT_OPS = ("c", "i", "u", "r")
DELETE_OPS = ("d",)


def collapse_changes(batch_df: DataFrame, key: str, op_col: str = "op",
                     seq_col: str | None = None) -> DataFrame:
    """Latest change per key within one CDC batch.  With ``seq_col``
    the winner is the max sequence; an exact-tie between a delete and
    an upsert resolves to the DELETE (the conservative reading of a
    same-instant upsert+delete), and a tie between two UPSERTS
    resolves by a hash of the full row — an arbitrary but STABLE
    winner, so replaying the identical batch always applies the same
    image (without the tiebreak, row_number over an incomplete sort is
    partition-order-dependent and a replay could flip the table's
    contents).
    Without ``seq_col`` the batch must already be unique per key
    (enforced; anything else would pick an arbitrary winner and
    silently corrupt the table).  One shuffle on the key;
    WindowGroupLimit keeps only the per-key head of each sort."""
    from pyspark.sql.window import Window

    if seq_col is not None:
        is_del = F.lower(F.col(op_col)).isin(*DELETE_OPS).cast("int")
        tie = F.xxhash64(F.struct(*[F.col(c)
                                    for c in batch_df.columns]))
        w = (Window.partitionBy(key)
             .orderBy(F.desc(seq_col), F.desc(is_del), F.desc(tie)))
        return (batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))
    dup = (batch_df.groupBy(key).count()
           .filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise ValueError(
            "collapse_changes: batch has multiple changes for a key "
            "and no seq_col to order them — pass seq_col")
    return batch_df


def apply_cdc_batch(batch_df: DataFrame, table_dir: str, key: str,
                    op_col: str = "op", seq_col: str | None = None,
                    batch_id: int | None = None,
                    mode: str = "cow") -> dict:
    """Apply one CDC (micro-)batch to the versioned table at
    ``table_dir``: collapse to the latest change per key, then

      * DELETES land as an equality tombstone
        (`versioned.delete_where_keys` — no data scan, sequence
        semantics make a later re-insert of the key live again);
      * UPSERTS land per ``mode``:
        - ``"cow"`` (default): scoped MERGE
          (`versioned.merge_into_snapshot` — O(touched files) rewrite;
          read-optimized: the table stays overlay-free);
        - ``"mor"``: `versioned.upsert_mor` — one commit of an
          equality tombstone + appended images; NO file is read or
          rewritten, so a steady CDC feed stays on the change-feed
          stream's and incremental diff's fast paths (write-optimized;
          readers pay the anti-join overlay until compaction).

    After collapsing, the two key sets are disjoint, so the two
    commits are order-independent; deletes go first so a crash between
    them leaves the conservative state (row gone, update pending).

    EXACTLY-ONCE: with ``batch_id`` each phase records a phase-scoped
    ledger id (2·b for deletes, 2·b+1 for upserts) in the manifest
    ledger, so a foreachBatch replay after a crash re-runs ONLY the
    phase that did not commit.  The doubling means a table written
    through this function must not also receive raw
    `commit_stream_batch` appends from the same checkpoint's id space
    (one writer stream per table — the ledger's standing assumption).

    Returns ``{"n_deletes": k, "n_upserts": k, "versions": [...],
    "skipped": [...]}`` (key counts; skipped lists replayed phases).

    Scale: the collapse is one shuffle on the key; the delete commit is
    O(|tombstones|); the merge probe reads one column of the table and
    rewrites only files containing matched keys.  A steady CDC feed
    accumulates eq-delete entries — schedule `compact_snapshot` /
    `compact_small_files` to materialize them (readers pay one
    broadcast anti join per entry batch until then)."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be cow|mor, got {mode!r}")
    spark = batch_df.sparkSession
    latest = collapse_changes(batch_df, key, op_col, seq_col)
    op = F.lower(F.col(op_col))
    payload_cols = [c for c in latest.columns
                    if c not in (op_col, seq_col)]
    dels = latest.filter(op.isin(*DELETE_OPS)).select(key)
    ups = latest.filter(op.isin(*UPSERT_OPS)).select(*payload_cols)
    bad = latest.filter(~op.isin(*(DELETE_OPS + UPSERT_OPS)))
    if bad.limit(1).count():
        row = bad.select(op_col).first()
        raise ValueError(f"apply_cdc_batch: unknown op code "
                         f"{row[op_col]!r} (expected one of "
                         f"{DELETE_OPS + UPSERT_OPS})")
    done = V.committed_batch_ids(table_dir) if batch_id is not None \
        else set()
    del_id = None if batch_id is None else 2 * int(batch_id)
    up_id = None if batch_id is None else 2 * int(batch_id) + 1
    out: dict = {"n_deletes": 0, "n_upserts": 0, "versions": [],
                 "skipped": []}
    if del_id is not None and del_id in done:
        out["skipped"].append("deletes")
    elif V.latest_version(table_dir) is None:
        # first batch onto an empty table: nothing to tombstone (the
        # upsert phase creates it); deletes of never-inserted keys are
        # the empty set by definition
        pass
    else:
        n_del = dels.count()
        if n_del:
            v, n = V.delete_where_keys(
                spark, table_dir, key, dels,
                batch_ids=None if del_id is None else {del_id})
            out["n_deletes"] = n
            out["versions"].append(v)
    if up_id is not None and up_id in done:
        out["skipped"].append("upserts")
    else:
        n_up = ups.limit(1).count()
        if n_up:
            ids = None if up_id is None else {up_id}
            if V.latest_version(table_dir) is None:
                # bootstrap: the first upsert batch IS the table
                v = V.write_snapshot(ups, table_dir, batch_ids=ids)
            elif mode == "mor":
                v = V.upsert_mor(spark, table_dir, ups, key,
                                 batch_ids=ids)
            else:
                v = V.merge_into_snapshot(spark, table_dir, ups, key,
                                          batch_ids=ids)
            out["n_upserts"] = ups.count()
            out["versions"].append(v)
    return out

"""Streaming corpus ingest: the recurring-crawl front door of a
training-data pipeline — micro-batches of documents are exact-deduped
WITHIN the batch and AGAINST everything already ingested, then appended
to a manifest-versioned table exactly once.

Composition of tested pieces, no new primitives:
  * `operators/dedup.canonical_text` — the exact-dedup hash family;
  * `sinks/versioned.commit_stream_batch` — replay-safe appends (the
    batch-id ledger turns Structured Streaming's at-least-once replay
    into exactly-once table contents);
  * the table carries a persisted ``text_hash`` column declared as a
    Bloom column on the first commit, so the against-corpus probe reads
    ONE skinny column of the snapshot and, at scale, the per-file Bloom
    bitmaps answer most membership checks from the manifest alone — the
    dedup cost per batch is O(batch) + a column scan, never a re-hash
    of the corpus text.

Reference parity note: the reference ingests blindly (copy-to-adls.py
re-uploads whatever the filelist says); dedup-on-ingest is the
beyond-reference behavior a repeatedly-crawled 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import canonical_text
from ..sinks import versioned as V

HASH_COL = "text_hash"


def dedup_ingest_batch(batch_df: DataFrame, batch_id: int, table_dir: str,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> bool:
    """foreachBatch body: dedup ``batch_df`` within itself (min id per
    canonical-text hash wins) and against the current snapshot's
    ``text_hash`` column, then commit the survivors as an exactly-once
    append carrying the hash column (Bloom-indexed from the first
    commit on).  Returns commit_stream_batch's verdict (False =
    replay, nothing written — the dedup joins are lazy, so a replayed
    batch costs only the ledger lookup)."""
    h = F.coalesce(F.md5(canonical_text(text_col)), F.lit("__NULL_TEXT__"))
    batch = batch_df.withColumn(HASH_COL, h)
    firsts = batch.groupBy(HASH_COL).agg(F.min(id_col).alias("__first"))
    batch = (batch.join(firsts, HASH_COL)
             .filter(F.col(id_col) == F.col("__first")).drop("__first"))
    if V.latest_version(table_dir) is not None:
        corpus_hashes = (V.read_version(batch_df.sparkSession, table_dir)
                         .select(HASH_COL).distinct())
        batch = batch.join(corpus_hashes, HASH_COL, "left_anti")
    return V.commit_stream_batch(batch, batch_id, table_dir,
                                 bloom_cols=[HASH_COL])


def stream_dedup_ingest(stream_docs: DataFrame, table_dir: str,
                        checkpoint_dir: str, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Wire a document stream into the deduped versioned corpus.

    Use: ``stream_dedup_ingest(stream, tbl, ckpt).trigger(
    availableNow=True).start()``."""
    return (stream_docs.writeStream
            .foreachBatch(lambda df, bid: dedup_ingest_batch(
                df, bid, table_dir, text_col, id_col))
            .option("checkpointLocation", checkpoint_dir))

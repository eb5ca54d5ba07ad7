"""Streaming sketch maintenance: additive sketches merged into a
versioned table, exactly once.

The property that makes sketches the 100 TB streaming answer is
ADDITIVITY — count-min cells (`operators/profile.countmin_sketch`) sum,
so maintaining the all-time sketch is `merge(state, sketch(batch))`
with O(depth × width) state regardless of stream volume.  The merge is
read-modify-overwrite against a manifest-versioned table
(`sinks/versioned.py`): each micro-batch commits the NEW WHOLE STATE as
an overwrite snapshot carrying the batch id, so a crash-replayed batch
is skipped by the ledger and the table always holds exactly
`sketch(all delivered rows)` — the foreachBatch analog of what
`ivm_daily_event_rollup` proves for batch deltas.

Reference parity note: the reference has no streaming surface
(SURVEY §2.10); this composes the engine's own sketch, table, and
exactly-once primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_countmin_batch(batch_df: DataFrame, batch_id: int,
                         table_dir: str, key_col: str,
                         depth: int = 3, width: int = 64) -> bool:
    """foreachBatch body: fold one micro-batch into the running
    count-min table.  Returns False on a replayed (already-committed)
    batch.  Single-writer per table — a lost optimistic race on the
    overwrite would mean another maintainer is folding the same table,
    which the batch ledger does not arbitrate."""
    from ..operators.profile import countmin_sketch
    from ..sinks import versioned as V

    if batch_id in V.committed_batch_ids(table_dir):
        return False
    cells = countmin_sketch(batch_df, key_col, depth=depth, width=width)
    try:
        state = V.read_version(batch_df.sparkSession, table_dir)
        merged = (state.unionByName(cells)
                  .groupBy("row_i", "bucket")
                  .agg(F.sum("cnt").alias("cnt")))
    except FileNotFoundError:
        merged = cells
    return V.commit_stream_batch(merged, batch_id, table_dir,
                                 mode="overwrite")


def stream_countmin_to_table(stream_df: DataFrame, table_dir: str,
                             checkpoint_dir: str, key_col: str,
                             depth: int = 3, width: int = 64):
    """Wire a stream to the count-min maintainer.  Start with
    ``.trigger(availableNow=True).start()`` for catch-up runs or leave
    the default trigger for continuous maintenance."""
    return (stream_df.writeStream
            .foreachBatch(lambda df, bid: merge_countmin_batch(
                df, bid, table_dir, key_col, depth, width))
            .option("checkpointLocation", checkpoint_dir))

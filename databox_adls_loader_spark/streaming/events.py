"""Structured-Streaming pipelines: the incremental-migration analog.

The reference re-lists everything per run (SURVEY §1.4) — its restartable
WorkQueue (adls_copy_utils.py:106-145) is the closest thing to streaming.
Here the incremental variant is real: a file-source stream of event rows →
watermarked tumbling-window aggregates → append sink, plus a stateful
per-user session operator via applyInPandasWithState.

The batch query `w1_tumbling_window_counts` (plans/queries.py) uses the
same window expression, so the streaming result is oracle-checked
transitively: batch == oracle, stream(complete input) == batch (asserted
in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over JSON event files (the incremental pickup
    the reference lacks — new files are discovered per micro-batch)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the watermark
    are dropped; state for closed windows is evicted (bounded memory at
    100 TB/day event volumes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "total_value")
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         mode: str = "append") -> "object":
    """Drive a streaming DataFrame into an in-memory table (test sink)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name).outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


SESSION_STATE_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def per_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    running per-user event counts/value totals across micro-batches —
    the kind of operator Structured Streaming lacks built-in (SURVEY
    §2.10's extension point)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: "GroupState"):
        import pandas as pd
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=StructType([
                StructField("n", LongType()),
                StructField("total", DoubleType()),
            ]),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts — each event lands in window/slide overlapping
    windows; same watermark-bounded state story as the tumbling form."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n")
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Built-in gap-based session windows (F.session_window): a session
    closes after `gap` inactivity.  Works identically in batch and
    streaming — the batch form is oracle-checked as `e2_session_window`
    against a lag/cumsum SQL transcription."""
    grouped = events
    if events.isStreaming:
        grouped = events.withWatermark("ts", watermark)
    return (
        grouped.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), "n_events")
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    on: str = "user_id") -> DataFrame:
    """Stream-static broadcast join: each micro-batch joins against the
    (small) static dimension — the streaming analog of J1.  The dim is
    re-read per batch if its source supports it; broadcast keeps the
    stream side shuffle-free."""
    return stream.join(F.broadcast(dim), on, "left")


def write_foreach_batch(stream_df: DataFrame, out_dir: str,
                        checkpoint_dir: str) -> "object":
    """foreachBatch parquet sink: per-micro-batch idempotent write keyed by
    batch id (rerun of a batch overwrites its own directory — the
    exactly-once pattern for non-transactional sinks, mirroring the
    reference's idempotent re-apply stance, SURVEY §2.8 K7)."""
    def write_batch(df: DataFrame, batch_id: int) -> None:
        (df.write.mode("overwrite")
           .parquet(f"{out_dir}/batch_id={batch_id}"))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_click_purchase_join(clicks: DataFrame, purchases: DataFrame,
                                      within: str = "1 hour",
                                      watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    clicks within ``within`` BEFORE the purchase.  Both sides carry
    watermarks and the join has a time-range conjunct, so state for
    expired windows is evicted — the two requirements that make a
    stream-stream join runnable unbounded (without them state grows
    forever)."""
    c = (clicks.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("c_user"),
                 F.col("ts").alias("click_ts"),
                 F.col("event_id").alias("click_id")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("purchase_ts"),
                 F.col("value").alias("purchase_value")))
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select("c_user", "click_id", "click_ts", "purchase_ts", "purchase_value")


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "1 hour",
                 ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event across
    micro-batches.  `dropDuplicatesWithinWatermark` bounds the dedup
    state to the watermark horizon — the unbounded-state trap of plain
    `dropDuplicates` on a stream (state grows with every key ever seen)
    is the thing to avoid at 100 TB/day ingest rates.

    Batch analog: `dedup.exact_dedup` — same key semantics, one shuffle."""
    keys = keys or ["event_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def per_user_type_counts_tws(events: DataFrame) -> DataFrame:
    """Arbitrary-state streaming via ``transformWithStateInPandas``
    (Spark 4's successor to applyInPandasWithState): per-user,
    per-event-type running counts held in a ``MapState`` keyed by
    event_type.

    Composite keyed state is the point — applyInPandasWithState exposes
    ONE state tuple per group key, so a per-type map must be packed and
    unpacked wholesale every batch; MapState reads/writes only the
    entries the batch touches, which is what keeps per-key state O(types
    touched) instead of O(types ever seen) at 100 TB/day rates.  Emits
    one row per (user, type) updated in the batch.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) — the default HDFS-backed
    store does not implement the transformWithState column families —
    and the ``protobuf`` package (the TWS Python worker protocol);
    the test is import-gated on the latter like the PIL decode path.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint")

        # NULL event_type rows must still be counted (batch groupBy keeps
        # a NULL group); pandas groupby drops NaN keys by default, and the
        # MapState key column is non-null, so NULL is counted under an
        # unprintable sentinel key and emitted back as None
        _NULL_KEY = "\x00"

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd
            upd: dict[str, int] = {}
            for pdf in rows:
                grouped = pdf.groupby("event_type", dropna=False).size()
                for etype, cnt in grouped.items():
                    k = etype if isinstance(etype, str) else self._NULL_KEY
                    upd[k] = upd.get(k, 0) + int(cnt)
            out_types, out_counts = [], []
            for etype in sorted(upd):
                prev = self._counts.getValue((etype,))
                n = (prev[0] if prev else 0) + upd[etype]
                self._counts.updateValue((etype,), (n,))
                out_types.append(None if etype == self._NULL_KEY else etype)
                out_counts.append(n)
            yield pd.DataFrame({"user_id": [key[0]] * len(out_types),
                                "event_type": out_types,
                                "n": out_counts})

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TypeCounts(),
            outputStructType="user_id bigint, event_type string, n bigint",
            outputMode="Update",
            timeMode="None",
        )
    )

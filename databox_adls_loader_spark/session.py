"""SparkSession factory.

Defaults are tuned for the local[32] harness but every knob is the one you
would set on a 1000-executor cluster too: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (vectorized Python interchange for
the pandas-UDF extension ops), UTC session timezone (matches the DuckDB
oracle's naive timestamps), and a shuffle-partition count sized to the
parallelism actually available rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "databox-adls-loader-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the same so a local run has no idle
    reducers — on a real cluster you would size this to 2-3× total cores.
    """
    # make google.protobuf importable (vendored mini-runtime fallback)
    # BEFORE the JVM launches, so Python workers inherit the PYTHONPATH —
    # the transformWithStateInPandas state clients import it executor-side
    from .vendor import ensure_protobuf
    ensure_protobuf()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DSv2 filter pushdown (sources/vtable_batch.pushFilters)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert explicitly (see load_tables)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # static conf: bucketed saveAsTable needs a writable warehouse
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"))
    )
    return builder.getOrCreate()


ALL_TABLES = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()


def spread(df, *cols, target: int | None = None, probe=None):
    """Repartition a compute-heavy operator's input up to the session's
    default parallelism WHEN the current plan would run on fewer
    partitions — the guide-§2.5 "unsplittable input" fix (one row group,
    a gzip member, a tiny file count all produce a scan with fewer tasks
    than cores, and every per-row-expensive map stage above it — md5
    shingles, token hashing, Arrow-batched decodes — then runs on that
    handful of cores while the rest idle).

    Scale-adaptive by construction: at 100 TB the scan already carries
    ≥ parallelism partitions and this returns ``df`` unchanged — the
    exchange only appears where the input layout under-splits.  With
    ``cols`` the repartition hashes on those columns (deterministic, no
    sort-before-repartition); bare it round-robins.  Only apply where
    the downstream per-row work dominates a small exchange.

    ``probe``: a frame whose scan partitioning EQUALS ``df``'s (callers
    pass the memoized `load_tables` handle when ``df`` is a narrow
    select/filter of it — projections and filters never change the
    partition count).  The partition-count probe builds a full
    QueryExecution (measured 0.28–0.46 s per fresh plan, §5.4); the
    RDD is cached on the DataFrame OBJECT, so probing the shared
    per-session table handle pays that once per session instead of
    once per operator call."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() >= target:
        return df
    key = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(target, *key) if key else df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, "object"]:
    """Load driver parquet tables under ``sf_dir`` as DataFrames (lazily —
    only the requested ones, so one bad/missing table never blocks queries
    that don't touch it).

    Plain ``spark.read.parquet`` — Catalyst gets filter pushdown, column
    pruning, and partition pruning for free on these scans (SURVEY §4).
    ``events.ts`` arrives as nanosecond int64 (nanosAsLong) and is converted
    to a proper timestamp column (microsecond truncation, matching DuckDB's
    micro-precision bucketing in the oracles).
    """
    out = {}
    for n in names if names is not None else ALL_TABLES:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if not os.path.exists(path):
            continue
        # cache the DataFrame handle per (session, path): reading the same
        # parquet from every query re-runs footer schema inference and file
        # listing — a JVM round trip per table per query that dominates the
        # sub-second queries.  DataFrames are immutable plans, so reuse
        # within one session is safe; keyed on the session so a stopped
        # session's handles are never resurrected.
        app_id = spark.sparkContext.applicationId
        key = (app_id, path)
        df = _TABLE_CACHE.get(key)
        if df is None:
            # evict entries of other (stopped) sessions: stale handles pin
            # JVM-side plans for the process lifetime otherwise
            for k in [k for k in _TABLE_CACHE if k[0] != app_id]:
                del _TABLE_CACHE[k]
            if n == "events":
                # events.parquet is TIMESTAMP(NANOS): a driver-provided
                # session without our factory config would throw
                # PARQUET_TYPE_ILLEGAL — the conf is runtime-settable, so
                # set it defensively here, not only in get_spark
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if n == "events":
                from pyspark.sql import functions as F
                ts_type = dict(df.dtypes).get("ts")
                if ts_type == "bigint":
                    # integer division: float `/ 1000` rounds at microsecond
                    # precision (int64 ns exceeds a double's 52-bit
                    # mantissa) where DuckDB's nanos→micros truncates
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000")))
                elif ts_type == "timestamp_ntz":
                    # parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as
                    # TIMESTAMP_NTZ, which unix_micros/window() reject.
                    # The session timezone is pinned UTC, so the cast is a
                    # pure retag: wall-clock values (and therefore every
                    # oracle comparison against DuckDB's naive TIMESTAMP)
                    # are unchanged
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            _TABLE_CACHE[key] = df
        out[n] = df
    return out


_TABLE_CACHE: dict[tuple, "object"] = {}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> list[str]:
    """Register the driver tables as temp views so the whole engine surface
    is reachable from plain ``spark.sql`` — every DataFrame operator here
    is Catalyst-backed, so SQL and the DataFrame API compose freely
    (a `spark.sql` join against a view can feed a DataFrame operator and
    vice versa).  Returns the registered view names."""
    out = []
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
        out.append(n)
    return out

"""Data-mixing operators for training-corpus assembly: deterministic
stratified sampling, token-budget shard packing, and per-domain quality
quotas.

These generalize the reference's capacity-packing idea (directories into
fixed-size Data Box units, /root/reference/generate-file-list.py:20-47) to
the token/document domain a training-data pipeline needs: a corpus is
assembled by downsampling each source to a target rate, capping any one
domain's contribution, and packing the survivors into fixed-token shards.

All three operators are built-in-function column math (JVM, codegen):

- sampling is a hash-bucket filter — map-side, zero shuffles;
- domain quotas are one partitioned window (one shuffle on the stratum
  key, WindowGroupLimit pushes the rank cap into the sort);
- shard packing uses the two-phase range-partitioned prefix sum
  (operators/windows.py) — never a single-partition window, so the
  global cumulative token count survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import hash_bucket, token_count
from .windows import exclusive_running_sum


def stratified_sample(docs: DataFrame, rates: dict[str, int],
                      default_pct: int = 100,
                      strata_col: str = "source", key_col: str = "doc_id",
                      salt: str = "mix-v1") -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    md5-hash bucket in [0, 100) is below the stratum's keep-percentage.

    Unlike ``df.sampleBy`` (rand()-seeded, layout-dependent) the hash
    bucket is a pure function of the key — re-running the pipeline keeps
    exactly the same documents, and upstream re-partitioning cannot
    change the sample.  Map-side filter, no shuffle; at 100 TB this runs
    at scan speed and feeds the scan's predicate pushdown nothing (the
    bucket is computed, not stored), so put stored-column filters first.
    """
    bucket = hash_bucket(key_col, 100, salt)
    pct = F.lit(int(default_pct))
    # when() chain over the (small, fixed) rates dict stays codegen —
    # no join, no broadcast needed for a handful of strata
    for stratum, rate in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == stratum, F.lit(int(rate))) \
               .otherwise(pct)
    return docs.filter(bucket < pct)


def domain_topk(docs: DataFrame, k: int, score: Column,
                strata_col: str = "source",
                id_col: str = "doc_id") -> DataFrame:
    """Per-domain quota: keep only the k best documents of each stratum
    by ``score`` (ties broken by id for determinism), with an ``rk``
    output column (1 = best within its stratum).  One shuffle on the
    stratum key; Spark's WindowGroupLimit rewrites the rank-filter into a
    per-partition top-k so the sort never materializes whole strata.

    The score is ordered as a window expression directly — no temp
    column, so no input column can be clobbered; ``rk`` is the one added
    name and a pre-existing ``rk`` raises instead of being overwritten."""
    if "rk" in docs.columns:
        raise ValueError("domain_topk adds an 'rk' column; rename the "
                         "input's existing 'rk' first")
    w = Window.partitionBy(strata_col).orderBy(score.desc(), F.asc(id_col))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
    )


def pack_token_shards(docs: DataFrame, budget_tokens: int,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Assign documents to fixed-token-budget training shards in global
    id order: ``shard = (tokens before this doc) div budget``.

    Sequential-fill semantics (a straddling document belongs to the shard
    where it starts) — the token-domain analog of the reference's
    next-fit unit assignment (generate-file-list.py:26-31).  The global
    prefix sum is the two-phase range-partitioned form with exact long
    arithmetic, so the result is identical to a naive global window
    without its single-partition collapse.

    Returns (id, n_tokens, tok_before, shard).
    """
    with_tok = docs.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"))
    run = exclusive_running_sum(with_tok, id_col, F.col("n_tokens"),
                                out_col="tok_before", value_type="bigint")
    return run.withColumn(
        "shard", F.expr(f"tok_before div {int(budget_tokens)}"))


def source_concentration(docs: DataFrame, group_col: str,
                         weight: Column, k: int = 10) -> DataFrame:
    """Concentration (Lorenz) curve of a corpus over its sources: rank
    groups by descending total ``weight``, bucket them into ``k`` ntiles,
    and report each bucket's exact cumulative share in integer ppm —
    "the top 10% of sources contribute X% of the corpus", the imbalance
    diagnostic read before choosing `stratified_sample` rates or
    `domain_topk` caps.

    Per-group totals partial-aggregate in one shuffle; the ntile comes
    from `global_ntile` (range partition — no single-partition window
    over the group list); the running sum at the end runs over ≤ k rows
    — bounded by the parameter, not the data.  Integer ppm
    (`cum * 1_000_000 div total`) keeps the output exact and
    engine-portable; weights stay int64 up to ~9.2e18 total.
    """
    from .windows import global_ntile
    s = docs.groupBy(group_col).agg(F.sum(weight).cast("long").alias("__w"))
    nt = global_ntile(s, [("__w", "desc"), (group_col, "asc")], k)
    d = nt.groupBy(F.col("ntile").alias("bucket")).agg(
        F.sum("__w").cast("long").alias("weight"))
    t = d.agg(F.sum("weight").alias("__total"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn("__cum", F.sum("weight").over(w))
        .select("bucket", "weight",
                F.expr("__cum * 1000000L div __total").cast("long")
                .alias("cum_ppm"))
        .orderBy("bucket")
    )


def temperature_sample(docs: DataFrame, target_total: int,
                       strata_col: str = "source", key_col: str = "doc_id",
                       salt: str = "temp-v1") -> DataFrame:
    """Temperature-based mixture reweighting (alpha = 0.5): sampling
    weight per source ∝ sqrt(source size) — the standard multinomial
    smoothing (T5/XLM-R style) that upsamples small domains relative to
    proportional sampling when assembling a training mix of
    ``target_total`` documents.

    All arithmetic is EXACT integer math so the result is engine-portable:
    isqrt via ``math.isqrt`` (driver side, on the tiny per-source count
    collect — O(|sources|), never O(rows)), keep-rate in integer ppm
    ``min(1e6, target·isqrt_s·1e6 div (Σ isqrt · n_s))``, membership via
    the md5 hash-bucket in [0, 1e6).  No float weight ever exists, so
    there is no summation-order or rounding divergence to chase.

    Returns every doc with (…, rate_ppm, kept) — callers filter on
    ``kept`` for the sampled mix or aggregate for an audit.  Map-side
    except the one tiny counts aggregate.  The per-source rates are
    applied via a broadcast-joined rates frame, not a nested
    ``F.when`` chain — a when-chain's expression depth is O(|sources|),
    which blows up analysis/codegen long before 100 TB for
    high-cardinality source domains; a broadcast hash join is O(1)
    depth regardless of how many sources exist."""
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    counts = {r["s"]: r["n"] for r in
              docs.groupBy(F.col(strata_col).alias("s"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    isq = {s: math.isqrt(n) for s, n in counts.items()}
    denom = sum(isq.values())
    if denom == 0:
        # empty input: no strata means no rates — return the (empty)
        # frame with the contract schema instead of dividing by zero
        return (docs.withColumn("rate_ppm", F.lit(0).cast("long"))
                .withColumn("kept", F.lit(False)))
    rates = {
        s: min(1_000_000,
               (int(target_total) * isq[s] * 1_000_000) // (denom * counts[s]))
        for s in counts
    }
    rates_df = docs.sparkSession.createDataFrame(
        [(s, rates[s]) for s in sorted(rates)],
        StructType([StructField(strata_col, docs.schema[strata_col].dataType),
                    StructField("rate_ppm", LongType())]))
    bucket = hash_bucket(key_col, 1_000_000, salt)
    return (docs.join(F.broadcast(rates_df), strata_col, "left")
            .withColumn("rate_ppm",
                        F.coalesce("rate_ppm", F.lit(0)).cast("long"))
            .withColumn("kept", bucket < F.col("rate_ppm"))
            .select(*docs.columns, "rate_ppm", "kept"))


def curriculum_phases(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Length-curriculum assembly: split the corpus into four training
    phases by document token count (the classic short→long curriculum)
    and report each phase's document count and token mass — the numbers
    a trainer needs to size per-phase step counts before launching.

    Phase boundaries are the EXACT token-count quartiles
    (percentile-cont over integers: interpolated values land on
    .0/.25/.5/.75, exact in binary, so the `tok <= boundary` comparison
    can never flip between engines); every output column is an integer —
    no float leaves the plan.

    Plan: one map-side token count per doc, one exact-percentile
    aggregate collapsed to a 1-ROW broadcast frame (the allowlisted
    scalar cross-join shape), one 4-group rollup.  At 100 TB swap the
    exact percentile for `approx_percentile` — phase boundaries don't
    need exactness in production, only the oracle gate does."""
    toks = docs.select(F.col(id_col),
                       token_count(text_col).cast("long").alias("tok"))
    bounds = F.broadcast(toks.agg(
        F.expr("percentile(tok, array(0.25D, 0.5D, 0.75D))").alias("qs")))
    return (
        toks.crossJoin(bounds)
        .select(phase_by_quartiles(F.col("tok"), F.col("qs"))
                .alias("phase"), "tok")
        .groupBy("phase")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("tok").cast("long").alias("total_toks"),
             F.min("tok").cast("long").alias("min_toks"),
             F.max("tok").cast("long").alias("max_toks"))
        .orderBy("phase")
    )


def phase_by_quartiles(tok: Column, qs: Column) -> Column:
    """The 4-way curriculum phase chain over quartile boundaries ``qs``
    (an array column) — ONE definition shared by `curriculum_phases`
    and `corpus.assemble_corpus`, so the standalone phase report and
    the composed pipeline can never diverge on boundary inclusivity."""
    return (F.when(tok <= qs[0], F.lit(1))
            .when(tok <= qs[1], F.lit(2))
            .when(tok <= qs[2], F.lit(3))
            .otherwise(F.lit(4)))


def hash_u32(id_col: str, salt: str) -> Column:
    """Per-record uniform in [0, 2³²): first 8 md5 hex digits of
    (id‖salt) — the u behind the priority-sampling rank key."""
    h8 = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8)
    return F.conv(h8, 16, 10).cast("long")


def priority_rank(weight_name: str, u_name: str = "__u") -> Column:
    """The Duffield-Lund-Thorup rank key weight·2³² div (u+1) as ONE
    exact bigint — single definition so `priority_sample`,
    `budget_trim_by_stratum`, and their oracles can never drift on the
    constants."""
    return F.expr(f"{weight_name} * 4294967296 div ({u_name} + 1)") \
        .cast("long")


def priority_sample(docs: DataFrame, weight_col: str = "n_chars",
                    k: int = 100, id_col: str = "doc_id",
                    salt: str = "prio-v1") -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the k
    records with the largest priority weight/u, u a per-record hash
    uniform (public technique: priority sampling, Duffield-Lund-Thorup,
    JACM 2007 — inclusion probability ∝ weight, and subset-sum
    estimates from the sample are near-optimal).  The hash-derived u
    replaces rand() so the sample is reproducible across runs, engines,
    and cluster layouts — the same property `hash_bucket` gives the
    train/val/test split.

    The rank key is the INTEGER quotient weight·2³² div (u+1) with
    u = first-8-hex-digits of md5(id‖salt) ∈ [0, 2³²): one exact bigint
    per row, ties broken by id — no float ranking, so the selected SET
    is engine-portable, not just approximately similar.

    Scale: map-side key computation + top-k (TakeOrderedAndProject —
    per-partition heaps, then a k-row merge on the driver); nothing
    shuffles the corpus."""
    base = docs.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        hash_u32(id_col, salt).alias("__u"))
    return (base
            .withColumn("priority", priority_rank("weight"))
            .orderBy(F.desc("priority"), F.asc(id_col)).limit(k)
            .select(id_col, "weight", "priority"))


def budget_trim_by_stratum(docs: DataFrame, budget_tokens: int,
                           stratum_col: str = "source",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           salt: str = "prio-v1") -> DataFrame:
    """Token-budget corpus trim per stratum: within each source, keep
    documents in priority order (the `priority_sample` rank key, weight
    = token count) until the stratum's cumulative token count would
    exceed ``budget_tokens`` — the "give every domain at most N tokens"
    step that follows rate-based mixing when the contract is a hard
    token budget, not a sampling rate.

    Keeps a doc iff its INCLUSIVE running total ≤ budget (greedy by
    priority; a doc that would cross the line is dropped but later,
    smaller docs may still fit — the standard greedy knapsack
    relaxation, deterministic because the order is the integer priority
    key + id).  Output: per-stratum kept-doc count and token mass, all
    integers.

    Plan: ONE window partitioned by the stratum (never a global sort) —
    at 100 TB each domain's running sum spreads by stratum key, the
    exact shape `exclusive_running_sum` solves for the single-sequence
    case."""
    base = docs.select(
        F.col(id_col), F.col(stratum_col).alias("stratum"),
        token_count(text_col).cast("long").alias("tok"),
        hash_u32(id_col, salt).alias("__u"))
    pri = base.withColumn("priority", priority_rank("tok"))
    w = (Window.partitionBy("stratum")
         .orderBy(F.desc("priority"), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (pri.withColumn("cum", F.sum("tok").over(w))
            .filter(F.col("cum") <= budget_tokens)
            .groupBy("stratum")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("tok").cast("long").alias("kept_tokens"))
            .orderBy("stratum"))


def padding_waste(docs: DataFrame, n_tokens: Column,
                  max_lens: list[int] = (64, 128, 256, 512)) -> DataFrame:
    """Padding-waste report for fixed-length training batches: for each
    candidate ``max_len``, chunk every document into ⌈tokens/L⌉
    sequences and measure the pad tokens the batch would carry —
    (max_len, n_docs, total_tokens, padded_tokens, waste_ppm).  The
    number that decides sequence length (and whether to pay for
    sequence PACKING — cf. `pack_token_shards`) before a training run.

    All integral: chunks = (t + L − 1) DIV L, padded = chunks·L,
    waste_ppm = (padded − total)·10⁶ DIV padded.  One scan, the
    |max_lens| variants computed as a small explode over the counted
    frame — map-side until the final |max_lens|-row aggregate."""
    lens = F.array(*[F.lit(int(x)) for x in max_lens])
    per = (docs.select(n_tokens.cast("long").alias("t"))
           .filter(F.col("t") > 0)
           .select("t", F.explode(lens).alias("max_len"))
           .withColumn("__chunks", F.expr("(t + max_len - 1) DIV max_len"))
           .groupBy("max_len")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("t").cast("long").alias("total_tokens"),
                F.sum(F.col("__chunks") * F.col("max_len")).cast("long")
                .alias("padded_tokens")))
    return per.select(
        F.col("max_len").cast("long").alias("max_len"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "total_tokens", "padded_tokens",
        F.expr("CAST((padded_tokens - total_tokens) * 1000000L "
               "DIV padded_tokens AS BIGINT)").alias("waste_ppm"))

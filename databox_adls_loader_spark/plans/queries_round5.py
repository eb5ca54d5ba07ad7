"""Round-5 registry extensions: sketch-contract aggregates (approximate
percentile / heavy hitters checked the a8_approx_distinct way), a data-
quality referential-integrity audit, hopping windows, and incremental
MinHash dedup (batch-vs-corpus LSH).

Reference parity note: the reference (Azure/databox-adls-loader) has no
analytics surface beyond SURVEY §2 — these are the beyond-reference
operators a 100 TB training-data pipeline needs (driver contract:
__spark_entry__.py; correctness gate: tools/check_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators import dedup
from .queries import _t, fixture_timed, register


# ---------------------------------------------------------------------------
# sketch contracts (a8 pattern: exact values + in-contract booleans)
# ---------------------------------------------------------------------------

@register(
    "a10_approx_percentile_contract",
    oracle="""
    SELECT ROUND(quantile_disc(o_totalprice, 0.5), 6) AS p50_exact,
           ROUND(quantile_disc(o_totalprice, 0.9), 6) AS p90_exact,
           ROUND(quantile_disc(o_totalprice, 0.99), 6) AS p99_exact,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
    FROM orders
    """,
    tags=["A5", "sketch", "percentile"],
)
def a10_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch — the 100 TB substitute for an
    exact within-group sort) under a RANK-ERROR contract: the sketch's
    returned value v_p must sit at a data rank within ±2 pp of p (the
    sketch's guarantee is 1/accuracy = 0.01 pp; 2 pp is 200× slack, so
    only a genuinely broken sketch trips it).  The query emits the exact
    percentile_disc values (hash-checked against DuckDB's quantile_disc)
    plus one boolean per percentile; the oracle expects TRUE.  Plan: one
    sketch aggregate + one exact-sort aggregate + one rank-check scan,
    joined as 1-row broadcasts."""
    (orders,) = _t(spark, sf_dir, "orders")
    approx = orders.agg(
        F.expr("approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)")
        .alias("ap"))
    exact = orders.agg(*[
        F.round(F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"), 6)
        .alias(f"p{int(p * 100)}_exact")
        for p in (0.5, 0.9, 0.99)])
    ranks = (
        orders.crossJoin(F.broadcast(approx))
        .agg(*[(F.sum((F.col("o_totalprice") <= F.col("ap")[i].cast("double"))
                      .cast("long")) / F.count(F.lit(1)))
               .alias(f"frac{i}") for i in range(3)])
    )
    ok = [(F.abs(F.col(f"frac{i}") - F.lit(p)) <= 0.02)
          .alias(f"p{int(p * 100)}_rank_ok")
          for i, p in enumerate((0.5, 0.9, 0.99))]
    return (exact.crossJoin(F.broadcast(ranks))
            .select("p50_exact", "p90_exact", "p99_exact", *ok))


@register(
    "a11_freq_items_contract",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS total FROM orders)
    SELECT o_orderpriority, TRUE AS in_sketch
    FROM orders CROSS JOIN n
    GROUP BY o_orderpriority, n.total
    HAVING COUNT(*) > 0.15 * n.total
    ORDER BY o_orderpriority
    """,
    tags=["A5", "sketch", "heavy-hitters"],
)
def a11_freq_items_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark's freqItems (Karp-Shenker-Papadimitriou
    one-pass sketch) under its superset contract: every value whose true
    frequency exceeds support·n MUST appear in the sketch output (false
    positives allowed, false negatives never).  The query emits the
    EXACT frequent items (hash-checked) plus a per-item boolean that the
    sketch contains it; the oracle expects TRUE on every row.  At 100 TB
    the sketch is the only side that runs — one pass, fixed memory."""
    (orders,) = _t(spark, sf_dir, "orders")
    support = 0.15
    sketch = (orders.freqItems(["o_orderpriority"], support=support)
              .select(F.col("o_orderpriority_freqItems").alias("items")))
    total = orders.agg(F.count(F.lit(1)).alias("total"))
    exact = (orders.groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .crossJoin(F.broadcast(total))
             .filter(F.col("cnt") > support * F.col("total")))
    return (exact.crossJoin(F.broadcast(sketch))
            .select("o_orderpriority",
                    F.array_contains("items", F.col("o_orderpriority"))
                    .alias("in_sketch"))
            .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------------
# data quality
# ---------------------------------------------------------------------------

@register(
    "dq_referential_integrity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS n_orphan_lineitem,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_orders,
      (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                             GROUP BY o_orderkey HAVING COUNT(*) > 1))
        AS n_dup_orderkeys,
      (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
        AS n_null_orderdate
    """,
    tags=["dq", "J2"],
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: orphan foreign keys (anti-join counts), primary-
    key duplicates, and null-rate checks as ONE single-row report — the
    validation pass a pipeline runs before training-data assembly.  Each
    check is an independent broadcast-anti-join or pre-aggregate; the
    1-row frames combine via broadcast cross joins.  At 100 TB each
    anti-join broadcasts the KEY SET only (orderkey/custkey longs), and
    AQE converts empty-orphan sides to instant-finish stages."""
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    orphan_li = (lineitem.select("l_orderkey")
                 .join(orders.select("o_orderkey"),
                       F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
                 .agg(F.count(F.lit(1)).alias("n_orphan_lineitem")))
    orphan_o = (orders.select("o_custkey")
                .join(customer.select("c_custkey"),
                      F.col("o_custkey") == F.col("c_custkey"), "left_anti")
                .agg(F.count(F.lit(1)).alias("n_orphan_orders")))
    dup_keys = (orders.groupBy("o_orderkey")
                .agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
                .agg(F.count(F.lit(1)).alias("n_dup_orderkeys")))
    null_dates = orders.agg(
        F.sum(F.col("o_orderdate").isNull().cast("long"))
        .alias("n_null_orderdate"))
    return (orphan_li.crossJoin(F.broadcast(orphan_o))
            .crossJoin(F.broadcast(dup_keys))
            .crossJoin(F.broadcast(null_dates)))


# ---------------------------------------------------------------------------
# semi-structured + null-semantics SQL surface
# ---------------------------------------------------------------------------

@register(
    "p11_props_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=["P1", "json", "semi-structured"],
)
def p11_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload parsing at scale: the events table's JSON
    ``props`` column parsed with a TYPED from_json schema (JVM-side
    Jackson parse, codegen projection — never a Python json.loads), then
    aggregated per event type.  At 100 TB prefer parsing ONCE into a
    struct column at ingest; this query is the read-side shape when the
    payload stays raw."""
    (events,) = _t(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").cast("long").alias("k"))
    return (parsed.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max"))
            .orderBy("event_type"))


@register(
    "j4_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT NULLIF(o_custkey % 50, 0) AS k, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), r AS (
      SELECT NULLIF(c_custkey % 50, 0) AS k, COUNT(*) AS n_custs
      FROM customer GROUP BY 1
    )
    SELECT l.k, l.n_orders, r.n_custs
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    ORDER BY l.k NULLS FIRST
    """,
    tags=["J1", "null-semantics"],
)
def j4_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics for
    sentinel/unknown join keys (the reference's identity fallback P3
    treats missing as a value, not an absence).  Spark plans ``<=>`` as
    a regular hash join (null-safe keys still hash-partition), so the
    scale profile is identical to a plain equi join — both sides here
    pre-aggregate to ≤51 rows first."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    left = (orders.groupBy(F.nullif(F.col("o_custkey") % 50, F.lit(0))
                           .alias("k"))
            .agg(F.count(F.lit(1)).alias("n_orders")))
    right = (customer.groupBy(F.nullif(F.col("c_custkey") % 50, F.lit(0))
                              .alias("lk"))
             .agg(F.count(F.lit(1)).alias("n_custs")))
    return (left.join(right, F.col("k").eqNullSafe(F.col("lk")))
            .select("k", "n_orders", "n_custs")
            .orderBy(F.col("k").asc_nulls_first()))


# ---------------------------------------------------------------------------
# incremental near-dup (batch vs corpus LSH)
# ---------------------------------------------------------------------------

def _incremental_minhash_oracle() -> str:
    from .queries_ext import _hex15_to_long, _perms_values_sql
    return rf"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), {_perms_values_sql(32)}, hh AS (
      SELECT doc_id, md5(g) AS m FROM sh
    ), hb AS (
      SELECT doc_id, {_hex15_to_long('m')} AS h FROM hh
    ), hx AS (
      SELECT doc_id, j,
             MIN((a * (h % 2147483647) + b) % 2147483647) AS hmin
      FROM hb CROSS JOIN perms GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id, list(hmin ORDER BY j) AS sig FROM hx GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, bi,
             array_to_string(list_transform(
               list_slice(sig, bi * 4 + 1, bi * 4 + 4),
               x -> CAST(x AS VARCHAR)), ',') AS bkey
      FROM sig CROSS JOIN range(0, 8) AS sb(bi)
    ), cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM banded l JOIN banded r
        ON l.bi = r.bi AND l.bkey = r.bkey
       AND l.doc_id % 2 = 1 AND r.doc_id % 2 = 0
    ), est AS (
      SELECT c.a, c.b,
             len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0
               AS est_jaccard
      FROM cand c JOIN sig sa ON c.a = sa.doc_id JOIN sig sb ON c.b = sb.doc_id
    )
    SELECT a, b, est_jaccard FROM est
    WHERE est_jaccard >= 0.5 ORDER BY a, b
    """


@register(
    "dedup_incremental_minhash",
    oracle=_incremental_minhash_oracle(),
    tags=["dedup", "lsh", "incremental"],
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus NEAR-dup dedup (odd doc_ids = incoming crawl, even
    = existing corpus): LSH candidates only from bands shared across the
    sides, signature-estimated Jaccard verify — the recurring-ingest
    companion to dedup_incremental's exact-hash check.  Portable md5
    signature mode, so DuckDB rebuilds the identical signatures, band
    keys, cross-side candidates, and verdicts (full value-hash check of
    the approximate index, same trick as dedup_minhash_lsh)."""
    (docs,) = _t(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    return (
        dedup.incremental_minhash_dedup(incoming, corpus, k=32, bands=8,
                                        threshold=0.5, portable=True)
        .orderBy("a", "b")
    )


# ---------------------------------------------------------------------------
# hopping (sliding) windows
# ---------------------------------------------------------------------------

@register(
    "w7_hopping_window_counts",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS b1, value FROM events
    ), expanded AS (
      SELECT b1 AS ws, value FROM b
      UNION ALL
      SELECT b1 - INTERVAL '1 hour' AS ws, value FROM b
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM expanded GROUP BY ws ORDER BY window_start
    """,
    tags=["streaming", "window", "W1"],
)
def w7_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 2-hour windows advancing every hour, so
    each event contributes to exactly two windows — the overlap shape
    used for smoothed rate monitoring.  Same F.window expression
    Structured Streaming uses (streaming/events.py), batch-checked here:
    the oracle expands each event into its two containing windows
    explicitly.  Scale: the window explode is map-side (×2 rows), then
    one shuffle on window_start — identical cost profile to a tumbling
    agg at 2× input."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value", scale=4).alias("total_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# phrase collocations (exact-integer association score)
# ---------------------------------------------------------------------------

@register(
    "text_collocations_phrase",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), big AS (
      SELECT t[CAST(i AS BIGINT)] AS a, t[CAST(i AS BIGINT) + 1] AS b
      FROM toks CROSS JOIN unnest(range(1, len(t))) AS u(i)
    ), bc AS (
      SELECT a, b, COUNT(*) AS c_ab FROM big GROUP BY 1, 2
    ), uni AS (
      SELECT unnest(t) AS w FROM toks
    ), uc AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_tok FROM uni)
    SELECT bc.a AS word_a, bc.b AS word_b, bc.c_ab AS pair_count,
           ((bc.c_ab - 5) * 1000000 * n.n_tok) // (ua.c * ub.c) AS score_ppm
    FROM bc JOIN uc ua ON bc.a = ua.w JOIN uc ub ON bc.b = ub.w CROSS JOIN n
    WHERE bc.c_ab >= 10
    ORDER BY score_ppm DESC, word_a, word_b LIMIT 20
    """,
    tags=["text", "collocations"],
)
def text_collocations_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by the word2vec phrase score
    (Mikolov et al. 2013, public): score = (c_ab − δ) · N / (c_a · c_b),
    the PMI-monotone lift with a δ discount that suppresses rare noise —
    the phrase-mining pass a tokenizer-training pipeline runs before
    merging multi-word units.  The score is emitted in EXACT integer ppm
    (bigint multiply + integer division — no log, no float), so the hash
    gate compares it bit-for-bit across engines.

    Plan: one token-split projection feeds BOTH the bigram explode (zip of
    shifted slices — HOF arguments evaluate once per row, the round-4
    O(tokens²) lambda rule) and the unigram explode; counts partial-
    aggregate map-side; the vocabulary-sized unigram counts join the
    bigram counts by word (shuffle join — at 100 TB vocab is ~10⁷ rows,
    far below either side's bigram table, and AQE will broadcast it when
    it fits); the 1-row total is a broadcast cross join.  TakeOrdered
    bounds the final sort at 20 rows."""
    (docs,) = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                 lambda x: x != "").alias("t"))
    toks = toks.select("t", F.greatest(F.size("t") - 1, F.lit(0)).alias("m"))
    big = toks.select(F.explode(F.zip_with(
        F.slice("t", 1, F.col("m")),
        F.slice("t", 2, F.col("m")),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))).alias("z"))
    bc = (big.select("z.a", "z.b")
          .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
          .filter(F.col("c_ab") >= 10))
    uni = toks.select(F.explode("t").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.count(F.lit(1)).alias("n_tok"))
    ua = uc.select(F.col("w").alias("__wa"), F.col("c").alias("ca"))
    ub = uc.select(F.col("w").alias("__wb"), F.col("c").alias("cb"))
    return (
        bc.join(ua, F.col("a") == F.col("__wa"))
        .join(ub, F.col("b") == F.col("__wb"))
        .crossJoin(F.broadcast(n))
        .select(F.col("a").alias("word_a"), F.col("b").alias("word_b"),
                F.col("c_ab").alias("pair_count"),
                F.expr("((c_ab - 5) * 1000000 * n_tok) DIV (ca * cb)")
                .alias("score_ppm"))
        .orderBy(F.desc("score_ppm"), "word_a", "word_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PQ ANN under the contract gate (same pattern as sim_topk_ivf)
# ---------------------------------------------------------------------------

@register(
    "sim_topk_pq",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim,
           TRUE AS pq_recall_ge_40pct,
           TRUE AS pq_simsum_ge_80pct
    FROM embeddings e, q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "pq"],
)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-20 to the vec_id=1 embedding (8
    subspaces × 16 codewords trained on a deterministic sample; ADC
    lookup-table scoring over 4-bit-per-subspace codes; exact rerank of
    the top-80 ADC candidates).

    PQ is approximate and numpy-dependent, so — like sim_topk_ivf — the
    registry row is the CONTRACT form: the brute-force exact top-20
    (hash-checked against DuckDB's identical cosine) plus booleans
    asserting recall@20 ≥ 40% and Σ(PQ sims) ≥ 80% · Σ(exact sims).
    Recall is additionally asserted numerically in
    tests/test_dedup_similarity.py::test_pq_topk_recall."""
    from ..operators import similarity
    (emb,) = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    exact = similarity.topk_bruteforce(emb, list(q), k=20)
    pq = similarity.pq_topk(emb, list(q), k=20, m=8, k_codes=16, expand=4)
    contract = (
        exact.join(pq.select("vec_id"), "vec_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(exact.agg(F.sum("sim").alias("ex_sum")))
        .crossJoin(pq.agg(F.sum("sim").alias("pq_sum")))
        .select((F.col("n_hits") * 100 >= F.lit(20 * 40))
                .alias("pq_recall_ge_40pct"),
                (F.col("pq_sum") * 100 >= F.col("ex_sum") * 80)
                .alias("pq_simsum_ge_80pct")))
    return (exact.crossJoin(F.broadcast(contract))
            .orderBy(F.desc("sim"), "vec_id"))


# ---------------------------------------------------------------------------
# exact-integer OLS trend (regression re-expressed scale-safe)
# ---------------------------------------------------------------------------

@register(
    "trend_daily_revenue_ols",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri,
             datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ), s AS (
      SELECT pri, COUNT(*) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT pri AS o_orderpriority, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
           ROUND(CAST(CAST(n_days * sxy - sx * sy AS BIGINT) AS DOUBLE)
                 / CAST(CAST(n_days * sxx - sx * sx AS BIGINT) AS DOUBLE), 6)
             AS slope_cents_per_day
    FROM s ORDER BY o_orderpriority
    """,
    tags=["trend", "regression", "A5"],
)
def trend_daily_revenue_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue trend as EXACT-integer OLS: regress daily
    revenue (cents) on the day index and emit the closed-form slope's
    numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² as bigints —
    bit-portable across engines (no float summation anywhere; the only
    float op is one final division both engines perform on identical
    exact operands).

    The scale trick is the PRE-AGGREGATION: raw orders → one row per
    (priority, day) first, so the regression input is |days| rows per
    group and the moment sums stay inside int64 up to ~sf10 (the 100 TB
    variant lifts the moments to decimal(38,0) — same plan shape, one
    extra cast).  Spark's built-in regr_slope would compute the same
    value but via float accumulation, which is neither order-stable nor
    hash-comparable.  Plan: two partial-aggregated shuffles (day rollup,
    then priority moments), no window, no driver math."""
    (orders,) = _t(spark, sf_dir, "orders")
    from ..functions.exact import dec
    daily = (
        orders.groupBy(
            "o_orderpriority",
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date")).alias("x"))
        .agg(F.sum((dec("o_totalprice") * 100).cast("long")).alias("y"))
    )
    s = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("x").cast("long")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("long") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("long") * F.col("x").cast("long")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (s.select(
        "o_orderpriority", "n_days",
        num.alias("slope_num"), den.alias("slope_den"),
        F.round(num.cast("double") / den.cast("double"), 6)
        .alias("slope_cents_per_day"))
        .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------------
# triangle counting / clustering structure of the near-dup pair graph
# ---------------------------------------------------------------------------

@register(
    "graph_triangle_degree",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ), e AS (
      SELECT a, b FROM inter JOIN sizes sa ON a = sa.doc_id
                            JOIN sizes sb ON b = sb.doc_id
      WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
    ), und AS (
      SELECT a AS node FROM e UNION ALL SELECT b FROM e
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM und GROUP BY 1
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
    ), tn AS (
      SELECT node, COUNT(*) AS n_tri
      FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1
    )
    SELECT d.node, d.degree, COALESCE(tn.n_tri, CAST(0 AS BIGINT)) AS n_tri
    FROM deg d LEFT JOIN tn USING (node) ORDER BY d.node
    """,
    tags=["graph", "dedup"],
)
def graph_triangle_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + degree over the exact Jaccard near-dup
    pair graph — the local clustering structure (cc = 2·n_tri /
    (degree·(degree−1))) that separates boilerplate hubs (high degree,
    low closure) from true duplicate cliques (full closure) before
    cluster collapse.  Both emitted components are exact integers.

    Plan: edges come from the session-shared pair-graph checkpoint
    (cache.py — computed once, reused by five sibling queries); the
    triangle enumeration is the standard a<b<c two-hop join, which only
    ever joins the EDGE LIST against itself (O(Σ deg²) candidate work,
    independent of document count — near-dup graphs are sparse by
    construction since LSH/Jaccard thresholds bound neighborhood size).
    At 100 TB the same join runs after the candidate prune, never on raw
    documents."""
    from ..cache import shared_jaccard_pairs
    e = (shared_jaccard_pairs(spark, sf_dir, n=3, threshold=0.5)
         .select("a", "b"))
    und = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(e.alias("e3"), (F.col("e1.a") == F.col("e3.a"))
              & (F.col("e2.b") == F.col("e3.b")))
        .select(F.col("e1.a").alias("ta"), F.col("e1.b").alias("tb"),
                F.col("e2.b").alias("tc"))
    )
    tn = (tri.select(F.explode(F.array("ta", "tb", "tc")).alias("node"))
          .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    return (deg.join(tn, "node", "left")
            .select("node", "degree",
                    F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"))
            .orderBy("node"))


# ---------------------------------------------------------------------------
# integer-exact PageRank (oracle-checked iterative algorithm)
# ---------------------------------------------------------------------------

_PAIR_EDGES_CTE = r"""
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ), e AS (
      SELECT a, b FROM inter JOIN sizes sa ON a = sa.doc_id
                            JOIN sizes sb ON b = sb.doc_id
      WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
    )"""


def _pagerank_oracle(iters: int = 3, scale: int = 1_000_000_000) -> str:
    parts = [f"""
    WITH {_PAIR_EDGES_CTE}, und AS (
      SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM und GROUP BY 1
    ), nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
      SELECT node, CAST({scale} // n AS BIGINT) AS r FROM deg CROSS JOIN nn
    )"""]
    for k in range(1, iters + 1):
        parts.append(f""", s{k} AS (
      SELECT u.src AS node, CAST(SUM(r{k-1}.r // dg.d) AS BIGINT) AS s
      FROM und u JOIN r{k-1} ON u.dst = r{k-1}.node
                 JOIN deg dg ON u.dst = dg.node
      GROUP BY 1
    ), r{k} AS (
      SELECT d.node,
             CAST(({scale * 15 // 100} // nn.n)
                  + (85 * COALESCE(s{k}.s, 0)) // 100 AS BIGINT) AS r
      FROM deg d CROSS JOIN nn LEFT JOIN s{k} ON d.node = s{k}.node
    )""")
    parts.append(f"""
    SELECT node, r AS rank_scaled FROM r{iters} ORDER BY node""")
    return "".join(parts)


@register(
    "graph_pagerank_jaccard",
    oracle=_pagerank_oracle(3),
    tags=["graph", "iterative", "pagerank"],
)
def graph_pagerank_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the exact near-dup pair graph in scaled-
    integer (parts-per-billion) arithmetic — the boilerplate-hub score a
    dedup pipeline uses to pick which member of a template cluster to
    keep.  Every step is bigint add/multiply/DIV, so the iterative
    result is bit-portable and the DuckDB oracle reproduces it by
    unrolling the same three iterations as CTE layers — an iterative
    distributed algorithm under the full value-hash gate, not a
    rows-only check.  Edges come from the session-shared pair-graph
    checkpoint; each iteration is one edge⨝rank shuffle + partial-sum
    aggregate (the standard distributed PageRank step)."""
    from ..cache import shared_jaccard_pairs
    from ..operators.graph import pagerank_int
    e = (shared_jaccard_pairs(spark, sf_dir, n=3, threshold=0.5)
         .select("a", "b"))
    return pagerank_int(e, iters=3).orderBy("node")


# ---------------------------------------------------------------------------
# exact-integer Gram matrix (covariance / whitening / OPQ build step)
# ---------------------------------------------------------------------------

@register(
    "emb_gram_upper",
    oracle="""
    WITH sc AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS s
      FROM embeddings
    ), ij AS (
      SELECT CAST(a.i AS INTEGER) AS i, CAST(b.j AS INTEGER) AS j
      FROM range(0, 64) a(i) CROSS JOIN range(0, 64) b(j)
      WHERE a.i <= b.j
    )
    SELECT ij.i, ij.j,
           CAST(SUM(sc.s[ij.i + 1] * sc.s[ij.j + 1]) AS BIGINT) AS g
    FROM sc CROSS JOIN ij GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["similarity", "pca", "gram"],
)
def emb_gram_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix of the embedding table in EXACT scaled-
    integer arithmetic — the distributed covariance pass feeding PCA
    whitening / OPQ rotation (operators/similarity.pca_project).  A float
    GEMM is order-dependent and never hash-comparable; flooring each
    component to 1/10⁶ units first makes the whole accumulation
    associative int64 math, reproduced cell-for-cell by the oracle.
    2080 output rows (d=64); shuffle O(d² × batches), row-count-free."""
    from ..operators.similarity import gram_upper_scaled
    (emb,) = _t(spark, sf_dir, "embeddings")
    return gram_upper_scaled(emb, scale=1_000_000)


# ---------------------------------------------------------------------------
# Z-order layout key (multi-dimensional file clustering)
# ---------------------------------------------------------------------------

def _zorder_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for k in range(bits):
        terms.append(f"((({a} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({b} >> {k}) & 1) << {2 * k + 1})")
    return " | ".join(terms)


@register(
    "scale_zorder_layout",
    oracle=f"""
    WITH z AS (
      SELECT CAST({_zorder_sql('(l_orderkey % 256)', '(l_partkey % 256)')}
                  AS BIGINT) AS zkey,
             l_orderkey, l_partkey
      FROM lineitem
    )
    SELECT CAST(zkey >> 10 AS BIGINT) AS z_bucket,
           COUNT(*) AS n,
           CAST(MIN(zkey) AS BIGINT) AS z_min,
           CAST(MAX(zkey) AS BIGINT) AS z_max,
           CAST(MIN(l_orderkey % 256) AS BIGINT) AS a_min,
           CAST(MAX(l_orderkey % 256) AS BIGINT) AS a_max
    FROM z GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "layout", "zorder"],
)
def scale_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) locality layout over (orderkey, partkey): the
    interleaved key computed in pure codegen'd bit math, then the
    per-bucket layout profile a writer would range-partition files by.
    Each of the 64 z-buckets covers a bounded square in BOTH dimensions
    (a_min/a_max in the output shows the per-bucket orderkey span is
    ~1/8 of the domain, not the full range — the pruning property),
    so a 2-D range predicate at 100 TB touches O(√files).  All exact
    integer output, reproduced bit-for-bit by the oracle's operator
    form of the same interleave."""
    from ..operators.scale import zorder_key2
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    z = lineitem.select(
        zorder_key2(F.col("l_orderkey") % 256, F.col("l_partkey") % 256)
        .alias("zkey"),
        (F.col("l_orderkey") % 256).alias("a"))
    return (z.groupBy(F.shiftright("zkey", 10).cast("long").alias("z_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("zkey").alias("z_min"), F.max("zkey").alias("z_max"),
                 F.min("a").cast("long").alias("a_min"),
                 F.max("a").cast("long").alias("a_max"))
            .orderBy("z_bucket"))


# ---------------------------------------------------------------------------
# incremental view maintenance (mergeable aggregate state)
# ---------------------------------------------------------------------------

@register(
    "ivm_daily_event_rollup",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                AS BIGINT) AS total_scaled,
           MIN(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS mn_scaled,
           MAX(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS mx_scaled
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=["ivm", "incremental", "A5"],
)
def ivm_daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the daily rollup is computed as
    merge(state(old batch), state(delta batch)) — NOT as one aggregate —
    and the oracle recomputes the rollup directly from all rows, so the
    hash gate PROVES the mergeable-state identity merge(f(A), f(B)) =
    f(A ∪ B) for count/sum/min/max state.  This is the nightly-pipeline
    shape at 100 TB: yesterday's materialized per-day state plus today's
    delta, touching only the delta's partitions — never a full recompute.
    The split cutoff falls mid-day so the boundary day genuinely
    exercises the merge path (both sides contribute).  Measures are
    scaled-integer exact (no float accumulation)."""
    (events,) = _t(spark, sf_dir, "events")
    from ..functions.exact import dec
    base = events.select(
        F.col("ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (dec("value", 4) * 10000).cast("long").alias("v"))

    def state(df: DataFrame, sfx: str) -> DataFrame:
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias(f"n{sfx}"),
            F.sum("v").alias(f"t{sfx}"),
            F.min("v").alias(f"mn{sfx}"),
            F.max("v").alias(f"mx{sfx}"))

    cutoff = F.lit("2024-01-20 12:00:00").cast("timestamp")
    old = state(base.filter(F.col("ts") < cutoff), "1")
    delta = state(base.filter(F.col("ts") >= cutoff), "2")
    zero = F.lit(0).cast("long")
    return (old.join(delta, "day", "full_outer")
            .select(
                "day",
                (F.coalesce("n1", zero) + F.coalesce("n2", zero)).alias("n"),
                (F.coalesce("t1", zero) + F.coalesce("t2", zero))
                .alias("total_scaled"),
                F.least("mn1", "mn2").alias("mn_scaled"),
                F.greatest("mx1", "mx2").alias("mx_scaled"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# audio waveform framing (multimodal)
# ---------------------------------------------------------------------------

def _mm_base_cte() -> str:
    from .queries_ext import _MM_BASE_CTE
    return _MM_BASE_CTE


def _hex4(col: str, pos: str) -> str:
    """DuckDB expression: the uint16 whose 4 lowercase-hex chars start at
    1-based position ``pos`` of ``col``."""
    nib = "strpos('0123456789abcdef', substr({c}, CAST({p} AS INT), 1)) - 1"
    return ("(" + " + ".join(
        f"({nib.format(c=col, p=f'({pos}) + {k}')}) * {16 ** (3 - k)}"
        for k in range(4)) + ")")


def _audio_energy_oracle() -> str:
    return f"""
    WITH {_mm_base_cte()},
    au AS (SELECT i, p FROM dg WHERE modality = 'audio'),
    w AS (
      SELECT i, p, CAST(u.wi AS BIGINT) AS window_idx
      FROM au CROSS JOIN unnest(range(0, length(p) // 32)) AS u(wi)
    ), sm AS (
      SELECT i, window_idx,
             {_hex4('p', 'window_idx*32 + s.si*4 + 1')} AS v
      FROM w CROSS JOIN unnest(range(0, 8)) AS s(si)
    )
    SELECT i AS asset_id, window_idx, CAST(SUM(v * v) AS BIGINT) AS energy
    FROM sm GROUP BY 1, 2 ORDER BY 1, 2
    """


@register(
    "mm_audio_window_energy",
    oracle=_audio_energy_oracle(),
    tags=["multimodal", "audio"],
)
def mm_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform framing over the audio assets: 8-sample non-overlapping
    frames, exact integer energy Σ s² per frame — the VAD / feature
    front-end shape.  The fixture payload is ASCII-hex so each 16-bit
    sample is a 4-hex-char group the oracle re-parses with nibble
    lookups; the whole pipeline (binary column → modality-pruned scan →
    map-side mapInPandas → skinny long output) is value-hash-checked."""
    from ..operators import multimodal
    assets = multimodal.synthetic_assets(spark, n=64)
    return (multimodal.audio_window_energy(assets, window=8)
            .orderBy("asset_id", "window_idx"))


# ---------------------------------------------------------------------------
# cohort retention (events analytics)
# ---------------------------------------------------------------------------

@register(
    "cohort_retention_daily",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             datediff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_active
    FROM activity GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["events", "cohort", "retention"],
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, then
    distinct active users per (cohort, day-offset) — the
    activation/retention triangle every growth/engagement pipeline
    produces.  Plan: first-seen via one groupBy(user) min; the
    activity join is user-keyed (broadcast at this SF, shuffle-hash at
    100 TB where both sides partition on user_id); the DISTINCT
    collapses (user, cohort, offset) map-side before the final count —
    nothing materializes per event after that point.  All-integer
    output, bit-portable."""
    (events,) = _t(spark, sf_dir, "events")
    ev = events.select("user_id", F.col("ts").cast("date").alias("d"))
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    activity = (ev.join(firsts, "user_id")
                .select("user_id", "cohort",
                        F.datediff("d", "cohort").alias("day_offset"))
                .distinct())
    return (activity.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_day", "day_offset"))


# ---------------------------------------------------------------------------
# BPE merge training (tokenizer training — the pagerank-style unrolled oracle)
# ---------------------------------------------------------------------------

def _bpe_oracle_sql(n_merges: int) -> str:
    """Unroll ``n_merges`` BPE iterations as CTE layers (the
    `graph_pagerank_jaccard` pattern: an iterative algorithm under the
    full value-hash gate).  Greedy left-to-right merge application is
    expressed relationally: match positions → consecutive-match chains
    (gaps-and-islands) → even-offset parity selection, which is exactly
    the no-re-merge scan rule the Spark fold implements."""
    ctes = ["""
w AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
    FROM documents WHERE text IS NOT NULL)
  WHERE word <> '' GROUP BY word),
s0 AS (
  SELECT word, freq,
         unnest(generate_series(1, length(word))) AS pos,
         unnest(string_split(word, '')) AS sym
  FROM w)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        ctes.append(f"""
c{k} AS (
  SELECT l, r, SUM(freq) AS cnt FROM (
    SELECT freq, sym AS l,
           lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r
    FROM s{p})
  WHERE r IS NOT NULL GROUP BY l, r),
t{k} AS (SELECT l, r, cnt FROM c{k} ORDER BY cnt DESC, l, r LIMIT 1),
m{k} AS (
  SELECT s.word, s.freq, s.pos, s.sym, t.l, t.r,
         COALESCE(s.sym = t.l AND
                  lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = t.r,
                  FALSE) AS mt
  FROM s{p} s CROSS JOIN t{k} t),
g{k} AS (
  SELECT *, CASE WHEN mt THEN
      pos - row_number() OVER (PARTITION BY word, mt ORDER BY pos) END AS chain
  FROM m{k}),
e{k} AS (
  SELECT *, mt AND ((row_number() OVER (PARTITION BY word, chain ORDER BY pos)
                     - 1) % 2 = 0) AS sel
  FROM g{k}),
s{k} AS (
  SELECT word, freq,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN sel THEN l || r ELSE sym END AS sym
  FROM (SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos),
                           FALSE) AS consumed
        FROM e{k})
  WHERE sel OR NOT consumed)""")
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS merge_rank, l AS left_sym, "
        f"r AS right_sym, l || r AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, n_merges + 1))
    return "WITH " + ",".join(ctes) + "\n" + finals + "\nORDER BY merge_rank"


def _bpe_apply_oracle_sql(n_merges: int) -> str:
    """Apply-side oracle: per-word segment sizes from the final CTE
    layer, joined back to the documents' exploded words."""
    body = _bpe_oracle_sql(n_merges)
    ctes = body[:body.rindex("\nSELECT CAST(1 AS INT)")]  # keep WITH chain
    return ctes + f""",
    seg AS (SELECT word, MAX(pos) AS n_sub FROM s{n_merges} GROUP BY word),
    dw AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(seg.n_sub) AS BIGINT) AS n_subword_tokens,
           CAST(SUM(length(word)) AS BIGINT) AS n_chars
    FROM dw JOIN seg USING (word)
    WHERE word <> ''
    GROUP BY doc_id ORDER BY doc_id LIMIT 20
    """


@register(
    "text_bpe_merges",
    oracle=_bpe_oracle_sql(3),
    tags=["text", "tokenizer", "bpe", "iterative"],
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges trained on the documents corpus (operator:
    `operators/text.bpe_train_merges`).  The corpus collapses to the
    vocabulary-sized (word, freq) relation after one scan, so each
    iteration's pair-count shuffle is tiny regardless of corpus bytes —
    the property that makes tokenizer training feasible at 100 TB.
    Deterministic tie-break, all-integer counts, greedy merge semantics
    proven equal between the Spark fold and the oracle's window-parity
    formulation."""
    from ..operators.text import bpe_train_merges

    (docs,) = _t(spark, sf_dir, "documents")
    return bpe_train_merges(docs, "text", n_merges=3)


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters — deterministic, fully hash-checked
# ---------------------------------------------------------------------------

def _cms_oracle_sql(depth: int = 3, width: int = 64) -> str:
    from .queries_ext import _hex15_to_long

    seeds = ",".join(f"({i})" for i in range(depth))
    h = _hex15_to_long("m")
    return f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
      WHERE user_id IS NOT NULL),
    bb AS (
      SELECT k, i, {h} % {width} AS bucket
      FROM (SELECT k, i, md5(CAST(i AS VARCHAR) || '|' || k) AS m
            FROM ev CROSS JOIN (VALUES {seeds}) t(i))),
    sk AS (SELECT i, bucket, COUNT(*) AS cnt FROM bb GROUP BY i, bucket),
    ex AS (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 10),
    qb AS (
      SELECT user_id, exact_cnt, i, {h} % {width} AS bucket
      FROM (SELECT ex.user_id, ex.exact_cnt, t.i,
                   md5(CAST(t.i AS VARCHAR) || '|'
                       || CAST(ex.user_id AS VARCHAR)) AS m
            FROM ex CROSS JOIN (VALUES {seeds}) t(i))),
    est AS (
      SELECT user_id, exact_cnt, MIN(COALESCE(sk.cnt, 0)) AS cms_est
      FROM qb LEFT JOIN sk USING (i, bucket)
      GROUP BY user_id, exact_cnt)
    SELECT user_id, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           cms_est >= exact_cnt AS est_ge_exact
    FROM est ORDER BY exact_cnt DESC, user_id
    """


@register(
    "a12_countmin_heavy_hitters",
    oracle=_cms_oracle_sql(),
    tags=["sketch", "countmin", "heavy-hitters"],
)
def a12_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the top-10 heavy-hitter
    users (operator: `operators/profile.countmin_sketch/estimates`).
    The sketch is depth×width rows independent of input size and
    additive across shards/days — the fixed-memory alternative when
    exact per-key counts stop fitting a shuffle.  Deterministic md5
    bucket hashing makes every cell reproducible in DuckDB, so the
    estimates themselves are value-hash-checked (not just bounded);
    `est_ge_exact` additionally pins the sketch's one-sided overcount
    guarantee.  Plan: one map-side-combined sketch aggregate + one
    exact top-10 aggregate + a broadcast probe join."""
    from ..operators.profile import countmin_estimates, countmin_sketch

    (events,) = _t(spark, sf_dir, "events")
    ev = events.where(F.col("user_id").isNotNull())
    sketch = countmin_sketch(ev, "user_id", depth=3, width=64)
    exact = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), F.asc("user_id")).limit(10))
    est = countmin_estimates(exact, sketch, "user_id", depth=3, width=64)
    return (exact.join(est, "user_id")
            .select("user_id", "exact_cnt",
                    F.col("cms_est").cast("long").alias("cms_est"),
                    (F.col("cms_est") >= F.col("exact_cnt"))
                    .alias("est_ge_exact"))
            .orderBy(F.desc("exact_cnt"), F.asc("user_id")))


# ---------------------------------------------------------------------------
# containment (asymmetric Jaccard) dedup — doc-inside-doc detection
# ---------------------------------------------------------------------------

@register(
    "dedup_containment_pairs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT a, b, CAST(inter AS BIGINT) AS inter,
             CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
             CAST(inter * 1000000 // sa.sz AS BIGINT) AS cont_a_in_b_ppm,
             CAST(inter * 1000000 // sb.sz AS BIGINT) AS cont_b_in_a_ppm
      FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id)
    SELECT a, b, inter, sz_a, sz_b, cont_a_in_b_ppm, cont_b_in_a_ppm,
           CASE WHEN cont_a_in_b_ppm >= 700000 AND cont_b_in_a_ppm >= 700000
                THEN 'both'
                WHEN cont_a_in_b_ppm >= 700000 THEN 'a'
                ELSE 'b' END AS contained_side
    FROM j
    WHERE greatest(cont_a_in_b_ppm, cont_b_in_a_ppm) >= 700000
    ORDER BY a, b
    """,
    tags=["dedup", "containment"],
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment pairs at threshold 0.7 (operator:
    `operators/dedup.containment_pairs`) — catches subset/quotation
    duplicates whose symmetric Jaccard stays low.  Exact integer ppm on
    both directions, fully value-hash-checked."""
    from ..cache import shared_containment_pairs

    return (shared_containment_pairs(spark, sf_dir, n=3, threshold=0.7)
            .orderBy("a", "b"))


# ---------------------------------------------------------------------------
# bigram-LM fluency (gibberish filter) — integer-exact KenLM-style scoring
# ---------------------------------------------------------------------------

@register(
    "text_lm_fluency_bottom",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ), bg AS (
      SELECT doc_id,
             unnest(list_slice(t, 1, len(t) - 1)) AS l,
             unnest(list_slice(t, 2, len(t))) AS r
      FROM toks WHERE len(t) >= 2
    ), c2 AS (SELECT l, r, COUNT(*) AS c2 FROM bg GROUP BY l, r),
    c1 AS (SELECT l, COUNT(*) AS c1 FROM bg GROUP BY l),
    scored AS (
      SELECT bg.doc_id, CAST(c2.c2 * 1000000 // c1.c1 AS BIGINT) AS ppm
      FROM bg JOIN c2 ON bg.l = c2.l AND bg.r = c2.r
              JOIN c1 ON bg.l = c1.l)
    SELECT doc_id,
           CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS score_ppm,
           COUNT(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    ORDER BY score_ppm ASC, doc_id LIMIT 10
    """,
    tags=["text", "quality", "lm"],
)
def text_lm_fluency_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-10 documents by self-trained bigram-LM fluency (operator:
    `operators/text.lm_fluency_scores`) — the lowest average P(next|cur)
    in exact ppm; the corpus's least-fluent documents are the gibberish/
    shuffled-text candidates a quality gate drops.  The LM is trained
    and applied in the same plan: counts are vocabulary-bounded, scoring
    is one bigram-keyed join, TakeOrdered caps the output."""
    from ..operators.text import lm_fluency_scores

    (docs,) = _t(spark, sf_dir, "documents")
    return (lm_fluency_scores(docs)
            .orderBy(F.asc("score_ppm"), F.asc("doc_id")).limit(10))


# ---------------------------------------------------------------------------
# integer-exact rolling z-score anomalies over daily revenue
# ---------------------------------------------------------------------------

@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(floor(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)
               AS rev_usd
      FROM orders GROUP BY 1
    ), stats AS (
      SELECT day, rev_usd,
             COUNT(rev_usd) OVER w AS n_window,
             SUM(rev_usd) OVER w AS s1,
             SUM(rev_usd * rev_usd) OVER w AS s2
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           rev_usd,
           CAST(n_window AS BIGINT) AS n_window,
           CAST(s1 AS BIGINT) AS win_sum,
           CAST(s2 AS BIGINT) AS win_sumsq,
           n_window >= 4 AND
             (n_window * rev_usd - s1) * (n_window * rev_usd - s1)
               > 9 * (n_window * s2 - s1 * s1) AS is_anomaly
    FROM stats ORDER BY day
    """,
    tags=["timeseries", "anomaly", "window"],
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue anomaly flags via trailing-7-day z>3 in exact
    integer arithmetic (operator: `operators/timeseries.
    rolling_zscore_anomalies`) — no sqrt, no float, every flag
    value-hash-checked.  Revenue floors to whole dollars through an
    exact decimal sum first, so both engines window over identical
    bigints."""
    from ..operators.timeseries import rolling_zscore_anomalies

    (orders,) = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
                  .cast("long").alias("rev_usd")))
    out = rolling_zscore_anomalies(daily, day_col="d", value_col="rev_usd",
                                   window=7, z=3)
    return (out.select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                       "rev_usd", "n_window", "win_sum", "win_sumsq",
                       "is_anomaly")
            .orderBy("day"))


# ---------------------------------------------------------------------------
# dedup-aware training weights (1 / near-dup cluster size)
# ---------------------------------------------------------------------------

@register(
    "mix_dedup_weights",
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT i.a, i.b FROM (
        SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
        FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
        GROUP BY 1, 2
      ) i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
      WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
    ), nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
    sym AS (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ), comp AS (SELECT src AS n, MIN(dst) AS component FROM reach GROUP BY src),
    alldocs AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.n),
    szs AS (SELECT component, COUNT(*) AS cluster_size
            FROM alldocs GROUP BY component)
    SELECT doc_id, component, CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
    FROM alldocs JOIN szs USING (component)
    ORDER BY doc_id
    """,
    tags=["mixing", "dedup", "weights"],
)
def mix_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware training weights: every document weighted
    1/|near-dup cluster| in exact ppm — the soft-dedup alternative to
    dropping duplicates (each cluster contributes ~1 document of total
    mass, so boilerplate families stop dominating the loss).  Reuses the
    session-shared connected components (cache.py) — marginal cost is
    one count per component + a doc-keyed broadcast join."""
    from ..cache import shared_components

    (docs,) = _t(spark, sf_dir, "documents")
    comp = shared_components(spark, sf_dir)
    j = (docs.select("doc_id")
         .join(F.broadcast(comp), docs["doc_id"] == comp["n"], "left")
         .select("doc_id",
                 F.coalesce("component", "doc_id").alias("component")))
    sizes = j.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (j.join(F.broadcast(sizes), "component")
            .select("doc_id", "component", "cluster_size",
                    F.expr("1000000L div cluster_size").alias("weight_ppm"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# Matryoshka (prefix-dim) retrieval recall — full vs truncated embeddings
# ---------------------------------------------------------------------------

@register(
    "sim_matryoshka_recall",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 1),
    fullk AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), 6) AS sim
      FROM embeddings e, q ORDER BY sim DESC, e.vec_id LIMIT 20),
    pq AS (SELECT list_slice(qv, 1, 16) AS qv16 FROM q),
    pref AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(
               list_slice(CAST(e.embedding AS DOUBLE[]), 1, 16),
               pq.qv16), 6) AS sim16
      FROM embeddings e, pq ORDER BY sim16 DESC, e.vec_id LIMIT 20)
    SELECT f.vec_id, f.sim,
           p.vec_id IS NOT NULL AS in_m16_topk
    FROM fullk f LEFT JOIN pref p ON f.vec_id = p.vec_id
    ORDER BY f.sim DESC, f.vec_id
    """,
    tags=["similarity", "matryoshka"],
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation check (public technique: Kusupati et
    al. 2022): retrieve with the first 16 of 64 dims — 4× less memory
    and FLOPs, the standard coarse stage of a two-stage 100 TB retrieval
    stack — and mark which exact-top-20 hits the truncated index keeps.
    Both rankings are exact brute-force cosine under the shared rounded
    tie-stable convention; the overlap booleans are value-hash-checked,
    so truncation-recall drift is visible to the gate."""
    from ..operators import similarity

    (emb,) = _t(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 1)
             .select("embedding").first()["embedding"])
    full = similarity.topk_bruteforce(emb, q, k=20)
    pref = similarity.topk_bruteforce(
        emb.withColumn("embedding", F.slice("embedding", 1, 16)),
        q[:16], k=20)
    return (full.join(pref.select("vec_id", F.lit(True).alias("hit")),
                      "vec_id", "left")
            .select("vec_id", "sim",
                    F.coalesce("hit", F.lit(False)).alias("in_m16_topk"))
            .orderBy(F.desc("sim"), "vec_id"))


# ---------------------------------------------------------------------------
# session path mining — top within-session event-type trigrams
# ---------------------------------------------------------------------------

@register(
    "sess3_top_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WHERE event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ), g AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
                        || '>' || LEAD(event_type, 2) OVER w2 AS path,
             LEAD(event_type, 2) OVER w2 IS NOT NULL AS complete
      FROM s
      WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, COUNT(*) AS n_occurrences
    FROM g WHERE complete
    GROUP BY path ORDER BY n_occurrences DESC, path LIMIT 10
    """,
    tags=["sessions", "paths", "window"],
)
def sess3_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 within-session 3-step event-type journeys (operator:
    `operators/sessions.top_session_paths`) — session-bounded behavioral
    n-grams, so an overnight gap never fabricates a path.  Windows stay
    partitioned by (user, session); the global count is map-side
    combined; TakeOrdered caps the output."""
    from ..operators.sessions import top_session_paths

    (events,) = _t(spark, sf_dir, "events")
    return top_session_paths(events, n=3, k=10)


# ---------------------------------------------------------------------------
# semantic dedup: embedding-cosine pair graph -> clusters + survivors
# ---------------------------------------------------------------------------

@register(
    "dedup_semantic_components",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    ), nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
    sym AS (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ), comp AS (SELECT src AS n, MIN(dst) AS component
                FROM reach GROUP BY src)
    SELECT component,
           COUNT(*) AS cluster_size,
           MIN(n) AS survivor_vec_id,
           list_aggregate(list(n ORDER BY n), 'string_agg', ',') AS members
    FROM comp GROUP BY component ORDER BY component
    """,
    tags=["dedup", "similarity", "semantic", "graph"],
)
def dedup_semantic_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (public technique: SemDeDup, Abbas et al. 2023):
    embedding-cosine near-dup pairs (≥0.4) → connected components →
    one survivor per semantic cluster.  Composes the exact cosine pair
    graph with the iterative min-label propagation (`operators/graph.
    connected_components`); the oracle re-derives components with a
    recursive CTE, so the cluster assignment itself is hash-checked.
    Scale: pair generation runs behind the sign-LSH bucketing
    (`ann_cosine_pairs_lsh`) at 100 TB; CC is O(diameter) rounds."""
    from ..cache import shared_semantic_components

    comp = shared_semantic_components(spark, sf_dir, threshold=0.4)
    return (comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.min("n").alias("survivor_vec_id"),
                 F.array_join(F.array_sort(F.collect_list("n")), ",")
                 .alias("members"))
            .orderBy("component"))


# ---------------------------------------------------------------------------
# embedding outliers: farthest vectors from their label centroid (exact)
# ---------------------------------------------------------------------------

@register(
    "emb_centroid_outliers",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label,
             unnest(generate_series(0, len(embedding) - 1)) AS pos,
             CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 10000)
                  AS BIGINT) AS x
      FROM embeddings
    ), cent AS (
      SELECT label, pos, SUM(x) AS s, COUNT(*) AS n
      FROM ex GROUP BY label, pos
    ), d AS (
      SELECT e.vec_id, e.label,
             SUM((c.n * e.x - c.s) * (c.n * e.x - c.s)) AS d2,
             MAX(c.n) AS n
      FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.vec_id, e.label)
    SELECT vec_id, label,
           CAST(d2 // (n * n) AS BIGINT) AS d2_norm
    FROM d ORDER BY d2_norm DESC, vec_id LIMIT 10
    """,
    tags=["similarity", "quality", "outliers"],
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 embedding outliers: squared distance to the own-label
    centroid in EXACT scaled-integer math — the mislabeled/garbage-
    vector screen an embedding pipeline runs before training a
    classifier head.  With per-label count n, centroid component s_j/n,
    and x_j = floor(v_j·10⁴):  n²·dist² = Σ_j (n·x_j − s_j)², all
    bigint; ranking on floor(Σ/n²) is portable and deterministic.
    int64-safe while (n·scale·max|v|)² · dims < 9.2e18 — widen to
    decimal(38,0) past ~50k rows/label at this scale.  Plan: centroid =
    one (label,pos) shuffle of O(labels × dims) rows; distances via a
    broadcast join of that small relation; top-10 by TakeOrdered."""
    from ..operators.similarity import centroid_by_label

    (emb,) = _t(spark, sf_dir, "embeddings")
    scale = 10_000
    cent = centroid_by_label(emb, scale=scale)
    ex = (emb.select("vec_id", "label",
                     F.posexplode("embedding").alias("pos", "__v"))
          .withColumn("x", F.floor(F.col("__v").cast("double")
                                   * F.lit(scale))))
    diff = F.col("n") * F.col("x") - F.col("sum_scaled")
    d = (ex.join(F.broadcast(cent), ["label", "pos"])
         .groupBy("vec_id", "label")
         .agg(F.sum(diff * diff).alias("d2"), F.max("n").alias("n")))
    return (d.select("vec_id", "label",
                     F.expr("d2 div (n * n)").alias("d2_norm"))
            .orderBy(F.desc("d2_norm"), F.asc("vec_id")).limit(10))


# ---------------------------------------------------------------------------
# whole-catalog audit: rows / key nulls / key duplicates per table
# ---------------------------------------------------------------------------

_CATALOG_KEYS = [
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"), ("events", "event_id"),
    ("documents", "doc_id"), ("embeddings", "vec_id"),
]


@register(
    "dq_catalog_audit",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {k} IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_keys,
           COUNT(*) - COUNT(DISTINCT {k}) AS n_extra_dup_keys
    FROM {t}""" for t, k in _CATALOG_KEYS) + "\nORDER BY table_name",
    tags=["dq", "catalog"],
)
def dq_catalog_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-table catalog audit: row count, NULL leading keys,
    and surplus duplicate keys for EVERY registered table — the nightly
    sweep that catches a broken ingest before any downstream query does.
    Each leg is one map-side-combined aggregate over a single-column
    pruned scan (lineitem/events legitimately repeat their leading key;
    the audit reports, not asserts).  Legs union into a 10-row report —
    independent scans, no shuffle interaction, trivially parallel at
    any scale."""
    names = [t for t, _ in _CATALOG_KEYS]
    tables = dict(zip(names, _t(spark, sf_dir, *names)))
    legs = []
    for t, k in _CATALOG_KEYS:
        legs.append(tables[t].agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(k).isNull().cast("long")).alias("n_null_keys"),
            (F.count(F.lit(1)) - F.count_distinct(F.col(k)))
            .alias("n_extra_dup_keys"))
            .select(F.lit(t).alias("table_name"), "n_rows",
                    "n_null_keys", "n_extra_dup_keys"))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("table_name")


@register(
    "text_bpe_token_counts",
    oracle=_bpe_apply_oracle_sql(3),
    tags=["text", "tokenizer", "bpe"],
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: subword tokens per document under the
    corpus-trained 3-merge BPE vocabulary (operator: `operators/text.
    bpe_token_counts`) — train and apply in one plan; the document side
    pays one word-keyed join against the vocabulary-sized segmentation
    relation.  First 20 docs by id, all-integer, hash-checked."""
    from ..operators.text import bpe_token_counts

    (docs,) = _t(spark, sf_dir, "documents")
    return (bpe_token_counts(docs, n_merges=3)
            .orderBy("doc_id").limit(20))


# ---------------------------------------------------------------------------
# KS drift per segment — cogroup/applyInPandas, integer-exact D statistic
# ---------------------------------------------------------------------------

@register(
    "prof_ks_drift_by_status",
    oracle="""
    WITH u AS (
      SELECT o_orderstatus AS k, o_totalprice AS v, 'l' AS side
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderstatus, o_totalprice, 'r'
      FROM orders WHERE o_orderpriority = '5-LOW'
    ), n AS (
      SELECT k,
             SUM(CASE side WHEN 'l' THEN 1 ELSE 0 END) AS n1,
             SUM(CASE side WHEN 'r' THEN 1 ELSE 0 END) AS n2
      FROM u GROUP BY k
    ), c AS (
      SELECT k, v,
             SUM(CASE side WHEN 'l' THEN 1 ELSE 0 END)
               OVER (PARTITION BY k ORDER BY v) AS c1,
             SUM(CASE side WHEN 'r' THEN 1 ELSE 0 END)
               OVER (PARTITION BY k ORDER BY v) AS c2
      FROM u
    )
    SELECT c.k AS o_orderstatus,
           CAST(n.n1 AS BIGINT) AS n_left,
           CAST(n.n2 AS BIGINT) AS n_right,
           CAST(MAX(ABS(n.n2 * c.c1 - n.n1 * c.c2)) AS BIGINT) AS ks_num
    FROM c JOIN n ON c.k = n.k
    GROUP BY c.k, n.n1, n.n2
    ORDER BY o_orderstatus
    """,
    tags=["profile", "drift", "cogroup"],
)
def prof_ks_drift_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status KS drift between URGENT and LOW priority order-value
    distributions (operator: `operators/profile.ks_drift_cogroup`) —
    the integer-exact D statistic × n1·n2, computed through the cogroup
    Arrow path and reproduced by the oracle with RANGE-cumulative
    windows (ties included on both sides by construction)."""
    from ..operators.profile import ks_drift_cogroup

    (orders,) = _t(spark, sf_dir, "orders")
    left = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_orderstatus"), F.col("o_totalprice")))
    right = (orders.filter(F.col("o_orderpriority") == "5-LOW")
             .select(F.col("o_orderstatus"), F.col("o_totalprice")))
    return (ks_drift_cogroup(left, right, "o_orderstatus", "o_totalprice")
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# prefix-filtered exact similarity join (PPJoin) — lossless by oracle proof
# ---------------------------------------------------------------------------

@register(
    "dedup_jaccard_prefix_filter",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
    ORDER BY a, b
    """,
    tags=["dedup", "prefix-filter"],
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs (operator: `operators/dedup.
    jaccard_pairs_prefix_filter`).  The oracle is the FULL postings
    self-join — a hash match is a machine-checked proof that the prefix
    index (rare-grams-first canonical order, |d|−⌈t·|d|⌉+1 prefix) loses
    no pair at threshold 0.5.  The exact-join alternative to LSH when
    false negatives are unacceptable."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (dedup.jaccard_pairs_prefix_filter(docs, threshold=0.5)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
            .orderBy("a", "b"))


# ---------------------------------------------------------------------------
# versioned-table pruned read, end to end under the oracle gate
# ---------------------------------------------------------------------------

_VERSIONED_ORDERS: dict = {}


def _drop_versioned_orders(keys=None) -> None:
    import shutil

    for k in list(_VERSIONED_ORDERS) if keys is None else list(keys):
        shutil.rmtree(_VERSIONED_ORDERS.pop(k), ignore_errors=True)


@fixture_timed("versioned_orders_r5")
def _versioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Once per (session, sf_dir): snapshot `orders` into a temp
    versioned table and compact clustered by o_orderkey, so the pruned
    read below exercises the real manifest/stats path.  Temp trees are
    removed at interpreter exit, and a new session evicts (and deletes)
    any previous session's tables — no /tmp accumulation across runs."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    t = _VERSIONED_ORDERS.get(key)
    if t is None:
        _drop_versioned_orders(
            [k for k in _VERSIONED_ORDERS if k[0] != app_id])
        if not _VERSIONED_ORDERS:
            atexit.register(_drop_versioned_orders)
        t = tempfile.mkdtemp(prefix="spark_graft_vorders_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        _VERSIONED_ORDERS[key] = t
    return t


@register(
    "scale_versioned_pruned_read",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
           TRUE AS pruned_ok
    FROM orders WHERE o_orderkey < 1000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=["scale", "versioned", "skipping"],
)
def scale_versioned_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end data skipping under the value-hash gate: `orders` is
    committed to a manifest-versioned table (once per session), compacted
    into 8 files clustered by o_orderkey, then read back with a key-range
    predicate — `prune_files` must drop files (pruned_ok, oracle expects
    TRUE) and the surviving rows must aggregate to exactly what plain SQL
    over the raw table gives.  The proof that the manifest stats path
    returns the same answer as a full scan, visible to the driver's
    correctness gate, not only to pytest."""
    from ..sinks import versioned as V

    t = _versioned_orders(spark, sf_dir)
    preds = [("o_orderkey", "<", 1000)]
    # read_version prunes again internally; both passes are driver-side
    # manifest-JSON work, O(|files|) — accepted for the API simplicity
    kept, total = V.prune_files(t, V.latest_version(t), preds)
    df = V.read_version(spark, t, predicates=preds)
    return (df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("pruned_ok", F.lit(len(kept) < total))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# within-session Markov transition matrix (exact ppm)
# ---------------------------------------------------------------------------

@register(
    "sess4_markov_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WHERE event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ), tr AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id, session_id
                                    ORDER BY ts, event_id) AS to_type
      FROM s
    ), c AS (
      SELECT from_type, to_type, COUNT(*) AS cnt FROM tr
      WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    ), tot AS (SELECT from_type, SUM(cnt) AS total FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
           CAST(c.cnt * 1000000 // t.total AS BIGINT) AS p_ppm
    FROM c JOIN tot t ON c.from_type = t.from_type
    ORDER BY c.from_type, c.to_type
    """,
    tags=["sessions", "markov", "window"],
)
def sess4_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition matrix P(next|current) in
    exact ppm — the first-order Markov model behind journey simulation
    and anomaly scoring; transitions never cross a session gap.  Same
    session-bounded lead windows as `sess3_top_paths`; the conditional
    probabilities are integer ppm (cnt·10⁶ div row total), so the full
    matrix is value-hash-checked."""
    from pyspark.sql import Window

    from ..operators.sessions import sessionize

    (events,) = _t(spark, sf_dir, "events")
    s = sessionize(events.filter(F.col("event_type").isNotNull()),
                   30, "user_id", "ts", "event_id")
    w = (Window.partitionBy("user_id", "session_id")
         .orderBy("ts", "event_id"))
    tr = (s.select(F.col("event_type").alias("from_type"),
                   F.lead("event_type").over(w).alias("to_type"))
          .filter(F.col("to_type").isNotNull()))
    c = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("cnt"))
    tot = c.groupBy("from_type").agg(F.sum("cnt").alias("total"))
    return (c.join(tot, "from_type")
            .select("from_type", "to_type", "cnt",
                    F.expr("cnt * 1000000L div total").alias("p_ppm"))
            .orderBy("from_type", "to_type"))


# ---------------------------------------------------------------------------
# quality-mass quota mixing + Gini impurity profiling (integer-exact)
# ---------------------------------------------------------------------------

@register(
    "mix_quality_mass_quota",
    oracle="""
    WITH d AS (
      SELECT source, doc_id, n_chars FROM documents
      WHERE n_chars IS NOT NULL
    ), c AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_chars
               AS cum_before,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM d
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM c WHERE 2 * cum_before < total
    ORDER BY source, n_chars DESC, doc_id
    """,
    tags=["mixing", "quota", "window"],
)
def mix_quality_mass_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-quota selection: per source domain, keep the largest
    documents until 50% of the domain's total character MASS is covered
    (the doc crossing the boundary is included) — the mass-based cousin
    of `mix_domain_topk`'s count quota, used when domains should
    contribute equal token budgets, not equal document counts.
    Windows stay partitioned by source; the keep rule 2·cum_before <
    total is pure integer math, deterministic under the (n_chars DESC,
    doc_id) order."""
    from pyspark.sql import Window

    (docs,) = _t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
         .orderBy(F.desc("n_chars"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("source")
    d = docs.filter(F.col("n_chars").isNotNull())
    c = (d.select("source", "doc_id", "n_chars")
         .withColumn("cum_before",
                     F.sum("n_chars").over(w) - F.col("n_chars"))
         .withColumn("total", F.sum("n_chars").over(wt)))
    return (c.filter(2 * F.col("cum_before") < F.col("total"))
            .select("source", "doc_id", "n_chars", "cum_before")
            .orderBy("source", F.desc("n_chars"), "doc_id"))


@register(
    "prof_gini_impurity",
    oracle="""
    WITH legs AS (
      SELECT 'o_orderpriority' AS column_name, o_orderpriority AS v
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
    ), c AS (
      SELECT column_name, v, COUNT(*) AS cnt FROM legs
      GROUP BY column_name, v
    ), t AS (
      SELECT column_name, SUM(cnt) AS total, COUNT(*) AS n_values
      FROM c GROUP BY column_name
    )
    SELECT c.column_name,
           CAST(t.n_values AS BIGINT) AS n_values,
           CAST(1000000 - SUM(((cnt * 1000000 // total)
                               * (cnt * 1000000 // total)) // 1000000)
                AS BIGINT) AS gini_ppm
    FROM c JOIN t ON c.column_name = t.column_name
    GROUP BY c.column_name, t.n_values
    ORDER BY c.column_name
    """,
    tags=["profile", "impurity"],
)
def prof_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity per categorical column, 1 − Σ pᵢ² in EXACT ppm —
    the log-free concentration measure (entropy needs ln, whose last-ulp
    differs across libm builds; Gini is pure integer multiply/divide, so
    it hash-checks).  Low gini = one value dominates (a skew/constant-
    column alarm).  One map-side-combined count per column leg; the Σ is
    over value counts, never rows."""
    (orders,) = _t(spark, sf_dir, "orders")
    legs = []
    for col in ("o_orderpriority", "o_orderstatus"):
        c = (orders.groupBy(F.col(col).alias("v"))
             .agg(F.count(F.lit(1)).alias("cnt"))
             .select(F.lit(col).alias("column_name"), "v", "cnt"))
        legs.append(c)
    c = legs[0].unionByName(legs[1])
    t = c.groupBy("column_name").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_values"))
    return (c.join(t, "column_name")
            .groupBy("column_name", "n_values")
            .agg((F.lit(1_000_000)
                  - F.sum(F.expr(
                      "((cnt * 1000000L div total)"
                      " * (cnt * 1000000L div total)) div 1000000L")))
                 .cast("long").alias("gini_ppm"))
            .select("column_name", "n_values", "gini_ppm")
            .orderBy("column_name"))

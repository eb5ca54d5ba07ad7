"""Operational / observability queries: column profiling, skew
diagnostics, histograms, time profiles, corpus vocabulary signals,
embedding quantization, and the plain-SQL passthrough surface.

These are the "measure before you shard" ops a 100 TB pipeline runs
ahead of partitioning decisions (the reference's analog is the
directory-size aggregation that precedes its bin-packing —
`/root/reference/generate-file-list.py`), generalized to arbitrary
columns and registered in the same oracle-checked registry as
everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import profile, similarity, text
from ..session import register_views
from .queries import _t, register

# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------

_ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"]


def _profile_oracle() -> str:
    parts = []
    for c in _ORDER_COLS:
        mn = (f"CAST(CAST(MIN({c}) AS DECIMAL(18,2)) AS VARCHAR)"
              if c == "o_totalprice" else f"CAST(MIN({c}) AS VARCHAR)")
        mx = (f"CAST(CAST(MAX({c}) AS DECIMAL(18,2)) AS VARCHAR)"
              if c == "o_totalprice" else f"CAST(MAX({c}) AS VARCHAR)")
        parts.append(f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {mn} AS min_s, {mx} AS max_s
        FROM orders""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "prof_orders_columns",
    oracle=_profile_oracle(),
    tags=["profile", "A5"],
)
def prof_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of `orders`: rows, nulls, exact distinct,
    min/max — one scan, one multi-distinct aggregate (Expand); the
    100 TB variant flips `exact=False` for HLL sketches (no Expand).
    See operators/profile.py for the full scale analysis."""
    (orders,) = _t(spark, sf_dir, "orders")
    return profile.profile_columns(orders, _ORDER_COLS).orderBy("col_name")


@register(
    "prof_skew_events_user",
    oracle="""
    WITH total AS (SELECT COUNT(*) AS t FROM events),
    counts AS (
      SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT key, cnt, CAST(cnt * 1000000 // t AS BIGINT) AS share_ppm
    FROM counts, total
    ORDER BY cnt DESC, key ASC LIMIT 20
    """,
    tags=["profile", "A1"],
)
def prof_skew_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter keys of events.user_id with integer ppm shares —
    the diagnostic that decides whether a downstream join on user_id
    needs salting (`operators/scale.py`).  Counts partial-aggregate
    map-side, so the profile never suffers the skew it measures."""
    (events,) = _t(spark, sf_dir, "events")
    return profile.skew_key_profile(events, "user_id", top_n=20)


@register(
    "prof_hist_order_totals",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket
      FROM orders
    )
    SELECT bucket, bucket * CAST(20000.0 AS DOUBLE) AS bucket_lo, COUNT(*) AS cnt
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=["profile", "A5"],
)
def prof_hist_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (floor-bucket math is
    bit-deterministic across engines — no sampling, no quantiles)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return profile.histogram(orders, "o_totalprice", width=20000.0)


@register(
    "prof_events_time_profile",
    oracle="""
    SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
           CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2 ORDER BY dow, hour
    """,
    tags=["profile", "A1"],
)
def prof_events_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume by day-of-week × hour-of-day — capacity-planning
    profile.  Day-of-week from pure epoch-microsecond integer math
    ((days+4) % 7, 1970-01-01 being a Thursday ⇒ 0=Sunday) so Spark and
    DuckDB agree without touching either engine's dow() convention."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
            F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("dow", "hour")
    )


# ---------------------------------------------------------------------------
# corpus vocabulary / embedding quantization
# ---------------------------------------------------------------------------

@register(
    "text_hapax_ratio",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                t -> t <> '')) AS tok
      FROM documents
    ), tc AS (
      SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             COUNT(tok) AS n_distinct,
             CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM tc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.n_distinct, 0) AS n_distinct,
           COALESCE(a.n_hapax, 0) AS n_hapax,
           CASE WHEN COALESCE(a.n_distinct, 0) > 0
                THEN a.n_hapax * 1.0 / a.n_distinct END AS hapax_ratio
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id
    """,
    tags=["text"],
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per document (hapax = once-only token):
    boilerplate detector alongside repetition_signals.  The ratio is a
    single integer÷integer double division — engine-portable."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.hapax_stats(docs).orderBy("doc_id")


@register(
    "emb_quantize_int8",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx,
             embedding
      FROM embeddings
    ), ex AS (
      SELECT vec_id, mn, mx, CAST(unnest(embedding) AS DOUBLE) AS v
      FROM base
    )
    SELECT vec_id, COUNT(*) AS n_dims,
           CAST(SUM(CASE WHEN mx = mn THEN 0
                         ELSE LEAST(255, CAST(FLOOR((v - mn) * 255.0 / (mx - mn))
                                              AS BIGINT)) END) AS BIGINT) AS code_sum,
           MIN(mn) AS mn, MIN(mx) AS mx
    FROM ex GROUP BY vec_id ORDER BY vec_id
    """,
    tags=["similarity", "embedding"],
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization stats per embedding — the compression
    stage of an ANN index build, with bit-portable floor/IEEE math so
    the exact code sums hash-match across engines."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return similarity.quantize_int8_stats(emb).orderBy("vec_id")


# ---------------------------------------------------------------------------
# plain-SQL passthrough surface
# ---------------------------------------------------------------------------

_PASSTHROUGH_SQL = """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
"""


@register(
    "sql_surface_passthrough",
    oracle=_PASSTHROUGH_SQL,
    tags=["sql", "J1", "A1"],
)
def sql_surface_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: `register_views` + `spark.sql`
    executing the *identical* dialect-shared string the oracle runs —
    zero translation, proving a reference user can bring plain SQL.
    Catalyst still gets the full plan (broadcasts nation/customer,
    pushes the column pruning into every scan)."""
    register_views(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return spark.sql(_PASSTHROUGH_SQL)


# ---------------------------------------------------------------------------
# retrieval index / vocabulary / cluster survivors
# ---------------------------------------------------------------------------

@register(
    "text_inverted_index",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                t -> t <> '')) AS tok
      FROM documents
    ), tc AS (
      SELECT tok, doc_id, COUNT(*) AS tf FROM toks GROUP BY tok, doc_id
    )
    SELECT tok AS term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
           list(doc_id ORDER BY doc_id) AS postings
    FROM tc GROUP BY tok HAVING COUNT(*) >= 3 ORDER BY term
    """,
    tags=["text", "index"],
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus (terms in ≥3 docs): term → sorted
    postings + df/tf.  The contamination-lookup / keyword-search build
    step; see operators/text.inverted_index for the stopword-pruning and
    postings-sharding scale story."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.inverted_index(docs, min_df=3).orderBy("term")


@register(
    "text_vocab_coverage",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                t -> t <> '')) AS term
      FROM documents
    ), tc AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM tc),
    top AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 100)
    SELECT term, cnt,
           CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term
                               ROWS UNBOUNDED PRECEDING) * 1000000 // t
                AS BIGINT) AS cum_ppm
    FROM top, tot ORDER BY cnt DESC, term
    """,
    tags=["text", "profile"],
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 tokens with cumulative corpus coverage in integer ppm —
    the vocabulary-size curve for a tokenizer build.  TakeOrdered top-n;
    the cumulative window is bounded by the parameter, not the data."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.vocab_coverage(docs, top_n=100)


@register(
    "dedup_cluster_reps",
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
    ), comp AS (
      SELECT src AS n, MIN(dst) AS component FROM reach GROUP BY src
    ), j AS (
      SELECT c.component, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn
      FROM comp c JOIN documents d ON c.n = d.doc_id
    )
    SELECT component, doc_id AS rep_doc_id,
           CAST((SELECT COUNT(*) FROM comp c2
                 WHERE c2.component = j.component) AS BIGINT) AS n_members,
           n_chars AS max_n_chars
    FROM j WHERE rn = 1 ORDER BY component
    """,
    tags=["dedup", "graph"],
)
def dedup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection per near-dup cluster: keep the longest member
    (ties to smallest id) — connected components over the exact Jaccard
    pair graph, then one max_by aggregate per component (no window).
    The pair graph + components come from the session-shared checkpoint
    (cache.shared_components): four registry queries consume the same
    subplan, so it is computed once per session, not per query."""
    from ..cache import shared_components
    from ..operators.graph import cluster_representatives
    (docs,) = _t(spark, sf_dir, "documents")
    cc = shared_components(spark, sf_dir, n=3, threshold=0.5)
    return (
        cluster_representatives(cc, docs)
        .select("component", "rep_doc_id",
                F.col("n_members").cast("long").alias("n_members"),
                F.col("max_n_chars").cast("long").alias("max_n_chars"))
        .orderBy("component")
    )


@register(
    "split_leakage_safe",
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
    ), comp AS (
      SELECT src AS n, MIN(dst) AS component FROM reach GROUP BY src
    ), keyed AS (
      SELECT d.doc_id,
             substr(md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)
                        || 'split-v1'), 1, 8) AS h8
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.n
    ), b AS (
      SELECT doc_id,
             (list_aggregate(list_transform(range(1, 9),
                i -> (strpos('0123456789abcdef', substr(h8, CAST(i AS INT), 1)) - 1)
                     * CAST(16 ** (8 - i) AS BIGINT)), 'sum')) % 100 AS bucket
      FROM keyed
    )
    SELECT doc_id,
           CASE WHEN bucket < 10 THEN 'test'
                WHEN bucket < 20 THEN 'val'
                ELSE 'train' END AS split
    FROM b ORDER BY doc_id
    """,
    tags=["dedup", "split"],
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-coherent train/val/test split: hash the near-dup
    component label, not the doc id, so paraphrase clusters never
    straddle the train/test boundary (eval contamination).  Singletons
    hash their own id — identical to the per-doc split for them.
    Components come from the session-shared checkpoint, not a fresh
    pair-graph + propagation run."""
    from ..cache import shared_components, shared_jaccard_pairs
    from ..operators import corpus
    (docs,) = _t(spark, sf_dir, "documents")
    pairs = shared_jaccard_pairs(spark, sf_dir, n=3, threshold=0.5)
    cc = shared_components(spark, sf_dir, n=3, threshold=0.5)
    return (
        corpus.leakage_safe_split(docs, pairs, cc=cc)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@register(
    "prof_equidepth_order_totals",
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM r GROUP BY bucket ORDER BY bucket
    """,
    tags=["profile", "window"],
)
def prof_equidepth_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth deciles of order totals — the range-split advisor,
    computed with the distributed exact NTILE (operators/windows), not a
    single-partition window."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        profile.equidepth_histogram(orders, "o_totalprice", "o_orderkey", k=10)
        .select(F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")
    )


@register(
    "sql_udf_chars_per_token",
    oracle=r"""
    WITH c AS (
      SELECT source,
             CAST(FLOOR(CAST(length(text) AS DOUBLE)
                        / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1))
                  AS BIGINT) AS cpt_bucket
      FROM documents
    )
    SELECT source, cpt_bucket, COUNT(*) AS n
    FROM c GROUP BY source, cpt_bucket ORDER BY source, cpt_bucket
    """,
    tags=["sql", "udf"],
)
def sql_udf_chars_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scalar UDF surface: `CREATE TEMPORARY FUNCTION …
    RETURN <expr>` — a named, reusable expression that stays entirely in
    Catalyst (inlined into codegen, unlike a Python UDF), exercised here
    for a chars-per-token corpus signal bucketed per source.  The oracle
    inlines the identical formula, so the UDF indirection is proven to
    change nothing."""
    register_views(spark, sf_dir, ["documents"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cpt(t STRING) RETURNS DOUBLE "
        "RETURN CAST(length(t) AS DOUBLE) "
        "/ greatest(size(split(trim(t), '\\\\s+')), 1)")
    return spark.sql("""
        WITH c AS (
          SELECT source, CAST(FLOOR(cpt(text)) AS BIGINT) AS cpt_bucket
          FROM documents
        )
        SELECT source, cpt_bucket, COUNT(*) AS n
        FROM c GROUP BY source, cpt_bucket ORDER BY source, cpt_bucket
    """)


# ---------------------------------------------------------------------------
# time-series regularization
# ---------------------------------------------------------------------------

@register(
    "ts_gap_fill_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
             COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ), b AS (SELECT pri, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY pri),
    cal AS (
      SELECT pri, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
      FROM b
    )
    SELECT cal.pri, cal.d,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders,
           CAST(last_value(daily.rev IGNORE NULLS)
                OVER (PARTITION BY cal.pri ORDER BY cal.d) AS DOUBLE) AS rev_ff
    FROM cal LEFT JOIN daily ON cal.pri = daily.pri AND cal.d = daily.d
    ORDER BY cal.pri, cal.d
    """,
    tags=["timeseries", "window"],
)
def ts_gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-priority daily series from sparse order dates: calendar
    gap fill (explode(sequence) per key — no driver loop), zero-filled
    counts, and forward-filled revenue (exact decimal sum carried, cast
    to double at the end).  The regularization step every moving-average
    / day-over-day consumer assumes (w3/w4 operate on observed days
    only; this produces the grid they'd want at scale)."""
    from ..functions import exact
    from ..operators import timeseries
    (orders,) = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderpriority").alias("pri"),
                       F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(exact.dec("o_totalprice")).alias("rev"))
    )
    dense = timeseries.gap_fill_forward(
        daily, "pri", "d", ffill_cols=["rev"],
        zero_fill={"n_orders": F.lit(0)})
    return (
        dense.select("pri", "d",
                     F.col("n_orders").cast("long").alias("n_orders"),
                     F.col("rev").cast("double").alias("rev_ff"))
        .orderBy("pri", "d")
    )


@register(
    "prof_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    ), f AS (
      SELECT o_orderpriority, q1, q3,
             q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo,
             q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi
      FROM q
    )
    SELECT o.o_orderpriority,
           ROUND(f.q1, 6) AS q1, ROUND(f.q3, 6) AS q3,
           ROUND(f.lo, 6) AS lo, ROUND(f.hi, 6) AS hi,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o.o_totalprice < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN o.o_totalprice > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM orders o JOIN f ON o.o_orderpriority = f.o_orderpriority
    GROUP BY 1, f.q1, f.q3, f.lo, f.hi
    ORDER BY 1
    """,
    tags=["profile", "percentile"],
)
def prof_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per priority: exact quartiles, fences
    at 1.5×IQR, and how many order totals fall outside — the robust
    tail check run before trusting a mean or picking a clip threshold.
    The tiny fence map broadcasts back onto the fact scan; counts
    partial-aggregate map-side."""
    (orders,) = _t(spark, sf_dir, "orders")
    out = profile.iqr_outlier_profile(orders, "o_orderpriority",
                                      "o_totalprice")
    return (
        out.select("o_orderpriority",
                   F.round("q1", 6).alias("q1"), F.round("q3", 6).alias("q3"),
                   F.round("lo", 6).alias("lo"), F.round("hi", 6).alias("hi"),
                   "n", "n_below", "n_above")
        .orderBy("o_orderpriority")
    )


@register(
    "graph_degree_distribution",
    oracle=r"""
    WITH toks AS (
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
    ), ends AS (SELECT a AS n FROM pairs UNION ALL SELECT b AS n FROM pairs),
    deg AS (SELECT n, COUNT(*) AS degree FROM ends GROUP BY n)
    SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree ORDER BY degree
    """,
    tags=["graph", "profile"],
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the exact near-dup pair graph — the
    pre-clustering sanity check: a heavy tail means boilerplate is about
    to glue unrelated docs into one giant component (tighten the pair
    threshold before running connected components).  Reads the
    session-shared pair-graph checkpoint."""
    from ..cache import shared_jaccard_pairs
    from ..operators.graph import degree_distribution
    pairs = shared_jaccard_pairs(spark, sf_dir, n=3, threshold=0.5)
    return degree_distribution(pairs)


@register(
    "scale_salted_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id
    )
    SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(d.user_events) AS BIGINT) AS sum_user_events
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=["scale", "join"],
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted join, oracle-proven row-identical to the plain
    join: the fact (events) joins its per-user dim through 8
    deterministic (key, salt) sub-keys (operators/scale.salted_join) —
    the treatment for single-hot-key skew that AQE's partition splitting
    cannot reach.  The aggregate over the joined rows hash-matches the
    unsalted SQL, which is exactly the operator's contract."""
    from ..operators.scale import salted_join
    (events,) = _t(spark, sf_dir, "events")
    dim = (events.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("user_events")))
    joined = salted_join(events.select("user_id", "event_type", "event_id"),
                         dim, "user_id", unique_col="event_id", n_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("user_events").alias("sum_user_events"))
        .orderBy("event_type")
    )

"""Round-10 registry extensions, second wave: the multi-table
transactional catalog proven under the value-hash gate (cross-table
atomicity, crash-window isolation, catalog time travel), the persisted
IVF index maintained off the change feed (the band index's twin from
`plans/ann.py`), binary (1-bit) embedding quantization with Hamming
top-k — xor + bit_count in whole-stage codegen on BOTH engines — and
the packed-window attention layout (per-window segment arrays, the
literal training artifact).

Reference parity note: the reference's multi-step jobs (copy THEN acl
apply, adls_copy_utils.py) leave the destination observable between
steps; `sinks/catalog.commit_txn` publishes related state atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, fixture_timed, register
from . import queries_round9 as _R9
from .queries_round10 import (_ANN, _ANN_FINAL_STATE_SQL,
                              _band_bucket_sql, _band_planes_sql)

# ---------------------------------------------------------------------------
# multi-table transactional catalog (sinks/catalog.py)
# ---------------------------------------------------------------------------

_CAT_PAIR: dict = {}


def _drop_cat_pair(keys=None) -> None:
    import shutil

    for k in list(_CAT_PAIR) if keys is None else list(keys):
        for d in _CAT_PAIR.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


@fixture_timed("catalog_pair_r10b")
def _catalog_pair(spark: SparkSession, sf_dir: str
                  ) -> tuple[tuple[str, ...], str, int, bool]:
    """Once per (session, sf_dir): a fact table (orders) and its
    derived rollup (revenue by status) registered in a catalog, then

      1. txn A: register both (derived built FROM fact's registered
         version) — the baseline consistent pair,
      2. txn B: equality-delete fact keys ≡ 2 mod 7 AND append negated
         keys ≡ 0 mod 501, AND rebuild the rollup — ONE atomic catalog
         commit,
      3. a CRASH-WINDOW simulation: junk rows (keys < −8M) appended to
         fact through the TABLE log with NO catalog commit.

    Returns ``(dirs, cat_dir, v_cat_A, ok)`` where ok asserts the
    catalog surfaced the crash drift (fact +1 version unpublished,
    derived 0) and txn B moved both pins together."""
    import atexit
    import tempfile

    from ..sinks import catalog as C
    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CAT_PAIR.get(key)
    if got is None:
        _drop_cat_pair([k for k in _CAT_PAIR if k[0] != key[0]])
        if not _CAT_PAIR:
            atexit.register(_drop_cat_pair)
        fact_dir = tempfile.mkdtemp(prefix="spark_graft_catfact_")
        view_dir = tempfile.mkdtemp(prefix="spark_graft_catview_")
        cat_dir = tempfile.mkdtemp(prefix="spark_graft_cat_")
        (orders,) = _t(spark, sf_dir, "orders")
        fact = orders.select("o_orderkey", "o_orderstatus",
                             "o_totalprice")
        V.write_snapshot(fact, fact_dir)

        def rebuild_view():
            return V.write_snapshot(
                V.read_version(spark, fact_dir)
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n_view"),
                     F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .cast("decimal(18,2)").alias("rev_view")),
                view_dir, mode="overwrite")

        C.commit_txn(cat_dir, {"fact": (fact_dir, None),
                               "fact_by_status": (view_dir, rebuild_view)},
                     txn_id="r10b-init")
        v_cat_a = C.catalog_latest(cat_dir)
        pins_a = C.catalog_tables(cat_dir)

        def mutate_fact():
            k = F.col("o_orderkey")
            V.delete_where_keys(
                spark, fact_dir, "o_orderkey",
                fact.filter(k % 7 == 2).select("o_orderkey"))
            return V.write_snapshot(
                fact.filter((k % 501 == 0) & (k != 0))
                .select((-k).alias("o_orderkey"), "o_orderstatus",
                        "o_totalprice"),
                fact_dir)

        C.commit_txn(cat_dir, {"fact": (fact_dir, mutate_fact),
                               "fact_by_status": (view_dir, rebuild_view)},
                     txn_id="r10b-mutate")
        pins_b = C.catalog_tables(cat_dir)
        ok = (pins_b["fact"]["version"] > pins_a["fact"]["version"]
              and pins_b["fact_by_status"]["version"]
              > pins_a["fact_by_status"]["version"])
        # crash window: a table commit that never reaches the catalog.
        # Junk keys sit STRICTLY below -(10 x max key) so they are
        # separable from txn B's legitimate negated keys (>= -max key)
        # at EVERY scale factor — no magic absolute threshold
        maxk = orders.agg(F.max("o_orderkey")).first()[0]
        V.write_snapshot(
            fact.filter((F.col("o_orderkey") % 997 == 0)
                        & (F.col("o_orderkey") != 0))
            .select((-F.lit(10 * maxk) - F.col("o_orderkey"))
                    .alias("o_orderkey"), "o_orderstatus",
                    "o_totalprice"),
            fact_dir)
        drift = {s["name"]: s["drift"] for s in C.catalog_status(cat_dir)}
        ok = ok and drift == {"fact": 1, "fact_by_status": 0}
        got = ((fact_dir, view_dir, cat_dir), cat_dir, v_cat_a, bool(ok))
        _CAT_PAIR[key] = got
    return got


@register(
    "scale_catalog_txn_read",
    oracle="""
    WITH f AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 2
      UNION ALL
      SELECT -o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 501 = 0 AND o_orderkey <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS n_fact,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev_fact,
           COUNT(*) AS n_view,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev_view,
           TRUE AS consistent, TRUE AS crash_hidden, TRUE AS drift_seen
    FROM f GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "catalog", "transaction"],
)
def scale_catalog_txn_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-table transactional catalog under the hash gate
    (`sinks/catalog.commit_txn`): fact and its derived rollup republished
    in ONE atomic catalog commit (delete + append + view rebuild), then a
    CRASH-WINDOW table commit that never reached the catalog.  Reading
    BOTH tables through the catalog must agree — per-status counts and
    revenue from the fact equal the pinned view's stored rows
    (consistent), the orphaned junk rows are invisible (crash_hidden:
    per-status min key stays above the junk range), and `catalog_status`
    reported exactly the fact-table drift (drift_seen).  Must hash-match
    plain SQL replaying the PUBLISHED state from raw orders."""
    from ..sinks import catalog as C

    _dirs, cat, _v_a, ok = _catalog_pair(spark, sf_dir)
    fact = C.read_table(spark, cat, "fact")
    agg = (fact.groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n_fact"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("rev_fact"),
                F.min("o_orderkey").alias("__mk"),
                F.max("o_orderkey").alias("__xk")))
    view = C.read_table(spark, cat, "fact_by_status")
    return (agg.join(view, "o_orderstatus")
            .select("o_orderstatus", "n_fact", "rev_fact", "n_view",
                    F.col("rev_view").cast("double").alias("rev_view"),
                    ((F.col("n_fact") == F.col("n_view"))
                     & (F.col("rev_fact")
                        == F.col("rev_view").cast("double")))
                    .alias("consistent"),
                    # legitimate negated keys are >= -(status max key);
                    # the junk commit's keys sit below -(10 x global
                    # max) — scale-invariant separation
                    (F.col("__mk") >= -F.col("__xk"))
                    .alias("crash_hidden"))
            .withColumn("drift_seen", F.lit(bool(ok)))
            .orderBy("o_orderstatus"))


@register(
    "scale_catalog_time_travel",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_fact,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev_fact,
           COUNT(*) AS n_view,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev_view,
           TRUE AS consistent
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "catalog", "time-travel"],
)
def scale_catalog_time_travel(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Catalog TIME TRAVEL: reading the pair at the FIRST catalog
    version yields the ORIGINAL consistent state — the fact before the
    delete/append txn AND the view built from exactly that fact — even
    though both table logs have moved twice since.  Cross-table
    snapshot isolation for historical reads: version N of the catalog
    is a coherent universe, not a per-table pick.  Must hash-match
    plain SQL over raw orders (the pre-mutation state)."""
    from ..sinks import catalog as C

    _dirs, cat, v_a, _ok = _catalog_pair(spark, sf_dir)
    fact = C.read_table(spark, cat, "fact", catalog_version=v_a)
    agg = (fact.groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n_fact"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("rev_fact")))
    view = C.read_table(spark, cat, "fact_by_status", catalog_version=v_a)
    return (agg.join(view, "o_orderstatus")
            .select("o_orderstatus", "n_fact", "rev_fact", "n_view",
                    F.col("rev_view").cast("double").alias("rev_view"),
                    ((F.col("n_fact") == F.col("n_view"))
                     & (F.col("rev_fact")
                        == F.col("rev_view").cast("double")))
                    .alias("consistent"))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# persisted IVF index maintained off the change feed (plans/ann.py)
# ---------------------------------------------------------------------------

_IVF = dict(dim=64, k_cells=8, seed=13)

_IVF_EMB: dict = {}


def _drop_ivf_emb(keys=None) -> None:
    import shutil

    for k in list(_IVF_EMB) if keys is None else list(keys):
        for d in _IVF_EMB.pop(k)[:2]:
            shutil.rmtree(d, ignore_errors=True)


@fixture_timed("ivf_index_r10b")
def _ivf_indexed_emb(spark: SparkSession, sf_dir: str
                     ) -> tuple[str, str, bool]:
    """Once per (session, sf_dir): versioned `embeddings` + its IVF
    cell-assignment index, maintained through the SAME three mutation
    windows as the band-index fixture (`queries_round10`): equality
    delete (vec_id ≡ 3 mod 7), MOR upsert negating survivors ≡ 0 mod 5,
    append of reversed vectors under -(vec_id+1) for ≡ 0 mod 11 — each
    followed by `refresh_ivf_index` (O(changes)).  inc_ok asserts the
    manifest-derived incremental diff engaged for every window."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVF_EMB.get(key)
    if got is None:
        _drop_ivf_emb([k for k in _IVF_EMB if k[0] != key[0]])
        if not _IVF_EMB:
            atexit.register(_drop_ivf_emb)
        emb_dir = tempfile.mkdtemp(prefix="spark_graft_ivfbase_")
        index_dir = tempfile.mkdtemp(prefix="spark_graft_ivfidx_")
        (emb,) = _t(spark, sf_dir, "embeddings")
        emb = emb.select("vec_id", "embedding")
        V.write_snapshot(emb, emb_dir)
        ann.build_ivf_index(spark, index_dir, emb_dir, **_IVF)
        vid = F.col("vec_id")
        inc_ok = True

        def _commit_and_refresh(mutate) -> None:
            nonlocal inc_ok
            v_prev = V.latest_version(emb_dir)
            mutate()
            v_cur = V.latest_version(emb_dir)
            inc_ok = inc_ok and V._changes_incremental(
                spark, emb_dir, v_prev, v_cur, "vec_id") is not None
            ann.refresh_ivf_index(spark, index_dir, emb_dir, **_IVF)

        _commit_and_refresh(lambda: V.delete_where_keys(
            spark, emb_dir, "vec_id",
            emb.filter(vid % 7 == 3).select("vec_id")))
        _commit_and_refresh(lambda: V.upsert_mor(
            spark, emb_dir,
            V.read_version(spark, emb_dir).filter(vid % 5 == 0)
            .withColumn("embedding",
                        F.transform(F.col("embedding"), lambda x: -x)),
            key="vec_id"))
        _commit_and_refresh(lambda: V.write_snapshot(
            emb.filter(vid % 11 == 0)
            .select((-(vid + 1)).alias("vec_id"),
                    F.reverse(F.col("embedding")).alias("embedding")),
            emb_dir))
        got = (emb_dir, index_dir, bool(inc_ok))
        _IVF_EMB[key] = got
    return got


def _ivf_cents_sql(k_cells: int = 8, dim: int = 64,
                   seed: int = 13) -> str:
    """plans/ann.ivf_centroids as a DuckDB VALUES CTE
    ``cents(cell, c)`` — repr() round-trips each double exactly, so
    both engines dot against bit-identical centroid vectors."""
    from . import ann

    rows = []
    for i, c in enumerate(ann.ivf_centroids(dim, k_cells, seed)):
        vals = ", ".join(repr(float(v)) for v in c)
        rows.append(f"({i}, [{vals}])")
    return ("cents(cell, c) AS (VALUES "
            + ",\n      ".join(rows) + ")")


# argmax-dot cell assignment over the `e` and `cents` CTEs — the same
# left-to-right float fold and smallest-cell tiebreak as ann.cell_expr
_IVF_ASG_SQL = """
    d AS (SELECT e.vec_id, cents.cell,
                 list_sum(list_transform(range(1, 65),
                                         i -> v[i] * c[i])) AS dp
          FROM e CROSS JOIN cents),
    asg AS (SELECT vec_id, cell
            FROM (SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY dp DESC, cell)
                           AS rn
                  FROM d) WHERE rn = 1)
"""


@register(
    "scale_ivf_index_incremental",
    oracle=f"""
    WITH {_ivf_cents_sql(_IVF['k_cells'], _IVF['dim'], _IVF['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL}
    SELECT vec_id, cell, TRUE AS inc_ok
    FROM asg ORDER BY vec_id
    """,
    tags=["scale", "similarity", "ivf", "versioned", "incremental"],
)
def scale_ivf_index_incremental(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The persisted IVF index (`plans/ann.build_ivf_index` +
    `refresh_ivf_index`) after three maintenance windows — equality
    delete, MOR upsert (embedding negation re-ASSIGNS the vector: its
    argmax cell flips to the opposite centroid side), append — each
    applied off the manifest-derived change feed.  Must hash-match
    DuckDB replaying the FINAL corpus state and assigning every vector
    to its argmax-dot centroid from scratch — maintained ≡ rebuild,
    with frozen centroids and the smallest-cell tiebreak identical in
    both engines.  inc_ok asserts the incremental diff engaged for
    every window."""
    from ..sinks import versioned as V

    _, index_dir, inc_ok = _ivf_indexed_emb(spark, sf_dir)
    return (V.read_version(spark, index_dir)
            .select("vec_id", "cell")
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .orderBy("vec_id"))


@register(
    "ann_ivf_probe_topk",
    oracle=f"""
    WITH {_ivf_cents_sql(_IVF['k_cells'], _IVF['dim'], _IVF['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qd AS (SELECT cents.cell,
                  list_sum(list_transform(range(1, 65),
                                          i -> qv[i] * c[i])) AS dp
           FROM cents CROSS JOIN q),
    probed AS (SELECT cell
               FROM (SELECT cell,
                            ROW_NUMBER() OVER (ORDER BY dp DESC, cell)
                              AS rn
                     FROM qd) WHERE rn <= 3),
    cand AS (SELECT vec_id FROM asg JOIN probed USING (cell))
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim
    FROM e JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "ivf", "versioned"],
)
def ann_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-20 THROUGH the maintained index
    (`ann.probe_ivf_topk`): the query's 3 nearest frozen centroids are
    ranked driver-side, candidates are the index rows in those cells — a
    literal filter on the persisted assignment table, partition-prunable
    at scale — then the exact cosine rerank runs on candidates
    semi-joined back to the base.  The oracle replays the final corpus
    state, re-assigns cells, probes the same 3, and reranks to the
    identical top-20 — index content AND probe semantics under one
    hash."""
    from ..sinks import versioned as V
    from . import ann

    emb_dir, index_dir, _ = _ivf_indexed_emb(spark, sf_dir)
    query = (V.read_version(spark, emb_dir)
             .filter(F.col("vec_id") == 1)
             .select("embedding").first()["embedding"])
    return ann.probe_ivf_topk(spark, index_dir, emb_dir, list(query),
                              k=20, nprobe=3, **_IVF)


@register(
    "ann_index_probe_multiprobe",
    oracle="""
    WITH {planes},
    {state},
    {bk},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qb AS (SELECT band, bucket AS qbucket FROM bk WHERE vec_id = 1),
    cand AS (SELECT DISTINCT bk.vec_id
             FROM bk JOIN qb ON bk.band = qb.band
             WHERE bit_count(xor(bk.bucket, qb.qbucket)) <= 1)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim
    FROM e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """.format(planes=_band_planes_sql(_ANN["n_bands"],
                                       _ANN["planes_per_band"],
                                       _ANN["seed"]),
               state=_ANN_FINAL_STATE_SQL,
               bk=_band_bucket_sql()),
    tags=["similarity", "lsh", "versioned"],
)
def ann_index_probe_multiprobe(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """MULTIPROBE top-20 through the maintained band index
    (`ann.probe_topk(probe_hamming=1)`): candidates share a band bucket
    within Hamming distance 1 of the query's — the standard LSH recall
    knob, still a literal bucket-list filter on the persisted table
    (nothing re-bands, candidate volume grows ×(1+planes) per band).
    The oracle replays the final corpus state and takes candidates via
    ``bit_count(xor(bucket, qbucket)) <= 1`` — probe EXPANSION
    semantics, not just membership, under the hash gate."""
    from ..sinks import versioned as V
    from . import ann
    from .queries_round10 import _ANN, _ann_indexed_emb

    emb_dir, index_dir, _ = _ann_indexed_emb(spark, sf_dir)
    query = (V.read_version(spark, emb_dir)
             .filter(F.col("vec_id") == 1)
             .select("embedding").first()["embedding"])
    return ann.probe_topk(spark, index_dir, emb_dir, list(query), k=20,
                          n_bands=_ANN["n_bands"],
                          planes_per_band=_ANN["planes_per_band"],
                          seed=_ANN["seed"], probe_hamming=1)


_IVF_SERVING: dict = {}


def _drop_ivf_serving(keys=None) -> None:
    import shutil

    for k in list(_IVF_SERVING) if keys is None else list(keys):
        shutil.rmtree(_IVF_SERVING.pop(k)[0], ignore_errors=True)


@fixture_timed("ivf_serving_r10b")
def _ivf_serving_table(spark: SparkSession, sf_dir: str
                       ) -> tuple[str, bool]:
    """Once per (session, sf_dir): the maintained IVF index's FINAL
    content re-committed hidden-partitioned on identity(cell) — the
    SERVING layout, where a probe's per-cell reads plan only that
    cell's files.  prune_ok asserts a one-cell read lists a strict
    subset of the serving table's files."""
    import atexit
    import tempfile

    from ..sinks import versioned as V

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVF_SERVING.get(key)
    if got is None:
        _drop_ivf_serving([k for k in _IVF_SERVING if k[0] != key[0]])
        if not _IVF_SERVING:
            atexit.register(_drop_ivf_serving)
        _, index_dir, _ = _ivf_indexed_emb(spark, sf_dir)
        t = tempfile.mkdtemp(prefix="spark_graft_ivfserve_")
        V.write_snapshot(V.read_version(spark, index_dir), t,
                         partition_by=["identity(cell)"])
        pruned = V.read_version(spark, t, predicates=[("cell", "=", 0)])
        manifest = V._read_manifest(t, V.latest_version(t))
        prune_ok = 0 < len(pruned.inputFiles()) < len(manifest)
        got = (t, bool(prune_ok))
        _IVF_SERVING[key] = got
    return got


@register(
    "scale_ivf_pruned_probe",
    oracle=f"""
    WITH {_ivf_cents_sql(_IVF['k_cells'], _IVF['dim'], _IVF['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qd AS (SELECT cents.cell,
                  list_sum(list_transform(range(1, 65),
                                          i -> qv[i] * c[i])) AS dp
           FROM cents CROSS JOIN q),
    probed AS (SELECT cell
               FROM (SELECT cell,
                            ROW_NUMBER() OVER (ORDER BY dp DESC, cell)
                              AS rn
                     FROM qd) WHERE rn <= 3),
    cand AS (SELECT vec_id FROM asg JOIN probed USING (cell))
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim,
           TRUE AS pruned_ok
    FROM e JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["scale", "similarity", "ivf", "versioned", "partitioning"],
)
def scale_ivf_pruned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF probe through the SERVING layout
    (`ann.probe_ivf_topk_pruned` over the index committed
    partition_by=["identity(cell)"]): each probed cell is read with a
    manifest predicate, so the index-side plan lists only nprobe/k_cells
    of the files — the shape that keeps a 100 TB corpus's probe I/O
    constant-fraction.  Results identical to the unpruned probe (the
    same top-20 the oracle reranks); pruned_ok carries the
    strict-subset inputFiles proof."""
    from ..sinks import versioned as V
    from . import ann

    emb_dir, _, _ = _ivf_indexed_emb(spark, sf_dir)
    serving, prune_ok = _ivf_serving_table(spark, sf_dir)
    query = (V.read_version(spark, emb_dir)
             .filter(F.col("vec_id") == 1)
             .select("embedding").first()["embedding"])
    return (ann.probe_ivf_topk_pruned(spark, serving, emb_dir,
                                      list(query), k=20, nprobe=3,
                                      **_IVF)
            .withColumn("pruned_ok", F.lit(bool(prune_ok))))


@register(
    "mm_video_frame_plan",
    oracle="""
    WITH a AS (SELECT UNNEST(range(0, 15)) AS i),
    meta AS (SELECT i AS asset_id,
                    (2000 + i * 100) * 1000 // (1000 + i * 10)
                      AS duration_ms
             FROM a),
    s AS (SELECT asset_id, duration_ms,
                 UNNEST(range(0, 1 + duration_ms // 500)) AS sample_idx
          FROM meta)
    SELECT asset_id, CAST(sample_idx AS BIGINT) AS sample_idx,
           CAST(sample_idx * 500 AS BIGINT) AS sample_ms, duration_ms
    FROM s ORDER BY asset_id, sample_idx
    """,
    tags=["multimodal", "video", "decode", "metadata"],
)
def mm_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-sampling PLAN from REAL MP4 metadata: 15 genuine
    ISO-BMFF streams (mvhd v0/v1) run through
    `multimodal.extract_container_meta`, then one sample timestamp
    every 500 ms of the DECODED duration fans out metadata-plane only
    (explode over duration//500 — payload bytes never reach the
    explode).  This is the decode→plan composition a video ingest runs
    before touching a single frame; sample grid hash-matched against
    the generating arithmetic."""
    from ..operators import multimodal as mm
    from .queries_round10 import _mk_mp4

    rows = []
    for i in range(15):
        content = _mk_mp4(1000 + i * 10, 2000 + i * 100, 1 + i % 3,
                          v1=i % 4 == 1)
        rows.append((i, "video", bytearray(content), "video/mp4"))
    assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    meta = mm.extract_container_meta(assets) \
        .select("asset_id", "duration_ms")
    return (meta.select(
        "asset_id",
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            (F.col("duration_ms") / 500).cast("long")))
        .alias("sample_idx"), "duration_ms")
        .select("asset_id", "sample_idx",
                (F.col("sample_idx") * 500).cast("long")
                .alias("sample_ms"), "duration_ms")
        .orderBy("asset_id", "sample_idx"))


# ---------------------------------------------------------------------------
# binary (1-bit) embedding quantization + Hamming retrieval
# ---------------------------------------------------------------------------

# per-vector sign codes packed 32 bits/word over the dim-64 embeddings —
# shared CTE for the Hamming queries (1-indexed DuckDB lists)
_BINCODE_SQL = """
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    c AS (SELECT vec_id,
      CAST(list_sum(list_transform(range(0, 32),
           i -> CASE WHEN v[i + 1] >= 0
                THEN CAST(2 ** i AS BIGINT) ELSE 0 END)) AS BIGINT)
        AS w0,
      CAST(list_sum(list_transform(range(0, 32),
           i -> CASE WHEN v[32 + i + 1] >= 0
                THEN CAST(2 ** i AS BIGINT) ELSE 0 END)) AS BIGINT)
        AS w1
      FROM e)
"""


@register(
    "sim_topk_binary_hamming",
    oracle=f"""
    WITH {_BINCODE_SQL},
    qc AS (SELECT w0 AS q0, w1 AS q1 FROM c WHERE vec_id = 1)
    SELECT vec_id,
           CAST(bit_count(xor(w0, q0)) + bit_count(xor(w1, q1))
                AS INTEGER) AS hamming
    FROM c CROSS JOIN qc ORDER BY hamming, vec_id LIMIT 20
    """,
    tags=["similarity", "quantization", "hamming"],
)
def sim_topk_binary_hamming(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Binary-quantized top-20 (`operators/similarity.topk_hamming`):
    every embedding sign-packed into two 32-bit words (one map-side
    codegen projection — the 32×-compressed representation a 100 TB
    corpus keeps hot), distance = Σ bit_count(xor) against vec_id 1's
    code, TakeOrdered tail.  xor + bit_count are integer-exact in both
    engines, so the full top-20 (codes, distances, tie order) rides the
    hash gate with no contract softening."""
    from ..operators import similarity

    (emb,) = _t(spark, sf_dir, "embeddings")
    emb = emb.select("vec_id", "embedding")
    query = list(emb.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    return similarity.topk_hamming(emb, query, k=20, dim=64)


@register(
    "emb_binary_code_density",
    oracle=f"""
    WITH {_BINCODE_SQL}
    SELECT CAST(bit_count(w0) + bit_count(w1) AS INTEGER) AS popcount,
           COUNT(*) AS n,
           CAST(SUM(w0) AS BIGINT) AS w0_sum,
           CAST(SUM(w1) AS BIGINT) AS w1_sum
    FROM c GROUP BY 1 ORDER BY 1
    """,
    tags=["similarity", "quantization", "profile"],
)
def emb_binary_code_density(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Code-balance profile of the 1-bit quantization: the popcount
    distribution over all packed codes (a healthy sign quantization of
    centered embeddings concentrates near dim/2 — a skewed histogram
    means a bias dimension and degraded Hamming contrast), with
    per-bucket word checksums pinning the exact codes.  Map-side
    projection + one small aggregate; the audit a binarization job
    ships before swapping the float index out."""
    from ..operators import similarity

    (emb,) = _t(spark, sf_dir, "embeddings")
    codes = similarity.binary_codes(
        emb.select("vec_id", "embedding"), dim=64)
    return (codes.select(
        (F.bit_count(F.col("w0")) + F.bit_count(F.col("w1")))
        .cast("int").alias("popcount"), "w0", "w1")
        .groupBy("popcount")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("w0").cast("long").alias("w0_sum"),
             F.sum("w1").cast("long").alias("w1_sum"))
        .orderBy("popcount"))


# ---------------------------------------------------------------------------
# analytics widening: order aging, nation trade matrix, interarrival,
# user regularity
# ---------------------------------------------------------------------------

@register(
    "ord_open_pipeline_aging",
    oracle="""
    SELECT o_orderstatus,
           (DATE '2001-08-02' - CAST(o_orderdate AS DATE)) // 30
             AS age_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["aggregate", "orders", "ops"],
)
def ord_open_pipeline_aging(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Order-pipeline AGING report: per status, 30-day age buckets
    anchored just past the dataset horizon (2001-08-02, all gaps
    non-negative so integer bucketing agrees across engines) with count and
    exact-decimal revenue — the backlog-burndown view an ops team reads
    (how much value sits in 'O' and how stale is it).  Map-side bucket
    math + one small aggregate; at 100 TB the scan prunes to
    (status, date) zone maps when the table is date-clustered."""
    (orders,) = _t(spark, sf_dir, "orders")
    age = F.datediff(F.lit("2001-08-02").cast("date"),
                     F.col("o_orderdate").cast("date"))
    return (orders
            .groupBy("o_orderstatus",
                     F.floor(age / 30).cast("long").alias("age_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .orderBy("o_orderstatus", "age_bucket"))


@register(
    "sup_cust_nation_trade_matrix",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["join", "aggregate", "tpch-shaped"],
)
def sup_cust_nation_trade_matrix(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The FULL customer-nation × supplier-nation trade matrix (TPC-H
    Q7 generalized from one nation pair to all N²): line count and
    exact-decimal volume per ordered pair — the mixing-weight /
    route-imbalance view.  One fact-fact equi join (lineitem⨝orders —
    bucketable on orderkey at 100 TB) then three broadcast dim hops;
    output is N²-bounded (≤625 rows) however large the facts."""
    li, orders, cust, supp, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation")
    cn = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(cn), cust.c_nationkey == cn.c_nk)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(sn), supp.s_nationkey == sn.s_nk)
            .groupBy("cust_nation", "supp_nation")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("volume"))
            .orderBy("cust_nation", "supp_nation"))


@register(
    "cust_order_interarrival_hist",
    oracle="""
    WITH g AS (
      SELECT LEAD(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey)
             - CAST(o_orderdate AS DATE) AS gap
      FROM orders)
    SELECT gap // 7 AS gap_weeks, COUNT(*) AS n,
           CAST(SUM(gap) AS BIGINT) AS total_gap_days
    FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1
    """,
    tags=["window", "orders", "timeseries"],
)
def cust_order_interarrival_hist(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Customer order INTERARRIVAL histogram: consecutive-order gaps in
    days per customer (lead over the customer-keyed window, orderkey
    tiebreak for same-day orders — deterministic in both engines),
    bucketed by week — the repurchase-cadence curve behind churn/LTV
    models.  The window partitions on o_custkey (parallel per key, no
    global sort); the histogram is a small second aggregate."""
    from pyspark.sql import Window as W

    (orders,) = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    gaps = (orders
            .withColumn("gap", F.datediff(F.lead(d).over(w), d))
            .filter(F.col("gap").isNotNull()))
    return (gaps.groupBy(F.floor(F.col("gap") / 7).cast("long")
                         .alias("gap_weeks"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("gap").cast("long").alias("total_gap_days"))
            .orderBy("gap_weeks"))


@register(
    "evt_user_regularity",
    oracle="""
    SELECT user_id,
           COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
           DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                     MAX(CAST(ts AS DATE))) + 1 AS span_days,
           COUNT(DISTINCT CAST(ts AS DATE)) * 1000000
             // (DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                           MAX(CAST(ts AS DATE))) + 1) AS regularity_ppm
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=["aggregate", "events", "sessions"],
)
def evt_user_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement REGULARITY: distinct active days over the
    user's own first-to-last span, in exact integer ppm — separates
    daily-habit users from burst-and-churn at the same event volume
    (the cohort-quality signal DAU/WAU averages away).  One user-keyed
    aggregate with a map-side distinct collapse; integral DIV keeps the
    ratio bit-portable."""
    (events,) = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    span = (F.datediff(F.max(d), F.min(d)) + F.lit(1)).cast("long")
    return (events.groupBy("user_id")
            .agg(F.countDistinct(d).alias("active_days"),
                 span.alias("span_days"))
            .select("user_id", "active_days", "span_days",
                    F.expr("CAST((active_days * 1000000L) DIV span_days "
                           "AS LONG)").alias("regularity_ppm"))
            .orderBy("user_id"))


@register(
    "li_brand_nation_share",
    oracle="""
    WITH b AS (
      SELECT sn.n_name AS supp_nation, p.p_brand AS brand,
             COUNT(*) AS n_items,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part p ON l_partkey = p.p_partkey
      GROUP BY 1, 2)
    SELECT supp_nation, brand, n_items,
           CAST(cents AS DOUBLE) / 100 AS rev,
           CAST(CAST(cents AS HUGEINT) * 1000000
                // SUM(CAST(cents AS HUGEINT))
                   OVER (PARTITION BY supp_nation) AS BIGINT)
             AS share_ppm
    FROM b ORDER BY 1, 2
    """,
    tags=["join", "aggregate", "window", "tpch-shaped"],
)
def li_brand_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue share WITHIN each supplier nation, in exact
    integer ppm (cents-bigint sums, DECIMAL(38) cross-multiply +
    integral DIV — the HHI pattern, no float division anywhere): the
    assortment-concentration view per geography.  The share window
    partitions on supp_nation over the ALREADY-AGGREGATED
    (nation × brand) relation — ≤ 25×|brands| rows, bounded however
    large lineitem grows; the facts see one shuffle into the
    group-by."""
    from pyspark.sql import Window as W

    li, supp, nation, part = _t(spark, sf_dir, "lineitem", "supplier",
                                "nation", "part")
    sn = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    b = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(sn), supp.s_nationkey == sn.s_nk)
         .join(F.broadcast(part.select("p_partkey",
                                       F.col("p_brand").alias("brand"))),
               li.l_partkey == F.col("p_partkey"))
         .groupBy("supp_nation", "brand")
         .agg(F.count(F.lit(1)).alias("n_items"),
              F.sum(cents).alias("cents")))
    tot = F.sum(F.col("cents").cast("decimal(38,0)")) \
        .over(W.partitionBy("supp_nation"))
    return (b.select(
        "supp_nation", "brand", "n_items", "cents",
        tot.alias("__tot"))
        .select("supp_nation", "brand", "n_items",
                (F.col("cents").cast("double") / 100).alias("rev"),
                F.expr("CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) "
                       "DIV __tot AS LONG)").alias("share_ppm"))
        .orderBy("supp_nation", "brand"))


@register(
    "evt_value_outlier_share",
    oracle="""
    WITH t AS (SELECT event_type, COUNT(*) AS n,
                      SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                               AS BIGINT)) AS total_u
               FROM events GROUP BY 1)
    SELECT e.event_type, t.n,
           CAST(SUM(CASE WHEN CAST(CAST(e.value AS DECIMAL(18,6))
                              * 1000000 AS HUGEINT) * t.n
                              > 2 * CAST(t.total_u AS HUGEINT)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN CAST(CAST(e.value AS DECIMAL(18,6))
                              * 1000000 AS HUGEINT) * t.n
                              > 2 * CAST(t.total_u AS HUGEINT)
                    THEN 1 ELSE 0 END) * 1000000 // t.n AS BIGINT)
             AS outlier_ppm
    FROM events e JOIN t USING (event_type)
    GROUP BY 1, 2 ORDER BY 1
    """,
    tags=["aggregate", "events", "profile"],
)
def evt_value_outlier_share(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Per-event-type share of events whose value exceeds 2× the
    type's own mean — the heavy-transaction alarm, written EXACT and
    DIVISION-FREE: values quantize to integer micro-units, the
    comparison cross-multiplies the mean away
    (``value_u · n > 2 · total_u`` in DECIMAL(38)), so a float sum's
    order-dependent last ulp can never flip a boundary row.  Two
    passes over events with a 5-row broadcast between them; partial
    aggregation collapses both map-side."""
    (events,) = _t(spark, sf_dir, "events")
    vu = (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("long")
    t = (events.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(vu).alias("total_u")))
    flag = F.when(vu.cast("decimal(38,0)") * F.col("n")
                  > F.lit(2) * F.col("total_u").cast("decimal(38,0)"),
                  1).otherwise(0)
    return (events.join(F.broadcast(t), "event_type")
            .groupBy("event_type", "n")
            .agg(F.sum(flag).alias("n_outliers"))
            .select("event_type", "n", "n_outliers",
                    F.expr("CAST((n_outliers * 1000000L) DIV n AS LONG)")
                    .alias("outlier_ppm"))
            .orderBy("event_type"))


@register(
    "li_return_rate_by_brand",
    oracle="""
    SELECT p.p_brand AS brand, COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
    FROM lineitem JOIN part p ON l_partkey = p_partkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["join", "aggregate", "tpch-shaped"],
)
def li_return_rate_by_brand(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Return rate per brand in exact integer ppm — the
    quality-escalation ranking (which brands ship back).  One broadcast
    dim hop + one brand-keyed aggregate, partials collapse map-side;
    integral DIV keeps the rate hash-portable."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (li.join(F.broadcast(part.select(
        "p_partkey", F.col("p_brand").alias("brand"))),
        li.l_partkey == F.col("p_partkey"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(ret).cast("long").alias("n_returned"))
        .select("brand", "n_items", "n_returned",
                F.expr("CAST((n_returned * 1000000L) DIV n_items "
                       "AS LONG)").alias("return_ppm"))
        .orderBy("brand"))


@register(
    "evt_type_hour_heatmap",
    oracle="""
    SELECT event_type,
           CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["profile", "events"],
)
def evt_type_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume heatmap per (type, hour-of-day) — the
    when-does-each-funnel-stage-happen view (`prof_events_time_profile`
    adds the type dimension the capacity profile collapses).  Hour from
    pure epoch-microsecond integer math, engine-convention-free; output
    bounded by |types|×24 however large events grows."""
    (events,) = _t(spark, sf_dir, "events")
    return (events.groupBy(
        "event_type",
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("event_type", "hour"))


@register(
    "doc_length_quartiles_by_source",
    oracle="""
    SELECT source, COUNT(*) AS n,
           CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q1,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med,
           CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q3,
           CAST(MAX(n_chars) AS BIGINT) AS mx
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    tags=["profile", "text", "corpus"],
)
def doc_length_quartiles_by_source(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Document length quartiles per source (discrete quantiles — an
    ACTUAL member value, exact and tie-proof in both engines, unlike
    interpolated percentiles of doubles): the length-mix fingerprint
    that decides per-source chunking and packing window sizes.  One
    source-keyed aggregate; percentile_disc state is bounded."""
    (docs,) = _t(spark, sf_dir, "documents")
    q = [F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_chars)"
                ).cast("long").alias(a)
         for p, a in ((0.25, "q1"), (0.5, "med"), (0.75, "q3"))]
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), *q,
                 F.max("n_chars").cast("long").alias("mx"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# atomic publish of the corpus lane's artifacts through the catalog
# ---------------------------------------------------------------------------

_PUBLISHED: dict = {}


def _drop_published(keys=None) -> None:
    import shutil

    for k in list(_PUBLISHED) if keys is None else list(keys):
        shutil.rmtree(_PUBLISHED.pop(k)[0], ignore_errors=True)


@fixture_timed("corpus_publish_r10b")
def _published_corpus(spark: SparkSession, sf_dir: str
                      ) -> tuple[str, bool]:
    """Once per (session, sf_dir): the assembled training artifacts
    (`queries_round10._assembled_shards` — packed shards, survivor
    embeddings, band index) PUBLISHED in one catalog transaction.
    Returns (cat_dir, ok): ok asserts one catalog commit pinned all
    three and `catalog_status` shows zero drift afterwards."""
    import atexit
    import tempfile

    from ..sinks import catalog as C
    from .queries_round10 import _assembled_shards

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PUBLISHED.get(key)
    if got is None:
        _drop_published([k for k in _PUBLISHED if k[0] != key[0]])
        if not _PUBLISHED:
            atexit.register(_drop_published)
        pack_dir, emb_dir, index_dir, _ = _assembled_shards(spark, sf_dir)
        cat_dir = tempfile.mkdtemp(prefix="spark_graft_pubcat_")
        v = C.commit_txn(cat_dir, {
            "packed_shards": (pack_dir, None),
            "embeddings_base": (emb_dir, None),
            "band_index": (index_dir, None)}, txn_id="publish-r10b")
        hist = C.catalog_history(cat_dir)
        ok = (v == 0 and len(hist) == 1
              and hist[0]["changed"] == ["band_index", "embeddings_base",
                                         "packed_shards"]
              and all(s["drift"] == 0 for s in C.catalog_status(cat_dir)))
        got = (cat_dir, bool(ok))
        _PUBLISHED[key] = got
    return got


@register(
    "corpus_catalog_publish",
    oracle="""
    WITH uniq AS (SELECT MIN(doc_id) AS doc_id
                  FROM documents GROUP BY md5(text)),
    surv AS (SELECT COUNT(*) AS n FROM embeddings em
             JOIN uniq ON em.vec_id = uniq.doc_id)
    SELECT 'band_index' AS artifact, 3 * n AS n_rows,
           TRUE AS published_atomically FROM surv
    UNION ALL
    SELECT 'embeddings_base', n, TRUE FROM surv
    UNION ALL
    SELECT 'packed_shards', (SELECT COUNT(*) FROM uniq), TRUE
    ORDER BY 1
    """,
    tags=["corpus", "catalog", "versioned", "llm", "scale"],
)
def corpus_catalog_publish(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """The training lane's artifacts — packed shards, survivor
    embeddings, band index — PUBLISHED ATOMICALLY through one catalog
    transaction and read back THROUGH the catalog: per-artifact row
    counts under the hash gate, with published_atomically asserting one
    commit pinned all three and no drift remains.  This closes the
    assemble lane operationally: a training job resolves a catalog
    version and gets shards, embeddings, and index from the same
    universe — never yesterday's index over today's shards."""
    from ..sinks import catalog as C

    cat, ok = _published_corpus(spark, sf_dir)

    def one(name: str) -> DataFrame:
        return (C.read_table(spark, cat, name)
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .select(F.lit(name).alias("artifact"), "n_rows"))

    out = (one("band_index")
           .unionByName(one("embeddings_base"))
           .unionByName(one("packed_shards")))
    return (out.withColumn("published_atomically", F.lit(bool(ok)))
            .orderBy("artifact"))


# ---------------------------------------------------------------------------
# packed-window attention layout — the literal training artifact
# ---------------------------------------------------------------------------

@register(
    "corpus_pack_window_layout",
    oracle=_R9._PACK_CTE.format(g=8, w=256,
                                pieces=_R9._PIECES_WHOLE.format(w=256))
    + """
    SELECT g, win, COUNT(*) AS n_segments,
           list(id ORDER BY rn) AS ids,
           list(fill - pt ORDER BY rn) AS offsets,
           list(pt ORDER BY rn) AS lens,
           CAST(MAX(fill) AS BIGINT) AS fill,
           CAST(256 - MAX(fill) AS BIGINT) AS pad
    FROM pack GROUP BY g, win ORDER BY g, win
    """,
    tags=["corpus", "packing", "llm"],
)
def corpus_pack_window_layout(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The per-window ATTENTION LAYOUT of the packed corpus — for every
    (g, win) context window: the ordered document ids, their first-token
    offsets, their lengths, the final fill and the padding tail.  These
    arrays ARE what a training loader materializes into segment ids /
    position ids / block-diagonal attention masks; emitting them from
    the COMMITTED packed table (not the in-flight frame) closes the
    packing lane at the artifact level.  One partition-local sort per
    window (collect_list + array_sort over ≤window/min_len segments —
    bounded), no global ordering.  Hash-matched against the DuckDB
    recursive-CTE pack replay emitting the identical ordered lists."""
    from ..sinks import versioned as V
    from .queries_round9 import _packed_windows_table

    t, _ = _packed_windows_table(spark, sf_dir)
    pos = V.read_version(spark, t).filter(F.col("win") > 0)
    seg = F.array_sort(F.collect_list(F.struct(
        F.col("offset").alias("o"), F.col("id").alias("i"),
        F.col("piece_tokens").alias("l"))))
    return (pos.groupBy("g", "win")
            .agg(F.count(F.lit(1)).alias("n_segments"),
                 seg.alias("__s"),
                 F.sum("piece_tokens").cast("long").alias("fill"))
            .select("g", "win", "n_segments",
                    F.transform("__s", lambda x: x["i"]).alias("ids"),
                    F.transform("__s", lambda x: x["o"]).alias("offsets"),
                    F.transform("__s", lambda x: x["l"]).alias("lens"),
                    "fill",
                    (F.lit(256) - F.col("fill")).cast("long").alias("pad"))
            .orderBy("g", "win"))

"""Round-10 registry extensions: the persisted, incrementally-maintained
ANN index (plans/ann.py) proven under the driver's value-hash gate —
maintenance across delete/upsert/append commits hash-matches a DuckDB
replay of the final corpus state (which IS a from-scratch rebuild), and
the probe path reranks through the maintained index.

Reference parity note: the reference (Azure/databox-adls-loader) re-lists
everything per run (adls_copy_utils.py:69); these entries close the last
batch-only lane in the engine's incremental thesis (round-9 verdict,
Next round #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, fixture_timed, register
from . import queries_round9 as _R9

# ---------------------------------------------------------------------------
# persisted ANN index maintained off the change feed (plans/ann.py)
# ---------------------------------------------------------------------------

# small geometry so the inlined-plane oracle stays readable: 3 bands of
# 6 planes each over the dim-64 embeddings (driver contract)
_ANN = dict(dim=64, n_bands=3, planes_per_band=6, seed=7)

_ANN_EMB: dict = {}


def _drop_ann_emb(keys=None) -> None:
    import shutil

    for k in list(_ANN_EMB) if keys is None else list(keys):
        for d in _ANN_EMB.pop(k)[:2]:
            shutil.rmtree(d, ignore_errors=True)


@fixture_timed("ann_index_r10")
def _ann_indexed_emb(spark: SparkSession, sf_dir: str
                     ) -> tuple[str, str, bool]:
    """Once per (session, sf_dir): versioned `embeddings` + its band
    index, then three mutation commits EACH followed by an incremental
    index refresh —

      1. `delete_where_keys` (vec_id ≡ 3 mod 7): equality tombstones,
      2. `upsert_mor` negating the embedding of surviving
         vec_id ≡ 0 mod 5 rows (pure update: keys all exist),
      3. append of NEW vectors (vec_id → -(vec_id+1) for
         vec_id ≡ 0 mod 11, embedding reversed — ids disjoint).

    Returns ``(emb_dir, index_dir, inc_ok)`` where inc_ok asserts the
    manifest-derived incremental diff ENGAGED for every window (no
    full-table fallback) — the O(changes) claim, not just the result."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _ANN_EMB.get(key)
    if got is None:
        _drop_ann_emb([k for k in _ANN_EMB if k[0] != key[0]])
        if not _ANN_EMB:
            atexit.register(_drop_ann_emb)
        emb_dir = tempfile.mkdtemp(prefix="spark_graft_annbase_")
        index_dir = tempfile.mkdtemp(prefix="spark_graft_annidx_")
        (emb,) = _t(spark, sf_dir, "embeddings")
        emb = emb.select("vec_id", "embedding")
        V.write_snapshot(emb, emb_dir)
        ann.build_ann_index(spark, index_dir, emb_dir, **_ANN)
        vid = F.col("vec_id")
        inc_ok = True

        def _commit_and_refresh(mutate) -> None:
            nonlocal inc_ok
            v_prev = V.latest_version(emb_dir)
            mutate()
            v_cur = V.latest_version(emb_dir)
            inc_ok = inc_ok and V._changes_incremental(
                spark, emb_dir, v_prev, v_cur, "vec_id") is not None
            ann.refresh_ann_index(spark, index_dir, emb_dir, **_ANN)

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
        _ANN_EMB[key] = got
    return got


def _band_planes_sql(n_bands: int, planes_per_band: int, seed: int = 7,
                     dim: int = 64) -> str:
    """plans/ann.band_planes as a DuckDB VALUES CTE
    ``bandplanes(band, pi, p)`` — repr() round-trips each double
    exactly, so both engines dot against bit-identical plane vectors."""
    from . import ann

    rows = []
    for b, planes in enumerate(
            ann.band_planes(dim, n_bands, planes_per_band, seed)):
        for i, p in enumerate(planes):
            vals = ", ".join(repr(float(v)) for v in p)
            rows.append(f"({b}, {i}, [{vals}])")
    return ("bandplanes(band, pi, p) AS (VALUES "
            + ",\n      ".join(rows) + ")")


# the fixture's closed-form final corpus state, replayed over the raw
# embeddings table: delete ≡3 mod 7, negate survivors ≡0 mod 5, append
# reversed vectors under -(vec_id+1) for ≡0 mod 11
_ANN_FINAL_STATE_SQL = """
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
    surv AS (SELECT vec_id,
                    CASE WHEN vec_id % 5 = 0
                         THEN list_transform(v, x -> -x) ELSE v END AS v
             FROM base WHERE vec_id % 7 <> 3),
    ins AS (SELECT -(vec_id + 1) AS vec_id, list_reverse(v) AS v
            FROM base WHERE vec_id % 11 = 0),
    e AS (SELECT * FROM surv UNION ALL SELECT * FROM ins)
"""


def _band_bucket_sql(dim: int = 64) -> str:
    """Per-(vector, band) sign bucket over the ``e`` and ``bandplanes``
    CTEs — bit pi set iff v·plane ≥ 0, same packing as
    similarity._bucket_expr."""
    return f"""
    bk AS (
      SELECT e.vec_id, bp.band,
             CAST(SUM(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                            i -> v[i] * p[i])) >= 0
                      THEN CAST(2 ** pi AS BIGINT) ELSE 0 END) AS BIGINT)
               AS bucket
      FROM e CROSS JOIN bandplanes bp
      GROUP BY e.vec_id, bp.band
    )"""


@register(
    "scale_ann_index_incremental",
    oracle=f"""
    WITH {_band_planes_sql(_ANN['n_bands'], _ANN['planes_per_band'])},
    {_ANN_FINAL_STATE_SQL},
    {_band_bucket_sql()}
    SELECT vec_id, band, bucket, TRUE AS inc_ok
    FROM bk ORDER BY vec_id, band
    """,
    tags=["scale", "similarity", "lsh", "versioned", "incremental"],
)
def scale_ann_index_incremental(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The persisted ANN index (plans/ann.py) after three maintenance
    windows — equality-delete, MOR upsert (embedding change), append —
    each applied through `refresh_ann_index` off the manifest-derived
    change feed: inserts band-hash only the new vectors, deletes land
    as band-key tombstones, updates replace in place via the scoped
    MERGE.  Must hash-match DuckDB replaying the FINAL corpus state and
    band-hashing it from scratch — maintained index ≡ full rebuild,
    which is the O(changes) lane's correctness contract.  inc_ok
    asserts the incremental diff engaged for every window (no
    full-table fallback)."""
    from ..sinks import versioned as V

    _, index_dir, inc_ok = _ann_indexed_emb(spark, sf_dir)
    return (V.read_version(spark, index_dir)
            .select("vec_id", "band", "bucket")
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .orderBy("vec_id", "band"))


@register(
    "ann_index_probe_topk",
    oracle=f"""
    WITH {_band_planes_sql(_ANN['n_bands'], _ANN['planes_per_band'])},
    {_ANN_FINAL_STATE_SQL},
    {_band_bucket_sql()},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qb AS (SELECT band, bucket AS qbucket FROM bk WHERE vec_id = 1),
    cand AS (SELECT DISTINCT bk.vec_id
             FROM bk JOIN qb ON bk.band = qb.band
                             AND bk.bucket = qb.qbucket)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim
    FROM e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "lsh", "versioned"],
)
def ann_index_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-20 THROUGH the maintained index (`ann.probe_topk`):
    candidates are vectors sharing ANY band bucket with vec_id 1's
    query — a literal filter on the persisted band table, never a
    distance pass over the corpus — then exact cosine rerank on the
    candidates joined back to the base.  The oracle replays the final
    corpus state, rebuilds the bands, probes the same buckets, and
    reranks to the identical top-20 — index content AND probe semantics
    value-hash-checked."""
    from ..sinks import versioned as V
    from . import ann

    emb_dir, index_dir, _ = _ann_indexed_emb(spark, sf_dir)
    query = (V.read_version(spark, emb_dir)
             .filter(F.col("vec_id") == 1)
             .select("embedding").first()["embedding"])
    return ann.probe_topk(spark, index_dir, emb_dir, list(query), k=20,
                          n_bands=_ANN["n_bands"],
                          planes_per_band=_ANN["planes_per_band"],
                          seed=_ANN["seed"])


# ---------------------------------------------------------------------------
# incremental CDF across schema evolution: rename/drop and type widen
# (round-9 verdict, Next round #2 — the last O(table) fallbacks in the
# CDC loop were ALTER-shaped; both are metadata-only in this store)
# ---------------------------------------------------------------------------

_CDF_RENAME: dict = {}
_CDF_WIDEN: dict = {}


def _drop_cdf_schema_evo(cache, keys=None) -> None:
    import shutil

    for k in list(cache) if keys is None else list(keys):
        shutil.rmtree(cache.pop(k)[0], ignore_errors=True)


@fixture_timed("cdf_rename_r10")
def _cdf_rename_orders(spark: SparkSession, sf_dir: str
                       ) -> tuple[str, int, bool]:
    """Once per (session, sf_dir): versioned `orders` compacted into 8
    key-clustered files (the CDF baseline), then a change window that
    BRACKETS a rename AND a drop —

      1. position-delete (keys < 600: one DV on the lowest clustered
         file),
      2. ``rename_column(o_totalprice → total_price)`` +
         ``drop_column(o_orderpriority)`` — both metadata-only commits,
      3. a post-ALTER append (negated keys, k % 1009 == 0, written
         under the NEW logical schema),
      4. equality tombstones on keys in [600, 700) ≡ 0 mod 3.

    Returns ``(table, v_base, inc_ok)`` — inc_ok asserts the
    incremental derivation ENGAGED across the ALTERs (round 9 it
    returned None and fell back to two full scans) and read a STRICT
    SUBSET of the 8 clustered baseline files."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from ..sinks.storage import path_key

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDF_RENAME.get(key)
    if got is None:
        _drop_cdf_schema_evo(_CDF_RENAME,
                             [k for k in _CDF_RENAME if k[0] != key[0]])
        if not _CDF_RENAME:
            atexit.register(_drop_cdf_schema_evo, _CDF_RENAME)
        t = tempfile.mkdtemp(prefix="spark_graft_cdfrename_")
        (orders,) = _t(spark, sf_dir, "orders")
        V.write_snapshot(orders, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        v_base = V.latest_version(t)
        base_files = V._read_manifest(t, v_base)
        k_col = F.col("o_orderkey")
        V.delete_where(spark, t, "o_orderkey < 600",
                       predicates=[("o_orderkey", "<", 600)])
        V.rename_column(t, "o_totalprice", "total_price")
        V.drop_column(t, "o_orderpriority")
        ins = (orders.filter((k_col % 1009 == 0) & (k_col != 0))
               .select((-k_col).alias("o_orderkey"), "o_custkey",
                       "o_orderstatus",
                       F.col("o_totalprice").alias("total_price"),
                       "o_orderdate"))
        V.write_snapshot(ins, t)
        eq_keys = [r[0] for r in
                   orders.filter((k_col >= 600) & (k_col < 700)
                                 & (k_col % 3 == 0))
                   .select("o_orderkey").distinct().collect()]
        V.delete_where_keys(spark, t, "o_orderkey", eq_keys)
        v_to = V.latest_version(t)
        inc = V._changes_incremental(spark, t, v_base, v_to,
                                     "o_orderkey")
        inc_ok = inc is not None
        if inc_ok:
            base = {path_key(f) for f in base_files}
            read = {path_key(u) for u in inc.inputFiles()}
            inc_ok = len(read & base) < len(base)
        got = (t, v_base, bool(inc_ok))
        _CDF_RENAME[key] = got
    return got


@register(
    "scale_cdf_across_rename",
    oracle="""
    WITH ch AS (
      SELECT 'delete' AS _change_type, o_orderkey,
             o_totalprice AS total_price
      FROM orders WHERE o_orderkey < 600
      UNION ALL
      SELECT 'delete', o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 700
        AND o_orderkey % 3 = 0
      UNION ALL
      SELECT 'insert', -o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 1009 = 0 AND o_orderkey <> 0
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(total_price AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           TRUE AS inc_ok, TRUE AS drop_ok
    FROM ch GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "cdf", "incremental", "schema-evolution"],
)
def scale_cdf_across_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDF whose window BRACKETS a RENAME and a DROP
    (`sinks/versioned.changes_between(..., incremental=True)` across
    `rename_column` + `drop_column`): both are metadata-only commits
    here, so the derivation scans both sides physically and renders
    under WINDOW-END names — deleted rows surface their values under
    the NEW name (never NULL), the dropped column simply never enters
    the output, and the job still reads only changed files (round-9
    verdict: this exact window used to pay two full scans).  inc_ok
    asserts engagement + the strict-subset inputFiles proof; drop_ok
    asserts the dropped column is gone from the feed.  Must hash-match
    plain SQL reconstructing the same delete/insert set from raw
    orders under the renamed aliases."""
    from ..sinks import versioned as V

    t, v_base, inc_ok = _cdf_rename_orders(spark, sf_dir)
    ch = V.changes_between(spark, t, v_base, V.latest_version(t),
                           "o_orderkey", incremental=True)
    drop_ok = "o_orderpriority" not in ch.columns \
        and "total_price" in ch.columns
    return (ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.sum(F.col("total_price").cast("decimal(18,2)"))
                 .cast("double").alias("rev"))
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .withColumn("drop_ok", F.lit(bool(drop_ok)))
            .orderBy("_change_type"))


@fixture_timed("cdf_widen_r10")
def _cdf_widen_orders(spark: SparkSession, sf_dir: str
                      ) -> tuple[str, int, bool]:
    """Once per (session, sf_dir): versioned `orders` written with
    o_custkey NARROWED to INT, compacted into 8 key-clustered files,
    then a change window that BRACKETS a TYPE WIDEN —

      1. position-delete (keys < 600),
      2. ``widen_column(o_custkey → long)`` — metadata-only,
      3. a post-widen append whose o_custkey values NEED the wide type
         (+3,000,000,000 > INT_MAX, negated keys k % 1009 == 0),
      4. equality tombstones on keys in [600, 700) ≡ 0 mod 3.

    Returns ``(table, v_base, inc_ok)`` — inc_ok asserts the
    incremental derivation ENGAGED across the widen (the dead side
    scans narrow files WITH the widened type, promotion-only) and read
    a strict subset of the baseline files."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from ..sinks.storage import path_key

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CDF_WIDEN.get(key)
    if got is None:
        _drop_cdf_schema_evo(_CDF_WIDEN,
                             [k for k in _CDF_WIDEN if k[0] != key[0]])
        if not _CDF_WIDEN:
            atexit.register(_drop_cdf_schema_evo, _CDF_WIDEN)
        t = tempfile.mkdtemp(prefix="spark_graft_cdfwiden_")
        (orders,) = _t(spark, sf_dir, "orders")
        narrow = orders.withColumn("o_custkey",
                                   F.col("o_custkey").cast("int"))
        V.write_snapshot(narrow, t)
        V.compact_snapshot(spark, t, n_files=8, cluster_by=["o_orderkey"])
        v_base = V.latest_version(t)
        base_files = V._read_manifest(t, v_base)
        k_col = F.col("o_orderkey")
        V.delete_where(spark, t, "o_orderkey < 600",
                       predicates=[("o_orderkey", "<", 600)])
        V.widen_column(t, "o_custkey", "long")
        ins = (narrow.filter((k_col % 1009 == 0) & (k_col != 0))
               .withColumn("o_orderkey", -k_col)
               .withColumn("o_custkey",
                           (F.col("o_custkey").cast("long")
                            + F.lit(3_000_000_000))))
        V.write_snapshot(ins.select(*narrow.columns), t)
        eq_keys = [r[0] for r in
                   orders.filter((k_col >= 600) & (k_col < 700)
                                 & (k_col % 3 == 0))
                   .select("o_orderkey").distinct().collect()]
        V.delete_where_keys(spark, t, "o_orderkey", eq_keys)
        v_to = V.latest_version(t)
        inc = V._changes_incremental(spark, t, v_base, v_to,
                                     "o_orderkey")
        inc_ok = inc is not None
        if inc_ok:
            base = {path_key(f) for f in base_files}
            read = {path_key(u) for u in inc.inputFiles()}
            inc_ok = len(read & base) < len(base)
        got = (t, v_base, bool(inc_ok))
        _CDF_WIDEN[key] = got
    return got


@register(
    "scale_cdf_across_widen",
    oracle="""
    WITH ch AS (
      SELECT 'delete' AS _change_type, o_orderkey,
             CAST(o_custkey AS BIGINT) AS cust
      FROM orders WHERE o_orderkey < 600
      UNION ALL
      SELECT 'delete', o_orderkey, o_custkey
      FROM orders WHERE o_orderkey >= 600 AND o_orderkey < 700
        AND o_orderkey % 3 = 0
      UNION ALL
      SELECT 'insert', -o_orderkey, o_custkey + 3000000000
      FROM orders WHERE o_orderkey % 1009 = 0 AND o_orderkey <> 0
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(cust) AS BIGINT) AS cust_sum,
           TRUE AS inc_ok
    FROM ch GROUP BY 1 ORDER BY 1
    """,
    tags=["scale", "versioned", "cdf", "incremental", "schema-evolution"],
)
def scale_cdf_across_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDF whose window BRACKETS a TYPE WIDEN
    (`widen_column(o_custkey: int → long)`): widening is
    promotion-only, so the dead side scans the narrow pre-widen files
    WITH the widened type (the parquet reader up-casts at scan,
    losslessly) and the two sides union natively — no full-table
    fallback, and the post-widen insert carries values that NEED the
    wide type (> INT_MAX).  inc_ok asserts engagement + the
    strict-subset inputFiles proof.  Must hash-match plain SQL
    reconstructing the same change set from raw orders."""
    from ..sinks import versioned as V

    t, v_base, inc_ok = _cdf_widen_orders(spark, sf_dir)
    ch = V.changes_between(spark, t, v_base, V.latest_version(t),
                           "o_orderkey", incremental=True)
    return (ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").cast("long").alias("key_sum"),
                 F.sum(F.col("o_custkey")).cast("long").alias("cust_sum"))
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .orderBy("_change_type"))


# ---------------------------------------------------------------------------
# real audio/video container metadata through the Arrow batch path
# (round-9 verdict, Next round #3 — WAV/RIFF chunk walk + MP4 box walk)
# ---------------------------------------------------------------------------

def _mk_wav(rate: int, channels: int, samples: list[int]) -> bytes:
    """Genuine RIFF/WAVE stream: fmt chunk (PCM, 16-bit) + data chunk of
    interleaved little-endian samples — the walk `operators/multimodal.
    _decode_wav_pure` performs.  ``samples`` is the full interleaved
    stream (len // channels frames per channel)."""
    import struct

    pcm = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _mk_mp4(timescale: int, duration: int, n_tracks: int,
            v1: bool = False) -> bytes:
    """Minimal ISO-BMFF stream: ftyp + moov(mvhd + n empty trak boxes),
    mvhd in version 0 or 1 layout — the walk `_decode_mp4_pure`
    performs."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    if v1:
        mvhd = (bytes([1]) + b"\x00" * 3 + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration))
    else:
        mvhd = (bytes([0]) + b"\x00" * 3 + b"\x00" * 8
                + struct.pack(">II", timescale, duration))
    moov = box(b"moov", box(b"mvhd", mvhd)
               + box(b"trak", b"") * n_tracks)
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


@register(
    "mm_real_decode_av",
    oracle="""
    WITH i AS (SELECT UNNEST(range(0, 30)) AS i)
    SELECT CASE WHEN i % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN i % 2 = 0
                    THEN (100 + i * 10) * 1000 // (8000 + (i % 5) * 1000)
                    ELSE (2000 + i * 100) * 1000 // (1000 + i * 10)
                    END) AS BIGINT) AS sum_duration_ms,
           CAST(SUM(CASE WHEN i % 2 = 0 THEN 100 + i * 10 ELSE 0 END)
                AS BIGINT) AS sum_samples,
           CAST(SUM(CASE WHEN i % 2 = 0 THEN 0 ELSE 1 + i % 3 END)
                AS BIGINT) AS sum_tracks
    FROM i GROUP BY 1 ORDER BY 1
    """,
    tags=["multimodal", "decode", "metadata", "audio", "video"],
)
def mm_real_decode_av(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio/video CONTAINER metadata decode through the Arrow
    batch path (the round-9 verdict's residual multimodal gap): 30
    synthesized assets — genuine RIFF/WAVE streams with
    arithmetically-known sample rates, channel counts, and per-channel
    sample counts, and genuine ISO-BMFF streams (mvhd version 0 AND 1
    layouts) with known timescale/duration/track counts — run through
    `operators/multimodal.extract_container_meta` (mapInPandas);
    duration/sample/track sums hash-matched against the generating
    arithmetic.  A walker falling back to the NULL-container row zeroes
    a sum and flips the hash."""
    from ..operators import multimodal as mm

    rows = []
    for i in range(30):
        if i % 2 == 0:
            rate = 8000 + (i % 5) * 1000
            channels = 1 + (i // 2) % 2
            n_samp = 100 + i * 10
            content = _mk_wav(rate, channels, [0] * (n_samp * channels))
            rows.append((i, "audio", bytearray(content), "audio/wav"))
        else:
            content = _mk_mp4(1000 + i * 10, 2000 + i * 100, 1 + i % 3,
                              v1=i % 4 == 1)
            rows.append((i, "video", bytearray(content), "video/mp4"))
    assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    meta = mm.extract_container_meta(assets)
    return (meta.groupBy("container")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("duration_ms").cast("long")
                 .alias("sum_duration_ms"),
                 F.coalesce(F.sum("n_samples"), F.lit(0)).cast("long")
                 .alias("sum_samples"),
                 F.coalesce(F.sum("n_tracks"), F.lit(0)).cast("long")
                 .alias("sum_tracks"))
            .orderBy("container"))


@register(
    "mm_wav_window_energy",
    oracle="""
    WITH a AS (SELECT UNNEST(range(0, 12)) AS i),
         k AS (SELECT UNNEST(range(0, 64)) AS k),
         s AS (SELECT i, k, ((i * 37 + k * 11) % 4096) - 2048 AS v
               FROM a CROSS JOIN k)
    SELECT i AS asset_id, k // 8 AS window_idx,
           CAST(SUM(v * v) AS BIGINT) AS energy
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["multimodal", "audio", "decode"],
)
def mm_wav_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform framing over GENUINE WAV containers (`operators/
    multimodal.wav_window_energy`): 12 mono 16-bit RIFF streams whose
    PCM samples follow a known arithmetic, framed into 8-sample
    windows, each emitting its exact integer energy Σ s² — the
    voice-activity front end fed by a REAL container walk instead of
    the ASCII-hex fixture (`mm_audio_window_energy` keeps that
    variant).  Hash-matched against SQL replaying the sample
    arithmetic."""
    from ..operators import multimodal as mm

    rows = []
    for i in range(12):
        samples = [((i * 37 + k * 11) % 4096) - 2048 for k in range(64)]
        rows.append((i, "audio", bytearray(_mk_wav(16000, 1, samples)),
                     "audio/wav"))
    assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    return (mm.wav_window_energy(assets, window=8)
            .orderBy("asset_id", "window_idx"))


# ---------------------------------------------------------------------------
# epoch-stable shuffled batch order over the packed corpus
# (round-9 verdict, Next round #4)
# ---------------------------------------------------------------------------

@register(
    "corpus_pack_epoch_order",
    oracle=_R9._PACK_CTE.format(g=8, w=256,
                                pieces=_R9._PIECES_WHOLE.format(w=256))
    + """,
    wins AS (SELECT DISTINCT g, win FROM pack),
    eps(epoch, a, b) AS (VALUES (1, 125448125, 114), (2, 125488628, 211)),
    keyed AS (
      SELECT epoch, g, win,
             (a * ((g * 1000003 + win) % 1000000007) + b) % 1000000007
               AS order_key
      FROM wins CROSS JOIN eps
    )
    SELECT epoch, g, win, order_key,
           ROW_NUMBER() OVER (PARTITION BY epoch
                              ORDER BY order_key, g, win) AS epoch_rank
    FROM keyed ORDER BY epoch, epoch_rank
    """,
    tags=["corpus", "packing", "llm", "scale"],
)
def corpus_pack_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-stable SHUFFLED batch order composed onto the packed
    lakehouse table (`operators/seqpack.epoch_order` over the
    hidden-partitioned windows of `scale_packed_windows_pruned_read`):
    each epoch's affine-mod-prime key permutes the (g, win) windows
    deterministically and skew-free with NO global sort — the key is
    map-side, the rank is the two-phase range-partitioned
    `global_row_number` — and two epochs' FULL orders (rank included)
    hash-match DuckDB replaying the identical permutation over the
    recursive-CTE pack.  This is the missing reproducibility piece of
    the training lane: epoch N's batch sequence is a pure function of
    (corpus version, epoch, seed)."""
    from ..operators.seqpack import epoch_order
    from ..operators.windows import global_row_number_grouped
    from ..sinks import versioned as V
    from .queries_round9 import _packed_windows_table

    t, _ = _packed_windows_table(spark, sf_dir)
    packed = V.read_version(spark, t)
    # both epochs ride ONE two-phase rank pass (grouped by epoch, rank
    # restarting per epoch — identical numbering to the per-epoch loop)
    keyed = (epoch_order(packed, 1).withColumn("epoch", F.lit(1))
             .unionByName(epoch_order(packed, 2)
                          .withColumn("epoch", F.lit(2))))
    out, _n = global_row_number_grouped(
        keyed, "epoch",
        [("order_key", "asc"), ("g", "asc"), ("win", "asc")],
        out_col="epoch_rank")
    return (out.select("epoch", "g", "win", "order_key", "epoch_rank")
            .orderBy("epoch", "epoch_rank"))


# ---------------------------------------------------------------------------
# the full corpus-to-training-artifact lane under ONE hash
# (round-9 verdict, Next round #6)
# ---------------------------------------------------------------------------

_ASSEMBLED: dict = {}


def _drop_assembled(keys=None) -> None:
    import shutil

    for k in list(_ASSEMBLED) if keys is None else list(keys):
        for d in _ASSEMBLED.pop(k)[:3]:
            shutil.rmtree(d, ignore_errors=True)


@fixture_timed("assembled_shards_r10")
def _assembled_shards(spark: SparkSession, sf_dir: str
                      ) -> tuple[str, str, str, bool]:
    """Once per (session, sf_dir): the corpus lane run END TO END into
    its two training artifacts — exact-dedup the documents, pack the
    unique survivors into 256-token windows COMMITTED hidden-partitioned
    on identity(g) (the shard layout a 1000-worker loader prune-reads),
    and commit the survivors' embeddings as a versioned base with its
    persisted band index built on top (`plans/ann.build_ann_index`).
    Returns ``(pack_dir, emb_dir, index_dir, prune_ok)``; prune_ok
    asserts a single-shard read plans only that shard's files."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _ASSEMBLED.get(key)
    if got is None:
        _drop_assembled([k for k in _ASSEMBLED if k[0] != key[0]])
        if not _ASSEMBLED:
            atexit.register(_drop_assembled)
        from ..operators.seqpack import pack_sequences

        pack_dir = tempfile.mkdtemp(prefix="spark_graft_shards_")
        emb_dir = tempfile.mkdtemp(prefix="spark_graft_shardemb_")
        index_dir = tempfile.mkdtemp(prefix="spark_graft_shardidx_")
        docs, emb = (_t(spark, sf_dir, "documents")[0],
                     _t(spark, sf_dir, "embeddings")[0])
        uniq = (docs.groupBy(F.md5(F.col("text")))
                .agg(F.min("doc_id").alias("doc_id"),
                     F.expr("(min(n_chars) + 3) div 4").cast("long")
                     .alias("n_tokens")))
        surv = emb.join(uniq.select(F.col("doc_id").alias("vec_id")),
                        "vec_id", "left_semi") \
            .select("vec_id", "embedding")
        V.write_snapshot(surv, emb_dir)
        ann.build_ann_index(spark, index_dir, emb_dir, **_ANN)
        packed = pack_sequences(uniq, 256, count_col="n_tokens",
                                n_groups=8)
        V.write_snapshot(packed, pack_dir,
                         partition_by=["identity(g)"])
        pruned = V.read_version(spark, pack_dir,
                                predicates=[("g", "=", 5)])
        manifest = V._read_manifest(pack_dir,
                                    V.latest_version(pack_dir))
        prune_ok = 0 < len(pruned.inputFiles()) < len(manifest)
        got = (pack_dir, emb_dir, index_dir, bool(prune_ok))
        _ASSEMBLED[key] = got
    return got


@register(
    "corpus_assemble_to_shards",
    oracle=f"""
    WITH RECURSIVE uniq AS (
      SELECT MIN(doc_id) AS doc_id, (MIN(n_chars) + 3) // 4 AS t
      FROM documents GROUP BY md5(text)
    ), base AS (
      SELECT CAST(doc_id % 8 AS INTEGER) AS g, doc_id AS id, t
      FROM uniq
    ), pieces AS (
      SELECT g, id, 0 AS piece, t AS pt,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY id) AS rn
      FROM base WHERE t <= 256
    ), pack AS (
      SELECT g, id, piece, pt, rn, CAST(1 AS BIGINT) AS win,
             pt AS fill
      FROM pieces WHERE rn = 1
      UNION ALL
      SELECT d.g, d.id, d.piece, d.pt, d.rn,
             CASE WHEN p.fill + d.pt <= 256 THEN p.win
                  ELSE p.win + 1 END,
             CASE WHEN p.fill + d.pt <= 256 THEN p.fill + d.pt
                  ELSE d.pt END
      FROM pack p JOIN pieces d ON d.g = p.g AND d.rn = p.rn + 1
    ),
    {_band_planes_sql(_ANN['n_bands'], _ANN['planes_per_band'])},
    e AS (SELECT em.vec_id, CAST(em.embedding AS DOUBLE[]) AS v
          FROM embeddings em JOIN uniq ON em.vec_id = uniq.doc_id),
    {_band_bucket_sql()},
    idx AS (SELECT COUNT(*) AS n_indexed,
                   CAST(SUM(bucket) AS BIGINT) AS bucket_sum
            FROM bk),
    p AS (SELECT g, CAST(MAX(win) AS BIGINT) AS n_windows,
                 COUNT(*) AS n_docs, CAST(SUM(pt) AS BIGINT) AS tokens,
                 CAST(SUM(win * pt) AS BIGINT) AS win_tok_sum
          FROM pack GROUP BY g)
    SELECT p.g, p.n_windows, p.n_docs, p.tokens, p.win_tok_sum,
           idx.n_indexed, idx.bucket_sum, TRUE AS prune_ok
    FROM p CROSS JOIN idx ORDER BY p.g
    """,
    tags=["corpus", "packing", "dedup", "similarity", "versioned",
          "llm", "scale"],
)
def corpus_assemble_to_shards(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The corpus-to-training-artifact lane as ONE oracle-checked
    composition (`corpus_dedup_then_pack` extended through the
    lakehouse): exact-dedup -> pack unique survivors into 256-token
    windows -> COMMIT hidden-partitioned shards (single-shard read
    prune-proven) -> build the PERSISTED band index over the
    survivors\' embeddings — per-shard window stats AND the index
    content checksum under one hash, so a duplicate leaking through
    dedup, a misplaced piece, or a stale index row each flip it.
    Everything reads back from the COMMITTED versioned tables, not the
    in-flight frames — what a training job actually opens."""
    from ..sinks import versioned as V

    pack_dir, _emb_dir, index_dir, prune_ok = \
        _assembled_shards(spark, sf_dir)
    packed = V.read_version(spark, pack_dir)
    idx = (V.read_version(spark, index_dir)
           .agg(F.count(F.lit(1)).alias("n_indexed"),
                F.sum("bucket").cast("long").alias("bucket_sum")))
    per_g = (packed.groupBy("g")
             .agg(F.max("win").cast("long").alias("n_windows"),
                  F.count(F.lit(1)).alias("n_docs"),
                  F.sum("piece_tokens").cast("long").alias("tokens"),
                  F.sum(F.col("win") * F.col("piece_tokens"))
                  .cast("long").alias("win_tok_sum")))
    return (per_g.crossJoin(F.broadcast(idx))
            .withColumn("prune_ok", F.lit(bool(prune_ok)))
            .orderBy("g"))

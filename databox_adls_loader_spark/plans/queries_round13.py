"""Round-13 registry extensions.

Headline: the drift lifecycle OPERATED (round-12 verdict, Next round
#1).  Round 12 proved detect → retrain → republish works for PQ
codebooks, but nothing *watched* the drift stat — a serving fleet
needed a human to notice a contract query — and the IVF family had no
committed republish path at all (the rebalance contract trained its
candidate centroids in-query and threw them away).  This round:

  * `sinks/maintenance.index_drift_report` — the operational trigger:
    exact-integer TV ppm of the LIVE code histogram against the
    BASELINE histogram published with the codebook generation (one
    skinny-index aggregation, no corpus scan), with
    ``retrain_recommended`` raised at the floor.  The baseline rides
    the same catalog transaction as the books, so a pinned reader's
    drift question is answered against the generation it resolves
    codes with.  `scale_index_drift_trigger` proves it fires on the
    planted drift and stays quiet at publish (tv ≡ 0 by construction).
  * `scale_ivf_retrain_publish` — IVF centroids get what PQ codebooks
    got in round 12: a committed centroid-GENERATION table with
    write-audit-publish republish.  Stage the re-assignment invisibly,
    AUDIT the rebalance contract (max-share shrinks, probe I/O
    shrinks, recall floor holds — the routing failure mode, measured),
    and only a passing audit publishes centroid gen 1 + the re-encoded
    assignment table together; readers pinned to the drift version
    keep resolving gen-0 cells.

Reference boundary: the reference re-runs everything by hand
(README.md:183-185 — a human edits the id_map and re-executes); the
engine's thesis is that maintenance is DERIVED STATE, and round 13
finishes applying it to the index families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, fixture_timed, register
from .queries_round12 import (_IVFR, _PQR_DELTA_BASE, _PQR_QIDS,
                              _PQR_SAMPLE, _PQR_STATE_SQL,
                              _ivfr_probe_sql, _pqr_book_df,
                              _pqr_codes_sql, _pqr_d2_sql,
                              _pqr_drift_expr, _pqr_lifecycle,
                              _pqr_trainer_sql, _pqr_xu_sql)

# ---------------------------------------------------------------------------
# the operated drift trigger: index_drift_report over the round-12 PQ
# lifecycle's committed (index, baseline) pairs
# ---------------------------------------------------------------------------

_DRIFT_FLOOR_PPM = 150_000  # live-vs-baseline TV; the planted drift
#                             measures ~300-440k ppm (exactly half the
#                             pre-vs-delta detect stat when |delta| =
#                             |base|), publish-time is exactly 0


_TRIGGER_HIST_SQL = f"""
    histc AS (SELECT sub, code, COUNT(*) AS n_cur
              FROM codes0 GROUP BY sub, code),
    histb AS (SELECT sub, code, COUNT(*) AS n_base
              FROM codes0 WHERE vec_id < {_PQR_DELTA_BASE}
              GROUP BY sub, code),
    hj AS (SELECT COALESCE(c.sub, b.sub) AS sub,
                  COALESCE(c.n_cur, 0) AS n_cur,
                  COALESCE(b.n_base, 0) AS n_base
           FROM histc c FULL OUTER JOIN histb b
             ON c.sub = b.sub AND c.code = b.code),
    htot AS (SELECT sub, SUM(n_cur) AS nc, SUM(n_base) AS nb
             FROM hj GROUP BY sub),
    hpost AS (SELECT j.sub,
                     CAST(SUM(ABS(j.n_cur * t.nb - j.n_base * t.nc))
                          * 1000000 // (2 * t.nc * t.nb) AS BIGINT)
                       AS tv_ppm
              FROM hj j JOIN htot t USING (sub)
              GROUP BY j.sub, t.nc, t.nb)
"""


@register(
    "scale_index_drift_trigger",
    oracle=f"""
    WITH {_PQR_STATE_SQL},
    {_pqr_xu_sql('eall')},
    {_pqr_trainer_sql('eA', 'b0',
                      xu='eall_xu')},
    {_pqr_codes_sql('eall', 'b0bk', 'codes0')},
    {_TRIGGER_HIST_SQL},
    pre AS (SELECT 'publish' AS phase, sub, CAST(0 AS BIGINT) AS tv_ppm
            FROM range(0, 4) AS s(sub)),
    post AS (SELECT 'drifted' AS phase, sub, tv_ppm FROM hpost)
    SELECT phase, sub, tv_ppm,
           tv_ppm >= {_DRIFT_FLOOR_PPM} AS retrain_recommended
    FROM (SELECT * FROM pre UNION ALL SELECT * FROM post)
    ORDER BY phase, sub
    """,
    tags=["scale", "similarity", "pq", "drift", "maintenance",
          "versioned", "catalog"],
)
def scale_index_drift_trigger(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The drift lifecycle OPERATED — `index_drift_report` run at two
    catalog pins of the round-12 PQ lifecycle: at the BUILD pin
    (catalog v0: live index ≡ published baseline, tv exactly 0 for
    every subspace — the trigger stays QUIET) and at the DRIFT pin
    (catalog v1: the O(changes)-maintained index has absorbed the
    reflected delta under frozen gen-0 books, the live histogram walks
    off the publish-time baseline, tv lands 300-440k ppm and the
    trigger FIRES at the 150k floor).  One aggregation over the skinny
    code table per phase — the corpus floats are never read: the
    trigger an operator (or the streaming maintenance twin's
    foreachBatch tail) polls between retrains costs an index scan.

    The oracle replays the gen-0 training, encodes the full post-drift
    state, and derives the identical integer histograms — every tv
    value AND both trigger verdicts ride the value hash.

    Trainer subtlety shared with the oracle: `ann.pq_sample_int` ranks
    the PRE-drift corpus (ids < delta base), and md5-rank over that id
    set is identical whether computed on eA or on eall filtered — the
    oracle trains b0 off the eall µ-int CTE for reuse, restricted by
    the sample's id universe."""
    from ..sinks import catalog as C
    from ..sinks import maintenance as M

    cat, *_ = _pqr_lifecycle(spark, sf_dir)

    def phase(label: str, cat_v: int) -> DataFrame:
        rep = M.index_drift_report(
            C.read_table(spark, cat, "pq_index", catalog_version=cat_v),
            C.read_table(spark, cat, "pq_baseline",
                         catalog_version=cat_v),
            floor_ppm=_DRIFT_FLOOR_PPM)
        return rep.select(F.lit(label).alias("phase"), "sub", "tv_ppm",
                          "retrain_recommended")

    return (phase("publish", 0).unionByName(phase("drifted", 1))
            .orderBy("phase", "sub"))


# ---------------------------------------------------------------------------
# IVF centroid republish: the committed write-audit-publish path the
# rebalance contract measured but round 12 never operated
# ---------------------------------------------------------------------------

_IVFR_TABLES = ("embeddings", "ivf_index", "ivf_centroids",
                "ivf_baseline")

_IVFR_LIFE: dict = {}


def _drop_ivfr(keys=None) -> None:
    import shutil

    for k in list(_IVFR_LIFE) if keys is None else list(keys):
        for d in _IVFR_LIFE.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


def _ivfr_cells(cent_rows, qmu: list[int]) -> list[int]:
    """The probe's nprobe nearest cells against a COMMITTED centroid
    generation (rows (gen, sub, code, cs)) — k_cells bounded collect,
    same (d2, cell) ranking as the in-query contract."""
    from . import ann

    cents = {int(r["code"]): [int(x) for x in r["cs"]]
             for r in cent_rows}
    return sorted(sorted(cents),
                  key=lambda c: (ann._d2(qmu, cents[c]), c)
                  )[:_IVFR["nprobe"]]


def _ivfr_side(full: DataFrame, asg: DataFrame, cells: list[int],
               n_all: int, q: list[float], bf: DataFrame,
               tag: str) -> DataFrame:
    """(max_share, routed_share, n_routed, n_hits) one-row frame for
    one committed assignment generation — the rebalance contract's
    measurement, off catalog tables instead of in-query trainings."""
    from . import ann

    occ = (asg.groupBy("code").agg(F.count(F.lit(1)).alias("c"))
           .agg(F.expr(f"CAST(max(c) * 1000000L DIV {n_all}L AS LONG)")
                .alias(f"ms{tag}")))
    routed = asg.filter(F.col("code").isin(cells)).select("vec_id")
    nr = routed.agg(
        F.count(F.lit(1)).alias(f"nr{tag}"),
        F.expr(f"CAST(count(1) * 1000000L DIV {n_all}L AS LONG)")
        .alias(f"rs{tag}"))
    top = (full.join(F.broadcast(routed), "vec_id", "left_semi")
           .select("vec_id",
                   ann.exact_d2_q(q)(F.col("embedding")).alias("d2"))
           .orderBy("d2", "vec_id").limit(_IVFR["k"]))
    hits = (top.join(bf, "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias(f"nh{tag}")))
    return occ.crossJoin(nr).crossJoin(hits)


@fixture_timed("ivfr_publish_r13")
def _ivfr_lifecycle(spark: SparkSession, sf_dir: str
                    ) -> tuple[str, bool]:
    """Once per (session, sf_dir): the IVF ROUTING lifecycle as three
    catalog transactions over (embeddings, ivf_index, ivf_centroids,
    ivf_baseline):

      v0  build    — centroids gen 0 trained on the initial corpus
                     (the integer m=1 trainer — whole-vector µ-ints,
                     so codes ARE cells), full assignment, centroid
                     generation + drift baseline committed as TABLES.
      v1  drift    — the reflected delta appends; the assignment table
                     is maintained O(changes) under FROZEN gen-0
                     centroids (`ann.refresh_pq_index_int` — routing
                     never moves centroids; that's the failure mode).
      v2  republish— gen-1 centroids trained on the post-drift corpus,
                     full re-assignment STAGED (invisible through the
                     catalog), the REBALANCE AUDIT measured against
                     the stale generation (max cell share shrinks,
                     the drifted probe's routed I/O shrinks, recall@20
                     holds the 60% floor), and only a passing audit
                     publishes centroid gen 1 + assignments + a fresh
                     drift baseline together.  A failed audit leaves
                     readers on v1 — stale but consistent, and the
                     centroid table read through the catalog still
                     resolves gen 0.

    Returns (cat_dir, audit_ok).  Cites the round-12 rebalance
    contract (`queries_round12.py:1477`) for the audit inequalities —
    this fixture COMMITS what that query only measured."""
    import atexit
    import math
    import tempfile

    from ..sinks import catalog as C
    from ..sinks import maintenance as M
    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVFR_LIFE.get(key)
    if got is not None:
        return got[1]
    _drop_ivfr([k for k in _IVFR_LIFE if k[0] != key[0]])
    if not _IVFR_LIFE:
        atexit.register(_drop_ivfr)
    dirs = tuple(tempfile.mkdtemp(prefix=f"spark_graft_ivfr_{n}_")
                 for n in ("emb", "idx", "cent", "bl"))
    emb_dir, idx_dir, cent_dir, bl_dir = dirs
    cat = tempfile.mkdtemp(prefix="spark_graft_ivfr_cat_")
    geo = dict(m=1, k_codes=_IVFR["k_cells"], iters=_IVFR["iters"])
    (emb,) = _t(spark, sf_dir, "embeddings")
    emb0 = emb.select("vec_id", "embedding")

    V.write_snapshot(emb0, emb_dir)
    C0 = ann.pq_train_int(
        ann.pq_sample_int(V.read_version(spark, emb_dir), _PQR_SAMPLE),
        **geo)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, C0)
    V.write_snapshot(_pqr_book_df(spark, C0, 0), cent_dir,
                     mode="overwrite")
    V.write_snapshot(
        M.code_baseline(V.read_version(spark, idx_dir), 0), bl_dir,
        mode="overwrite")
    tabs = dict(zip(_IVFR_TABLES,
                    ((d, None) for d in (emb_dir, idx_dir, cent_dir,
                                         bl_dir))))
    C.commit_txn(cat, tabs, txn_id="ivfr-build")

    delta = emb0.select(
        (F.col("vec_id") + F.lit(_PQR_DELTA_BASE)).alias("vec_id"),
        _pqr_drift_expr(F.col("embedding")).alias("embedding"))
    V.write_snapshot(delta, emb_dir)
    ann.refresh_pq_index_int(spark, idx_dir, emb_dir, C0)
    C.commit_txn(cat, tabs, txn_id="ivfr-drift")

    full = V.read_version(spark, emb_dir)
    n_all = full.count()
    C1 = ann.pq_train_int(ann.pq_sample_int(full, _PQR_SAMPLE), **geo)
    # WRITE: stage re-assignment + gen-1 centroids + fresh baseline —
    # the catalog does not pin them yet (readers still resolve gen 0)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, C1)
    V.write_snapshot(_pqr_book_df(spark, C1, 1), cent_dir,
                     mode="overwrite")
    V.write_snapshot(
        M.code_baseline(V.read_version(spark, idx_dir), 1), bl_dir,
        mode="overwrite")
    # AUDIT: the rebalance contract, staged vs stale
    q = [float(x) for x in full.filter(
        F.col("vec_id") == _PQR_QIDS[0]).first()["embedding"]]
    qmu = [math.floor((x + ann.PQ_INT_OFFSET) * 1_000_000.0)
           for x in q]
    bf = ann.exact_topk_int(full, q, _IVFR["k"]).select("vec_id")
    stale = (C.read_table(spark, cat, "ivf_index")
             .select("vec_id", "code"))
    staged = (V.read_version(spark, idx_dir)
              .select("vec_id", "code"))
    cells0 = _ivfr_cells(
        C.read_table(spark, cat, "ivf_centroids").collect(), qmu)
    cells1 = _ivfr_cells(
        V.read_version(spark, cent_dir).collect(), qmu)
    a = (_ivfr_side(full, stale, cells0, n_all, q, bf, "0")
         .crossJoin(_ivfr_side(full, staged, cells1, n_all, q, bf,
                               "1"))
         .first())
    audit_ok = (a["ms1"] < a["ms0"] and a["nr1"] < a["nr0"]
                and a["nh1"] * 10 >= _IVFR["k"] * 6)
    # PUBLISH only on a passing audit — the catalog pin IS the release
    if audit_ok:
        C.commit_txn(cat, tabs, txn_id="ivfr-republish")
    got = (cat, bool(audit_ok))
    _IVFR_LIFE[key] = (dirs + (cat,), got)
    return got


@register(
    "scale_ivf_retrain_publish",
    oracle=f"""
    WITH {_PQR_STATE_SQL},
    {_pqr_xu_sql('eA', _IVFR['dim'], 1, 'eA_xuf')},
    {_pqr_xu_sql('eall', _IVFR['dim'], 1, 'eall_xuf')},
    {_pqr_trainer_sql('eA', 'c0', _IVFR['dim'], _IVFR['k_cells'],
                      _IVFR['iters'], xu='eA_xuf')},
    {_pqr_trainer_sql('eall', 'c1', _IVFR['dim'], _IVFR['k_cells'],
                      _IVFR['iters'], xu='eall_xuf')},
    {_pqr_codes_sql('eall', 'c0bk', 'asg0', _IVFR['dim'],
                    xu='eall_xuf')},
    {_pqr_codes_sql('eall', 'c1bk', 'asg1', _IVFR['dim'],
                    xu='eall_xuf')},
    nall AS (SELECT COUNT(*) AS n FROM eall),
    occ0 AS (SELECT CAST(MAX(c) * 1000000 // MAX(n) AS BIGINT)
               AS share FROM (SELECT code, COUNT(*) AS c FROM asg0
                              GROUP BY code) CROSS JOIN nall),
    occ1 AS (SELECT CAST(MAX(c) * 1000000 // MAX(n) AS BIGINT)
               AS share FROM (SELECT code, COUNT(*) AS c FROM asg1
                              GROUP BY code) CROSS JOIN nall),
    qfx AS (SELECT x.sub, x.xs FROM eall_xuf x
            WHERE x.vec_id = {_PQR_QIDS[0]}),
    exdf AS MATERIALIZED (
        SELECT x.vec_id,
               {_pqr_d2_sql('x.xs', 'qf.xs', _IVFR['dim'])} AS d2
        FROM eall_xuf x CROSS JOIN qfx qf),
    bff AS (SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS rn
        FROM exdf) WHERE rn <= {_IVFR['k']}),
    {_ivfr_probe_sql('c0bk', 'asg0', 'r0')},
    {_ivfr_probe_sql('c1bk', 'asg1', 'r1')},
    audit AS (SELECT occ1.share < occ0.share AS rebalance_ok,
                     r1.n_routed < r0.n_routed AS probe_io_shrinks,
                     r1.n_hits * 10 >= {_IVFR['k']} * 6
                       AS recall_floor_ok,
                     occ0.share AS ms0, occ1.share AS ms1,
                     CAST(r0.n_routed * 1000000 // nall.n AS BIGINT)
                       AS rs0,
                     CAST(r1.n_routed * 1000000 // nall.n AS BIGINT)
                       AS rs1,
                     CAST(r0.n_hits AS BIGINT) AS nh0,
                     CAST(r1.n_hits AS BIGINT) AS nh1
              FROM occ0 CROSS JOIN occ1 CROSS JOIN nall
              CROSS JOIN r0stats r0 CROSS JOIN r1stats r1)
    SELECT CAST(0 AS INTEGER) AS gen_pinned,
           CAST(CASE WHEN rebalance_ok AND probe_io_shrinks
                      AND recall_floor_ok THEN 1 ELSE 0 END
                AS INTEGER) AS gen_published,
           ms0 AS max_share_before_ppm, ms1 AS max_share_after_ppm,
           rs0 AS routed_share_before_ppm,
           rs1 AS routed_share_after_ppm,
           nh0 AS n_hits_before, nh1 AS n_hits_after,
           rebalance_ok, probe_io_shrinks, recall_floor_ok,
           rebalance_ok AND probe_io_shrinks AND recall_floor_ok
             AS published
    FROM audit
    """,
    tags=["scale", "similarity", "ivf", "drift", "eval", "recall",
          "versioned", "catalog", "maintenance"],
)
def scale_ivf_retrain_publish(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """IVF centroid REPUBLISH, committed — the operated form of the
    round-12 rebalance contract: every number here is read back
    through the CATALOG from the lifecycle's committed tables (stale
    assignments + gen-0 centroids at the drift pin, retrained
    assignments + gen-1 centroids at the published head), not from
    in-query trainings.  The contract inequalities (max cell share
    shrinks, the drifted probe's routed I/O shrinks, recall@20 holds
    the 60% floor) double as the WAP AUDIT — ``published`` is TRUE on
    the Spark side iff the third catalog transaction actually landed,
    and the oracle derives the same verdict from the audit conjunction
    it replays from scratch (both trainings relational, every share
    and hit count exact int64).  ``gen_published`` is the centroid
    generation the catalog head resolves — 1 exactly when the audit
    passed, while the drift-pinned reader still resolves gen 0
    (``gen_pinned``): old probes never route by centroids they didn't
    pin."""
    import math

    from ..sinks import catalog as C
    from . import ann

    cat, _audit_ok = _ivfr_lifecycle(spark, sf_dir)
    published = C.catalog_latest(cat) == 2
    full = C.read_table(spark, cat, "embeddings")
    n_all = full.count()
    q = [float(x) for x in full.filter(
        F.col("vec_id") == _PQR_QIDS[0]).first()["embedding"]]
    qmu = [math.floor((x + ann.PQ_INT_OFFSET) * 1_000_000.0)
           for x in q]
    bf = ann.exact_topk_int(full, q, _IVFR["k"]).select("vec_id")
    asg0 = (C.read_table(spark, cat, "ivf_index", catalog_version=1)
            .select("vec_id", "code"))
    asg1 = (C.read_table(spark, cat, "ivf_index")
            .select("vec_id", "code"))
    cent0 = C.read_table(spark, cat, "ivf_centroids",
                         catalog_version=1).collect()
    cent1 = C.read_table(spark, cat, "ivf_centroids").collect()
    gen_pinned = max(int(r["gen"]) for r in cent0)
    gen_published = max(int(r["gen"]) for r in cent1)
    cells0 = _ivfr_cells(cent0, qmu)
    cells1 = _ivfr_cells(cent1, qmu)
    s0 = _ivfr_side(full, asg0, cells0, n_all, q, bf, "0")
    s1 = _ivfr_side(full, asg1, cells1, n_all, q, bf, "1")
    return (s0.crossJoin(s1)
            .select(F.lit(int(gen_pinned)).cast("int")
                    .alias("gen_pinned"),
                    F.lit(int(gen_published)).cast("int")
                    .alias("gen_published"),
                    F.col("ms0").alias("max_share_before_ppm"),
                    F.col("ms1").alias("max_share_after_ppm"),
                    F.col("rs0").alias("routed_share_before_ppm"),
                    F.col("rs1").alias("routed_share_after_ppm"),
                    F.col("nh0").cast("long").alias("n_hits_before"),
                    F.col("nh1").cast("long").alias("n_hits_after"),
                    (F.col("ms1") < F.col("ms0")).alias("rebalance_ok"),
                    (F.col("nr1") < F.col("nr0"))
                    .alias("probe_io_shrinks"),
                    (F.col("nh1") * 10 >= F.lit(_IVFR["k"] * 6))
                    .alias("recall_floor_ok"),
                    F.lit(bool(published)).alias("published")))


# ---------------------------------------------------------------------------
# image near-dup admission in the incremental corpus lane (round-12
# verdict, Next round #2): round 12 proved the composition for text —
# persisted signature/band tables, O(delta) banded candidates, an
# order-independent drop rule, one catalog txn.  This section runs the
# SAME lane over a multimodal crawl's images: the persisted relations
# are the exact pixel-identity hash (format-independent md5 of the
# decoded luma plane), the 64-bit perceptual code, and its four 16-bit
# Hamming-pigeonhole bands; admission drops an image iff ANY earlier-id
# canonical image verifies within Hamming τ — dropped images stay in
# the code/band tables so they keep blocking later lookalikes.
# ---------------------------------------------------------------------------

_NDI_HAM = 6
_NDI_TABLES = ("image_hashes", "image_codes", "image_bands",
               "image_admitted")


def _ndi_bands(codes: DataFrame,
               id_col: str = "asset_id") -> DataFrame:
    """Four 16-bit bands of the 64-bit perceptual code — the identical
    pigeonhole banding `multimodal.image_near_dup_pairs` joins on
    (any pair within Hamming ≤ 3 shares a clean band; the τ=6 tail
    rides the same graceful-decay recall as the batch operator)."""
    bands = F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("bi"),
            F.shiftrightunsigned(
                F.col("w0") if i < 2 else F.col("w1"),
                16 * (i % 2)).bitwiseAND(F.lit(0xFFFF)).alias("bkey"))
        for i in range(4)
    ])
    return (codes.select(F.col(id_col).alias("id"),
                         F.explode(bands).alias("b"))
            .select("id", F.col("b.bi").alias("bi"),
                    F.col("b.bkey").alias("bkey")))


def _ndi_verify(cands: DataFrame, code_a: DataFrame,
                code_b: DataFrame) -> DataFrame:
    """Candidate (a, b) pairs -> the b ids whose exact 64-bit Hamming
    distance to a clears τ — int64 bit_count, both engines derive the
    identical distance."""
    a = code_a.select(F.col("asset_id").alias("a"),
                      F.col("w0").alias("a0"), F.col("w1").alias("a1"))
    b = code_b.select(F.col("asset_id").alias("b"),
                      F.col("w0").alias("b0"), F.col("w1").alias("b1"))
    ham = (F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
           + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1"))))
    return (cands.join(a, "a").join(b, "b")
            .filter(ham <= F.lit(_NDI_HAM))
            .select("b").distinct())


def _ndi_batch_drops(codes: DataFrame, bands: DataFrame,
                     pcodes: DataFrame,
                     pbands: DataFrame) -> DataFrame:
    """The batch asset_ids the image near-dup rule drops: verified
    pairs from (1) the batch's band keys against the PERSISTED band
    table with ``r.id < l.id`` — every earlier canonical image,
    O(delta) banded candidates — and (2) the within-batch band
    self-join.  The ``r.id < l.id`` predicate doubles as the
    crash-rerun guard exactly as in the text lane
    (`queries_round12._nd_batch_drops`): a rerun that finds its own
    rows already persisted sees only self- and same-batch pairs there,
    which the inequality reduces back to the within-batch rule."""
    bb, pb = bands.alias("l"), pbands.alias("r")
    cross = (bb.join(pb,
                     (F.col("l.bi") == F.col("r.bi"))
                     & (F.col("l.bkey") == F.col("r.bkey"))
                     & (F.col("r.id") < F.col("l.id")))
             .select(F.col("r.id").alias("a"),
                     F.col("l.id").alias("b"))
             .distinct())
    wl, wr = bands.alias("l"), bands.alias("r")
    within = (wl.join(wr,
                      (F.col("l.bi") == F.col("r.bi"))
                      & (F.col("l.bkey") == F.col("r.bkey"))
                      & (F.col("l.id") < F.col("r.id")))
              .select(F.col("l.id").alias("a"),
                      F.col("r.id").alias("b"))
              .distinct())
    return (_ndi_verify(cross, pcodes, codes)
            .unionByName(_ndi_verify(within, codes, codes))
            .distinct())


def _ndi_canon(assets: DataFrame) -> DataFrame:
    """In-batch exact dedup on the PIXEL identity: one decode per image
    (`multimodal.image_identity_codes`), canonical = min asset_id per
    pixhash group (identical pixels => identical code words, so min is
    just 'the code')."""
    from ..operators import multimodal as mm

    return (mm.image_identity_codes(assets)
            .groupBy("pixhash")
            .agg(F.min("asset_id").alias("asset_id"),
                 F.min("w0").alias("w0"), F.min("w1").alias("w1")))


def ndi_bootstrap(spark: SparkSession, dirs: tuple[str, ...],
                  cat_dir: str, assets: DataFrame,
                  txn_id: str = "ndi-r0") -> None:
    """Round 0 of the IMAGE near-dup lane: decode once, exact-dedup on
    pixel identity, within-batch banded admission, and seed all FOUR
    tables — pixel hashes + perceptual codes + Hamming bands + the
    admitted set — in ONE catalog transaction.  The code/band tables
    carry EVERY canonical image (near-dup-dropped included): dropped
    images still block later lookalikes, the same canonical-universe
    rule as the text lane."""
    from ..sinks import catalog as C
    from ..sinks import versioned as V

    hash_dir, code_dir, band_dir, adm_dir = dirs
    canon0 = _ndi_canon(assets).persist()
    canon0.count()                     # one decode, four consumers
    codes0 = canon0.select("asset_id", "w0", "w1")
    bands0 = _ndi_bands(codes0)
    drops0 = _ndi_batch_drops(codes0, bands0,
                              pcodes=codes0.limit(0),
                              pbands=bands0.limit(0))
    admitted0 = (codes0.join(drops0.withColumnRenamed("b", "asset_id"),
                             "asset_id", "left_anti")
                 .select("asset_id"))
    V.write_snapshot(canon0.select("pixhash", "asset_id"), hash_dir)
    V.write_snapshot(codes0, code_dir)
    V.write_snapshot(bands0, band_dir)
    V.write_snapshot(admitted0, adm_dir)
    C.commit_txn(cat_dir,
                 dict(zip(_NDI_TABLES, ((d, None) for d in dirs))),
                 txn_id=txn_id)
    canon0.unpersist()


def ndi_delta_round(spark: SparkSession, dirs: tuple[str, ...],
                    cat_dir: str, assets: DataFrame, txn_id: str,
                    round_seq: int | None = None) -> None:
    """ONE incremental image round: exact anti-join the persisted
    pixel-hash table, band the remainder's codes against the PERSISTED
    band table (O(delta) candidates — the corpus's images are never
    re-decoded, never rescanned: only their 50-byte code rows join),
    verify at Hamming τ, drop, and publish all four tables atomically.

    Write order admitted -> codes -> bands -> hashes keeps a
    crash-rerun derived from pre-round state: the pixel-hash table
    (whose extension changes the exact-survivor set) lands LAST, and
    the cross join's ``r.id < l.id`` guard makes the drop set immune
    to the code/band tables having landed.  ``round_seq`` gates each
    write through the streaming batch-id ledger exactly like the text
    lane."""
    from ..sinks import catalog as C
    from ..sinks import versioned as V

    hash_dir, code_dir, band_dir, adm_dir = dirs
    canon = _ndi_canon(assets)
    sv0 = (canon.join(V.read_version(spark, hash_dir)
                      .select("pixhash"),
                      "pixhash", "left_anti").persist())
    sv0.count()                        # one decode, four consumers
    codes = sv0.select("asset_id", "w0", "w1")
    bands = _ndi_bands(codes)
    drops = _ndi_batch_drops(
        codes, bands,
        pcodes=V.read_version(spark, code_dir),
        pbands=V.read_version(spark, band_dir))
    admitted = (codes.join(drops.withColumnRenamed("b", "asset_id"),
                           "asset_id", "left_anti")
                .select("asset_id"))
    ids = None if round_seq is None else {int(round_seq)}

    def _once(table_dir: str, write) -> None:
        if ids and int(round_seq) in V.committed_batch_ids(table_dir):
            return                     # crash-rerun: already landed
        write()

    def mutate_round():
        _once(adm_dir,
              lambda: V.write_snapshot(admitted, adm_dir,
                                       batch_ids=ids))
        _once(code_dir,
              lambda: V.write_snapshot(codes, code_dir, batch_ids=ids))
        _once(band_dir,
              lambda: V.write_snapshot(bands, band_dir, batch_ids=ids))
        _once(hash_dir,
              lambda: V.write_snapshot(
                  sv0.select("pixhash", "asset_id"), hash_dir,
                  batch_ids=ids))
        return None

    ops = {"image_admitted": (adm_dir, mutate_round)}
    ops.update({n: (d, None)
                for n, d in zip(_NDI_TABLES[:3], dirs[:3])})
    C.commit_txn(cat_dir, ops, txn_id=txn_id)
    sv0.unpersist()


def ndi_delta_stream_batch(batch_df: DataFrame, batch_id: int,
                           dirs: tuple[str, ...],
                           cat_dir: str) -> None:
    """STREAMING twin — a multimodal crawl stream drives the image
    lane exactly-once via foreachBatch (txn-id catalog no-op on batch
    replay, round_seq table ledger for mid-round crash resume), the
    `nd_delta_stream_batch` contract one modality over."""
    ndi_delta_round(batch_df.sparkSession, dirs, cat_dir, batch_df,
                    txn_id=f"stream-ndimage:{int(batch_id)}",
                    round_seq=int(batch_id))


_NDI: dict = {}


def _drop_ndi13(keys=None) -> None:
    import shutil

    for k in list(_NDI) if keys is None else list(keys):
        for d in _NDI.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


def _jpeg_pixels13(i: int) -> list[list[int]]:
    """The image-lane fixture universe: images 0-30 are the round-12
    JPEG planes (30 = the brightness-shifted near-dup of 3); image 31
    is the EXACT-duplicate plant — image 7's plane re-encoded under a
    new id, so its pixel-identity hash collides and the exact stage
    must block it before the banded check ever sees it."""
    from .queries_round12 import _jpeg_pixels

    return _jpeg_pixels(7) if i == 31 else _jpeg_pixels(i)


def _ndi_assets(spark: SparkSession, ids) -> DataFrame:
    from ..operators import multimodal as mm
    from .queries_round12 import _mk_gray_jpeg

    rows = [(i, "image",
             bytearray(_mk_gray_jpeg(_jpeg_pixels13(i))), "image/jpeg")
            for i in ids]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


@fixture_timed("ndi_lane_r13")
def _ndi_assembled(spark: SparkSession, sf_dir: str
                   ) -> tuple[tuple[str, ...], str, bool]:
    """Once per (session, sf_dir): the image near-dup lane — bootstrap
    over JPEGs 0-19, then two crawl deltas (20-25, 26-31), delta 2
    carrying both plants: 30 (near-dup of bootstrap image 3 at
    Hamming 0 — brightness-invariant aHash) and 31 (exact pixel dup of
    bootstrap image 7 under fresh bytes).  Returns (dirs, cat_dir,
    atomic_ok)."""
    import atexit
    import tempfile

    from ..sinks import catalog as C

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _NDI.get(key)
    if got is not None:
        return got
    _drop_ndi13([k for k in _NDI if k[0] != key[0]])
    if not _NDI:
        atexit.register(_drop_ndi13)
    dirs = tuple(tempfile.mkdtemp(prefix=f"spark_graft_ndi_{n}_")
                 for n in ("hash", "code", "band", "adm"))
    cat = tempfile.mkdtemp(prefix="spark_graft_ndi_cat_")
    ndi_bootstrap(spark, dirs, cat, _ndi_assets(spark, range(20)))
    for r, ids in enumerate((range(20, 26), range(26, 32)), start=1):
        ndi_delta_round(spark, dirs, cat, _ndi_assets(spark, ids),
                        txn_id=f"ndi-r{r}", round_seq=r)
    hist = C.catalog_history(cat)
    atomic_ok = (len(hist) == 3
                 and all(h["changed"] == sorted(_NDI_TABLES)
                         for h in hist)
                 and all(s["drift"] == 0
                         for s in C.catalog_status(cat)))
    got = (dirs, cat, bool(atomic_ok))
    _NDI[key] = got
    return got


# the from-scratch universe both engines agree on: the 32 generated
# planes, exact-dedup'd on pixel identity, aHash'd, banded, and
# near-dedup'd under the global "dropped iff any earlier-id canonical
# image verifies within Hamming tau" rule
_NDI_UNIVERSE_SQL = """
    pxq AS (SELECT i, y, x,
             CASE WHEN i = 30
                  THEN ((x//8)*(x//8)*4 + (y//8)*(y//8)*5
                        + (x//8)*(y//8)*1 + 3*37) % 200 + 5
                  WHEN i = 31
                  THEN ((x//8)*(x//8)*1 + (y//8)*(y//8)*4
                        + (x//8)*(y//8)*2 + 7*37) % 200
                  ELSE ((x//8)*(x//8)*((i%7)+1)
                        + (y//8)*(y//8)*((i%5)+2)
                        + (x//8)*(y//8)*((i%3)+1) + i*37) % 200 END AS p
           FROM (SELECT UNNEST(range(0, 32)) AS i) imgs
           CROSS JOIN range(0, 32) AS ty(y)
           CROSS JOIN range(0, 32) AS tx(x)),
    hstr AS (SELECT i, string_agg(CAST(p AS VARCHAR), ','
                                  ORDER BY y, x) AS ph
             FROM pxq GROUP BY i),
    canon AS (SELECT MIN(i) AS asset_id FROM hstr GROUP BY ph),
    blocks AS (SELECT i, y // 4 AS by, x // 4 AS bx,
                      CAST(SUM(p) AS BIGINT) AS s
               FROM pxq GROUP BY 1, 2, 3),
    tot AS (SELECT i, CAST(SUM(p) AS BIGINT) AS t FROM pxq GROUP BY 1),
    bits AS (SELECT b.i, by * 8 + bx AS pos,
                    CASE WHEN s * 1024 > t * 16 THEN 1 ELSE 0 END
                      AS bit
             FROM blocks b JOIN tot USING (i)),
    code AS (SELECT i,
               CAST(SUM(CASE WHEN pos < 32 AND bit = 1
                             THEN CAST(2 ** pos AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w0,
               CAST(SUM(CASE WHEN pos >= 32 AND bit = 1
                             THEN CAST(2 ** (pos - 32) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w1
             FROM bits GROUP BY i),
    ccode AS (SELECT c.asset_id, k.w0, k.w1
              FROM canon c JOIN code k ON k.i = c.asset_id),
    cbanded AS (SELECT asset_id, w0, w1, bi,
                       CASE bi WHEN 0 THEN w0 % 65536
                               WHEN 1 THEN w0 // 65536
                               WHEN 2 THEN w1 % 65536
                               ELSE w1 // 65536 END AS bkey
                FROM ccode CROSS JOIN range(0, 4) AS bb(bi)),
    icand AS (SELECT DISTINCT l.asset_id AS a, r.asset_id AS b,
                     l.w0 AS lw0, l.w1 AS lw1, r.w0 AS rw0,
                     r.w1 AS rw1
              FROM cbanded l JOIN cbanded r
                ON l.bi = r.bi AND l.bkey = r.bkey
               AND l.asset_id < r.asset_id),
    idrops AS (SELECT DISTINCT b FROM icand
               WHERE bit_count(xor(lw0, rw0))
                     + bit_count(xor(lw1, rw1)) <= 6),
    iadm AS (SELECT asset_id FROM ccode
             WHERE asset_id NOT IN (SELECT b FROM idrops))
"""


@register(
    "corpus_incremental_image_neardup",
    oracle=f"""
    WITH {_NDI_UNIVERSE_SQL},
    fl AS (SELECT (SELECT COUNT(*) FROM ccode) AS n_canonical,
                  (SELECT COUNT(*) FROM iadm) AS n_admitted,
                  (30 IN (SELECT b FROM idrops)
                   AND 3 IN (SELECT asset_id FROM iadm))
                    AS near_plant_blocked,
                  (31 NOT IN (SELECT asset_id FROM ccode)
                   AND 7 IN (SELECT asset_id FROM iadm))
                    AS exact_plant_blocked)
    SELECT c.asset_id, c.w0, c.w1,
           c.asset_id IN (SELECT asset_id FROM iadm) AS admitted,
           fl.n_canonical, fl.n_admitted, fl.near_plant_blocked,
           fl.exact_plant_blocked, TRUE AS atomic_ok
    FROM ccode c CROSS JOIN fl ORDER BY c.asset_id
    """,
    tags=["corpus", "dedup", "multimodal", "image", "phash", "jpeg",
          "versioned", "catalog", "llm", "incremental"],
)
def corpus_incremental_image_neardup(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """IMAGE near-dup admission in the incremental corpus lane — the
    round-12 composition one modality over (round-12 verdict, Next
    round #2): bootstrap + two crawl deltas of real baseline JPEGs,
    each round decoding ONCE into (pixel-identity hash, perceptual
    code), exact anti-join on the persisted hash table, banded Hamming
    candidates against the PERSISTED band table, verified drops at
    tau=6, all four tables in ONE catalog transaction.  The final
    state read back THROUGH the catalog must hash-match DuckDB
    assembling and near-dedup'ing the whole 32-image universe FROM
    SCRATCH — per-canonical code words (the pure JPEG decoder rides
    the hash), the admitted verdicts, the canonical/admitted counts,
    and both plant verdicts: image 30 (brightness-shifted copy of
    bootstrap image 3, Hamming 0) blocked at the BANDED stage two
    rounds after its original landed, image 31 (exact pixel dup of
    image 7 under fresh bytes) blocked at the EXACT stage and absent
    from the canonical universe."""
    from ..sinks import catalog as C

    _dirs, cat, atomic_ok = _ndi_assembled(spark, sf_dir)
    codes = C.read_table(spark, cat, "image_codes")
    adm = C.read_table(spark, cat, "image_admitted")
    cnt = (codes.agg(F.count(F.lit(1)).alias("n_canonical"))
           .crossJoin(adm.agg(F.count(F.lit(1)).alias("n_admitted"))))
    near = (codes.filter(F.col("asset_id") == 30)
            .join(adm.filter(F.col("asset_id") == 30), "asset_id",
                  "left_anti")
            .agg((F.count(F.lit(1)) == 1).alias("near_half"))
            .crossJoin(adm.filter(F.col("asset_id") == 3)
                       .agg((F.count(F.lit(1)) == 1).alias("n3")))
            .select((F.col("near_half") & F.col("n3"))
                    .alias("near_plant_blocked")))
    exact = (codes.filter(F.col("asset_id") == 31)
             .agg((F.count(F.lit(1)) == 0).alias("ex_half"))
             .crossJoin(adm.filter(F.col("asset_id") == 7)
                        .agg((F.count(F.lit(1)) == 1).alias("n7")))
             .select((F.col("ex_half") & F.col("n7"))
                     .alias("exact_plant_blocked")))
    return (codes
            .join(adm.withColumn("admitted", F.lit(True)),
                  "asset_id", "left")
            .select("asset_id", "w0", "w1",
                    F.coalesce("admitted", F.lit(False))
                    .alias("admitted"))
            .crossJoin(F.broadcast(cnt))
            .crossJoin(F.broadcast(near))
            .crossJoin(F.broadcast(exact))
            .withColumn("atomic_ok", F.lit(bool(atomic_ok)))
            .orderBy("asset_id"))


@register(
    "corpus_incremental_image_drops",
    oracle=f"""
    WITH {_NDI_UNIVERSE_SQL}
    SELECT b AS asset_id FROM idrops ORDER BY asset_id
    """,
    tags=["corpus", "dedup", "multimodal", "image", "phash",
          "versioned", "incremental"],
)
def corpus_incremental_image_drops(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The image admission AUDIT: the drop ledger is exactly
    (code table) minus (admitted table) — every canonical image has a
    code row and every admitted image an admitted row, so the set
    difference IS the banded-stage refusal list.  Must equal DuckDB's
    from-scratch global drop set — the order-independence of the
    Hamming drop rule made concrete across crawl rounds."""
    from ..sinks import catalog as C

    _dirs, cat, _ = _ndi_assembled(spark, sf_dir)
    return (C.read_table(spark, cat, "image_codes").select("asset_id")
            .join(C.read_table(spark, cat, "image_admitted"),
                  "asset_id", "left_anti")
            .orderBy("asset_id"))


# ---------------------------------------------------------------------------
# color (3-component YCbCr) baseline JPEG through the pure luma decoder
# (round-12 verdict, Next round #3): `multimodal._jpeg_gray_rows` now
# accepts 3-component SOF0 with chroma 1x1 and luma up to 2x2 —
# 4:4:4 / 4:2:2 / 4:2:0, the dominant web shapes — reconstructing the
# Y plane only (chroma blocks are entropy-decoded and discarded), so
# image dedup covers real color crawl JPEGs with PIL absent.
# ---------------------------------------------------------------------------

def _mk_color_jpeg(pixels: list[list[int]], cb: int = 128,
                   cr: int = 128,
                   sampling: tuple[int, int] = (2, 2)) -> bytes:
    """Minimal baseline-JPEG COLOR encoder (stdlib struct only): three
    components (YCbCr), luma sampled ``sampling`` (2,2 = 4:2:0 — the
    dominant web layout; 1,1 = 4:4:4), chroma 1×1, flat quant table
    q=8 shared by all components, the `_mk_gray_jpeg` Huffman tables
    selected by every component.  The Y plane is ``pixels``
    (block-constant => DC-only => the pure decoder round-trips it
    EXACTLY); Cb/Cr are constant planes — chroma blocks the decoder
    must parse correctly and then ignore."""
    import struct

    h, w = len(pixels), len(pixels[0])
    hy, vy = sampling
    mw, mh = 8 * hy, 8 * vy
    if h % mh or w % mw:
        raise ValueError("fixture encoder: dimensions must be "
                         "MCU-aligned")

    def canon(bits: list[int], vals: list[int]) -> dict:
        out, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (ln, code)
                k += 1
                code += 1
            code <<= 1
        return out

    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]                                  # EOB only
    dc, ac = canon(dc_bits, dc_vals), canon(ac_bits, ac_vals)
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
            + bytes([8] * 64))
    out += (b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
            + struct.pack(">HH", h, w)
            + bytes([3,
                     1, (hy << 4) | vy, 0,
                     2, 0x11, 0,
                     3, 0x11, 0]))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(dc_vals))
            + bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals))
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += (b"\xff\xda" + struct.pack(">H", 12)
            + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    payload = bytearray()
    state = [0, 0]                                    # bit buffer, count

    def emit(ln: int, code: int) -> None:
        state[0] = (state[0] << ln) | code
        state[1] += ln
        while state[1] >= 8:
            state[1] -= 8
            byte = (state[0] >> state[1]) & 0xFF
            payload.append(byte)
            if byte == 0xFF:
                payload.append(0x00)                  # byte stuffing
    preds = [0, 0, 0]

    def emit_block(ci: int, dcv: int) -> None:
        diff = dcv - preds[ci]
        preds[ci] = dcv
        t = abs(diff).bit_length()
        emit(*dc[t])
        if t:
            emit(t, (diff if diff > 0
                     else diff + (1 << t) - 1) & ((1 << t) - 1))
        emit(*ac[0x00])                               # EOB

    for my in range(h // mh):
        for mx in range(w // mw):
            for b in range(hy * vy):
                y0 = (my * vy + b // hy) * 8
                x0 = (mx * hy + b % hy) * 8
                emit_block(0, pixels[y0][x0] - 128)
            emit_block(1, cb - 128)
            emit_block(2, cr - 128)
    if state[1]:
        pad = 8 - state[1]
        emit(pad, (1 << pad) - 1)                     # 1-pad final byte
    out += payload + b"\xff\xd9"
    return bytes(out)


def _color_jpeg_assets(spark: SparkSession) -> DataFrame:
    """31 COLOR 4:2:0 JPEGs whose Y planes are the round-12 fixture
    planes (30 ≡ 3 shifted +5 — the planted pair) and whose chroma is
    a per-image constant pair — different for 30 vs 3, so the lane's
    luma-only contract is exercised: the plant must surface at Hamming
    0 despite disagreeing chroma."""
    from ..operators import multimodal as mm
    from .queries_round12 import _jpeg_pixels

    rows = [(i, "image",
             bytearray(_mk_color_jpeg(_jpeg_pixels(i),
                                      cb=(40 + i * 5) % 200 + 20,
                                      cr=(90 + i * 7) % 200 + 20)),
             "image/jpeg") for i in range(31)]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


from .queries_round12 import _JPEG_PX_SQL  # noqa: E402


@register(
    "dedup_image_phash_jpeg_color",
    oracle=f"""
    WITH {_JPEG_PX_SQL},
    bits AS (SELECT b.i, by * 8 + bx AS pos,
                    CASE WHEN s * 1024 > t * 16 THEN 1 ELSE 0 END AS bit
             FROM blocks b JOIN tot USING (i)),
    code AS (SELECT i,
               CAST(SUM(CASE WHEN pos < 32 AND bit = 1
                             THEN CAST(2 ** pos AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w0,
               CAST(SUM(CASE WHEN pos >= 32 AND bit = 1
                             THEN CAST(2 ** (pos - 32) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w1
             FROM bits GROUP BY i),
    banded AS (SELECT i, w0, w1, bi,
                      CASE bi WHEN 0 THEN w0 % 65536
                              WHEN 1 THEN w0 // 65536
                              WHEN 2 THEN w1 % 65536
                              ELSE w1 // 65536 END AS bkey
               FROM code CROSS JOIN range(0, 4) AS bb(bi)),
    cand AS (SELECT DISTINCT l.i AS a, r.i AS b, l.w0 AS lw0,
                    l.w1 AS lw1, r.w0 AS rw0, r.w1 AS rw1
             FROM banded l JOIN banded r
               ON l.bi = r.bi AND l.bkey = r.bkey AND l.i < r.i)
    SELECT a, b,
           CAST(bit_count(xor(lw0, rw0)) + bit_count(xor(lw1, rw1))
                AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(lw0, rw0)) + bit_count(xor(lw1, rw1)) <= 6
    ORDER BY a, b
    """,
    tags=["dedup", "multimodal", "image", "phash", "jpeg", "llm"],
)
def dedup_image_phash_jpeg_color(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Perceptual image dedup over COLOR (3-component YCbCr 4:2:0)
    baseline JPEGs, PIL-free — the round-12 grayscale lane's oracle
    verbatim, because the pure decoder now reconstructs exactly the Y
    plane from a color stream: stream-defined Huffman tables, four
    luma blocks + two entropy-decoded-then-discarded chroma blocks per
    MCU, per-component DC predictor chains.  Every image carries a
    DIFFERENT constant chroma pair (image 30's disagrees with 3's), so
    a decoder that mixed chroma into the plane, mis-ordered the MCU
    interleave, or lost bit sync across a chroma block would flip
    gradient bits somewhere in 31 images and break the hash.  The
    planted brightness-shifted copy (30 ≡ 3 + 5 in Y) must surface at
    Hamming 0."""
    from ..operators import multimodal as mm

    codes = mm.phash_codes(_color_jpeg_assets(spark), kind="ahash")
    return (mm.image_near_dup_pairs(codes, max_hamming=6,
                                    id_col="asset_id")
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("hamming").cast("int").alias("hamming"))
            .orderBy("a", "b"))


# ---------------------------------------------------------------------------
# near-dup admission recall contract (round-12 verdict, Next round #5):
# the text lane's tau (est-Jaccard >= 0.5) gets what the batch LSH
# family already had — planted true/borderline/false pairs with the
# admitted/blocked verdicts derived from scratch by both engines
# ---------------------------------------------------------------------------

from .queries_ext import _hex15_to_long, _perms_values_sql  # noqa: E402
from .queries_round12 import _ND, _ND_MIN_EQ2, _nd_verify  # noqa: E402

_NDR_OFFS = ((1_000_000_000, "true", "zqt"),
             (2_000_000_000, "borderline", "zqb"),
             (3_000_000_000, "false", "zqf"))

# tokens kept per class, as SQL over the base token array (Spark `div`
# / DuckDB `//` agree on positive ints): true keeps all but the last
# (J ~ 1), borderline half (J ~ tau — its verdicts are hashed, not
# asserted), false a fifth (J ~ 0.2)
_NDR_KEEP = {"zqt": ("{n} - 1", "len(tk) - 1"),
             "zqb": ("({n} + 1) div 2", "(len(tk) + 1) // 2"),
             "zqf": ("({n} + 4) div 5", "(len(tk) + 4) // 5")}


@register(
    "scale_neardup_admission_recall",
    oracle=rf"""
    WITH basep AS (SELECT doc_id, text FROM documents
                   ORDER BY n_chars DESC, doc_id LIMIT 8),
    bt AS (SELECT doc_id,
                  regexp_split_to_array(trim(text), '\s+') AS tk
           FROM basep),
    vr AS ({" UNION ALL ".join(
        f"SELECT b.doc_id + {off} AS doc_id, "
        f"array_to_string(list_append(list_slice(b.tk, 1, "
        f"{_NDR_KEEP[tag][1].replace('len(tk)', 'len(b.tk)')}), "
        f"'{tag}' || CAST(b.doc_id AS VARCHAR)), ' ') AS text "
        "FROM bt b" for off, _cls, tag in _NDR_OFFS)}),
    allr AS (SELECT doc_id, text FROM basep
             UNION ALL SELECT doc_id, text FROM vr),
    toks AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\s+') AS tk
             FROM allr),
    shg AS (SELECT doc_id, unnest(list_distinct(list_transform(
              range(1, greatest(len(tk) - 2, 1) + 1),
              i -> array_to_string(list_slice(tk, i, i + 2), ' '))))
              AS g9
            FROM toks),
    {_perms_values_sql(_ND["k"])},
    hb AS (SELECT doc_id, {_hex15_to_long("md5(g9)")} AS h9 FROM shg),
    hx AS (SELECT doc_id, j,
                  MIN((a * (h9 % 2147483647) + b) % 2147483647) AS hmin
           FROM hb CROSS JOIN perms GROUP BY doc_id, j),
    sig AS (SELECT doc_id, list(hmin ORDER BY j) AS sig
            FROM hx GROUP BY doc_id),
    banded AS (SELECT doc_id, bi,
                      array_to_string(list_transform(
                        list_slice(sig, bi * 4 + 1, bi * 4 + 4),
                        x -> CAST(x AS VARCHAR)), ',') AS bkey
               FROM sig CROSS JOIN range(0, {_ND["bands"]}) AS sb(bi)),
    cand AS (SELECT DISTINCT r.doc_id AS a, l.doc_id AS b
             FROM banded l JOIN banded r
               ON l.bi = r.bi AND l.bkey = r.bkey
             WHERE r.doc_id < 1000000000
               AND l.doc_id >= 1000000000),
    drops AS (SELECT DISTINCT c.b
              FROM cand c JOIN sig sa ON c.a = sa.doc_id
                          JOIN sig sb2 ON c.b = sb2.doc_id
              WHERE len(list_filter(range(1, {_ND["k"] + 1}),
                        i -> sa.sig[i] = sb2.sig[i])) * 2
                    >= {_ND_MIN_EQ2}),
    pv AS (SELECT v.doc_id,
                  CASE v.doc_id // 1000000000
                       WHEN 1 THEN 'true' WHEN 2 THEN 'borderline'
                       ELSE 'false' END AS cls,
                  v.doc_id IN (SELECT b FROM drops) AS blocked
           FROM vr v),
    pc AS (SELECT cls, COUNT(*) AS n_class,
                  CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_blocked,
                  CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END)
                       * 1000000 // COUNT(*) AS BIGINT) AS blocked_ppm
           FROM pv GROUP BY cls),
    fl AS (SELECT
            (SELECT n_blocked = n_class FROM pc
             WHERE cls = 'true') AS true_all_blocked,
            (SELECT n_blocked = 0 FROM pc
             WHERE cls = 'false') AS false_none_blocked)
    SELECT pv.cls, pv.doc_id, pv.blocked, pc.n_class, pc.n_blocked,
           pc.blocked_ppm, fl.true_all_blocked, fl.false_none_blocked
    FROM pv JOIN pc USING (cls) CROSS JOIN fl
    ORDER BY pv.cls, pv.doc_id
    """,
    tags=["scale", "dedup", "lsh", "eval", "recall", "corpus", "llm"],
)
def scale_neardup_admission_recall(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The near-dup ADMISSION tau contract, measured: the 8 longest
    corpus docs play the persisted side, and for each a TRUE near-dup
    (all tokens but one + a novel marker, est-Jaccard ~ 1), a
    BORDERLINE variant (half the tokens — its signature overlap
    straddles the tau=0.5 admission line: measured 8-22 of 32 equal
    components across the gate SFs), and a FALSE variant (a fifth of
    the tokens, est ~ 0.2) run through EXACTLY the lane's rule: banded
    candidates against the bases' band keys, signature-verified at
    n_eq·2 >= k.  Both engines derive every verdict from scratch
    (portable MinHash), so the per-variant blocked flags, the
    per-class exact-ppm block rates, and the two contract floors —
    every true dup blocked, no false positive — ride one value hash.
    The borderline class is deliberately NOT asserted, only hashed:
    it pins where the banding recall curve actually cuts, which is the
    number an operator tuning tau needs."""
    from ..operators import dedup

    (docs,) = _t(spark, sf_dir, "documents")
    # Every frame below is tiny (8 bases, 24 variants, 32 verdicts) but
    # the subtrees above them are not: unpersisted, the plan re-derived
    # the TakeOrdered-8 scan and the MinHash shingle hashing once per
    # consumer — 66 parquet scans / 84 aggregates in one physical plan
    # (plans/r13/..._before.txt; guide §2.4 "remove recomputed
    # subtrees").  persist() at the reuse points computes each once;
    # the harness releases the blocks after the action.
    base = (docs.orderBy(F.desc("n_chars"), "doc_id").limit(8)
            .select("doc_id", "text").persist())
    nt = "size(split(trim(text), '\\\\s+'))"

    def variant(off: int, tag: str) -> DataFrame:
        keep = _NDR_KEEP[tag][0].format(n=nt)
        return base.select(
            (F.col("doc_id") + F.lit(off)).alias("doc_id"),
            F.expr(
                "array_join(concat(slice(split(trim(text),"
                f" '\\\\s+'), 1, {keep}),"
                f" array(concat('{tag}', cast(doc_id as string)))),"
                " ' ')").alias("text"))

    variants = variant(*[(o, t) for o, _c, t in _NDR_OFFS][0])
    for off, _cls, tag in _NDR_OFFS[1:]:
        variants = variants.unionByName(variant(off, tag))
    sigs_b = dedup.minhash_docs(base, "text", "doc_id", _ND["k"],
                                _ND["shingle_n"], portable=True).persist()
    bands_b = dedup.lsh_banded(sigs_b, _ND["bands"], "doc_id",
                               portable=True)
    sigs_v = dedup.minhash_docs(variants, "text", "doc_id", _ND["k"],
                                _ND["shingle_n"], portable=True).persist()
    bands_v = dedup.lsh_banded(sigs_v, _ND["bands"], "doc_id",
                               portable=True)
    cross = (bands_v.alias("l").join(
        bands_b.alias("r"),
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.band_hash") == F.col("r.band_hash")))
        .select(F.col("r.id").alias("a"), F.col("l.id").alias("b"))
        .distinct())
    blocked = (_nd_verify(cross, sigs_b, sigs_v)
               .withColumnRenamed("b", "doc_id")
               .withColumn("__blk", F.lit(True)))
    pv = (variants.select("doc_id")
          .join(F.broadcast(blocked), "doc_id", "left")
          .select("doc_id",
                  F.when(F.col("doc_id") >= 3_000_000_000, "false")
                  .when(F.col("doc_id") >= 2_000_000_000, "borderline")
                  .otherwise("true").alias("cls"),
                  F.coalesce("__blk", F.lit(False)).alias("blocked"))
          .persist())
    pc = (pv.groupBy("cls")
          .agg(F.count(F.lit(1)).alias("n_class"),
               F.sum(F.when(F.col("blocked"), 1).otherwise(0))
               .cast("long").alias("n_blocked"))
          .withColumn("blocked_ppm",
                      F.expr("CAST(n_blocked * 1000000L DIV n_class"
                             " AS LONG)")))
    fl = (pc.agg(
        F.max(F.when(F.col("cls") == "true",
                     F.col("n_blocked") == F.col("n_class")))
        .alias("true_all_blocked"),
        F.max(F.when(F.col("cls") == "false",
                     F.col("n_blocked") == 0))
        .alias("false_none_blocked")))
    return (pv.join(F.broadcast(pc), "cls")
            .crossJoin(F.broadcast(fl))
            .select("cls", "doc_id", "blocked", "n_class", "n_blocked",
                    "blocked_ppm", "true_all_blocked",
                    "false_none_blocked")
            .orderBy("cls", "doc_id"))

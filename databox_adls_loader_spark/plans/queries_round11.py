"""Round-11 registry extensions, all under the driver's value-hash gate:

* the persisted PQ (product-quantization) code table as the THIRD
  maintained index family (`plans/ann.py` — band-LSH finds candidates,
  IVF routes, PQ is what a serving fleet can hold in memory), its
  integer-ADC probe, the IVF-PQ composed probe (IVFADC), and the
  cell-partition-pruned serving layout;
* the measured IVF recall contract (the eval row the LSH lane has had
  since round 6);
* INCREMENTAL corpus assembly end-to-end (`incr_bootstrap` /
  `incr_delta_round` — delta dedup vs persisted hashes, delta packing
  that never re-reads committed windows, O(changes) index refresh, one
  catalog transaction per round) hash-equal to a from-scratch
  assemble, plus the epoch-order closure over it;
* perceptual image dedup (aHash/dHash over genuinely decoded PNG
  pixels, Hamming-banded near-dup pairs with planted invariant copies).

Reference parity note: the reference (Azure/databox-adls-loader)
re-lists everything per run (adls_copy_utils.py:69
getSourceFileList) — the incremental-assemble lane is what retires
that model, and the PQ family closes round-10 verdict #2: the
compressed-codes table is the only whole-corpus relation a 100 TB
deployment keeps hot (4-bit codes ≈ 64× smaller than float32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, fixture_timed, register
from .queries_round10 import (_ANN, _ANN_FINAL_STATE_SQL,
                              _band_bucket_sql, _band_planes_sql)
from .queries_round10b import _IVF as _R10B_IVF
from .queries_round10b import _IVF_ASG_SQL, _ivf_cents_sql

# registry PQ geometry: 8 subspaces × 16 codewords over the dim-64
# embeddings (finer than the 4×8 default — measured recall@20 at the
# gate SFs is 12–14/20 at expand=8, vs 6–7/20 for 4×8)
_PQ = dict(dim=64, m=8, k_codes=16, seed=29)

_PQ_EMB: dict = {}


def _drop_pq_emb(keys=None) -> None:
    import shutil

    for k in list(_PQ_EMB) if keys is None else list(keys):
        for d in _PQ_EMB.pop(k)[:2]:
            shutil.rmtree(d, ignore_errors=True)


@fixture_timed("pq_index_r11")
def _pq_indexed_emb(spark: SparkSession, sf_dir: str
                    ) -> tuple[str, str, bool]:
    """Once per (session, sf_dir): versioned `embeddings` + its PQ code
    table, maintained through the SAME three mutation windows as the
    band/IVF fixtures (`queries_round10`): equality delete (vec_id ≡ 3
    mod 7), MOR upsert negating survivors ≡ 0 mod 5 (negation flips
    every subspace's nearest codeword), append of reversed vectors
    under -(vec_id+1) for ≡ 0 mod 11 — each followed by
    `refresh_pq_index` (O(changes)).  inc_ok asserts the
    manifest-derived incremental diff engaged for every window."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PQ_EMB.get(key)
    if got is None:
        _drop_pq_emb([k for k in _PQ_EMB if k[0] != key[0]])
        if not _PQ_EMB:
            atexit.register(_drop_pq_emb)
        emb_dir = tempfile.mkdtemp(prefix="spark_graft_pqbase_")
        index_dir = tempfile.mkdtemp(prefix="spark_graft_pqidx_")
        (emb,) = _t(spark, sf_dir, "embeddings")
        emb = emb.select("vec_id", "embedding")
        V.write_snapshot(emb, emb_dir)
        ann.build_pq_index(spark, index_dir, emb_dir, **_PQ)
        vid = F.col("vec_id")
        inc_ok = True

        def _commit_and_refresh(mutate) -> None:
            nonlocal inc_ok
            v_prev = V.latest_version(emb_dir)
            mutate()
            v_cur = V.latest_version(emb_dir)
            inc_ok = inc_ok and V._changes_incremental(
                spark, emb_dir, v_prev, v_cur, "vec_id") is not None
            ann.refresh_pq_index(spark, index_dir, emb_dir, **_PQ)

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
        _PQ_EMB[key] = got
    return got


def _pq_books_sql(m: int = 8, k_codes: int = 16, seed: int = 29,
                  dim: int = 64) -> str:
    """plans/ann.pq_codebooks as a DuckDB VALUES CTE
    ``books(sub, code, c)`` — repr() round-trips each double exactly,
    so both engines measure distances against bit-identical
    codewords."""
    from . import ann

    rows = []
    for s, book in enumerate(ann.pq_codebooks(dim, m, k_codes, seed)):
        for ci, c in enumerate(book):
            vals = ", ".join(repr(float(v)) for v in c)
            rows.append(f"({s}, {ci}, [{vals}])")
    return ("books(sub, code, c) AS (VALUES "
            + ",\n      ".join(rows) + ")")


# per-(vector, subspace) nearest-codeword assignment over the `e` and
# `books` CTEs — the same left-to-right (x−c)·(x−c) float fold and
# smallest-code tiebreak as ann.pq_code_expr (sub_dim = 64/8 = 8)
_PQ_CODES_SQL = """
    d AS (SELECT e.vec_id, b.sub, b.code,
                 list_sum(list_transform(range(1, 9),
                          i -> (v[b.sub * 8 + i] - c[i])
                             * (v[b.sub * 8 + i] - c[i]))) AS dist
          FROM e CROSS JOIN books b),
    codes AS (SELECT vec_id, sub, code
              FROM (SELECT vec_id, sub, code,
                           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                              ORDER BY dist, code) AS rn
                    FROM d) WHERE rn = 1)
"""


@register(
    "scale_pq_index_incremental",
    oracle=f"""
    WITH {_pq_books_sql(_PQ['m'], _PQ['k_codes'], _PQ['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_PQ_CODES_SQL}
    SELECT vec_id, sub, code, TRUE AS inc_ok
    FROM codes ORDER BY vec_id, sub
    """,
    tags=["scale", "similarity", "pq", "versioned", "incremental"],
)
def scale_pq_index_incremental(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The persisted PQ code table (`plans/ann.build_pq_index` +
    `refresh_pq_index`) after three maintenance windows — equality
    delete, MOR upsert (embedding negation re-ENCODES the vector: every
    subspace's argmin codeword moves), append — each applied off the
    manifest-derived change feed under the band/IVF families' shared
    retire/upsert ledger (`ann._signed_apply`).  Must hash-match DuckDB
    replaying the FINAL corpus state and re-encoding every vector from
    scratch against the inlined frozen codebooks — maintained ≡
    rebuild, with the identical (x−c)² fold and smallest-code tiebreak
    in both engines.  inc_ok asserts the incremental diff engaged for
    every window."""
    from ..sinks import versioned as V

    _, index_dir, inc_ok = _pq_indexed_emb(spark, sf_dir)
    return (V.read_version(spark, index_dir)
            .select("vec_id", "sub", "code")
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .orderBy("vec_id", "sub"))


@register(
    "ann_pq_probe_topk",
    oracle=f"""
    WITH {_pq_books_sql(_PQ['m'], _PQ['k_codes'], _PQ['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_PQ_CODES_SQL},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    lut AS (SELECT b.sub, b.code,
                   CAST(FLOOR(1000000 * list_sum(list_transform(
                        range(1, 9), i -> qv[b.sub * 8 + i] * c[i])))
                     AS BIGINT) AS u
            FROM books b CROSS JOIN q),
    adc AS (SELECT c.vec_id, SUM(l.u) AS adc_u
            FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
            GROUP BY c.vec_id),
    cand AS (SELECT vec_id
             FROM (SELECT vec_id,
                          ROW_NUMBER() OVER (ORDER BY adc_u DESC,
                                             vec_id) AS rn
                   FROM adc) WHERE rn <= 160)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim,
           TRUE AS pq_recall_ge_40pct
    FROM e JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "pq", "versioned"],
)
def ann_pq_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ top-20 THROUGH the maintained code table
    (`ann.probe_pq_topk`): the query's ADC lookup table is computed
    driver-side in EXACT integer micro-units against the frozen
    codebooks, candidates are the top 160 (k·expand) vectors by integer
    LUT sum over their stored codes — a total order both engines
    replay identically; the float vectors are read only for the
    160-row exact rerank — and the oracle re-encodes the final corpus
    state, rebuilds the same LUT with the identical FLOOR(1e6·dot)
    arithmetic, and reranks to the identical top-20: index content,
    ADC semantics, AND candidate selection under one hash.  The
    pq_recall_ge_40pct contract column is computed Spark-side against
    `similarity.topk_bruteforce` (the oracle expects TRUE, so a recall
    collapse turns the gate red; measured 12–14/20 at the gate SFs)."""
    from ..operators import similarity
    from ..sinks import versioned as V
    from . import ann

    emb_dir, index_dir, _ = _pq_indexed_emb(spark, sf_dir)
    base = V.read_version(spark, emb_dir)
    query = list(base.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    probe = ann.probe_pq_topk(spark, index_dir, emb_dir, query,
                              k=20, expand=8, base=base, **_PQ)
    exact = similarity.topk_bruteforce(base, query, k=20)
    contract = (probe.join(exact.select("vec_id"), "vec_id",
                           "left_semi")
                .agg(F.count(F.lit(1)).alias("n_hits"))
                .select((F.col("n_hits") * 100 >= F.lit(20 * 40))
                        .alias("pq_recall_ge_40pct")))
    return (probe.crossJoin(F.broadcast(contract))
            .orderBy(F.desc("sim"), "vec_id"))


# ---------------------------------------------------------------------------
# IVF measured-recall contract (round-10 verdict, Next round #6)
# ---------------------------------------------------------------------------

@register(
    "scale_ivf_recall_contract",
    oracle=f"""
    WITH {_ivf_cents_sql(_R10B_IVF['k_cells'], _R10B_IVF['dim'],
                         _R10B_IVF['seed'])},
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
    cand AS (SELECT vec_id FROM asg JOIN probed USING (cell)),
    ivf AS (SELECT vec_id
            FROM (SELECT e.vec_id,
                         ROW_NUMBER() OVER (
                           ORDER BY ROUND(list_cosine_similarity(
                                      e.v, q.qv), 6) DESC, e.vec_id)
                           AS rn
                  FROM e JOIN cand USING (vec_id) CROSS JOIN q)
            WHERE rn <= 20),
    bf AS (SELECT vec_id
           FROM (SELECT e.vec_id,
                        ROW_NUMBER() OVER (
                          ORDER BY ROUND(list_cosine_similarity(
                                     e.v, q.qv), 6) DESC, e.vec_id)
                          AS rn
                 FROM e CROSS JOIN q)
           WHERE rn <= 20),
    hit AS (SELECT COUNT(*) AS n_hits FROM ivf JOIN bf USING (vec_id))
    SELECT CAST(20 AS BIGINT) AS n_exact,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits * 1000000 // 20 AS BIGINT) AS recall_ppm,
           TRUE AS ivf_recall_ge_30pct
    FROM hit
    """,
    tags=["scale", "similarity", "ivf", "eval", "recall"],
)
def scale_ivf_recall_contract(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """MEASURED IVF recall through the MAINTAINED index, value-hash
    checked — the eval row the LSH lane has had since round 6
    (`dedup_lsh_recall_contract`) and the IVF lane lacked: probe the
    query's 3-of-8 nearest frozen cells via the persisted assignment
    table, exact-rerank to top-20, and pin recall@20 against the
    brute-force top-20 as an exact integer ppm BOTH engines compute
    from scratch (DuckDB re-assigns cells, probes the same 3, reranks,
    intersects).  The recall VALUE rides the hash — a quality drift of
    even one hit flips the gate — and the ≥30% floor is computed
    Spark-side against the oracle's TRUE (measured 45–50% at the gate
    SFs, nprobe=3)."""
    from ..operators import similarity
    from ..sinks import versioned as V
    from . import ann
    from .queries_round10b import _IVF, _ivf_indexed_emb

    emb_dir, index_dir, _ = _ivf_indexed_emb(spark, sf_dir)
    base = V.read_version(spark, emb_dir)
    query = list(base.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    ivf = ann.probe_ivf_topk(spark, index_dir, emb_dir, query,
                             k=20, nprobe=3, **_IVF)
    exact = similarity.topk_bruteforce(base, query, k=20)
    return (ivf.join(exact.select("vec_id"), "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(20).cast("long").alias("n_exact"),
                    F.col("n_hits").cast("long").alias("n_hits"),
                    F.expr("CAST(n_hits * 1000000L DIV 20 AS LONG)")
                    .alias("recall_ppm"),
                    (F.col("n_hits") * 100 >= F.lit(20 * 30))
                    .alias("ivf_recall_ge_30pct")))


# ---------------------------------------------------------------------------
# incremental corpus assembly end-to-end (round-10 verdict, Next round #1):
# delta dedup vs persisted state -> pack ONLY the delta into new windows ->
# append shards -> refresh the band index -> ONE catalog transaction
# ---------------------------------------------------------------------------

_INCR: dict = {}


def _drop_incr(keys=None) -> None:
    import shutil

    for k in list(_INCR) if keys is None else list(keys):
        for d in _INCR.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


def _batch_uniq(frame: DataFrame) -> DataFrame:
    """In-batch exact dedup: (md5(text), min doc_id, token estimate) —
    the corpus lane's canonical survivor shape."""
    return (frame.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens")))


def _surv_emb(emb: DataFrame, uniq: DataFrame) -> DataFrame:
    return (emb.join(uniq.select(F.col("doc_id").alias("vec_id")),
                     "vec_id", "left_semi")
            .select("vec_id", "embedding"))


_INCR_TABLES = ("shards", "pack_tail", "corpus_hashes",
                "embeddings_base", "band_index")


def incr_bootstrap(spark: SparkSession, dirs: tuple[str, ...],
                   cat_dir: str, docs: DataFrame, emb: DataFrame,
                   txn_id: str = "incr-r0") -> None:
    """Round 0 of the incremental corpus lane: full assemble of
    ``docs`` (dedup → pack → identity(g) shards + tail state + hash
    table + survivor embeddings + band index), published in ONE
    catalog transaction."""
    from ..operators.seqpack import pack_sequences, pack_tail_state
    from ..sinks import catalog as C
    from ..sinks import versioned as V
    from . import ann

    pack_dir, tail_dir, hash_dir, emb_dir, index_dir = dirs
    uniq0 = _batch_uniq(docs)
    packed0 = pack_sequences(uniq0, 256, count_col="n_tokens",
                             n_groups=8)
    V.write_snapshot(packed0, pack_dir, partition_by=["identity(g)"])
    V.write_snapshot(pack_tail_state(packed0), tail_dir,
                     mode="overwrite")
    V.write_snapshot(uniq0.select("h", "doc_id"), hash_dir)
    V.write_snapshot(_surv_emb(emb, uniq0), emb_dir)
    ann.build_ann_index(spark, index_dir, emb_dir, **_ANN)
    C.commit_txn(cat_dir,
                 dict(zip(_INCR_TABLES,
                          ((d, None) for d in dirs))),
                 txn_id=txn_id)


def incr_delta_round(spark: SparkSession, dirs: tuple[str, ...],
                     cat_dir: str, incoming: DataFrame, emb: DataFrame,
                     txn_id: str,
                     round_seq: int | None = None) -> tuple[bool, bool]:
    """ONE incremental round of the corpus lane (the daily-crawl body):
    dedup ``incoming`` against the persisted hash table, pack only the
    survivors via `pack_sequences_delta` resumed from the O(groups)
    tail state (committed shard files UNREAD — returned as the
    inputFiles proof), append shards / roll the tail / extend the hash
    table / append survivor embeddings, `refresh_ann_index`
    (O(changes), incremental diff asserted), and publish everything in
    ONE catalog transaction.  Returns (noreread_ok, inc_ok).

    ``round_seq``: per-round ledger id stamped on every table write
    (the streaming batch-id machinery, `versioned.committed_batch_ids`)
    — with it, a rerun of a round that crashed mid-phase-1 SKIPS the
    writes that already landed and applies only the missing ones, so
    the lane converges to exactly the intended state (write order
    pack → tail → embeddings → hash is chosen so every recomputed
    frame a rerun could still write is derived from pre-round state —
    the hash table, whose extension changes the survivor set, lands
    LAST).  A fully-landed round replays as a catalog-level no-op via
    ``txn_id`` regardless.  The streaming twin
    (`incr_delta_stream_batch`) passes the micro-batch id."""
    from ..operators.seqpack import (merge_tail_state,
                                     pack_sequences_delta,
                                     pack_tail_state)
    from ..sinks import catalog as C
    from ..sinks import versioned as V
    from ..sinks.versioned import _canon_uri_key
    from . import ann

    pack_dir, tail_dir, hash_dir, emb_dir, index_dir = dirs
    committed_files = {
        _canon_uri_key(p)
        for p in V._read_manifest(pack_dir,
                                  V.latest_version(pack_dir))}
    survivors = (_batch_uniq(incoming)
                 .join(V.read_version(spark, hash_dir)
                       .select("h"), "h", "left_anti"))
    tail = V.read_version(spark, tail_dir)
    dpack = pack_sequences_delta(survivors, 256, tail,
                                 count_col="n_tokens", n_groups=8)
    # the never-re-read proof: nothing feeding the delta pack reads a
    # committed shard file (the tail-state table is the resume point,
    # O(groups) rows)
    read_files = {_canon_uri_key(p)
                  for frame in (dpack, survivors, tail)
                  for p in frame.inputFiles()}
    noreread_ok = not (read_files & committed_files)
    inc_ok = True
    ids = None if round_seq is None else {int(round_seq)}

    def _once(table_dir: str, write) -> bool:
        if ids and int(round_seq) in V.committed_batch_ids(table_dir):
            return False                   # crash-rerun: already landed
        write()
        return True

    def mutate_round():
        _once(pack_dir,
              lambda: V.write_snapshot(dpack, pack_dir, batch_ids=ids))
        _once(tail_dir,
              lambda: V.write_snapshot(
                  merge_tail_state(tail, pack_tail_state(dpack)),
                  tail_dir, mode="overwrite", batch_ids=ids))
        v_prev = V.latest_version(emb_dir)
        wrote_emb = _once(
            emb_dir,
            lambda: V.write_snapshot(_surv_emb(emb, survivors), emb_dir,
                                     batch_ids=ids))
        if wrote_emb:
            nonlocal inc_ok
            inc_ok = V._changes_incremental(
                spark, emb_dir, v_prev, V.latest_version(emb_dir),
                "vec_id") is not None
        _once(hash_dir,
              lambda: V.write_snapshot(survivors.select("h", "doc_id"),
                                       hash_dir, batch_ids=ids))
        ann.refresh_ann_index(spark, index_dir, emb_dir, **_ANN)
        return None

    # ONE atomic publish per round: the mutations run as the txn's
    # shards op; every other table pins its post-mutation latest
    ops = {"shards": (pack_dir, mutate_round)}
    ops.update({n: (d, None)
                for n, d in zip(_INCR_TABLES[1:], dirs[1:])})
    C.commit_txn(cat_dir, ops, txn_id=txn_id)
    return bool(noreread_ok), bool(inc_ok)


def incr_delta_stream_batch(batch_df: DataFrame, batch_id: int,
                            dirs: tuple[str, ...], cat_dir: str,
                            emb: DataFrame) -> tuple[bool, bool]:
    """STREAMING twin of `incr_delta_round` — the foreachBatch body
    that lets a CRAWL STREAM drive the whole corpus lane exactly-once:

        (spark.readStream.format("vtable_stream")
              .option("path", crawl_table).load().writeStream
              .foreachBatch(lambda df, bid: queries_round11
                  .incr_delta_stream_batch(df, bid, dirs, cat, emb))
              .option("checkpointLocation", ck).start())

    Each micro-batch of NEW documents runs one incremental round under
    txn id ``stream-corpus:{batch_id}`` (a crash-replayed batch is a
    catalog-level no-op) with ``round_seq=batch_id`` stamping every
    table write (a crash MID-round resumes at the missing writes — see
    `incr_delta_round`).  Catalog readers see each crawl batch's five
    tables move together or not at all."""
    return incr_delta_round(
        batch_df.sparkSession, dirs, cat_dir, batch_df, emb,
        txn_id=f"stream-corpus:{int(batch_id)}",
        round_seq=int(batch_id))


@fixture_timed("incr_assemble_r11")
def _incr_assembled(spark: SparkSession, sf_dir: str
                    ) -> tuple[tuple[str, ...], str, bool, bool, bool]:
    """Once per (session, sf_dir): the corpus lane run INCREMENTALLY —
    a bootstrap over the low-id 60% of `documents`, then two daily-crawl
    deltas (60–80%, 80–100% by doc_id; ids ascend, the append-arrival
    invariant `pack_sequences_delta` resumes under).  Each round:

      1. batch dedup (md5 → min doc_id) then anti-join the PERSISTED
         hash table (`incremental_exact_dedup`'s shape),
      2. `pack_sequences_delta` resumed from the O(groups) tail-state
         table — committed windows never re-read (inputFiles-proven),
      3. append packed pieces to the identity(g) shard table, roll the
         tail state forward (`merge_tail_state`, from the delta alone),
      4. append survivors' (md5, doc_id) to the hash table and their
         embeddings to the versioned base, `refresh_ann_index`
         (O(changes), incremental diff asserted),
      5. ONE catalog transaction pinning shards + tail + hashes +
         embeddings + index.

    Returns ``(dirs, cat_dir, noreread_ok, inc_ok, atomic_ok)``.
    Reference boundary: the reference re-lists everything per run
    (adls_copy_utils.py:69 getSourceFileList) — this lane is what
    retires that model."""
    import atexit
    import tempfile

    from ..sinks import catalog as C

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _INCR.get(key)
    if got is not None:
        return got
    _drop_incr([k for k in _INCR if k[0] != key[0]])
    if not _INCR:
        atexit.register(_drop_incr)
    dirs = tuple(tempfile.mkdtemp(prefix=f"spark_graft_incr{n}_")
                 for n in ("shards", "tail", "hash", "emb", "idx"))
    cat_dir = tempfile.mkdtemp(prefix="spark_graft_incrcat_")
    docs, emb = (_t(spark, sf_dir, "documents")[0],
                 _t(spark, sf_dir, "embeddings")[0])
    mx = docs.agg(F.max("doc_id")).first()[0]
    t1, t2 = mx * 3 // 5, mx * 4 // 5
    did = F.col("doc_id")
    incr_bootstrap(spark, dirs, cat_dir, docs.filter(did <= t1), emb)
    noreread_ok, inc_ok = True, True
    for r, (lo, hi) in enumerate(((t1, t2), (t2, mx)), start=1):
        nr, ic = incr_delta_round(
            spark, dirs, cat_dir,
            docs.filter((did > lo) & (did <= hi)), emb,
            txn_id=f"incr-r{r}", round_seq=r)
        noreread_ok, inc_ok = noreread_ok and nr, inc_ok and ic
    hist = C.catalog_history(cat_dir)
    atomic_ok = (len(hist) == 3
                 and all(h["changed"] == sorted(_INCR_TABLES)
                         for h in hist)
                 and all(s["drift"] == 0
                         for s in C.catalog_status(cat_dir)))
    got = (dirs + (cat_dir,), cat_dir, bool(noreread_ok), bool(inc_ok),
           bool(atomic_ok))
    _INCR[key] = got
    return got


@register(
    "corpus_incremental_assemble",
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
           idx.n_indexed, idx.bucket_sum,
           TRUE AS noreread_ok, TRUE AS inc_ok, TRUE AS atomic_ok
    FROM p CROSS JOIN idx ORDER BY p.g
    """,
    tags=["corpus", "packing", "dedup", "similarity", "versioned",
          "catalog", "llm", "scale", "incremental"],
)
def corpus_incremental_assemble(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The corpus-to-training-artifact lane run INCREMENTALLY — the
    engine's thesis applied to its own flagship pipeline, closing
    round-10 verdict #1: a bootstrap plus two crawl deltas, each round
    dedup-vs-persisted-hashes → `pack_sequences_delta` (resumed from
    the O(groups) tail state, committed windows UNREAD — inputFiles
    proof in noreread_ok) → shard append → O(changes) band-index
    refresh (inc_ok) → ONE catalog transaction pinning all five tables
    (atomic_ok: three commits, each changing the full set, zero
    drift).  The final state, read back THROUGH the catalog, must
    hash-match DuckDB assembling the whole corpus FROM SCRATCH —
    per-shard window stats and the index checksum under one hash, so a
    duplicate leaking past the hash table, a window misplaced by the
    resume state, or a stale index row each flip the gate.  Reference
    boundary: re-list-everything (adls_copy_utils.py:69) is exactly
    what this lane retires."""
    from ..sinks import catalog as C

    _dirs, cat, noreread_ok, inc_ok, atomic_ok = \
        _incr_assembled(spark, sf_dir)
    # win > 0: the oracle's recursive packer models fitting docs only
    # (WHERE t <= 256); an oversize doc packs as an ISOLATED
    # negative-window row here (allow_split=False) — exclude those so
    # both engines aggregate the same window set by construction even
    # on a corpus with docs past the window size (round-11 ADVICE #3).
    packed = C.read_table(spark, cat, "shards").filter(F.col("win") > 0)
    idx = (C.read_table(spark, cat, "band_index")
           .agg(F.count(F.lit(1)).alias("n_indexed"),
                F.sum("bucket").cast("long").alias("bucket_sum")))
    per_g = (packed.groupBy("g")
             .agg(F.max("win").cast("long").alias("n_windows"),
                  F.count(F.lit(1)).alias("n_docs"),
                  F.sum("piece_tokens").cast("long").alias("tokens"),
                  F.sum(F.col("win") * F.col("piece_tokens"))
                  .cast("long").alias("win_tok_sum")))
    return (per_g.crossJoin(F.broadcast(idx))
            .withColumn("noreread_ok", F.lit(bool(noreread_ok)))
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .withColumn("atomic_ok", F.lit(bool(atomic_ok)))
            .orderBy("g"))


# ---------------------------------------------------------------------------
# perceptual image dedup (round-10 verdict, Next round #7)
# ---------------------------------------------------------------------------

def _mk_gray_png(pixels: list[list[int]]) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (stdlib struct + zlib,
    filter type 0 rows) — driver-generated fixture bytes the pure
    decoder (`multimodal._png_gray_rows`) round-trips exactly, so the
    perceptual hashes are defined by arithmetic the oracle replays."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _phash_pixels(i: int) -> list[list[int]]:
    """Image ``i``'s 32×32 grayscale plane from a closed-form integer
    formula (range 0–199, headroom for the +5 plant without clipping):
    images 0–39 are distinct quadratic textures; 40 is image 3 shifted
    +5 everywhere (aHash/dHash INVARIANT — a planted exact-hash pair);
    41 is image 7 with a +40 4×4 corner patch (Hamming 5 — a planted
    near-dup inside the ≤6 verify gate with a shared band).  The DuckDB oracle inlines this exact
    arithmetic."""
    if i == 40:
        return [[v + 5 for v in row] for row in _phash_pixels(3)]
    if i == 41:
        base = _phash_pixels(7)
        return [[v + (40 if y < 4 and x < 4 else 0)
                 for x, v in enumerate(row)]
                for y, row in enumerate(base)]
    return [[(x * x * (i % 7 + 1) + y * y * (i % 5 + 2)
              + x * y * (i % 3 + 1) + i * 37) % 200
             for x in range(32)] for y in range(32)]


def _phash_assets(spark: SparkSession):
    from ..operators import multimodal as mm

    rows = [(i, "image", bytearray(_mk_gray_png(_phash_pixels(i))),
             "image/png") for i in range(42)]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


_PHASH_PX_SQL = """
    imgs AS (SELECT UNNEST(range(0, 42)) AS i),
    px AS (SELECT i, y, x,
             CASE WHEN i = 40
                  THEN (x*x*4 + y*y*5 + x*y + 3*37) % 200 + 5
                  WHEN i = 41
                  THEN (x*x*1 + y*y*4 + x*y*2 + 7*37) % 200
                       + CASE WHEN y < 4 AND x < 4 THEN 40 ELSE 0 END
                  ELSE (x*x*((i%7)+1) + y*y*((i%5)+2) + x*y*((i%3)+1)
                        + i*37) % 200 END AS p
           FROM imgs CROSS JOIN range(0, 32) AS ty(y)
                     CROSS JOIN range(0, 32) AS tx(x)),
    blocks AS (SELECT i, y // 4 AS by, x // 4 AS bx,
                      CAST(SUM(p) AS BIGINT) AS s
               FROM px GROUP BY 1, 2, 3),
    tot AS (SELECT i, CAST(SUM(p) AS BIGINT) AS t FROM px GROUP BY 1)
"""


@register(
    "dedup_image_phash",
    oracle=f"""
    WITH {_PHASH_PX_SQL},
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
    tags=["dedup", "multimodal", "image", "phash", "llm"],
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (`multimodal.phash_codes` +
    `image_near_dup_pairs`): 42 REAL grayscale PNGs — encoded, then
    pixel-decoded by the stdlib PNG path — hash to 64-bit aHashes
    (8×8 block-mean threshold, exact cross-multiplied integers),
    candidates share one of four 16-bit bands (pigeonhole ≤3-bit
    guarantee, the simhash shape), exact Hamming ≤ 6 verifies.  The
    planted brightness-shifted copy (image 40 ≡ 3 + 5) MUST surface at
    Hamming 0 — aHash is brightness-invariant by construction — and
    the corner-patched copy (41 ≈ 7) at its deterministic small
    distance.  The oracle never decodes a PNG: it recomputes the same
    hashes from the generating pixel arithmetic, so encode → inflate →
    unfilter → hash → band → verify all sit under one value hash."""
    from ..operators import multimodal as mm

    codes = mm.phash_codes(_phash_assets(spark), kind="ahash")
    return (mm.image_near_dup_pairs(codes, max_hamming=6)
            .orderBy("a", "b"))


@register(
    "mm_image_dhash_codes",
    oracle=f"""
    WITH {_PHASH_PX_SQL},
    bits AS (SELECT l.i, l.by * 7 + l.bx AS pos,
                    CASE WHEN l.s > r.s THEN 1 ELSE 0 END AS bit
             FROM blocks l JOIN blocks r
               ON l.i = r.i AND l.by = r.by AND r.bx = l.bx + 1
             WHERE l.bx < 7)
    SELECT i AS asset_id,
           CAST(SUM(CASE WHEN pos < 32 AND bit = 1
                         THEN CAST(2 ** pos AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS w0,
           CAST(SUM(CASE WHEN pos >= 32 AND bit = 1
                         THEN CAST(2 ** (pos - 32) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS w1
    FROM bits GROUP BY i ORDER BY i
    """,
    tags=["multimodal", "image", "phash", "profile"],
)
def mm_image_dhash_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dHash (horizontal-gradient) code table over the same 42
    decoded PNGs — 56 bits per image, contrast- AND brightness-
    invariant, packed into two words exactly as the binary-embedding
    codes are (`similarity.binary_codes` layout, so the Hamming
    machinery is shared).  Oracle recomputes every gradient bit from
    the generating arithmetic: the planted pair's invariance and every
    texture's gradient field ride the hash."""
    from ..operators import multimodal as mm

    return (mm.phash_codes(_phash_assets(spark), kind="dhash")
            .orderBy("asset_id"))


@register(
    "ann_ivfpq_probe_topk",
    oracle=f"""
    WITH {_ivf_cents_sql(_R10B_IVF['k_cells'], _R10B_IVF['dim'],
                         _R10B_IVF['seed'])},
    {_pq_books_sql(_PQ['m'], _PQ['k_codes'], _PQ['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL},
    {_PQ_CODES_SQL.replace("d AS (SELECT e.vec_id", "pqd AS (SELECT e.vec_id").replace("FROM d) WHERE", "FROM pqd) WHERE")},
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
    routed AS (SELECT vec_id FROM asg JOIN probed USING (cell)),
    lut AS (SELECT b.sub, b.code,
                   CAST(FLOOR(1000000 * list_sum(list_transform(
                        range(1, 9), i -> qv[b.sub * 8 + i] * c[i])))
                     AS BIGINT) AS u
            FROM books b CROSS JOIN q),
    adc AS (SELECT c.vec_id, SUM(l.u) AS adc_u
            FROM codes c
            JOIN routed USING (vec_id)
            JOIN lut l ON c.sub = l.sub AND c.code = l.code
            GROUP BY c.vec_id),
    cand AS (SELECT vec_id
             FROM (SELECT vec_id,
                          ROW_NUMBER() OVER (ORDER BY adc_u DESC,
                                             vec_id) AS rn
                   FROM adc) WHERE rn <= 80)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim
    FROM e JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "ivf", "pq", "versioned"],
)
def ann_ivfpq_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three maintained families COMPOSED (`ann.probe_ivfpq_topk` —
    the IVFADC serving architecture): the query routes to its 3-of-8
    nearest frozen cells via the persisted IVF assignment table, the
    persisted PQ code table scores only the routed candidates by exact
    integer ADC (both engines pick the identical 80-row shortlist),
    and the float vectors are read for the 80-row rerank alone.  Both
    index fixtures replay the SAME three maintenance windows over the
    same corpus, so the composition is consistent by construction —
    and the oracle re-derives cells, codes, LUT, routing, shortlist,
    and rerank from scratch: the full serving stack under one hash."""
    from ..sinks import versioned as V
    from . import ann
    from .queries_round10b import _ivf_indexed_emb

    emb_dir, ivf_dir, _ = _ivf_indexed_emb(spark, sf_dir)
    _, pq_dir, _ = _pq_indexed_emb(spark, sf_dir)
    base = V.read_version(spark, emb_dir)
    query = list(base.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    return ann.probe_ivfpq_topk(
        spark, ivf_dir, pq_dir, emb_dir, query, k=20, nprobe=3,
        expand=4, dim=64, k_cells=_R10B_IVF["k_cells"],
        ivf_seed=_R10B_IVF["seed"], m=_PQ["m"], k_codes=_PQ["k_codes"],
        pq_seed=_PQ["seed"], base=base)


def _epoch_values_sql(epochs=(1, 2), seed: int = 17) -> str:
    from ..operators.seqpack import epoch_order_key

    rows = ", ".join(f"({e}, {a}, {b})"
                     for e in epochs
                     for a, b in [epoch_order_key(e, seed)])
    return f"eps(epoch, a, b) AS (VALUES {rows})"


@register(
    "corpus_incremental_epoch_order",
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
    wins AS (SELECT DISTINCT g, win FROM pack),
    {_epoch_values_sql()},
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
    tags=["corpus", "packing", "llm", "scale", "incremental"],
)
def corpus_incremental_epoch_order(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The training loader's REPRODUCIBILITY closure over the
    incremental lane: epoch-stable shuffled batch order
    (`seqpack.epoch_order`) computed on the INCREMENTALLY assembled
    shard table (read through its catalog pin) hash-matches DuckDB
    permuting a from-scratch pack of the union — i.e. epoch N's batch
    sequence is a pure function of (corpus content, epoch, seed),
    INDEPENDENT of whether the corpus was built in one shot or grown
    across crawl rounds.  Without `pack_sequences_delta`'s exactness
    this would be unattainable: any window the delta path placed
    differently would reorder every later batch."""
    from ..operators.seqpack import epoch_order
    from ..operators.windows import global_row_number_grouped
    from ..sinks import catalog as C

    _dirs, cat, _nr, _ic, _at = _incr_assembled(spark, sf_dir)
    # win > 0: see corpus_incremental_assemble — isolated negative
    # windows (oversize docs) are outside the oracle's packed universe
    packed = C.read_table(spark, cat, "shards").filter(F.col("win") > 0)
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


_IVFPQ_SERVING: dict = {}


def _drop_ivfpq_serving(keys=None) -> None:
    import shutil

    for k in list(_IVFPQ_SERVING) if keys is None else list(keys):
        shutil.rmtree(_IVFPQ_SERVING.pop(k)[0], ignore_errors=True)


@fixture_timed("ivfpq_serving_r11")
def _ivfpq_serving_table(spark: SparkSession, sf_dir: str
                         ) -> tuple[str, bool]:
    """Once per (session, sf_dir): the maintained PQ code table JOINED
    to its IVF cell assignment and re-committed hidden-partitioned on
    identity(cell) — the IVFADC SERVING layout: each vector's m code
    rows live in its cell's files, so a probe's ADC scan reads only
    nprobe/k_cells of the code table (manifest-predicate pruning, no
    directory listing).  prune_ok asserts a one-cell read lists a
    strict subset of the serving table's files."""
    import atexit
    import tempfile

    from ..sinks import versioned as V
    from .queries_round10b import _ivf_indexed_emb

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVFPQ_SERVING.get(key)
    if got is None:
        _drop_ivfpq_serving([k for k in _IVFPQ_SERVING
                             if k[0] != key[0]])
        if not _IVFPQ_SERVING:
            atexit.register(_drop_ivfpq_serving)
        _, ivf_dir, _ = _ivf_indexed_emb(spark, sf_dir)
        _, pq_dir, _ = _pq_indexed_emb(spark, sf_dir)
        t = tempfile.mkdtemp(prefix="spark_graft_ivfpqserve_")
        codes = V.read_version(spark, pq_dir)
        cells = V.read_version(spark, ivf_dir)
        V.write_snapshot(codes.join(cells, "vec_id"), t,
                         partition_by=["identity(cell)"])
        pruned = V.read_version(spark, t, predicates=[("cell", "=", 0)])
        manifest = V._read_manifest(t, V.latest_version(t))
        prune_ok = 0 < len(pruned.inputFiles()) < len(manifest)
        got = (t, bool(prune_ok))
        _IVFPQ_SERVING[key] = got
    return got


@register(
    "scale_ivfpq_pruned_probe",
    oracle=f"""
    WITH {_ivf_cents_sql(_R10B_IVF['k_cells'], _R10B_IVF['dim'],
                         _R10B_IVF['seed'])},
    {_pq_books_sql(_PQ['m'], _PQ['k_codes'], _PQ['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL},
    {_PQ_CODES_SQL.replace("d AS (SELECT e.vec_id", "pqd AS (SELECT e.vec_id").replace("FROM d) WHERE", "FROM pqd) WHERE")},
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
    routed AS (SELECT vec_id FROM asg JOIN probed USING (cell)),
    lut AS (SELECT b.sub, b.code,
                   CAST(FLOOR(1000000 * list_sum(list_transform(
                        range(1, 9), i -> qv[b.sub * 8 + i] * c[i])))
                     AS BIGINT) AS u
            FROM books b CROSS JOIN q),
    adc AS (SELECT c.vec_id, SUM(l.u) AS adc_u
            FROM codes c
            JOIN routed USING (vec_id)
            JOIN lut l ON c.sub = l.sub AND c.code = l.code
            GROUP BY c.vec_id),
    cand AS (SELECT vec_id
             FROM (SELECT vec_id,
                          ROW_NUMBER() OVER (ORDER BY adc_u DESC,
                                             vec_id) AS rn
                   FROM adc) WHERE rn <= 80)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim,
           TRUE AS pruned_ok
    FROM e JOIN cand USING (vec_id) CROSS JOIN q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["scale", "similarity", "ivf", "pq", "versioned",
          "partitioning"],
)
def scale_ivfpq_pruned_probe(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """IVF-PQ through the SERVING layout: PQ code rows co-committed
    with their cell, hidden-partitioned ``identity(cell)``, each
    probed cell read with a manifest predicate — the probe's code-table
    I/O is nprobe/k_cells of the index HOWEVER large the corpus, the
    ADC shortlist is exact-integer (engine-portable), and only the
    80-row rerank touches float vectors.  Same top-20 as the unpruned
    composition (`ann_ivfpq_probe_topk`); pruned_ok carries the
    strict-subset inputFiles proof.  This is the complete 100 TB
    serving story the three families exist for: band-LSH for
    candidates, IVF for routing, PQ for memory — here the routing and
    memory halves run fused and partition-pruned."""
    from ..sinks import versioned as V
    from . import ann
    from .queries_round10b import _ivf_indexed_emb

    emb_dir, _, _ = _ivf_indexed_emb(spark, sf_dir)
    serving, prune_ok = _ivfpq_serving_table(spark, sf_dir)
    base = V.read_version(spark, emb_dir)
    query = list(base.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    cells = ann.probe_cells(
        query, ann.ivf_centroids(64, _R10B_IVF["k_cells"],
                                 _R10B_IVF["seed"]), 3)
    cand = None
    for c in cells:
        part = V.read_version(spark, serving,
                              predicates=[("cell", "=", c)]) \
            .select("vec_id", "sub", "code")
        cand = part if cand is None else cand.unionByName(part)
    lut = ann.pq_lut_micros(
        query, ann.pq_codebooks(64, _PQ["m"], _PQ["k_codes"],
                                _PQ["seed"]))
    # one parsed expr, not m·k_codes lit().cast() py4j chains (§5.4)
    lut_lit = F.expr(
        "array(" + ",".join(f"{int(u)}L" for u in lut) + ")")
    shortlist = (cand.select(
        "vec_id",
        F.element_at(lut_lit,
                     (F.col("sub") * _PQ["k_codes"] + F.col("code") + 1)
                     .cast("int")).alias("__u"))
        .groupBy("vec_id")
        .agg(F.sum("__u").alias("adc_u"))
        .orderBy(F.desc("adc_u"), "vec_id")
        .limit(80))
    from ..operators import similarity
    return (base.join(F.broadcast(shortlist.select("vec_id")),
                      "vec_id", "left_semi")
            .select("vec_id",
                    F.round(similarity.cosine_q(query)
                            (F.col("embedding")), 6).alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(20)
            .withColumn("pruned_ok", F.lit(bool(prune_ok))))


# ---------------------------------------------------------------------------
# fixture-free analytics widening: packaging mix, receipt discipline,
# per-source corpus hygiene
# ---------------------------------------------------------------------------

@register(
    "part_finish_size_matrix",
    oracle="""
    SELECT split_part(p_type, ' ', 1) AS finish,
           p_size // 10 AS size_decade,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS retail_cents,
           CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) // COUNT(*) AS BIGINT)
             AS avg_retail_cents
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["aggregate", "part", "profile", "tpch-shaped"],
)
def part_finish_size_matrix(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Assortment mix matrix: parts and exact retail value per (type
    finish class — p_type's first word — and size decade): which
    finish classes carry the expensive sizes, written division-free
    (prices quantize to integer cents, the mean is one integral DIV).
    One map-side bucket + a |finishes|x|decades|-bounded aggregate;
    partials collapse map-side however large `part` grows."""
    (part,) = _t(spark, sf_dir, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    return (part.groupBy(
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))
        .alias("finish"),
        (F.col("p_size") / 10).cast("long").alias("size_decade"))
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.sum(cents).alias("retail_cents"))
        .select("finish", "size_decade", "n_parts", "retail_cents",
                F.expr("CAST(retail_cents DIV n_parts AS LONG)")
                .alias("avg_retail_cents"))
        .orderBy("finish", "size_decade"))


@register(
    "li_discount_tax_grid",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(l_discount AS DECIMAL(18,6)) * 100 AS BIGINT)
             AS disc_pct,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS gross_cents,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)
                    * CAST(CAST(l_tax AS DECIMAL(18,6)) * 1000000
                           AS BIGINT)) AS BIGINT) AS tax_weighted_u
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["aggregate", "lineitem", "profile", "tpch-shaped"],
)
def li_discount_tax_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-lever grid: per (returnflag, discount percent) the item
    count, exact gross cents, and the tax-weighted gross in exact
    micro-units (sum of cents*tax_ppm — the Q1-style compound sum kept
    in pure integers, so no float accumulation can flip the hash).
    The margin view of how discounting interacts with tax bands; one
    scan, map-side quantization, |flags|x|discounts|-bounded output."""
    (li,) = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    tax_ppm = (F.col("l_tax").cast("decimal(18,6)") * 1_000_000) \
        .cast("long")
    return (li.groupBy(
        "l_returnflag",
        (F.col("l_discount").cast("decimal(18,6)") * 100)
        .cast("long").alias("disc_pct"))
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(cents).alias("gross_cents"),
             F.sum(cents * tax_ppm).alias("tax_weighted_u"))
        .orderBy("l_returnflag", "disc_pct"))


@register(
    "doc_source_dup_rate",
    oracle="""
    WITH g AS (SELECT source, md5(text) AS h, COUNT(*) AS n
               FROM documents GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_unique,
           CAST(SUM(n - 1) AS BIGINT) AS n_dup_copies,
           CAST(SUM(n - 1) * 1000000 // SUM(n) AS BIGINT) AS dup_ppm
    FROM g GROUP BY 1 ORDER BY 1
    """,
    tags=["dedup", "corpus", "profile", "llm"],
)
def doc_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus hygiene: exact-duplicate copy rate within each
    source (md5 groups, copies beyond the first counted as dups, exact
    integer ppm) — the triage view that decides WHICH crawl feed needs
    dedup attention before the corpus lane spends compute on it.  Two
    keyed aggregates, both collapsing map-side; no pairwise work
    anywhere."""
    (docs,) = _t(spark, sf_dir, "documents")
    g = (docs.groupBy("source", F.md5(F.col("text")).alias("h"))
         .agg(F.count(F.lit(1)).alias("n")))
    return (g.groupBy("source")
            .agg(F.sum("n").cast("long").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_unique"),
                 F.sum(F.col("n") - 1).cast("long").alias("n_dup_copies"))
            .select("source", "n_docs", "n_unique", "n_dup_copies",
                    F.expr("CAST((n_dup_copies * 1000000L) DIV n_docs "
                           "AS LONG)").alias("dup_ppm"))
            .orderBy("source"))


@register(
    "mv_sql_route_star_having",
    oracle="""
    SELECT n.n_name,
           CAST(date_trunc('year', o.o_orderdate) AS DATE) AS yr,
           COUNT(*) AS n_orders,
           MAX(o.o_totalprice) AS max_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 25
    ORDER BY n_orders DESC, n_name, yr LIMIT 15
    """,
    tags=["mv", "sql", "rewrite", "star", "join", "having"],
)
def mv_sql_route_star_having(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Star-routed SQL with the FULL modifier surface exercised through
    the qualified-reference path: a fact ⋈ dim ⋈ dim query with a YEAR
    rollup of the stored day dim, a HAVING over the repeated aggregate
    form (proved against the measure list with qualified column refs —
    `_parse_having`'s join-mode resolver), DESC ordering on a measure,
    and a LIMIT — all answered from the stored denormalized summary
    (`mv_sql_route_star`'s fixture); the fact ⋈ dims join never runs at
    query time, and the group filter applies POST re-aggregation (SQL
    semantics: a year group must clear the bar with its rolled-up
    count, not any stored day's).  Fallback raises, so a route miss
    fails loudly; the oracle recomputes from the raw tables."""
    from . import mv as M
    from .queries_round7 import _mv_star_nation_prices

    spec, _t_dir = _mv_star_nation_prices(spark, sf_dir)
    q = ("SELECT n.n_name, date_trunc('year', o.o_orderdate) AS yr, "
         "COUNT(*) AS n_orders, MAX(o.o_totalprice) AS max_price "
         "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
         "JOIN nation n ON c.c_nationkey = n.n_nationkey "
         "GROUP BY n.n_name, 2 HAVING COUNT(*) >= 25 "
         "ORDER BY n_orders DESC, n_name, yr LIMIT 15")

    def _no_fallback(_q):
        raise AssertionError("resolver must route, not fall back")

    df, used = M.sql_rewrite(spark, q, [spec], fallback=_no_fallback)
    assert used == spec.name
    return df

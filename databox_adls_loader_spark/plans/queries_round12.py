"""Round-12 registry extensions.

Headline: NEAR-DUP admission composed into the incremental corpus lane
(round-11 verdict, Next round #1).  The round-11 lane
(`queries_round11.incr_delta_round`) stopped exact duplicates only — a
crawl's near-duplicates sailed through even though the machinery to
stop them existed on both sides.  This lane persists the MinHash
SIGNATURE table and the banded LSH index as two more catalog tables and
runs every incoming batch through

    exact anti-join (persisted md5 hash table)
      -> MinHash-band candidates vs the PERSISTED band table (O(delta)
         banded candidate generation — never n², never a corpus rescan)
      -> signature-estimated Jaccard >= τ verified drops
      -> only then pack / append / refresh / publish (ONE catalog txn)

with the admission rule chosen to be ORDER-INDEPENDENT so incremental ≡
from-scratch by construction: a canonical doc is dropped iff ANY
earlier-id canonical doc (survivor or not) is a verified near-dup of
it.  Ids ascend across crawl rounds (the lane's append-arrival
invariant), so "earlier id" is always "same or earlier round" — the
persisted band/sig tables plus a within-batch self-join see exactly the
global pair set.

Reference boundary: the reference re-lists and re-copies everything per
run (adls_copy_utils.py:69 getSourceFileList); round 11 retired that
model for exact dups, this lane retires it for near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, fixture_timed, register
from .queries_ext import _hex15_to_long, _perms_values_sql
from .queries_round10 import (_ANN, _ANN_FINAL_STATE_SQL,
                              _band_bucket_sql, _band_planes_sql)
from .queries_round10b import _IVF as _R10B_IVF
from .queries_round10b import _IVF_ASG_SQL, _ivf_cents_sql
from .queries_round11 import (_PQ, _PQ_CODES_SQL, _pq_books_sql,
                              _surv_emb)

# near-dup admission geometry: 32-permutation portable MinHash over
# 3-shingles, 8 bands of width 4, drop at estimated Jaccard >= 1/2
# (integer form: >=16 of 32 signature components equal)
_ND = dict(k=32, bands=8, shingle_n=3)
_ND_MIN_EQ2 = _ND["k"]          # n_eq * 2 >= k  <=>  est >= 0.5

_ND_TABLES = ("shards", "pack_tail", "corpus_hashes", "minhash_sigs",
              "minhash_bands", "embeddings_base", "band_index")

# planted delta-2 rows (driver-synthesized on BOTH engines): the
# near-dup plant appends this suffix to the bootstrap's longest doc —
# ~3 new 3-shingles against hundreds retained, so the signature
# estimate is far above τ and the plant MUST be blocked; the fresh
# plant is all-novel tokens and MUST land
_ND_SUFFIX = " spark graft neardup probe xq"
_ND_FRESH = " ".join(f"zxqv{i:02d}" for i in range(24))


def _batch_uniq_txt(frame: DataFrame) -> DataFrame:
    """In-batch exact dedup keeping the canonical TEXT (every text in
    an md5 group is identical, so MIN is just 'the text' —
    deterministic either way): (md5, min doc_id, token estimate,
    text)."""
    return (frame.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens"),
                 F.min("text").alias("text")))


def _nd_sigs_bands(uniq: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(signatures, banded keys) of a canonical batch — portable
    (md5-permutation) MinHash so the DuckDB oracle replays them
    bit-identically.  The band frame is the batch's contribution to
    the persisted LSH admission index."""
    from ..operators import dedup

    sigs = dedup.minhash_docs(uniq, "text", "doc_id", _ND["k"],
                              _ND["shingle_n"], portable=True)
    bands = dedup.lsh_banded(sigs, _ND["bands"], "doc_id",
                             portable=True)
    return sigs, bands


def _nd_verify(cands: DataFrame, sig_a: DataFrame,
               sig_b: DataFrame) -> DataFrame:
    """Candidate (a, b) pairs -> the b ids whose signature-estimated
    Jaccard vs a clears τ, in exact integer form (n_eq·2 >= k — no
    float division on either engine)."""
    a = sig_a.select(F.col("doc_id").alias("a"),
                     F.col("sig").alias("sig_a"))
    b = sig_b.select(F.col("doc_id").alias("b"),
                     F.col("sig").alias("sig_b"))
    n_eq = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
        lambda e: e))
    return (cands.join(a, "a").join(b, "b")
            .filter(n_eq * 2 >= F.lit(_ND_MIN_EQ2))
            .select("b").distinct())


def _nd_batch_drops(sigs: DataFrame, bands: DataFrame,
                    psigs: DataFrame, pbands: DataFrame) -> DataFrame:
    """The batch doc_ids the near-dup rule drops: verified pairs from
    (1) the batch's band keys against the PERSISTED band index with
    ``r.id < l.id`` — every earlier canonical doc, O(delta) candidate
    generation — and (2) the within-batch band self-join (a < b).

    The ``r.id < l.id`` predicate on the cross join doubles as the
    crash-rerun guard: if a mid-round crash left the sig/band tables
    already extended with this batch, the rerun's cross join sees the
    batch's own rows on the persisted side — self-pairs are excluded
    by the inequality and same-batch pairs degenerate to exactly the
    within-batch rule, so the recomputed drop set is IDENTICAL to the
    first attempt's (the lane's reruns stay derived from pre-round
    state)."""
    bb, pb = bands.alias("l"), pbands.alias("r")
    cross = (bb.join(pb,
                     (F.col("l.band") == F.col("r.band"))
                     & (F.col("l.band_hash") == F.col("r.band_hash"))
                     & (F.col("r.id") < F.col("l.id")))
             .select(F.col("r.id").alias("a"),
                     F.col("l.id").alias("b"))
             .distinct())
    wl, wr = bands.alias("l"), bands.alias("r")
    within = (wl.join(wr,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col("l.id") < F.col("r.id")))
              .select(F.col("l.id").alias("a"),
                      F.col("r.id").alias("b"))
              .distinct())
    return (_nd_verify(cross, psigs, sigs)
            .unionByName(_nd_verify(within, sigs, sigs))
            .distinct())


def nd_bootstrap(spark: SparkSession, dirs: tuple[str, ...],
                 cat_dir: str, docs: DataFrame, emb: DataFrame,
                 txn_id: str = "nd-r0") -> None:
    """Round 0 of the NEAR-DUP incremental corpus lane: exact dedup,
    within-batch near-dup admission, pack the survivors, and seed ALL
    SEVEN tables — shards + tail + md5 hashes + minhash signatures +
    banded LSH index + survivor embeddings + band index — in ONE
    catalog transaction.  The sig/band tables carry EVERY canonical
    doc (dropped near-dups included): the admission rule compares
    against every earlier canonical doc, so dropped docs still block
    later lookalikes — without this, A dropped-for-B would let C
    (near B, nearer A) slip in on a later crawl."""
    from ..operators.seqpack import pack_sequences, pack_tail_state
    from ..sinks import catalog as C
    from ..sinks import versioned as V

    (pack_dir, tail_dir, hash_dir, sig_dir, band_dir, emb_dir,
     index_dir) = dirs
    uniq0 = _batch_uniq_txt(docs)
    sigs0, bands0 = _nd_sigs_bands(uniq0)
    sigs0 = sigs0.persist()
    sigs0.count()                      # one compute, four consumers
    drops0 = _nd_batch_drops(sigs0, bands0,
                             psigs=sigs0.limit(0),
                             pbands=bands0.limit(0))
    surv0 = (uniq0.join(drops0.withColumnRenamed("b", "doc_id"),
                        "doc_id", "left_anti")
             .select("h", "doc_id", "n_tokens"))
    packed0 = pack_sequences(surv0, 256, count_col="n_tokens",
                             n_groups=8)
    V.write_snapshot(packed0, pack_dir, partition_by=["identity(g)"])
    V.write_snapshot(pack_tail_state(packed0), tail_dir,
                     mode="overwrite")
    V.write_snapshot(uniq0.select("h", "doc_id"), hash_dir)
    V.write_snapshot(sigs0.select("doc_id", "sig"), sig_dir)
    V.write_snapshot(bands0, band_dir)
    V.write_snapshot(_surv_emb(emb, surv0), emb_dir)
    from . import ann
    ann.build_ann_index(spark, index_dir, emb_dir, **_ANN)
    C.commit_txn(cat_dir,
                 dict(zip(_ND_TABLES, ((d, None) for d in dirs))),
                 txn_id=txn_id)
    sigs0.unpersist()


def nd_delta_round(spark: SparkSession, dirs: tuple[str, ...],
                   cat_dir: str, incoming: DataFrame, emb: DataFrame,
                   txn_id: str,
                   round_seq: int | None = None) -> tuple[bool, bool]:
    """ONE incremental round with near-dup admission — the round-11
    `incr_delta_round` body plus the banded check: exact anti-join the
    persisted md5 table, band the remainder's signatures against the
    PERSISTED LSH index (O(delta) candidates), verify at τ, drop, and
    only then delta-pack / append / refresh / publish atomically.
    Returns (noreread_ok, inc_ok) — committed shard files are still
    never re-read (the sig/band/hash/tail reads are skinny side tables,
    not shard windows; inputFiles proof).

    Write order pack -> tail -> embeddings -> sigs -> bands -> hashes
    keeps a crash-rerun derived from pre-round state: the md5 table
    (whose extension changes the exact-survivor set) lands LAST, and
    the cross join's ``r.id < l.id`` guard makes the drop set immune
    to the sig/band tables having landed (see `_nd_batch_drops`).
    ``round_seq`` gates each table write through the streaming
    batch-id ledger exactly like the round-11 lane."""
    from ..operators.seqpack import (merge_tail_state,
                                     pack_sequences_delta,
                                     pack_tail_state)
    from ..sinks import catalog as C
    from ..sinks import versioned as V
    from ..sinks.versioned import _canon_uri_key
    from . import ann

    (pack_dir, tail_dir, hash_dir, sig_dir, band_dir, emb_dir,
     index_dir) = dirs
    committed_files = {
        _canon_uri_key(p)
        for p in V._read_manifest(pack_dir,
                                  V.latest_version(pack_dir))}
    sv0 = (_batch_uniq_txt(incoming)
           .join(V.read_version(spark, hash_dir).select("h"),
                 "h", "left_anti"))
    sigs, bands = _nd_sigs_bands(sv0)
    sigs = sigs.persist()
    sigs.count()
    drops = _nd_batch_drops(sigs, bands,
                            psigs=V.read_version(spark, sig_dir),
                            pbands=V.read_version(spark, band_dir))
    surv = (sv0.join(drops.withColumnRenamed("b", "doc_id"),
                     "doc_id", "left_anti")
            .select("h", "doc_id", "n_tokens"))
    tail = V.read_version(spark, tail_dir)
    dpack = pack_sequences_delta(surv, 256, tail,
                                 count_col="n_tokens", n_groups=8)
    read_files = {_canon_uri_key(p)
                  for frame in (dpack, surv, tail)
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
            lambda: V.write_snapshot(_surv_emb(emb, surv), emb_dir,
                                     batch_ids=ids))
        if wrote_emb:
            nonlocal inc_ok
            inc_ok = V._changes_incremental(
                spark, emb_dir, v_prev, V.latest_version(emb_dir),
                "vec_id") is not None
        _once(sig_dir,
              lambda: V.write_snapshot(sigs.select("doc_id", "sig"),
                                       sig_dir, batch_ids=ids))
        _once(band_dir,
              lambda: V.write_snapshot(bands, band_dir, batch_ids=ids))
        _once(hash_dir,
              lambda: V.write_snapshot(sv0.select("h", "doc_id"),
                                       hash_dir, batch_ids=ids))
        ann.refresh_ann_index(spark, index_dir, emb_dir, **_ANN)
        return None

    ops = {"shards": (pack_dir, mutate_round)}
    ops.update({n: (d, None)
                for n, d in zip(_ND_TABLES[1:], dirs[1:])})
    C.commit_txn(cat_dir, ops, txn_id=txn_id)
    sigs.unpersist()
    return bool(noreread_ok), bool(inc_ok)


def nd_delta_stream_batch(batch_df: DataFrame, batch_id: int,
                          dirs: tuple[str, ...], cat_dir: str,
                          emb: DataFrame) -> tuple[bool, bool]:
    """STREAMING twin — a crawl stream drives the near-dup lane
    exactly-once via foreachBatch, same contract as round-11's
    `incr_delta_stream_batch` (txn-id catalog no-op on batch replay,
    round_seq table ledger for mid-round crash resume)."""
    return nd_delta_round(
        batch_df.sparkSession, dirs, cat_dir, batch_df, emb,
        txn_id=f"stream-ndcorpus:{int(batch_id)}",
        round_seq=int(batch_id))


_NDI: dict = {}


def _drop_ndi(keys=None) -> None:
    import shutil

    for k in list(_NDI) if keys is None else list(keys):
        for d in _NDI.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


def _nd_planted(spark: SparkSession, docs: DataFrame,
                mx: int) -> DataFrame:
    """The two delta-2 plants, derived from the table itself so the
    oracle can construct the identical rows in SQL: a near-dup of the
    bootstrap range's longest doc (longest => hundreds of retained
    shingles vs ~3 new => estimate ≈ 1 >> τ) and an all-novel doc."""
    bnd = mx * 3 // 5
    base = (docs.filter(F.col("doc_id") <= bnd)
            .orderBy(F.desc("n_chars"), "doc_id").limit(1)
            .select("text", "n_chars").first())
    return spark.createDataFrame(
        [(mx + 1, base["text"] + _ND_SUFFIX,
          int(base["n_chars"]) + len(_ND_SUFFIX)),
         (mx + 2, _ND_FRESH, len(_ND_FRESH))],
        "doc_id long, text string, n_chars long")


@fixture_timed("incr_neardup_r12")
def _nd_assembled(spark: SparkSession, sf_dir: str
                  ) -> tuple[tuple[str, ...], str, bool, bool, bool,
                             bool]:
    """Once per (session, sf_dir): the near-dup incremental lane —
    bootstrap over the low-id 60% of `documents`, then two crawl
    deltas (60–80%, 80–100% by doc_id), delta 2 carrying the two
    plants.  Returns (dirs, cat_dir, noreread_ok, inc_ok, atomic_ok,
    plant_blocked)."""
    import atexit
    import tempfile

    from ..sinks import catalog as C

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _NDI.get(key)
    if got is not None:
        return got
    _drop_ndi([k for k in _NDI if k[0] != key[0]])
    if not _NDI:
        atexit.register(_drop_ndi)
    dirs = tuple(tempfile.mkdtemp(prefix=f"spark_graft_nd{n}_")
                 for n in ("shards", "tail", "hash", "sig", "bandt",
                           "emb", "idx"))
    cat_dir = tempfile.mkdtemp(prefix="spark_graft_ndcat_")
    docs, emb = (_t(spark, sf_dir, "documents")[0],
                 _t(spark, sf_dir, "embeddings")[0])
    docs3 = docs.select("doc_id", "text", "n_chars")
    mx = int(docs.agg(F.max("doc_id")).first()[0])
    t1, t2 = mx * 3 // 5, mx * 4 // 5
    did = F.col("doc_id")
    nd_bootstrap(spark, dirs, cat_dir, docs3.filter(did <= t1), emb)
    noreread_ok, inc_ok = True, True
    deltas = (docs3.filter((did > t1) & (did <= t2)),
              docs3.filter(did > t2)
              .unionByName(_nd_planted(spark, docs, mx)))
    for r, delta in enumerate(deltas, start=1):
        nr, ic = nd_delta_round(spark, dirs, cat_dir, delta, emb,
                                txn_id=f"nd-r{r}", round_seq=r)
        noreread_ok, inc_ok = noreread_ok and nr, inc_ok and ic
    hist = C.catalog_history(cat_dir)
    atomic_ok = (len(hist) == 3
                 and all(h["changed"] == sorted(_ND_TABLES)
                         for h in hist)
                 and all(s["drift"] == 0
                         for s in C.catalog_status(cat_dir)))
    shard_ids = {r.id for r in C.read_table(spark, cat_dir, "shards")
                 .select("id").distinct().collect()
                 if r.id > mx}
    hash_ids = {r.doc_id for r in
                C.read_table(spark, cat_dir, "corpus_hashes")
                .filter(F.col("doc_id") > mx).collect()}
    plant_blocked = (mx + 1 not in shard_ids
                     and mx + 2 in shard_ids
                     and {mx + 1, mx + 2} <= hash_ids)
    got = (dirs, cat_dir, bool(noreread_ok), bool(inc_ok),
           bool(atomic_ok), bool(plant_blocked))
    _NDI[key] = got
    return got


# the from-scratch universe both engines agree on: documents plus the
# two plants, exact-dedup'd, portable-MinHash'd, banded, and
# near-dedup'd under the global "dropped iff any earlier-id canonical
# doc verifies at τ" rule
_ND_UNIVERSE_SQL = rf"""
    mxv AS (SELECT MAX(doc_id) AS mx FROM documents),
    basep AS (SELECT text, n_chars FROM documents
              WHERE doc_id <= (SELECT mx * 3 // 5 FROM mxv)
              ORDER BY n_chars DESC, doc_id LIMIT 1),
    docs_all AS (
      SELECT doc_id, text, n_chars FROM documents
      UNION ALL
      SELECT (SELECT mx + 1 FROM mxv),
             text || '{_ND_SUFFIX}', n_chars + {len(_ND_SUFFIX)}
      FROM basep
      UNION ALL
      SELECT (SELECT mx + 2 FROM mxv), '{_ND_FRESH}',
             {len(_ND_FRESH)}
    ),
    uniq AS (SELECT MIN(doc_id) AS doc_id,
                    (MIN(n_chars) + 3) // 4 AS t, MIN(text) AS text
             FROM docs_all GROUP BY md5(text)),
    toks AS (SELECT doc_id,
                    regexp_split_to_array(trim(text), '\s+') AS tk
             FROM uniq),
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
    cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
             FROM banded l JOIN banded r
               ON l.bi = r.bi AND l.bkey = r.bkey
              AND l.doc_id < r.doc_id),
    drops AS (SELECT DISTINCT c.b
              FROM cand c JOIN sig sa ON c.a = sa.doc_id
                          JOIN sig sb2 ON c.b = sb2.doc_id
              WHERE len(list_filter(range(1, {_ND["k"] + 1}),
                        i -> sa.sig[i] = sb2.sig[i])) * 2
                    >= {_ND_MIN_EQ2}),
    surv AS (SELECT u.doc_id, u.t FROM uniq u
             WHERE u.doc_id NOT IN (SELECT b FROM drops))
"""


@register(
    "corpus_incremental_neardup_assemble",
    oracle=f"""
    WITH RECURSIVE {_ND_UNIVERSE_SQL},
    base AS (SELECT CAST(doc_id % 8 AS INTEGER) AS g, doc_id AS id, t
             FROM surv),
    pieces AS (
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
          FROM embeddings em JOIN surv ON em.vec_id = surv.doc_id),
    {_band_bucket_sql()},
    idx AS (SELECT COUNT(*) AS n_indexed,
                   CAST(SUM(bucket) AS BIGINT) AS bucket_sum
            FROM bk),
    cnt AS (SELECT (SELECT COUNT(*) FROM uniq) AS n_canonical,
                   (SELECT COUNT(*) FROM surv) AS n_admitted,
                   ((SELECT mx + 1 FROM mxv) IN (SELECT b FROM drops)
                    AND (SELECT mx + 2 FROM mxv) IN
                        (SELECT doc_id FROM surv)) AS plant_blocked),
    p AS (SELECT g, CAST(MAX(win) AS BIGINT) AS n_windows,
                 COUNT(*) AS n_docs, CAST(SUM(pt) AS BIGINT) AS tokens,
                 CAST(SUM(win * pt) AS BIGINT) AS win_tok_sum
          FROM pack GROUP BY g)
    SELECT p.g, p.n_windows, p.n_docs, p.tokens, p.win_tok_sum,
           idx.n_indexed, idx.bucket_sum,
           cnt.n_canonical, cnt.n_admitted, cnt.plant_blocked,
           TRUE AS noreread_ok, TRUE AS inc_ok, TRUE AS atomic_ok
    FROM p CROSS JOIN idx CROSS JOIN cnt ORDER BY p.g
    """,
    tags=["corpus", "packing", "dedup", "lsh", "similarity",
          "versioned", "catalog", "llm", "scale", "incremental"],
)
def corpus_incremental_neardup_assemble(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """The incremental corpus lane with NEAR-DUP admission — round-11
    verdict #1 closed: bootstrap + two crawl deltas, each round exact
    anti-join -> banded MinHash candidates vs the PERSISTED
    signature/band tables -> verified drops -> delta pack -> O(changes)
    index refresh -> ONE catalog txn over all SEVEN tables.  The final
    state read back THROUGH the catalog must hash-match DuckDB
    assembling and near-dedup'ing the whole universe (documents + the
    two plants) FROM SCRATCH: per-shard window stats, the band-index
    checksum, the canonical/admitted counts, and the plant verdict
    (blocked near-dup, landed fresh doc) under one hash — a
    near-duplicate leaking past the banded admission, an over-drop, or
    a plant landing each flip the gate.  The win > 0 filter keeps
    isolated oversize windows outside the oracle's packed universe
    (same contract as `corpus_incremental_assemble`)."""
    from ..sinks import catalog as C

    _dirs, cat, noreread_ok, inc_ok, atomic_ok, plant_blocked = \
        _nd_assembled(spark, sf_dir)
    shards = C.read_table(spark, cat, "shards")
    packed = shards.filter(F.col("win") > 0)
    idx = (C.read_table(spark, cat, "band_index")
           .agg(F.count(F.lit(1)).alias("n_indexed"),
                F.sum("bucket").cast("long").alias("bucket_sum")))
    cnt = (C.read_table(spark, cat, "corpus_hashes")
           .agg(F.count(F.lit(1)).alias("n_canonical"))
           .crossJoin(shards.select("id").distinct()
                      .agg(F.count(F.lit(1)).alias("n_admitted"))))
    per_g = (packed.groupBy("g")
             .agg(F.max("win").cast("long").alias("n_windows"),
                  F.count(F.lit(1)).alias("n_docs"),
                  F.sum("piece_tokens").cast("long").alias("tokens"),
                  F.sum(F.col("win") * F.col("piece_tokens"))
                  .cast("long").alias("win_tok_sum")))
    return (per_g.crossJoin(F.broadcast(idx))
            .crossJoin(F.broadcast(cnt))
            .withColumn("plant_blocked", F.lit(bool(plant_blocked)))
            .withColumn("noreread_ok", F.lit(bool(noreread_ok)))
            .withColumn("inc_ok", F.lit(bool(inc_ok)))
            .withColumn("atomic_ok", F.lit(bool(atomic_ok)))
            .orderBy("g"))


@register(
    "corpus_incremental_neardup_drops",
    oracle=f"""
    WITH {_ND_UNIVERSE_SQL}
    SELECT b AS doc_id FROM drops ORDER BY doc_id
    """,
    tags=["corpus", "dedup", "lsh", "versioned", "incremental"],
)
def corpus_incremental_neardup_drops(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The near-dup admission AUDIT over the incremental lane: the
    docs the banded check refused are exactly (md5 table) minus
    (shard table) — every canonical doc is in the hash table and every
    admitted doc packed at least one shard row, so the set difference
    IS the drop ledger.  Must equal DuckDB's from-scratch global drop
    set — order-independence of the admission rule made concrete."""
    from ..sinks import catalog as C

    _dirs, cat, *_ = _nd_assembled(spark, sf_dir)
    admitted = C.read_table(spark, cat, "shards").select(
        F.col("id").alias("doc_id")).distinct()
    return (C.read_table(spark, cat, "corpus_hashes").select("doc_id")
            .join(admitted, "doc_id", "left_anti")
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# PQ codebook drift lifecycle (round-11 verdict, Next round #2):
# detect distribution drift from the per-subspace CODE histograms of the
# maintained index, retrain the codebooks on the post-drift corpus,
# re-encode as a staged new index version, AUDIT the measured recall,
# and only then publish codebook + index together in one catalog txn
# (write-audit-publish).  Everything — sampling, Gonzalez seeding,
# Lloyd iterations, encoding, ADC probing, the recall numbers — is
# exact int64 arithmetic (`plans/ann.pq_train_int` family), so the
# DuckDB oracle REPLAYS THE TRAINING ITSELF and the whole lifecycle
# rides the value hash.
# ---------------------------------------------------------------------------

_PQR = dict(m=4, k_codes=8, iters=2)
_PQR_SAMPLE = 192
_PQR_SUBDIM = 16                      # dim 64 / m 4
_PQR_DELTA_BASE = 1_000_000
_PQR_QIDS = (1_000_001, 1_000_003, 1_000_005, 1_000_007)
_PQR_K, _PQR_EXPAND = 20, 8
_PQR_DRIFT_FLOOR_PPM = 300_000        # measured 600k-880k at gate SFs


def _pqr_drift_expr(col):
    """The planted drift: reflect and shift (0.8 − x over the reversed
    vector) — full-spread mass OUTSIDE the original support, so the
    stale codebooks collapse it onto edge codewords (recall decays,
    code histograms shift decisively) while a retrained book can
    discriminate inside it (recall restores).  The result rounds
    through float32 (the base table's storage type); the oracle
    replays the identical double→REAL→double round-trip."""
    return F.transform(
        F.reverse(col),
        lambda x: (F.lit(0.8) - x.cast("double")).cast("float"))


_PQR_STATE_SQL = """
    eA AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    ed AS (SELECT vec_id + 1000000 AS vec_id,
                  list_transform(list_reverse(v),
                                 x -> CAST(CAST(0.8 - x AS REAL)
                                           AS DOUBLE)) AS v
           FROM eA),
    eall AS MATERIALIZED (SELECT * FROM eA UNION ALL SELECT * FROM ed)
"""


def _pqr_d2_sql(a: str, b: str, subdim: int = _PQR_SUBDIM) -> str:
    return (f"CAST(list_sum(list_transform(range(1, {subdim + 1}),"
            f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
            " AS BIGINT)")


def _pqr_xu_sql(src: str, subdim: int = _PQR_SUBDIM,
                m: int = _PQR["m"], xu: str | None = None) -> str:
    """µ-int subvectors of a corpus CTE — the oracle half of
    `ann._mu_vec_expr` (same FLOOR((x + 2)·1e6) double arithmetic).
    ``m=1, subdim=dim`` degenerates to whole-vector µ-ints (the IVF
    centroid-trainer form); ``xu`` overrides the emitted CTE name when
    one corpus needs several geometries."""
    xu = xu or f"{src}_xu"
    return (f"{xu} AS MATERIALIZED (SELECT vec_id, sub,"
            f" list_transform(range(1, {subdim + 1}),"
            f" i -> CAST(FLOOR((v[sub * {subdim} + i] + 2)"
            " * 1000000) AS BIGINT)) AS xs"
            f" FROM {src} CROSS JOIN range(0, {m}) AS ms(sub))")


def _pqr_trainer_sql(src: str, p: str, subdim: int = _PQR_SUBDIM,
                     k_codes: int = _PQR["k_codes"],
                     iters: int = _PQR["iters"],
                     sample_rows: int = _PQR_SAMPLE,
                     xu: str | None = None) -> str:
    """`ann.pq_train_int` as a relational replay over ``{src}_xu``:
    md5-rank sample, Gonzalez chain (argmax min-dist², ties to the
    lowest rank), fixed Lloyd iterations (argmin assignment ties to
    the lowest code, integer-mean centroids, empty codes keep their
    previous centroid).  Emits ``{p}bk(sub, code, cs)``."""
    from .queries_ext import _hex15_to_long

    xu = xu or f"{src}_xu"

    def d2(a: str, b: str) -> str:
        return _pqr_d2_sql(a, b, subdim)

    md5h = _hex15_to_long("md5(CAST(vec_id AS VARCHAR))")
    ctes = [
        f"{p}ids AS (SELECT vec_id, ROW_NUMBER() OVER"
        f" (ORDER BY {md5h}, vec_id) AS rnk FROM {src})",
        f"{p}smp AS MATERIALIZED (SELECT i.rnk, x.sub, x.xs FROM {p}ids i"
        f" JOIN {xu} x USING (vec_id)"
        f" WHERE i.rnk <= {sample_rows})",
        f"{p}ch0 AS (SELECT sub, 0 AS code, xs AS cs FROM {p}smp"
        " WHERE rnk = 1)",
    ]
    for j in range(1, k_codes):
        ctes += [
            f"{p}d{j} AS (SELECT s.rnk, s.sub,"
            f" MIN({d2('s.xs', 'c.cs')}) AS dmin"
            f" FROM {p}smp s JOIN {p}ch{j - 1} c USING (sub)"
            " GROUP BY s.rnk, s.sub)",
            f"{p}s{j} AS (SELECT sub, {j} AS code, cs FROM ("
            f"SELECT d.sub, s.xs AS cs, ROW_NUMBER() OVER"
            " (PARTITION BY d.sub ORDER BY d.dmin DESC, d.rnk) AS rn"
            f" FROM {p}d{j} d JOIN {p}smp s"
            " ON s.rnk = d.rnk AND s.sub = d.sub) WHERE rn = 1)",
            f"{p}ch{j} AS MATERIALIZED (SELECT * FROM {p}ch{j - 1}"
            f" UNION ALL SELECT * FROM {p}s{j})",
        ]
    prev = f"{p}ch{k_codes - 1}"
    for t in range(1, iters + 1):
        ctes += [
            f"{p}a{t} AS (SELECT rnk, sub, code FROM ("
            "SELECT s.rnk, s.sub, b.code, ROW_NUMBER() OVER"
            f" (PARTITION BY s.rnk, s.sub ORDER BY"
            f" {d2('s.xs', 'b.cs')}, b.code) AS rn"
            f" FROM {p}smp s JOIN {prev} b USING (sub)) WHERE rn = 1)",
            f"{p}m{t} AS (SELECT a.sub, a.code, ii.i AS i,"
            " CAST(SUM(s.xs[ii.i]) AS BIGINT) // COUNT(*) AS mv"
            f" FROM {p}a{t} a JOIN {p}smp s"
            " ON s.rnk = a.rnk AND s.sub = a.sub"
            f" CROSS JOIN range(1, {subdim + 1}) AS ii(i)"
            " GROUP BY a.sub, a.code, ii.i)",
            f"{p}mm{t} AS (SELECT sub, code, list(mv ORDER BY i) AS cs"
            f" FROM {p}m{t} GROUP BY sub, code)",
            f"{p}it{t} AS MATERIALIZED (SELECT pb.sub, pb.code,"
            " COALESCE(n.cs, pb.cs) AS cs"
            f" FROM {prev} pb LEFT JOIN {p}mm{t} n USING (sub, code))",
        ]
        prev = f"{p}it{t}"
    ctes.append(f"{p}bk AS MATERIALIZED (SELECT sub, code, cs FROM {prev})")
    return ",\n    ".join(ctes)


def _pqr_codes_sql(src: str, books: str, out: str,
                   subdim: int = _PQR_SUBDIM,
                   xu: str | None = None) -> str:
    """Nearest-codeword assignment of ``{src}_xu`` against a trained
    books CTE — the oracle half of `ann.pq_rows_int`."""
    xu = xu or f"{src}_xu"
    return (f"{out} AS MATERIALIZED (SELECT vec_id, sub, code FROM ("
            "SELECT x.vec_id, x.sub, b.code, ROW_NUMBER() OVER"
            " (PARTITION BY x.vec_id, x.sub ORDER BY"
            f" {_pqr_d2_sql('x.xs', 'b.cs', subdim)}, b.code) AS rn"
            f" FROM {xu} x JOIN {books} b USING (sub))"
            " WHERE rn = 1)")


def _pqr_probe_sql(books: str, codes: str, p: str) -> str:
    """Integer-ADC probe + exact-integer rerank for every query in the
    ``qxu`` CTE at once (relational over qid) — the oracle half of
    `ann.probe_pq_topk_int`; hits counted against the ``bf`` exact
    top-k."""
    lim = _PQR_K * _PQR_EXPAND
    return f"""
    {p}lut AS (SELECT qx.qid, bb.sub, bb.code,
                      {_pqr_d2_sql('qx.xs', 'bb.cs')} AS u
               FROM qxu qx JOIN {books} bb USING (sub)),
    {p}adc AS (SELECT l.qid, c.vec_id, CAST(SUM(l.u) AS BIGINT) AS adc
               FROM {codes} c JOIN {p}lut l
                 ON l.sub = c.sub AND l.code = c.code
               GROUP BY l.qid, c.vec_id),
    {p}cand AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY adc, vec_id) AS rn FROM {p}adc)
        WHERE rn <= {lim}),
    {p}probe AS (SELECT qid, vec_id FROM (
        SELECT e.qid, e.vec_id, ROW_NUMBER() OVER (PARTITION BY e.qid
                ORDER BY e.d2, e.vec_id) AS rn
        FROM exd e JOIN {p}cand c
          ON c.qid = e.qid AND c.vec_id = e.vec_id)
        WHERE rn <= {_PQR_K}),
    {p}hits AS (SELECT q.qid, (SELECT COUNT(*) FROM {p}probe p
                               JOIN bf ON bf.qid = p.qid
                                AND bf.vec_id = p.vec_id
                               WHERE p.qid = q.qid) AS n
                FROM quv q)"""


_PQR_COMMON_SQL = f"""
    {_PQR_STATE_SQL},
    {_pqr_xu_sql('eA')},
    {_pqr_xu_sql('eall')},
    {_pqr_trainer_sql('eA', 'b0')},
    {_pqr_codes_sql('eall', 'b0bk', 'codes0')},
    ns AS (SELECT
             (SELECT COUNT(*) FROM eA) AS n1t,
             (SELECT COUNT(*) FROM ed) AS n2t),
    hist AS (SELECT c.sub, c.code,
                    SUM(CASE WHEN c.vec_id < {_PQR_DELTA_BASE}
                        THEN 1 ELSE 0 END) AS n1,
                    SUM(CASE WHEN c.vec_id >= {_PQR_DELTA_BASE}
                        THEN 1 ELSE 0 END) AS n2
             FROM codes0 c GROUP BY c.sub, c.code),
    tv AS (SELECT h.sub,
                  CAST(SUM(ABS(h.n1 * ns.n2t - h.n2 * ns.n1t))
                       * 1000000 // (2 * ns.n1t * ns.n2t) AS BIGINT)
                    AS tv_ppm
           FROM hist h CROSS JOIN ns GROUP BY h.sub, ns.n1t, ns.n2t)
"""


@register(
    "scale_pq_drift_detect",
    oracle=f"""
    WITH {_PQR_COMMON_SQL}
    SELECT sub, tv_ppm,
           tv_ppm >= {_PQR_DRIFT_FLOOR_PPM} AS drifted
    FROM tv ORDER BY sub
    """,
    tags=["scale", "similarity", "pq", "drift", "eval", "versioned"],
)
def scale_pq_drift_detect(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Codebook drift DETECTION off the maintained index itself: the
    per-subspace total-variation distance (exact integer ppm) between
    the pre-drift corpus's code histogram and the drifted delta's,
    both read from the catalog-pinned post-drift index — no raw-vector
    scan, the 4-bit codes ARE the drift statistic.  The oracle
    re-trains the codebooks from scratch, re-encodes the full state,
    and recomputes the same histograms — so the VALUE of the drift
    statistic rides the hash, not just the flag (measured 600k–880k
    ppm at the gate SFs vs the 300k floor)."""
    from ..sinks import catalog as C

    cat, _B0, _B1, _audit_ok, n1t, n2t = _pqr_lifecycle(spark, sf_dir)
    idx = C.read_table(spark, cat, "pq_index", catalog_version=1)
    db = _PQR_DELTA_BASE
    hist = (idx.groupBy("sub", "code")
            .agg(F.sum(F.when(F.col("vec_id") < db, 1).otherwise(0))
                 .alias("n1"),
                 F.sum(F.when(F.col("vec_id") >= db, 1).otherwise(0))
                 .alias("n2")))
    tv = (hist.groupBy("sub")
          .agg(F.expr(f"CAST(sum(abs(n1 * {n2t}L - n2 * {n1t}L))"
                      f" * 1000000L DIV (2 * {n1t}L * {n2t}L)"
                      " AS LONG)").alias("tv_ppm")))
    return (tv.withColumn(
        "drifted", F.col("tv_ppm") >= F.lit(_PQR_DRIFT_FLOOR_PPM))
        .orderBy("sub"))


@register(
    "scale_pq_retrain_recall",
    oracle=f"""
    WITH {_PQR_COMMON_SQL},
    {_pqr_trainer_sql('eall', 'b1')},
    {_pqr_codes_sql('eall', 'b1bk', 'codes1')},
    quv AS (SELECT vec_id AS qid FROM ed
            WHERE vec_id IN {_PQR_QIDS}),
    qxu AS (SELECT q.qid, x.sub, x.xs FROM quv q
            JOIN eall_xu x ON x.vec_id = q.qid),
    exd AS MATERIALIZED (SELECT qx.qid, x.vec_id,
                   CAST(SUM({_pqr_d2_sql('x.xs', 'qx.xs')})
                        AS BIGINT) AS d2
            FROM eall_xu x JOIN qxu qx USING (sub)
            GROUP BY qx.qid, x.vec_id),
    bf AS (SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY d2, vec_id) AS rn FROM exd)
        WHERE rn <= {_PQR_K}),
    {_pqr_probe_sql('b0bk', 'codes0', 'p0')},
    {_pqr_probe_sql('b1bk', 'codes1', 'p1')},
    tvm AS (SELECT MAX(tv_ppm) AS tv_ppm_max FROM tv),
    tot AS (SELECT (SELECT SUM(n) FROM p0hits) AS tb,
                   (SELECT SUM(n) FROM p1hits) AS ta)
    SELECT h0.qid AS query_id,
           CAST(h0.n AS BIGINT) AS n_hits_before,
           CAST(h1.n AS BIGINT) AS n_hits_after,
           tvm.tv_ppm_max,
           tvm.tv_ppm_max >= {_PQR_DRIFT_FLOOR_PPM} AS drift_detected,
           tot.ta >= tot.tb AS recall_restored,
           TRUE AS audit_ok
    FROM p0hits h0 JOIN p1hits h1 USING (qid)
    CROSS JOIN tvm CROSS JOIN tot
    ORDER BY query_id
    """,
    tags=["scale", "similarity", "pq", "drift", "eval", "recall",
          "versioned", "catalog"],
)
def scale_pq_retrain_recall(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """The full DRIFT → RETRAIN → REPUBLISH lifecycle, measured:
    recall@20 (vs exact-integer brute force) for four drifted queries
    through the STALE index (codebooks frozen at build, maintained
    O(changes) over the drifted delta — read at its catalog pin) and
    through the RETRAINED one (trained on the post-drift corpus,
    re-encoded, WAP-published with the recall audit as the gate).  The
    oracle replays BOTH trainings relationally — sample rank, Gonzalez
    seeds, Lloyd means, encoding, integer-ADC probes — so every recall
    count, the drift statistic, and the restored verdict ride one
    value hash (measured: recall roughly +40% after retrain at the
    gate SFs; the stale books collapse the drifted region onto edge
    codewords)."""
    import math

    from pyspark.sql.window import Window

    from ..sinks import catalog as C
    from . import ann

    cat, B0, B1, audit_ok, n1t, n2t = _pqr_lifecycle(spark, sf_dir)
    idx_before = C.read_table(spark, cat, "pq_index", catalog_version=1)
    idx_after = C.read_table(spark, cat, "pq_index")
    base = C.read_table(spark, cat, "embeddings")
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in base.filter(
                 F.col("vec_id").isin(*_PQR_QIDS)).collect()}
    # ONE folded probe plan over a broadcast 4-row query frame (qid,
    # per-book integer ADC LUTs, µ-int query vector) instead of 8
    # independent probe-join-count sub-trees (round-12 verdict nit:
    # the loop inflated planning time on the suite's slowest query).
    # Identical semantics per query: candidates = k·expand smallest
    # exact-integer ADC sums (id tiebreak), exact-integer rerank, hits
    # counted against the exact top-k — all ranks per-qid windows.
    k_codes = len(B0[0])
    qf = F.broadcast(spark.createDataFrame(
        [(int(qid), ann.pq_lut_int(qvecs[qid], B0),
          ann.pq_lut_int(qvecs[qid], B1),
          [math.floor((float(x) + ann.PQ_INT_OFFSET) * 1_000_000.0)
           for x in qvecs[qid]])
         for qid in _PQR_QIDS],
        "qid long, lut0 array<long>, lut1 array<long>,"
        " qmu array<long>"))
    exd = (base.crossJoin(qf.select("qid", "qmu"))
           .select("qid", "vec_id",
                   F.aggregate(
                       F.zip_with(ann._mu_vec_expr(F.col("embedding")),
                                  F.col("qmu"),
                                  lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"),
                       lambda acc, v: acc + v).alias("d2")))
    wq = Window.partitionBy("qid").orderBy("d2", "vec_id")
    bf = (exd.withColumn("__rn", F.row_number().over(wq))
          .filter(F.col("__rn") <= _PQR_K).select("qid", "vec_id"))

    # Both index generations fused into ONE plan under a __side tag
    # (the §4 rebalance-contract treatment): the ADC shortlist
    # agg+rank, the exact-d2 rerank over `exd` and the brute-force
    # semi-join each evaluate once over the tagged union instead of
    # once per side.  Per-side semantics identical — every window
    # partitions by (__side, qid) with the same total-order tiebreaks,
    # and a vector's ADC sum only ever aggregates rows of its own side.
    idx_u = (idx_before.select("vec_id", "sub", "code")
             .withColumn("__side", F.lit(0))
             .unionByName(idx_after.select("vec_id", "sub", "code")
                          .withColumn("__side", F.lit(1))))
    cand = (idx_u.crossJoin(qf.select("qid", "lut0", "lut1"))
            .select("__side", "qid", "vec_id",
                    F.element_at(
                        F.when(F.col("__side") == 0, F.col("lut0"))
                        .otherwise(F.col("lut1")),
                        (F.col("sub") * k_codes + F.col("code") + 1)
                        .cast("int")).alias("__u"))
            .groupBy("__side", "qid", "vec_id")
            .agg(F.sum("__u").alias("adc_u"))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy("__side", "qid")
                .orderBy(F.asc("adc_u"), "vec_id")))
            .filter(F.col("__rn") <= _PQR_K * _PQR_EXPAND)
            .select("__side", "qid", "vec_id"))
    top = (exd.join(cand, ["qid", "vec_id"])
           .withColumn("__rn", F.row_number().over(
               Window.partitionBy("__side", "qid")
               .orderBy("d2", "vec_id")))
           .filter(F.col("__rn") <= _PQR_K)
           .select("__side", "qid", "vec_id"))
    counts = (top.join(bf, ["qid", "vec_id"], "left_semi")
              .groupBy("qid")
              .agg(F.sum(F.when(F.col("__side") == 0, 1)).alias("nb"),
                   F.sum(F.when(F.col("__side") == 1, 1)).alias("na")))
    out = (qf.select(F.col("qid").alias("query_id"))
           .join(counts.withColumnRenamed("qid", "query_id"),
                 "query_id", "left")
           .select("query_id",
                   F.coalesce("nb", F.lit(0)).cast("long")
                   .alias("n_hits_before"),
                   F.coalesce("na", F.lit(0)).cast("long")
                   .alias("n_hits_after")))
    db = _PQR_DELTA_BASE
    tvm = (idx_before.groupBy("sub", "code")
           .agg(F.sum(F.when(F.col("vec_id") < db, 1).otherwise(0))
                .alias("n1"),
                F.sum(F.when(F.col("vec_id") >= db, 1).otherwise(0))
                .alias("n2"))
           .groupBy("sub")
           .agg(F.expr(f"CAST(sum(abs(n1 * {n2t}L - n2 * {n1t}L))"
                       f" * 1000000L DIV (2 * {n1t}L * {n2t}L)"
                       " AS LONG)").alias("tv_ppm"))
           .agg(F.max("tv_ppm").alias("tv_ppm_max")))
    tot = out.agg(F.sum("n_hits_before").alias("tb"),
                  F.sum("n_hits_after").alias("ta"))
    return (out.crossJoin(F.broadcast(tvm))
            .crossJoin(F.broadcast(tot))
            .select("query_id", "n_hits_before", "n_hits_after",
                    "tv_ppm_max",
                    (F.col("tv_ppm_max")
                     >= F.lit(_PQR_DRIFT_FLOOR_PPM))
                    .alias("drift_detected"),
                    (F.col("ta") >= F.col("tb"))
                    .alias("recall_restored"),
                    F.lit(bool(audit_ok)).alias("audit_ok"))
            .orderBy("query_id"))


_PQR_LIFE: dict = {}


def _drop_pqr(keys=None) -> None:
    import shutil

    for k in list(_PQR_LIFE) if keys is None else list(keys):
        for d in _PQR_LIFE.pop(k)[0]:
            shutil.rmtree(d, ignore_errors=True)


def _pqr_book_df(spark: SparkSession, books, gen: int) -> DataFrame:
    rows = [(gen, s, c, list(map(int, cw)))
            for s, book in enumerate(books)
            for c, cw in enumerate(book)]
    return spark.createDataFrame(
        rows, "gen int, sub int, code int, cs array<long>")


@fixture_timed("pq_retrain_r12")
def _pqr_lifecycle(spark: SparkSession, sf_dir: str
                   ) -> tuple[str, list, list, bool, int, int]:
    """Once per (session, sf_dir): the drift lifecycle as three catalog
    transactions over (embeddings, pq_index, pq_codebook):

      v0  build    — books B0 trained on the initial corpus
                     (`ann.pq_train_int`, exact-integer), full encode,
                     codebook generation 0 committed as a TABLE.
      v1  drift    — the reflected delta appends to the base;
                     `refresh_pq_index_int` maintains the index
                     O(changes) under the FROZEN B0 (maintenance never
                     moves codewords — the round-11 verdict's gap is
                     that nothing ever retrained them).
      v2  retrain  — B1 trained on the post-drift corpus, full
                     re-encode STAGED as a new index version (invisible
                     through the catalog), recall AUDITED against the
                     stale books on the four drifted probe queries, and
                     only a passing audit publishes codebook gen 1 +
                     the re-encoded index together (write-audit-
                     publish).  A failed audit would leave readers on
                     v1 — stale but consistent.

    Returns (cat_dir-last-dirs..., B0, B1, audit_ok, n_pre, n_delta);
    probes pinned to catalog v1 keep resolving B0 codes — old readers
    never see codes under books they didn't pin."""
    import atexit
    import tempfile

    from ..sinks import catalog as C
    from ..sinks import versioned as V
    from . import ann

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PQR_LIFE.get(key)
    if got is not None:
        return got[1]
    _drop_pqr([k for k in _PQR_LIFE if k[0] != key[0]])
    if not _PQR_LIFE:
        atexit.register(_drop_pqr)
    from ..sinks import maintenance as M

    emb_dir = tempfile.mkdtemp(prefix="spark_graft_pqr_emb_")
    idx_dir = tempfile.mkdtemp(prefix="spark_graft_pqr_idx_")
    book_dir = tempfile.mkdtemp(prefix="spark_graft_pqr_book_")
    bl_dir = tempfile.mkdtemp(prefix="spark_graft_pqr_bl_")
    cat = tempfile.mkdtemp(prefix="spark_graft_pqr_cat_")
    (emb,) = _t(spark, sf_dir, "embeddings")
    emb0 = emb.select("vec_id", "embedding")
    n1t = emb0.count()

    V.write_snapshot(emb0, emb_dir)
    B0 = ann.pq_train_int(
        ann.pq_sample_int(V.read_version(spark, emb_dir), _PQR_SAMPLE),
        **_PQR)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, B0)
    V.write_snapshot(_pqr_book_df(spark, B0, 0), book_dir,
                     mode="overwrite")
    # publish-time drift baseline: the fresh encode's code histogram,
    # committed beside codebook gen 0 (round-13: the operated-lifecycle
    # trigger measures drift against the books' own publish state)
    V.write_snapshot(
        M.code_baseline(V.read_version(spark, idx_dir), 0), bl_dir,
        mode="overwrite")
    tabs = {"embeddings": (emb_dir, None), "pq_index": (idx_dir, None),
            "pq_codebook": (book_dir, None),
            "pq_baseline": (bl_dir, None)}
    C.commit_txn(cat, tabs, txn_id="pqr-build")

    delta = emb0.select(
        (F.col("vec_id") + F.lit(_PQR_DELTA_BASE)).alias("vec_id"),
        _pqr_drift_expr(F.col("embedding")).alias("embedding"))
    n2t = delta.count()
    V.write_snapshot(delta, emb_dir)
    ann.refresh_pq_index_int(spark, idx_dir, emb_dir, B0)
    C.commit_txn(cat, tabs, txn_id="pqr-drift")

    full = V.read_version(spark, emb_dir)
    B1 = ann.pq_train_int(ann.pq_sample_int(full, _PQR_SAMPLE), **_PQR)
    # WRITE: stage the re-encode — a new index version the catalog
    # does not pin yet (readers still resolve the B0 index)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, B1)
    V.write_snapshot(_pqr_book_df(spark, B1, 1), book_dir,
                     mode="overwrite")
    V.write_snapshot(
        M.code_baseline(V.read_version(spark, idx_dir), 1), bl_dir,
        mode="overwrite")
    # AUDIT: measured recall on the drifted queries, staged vs stale
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in full.filter(
                 F.col("vec_id").isin(*_PQR_QIDS)).collect()}
    idx_stale = C.read_table(spark, cat, "pq_index")   # still v1 pins
    idx_staged = V.read_version(spark, idx_dir)

    def hits(idx_df, books, q) -> int:
        bf = ann.exact_topk_int(full, q, _PQR_K).select("vec_id")
        return (ann.probe_pq_topk_int(spark, idx_df, full, q, books,
                                      _PQR_K, _PQR_EXPAND)
                .join(bf, "vec_id", "left_semi").count())

    tb = sum(hits(idx_stale, B0, qvecs[qid]) for qid in _PQR_QIDS)
    ta = sum(hits(idx_staged, B1, qvecs[qid]) for qid in _PQR_QIDS)
    audit_ok = ta >= tb
    # PUBLISH only on a passing audit — the catalog pin IS the release
    if audit_ok:
        C.commit_txn(cat, tabs, txn_id="pqr-retrain")
    got = (cat, B0, B1, bool(audit_ok), int(n1t), int(n2t))
    _PQR_LIFE[key] = ((emb_dir, idx_dir, book_dir, bl_dir, cat), got)
    return got


# ---------------------------------------------------------------------------
# IVF-PQ multiprobe recall contract (round-11 verdict, Next round #5):
# the composed probe gets a cell-EXPANSION knob — visit the next-nearest
# cells beyond nprobe=1 in centroid-affinity order (the IVF analogue of
# the band family's Hamming multiprobe) — with the recall measured at
# both settings and the expanded read still manifest-pruned.
# ---------------------------------------------------------------------------

_IVFPQ_MP = dict(nprobe_single=1, nprobe_multi=4, shortlist=80, k=20)


def _ivfpq_mp_probe_sql(n_cells: int, p: str) -> str:
    """One IVFADC probe at ``n_cells`` visited cells over the shared
    q/qd/codes/lut CTEs — emits ``{p}top(vec_id, sim)``."""
    return f"""
    {p}probed AS (SELECT cell FROM (
        SELECT cell, ROW_NUMBER() OVER (ORDER BY dp DESC, cell) AS rn
        FROM qd) WHERE rn <= {n_cells}),
    {p}routed AS (SELECT vec_id FROM asg JOIN {p}probed USING (cell)),
    {p}adc AS (SELECT c.vec_id, SUM(l.u) AS adc_u
               FROM codes c JOIN {p}routed USING (vec_id)
               JOIN lut l ON c.sub = l.sub AND c.code = l.code
               GROUP BY c.vec_id),
    {p}cand AS (SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adc_u DESC, vec_id)
          AS rn FROM {p}adc)
        WHERE rn <= {_IVFPQ_MP['shortlist']}),
    {p}top AS (SELECT vec_id FROM (
        SELECT e.vec_id, ROW_NUMBER() OVER (ORDER BY
            ROUND(list_cosine_similarity(e.v, q.qv), 6) DESC,
            e.vec_id) AS rn
        FROM e JOIN {p}cand USING (vec_id) CROSS JOIN q)
        WHERE rn <= {_IVFPQ_MP['k']}),
    {p}hits AS (SELECT COUNT(*) AS n FROM {p}top t
                JOIN bf ON bf.vec_id = t.vec_id)"""


@register(
    "scale_ivfpq_recall_contract",
    oracle=f"""
    WITH {_ivf_cents_sql(_R10B_IVF['k_cells'], _R10B_IVF['dim'],
                         _R10B_IVF['seed'])},
    {_pq_books_sql(_PQ['m'], _PQ['k_codes'], _PQ['seed'])},
    {_ANN_FINAL_STATE_SQL},
    {_IVF_ASG_SQL},
    {_PQ_CODES_SQL.replace("d AS (SELECT e.vec_id",
                           "pqd AS (SELECT e.vec_id")
                  .replace("FROM d) WHERE", "FROM pqd) WHERE")},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qd AS (SELECT cents.cell,
                  list_sum(list_transform(range(1, 65),
                                          i -> qv[i] * c[i])) AS dp
           FROM cents CROSS JOIN q),
    lut AS (SELECT b.sub, b.code,
                   CAST(FLOOR(1000000 * list_sum(list_transform(
                        range(1, 9), i -> qv[b.sub * 8 + i] * c[i])))
                     AS BIGINT) AS u
            FROM books b CROSS JOIN q),
    bf AS (SELECT vec_id FROM (
        SELECT e.vec_id, ROW_NUMBER() OVER (ORDER BY
            ROUND(list_cosine_similarity(e.v, q.qv), 6) DESC,
            e.vec_id) AS rn
        FROM e CROSS JOIN q) WHERE rn <= {_IVFPQ_MP['k']}),
    {_ivfpq_mp_probe_sql(_IVFPQ_MP['nprobe_single'], 's1')},
    {_ivfpq_mp_probe_sql(_IVFPQ_MP['nprobe_multi'], 'mp')}
    SELECT CAST({_IVFPQ_MP['k']} AS BIGINT) AS n_exact,
           CAST(s1hits.n AS BIGINT) AS n_hits_single,
           CAST(mphits.n AS BIGINT) AS n_hits_multi,
           CAST(s1hits.n * 1000000 // {_IVFPQ_MP['k']} AS BIGINT)
             AS recall_single_ppm,
           CAST(mphits.n * 1000000 // {_IVFPQ_MP['k']} AS BIGINT)
             AS recall_multi_ppm,
           mphits.n >= s1hits.n AS multiprobe_monotone,
           TRUE AS expand_io_pruned
    FROM s1hits CROSS JOIN mphits
    """,
    tags=["scale", "similarity", "ivf", "pq", "eval", "recall",
          "versioned", "partitioning"],
)
def scale_ivfpq_recall_contract(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """IVF-PQ MULTIPROBE with the measured recall contract — the
    expansion knob the composed probe lacked (round-11 verdict #5):
    cells are visited in descending centroid-affinity order, so
    nprobe=1 is the fastest probe and nprobe=4 the multiprobe
    expansion; both recalls@20 vs brute force ride the value hash as
    exact-ppm integers, the Spark side computes the monotone flag the
    oracle expects TRUE (expansion must not lose recall — measured:
    strict gain at the gate SFs), and every probed cell is read from
    the identity(cell)-partitioned SERVING table with a manifest
    predicate — expand_io_pruned carries the inputFiles strict-subset
    proof that even the expanded probe reads nprobe/k_cells of the
    code table, never a full scan."""
    from ..operators import similarity
    from ..sinks import versioned as V
    from . import ann
    from .queries_round10b import _ivf_indexed_emb
    from .queries_round11 import _PQ, _ivfpq_serving_table

    emb_dir, _, _ = _ivf_indexed_emb(spark, sf_dir)
    serving, _ = _ivfpq_serving_table(spark, sf_dir)
    base = V.read_version(spark, emb_dir)
    query = list(base.filter(F.col("vec_id") == 1)
                 .select("embedding").first()["embedding"])
    cents = ann.ivf_centroids(64, _R10B_IVF["k_cells"],
                              _R10B_IVF["seed"])
    lut = ann.pq_lut_micros(
        query, ann.pq_codebooks(64, _PQ["m"], _PQ["k_codes"],
                                _PQ["seed"]))
    # one parsed expr, not m·k_codes lit().cast() py4j chains — measured
    # 2.9–4.9 s of pure driver time in this query (guide §5.4)
    lut_lit = F.expr(
        "array(" + ",".join(f"{int(u)}L" for u in lut) + ")")
    manifest_n = len(V._read_manifest(serving,
                                      V.latest_version(serving)))
    bf = similarity.topk_bruteforce(base, query,
                                    k=_IVFPQ_MP["k"]).select("vec_id")

    # Single- and multiprobe sides fused into one plan: the nprobe=1
    # cell set is a PREFIX of the nprobe=4 affinity order
    # (`probe_cells` slices one sorted list) and a vector's code rows
    # live in exactly ONE cell, so its ADC sum over the multiprobe
    # candidates equals its single-probe sum — the single shortlist is
    # the shared ADC aggregate filtered to prefix-cell vectors.  One
    # serving read per probed cell (was per cell per side), one ADC
    # aggregate, one cosine rerank pass over base, one brute-force
    # semi-join; the per-side top-k becomes a (__side)-partitioned
    # rank with the identical (desc sim, vec_id) total order.
    from pyspark.sql.window import Window

    cells_m = ann.probe_cells(query, cents, _IVFPQ_MP["nprobe_multi"])
    cells_1 = set(ann.probe_cells(query, cents,
                                  _IVFPQ_MP["nprobe_single"]))
    cand, files_1, files_m = None, set(), set()
    for c in cells_m:
        part = (V.read_version(spark, serving,
                               predicates=[("cell", "=", c)])
                .select("vec_id", "sub", "code")
                .withColumn("__in1", F.lit(c in cells_1)))
        files_m.update(part.inputFiles())
        if c in cells_1:
            files_1.update(part.inputFiles())
        cand = part if cand is None else cand.unionByName(part)
    adc = (cand.select(
        "vec_id", "__in1",
        F.element_at(lut_lit,
                     (F.col("sub") * _PQ["k_codes"]
                      + F.col("code") + 1).cast("int"))
        .alias("__u"))
        .groupBy("vec_id").agg(F.sum("__u").alias("adc_u"),
                               F.max("__in1").alias("__in1")))
    sl_1 = (adc.filter(F.col("__in1"))
            .orderBy(F.desc("adc_u"), "vec_id")
            .limit(_IVFPQ_MP["shortlist"])
            .select("vec_id").withColumn("__side", F.lit(0)))
    sl_m = (adc.orderBy(F.desc("adc_u"), "vec_id")
            .limit(_IVFPQ_MP["shortlist"])
            .select("vec_id").withColumn("__side", F.lit(1)))
    top = (base.join(F.broadcast(sl_1.unionByName(sl_m)), "vec_id")
           .select("__side", "vec_id",
                   F.round(similarity.cosine_q(query)
                           (F.col("embedding")), 6).alias("sim"))
           .withColumn("__rn", F.row_number().over(
               Window.partitionBy("__side")
               .orderBy(F.desc("sim"), "vec_id")))
           .filter(F.col("__rn") <= _IVFPQ_MP["k"])
           .select("__side", "vec_id"))
    hits = (top.join(bf, "vec_id", "left_semi")
            .groupBy()
            .agg(F.coalesce(F.sum(F.when(F.col("__side") == 0, 1)),
                            F.lit(0)).alias("n1"),
                 F.coalesce(F.sum(F.when(F.col("__side") == 1, 1)),
                            F.lit(0)).alias("nm")))
    io1 = 0 < len(files_1) < manifest_n
    iom = 0 < len(files_m) < manifest_n
    k = _IVFPQ_MP["k"]
    return (hits
            .select(F.lit(k).cast("long").alias("n_exact"),
                    F.col("n1").cast("long").alias("n_hits_single"),
                    F.col("nm").cast("long").alias("n_hits_multi"),
                    F.expr(f"CAST(n1 * 1000000L DIV {k} AS LONG)")
                    .alias("recall_single_ppm"),
                    F.expr(f"CAST(nm * 1000000L DIV {k} AS LONG)")
                    .alias("recall_multi_ppm"),
                    (F.col("nm") >= F.col("n1"))
                    .alias("multiprobe_monotone"),
                    F.lit(bool(io1 and iom))
                    .alias("expand_io_pruned")))


# ---------------------------------------------------------------------------
# perceptual image dedup over BASELINE JPEG (round-11 verdict, Next
# round #4): the pure stdlib decoder set gains a real baseline-JPEG
# luma decoder (`multimodal._jpeg_gray_rows` — Huffman + dequant +
# IDCT), so image dedup covers the dominant web format with PIL absent.
# Fixture images are block-constant planes (DC-only blocks, q=8), for
# which decode(encode(px)) is EXACT integer arithmetic — the oracle
# inlines the pixel formula, as the PNG twin does.
# ---------------------------------------------------------------------------

def _mk_gray_jpeg(pixels: list[list[int]]) -> bytes:
    """Minimal baseline-JPEG grayscale ENCODER (stdlib struct only):
    one component, 1×1 sampling, flat quant table q=8, canonical
    Huffman tables written into the stream (standard-style DC
    category table; a one-entry AC table — every fixture block is
    DC-only so the only AC symbol is EOB).  For block-constant planes
    the quantized DC is exactly v−128 (S(0,0)=8·(v−128), q=8), so the
    pure decoder round-trips the pixels exactly."""
    import struct

    h, w = len(pixels), len(pixels[0])
    if h % 8 or w % 8:
        raise ValueError("fixture encoder: dimensions must be 8-aligned")

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
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([8] * 64)
    out += (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(dc_vals))
            + bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += (b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals))
            + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += (b"\xff\xda" + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, 0, 63, 0]))
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

    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            dcv = pixels[by * 8][bx * 8] - 128        # quantized S(0,0)
            diff = dcv - pred
            pred = dcv
            t = abs(diff).bit_length()
            emit(*dc[t])
            if t:
                emit(t, (diff if diff > 0
                         else diff + (1 << t) - 1) & ((1 << t) - 1))
            emit(*ac[0x00])                           # EOB
    if state[1]:
        pad = 8 - state[1]
        emit(pad, (1 << pad) - 1)                     # 1-pad final byte
    out += payload + b"\xff\xd9"
    return bytes(out)


def _jpeg_pixels(i: int) -> list[list[int]]:
    """Image ``i``'s 32×32 plane, CONSTANT per 8×8 JPEG block (the
    DC-only class the decoder reconstructs exactly; range 0–199 with
    +5 plant headroom): quadratic block textures; image 30 is image 3
    shifted +5 everywhere — the planted brightness-invariant pair."""
    if i == 30:
        return [[v + 5 for v in row] for row in _jpeg_pixels(3)]
    return [[(((x // 8) ** 2) * (i % 7 + 1) + ((y // 8) ** 2) * (i % 5 + 2)
              + (x // 8) * (y // 8) * (i % 3 + 1) + i * 37) % 200
             for x in range(32)] for y in range(32)]


def _jpeg_assets(spark: SparkSession):
    from ..operators import multimodal as mm

    rows = [(i, "image", bytearray(_mk_gray_jpeg(_jpeg_pixels(i))),
             "image/jpeg") for i in range(31)]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


_JPEG_PX_SQL = """
    imgs AS (SELECT UNNEST(range(0, 31)) AS i),
    px AS (SELECT i, y, x,
             CASE WHEN i = 30
                  THEN ((x//8)*(x//8)*4 + (y//8)*(y//8)*5
                        + (x//8)*(y//8)*1 + 3*37) % 200 + 5
                  ELSE ((x//8)*(x//8)*((i%7)+1) + (y//8)*(y//8)*((i%5)+2)
                        + (x//8)*(y//8)*((i%3)+1) + i*37) % 200 END AS p
           FROM imgs CROSS JOIN range(0, 32) AS ty(y)
                     CROSS JOIN range(0, 32) AS tx(x)),
    blocks AS (SELECT i, y // 4 AS by, x // 4 AS bx,
                      CAST(SUM(p) AS BIGINT) AS s
               FROM px GROUP BY 1, 2, 3),
    tot AS (SELECT i, CAST(SUM(p) AS BIGINT) AS t FROM px GROUP BY 1)
"""


@register(
    "dedup_image_phash_jpeg",
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
def dedup_image_phash_jpeg(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL baseline JPEGs — encoded by the
    fixture encoder, then pixel-decoded by the pure stdlib JPEG path
    (`multimodal._jpeg_gray_rows`: stream-defined Huffman tables,
    byte unstuffing, DC predict + EXTEND, dequant, exact DC-only
    reconstruction), hashed to 64-bit aHashes, banded, and verified at
    Hamming ≤ 6 — the identical lane as `dedup_image_phash` with the
    dominant web format in place of PNG, green with PIL absent.  The
    planted brightness-shifted copy (image 30 ≡ 3 + 5) must surface at
    Hamming 0 (cross-multiplied block/total comparison is shift-
    invariant).  Scale: same 16-byte-per-image code relation; the
    JPEG bytes never shuffle."""
    from ..operators import multimodal as mm

    codes = mm.phash_codes(_jpeg_assets(spark, ), kind="ahash")
    return (mm.image_near_dup_pairs(codes, max_hamming=6, id_col="asset_id")
            .select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"),
                    F.col("hamming").cast("int").alias("hamming"))
            .orderBy("a", "b"))


@register(
    "mm_image_jpeg_dhash_codes",
    oracle=f"""
    WITH {_JPEG_PX_SQL},
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
    tags=["multimodal", "image", "phash", "jpeg", "profile"],
)
def mm_image_jpeg_dhash_codes(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The dHash (horizontal-gradient) code table over the 31 decoded
    baseline JPEGs — `mm_image_dhash_codes`' twin through the pure
    JPEG pixel path: every gradient bit recomputed by the oracle from
    the block-constant generating arithmetic, so the Huffman decode,
    DC-prediction chain, and exact DC-only reconstruction all ride the
    hash (any mis-decoded block flips a gradient somewhere)."""
    from ..operators import multimodal as mm

    return (mm.phash_codes(_jpeg_assets(spark), kind="dhash")
            .orderBy("asset_id"))


# ---------------------------------------------------------------------------
# IVF centroid drift lifecycle — the routing half of the round-11 #2
# item (PQ codebooks above are the memory half): under drift the IVF
# story is about CELL BALANCE, not recall — stale centroids funnel the
# whole drifted cluster into one edge cell, so a probe that routes
# there reads half the corpus (the O(n/k) probe-I/O contract silently
# becomes O(n)).  Retraining restores balance and shrinks the probe.
# Same integer-exact trainer, m=1 over whole vectors = centroids.
# ---------------------------------------------------------------------------

_IVFR = dict(k_cells=8, iters=2, nprobe=2, k=20, dim=64)


def _ivfr_probe_sql(cells: str, asg: str, p: str) -> str:
    return f"""
    {p}cells AS (SELECT code AS cell FROM (
        SELECT b.code, ROW_NUMBER() OVER (ORDER BY
               {_pqr_d2_sql('qf.xs', 'b.cs', _IVFR['dim'])}, b.code)
          AS rn
        FROM {cells} b CROSS JOIN qfx qf) WHERE rn <= {_IVFR['nprobe']}),
    {p}routed AS (SELECT a.vec_id FROM {asg} a
                  JOIN {p}cells c ON a.code = c.cell),
    {p}top AS (SELECT vec_id FROM (
        SELECT e.vec_id, ROW_NUMBER() OVER (ORDER BY e.d2, e.vec_id)
          AS rn
        FROM exdf e JOIN {p}routed r ON r.vec_id = e.vec_id)
        WHERE rn <= {_IVFR['k']}),
    {p}stats AS (SELECT
        (SELECT COUNT(*) FROM {p}routed) AS n_routed,
        (SELECT COUNT(*) FROM {p}top t JOIN bff b
          ON b.vec_id = t.vec_id) AS n_hits)"""


@register(
    "scale_ivf_rebalance_contract",
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
            WHERE x.vec_id = 1000001),
    exdf AS MATERIALIZED (
        SELECT x.vec_id,
               {_pqr_d2_sql('x.xs', 'qf.xs', _IVFR['dim'])} AS d2
        FROM eall_xuf x CROSS JOIN qfx qf),
    bff AS (SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS rn
        FROM exdf) WHERE rn <= {_IVFR['k']}),
    {_ivfr_probe_sql('c0bk', 'asg0', 'r0')},
    {_ivfr_probe_sql('c1bk', 'asg1', 'r1')}
    SELECT occ0.share AS max_share_before_ppm,
           occ1.share AS max_share_after_ppm,
           CAST(r0.n_routed * 1000000 // nall.n AS BIGINT)
             AS routed_share_before_ppm,
           CAST(r1.n_routed * 1000000 // nall.n AS BIGINT)
             AS routed_share_after_ppm,
           CAST(r0.n_hits AS BIGINT) AS n_hits_before,
           CAST(r1.n_hits AS BIGINT) AS n_hits_after,
           occ1.share < occ0.share AS rebalance_ok,
           r1.n_routed < r0.n_routed AS probe_io_shrinks,
           r1.n_hits * 10 >= {_IVFR['k']} * 6 AS recall_floor_ok
    FROM occ0 CROSS JOIN occ1 CROSS JOIN nall
    CROSS JOIN r0stats r0 CROSS JOIN r1stats r1
    """,
    tags=["scale", "similarity", "ivf", "drift", "eval", "recall"],
)
def scale_ivf_rebalance_contract(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """IVF centroid drift REBALANCE contract — the routing half of the
    drift lifecycle: under the planted reflected-cluster drift, stale
    centroids (trained on the pre-drift corpus, integer-exact m=1
    trainer) funnel the whole delta into edge cells — the max cell
    share and the 2-cell probe's routed share balloon, which is the
    real failure mode of frozen IVF routing (the probe's O(n/k) I/O
    contract breaks, not its recall: everything lands in ONE cell, so
    the probe finds it by reading half the corpus).  Retraining on the
    post-drift corpus restores balance: max share and routed share
    shrink (rebalance_ok, probe_io_shrinks) while recall@20 for the
    drifted query holds the 60% floor — every share and hit count an
    exact integer both engines derive from scratch, trainings
    included."""
    import math

    from ..sinks import catalog as C
    from . import ann

    cat, _B0, _B1, _audit_ok, _n1, _n2 = _pqr_lifecycle(spark, sf_dir)
    pre = C.read_table(spark, cat, "embeddings", catalog_version=0)
    full = C.read_table(spark, cat, "embeddings")
    geo = dict(m=1, k_codes=_IVFR["k_cells"], iters=_IVFR["iters"])
    C0 = ann.pq_train_int(ann.pq_sample_int(pre, _PQR_SAMPLE), **geo)
    C1 = ann.pq_train_int(ann.pq_sample_int(full, _PQR_SAMPLE), **geo)
    q = [float(x) for x in full.filter(
        F.col("vec_id") == _PQR_QIDS[0]).first()["embedding"]]
    qmu = [math.floor((x + ann.PQ_INT_OFFSET) * 1_000_000.0)
           for x in q]
    # ONE pass over the corpus computes every per-row quantity both
    # sides need — the cell assignment under EACH centroid generation
    # and the exact µ²-distance to the probe — persisted as a 4-column
    # frame (released by the harness after the action).  The previous
    # shape re-derived them per consumer: 2 encodes + 1 brute-force +
    # 1 routed-distance pass PER SIDE ≈ 8 full-table expression passes
    # for one 1-row answer (guide §2.4: remove recomputed subtrees;
    # §2.3: every downstream agg now reads 4 narrow columns, never the
    # 64-float embedding).  The pass itself is Arrow-batched NumPy
    # (guide §4.2 — the HOF expression form evaluates interpreted, see
    # `ann.ivf_assign_d2_rows`).  Values unchanged: identical int64
    # arithmetic, same (d2, vec_id) orderings, same share integers.
    per_row = ann.ivf_assign_d2_rows(full, [C0, C1], q).persist()
    n_all = per_row.count()
    bf = (per_row.orderBy("d2", "vec_id").limit(_IVFR["k"])
          .select("vec_id"))

    def side(books, code_col: str) -> DataFrame:
        """(max_share, routed_share, n_hits) one-row frame for one
        centroid generation."""
        asg = per_row.select("vec_id", F.col(code_col).alias("code"),
                             "d2")
        occ = (asg.groupBy("code").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.expr(f"CAST(max(c) * 1000000L DIV {n_all}L"
                           " AS LONG)").alias("max_share")))
        cents = books[0]
        cells = sorted(range(len(cents)),
                       key=lambda c: (ann._d2(qmu, cents[c]), c)
                       )[:_IVFR["nprobe"]]
        routed = asg.filter(F.col("code").isin(cells))
        nr = routed.agg(
            F.count(F.lit(1)).alias("n_routed"),
            F.expr(f"CAST(count(1) * 1000000L DIV {n_all}L AS LONG)")
            .alias("routed_share"))
        top = (routed.select("vec_id", "d2")
               .orderBy("d2", "vec_id").limit(_IVFR["k"]))
        hits = (top.join(bf, "vec_id", "left_semi")
                .agg(F.count(F.lit(1)).alias("n_hits")))
        return occ.crossJoin(nr).crossJoin(hits)

    s0 = side(C0, "code0").select(F.col("max_share").alias("ms0"),
                                  F.col("routed_share").alias("rs0"),
                                  F.col("n_routed").alias("nr0"),
                                  F.col("n_hits").alias("nh0"))
    s1 = side(C1, "code1").select(F.col("max_share").alias("ms1"),
                                  F.col("routed_share").alias("rs1"),
                                  F.col("n_routed").alias("nr1"),
                                  F.col("n_hits").alias("nh1"))
    return (s0.crossJoin(s1)
            .select(F.col("ms0").alias("max_share_before_ppm"),
                    F.col("ms1").alias("max_share_after_ppm"),
                    F.col("rs0").alias("routed_share_before_ppm"),
                    F.col("rs1").alias("routed_share_after_ppm"),
                    F.col("nh0").cast("long").alias("n_hits_before"),
                    F.col("nh1").cast("long").alias("n_hits_after"),
                    (F.col("ms1") < F.col("ms0")).alias("rebalance_ok"),
                    (F.col("nr1") < F.col("nr0"))
                    .alias("probe_io_shrinks"),
                    (F.col("nh1") * 10 >= F.lit(_IVFR["k"] * 6))
                    .alias("recall_floor_ok")))

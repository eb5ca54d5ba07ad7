"""End-to-end corpus → training-shards pipeline: quality/dup cleaning →
leakage-safe split → token-budget shard packing → versioned-table commit
with clustered layout and data-skipping reads.

This is the composed "documents in, training shards out" story the
individual operators exist for; the test pins the contracts BETWEEN the
stages (survivor sets, cluster-atomic splits, shard budget math, and
snapshot read-back identity) rather than re-testing each operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from databox_adls_loader_spark.operators.corpus import (
    clean_corpus, leakage_safe_split)
from databox_adls_loader_spark.operators.dedup import ngram_jaccard_pairs
from databox_adls_loader_spark.operators.mixing import pack_token_shards
from databox_adls_loader_spark.sinks import versioned as V


def _mk_corpus(spark):
    rows = []
    for i in range(20):                      # 20 distinct decent docs
        rows.append((i, " ".join(f"tok{i}w{j}" for j in range(30))))
    rows.append((20, rows[0][1]))            # exact dup of doc 0
    near = rows[1][1].split()
    near[0], near[1] = "edited", "words"     # near-dup of doc 1
    rows.append((21, " ".join(near)))
    rows.append((22, "too short"))           # low quality
    rows.append((23, None))                  # null text
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_corpus_to_training_shards_end_to_end(spark, tmp_path):
    docs = _mk_corpus(spark)

    # stage 1: clean — drop low-quality + exact dups, KEEP near-dups
    # (threshold 0.95) so the split stage has leakage to guard against
    verdicts = {r["doc_id"]: r["verdict"]
                for r in clean_corpus(docs, min_tokens=10,
                                      jaccard_threshold=0.95).collect()}
    assert verdicts[20] == "exact_dup"
    assert verdicts[22] == "low_quality" and verdicts[23] == "low_quality"
    assert verdicts[21] == "kept" and verdicts[1] == "kept"
    kept_ids = {i for i, v in verdicts.items() if v == "kept"}
    kept = docs.filter(F.col("doc_id").isin(*kept_ids))

    # stage 2: leakage-safe split — the (1, 21) near-dup pair must land
    # in ONE split, whatever that split is
    pairs = ngram_jaccard_pairs(kept, threshold=0.5)
    assert {(r["a"], r["b"]) for r in pairs.collect()} == {(1, 21)}
    split = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(kept, pairs).collect()}
    assert split[1] == split[21]
    assert set(split) == kept_ids

    # stage 3: token-budget shards over the train split, global id order
    train_ids = sorted(i for i, s in split.items() if s == "train")
    train = docs.filter(F.col("doc_id").isin(*train_ids))
    shards = {r["doc_id"]: (r["n_tokens"], r["tok_before"], r["shard"])
              for r in pack_token_shards(train, budget_tokens=100).collect()}
    run = 0
    for i in train_ids:                      # replay the sequential fill
        n_tok, tok_before, shard = shards[i]
        assert tok_before == run and shard == run // 100
        run += n_tok

    # stage 4: commit as a versioned table clustered by shard; read-back
    # identity + shard-predicate data skipping
    t = str(tmp_path / "train_shards")
    out = (train.join(
        pack_token_shards(train, budget_tokens=100)
        .select("doc_id", "shard"), "doc_id"))
    V.write_snapshot(out, t)
    n_shards = out.select("shard").distinct().count()
    v = V.compact_snapshot(spark, t, n_files=max(n_shards, 2),
                           cluster_by=["shard"])
    got = V.read_version(spark, t, v)
    assert {tuple(r) for r in got.select("doc_id", "shard").collect()} == {
        (i, shards[i][2]) for i in train_ids}
    kept_files, total = V.prune_files(t, v, [("shard", "=", 0)])
    assert len(kept_files) < total           # clustered layout prunes
    one = V.read_version(spark, t, v, predicates=[("shard", "=", 0)])
    assert {r["doc_id"] for r in one.collect()} == {
        i for i in train_ids if shards[i][2] == 0}


def test_assemble_corpus_bench_predicate_over_doc_columns(spark):
    """The documented contract is 'bench is a boolean Column over docs'
    — a predicate referencing a NON-id doc column (here: text) must
    resolve, and id-derived predicates must give the same totals as
    before (the flag is evaluated over docs and joined through)."""
    from databox_adls_loader_spark.operators.corpus import assemble_corpus

    docs = _mk_corpus(spark)
    # text-derived benchmark predicate: previously AnalysisException
    # (evaluated over kept⋈cont, which carries no text column)
    out = assemble_corpus(docs, F.col("text").contains("tok3w0"),
                          min_tokens=10, val_pct=10, test_pct=10).collect()
    assert out                                 # resolves and runs
    # equivalence on an id-derived predicate: flag-join form must agree
    # with itself run twice (determinism) and exclude the bench doc
    a = {(r["split"], r["phase"]): (r["n_docs"], r["total_toks"])
         for r in assemble_corpus(docs, F.col("doc_id") % 11 == 0,
                                  min_tokens=10).collect()}
    b = {(r["split"], r["phase"]): (r["n_docs"], r["total_toks"])
         for r in assemble_corpus(docs, F.col("doc_id") % 11 == 0,
                                  min_tokens=10).collect()}
    assert a == b and a


def test_incremental_assemble_never_rewrites_committed_windows(
        spark, sf_dir, tmp_path):
    """The round-11 incremental lane's strongest invariant, asserted
    directly: after a delta round, every (g, id, piece) row committed
    BEFORE the round is byte-identical AFTER it (windows are appended
    or continued, never rewritten), the delta round reports
    noreread/inc green, the union equals a from-scratch assemble, and
    catalog time travel still serves the bootstrap state."""
    from databox_adls_loader_spark.operators.seqpack import pack_sequences
    from databox_adls_loader_spark.plans.queries_round11 import (
        incr_bootstrap, incr_delta_round)
    from databox_adls_loader_spark.sinks import catalog as C
    from databox_adls_loader_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    mx = docs.agg(F.max("doc_id")).first()[0]
    cut = mx * 7 // 10
    dirs = tuple(str(tmp_path / n)
                 for n in ("shards", "tail", "hash", "emb", "idx"))
    cat = str(tmp_path / "cat")
    did = F.col("doc_id")
    incr_bootstrap(spark, dirs, cat, docs.filter(did <= cut), emb)
    v_cat0 = C.catalog_latest(cat)
    before = {(r["g"], r["id"], r["piece"]):
              (r["piece_tokens"], r["win"], r["offset"])
              for r in C.read_table(spark, cat, "shards").collect()}
    nr, ic = incr_delta_round(spark, dirs, cat,
                              docs.filter(did > cut), emb,
                              txn_id="e2e-r1")
    assert nr and ic
    after_df = C.read_table(spark, cat, "shards")
    after = {(r["g"], r["id"], r["piece"]):
             (r["piece_tokens"], r["win"], r["offset"])
             for r in after_df.collect()}
    assert all(after[k] == v for k, v in before.items())
    assert len(after) > len(before)
    # union == from-scratch (the registry entry proves this vs DuckDB;
    # here the Spark-side replay pins it without an oracle)
    uniq = (docs.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens")))
    scratch = {(r["g"], r["id"], r["piece"]):
               (r["piece_tokens"], r["win"], r["offset"])
               for r in pack_sequences(uniq, 256, count_col="n_tokens",
                                       n_groups=8).collect()}
    assert after == scratch
    # time travel: the bootstrap universe is still served intact
    old = C.read_table(spark, cat, "shards", catalog_version=v_cat0)
    assert {(r["g"], r["id"], r["piece"]) for r in old.collect()} == \
        set(before)


def test_incremental_lane_survives_compaction_and_vacuum(
        spark, sf_dir, tmp_path):
    """Steady-state maintenance interplay: a nightly OPTIMIZE
    (`compact_small_files`) between delta rounds and a catalog-aware
    vacuum must not disturb the lane — the next delta still packs
    without reading committed windows, the final state still equals a
    from-scratch assemble, and catalog pins protect the versions time
    travel needs."""
    from databox_adls_loader_spark.operators.seqpack import pack_sequences
    from databox_adls_loader_spark.plans.queries_round11 import (
        incr_bootstrap, incr_delta_round)
    from databox_adls_loader_spark.sinks import catalog as C
    from databox_adls_loader_spark.sinks import versioned as V
    from databox_adls_loader_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    mx = docs.agg(F.max("doc_id")).first()[0]
    c1, c2 = mx * 6 // 10, mx * 8 // 10
    dirs = tuple(str(tmp_path / n)
                 for n in ("shards", "tail", "hash", "emb", "idx"))
    cat = str(tmp_path / "cat")
    did = F.col("doc_id")
    incr_bootstrap(spark, dirs, cat, docs.filter(did <= c1), emb)
    nr1, _ = incr_delta_round(spark, dirs, cat,
                              docs.filter((did > c1) & (did <= c2)),
                              emb, txn_id="m-r1")
    assert nr1
    # nightly OPTIMIZE on the shard table (direct-path commit — the
    # catalog shows drift until the next round's txn pins past it)
    pack_dir = dirs[0]
    v_compact = V.compact_small_files(spark, pack_dir,
                                      target_bytes=1 << 30, min_files=2)
    assert v_compact is not None
    drift = {s["name"]: s["drift"] for s in C.catalog_status(cat)}
    assert drift["shards"] == 1
    nr2, ic2 = incr_delta_round(spark, dirs, cat,
                                docs.filter(did > c2), emb,
                                txn_id="m-r2")
    assert nr2 and ic2
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))
    # final state identical to a from-scratch assemble of the union
    uniq = (docs.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens")))
    key = lambda df: sorted(  # noqa: E731
        (r["g"], r["id"], r["piece"], r["win"], r["offset"])
        for r in df.collect())
    assert key(C.read_table(spark, cat, "shards")) == \
        key(pack_sequences(uniq, 256, count_col="n_tokens", n_groups=8))
    # catalog-aware vacuum: pinned shard versions survive a keep=1 sweep
    pinned = C.pinned_versions(cat, "shards")
    C.vacuum_table(cat, "shards", keep_versions=1)
    assert pinned <= set(V.versions(pack_dir))
    v0_tables = C.catalog_tables(cat, 0)
    old = V.read_version(spark, v0_tables["shards"]["path"],
                         v0_tables["shards"]["version"])
    assert old.count() > 0


def test_incremental_round_crash_between_phases_converges(
        spark, sf_dir, tmp_path, monkeypatch):
    """Phase-1 landed, catalog commit didn't (simulated by a commit_txn
    that runs every op then dies): the rerun with the SAME txn_id +
    round_seq must skip the landed table writes via the round ledger,
    complete the catalog pin, and leave the lane exactly equal to a
    from-scratch assemble — no duplicated pieces, no double-rolled
    tail."""
    from databox_adls_loader_spark.operators.seqpack import pack_sequences
    from databox_adls_loader_spark.plans import queries_round11 as R11
    from databox_adls_loader_spark.sinks import catalog as C
    from databox_adls_loader_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    mx = docs.agg(F.max("doc_id")).first()[0]
    cut = mx * 7 // 10
    dirs = tuple(str(tmp_path / n)
                 for n in ("shards", "tail", "hash", "emb", "idx"))
    cat = str(tmp_path / "cat")
    did = F.col("doc_id")
    R11.incr_bootstrap(spark, dirs, cat, docs.filter(did <= cut), emb)

    real_commit = C.commit_txn

    def crash_after_phase1(cat_dir, ops, txn_id=None, **kw):
        for _name, (_d, op) in ops.items():
            if callable(op):
                op()
        raise RuntimeError("simulated crash between phases")

    monkeypatch.setattr(C, "commit_txn", crash_after_phase1)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        R11.incr_delta_round(spark, dirs, cat, docs.filter(did > cut),
                             emb, txn_id="crash-r1", round_seq=7)
    monkeypatch.setattr(C, "commit_txn", real_commit)
    # catalog still serves the bootstrap universe (drift, not damage)
    drift = {s["name"]: s["drift"] for s in C.catalog_status(cat)}
    assert drift["shards"] >= 1
    # rerun: landed writes skip, the pin completes
    nr, _ic = R11.incr_delta_round(spark, dirs, cat,
                                   docs.filter(did > cut), emb,
                                   txn_id="crash-r1", round_seq=7)
    assert nr
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))
    uniq = (docs.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens")))
    key = lambda df: sorted(  # noqa: E731
        (r["g"], r["id"], r["piece"], r["win"], r["offset"])
        for r in df.collect())
    assert key(C.read_table(spark, cat, "shards")) == \
        key(pack_sequences(uniq, 256, count_col="n_tokens", n_groups=8))


def test_crawl_stream_drives_the_lane_exactly_once(spark, sf_dir,
                                                   tmp_path):
    """A crawl STREAM (versioned-table source) drives the incremental
    lane through `incr_delta_stream_batch`: after the drain, the lane
    equals a from-scratch assemble of everything streamed, and a
    manual replay of a landed batch id is a complete no-op."""
    from databox_adls_loader_spark.operators.seqpack import pack_sequences
    from databox_adls_loader_spark.plans import queries_round11 as R11
    from databox_adls_loader_spark.sinks import catalog as C
    from databox_adls_loader_spark.sinks import versioned as V
    from databox_adls_loader_spark.session import load_tables
    from databox_adls_loader_spark.sources.vtable_stream import \
        register_vtable_stream

    register_vtable_stream(spark)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    mx = docs.agg(F.max("doc_id")).first()[0]
    c0, c1 = mx * 6 // 10, mx * 8 // 10
    dirs = tuple(str(tmp_path / n)
                 for n in ("shards", "tail", "hash", "emb", "idx"))
    cat = str(tmp_path / "cat")
    crawl = str(tmp_path / "crawl")
    ck = str(tmp_path / "ck")
    did = F.col("doc_id")
    R11.incr_bootstrap(spark, dirs, cat, docs.filter(did <= c0), emb)
    # two crawl commits land, then the stream drains them
    V.write_snapshot(docs.filter((did > c0) & (did <= c1)), crawl)
    V.write_snapshot(docs.filter(did > c1), crawl)

    def on_batch(df, bid):
        R11.incr_delta_stream_batch(df, bid, dirs, cat, emb)

    q = (spark.readStream.format("vtable_stream")
         .option("path", crawl).load().writeStream
         .foreachBatch(on_batch)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    uniq = (docs.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("(min(n_chars) + 3) div 4").cast("long")
                 .alias("n_tokens")))
    key = lambda df: sorted(  # noqa: E731
        (r["g"], r["id"], r["piece"], r["win"], r["offset"])
        for r in df.collect())
    expect = key(pack_sequences(uniq, 256, count_col="n_tokens",
                                n_groups=8))
    assert key(C.read_table(spark, cat, "shards")) == expect
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))
    v_cat = C.catalog_latest(cat)
    # replaying a landed batch id: catalog-level no-op, nothing moves
    replay = docs.filter(did > c0)
    R11.incr_delta_stream_batch(replay, 0, dirs, cat, emb)
    assert C.catalog_latest(cat) == v_cat
    assert key(C.read_table(spark, cat, "shards")) == expect

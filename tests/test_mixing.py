"""Tests for data-mixing operators (operators/mixing.py) and the exact
embedding centroid (operators/similarity.centroid_by_label)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import mixing
from databox_adls_loader_spark.operators.similarity import centroid_by_label
from databox_adls_loader_spark.operators.text import token_count
from databox_adls_loader_spark.session import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_stratified_sample_deterministic_and_subset(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rates = {"src0": 100, "src1": 0, "src2": 50}
    a = mixing.stratified_sample(docs, rates, default_pct=60)
    b = mixing.stratified_sample(docs, rates, default_pct=60)
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # pure function of the key — no rand()
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids_a <= all_ids
    per_src = {r["source"]: r["n"] for r in
               a.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert per_src.get("src0") == n_src0      # 100% keeps everything
    assert "src1" not in per_src              # 0% keeps nothing


def test_stratified_sample_repartition_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rates = {"src0": 40}
    base = mixing.stratified_sample(docs, rates, default_pct=30)
    shuffled = mixing.stratified_sample(
        docs.repartition(7, "source"), rates, default_pct=30)
    assert ({r["doc_id"] for r in base.select("doc_id").collect()} ==
            {r["doc_id"] for r in shuffled.select("doc_id").collect()})


def test_pack_token_shards_matches_naive_global_window(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    got = {r["doc_id"]: (r["tok_before"], r["shard"])
           for r in mixing.pack_token_shards(docs, 1000).collect()}
    # naive single-partition-window form (fine at test scale only)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        docs.select("doc_id", token_count("text").cast("long").alias("t"))
        .withColumn("before", F.coalesce(F.sum("t").over(w), F.lit(0)))
        .withColumn("shard", F.expr("before div 1000"))
    )
    want = {r["doc_id"]: (r["before"], r["shard"]) for r in naive.collect()}
    assert got == want


def test_pack_token_shards_budget_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           mixing.pack_token_shards(docs, 5).collect()}
    # prefix: 0, 3, 5, 9 → shards 0, 0, 1, 1
    assert [out[i]["shard"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert [out[i]["tok_before"] for i in (1, 2, 3, 4)] == [0, 3, 5, 9]


def test_domain_topk_quota_and_ordering(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "n_tokens", token_count("text").cast("long"))
    out = mixing.domain_topk(docs, 3, F.col("n_tokens")).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, rows in by_src.items():
        assert len(rows) == min(3, full[src])
        rows.sort(key=lambda r: r["rk"])
        toks = [r["n_tokens"] for r in rows]
        assert toks == sorted(toks, reverse=True)
    # scores within top-k dominate everything outside it
    kept = {(r["source"], r["doc_id"]) for r in out}
    for r in docs.collect():
        if (r["source"], r["doc_id"]) not in kept:
            worst_kept = min(x["n_tokens"] for x in by_src[r["source"]])
            assert r["n_tokens"] <= worst_kept


def test_centroid_by_label_matches_numpy(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    got = {(r["label"], r["pos"]): (r["sum_scaled"], r["n"])
           for r in centroid_by_label(emb).collect()}
    rows = emb.select("label", "embedding").collect()
    want: dict[tuple, list] = {}
    for r in rows:
        for pos, v in enumerate(r["embedding"]):
            key = (r["label"], pos)
            s = want.setdefault(key, [0, 0])
            s[0] += int(np.floor(float(v) * 1_000_000))
            s[1] += 1
    assert got == {k: (v[0], v[1]) for k, v in want.items()}


def test_curriculum_phases_quartiles_and_conservation(spark):
    from databox_adls_loader_spark.operators.mixing import curriculum_phases

    # token counts 1..8 — quartile boundaries 2.75 / 4.5 / 6.25, so the
    # phases are {1,2} {3,4} {5,6} {7,8}: 2 docs each
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i)) for i in range(1, 9)],
        "doc_id long, text string")
    got = {r["phase"]: r for r in curriculum_phases(docs).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    assert all(got[p]["n_docs"] == 2 for p in got)
    assert [got[p]["min_toks"] for p in (1, 2, 3, 4)] == [1, 3, 5, 7]
    assert [got[p]["max_toks"] for p in (1, 2, 3, 4)] == [2, 4, 6, 8]
    assert sum(got[p]["total_toks"] for p in got) == sum(range(1, 9))


def test_priority_sample_exact_key_and_determinism(spark):
    import hashlib

    from databox_adls_loader_spark.operators.mixing import priority_sample

    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 90) for i in range(50)],
        "doc_id long, w int")
    got = priority_sample(docs, weight_col="w", k=5).collect()
    assert len(got) == 5

    def key(i, w):
        u = int(hashlib.md5(f"{i}prio-v1".encode()).hexdigest()[:8], 16)
        return w * 4294967296 // (u + 1)

    want = sorted(((key(i, 10 + (i * 37) % 90), i)
                   for i in range(50)), key=lambda t: (-t[0], t[1]))[:5]
    assert [(r["priority"], r["doc_id"]) for r in got] == want
    again = priority_sample(docs, weight_col="w", k=5).collect()
    assert got == again


def test_budget_trim_by_stratum_greedy_semantics(spark):
    import hashlib

    from databox_adls_loader_spark.operators.mixing import (
        budget_trim_by_stratum)

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), " ".join(["w"] * (5 + i)))
         for i in range(12)],
        "doc_id long, source string, text string")
    got = {r["stratum"]: (r["n_kept"], r["kept_tokens"]) for r in
           budget_trim_by_stratum(docs, budget_tokens=20).collect()}

    def key(i, w):
        u = int(hashlib.md5(f"{i}prio-v1".encode()).hexdigest()[:8], 16)
        return w * 4294967296 // (u + 1)

    want = {}
    for s in ("s0", "s1"):
        rows = sorted(((key(i, 5 + i), i, 5 + i) for i in range(12)
                       if "s%d" % (i % 2) == s),
                      key=lambda t: (-t[0], t[1]))
        cum = n = tot = 0
        for _, _, w in rows:
            cum += w
            if cum <= 20:
                n, tot = n + 1, tot + w
        if n:
            want[s] = (n, tot)
    assert got == want

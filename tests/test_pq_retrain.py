"""PQ codebook drift lifecycle (`plans/queries_round12` + the
integer-exact trainer family in `plans/ann`): trainer determinism,
the rebuild-after-refresh ledger-collision regression, and the
write-audit-publish pinning contract (old catalog versions keep
serving the old codebook's index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databox_adls_loader_spark.plans import ann
from databox_adls_loader_spark.sinks import versioned as V


def _emb(spark, n=64, dim=8, shift=0.0):
    rows = [(i, [((i * 37 + j * 11) % 97) / 97.0 - 0.5 + shift
                 for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")


def test_pq_train_int_is_deterministic_and_integer(spark):
    emb = _emb(spark)
    s1 = ann.pq_sample_int(emb, 32)
    s2 = ann.pq_sample_int(emb, 32)
    assert s1 == s2
    b1 = ann.pq_train_int(s1, m=2, k_codes=4, iters=2)
    b2 = ann.pq_train_int(s2, m=2, k_codes=4, iters=2)
    assert b1 == b2
    assert all(isinstance(x, int) and x > 0
               for book in b1 for cw in book for x in cw)


def test_pq_codes_int_match_driver_math(spark):
    """pq_rows_int's codegen'd assignment equals the trainer's own
    pure-Python argmin on the identical µ-ints."""
    emb = _emb(spark, n=20)
    books = ann.pq_train_int(ann.pq_sample_int(emb, 16),
                             m=2, k_codes=3, iters=1)
    mu = {r["vec_id"]: list(r["mu"]) for r in emb.select(
        "vec_id", ann._mu_vec_expr(F.col("embedding")).alias("mu")
    ).collect()}
    got = {(r.vec_id, r.sub): r.code
           for r in ann.pq_rows_int(emb, books).collect()}
    sub = len(books[0][0])
    for vid, v in mu.items():
        for s, book in enumerate(books):
            piece = v[s * sub:(s + 1) * sub]
            want = min(range(len(book)),
                       key=lambda c: (ann._d2(piece, book[c]), c))
            assert got[(vid, s)] == want


def test_rebuild_after_refresh_is_not_silently_skipped(
        spark, tmp_path):
    """The round-12 ledger-collision regression: a refresh to base v1
    commits upsert id 3; a later REBUILD (retrained books, same base
    version) would also carry id 3 — the manifest ledger used to treat
    it as a replayed micro-batch and silently skip the overwrite,
    leaving readers on the stale codes."""
    emb_dir, idx_dir = str(tmp_path / "emb"), str(tmp_path / "idx")
    emb = _emb(spark, n=40)
    V.write_snapshot(emb, emb_dir)
    b0 = ann.pq_train_int(ann.pq_sample_int(emb, 24),
                          m=2, k_codes=4, iters=1)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, b0)
    V.write_snapshot(_emb(spark, n=40, shift=0.9)
                     .select((F.col("vec_id") + 100).alias("vec_id"),
                             "embedding"), emb_dir)
    ann.refresh_pq_index_int(spark, idx_dir, emb_dir, b0)
    full = V.read_version(spark, emb_dir)
    b1 = ann.pq_train_int(ann.pq_sample_int(full, 24),
                          m=2, k_codes=4, iters=1)
    ann.build_pq_index_int(spark, idx_dir, emb_dir, b1)
    got = {(r.vec_id, r.sub): r.code
           for r in V.read_version(spark, idx_dir).collect()}
    want = {(r.vec_id, r.sub): r.code
            for r in ann.pq_rows_int(full, b1).collect()}
    assert got == want


def test_wap_pins_old_probes_to_old_codebook(spark, sf_dir):
    """After the retrain publish, a reader pinned to catalog v1 still
    resolves the B0-encoded index AND codebook generation 0 — the
    'keep old probes pinned to their codebook version' half of the
    round-11 verdict item."""
    from databox_adls_loader_spark.plans import queries_round12 as R12
    from databox_adls_loader_spark.sinks import catalog as C

    cat, B0, B1, audit_ok, _n1, _n2 = R12._pqr_lifecycle(spark, sf_dir)
    assert audit_ok                     # the publish happened
    hist = C.catalog_history(cat)
    assert [h["txn_id"] for h in hist] == \
        ["pqr-build", "pqr-drift", "pqr-retrain"]
    gen_old = {r.gen for r in C.read_table(
        spark, cat, "pq_codebook", catalog_version=1).collect()}
    gen_new = {r.gen for r in C.read_table(
        spark, cat, "pq_codebook").collect()}
    assert gen_old == {0} and gen_new == {1}
    # the old pin's index is B0's encoding; the new pin's is B1's
    base_old = C.read_table(spark, cat, "embeddings",
                            catalog_version=1)
    idx_old = C.read_table(spark, cat, "pq_index", catalog_version=1)
    got = {(r.vec_id, r.sub): r.code for r in idx_old.collect()}
    want = {(r.vec_id, r.sub): r.code
            for r in ann.pq_rows_int(base_old, B0).collect()}
    assert got == want
    # books differ: the retrain genuinely moved codewords
    assert B0 != B1

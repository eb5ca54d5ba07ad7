"""Scale-curve probe: run headline queries at every available SF and
record wall time + input rows → SCALING.json.

The 100 TB argument is a claim about SLOPES, not absolute times: a plan
whose cost is linear in input (scan-shaped aggregates, bucketed joins,
banded LSH) shows a flat rows/sec across SFs, while an accidentally
quadratic or driver-bound plan shows rows/sec collapsing as SF grows.
This probe measures that directly over two decades of data size
(sf0.001 → sf0.1, 100×).  Host noise caveats from PERF.md apply — read
ratios, not absolute numbers.

The sf1 decade (10× the bench SF) is generated locally on demand
(tools/gen_sf1.py → /tmp/spark-graft-sf1: documents, orders,
embeddings) and
probed with the heaviest self-join/iterative shapes — the round-5
verdict's cheapest-possible super-linear-term detector.  It already
paid for itself: the sf1 run exposed the decimal `_perm_hash` CPU wall
and the lazily-persisted signature fan-out recompute in
`dedup_minhash_lsh` (both fixed round 6, ~4× on the query).

Usage: python tools/scaling_probe.py [query ...]   (default: headliners)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

# scan-heavy + shuffle-heavy + iterative + Python-path representatives
HEADLINERS = [
    "q1_pricing_summary",        # scan + wide agg
    "flagship_revenue_by_priority",  # join + agg
    "dedup_exact",               # canonical hash groupBy
    "dedup_minhash_lsh",         # banded LSH candidate join
    "dedup_simhash",             # pigeonhole block join
    "dedup_jaccard_prefix_filter",   # PPJoin prefix self-join
    "graph_pagerank_jaccard",    # iterative graph rounds
    "text_token_stats",          # map-side text stats
    "text_bpe_merges",           # iterative vocab loop
    "sim_topk_bruteforce",       # map-side score + TakeOrdered
    "e1_sessionization",         # user-keyed windows
    "prof_ks_drift_by_status",   # cogroup Arrow path
    "corpus_assemble_pipeline",  # composed clean→decontaminate→split→phase
    "retr_eval_bm25",            # BM25 rank + k-row metric windows
    "er_part_name_pairs",        # blocked bounded-levenshtein verify
    "mix_priority_sample",       # map-side rank key + TakeOrdered
    "sess8_dau_wau_stickiness",  # bounded-fanout explode + day-key aggs
    "sess7_timed_funnel",        # chained user-key joins, gap-bounded
    "scale_dv_delete_read",      # merge-on-read versioned read (DV anti join)
    "scale_token_index_read",    # inverted-file token skip read
    "mv_sql_route_monthly",      # SQL-parsed MV route (MV-sized re-agg)
    "scale_hidden_partition_read",  # transform-pruned partitioned read
    "scale_eq_delete_read",      # equality-delete read (value anti join)
    "scale_update_mor_read",     # MOR UPDATE read (DV + update append)
    "scale_cdf_incremental",     # manifest-derived CDF (round-8)
    "scale_eq_consolidated_read",  # 12 tombstone commits, 1 anti join
    "scale_bucket_join_read",    # bucket-aligned shuffle-free join
    "scale_cdc_mor_read",        # merge-on-read CDC feed (round-8)
    "scale_cdf_stream_read",     # streaming change feed drain (round-8)
    "scale_time_travel_read",    # TIMESTAMP AS OF read (round-8)
    "mv_cdf_maintenance",        # view maintained from change feed
    "scale_ann_index_incremental",  # persisted ANN index, O(changes) upkeep
    "scale_cdf_across_rename",   # incremental CDF through rename+drop
    "scale_cdf_across_widen",    # incremental CDF through a type widen
    "corpus_pack_epoch_order",   # epoch permutation + two-phase rank
    "corpus_assemble_to_shards", # dedup->pack->shards->index lane
    "scale_ivf_index_incremental",  # persisted IVF index, O(changes) upkeep
    "sim_topk_binary_hamming",   # 1-bit codes, xor+bit_count TakeOrdered
    "scale_catalog_txn_read",    # multi-table txn publish + catalog read
    "corpus_pack_window_layout", # per-window attention arrays
    "corpus_incremental_assemble",  # delta dedup->pack->index->txn lane
    "scale_pq_index_incremental",   # persisted PQ codes, O(changes) upkeep
    "ann_pq_probe_topk",         # integer-ADC probe + bounded rerank
    "scale_ivf_recall_contract",    # measured IVF recall through the index
    "scale_ivfpq_pruned_probe",  # cell-pruned ADC scan + bounded rerank
    "corpus_incremental_epoch_order",  # epoch permutation over incr shards
    "corpus_incremental_neardup_assemble",  # banded near-dup admission lane
    "scale_pq_retrain_recall",   # drift->retrain->republish, trained books
    "scale_ivf_rebalance_contract",  # centroid drift: cell balance + probe I/O
    "scale_ivfpq_recall_contract",   # multiprobe expansion recall contract
    "scale_neardup_admission_recall",  # tau contract: planted class verdicts
    "scale_ivf_retrain_publish",  # committed centroid WAP republish (r13)
    "scale_index_drift_trigger",  # live-vs-baseline TV trigger (r13)
    "corpus_incremental_image_neardup",  # image admission lane (fixed 32-img)
]

TABLE_OF = {  # denominator table per query (rows scanned ~ cost driver)
    "q1_pricing_summary": "lineitem",
    "flagship_revenue_by_priority": "lineitem",
    "dedup_exact": "documents",
    "dedup_minhash_lsh": "documents",
    "dedup_simhash": "documents",
    "dedup_jaccard_prefix_filter": "documents",
    "graph_pagerank_jaccard": "documents",
    "text_token_stats": "documents",
    "text_bpe_merges": "documents",
    "sim_topk_bruteforce": "embeddings",
    "e1_sessionization": "events",
    "prof_ks_drift_by_status": "orders",
    "corpus_assemble_pipeline": "documents",
    "retr_eval_bm25": "documents",
    "er_part_name_pairs": "part",
    "mix_priority_sample": "documents",
    "sess8_dau_wau_stickiness": "events",
    "sess7_timed_funnel": "events",
    "scale_dv_delete_read": "orders",
    "scale_token_index_read": "documents",
    "mv_sql_route_monthly": "orders",
    "scale_hidden_partition_read": "orders",
    "scale_eq_delete_read": "orders",
    "scale_update_mor_read": "orders",
    "scale_cdf_incremental": "orders",
    "scale_eq_consolidated_read": "orders",
    "scale_bucket_join_read": "orders",
    "scale_cdc_mor_read": "orders",
    "scale_cdf_stream_read": "orders",
    "scale_time_travel_read": "orders",
    "mv_cdf_maintenance": "orders",
    "scale_cdf_across_compaction": "orders",
    "scale_bucket_join_bigbig": "orders",
    "corpus_pack_efficiency": "documents",
    "scale_packed_windows_pruned_read": "documents",
    "ts_dow_anova_strength": "orders",
    "scale_ann_index_incremental": "embeddings",
    "corpus_assemble_to_shards": "documents",
    "corpus_pack_epoch_order": "documents",
    "scale_cdf_across_rename": "orders",
    "scale_cdf_across_widen": "orders",
    "ann_index_probe_topk": "embeddings",
    "scale_ivf_index_incremental": "embeddings",
    "sim_topk_binary_hamming": "embeddings",
    "scale_catalog_txn_read": "orders",
    "corpus_pack_window_layout": "documents",
    "corpus_catalog_publish": "documents",
    "corpus_incremental_assemble": "documents",
    "corpus_incremental_neardup_assemble": "documents",
    "scale_pq_retrain_recall": "embeddings",
    "scale_ivf_rebalance_contract": "embeddings",
    "scale_ivfpq_recall_contract": "embeddings",
    "scale_pq_drift_detect": "embeddings",
    "scale_pq_index_incremental": "embeddings",
    "ann_pq_probe_topk": "embeddings",
    "scale_ivf_recall_contract": "embeddings",
    "scale_ivfpq_pruned_probe": "embeddings",
    "corpus_incremental_epoch_order": "documents",
    "scale_neardup_admission_recall": "documents",
    "scale_ivf_retrain_publish": "embeddings",
    "scale_index_drift_trigger": "embeddings",
}

# the heavy shapes probed one decade PAST the bench SF, on the locally
# generated sf1 tables (documents + orders only — queries needing other
# tables stay on the driver-provided SFs)
SF1_QUERIES = [
    # round-10: incremental CDF through metadata-only ALTERs — the
    # windowed diff must stay O(changed files) one decade up too
    "scale_cdf_across_rename",
    "scale_cdf_across_widen",
    "dedup_jaccard_prefix_filter",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_bpe_merges",
    "graph_pagerank_jaccard",
    "prof_ks_drift_by_status",
    # linear-path representative one decade up; corpus_assemble stays at
    # the driver SFs — its near-dup stage is the RAW gram self-join
    # (clean_corpus documents the minhash swap at corpus scale), so an
    # sf1 run would measure the documented-known quadratic, not a bug
    "retr_eval_bm25",
    # lakehouse MOR overlays, measured not argued (round-7): DV anti
    # join over orders, token-index read over documents — both tables
    # exist at sf1
    "scale_dv_delete_read",
    "scale_token_index_read",
    # hidden partitioning (round-7): month x bucket transform-pruned
    # read over orders — partition count is calendar-bounded, so file
    # sizes, not file counts, grow with SF
    "scale_hidden_partition_read",
    # row-mutation MOR overlays (round-7): the equality-delete value
    # anti join and the UPDATE's DV+append read, both over orders —
    # delete/update state is FIXED-size (100/500 keys), so rows/s must
    # converge to the plain-read slope as SF grows
    "scale_eq_delete_read",
    "scale_update_mor_read",
    # round-8 MOR/CDF shapes: the incremental diff must stay
    # O(changed files) as the table grows, and the consolidated
    # tombstone read must hold the plain-read slope with 12 entries
    # outstanding.  (bucket join needs `customer`, absent at sf1.)
    "scale_cdf_incremental",
    "scale_eq_consolidated_read",
    # round-8 CDC/CDF loop: the MOR apply, the stream drain, the as-of
    # read, and the view maintenance must all hold their slope — none
    # of them may grow with table size beyond the final read
    "scale_cdc_mor_read",
    "scale_cdf_stream_read",
    "scale_time_travel_read",
    "mv_cdf_maintenance",
    # round-9: CDF across a nightly OPTIMIZE must stay O(changed +
    # compacted files); the big-big bucket join (orders x derived
    # receipts, both sf1-sized) must hold a linear slope with its
    # per-bucket exchanges; sequence packing is per-group linear
    "scale_cdf_across_compaction",
    "scale_bucket_join_bigbig",
    "corpus_pack_efficiency",
    "scale_packed_windows_pruned_read",
    # round-10 second wave: the catalog's atomic publish must stay
    # O(manifest) as the fact grows (the txn writes one small JSON
    # whatever the table size — the timed read is the fact scan), and
    # the per-window layout arrays are bounded by window capacity, so
    # their build is one keyed aggregate — linear
    "scale_catalog_txn_read",
    "corpus_pack_window_layout",
    # round-13 (verdict #4): the round-12 lifecycle lanes one decade up
    # — trainings stay sample-bounded (flat fixed-work profile) and the
    # near-dup from-scratch assemble stays linear; sf1 now carries
    # embeddings (gen_sf1) so the whole family runs
    "corpus_incremental_neardup_assemble",
    "scale_pq_retrain_recall",
    "scale_ivf_rebalance_contract",
    "scale_ivf_retrain_publish",
    "scale_index_drift_trigger",
]


def _custom_probes(spark, sf_dir):
    """Lakehouse shapes with no registry query at the right table size:
    the registry's rename/drop read runs over 25-row `nation`, so the
    metadata-only-evolution read cost is probed here over ORDERS; and
    the vtable STREAM drain (sources/vtable_stream) has no batch oracle
    at all — rows/s through the Arrow micro-batch path is measured
    directly.  Setup (snapshot commits) is untimed; each timed run gets
    a fresh checkpoint so the drain re-delivers everything."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from databox_adls_loader_spark.session import load_tables
    from databox_adls_loader_spark.sinks import versioned as V

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]

    def rename_setup():
        t = tempfile.mkdtemp(prefix="sgprobe_ren_")
        V.write_snapshot(orders, t)
        V.rename_column(t, "o_totalprice", "price")
        V.drop_column(t, "o_orderpriority")

        def run():
            (V.read_version(spark, t)
             .agg(F.sum(F.col("price").cast("decimal(18,2)"))).collect())
        return t, run

    def stream_setup():
        t = tempfile.mkdtemp(prefix="sgprobe_str_")
        for i in range(4):                  # 4 commits = 4 file batches
            V.write_snapshot(
                orders.filter(F.col("o_orderkey") % 4 == i), t)
        from databox_adls_loader_spark.sources.vtable_stream import \
            register_vtable_stream
        register_vtable_stream(spark)

        def run():
            ck = tempfile.mkdtemp(prefix="sgprobe_ck_")
            try:
                q = (spark.readStream.format("vtable_stream")
                     .option("path", t).load().writeStream
                     .foreachBatch(lambda df, bid: df.count())
                     .option("checkpointLocation", ck)
                     .trigger(availableNow=True).start())
                q.awaitTermination(600)
            finally:
                shutil.rmtree(ck, ignore_errors=True)
        return t, run

    def incr_round_setup():
        """ONE fixed-size (256-doc) delta round of the incremental
        corpus lane against a corpus that GROWS with SF — the direct
        O(delta) measurement: dedup-vs-hash-table + delta pack + shard
        append + index refresh + catalog txn, with the committed
        windows unread.  Two reserved slices: the warm run consumes the
        first, the timed run the second (a replayed slice would dedup
        away and time an empty pack)."""
        import tempfile as _tf

        from databox_adls_loader_spark.plans.queries_round11 import (
            incr_bootstrap, incr_delta_round)

        root = _tf.mkdtemp(prefix="sgprobe_incr_")
        dirs = tuple(os.path.join(root, n)
                     for n in ("shards", "tail", "hash", "emb", "idx"))
        cat = os.path.join(root, "cat")
        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
        mx = docs.agg(F.max("doc_id")).first()[0]
        cut = max(mx - 512, mx // 2)   # tiny-SF guard: keep scope non-empty
        incr_bootstrap(spark, dirs, cat,
                       docs.filter(F.col("doc_id") <= cut), emb)
        state = {"i": 0}
        slices = [(cut, cut + 256), (cut + 256, mx)]

        def run():
            lo, hi = slices[state["i"]]
            state["i"] += 1
            incr_delta_round(
                spark, dirs, cat,
                docs.filter((F.col("doc_id") > lo)
                            & (F.col("doc_id") <= hi)),
                emb, txn_id=f"probe-{lo}")
        return root, run

    def nd_round_setup():
        """ONE fixed-size (256-doc) delta round of the NEAR-DUP lane
        against a corpus that grows with SF — the round-12 O(delta)
        measurement: exact anti-join + banded MinHash candidates vs the
        PERSISTED sig/band tables + verified drops + delta pack + index
        refresh + one catalog txn.  Candidate generation is banded
        (batch band keys ⋈ persisted index), so a flat curve here is
        the proof near-dup admission didn't re-introduce the corpus
        rescan the lane exists to retire."""
        import tempfile as _tf

        from databox_adls_loader_spark.plans.queries_round12 import (
            nd_bootstrap, nd_delta_round)

        root = _tf.mkdtemp(prefix="sgprobe_nd_")
        dirs = tuple(os.path.join(root, n)
                     for n in ("shards", "tail", "hash", "sig",
                               "bandt", "emb", "idx"))
        cat = os.path.join(root, "cat")
        docs = load_tables(spark, sf_dir,
                           ["documents"])["documents"].select(
            "doc_id", "text", "n_chars")
        emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
        mx = docs.agg(F.max("doc_id")).first()[0]
        cut = max(mx - 512, mx // 2)   # tiny-SF guard: keep scope non-empty
        nd_bootstrap(spark, dirs, cat,
                     docs.filter(F.col("doc_id") <= cut), emb)
        state = {"i": 0}
        slices = [(cut, cut + 256), (cut + 256, mx)]

        def run():
            lo, hi = slices[state["i"]]
            state["i"] += 1
            nd_delta_round(
                spark, dirs, cat,
                docs.filter((F.col("doc_id") > lo)
                            & (F.col("doc_id") <= hi)),
                emb, txn_id=f"ndprobe-{lo}")
        return root, run

    def ndi_round_setup():
        """ONE fixed-size (64-image) delta round of the IMAGE near-dup
        lane against a persisted code/band corpus that grows with SF —
        the round-13 O(delta) measurement.  The corpus is seeded
        DIRECTLY as synthetic code rows (8·n_docs of them): the lane's
        scaling surface is the banded Hamming join of a fixed batch
        against the persisted band table plus the pixel-hash
        anti-join, not n JPEG decodes — the timed round decodes its
        OWN 64 real JPEGs and joins them against the grown corpus.  A
        flat curve here is the proof image admission didn't
        re-introduce a corpus rescan."""
        import tempfile as _tf

        from databox_adls_loader_spark.operators import multimodal as mm
        from databox_adls_loader_spark.plans.queries_round12 import \
            _mk_gray_jpeg
        from databox_adls_loader_spark.plans.queries_round13 import (
            _NDI_TABLES, _ndi_bands, ndi_delta_round)
        from databox_adls_loader_spark.sinks import catalog as Cat
        from databox_adls_loader_spark.sinks import versioned as V

        root = _tf.mkdtemp(prefix="sgprobe_ndi_")
        dirs = tuple(os.path.join(root, n)
                     for n in ("hash", "code", "band", "adm"))
        cat = os.path.join(root, "cat")
        n = 8 * load_tables(spark, sf_dir,
                            ["documents"])["documents"].count()
        base = spark.range(n).select(
            F.col("id").alias("asset_id"),
            F.expr("xxhash64(id, 7) & 4294967295").alias("w0"),
            F.expr("xxhash64(id, 13) & 4294967295").alias("w1"))
        V.write_snapshot(
            base.select(F.md5(F.concat(F.lit("synt"),
                                       F.col("asset_id").cast("string"))
                              ).alias("pixhash"), "asset_id"), dirs[0])
        V.write_snapshot(base, dirs[1])
        V.write_snapshot(_ndi_bands(base), dirs[2])
        V.write_snapshot(base.select("asset_id"), dirs[3])
        Cat.commit_txn(cat, dict(zip(_NDI_TABLES,
                                     ((d, None) for d in dirs))),
                       txn_id="probe-boot")

        def batch(lo: int):
            rows = [(n + lo + j, "image",
                     bytearray(_mk_gray_jpeg(
                         [[(((x // 8) ** 2) * ((lo + j) % 11 + 1)
                            + ((y // 8) ** 2) * ((lo + j) % 13 + 2)
                            + (lo + j) * 41) % 256
                           for x in range(32)] for y in range(32)])),
                     "image/jpeg") for j in range(64)]
            return spark.createDataFrame(rows, mm.ASSET_SCHEMA)

        batches = [batch(0), batch(64)]
        state = {"i": 0}

        def run():
            b = batches[state["i"]]
            state["i"] += 1
            ndi_delta_round(spark, dirs, cat, b,
                            txn_id=f"probe-ndi-{state['i']}")
        return root, run

    probes = {"vt_rename_drop_read_orders": ("orders", rename_setup),
              "vt_stream_drain_orders": ("orders", stream_setup),
              "ndi_image_delta_round": ("documents", ndi_round_setup)}
    # the incremental-assemble lanes need embeddings for their index —
    # absent at the locally generated sf1 (documents + orders only)
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        probes["incr_assemble_delta_round"] = ("documents",
                                               incr_round_setup)
        probes["nd_assemble_delta_round"] = ("documents",
                                             nd_round_setup)
    return probes


def main() -> None:
    from databox_adls_loader_spark import cache
    from databox_adls_loader_spark.plans.queries import all_queries
    from databox_adls_loader_spark.session import get_spark, load_tables

    from gen_sf1 import ensure_sf1

    names = sys.argv[1:] or HEADLINERS
    qs = all_queries()
    spark = get_spark("scaling-probe")
    out: dict[str, dict] = {}
    sf1_dir = ensure_sf1()
    for sf_dir in SF_DIRS + [sf1_dir]:
        is_sf1 = sf_dir == sf1_dir
        sf = "1" if is_sf1 else sf_dir.rsplit("sf", 1)[1]
        rows_of = {}
        for name in names:
            if is_sf1 and name not in SF1_QUERIES:
                continue
            table = TABLE_OF.get(name)
            if table and table not in rows_of:
                rows_of[table] = load_tables(
                    spark, sf_dir, [table])[table].count()
            qs[name](spark, sf_dir).collect()      # warm (plans, JIT, IO)
            t0 = time.monotonic()
            qs[name](spark, sf_dir).collect()
            dt = time.monotonic() - t0
            cache.release_cached(spark)
            n = rows_of.get(table, 0)
            out.setdefault(name, {})[f"sf{sf}"] = {
                "sec": round(dt, 4), "rows": n,
                "rows_per_sec": round(n / dt) if n else None}
        if not sys.argv[1:]:                # custom lakehouse probes
            import shutil
            for pname, (ptable, setup) in _custom_probes(
                    spark, sf_dir).items():
                n_rows = rows_of.get(ptable)
                if n_rows is None:
                    n_rows = load_tables(
                        spark, sf_dir, [ptable])[ptable].count()
                t, run = setup()
                try:
                    run()                   # warm
                    t0 = time.monotonic()
                    run()
                    dt = time.monotonic() - t0
                finally:
                    shutil.rmtree(t, ignore_errors=True)
                out.setdefault(pname, {})[f"sf{sf}"] = {
                    "sec": round(dt, 4), "rows": n_rows,
                    "rows_per_sec": round(n_rows / dt)}
    path = os.path.join(REPO_ROOT, "SCALING.json")
    if sys.argv[1:] and os.path.exists(path):
        # targeted rerun: merge into the existing record
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        prev.update(out)
        out = prev
    doc = {"sf_dirs": SF_DIRS + [sf1_dir], "queries": out}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for name, d in out.items():
        rps = [d[k]["rows_per_sec"] for k in sorted(d)]
        print(name, rps)
    spark.stop()


if __name__ == "__main__":
    main()

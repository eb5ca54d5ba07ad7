"""Audit the physical plan of every registry query → PLANS.md.

For each query: exchange count, join strategies, whether filters pushed to
the scan, scan column width, and red flags (cartesian products, row-wise
Python UDFs, single-partition exchanges feeding windows).  The generated
PLANS.md is the plan-quality evidence the bench numbers rest on.

Usage: python tools/audit_plans.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

RED_FLAG_PATTERNS = {
    "cartesian": "CartesianProduct",
    "bnl-join": "BroadcastNestedLoopJoin",
    "python-row-udf": "BatchEvalPython",
}

# Flags tolerated per query, each individually justified: every entry is a
# crossJoin against a 1-ROW aggregate (scalar-subquery broadcast — total
# count, corpus size, exact top-k contract frame), so the nested-loop join
# is O(rows)·1, not O(n·m).  ANY other flag — a new BNL, a cartesian, a
# row-wise Python UDF — makes the audit exit non-zero so plan regressions
# cannot land silently.
ALLOWED_FLAGS: dict[str, set[str]] = {
    "a10_approx_percentile_contract": {"bnl-join"},  # 1-row sketch/exact frames
    "a11_freq_items_contract": {"bnl-join"},         # 1-row sketch + total frames
    "dq_referential_integrity": {"bnl-join"},        # 1-row audit counters
    "a8_approx_distinct": {"bnl-join"},      # 1-row exact-distinct frames
    "prof_skew_events_user": {"bnl-join"},   # 1-row total-count frame
    "q11_important_stock": {"bnl-join"},     # 1-row threshold subquery
    "q22_inactive_customers": {"bnl-join"},  # 1-row avg-balance subquery
    "graph_pagerank_jaccard": {"bnl-join"},  # 1-row node-count frame per iter
    "sim_topk_ivf": {"bnl-join"},            # 1-row recall-contract frame
    "sim_topk_pq": {"bnl-join"},             # 1-row recall-contract frame
    "text_collocations_phrase": {"bnl-join"},  # 1-row corpus-size frame
    "text_tfidf_top_terms": {"bnl-join"},    # 1-row corpus-size frame
    "text_vocab_coverage": {"bnl-join"},     # 1-row corpus-size frame
    "text_bm25_topk": {"bnl-join"},          # 1-row (N, Σdl) scalar frame
    "retr_eval_bm25": {"bnl-join"},          # bm25's scalar frame + 1-row n_rel frame
    "mix_curriculum_phases": {"bnl-join"},   # 1-row quartile-boundary frame
    "corpus_assemble_pipeline": {"bnl-join"},  # 1-row train-quartile frame
    "prof_chi2_drift_priority": {"bnl-join"},  # 1-row (N_A, N_B) totals frame
    "dedup_lsh_recall_contract": {"bnl-join"},  # 1-row exact/hit count frames
    "mix_epoch_upsampling": {"bnl-join"},    # 1-row max-source target frame
    "dq_benford_totalprice": {"bnl-join"},   # 1-row digit-total frame
    "prof_tv_drift_priority": {"bnl-join"},  # 1-row (N_A, N_B) totals frame
    # NOT a 1-row frame, but the same bounded-broadcast argument: the
    # non-equi prefix-sum self-join runs on the counts-of-counts
    # relation, whose size is ≤ the number of DISTINCT rows-per-key
    # values (hundreds even at 100 TB), never the key or row count.
    "prof_lorenz_skew_users": {"bnl-join"},
    "prof_decile_lift_totalprice": {"bnl-join"},  # 1-row cents-total frame
    "corpus_dedup_then_pack": {"bnl-join"},  # three 1-row stat frames crossed
    "corpus_assemble_to_shards": {"bnl-join"},  # 1-row index-checksum frame
    "corpus_incremental_assemble": {"bnl-join"},  # 1-row index-checksum frame
    # 1-row index-checksum frame + 1-row canonical/admitted-count frame
    "corpus_incremental_neardup_assemble": {"bnl-join"},
    # the folded probe (round 13) crosses the code/base tables with a
    # BROADCAST 4-ROW query frame (qid, LUTs, µ-vector) — bounded by
    # the probe-set size by construction, never data-sized — plus the
    # 1-row tv-max and before/after-totals frames
    "scale_pq_retrain_recall": {"bnl-join"},
    # round-13 committed-republish twin of the rebalance contract: the
    # same per-generation 1-row (max-share × routed-share × hits)
    # frames crossed, read from catalog tables instead of in-query
    # trainings
    "scale_ivf_retrain_publish": {"bnl-join"},
    # 1-row canonical/admitted-count frame + two 1-row plant-verdict
    # frames crossed onto the per-canonical code rows
    "corpus_incremental_image_neardup": {"bnl-join"},
    # 1-row contract-flags frame crossed onto the 24 per-variant rows
    "scale_neardup_admission_recall": {"bnl-join"},
    # two 1-row hit-count frames (single-probe × multiprobe) crossed
    "scale_ivfpq_recall_contract": {"bnl-join"},
    # per-generation 1-row (max-share × routed-share × hits) frames
    # crossed — six one-row frames total, never a data-sized side
    "scale_ivf_rebalance_contract": {"bnl-join"},
    "ann_pq_probe_topk": {"bnl-join"},  # 1-row recall-contract frame
    "ts_dow_anova_strength": {"bnl-join"},   # two 1-row ANOVA stat frames
    "basket_brand_pairs_lift": {"bnl-join"},  # 1-row basket-count frame
    "rfm_segment_grid": {"bnl-join"},        # 1-row recency-anchor frame
    "text_burstiness_dispersion": {"bnl-join"},  # 1-row doc-count frame
    "text_doc_cooccur_pmi": {"bnl-join"},    # 1-row doc-count frame
}

BOUNDED_WINDOW_NOTE = """
## Bounded bare-window note

A handful of sites use `Window.orderBy(...)` with no `partitionBy`, which Spark
logs as a single-partition `WindowExec` warning. All are
**post-aggregate frames bounded by a parameter, not by data volume** —
the window input is already <= |days| or <= k rows, so the "move all
data to one partition" warning is about tens/hundreds of rows, never
the fact table:

- `plans/queries_tpch.py` w3/w4 (moving avg, day-over-day): input = one
  row per distinct order date (<= |calendar days|).
- `plans/queries_tpch.py` w6 / q6-forecast: the same per-day frame.
- `operators/mixing.py:domain_topk` rank tail: input = k rows per
  stratum after the WindowGroupLimit prune.
- `operators/text.py:retrieval_eval` (retr_eval_bm25): rank + running
  metric windows over the BM25 top-k frame — ≤ k = 10 rows by
  construction.
- `operators/timeseries.py:rolling_zscore_anomalies` (ts_anomaly_zscore):
  trailing frame over the pre-aggregated daily series (<= |days| rows).
  The per-key FLEET form is oracle-proven, not just documented:
  `ts_anomaly_zscore_fleet` runs the same operator with
  `partition_by="series"` (one stream per nation, hash-checked), and
  `trend_revenue_ols_fleet` is the per-series OLS trend (aggregate-only,
  no window at all).

Unbounded global orderings (token-shard prefix sums, equi-depth NTILE,
global row numbering, w5's rank battery) never use a bare window — they
go through the two-phase range-partitioned machinery in
`operators/windows.py`.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from databox_adls_loader_spark.plans.queries import all_queries
    from databox_adls_loader_spark.session import get_spark

    spark = get_spark("plan-audit")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = all_queries()

    rows = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            msg = re.sub(r"[\n|]+", " ", str(e))[:80]  # keep the md table intact
            rows.append((name, "ERROR", msg, "", ""))
            continue
        n_exch = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]*\w", plan))
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(s.split(",")) for s in scans if s]
        flags = [k for k, pat in RED_FLAG_PATTERNS.items() if pat in plan]
        rows.append((
            name,
            str(n_exch),
            "+".join(j.replace("Join", "").replace("Broadcast", "B").
                     replace("SortMerge", "SM").replace("Shuffled", "Sh")
                     for j in joins) or "—",
            f"{pushed}scan/{max(widths) if widths else 0}col",
            ",".join(flags) or "—",
        ))

    with open(os.path.join(REPO_ROOT, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan audit of every registry query\n\n"
            f"Generated by `tools/audit_plans.py` at {sf_dir}.  Columns:\n"
            "exchanges = shuffle/broadcast exchange nodes in the plan;\n"
            "joins = strategies used (B=Broadcast, SM=SortMerge, Sh=Shuffled"
            " hash, BNL=nested-loop); pushdown = scans with non-empty"
            " PushedFilters / widest ReadSchema column count;\n"
            "flags = red flags (cartesian, bnl-join on large inputs,"
            " row-wise Python UDF).  BNL appears only in deliberately tiny"
            " cross joins (scalar-subquery broadcasts).\n\n"
            "| query | exchanges | joins | pushdown | flags |\n"
            "|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
        f.write(BOUNDED_WINDOW_NOTE)
    print(f"wrote PLANS.md ({len(rows)} queries)")
    bad = []
    for r in rows:
        flags = {f for f in r[4].split(",") if f and f != "—"}
        extra = flags - ALLOWED_FLAGS.get(r[0], set())
        allowed = flags & ALLOWED_FLAGS.get(r[0], set())
        if allowed:
            print("flag (allowed)", r[0], ",".join(sorted(allowed)))
        if extra or r[1] == "ERROR":
            bad.append((r[0], ",".join(sorted(extra)) or r[2]))
    for name, why in bad:
        print("FLAG", name, why)
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()

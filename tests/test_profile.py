"""Profiling / quantization / vocabulary operators (queries_ops surface)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_profile_columns_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=3, b="y")]
    )
    from databox_adls_loader_spark.operators.profile import profile_columns
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert out["a"]["n_rows"] == 3
    assert out["a"]["n_nulls"] == 0
    assert out["a"]["n_distinct"] == 2
    assert out["a"]["min_s"] == "1" and out["a"]["max_s"] == "3"
    assert out["b"]["n_nulls"] == 1
    assert out["b"]["n_distinct"] == 2
    assert out["b"]["min_s"] == "x" and out["b"]["max_s"] == "y"


def test_profile_columns_approx_mode_runs(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    from databox_adls_loader_spark.operators.profile import profile_columns
    rows = {r["col_name"]: r for r in
            profile_columns(df, ["v"], exact=False).collect()}
    # HLL is approximate but must be within its documented 5% envelope
    assert abs(rows["v"]["n_distinct"] - 10) <= 2


def test_skew_profile_orders_heavy_key_first(spark):
    df = spark.createDataFrame(
        [Row(k="hot")] * 70 + [Row(k="warm")] * 20 + [Row(k="cold")] * 10
    )
    from databox_adls_loader_spark.operators.profile import skew_key_profile
    rows = skew_key_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in rows] == ["hot", "warm"]
    assert rows[0]["cnt"] == 70
    assert rows[0]["share_ppm"] == 700000  # exact integer ppm


def test_skew_profile_counts_null_keys(spark):
    df = spark.createDataFrame(
        [Row(k="hot")] * 3 + [Row(k=None)] * 2
    )
    from databox_adls_loader_spark.operators.profile import skew_key_profile
    rows = skew_key_profile(df, "k", top_n=5).collect()
    # NULL keys form their own group and the ppm denominator includes them
    assert {r["key"]: r["cnt"] for r in rows} == {"hot": 3, None: 2}
    assert {r["key"]: r["share_ppm"] for r in rows} == {"hot": 600000, None: 400000}


def test_histogram_buckets_are_exact(spark):
    df = spark.createDataFrame([Row(v=float(x)) for x in [0, 5, 10, 15, 25]])
    from databox_adls_loader_spark.operators.profile import histogram
    rows = {r["bucket"]: r for r in histogram(df, "v", width=10.0).collect()}
    assert rows[0]["cnt"] == 2 and rows[0]["bucket_lo"] == 0.0
    assert rows[1]["cnt"] == 2 and rows[1]["bucket_lo"] == 10.0
    assert rows[2]["cnt"] == 1 and rows[2]["bucket_lo"] == 20.0


def test_hapax_stats_counts_and_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a c"), Row(doc_id=2, text=None),
         Row(doc_id=3, text="   ")]
    )
    from databox_adls_loader_spark.operators.text import hapax_stats
    rows = {r["doc_id"]: r for r in hapax_stats(df).collect()}
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["n_hapax"]) == (4, 3, 2)
    assert math.isclose(r1["hapax_ratio"], 2 / 3)
    # null and whitespace-only docs keep a zero-count row (LEFT JOIN shape)
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["hapax_ratio"] is None


def test_quantize_int8_stats_known_vector(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 1.0, 2.0]),
         Row(vec_id=2, embedding=[5.0, 5.0])]  # degenerate: mx == mn
    )
    from databox_adls_loader_spark.operators.similarity import quantize_int8_stats
    rows = {r["vec_id"]: r for r in quantize_int8_stats(df).collect()}
    # codes: floor((v-0)*255/2) = 0, 127, 255
    assert rows[1]["code_sum"] == 0 + 127 + 255
    assert rows[1]["n_dims"] == 3
    assert rows[1]["mn"] == 0.0 and rows[1]["mx"] == 2.0
    assert rows[2]["code_sum"] == 0  # constant vector maps to all-zero codes


def test_global_ranks_match_native_window(spark):
    """The two-phase distributed ranks must be bit-identical to the
    native (single-partition) global window — including ties, which the
    test data plants deliberately."""
    from pyspark.sql import Window

    from databox_adls_loader_spark.operators.windows import global_ranks
    df = spark.createDataFrame(
        [Row(id=i, v=val) for i, val in
         enumerate([10.0, 20.0, 20.0, 5.0, 20.0, 5.0, 7.0, 30.0, 7.0, 1.0])]
    )
    order = [("v", "desc"), ("id", "asc")]
    got = {r["id"]: r for r in
           global_ranks(df, order, ntile=4, num_partitions=4).collect()}
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {r["id"]: r for r in df.select(
        "id",
        F.row_number().over(w).alias("row_number"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.ntile(4).over(w).alias("ntile"),
    ).collect()}
    assert set(got) == set(want)
    for i in want:
        for c in ("row_number", "rnk", "drnk", "ntile"):
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])
        for c in ("pct_rank", "cume_dist"):
            assert got[i][c] == want[i][c], (i, c)


def test_global_ranks_unique_fast_path_matches_general(spark):
    """unique=True (order tuple is a key) must be bit-identical to the
    general tie-window path on every output column — same data as the
    native-window pin, ordered by (v, id) which IS unique."""
    from databox_adls_loader_spark.operators.windows import global_ranks
    df = spark.createDataFrame(
        [Row(id=i, v=val) for i, val in
         enumerate([10.0, 20.0, 20.0, 5.0, 20.0, 5.0, 7.0, 30.0, 7.0, 1.0])]
    )
    order = [("v", "desc"), ("id", "asc")]
    cols = ("row_number", "rnk", "drnk", "pct_rank", "cume_dist", "ntile")
    got = {r["id"]: r for r in
           global_ranks(df, order, ntile=4, num_partitions=4,
                        unique=True).collect()}
    want = {r["id"]: r for r in
            global_ranks(df, order, ntile=4, num_partitions=4).collect()}
    assert set(got) == set(want)
    for i in want:
        for c in cols:
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])
    # same Spark types too — the hash gate is type-sensitive
    gt = dict(global_ranks(df, order, ntile=4, unique=True).dtypes)
    wt = dict(global_ranks(df, order, ntile=4).dtypes)
    assert {c: gt[c] for c in cols} == {c: wt[c] for c in cols}


def test_global_ranks_rank_ties_on_prefix(spark):
    """Ties on the rank ordering (duplicate full order tuples) collapse
    to the same rnk/drnk, exactly like SQL RANK/DENSE_RANK."""
    from databox_adls_loader_spark.operators.windows import global_ranks
    df = spark.createDataFrame([Row(v=x) for x in [3, 1, 3, 2, 1, 3]])
    rows = global_ranks(df, [("v", "asc")], num_partitions=3).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r["v"], set()).add((r["rnk"], r["drnk"]))
    assert by_v[1] == {(1, 1)}
    assert by_v[2] == {(3, 2)}
    assert by_v[3] == {(4, 3)}


def test_global_row_number_grouped_matches_per_group_loop(spark):
    """The one-shuffle grouped rank must be bit-identical (values AND
    Spark types) to running global_row_number on each group's slice —
    uneven group sizes and a group that straddles range partitions."""
    from databox_adls_loader_spark.operators.windows import (
        global_row_number, global_row_number_grouped)
    df = spark.createDataFrame(
        [Row(g=g, v=float(v), id=i) for i, (g, v) in enumerate(
            [(1, 9), (2, 3), (1, 7), (1, 7), (2, 11), (1, 2), (3, 5),
             (1, 4), (2, 8), (1, 1), (3, 5), (2, 6)])])
    order = [("v", "desc"), ("id", "asc")]
    got_df, got_n = global_row_number_grouped(
        df, "g", order, out_col="rn", num_partitions=4)
    got = {(r["g"], r["id"]): r["rn"] for r in got_df.collect()}
    want, want_n = {}, {}
    for g in (1, 2, 3):
        part, n = global_row_number(
            df.filter(F.col("g") == g), order, out_col="rn",
            num_partitions=4)
        want_n[g] = n
        for r in part.collect():
            want[(r["g"], r["id"])] = r["rn"]
    assert got == want
    assert got_n == want_n
    assert dict(got_df.dtypes)["rn"] == "bigint"


def test_sql_passthrough_matches_dataframe_plan(spark, sf_dir):
    """The SQL string and an equivalent DataFrame build must agree —
    the two front ends share one Catalyst plan space."""
    from databox_adls_loader_spark.plans.queries_ops import sql_surface_passthrough
    from databox_adls_loader_spark.session import load_tables
    got = {r["n_name"]: r["n_items"]
           for r in sql_surface_passthrough(spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    want = {
        r["n_name"]: r["n_items"]
        for r in t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name").agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    assert got == want


def test_inverted_index_postings_and_df_bounds(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="apple banana apple"),
        Row(doc_id=2, text="banana cherry"),
        Row(doc_id=3, text="banana"),
    ])
    from databox_adls_loader_spark.operators.text import inverted_index
    out = {r["term"]: r for r in inverted_index(df).collect()}
    assert out["banana"]["df"] == 3
    assert out["banana"]["postings"] == [1, 2, 3]
    assert out["apple"]["df"] == 1 and out["apple"]["total_tf"] == 2
    # min_df prunes rare terms, max_df prunes stopword-frequency terms
    only_common = {r["term"] for r in inverted_index(df, min_df=2).collect()}
    assert only_common == {"banana"}
    no_stop = {r["term"] for r in inverted_index(df, max_df=2).collect()}
    assert "banana" not in no_stop and "apple" in no_stop


def test_vocab_coverage_cumulative_ppm(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a a a a b b c"),   # a:4 b:2 c:1, total 7
    ])
    from databox_adls_loader_spark.operators.text import vocab_coverage
    rows = vocab_coverage(df, top_n=2).collect()
    assert [(r["term"], r["cnt"]) for r in rows] == [("a", 4), ("b", 2)]
    assert rows[0]["cum_ppm"] == 4 * 1000000 // 7
    assert rows[1]["cum_ppm"] == 6 * 1000000 // 7


def test_cluster_representatives_pick_longest_then_smallest_id(spark):
    edges = spark.createDataFrame([Row(a=1, b=2), Row(a=2, b=3), Row(a=10, b=11)])
    docs = spark.createDataFrame([
        Row(doc_id=1, n_chars=5), Row(doc_id=2, n_chars=9),
        Row(doc_id=3, n_chars=9), Row(doc_id=10, n_chars=4),
        Row(doc_id=11, n_chars=4), Row(doc_id=99, n_chars=1),  # unclustered
    ])
    from databox_adls_loader_spark.operators.graph import (
        cluster_representatives, connected_components)
    cc = connected_components(edges)
    out = {r["component"]: r for r in
           cluster_representatives(cc, docs).collect()}
    # cluster {1,2,3}: 2 and 3 tie on n_chars=9 -> smallest id (2) wins
    assert out[1]["rep_doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["max_n_chars"] == 9
    # cluster {10,11}: tie at 4 chars -> 10
    assert out[10]["rep_doc_id"] == 10 and out[10]["n_members"] == 2
    assert 99 not in {r for c in out.values() for r in [c["rep_doc_id"]]}


def test_leakage_safe_split_cluster_coherence(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique text {i} " + "filler " * 5) for i in range(20)]
    )
    pairs = spark.createDataFrame(
        [Row(a=0, b=1), Row(a=1, b=2), Row(a=5, b=6)]
    )
    from databox_adls_loader_spark.operators.corpus import leakage_safe_split
    from databox_adls_loader_spark.operators.text import train_val_test_split
    out = {r["doc_id"]: r["split"] for r in
           leakage_safe_split(docs, pairs).collect()}
    # whole cluster moves together
    assert out[0] == out[1] == out[2]
    assert out[5] == out[6]
    # singletons get exactly the per-doc assignment (same salt, same math)
    per_doc = {r["doc_id"]: r["split"] for r in
               train_val_test_split(docs).collect()}
    for d in set(out) - {0, 1, 2, 5, 6}:
        assert out[d] == per_doc[d]
    # clusters hash their min-id label: cluster {0,1,2} matches doc 0's
    assert out[0] == per_doc[0]
    assert out[5] == per_doc[5]


def test_equidepth_histogram_balanced_buckets(spark):
    df = spark.range(100).select(
        (F.col("id") * F.col("id")).cast("double").alias("v"),  # skewed values
        F.col("id").alias("tb"))
    from databox_adls_loader_spark.operators.profile import equidepth_histogram
    rows = equidepth_histogram(df, "v", "tb", k=4).collect()
    assert [r["n"] for r in rows] == [25, 25, 25, 25]
    # bucket ranges tile the domain in order without overlap
    for prev, nxt in zip(rows, rows[1:]):
        assert prev["hi"] <= nxt["lo"]


def test_sql_udf_stays_in_catalyst(spark, sf_dir):
    """The SQL scalar UDF must inline into the JVM plan — no Python
    worker round trip (BatchEvalPython / ArrowEvalPython)."""
    from databox_adls_loader_spark.plans.queries_ops import sql_udf_chars_per_token
    df = sql_udf_chars_per_token(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() > 0


def test_ks_drift_cogroup_known_values_and_edges(spark):
    from databox_adls_loader_spark.operators.profile import ks_drift_cogroup
    # group A: identical distributions -> ks 0; group B: disjoint -> max;
    # group C: only on the left -> ks 0 with counts exposing imbalance
    left = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 2.0),
         ("B", 1.0), ("B", 2.0), ("C", 9.0)], "k: string, v: double")
    right = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 2.0),
         ("B", 10.0), ("B", 11.0), ("B", 12.0)], "k: string, v: double")
    got = {r["k"]: (r["n_left"], r["n_right"], r["ks_num"])
           for r in ks_drift_cogroup(left, right, "k", "v").collect()}
    assert got["A"] == (3, 3, 0)
    # disjoint: at v=2 c1=2,c2=0 -> |3*2 - 2*0| = 6 = n1*n2 (D = 1)
    assert got["B"] == (2, 3, 6)
    assert got["C"] == (1, 0, 0)


def test_ks_drift_cogroup_preserves_key_type(spark):
    from databox_adls_loader_spark.operators.profile import ks_drift_cogroup
    left = spark.createDataFrame([(7, 1.0), (7, 2.0)], "k: long, v: double")
    right = spark.createDataFrame([(7, 1.0)], "k: long, v: double")
    out = ks_drift_cogroup(left, right, "k", "v")
    assert dict(out.dtypes)["k"] == "bigint"
    assert out.collect()[0]["k"] == 7


def test_ks_drift_cogroup_matches_bruteforce_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databox_adls_loader_spark.operators.profile import ks_drift_cogroup

    vals = st.lists(st.integers(min_value=0, max_value=9).map(float),
                    min_size=1, max_size=12)

    @given(vals, vals)
    @settings(max_examples=10, deadline=None)
    def check(a, b):
        left = spark.createDataFrame([("g", v) for v in a],
                                     "k: string, v: double")
        right = spark.createDataFrame([("g", v) for v in b],
                                      "k: string, v: double")
        row = ks_drift_cogroup(left, right, "k", "v").collect()[0]
        n1, n2 = len(a), len(b)
        want = max(abs(n2 * sum(x <= p for x in a)
                       - n1 * sum(x <= p for x in b))
                   for p in set(a) | set(b))
        assert (row["n_left"], row["n_right"], row["ks_num"]) \
            == (n1, n2, want)

    check()


def test_lorenz_skew_uniform_is_zero(spark):
    from databox_adls_loader_spark.operators.profile import lorenz_skew

    df = spark.createDataFrame([(k, i) for k in "abcd" for i in range(5)],
                               "k string, v int")
    row = lorenz_skew(df, "k").collect()[0]
    assert (row["n_keys"], row["n_rows"], row["max_cnt"]) == (4, 20, 5)
    assert row["gini"] == 0.0
    assert row["top1_ppm"] == 250_000


def test_lorenz_skew_matches_bruteforce(spark):
    from databox_adls_loader_spark.operators.profile import lorenz_skew

    # skewed: counts 1, 1, 2, 6  (ties included to exercise the
    # tie-cancellation algebra)
    rows = ([("a", 0)] + [("b", 0)] + [("c", 0)] * 2 + [("d", 0)] * 6)
    df = spark.createDataFrame(rows, "k string, v int")
    row = lorenz_skew(df, "k").collect()[0]
    counts = sorted([1, 1, 2, 6])
    n, t = len(counts), sum(counts)
    w = sum((i + 1) * c for i, c in enumerate(counts))
    want = round((2 * w - (n + 1) * t) / (n * t), 6)
    assert row["gini"] == want
    assert row["top1_ppm"] == 6 * 1_000_000 // 10
    assert row["max_cnt"] == 6


def test_chi2_drift_buckets_matches_handcomputed(spark):
    from pyspark.sql import functions as F

    from databox_adls_loader_spark.operators.profile import (
        chi2_drift_buckets)

    # bucket 0: A=3, B=1; bucket 1: A=1, B=3  (width 10, two buckets)
    rows = ([("a", 5.0)] * 3 + [("b", 5.0)] * 1
            + [("a", 15.0)] * 1 + [("b", 15.0)] * 3)
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["bucket"]: r for r in chi2_drift_buckets(
        df, "v", F.col("grp") == "a", width=10.0, n_buckets=2).collect()}
    na, nb = 4, 4
    for bucket, (oa, ob) in {0: (3, 1), 1: (1, 3)}.items():
        r = out[bucket]
        assert (r["o_a"], r["o_b"]) == (oa, ob)
        d = oa * nb - ob * na
        want = round(d * d / (na * nb) * (na + nb) / (oa + ob), 6)
        assert r["chi2_contrib"] == want

"""Materialized-view catalog + rewrite (plans/mv.py): coverage matrix,
rewrite-vs-base equivalence, catalog choice, and the plan-level proof
that the rewritten query scans the MV's files, not the base table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.plans import mv as M

DAILY = M.MVSpec(
    name="daily", dims=("n_name", "day"),
    measures=(("sum", "rev_cents"), ("count", "n_orders"),
              ("min", "lo"), ("max", "hi")),
    rows_hint=60_000)

GB_MONTHLY = ["n_name", ("month", "month", "day")]
MS_REV = [("sum", "rev_cents", "rev_cents"), ("count", "n_orders", "n_orders")]


class TestCovers:
    def test_identity_dims_and_stored_measures(self):
        assert M.covers(DAILY, ["n_name", "day"], MS_REV)

    def test_month_rollup_of_day_dim(self):
        assert M.covers(DAILY, GB_MONTHLY, MS_REV)

    def test_year_rollup(self):
        assert M.covers(DAILY, [("yr", "year", "day")], MS_REV)

    def test_min_max_reagg(self):
        assert M.covers(DAILY, ["n_name"],
                        [("min", "lo", "lo"), ("max", "hi", "hi")])

    def test_rejects_unknown_dim(self):
        assert not M.covers(DAILY, ["c_custkey"], MS_REV)

    def test_rejects_unknown_derivation(self):
        assert not M.covers(DAILY, [("dow", "dayofweek", "day")], MS_REV)

    def test_rejects_missing_measure(self):
        assert not M.covers(DAILY, ["n_name"], [("sum", "qty", "qty")])

    def test_rejects_agg_class_mismatch(self):
        # rev_cents is stored as a SUM partial — an exact MIN over base
        # rows is NOT derivable from it
        assert not M.covers(DAILY, ["n_name"],
                            [("min", "rev_cents", "m")])

    def test_rewrite_refuses_uncovered(self, spark):
        empty = spark.createDataFrame([], "n_name string, day date")
        with pytest.raises(M.MVRewriteError):
            M.rewrite_aggregate(empty, DAILY, ["c_custkey"], MS_REV)


class TestChooseMV:
    def test_prefers_smallest_covering(self):
        coarse = M.MVSpec(name="coarse", dims=("n_name",),
                          measures=(("sum", "rev_cents"),), rows_hint=25)
        pick = M.choose_mv([DAILY, coarse], ["n_name"],
                           [("sum", "rev_cents", "rev")])
        assert pick is coarse

    def test_coverage_dominates_cost(self):
        decoy = M.MVSpec(name="decoy", dims=("o_orderpriority", "day"),
                         measures=(("sum", "rev_cents"),), rows_hint=5)
        pick = M.choose_mv([decoy, DAILY], GB_MONTHLY,
                           [("sum", "rev_cents", "rev_cents")])
        assert pick is DAILY

    def test_none_when_nothing_covers(self):
        assert M.choose_mv([DAILY], ["c_custkey"], MS_REV) is None


class TestRewriteEquivalence:
    def test_rewrite_equals_base_aggregation(self, spark, sf_dir, tmp_path):
        from databox_adls_loader_spark.session import load_tables

        t = load_tables(spark, sf_dir, ["orders"])
        base = t["orders"].select(
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderdate").cast("date").alias("day"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").alias("cents"))
        build = (base.groupBy("st", "day")
                 .agg(F.sum("cents").cast("long").alias("rev_cents"),
                      F.count(F.lit(1)).alias("n_orders"),
                      F.min("cents").alias("lo"),
                      F.max("cents").alias("hi")))
        d = str(tmp_path / "mv_status_day")
        assert M.refresh(build, d) == 1
        spec = M.MVSpec(name="status_day", dims=("st", "day"),
                        measures=(("sum", "rev_cents"),
                                  ("count", "n_orders"),
                                  ("min", "lo"), ("max", "hi")),
                        rows_hint=10_000, table_dir=d)
        got = M.rewrite_aggregate(
            M.read(spark, d), spec,
            ["st", ("month", "month", "day")],
            [("sum", "rev_cents", "rev"), ("count", "n_orders", "n"),
             ("min", "lo", "lo"), ("max", "hi", "hi")],
        ).orderBy("st", "month").collect()
        want = (base
                .groupBy("st", F.date_trunc("month", "day").cast("date")
                         .alias("month"))
                .agg(F.sum("cents").cast("long").alias("rev"),
                     F.count(F.lit(1)).alias("n"),
                     F.min("cents").alias("lo"),
                     F.max("cents").alias("hi"))
                .orderBy("st", "month").collect())
        assert got == want

    def test_refresh_commits_new_version(self, spark, sf_dir, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        d = str(tmp_path / "mv_v")
        df = spark.range(3).select(
            F.lit("a").alias("k"), F.col("id").alias("v"))
        assert M.refresh(df, d) == 1
        assert M.refresh(df, d) == 2
        assert V.latest_version(d) == 2
        # a REBUILD must replace, not append — rows would double under
        # append mode and every rewrite over the view would over-count
        assert M.read(spark, d).count() == 3

    def test_rewritten_plan_scans_mv_not_base(self, spark, sf_dir):
        """The whole point of the rewrite: the physical plan reads the
        MV's data files and never references the base fact table."""
        from databox_adls_loader_spark.plans.queries_round6 import (
            mv_rewrite_monthly_revenue, _mv_daily_nation_rev)

        df = mv_rewrite_monthly_revenue(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        _, mv_dir = _mv_daily_nation_rev(spark, sf_dir)
        assert mv_dir.split("/")[-1] in plan
        assert "orders.parquet" not in plan


class TestIncrementalRefresh:
    def test_delta_merge_equals_full_rebuild(self, spark, tmp_path):
        """Update an existing group, insert a brand-new group, leave one
        untouched — the merged view must equal the full rebuild,
        min/max included."""
        spec = M.MVSpec(name="inc", dims=("k",),
                        measures=(("sum", "s"), ("count", "n"),
                                  ("min", "lo"), ("max", "hi")),
                        rows_hint=10)

        def agg(rows):
            df = spark.createDataFrame(rows, "k string, v long")
            return df.groupBy("k").agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.min("v").alias("lo"), F.max("v").alias("hi"))

        old = [("a", 1), ("a", 5), ("b", 10)]
        delta = [("a", -3), ("c", 7)]      # touches a, inserts c, skips b
        d = str(tmp_path / "mv_inc")
        assert M.refresh(agg(old), d, mv=spec) == 1
        v = M.refresh_incremental(spark, d, spec, agg(delta))
        assert v == 2
        got = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
               for r in M.read(spark, d).collect()}
        want = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
                for r in agg(old + delta).collect()}
        assert got == want

    def test_rejects_nondecomposable_measures(self, spark, tmp_path):
        bad = M.MVSpec(name="bad", dims=("k",),
                       measures=(("avg", "a"),), rows_hint=1)
        with pytest.raises(M.MVRewriteError):
            M.refresh_incremental(
                spark, str(tmp_path / "x"), bad,
                spark.createDataFrame([("a", 1.0)], "k string, a double"))


class TestStreamingMaintenance:
    def test_stream_maintains_view_exactly_once(self, spark, tmp_path):
        """Micro-batches fold into the stored view via the delta rule;
        after the stream drains, the view equals the batch aggregate of
        every row, and a checkpoint replay changes nothing."""
        from databox_adls_loader_spark.sinks import versioned as V

        spec = M.MVSpec(name="stream_mv", dims=("k",),
                        measures=(("sum", "s"), ("count", "n"),
                                  ("min", "lo"), ("max", "hi")),
                        rows_hint=10)

        def delta_agg(df):
            return df.groupBy("k").agg(
                F.sum("v").cast("long").alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.min("v").alias("lo"), F.max("v").alias("hi"))

        src = str(tmp_path / "src")
        t = str(tmp_path / "mv")
        ck = str(tmp_path / "ck")
        rows = [(f"k{i % 3}", i) for i in range(40)]
        all_df = spark.createDataFrame(rows, "k string, v long")
        # two files -> two micro-batches with maxFilesPerTrigger=1
        spark.createDataFrame(rows[:25], "k string, v long") \
            .coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(rows[25:], "k string, v long") \
            .coalesce(1).write.mode("append").parquet(src)

        def run():
            stream = (spark.readStream.schema("k string, v long")
                      .option("maxFilesPerTrigger", 1).parquet(src))
            q = (stream.writeStream
                 .foreachBatch(lambda df, bid: M.maintain_stream_batch(
                     df, bid, t, spec, delta_agg))
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run()
        want = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
                for r in delta_agg(all_df).collect()}
        got = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
               for r in M.read(spark, t).collect()}
        assert got == want
        assert len(V.committed_batch_ids(t)) >= 2

        v_before = V.latest_version(t)
        run()                         # replay: ledger skips every batch
        assert V.latest_version(t) == v_before
        got2 = {r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
                for r in M.read(spark, t).collect()}
        assert got2 == want


class TestDerivationTypeGuard:
    def test_covers_rejects_month_of_declared_nondate_dim(self):
        typed = M.MVSpec(name="typed", dims=("n_name", "day"),
                         dim_types=("string", "date"),
                         measures=(("sum", "rev_cents"),), rows_hint=1)
        assert M.covers(typed, [("m", "month", "day")],
                        [("sum", "rev_cents", "r")])
        assert not M.covers(typed, [("m", "month", "n_name")],
                            [("sum", "rev_cents", "r")])

    def test_rewrite_refuses_month_of_string_dim_by_schema(self, spark):
        # spec WITHOUT declared types: covers() admits by name, but the
        # rewrite must still refuse against the actual schema — a
        # date_trunc on a string is NULL for every row (silent collapse)
        untyped = M.MVSpec(name="untyped", dims=("n_name",),
                           measures=(("sum", "s"),), rows_hint=1)
        mv_df = spark.createDataFrame([("A", 1)], "n_name string, s long")
        with pytest.raises(M.MVRewriteError, match="date/timestamp"):
            M.rewrite_aggregate(mv_df, untyped,
                                [("m", "month", "n_name")],
                                [("sum", "s", "s")])


class TestSQLRewrite:
    """SQL-text routing (mv.sql_rewrite): parse -> choose -> rewrite,
    with structural fallback for anything outside the proven shape."""

    def _base(self, spark):
        import datetime as dt

        rows = [("A", dt.date(2024, 1, 1), 100, 1),
                ("A", dt.date(2024, 1, 2), 250, 2),
                ("A", dt.date(2024, 2, 1), 60, 3),
                ("B", dt.date(2024, 1, 1), 40, 4),
                ("B", dt.date(2024, 3, 5), 500, 5)]
        return spark.createDataFrame(
            rows, "n_name string, day date, price_cents long, oid long")

    def _mv(self, spark, tmp_path):
        base = self._base(spark)
        build = base.groupBy("n_name", "day").agg(
            F.sum("price_cents").cast("long").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"))
        t = str(tmp_path / "mv")
        M.refresh(build, t)
        spec = M.MVSpec(
            name="daily", dims=("n_name", "day"),
            dim_types=("string", "date"),
            measures=(("sum", "rev_cents"), ("count", "n_orders")),
            measure_sources=("price_cents", "*"),
            rows_hint=100, table_dir=t, base_table="sales")
        return base, spec

    def _q(self):
        return ("SELECT n_name, date_trunc('month', day) AS month, "
                "sum(price_cents) AS rev_cents, count(*) AS n_orders "
                "FROM sales GROUP BY n_name, 2 ORDER BY n_name, month")

    def test_routes_and_matches_base(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        df, used = M.sql_rewrite(spark, self._q(), [spec])
        assert used == "daily"
        expect = spark.sql(self._q().replace(
            "date_trunc('month', day)",
            "CAST(date_trunc('month', day) AS DATE)")).collect()
        assert sorted(map(tuple, df.collect())) == \
            sorted(map(tuple, expect))

    def test_where_on_dim_pushes_through(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        q = ("SELECT n_name, sum(price_cents) AS rev "
             "FROM sales WHERE n_name = 'A' AND day >= '2024-01-02' "
             "GROUP BY n_name")
        # day >= string literal compares lexically vs date: VARCHAR
        # literal against a DATE dim — Spark casts; both sides agree
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used == "daily"
        assert {tuple(r) for r in df.collect()} == {("A", 310)}

    def test_where_on_nondim_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        q = ("SELECT n_name, sum(price_cents) AS rev FROM sales "
             "WHERE oid > 2 GROUP BY n_name")
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used is None
        assert {tuple(r) for r in df.collect()} == {("A", 60), ("B", 540)}

    def test_count_col_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        q = ("SELECT n_name, count(price_cents) AS n FROM sales "
             "GROUP BY n_name")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None

    def test_join_and_cte_fall_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        for q in [
            "SELECT s.n_name, sum(s.price_cents) AS r FROM sales s "
            "JOIN sales t ON s.oid = t.oid GROUP BY s.n_name",
            "WITH x AS (SELECT * FROM sales) "
            "SELECT n_name, sum(price_cents) AS r FROM x GROUP BY n_name",
        ]:
            _, used = M.sql_rewrite(spark, q, [spec])
            assert used is None

    def test_group_mismatch_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        # grouping by a column NOT in the select list: not the proven
        # shape -> fallback, not a wrong rewrite
        q = ("SELECT sum(price_cents) AS r FROM sales GROUP BY n_name")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None

    def test_wrong_base_table_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("returns_t")
        q = ("SELECT n_name, sum(price_cents) AS rev_cents "
             "FROM returns_t GROUP BY n_name")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None

    def test_limit_and_desc_order(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        q = ("SELECT n_name, sum(price_cents) AS rev FROM sales "
             "GROUP BY n_name ORDER BY rev DESC LIMIT 1")
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used == "daily"
        assert [tuple(r) for r in df.collect()] == [("B", 540)]

    def test_measure_source_mismatch_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        q = ("SELECT n_name, sum(oid) AS rev_cents FROM sales "
             "GROUP BY n_name")   # sum of a DIFFERENT base column
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None


class TestSQLRewriteAvgHaving:
    """AVG synthesis (stored-sum / stored-count) and HAVING pushdown in
    the SQL router."""

    _mv = TestSQLRewrite._mv
    _base = TestSQLRewrite._base

    def test_avg_routed_exact(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        q = ("SELECT n_name, avg(price_cents) AS apc FROM sales "
             "GROUP BY n_name ORDER BY n_name")
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used == "daily"
        expect = {(r["n_name"], r["apc"])
                  for r in spark.sql(q).collect()}
        assert {tuple(r) for r in df.collect()} == expect

    def test_avg_without_count_partial_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        import dataclasses
        no_count = dataclasses.replace(
            spec, measures=(("sum", "rev_cents"),),
            measure_sources=("price_cents",))
        q = ("SELECT n_name, avg(price_cents) AS apc FROM sales "
             "GROUP BY n_name")
        _, used = M.sql_rewrite(spark, q, [no_count])
        assert used is None

    def test_having_filters_groups_before_limit(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        q = ("SELECT n_name, sum(price_cents) AS rev FROM sales "
             "GROUP BY n_name HAVING sum(price_cents) > 500 "
             "ORDER BY rev LIMIT 5")
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used == "daily"
        assert [tuple(r) for r in df.collect()] == [("B", 540)]

    def test_having_by_alias(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        q = ("SELECT n_name, count(*) AS n FROM sales "
             "GROUP BY n_name HAVING n >= 3")
        df, used = M.sql_rewrite(spark, q, [spec])
        assert used == "daily"
        assert {tuple(r) for r in df.collect()} == {("A", 3)}

    def test_having_on_unselected_measure_falls_back(self, spark, tmp_path):
        base, spec = self._mv(spark, tmp_path)
        base.createOrReplaceTempView("sales")
        q = ("SELECT n_name, count(*) AS n FROM sales "
             "GROUP BY n_name HAVING sum(price_cents) > 100")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None


class TestSQLRewriteJoin:
    """JOIN-shaped routing (round 7, the Goldstein-Larson join case):
    a star query routes onto a denormalized summary MV only when the
    declared join set matches EXACTLY and every qualified column
    resolves through the declared dim/measure lineage."""

    def _tables(self, spark):
        import datetime as dt

        fact = spark.createDataFrame(
            [(1, 10, dt.datetime(2024, 1, 1), 5.0),
             (2, 10, dt.datetime(2024, 1, 2), 7.5),
             (3, 20, dt.datetime(2024, 2, 1), 2.0),
             (4, 20, dt.datetime(2024, 2, 9), 9.0)],
            "oid long, ckey long, odate timestamp, price double")
        dim = spark.createDataFrame(
            [(10, "DE"), (20, "FR")], "ckey long, country string")
        return fact, dim

    def _mv(self, spark, tmp_path):
        fact, dim = self._tables(spark)
        build = (fact.join(dim, "ckey")
                 .groupBy("country",
                          F.col("odate").cast("date").alias("day"))
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("price").alias("mx")))
        t = str(tmp_path / "mv")
        M.refresh(build, t)
        spec = M.MVSpec(
            name="star", dims=("country", "day"),
            dim_types=("string", "date"),
            measures=(("count", "n"), ("max", "mx")),
            measure_sources=("*", "fact.price"),
            joins=(("dim", "ckey", "fact", "ckey"),),
            dim_sources=("dim.country", "date:fact.odate"),
            rows_hint=10, table_dir=t, base_table="fact")
        return fact, dim, spec

    def _q(self):
        return ("SELECT d.country, date_trunc('month', f.odate) AS m, "
                "COUNT(*) AS n, MAX(f.price) AS mx "
                "FROM fact f JOIN dim d ON f.ckey = d.ckey "
                "GROUP BY d.country, 2 ORDER BY country, m")

    def test_star_routes_and_matches_base(self, spark, tmp_path):
        fact, dim, spec = self._mv(spark, tmp_path)
        fact.createOrReplaceTempView("fact")
        dim.createOrReplaceTempView("dim")
        df, used = M.sql_rewrite(spark, self._q(), [spec])
        assert used == "star"
        expect = spark.sql(self._q().replace(
            "date_trunc('month', f.odate)",
            "CAST(date_trunc('month', f.odate) AS DATE)")).collect()
        assert [tuple(r) for r in df.collect()] == \
            [tuple(r) for r in expect]

    def test_where_on_dim_attribute_pushes_through(self, spark, tmp_path):
        fact, dim, spec = self._mv(spark, tmp_path)
        q = ("SELECT d.country, COUNT(*) AS n "
             "FROM fact f JOIN dim d ON f.ckey = d.ckey "
             "WHERE d.country = 'DE' GROUP BY d.country")
        df, used = M.sql_rewrite(spark, q, [spec],
                                 fallback=lambda _: 1 / 0)
        assert used == "star"
        assert [tuple(r) for r in df.collect()] == [("DE", 2)]

    def test_join_set_mismatch_falls_back(self, spark, tmp_path):
        fact, dim, spec = self._mv(spark, tmp_path)
        fact.createOrReplaceTempView("fact")
        dim.createOrReplaceTempView("dim")
        # wrong ON column: the view stored ckey=ckey, query joins oid
        q = ("SELECT d.country, COUNT(*) AS n "
             "FROM fact f JOIN dim d ON f.oid = d.ckey "
             "GROUP BY d.country")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None
        # single-table query cannot route onto a join view
        q2 = "SELECT f.oid AS oid, COUNT(*) AS n FROM fact f GROUP BY 1"
        _, used2 = M.sql_rewrite(spark, q2, [spec])
        assert used2 is None

    def test_identity_on_truncated_date_source_falls_back(
            self, spark, tmp_path):
        fact, dim, spec = self._mv(spark, tmp_path)
        fact.createOrReplaceTempView("fact")
        dim.createOrReplaceTempView("dim")
        # the stored day is CAST(odate AS DATE); identity grouping on
        # the raw timestamp is NOT answerable (time-of-day truncated)
        q = ("SELECT f.odate AS odate, COUNT(*) AS n "
             "FROM fact f JOIN dim d ON f.ckey = d.ckey GROUP BY 1")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None
        # ...and WHERE on it cannot push through either
        q2 = ("SELECT d.country, COUNT(*) AS n "
              "FROM fact f JOIN dim d ON f.ckey = d.ckey "
              "WHERE f.odate > '2024-01-01' GROUP BY d.country")
        _, used2 = M.sql_rewrite(spark, q2, [spec])
        assert used2 is None

    def test_unqualified_or_selfjoin_falls_back(self, spark, tmp_path):
        fact, dim, spec = self._mv(spark, tmp_path)
        fact.createOrReplaceTempView("fact")
        dim.createOrReplaceTempView("dim")
        # unqualified column ref in join mode: refuse, never guess
        q = ("SELECT country, COUNT(*) AS n "
             "FROM fact f JOIN dim d ON f.ckey = d.ckey GROUP BY country")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None
        # self-join: refuse
        q2 = ("SELECT a.oid AS oid, COUNT(*) AS n FROM fact a "
              "JOIN fact b ON a.oid = b.oid GROUP BY 1")
        _, used2 = M.sql_rewrite(spark, q2, [spec])
        assert used2 is None


class TestSQLRewriteSubsumption:
    """Join-set SUBSUMPTION (round 7): a query with FEWER joins than
    the view routes iff every extra view join is declared lossless
    (PK-FK); anything undeclared refuses on structure."""

    def _mv(self, spark, tmp_path, lossless):
        import dataclasses
        import datetime as dt

        fact = spark.createDataFrame(
            [(1, 10, dt.datetime(2024, 1, 1), 5.0),
             (2, 10, dt.datetime(2024, 1, 2), 7.5),
             (3, 20, dt.datetime(2024, 2, 1), 2.0),
             (4, 20, dt.datetime(2024, 2, 9), 9.0)],
            "oid long, ckey long, odate timestamp, price double")
        dim = spark.createDataFrame(
            [(10, "DE"), (20, "FR")], "ckey long, country string")
        dim2 = spark.createDataFrame(
            [("DE", "EU"), ("FR", "EU")], "country string, region string")
        build = (fact.join(dim, "ckey").join(dim2, "country")
                 .groupBy("country",
                          F.col("odate").cast("date").alias("day"))
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.max("price").alias("mx")))
        t = str(tmp_path / "mv_sub")
        M.refresh(build, t)
        j1 = ("dim", "ckey", "fact", "ckey")
        j2 = ("dim", "country", "dim2", "country")
        spec = M.MVSpec(
            name="snow", dims=("country", "day"),
            dim_types=("string", "date"),
            measures=(("count", "n"), ("max", "mx")),
            measure_sources=("*", "fact.price"),
            joins=(j1, j2),
            lossless_joins=tuple(
                {1: j1, 2: j2}[k] for k in lossless),
            dim_sources=("dim.country", "date:fact.odate"),
            rows_hint=10, table_dir=t, base_table="fact")
        for n, df in (("fact", fact), ("dim", dim), ("dim2", dim2)):
            df.createOrReplaceTempView(n)
        return dataclasses.replace(spec)

    def test_fact_only_query_routes_when_all_extra_lossless(
            self, spark, tmp_path):
        spec = self._mv(spark, tmp_path, lossless=[1, 2])
        q = ("SELECT date_trunc('month', odate) AS m, COUNT(*) AS n, "
             "MAX(price) AS mx FROM fact GROUP BY 1 ORDER BY m")
        df, used = M.sql_rewrite(spark, q, [spec],
                                 fallback=lambda _: 1 / 0)
        assert used == "snow"
        expect = spark.sql(q.replace(
            "date_trunc('month', odate)",
            "CAST(date_trunc('month', odate) AS DATE)")).collect()
        assert [tuple(r) for r in df.collect()] == \
            [tuple(r) for r in expect]

    def test_partial_join_query_routes_on_declared_subset(
            self, spark, tmp_path):
        spec = self._mv(spark, tmp_path, lossless=[2])
        # query performs j1; only the extra j2 must be lossless
        q = ("SELECT d.country, COUNT(*) AS n "
             "FROM fact f JOIN dim d ON f.ckey = d.ckey "
             "GROUP BY d.country ORDER BY country")
        df, used = M.sql_rewrite(spark, q, [spec],
                                 fallback=lambda _: 1 / 0)
        assert used == "snow"
        assert [tuple(r) for r in df.collect()] == [("DE", 2), ("FR", 2)]
        # ...but the fact-only query needs BOTH declared: refuse
        q2 = "SELECT COUNT(*) AS n FROM fact"
        _, used2 = M.sql_rewrite(spark, q2, [spec])
        assert used2 is None

    def test_undeclared_extra_join_refused(self, spark, tmp_path):
        spec = self._mv(spark, tmp_path, lossless=[])
        q = ("SELECT date_trunc('month', odate) AS m, COUNT(*) AS n "
             "FROM fact GROUP BY 1")
        _, used = M.sql_rewrite(spark, q, [spec])
        assert used is None

    def test_bare_dim_table_column_unreachable(self, spark, tmp_path):
        spec = self._mv(spark, tmp_path, lossless=[1, 2])
        # `country` is dim-sourced; a bare single-table query cannot
        # address it (it is not a fact column) — refuse, never guess
        q = "SELECT country, COUNT(*) AS n FROM fact GROUP BY 1"
        # the fallback itself would fail (country is not a fact column)
        # — the point is the resolver REFUSED rather than guessed
        _, used = M.sql_rewrite(spark, q, [spec],
                                fallback=lambda _q: None)
        assert used is None


class TestChangeFeedMaintenance:
    """Round-8: `mv.refresh_from_changes` — the view maintained from
    the base table's incremental change feed (preimages subtract,
    emptied groups tombstone), no caller-tracked state."""

    SPEC = M.MVSpec(name="cdfmv", dims=("k",),
                    measures=(("sum", "s"), ("count", "n")),
                    rows_hint=10)

    @staticmethod
    def _agg(df):
        return df.groupBy("k").agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).alias("n"))

    def _base(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base = str(tmp_path / "base")
        rows = [(i, "abc"[(i - 1) // 3], i * 10) for i in range(1, 10)]
        V.write_snapshot(spark.createDataFrame(
            rows, "id long, k string, v long").coalesce(1), base)
        return base

    def test_view_tracks_mor_base_changes(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base = self._base(spark, tmp_path)
        view = str(tmp_path / "view")
        M.refresh(self._agg(V.read_version(spark, base)), view,
                  mv=self.SPEC, base_version=V.latest_version(base))
        # MOR window: value update, group-key move, insert, mass delete
        V.upsert_mor(spark, base, spark.createDataFrame(
            [(2, "a", 100),          # a: 20 -> 100
             (5, "a", 50),           # moves from b to a
             (10, "d", 5)],          # brand-new group
            "id long, k string, v long").coalesce(1), "id")
        V.delete_where_keys(spark, base, "id", [7, 8, 9])  # c emptied
        v = M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                                   self._agg)
        assert v is not None
        got = {r["k"]: (r["s"], r["n"])
              for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in
                self._agg(V.read_version(spark, base)).collect()}
        assert got == want
        assert "c" not in got                   # emptied group retired
        # already current: no-op
        assert M.refresh_from_changes(spark, view, self.SPEC, base,
                                      "id", self._agg) is None

    def test_window_job_budget_no_existence_probes(self, spark,
                                                   tmp_path):
        """Round-10: a sum/count maintenance window runs NO existence
        probes — the minus aggregate rides into the signed combine
        lazily and the retire phase's emptiness check lives inside
        `delete_where_keys`'s own job.  Pinned via the job counter: the
        two removed `limit(1).count()` probes were one job each, so a
        reintroduction pushes the count past the budget."""
        from databox_adls_loader_spark.sinks import versioned as V

        base = self._base(spark, tmp_path)
        view = str(tmp_path / "view")
        M.refresh(self._agg(V.read_version(spark, base)), view,
                  mv=self.SPEC, base_version=V.latest_version(base))
        V.delete_where_keys(spark, base, "id", [7, 8, 9])  # c emptied
        sc = spark.sparkContext
        sc.setJobGroup("mvwin", "one maintenance window")
        try:
            assert M.refresh_from_changes(spark, view, self.SPEC, base,
                                          "id", self._agg) is not None
        finally:
            sc.setJobGroup(None, None)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("mvwin"))
        # measured 27 on this fixed window (delta + retire + upsert);
        # the old per-window probes made it 29
        assert n_jobs <= 27
        got = {r["k"] for r in M.read(spark, view).collect()}
        assert got == {"a", "b"}               # c retired

    def test_multiple_windows_accumulate(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base = self._base(spark, tmp_path)
        view = str(tmp_path / "view")
        M.refresh(self._agg(V.read_version(spark, base)), view,
                  mv=self.SPEC, base_version=V.latest_version(base))
        for i, (ids, newk) in enumerate([([1, 2], "b"), ([3], "c")]):
            V.upsert_mor(spark, base, spark.createDataFrame(
                [(j, newk, j * 10) for j in ids],
                "id long, k string, v long").coalesce(1), "id")
            M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                                   self._agg)
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in
                self._agg(V.read_version(spark, base)).collect()}
        assert got == want

    def test_minmax_refused_when_window_has_deletes(self, spark,
                                                    tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        spec = M.MVSpec(name="mm", dims=("k",),
                        measures=(("count", "n"), ("max", "hi")),
                        rows_hint=10)

        def agg(df):
            return df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.max("v").alias("hi"))

        base = self._base(spark, tmp_path)
        view = str(tmp_path / "view")
        M.refresh(agg(V.read_version(spark, base)), view, mv=spec,
                  base_version=V.latest_version(base))
        V.delete_where_keys(spark, base, "id", [1])
        with pytest.raises(M.MVRewriteError, match="min/max"):
            M.refresh_from_changes(spark, view, spec, base, "id", agg)
        # pure-append window: min/max still maintainable
        V.write_snapshot(spark.createDataFrame(
            [(11, "a", 999)], "id long, k string, v long").coalesce(1),
            base)
        # consume the delete via a full refresh first
        M.refresh(agg(V.read_version(spark, base)), view, mv=spec,
                  base_version=V.latest_version(base))

    def test_requires_watermark_and_count(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base = self._base(spark, tmp_path)
        view = str(tmp_path / "view")
        M.refresh(self._agg(V.read_version(spark, base)), view,
                  mv=self.SPEC)                 # no base_version
        V.delete_where_keys(spark, base, "id", [1])
        with pytest.raises(M.MVRewriteError, match="watermark"):
            M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                                   self._agg)
        nocount = M.MVSpec(name="nc", dims=("k",),
                           measures=(("sum", "s"),), rows_hint=1)
        view2 = str(tmp_path / "view2")
        M.refresh(V.read_version(spark, base).groupBy("k")
                  .agg(F.sum("v").cast("long").alias("s")),
                  view2, mv=nocount,
                  base_version=V.latest_version(base))
        V.delete_where_keys(spark, base, "id", [2])
        with pytest.raises(M.MVRewriteError, match="count"):
            M.refresh_from_changes(spark, view2, nocount, base, "id",
                                   lambda df: df.groupBy("k").agg(
                                       F.sum("v").cast("long")
                                       .alias("s")))


class TestMaintenanceCrashRecovery:
    """Round-9 (ADVICE high/medium): a maintenance that crashes between
    the retire commit (even ledger id 2·v) and the upsert (2·v+1) must
    be COMPLETED on retry, not silently skipped — the odd-only
    watermark plus `mv_pending_base_version` re-enter the exact
    half-applied window.  And an explicit rebuild to a watermark the
    ledger already holds must raise, never no-op."""

    SPEC = M.MVSpec(name="crashmv", dims=("k",),
                    measures=(("sum", "s"), ("count", "n")),
                    rows_hint=10)

    @staticmethod
    def _agg(df):
        return df.groupBy("k").agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).alias("n"))

    def _seed(self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base = str(tmp_path / "base")
        view = str(tmp_path / "view")
        rows = [(i, "abc"[(i - 1) // 3], i * 10) for i in range(1, 10)]
        V.write_snapshot(spark.createDataFrame(
            rows, "id long, k string, v long").coalesce(1), base)
        M.refresh(self._agg(V.read_version(spark, base)), view,
                  mv=self.SPEC, base_version=V.latest_version(base))
        return base, view

    def _crash_after_retire(self, spark, base, view, monkeypatch):
        """Drive one maintenance whose upsert phase dies, leaving the
        retire committed — the half-applied state the watermark parity
        bug misread as 'current'."""
        real = M.V.merge_into_snapshot

        def boom(*a, **kw):
            raise RuntimeError("injected crash before upsert phase")

        monkeypatch.setattr(M.V, "merge_into_snapshot", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                                   self._agg)
        monkeypatch.setattr(M.V, "merge_into_snapshot", real)

    def test_crash_between_phases_resumes(self, spark, tmp_path,
                                          monkeypatch):
        from databox_adls_loader_spark.sinks import versioned as V

        base, view = self._seed(spark, tmp_path)
        v0 = V.latest_version(base)
        # window: empty group c AND update group a (retire + upsert
        # both have work, so the crash leaves real divergence)
        V.upsert_mor(spark, base, spark.createDataFrame(
            [(1, "a", 500)], "id long, k string, v long").coalesce(1),
            "id")
        V.delete_where_keys(spark, base, "id", [7, 8, 9])
        self._crash_after_retire(spark, base, view, monkeypatch)
        # the half-applied window is visible, not absorbed: the
        # watermark still reads v0 (odd ids only) and the pending
        # version is the crashed target
        assert M.mv_base_watermark(view) == v0
        v_pend = M.mv_pending_base_version(view)
        assert v_pend is not None and v_pend > v0
        # retry completes the window (retire replays as no-op,
        # upsert lands) — previously returned None forever
        v = M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                                   self._agg)
        assert v is not None
        assert M.mv_pending_base_version(view) is None
        assert M.mv_base_watermark(view) == V.latest_version(base)
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in
                self._agg(V.read_version(spark, base)).collect()}
        assert got == want
        assert "c" not in got

    def test_crash_then_more_base_changes(self, spark, tmp_path,
                                          monkeypatch):
        """The widening hazard: after the crash the base keeps moving
        (including re-inserts into the retired group).  The retry must
        complete the ORIGINAL window first — a single widened window
        would re-derive the retired group against its already-deleted
        stored partials and lose the pre-crash contribution."""
        from databox_adls_loader_spark.sinks import versioned as V

        base, view = self._seed(spark, tmp_path)
        V.delete_where_keys(spark, base, "id", [7, 8, 9])  # c emptied
        self._crash_after_retire(spark, base, view, monkeypatch)
        # base moves on: c comes back with ONE new row
        V.write_snapshot(spark.createDataFrame(
            [(12, "c", 120)], "id long, k string, v long").coalesce(1),
            base)
        M.refresh_from_changes(spark, view, self.SPEC, base, "id",
                               self._agg)
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in
                self._agg(V.read_version(spark, base)).collect()}
        assert got == want
        assert got["c"] == (120, 1)     # only the re-inserted row

    def test_pending_window_minmax_still_refused(self, spark, tmp_path,
                                                 monkeypatch):
        """A crashed maintenance window containing deletes must STILL
        refuse min/max measures on the completion retry — a clear
        error, never a wrong view."""
        from databox_adls_loader_spark.sinks import versioned as V

        spec = M.MVSpec(name="mmcrash", dims=("k",),
                        measures=(("count", "n"), ("max", "hi")),
                        rows_hint=10)

        def agg(df):
            return df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.max("v").alias("hi"))

        base = str(tmp_path / "base")
        view = str(tmp_path / "view")
        rows = [(i, "ab"[i % 2], i * 10) for i in range(1, 7)]
        V.write_snapshot(spark.createDataFrame(
            rows, "id long, k string, v long").coalesce(1), base)
        M.refresh(agg(V.read_version(spark, base)), view, mv=spec,
                  base_version=V.latest_version(base))
        # fabricate the half-applied state directly: a retire-phase
        # commit under the even id for the next base version (the
        # min/max check must fire BEFORE any phase replays)
        V.delete_where_keys(spark, base, "id", [2, 4, 6])
        v_pend = V.latest_version(base)
        V.delete_where_keys(spark, view, "__mv_key",
                            ["zz-nonexistent"], prune=False,
                            batch_ids={2 * v_pend})
        assert M.mv_pending_base_version(view) == v_pend
        with pytest.raises(M.MVRewriteError, match="min/max"):
            M.refresh_from_changes(spark, view, spec, base, "id", agg)

    def test_rebuild_same_watermark_raises_unless_forced(
            self, spark, tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base, view = self._seed(spark, tmp_path)
        v0 = V.latest_version(base)
        build = self._agg(V.read_version(spark, base))
        with pytest.raises(M.MVRewriteError, match="force=True"):
            M.refresh(build, view, mv=self.SPEC, base_version=v0)
        # deliberate re-materialization: commits, watermark survives
        out = M.refresh(build, view, mv=self.SPEC, base_version=v0,
                        force=True)
        assert isinstance(out, int)
        assert M.mv_base_watermark(view) == v0
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in build.collect()}
        assert got == want


class TestStreamingCDFMaintenance:
    """Round-8 capstone: the view maintained by the change-feed STREAM
    (`mv.maintain_cdf_stream_batch` wired into foreachBatch) — the
    push twin of `refresh_from_changes`."""

    SPEC = M.MVSpec(name="cdfstream_mv", dims=("k",),
                    measures=(("sum", "s"), ("count", "n")),
                    rows_hint=10)

    @staticmethod
    def _agg(df):
        return df.groupBy("k").agg(
            F.sum("v").cast("long").alias("s"),
            F.count(F.lit(1)).alias("n"))

    def _drain(self, spark, base, view, ck):
        from databox_adls_loader_spark.sources.vtable_stream import \
            register_vtable_stream

        register_vtable_stream(spark)
        q = (spark.readStream.format("vtable_stream")
             .option("path", base).option("readchangefeed", "true")
             .load().writeStream
             .foreachBatch(lambda df, bid: M.maintain_cdf_stream_batch(
                 df, bid, view, self.SPEC, self._agg))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def test_stream_tracks_base_through_mor_changes(self, spark,
                                                    tmp_path):
        from databox_adls_loader_spark.sinks import versioned as V

        base, view = str(tmp_path / "base"), str(tmp_path / "view")
        ck = str(tmp_path / "ck")
        rows = [(i, "abc"[(i - 1) // 3], i * 10) for i in range(1, 10)]
        V.write_snapshot(spark.createDataFrame(
            rows, "id long, k string, v long").coalesce(1), base)
        self._drain(spark, base, view, ck)          # bootstrap batch
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        assert got == {"a": (60, 3), "b": (150, 3), "c": (240, 3)}
        # MOR window: value update, group move, insert, group emptied
        V.upsert_mor(spark, base, spark.createDataFrame(
            [(2, "a", 100), (5, "a", 50), (10, "d", 5)],
            "id long, k string, v long").coalesce(1), "id")
        V.delete_where_keys(spark, base, "id", [7, 8, 9])
        self._drain(spark, base, view, ck)
        got = {r["k"]: (r["s"], r["n"])
               for r in M.read(spark, view).collect()}
        want = {r["k"]: (r["s"], r["n"]) for r in
                self._agg(V.read_version(spark, base)).collect()}
        assert got == want and "c" not in got
        # replay: re-drain from the same checkpoint — nothing changes
        v_before = V.latest_version(view)
        self._drain(spark, base, view, ck)
        assert V.latest_version(view) == v_before
        got2 = {r["k"]: (r["s"], r["n"])
                for r in M.read(spark, view).collect()}
        assert got2 == want

    def test_empty_view_with_delete_batch_refused(self, spark,
                                                  tmp_path):
        df = spark.createDataFrame(
            [("a", 1, "delete")], "k string, v long, _change_type string")
        with pytest.raises(M.MVRewriteError, match="carries deletes"):
            M.maintain_cdf_stream_batch(df, 0, str(tmp_path / "v"),
                                        self.SPEC, self._agg)

"""Versioned-table maintenance surface: health advisor + token inverted
index (sinks/maintenance.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import maintenance as X
from databox_adls_loader_spark.sinks import versioned as V


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTokenIndex:
    def _table(self, spark, tmp_path):
        d = str(tmp_path / "t")
        # three commits -> three data files with (mostly) disjoint vocab
        V.write_snapshot(_docs(spark, [(1, "alpha beta"),
                                       (2, "alpha gamma")]).coalesce(1), d)
        V.write_snapshot(_docs(spark, [(3, "delta epsilon")]).coalesce(1), d)
        V.write_snapshot(_docs(spark, [(4, "zeta beta")]).coalesce(1), d)
        return d

    def test_index_read_equals_full_scan(self, spark, tmp_path):
        d = self._table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        assert X.build_token_index(spark, d, ix) == 1
        for tok in ("alpha", "beta", "delta", "zeta"):
            got = sorted(r["doc_id"] for r in
                         X.read_with_token(spark, d, ix, tok).collect())
            want = sorted(r["doc_id"] for r in
                          V.read_version(spark, d)
                          .filter(F.col("text").contains(tok)).collect())
            assert got == want, tok

    def test_index_prunes_files(self, spark, tmp_path):
        d = self._table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        X.build_token_index(spark, d, ix)
        idx = V.read_version(spark, ix)
        delta_files = [r["file"] for r in
                       idx.filter(F.col("token") == "delta")
                       .select("file").distinct().collect()]
        assert len(delta_files) == 1       # of 3 data files
        # and the read's plan lists exactly that file, not the others
        all_files = [r["file"] for r in
                     idx.select("file").distinct().collect()]
        df = X.read_with_token(spark, d, ix, "delta")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        hit = delta_files[0].rsplit("/", 1)[-1]
        assert hit in plan
        for f in all_files:
            base = f.rsplit("/", 1)[-1]
            if f != delta_files[0]:
                assert base not in plan

    def test_absent_token_is_empty_with_schema(self, spark, tmp_path):
        d = self._table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        X.build_token_index(spark, d, ix)
        out = X.read_with_token(spark, d, ix, "nosuchtoken")
        assert out.count() == 0
        assert set(out.columns) == {"doc_id", "text"}

    def test_stale_index_falls_back_to_full_scan(self, spark, tmp_path):
        d = self._table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        X.build_token_index(spark, d, ix)
        # new commit AFTER the index: contains the indexed token too
        V.write_snapshot(_docs(spark, [(9, "delta omega")]).coalesce(1), d)
        got = sorted(r["doc_id"] for r in
                     X.read_with_token(spark, d, ix, "delta").collect())
        assert got == [3, 9]               # new row found despite stale index
        # rebuilding restores the pruned path and the same answer
        X.build_token_index(spark, d, ix)
        got2 = sorted(r["doc_id"] for r in
                      X.read_with_token(spark, d, ix, "delta").collect())
        assert got2 == [3, 9]

    def test_residual_filter_guards_substrings(self, spark, tmp_path):
        """'alp' is a substring of 'alpha' but not a TOKEN — the index
        has no entry and the result must be empty, not a partial match."""
        d = self._table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        X.build_token_index(spark, d, ix)
        assert X.read_with_token(spark, d, ix, "alp").count() == 0


class TestTableHealth:
    def test_small_file_detection_and_compaction_clears_it(
            self, spark, tmp_path):
        d = str(tmp_path / "t")
        for i in range(5):                 # five 20-row files
            V.write_snapshot(
                spark.range(i * 20, (i + 1) * 20)
                .select(F.col("id").alias("k")).coalesce(1), d)
        h = X.table_health(d, small_file_rows=1000)
        assert h["n_files"] == 5 and h["total_rows"] == 100
        assert h["small_file_fraction"] == 1.0
        assert h["recommend_compact"]
        V.compact_snapshot(spark, d, n_files=1)
        h2 = X.table_health(d, small_file_rows=50)
        assert h2["n_files"] == 1
        assert not h2["recommend_compact"]

    def test_overlap_drops_after_clustering(self, spark, tmp_path):
        d = str(tmp_path / "t")
        # interleaved commits: every file spans the whole key range
        for i in range(4):
            V.write_snapshot(
                spark.range(1000).select(
                    ((F.col("id") * 4 + i) % 1000).alias("k"))
                .coalesce(1), d)
        h_before = X.table_health(d)
        assert h_before["bounds_overlap"]["k"] == 1.0   # all pairs overlap
        assert "k" in h_before["recommend_cluster_by"]
        V.compact_snapshot(spark, d, n_files=4, cluster_by=["k"])
        h_after = X.table_health(d)
        after = h_after["bounds_overlap"]["k"]
        assert after < 1.0
        if after <= 0.2:                   # disjoint enough: no advice
            assert "k" not in h_after["recommend_cluster_by"]

    def test_empty_table_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            X.table_health(str(tmp_path / "missing"))


class TestTokenIndexMergeOnRead:
    """The index read path must respect the version's merge-on-read
    overlays: DV-deleted rows stay deleted, renamed columns surface
    logical — the raw-parquet shortcut violated both."""

    def test_deleted_rows_do_not_resurface(self, spark, tmp_path):
        d, ix = str(tmp_path / "t"), str(tmp_path / "ix")
        V.write_snapshot(_docs(spark, [(1, "alpha beta"),
                                       (2, "alpha gamma")]).coalesce(1), d)
        V.delete_where(spark, d, "doc_id = 2")
        X.build_token_index(spark, d, ix)
        got = sorted(r["doc_id"] for r in
                     X.read_with_token(spark, d, ix, "alpha").collect())
        assert got == [1]                    # doc 2 is DV-deleted
        # a token ONLY deleted rows carried: index may point at the
        # file, but the read returns nothing
        assert X.read_with_token(spark, d, ix, "gamma").count() == 0

    def test_renamed_column_surfaces_logical(self, spark, tmp_path):
        d, ix = str(tmp_path / "t"), str(tmp_path / "ix")
        V.write_snapshot(_docs(spark, [(1, "alpha beta")]).coalesce(1), d)
        V.rename_column(d, "doc_id", "document_id")
        X.build_token_index(spark, d, ix)
        out = X.read_with_token(spark, d, ix, "alpha")
        assert out.columns == ["document_id", "text"]
        assert [r["document_id"] for r in out.collect()] == [1]

    def test_index_attribution_correct_under_dv_plan(self, spark, tmp_path):
        # regression: input_file_name() over read_version's multi-source
        # DV anti-join plan misattributed files; the _metadata-based
        # build must map every indexed file onto a manifest entry
        d, ix = str(tmp_path / "t"), str(tmp_path / "ix")
        V.write_snapshot(_docs(spark, [(1, "alpha")]).coalesce(1), d)
        V.write_snapshot(_docs(spark, [(2, "beta")]).coalesce(1), d)
        V.delete_where(spark, d, "doc_id = 1")
        X.build_token_index(spark, d, ix)
        st = V._st(d, spark)
        manifest = {st.canon(f) for f in V._read_manifest(
            d, V.latest_version(d))}
        indexed = {st.uri_canon(r["file"]) for r in
                   V.read_version(spark, ix).select("file")
                   .distinct().collect()}
        assert indexed <= manifest and indexed


class TestBucketAlignmentAdvisor:
    """Round-9 (verdict #5): `suggest_bucket_alignment` — the
    pair-level advisor that turns a hot two-exchange join into a
    declare-and-OPTIMIZE line."""

    def _tbl(self, spark, path, key, spec=None):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], f"{key}: long, v: string")
        V.write_snapshot(df, path,
                         partition_by=[spec] if spec else None)
        return path

    def test_aligned_pair(self, spark, tmp_path):
        l = self._tbl(spark, str(tmp_path / "l"), "k", "bucket(4,k)")
        r = self._tbl(spark, str(tmp_path / "r"), "j", "bucket(4,j)")
        out = X.suggest_bucket_alignment(l, r, "k", "j")
        assert out["aligned"] and not out["recommendations"]
        assert out["left_spec"] == "bucket(4,k)"

    def test_one_side_unbucketed_matches_partner(self, spark, tmp_path):
        l = self._tbl(spark, str(tmp_path / "l"), "k", "bucket(8,k)")
        r = self._tbl(spark, str(tmp_path / "r"), "j")
        out = X.suggest_bucket_alignment(l, r, "k", "j")
        assert not out["aligned"]
        assert out["recommendations"] == [
            f"declare bucket(8,j) on {r} and OPTIMIZE"]

    def test_count_mismatch_redeclares_smaller(self, spark, tmp_path):
        l = self._tbl(spark, str(tmp_path / "l"), "k", "bucket(8,k)")
        r = self._tbl(spark, str(tmp_path / "r"), "j", "bucket(4,j)")
        out = X.suggest_bucket_alignment(l, r, "k", "j")
        assert not out["aligned"]
        assert len(out["recommendations"]) == 1
        rec = out["recommendations"][0]
        assert "bucket(" in rec and "OPTIMIZE" in rec

    def test_redeclares_by_bytes_not_file_count(self, spark, tmp_path):
        """Round-10 (ADVICE low): the cheaper-rewrite side is chosen by
        manifest BYTES — a small-file-heavy but row-light table must be
        the one re-declared, even though it has MORE files than its
        row-heavy partner."""
        l = str(tmp_path / "l")
        r = str(tmp_path / "r")
        # left: row-HEAVY but few files (bucket(2): 2 files, 4000 rows)
        V.write_snapshot(
            spark.createDataFrame(
                [(i, "x" * 50) for i in range(4000)],
                "k: long, v: string"),
            l, partition_by=["bucket(2,k)"])
        # right: row-light but file-heavy (bucket(8): 8 tiny files)
        V.write_snapshot(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(16)], "j: long, v: string"),
            r, partition_by=["bucket(8,j)"])
        out = X.suggest_bucket_alignment(l, r, "k", "j")
        assert not out["aligned"]
        # the LIGHT side (right, more files, fewer bytes) re-declares
        # to the heavy side's count
        assert out["recommendations"] == [
            f"declare bucket(2,j) on {r} and OPTIMIZE"]

    def test_neither_bucketed_uses_default(self, spark, tmp_path):
        l = self._tbl(spark, str(tmp_path / "l"), "k")
        r = self._tbl(spark, str(tmp_path / "r"), "j")
        out = X.suggest_bucket_alignment(l, r, "k", "j",
                                         default_buckets=16)
        assert [f"declare bucket(16,k) on {l} and OPTIMIZE",
                f"declare bucket(16,j) on {r} and OPTIMIZE"] == \
            out["recommendations"]

    def test_following_the_recommendation_aligns(self, spark, tmp_path):
        """Closing the advisor loop: apply the emitted
        declare-and-OPTIMIZE line to the unbucketed side and the
        aligned join ENGAGES and matches the plain join."""
        l = self._tbl(spark, str(tmp_path / "l"), "k", "bucket(4,k)")
        r = self._tbl(spark, str(tmp_path / "r"), "j")
        rec = X.suggest_bucket_alignment(l, r, "k", "j")
        assert rec["recommendations"] == [
            f"declare bucket(4,j) on {r} and OPTIMIZE"]
        V.set_partition_spec(r, ["bucket(4,j)"])
        V.compact_snapshot(spark, r)          # converge to the layout
        after = X.suggest_bucket_alignment(l, r, "k", "j")
        assert after["aligned"] is True
        j = V.bucket_aligned_join(spark, l, r, "k", "j")
        assert j is not None
        got = {(row[0], row[2]) for row in j.collect()}
        assert got == {(i, i) for i in range(40)}


class TestIndexDriftReport:
    """The operated drift trigger (round-13): exact-integer TV ppm of a
    live code table against its publish-time baseline histogram."""

    def _codes(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, sub int, code int")

    def test_quiet_at_publish(self, spark):
        # live == the table the baseline was taken from -> tv exactly 0
        idx = self._codes(spark, [(i, s, (i + s) % 4)
                                  for i in range(40) for s in range(2)])
        base = X.code_baseline(idx, 0)
        rep = {r["sub"]: r for r in
               X.index_drift_report(idx, base).collect()}
        assert set(rep) == {0, 1}
        for r in rep.values():
            assert r["tv_ppm"] == 0
            assert not r["retrain_recommended"]

    def test_fires_on_planted_drift(self, spark):
        # baseline: codes uniform over {0,1,2,3}; drifted live table
        # funnels a same-sized delta entirely onto code 0 -> TV = 3/8
        # exactly = 375000 ppm on each subspace
        pre = [(i, s, i % 4) for i in range(40) for s in range(2)]
        delta = [(1000 + i, s, 0) for i in range(40) for s in range(2)]
        idx = self._codes(spark, pre + delta)
        base = X.code_baseline(self._codes(spark, pre), 0)
        rep = {r["sub"]: r for r in
               X.index_drift_report(idx, base).collect()}
        for r in rep.values():
            assert r["tv_ppm"] == 375_000
            assert r["retrain_recommended"]

    def test_floor_is_a_parameter(self, spark):
        pre = [(i, 0, i % 4) for i in range(40)]
        delta = [(1000 + i, 0, 0) for i in range(40)]
        idx = self._codes(spark, pre + delta)
        base = X.code_baseline(self._codes(spark, pre), 0)
        quiet = X.index_drift_report(idx, base,
                                     floor_ppm=400_000).collect()[0]
        assert not quiet["retrain_recommended"]

    def test_baseline_codes_absent_from_live(self, spark):
        # a code present at publish but empty live still contributes
        # |0*nb - n_base*nc| mass (full-outer join, not inner)
        pre = [(i, 0, i % 2) for i in range(40)]        # codes {0,1}
        live = [(i, 0, 2) for i in range(40)]           # all on code 2
        rep = X.index_drift_report(
            self._codes(spark, live),
            X.code_baseline(self._codes(spark, pre), 0)).collect()[0]
        assert rep["tv_ppm"] == 1_000_000               # disjoint: TV=1
        assert rep["retrain_recommended"]

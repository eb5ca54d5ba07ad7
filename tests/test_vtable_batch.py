"""DSv2 BATCH reader over the versioned table (sources/vtable_batch):
spark.read.format("vtable") must reproduce read_version's contract —
pinning, pruning, delete vectors, column mapping — through Spark's own
reader interface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import versioned as V
from databox_adls_loader_spark.sources.vtable_batch import (
    VTableBatchReader, register_vtable)


def _fmt(spark, t, **opts):
    register_vtable(spark)
    r = spark.read.format("vtable").option("path", t)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestVTableFormat:
    def test_plain_read_matches_read_version(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"s{i}") for i in range(100)], "id long, s string")
        V.write_snapshot(df.repartition(4), t)
        assert _rows(_fmt(spark, t)) == _rows(V.read_version(spark, t))

    def test_version_and_as_of_pinning(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long"), t)
        ts_between = V._read_manifest_doc(t, 1)["committed_at"]
        V.write_snapshot(spark.createDataFrame([(2,)], "id long"), t)
        assert _rows(_fmt(spark, t, version="1")) == {(1,)}
        assert _rows(_fmt(spark, t)) == {(1,), (2,)}
        assert _rows(_fmt(spark, t, as_of=ts_between)) == {(1,)}

    def test_filter_prunes_partitions_and_stays_exact(self, spark, tmp_path):
        from pyspark.sql.datasource import EqualTo

        t = str(tmp_path / "t")
        df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        V.write_snapshot(df, t)
        V.compact_snapshot(spark, t, n_files=4, cluster_by=["id"])
        # unit-level: the pushed filter must shrink partitions()
        rd_all = VTableBatchReader({"path": t}, None)
        rd = VTableBatchReader({"path": t}, None)
        residual = list(rd.pushFilters([EqualTo(("id",), 5)]))
        assert len(residual) == 1            # everything stays residual
        assert len(rd.partitions()) < len(rd_all.partitions()) == 4
        # end to end: result identical to the raw predicate
        got = _fmt(spark, t).filter("id < 10")
        assert _rows(got) == {(i,) for i in range(10)}

    def test_delete_vectors_apply(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(1000).coalesce(3), t)
        V.delete_where(spark, t, "id % 3 = 0")
        want = _rows(V.read_version(spark, t))
        assert _rows(_fmt(spark, t)) == want
        assert all(r[0] % 3 for r in want)

    def test_column_mapping_surfaces_logical(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame(
            [(1, "a", 9)], "id long, s string, junk long").coalesce(1), t)
        V.rename_column(t, "id", "doc_id")
        V.drop_column(t, "junk")
        out = _fmt(spark, t)
        assert out.columns == ["doc_id", "s"]
        assert _rows(out) == {(1, "a")}
        # pushed predicate on the RENAMED column still prunes (logical
        # name → physical stats key)
        got = out.filter(F.col("doc_id") == 1)
        assert _rows(got) == {(1, "a")}

    def test_additive_evolution_fills_nulls(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long")
                         .coalesce(1), t)
        V.write_snapshot(spark.createDataFrame(
            [(2, "x")], "id long, s string").coalesce(1), t)
        out = _fmt(spark, t)
        assert set(out.columns) == {"id", "s"}
        assert _rows(out) == {(1, None), (2, "x")}

    def test_empty_table_raises(self, spark, tmp_path):
        from pyspark.errors import AnalysisException

        with pytest.raises((AnalysisException, ValueError)):
            _fmt(spark, str(tmp_path / "none")).collect()


class TestVTableFormatWriter:
    """DSv2 WRITE path: df.write.format('vtable') commits through the
    manifest log with the same atomicity/stats contract as
    write_snapshot."""

    def test_append_and_overwrite_roundtrip(self, spark, tmp_path):
        t = str(tmp_path / "t")
        a = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "id long, s string")
        register_vtable(spark)
        a.write.format("vtable").option("path", t).mode("append").save()
        assert V.latest_version(t) == 1
        b = spark.createDataFrame([(3, "c")], "id long, s string")
        b.write.format("vtable").option("path", t).mode("append").save()
        assert _rows(V.read_version(spark, t)) == {(1, "a"), (2, "b"),
                                                   (3, "c")}
        # manifest stats were computed for the written files
        doc = V._read_manifest_doc(t, 2)
        assert set(doc["stats"]) == set(doc["files"])
        # overwrite logically replaces; history stays readable
        b.write.format("vtable").option("path", t) \
            .mode("overwrite").save()
        assert _rows(V.read_version(spark, t)) == {(3, "c")}
        assert _rows(V.read_version(spark, t, 2)) == {(1, "a"), (2, "b"),
                                                      (3, "c")}

    def test_written_table_reads_back_through_format(self, spark,
                                                     tmp_path):
        t = str(tmp_path / "t")
        register_vtable(spark)
        spark.range(100).write.format("vtable").option("path", t) \
            .mode("append").save()
        got = _rows(spark.read.format("vtable").option("path", t).load())
        assert got == {(i,) for i in range(100)}

    def test_append_into_renamed_table_lands_physical(self, spark,
                                                      tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame(
            [(1, "a")], "id long, s string").coalesce(1), t)
        V.rename_column(t, "id", "doc_id")
        register_vtable(spark)
        # the batch arrives with LOGICAL names
        spark.createDataFrame([(2, "b")], "doc_id long, s string") \
            .write.format("vtable").option("path", t) \
            .mode("append").save()
        out = V.read_version(spark, t)
        assert out.columns == ["doc_id", "s"]
        assert _rows(out) == {(1, "a"), (2, "b")}

    def test_checked_table_refuses_format_writes(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.createDataFrame([(1,)], "id long"),
                         t, checks=["id > 0"])
        register_vtable(spark)
        with pytest.raises(Exception, match="CHECK constraints"):
            spark.range(5).select(F.col("id")).write.format("vtable") \
                .option("path", t).mode("append").save()
        assert V.latest_version(t) == 1

    def test_empty_append_is_a_no_op(self, spark, tmp_path):
        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(3).coalesce(1), t)
        register_vtable(spark)
        spark.range(3).filter("id < 0").write.format("vtable") \
            .option("path", t).mode("append").save()
        assert V.latest_version(t) == 1


class TestVTableStreamWriter:
    """writeStream.format('vtable'): native streaming sink with the
    commit_stream_batch exactly-once ledger contract."""

    def test_stream_into_table_end_to_end(self, spark, tmp_path):
        src, t = str(tmp_path / "src"), str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        spark.createDataFrame([(i, f"s{i}") for i in range(8)],
                              "id long, s string").write.parquet(src)
        register_vtable(spark)
        q = (spark.readStream.schema("id long, s string").parquet(src)
             .writeStream.format("vtable").option("path", t)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert _rows(V.read_version(spark, t)) == {
            (i, f"s{i}") for i in range(8)}
        assert V.committed_batch_ids(t) == {0}

    def test_replayed_batch_discards_files_and_skips(self, spark,
                                                     tmp_path):
        from databox_adls_loader_spark.sources.vtable_batch import (
            VTableStreamWriter, _WroteFiles)

        t = str(tmp_path / "t")
        V.write_snapshot(spark.range(3).coalesce(1), t)
        w = VTableStreamWriter({"path": t}, None, overwrite=False)
        # simulate two task outputs for batch 7, commit once
        import pyarrow as pa
        import pyarrow.parquet as pq
        import os
        os.makedirs(f"{t}/data/w-test", exist_ok=True)
        f1 = f"{t}/data/w-test/part-a.parquet"
        pq.write_table(pa.table({"id": [100]}), f1)
        w.commit([_WroteFiles((f1,))], batchId=7)
        assert V.committed_batch_ids(t) == {7}
        v_after = V.latest_version(t)
        # crash-replay: same batch id, freshly rewritten file
        f2 = f"{t}/data/w-test/part-b.parquet"
        pq.write_table(pa.table({"id": [100]}), f2)
        w.commit([_WroteFiles((f2,))], batchId=7)
        assert V.latest_version(t) == v_after      # no new version
        assert not os.path.exists(f2)              # replay files dropped
        assert V.read_version(spark, t).count() == 4


def test_dv_mask_across_arrow_batch_boundaries(spark, tmp_path):
    """A file larger than one Arrow batch (iter_batches yields 64k-row
    chunks) with deletions spanning the chunk boundary: the running
    offset must keep file-positions aligned in every chunk."""
    t = str(tmp_path / "t")
    n = 200_000
    V.write_snapshot(spark.range(n).coalesce(1), t)
    # delete a range that straddles the first 65 536-row batch boundary
    # plus a scattered tail in the third batch
    V.delete_where(spark, t, "(id >= 65000 AND id < 66000) "
                             "OR (id >= 150000 AND id % 97 = 0)")
    register_vtable(spark)
    got = spark.read.format("vtable").option("path", t).load()
    want = V.read_version(spark, t)
    assert got.count() == want.count()
    assert got.agg(F.sum("id")).collect()[0][0] == \
        want.agg(F.sum("id")).collect()[0][0]
    # spot-check the boundary region row-for-row
    g = sorted(r["id"] for r in got.filter(
        "id >= 64990 AND id < 66010").collect())
    assert g == [i for i in range(64990, 66010)
                 if not (65000 <= i < 66000)]


def test_dsv2_reader_prunes_by_hidden_partitioning(spark, tmp_path):
    """partitions() must compose transform-space pruning with footer
    stats (round-7 advice: the DSv2 path honored stats only, diluting
    the layout contract)."""
    import datetime

    from databox_adls_loader_spark.sources.vtable_batch import (
        VTableBatchReader,
    )

    t = str(tmp_path / "t")
    rows = [(i, datetime.date(1995, 1 + (i % 12), 1)) for i in range(48)]
    df = spark.createDataFrame(rows, "k: long, d: date")
    V.write_snapshot(df, t, partition_by=["month(d)"])
    from pyspark.sql.datasource import EqualTo

    rd_all = VTableBatchReader({"path": t}, None)
    rd = VTableBatchReader({"path": t}, None)
    list(rd.pushFilters([EqualTo(("d",), "1995-03-01")]))
    n_all, n_kept = len(rd_all.partitions()), len(rd.partitions())
    assert 0 < n_kept < n_all


def test_dsv2_writer_refuses_partitioned_table(spark, tmp_path):
    import datetime

    from databox_adls_loader_spark.sources.vtable_batch import VTableWriter

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(1995, 1, 1))], "k: long, d: date")
    V.write_snapshot(df, t, partition_by=["month(d)"])
    with pytest.raises(ValueError, match="hidden partitioning"):
        VTableWriter({"path": t}, None, overwrite=False)

"""Type widening on the versioned table (the Iceberg-V3/Delta
type-widening shape): metadata-only promotion, up-cast reads over mixed
physical widths, write-time schema contract, DSv2 integration."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databox_adls_loader_spark.sinks import versioned as V


@pytest.fixture(params=["local", "hadoop"])
def troot(request, tmp_path):
    if request.param == "local":
        return str(tmp_path)
    return f"file://{tmp_path}"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _type_of(df, col):
    return dict(df.dtypes)[col]


def test_widen_int_to_long_reads_mixed_files(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a"), (2, "b")], "x: int, s: string"), t)
    assert _type_of(V.read_version(spark, t), "x") == "int"
    v = V.widen_column(t, "x", "bigint")
    assert v == 2
    # metadata-only: no new data file
    assert V._read_manifest(t, 1) == V._read_manifest(t, 2)
    df = V.read_version(spark, t)
    assert _type_of(df, "x") == "bigint"
    # append a genuinely 64-bit batch; old int files up-cast at read
    V.write_snapshot(spark.createDataFrame(
        [(1 << 40, "c")], "x: long, s: string"), t)
    assert _rows(V.read_version(spark, t)) \
        == {(1, "a"), (2, "b"), (1 << 40, "c")}
    # time travel: v1 still reads the narrow type
    assert _type_of(V.read_version(spark, t, 1), "x") == "int"


def test_append_wider_without_widen_refused(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "x: int"), t)
    with pytest.raises(ValueError, match="widen_column"):
        V.write_snapshot(spark.createDataFrame([(1 << 40,)], "x: long"), t)
    # ...and a conflicting type is refused with the conflict named
    with pytest.raises(ValueError, match="conflicts"):
        V.write_snapshot(spark.createDataFrame([("x",)], "x: string"), t)
    # no stray files from the refused writes
    assert len(V._read_manifest(t, V.latest_version(t))) == \
        len(V._read_manifest(t, 1))


def test_narrower_append_upcasts(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1 << 40,)], "x: long"), t)
    V.write_snapshot(spark.createDataFrame([(5,)], "x: int"), t)
    df = V.read_version(spark, t)
    assert _type_of(df, "x") == "bigint"
    assert _rows(df) == {(1 << 40,), (5,)}


def test_float_double_and_decimal_widening(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1.5,)], "y: float"), t)
    V.widen_column(t, "y", "double")
    V.write_snapshot(spark.createDataFrame([(2.25,)], "y: double"), t)
    assert _rows(V.read_version(spark, t)) == {(1.5,), (2.25,)}

    t2 = troot + "/tbl2"
    V.write_snapshot(
        spark.createDataFrame([(1,)], "z: int")
        .select(F.col("z").cast("decimal(10,2)").alias("z")), t2)
    V.widen_column(t2, "z", "decimal(20,2)")
    V.write_snapshot(
        spark.createDataFrame([(10 ** 15,)], "z: long")
        .select(F.col("z").cast("decimal(20,2)").alias("z")), t2)
    df = V.read_version(spark, t2)
    assert _type_of(df, "z") == "decimal(20,2)"
    assert df.count() == 2


def test_invalid_widenings_refused(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1 << 40, "s")], "x: long, s: string"), t)
    with pytest.raises(ValueError, match="not a supported widening"):
        V.widen_column(t, "x", "int")          # narrowing
    with pytest.raises(ValueError, match="not a supported widening"):
        V.widen_column(t, "s", "bigint")       # unrelated
    with pytest.raises(ValueError, match="already has type"):
        V.widen_column(t, "x", "bigint")
    with pytest.raises(ValueError, match="not in the stored schema"):
        V.widen_column(t, "nope", "bigint")
    with pytest.raises(ValueError, match="unsupported widening target"):
        V.widen_column(t, "x", "map<string,int>")


def test_legacy_manifest_without_schema(spark, troot):
    """Tables written before schema tracking: widen refuses loudly and
    reads stay on the mergeSchema discovery path; the next write
    records a schema and unlocks widening."""
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,)], "x: int"), t)
    st = V._st(t)
    mp = V._manifest_path(st, t, 1)
    doc = json.loads(st.read_text(mp))
    del doc["schema"]
    st.delete(mp)
    st.create_exclusive(mp, json.dumps(doc))
    assert V.table_schema(t) is None
    with pytest.raises(ValueError, match="no stored schema"):
        V.widen_column(t, "x", "bigint")
    assert _rows(V.read_version(spark, t)) == {(1,)}       # legacy read
    V.write_snapshot(spark.createDataFrame([(2,)], "x: int"), t)
    assert V.table_schema(t) is not None                   # recorded now
    V.widen_column(t, "x", "bigint")
    assert _type_of(V.read_version(spark, t), "x") == "bigint"


def test_pruning_and_delete_on_widened_table(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "x: int, s: string")
        .repartition(4), t)
    V.widen_column(t, "x", "bigint")
    V.write_snapshot(spark.createDataFrame(
        [(1 << 40, "big")], "x: long, s: string"), t)
    # stats skipping with a long literal over int-era file stats
    got = _rows(V.read_version(spark, t, predicates=[("x", ">=", 90)]))
    assert got == {(i, f"r{i}") for i in range(90, 100)} | {(1 << 40, "big")}
    # merge-on-read delete over the mixed-width scan
    V.delete_where(spark, t, "x >= 95 AND x < 100")
    assert V.read_version(spark, t).count() == 96
    assert (1 << 40,) in {(r["x"],) for r in
                          V.read_version(spark, t).select("x").collect()}


def test_eq_tombstones_across_key_widen(spark, troot):
    """Round-9 (ADVICE low): equality-delete entries written BEFORE a
    key-column widen carry a narrower __val; the consolidated read
    (`_eq_anti_all`) unions them with post-widen entries, so the union
    must read with mergeSchema — without it the combined type depends
    on which file seeds inference (read failure or mis-compare)."""
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "x: int, s: string")
        .coalesce(1), t)
    V.delete_where_keys(spark, t, "x", [1, 2])       # int-era entry
    V.widen_column(t, "x", "bigint")
    V.write_snapshot(spark.createDataFrame(
        [(1 << 40, "big")], "x: long, s: string"), t)
    V.delete_where_keys(spark, t, "x", [3, 1 << 40])  # long-era entry
    got = {r["x"] for r in V.read_version(spark, t).collect()}
    assert got == {0, 4, 5, 6, 7, 8, 9}


def test_compaction_materializes_wide_type(spark, troot):
    import pyarrow.parquet as pq

    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame([(1,), (2,)], "x: int"), t)
    V.widen_column(t, "x", "bigint")
    v = V.compact_snapshot(spark, t, n_files=1)
    st = V._st(t)
    files = V._read_manifest(t, v)
    arrow = pq.ParquetFile(st.parquet_source(files[0])).schema_arrow
    assert str(arrow.field("x").type) == "int64"   # physically widened
    assert _rows(V.read_version(spark, t)) == {(1,), (2,)}
    # appends after compaction keep the wide contract
    V.write_snapshot(spark.createDataFrame([(1 << 40,)], "x: long"), t)
    assert V.read_version(spark, t).count() == 3


def test_widen_then_rename_and_merge(spark, troot):
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, 10), (2, 20)], "k: int, v: int"), t)
    V.widen_column(t, "v", "bigint")
    V.rename_column(t, "v", "amount")
    df = V.read_version(spark, t)
    assert _type_of(df, "amount") == "bigint"
    # widen addresses the LOGICAL name post-rename
    V.widen_column(t, "k", "bigint")
    upd = spark.createDataFrame([(2, 1 << 40), (3, 30)],
                                "k: long, amount: long")
    V.merge_into_snapshot(spark, t, upd, "k")
    assert _rows(V.read_version(spark, t).select("k", "amount")) \
        == {(1, 10), (2, 1 << 40), (3, 30)}


def test_dsv2_roundtrip_on_widened_table(spark, troot):
    from databox_adls_loader_spark.sources.vtable_batch import \
        register_vtable

    register_vtable(spark)
    t = troot + "/tbl"
    V.write_snapshot(spark.createDataFrame(
        [(1, "a")], "x: int, s: string"), t)
    V.widen_column(t, "x", "bigint")
    # format reader advertises + delivers the widened type
    df = spark.read.format("vtable").option("path", t).load()
    assert _type_of(df, "x") == "bigint"
    assert _rows(df) == {(1, "a")}
    # format writer: narrow append up-casts, wide append refused
    (spark.createDataFrame([(2, "b")], "x: int, s: string")
     .write.format("vtable").mode("append").option("path", t).save())
    assert _rows(spark.read.format("vtable").option("path", t).load()) \
        == {(1, "a"), (2, "b")}
    with pytest.raises(Exception, match="conflicts"):
        (spark.createDataFrame([(1.0, "c")], "x: double, s: string")
         .write.format("vtable").mode("append").option("path", t).save())
    # a genuinely WIDER DSv2 append is refused pointing at widen_column
    t2 = troot + "/tbl2"
    V.write_snapshot(spark.createDataFrame([(1,)], "x: int"), t2)
    with pytest.raises(Exception, match="widen_column"):
        (spark.createDataFrame([(1 << 40,)], "x: long")
         .write.format("vtable").mode("append").option("path", t2).save())
    # the DSv2 commit recorded the schema: a long append via the
    # library still sees the widened contract
    V.write_snapshot(spark.createDataFrame(
        [(1 << 40, "d")], "x: long, s: string"), t)
    assert spark.read.format("vtable").option("path", t).load() \
        .count() == 3


def test_merge_append_schema_pure():
    s = T.StructType([T.StructField("a", T.LongType(), True)])
    b = T.StructType([T.StructField("a", T.IntegerType(), True),
                      T.StructField("b", T.StringType(), True)])
    m = V._merge_append_schema(s, b)
    assert [f.name for f in m.fields] == ["a", "b"]
    assert isinstance(m["a"].dataType, T.LongType)
    assert V._merge_append_schema(None, b) == V._nullable(b)
    with pytest.raises(ValueError):
        V._merge_append_schema(
            T.StructType([T.StructField("a", T.IntegerType(), True)]), s)

"""Tests for the Python DataSource (DSv2) usage_du format."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from databox_adls_loader_spark.sources.pyds import (
    parse_usage_line,
    register_usage_du,
)
from databox_adls_loader_spark.sources.usage import parse_usage_lines


DU_A = """\
1024 3072 /data/a/file1
2048 /data/a/file2

512 1536 /data/a/sub dir/file 3
"""

DU_B = "99 /data/b/only\n"


def _write(tmp_path, name, content):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as fh:
        fh.write(content)
    return p


def test_parse_usage_line_variants():
    assert parse_usage_line("1024 3072 /d/f") == ("/d/f", 1024, 0)
    assert parse_usage_line("2048 /d/g") == ("/d/g", 2048, 0)
    assert parse_usage_line("   ") is None
    # source_dir anchoring keeps whitespace paths intact
    assert parse_usage_line("512 1536 /d/a b/c", "/d/") == ("/d/a b/c", 512, 0)


def test_usage_du_reads_directory_in_parallel(spark, tmp_path):
    _write(tmp_path, "du-a.txt", DU_A)
    _write(tmp_path, "du-b.txt", DU_B)
    register_usage_du(spark)
    df = spark.read.format("usage_du").load(str(tmp_path))
    rows = {r["path"]: r["size"] for r in df.collect()}
    # without source_dir the path is the LAST token — a whitespace path
    # degrades to its tail ("3"), the documented limitation the
    # source_dir option exists to fix
    assert rows == {"/data/a/file1": 1024, "/data/a/file2": 2048,
                    "3": 512, "/data/b/only": 99}
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    assert df.schema.simpleString() == \
        "struct<path:string,size:bigint,unit:int>"


def test_usage_du_source_dir_matches_projection_parser(spark, tmp_path):
    f = _write(tmp_path, "du.txt", DU_A)
    register_usage_du(spark)
    ds = (spark.read.format("usage_du").option("source_dir", "/data/")
          .load(f).orderBy("path"))
    via_text = parse_usage_lines(
        spark.read.text(f), source_dir="/data/").orderBy("path")
    got = [(r["path"], r["size"], r["unit"]) for r in ds.collect()]
    want = [(r["path"], r["size"], r["unit"]) for r in via_text.collect()]
    assert got == want
    assert "/data/a/sub dir/file 3" in {p for p, _, _ in got}


def test_usage_du_source_dir_missing_line_matches_parser(spark, tmp_path):
    """A du line from OUTSIDE source_dir: Spark's substring(value,
    instr()=0) yields the whole raw line — the DSv2 reader must mirror
    that, not fall back to the last token."""
    content = "123 456 /other/mount/file\n77 /data/c/inside\n"
    f = _write(tmp_path, "du_mixed.txt", content)
    register_usage_du(spark)
    ds = (spark.read.format("usage_du").option("source_dir", "/data/")
          .load(f).orderBy("path"))
    via_text = parse_usage_lines(
        spark.read.text(f), source_dir="/data/").orderBy("path")
    got = [(r["path"], r["size"], r["unit"]) for r in ds.collect()]
    want = [(r["path"], r["size"], r["unit"]) for r in via_text.collect()]
    assert got == want
    assert ("123 456 /other/mount/file", 123, 0) in got


def test_usage_du_feeds_s3_aggregation(spark, tmp_path):
    _write(tmp_path, "du.txt", DU_A)
    register_usage_du(spark)
    df = spark.read.format("usage_du").load(str(tmp_path))
    total = df.agg(F.sum("size").alias("s")).collect()[0]["s"]
    assert total == 1024 + 2048 + 512

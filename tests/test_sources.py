"""Golden-output tests for the parsers and sources (SURVEY §5.2) — the
cases with tricky positional semantics."""

from __future__ import annotations

from databox_adls_loader_spark import fixtures
from databox_adls_loader_spark.sources.acl_scan import assemble_acl_records, lines_df
from databox_adls_loader_spark.sources.inventory import project_inventory
from databox_adls_loader_spark.sources.usage import parse_usage_lines


def test_usage_parser_two_and_three_column(spark):
    lines = spark.createDataFrame(
        [("1024  /data/a",),            # 2-column
         ("2048  6144  /data/b",),      # 3-column (with replication)
         ("   ",),                      # blank → dropped
         ("7  /data/with  space",)],    # path is last token (reference anchors on suffix)
        "value: string")
    rows = {r["path"]: (r["size"], r["unit"])
            for r in parse_usage_lines(lines).collect()}
    assert rows["/data/a"] == (1024, 0)
    assert rows["/data/b"] == (2048, 0)
    assert "space" in rows  # suffix-anchored, like parseUsageLine
    assert len(rows) == 3


def test_inventory_projection_fields(spark):
    inv = fixtures.file_inventory(spark, seed=42, n_dirs=10, files_per_dir=3)
    rows = inv.collect()
    assert len(rows) > 10
    folders = [r for r in rows if r["is_folder"]]
    files = [r for r in rows if not r["is_folder"]]
    assert folders and files
    for r in rows:
        # parent_directory == dirname(name)
        expect = r["name"].rsplit("/", 1)[0] if "/" in r["name"] else ""
        assert r["parent_directory"] == expect
        # permissions struct parsed from hdi_permission JSON
        assert r["permissions"]["owner"]
        assert r["permissions"]["group"]
        # reserved keys stripped from residual metadata
        assert "hdi_permission" not in r["metadata"]
        assert "hdi_isfolder" not in r["metadata"]


def test_multiline_acl_assembly(spark):
    lines = fixtures.getfacl_text(seed=42, n_files=12)
    df = assemble_acl_records(lines_df(spark, lines), strip_prefix_components=1)
    rows = {r["file"]: r for r in df.collect()}
    assert len(rows) == 12
    for f, r in rows.items():
        assert not f.startswith("/data")      # P7 strip applied
        assert r["owner"] and r["group"]
        assert r["acl"][0] == "user::rwx"     # entry order preserved
        assert r["acl"][-1] == "other::---"
        for e in r["acl"]:
            assert "#" not in e               # P9 effective-comment strip


def test_acl_assembly_keeps_4field_entries(spark):
    lines = [
        "# file: /data/x",
        "# owner: alice",
        "# group: devs",
        "user::rwx",
        "default:user:bob:rwx",
        "other::---",
        "",
    ]
    df = assemble_acl_records(lines_df(spark, lines))
    r = df.collect()[0]
    assert r["file"] == "x"
    assert r["acl"] == ["user::rwx", "default:user:bob:rwx", "other::---"]


def test_acl_assembly_strips_tab_separated_annotations(spark):
    # getfacl separates the `#effective:` annotation with a TAB — the
    # stripped entry must not keep trailing whitespace
    lines = [
        "# file: /data/y",
        "# owner: bob",
        "# group: ops",
        "user:carol:rw-\t#effective:r--",
        "",
    ]
    r = assemble_acl_records(lines_df(spark, lines)).collect()[0]
    assert r["acl"] == ["user:carol:rw-"]


def test_permissive_json_read_keeps_corrupt_records(spark, tmp_path):
    # SURVEY §1.3: schema-on-read with PERMISSIVE mode for external text —
    # malformed rows land in _corrupt_record instead of failing the scan
    p = tmp_path / "mixed.json"
    p.write_text('\n'.join([
        '{"type": "user", "source": "alice", "target": "aad-alice"}',
        'this is not json at all',
        '{"type": "group", "source": "ops"}',          # missing field -> null
        '{"type": "user", "source": "bob", "target": 7}',  # wrong type
    ]))
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([
        StructField("type", StringType()),
        StructField("source", StringType()),
        StructField("target", StringType()),
        StructField("_corrupt_record", StringType()),
    ])
    df = (spark.read.schema(schema).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(str(p))).cache()
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["source"] for r in good} >= {"alice", "ops"}
    assert any("not json" in r["_corrupt_record"] for r in bad)
    # DROPMALFORMED: only clean rows survive
    dropped = (spark.read.schema(schema)
               .option("mode", "DROPMALFORMED").json(str(p)))
    assert dropped.count() < 4
    df.unpersist()


def test_carry_forward_spans_partition_boundaries(spark):
    # records deliberately straddle range partitions: header in one
    # partition, entries in later ones — the carry must cross boundaries
    from databox_adls_loader_spark.operators.windows import carry_forward_last
    lines = []
    for rec in range(6):
        lines.append((rec * 100, f"hdr{rec}"))
        for j in range(1, 40):                       # 40 lines per record
            lines.append((rec * 100 + j, None))
    df = spark.createDataFrame(lines, "line_no: long, file_hdr: string")
    out = carry_forward_last(df, "line_no", "file_hdr", out_col="file",
                             num_partitions=7).collect()
    for r in out:
        assert r["file"] == f"hdr{r['line_no'] // 100}"


def test_acl_assembly_across_many_partitions(spark):
    # full assembler with the input split across partitions mid-record
    recs = []
    for i in range(20):
        recs += [f"# file: /d/f{i:02d}", f"# owner: o{i}", f"# group: g{i}",
                 "user::rwx", f"user:u{i}:rw-", ""]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(recs)], "line_no: long, value: string"
    ).repartition(5)
    rows = {r["file"]: r for r in assemble_acl_records(df).collect()}
    assert len(rows) == 20
    for i in range(20):
        r = rows[f"f{i:02d}"]
        assert r["owner"] == f"o{i}" and r["acl"] == ["user::rwx", f"user:u{i}:rw-"]


def test_usage_parser_source_dir_anchor_keeps_spaces(spark):
    # reference parseUsageLine anchors on sourceDir (line[line.find(dir):])
    # so paths containing whitespace survive intact
    lines = spark.createDataFrame(
        [("7  /data/with  space",), ("1024  6144  /data/plain",)],
        "value: string")
    rows = {r["path"]: r["size"] for r in
            parse_usage_lines(lines, source_dir="/data").collect()}
    assert rows["/data/with  space"] == 7
    assert rows["/data/plain"] == 1024


def test_acl_assembly_merges_post_strip_collisions(spark):
    # /dataA/x and /dataB/x collide after stripping one component — they
    # must merge into ONE record (the oracle groups by the stripped path)
    lines = [
        "# file: /dataA/x", "# owner: a", "# group: g1", "user::rwx", "",
        "# file: /dataB/x", "# owner: b", "# group: g2", "other::---", "",
    ]
    rows = assemble_acl_records(lines_df(spark, lines)).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["file"] == "x"
    assert set(r["acl"]) == {"user::rwx", "other::---"}


def test_format_roundtrip_orc_csv_json_preserve_values(spark, tmp_path):
    """Interchange-format breadth: the engine reads/writes ORC, CSV and
    JSON through the same DataFrame plans as parquet — a lake migration
    never controls its input format.  CSV needs an explicit schema on
    read (header-only typing would stringify); ORC/JSON carry types."""
    src = spark.createDataFrame(
        [(1, "a,b", 1.5, True), (2, None, -0.25, False), (3, "x", 0.0, None)],
        "id: long, s: string, v: double, flag: boolean")
    expect = {tuple(r) for r in src.collect()}
    for fmt in ("orc", "json", "csv"):
        out = str(tmp_path / fmt)
        w = src.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(out)
        r = spark.read
        if fmt == "csv":
            # explicit schema: round-trips types AND quoted separators
            r = r.option("header", "true").schema(src.schema)
        # JSON schema inference orders columns alphabetically — reselect
        got = {tuple(x) for x in
               r.format(fmt).load(out).select(*src.columns).collect()}
        assert got == expect, fmt

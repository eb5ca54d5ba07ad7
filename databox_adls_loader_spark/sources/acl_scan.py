"""S4/S5: recursive getfacl scan → multi-line record assembly → ACL records.

Reference: copy-acls.sh:22-44 is a Bash state machine that groups a
`# file:` header, `# owner:`/`# group:` comment lines, and N ACL-entry lines
into one record; :42 strips `#`-suffixed effective-perms annotations (P9);
:11-18 strips the leading path component (P7); :64 projects to
{file, owner, group, acl[]} (P6).

Spark-first design: the multi-line grouping is a classic
last-non-null-header carry — tag header lines, propagate the most recent
file path forward over the line index, then group.  The carry uses the
two-phase range-partitioned form (operators/windows.carry_forward_last),
NOT a bare global window: records may straddle partition boundaries and
the prefix of each partition is filled from the preceding partitions'
final header via a tiny broadcast — no single-partition sort anywhere,
so a billion-file getfacl dump assembles fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_getfacl_text(spark: SparkSession, path: str) -> DataFrame:
    """S4 replay source: raw getfacl -R output as a text DataFrame with a
    global line index (the original emission order is the record grouping
    contract, so we must keep it)."""
    df = spark.read.text(path)
    return df.withColumn("line_no", F.monotonically_increasing_id())


def lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Test helper: in-memory lines with explicit order."""
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "line_no: long, value: string"
    )


def assemble_acl_records(lines: DataFrame, strip_prefix_components: int = 1) -> DataFrame:
    """S5 multi-line record assembly + P6 projection + P7 path strip + P9
    comment strip, returning ACL_RECORD_SCHEMA rows.

    Line classes (F6, copy-acls.sh:25-38):
      `# file: <path>`   → record start
      `# owner: <o>` / `# group: <g>` → record attributes
      other non-blank    → ACL entry (trailing `\t#effective:...` dropped, :42)
    """
    from ..operators.windows import carry_forward_last
    v = F.col("value")
    tagged = (
        lines
        .withColumn("file_hdr", F.when(v.startswith("# file:"),
                                       F.trim(F.expr("substring(value, 8)"))))
        .withColumn("owner_hdr", F.when(v.startswith("# owner:"),
                                        F.trim(F.expr("substring(value, 9)"))))
        .withColumn("group_hdr", F.when(v.startswith("# group:"),
                                        F.trim(F.expr("substring(value, 9)"))))
    )
    # header propagation WITHOUT a single-partition global window: the
    # two-phase range-partitioned carry (operators/windows.py)
    tagged = (
        carry_forward_last(tagged, "line_no", "file_hdr", out_col="file")
        .filter(F.col("file").isNotNull())
    )
    is_entry = (~v.startswith("#")) & (F.trim(v) != "")
    # strip the prefix BEFORE grouping: two roots colliding post-strip
    # (/dataA/x, /dataB/x) must merge into one record, as the jq
    # projection over pre-stripped paths does (copy-acls.sh:11-18,64)
    tagged = tagged.withColumn(
        "file", _strip_prefix(F.col("file"), strip_prefix_components))
    records = (
        tagged.groupBy("file")
        .agg(
            F.max("owner_hdr").alias("owner"),
            F.max("group_hdr").alias("group"),
            # keep entry order: collect (line_no, entry) structs, sort, project
            F.array_sort(
                F.collect_list(
                    F.when(is_entry,
                           F.struct(F.col("line_no"),
                                    # P9: strip '#'-suffixed annotations; the
                                    # separator before '#' may be a tab
                                    # (getfacl emits one) and F.trim only
                                    # strips spaces → regexp for all ws
                                    F.regexp_replace(
                                        F.substring_index(v, "#", 1),
                                        r"^\s+|\s+$", "").alias("entry")))
                )
            ).alias("ordered"),
        )
        .select(
            F.col("file"),
            "owner", "group",
            F.transform(F.col("ordered"), lambda s: s["entry"]).alias("acl"),
        )
    )
    return records


def _strip_prefix(path, n: int):
    """P7 relative-path strip (copy-acls.sh:11-18): drop the first ``n``
    leading '/'-components, e.g. `/data/x/y` with n=1 → `x/y`."""
    # remove up to n leading '/<comp>' groups, then any leading '/'
    pat = "^" + (r"/[^/]*" * n) + "/?"
    return F.regexp_replace(path, pat, "")


def scan_acls_jvm(spark: SparkSession, root: str) -> DataFrame:
    """S4 REAL form: recursive ACL scan through the Hadoop `FileSystem`
    API instead of replaying `getfacl -R` text (copy-acls.sh:46 forks the
    CLI; this is one Py4J conversation per entry, no process forks).

    For every file and directory under ``root``:

    - owner/group from `FileStatus` (always available),
    - the base triple (`user::`/`group::`/`other::`) from the POSIX
      permission bits,
    - extended entries from `getAclStatus` where the filesystem supports
      ACLs (HDFS); filesystems that do not (raw local fs) raise
      `UnsupportedOperationException` and degrade to the base triple —
      exactly what `getfacl` prints for a file with no extended ACL.

    Output is ACL_RECORD_SCHEMA — the same shape the text-replay
    assembler produces, so `acl_pipeline` consumes either source
    unchanged.  Driver-side like every NameNode conversation; the ~100k
    entry guidance of `sources.hadoop_fs.list_files_jvm` applies."""
    from ..schemas import ACL_RECORD_SCHEMA
    from .hadoop_fs import _jvm_fs, _strip_scheme

    fs, path = _jvm_fs(spark, root)
    jvm = spark._jvm
    rows = []
    frontier = [path]
    while frontier:
        nxt = []
        for p in frontier:
            for st in fs.listStatus(p):
                sp = st.getPath()
                # FsPermission.toString() → 9-char 'rwxr-x---' triple
                # (py4j exposes methods, not the FsAction.SYMBOL field)
                sym = st.getPermission().toString()
                base = [
                    "user::" + sym[0:3],
                    "group::" + sym[3:6],
                    "other::" + sym[6:9],
                ]
                extended = []
                try:
                    acl_st = fs.getAclStatus(sp)
                    extended = [e.toString()
                                for e in acl_st.getEntries()]
                except Exception:  # noqa: BLE001 - fs without ACL support
                    pass
                rows.append((_strip_scheme(sp.toString()),
                             st.getOwner(), st.getGroup(),
                             base + extended))
                if st.isDirectory():
                    nxt.append(sp)
        frontier = nxt
    return spark.createDataFrame(rows, ACL_RECORD_SCHEMA)

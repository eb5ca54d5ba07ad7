"""S1/S2/S9 real-filesystem sources: Hadoop FileSystem listings as
DataFrames, without forking the CLI.

The reference shells out per directory — `hadoop fs -du` one fork per dir
(/root/reference/generate-file-list.py:22-25) and `hdfs dfs -getfacl -R`
(/root/reference/copy-acls.sh:46).  Here the same NameNode surface is
reached two ways:

- :func:`list_files_jvm` / :func:`list_status_jvm` /
  :func:`content_summary_jvm` — the JVM gateway (`spark._jvm`) driving
  `org.apache.hadoop.fs.FileSystem` directly: one RPC stream instead of
  one process fork per directory.  Driver-side by nature (a listing IS a
  metadata-server conversation); Py4J round-trip cost caps it at ~100k
  entries — beyond that, use the distributed lister below.
- :func:`list_tree_distributed` — for trees too large to enumerate on one
  driver: expand the first levels on the driver, then fan the subtree
  roots out to executors where each task lists its subtree with
  `pyarrow.fs` (Python workers cannot reach the JVM gateway; pyarrow is
  on every executor).  Listing 100M+ entries becomes an embarrassingly
  parallel scan over subtrees, and the result is a DataFrame ready for
  the A1 rollup — no driver bottleneck.

Both produce the same schema: (path, length, is_dir, mtime_ms), scheme
stripped so downstream path logic (ancestor explode, prefix filters) is
uniform across file://, hdfs://, abfs://.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FS_LISTING_SCHEMA = StructType([
    StructField("path", StringType(), False),
    StructField("length", LongType(), False),
    StructField("is_dir", BooleanType(), False),
    StructField("mtime_ms", LongType(), False),
])


def _strip_scheme(p: str) -> str:
    """'file:/tmp/x' or 'hdfs://nn:8020/tmp/x' → '/tmp/x' — uniform paths
    for ancestor/prefix logic regardless of source filesystem."""
    if "://" in p:
        rest = p.split("://", 1)[1]
        slash = rest.find("/")
        return rest[slash:] if slash >= 0 else "/"
    if ":" in p.split("/", 1)[0]:  # 'file:/tmp/x' (no //)
        return p.split(":", 1)[1]
    return p


def _jvm_fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return path.getFileSystem(conf), path


def list_files_jvm(spark: SparkSession, root: str,
                   recursive: bool = True) -> DataFrame:
    """S2 real form: `FileSystem.listFiles(path, recursive)` — files only
    (the NameNode iterator does the recursion server-side; directories are
    reconstructed downstream by the A1 ancestor rollup, which is exactly
    how `du` totals are derived without one RPC per directory level).

    Cost note: each entry costs ~4 Py4J gateway round-trips, so this path
    is for trees up to ~100k files.  Beyond that use
    :func:`list_tree_distributed` (executor-fanned pyarrow) or, when only
    file rows are needed, the fully JVM-side `binaryFile` listing
    (``sources.inventory.read_file_tree``) — both scale past the gateway
    bottleneck."""
    fs, path = _jvm_fs(spark, root)
    it = fs.listFiles(path, recursive)
    rows = []
    while it.hasNext():
        st = it.next()
        rows.append((_strip_scheme(st.getPath().toString()), st.getLen(),
                     False, st.getModificationTime()))
    return spark.createDataFrame(rows, FS_LISTING_SCHEMA)


def list_status_jvm(spark: SparkSession, root: str) -> DataFrame:
    """S9 flat listing: one `listStatus` level, files AND directories —
    the `hdfs dfs -ls <dir>` equivalent."""
    fs, path = _jvm_fs(spark, root)
    rows = []
    for st in fs.listStatus(path):
        rows.append((_strip_scheme(st.getPath().toString()), st.getLen(),
                     bool(st.isDirectory()), st.getModificationTime()))
    return spark.createDataFrame(rows, FS_LISTING_SCHEMA)


def content_summary_jvm(spark: SparkSession, root: str) -> dict:
    """`hadoop fs -du -s` (generate-file-list.py:22-25) as one RPC:
    {length, file_count, directory_count} for the subtree."""
    fs, path = _jvm_fs(spark, root)
    cs = fs.getContentSummary(path)
    return {
        "length": cs.getLength(),
        "file_count": cs.getFileCount(),
        "directory_count": cs.getDirectoryCount(),
    }


def _expand_roots(spark: SparkSession, root: str, fanout_depth: int):
    """Driver-side BFS of the first ``fanout_depth`` levels → (subtree
    roots to list on executors, entries already seen).  The frontier stays
    small (it is bounded by directory fanout^depth) — the heavy listing
    happens distributed."""
    fs, _ = _jvm_fs(spark, root)
    jvm = spark._jvm
    roots, entries = [root], []
    for _level in range(fanout_depth):
        nxt = []
        for r in roots:
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(r)):
                p = st.getPath().toString()
                entries.append((_strip_scheme(p), st.getLen(),
                                bool(st.isDirectory()),
                                st.getModificationTime()))
                if st.isDirectory():
                    nxt.append(p)
        roots = nxt
        if not roots:
            break
    return roots, entries


def list_tree_distributed(spark: SparkSession, root: str,
                          fanout_depth: int = 2) -> DataFrame:
    """Full recursive listing (files and directories) for trees too big
    for one driver loop: driver expands ``fanout_depth`` levels, executors
    list one subtree per task via ``pyarrow.fs``.

    One task per subtree root keeps the work units independent; a skewed
    giant subtree is the remaining hazard — raise ``fanout_depth`` to
    split it finer (cost is driver RPCs ~ fanout^depth, bounded)."""
    subtree_roots, shallow = _expand_roots(spark, root, fanout_depth)
    # Build the FileSystem from ONE percent-encoded base URI and hand the
    # subtree roots over as plain (unencoded) paths: Path.toString() is
    # not URI-escaped, so round-tripping each root through from_uri would
    # crash on legal names containing ' ', '%', or '#'.
    import urllib.parse
    if "://" in root:
        scheme_auth = (root.split("://", 1)[0] + "://"
                       + root.split("://", 1)[1].split("/", 1)[0])
    else:
        scheme_auth = "file://"
    base_uri = scheme_auth + urllib.parse.quote(_strip_scheme(root))
    plain_roots = [_strip_scheme(p) for p in subtree_roots]

    def list_subtree(paths):
        from pyarrow import fs as pafs
        filesystem, _ = pafs.FileSystem.from_uri(base_uri)
        for p in paths:
            infos = filesystem.get_file_info(
                pafs.FileSelector(p, recursive=True))
            for fi in infos:
                is_dir = fi.type == pafs.FileType.Directory
                mtime = int(fi.mtime.timestamp() * 1000) if fi.mtime else 0
                yield (_strip_scheme(fi.path), fi.size or 0, is_dir, mtime)

    shallow_df = spark.createDataFrame(shallow, FS_LISTING_SCHEMA)
    if not subtree_roots:
        return shallow_df
    n = len(plain_roots)
    deep = (
        spark.sparkContext
        .parallelize(plain_roots, n)
        .mapPartitions(list_subtree)
        .toDF(FS_LISTING_SCHEMA)
    )
    return shallow_df.unionAll(deep)


def fs_inventory(listing: DataFrame, root: str) -> DataFrame:
    """Adapt an fs listing to the inventory shape the §3.1 pipeline
    consumes: (name, length, is_folder) with names relative to ``root``
    (P7 relative-path strip, copy-acls.py:63-66)."""
    import re
    root = _strip_scheme(root).rstrip("/")
    rel = F.regexp_replace("path", "^" + re.escape(root) + "/?", "")
    return (
        listing.select(
            rel.alias("name"),
            F.col("length"),
            F.col("is_dir").alias("is_folder"),
        )
        .filter(F.col("name") != "")
    )

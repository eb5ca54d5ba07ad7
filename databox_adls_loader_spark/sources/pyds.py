"""Python DataSource (Spark 4 DSv2 API) for the `hadoop fs -du` usage
format — the same records as sources/usage.parse_usage_lines, but as a
first-class `spark.read.format("usage_du")` source with its own
partitioning, so the parse happens *inside* the scan instead of as a
post-processing projection over a text read.

Reference semantics: parseUsageLine (/root/reference/generate-file-list.py:7-17)
— size is the first whitespace token, the path is everything from the
first occurrence of ``source_dir`` (tolerating 2- and 3-column variants
and paths containing spaces); without ``source_dir`` the path is the last
token.  Unit starts at 0 = unassigned (generate-file-list.py:16).

Scale: the driver only LISTS files (cheap); each file is one
InputPartition and its bytes are read executor-side, so a directory of
per-datanode du dumps parses fully in parallel.  One known limit of the
Python DSv2 path: rows cross an Arrow batch boundary per partition —
fine for line records; don't route multi-GB single files through this
(split them, or use spark.read.text + parse_usage_lines which splits on
block boundaries).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _list_input_files(path: str) -> list[str]:
    """Expand a file or directory into a sorted file list (driver-side,
    O(#files) — no file contents are touched here)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
            and not f.startswith(("_", ".")))
    return [path]


def parse_usage_line(line: str, source_dir: str | None = None):
    """One du line → (path, size, unit) or None for blank/unparseable.
    Mirrors parse_usage_lines' column expressions token-for-token."""
    stripped = line.strip()
    if not stripped:
        return None
    toks = stripped.split()
    try:
        size = int(toks[0])
    except ValueError:
        size = None
    if source_dir is not None:
        # exact mirror of parse_usage_lines' substring(value, instr(...)):
        # instr()=0 when absent and substring(value, 0) is the whole line,
        # so a line NOT containing source_dir yields the full raw line —
        # not the last token
        raw = line.rstrip("\n")
        at = raw.find(source_dir)
        path = raw[at:] if at >= 0 else raw
    else:
        path = toks[-1]
    return (path, size, 0)


@dataclass
class _FilePartition(InputPartition):
    file_path: str


class UsageDuReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("usage_du requires a load path")
        self.source_dir = options.get("source_dir")

    def partitions(self):
        return [_FilePartition(p) for p in _list_input_files(self.path)]

    def read(self, partition: _FilePartition):
        with open(partition.file_path, "r", encoding="utf-8",
                  errors="replace") as fh:
            for line in fh:
                rec = parse_usage_line(line, self.source_dir)
                if rec is not None:
                    yield rec


class UsageDuDataSource(DataSource):
    """`spark.read.format("usage_du").option("source_dir", d).load(p)`."""

    @classmethod
    def name(cls) -> str:
        return "usage_du"

    def schema(self) -> str:
        return "path string, size bigint, unit int"

    def reader(self, schema) -> UsageDuReader:
        return UsageDuReader(self.options)


def register_usage_du(spark) -> None:
    """Idempotent registration of the usage_du format on a session."""
    spark.dataSource.register(UsageDuDataSource)

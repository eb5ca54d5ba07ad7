"""S3 usage-line parser: `hadoop fs -du -x` text → {path, size, unit}.

Reference: parseUsageLine (/root/reference/generate-file-list.py:7-17)
tolerates 2-column (`<size> <path>`) and 3-column (`<size> <disk> <path>`)
variants by anchoring on the path suffix.  Same tolerance here, as pure
column expressions over a text DataFrame: the path is the last
whitespace-delimited token, the size is the first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_usage_lines(lines: DataFrame, value_col: str = "value",
                      source_dir: str | None = None) -> DataFrame:
    """Tokenize du output into DIR_ALLOCATION_SCHEMA rows (unit=0 ⇒
    unassigned, generate-file-list.py:16).  Blank lines are dropped.

    Pass ``source_dir`` to anchor the path on its first occurrence —
    exactly parseUsageLine's `line[line.find(sourceDir):]` — which keeps
    paths CONTAINING WHITESPACE intact.  Without it the path is the last
    whitespace token (fine only when paths are space-free)."""
    v = F.trim(F.col(value_col))
    toks = F.split(v, r"\s+")
    if source_dir is not None:
        path = F.expr(
            f"substring({value_col}, instr({value_col}, '{source_dir}'))")
    else:
        path = F.element_at(toks, -1)
    return (
        lines.filter(v != "")
        .select(
            path.alias("path"),
            F.element_at(toks, 1).cast("long").alias("size"),
            F.lit(0).alias("unit"),
        )
    )

"""S8/S9 file-list sources.

Reference: distcp-to-databox.sh:18-28 drives one distcp job per path read
from a newline-delimited filelist; distcp-to-adls.sh:13 builds such a list
with `hadoop fs -ls -C`.  Spark-side both are just text reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_filelist(spark: SparkSession, path: str) -> DataFrame:
    """One path per line → (path) rows; blank lines dropped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("path"))
        .filter(F.col("path") != "")
    )

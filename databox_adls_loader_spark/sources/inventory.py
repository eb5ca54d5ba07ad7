"""S1 blob-inventory scan + P1 inventory projection.

Reference: AdlsCopyUtils.getSourceFileList (/root/reference/adls_copy_utils.py:66-86)
lists every blob with metadata and builds the 6-field record of SURVEY §1.1a.
Here the listing is a DataFrame (from `spark.read.json` of a listing dump, a
parquet inventory, or Hadoop FileSystem via the JVM gateway) and the
projection is pure column expressions — Catalyst prunes unused fields and
pushes prefix predicates into the scan (SURVEY §4: F3 prefix → pushdown).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import (
    BLOB_LISTING_SCHEMA,
    HDI_ISFOLDER_KEY,
    HDI_PERMISSION_KEY,
    PERMISSIONS_SCHEMA,
)


def read_blob_listing(spark: SparkSession, path: str) -> DataFrame:
    """S1 source: a JSON dump of `az storage blob list --include m`.
    Explicit schema → no inference pass over the data."""
    return spark.read.schema(BLOB_LISTING_SCHEMA).json(path)


def parent_directory(name: Column) -> Column:
    """`os.path.dirname` equivalent (adls_copy_utils.py:78): everything
    before the last '/', empty for root-level names."""
    return F.when(name.contains("/"),
                  F.regexp_extract(name, r"^(.*)/[^/]*$", 1)).otherwise(F.lit(""))


def project_inventory(listing: DataFrame, prefix: str | None = None) -> DataFrame:
    """P1: the inventory projection (adls_copy_utils.py:76-84).

    - parent_directory derived from name
    - is_folder = presence of the hdi_isfolder metadata key (:79)
    - permissions = from_json of the hdi_permission metadata value (:80)
    - length from properties.contentLength (:81)
    - metadata = residual map after dropping the two reserved keys (:82-83)

    ``prefix`` mirrors F3 (--prefix, adls_copy_utils.py:37,69-73): expressed
    as a `startswith` filter so Catalyst can push it into the source.
    """
    df = listing
    if prefix:
        df = df.filter(F.col("name").startswith(prefix))
    return df.select(
        F.col("name"),
        parent_directory(F.col("name")).alias("parent_directory"),
        F.map_contains_key(F.col("metadata"), HDI_ISFOLDER_KEY).alias("is_folder"),
        F.from_json(F.col("metadata").getItem(HDI_PERMISSION_KEY),
                    PERMISSIONS_SCHEMA).alias("permissions"),
        F.col("properties.contentLength").cast("long").alias("length"),
        F.map_filter(
            F.col("metadata"),
            lambda k, _v: ~k.isin(HDI_PERMISSION_KEY, HDI_ISFOLDER_KEY),
        ).alias("metadata"),
    )


def read_file_tree(spark: SparkSession, root: str) -> DataFrame:
    """S2/S9 for real filesystems: recursive listing as (path, length) rows
    via the binaryFile source with content dropped — Spark only reads file
    status, not bytes, because the column is pruned."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.col("path"), F.col("length").cast("long").alias("length"))
    )

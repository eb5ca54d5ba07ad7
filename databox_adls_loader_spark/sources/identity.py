"""S6 identity-map source.

Reference: loadIdentityMap (/root/reference/adls_copy_utils.py:88-94) loads
JSON `[{type, source, target}]` and pivots to `{type: {source: target}}`.
Here the map stays a small dimension DataFrame used broadcast-side (J1); the
nested-dict pivot is also provided (A4) for the sink layer, which wants a
plain Python dict on the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import IDENTITY_MAP_SCHEMA


def read_identity_map(spark: SparkSession, path: str) -> DataFrame:
    """JSON array file → dimension DataFrame (multiLine handles the
    human-edited pretty-printed array the reference expects)."""
    return (
        spark.read.schema(IDENTITY_MAP_SCHEMA)
        .option("multiLine", "true").json(path)
    )


def pivot_identity_map(dim: DataFrame) -> DataFrame:
    """A4 group-by-type pivot: {type → map(source → target)} as one row per
    type with a MapType column (adls_copy_utils.py:92-94)."""
    return (
        dim.groupBy("type")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("source", "target"))).alias("mapping"))
    )


def identity_map_dict(dim: DataFrame) -> dict[str, dict[str, str]]:
    """Driver-side nested dict for sink executors (broadcast by closure).
    Empty targets are kept — lookupIdentity only falls back when the source
    key is absent, not when the target is blank (adls_copy_utils.py:96-104)."""
    out: dict[str, dict[str, str]] = {}
    for row in pivot_identity_map(dim).collect():
        out[row["type"]] = dict(row["mapping"])
    return out

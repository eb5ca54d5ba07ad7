"""Explicit StructTypes for every record type in the reference's data model.

The reference keeps schemas implicit — each stage parses what the previous
stage emitted (SURVEY §1.3).  Here every recordset gets an explicit
``StructType`` so scans prune columns and ``from_json`` parses are typed.

Record types (SURVEY §1.1, citing /root/reference):
  file_inventory   adls_copy_utils.py:66-86  (getSourceFileList projection)
  permissions      adls_copy_utils.py:80     (hdi_permission JSON payload)
  acl_record       copy-acls.sh:64           (jq {file, owner, group, acl[]})
  identity_map     adls_copy_utils.py:88-94  ([{type, source, target}])
  dir_allocation   generate-file-list.py:7-17 ({path, size, unit})
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# hdi_permission JSON payload: {"owner": ..., "group": ..., "permissions": ...}
# (reference key constants: adls_copy_utils.py:20-21)
PERMISSIONS_SCHEMA = StructType([
    StructField("owner", StringType()),
    StructField("group", StringType()),
    StructField("permissions", StringType()),
])

# File-inventory record (SURVEY §1.1a) — the 6-field projection built at
# adls_copy_utils.py:76-84 from `az storage blob list` JSON.
FILE_INVENTORY_SCHEMA = StructType([
    StructField("name", StringType(), nullable=False),
    StructField("parent_directory", StringType()),
    StructField("is_folder", BooleanType(), nullable=False),
    StructField("permissions", PERMISSIONS_SCHEMA),
    StructField("length", LongType()),
    StructField("metadata", MapType(StringType(), StringType())),
])

# Raw blob-listing record before the P1 projection (what `az storage blob
# list --include m` emits, reduced to the fields the reference touches).
BLOB_LISTING_SCHEMA = StructType([
    StructField("name", StringType(), nullable=False),
    StructField("metadata", MapType(StringType(), StringType())),
    StructField("properties", StructType([
        StructField("contentLength", LongType()),
    ])),
])

# ACL record (SURVEY §1.1b) — copy-acls.sh:64 projection.
ACL_RECORD_SCHEMA = StructType([
    StructField("file", StringType(), nullable=False),
    StructField("owner", StringType()),
    StructField("group", StringType()),
    StructField("acl", ArrayType(StringType())),
])

# A single parsed ACL entry `[scope:]type:id:perms` (copy-acls.py:14-20).
ACL_ENTRY_SCHEMA = StructType([
    StructField("scope", StringType()),   # "default" or null (3-field form)
    StructField("type", StringType()),    # user | group | other | mask
    StructField("id", StringType()),      # may be empty (unnamed entry)
    StructField("perms", StringType()),   # e.g. rwx / r-- / rw-
])

# Identity-map record (SURVEY §1.1c) — copy-acls.py:95-104.
IDENTITY_MAP_SCHEMA = StructType([
    StructField("type", StringType(), nullable=False),    # "user" | "group"
    StructField("source", StringType(), nullable=False),
    StructField("target", StringType()),
])

# Directory-allocation record (SURVEY §1.1d) — generate-file-list.py:7-17.
DIR_ALLOCATION_SCHEMA = StructType([
    StructField("path", StringType(), nullable=False),
    StructField("size", LongType(), nullable=False),
    StructField("unit", IntegerType(), nullable=False),   # 0 = unassigned
])

# Multimodal asset record (extension surface): opaque binary payload +
# typed metadata; the decode step is stubbed (no image/audio libs here)
# but the schema/partitioning/UDF plumbing is real.
MULTIMODAL_ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), nullable=False),
    StructField("modality", StringType(), nullable=False),  # image|audio|video
    StructField("content", StringType()),                   # binary in prod; see operators/multimodal.py
    StructField("mime_type", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

# Reserved metadata keys (adls_copy_utils.py:20-21).
HDI_PERMISSION_KEY = "hdi_permission"
HDI_ISFOLDER_KEY = "hdi_isfolder"
RESERVED_METADATA_KEYS = (HDI_PERMISSION_KEY, HDI_ISFOLDER_KEY)

# Identity types (adls_copy_utils.py:17-18).
USER_IDENTITY_TYPE = "user"
GROUP_IDENTITY_TYPE = "group"

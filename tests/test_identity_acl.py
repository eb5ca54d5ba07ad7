"""J1 identity lookup, P2 ACL rewrite, A2 identity extraction — the
fallback/positional cases the reference gets subtly right
(copy-acls.py:14-20, adls_copy_utils.py:96-104)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databox_adls_loader_spark import fixtures
from databox_adls_loader_spark.operators.acl_rewrite import (
    extract_identities,
    normalize_root,
    rewrite_acls,
)
from databox_adls_loader_spark.operators.joins import lookup_identity, remap_owner_group
from databox_adls_loader_spark.sources.identity import identity_map_dict, pivot_identity_map


def test_lookup_identity_fallback(spark):
    dim = fixtures.identity_map(spark)
    fact = spark.createDataFrame(
        [("alice",), ("hive",), ("nobody",)], "u: string")
    out = {r["u_orig"]: r["u"] for r in
           lookup_identity(fact.withColumn("u_orig", F.col("u")), dim, "u", "user").collect()}
    assert out["alice"] == "alice@corp.example.com"   # mapped
    assert out["hive"] == "hive"                      # absent → fallback
    assert out["nobody"] == "nobody"                  # absent → fallback


def test_lookup_identity_blank_target_is_used(spark):
    # lookupIdentity returns the map value even when blank — only an
    # *absent key* falls back (adls_copy_utils.py:98-104)
    dim = spark.createDataFrame([("user", "bob", "")],
                                "type: string, source: string, target: string")
    fact = spark.createDataFrame([("bob",)], "u: string")
    assert lookup_identity(fact, dim, "u", "user").collect()[0]["u"] == ""


def test_rewrite_acls_3_and_4_field(spark):
    dim = spark.createDataFrame(
        [("user", "alice", "aad-alice"), ("group", "devs", "aad-devs")],
        "type: string, source: string, target: string")
    acls = spark.createDataFrame(
        [("f1", ["user::rwx", "user:alice:rw-", "group:devs:r-x",
                 "default:user:alice:rwx", "other::---", "mask::rwx"])],
        "file: string, acl: array<string>")
    out = rewrite_acls(acls, dim).collect()[0]["acl"]
    assert out == ["user::rwx",            # empty id untouched
                   "user:aad-alice:rw-",   # 3-field remap
                   "group:aad-devs:r-x",
                   "default:user:aad-alice:rwx",  # 4-field remap keeps scope
                   "other::---", "mask::rwx"]


def test_rewrite_preserves_other_columns_and_order(spark):
    dim = fixtures.identity_map(spark)
    acls = fixtures.acl_records(spark, n_files=40)
    out = rewrite_acls(acls, dim)
    assert out.count() == acls.count()
    orig = {r["file"]: r for r in acls.collect()}
    for r in out.collect():
        assert len(r["acl"]) == len(orig[r["file"]]["acl"])
        assert r["owner"] == orig[r["file"]]["owner"]


def test_extract_identities_includes_owner_synthetics(spark):
    acls = spark.createDataFrame(
        [("f1", "erin", "finance", ["user::rwx", "user:alice:rw-"]),
         ("f2", "erin", "ops", ["group:devs:r-x", "other::---"])],
        "file: string, owner: string, group: string, acl: array<string>")
    ids = {(r["type"], r["source"]) for r in extract_identities(acls).collect()}
    assert ids == {("user", "alice"), ("user", "erin"),
                   ("group", "devs"), ("group", "finance"), ("group", "ops")}
    # every target starts empty (human fills it in, README.md:183-185)
    assert all(r["target"] == "" for r in extract_identities(acls).collect())


def test_remap_owner_group_struct(spark):
    dim = fixtures.identity_map(spark)
    inv = fixtures.file_inventory(spark, n_dirs=10, files_per_dir=2)
    out = remap_owner_group(inv, dim)
    assert out.count() == inv.count()
    mapping = identity_map_dict(dim)
    for before, after in zip(inv.orderBy("name").collect(),
                             out.orderBy("name").collect()):
        o = before["permissions"]["owner"]
        expect = mapping["user"].get(o, o)
        assert after["permissions"]["owner"] == expect


def test_normalize_root(spark):
    acls = spark.createDataFrame([("",), ("x/y",)], "file: string")
    out = sorted(r["file"] for r in normalize_root(acls).collect())
    assert out == ["/", "x/y"]


def test_pivot_identity_map(spark):
    dim = fixtures.identity_map(spark)
    piv = {r["type"]: r["mapping"] for r in pivot_identity_map(dim).collect()}
    assert set(piv) == {"user", "group"}
    assert piv["user"]["alice"] == "alice@corp.example.com"


def test_rewrite_acls_udf_matches_join_form(spark):
    from databox_adls_loader_spark.operators.acl_rewrite import (
        rewrite_acls, rewrite_acls_udf)
    acls = spark.createDataFrame(
        [("f1", ["user::rwx", "user:alice:rw-", "group:ops:r-x",
                 "default:user:bob:rwx", "other::---", "mask::rwx"]),
         ("f2", ["user:carol:rwx"]),
         ("f3", None)],
        "file: string, acl: array<string>")
    dim = spark.createDataFrame(
        [("user", "alice", "aad-alice"), ("group", "ops", "aad-ops"),
         ("user", "bob", "")],
        "type: string, source: string, target: string")
    join_form = {r["file"]: r["acl"]
                 for r in rewrite_acls(acls, dim).collect()}
    udf_form = {r["file"]: r["acl"]
                for r in rewrite_acls_udf(acls, dim).collect()}
    assert join_form == udf_form
    assert udf_form["f1"][1] == "user:aad-alice:rw-"
    assert udf_form["f1"][3] == "default:user::rwx"   # blank target IS used
    assert udf_form["f2"] == ["user:carol:rwx"]        # fallback on miss

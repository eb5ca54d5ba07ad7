"""CLI surface (cli.py / `python -m databox_adls_loader_spark`): the
reference's command-line parity layer over the §3 pipelines."""

from __future__ import annotations

import json
import os

from databox_adls_loader_spark import fixtures
from databox_adls_loader_spark.cli import main

GETFACL_TEXT = """\
# file: /data/dir1
# owner: alice
# group: staff
user::rwx
group::r-x
other::---

# file: /data/dir1/file1.dat
# owner: alice
# group: staff
user::rw-
user:bob:r--
group::r--
other::---
"""


def _write_tree(root, spec):
    for rel, size in spec:
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(b"x" * size)


def test_cli_generate_file_list_flat_outputs(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spec = [("d1/a.bin", 60), ("d1/b.bin", 50), ("d2/c.bin", 70),
            ("d3/d.bin", 40)]
    _write_tree(src, spec)
    rc = main(["generate-file-list", src, "-o", out, "-s", "100",
               "-b", "filelist"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["units"] >= 2          # 220 bytes at capacity 100
    listed = []
    for u in range(1, report["units"] + 1):
        flat = os.path.join(out, f"filelist{u}")
        assert os.path.exists(flat)
        listed += [ln.strip() for ln in open(flat) if ln.strip()]
    # d1 (110 B) exceeds capacity 100 -> X2 recursion lists its files
    # individually; d2/d3 pack as whole directories
    assert sorted(listed) == ["d1/a.bin", "d1/b.bin", "d2", "d3"]


def test_cli_copy_acls_generate_then_apply(spark, tmp_path, capsys):
    acl_file = str(tmp_path / "acls.txt")
    with open(acl_file, "w") as f:
        f.write(GETFACL_TEXT)
    im = str(tmp_path / "identity-map.json")
    rc = main(["copy-acls", "-s", acl_file, "-g", "-i", im])
    assert rc == 0
    skeleton = json.loads(open(im).read())
    assert {(e["type"], e["source"]) for e in skeleton} >= {
        ("user", "alice"), ("user", "bob"), ("group", "staff")}
    assert all(e["target"] == "" for e in skeleton)

    # fill targets, then apply
    for e in skeleton:
        e["target"] = e["source"] + "@corp.example.com"
    with open(im, "w") as f:
        json.dump(skeleton, f, indent=2)
    eff = str(tmp_path / "effects")
    os.makedirs(eff)
    rc = main(["copy-acls", "-s", acl_file, "-i", im,
               "--effects-dir", eff])
    assert rc == 0
    applied = [json.loads(ln) for ln in open(f"{eff}/applied.jsonl")]
    assert {a["path"] for a in applied} == {"dir1", "dir1/file1.dat"}
    assert any("alice@corp.example.com" in json.dumps(a) for a in applied)


def test_cli_copy_to_adls_plan(spark, tmp_path, capsys):
    inv_dir = str(tmp_path / "listing")
    fixtures.blob_listing(spark, n_dirs=6, files_per_dir=2) \
        .coalesce(1).write.json(inv_dir)
    im = str(tmp_path / "im.json")
    with open(im, "w") as f:
        json.dump([{"type": "user", "source": "alice", "target": "a@x"},
                   {"type": "group", "source": "staff", "target": "g@x"}], f)
    eff = str(tmp_path / "effects")
    os.makedirs(eff)
    rc = main(["copy-to-adls", "--inventory", inv_dir, "-i", im,
               "--effects-dir", eff])
    assert rc == 0
    ops = [json.loads(ln) for ln in open(f"{eff}/ops.jsonl")]
    kinds = [o["op"] for o in ops]
    assert "mkdir" in kinds and "copy" in kinds
    # dirs-before-files barrier held in the serialized op log
    assert max(i for i, k in enumerate(kinds) if k == "mkdir") \
        < min(i for i, k in enumerate(kinds) if k == "copy")


def test_cli_query_prints_rows(spark, capsys):
    rc = main(["query", "flagship_revenue_by_priority", "-n", "3"])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert 1 <= len(lines) <= 3 and "revenue" in lines[0]


def test_cli_query_unknown_name(spark, capsys):
    assert main(["query", "no_such_query"]) == 2


def test_cli_copy_acls_apply_requires_effects_dir(spark, tmp_path, capsys):
    acl_file = str(tmp_path / "a.txt")
    with open(acl_file, "w") as f:
        f.write(GETFACL_TEXT)
    im = str(tmp_path / "im.json")
    with open(im, "w") as f:
        f.write("[]")
    assert main(["copy-acls", "-s", acl_file, "-i", im]) == 2


def test_cli_table_lifecycle(spark, tmp_path, capsys):
    """history → delete → optimize-noop → rename → show → vacuum through
    the CLI table verbs."""
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    V.write_snapshot(
        spark.createDataFrame([(i, i * 10) for i in range(10)],
                              "k long, v long").coalesce(1), t)

    assert main(["table", "delete", t, "--where", "k >= 8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"version": 2, "n_deleted": 2}

    assert main(["table", "rename-column", t, "v", "amount"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == 3

    assert main(["table", "show", t, "-n", "50"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 8 and all("amount" in r for r in rows)

    assert main(["table", "history", t]) == 0
    hist = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert hist[-1]["n_deleted"] == 2

    assert main(["table", "compact", t, "--files", "1"]) == 0
    capsys.readouterr()
    assert main(["table", "vacuum", t, "--keep", "1"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["deleted_files"] >= 1

    # optimize on the now-single-file table is a no-op
    assert main(["table", "optimize", t]) == 0
    assert json.loads(capsys.readouterr().out.strip())["noop"] is True


def test_cli_table_rollback_and_show_version(spark, tmp_path, capsys):
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    V.write_snapshot(spark.createDataFrame([(1,)], "k long"), t)
    V.write_snapshot(spark.createDataFrame([(2,)], "k long"), t,
                     mode="overwrite")
    assert main(["table", "rollback", t, "1"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == 3
    assert main(["table", "show", t, "-v", "2"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert rows == [{"k": 2}]


def test_cli_clone_and_age_vacuum(spark, tmp_path, capsys):
    import json as _json

    from databox_adls_loader_spark.cli import main
    from databox_adls_loader_spark.sinks import versioned as V

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.write_snapshot(spark.range(10).coalesce(1), src)
    assert main(["table", "clone", src, dst]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"version": 1}
    assert V.read_version(spark, dst).count() == 10
    assert main(["table", "vacuum", dst,
                 "--older-than", "2000-01-01T00:00:00+00:00"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"deleted_files": 0}     # everything newer: kept


def test_cli_table_describe(spark, tmp_path, capsys):
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "dtbl")
    V.write_snapshot(
        spark.createDataFrame(
            [(i, i % 4, f"s{i}") for i in range(20)],
            "k long, b long, s string").coalesce(1),
        t, partition_by=["bucket(2,b)"], bloom_cols=["k"],
        checks=["k >= 0"])
    assert main(["table", "describe", t]) == 0
    d = json.loads(capsys.readouterr().out.strip())
    assert d["version"] == 1 and d["rows"] == 20
    assert d["partition_spec"] == ["bucket(2,b)"]
    assert d["partitioned_files"] == d["files"] > 0
    assert d["bloom_cols"] == ["k"] and d["checks"] == ["k >= 0"]
    assert d["files_with_deletes"] == 0

    # empty dir: loud error, exit 1
    assert main(["table", "describe", str(tmp_path / "nope")]) == 1


def test_cli_widen_column(spark, tmp_path, capsys):
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "wtbl")
    V.write_snapshot(spark.createDataFrame([(1,)], "x: int"), t)
    assert main(["table", "widen-column", t, "x", "bigint"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == 2
    assert dict(V.read_version(spark, t).dtypes)["x"] == "bigint"
    assert main(["table", "describe", t]) == 0
    capsys.readouterr()


def test_cli_table_health_and_changes(spark, tmp_path, capsys):
    """Round-8 verbs: `table health` (manifest-only advisor) and
    `table changes` (CDF between versions, incremental + preimages)."""
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    V.write_snapshot(
        spark.createDataFrame([(i, i * 10) for i in range(10)],
                              "k long, v long").coalesce(1), t)
    V.delete_where_keys(spark, t, "k", [3])
    V.upsert_mor(spark, t, spark.createDataFrame(
        [(5, 99), (20, 1)], "k long, v long").coalesce(1), "k")

    assert main(["table", "health", t]) == 0
    h = json.loads(capsys.readouterr().out.strip())
    assert h["version"] == 3 and h["n_eq_delete_entries"] == 2

    assert main(["table", "changes", t, "--from", "1", "--key", "k",
                 "--incremental", "-n", "30"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    got = {(r["k"], r["_change_type"]) for r in rows}
    assert got == {(3, "delete"), (5, "update_postimage"),
                   (20, "insert")}

    assert main(["table", "changes", t, "--from", "1", "--key", "k",
                 "--preimage", "-n", "30"]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert (5, 50, "update_preimage") in {(r["k"], r["v"],
                                           r["_change_type"])
                                          for r in rows}


def test_cli_table_align_and_horizon(spark, tmp_path, capsys):
    """Round-9: `table align` emits the pair-level bucket advisor's
    declare-and-OPTIMIZE line; `table health` surfaces the travel
    horizon fields."""
    from databox_adls_loader_spark.sinks import versioned as V

    l, r = str(tmp_path / "l"), str(tmp_path / "r")
    V.write_snapshot(spark.createDataFrame(
        [(i, i) for i in range(20)], "k long, v long").coalesce(1), l,
        partition_by=["bucket(4,k)"])
    V.write_snapshot(spark.createDataFrame(
        [(i, i) for i in range(20)], "j long, v long").coalesce(1), r)
    assert main(["table", "align", l, r,
                 "--left-key", "k", "--right-key", "j"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["aligned"] is False
    assert out["recommendations"] == [
        f"declare bucket(4,j) on {r} and OPTIMIZE"]

    assert main(["table", "health", l]) == 0
    h = json.loads(capsys.readouterr().out.strip())
    assert h["retained_versions"] == 1 and h["oldest_version"] == 1
    assert h["time_travel_horizon"] is not None


def test_cli_ann_index_lifecycle(spark, tmp_path, capsys):
    """ann build → refresh (no-op + after a commit) → probe through the
    CLI verbs (plans/ann.py surface)."""
    from databox_adls_loader_spark.session import load_tables
    from databox_adls_loader_spark.sinks import versioned as V

    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    emb = (load_tables(spark, "/root/testdata/sf0.001",
                       ["embeddings"])["embeddings"]
           .select("vec_id", "embedding").limit(80))
    V.write_snapshot(emb, base)
    geo = ["--n-bands", "2", "--planes-per-band", "4"]

    assert main(["ann", "build", idx, base, *geo]) == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == 1

    assert main(["ann", "refresh", idx, base, *geo]) == 0
    assert json.loads(capsys.readouterr().out.strip())["current"] is True

    V.delete_where_keys(spark, base, "vec_id", [1, 2, 3])
    assert main(["ann", "refresh", idx, base, *geo]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["current"] is False and out["version"] is not None

    assert main(["ann", "probe", idx, base, *geo,
                 "--query-id", "7", "-k", "5"]) == 0
    got = json.loads(capsys.readouterr().out.strip())
    assert got[0] == {"vec_id": 7, "sim": 1.0} and len(got) <= 5


def test_cli_catalog_lifecycle(spark, tmp_path, capsys):
    """catalog pin → status/history/tables → read → vacuum through the
    CLI verbs (sinks/catalog.py surface)."""
    from databox_adls_loader_spark.sinks import versioned as V

    t = str(tmp_path / "t")
    cat = str(tmp_path / "cat")
    V.write_snapshot(spark.createDataFrame([(1, 10), (2, 20)],
                                           "k int, v int"), t)

    assert main(["catalog", "pin", cat, "t", t, "--txn-id", "tx1"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "catalog_version": 0, "replayed": False}
    # replay is a no-op
    assert main(["catalog", "pin", cat, "t", t, "--txn-id", "tx1"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["replayed"] is True

    # a table commit the catalog has not published
    V.write_snapshot(spark.createDataFrame([(3, 30)], "k int, v int"), t)
    assert main(["catalog", "status", cat]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st[0]["name"] == "t" and st[0]["drift"] == 1

    assert main(["catalog", "read", cat, "t"]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, 10), (2, 20)]

    assert main(["catalog", "pin", cat, "t", t]) == 0
    capsys.readouterr()
    assert main(["catalog", "history", cat]) == 0
    hist = json.loads(capsys.readouterr().out.strip())
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["txn_id"] == "tx1"

    assert main(["catalog", "tables", cat, "-v", "0"]) == 0
    tabs = json.loads(capsys.readouterr().out.strip())
    assert tabs["t"]["version"] == 1

    assert main(["catalog", "vacuum", cat, "--keep", "1"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "catalog_manifests_dropped": 1}
    assert main(["catalog", "vacuum", cat, "--name", "t",
                 "--keep", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["table"] == "t"
    assert V.versions(t) == [2]


def test_cli_corpus_incremental_lane(spark, tmp_path, capsys):
    """corpus bootstrap → delta → status through the CLI verbs — the
    incremental assemble lane as a user-runnable surface; the delta
    round must report the never-reread and incremental-diff proofs and
    end with zero catalog drift."""
    root = str(tmp_path / "lane")
    assert main(["corpus", "bootstrap", root, "--max-id", "300"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"catalog_version": 0}

    assert main(["corpus", "delta", root, "--min-id", "300",
                 "--txn-id", "cli-r1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1
    assert out["noreread_ok"] is True and out["incremental_ok"] is True

    # replayed txn id: the catalog does not advance
    assert main(["corpus", "delta", root, "--min-id", "300",
                 "--txn-id", "cli-r1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1

    assert main(["corpus", "status", root]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert {s["name"] for s in st} == {"shards", "pack_tail",
                                       "corpus_hashes",
                                       "embeddings_base", "band_index"}
    assert all(s["drift"] == 0 for s in st)


def test_cli_corpus_neardup_lane(spark, tmp_path, capsys):
    """corpus --neardup routes the same verbs through the round-12
    near-dup admission lane: seven tables per transaction, same
    proofs, same replay idempotence."""
    root = str(tmp_path / "ndlane")
    assert main(["corpus", "bootstrap", root, "--max-id", "300",
                 "--neardup"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"catalog_version": 0}

    assert main(["corpus", "delta", root, "--min-id", "300",
                 "--txn-id", "cli-nd1", "--neardup"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1
    assert out["noreread_ok"] is True and out["incremental_ok"] is True

    # replayed txn id: the catalog does not advance
    assert main(["corpus", "delta", root, "--min-id", "300",
                 "--txn-id", "cli-nd1", "--neardup"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1

    assert main(["corpus", "status", root]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert {s["name"] for s in st} == {
        "shards", "pack_tail", "corpus_hashes", "minhash_sigs",
        "minhash_bands", "embeddings_base", "band_index"}
    assert all(s["drift"] == 0 for s in st)


def test_cli_corpus_image_lane(spark, tmp_path, capsys):
    """corpus --images routes the verbs through the round-13 image
    near-dup lane over an assets parquet: four tables per transaction,
    asset_id bounds, txn replay idempotence."""
    from databox_adls_loader_spark.operators import multimodal as mm
    from databox_adls_loader_spark.plans import queries_round12 as R12

    def plane(i, shift=0):
        px = R12._jpeg_pixels(i)
        return ([[v + shift for v in row] for row in px]
                if shift else px)

    assets = str(tmp_path / "assets.parquet")
    rows = ([(i, "image", bytearray(R12._mk_gray_jpeg(plane(i))),
              "image/jpeg") for i in range(6)]
            + [(10, "image",
                bytearray(R12._mk_gray_jpeg(plane(2, 5))),
                "image/jpeg"),               # near-dup of image 2
               (11, "image",
                bytearray(R12._mk_gray_jpeg(plane(9))),
                "image/jpeg")])              # fresh (ham > 6 to all)
    spark.createDataFrame(rows, mm.ASSET_SCHEMA).write.parquet(assets)

    root = str(tmp_path / "imglane")
    assert main(["corpus", "bootstrap", root, "--max-id", "5",
                 "--images", assets]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"catalog_version": 0}

    assert main(["corpus", "delta", root, "--min-id", "5",
                 "--txn-id", "cli-img1", "--images", assets]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1

    # replayed txn id: the catalog does not advance
    assert main(["corpus", "delta", root, "--min-id", "5",
                 "--txn-id", "cli-img1", "--images", assets]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["catalog_version"] == 1

    assert main(["corpus", "status", root]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert {s["name"] for s in st} == {
        "image_hashes", "image_codes", "image_bands", "image_admitted"}
    assert all(s["drift"] == 0 for s in st)

    from databox_adls_loader_spark.sinks import catalog as C
    adm = {r.asset_id for r in
           C.read_table(spark, root + "/catalog", "image_admitted")
           .collect()}
    assert 11 in adm and 10 not in adm

"""Command-line surface mirroring the reference tools, Spark-backed.

The reference is operated from the shell (`generate-file-list.py`,
`copy-acls.py`, `copy-to-adls.py` — see their argparse definitions,
generate-file-list.py:53-59, copy-acls.py:72-73), so engine parity
includes the command surface, not just the dataflow.  Subcommands:

  generate-file-list PATH -o OUT [-s BYTES] [-b BASENAME] [-d DEPTH]
      §3.1 — subtree rollup → bin pack → partitioned filelists
      (reference: generate-file-list.py; -s/-b flags kept verbatim).
  copy-acls [-s ACL_TEXT] (-g -i MAP | -i MAP --effects-dir DIR)
      §3.2 — -g emits the identity-map skeleton JSON from a
      `getfacl -R` replay (reference: copy-acls.py:84-104); otherwise
      remaps + "applies" ACLs, writing every planned operation and every
      tolerated failure to the effects dir (the sandbox stand-in for the
      REST call — point `sender` at a real endpoint to go live).
  copy-to-adls --inventory JSON -i MAP --effects-dir DIR
      §3.3 — dirs-before-files copy plan from a blob-listing JSON dump
      (reference: copy-to-adls.py:117-132), operations to the effects dir.
  query NAME [--sf-dir DIR] [-n ROWS]
      run any registry query (beyond-reference analytics surface).
  table VERB PATH ...
      versioned-table maintenance: history, vacuum, compact, optimize
      (incremental small-file), delete --where, rename-column,
      drop-column, rollback, show [-v N | --as-of TS] — the operator
      surface over sinks/versioned.py (beyond-reference lakehouse).

Everything runs through the same operators/pipelines the tests and the
oracle gate exercise; the CLI is argument parsing plus I/O glue only.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_CAPACITY = 109_951_162_777_600  # 100 TiB, generate-file-list.py:55


def _spark(app: str):
    from .session import get_spark

    return get_spark(app)


def _cmd_generate_file_list(args) -> int:
    import glob
    import os

    from .plans.pipelines import generate_filelists_from_path

    spark = _spark("generate-file-list")
    alloc = generate_filelists_from_path(
        spark, args.path, args.output_dir, capacity=args.databox_size,
        depth=args.depth)
    units = sorted(r["unit"] for r in
                   alloc.select("unit").distinct().collect() if r["unit"])
    # reference emits flat basename<N> files (generate-file-list.py:56);
    # stream-concatenate each unit's partitioned text output into one —
    # line streaming, never whole-list-in-memory
    for u in units:
        flat = os.path.join(args.output_dir, f"{args.filelist_basename}{u}")
        with open(flat, "w", encoding="utf-8") as out:
            for part in sorted(glob.glob(
                    os.path.join(args.output_dir, f"unit={u}", "part-*"))):
                with open(part, encoding="utf-8") as f:
                    out.writelines(f)
    print(json.dumps({"units": len(units), "out_dir": args.output_dir,
                      "basename": args.filelist_basename}))
    return 0


def _file_sender(path: str):
    """Append-to-file effect sender (local/driver-side or one file per
    executor — JSONL appends are line-atomic on POSIX)."""
    def send(req: dict) -> None:
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(req) + "\n")
    return send


def _cmd_copy_acls(args) -> int:
    from .plans.pipelines import acl_pipeline
    from .sinks.writers import write_identity_map
    from .sources.acl_scan import (assemble_acl_records, lines_df,
                                   read_getfacl_text)
    from .sources.identity import read_identity_map

    if not args.generate_identity_map and not args.effects_dir:
        print("copy-acls: --effects-dir is required unless "
              "-g/--generate-identity-map is given", file=sys.stderr)
        return 2
    spark = _spark("copy-acls")
    if args.source_acls:
        lines = read_getfacl_text(spark, args.source_acls)
    else:
        lines = lines_df(spark, [ln.rstrip("\n") for ln in sys.stdin])
    acls = assemble_acl_records(lines)
    if args.generate_identity_map:
        skeleton = acl_pipeline(acls, None, mode="generate-map")
        write_identity_map(skeleton, args.identity_map)
        print(json.dumps({"identities": skeleton.count(),
                          "identity_map": args.identity_map}))
        return 0
    dim = read_identity_map(spark, args.identity_map)
    sender = _file_sender(f"{args.effects_dir}/applied.jsonl")
    acl_pipeline(acls, dim, mode="apply", sender=sender,
                 effects_dir=args.effects_dir)
    print(json.dumps({"effects_dir": args.effects_dir}))
    return 0


def _cmd_copy_to_adls(args) -> int:
    from .plans.pipelines import copy_pipeline
    from .sources.identity import read_identity_map
    from .sources.inventory import project_inventory, read_blob_listing

    spark = _spark("copy-to-adls")
    inv = project_inventory(read_blob_listing(spark, args.inventory))
    dim = read_identity_map(spark, args.identity_map)
    ops = f"{args.effects_dir}/ops.jsonl"

    def creator(path: str) -> None:
        _file_sender(ops)({"op": "mkdir", "path": path})

    def copier(path: str, length: int) -> None:
        _file_sender(ops)({"op": "copy", "path": path, "len": length})

    stats = copy_pipeline(inv, dim, creator, copier)
    print(json.dumps({**stats, "effects_dir": args.effects_dir}))
    return 0


def _cmd_table(args) -> int:
    """Lakehouse maintenance verbs over a manifest-versioned table —
    the operator surface for `sinks/versioned.py` (history, vacuum,
    compaction, incremental OPTIMIZE, merge-on-read DELETE, rename/
    drop column, rollback, point-in-time reads)."""
    from .sinks import versioned as V

    t = args.table_dir
    if args.verb == "history":
        for e in V.history(t):
            print(json.dumps(e))
        return 0
    if args.verb == "vacuum":
        print(json.dumps({"deleted_files": V.vacuum(
            t, args.keep, older_than=args.older_than)}))
        return 0
    if args.verb == "clone":
        print(json.dumps({"version": V.clone_shallow(
            t, args.dst, version=args.version)}))
        return 0
    if args.verb == "rename-column":
        print(json.dumps({"version": V.rename_column(t, args.old, args.new)}))
        return 0
    if args.verb == "drop-column":
        print(json.dumps({"version": V.drop_column(t, args.column)}))
        return 0
    if args.verb == "widen-column":
        print(json.dumps({"version": V.widen_column(
            t, args.column, args.new_type)}))
        return 0
    if args.verb == "rollback":
        print(json.dumps({"version": V.rollback(t, args.to_version)}))
        return 0
    if args.verb == "health":
        from .sinks.maintenance import table_health
        print(json.dumps(table_health(t), default=str))
        return 0
    if args.verb == "align":
        from .sinks.maintenance import suggest_bucket_alignment
        print(json.dumps(suggest_bucket_alignment(
            t, args.right_dir, args.left_key, args.right_key,
            default_buckets=args.default_buckets)))
        return 0
    if args.verb == "describe":
        cur = V.latest_version(t)
        if cur is None:
            print(json.dumps({"error": "no snapshots"}))
            return 1
        doc = V._read_manifest_doc(t, cur)
        print(json.dumps({
            "version": cur,
            "files": len(doc["files"]),
            "rows": sum(int(s.get("num_rows", 0))
                        for s in (doc.get("stats") or {}).values()),
            "partition_spec": doc.get("partition_spec", []),
            "partitioned_files": len(doc.get("partitions", {})),
            "bloom_cols": doc.get("bloom_cols", []),
            "checks": doc.get("checks", []),
            "column_map": doc.get("column_map", {}),
            "dropped_cols": doc.get("dropped_cols", []),
            "files_with_deletes": len(doc.get("delete_files", {})),
            "eq_delete_entries": len(doc.get("eq_deletes", [])),
            "stream_batches": len(doc.get("batch_ids", []))}))
        return 0
    spark = _spark(f"table-{args.verb}")
    if args.verb == "compact":
        kw = {}
        if args.cluster_by:
            kw["cluster_by"] = args.cluster_by.split(",")
        if args.zorder_by:
            kw["zorder_by"] = tuple(args.zorder_by.split(","))
        v = V.compact_snapshot(spark, t, n_files=args.files, **kw)
        print(json.dumps({"version": v}))
        return 0
    if args.verb == "optimize":
        v = V.compact_small_files(spark, t, target_bytes=args.target_bytes)
        print(json.dumps({"version": v, "noop": v is None}))
        return 0
    if args.verb == "delete":
        v, n = V.delete_where(spark, t, args.where)
        print(json.dumps({"version": v, "n_deleted": n}))
        return 0
    if args.verb == "delete-keys":
        vals = [json.loads(x) for x in args.values.split(",")]
        v, n = V.delete_where_keys(spark, t, args.column, vals)
        print(json.dumps({"version": v, "n_keys": n}))
        return 0
    if args.verb == "update":
        sets = dict(kv.split("=", 1) for kv in args.set)
        v, n = V.update_where(spark, t, args.where, sets)
        print(json.dumps({"version": v, "n_updated": n}))
        return 0
    if args.verb == "show":
        df = V.read_version(spark, t, version=args.version,
                            as_of=args.as_of)
        for row in df.limit(args.n).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    if args.verb == "changes":
        v_to = args.to if args.to is not None else V.latest_version(t)
        df = V.changes_between(spark, t, getattr(args, "from"), v_to,
                               args.key, incremental=args.incremental,
                               emit_preimage=args.preimage)
        for row in df.limit(args.n).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    return 2


def _cmd_query(args) -> int:
    from .plans.queries import all_queries

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; {len(qs)} available",
              file=sys.stderr)
        return 2
    spark = _spark(f"query-{args.name}")
    df = qs[args.name](spark, args.sf_dir)
    for row in df.limit(args.n).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0



def _cmd_catalog(args) -> int:
    """`catalog pin|status|history|tables|read|vacuum` — the
    multi-table transactional catalog (sinks/catalog.py) as a CLI
    surface.  Only `read` needs a Spark session; everything else is
    manifest-plane JSON."""
    import json

    from .sinks import catalog as C

    if args.verb == "pin":
        v = C.commit_txn(args.cat_dir,
                         {args.name: (args.table_dir, args.version)},
                         txn_id=args.txn_id)
        print(json.dumps({"catalog_version": v,
                          "replayed": v is None}))
    elif args.verb == "status":
        print(json.dumps(C.catalog_status(args.cat_dir), indent=1))
    elif args.verb == "history":
        print(json.dumps(C.catalog_history(args.cat_dir), indent=1))
    elif args.verb == "tables":
        print(json.dumps(C.catalog_tables(args.cat_dir, args.version),
                         indent=1))
    elif args.verb == "vacuum":
        if args.name:
            n = C.vacuum_table(args.cat_dir, args.name,
                               keep_versions=args.keep)
            print(json.dumps({"table": args.name, "files_deleted": n}))
        else:
            n = C.vacuum_catalog(args.cat_dir, keep_versions=args.keep)
            print(json.dumps({"catalog_manifests_dropped": n}))
    else:                                  # read
        spark = _spark("catalog-read")
        df = C.read_table(spark, args.cat_dir, args.name,
                          catalog_version=args.version)
        for r in df.limit(args.n).collect():
            print(json.dumps(r.asDict(), default=str))
    return 0


def _cmd_ann(args) -> int:
    """`ann build|refresh|probe` — the persisted band index as a CLI
    surface: build once, refresh O(changes) after base commits, probe
    top-k through the committed index (plans/ann.py)."""
    import json

    from pyspark.sql import functions as F

    from .plans import ann

    geo = dict(dim=args.dim, n_bands=args.n_bands,
               planes_per_band=args.planes_per_band, seed=args.seed,
               id_col=args.id_col, vec_col=args.vec_col)
    spark = _spark(f"ann-{args.verb}")
    if True:
        if args.verb == "build":
            v = ann.build_ann_index(spark, args.index_dir,
                                    args.base_dir, **geo)
            print(json.dumps({"version": v}))
        elif args.verb == "refresh":
            v = ann.refresh_ann_index(spark, args.index_dir,
                                      args.base_dir, **geo)
            print(json.dumps({"version": v,
                              "current": v is None}))
        else:                              # probe
            from .sinks import versioned as V
            base = V.read_version(spark, args.base_dir)
            row = (base.filter(
                F.col(args.id_col) == args.query_id)
                .select(args.vec_col).first())
            if row is None:
                print(json.dumps({"error":
                                  f"no vector {args.query_id}"}))
                return 1
            got = ann.probe_topk(spark, args.index_dir, args.base_dir,
                                 list(row[0]), k=args.k,
                                 n_bands=args.n_bands,
                                 planes_per_band=args.planes_per_band,
                                 seed=args.seed, id_col=args.id_col,
                                 vec_col=args.vec_col).collect()
            print(json.dumps([{args.id_col: r[0], "sim": r["sim"]}
                              for r in got]))
        return 0


def _cmd_corpus(args) -> int:
    """`corpus bootstrap|delta|status` — the incremental corpus lane as
    an operational surface (plans/queries_round11.incr_bootstrap /
    incr_delta_round): bootstrap assembles dedup->pack->index->catalog
    once; each `delta` run ingests a doc_id slice incrementally
    (committed windows unread) and publishes one catalog transaction;
    `status` surfaces per-table drift through the lane's catalog.
    ``--neardup`` routes both mutations through the round-12 lane
    (plans/queries_round12.nd_bootstrap / nd_delta_round): the same
    contract plus banded MinHash admission against the persisted
    signature/band tables — seven tables per transaction instead of
    five.  ``--images <assets.parquet>`` routes through the round-13
    IMAGE lane (plans/queries_round13.ndi_bootstrap / ndi_delta_round):
    pixel-identity anti-join + banded Hamming admission over a
    multimodal crawl's image assets — four tables per transaction, id
    bounds on asset_id.  A lane root is one of the three; don't mix."""
    import json
    import os

    from pyspark.sql import functions as F

    from .plans.queries_round11 import incr_bootstrap, incr_delta_round
    from .plans.queries_round12 import nd_bootstrap, nd_delta_round
    from .plans.queries_round13 import (_NDI_TABLES, ndi_bootstrap,
                                        ndi_delta_round)
    from .session import load_tables
    from .sinks import catalog as C

    root = args.root_dir
    neardup = getattr(args, "neardup", False)
    images = getattr(args, "images", None)
    names = (_NDI_TABLES if images
             else ("shards", "tail", "hash", "sig", "bandt", "emb",
                   "idx") if neardup
             else ("shards", "tail", "hash", "emb", "idx"))
    dirs = tuple(os.path.join(root, n) for n in names)
    cat = os.path.join(root, "catalog")
    if args.verb == "status":
        print(json.dumps(C.catalog_status(cat)))
        return 0
    spark = _spark(f"corpus-{args.verb}")
    if images:
        aid = F.col("asset_id")
        assets = spark.read.parquet(images)
        if args.verb == "bootstrap":
            if args.max_id is not None:
                assets = assets.filter(aid <= args.max_id)
            ndi_bootstrap(spark, dirs, cat, assets)
            print(json.dumps(
                {"catalog_version": C.catalog_latest(cat)}))
            return 0
        assets = assets.filter(aid > args.min_id)
        if args.max_id is not None:
            assets = assets.filter(aid <= args.max_id)
        ndi_delta_round(spark, dirs, cat, assets,
                        txn_id=args.txn_id, round_seq=args.round_seq)
        print(json.dumps({"catalog_version": C.catalog_latest(cat)}))
        return 0
    t = load_tables(spark, args.sf_dir, ["documents", "embeddings"])
    docs, emb = t["documents"], t["embeddings"]
    if neardup:
        docs = docs.select("doc_id", "text", "n_chars")
    did = F.col("doc_id")
    if args.verb == "bootstrap":
        scope = docs if args.max_id is None else docs.filter(
            did <= args.max_id)
        (nd_bootstrap if neardup else incr_bootstrap)(
            spark, dirs, cat, scope, emb)
        print(json.dumps({"catalog_version": C.catalog_latest(cat)}))
        return 0
    scope = docs.filter(did > args.min_id)
    if args.max_id is not None:
        scope = scope.filter(did <= args.max_id)
    nr, ic = (nd_delta_round if neardup else incr_delta_round)(
        spark, dirs, cat, scope, emb,
        txn_id=args.txn_id, round_seq=args.round_seq)
    print(json.dumps({"catalog_version": C.catalog_latest(cat),
                      "noreread_ok": nr, "incremental_ok": ic}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="databox_adls_loader_spark",
        description="Spark-native databox/ADLS loader engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate-file-list",
                       help="filelists sized to databox capacity (§3.1)")
    g.add_argument("path", help="base path of the tree to process")
    g.add_argument("-s", "--databox-size", type=int,
                   default=DEFAULT_CAPACITY,
                   help="size of each databox in bytes")
    g.add_argument("-b", "--filelist-basename", default="filelist")
    g.add_argument("-o", "--output-dir", required=True)
    g.add_argument("-d", "--depth", type=int, default=1,
                   help="directory level to pack at")
    g.set_defaults(fn=_cmd_generate_file_list)

    a = sub.add_parser("copy-acls",
                       help="identity-map skeleton or ACL remap+apply (§3.2)")
    a.add_argument("-s", "--source-acls",
                   help="getfacl -R replay text file (stdin if omitted)")
    a.add_argument("-g", "--generate-identity-map", action="store_true")
    a.add_argument("-i", "--identity-map", required=True,
                   help="identity-map JSON (output for -g, input otherwise)")
    a.add_argument("--effects-dir",
                   help="planned-operation + tolerated-failure log dir")
    a.set_defaults(fn=_cmd_copy_acls)

    c = sub.add_parser("copy-to-adls",
                       help="dirs-before-files copy plan (§3.3)")
    c.add_argument("--inventory", required=True,
                   help="blob-listing JSON dump (az storage blob list)")
    c.add_argument("-i", "--identity-map", required=True)
    c.add_argument("--effects-dir", required=True)
    c.set_defaults(fn=_cmd_copy_to_adls)

    t = sub.add_parser("table",
                       help="versioned-table maintenance (lakehouse verbs)")
    tv = t.add_subparsers(dest="verb", required=True)
    for verb, help_ in [
            ("history", "DESCRIBE HISTORY (manifest-only)"),
            ("vacuum", "drop old manifests + unreferenced files"),
            ("compact", "full rewrite into N files (cluster/zorder)"),
            ("optimize", "incremental small-file compaction"),
            ("delete", "merge-on-read DELETE (position-delete files)"),
            ("delete-keys", "EQUALITY delete by key values "
                            "(O(keys) commit, no data scan)"),
            ("update", "merge-on-read UPDATE ... SET ... WHERE"),
            ("rename-column", "metadata-only RENAME COLUMN"),
            ("drop-column", "metadata-only DROP COLUMN"),
            ("widen-column", "metadata-only type widening "
                             "(int->long, float->double, decimal p+)"),
            ("rollback", "re-commit an old version's file list"),
            ("clone", "zero-copy shallow clone to a new table dir"),
            ("describe", "table metadata: layout, constraints, state"),
            ("health", "maintenance advisor: small files, overlay "
                       "debt, clustering drift (manifest-only)"),
            ("changes", "row-level change feed between two versions "
                        "(CDF; --incremental reads only changed files)"),
            ("align", "bucket-alignment advisor for a joined table "
                      "pair (emits the declare-and-OPTIMIZE line)"),
            ("show", "read a version (latest, -v N, or --as-of TS)")]:
        sp = tv.add_parser(verb, help=help_)
        sp.add_argument("table_dir")
        sp.set_defaults(fn=_cmd_table)
        if verb == "vacuum":
            sp.add_argument("--keep", type=int, default=2)
            sp.add_argument("--older-than",
                            help="ISO timestamp: keep versions at or "
                                 "after this (latest always kept)")
        elif verb == "clone":
            sp.add_argument("dst")
            sp.add_argument("-v", "--version", type=int)
        elif verb == "compact":
            sp.add_argument("--files", type=int, default=1)
            sp.add_argument("--cluster-by", help="comma-separated columns")
            sp.add_argument("--zorder-by", help="two columns, comma-sep")
        elif verb == "optimize":
            sp.add_argument("--target-bytes", type=int,
                            default=128 * 1024 * 1024)
        elif verb == "delete":
            sp.add_argument("--where", required=True,
                            help="boolean SQL expression (logical names)")
        elif verb == "delete-keys":
            sp.add_argument("column")
            sp.add_argument("values",
                            help="comma-separated JSON literals, e.g. "
                                 "1,2,3 or \"a\",\"b\"")
        elif verb == "update":
            sp.add_argument("--where", required=True,
                            help="boolean SQL expression (logical names)")
            sp.add_argument("--set", action="append", required=True,
                            metavar="COL=EXPR",
                            help="repeatable: column=SQL expression")
        elif verb == "rename-column":
            sp.add_argument("old")
            sp.add_argument("new")
        elif verb == "drop-column":
            sp.add_argument("column")
        elif verb == "widen-column":
            sp.add_argument("column")
            sp.add_argument("new_type")
        elif verb == "rollback":
            sp.add_argument("to_version", type=int)
        elif verb == "show":
            sp.add_argument("-v", "--version", type=int)
            sp.add_argument("--as-of", help="ISO timestamp")
            sp.add_argument("-n", type=int, default=20)
        elif verb == "align":
            sp.add_argument("right_dir")
            sp.add_argument("--left-key", required=True)
            sp.add_argument("--right-key", required=True)
            sp.add_argument("--default-buckets", type=int, default=32)
        elif verb == "changes":
            sp.add_argument("--from", type=int, required=True,
                            dest="from", help="base version (exclusive)")
            sp.add_argument("--to", type=int,
                            help="end version (default: latest)")
            sp.add_argument("--key", required=True,
                            help="unique key column for the diff")
            sp.add_argument("--incremental", action="store_true",
                            help="derive from manifests when possible")
            sp.add_argument("--preimage", action="store_true",
                            help="also emit update_preimage rows")
            sp.add_argument("-n", type=int, default=20)

    an = sub.add_parser("ann", help="persisted ANN band index: build, "
                                    "O(changes) refresh, top-k probe")
    av = an.add_subparsers(dest="verb", required=True)
    for verb, help_ in [
            ("build", "full index build over the base's latest snapshot"),
            ("refresh", "maintain from the change feed (O(changes))"),
            ("probe", "top-k through the committed index")]:
        sp = av.add_parser(verb, help=help_)
        sp.add_argument("index_dir")
        sp.add_argument("base_dir")
        sp.add_argument("--dim", type=int, default=64)
        sp.add_argument("--n-bands", type=int, default=4)
        sp.add_argument("--planes-per-band", type=int, default=8)
        sp.add_argument("--seed", type=int, default=7)
        sp.add_argument("--id-col", default="vec_id")
        sp.add_argument("--vec-col", default="embedding")
        if verb == "probe":
            sp.add_argument("--query-id", type=int, required=True)
            sp.add_argument("-k", type=int, default=10)
        sp.set_defaults(fn=_cmd_ann)

    ca = sub.add_parser("catalog",
                        help="multi-table transactional catalog: pin, "
                             "status, history, tables, read, vacuum")
    cv = ca.add_subparsers(dest="verb", required=True)
    for verb, help_ in [
            ("pin", "one-table txn: pin a table's version in the catalog"),
            ("status", "per-table drift: pinned vs table-log latest"),
            ("history", "catalog commits and which tables each re-pinned"),
            ("tables", "name -> (path, pinned version) at a snapshot"),
            ("read", "read a table AT ITS PINNED version"),
            ("vacuum", "drop old catalog snapshots, or catalog-aware "
                       "table vacuum (--name keeps pinned versions)")]:
        sp = cv.add_parser(verb, help=help_)
        sp.add_argument("cat_dir")
        sp.set_defaults(fn=_cmd_catalog)
        if verb == "pin":
            sp.add_argument("name")
            sp.add_argument("table_dir")
            sp.add_argument("-v", "--version", type=int,
                            help="explicit table version (default latest)")
            sp.add_argument("--txn-id", help="idempotence ledger id")
        elif verb == "tables":
            sp.add_argument("-v", "--version", type=int,
                            help="catalog version (default latest)")
        elif verb == "read":
            sp.add_argument("name")
            sp.add_argument("-v", "--version", type=int,
                            help="catalog version (default latest)")
            sp.add_argument("-n", type=int, default=20)
        elif verb == "vacuum":
            sp.add_argument("--name",
                            help="table to vacuum (omit: vacuum the "
                                 "catalog manifests themselves)")
            sp.add_argument("--keep", type=int, default=2)

    co = sub.add_parser("corpus",
                        help="incremental corpus lane: bootstrap once, "
                             "ingest doc_id slices as delta rounds, "
                             "inspect catalog drift")
    cov = co.add_subparsers(dest="verb", required=True)
    for verb, help_ in [
            ("bootstrap", "full assemble + atomic publish of the lane"),
            ("delta", "one incremental round over a doc_id slice"),
            ("status", "per-table drift through the lane's catalog")]:
        sp = cov.add_parser(verb, help=help_)
        sp.add_argument("root_dir",
                        help="lane root (holds shards/tail/hash/emb/idx "
                             "tables and the catalog)")
        sp.set_defaults(fn=_cmd_corpus)
        if verb != "status":
            sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
            sp.add_argument("--neardup", action="store_true",
                            help="route through the near-dup admission "
                                 "lane (banded MinHash vs the persisted "
                                 "sig/band tables; 7-table txns)")
            sp.add_argument("--images",
                            help="route through the IMAGE near-dup "
                                 "lane over this assets parquet "
                                 "(asset_id/modality/content/mime — "
                                 "pixel-identity anti-join + banded "
                                 "Hamming admission; 4-table txns); "
                                 "id bounds apply to asset_id")
        if verb == "bootstrap":
            sp.add_argument("--max-id", type=int,
                            help="bootstrap scope: doc_id <= max-id")
        elif verb == "delta":
            sp.add_argument("--min-id", type=int, required=True,
                            help="slice lower bound (exclusive)")
            sp.add_argument("--max-id", type=int,
                            help="slice upper bound (inclusive)")
            sp.add_argument("--txn-id", required=True,
                            help="idempotence ledger id for the round")
            sp.add_argument("--round-seq", type=int,
                            help="per-round write-ledger id: a rerun "
                                 "of a mid-crashed round resumes at "
                                 "the missing table writes")

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("-n", type=int, default=20, help="max rows to print")
    q.set_defaults(fn=_cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

"""Local stand-in for the driver's t2 gate: run every queries() entry on
Spark and its oracle on DuckDB at sf0.01, compare row count + column names +
an order-insensitive value hash.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    """Type-TAGGED normalization: the driver's hash gate is type-sensitive
    (DuckDB HUGEINT surfaces differently from Spark's long even when values
    are numerically identical — round-1 s2/j3 FAILs), so int and float must
    normalize distinctly here too, or the local gate is blinder than the
    driver's."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.10g}"
    if isinstance(v, int):
        return f"i:{v}"
    return str(v)


# DuckDB column_type (from DESCRIBE <sql>) → coarse type class.  Spark has no
# 128-bit integer, so HUGEINT/UHUGEINT in an oracle output is an automatic
# mismatch against any Spark schema — the round-1 failure mode.
_DUCK_CLASS = [
    # complex types first: 'BIGINT[]' must classify as array, not int
    ("[]", "array"), ("LIST", "array"), ("STRUCT", "struct"), ("MAP", "map"),
    ("HUGEINT", "int128"), ("UHUGEINT", "int128"),
    ("BIGINT", "int"), ("INTEGER", "int"), ("SMALLINT", "int"),
    ("TINYINT", "int"), ("UBIGINT", "int"), ("UINTEGER", "int"),
    ("USMALLINT", "int"), ("UTINYINT", "int"),
    ("DOUBLE", "float"), ("FLOAT", "float"), ("REAL", "float"),
    # JSON fetches as a Python str and hashes as one (driver round-1 pass)
    ("DECIMAL", "decimal"), ("VARCHAR", "string"), ("JSON", "string"),
    ("BOOLEAN", "bool"),
    ("TIMESTAMP", "timestamp"), ("DATE", "date"), ("BLOB", "binary"),
]

_SPARK_CLASS = [
    ("array", "array"), ("struct", "struct"), ("map", "map"),
    ("bigint", "int"), ("smallint", "int"), ("tinyint", "int"),
    ("long", "int"), ("int", "int"),
    ("double", "float"), ("float", "float"),
    ("decimal", "decimal"), ("string", "string"), ("boolean", "bool"),
    ("timestamp", "timestamp"), ("date", "date"), ("binary", "binary"),
]


def _classify(typ, table):
    t = typ.upper() if table is _DUCK_CLASS else typ.lower()
    for pat, cls in table:
        if pat in t:
            return cls
    return f"other({typ})"


def type_mismatches(spark_dtypes, duck_desc):
    """Compare Spark dtypes to DuckDB DESCRIBE output by column name at
    type-CLASS granularity (int vs int128 vs float vs decimal vs ...).
    Returns list of 'col: spark=X duck=Y' problem strings."""
    duck = {name: _classify(typ, _DUCK_CLASS) for name, typ in duck_desc}
    probs = []
    for name, styp in spark_dtypes:
        if name not in duck:
            continue  # column-name mismatch reported separately
        scls, dcls = _classify(styp, _SPARK_CLASS), duck[name]
        if dcls == "int128":
            probs.append(f"type {name}: duck={duck[name]} (HUGEINT — Spark "
                         f"has no int128; CAST the oracle aggregate)")
        elif scls != dcls:
            probs.append(f"type {name}: spark={styp}({scls}) vs duck={dcls}")
    return probs


def value_hash(rows, colnames):
    # order-insensitive: hash each row (cols sorted by name), XOR-free:
    # sort row digests then hash the concatenation.  Cells join on \x1f
    # (unit separator): a printable separator like '|' would let two
    # different rows serialize identically when a string cell contains it
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    digests = sorted(
        hashlib.md5("\x1f".join(norm_cell(r[i]) for i in idx).encode()).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(digests).encode()).hexdigest()


def main():
    import __spark_entry__ as entrymod
    from databox_adls_loader_spark.session import get_spark

    spark = get_spark("correctness-check")
    from databox_adls_loader_spark.session import ALL_TABLES
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from databox_adls_loader_spark.cache import release_cached

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = n_rowsonly = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "fail",
                             "problems": [f"spark error: {e}"[:300]]}
            n_fail += 1
            continue
        finally:
            # per-query cache hygiene, same contract as bench.py: operators
            # persist lazily-consumed intermediates; the harness releases
            # them once the action is done
            release_cached(spark)
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle)")
            results[name] = {"status": "rows_only",
                             "spark_rows": len(spark_rows)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            duck_desc = [(r[0], r[1]) for r in
                         con.execute(f"DESCRIBE {oracles[name]}").fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"status": "fail",
                             "problems": [f"duckdb error: {e}"[:300]]}
            n_fail += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        problems.extend(type_mismatches(sdf.dtypes, duck_desc))
        if not problems:
            h1 = value_hash(spark_rows, spark_cols)
            h2 = value_hash(duck_rows, duck_cols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                s = sorted(spark_rows, key=str)
                d = sorted(duck_rows, key=str)
                for a, b in zip(s, d):
                    if [norm_cell(x) for x in a] != [norm_cell(x) for x in b]:
                        problems.append(f"  spark={a!r}")
                        problems.append(f"  duck ={b!r}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            results[name] = {"status": "fail", "problems": problems,
                             "spark_rows": len(spark_rows)}
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spark_rows)} rows)")
            results[name] = {"status": "pass", "spark_rows": len(spark_rows)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    # committed per round so driver sampling can never surface a surprise:
    # the full-registry gate result travels with the snapshot
    if not only:
        import json
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json")
        with open(out, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_rowsonly, "queries": results},
                      f, indent=1, sort_keys=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

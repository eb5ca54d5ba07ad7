"""Run every registry query TWICE in one session and compare value hashes.

The oracle gate (check_correctness.py) is order-insensitive by design, so
it cannot see run-to-run nondeterminism *within* Spark — e.g. a float
aggregate whose result depends on partition merge order, a limit over a
non-total ordering, or an approximate operator leaking RNG state.  Any of
those would make the DRIVER's own gate flaky (green one round, red the
next, same code).  This audit catches them first: two fresh-plan
executions per query, same session, hashes must be identical.

Usage: python tools/check_determinism.py [name ...]   (default: all)
Env:   SPARK_GRAFT_ORACLE_SF_DIR (default /root/testdata/sf0.01)

Writes DETERMINISM_LOCAL.json and exits non-zero on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from check_correctness import SF_DIR, value_hash  # noqa: E402


def main() -> None:
    import __spark_entry__ as entrymod
    from databox_adls_loader_spark.cache import release_cached
    from databox_adls_loader_spark.session import get_spark

    spark = get_spark("determinism-check")
    qs = entrymod.queries()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    n_ok = n_bad = n_err = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        hashes = []
        try:
            for _ in range(2):
                # fresh plan per run: rebuilding the DataFrame re-runs any
                # driver-side setup (samples, codebooks, literals) too, so
                # nondeterminism there is caught as well
                sdf = fn(spark, SF_DIR)
                rows = [tuple(r) for r in sdf.collect()]
                hashes.append(value_hash(rows, sdf.columns))
                release_cached(spark)
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            results[name] = {"status": "error", "err": str(e)[:300]}
            n_err += 1
            continue
        if hashes[0] == hashes[1]:
            results[name] = {"status": "deterministic"}
            n_ok += 1
        else:
            print(f"FLAKY {name}: run1={hashes[0][:12]} run2={hashes[1][:12]}")
            results[name] = {"status": "flaky",
                             "h1": hashes[0], "h2": hashes[1]}
            n_bad += 1

    # the committed record is only ever the FULL registry — a partial run
    # must not overwrite it (that's how round-7's 234-entry drift happened)
    if not only:
        out = {"n_deterministic": n_ok, "n_flaky": n_bad, "n_error": n_err,
               "sf_dir": SF_DIR, "queries": results}
        path = os.path.join(os.path.dirname(_TOOLS),
                            "DETERMINISM_LOCAL.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{n_ok} deterministic, {n_bad} flaky, {n_err} error")
    spark.stop()
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()

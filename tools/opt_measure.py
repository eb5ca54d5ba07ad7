"""Round-14 optimization measurement harness.

For each named registry query: time the computation with the NOOP sink
(guide §1.4 — eager full-column compute, no collect cost), min of N
fresh-plan runs, and optionally dump `.explain("formatted")` to
plans/r13/<name>_<tag>.txt.

Usage:
    python tools/opt_measure.py [--runs N] [--plan-tag before|after]
                                [--collect] name [name ...]

`--collect` additionally times the bench-methodology action (collect)
so numbers can be read against BENCH_LOCAL.json medians.  Labels every
job (guide §1.5) so a live UI/event log attributes stages.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

PLAN_DIR = os.path.join(REPO_ROOT, "plans", "r14")


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    tag = None
    do_collect = False
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    if "--plan-tag" in args:
        i = args.index("--plan-tag")
        tag = args[i + 1]
        del args[i:i + 2]
    if "--collect" in args:
        args.remove("--collect")
        do_collect = True
    names = args

    from databox_adls_loader_spark.cache import release_cached
    from databox_adls_loader_spark.plans.queries import all_queries
    from databox_adls_loader_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = all_queries()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", flush=True)
            continue
        rec: dict = {}
        best = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} [noop r{r}]")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            release_cached(spark)
        rec["noop_min"] = round(best, 4)
        if do_collect:
            best = None
            for r in range(runs):
                spark.sparkContext.setJobDescription(f"{name} [collect r{r}]")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.collect()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
                release_cached(spark)
            rec["collect_min"] = round(best, 4)
        spark.sparkContext.setJobDescription(None)
        if tag:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            release_cached(spark)
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}", flush=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

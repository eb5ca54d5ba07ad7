"""Interactive measurement prelude (round-13 optimization work):
`python -i tools/_repl.py` then tq('name') for warm min-of-N noop
timings.  Not part of the engine; uses the same session/query registry
as bench.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databox_adls_loader_spark.cache import release_cached  # noqa: E402
from databox_adls_loader_spark.plans.queries import all_queries  # noqa: E402
from databox_adls_loader_spark.session import (get_spark,  # noqa: E402
                                               load_tables, spread)

spark = get_spark("interactive")
spark.range(1_000_000).selectExpr("sum(id)").collect()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = all_queries()
docs = load_tables(spark, sf, ["documents"])["documents"]


def t(f, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        el = time.perf_counter() - t0
        best = el if best is None or el < best else best
    print(round(best, 4))
    return best


def tq(name, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        release_cached(spark)
        best = el if best is None or el < best else best
    print(name, round(best, 4))
    return best


def ex(name):
    df = qs[name](spark, sf)
    print(df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"))
    release_cached(spark)

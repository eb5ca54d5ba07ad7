"""X1 first-fit bin packing, X2 oversized-directory recursion, X3 ordered
emission.

Reference: /root/reference/generate-file-list.py:27-46 — sequentially assign
each directory (listing order) to the first Data Box unit with remaining
capacity, open a new unit when none fits, leave oversized dirs unassigned
(unit=0) and re-scan them one level deeper until the fragments fit.
Default capacity 109,951,162,777,600 B (100 TiB) (:55).

Spark-first split of responsibilities (SURVEY §2.6):
  * the *size rollup* is distributed (A1) — that is the 100 TB part;
  * the *pack* runs on the driver over the aggregated directory list —
    exact first-fit is inherently sequential, and the directory count is
    tiny relative to data volume (millions of dirs ⇒ a few hundred MB on
    the driver, fine);
  * for huge directory counts there is a *distributed relaxation*:
    next-fit via a running-sum window, documented as such.
X2 is a BFS loop in the pipeline driver: each iteration re-lists only the
still-oversized frontier one level down — each round is one distributed
scan + agg, never a per-directory fork.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CAPACITY = 109_951_162_777_600  # 100 TiB — generate-file-list.py:55


@dataclass
class PackResult:
    allocations: list[dict]     # {path, size, unit}; unit=0 ⇒ unassigned
    units_free: list[int]       # remaining capacity per opened unit


def first_fit(dirs: list[tuple[str, int]], capacity: int = DEFAULT_CAPACITY,
              units_free: list[int] | None = None) -> PackResult:
    """Exact first-fit in input order (generate-file-list.py:27-43).

    Dirs with size > capacity stay unit=0 (caller recurses into them, X2).
    ``units_free`` carries remaining capacities across recursion rounds so
    fragments of an oversized dir can fill earlier units, matching the
    reference's single shared unitsSpaceAvailable list.
    """
    free = list(units_free) if units_free is not None else []
    out = []
    for path, size in dirs:
        unit = 0
        if size <= capacity:
            for i, avail in enumerate(free):
                if size <= avail:
                    free[i] -= size
                    unit = i + 1
                    break
            else:
                free.append(capacity - size)
                unit = len(free)
        out.append({"path": path, "size": int(size), "unit": unit})
    return PackResult(out, free)


def pack_directories(sizes: DataFrame, capacity: int = DEFAULT_CAPACITY,
                     order_col: str = "path") -> DataFrame:
    """X1 driver-side exact pack over a distributed rollup.

    ``sizes`` is (path, size).  Ordering is made explicit (orderBy path) —
    the reference depends on listing order implicitly; lexicographic order
    reproduces it for a lexicographic lister (SURVEY §7 phase 3).
    Returns a DataFrame (path, size, unit).
    """
    rows = [(r["path"], r["size"]) for r in
            sizes.orderBy(order_col).select("path", "size").collect()]
    res = first_fit(rows, capacity)
    return sizes.sparkSession.createDataFrame(
        [(a["path"], a["size"], a["unit"]) for a in res.allocations],
        "path: string, size: long, unit: int",
    )


def pack_next_fit_window(sizes: DataFrame, capacity: int = DEFAULT_CAPACITY,
                         order_col: str = "path") -> DataFrame:
    """X1 distributed relaxation: next-fit by running sum —
    unit = floor(cumsum_exclusive / capacity) + 1 over path order.

    Semantic relaxation vs first-fit (documented): units may be left
    fractionally fuller/emptier because bins never reopen; guarantees the
    same cover-every-dir-exactly-once invariant and ≤capacity per unit for
    any input where every size ≤ capacity.  Oversized dirs stay unit=0 as
    in the exact form.  The running sum is the two-phase range-partitioned
    form (operators/windows.exclusive_running_sum) — a bare global window
    would funnel every row through one partition, which is exactly the
    cliff this relaxation exists to avoid.
    """
    from .windows import exclusive_running_sum

    counted = sizes.withColumn(
        "__fit_size",
        F.when(F.col("size") <= capacity, F.col("size")).otherwise(F.lit(0))
        .cast("decimal(38,6)"))
    with_run = exclusive_running_sum(
        counted, order_col, F.col("__fit_size"), out_col="__prior")
    return with_run.select(
        "path", "size",
        F.when(F.col("size") > capacity, F.lit(0))
        .otherwise((F.floor(F.col("__prior") / F.lit(capacity)) + 1)
                   .cast("int"))
        .alias("unit"),
    )


def pack_with_recursion(list_children, root: str,
                        capacity: int = DEFAULT_CAPACITY,
                        max_depth: int = 20) -> DataFrame:
    """X2 oversize-descent driver loop.

    ``list_children(path) -> DataFrame(path, size)`` lists immediate
    children with recursive sizes (the S2 scan).  Oversized entries are
    re-listed one level down, repeatedly; fitting entries accumulate and
    are first-fit packed in discovery order with capacities carried across
    rounds — mirroring generate-file-list.py:27-46's depth-first behavior
    at the level of what ends up assigned.
    """
    spark = None
    fitting: list[tuple[str, int]] = []
    oversized_frontier = [root]
    unassigned: list[tuple[str, int]] = []
    depth = 0
    free: list[int] = []
    allocations: list[dict] = []
    while oversized_frontier and depth < max_depth:
        frontier, oversized_frontier = oversized_frontier, []
        for d in frontier:
            children = list_children(d)
            spark = children.sparkSession
            rows = [(r["path"], int(r["size"]))
                    for r in children.orderBy("path").collect()]
            fit = [(p, s) for p, s in rows if s <= capacity]
            over = [(p, s) for p, s in rows if s > capacity]
            res = first_fit(fit, capacity, units_free=free)
            free = res.units_free
            allocations.extend(res.allocations)
            unassigned.extend(over)
            oversized_frontier.extend(p for p, _ in over)
        depth += 1
    allocations.extend({"path": p, "size": s, "unit": 0} for p, s in unassigned)
    return spark.createDataFrame(
        [(a["path"], a["size"], a["unit"]) for a in allocations],
        "path: string, size: long, unit: int",
    )

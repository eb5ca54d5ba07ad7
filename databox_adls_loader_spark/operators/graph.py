"""Connected components over a pair graph — transitive near-dup clustering.

Pairwise near-dup output (MinHash/SimHash/Jaccard) is a graph; the
*cluster* a pipeline deduplicates by is its connected component (A~B,
B~C ⇒ {A,B,C} even when A~C was never scored).  The greedy drop-larger-id
rule (operators/corpus.py) is the cheap approximation; this is the exact
form.

Algorithm: iterative min-label propagation — every node takes the minimum
label in its neighborhood until a fixed point.  Converges in O(graph
diameter) rounds; near-dup graphs are unions of small dense clusters, so
diameter is tiny.  Each round is one join + one aggregate; lineage is
truncated per round (`localCheckpoint`) or the plan tree grows
exponentially across iterations — the classic iterative-DataFrame trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 25) -> DataFrame:
    """(n, component) for every node in ``edges``; component = min node id
    reachable.  Raises if not converged within ``max_iter`` rounds (set it
    above the expected diameter)."""
    sym = (edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
           .union(edges.select(F.col(b_col).alias("src"),
                               F.col(a_col).alias("dst")))
           .distinct()
           .persist())
    labels = (sym.select(F.col("src").alias("n")).distinct()
              .withColumn("lbl", F.col("n"))
              .localCheckpoint())
    # labels only ever decrease, so the label sum strictly decreases until
    # the fixed point — equal sums ⇔ converged.  One cheap scalar aggregate
    # over the checkpointed frame per round instead of a join + count.
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["n"])
            .groupBy("src").agg(F.min("lbl").alias("nbr_lbl"))
        )
        labels = (
            labels.join(nbr_min, labels["n"] == nbr_min["src"], "left")
            .select(labels["n"],
                    F.least(labels["lbl"],
                            F.coalesce(F.col("nbr_lbl"), labels["lbl"]))
                    .alias("lbl"))
            .localCheckpoint()   # truncate lineage every round
        )
        new_sum = labels.agg(F.sum("lbl")).first()[0]
        if new_sum == prev_sum:
            sym.unpersist()
            return labels.select(F.col("n"), F.col("lbl").alias("component"))
        prev_sum = new_sum
    sym.unpersist()
    raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame, a_col: str = "a",
                   b_col: str = "b") -> DataFrame:
    """Near-dup clusters from a pair list: (component, members, n_members),
    the keep-one-per-cluster form of transitive dedup (keep = min id =
    the component label itself)."""
    cc = connected_components(pairs, a_col, b_col)
    return (
        cc.groupBy("component")
        .agg(F.array_sort(F.collect_list("n")).alias("members"),
             F.count(F.lit(1)).alias("n_members"))
    )


def degree_distribution(pairs: DataFrame, a_col: str = "a",
                        b_col: str = "b") -> DataFrame:
    """(degree, n_nodes) histogram of an undirected pair graph — the
    sanity check run on a near-dup pair list BEFORE clustering it: a
    heavy tail here (one doc paired with thousands) means a boilerplate
    template is about to glue unrelated documents into one giant
    component, and the pair-generation threshold needs tightening.

    Two skinny shuffles (endpoint → degree, degree → count) over 2×|E|
    rows; both partial-aggregate map-side, so a hot node collapses to
    one row per input partition before the shuffle — the profile never
    suffers the skew it detects."""
    ends = (pairs.select(F.col(a_col).alias("n"))
            .unionAll(pairs.select(F.col(b_col).alias("n"))))
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("degree"))


def cluster_representatives(cc: DataFrame, docs: DataFrame,
                            score_col: str = "n_chars",
                            id_col: str = "doc_id") -> DataFrame:
    """Pick the document to KEEP from each near-dup cluster: the highest
    ``score_col`` (longest doc by default), ties to the smallest id —
    the survivor-selection stage that turns `connected_components` output
    into a dedup decision (min-id canonical is fine for exact dupes, but
    near-dup clusters should keep the best member, not the first).

    One aggregate per component via `min_by` over a (-score, id) struct
    — no window, no sort; shuffle keyed by component.  Component count ≪
    doc count, so the output is small even at corpus scale.  The struct
    negates the SCORE (numeric by contract) rather than the id, so the
    smallest-id tie-break stays deterministic for string/uuid id columns
    too (negating a string id casts to double → NULL → arbitrary pick).
    """
    j = cc.join(docs, cc["n"] == docs[id_col]).select(
        "component", F.col(id_col).alias("__id"), F.col(score_col).alias("__s"))
    return (
        j.groupBy("component")
        .agg(
            F.min_by("__id", F.struct((-F.col("__s")).alias("s"),
                                      F.col("__id").alias("i")))
            .alias("rep_" + id_col),
            F.count(F.lit(1)).alias("n_members"),
            F.max("__s").alias("max_" + score_col),
        )
    )


def pagerank_int(edges: DataFrame, a_col: str = "a", b_col: str = "b",
                 iters: int = 3, scale: int = 1_000_000_000) -> DataFrame:
    """Fixed-iteration PageRank on the undirected pair graph in EXACT
    scaled-integer arithmetic (ranks in parts-per-``scale``): every step
    is bigint add / multiply / integer-division, so the result is
    bit-identical regardless of partitioning, summation order, or engine
    — an *oracle-checkable iterative graph algorithm* (the SQL oracle
    unrolls the same iterations as CTE layers).

    Update rule (all integer ops, damping 85/100):
        contrib(j) = r(j) DIV deg(j)
        r'(i)      = (15·scale DIV 100) DIV n  +  (85 · Σ_{j∈N(i)} contrib(j)) DIV 100

    The flooring makes this a quantized PageRank: each step's values sit
    within |V|·iters ulps (of 1/scale) of the real-valued iterate —
    ranking order is preserved for any gap > iters·n/scale, and the
    bench-relevant property (hub docs rank above leaf docs) is exact.

    Scale: each iteration is one join edge-list⨝ranks (shuffle on node
    id, partial-sum aggregate) — the standard distributed PageRank step;
    ``iters`` is a constant so the plan is a fixed-depth tree (no lineage
    blowup at 3 iterations; for deep iteration counts snapshot per round
    like `connected_components`)."""
    und = (edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
           .union(edges.select(F.col(b_col).alias("src"),
                               F.col(a_col).alias("dst"))))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d")) \
             .select(F.col("src").alias("node"), "d")
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    r = (deg.crossJoin(F.broadcast(n))
         .select("node", F.expr(f"CAST({scale} AS BIGINT) DIV n").alias("r")))
    base = f"CAST({scale * 15 // 100} AS BIGINT)"
    for _ in range(iters):
        contrib = (r.join(deg, "node")
                   .select(F.col("node").alias("cnode"),
                           F.expr("r DIV d").alias("c")))
        recv = (und.join(contrib, F.col("dst") == F.col("cnode"))
                .groupBy("src").agg(F.sum("c").alias("s"))
                .select(F.col("src").alias("node"), "s"))
        r = (deg.select("node").join(recv, "node", "left")
             .crossJoin(F.broadcast(n))
             .select("node",
                     F.expr(f"({base} DIV n) + (85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")
                     .alias("r")))
    return r.select("node", F.col("r").alias("rank_scaled"))

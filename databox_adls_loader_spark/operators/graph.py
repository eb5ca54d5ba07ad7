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

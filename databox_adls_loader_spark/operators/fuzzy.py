"""Blocked fuzzy string matching: edit-distance pairs without the
all-pairs cartesian.

The naive shape (BroadcastNestedLoop over every pair + levenshtein) is
fine on a 25-row dimension and lethal anywhere else.  This module is the
scale path, mirroring the dedup band-join pattern (`dedup.py`): generate
CANDIDATE pairs through equi-joins only, then VERIFY the survivors with
the exact `levenshtein` built-in.  Shuffle volume is O(strings × grams),
never O(n²).

Candidate generation is recall-guaranteed for edit distance ≤ k:

- **q-gram block** — an edit (insert/delete/substitute) destroys at most
  ``q`` of a string's character q-grams, so two strings within distance
  ``k`` share at least ``max(len_a, len_b) − (q−1) − k·q`` grams.  That
  bound is positive whenever the longer string exceeds
  ``(k+1)·q − 1`` chars — those pairs MUST meet in the gram equi-join.
- **short block** — pairs where both strings are ≤ ``(k+1)·q − 1`` chars
  (where the gram bound can reach zero) instead equi-join on a length
  window: one side explodes its length key to ``len..len+k``.  The short
  class is bounded by construction (a handful of chars), so this block
  stays small no matter the corpus.

A pair within distance ``k`` has ``|len_a − len_b| ≤ k``, so if the
longer side is long the shorter is still long enough (> (k+1)q−1−k ≥ q)
to produce grams — both sides always reach the join that guarantees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(col: str, q: int):
    """Distinct character q-grams as a per-row array: only the cheap
    substring slice runs inside the (interpreted) transform lambda — the
    hash is applied AFTER the explode, in codegen, matching the
    word_shingles→xxhash64 pattern in dedup.py (HOF lambdas are excluded
    from codegen/CSE; keep heavy exprs out of them)."""
    idx = F.sequence(F.lit(1), F.length(col) - (q - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.col(col).substr(i, F.lit(q))))


def fuzzy_self_join(df: DataFrame, text_col: str, id_col: str,
                    max_dist: int = 2, q: int = 2) -> DataFrame:
    """All pairs (a < b by id) with ``levenshtein ≤ max_dist``, via
    blocked candidates + exact verify.  Returns (a_id, b_id, a, b, dist).

    The gram explode is interpreted-lambda-free on the hot path: grams
    are exploded to rows and the self-join runs on 64-bit hashes, the
    same shape as ``ngram_jaccard_pairs`` (dedup.py)."""
    short_max = (max_dist + 1) * q - 1
    s = (
        df.select(F.col(id_col).alias("id"),
                  F.col(text_col).alias("s"),
                  F.length(text_col).alias("len"))
        .filter(F.col("s").isNotNull())
        .persist()  # feeds two candidate paths + the verify join-back
    )

    # gram block: every string long enough to have a q-gram emits its
    # distinct gram hashes; near pairs with a long member must collide
    gr = (
        s.filter(F.col("len") >= q)
        .select("id", F.explode(_grams("s", q)).alias("gram"))
        .select("id", F.xxhash64("gram").alias("g"))
    )
    l, r = gr.alias("l"), gr.alias("r")
    cand_gram = (
        l.join(r, (F.col("l.g") == F.col("r.g"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
    )

    # short block: both ≤ short_max chars — length-window equi-join on a
    # size-bounded subset (strings of ≤ (k+1)q−1 chars)
    sh = s.filter(F.col("len") <= short_max)
    # SYMMETRIC window (len−k .. len+k): id order and length order are
    # independent, so the lower-id member may be the longer string — an
    # upward-only explode would silently drop those pairs
    sa = sh.select(
        F.col("id").alias("a_id"),
        F.explode(F.sequence(
            F.greatest(F.col("len") - max_dist, F.lit(0)),
            F.col("len") + max_dist)).alias("lb"))
    sb = sh.select(F.col("id").alias("b_id"), F.col("len").alias("lb"))
    cand_short = (
        sa.join(sb, "lb")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )

    cands = cand_gram.unionAll(cand_short).distinct()

    # verify: join the strings back, cheap length filter first, then the
    # exact edit distance (JVM built-in) — the only non-equi predicate,
    # applied per candidate, never per pair of the corpus
    astr = s.select(F.col("id").alias("a_id"), F.col("s").alias("a"),
                    F.col("len").alias("la"))
    bstr = s.select(F.col("id").alias("b_id"), F.col("s").alias("b"),
                    F.col("len").alias("lb_"))
    return (
        cands.join(astr, "a_id").join(bstr, "b_id")
        .filter(F.abs(F.col("la") - F.col("lb_")) <= max_dist)
        .select("a_id", "b_id", "a", "b",
                F.levenshtein("a", "b").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )

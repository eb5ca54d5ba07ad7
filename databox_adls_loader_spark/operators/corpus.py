"""End-to-end corpus cleaning — the composed training-data pipeline.

quality gate → exact dedup → near-dup removal, as ONE declarative DataFrame
program (the shape a 100 TB pre-training cleanup actually runs).  Every doc
gets a verdict rather than silently disappearing, so the pipeline is
auditable: `kept | low_quality | exact_dup | near_dup`.

Stage semantics (deterministic, oracle-checked in plans/queries_ext.py):
  1. low_quality   — fewer than `min_tokens` tokens or punctuation ratio
                     above `max_punct`;
  2. exact_dup     — canonical-text hash matches a quality-passing doc
                     with a smaller id (the smaller id survives);
  3. near_dup      — word-3-gram Jaccard ≥ `jaccard_threshold` against a
                     surviving doc with a smaller id (greedy by id, not
                     transitive closure — documented relaxation);
  4. kept          — everything else.

Scale: the quality gate is map-side; exact dedup is one shuffle on the
text hash; the near-dup stage runs only on exact-dedup survivors (already
quality-filtered) through the shingle join of dedup.ngram_jaccard_pairs —
swap in minhash_near_dupes for the LSH candidate path at corpus sizes
where the exact shingle join is too wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


def clean_corpus(docs: DataFrame, min_tokens: int = 20,
                 max_punct: float = 0.1, jaccard_threshold: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, verdict) for every input document."""
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        text.token_count(text_col).alias("n_tokens"),
        F.round(text.punct_ratio(text_col), 6).alias("punct"),
    )
    # null text ⇒ null metrics ⇒ the comparison is null, not False —
    # coalesce so null-text docs land in low_quality instead of slipping
    # through every branch to 'kept'
    quality_ok = F.coalesce(
        (F.col("n_tokens") >= min_tokens) & (F.col("punct") <= max_punct),
        F.lit(False))
    qualified = base.filter(quality_ok)

    # exact stage: doc survives iff it is the min id of its canonical
    # hash — a window min on the hash, NOT a join against a broadcast of
    # the (corpus-sized) canonical table
    from pyspark.sql import Window
    hashed = qualified.withColumn(
        "text_hash", F.md5(dedup.canonical_text(text_col)))
    exact_tagged = hashed.withColumn(
        "is_exact_dup",
        F.col(id_col) != F.min(id_col).over(Window.partitionBy("text_hash")))

    survivors = exact_tagged.filter(~F.col("is_exact_dup"))
    near = dedup.ngram_jaccard_pairs(
        survivors, text_col, id_col, n=3, threshold=jaccard_threshold) \
        .select(F.col("b").alias("near_dup_id")).distinct()

    verdict = (
        base.join(exact_tagged.select(id_col, "is_exact_dup"), id_col, "left")
        .join(near, F.col(id_col) == F.col("near_dup_id"), "left")
        .withColumn(
            "verdict",
            F.when(~quality_ok, "low_quality")          # coalesced: null-safe
            .when(F.col("is_exact_dup"), "exact_dup")
            .when(F.col("near_dup_id").isNotNull(), "near_dup")
            .otherwise("kept"))
    )
    return verdict.select(id_col, "n_tokens", "verdict")


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       val_pct: int = 10, test_pct: int = 10,
                       salt: str = "split-v1",
                       id_col: str = "doc_id",
                       cc: DataFrame | None = None) -> DataFrame:
    """Train/val/test assignment where every near-dup CLUSTER lands in
    one split — the leakage-safe form of `text.train_val_test_split`.

    Hashing per-document lets two near-identical documents straddle the
    train/test boundary, which silently contaminates evaluation: the
    model is tested on paraphrases of its training data.  Hashing the
    connected-component label instead (component = min reachable id over
    the near-dup pair graph; singletons hash their own id, which IS
    their component label) moves whole clusters atomically, and keeps
    the same salted md5 bucket math, so unclustered docs get exactly the
    assignment the per-doc split would give them.

    Scale: components via the iterative min-label propagation
    (operators/graph.py, O(diameter) rounds); the join back to docs is
    keyed by doc id; the split itself is map-side hash math.  Pass a
    precomputed ``cc`` (n, component) to reuse a checkpointed component
    labeling across consumers instead of re-deriving it from ``pairs``.
    """
    if cc is None:
        from .graph import connected_components
        cc = connected_components(pairs)
    joined = docs.join(
        cc.select(F.col("n").alias(id_col), "component"), id_col, "left")
    key = F.coalesce(F.col("component"), F.col(id_col))
    b = text.hash_bucket(key, 100, salt)
    return (
        joined.withColumn("split", text.split_label(b, val_pct, test_pct))
        .drop("component")
    )


def assemble_corpus(docs: DataFrame, bench,
                    min_tokens: int = 20, max_punct: float = 0.1,
                    jaccard_threshold: float = 0.5,
                    val_pct: int = 10, test_pct: int = 10,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    verdicts: DataFrame | None = None) -> DataFrame:
    """The rest of the training-data pipeline downstream of
    `clean_corpus`: decontaminate → split → curriculum — composed from
    the same oracle-proven operators, ending in the per-(split, phase)
    manifest a trainer consumes.

      1. keep only `clean_corpus`'s 'kept' docs;
      2. drop benchmark members ('benchmark') and docs sharing ≥ 2 word
         3-grams with the benchmark ('contaminated') —
         `dedup.contamination`'s held-in predicate form;
      3. assign the stable md5-bucket train/val/test split
         (`text.split_label` — same thresholds/salt as the split
         queries, so this pipeline and the standalone split agree
         doc-for-doc);
      4. train docs get a length-curriculum phase 1-4 at the EXACT
         token-count quartiles of the TRAIN slice (val/test get phase
         0 — no curriculum on eval data).

    Output: (split, phase, n_docs, total_toks), all integers.

    Scale: every stage is the already-audited operator's plan; the only
    additions are one map-side bucket expression and the 1-row quartile
    broadcast frame.  ``bench`` is a boolean Column over ``docs``.
    Pass ``verdicts`` (a precomputed `clean_corpus` result — e.g. the
    session-shared `cache.shared_clean_verdicts` snapshot) to skip
    recomputing the cleaning stack when another consumer already has
    it."""
    from . import dedup
    from .mixing import phase_by_quartiles
    from .text import hash_bucket, split_label

    if verdicts is None:
        verdicts = clean_corpus(docs, min_tokens=min_tokens,
                                max_punct=max_punct,
                                jaccard_threshold=jaccard_threshold,
                                text_col=text_col, id_col=id_col)
    kept = (verdicts.filter(F.col("verdict") == "kept")
            .select(id_col, "n_tokens"))
    cont = dedup.contamination(docs, bench, n=3, min_shared=2,
                               text_col=text_col, id_col=id_col)
    # evaluate ``bench`` over DOCS (where its columns resolve) and carry
    # the flag through the joins — evaluating it after kept.join(cont)
    # would fail analysis for any predicate referencing doc columns
    # beyond the id (the documented contract is 'a Column over docs')
    flags = docs.select(F.col(id_col),
                        F.coalesce(bench, F.lit(False)).alias("__is_bench"))
    status = (
        kept.join(cont, id_col).join(flags, id_col)
        .withColumn("stage",
                    F.when(F.col("__is_bench"), F.lit("benchmark"))
                    .when(F.col("contaminated"), F.lit("contaminated"))
                    .otherwise(F.lit("clean")))
        .drop("__is_bench")
    )
    clean = status.filter(F.col("stage") == "clean")
    splits = clean.withColumn(
        "split", split_label(hash_bucket(id_col, 100, "split-v1"),
                             val_pct, test_pct))
    qs = F.broadcast(
        splits.filter(F.col("split") == "train")
        .agg(F.expr("percentile(n_tokens, array(0.25D, 0.5D, 0.75D))")
             .alias("qs")))
    phase = (
        F.when(F.col("split") != "train", F.lit(0))
        .otherwise(phase_by_quartiles(F.col("n_tokens"), F.col("qs")))
    )
    return (
        splits.crossJoin(qs)
        .select("split", phase.alias("phase"), "n_tokens")
        .groupBy("split", "phase")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("total_toks"))
        .orderBy("split", "phase")
    )

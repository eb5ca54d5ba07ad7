"""Text-analysis operators over the documents table: token counting,
quality scoring, language-ID, document fingerprinting.

Everything is built-in-function column math (JVM, codegen) — the operators
run at scan speed with no Python in the loop, which is the difference
between hours and days over a 100 TB text corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lists for the n-gram/stopword heuristic —
# deliberately small so the scoring stays a handful of array ops
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "fr": ["le", "la", "et", "des", "une"],
    "es": ["el", "los", "una", "que", "por"],
    "de": ["der", "die", "und", "ein", "nicht"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex variant splits on
    non-alphanumerics too — see bpe_ish_tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: split on whitespace AND punctuation
    boundaries, drop empties — a cheap proxy for BPE token counting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str,
                   stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def avg_word_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0),
                        lambda acc, t: acc + F.length(t)).cast("double")
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long-enough docs with low
    punctuation noise, plausible word lengths, and some stopword mass
    score high — the standard cheap pre-filter before expensive dedup."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / 64.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    wl = avg_word_len(col)
    wl_score = F.when((wl >= 2.0) & (wl <= 12.0), 1.0).otherwise(0.3)
    sw_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return F.round(0.4 * len_score + 0.3 * punct_score
                   + 0.2 * wl_score + 0.1 * sw_score, 6)


def lang_scores(col: Column | str) -> list[tuple[str, Column]]:
    toks = tokens(col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))
        out.append((lang, hits))
    return out


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax over per-language marker-hit counts; deterministic tie-break
    by language code order; 'und' when nothing matches."""
    scores = lang_scores(col)
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit(default)
    # build reversed so earlier languages win ties (when() chains short-circuit)
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_md5(col: Column | str) -> Column:
    """Whole-document fingerprint: md5 of the canonicalized text (exact-dup
    key; engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def fingerprint_rolling(col: Column | str, gram: int = 8) -> Column:
    """Rolling-hash document fingerprint: the lexicographic minimum of the
    md5s of all character ``gram``-grams — a 1-permutation MinHash over
    char shingles.  Robust to small edits anywhere except the minimal gram;
    md5 keeps it portable to the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - (gram - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n),
                        lambda i: F.md5(F.substring(c, i, gram)))
    return F.array_min(grams)


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", gram: int = 8) -> DataFrame:
    """(id, fp_md5, fp_rolling) — the DataFrame fast path for
    `fingerprint_rolling`: explode the gram positions and take a codegen'd
    min-aggregate instead of evaluating an interpreted O(len) lambda per
    row.  Values identical to the column-expression form; `explode_outer`
    keeps null-text rows (null fingerprints), matching SQL semantics."""
    from ..session import spread

    c = F.col(text_col)
    n = F.greatest(F.length(c) - (gram - 1), F.lit(1))
    # Three measured shapes feed this plan (round 13, sf0.1 = 1.45M
    # grams):
    # 1. the gram md5 work is per-row expensive, so the scan must not
    #    under-split it (guide §2.5) — spread() hashes docs across the
    #    session parallelism when the input is a single row group;
    # 2. the canonical md5 (a regex pass over the whole text) is
    #    computed ONCE per doc *below* the Generate and carried as a
    #    grouping column — Generate evaluates its child projection once
    #    per input row, so it never re-runs per gram, and grouping on it
    #    drops the old first(__t) aggregate that dragged the full text
    #    into every exploded row;
    # 3. the gram md5 is projected to a column BEFORE the aggregate so
    #    the min() sort rows are (id, 32B, 32B) — min(string) plans as
    #    SortAggregate, and sorting rows that each carried the whole
    #    document was the query's real cost (~450 MB of sort input on
    #    one task; now ~100 MB across all tasks).
    grams = spread(docs.select(F.col(id_col), c.alias(text_col)),
                   id_col, probe=docs).select(
        F.col(id_col),
        fingerprint_md5(c).alias("fp_md5"),
        c.alias("__t"),
        F.explode_outer(F.sequence(F.lit(1), n)).alias("__i"),
    )
    return (
        grams.select(
            id_col, "fp_md5",
            F.md5(F.substring("__t", F.col("__i"), F.lit(gram))).alias("__h"))
        .groupBy(id_col, "fp_md5")
        .agg(F.min("__h").alias("fp_rolling"))
        .select(F.col(id_col), "fp_md5", "fp_rolling")
    )


def text_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The full per-document stats projection — one map-side pass."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.size(bpe_ish_tokens(text_col)).alias("n_subword_tokens"),
        char_count(text_col).alias("n_chars"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(avg_word_len(text_col), 6).alias("avg_word_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint_md5(text_col).alias("fp_md5"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    idf is the log-free variant (N+1)/(df+1): division of exactly-derived
    doubles is bit-identical across engines, where ln() may differ in the
    last ulp between libm implementations and flip a rounded rank.
    Scale: two shuffles ((doc,term) tf, then term df) + a per-doc window;
    the doc-count scalar is a one-row broadcast, and map-side partial
    aggregation collapses the token explosion before either shuffle."""
    from pyspark.sql import Window

    # explode the RAW split and drop empties with a codegen'd filter:
    # same rows as exploding the filter() HOF, ~30% faster warm and far
    # cheaper to compile (the array lambda runs interpreted per element)
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)),
                          r"[^\p{L}\p{N}]+")).alias("term"))
        .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf").cast("double")
                    * (F.col("n_docs") + 1).cast("double")
                    / (F.col("df") + 1).cast("double"), 6))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", "rk")
    )


def hash_bucket(col: Column | str, n_buckets: int = 16,
                salt: str = "") -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets): first EIGHT
    md5 hex chars (2^32 values) of the (salted) stringified key, mod
    n_buckets — the domain must dwarf n_buckets or the modulo is visibly
    non-uniform (two hex chars = 256 values gives a ~17% relative bias at
    n_buckets=100).  Unlike rand()-based sampling this is reproducible
    across runs, engines, and cluster layouts — re-running the pipeline
    keeps every document in the same split (the property training-data
    lineage depends on)."""
    c = F.col(col) if isinstance(col, str) else col
    hex8 = F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % n_buckets).cast("int")


def split_label(bucket: Column, val_pct: int, test_pct: int) -> Column:
    """Bucket→label mapping both split operators share: [0, test_pct) →
    test, [test_pct, test_pct+val_pct) → val, rest train.  Single
    definition so the per-doc and leakage-safe splits can never drift on
    boundary inclusivity."""
    return (F.when(bucket < test_pct, "test")
            .when(bucket < test_pct + val_pct, "val")
            .otherwise("train"))


def train_val_test_split(docs: DataFrame, id_col: str = "doc_id",
                         val_pct: int = 10, test_pct: int = 10,
                         salt: str = "split-v1") -> DataFrame:
    """Assign a stable split label per document via 100 hash buckets
    (`split_label` thresholds).  Changing `salt` re-rolls every
    assignment at once (versioned splits)."""
    b = hash_bucket(id_col, 100, salt)
    return docs.withColumn("split", split_label(b, val_pct, test_pct))


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals, all JVM-side:
      dup_token_frac   1 − |distinct tokens| / |tokens|
      top_token_frac   occurrences of the most frequent token / |tokens|
    High values flag boilerplate/spam (the standard pre-train filters
    alongside quality_score)."""
    # explode → two codegen'd aggregates, NOT the nested-lambda
    # O(uniq × tokens) per-row fold (interpreted, excluded from CSE) —
    # same pattern as minhash/simhash/fingerprints
    per_tok = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    )
    n = F.greatest(F.sum("__c"), F.lit(1))
    return (
        per_tok.groupBy(id_col)
        .agg(F.round(F.lit(1.0) - F.count(F.lit(1)) / n, 6)
             .alias("dup_token_frac"),
             F.round(F.max("__c") / n, 6).alias("top_token_frac"))
    )


def corpus_top_ngrams(docs: DataFrame, n: int = 2, k: int = 20,
                      text_col: str = "text") -> DataFrame:
    """Corpus-level top-k word n-grams (LM-ish corpus statistics): one
    explode + count + TakeOrdered.  Map-side partial aggregation collapses
    the n-gram stream before the single shuffle."""
    from .dedup import word_shingles
    grams = docs.select(
        F.explode(word_shingles(text_col, n)).alias("gram"))
    return (
        grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "gram")
        .limit(k)
    )


def gopher_signals(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021, public): per-doc
    repetition-free signals and the composite keep/drop verdict.

    Every signal is a division-only formulation (no libm) so the DuckDB
    oracle reproduces it bit-for-bit:

    - ``n_words``            whitespace token count
    - ``mean_word_len``      non-space chars / words  (rule: 3..10)
    - ``frac_alpha_words``   words containing a letter / words (rule ≥0.8)
    - ``n_stopwords``        stopword occurrences       (rule ≥2)
    - ``gopher_pass``        50 ≤ n_words ≤ 100k ∧ all rules above
    """
    from ..session import spread

    # per-doc interpreted HOF kernels (alpha/stopword token filters)
    # dominate a small exchange on a single-row-group scan — measured
    # 0.77 -> 0.63 s; the pure explode->agg operators in this file are
    # deliberately NOT spread (measured 1.4-9x slower: the extra AQE
    # stage + exchange costs more than the one-task explode)
    docs = spread(docs)
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    nonspace = F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
    mean_wl = nonspace / F.greatest(n_words, F.lit(1))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    frac_alpha = alpha.cast("double") / F.greatest(n_words, F.lit(1))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    gpass = ((n_words >= 50) & (n_words <= 100_000)
             & (mean_wl >= 3.0) & (mean_wl <= 10.0)
             & (frac_alpha >= 0.8) & (n_stop >= 2))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
        gpass.alias("gopher_pass"),
    )


def chunk_documents(docs: DataFrame, chunk_words: int = 32,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size word windows with overlap — the
    context-window packing stage of a training pipeline (long docs become
    N training rows; the overlap keeps boundary sentences learnable).

    One explode per chunk, all integer math (`div`, no libm ceil) so the
    oracle reproduces chunk boundaries exactly.  Map-side only: no
    shuffle — chunking 100 TB is embarrassingly parallel.
    """
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    step = chunk_words - overlap
    d = (
        docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .withColumn("__nc", F.greatest(
            F.expr(f"(size(__toks) - {overlap} + {step - 1}) div {step}"),
            F.lit(1)))
    )
    start = F.col("chunk_id") * step + 1
    sl = F.slice(F.col("__toks"), start, chunk_words)
    return (
        d.select(F.col(id_col), F.col("__toks"),
                 F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
                 .alias("chunk_id"))
        .select(F.col(id_col), F.col("chunk_id").cast("long").alias("chunk_id"),
                F.array_join(sl, " ").alias("chunk_text"),
                F.size(sl).alias("n_tokens"))
    )


def hapax_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document vocabulary-richness signals: (id, n_tokens,
    n_distinct, n_hapax, hapax_ratio) where a hapax is a token that
    occurs exactly once in the document and hapax_ratio = hapax/distinct.

    A low hapax ratio flags template/boilerplate text (the same tokens
    recycled), a very high one flags gibberish — both standard corpus-
    quality filters alongside `repetition_signals`.

    Plan: explode → (doc, token) counts (map-side combined) → per-doc
    re-aggregate.  Two shuffles keyed by doc_id; at 100 TB both are
    partial-aggregated and skew follows document length, not corpus
    size.  Null/empty text keeps a row (zero counts, null ratio) via the
    explode_outer, matching the LEFT JOIN shape in the oracle.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(F.filter(tokens(text_col), lambda t: t != ""))
        .alias("__tok"),
    )
    per_tok = toks.groupBy(id_col, "__tok").agg(F.count("__tok").alias("__cnt"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.count("__tok").alias("n_distinct"),
            F.sum(F.when(F.col("__cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("n_hapax").cast("long").alias("n_hapax"),
            F.when(F.col("n_distinct") > 0,
                   F.col("n_hapax").cast("double")
                   / F.col("n_distinct").cast("double")).alias("hapax_ratio"),
        )
    )


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1,
                   max_df: int | None = None) -> DataFrame:
    """Token → postings-list index: (term, df, total_tf, postings) with
    postings the sorted doc ids containing the term.

    The retrieval-side dual of `tfidf_top_terms`: this is what a
    keyword-search / contamination-lookup service builds once and probes
    per query.  Plan: explode → (term, doc) tf counts (map-side
    combined) → per-term aggregate; two shuffles, the second keyed by
    term.

    Scale: postings for stopword-frequency terms are the skew AND memory
    hazard — a term in every doc materializes one array the size of the
    corpus.  When ``min_df``/``max_df`` prune, the df counts are
    aggregated FIRST (skinny: one row per term) and only surviving terms
    join back into the collect_list — a filter on the aggregated df
    cannot be pushed below the aggregate, so pruning after the fact
    would still build the corpus-sized stopword array it exists to
    avoid.  Production indexes additionally segment postings by doc-id
    range (shard the groupBy key as (term, doc_id div R)) which composes
    with this operator unchanged.
    """
    toks = (docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("__tok"))
        .filter(F.col("__tok") != ""))       # codegen, not the HOF lambda
    tc = toks.groupBy("__tok", id_col).agg(F.count(F.lit(1)).alias("__tf"))
    if min_df <= 1 and max_df is None:
        # no pruning requested — single aggregate, postings for every term
        return (
            tc.groupBy("__tok")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("__tf").cast("long").alias("total_tf"),
                F.sort_array(F.collect_list(id_col)).alias("postings"),
            )
            .withColumnRenamed("__tok", "term")
        )
    stats = tc.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("__tf").cast("long").alias("total_tf"),
    )
    if min_df > 1:
        stats = stats.filter(F.col("df") >= min_df)
    if max_df is not None:
        stats = stats.filter(F.col("df") <= max_df)
    # (term, doc) pairs for pruned terms never enter the postings
    # aggregation buffer; both sides shuffle on term, and tc feeds both
    # branches (exchange reuse — the corpus is tokenized once)
    return (
        tc.join(stats, "__tok")
        .groupBy("__tok", "df", "total_tf")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
        .withColumnRenamed("__tok", "term")
        .select("term", "df", "total_tf", "postings")
    )


def vocab_coverage(docs: DataFrame, top_n: int = 100,
                   text_col: str = "text") -> DataFrame:
    """Top-``top_n`` corpus tokens with exact counts and the cumulative
    share of ALL tokens they cover, in integer parts-per-million —
    the "how big must the vocab be" curve a tokenizer build reads off.

    Corpus-wide counts partial-aggregate into one shuffle; the top-n is
    a TakeOrdered (never a full sort), and the cumulative window runs
    over ≤ top_n rows post-limit — bounded by the parameter, not the
    data.  The total-token denominator re-reads the same counts shuffle
    (exchange reuse), so the corpus is scanned once.  Integer note:
    cnt × 1e6 stays in int64 up to ~9.2e12 total tokens; past that,
    widen to decimal on both engine and oracle sides.
    """
    tc = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")         # codegen, not the HOF lambda
        .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = tc.agg(F.sum("cnt").alias("__total"))
    top = tc.orderBy(F.desc("cnt"), F.asc("term")).limit(int(top_n))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("cum_ppm",
                    F.expr("sum(cnt) over (order by cnt desc, term asc "
                           "rows between unbounded preceding and current row)"
                           " * 1000000L div __total"))
        .select("term", "cnt", "cum_ppm")
        .orderBy(F.desc("cnt"), F.asc("term"))
    )


def bpe_train_merges(docs: DataFrame, text_col: str = "text",
                     n_merges: int = 3) -> DataFrame:
    """Byte-pair-encoding merge training (public technique: Sennrich et
    al. 2016) — the tokenizer-training step of an LLM data pipeline,
    made integer-exact and engine-portable.

    Contract (shared with the SQL oracle):
      * corpus = occurrence-weighted word table (lowercased, split on
        ``[^a-z]+``) — BPE statistics depend only on the word-frequency
        relation, which is vocabulary-sized, NOT corpus-sized: the one
        corpus scan reduces 100 TB of text to a few million (word, freq)
        rows, and every merge iteration runs on that small relation;
      * pair statistics count ALL adjacent symbol pairs (overlap
        included), weighted by word frequency;
      * the winning pair per iteration is (count DESC, left ASC, right
        ASC) — deterministic tie-break;
      * applying a merge rewrites each word greedily left-to-right with
        no re-merge of a just-created symbol (the classic scan rule),
        implemented as one `F.aggregate` fold per word — per-row array
        math, no shuffle beyond the pair-count groupBy.

    Returns one row per merge: (merge_rank, left_sym, right_sym, merged,
    pair_count) — fully value-hash-checkable; the oracle unrolls the
    same iterations as CTE layers (the `graph_pagerank_jaccard`
    pattern).  Vocabulary exhaustion before ``n_merges`` (no adjacent
    pair left anywhere) simply yields fewer rows."""
    _, merges = _bpe_loop(docs, text_col, n_merges)
    return docs.sparkSession.createDataFrame(
        merges, "merge_rank: int, left_sym: string, right_sym: string, "
                "merged: string, pair_count: long").orderBy("merge_rank")


def bpe_word_tokens(col: Column | str) -> Column:
    """The BPE corpus tokenization: lowercase, split on ``[^a-z]+``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z]+"), lambda t: t != "")


def _bpe_loop(docs: DataFrame, text_col: str, n_merges: int):
    """Shared BPE training loop: returns (final word segmentations
    ``(word, freq, syms)``, list of merge tuples ``(rank, l, r, merged,
    cnt)``).

    The vocabulary relation is persisted once (iterations re-scan IT,
    never the corpus), each iteration's winner is a 1-ROW bounded
    collect embedded as literals in the next fold, and every applied
    merge is `localCheckpoint`-materialized (the `connected_components`
    pattern): the logical plan stays ONE fold deep per iteration, so
    total work is O(n_merges · |vocab|) — linear in merges.  Without
    the checkpoint the plan would nest rank folds deep and both
    Catalyst analysis and recompute would grow O(n_merges²), which at
    realistic merge counts (10⁴–10⁵ for a production tokenizer)
    dominates everything.  An exhausted vocabulary (no pairs anywhere)
    ends the loop instead of annihilating the relation."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    from ..session import spread

    # the fold/zip_with merge kernels below re-scan the persisted vocab,
    # but the FIRST corpus pass (tokenize + word count) is per-row heavy
    # and one-task on a single-row-group scan — measured 6.12 -> 5.12 s
    words = (
        spread(docs.select(F.col(text_col)), probe=docs)
        .select(F.explode(F.split(F.lower(F.col(text_col)),
                                  "[^a-z]+")).alias("word"))
        .filter(F.col("word") != "")         # codegen, not the HOF lambda
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms",
                    F.filter(F.split("word", "(?!^)"), lambda t: t != ""))
    ).persist()
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select(
                "freq",
                F.explode(F.zip_with(
                    F.slice("syms", F.lit(1), F.size("syms") - 1),
                    F.slice("syms", F.lit(2),
                            F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r"))
                )).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top:
            break                      # vocabulary exhausted: fewer merges
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((rank, l, r, l + r, cnt))
        lc, rc = F.lit(l), F.lit(r)
        words = words.withColumn("syms", F.aggregate(
            "syms", F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lc) & (x == rc),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                         F.array(F.lit(l + r)))
            ).otherwise(F.concat(acc, F.array(x)))
        )).localCheckpoint()           # truncate lineage: 1 fold per iter
    return words, merges


def bpe_token_counts(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n_merges: int = 3) -> DataFrame:
    """APPLY the learned merges: per-document subword-token counts under
    the ``n_merges``-merge BPE vocabulary — the compression measurement
    (chars → subwords) that budgets training shards and prices context
    windows.  Segmentation happens once per VOCABULARY word (the
    training loop's final state); documents then join their exploded
    words against that small (word → |syms|) relation, so the per-doc
    cost is one word-keyed join, not a re-segmentation of the corpus.
    Returns (id, n_words, n_subword_tokens, n_chars) — all-integer."""
    words, _ = _bpe_loop(docs, text_col, n_merges)
    seg_sizes = words.select("word", F.size("syms").alias("n_sub"))
    doc_words = (docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)),
                          "[^a-z]+")).alias("word"))
        .filter(F.col("word") != ""))        # codegen, not the HOF lambda
    return (doc_words.join(seg_sizes, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_subword_tokens"),
                 F.sum(F.length("word")).alias("n_chars")))


def _bm25_per_doc(docs: DataFrame, query_terms: list[str], text_col: str,
                  id_col: str, with_rel: bool) -> DataFrame:
    """ONE map-side pass shared by `bm25_topk` / `retrieval_eval`: per
    document, tokenize once and derive dl (token count) plus one tf
    column per query term straight from the token ARRAY — no explode,
    no (doc, term) shuffle, no per-term join.  tf_i = |{x ∈ toks :
    x = t_i}| is exactly the exploded-and-counted tf of the old plan;
    dl = |toks| is exactly its groupBy count.  `rel` (exact conjunctive
    match) is ⋀ tf_i > 0 ≡ ⋀ array_contains(toks, t_i).  The token
    array is aliased in its own projection so CollapseProject cannot
    re-inline the (non-cheap) tokenizer once per consumer expression."""
    from ..session import spread

    base = (spread(docs.select(F.col(id_col), F.col(text_col)), probe=docs)
            .select(F.col(id_col), bpe_ish_tokens(text_col).alias("__toks")))
    def _eq(term: str):
        lit = F.lit(term)
        # one-arg closure: a defaulted second param would make pyspark
        # treat the lambda as the (element, index) form
        return lambda x: x == lit

    cols = [F.col(id_col), F.size("__toks").alias("dl")]
    for i, t in enumerate(query_terms):
        cols.append(F.size(F.filter("__toks", _eq(t))).alias(f"__tf{i}"))
    per = base.select(*cols)
    if with_rel:
        rel = None
        for i in range(len(query_terms)):
            c = F.col(f"__tf{i}") > 0
            rel = c if rel is None else rel & c
        per = per.withColumn("rel", rel.cast("int"))
    return per


def _bm25_stats(per: DataFrame, query_terms: list[str],
                with_rel: bool) -> DataFrame:
    """The corpus scalars as ONE 1-row broadcast aggregate: N, Σdl, every
    per-term df (= |{docs : tf_i ≥ 1}|) and, for the eval path, the
    relevant-doc count — the old plan derived these in four separate
    corpus passes (docs count, toks count, df groupBy, rel sum)."""
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_toks")]
    for i in range(len(query_terms)):
        aggs.append(F.sum((F.col(f"__tf{i}") > 0).cast("long"))
                    .alias(f"__df{i}"))
    if with_rel:
        aggs.append(F.sum("rel").cast("long").alias("__n_rel"))
    return F.broadcast(per.agg(*aggs))


def _bm25_ranked(per: DataFrame, stats: DataFrame, query_terms: list[str],
                 k: int, k1: float, b: float, id_col: str,
                 carry: list[str] | None = None) -> DataFrame:
    """Score + top-k over the per-doc frame.  The float chain is the
    IDENTICAL expression AST the pre-round-13 plan built — avgdl =
    T·1.0/N; idf = ((N−df)+0.5)/(df+0.5); per-term contribution
    round(idf·(tf·(k1+1))/(tf + k1·((1−b)+b·dl/avgdl)), 6); fixed
    left-to-right sum, round 6 — so scores are bit-equal (a doc with
    tf=0 contributes +0.0 exactly as the old coalesce'd left join
    did)."""
    avgdl = (F.col("total_toks").cast("double") * F.lit(1.0)
             / F.col("n_docs").cast("double"))
    parts = []
    for i in range(len(query_terms)):
        tf, dfq = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = ((F.col("n_docs") - dfq).cast("double") + F.lit(0.5)) \
            / (dfq.cast("double") + F.lit(0.5))
        denom = tf.cast("double") + F.lit(k1) * (
            (F.lit(1.0) - F.lit(b))
            + F.lit(b) * F.col("dl").cast("double") / avgdl)
        parts.append(F.round(
            idf * (tf.cast("double") * F.lit(k1 + 1.0)) / denom, 6))
    score = parts[0]
    for p in parts[1:]:
        score = score + p            # fixed left-to-right association
    sel = [F.col(id_col), F.round(score, 6).alias("bm25")]
    for c in carry or []:
        sel.append(F.col(c))
    # dl ≥ 1 keeps the ranked universe identical to the old plan, whose
    # candidate set was the docs with at least one exploded token row
    return (per.filter(F.col("dl") >= 1).crossJoin(stats).select(*sel)
            .orderBy(F.desc("bm25"), F.asc(id_col)).limit(k))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k documents by BM25 (public ranking function, Robertson et
    al.) for a fixed bag of query terms — the retrieval scorer behind
    RAG corpus search and dedup-aware sampling by query relevance.

    Engine-portable float discipline (the tfidf_top_terms convention,
    extended to a multi-factor score): idf is the LOG-FREE rational
    (N − df + 0.5)/(df + 0.5) — monotone in the classic ln-idf, so
    ranking is preserved while staying libm-free; every factor is
    derived from integers (tf, df, dl, Σdl, N), each per-term
    contribution is ONE fixed-association double expression rounded to
    6dp, and the final score sums the ≤|q| per-term columns in fixed
    left-to-right order — no SUM() aggregation, so float summation
    order can never flip the hash.

    Plan (round-13 rewrite, values bit-identical to the explode form —
    see `_bm25_per_doc`): ONE map-side tokenize pass derives (dl,
    tf₀..tf_q) per doc from the token array; the corpus scalars AND all
    per-term dfs collapse into a single 1-row broadcast aggregate; the
    per-term pivot joins disappear (tf is already a column).  The old
    plan exploded the corpus into a token relation and shuffled it three
    times (dl groupBy, (doc,term) tf groupBy, df groupBy) then re-joined
    |q| times.  Scale: nothing but the 1-row stats frame ever shuffles;
    the persisted per-doc frame is (id, dl, |q| ints)."""
    per = _bm25_per_doc(docs, query_terms, text_col, id_col, False).persist()
    stats = _bm25_stats(per, query_terms, False)
    return _bm25_ranked(per, stats, query_terms, k, k1, b, id_col)


def lm_fluency_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Self-trained bigram-LM fluency score per document — the gibberish
    filter of an LLM data pipeline (public technique: KenLM-style n-gram
    scoring, e.g. CCNet), made integer-exact so it is value-hash
    checkable across engines.

    score_ppm(doc) = floor(mean over the doc's token bigrams (a, b) of
    floor(c(a,b) · 10⁶ / c(a·))), where c(a,b) is the corpus bigram
    count and c(a·) the count of ``a`` as a bigram left side — i.e. the
    average conditional probability P(b|a) in ppm.  Low scores mark
    documents whose word transitions are rare in the corpus (gibberish,
    wrong-language, shuffled text); docs with fewer than 2 tokens have
    no bigrams and are excluded.

    Scale: the bigram-count relation is vocabulary²-bounded, NOT
    corpus-sized — one scan reduces the corpus to counts, and scoring is
    a bigram-keyed shuffle join (broadcast when the LM fits).  No
    floats anywhere: ppm integer division on both engines."""
    t = F.filter(tokens(text_col), lambda x: x != "")
    bg = docs.select(
        F.col(id_col),
        F.explode(F.zip_with(
            F.slice(t, F.lit(1), F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, F.lit(2), F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")))).alias("p")
    ).select(id_col, F.col("p.l").alias("l"), F.col("p.r").alias("r"))
    c2 = bg.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("l").agg(F.count(F.lit(1)).alias("c1"))
    scored = (bg.join(c2, ["l", "r"]).join(c1, ["l"])
              .withColumn("ppm", F.expr("c2 * 1000000L div c1")))
    return (scored.groupBy(id_col)
            .agg(F.expr("sum(ppm) div count(1)").alias("score_ppm"),
                 F.count(F.lit(1)).alias("n_bigrams")))


# round(1e6 / log2(rank + 1)) for ranks 1..10 — the NDCG discount as
# integer ppm LITERALS, so neither engine ever calls libm (Java's log vs
# C's log2 can disagree by an ulp; a frozen table cannot).
_DCG_DISCOUNT_PPM = [1_000_000, 630_930, 500_000, 430_677, 386_853,
                     356_207, 333_333, 315_465, 301_030, 289_065]


def retrieval_eval(docs: DataFrame, query_terms: list[str], k: int = 10,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Rank-quality evaluation of the BM25 retriever against exact-match
    relevance: per rank 1..k, precision@k, recall@k, cumulative DCG and
    the reciprocal-rank contribution — the eval table behind every RAG
    retriever regression gate (row k's prec/recall/cum_dcg are P@k,
    R@k, DCG@k; the rr_ppm column is nonzero exactly once, at the first
    relevant rank, so SUM(rr_ppm) is the query's RR for MRR averaging).

    Relevance label: a document is relevant iff it contains EVERY query
    term (exact conjunctive match — deterministic, no human judgments in
    the sandbox).  Everything is integer ppm: the DCG discount is the
    frozen `_DCG_DISCOUNT_PPM` literal table, so cumulative sums are
    exact integer windows — no float accumulation whose association
    order could differ between engines.

    Plan (round-13 rewrite, values bit-identical): the shared
    `_bm25_per_doc` pass carries `rel` (⋀ tf_i > 0 ≡ the old
    array_contains conjunction) as a column, so the old separate
    relevance scan AND its join to the top-k disappear, and the corpus
    relevant-count folds into the same 1-row stats aggregate; the rank
    window and running sums order ≤ k rows (the bounded post-aggregate
    exception)."""
    from pyspark.sql import Window

    if k > len(_DCG_DISCOUNT_PPM):
        raise ValueError(f"k ≤ {len(_DCG_DISCOUNT_PPM)} (frozen discount table)")
    per = _bm25_per_doc(docs, query_terms, text_col, id_col, True).persist()
    stats = _bm25_stats(per, query_terms, True)
    ranked = _bm25_ranked(per, stats, query_terms, k, 1.2, 0.75, id_col,
                          carry=["rel"])
    n_rel = F.broadcast(stats.select("__n_rel"))
    rank_w = Window.orderBy(F.desc("bm25"), F.asc(id_col))  # ≤ k rows
    cum_w = (Window.orderBy("rank")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _DCG_DISCOUNT_PPM[:k]]), F.col("rank"))
    return (
        F.broadcast(ranked.withColumn("rank", F.row_number().over(rank_w)))
        .crossJoin(n_rel)
        .withColumn("n_rel_so_far", F.sum("rel").over(cum_w).cast("long"))
        .withColumn("cum_dcg_ppm",
                    F.sum(F.col("rel").cast("long") * disc).over(cum_w)
                    .cast("long"))
        .withColumn("prec_at_k_ppm",
                    F.expr("n_rel_so_far * 1000000 div rank").cast("long"))
        .withColumn("recall_at_k_ppm",
                    F.when(F.col("__n_rel") > 0,
                           F.expr("n_rel_so_far * 1000000 div __n_rel"))
                    .otherwise(F.lit(0)).cast("long"))
        .withColumn("rr_ppm",
                    F.when((F.col("rel") == 1) & (F.col("n_rel_so_far") == 1),
                           F.expr("1000000 div rank"))
                    .otherwise(F.lit(0)).cast("long"))
        .select("rank", id_col, "bm25", "rel", "n_rel_so_far",
                "cum_dcg_ppm", "prec_at_k_ppm", "recall_at_k_ppm", "rr_ppm")
    )


def rake_keywords(docs: DataFrame, k: int = 20, text_col: str = "text",
                  id_col: str = "doc_id",
                  stopwords: list[str] | None = None) -> DataFrame:
    """Corpus-level keyword extraction by RAKE (public technique: Rose,
    Engel, Cramer & Cowley 2010): candidate phrases are the maximal
    stopword-free token runs; each word scores degree/frequency (degree
    = Σ length of phrases containing it — co-occurrence credit), and a
    phrase scores the sum of its words' scores.  Top-k phrases with
    occurrence counts — the "what is this corpus about" report, and the
    candidate vocabulary a domain-tagging pass starts from.

    Word scores are integer ppm (degree·10⁶ div freq) and phrase scores
    integer sums of them, so the whole ranking value-hashes; ties break
    on the phrase string.

    Plan: ONE Arrow-batched linear pass per doc segments the token
    array into its stopword-free runs (the per-doc running-stopword-
    count window, the posexplode row blowup and the
    collect_list/array_sort phrase rebuild all collapse into it — same
    runs, same in-order " "-joined phrase strings, same lengths), then
    three keyed aggregates (phrase occurrences, word stats, distinct
    phrases) → top-k.  Everything shuffles on token or phrase keys;
    nothing is driver-side.  Word stats re-derive the per-occurrence
    token rows by exploding each phrase's own tokens — row-identical
    to the old tagged⋈occ join."""
    from ..session import spread

    stop = list(stopwords) if stopwords is not None else list(STOPWORDS)
    stop_set = set(stop)

    # Empties are skipped WITHOUT closing the current run, exactly as
    # the pre-explode filter dropped them before positions existed.
    @F.pandas_udf("array<struct<phrase:string,plen:long>>")
    def _runs(tok_ser: pd.Series) -> pd.Series:
        out = []
        for toks in tok_ser:
            if toks is None:
                out.append([])
                continue
            runs, cur = [], []
            for t in toks:
                if not t:
                    continue
                if t in stop_set:
                    if cur:
                        runs.append({"phrase": " ".join(cur),
                                     "plen": len(cur)})
                        cur = []
                else:
                    cur.append(t)
            if cur:
                runs.append({"phrase": " ".join(cur), "plen": len(cur)})
            out.append(runs)
        return pd.Series(out)

    occ = (spread(docs.select(F.col(text_col)), probe=docs)
           .select(F.explode(_runs(
               F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+")))
               .alias("__r"))
           .select(F.col("__r.phrase").alias("phrase"),
                   F.col("__r.plen").alias("plen"))
           .persist())
    wstats = (occ.select("plen",
                         F.explode(F.split("phrase", " ")).alias("tok"))
              .groupBy("tok")
              .agg(F.count(F.lit(1)).alias("freq"),
                   F.sum("plen").alias("degree"))
              .withColumn("wscore",
                          F.expr("degree * 1000000 div freq").cast("long")))
    phrases = occ.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    pw = phrases.select("phrase", "n_occ",
                        F.explode(F.split("phrase", " ")).alias("tok"))
    return (pw.join(wstats.select("tok", "wscore"), "tok")
            .groupBy("phrase", "n_occ")
            .agg(F.sum("wscore").cast("long").alias("score_ppm"))
            .orderBy(F.desc("score_ppm"), "phrase").limit(k)
            .select("phrase", "n_occ", "score_ppm"))

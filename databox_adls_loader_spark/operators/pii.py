"""PII detection and scrubbing — a first-class stage in any
training-data pipeline: find emails/phones/IPs in document text, count
them per document, and replace them with typed placeholders before the
corpus ships.

Everything is `regexp_count`/`regexp_replace` column expressions — pure
JVM codegen, one map-side pass, no Python in the path.  The patterns are
deliberately RE2-compatible (no lookbehind/backreferences) so the exact
same regex runs in the DuckDB oracle; pattern changes must keep that
property or the correctness gate loses its teeth.

Scale: linear scan over text bytes; composes with `clean_corpus`
(operators/corpus.py) as an additional per-doc verdict column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: scrub applies patterns in this sequence on both engines, so a
# match consumed by an earlier pattern can't double-count in a later one.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Input plus one ``n_<kind>`` count column per PII pattern.

    Counts are SEQUENTIAL: each kind is counted on the text left over
    after the earlier kinds were scrubbed, so a substring consumed by an
    earlier pattern cannot double-count (an IPv4 inside an email's
    domain counts as email only) — the counts always agree with what
    :func:`scrub_pii` actually replaces."""
    out = docs
    col = F.col(text_col)
    for kind, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(col, F.lit(pat)))
        col = F.regexp_replace(col, pat, token)
    return out


def scrub_pii(docs: DataFrame, text_col: str = "text",
              out_col: str = "scrubbed") -> DataFrame:
    """Input plus ``out_col``: the text with every PII match replaced by
    its typed placeholder, patterns applied in PII_PATTERNS order."""
    col = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out_col, col)


def k_anonymity_audit(df, quasi_cols: list[str], sensitive: str,
                      k: int = 5, l: int = 2):
    """k-anonymity / l-diversity audit over a quasi-identifier tuple:
    per QI group its row count and distinct-sensitive-value count, with
    violation flags (group_n < k → re-identifiable beyond 1-in-k;
    l_distinct < l → attribute disclosure even inside a large group).
    The release gate a privacy review runs BEFORE publishing a slice of
    a corpus keyed by demographic-ish columns.

    One grouped aggregate on the QI columns — scan-shaped, |QI groups|
    output rows; pair with generalization (coarsen a QI column, rerun)
    until the flags clear."""
    from pyspark.sql import functions as F

    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("group_n"),
                 F.count_distinct(F.col(sensitive)).alias("l_distinct"))
            .select(*quasi_cols,
                    F.col("group_n").cast("long").alias("group_n"),
                    F.col("l_distinct").cast("long").alias("l_distinct"),
                    (F.col("group_n") < k).alias("k_violation"),
                    (F.col("l_distinct") < l).alias("l_violation")))

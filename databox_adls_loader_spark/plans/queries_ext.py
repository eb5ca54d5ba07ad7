"""Extension-operator queries: dedup, similarity search, text analysis,
multimodal — the north-star training-data-pipeline surface, registered in
the same oracle-checked registry as the relational core.

The LSH-family queries (MinHash-LSH, SimHash, sign-LSH ANN) run their
operators in *portable* hash mode — md5-derived 60-bit hashes
(operators/dedup.md5_long) and fixed-seed hyperplanes inlined as SQL
literals — so the ENTIRE approximate pipeline is reproduced in DuckDB and
hash-checked end to end, not just rows-counted.  The xxhash64 fast path
remains the production default; tests additionally assert the approximate
operators against their exact counterparts (recall / candidate
containment).  Only the genuinely-unverifiable entries (multimodal binary
fixtures DuckDB cannot see, the sample-seeded IVF) stay rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, similarity, text
from ..session import spread
from .queries import _t, register


def _hex15_to_long(col: str) -> str:
    """DuckDB expression: first 15 hex nibbles of the md5 VARCHAR in
    ``col`` parsed base-16 into a BIGINT — the oracle half of
    operators/dedup.md5_long (Spark: conv(substr(md5(x),1,15),16,10)).
    16**(15-i) is a power of two, exact in DOUBLE, so the CAST chain is
    lossless; the sum < 2^60 never overflows."""
    return (
        "CAST(list_aggregate(list_transform(range(1, 16), "
        f"i -> (strpos('0123456789abcdef', substr({col}, CAST(i AS INT), 1)) - 1) "
        "* CAST(16 ** (15 - i) AS BIGINT)), 'sum') AS BIGINT)"
    )


def _perms_values_sql(k: int) -> str:
    """operators/dedup.perm_constants as a DuckDB VALUES CTE
    ``perms(j, a, b)`` — the identical (a_j, b_j) MinHash permutation
    constants the Spark expression uses."""
    from ..operators.dedup import perm_constants
    rows = ", ".join(f"({j}, {a}, {b})"
                     for j, (a, b) in enumerate(perm_constants(k)))
    return f"perms(j, a, b) AS (VALUES {rows})"


def _planes_values_sql(n_planes: int, seed: int = 7, dim: int = 64) -> str:
    """The deterministic hyperplanes of operators/similarity._planes as a
    DuckDB VALUES CTE ``planes(pi, p)`` — repr() round-trips each double
    exactly, so both engines dot against bit-identical plane vectors.
    (embeddings.parquet is dim-64 at every SF — driver contract.)"""
    rows = []
    for i, p in enumerate(similarity._planes(dim, n_planes, seed)):
        vals = ", ".join(repr(float(v)) for v in p)
        rows.append(f"({i}, [{vals}])")
    return "planes(pi, p) AS (VALUES " + ",\n      ".join(rows) + ")"


def _bucket_cte_sql(dim: int = 64) -> str:
    """Shared oracle CTEs: embeddings as DOUBLE[] plus the sign-LSH bucket
    of every vector against the ``planes`` CTE (bit p set iff v·plane_p
    ≥ 0 — same packing as similarity._bucket_expr)."""
    return f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bk AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                            i -> v[i] * p[i])) >= 0
                      THEN CAST(2 ** pi AS BIGINT) ELSE 0 END) AS BIGINT)
               AS bucket
      FROM e CROSS JOIN planes GROUP BY e.vec_id
    )"""

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle=r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
           MIN(doc_id) AS canonical_id, COUNT(*) AS n_dupes
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    tags=["dedup"],
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the canonical-text hash."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).orderBy("text_hash")


@register(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
      FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
    ORDER BY a, b
    """,
    tags=["dedup"],
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.5) — the
    verifier stage of the LSH pipeline, oracle-checked end to end.
    Served from the session-shared pair-graph checkpoint (cache.py)."""
    from ..cache import shared_jaccard_pairs
    out = shared_jaccard_pairs(spark, sf_dir, n=3, threshold=0.5)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard")).orderBy("a", "b")


@register(
    "dedup_minhash_lsh",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), {_perms_values_sql(32)}, hh AS (
      SELECT doc_id, md5(g) AS m FROM sh
    ), hb AS (
      SELECT doc_id, {_hex15_to_long('m')} AS h FROM hh
    ), hx AS (
      SELECT doc_id, j,
             MIN((a * (h % 2147483647) + b) % 2147483647) AS hmin
      FROM hb CROSS JOIN perms GROUP BY doc_id, j
    ), sig AS (
      SELECT doc_id, list(hmin ORDER BY j) AS sig FROM hx GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, bi,
             array_to_string(list_transform(
               list_slice(sig, bi * 4 + 1, bi * 4 + 4),
               x -> CAST(x AS VARCHAR)), ',') AS bkey
      FROM sig CROSS JOIN range(0, 8) AS sb(bi)
    ), cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM banded l JOIN banded r
        ON l.bi = r.bi AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ), est AS (
      SELECT c.a, c.b,
             len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0
               AS est_jaccard
      FROM cand c JOIN sig sa ON c.a = sa.doc_id JOIN sig sb ON c.b = sb.doc_id
    )
    SELECT a, b, est_jaccard FROM est
    WHERE est_jaccard >= 0.5 ORDER BY a, b
    """,
    tags=["dedup", "lsh"],
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=32)+LSH(8 bands) near-dup pairs — the 100 TB scale path,
    run in portable-hash mode (md5-derived signatures, operators/dedup.
    md5_long) so DuckDB rebuilds the identical signatures, bands,
    candidates, and estimated-Jaccard verdicts: a full value-hash check
    of the approximate pipeline, not a rows-only count.  The est is
    equal-components/32 — /2^5, exact in both engines' doubles.
    tests additionally assert candidate containment vs exact Jaccard."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        dedup.minhash_near_dupes(docs, k=32, bands=8, threshold=0.5,
                                 portable=True)
        .orderBy("a", "b")
    )


@register(
    "dedup_simhash",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id, md5(tok) AS m FROM toks
    ), hv AS (
      SELECT doc_id, {_hex15_to_long('m')} AS h FROM th
    ), bs AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS c
      FROM hv CROSS JOIN range(0, 60) AS rb(b)
      GROUP BY doc_id, b
    ), fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c > 0
                           THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                           ELSE 0 END) AS BIGINT) AS fp
      FROM bs GROUP BY doc_id
    ), blocks AS (
      SELECT doc_id, fp, bi, (fp >> CAST(bi * 10 AS INT)) & 1023 AS bv
      FROM fp CROSS JOIN range(0, 6) AS ri(bi)
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
           CAST(bit_count(xor(l.fp, r.fp)) AS INT) AS hamming
    FROM blocks l JOIN blocks r
      ON l.bi = r.bi AND l.bv = r.bv AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.fp, r.fp)) <= 5
    ORDER BY a, b
    """,
    tags=["dedup", "lsh"],
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs in portable mode: 60-bit md5-derived token
    hashes, ±1 bit sums, pigeonhole block join (6 blocks × 10 bits ⇒
    100% recall at hamming ≤ 5), exact popcount verify — every stage
    integer-exact, so the DuckDB oracle reproduces the fingerprints and
    the final pair set bit-for-bit."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        dedup.simhash_near_dupes(docs, max_hamming=5, bits=60, portable=True)
        .orderBy("a", "b")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    ORDER BY a, b
    """,
    tags=["dedup", "similarity"],
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact all-pairs form (the oracle);
    the LSH-bucketed variant is `ann_cosine_pairs_lsh` (rows-only)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_bruteforce(emb, threshold=0.4).orderBy("a", "b")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@register(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim
    FROM embeddings e, q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity"],
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-20 to the vec_id=1 embedding: map-side score +
    TakeOrdered (never a full sort)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    return similarity.topk_bruteforce(emb, list(query), k=20)


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH {_planes_values_sql(8)},{_bucket_cte_sql()},
    q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
    qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = 1)
    SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim
    FROM e JOIN bk ON e.vec_id = bk.vec_id
    CROSS JOIN q CROSS JOIN qb
    WHERE bit_count(xor(bk.bucket, qb.qbucket)) <= 1
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "lsh"],
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-20 (8 fixed-seed hyperplanes, hamming-1 probes).
    The planes are deterministic (similarity._planes, seed 7) and inlined
    into the oracle as exact literals, so DuckDB assigns the identical
    sign buckets, probes the identical hamming-≤1 candidate set, and
    reranks to the identical top-20 — the approximate index itself is
    value-hash-checked, with recall@20 vs brute force asserted in tests."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    return similarity.topk_lsh(emb, list(query), k=20, n_planes=8, probe_hamming=1)


@register(
    "ann_cosine_pairs_lsh",
    oracle=f"""
    WITH {_planes_values_sql(6)},{_bucket_cte_sql()}
    SELECT la.vec_id AS a, rb.vec_id AS b,
           ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS sim
    FROM bk la JOIN bk rb ON la.bucket = rb.bucket AND la.vec_id < rb.vec_id
    JOIN e ea ON ea.vec_id = la.vec_id
    JOIN e eb ON eb.vec_id = rb.vec_id
    WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4
    ORDER BY a, b
    """,
    tags=["similarity", "lsh"],
)
def ann_cosine_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pair search — candidates only from shared
    sign buckets (the n²-free scale path), exact cosine verify within.
    Same inlined-plane trick as sim_topk_lsh: the oracle rebuilds the
    buckets, so the candidate generation AND the verified pair set are
    hash-checked against DuckDB (threshold applied to the rounded sim on
    both sides)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(emb, threshold=0.4, n_planes=6).orderBy("a", "b")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           length(text) AS n_chars,
           ROUND(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g'))
                 * 1.0 / greatest(length(text), 1), 6) AS punct_ratio
    FROM documents ORDER BY doc_id
    """,
    tags=["text"],
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char/punctuation stats — one map-side pass, no Python."""
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.char_count("text").alias("n_chars"),
        F.round(text.punct_ratio("text"), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


@register(
    "text_stopword_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, text
      FROM documents
    )
    SELECT doc_id,
           ROUND(len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','is','to','in')))
                 * 1.0 / greatest(len(toks), 1), 6) AS stopword_ratio,
           ROUND(list_sum(list_transform(toks, x -> length(x)))
                 * 1.0 / greatest(len(toks), 1), 6) AS avg_word_len
    FROM t ORDER BY doc_id
    """,
    tags=["text"],
)
def text_stopword_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(text.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(text.avg_word_len("text"), 6).alias("avg_word_len"),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id,
        len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','is'))) AS s_en,
        len(list_filter(toks, x -> lower(x) IN ('le','la','et','des','une'))) AS s_fr,
        len(list_filter(toks, x -> lower(x) IN ('el','los','una','que','por'))) AS s_es,
        len(list_filter(toks, x -> lower(x) IN ('der','die','und','ein','nicht'))) AS s_de,
        len(list_filter(toks, x -> lower(x) IN ('的','是','了','在','我'))) AS s_zh
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) = 0 THEN 'und'
                WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
                WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
                WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
                WHEN s_de = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'de'
                ELSE 'zh' END AS lang_pred
    FROM s ORDER BY doc_id
    """,
    tags=["text"],
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (argmax, tie-break by language order).
    The driver's `lang` column is synthetic (all texts share one
    vocabulary), so the heuristic is oracle-checked against its own SQL
    transcription, not the label."""
    (docs,) = _t(spark, sf_dir, "documents")
    # interpreted marker-filter HOFs per doc (see text_lang_id_margin):
    # spread measured 1.13 -> 0.98 s on the single-row-group scan
    return (spread(docs.select("doc_id", "text"), probe=docs)
            .select("doc_id", text.lang_id("text").alias("lang_pred"))
            .orderBy("doc_id"))


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
           list_aggregate(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                          i -> md5(substr(text, i, 8))), 'min') AS fp_rolling
    FROM documents ORDER BY doc_id
    """,
    tags=["text"],
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: canonical md5 + rolling char-8-gram min-hash
    (1-permutation MinHash, portable because both engines md5)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.fingerprints(docs, gram=8).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal (synthetic binary fixtures — payloads are ASCII-hex bytes, so
# DuckDB's VARCHAR-only sha256 reproduces every digest and the mapInPandas
# decode/feature stage is value-hash-checked, not just rows-counted)
# ---------------------------------------------------------------------------

def _hexpair(col: str, j: str) -> str:
    """DuckDB expression: byte ``j`` (0-based) of the digest whose
    lowercase hex string is in ``col`` — two nibble lookups."""
    return (
        f"((strpos('0123456789abcdef', substr({col}, CAST(2*({j})+1 AS INT), 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({col}, CAST(2*({j})+2 AS INT), 1)) - 1))"
    )


_MM_BASE_CTE = """
    ids AS (SELECT unnest(range(0, 64)) AS i),
    base AS (
      SELECT i,
             CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
             repeat(sha256('42:' || CAST(i AS VARCHAR)),
                    CAST(4 + i % 13 AS INT)) AS p
      FROM ids
    ), dg AS (
      SELECT i, modality, p, sha256(p) AS dh FROM base
    )"""


@register(
    "mm_feature_extract",
    oracle=f"""
    WITH {_MM_BASE_CTE}
    SELECT i AS asset_id, modality,
           CAST(length(p) AS BIGINT) AS n_bytes,
           dh AS sha256,
           CAST(CASE WHEN modality = 'image' THEN 64 + {_hexpair('dh', '0')} % 192
                     WHEN modality = 'video' THEN 320 + {_hexpair('dh', '0')} % 64
                END AS INTEGER) AS width,
           CAST(CASE WHEN modality = 'image' THEN 64 + {_hexpair('dh', '1')} % 192
                     WHEN modality = 'video' THEN 240 + {_hexpair('dh', '1')} % 48
                END AS INTEGER) AS height,
           CAST(CASE WHEN modality = 'video' THEN 8 + {_hexpair('dh', '2')} % 24
                END AS INTEGER) AS n_frames,
           CAST(list_transform(range(0, 16),
                j -> (({_hexpair('dh', 'j')} * (j + 1)) % 255) / 255.0)
                AS FLOAT[]) AS feature
    FROM dg ORDER BY asset_id
    """,
    tags=["multimodal"],
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary asset columns via
    mapInPandas (decode stubbed deterministically — no codecs in the
    container; the schema/partitioning/batch plumbing is the real design).
    The stub's dimension/feature math is pure digest arithmetic, so the
    oracle recomputes the identical rows from the fixture definition —
    proving the binary column, Arrow batching, and schema handling
    end to end against an independent engine."""
    assets = multimodal.synthetic_assets(spark, n=64)
    return multimodal.extract_features(assets).orderBy("asset_id")


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH {_MM_BASE_CTE},
    nf AS (
      SELECT i, p, 8 + {_hexpair('dh', '2')} % 24 AS n_frames
      FROM dg WHERE modality = 'video'
    ), fr AS (
      SELECT i, p, unnest(range(0, n_frames, 4)) AS fi FROM nf
    )
    SELECT i AS asset_id, CAST(fi AS INTEGER) AS frame_idx,
           sha256(p || ':' || CAST(fi AS VARCHAR)) AS frame_sha256
    FROM fr ORDER BY asset_id, frame_idx
    """,
    tags=["multimodal"],
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling from video assets (explode-shaped mapInPandas);
    frame digests reproduced by the oracle from the fixture definition."""
    assets = multimodal.synthetic_assets(spark, n=64)
    return multimodal.frame_sample(assets, every_n=4).orderBy("asset_id", "frame_idx")


@register(
    "sim_topk_ivf",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim,
           TRUE AS ivf_recall_ge_40pct,
           TRUE AS ivf_simsum_ge_80pct
    FROM embeddings e, q
    ORDER BY sim DESC, e.vec_id LIMIT 20
    """,
    tags=["similarity", "ivf"],
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-20 to the vec_id=1 embedding (k-means cells on a
    deterministic driver sample, 4-of-16 cell probe, exact rerank).

    The IVF index itself is approximate and numpy-dependent, so its raw
    output can't be value-hashed across engines.  Contract form instead
    (same pattern as a8_approx_distinct): emit the BRUTE-FORCE exact
    top-20 rows (DuckDB expresses the identical cosine math — see
    sim_topk_bruteforce) plus two booleans asserting the IVF result's
    quality against that exact set: recall@20 ≥ 40% and Σ(IVF sims) ≥
    80% · Σ(exact sims) — the sim-sum ratio is the stabler ANN quality
    metric (measured 0.89–0.98 across SFs vs 0.5–0.65 raw recall).  The
    oracle expects the exact rows + TRUE/TRUE, so an IVF quality
    collapse turns the hash check red instead of being invisible to the
    gate.  Recall is additionally asserted numerically in
    tests/test_dedup_similarity.py::test_ivf_topk_recall."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    exact = similarity.topk_bruteforce(emb, list(q), k=20)
    ivf = similarity.topk_ivf(emb, list(q), k=20, n_centroids=16, n_probe=4)
    contract = (
        exact.join(ivf.select("vec_id"), "vec_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(exact.agg(F.sum("sim").alias("ex_sum")))
        .crossJoin(ivf.agg(F.sum("sim").alias("iv_sum")))
        .select((F.col("n_hits") * 100 >= F.lit(20 * 40))
                .alias("ivf_recall_ge_40pct"),
                (F.col("iv_sum") * 100 >= F.col("ex_sum") * 80)
                .alias("ivf_simsum_ge_80pct")))
    return (exact.crossJoin(F.broadcast(contract))
            .orderBy(F.desc("sim"), "vec_id"))


@register(
    "text_tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
             AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (n.n_docs + 1) * 1.0 / (df.df + 1), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3 ORDER BY doc_id, rk
    """,
    tags=["text", "tfidf"],
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf·idf terms per document (log-free idf — bit-identical
    division instead of libm-dependent ln)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, k=3).orderBy("doc_id", "rk")


@register(
    "corpus_clean_pipeline",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, text,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             ROUND(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g'))
                   * 1.0 / greatest(length(text), 1), 6) AS punct
      FROM documents
    ), qualified AS (
      SELECT * FROM base WHERE n_tokens >= 20 AND punct <= 0.1
    ), hashed AS (
      SELECT doc_id, text,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM qualified
    ), canon AS (
      SELECT h, MIN(doc_id) AS canonical_id FROM hashed GROUP BY h
    ), exact_tagged AS (
      SELECT hashed.doc_id, hashed.text,
             hashed.doc_id <> canon.canonical_id AS is_exact_dup
      FROM hashed JOIN canon USING (h)
    ), survivors AS (
      SELECT doc_id, text FROM exact_tagged WHERE NOT is_exact_dup
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM survivors
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    near AS (
      SELECT DISTINCT r.b AS near_dup_id FROM (
        SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
        FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
        GROUP BY 1, 2
      ) r
      JOIN sizes sa ON r.a = sa.doc_id JOIN sizes sb ON r.b = sb.doc_id
      WHERE r.inter * 1.0 / (sa.sz + sb.sz - r.inter) >= 0.5
    )
    SELECT b.doc_id, b.n_tokens,
           CASE WHEN b.n_tokens IS NULL OR b.n_tokens < 20 OR b.punct > 0.1
                THEN 'low_quality'
                WHEN et.is_exact_dup THEN 'exact_dup'
                WHEN n.near_dup_id IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS verdict
    FROM base b
    LEFT JOIN exact_tagged et ON b.doc_id = et.doc_id
    LEFT JOIN near n ON b.doc_id = n.near_dup_id
    ORDER BY b.doc_id
    """,
    tags=["dedup", "text", "pipeline"],
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleanup (quality gate → exact dedup →
    near-dup removal) with a per-document audit verdict — one declarative
    program, oracle-checked end to end.  Session-shared with
    `corpus_assemble_pipeline` (cache.shared_clean_verdicts), so the
    cleaning stack runs once however many consumers read it."""
    from ..cache import shared_clean_verdicts
    return shared_clean_verdicts(spark, sf_dir).orderBy("doc_id")


@register(
    "dedup_components",
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT i.a, i.b FROM (
        SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
        FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id
        GROUP BY 1, 2
      ) i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
      WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
    ), nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
    sym AS (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
    reach AS (
      SELECT n AS src, n AS dst FROM nodes
      UNION
      SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    )
    SELECT src AS n, MIN(dst) AS component
    FROM reach GROUP BY src ORDER BY n
    """,
    tags=["dedup", "graph"],
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components (iterative
    min-label propagation, operators/graph.py) over the exact Jaccard
    pair graph — oracle-checked against a recursive-CTE transitive
    closure.  The closure is O(n·reachable) and only viable at oracle
    scale; the propagation loop is the 100 TB path.  Pair graph and
    labels come from the session-shared checkpoint (cache.py)."""
    from ..cache import shared_components
    return shared_components(spark, sf_dir, n=3, threshold=0.5).orderBy("n")


@register(
    "split_train_val_test",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR) || 'split-v1'), 1, 8) AS h8
      FROM documents
    ), b AS (
      SELECT doc_id, source,
             (list_aggregate(list_transform(range(1, 9),
                i -> (strpos('0123456789abcdef', substr(h8, CAST(i AS INT), 1)) - 1)
                     * CAST(16 ** (8 - i) AS BIGINT)), 'sum')) % 100 AS bucket
      FROM h
    )
    SELECT source,
           CAST(SUM(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN bucket >= 10 AND bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN bucket >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_train
    FROM b GROUP BY source ORDER BY source
    """,
    tags=["text", "sampling"],
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (md5 hash buckets — stable
    across runs/engines/layouts, unlike rand()); per-source split counts.
    Rates hold per stratum because the hash is independent of source."""
    (docs,) = _t(spark, sf_dir, "documents")
    split = text.train_val_test_split(docs, val_pct=10, test_pct=10)
    return (
        split.groupBy("source")
        .agg(F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
             F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
             F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"))
        .orderBy("source")
    )


@register(
    "text_repetition_signals",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           ROUND(1.0 - len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 6)
             AS dup_token_frac,
           ROUND(list_max(list_transform(list_distinct(toks),
                   d -> len(list_filter(toks, x -> x = d))))
                 * 1.0 / greatest(len(toks), 1), 6) AS top_token_frac
    FROM t ORDER BY doc_id
    """,
    tags=["text"],
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-token fraction and
    most-frequent-token fraction per document."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.repetition_signals(docs).orderBy("doc_id")


@register(
    "text_corpus_top_bigrams",
    oracle=r"""
    WITH t AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
    ), g AS (
      SELECT unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1) + 1),
               i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS gram
      FROM t
    )
    SELECT gram, COUNT(*) AS n_docs FROM g
    GROUP BY gram ORDER BY n_docs DESC, gram LIMIT 20
    """,
    tags=["text", "ngram"],
)
def text_corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 word bigrams (per-document distinct — document
    frequency, the dedup-robust count)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return text.corpus_top_ngrams(docs, n=2, k=20)


@register(
    "sess1_gap_sessions",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM o
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=["sessions", "window"],
)
def sess1_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): per-user island
    detection windows, microsecond gap math, event_id tiebreak so the
    split is deterministic under timestamp collisions."""
    from ..operators.sessions import session_summaries
    (events,) = _t(spark, sf_dir, "events")
    return (
        session_summaries(events, gap_minutes=30, tiebreak_col="event_id")
        .orderBy("user_id", "session_id")
    )


@register(
    "sess2_funnel_counts",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS step_no, 'signup' AS step, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
    UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
    ORDER BY step_no
    """,
    tags=["sessions", "funnel"],
)
def sess2_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel signup→view→purchase: users counted at step k
    only when it happened strictly after their step k-1 (chained per-user
    min-ts aggregations on one shuffle key)."""
    from ..operators.sessions import funnel_counts
    (events,) = _t(spark, sf_dir, "events")
    return funnel_counts(events, ["signup", "view", "purchase"])


@register(
    "pii_scan_scrub",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id, source,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call +1-555-0199' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.7' ELSE '' END AS t
      FROM documents
    ), s1 AS (
      -- sequential counting: each kind counted on the text left after
      -- earlier kinds were scrubbed, matching operators/pii.pii_counts
      SELECT source,
             len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
      FROM planted
    ), s2 AS (
      SELECT source, e,
             len(regexp_extract_all(t1,
               '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS p,
             regexp_replace(t1,
               '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
      FROM s1
    ), counted AS (
      SELECT source, e, p,
             len(regexp_extract_all(t2,
               '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS i,
             length(regexp_replace(t2,
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS slen
      FROM s2
    )
    SELECT source,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(i) AS BIGINT) AS n_ips,
           CAST(SUM(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(SUM(slen) AS BIGINT) AS scrubbed_chars
    FROM counted GROUP BY source ORDER BY source
    """,
    tags=["pii", "text"],
)
def pii_scan_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + scrub end to end: deterministic PII planted from
    doc_id (the corpus itself is clean synthetic text), then per-source
    match counts and the total scrubbed-text length — which only matches
    the oracle if every replacement landed identically.  RE2-compatible
    patterns, all codegen (operators/pii.py)."""
    from ..operators.pii import pii_counts, scrub_pii
    (docs,) = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    planted = docs.select(
        "doc_id", "source",
        F.concat(
            F.col("text"),
            F.when(k % 3 == 0,
                   F.concat(F.lit(" contact user"), k.cast("string"),
                            F.lit("@example.com"))).otherwise(""),
            F.when(k % 5 == 0, F.lit(" call +1-555-0199")).otherwise(""),
            F.when(k % 7 == 0,
                   F.concat(F.lit(" host 10.0."), (k % 256).cast("string"),
                            F.lit(".7"))).otherwise(""),
        ).alias("text"),
    )
    scanned = scrub_pii(pii_counts(planted))
    return (
        scanned.groupBy("source")
        .agg(F.sum("n_email").alias("n_emails"),
             F.sum("n_phone").alias("n_phones"),
             F.sum("n_ipv4").alias("n_ips"),
             F.sum((F.col("n_email") + F.col("n_phone")
                    + F.col("n_ipv4") > 0).cast("long")).alias("docs_with_pii"),
             F.sum(F.length("scrubbed")).alias("scrubbed_chars"))
        .orderBy("source")
    )


@register(
    "text_gopher_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), sig AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
               / greatest(len(toks), 1) AS mean_word_len,
             CAST(len(list_filter(toks,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(toks), 1) AS frac_alpha_words,
             len(list_filter(toks, x -> lower(x) IN
                  ('the','a','of','and','is','to','in'))) AS n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND frac_alpha_words >= 0.8 AND n_stopwords >= 2) AS gopher_pass
    FROM sig ORDER BY doc_id
    """,
    tags=["text", "quality"],
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality signals per document (division-only math for
    oracle parity); the composite verdict is the cheap pre-filter stage
    ahead of dedup in clean_corpus-style pipelines."""
    from ..operators.text import gopher_signals
    (docs,) = _t(spark, sf_dir, "documents")
    return gopher_signals(docs).orderBy("doc_id")


@register(
    "text_chunk_documents",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), n AS (
      SELECT doc_id, toks,
             greatest((len(toks) - 8 + 23) // 24, 1) AS nc
      FROM t
    ), c AS (
      SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(toks, chunk_id * 24 + 1,
                                      chunk_id * 24 + 32), ' ') AS chunk_text,
           CAST(len(list_slice(toks, chunk_id * 24 + 1,
                               chunk_id * 24 + 32)) AS INT) AS n_tokens
    FROM c ORDER BY doc_id, chunk_id
    """,
    tags=["text", "chunking"],
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-word chunks, 8-word overlap (step 24).
    Pure map-side explode; integer-only boundary math for oracle parity."""
    from ..operators.text import chunk_documents
    (docs,) = _t(spark, sf_dir, "documents")
    return (chunk_documents(docs, chunk_words=32, overlap=8)
            .orderBy("doc_id", "chunk_id"))


@register(
    "dedup_contamination",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0
    ), shared AS (
      SELECT s.doc_id, COUNT(*) AS n_shared
      FROM sh s JOIN bench b ON s.g = b.g
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared_grams,
           COALESCE(s.n_shared, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
    tags=["dedup", "contamination"],
)
def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: distinct 3-gram overlap of every doc
    against the (synthetic) held-in benchmark subset doc_id%17==0 —
    predicate form, so the corpus is shingled once and the broadcast
    benchmark gram set is derived from the same explode."""
    from ..operators.dedup import contamination
    (docs,) = _t(spark, sf_dir, "documents")
    return contamination(docs, F.col("doc_id") % 17 == 0).orderBy("doc_id")


@register(
    "dedup_contamination_bloom",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0
    ), shared AS (
      SELECT s.doc_id, COUNT(*) AS n_shared
      FROM sh s JOIN bench b ON s.g = b.g
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared_grams,
           COALESCE(s.n_shared, 0) >= 2 AS contaminated,
           TRUE AS bloom_no_false_negatives
    FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
    tags=["dedup", "contamination", "bloom"],
)
def dedup_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefilter decontamination in contract form: the exact
    per-doc overlap (hash-checked against DuckDB, same math as
    dedup_contamination) plus a per-row boolean asserting the Bloom
    path's no-false-negative guarantee (n_flagged ≥ n_shared for every
    doc).  A Bloom regression — a bit lost to bitmap sizing, hashing
    drift, probe bugs — flips a row to FALSE and the hash gate goes red;
    the false-positive RATE bound is asserted numerically in pytest."""
    from ..operators.dedup import contamination, contamination_bloom
    (docs,) = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    # r14 A/B'd and REVERTED: the held-in predicate form of the exact arm
    # (one shared shingle pass) measured SLOWER here (collect 1.74 → 1.92
    # min-of-5) — persisting the full corpus explode costs more than
    # re-shingling the tiny bench slice.
    exact = contamination(docs, bench)
    bloom = (contamination_bloom(docs, bench)
             .withColumnRenamed("doc_id", "b_doc_id"))
    return (
        exact.join(bloom, exact["doc_id"] == bloom["b_doc_id"])
        .select("doc_id", "n_shared_grams", "contaminated",
                (F.col("n_flagged_grams") >= F.col("n_shared_grams"))
                .alias("bloom_no_false_negatives"))
        .orderBy("doc_id")
    )


@register(
    "dedup_incremental",
    oracle=r"""
    WITH inc AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM documents WHERE doc_id % 2 = 1
    ), corp AS (
      SELECT DISTINCT
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM documents WHERE doc_id % 2 = 0
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_id FROM inc GROUP BY h
    )
    SELECT i.doc_id,
           CASE WHEN c.h IS NOT NULL THEN 'dup_corpus'
                WHEN i.doc_id > f.first_id THEN 'dup_batch'
                ELSE 'kept' END AS verdict
    FROM inc i LEFT JOIN corp c ON i.h = c.h
    JOIN firsts f ON i.h = f.h
    ORDER BY i.doc_id
    """,
    tags=["dedup", "incremental"],
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: odd doc_ids arrive as the new batch,
    even doc_ids are the existing corpus; verdict per incoming doc."""
    from ..operators.dedup import incremental_exact_dedup
    (docs,) = _t(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    return incremental_exact_dedup(incoming, corpus).orderBy("doc_id")


@register(
    "o5_set_intersect_except",
    oracle="""
    SELECT 'both' AS side, n_nationkey AS k FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only', n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    ORDER BY side, k
    """,
    tags=["setops"],
)
def o5_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set-op surface: INTERSECT/EXCEPT as DataFrame ops (both
    compile to aggregates + joins — no sort, shuffle on the key only)."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("k")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("k")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("side"), "k")
    only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "k")
    return both.unionAll(only).orderBy("side", "k")


@register(
    "a9_unpivot_order_status",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n FROM p
    UNPIVOT (n FOR status IN (f_cnt AS 'F', o_cnt AS 'O', p_cnt AS 'P'))
    ORDER BY o_orderpriority, status
    """,
    tags=["pivot", "unpivot"],
)
def a9_unpivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot→unpivot round trip (§2.5 wide↔long): DataFrame `unpivot`
    (melt) over the a7 pivot — value columns fold back to rows."""
    (orders,) = _t(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )
    return (
        wide.unpivot("o_orderpriority", ["F", "O", "P"], "status", "n")
        .orderBy("o_orderpriority", "status")
    )


@register(
    "dedup_shared_spans",
    oracle=rf"""
    WITH allw AS (
      SELECT doc_id, unnest(range(1, greatest(length(text) - 39, 0) + 1)) AS pos
      FROM documents
    ), wm AS (
      SELECT allw.doc_id, pos,
             md5(substr(d.text, CAST(pos AS INT), 40)) AS m
      FROM allw JOIN documents d ON allw.doc_id = d.doc_id
    ), wh AS (
      SELECT doc_id, pos, {_hex15_to_long('m')} AS h FROM wm
    )
    SELECT s.doc_id AS a, w.doc_id AS b, COUNT(DISTINCT s.h) AS n_shared
    FROM wh s JOIN wh w ON s.h = w.h AND s.doc_id < w.doc_id
    WHERE (s.pos - 1) % 20 = 0
    GROUP BY 1, 2 ORDER BY a, b
    """,
    tags=["dedup", "spans"],
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring detection (40-char windows, stride-20 grid)
    — the suffix-array-style dedup relaxed to a distributed windowed
    hash join; any copied passage ≥ 59 chars is guaranteed found.
    Window hashes are md5-derived, so the full pipeline value-hash
    matches the oracle."""
    (docs,) = _t(spark, sf_dir, "documents")
    return (dedup.shared_span_pairs(docs, window=40, stride=20)
            .orderBy("a", "b"))


@register(
    "text_novelty_signals",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 2, 1) + 1),
        i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
      FROM toks
    ), gdf AS (
      SELECT g, COUNT(*) AS df FROM sh GROUP BY g
    ), per AS (
      SELECT sh.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM sh JOIN gdf USING (g) GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(per.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(CASE WHEN COALESCE(per.n_grams, 0) > 0
                     THEN per.n_novel * 1000000 // per.n_grams
                     ELSE 0 END AS BIGINT) AS novel_ppm
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    ORDER BY d.doc_id
    """,
    tags=["text", "dedup"],
)
def text_novelty_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-n-gram novelty per document (integer ppm) — ranks sources
    by new-information yield; the inverse of contamination."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.novelty_signals(docs, n=3).orderBy("doc_id")


@register(
    "mix_temperature_sample",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    s0 AS (SELECT source, n, CAST(floor(sqrt(n)) AS BIGINT) AS s FROM c),
    s1 AS (
      -- exact integer sqrt: floor(sqrt()) nudged +-1 fixes any IEEE
      -- boundary misround, matching Python's math.isqrt bit-for-bit
      SELECT source, n,
             s + CASE WHEN (s + 1) * (s + 1) <= n THEN 1
                      WHEN s * s > n THEN -1 ELSE 0 END AS isq
      FROM s0
    ), t AS (SELECT CAST(SUM(isq) AS BIGINT) AS denom FROM s1),
    r AS (
      SELECT source, n,
             LEAST(1000000, (300 * isq * 1000000) // (denom * n)) AS rate_ppm
      FROM s1, t
    ), b AS (
      SELECT doc_id, source,
             (list_aggregate(list_transform(range(1, 9),
                i -> (strpos('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR) || 'temp-v1'),
                                    CAST(i AS INT), 1)) - 1)
                     * CAST(16 ** (8 - i) AS BIGINT)), 'sum')) % 1000000 AS bucket
      FROM documents
    )
    SELECT r.source, CAST(r.n AS BIGINT) AS n_docs,
           CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
           CAST(SUM(CASE WHEN b.bucket < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM b JOIN r ON b.source = r.source
    GROUP BY 1, 2, 3 ORDER BY r.source
    """,
    tags=["mixing", "sampling"],
)
def mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 mixture reweighting toward a 300-doc budget:
    per-source keep rates ∝ sqrt(source size) in EXACT integer math
    (isqrt + integer ppm — no float weight exists anywhere), membership
    by md5 hash bucket.  The audit aggregate (docs, rate, kept) is what
    a mix-build job logs per domain."""
    from ..operators import mixing
    (docs,) = _t(spark, sf_dir, "documents")
    sampled = mixing.temperature_sample(docs, target_total=300)
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.first("rate_ppm").alias("rate_ppm"),
             F.sum(F.col("kept").cast("long")).alias("n_kept"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# data mixing (corpus assembly): stratified sampling, token shards, quotas
# ---------------------------------------------------------------------------

@register(
    "mix_stratified_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR) || 'mix-v1'), 1, 8) AS h8
      FROM documents
    ), b AS (
      SELECT source,
             (list_aggregate(list_transform(range(1, 9),
                i -> (strpos('0123456789abcdef', substr(h8, CAST(i AS INT), 1)) - 1)
                     * CAST(16 ** (8 - i) AS BIGINT)), 'sum')) % 100 AS bucket
      FROM h
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM b
    WHERE bucket < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 75
                               WHEN 'src2' THEN 50 WHEN 'src3' THEN 25
                               ELSE 60 END
    GROUP BY source ORDER BY source
    """,
    tags=["mixing", "sampling"],
)
def mix_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing downsample: per-source keep rates via
    md5 hash buckets (operators/mixing.py) — reproducible across runs,
    engines, and cluster layouts, unlike rand()-seeded sampleBy.
    Map-side filter, zero shuffles before the count."""
    from ..operators import mixing
    (docs,) = _t(spark, sf_dir, "documents")
    rates = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}
    sampled = mixing.stratified_sample(docs, rates, default_pct=60)
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


@register(
    "mix_pack_token_shards",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS tok_before
      FROM t
    )
    SELECT tok_before // 4096 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_sum
    FROM r GROUP BY 1 ORDER BY shard
    """,
    tags=["mixing", "packing"],
)
def mix_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (operators/mixing.py): global exclusive
    prefix sum of token counts (two-phase range-partitioned — no
    single-partition window), shard = prefix div budget.  The oracle's
    naive global window is the semantics; the Spark plan is the form of
    it that survives 100 TB."""
    from ..operators import mixing
    (docs,) = _t(spark, sf_dir, "documents")
    packed = mixing.pack_token_shards(docs, budget_tokens=4096)
    return (
        packed.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("tok_sum"))
        .orderBy("shard")
    )


@register(
    "mix_domain_topk",
    oracle=r"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ), r AS (
      SELECT source, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_tokens DESC, doc_id) AS rk
      FROM t
    )
    SELECT source, doc_id, n_tokens, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 5 ORDER BY source, rk
    """,
    tags=["mixing", "window"],
)
def mix_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: top-5 docs per source by token count
    (operators/mixing.domain_topk) — one shuffle on the stratum key,
    WindowGroupLimit caps the per-stratum sort at k rows."""
    from ..operators import mixing
    (docs,) = _t(spark, sf_dir, "documents")
    with_tok = docs.withColumn(
        "n_tokens", text.token_count("text").cast("long"))
    topk = mixing.domain_topk(with_tok, 5, F.col("n_tokens"))
    return (
        topk.select("source", "doc_id", "n_tokens",
                    F.col("rk").cast("long").alias("rk"))
        .orderBy("source", "rk")
    )


@register(
    "emb_centroid_by_label",
    oracle="""
    SELECT label, CAST(i - 1 AS BIGINT) AS pos,
           CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000)
                         AS BIGINT)) AS BIGINT) AS sum_scaled,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM embeddings,
         UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i ORDER BY label, pos
    """,
    tags=["embedding", "aggregate"],
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components in scaled-integer space
    (operators/similarity.centroid_by_label): floor(v·1e6) longs sum
    exactly — order-independent and engine-portable, where a raw double
    sum would drift with partition order.  Shuffle is O(labels × dims),
    independent of row count."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    cent = similarity.centroid_by_label(emb)
    return (
        cent.select("label", F.col("pos").cast("long").alias("pos"),
                    "sum_scaled", "n")
        .orderBy("label", "pos")
    )


@register(
    "sim_hard_negatives",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    scored AS (
      SELECT q.vec_id, c.vec_id AS neg_id,
             ROUND(list_cosine_similarity(q.v, c.v), 6) AS sim
      FROM e q JOIN e c
        ON q.label <> c.label AND q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT vec_id, neg_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, neg_id) AS rk
      FROM scored
    )
    SELECT vec_id, neg_id, sim, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY vec_id, rk
    """,
    tags=["similarity", "training"],
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: top-3 most-similar cross-label vectors per
    embedding (operators/similarity.hard_negatives) — the contrastive-
    training sampler, exact via the blocked GEMM with per-block local
    top-k.  Oracle = the naive all-pairs window over identical rounded
    similarities."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return (similarity.hard_negatives(emb, k=3).orderBy("vec_id", "rk"))

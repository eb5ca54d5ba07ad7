"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the baseline (and the exact verifier); the
scale path is sign-LSH (random hyperplane) bucketing: candidates come from
the query's bucket (plus near buckets), then exact rerank within.  All
vector math is JVM-side higher-order functions (zip_with/aggregate) —
no Python in the hot path; a pandas-UDF variant exists for comparison in
benchmarks (Arrow-batched, used when expression depth becomes the
bottleneck).

Scale: brute force is one map-side pass + TakeOrdered (fine for one query
over 100 TB but O(queries × rows) for batches); LSH cuts the scanned
fraction to ~1/2^planes per query.  An IVF variant (centroid assignment +
probe lists) follows the same candidates→rerank shape.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — zip_with + aggregate, whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _query_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def topk_bruteforce(emb: DataFrame, query: list[float], k: int = 10,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: map-side score, TakeOrderedAndProject — no full
    sort ever materializes.  Ties broken by id for determinism."""
    q = _query_literal(query)
    return (
        emb.select(F.col(id_col),
                   F.round(cosine(F.col(vec_col), q), 6).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed — reproducible across
    runs and executors)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _bucket_expr(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign bucket: bit p = 1 iff vec·plane_p ≥ 0, packed into a long."""
    bits = [
        F.when(dot(vec_col, _query_literal(p)) >= 0,
               F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed(emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 7,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign every vector to its sign-LSH bucket.  At scale this DataFrame
    is written bucketed/partitioned by `bucket` so a query probes one
    partition (partition pruning does the candidate selection)."""
    planes = _planes(dim, n_planes, seed)
    return emb.select(F.col(id_col), F.col(vec_col),
                      _bucket_expr(F.col(vec_col), planes).alias("bucket"))


def _bucket_of(query: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query, p)) >= 0:
            b |= 1 << i
    return b


def topk_lsh(emb: DataFrame, query: list[float], k: int = 10,
             n_planes: int = 8, probe_hamming: int = 1, seed: int = 7,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    ``probe_hamming`` bit flips, exact cosine rerank inside.

    Approximate by construction (recall < 1); the bruteforce operator is
    the oracle it is tested against (recall@k assertion, not equality).
    """
    planes = _planes(len(query), n_planes, seed)
    qb = _bucket_of(query, planes)
    probes = {qb}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qb ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qb ^ (1 << i) ^ (1 << j))
    bucketed = lsh_bucketed(emb, len(query), n_planes, seed, vec_col, id_col)
    q = _query_literal(query)
    return (
        bucketed.filter(F.col("bucket").isin(*probes))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                          n_planes: int = 6, seed: int = 7,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs share an LSH bucket, then
    exact cosine ≥ threshold.  The bucket join replaces the n² cross join
    (scale path); at high thresholds near-dups almost always share all sign
    bits, so recall stays high with few planes."""
    dim_probe = emb.select(F.size(vec_col).alias("d")).first()["d"]
    bucketed = lsh_bucketed(emb, dim_probe, n_planes, seed, vec_col, id_col)
    l, r = bucketed.alias("l"), bucketed.alias("r")
    sim = cosine(F.col("l." + vec_col), F.col("r." + vec_col))
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"),
                F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_pairs_bruteforce(emb: DataFrame, threshold: float = 0.95,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Exact all-pairs cosine (verifier / small-data path — O(n²))."""
    l = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        l.join(r, F.col("a") < F.col("b"))
        .select("a", "b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def topk_pandas_udf(emb: DataFrame, query: list[float], k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Arrow-batched pandas-UDF cosine — the comparison point for the
    JVM-expression version (useful when expression depth / codegen limits
    bite at very high dims)."""
    from pyspark.sql.functions import pandas_udf

    qv = np.asarray(query, dtype=np.float64)
    qn = math.sqrt(float(qv @ qv))

    @pandas_udf("double")
    def cos(batch: pd.Series) -> pd.Series:
        mat = np.vstack(batch.to_numpy())
        dots = mat.astype(np.float64) @ qv
        norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return (
        emb.select(F.col(id_col), F.round(cos(F.col(vec_col)), 6).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )

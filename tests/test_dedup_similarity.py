"""Extension-operator tests: approximate dedup/ANN asserted against their
exact counterparts (recall / containment), plus determinism checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    # corpus with planted near-duplicates: pairs (i, i+100) share most
    # of the text; distinct docs are unrelated word mixes
    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"]
    rows = []
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(30)]  # disjoint vocab per doc
        rows.append((i, " ".join(words)))
        if i < 10:  # planted near-dup: same words, one substitution
            dup = list(words)
            dup[5] = "CHANGED"
            rows.append((i + 100, " ".join(dup)))
    rows.append((500, base[0]))
    rows.append((600, base[0]))  # exact dup of 500
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dedup_groups(docs):
    out = {r["canonical_id"]: r["n_dupes"] for r in dedup.exact_dedup(docs).collect()}
    assert out[500] == 2           # 500 & 600 collapse
    assert 600 not in out
    assert out[0] == 1


def test_ngram_jaccard_finds_planted_pairs(docs):
    pairs = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    for i in range(10):
        assert (i, i + 100) in pairs, f"planted near-dup ({i},{i+100}) missed"
    # unrelated docs don't pair
    assert all(b - a == 100 or (a, b) == (500, 600) for a, b in pairs)


def test_minhash_lsh_recall_vs_exact(docs):
    exact = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    approx = {(r["a"], r["b"]) for r in
              dedup.minhash_near_dupes(docs, k=32, bands=8, threshold=0.5).collect()}
    # recall ≥ 0.8 on planted dups; no wild false-positive explosion
    hits = len(exact & approx)
    assert hits / max(len(exact), 1) >= 0.8
    assert len(approx) <= len(exact) * 3 + 5


def test_minhash_signature_deterministic(docs):
    s1 = dedup.minhash_docs(docs).orderBy("doc_id").collect()
    s2 = dedup.minhash_docs(docs).orderBy("doc_id").collect()
    assert [r["sig"] for r in s1] == [r["sig"] for r in s2]


def test_simhash_exact_dup_same_fingerprint(spark):
    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely unrelated content here")],
        "doc_id: long, text: string")
    fps = {r["doc_id"]: r["fp"] for r in
           d.select("doc_id", dedup.simhash("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert all(v >= 0 for v in fps.values())  # 63-bit → non-negative


def test_simhash_near_dupes_planted(docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dedup.simhash_near_dupes(docs, max_hamming=8).collect()}
    # pigeonhole blocking guarantees recall within the radius: every
    # planted pair whose true hamming ≤ 8 must be found; with a 1-of-30
    # token substitution that is nearly all of them
    found = sum((i, i + 100) in pairs for i in range(10))
    assert found >= 8
    assert pairs[(500, 600)] == 0  # exact dup = hamming 0


@pytest.fixture(scope="module")
def emb(spark):
    import math
    import random
    rng = random.Random(11)
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    # planted near-dups of vector 0
    base = rows[0][1]
    for j in (1000, 1001):
        rows.append((j, [x + rng.gauss(0, 0.01) for x in base]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_topk_bruteforce_orders_by_cosine(emb):
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = similarity.topk_bruteforce(emb, list(q), k=5).collect()
    ids = [r["vec_id"] for r in top]
    assert ids[0] == 0 and top[0]["sim"] == pytest.approx(1.0, abs=1e-5)
    assert {1000, 1001} <= set(ids)
    sims = [r["sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall(emb):
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [r["vec_id"] for r in similarity.topk_bruteforce(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.topk_lsh(emb, q, k=10, n_planes=6, probe_hamming=1).collect()]
    # the query vector itself and its planted dups must survive bucketing
    assert 0 in approx and 1000 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5


def test_cosine_near_dup_pairs_lsh_finds_planted(emb):
    pairs = {(r["a"], r["b"]) for r in
             similarity.cosine_near_dup_pairs(emb, threshold=0.99, n_planes=4).collect()}
    assert (0, 1000) in pairs and (0, 1001) in pairs


def test_pandas_udf_matches_jvm_cosine(emb):
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    jvm = {r["vec_id"]: r["sim"] for r in similarity.topk_bruteforce(emb, q, k=20).collect()}
    pdf = {r["vec_id"]: r["sim"] for r in similarity.topk_pandas_udf(emb, q, k=20).collect()}
    assert set(jvm) == set(pdf)
    for k in jvm:
        assert jvm[k] == pytest.approx(pdf[k], abs=2e-6)


def test_blocked_allpairs_matches_naive_numpy(spark):
    # regression: cross-block pairs whose id order opposes the block order
    # must not be dropped (min/max normalization, not the a<b grid mask)
    import random

    import numpy as np
    rng = random.Random(11)
    rows = [(i * 7 + 1, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    # plant near-dup pairs across many id gaps
    for k, (i, v) in enumerate(rows[:10]):
        rows.append((5000 - i, [x + rng.gauss(0, 0.01) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = {(r["a"], r["b"]): r["sim"] for r in
           similarity.cosine_pairs_bruteforce(emb, threshold=0.9, n_blocks=4).collect()}
    mat = np.array([v for _, v in rows], dtype=np.float64)
    ids = [i for i, _ in rows]
    sims = (mat @ mat.T) / (np.linalg.norm(mat, axis=1)[:, None]
                            * np.linalg.norm(mat, axis=1)[None, :])
    want = {}
    for x in range(len(ids)):
        for y in range(len(ids)):
            if ids[x] < ids[y] and sims[x, y] >= 0.9:
                want[(ids[x], ids[y])] = round(sims[x, y], 6)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=2e-6)


def test_ivf_topk_recall(emb):
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [r["vec_id"] for r in similarity.topk_bruteforce(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.topk_ivf(emb, q, k=10, n_centroids=8, n_probe=3).collect()]
    # the query vector itself and its planted near-dups must be found
    assert 0 in approx and 1000 in approx
    assert len(set(exact) & set(approx)) / 10 >= 0.5


def test_clean_corpus_verdicts(spark):
    from databox_adls_loader_spark.operators.corpus import clean_corpus
    good = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(["CHANGED" if i == 5 else f"tok{i}" for i in range(30)])
    rows = [
        (1, good),                       # kept (smallest of the dup group)
        (2, good),                       # exact_dup of 1
        (3, near),                       # near_dup of 1 (1 of 30 changed)
        (4, "short text"),               # low_quality: < 20 tokens
        (5, "!!! " * 30),                # low_quality: punct ratio
        (6, " ".join(f"other{i}" for i in range(25))),  # kept
    ]
    out = {r["doc_id"]: r["verdict"] for r in
           clean_corpus(spark.createDataFrame(rows, "doc_id: long, text: string"),
                        min_tokens=20, max_punct=0.1).collect()}
    assert out == {1: "kept", 2: "exact_dup", 3: "near_dup",
                   4: "low_quality", 5: "low_quality", 6: "kept"}


def test_clean_corpus_null_text_is_low_quality(spark):
    from databox_adls_loader_spark.operators.corpus import clean_corpus
    rows = [(1, None), (2, " ".join(f"w{i}" for i in range(30)))]
    out = {r["doc_id"]: r["verdict"] for r in
           clean_corpus(spark.createDataFrame(rows, "doc_id: long, text: string"),
                        min_tokens=20, max_punct=0.1).collect()}
    assert out == {1: "low_quality", 2: "kept"}


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=25),
       st.integers(0, 4))
def test_clean_corpus_partition_invariants(spark, doc_templates, n_short):
    from databox_adls_loader_spark.operators.corpus import clean_corpus
    # docs drawn from 6 templates (guaranteed exact dups) + short junk
    rows = [(i, " ".join(f"t{t}w{j}" for j in range(25)))
            for i, t in enumerate(doc_templates)]
    rows += [(1000 + i, "too short") for i in range(n_short)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = clean_corpus(docs, min_tokens=20, max_punct=0.1).collect()
    # every doc classified exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)
    verdicts = {r["doc_id"]: r["verdict"] for r in out}
    texts = dict(rows)
    # short docs are low_quality
    for i in range(n_short):
        assert verdicts[1000 + i] == "low_quality"
    # kept docs have pairwise-distinct texts (no surviving exact dup)
    kept = [i for i, v in verdicts.items() if v == "kept"]
    assert len({texts[i] for i in kept}) == len(kept)
    # each template's kept representative is its min id
    for t in set(doc_templates):
        group = [i for i, tt in enumerate(doc_templates) if tt == t]
        assert verdicts[min(group)] == "kept"
        for other in group[1:]:
            if other != min(group):
                assert verdicts[other] == "exact_dup"


def test_contamination_planted(spark):
    from databox_adls_loader_spark.operators.dedup import contamination
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),      # copies bench
        (2, "alpha beta gamma nine ten eleven"),         # shares 1 gram
        (3, "totally different words here now friend"),  # disjoint
    ], "doc_id: long, text: string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
           for r in contamination(docs, bench, n=3, min_shared=2).collect()}
    assert got[1] == (4, True)      # all four 3-grams of a 6-word doc
    assert got[2] == (1, False)     # only 'alpha beta gamma'
    assert got[3] == (0, False)


def test_incremental_dedup_verdicts(spark):
    from databox_adls_loader_spark.operators.dedup import (
        incremental_exact_dedup,
    )
    corpus = spark.createDataFrame([
        (0, "existing doc one"), (2, "existing doc two"),
    ], "doc_id: long, text: string")
    incoming = spark.createDataFrame([
        (11, "EXISTING   doc one"),     # canonical dup of corpus (case/ws)
        (13, "brand new content"),
        (15, "brand  new content"),     # batch dup of 13 (whitespace)
        (17, "another fresh doc"),
    ], "doc_id: long, text: string")
    got = {r["doc_id"]: r["verdict"]
           for r in incremental_exact_dedup(incoming, corpus).collect()}
    assert got == {11: "dup_corpus", 13: "kept",
                   15: "dup_batch", 17: "kept"}


def test_incremental_dedup_null_text_gets_verdict(spark):
    """Null-text docs must not vanish through the hash equi-joins; they
    form one dedup group (groupBy-hash semantics, like exact_dedup)."""
    from databox_adls_loader_spark.operators.dedup import (
        incremental_exact_dedup,
    )
    corpus = spark.createDataFrame([(0, "real doc")],
                                   "doc_id: long, text: string")
    incoming = spark.createDataFrame(
        [(1, None), (2, None), (3, "fresh")], "doc_id: long, text: string")
    got = {r["doc_id"]: r["verdict"]
           for r in incremental_exact_dedup(incoming, corpus).collect()}
    assert got == {1: "kept", 2: "dup_batch", 3: "kept"}


# ---------------------------------------------------------------------------
# portable (md5-derived) hash mode — the oracle-checkable LSH path
# ---------------------------------------------------------------------------

def test_md5_long_matches_reference_arithmetic(spark):
    """md5_long must equal int(md5(x)[:15], 16) — the exact arithmetic the
    DuckDB oracles re-express nibble by nibble."""
    import hashlib
    d = spark.createDataFrame([("hello",), ("world",), ("",)], "s: string")
    got = {r["s"]: r["h"]
           for r in d.select("s", dedup.md5_long("s").alias("h")).collect()}
    for s in ("hello", "world", ""):
        assert got[s] == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    seeded = d.select(
        "s", dedup.md5_long("s", seed=3).alias("h")).collect()
    for r in seeded:
        exp = int(hashlib.md5(f"3|{r['s']}".encode()).hexdigest()[:15], 16)
        assert r["h"] == exp


def test_minhash_portable_recall(docs):
    exact = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    approx = {(r["a"], r["b"]) for r in
              dedup.minhash_near_dupes(docs, k=32, bands=8, threshold=0.5,
                                       portable=True).collect()}
    assert len(exact & approx) / max(len(exact), 1) >= 0.8
    assert len(approx) <= len(exact) * 3 + 5


def test_simhash_portable_planted(docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dedup.simhash_near_dupes(docs, max_hamming=9, bits=60,
                                      portable=True).collect()}
    found = sum((i, i + 100) in pairs for i in range(10))
    assert found >= 8
    assert pairs[(500, 600)] == 0
    assert all(h <= 9 for h in pairs.values())


def test_simhash_rejects_uncovered_blocks(docs):
    # 63 bits / 4 blocks does not tile — pigeonhole recall would silently
    # drop; must raise instead
    with pytest.raises(ValueError, match="tile"):
        dedup.simhash_near_dupes(docs, max_hamming=3, bits=63)
    with pytest.raises(ValueError, match="60 bits"):
        dedup.simhash_near_dupes(docs, max_hamming=6, bits=63, portable=True)


# ---------------------------------------------------------------------------
# shared-span / novelty / temperature-mixing operators
# ---------------------------------------------------------------------------

def test_shared_span_pairs_planted(spark):
    span = "X" * 30 + "Y" * 30  # 60 chars >= window + stride - 1
    rows = [
        (1, "aaaa " * 30 + span + " bbbb " * 30),
        (2, "cccc " * 25 + span + " dddd " * 40),
        (3, "entirely unrelated text " * 20),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {(r["a"], r["b"]): r["n_shared"] for r in
             dedup.shared_span_pairs(d, window=40, stride=20).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1  # guaranteed detection
    assert not any(3 in p for p in pairs)


def test_shared_span_pairs_short_docs_no_rows(spark):
    d = spark.createDataFrame([(1, "short"), (2, "short")],
                              "doc_id: long, text: string")
    # below the window size: no windows, no pairs (and no descending
    # sequence() explosion)
    assert dedup.shared_span_pairs(d, window=40, stride=20).count() == 0


def test_novelty_signals_extremes(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
         (3, "unique uno dos tres quatro cinco")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in dedup.novelty_signals(d, n=3).collect()}
    assert out[1]["n_novel"] == 0 and out[2]["n_novel"] == 0  # all shared
    assert out[3]["novel_ppm"] == 1_000_000                   # all unique
    assert out[3]["n_grams"] == out[3]["n_novel"] == 4


def test_temperature_sample_flattens_mixture(spark):
    from databox_adls_loader_spark.operators.mixing import temperature_sample
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id: long, source: string")
    out = temperature_sample(d, target_total=500)
    rates = {r["source"]: r["rate_ppm"] for r in
             out.select("source", "rate_ppm").distinct().collect()}
    # sqrt smoothing: the small source keeps a HIGHER fraction than the
    # big one (that is the point of temperature sampling)
    assert rates["small"] > rates["big"]
    # deterministic: same inputs, same kept set
    k1 = {r["doc_id"] for r in out.filter("kept").collect()}
    k2 = {r["doc_id"] for r in
          temperature_sample(d, target_total=500).filter("kept").collect()}
    assert k1 == k2


def test_temperature_sample_empty_input(spark):
    from databox_adls_loader_spark.operators.mixing import temperature_sample
    d = spark.createDataFrame([], "doc_id: long, source: string")
    out = temperature_sample(d, target_total=500)
    assert out.columns == ["doc_id", "source", "rate_ppm", "kept"]
    assert out.count() == 0


def test_incremental_minhash_finds_cross_side_near_dupes(spark):
    from databox_adls_loader_spark.operators.dedup import (
        incremental_minhash_dedup, minhash_near_dupes)

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(["CHANGED" if i == 7 else f"tok{i}" for i in range(40)])
    other = " ".join(f"zzz{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(0, base), (2, other)], "doc_id: long, text: string")
    incoming = spark.createDataFrame(
        [(1, near), (3, "totally different words entirely"),
         (5, base)], "doc_id: long, text: string")
    out = incremental_minhash_dedup(incoming, corpus, k=32, bands=8,
                                    threshold=0.5).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    # the exact copy and the 1-of-40-changed near-dup both match doc 0
    assert (5, 0) in pairs and (1, 0) in pairs
    # direction contract: a is always an incoming id, b a corpus id
    assert all(a in (1, 3, 5) and b in (0, 2) for a, b in pairs)
    # unrelated docs don't pair
    assert all(b != 2 for _, b in pairs)
    # agreement with the self-join operator run on the union (restricted
    # to cross-side pairs): same candidate policy, same verify
    union = corpus.unionByName(incoming)
    self_pairs = {(max(r["a"], r["b"]), min(r["a"], r["b"]))
                  for r in minhash_near_dupes(union, k=32, bands=8,
                                              threshold=0.5).collect()
                  if (r["a"] in (1, 3, 5)) != (r["b"] in (1, 3, 5))}
    assert {(a, b) for a, b in pairs} == self_pairs


def test_contamination_bloom_superset_and_fp_rate(spark):
    import math

    from pyspark.sql import functions as F

    from databox_adls_loader_spark.operators.dedup import (
        bloom_build, bloom_positions, contamination, contamination_bloom,
        word_shingles)

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(60)]
    # docs 50..59 share the benchmark text of docs 0..9 verbatim
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    bench = docs.filter(F.col("doc_id") < 10)

    exact = {r["doc_id"]: r["n_shared_grams"]
             for r in contamination(docs, bench).collect()}
    bloom = {r["doc_id"]: r["n_flagged_grams"]
             for r in contamination_bloom(docs, bench).collect()}
    # no false negatives: the bloom count dominates the exact count, and
    # every truly contaminated doc is flagged
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= exact[d] for d in exact)

    # false-positive rate on definitely-non-member grams stays within a
    # small multiple of the theoretical (1 - e^{-kn/m})^k bound
    m_bits, k_hashes = 1 << 14, 5
    words = bloom_build(bench, m_bits=m_bits, k_hashes=k_hashes)
    n_items = (bench.select(F.explode(word_shingles("text", 3)))
               .distinct().count())
    theo = (1 - math.exp(-k_hashes * n_items / m_bits)) ** k_hashes
    probes = spark.range(5000).select(
        bloom_positions(F.concat(F.lit("absent gram "), F.col("id")),
                        m_bits, k_hashes).alias("ps"))
    hits = 0
    for r in probes.collect():
        if all(int(words[p >> 6]) >> (p & 63) & 1 for p in r["ps"]):
            hits += 1
    assert hits / 5000 <= max(3 * theo, 0.01)


def test_contamination_predicate_form_matches_dataframe_form(docs):
    from databox_adls_loader_spark.operators.dedup import contamination
    from pyspark.sql import functions as F
    pred = F.col("doc_id") % 7 == 0
    a = sorted(map(tuple, contamination(docs, pred).collect()))
    b = sorted(map(tuple,
                   contamination(docs, docs.filter(pred)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# property tests: shingle construction and portable-hash arithmetic
# ---------------------------------------------------------------------------

def test_word_shingles_matches_reference_construction(spark):
    """Property: the zip_with n-gram construction equals the naive
    per-position slice construction for arbitrary token streams."""
    import random
    rng = random.Random(17)
    texts = []
    for _ in range(120):
        k = rng.randrange(0, 12)
        texts.append(" ".join(
            rng.choice(["aa", "bb", "cc", "dd", "e f", ""]) for _ in range(k)))
    texts += ["", " ", "one", "a  b", "x " * 300]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i: long, text: string")
    for n in (2, 3, 4):
        def naive(t):
            toks = __import__("re").split(r"\s+", t.strip())
            m = max(len(toks) - (n - 1), 1)
            grams = [" ".join(toks[i:i + n]) for i in range(m)]
            out = []
            for g in grams:   # order-preserving distinct = array_distinct
                if g not in out:
                    out.append(g)
            return out
        got = {r["i"]: r["g"] for r in
               df.select("i", dedup.word_shingles("text", n).alias("g")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == naive(t), f"n={n} text={t!r}"


def test_perm_hash_matches_python_integers(spark):
    """Property: the decimal(38,0) permutation hash equals exact Python
    integer arithmetic for boundary and random base values."""
    import random
    from databox_adls_loader_spark.operators.dedup import (
        _PERM_PRIME, _perm_hash, perm_constants)
    rng = random.Random(23)
    bases = [0, 1, (1 << 60) - 1] + [rng.randrange(0, 1 << 60) for _ in range(40)]
    df = spark.createDataFrame([(b,) for b in bases], "h: long")
    for a, b in perm_constants(4):
        got = {r["h"]: r["p"] for r in
               df.select("h", _perm_hash(F.col("h"), a, b).alias("p")).collect()}
        for base in bases:
            assert got[base] == (a * base + b) % _PERM_PRIME


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    import math, random
    rng = random.Random(5)
    rows = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v], i % 3))
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    out = similarity.hard_negatives(emb, k=2).collect()
    lbl = {r[0]: r[2] for r in rows}
    by_q = {}
    for r in out:
        assert lbl[r["vec_id"]] != lbl[r["neg_id"]]   # never same-label
        by_q.setdefault(r["vec_id"], []).append((r["rk"], r["sim"]))
    assert set(by_q) == set(range(60))                # every vector served
    for q, lst in by_q.items():
        lst.sort()
        assert [rk for rk, _ in lst] == [1, 2]
        assert lst[0][1] >= lst[1][1]                 # descending sim
    # spot-check rank-1 against a brute-force python scan
    q0 = rows[0][1]
    best = max(((sum(a*b for a, b in zip(q0, v)), i) for i, v, l in rows
                if l != 0 and i != 0))
    got1 = [r for r in out if r["vec_id"] == 0 and r["rk"] == 1][0]
    assert got1["neg_id"] == best[1]


def test_kmeans_distributed_converges_and_separates(spark):
    """Distributed Lloyd: inertia (mean cosine to assigned centroid) must
    improve from the init, planted blobs must land in distinct cells, and
    only k x dim state reaches the driver (returned matrix shape)."""
    import numpy as np

    from databox_adls_loader_spark.operators import similarity

    rng = np.random.default_rng(11)
    dim, per = 16, 40
    rows = []
    for blob in range(3):
        center = np.zeros(dim); center[blob * 5] = 1.0
        for i in range(per):
            v = center + rng.normal(0, 0.05, dim)
            rows.append((blob * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents, inertia = similarity.kmeans_distributed(emb, k=3, iters=4)
    assert cents.shape == (3, dim)
    assert len(inertia) == 4
    # Lloyd improves (or holds) tightness; final must be near-perfect for
    # well-separated blobs (cos to own centroid ~ 1)
    assert inertia[-1] >= inertia[0] - 1e-9
    assert inertia[-1] > 0.95
    # the three blobs assign to three distinct cells
    assigned = similarity.ivf_assign(emb, cents).collect()
    cell_of = {r["vec_id"]: r["cell"] for r in assigned}
    blobs = [{cell_of[b * per + i] for i in range(per)} for b in range(3)]
    assert all(len(s) == 1 for s in blobs)
    assert len(set.union(*blobs)) == 3


def test_ivf_partition_pruned_layout(spark, tmp_path):
    """The 100 TB IVF serving path: assignments written partitionBy(cell),
    a probe query shows PartitionFilters on cell and returns the same
    top-k as the in-memory path."""
    from pyspark.sql import functions as F

    from databox_adls_loader_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    import numpy as np
    # the same sample + trainer topk_ivf uses, so the stored layout and
    # the in-memory path probe identical cells
    mat = similarity._hash_sample_mat(emb, 4096, "embedding", "vec_id")
    cents = similarity._lloyd_kmeans(mat, 16, 8, 7)
    out = str(tmp_path / "ivf")
    similarity.ivf_assign(emb, cents).write.partitionBy("cell").parquet(out)

    qv = np.asarray(q, dtype=np.float64); qv /= np.linalg.norm(qv)
    probes = [int(p) for p in np.argsort(-(cents @ qv))[:4]]
    stored = spark.read.parquet(out).filter(F.col("cell").isin(probes))
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:200]

    from databox_adls_loader_spark.operators.similarity import (
        _query_literal, cosine)
    topk_stored = (stored.select(
        "vec_id", F.round(cosine(F.col("embedding"), _query_literal(q)), 6)
        .alias("sim")).orderBy(F.desc("sim"), "vec_id").limit(20).collect())
    topk_mem = similarity.topk_ivf(emb, q, k=20, n_centroids=16,
                                   n_probe=4).collect()
    assert [(r["vec_id"], r["sim"]) for r in topk_stored] == \
        [(r["vec_id"], r["sim"]) for r in topk_mem]


def test_pq_train_codebook_shape_and_divisibility(emb):
    cb = similarity.pq_train(emb, m=4, k_codes=8, sample_rows=128)
    assert cb.shape == (4, 8, 4)  # 16-dim → 4 subspaces of 4
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=5)  # 16 % 5 != 0


def test_pq_encode_codes_bounded_and_deterministic(emb):
    cb = similarity.pq_train(emb, m=4, k_codes=8, sample_rows=128)
    c1 = {r["vec_id"]: list(r["codes"])
          for r in similarity.pq_encode(emb, cb).collect()}
    c2 = {r["vec_id"]: list(r["codes"])
          for r in similarity.pq_encode(emb, cb).collect()}
    assert c1 == c2  # no RNG anywhere: codes reproducible across runs
    assert all(len(v) == 4 and all(0 <= c < 8 for c in v) for v in c1.values())
    # planted near-dups of vector 0 quantize to the same codes
    assert c1[1000] == c1[0] and c1[1001] == c1[0]


def test_pq_topk_recall(emb):
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [r["vec_id"] for r in
             similarity.topk_bruteforce(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.pq_topk(emb, q, k=10, m=4, k_codes=16,
                                 expand=4).collect()]
    # the query vector and its planted near-dups must be found
    assert 0 in approx and 1000 in approx
    assert len(set(exact) & set(approx)) / 10 >= 0.5
    # rerank output is exact cosine, descending
    sims = [r["sim"] for r in
            similarity.pq_topk(emb, q, k=10, m=4, k_codes=16).collect()]
    assert sims == sorted(sims, reverse=True)


def test_gram_upper_scaled_matches_numpy(emb):
    import numpy as np
    rows = similarity.gram_upper_scaled(emb, scale=1000).collect()
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    s = np.floor(mat * 1000).astype(np.int64)
    ref = s.T @ s
    assert len(rows) == 16 * 17 // 2
    for r in rows[:40]:
        assert r["g"] == ref[r["i"], r["j"]]


def test_pca_project_deterministic_orthonormal_and_variance(emb):
    import numpy as np
    out1, comps = similarity.pca_project(emb, k=4)
    out2, comps2 = similarity.pca_project(emb, k=4)
    assert np.allclose(comps, comps2)  # deterministic incl. sign rule
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    p1 = {r["vec_id"]: list(r["proj"]) for r in out1.collect()}
    p2 = {r["vec_id"]: list(r["proj"]) for r in out2.collect()}
    assert p1 == p2 and all(len(v) == 4 for v in p1.values())
    # top-4 of 16 directions must capture at least its proportional share
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    total = (mat ** 2).sum()
    kept = sum(sum(x * x for x in v) for v in p1.values())
    assert kept / total >= 0.25
    # planted near-dups of vector 0 project to nearly the same point
    assert np.allclose(p1[0], p1[1000], atol=0.05)


def test_gram_upper_scaled_single_vector(spark):
    one = spark.createDataFrame([(1, [1.0, -0.5])],
                                "vec_id: long, embedding: array<float>")
    got = {(r["i"], r["j"]): r["g"]
           for r in similarity.gram_upper_scaled(one, scale=10).collect()}
    # s = (10, -5): upper triangle of outer product
    assert got == {(0, 0): 100, (0, 1): -50, (1, 1): 25}


def test_containment_catches_subset_jaccard_misses(spark):
    from databox_adls_loader_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)
    short = " ".join(f"w{i}" for i in range(12))
    long = short + " " + " ".join(f"x{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here now")],
        "doc_id: long, text: string")
    got = containment_pairs(docs, threshold=0.9).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["a"], row["b"]) == (1, 2)
    assert row["cont_a_in_b_ppm"] == 1_000_000      # short fully inside long
    assert row["contained_side"] == "a"
    # symmetric Jaccard at the same bar sees nothing
    assert ngram_jaccard_pairs(docs, threshold=0.9).count() == 0


def test_containment_matches_bruteforce_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databox_adls_loader_spark.operators.dedup import containment_pairs

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    doc = st.lists(word, min_size=3, max_size=10).map(" ".join)

    @given(st.lists(doc, min_size=2, max_size=5))
    @settings(max_examples=10, deadline=None)
    def check(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
        got = {(r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"],
                                  r["cont_a_in_b_ppm"], r["cont_b_in_a_ppm"])
               for r in containment_pairs(docs, n=3, threshold=0.0).collect()}
        # brute-force reference on distinct word 3-grams
        sh = []
        for t in texts:
            toks = t.split()
            sh.append({" ".join(toks[i:i + 3])
                       for i in range(max(len(toks) - 2, 1))})
        want = {}
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                inter = len(sh[a] & sh[b])
                if inter:
                    want[(a, b)] = (
                        inter, len(sh[a]), len(sh[b]),
                        inter * 1_000_000 // len(sh[a]),
                        inter * 1_000_000 // len(sh[b]))
        assert got == want

    check()


def test_prefix_filter_join_is_lossless_vs_full_join(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databox_adls_loader_spark.operators.dedup import (
        jaccard_pairs_prefix_filter, ngram_jaccard_pairs)

    word = st.sampled_from([f"w{i}" for i in range(8)])
    doc = st.lists(word, min_size=3, max_size=12).map(" ".join)

    @given(st.lists(doc, min_size=2, max_size=6),
           st.sampled_from([0.3, 0.5, 0.8]))
    @settings(max_examples=10, deadline=None)
    def check(texts, t):
        docs = spark.createDataFrame(
            [(i, x) for i, x in enumerate(texts)], "doc_id: long, text: string")
        fast = {(r["a"], r["b"], round(r["jaccard"], 6))
                for r in jaccard_pairs_prefix_filter(docs, threshold=t).collect()}
        full = {(r["a"], r["b"], round(r["jaccard"], 6))
                for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
        assert fast == full

    check()


def test_perm_hash_integer_form_matches_reference(spark):
    """The pre-reduced `_perm_hash` must equal
    (a·x + b) mod (2^31−1) computed in unbounded Python ints — 200k
    random draws plus the overflow corners (max base, max constants),
    evaluated through the real codegen path."""
    import random

    from databox_adls_loader_spark.operators.dedup import (
        _PERM_PRIME, _perm_hash, perm_constants)

    rnd = random.Random(17)
    xs = [rnd.randrange(0, 1 << 60) for _ in range(200_000)]
    xs += [0, 1, (1 << 60) - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x: long")
    consts = list(perm_constants(4)) + [
        (0, 0), (1, 0), (_PERM_PRIME - 1, _PERM_PRIME - 1)]
    cols = [_perm_hash(F.col("x"), a, b).alias(f"p{i}")
            for i, (a, b) in enumerate(consts)]
    got = df.select("x", *cols).collect()
    for r in got:
        for i, (a, b) in enumerate(consts):
            assert r[f"p{i}"] == (a * r["x"] + b) % _PERM_PRIME


def test_contamination_overlap_ratio_exact_ppm(spark):
    from databox_adls_loader_spark.operators.dedup import (
        contamination_overlap_ratio)
    from pyspark.sql import functions as F

    # doc 0 is the benchmark; doc 1 copies half its text (+ unique
    # tail), doc 2 shares nothing.  3-grams of a 6-token doc: 4 grams.
    docs = spark.createDataFrame(
        [(0, "a b c d e f"),
         (1, "a b c d x1 x2"),       # grams: abc bcd cdx1 dx1x2 — 2 shared
         (2, "p q r s t u")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in contamination_overlap_ratio(
        docs, F.col("doc_id") == 0, n=3, min_ratio_ppm=0).collect()}
    assert 0 not in out            # benchmark member excluded
    assert 2 not in out            # zero overlap never reported
    assert out[1]["n_grams"] == 4 and out[1]["n_shared"] == 2
    assert out[1]["overlap_ppm"] == 500_000


def test_binary_codes_match_python_twin_and_planted_neighbor(spark):
    """1-bit quantization: Spark's packed words equal the driver-side
    twin bit-for-bit, a planted sign-identical vector sits at Hamming 0,
    a planted near-copy (3 flipped signs) at exactly 3, and an
    orthogonal-sign vector at dim — so Hamming ranks the planted
    neighborhood correctly."""
    import random

    from databox_adls_loader_spark.operators.similarity import (
        binary_code_of, binary_codes, topk_hamming)

    rng = random.Random(5)
    base = [rng.gauss(0, 1) or 0.1 for _ in range(64)]
    twin = [v + (0.01 if v >= 0 else -0.01) for v in base]  # same signs
    near = list(base)
    for i in (3, 17, 40):
        near[i] = -near[i] if near[i] != 0 else -0.1
    anti = [-v if v != 0 else -0.1 for v in base]
    noise = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    rows = [(0, base), (1, twin), (2, near), (3, anti)] + [
        (10 + i, v) for i, v in enumerate(noise)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    codes = {r["vec_id"]: (r["w0"], r["w1"])
             for r in binary_codes(emb, 64).collect()}
    for vid, vec in rows:
        assert codes[vid] == tuple(binary_code_of(vec, 64)), vid

    top = topk_hamming(emb, base, k=4, dim=64).collect()
    d = {r["vec_id"]: r["hamming"] for r in top}
    assert d[0] == 0 and d[1] == 0          # sign-identical
    assert d[2] == 3                        # exactly the flipped bits
    assert 3 not in d                       # the antipode is ranked last
    full = {r["vec_id"]: r["hamming"]
            for r in topk_hamming(emb, base, k=100, dim=64).collect()}
    assert full[3] == 64


def test_binary_hamming_rerank_recall_floor(spark, sf_dir):
    """The two-stage pattern on real embeddings: Hamming shortlist
    (top-50 of the packed codes) reranked by exact cosine must keep
    most of the true cosine top-10 — the compression-for-recall trade
    a binary first stage is deployed on."""
    from databox_adls_loader_spark.operators.similarity import (
        topk_bruteforce, topk_hamming)
    from databox_adls_loader_spark.session import load_tables
    from pyspark.sql import functions as F

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"] \
        .select("vec_id", "embedding")
    q = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])
    short = topk_hamming(emb, q, k=50, dim=64)
    rerank = (emb.join(short.select("vec_id"), "vec_id", "left_semi"))
    got = {r["vec_id"] for r in topk_bruteforce(rerank, q, k=10).collect()}
    exact = {r["vec_id"] for r in topk_bruteforce(emb, q, k=10).collect()}
    assert 3 in got
    # random (clusterless) vectors: sign-bit Hamming still correlates
    # with cosine, so a 5× shortlist keeps at least half the true top-10
    assert len(got & exact) >= 5


def test_hamming_neighbor_buckets_properties():
    """The shared multiprobe expansion (used by topk_lsh AND the
    persisted-index probe): exact count Σ C(n, i) for i ≤ radius, every
    member within the radius, the bucket itself included, and any
    radius honored (the pre-refactor form silently capped at 2)."""
    from itertools import combinations
    from math import comb

    from databox_adls_loader_spark.operators.similarity import \
        hamming_neighbor_buckets

    for n_planes in (3, 5, 8):
        for radius in (0, 1, 2, 3):
            base = 0b10110 & ((1 << n_planes) - 1)
            got = hamming_neighbor_buckets(base, n_planes, radius)
            assert got == sorted(set(got))           # sorted, unique
            assert len(got) == sum(comb(n_planes, i)
                                   for i in range(radius + 1))
            assert base in got
            for b in got:
                assert bin(b ^ base).count("1") <= radius
                assert b < (1 << n_planes)
    # radius 3 on 8 planes: 1+8+28+56 = 93 buckets, uncapped
    assert len(hamming_neighbor_buckets(0, 8, 3)) == 93


def test_binary_code_nan_component_packs_as_zero_bit(spark):
    """A NaN component must pack as bit 0 (the explicit isnan guard) —
    matching the Python twin, where float('nan') >= 0 is False —
    instead of riding Spark's NaN-greatest total order."""
    from databox_adls_loader_spark.operators.similarity import (
        binary_code_of, binary_codes)

    vec = [1.0] * 64
    vec[3] = float("nan")
    vec[40] = float("nan")
    emb = spark.createDataFrame([(1, vec)],
                                "vec_id long, embedding array<double>")
    row = binary_codes(emb, 64).collect()[0]
    assert (row.w0, row.w1) == tuple(binary_code_of(vec, 64))
    assert row.w0 & (1 << 3) == 0 and row.w1 & (1 << 8) == 0


def test_kmeans_seed_not_dominated_by_id_ordered_cluster(spark):
    """Round-10 verdict nit: the old id-ordered head seeded the trained
    codebook entirely from whatever cluster owns the low ids.  Plant a
    tight cluster on ids 0..63 (the whole old head for k=4) and two
    other clusters on high ids: the hash-ranked sample must mix ids
    from beyond the low block, and the trained centroids must separate
    all three blobs — and be reproducible run-to-run (no RNG)."""
    import numpy as np

    from databox_adls_loader_spark.operators import similarity

    rng = np.random.default_rng(3)
    dim, per = 16, 64
    rows = []
    for blob in range(3):
        center = np.zeros(dim); center[blob * 5] = 1.0
        for i in range(per):
            v = center + rng.normal(0, 0.05, dim)
            rows.append((blob * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows,
                                "vec_id: long, embedding: array<float>")
    # ids 0..63 are ALL blob 0 — exactly the old orderBy(id).limit(64)
    # head (max(4*k, 64) = 64 for k=3); the hash sample must reach past it
    sampled_ids = [r["vec_id"] for r in
                   emb.orderBy(F.xxhash64(F.col("vec_id")), "vec_id")
                   .limit(64).select("vec_id").collect()]
    assert any(i >= per for i in sampled_ids)
    cents, _ = similarity.kmeans_distributed(emb, k=3, iters=4)
    cents2, _ = similarity.kmeans_distributed(emb, k=3, iters=4)
    assert np.array_equal(cents, cents2)          # still deterministic
    assigned = similarity.ivf_assign(emb, cents).collect()
    cell_of = {r["vec_id"]: r["cell"] for r in assigned}
    blob_cells = [{cell_of[b * per + i] for i in range(per)}
                  for b in range(3)]
    # every blob in one cell, three distinct cells — impossible when
    # all seeds come from blob 0 and Lloyd's one-assignment basin
    # keeps two blobs merged
    assert all(len(s) == 1 for s in blob_cells)
    assert len(set.union(*blob_cells)) == 3

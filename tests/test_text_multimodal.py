"""Text-analysis and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import multimodal, text


def test_text_stats_basic(spark):
    d = spark.createDataFrame(
        [(1, "the cat sat of the mat and it is fine"),
         (2, "word"),
         (3, "a!!! b??? c...")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in text.text_stats(d).collect()}
    assert rows[1]["n_tokens"] == 10
    assert rows[2]["n_tokens"] == 1
    assert rows[1]["stopword_ratio"] > 0.3
    assert rows[3]["punct_ratio"] > 0.4
    assert rows[1]["lang_pred"] == "en"
    assert rows[1]["quality"] > rows[3]["quality"]


def test_lang_id_markers(spark):
    d = spark.createDataFrame(
        [(1, "le chat et la souris des une"),
         (2, "el perro los gatos una que por"),
         (3, "der hund die katze und ein nicht"),
         (4, "xyz qrs tuv")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r["lang"] for r in
           d.select("doc_id", text.lang_id("text").alias("lang")).collect()}
    assert out == {1: "fr", 2: "es", 3: "de", 4: "und"}


def test_fingerprint_rolling_stable_under_suffix_edit(spark):
    # rolling min-hash over char 8-grams: appending text far from the
    # minimal gram usually keeps the fingerprint; md5 fp always changes
    d = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnop"),
         (2, "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopZZZ")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in d.select(
        "doc_id",
        text.fingerprint_md5("text").alias("fp_md5"),
        text.fingerprint_rolling("text").alias("fp_roll")).collect()}
    assert rows[1]["fp_md5"] != rows[2]["fp_md5"]
    assert rows[1]["fp_roll"] == rows[2]["fp_roll"]


def test_bpe_ish_tokens(spark):
    d = spark.createDataFrame([(1, "Hello, world! foo-bar_baz 42x")],
                              "doc_id: long, text: string")
    toks = d.select(text.bpe_ish_tokens("text").alias("t")).first()["t"]
    assert "hello" in toks and "world" in toks and "42x" in toks
    assert "" not in toks


def test_multimodal_feature_extract(spark):
    assets = multimodal.synthetic_assets(spark, n=30)
    feats = multimodal.extract_features(assets).collect()
    assert len(feats) == 30
    by_id = {r["asset_id"]: r for r in feats}
    for r in feats:
        assert r["n_bytes"] > 0
        assert len(r["sha256"]) == 64
        assert len(r["feature"]) == 16
        if r["modality"] == "image":
            assert r["width"] and r["height"] and r["n_frames"] is None
        if r["modality"] == "video":
            assert r["n_frames"] >= 8
        if r["modality"] == "audio":
            assert r["width"] is None
    # determinism
    again = {r["asset_id"]: r for r in
             multimodal.extract_features(assets).collect()}
    assert by_id[0]["feature"] == again[0]["feature"]


def test_multimodal_frame_sample(spark):
    assets = multimodal.synthetic_assets(spark, n=30)
    frames = multimodal.frame_sample(assets, every_n=4).collect()
    assert frames
    vids = {r["asset_id"] for r in frames}
    # only video assets emit frames (modality = id % 3 == 2)
    assert all(a % 3 == 2 for a in vids)
    idxs = [r["frame_idx"] for r in frames if r["asset_id"] == min(vids)]
    assert idxs == sorted(idxs) and all(i % 4 == 0 for i in idxs)


def test_multimodal_unknown_modality_raises(spark):
    import pandas as pd
    bad = spark.createDataFrame(
        [(1, "hologram", bytearray(b"xx"), "application/x-holo")],
        multimodal.ASSET_SCHEMA)
    with pytest.raises(Exception, match="no decoder"):
        multimodal.extract_features(bad).collect()


def test_metadata_only_stats_stays_jvm_side(spark):
    assets = multimodal.synthetic_assets(spark, n=30)
    out = {r["modality"]: r for r in multimodal.metadata_only_stats(assets).collect()}
    assert set(out) == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in out.values())


def test_binary_file_source_ingest(spark, tmp_path):
    from databox_adls_loader_spark.operators import multimodal as mm
    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake" * 10)
    (d / "b.wav").write_bytes(b"RIFF-fake" * 5)
    (d / "sub").mkdir()
    (d / "sub" / "c.mp4").write_bytes(b"mp4-fake" * 20)
    (d / "ignore.txt").write_bytes(b"not an asset")
    out = mm.read_binary_assets(spark, str(d), known_only=False).collect()
    by_mod = {r["modality"]: r for r in out}
    assert set(by_mod) == {"image", "audio", "video", None}
    assert by_mod["image"]["length"] == 90
    assert by_mod["image"]["mime_type"] == "image/png"
    assert by_mod[None]["mime_type"] is None
    # default known_only drops the stray txt so decode stages can't crash
    assert {r["modality"] for r in
            mm.read_binary_assets(spark, str(d)).collect()} == {
        "image", "audio", "video"}
    assert bytes(by_mod["audio"]["content"]) == b"RIFF-fake" * 5
    # recursive lookup found the nested video
    assert by_mod["video"]["path"].endswith("c.mp4")


def test_binary_source_prunes_content_for_metadata(spark, tmp_path):
    from databox_adls_loader_spark.operators import multimodal as mm
    d = tmp_path / "assets2"
    d.mkdir()
    (d / "a.png").write_bytes(b"x" * 100)
    df = mm.read_binary_assets(spark, str(d)).select("modality", "length")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # payload never read for metadata queries


def test_resize_stub_shrinks_images_only(spark):
    from databox_adls_loader_spark.operators import multimodal as mm
    assets = mm.synthetic_assets(spark, n=12)
    out = mm.resize_stub(assets, max_dim=64).collect()
    for r in out:
        if r["modality"] == "image":
            assert r["resized_bytes"] <= r["orig_bytes"]
            assert len(bytes(r["content"])) == r["resized_bytes"]
        else:
            assert r["resized_bytes"] == r["orig_bytes"]


def test_split_is_deterministic_and_stratified(spark):
    from databox_adls_loader_spark.operators.text import train_val_test_split
    docs = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 4}") for i in range(2000)],
        "doc_id: long, text: string, source: string")
    s1 = {r["doc_id"]: r["split"]
          for r in train_val_test_split(docs).collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in train_val_test_split(docs).collect()}
    assert s1 == s2                                  # reproducible
    from collections import Counter
    c = Counter(s1.values())
    assert 0.05 < c["test"] / 2000 < 0.15            # ~10%
    assert 0.05 < c["val"] / 2000 < 0.15
    # different salt re-rolls assignments
    s3 = {r["doc_id"]: r["split"]
          for r in train_val_test_split(docs, salt="v2").collect()}
    assert s3 != s1


def _tiny_png(width: int = 5, height: int = 3) -> bytes:
    """A minimal valid PNG (grayscale, 8-bit) built with only the stdlib —
    real bytes for the guarded PIL decode path without needing codecs to
    GENERATE the fixture."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes((x * 40 + y) % 256 for x in range(width))
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_decode_asset_stub_fallback_is_deterministic():
    """Without PIL (or with undecodable bytes) decode_asset must hit the
    hash-derived stub — same output every call, n_frames only for video."""
    from databox_adls_loader_spark.operators import multimodal as mm
    payload = b"not-an-image" * 10
    d1 = multimodal.decode_asset(payload, "image")
    d2 = multimodal.decode_asset(payload, "image")
    assert d1 == d2
    assert d1["width"] and d1["height"] and d1["n_frames"] is None
    assert len(d1["feature"]) == 16


def test_decode_asset_real_png():
    """Genuine PNG bytes must REALLY decode in every container: via PIL
    when importable, else via the stdlib zlib+unfilter PNG subset decoder
    — true dimensions either way, never the hash stub."""
    from databox_adls_loader_spark.operators import multimodal as mm
    d = multimodal.decode_asset(_tiny_png(5, 3), "image")
    assert (d["width"], d["height"]) == (5, 3)
    assert len(d["feature"]) == 16
    assert all(0.0 <= v <= 1.0 for v in d["feature"])


def test_decode_png_pure_filters_and_rgb():
    """The pure decoder must unfilter correctly: an RGB image written
    with filter type 2 (Up) reconstructs the same pixels as filter 0."""
    import struct
    import zlib

    from databox_adls_loader_spark.operators import multimodal as mm

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    w, h = 4, 3
    rows = [[((x * 37 + y * 11 + c * 5) % 256 for c in range(3))
             for x in range(w)] for y in range(h)]
    flat = [bytes(b for px in r for b in px) for r in rows]

    def png(scanlines: bytes) -> bytes:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(scanlines))
                + chunk(b"IEND", b""))

    plain = png(b"".join(b"\x00" + r for r in flat))
    # filter 2 (Up): each row stored as delta vs the row above
    up_lines = [b"\x02" + bytes((flat[y][i] - (flat[y - 1][i] if y else 0))
                                & 0xFF for i in range(len(flat[y])))
                for y in range(h)]
    filtered = png(b"".join(up_lines))
    d0 = mm._decode_png_pure(plain)
    d2 = mm._decode_png_pure(filtered)
    assert d0 is not None and d2 is not None
    assert d0 == d2
    assert (d0["width"], d0["height"]) == (w, h)


def test_decode_asset_real_png_through_map_in_pandas(spark):
    """Real PNG bytes through the full mapInPandas stage must report TRUE
    dimensions in every container (PIL or the stdlib decoder) — schema
    and batching identical either way."""
    from databox_adls_loader_spark.operators import multimodal as mm
    png = _tiny_png(5, 3)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png")], multimodal.ASSET_SCHEMA)
    row = multimodal.extract_features(assets).collect()[0]
    assert (row["width"], row["height"]) == (5, 3)
    assert row["n_bytes"] == len(png)


def test_pii_counts_and_scrub(spark):
    from databox_adls_loader_spark.operators.pii import pii_counts, scrub_pii
    docs = spark.createDataFrame([
        (1, "mail me at alice@corp.example.com or bob@x.io thanks"),
        (2, "call +1-555-0199 from 192.168.1.1 today"),
        (3, "clean text, nothing here"),
        (4, "edge: a@b.co +44-123-4567 10.0.0.255"),
    ], "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in scrub_pii(pii_counts(docs)).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (2, 0, 0)
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ipv4"]) == (0, 1, 1)
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0)
    assert (got[4]["n_email"], got[4]["n_phone"], got[4]["n_ipv4"]) == (1, 1, 1)
    assert got[1]["scrubbed"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert got[2]["scrubbed"] == "call <PHONE> from <IP> today"
    assert got[4]["scrubbed"] == "edge: <EMAIL> <PHONE> <IP>"
    assert got[3]["scrubbed"] == got[3]["text"]


def test_gopher_signals_rules(spark):
    from databox_adls_loader_spark.operators.text import gopher_signals
    good = "the quick brown fox jumps over a lazy dog and then " * 10  # >50 words, stopwords, alpha
    short = "too short to pass"
    numeric = " ".join(str(i) for i in range(120)) + " the a of"       # <80% alpha words
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, numeric)], "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in gopher_signals(docs).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["gopher_pass"] is False          # n_words < 50
    assert got[3]["gopher_pass"] is False          # frac_alpha < 0.8
    assert got[1]["n_words"] == 110
    assert got[1]["n_stopwords"] >= 20
    assert 3.0 <= got[1]["mean_word_len"] <= 10.0


def test_chunk_documents_boundaries(spark):
    from databox_adls_loader_spark.operators.text import chunk_documents
    words = [f"w{i}" for i in range(70)]
    docs = spark.createDataFrame([
        (1, " ".join(words)),            # 70 words → 3 chunks (step 24)
        (2, " ".join(words[:32])),       # exactly one chunk
        (3, " ".join(words[:5])),        # short doc → single ragged chunk
    ], "doc_id: long, text: string")
    rows = chunk_documents(docs, chunk_words=32, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c1] == [32, 32, 22]
    # overlap: last 8 words of chunk k == first 8 of chunk k+1
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"].split()[-8:] == b["chunk_text"].split()[:8]
    # full coverage, no word lost
    assert set().union(*[set(r["chunk_text"].split()) for r in c1]) == set(words)
    assert [r["n_tokens"] for r in by_doc[2]] == [32]
    assert [r["n_tokens"] for r in by_doc[3]] == [5]
    assert by_doc[3][0]["chunk_text"] == " ".join(words[:5])


def test_pii_counts_sequential_no_double_count(spark):
    """An IPv4 inside an email's domain must count as email only — counts
    agree with what scrub_pii actually replaces."""
    from databox_adls_loader_spark.operators.pii import pii_counts, scrub_pii
    docs = spark.createDataFrame([(1, "ping a@1.2.3.4.co now")],
                                 "doc_id: long, text: string")
    row = scrub_pii(pii_counts(docs)).collect()[0]
    assert (row["n_email"], row["n_ipv4"]) == (1, 0)
    assert row["scrubbed"] == "ping <EMAIL> now"


def test_audio_window_energy_known_payload(spark):
    from databox_adls_loader_spark.operators.multimodal import (
        ASSET_SCHEMA, audio_window_energy)
    # payload "0001000200030004" = samples 1,2,3,4 → one 4-sample window
    rows = [(1, "audio", bytearray(b"0001000200030004"), "audio/wav"),
            (2, "image", bytearray(b"ffff"), "image/png"),   # filtered out
            (3, "audio", bytearray(b"ffff" * 3), "audio/wav")]  # tail drops
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {(r["asset_id"], r["window_idx"]): r["energy"]
           for r in audio_window_energy(assets, window=4).collect()}
    assert got == {(1, 0): 1 + 4 + 9 + 16}  # asset 3: 3 samples < window


def test_bpe_merges_cascade_and_tiebreak(spark):
    from databox_adls_loader_spark.operators.text import bpe_train_merges
    docs = spark.createDataFrame(
        [("the cat sat on the mat",), ("the bat and the cat",), (None,)],
        "text: string")
    got = [tuple(r) for r in bpe_train_merges(docs, n_merges=3).collect()]
    # merge 3 must see merge 2's re-segmentation: t + he -> the
    assert got == [(1, "a", "t", "at", 5),
                   (2, "h", "e", "he", 4),
                   (3, "t", "he", "the", 4)]


def test_bpe_merge_same_symbol_run_is_greedy_nonoverlapping(spark):
    from databox_adls_loader_spark.operators.text import bpe_train_merges
    # "aaaa": pair stats count overlap-inclusive (3 per word), but the
    # merge applies greedily left-to-right -> [aa, aa], so iteration 2
    # finds (aa, aa) exactly once per word
    docs = spark.createDataFrame([("aaaa aaaa",)], "text: string")
    got = [tuple(r) for r in bpe_train_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", "aa", 6),
                   (2, "aa", "aa", "aaaa", 2)]


def _ref_bpe(word_freqs: dict, n_merges: int):
    """20-line reference BPE (Sennrich 2016 merge rule) for property
    testing: overlap-inclusive pair counts, (count DESC, l, r) winner,
    greedy left-to-right application without re-merge."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
        merges.append((rank, l, r, l + r, cnt))
    return merges


def test_bpe_matches_reference_on_random_corpora(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databox_adls_loader_spark.operators.text import bpe_train_merges

    word = st.text(alphabet="ab", min_size=2, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=12)

    @given(corpus)
    @settings(max_examples=12, deadline=None)
    def check(words):
        freqs = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        want = _ref_bpe(freqs, 3)
        docs = spark.createDataFrame([(" ".join(words),)], "text: string")
        got = [tuple(r) for r in bpe_train_merges(docs, n_merges=3).collect()]
        assert got == want

    check()


def test_bpe_64_merges_matches_reference_and_stays_linear(spark):
    """Realistic merge count (round-5 verdict item #6): 64 merges at
    sf0.1 must (a) exactly match the brute-force reference on the same
    word-frequency relation and (b) cost O(n_merges) — the
    localCheckpoint in `_bpe_loop` keeps the plan one fold deep per
    iteration; without it Catalyst analysis + recompute grow
    quadratically and the 64/16 runtime ratio explodes."""
    import os
    import time

    from databox_adls_loader_spark.operators.text import (
        bpe_train_merges, bpe_word_tokens)

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf01, "documents.parquet"))

    t0 = time.monotonic()
    got16 = [tuple(r) for r in bpe_train_merges(docs, n_merges=16).collect()]
    t16 = time.monotonic() - t0
    t0 = time.monotonic()
    got64 = [tuple(r) for r in bpe_train_merges(docs, n_merges=64).collect()]
    t64 = time.monotonic() - t0

    # (a) exact agreement with the driver-side reference implementation
    freqs = {r["word"]: r["freq"] for r in
             docs.select(F.explode(bpe_word_tokens("text")).alias("word"))
                 .groupBy("word").count()
                 .withColumnRenamed("count", "freq").collect()}
    assert got64 == _ref_bpe(freqs, 64)
    assert got16 == got64[:16]        # prefix-stable: same greedy order

    # (b) linear scaling: 4x the merges must stay well under 4x the time
    # once the shared vocab build amortizes; the quadratic failure mode
    # lands >8x.  Generous bound so host noise can't flake it.
    assert t64 < 60, f"64 merges took {t64:.1f}s (budget 60s)"
    assert t64 < 4 * t16 + 10, \
        f"non-linear scaling: 16 merges {t16:.1f}s vs 64 merges {t64:.1f}s"


def test_bpe_exhaustion_yields_fewer_merges_not_empty_vocab(spark):
    from databox_adls_loader_spark.operators.text import (
        bpe_token_counts, bpe_train_merges)
    docs = spark.createDataFrame([("ab ab",)], "text: string")
    got = [tuple(r) for r in bpe_train_merges(docs, n_merges=3).collect()]
    assert got == [(1, "a", "b", "ab", 2)]   # exhausted after one merge
    counts = bpe_token_counts(
        docs.select(F.lit(0).alias("doc_id"), "text"), n_merges=3).collect()
    assert [tuple(r) for r in counts] == [(0, 2, 2, 4)]  # NOT annihilated
    with pytest.raises(ValueError):
        bpe_train_merges(docs, n_merges=0)


def test_retrieval_eval_invariants_and_known_fixture(spark):
    from databox_adls_loader_spark.operators.text import (
        retrieval_eval, _DCG_DISCOUNT_PPM)

    # 3 relevant docs (contain both terms), 2 distractors with only one
    # term; short texts keep the BM25 ranking stable and irrelevant —
    # the metrics only depend on the rel labels per rank.
    docs = spark.createDataFrame(
        [(1, "spark hash spark"), (2, "spark hash"), (3, "hash spark pad"),
         (4, "spark only here"), (5, "hash alone")],
        "doc_id long, text string")
    rows = retrieval_eval(docs, ["spark", "hash"], k=5) \
        .orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    rels = [r["rel"] for r in rows]
    assert sum(rels) == 3
    # rr fires exactly once, at the first relevant rank
    rr = [r["rr_ppm"] for r in rows]
    first_rel = rels.index(1) + 1
    assert [i for i, v in enumerate(rr) if v] == [first_rel - 1]
    assert rr[first_rel - 1] == 1_000_000 // first_rel
    # cumulative DCG recomputed from the frozen discount table
    want_dcg, seen = [], 0
    for i, rel in enumerate(rels):
        seen += rel * _DCG_DISCOUNT_PPM[i]
        want_dcg.append(seen)
    assert [r["cum_dcg_ppm"] for r in rows] == want_dcg
    # precision/recall at each rank, integer ppm
    n_seen = 0
    for i, r in enumerate(rows):
        n_seen += r["rel"]
        assert r["prec_at_k_ppm"] == n_seen * 1_000_000 // (i + 1)
        assert r["recall_at_k_ppm"] == n_seen * 1_000_000 // 3


def test_rake_keywords_handcomputed(spark):
    from databox_adls_loader_spark.operators.text import rake_keywords

    # tokens: [deep, learning, of, deep, models, and, fast, deep, learning]
    # phrases: "deep learning" x2, "deep models", "fast"
    docs = spark.createDataFrame(
        [(1, "deep learning of deep models"),
         (2, "fast and deep learning")],
        "doc_id long, text string")
    got = {r["phrase"]: (r["n_occ"], r["score_ppm"])
           for r in rake_keywords(docs, k=10).collect()}
    # freq: deep 3, learning 2, models 1, fast 1
    # degree: deep 2+2+2=6, learning 4, models 2, fast 1
    deep, learning = 6 * 10**6 // 3, 4 * 10**6 // 2
    models, fast = 2 * 10**6 // 1, 1 * 10**6 // 1
    assert got["deep learning"] == (2, deep + learning)
    assert got["deep models"] == (1, deep + models)
    assert got["fast"] == (1, fast)


def _tiny_jpeg(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal JPEG marker stream our SOF parser accepts: SOI, an APP0
    segment (skipped), a SOF0 frame header carrying the REAL
    dimensions, EOI.  (No entropy-coded data — only the metadata plane
    is under test.)"""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof_payload = b"\x08" + struct.pack(">HH", height, width) \
        + bytes([channels]) + comp
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) \
        + sof_payload
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_decode_asset_real_jpeg_dimensions():
    d = multimodal.decode_asset(_tiny_jpeg(640, 480), "image")
    assert (d["width"], d["height"]) == (640, 480)
    assert len(d["feature"]) == 16
    # progressive (SOF2) parses too
    j2 = bytearray(_tiny_jpeg(31, 17, channels=1))
    j2[j2.index(b"\xff\xc0") + 1] = 0xC2
    d2 = multimodal._decode_jpeg_pure(bytes(j2))
    assert (d2["width"], d2["height"]) == (31, 17)


def test_decode_jpeg_rejects_malformed():
    assert multimodal._decode_jpeg_pure(b"") is None
    assert multimodal._decode_jpeg_pure(b"\xff\xd8\xff\xd9") is None   # no SOF
    assert multimodal._decode_jpeg_pure(b"\x89PNG\r\n\x1a\n") is None
    trunc = _tiny_jpeg(10, 10)[:8]
    assert multimodal._decode_jpeg_pure(trunc) is None
    # DHT (0xC4) must NOT be mistaken for a frame header
    import struct
    dht = (b"\xff\xd8" + b"\xff\xc4" + struct.pack(">H", 5) + b"abc"
           + b"\xff\xd9")
    assert multimodal._decode_jpeg_pure(dht) is None


def test_mm_real_decode_mixed_png_jpeg(spark):
    """Mixed PNG+JPEG corpus through the Arrow batch path: both formats
    surface REAL dimensions (round-7 verdict item 8)."""
    rows = [(1, "image", bytearray(_tiny_png(5, 3)), "image/png"),
            (2, "image", bytearray(_tiny_jpeg(640, 480)), "image/jpeg"),
            (3, "image", bytearray(b"garbage"), "image/png")]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in
           multimodal.extract_features(assets).collect()}
    assert (got[1]["width"], got[1]["height"]) == (5, 3)
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert got[3]["width"] is not None          # stub fallback engaged


def test_decode_gif_pure_frames_and_malformed():
    """Round-9: the GIF block walk surfaces REAL logical-screen
    dimensions and frame counts; anything outside the contract falls
    through as None."""
    from databox_adls_loader_spark.operators import multimodal
    from databox_adls_loader_spark.plans.queries_round9 import _mk_gif

    d = multimodal._decode_gif_pure(_mk_gif(33, 21, 3))
    assert (d["width"], d["height"], d["n_frames"]) == (33, 21, 3)
    one = multimodal._decode_gif_pure(_mk_gif(5, 4, 1))
    assert one["n_frames"] == 1
    assert len(d["feature"]) == len(one["feature"]) > 0
    assert multimodal._decode_gif_pure(b"") is None
    assert multimodal._decode_gif_pure(b"GIF89a") is None
    assert multimodal._decode_gif_pure(b"NOTGIF" + b"\x00" * 20) is None
    # zero frames (header + trailer only) is not an image
    import struct
    empty = (b"GIF89a" + struct.pack("<HH", 3, 3) + bytes([0, 0, 0])
             + b"\x3b")
    assert multimodal._decode_gif_pure(empty) is None
    # dispatch routes GIF through the real path, not the stub
    via = multimodal.decode_asset(_mk_gif(33, 21, 3), "image")
    assert (via["width"], via["height"], via["n_frames"]) == (33, 21, 3)


def test_decode_bmp_pure_topdown_and_malformed():
    from databox_adls_loader_spark.operators import multimodal
    from databox_adls_loader_spark.plans.queries_round9 import _mk_bmp

    d = multimodal._decode_bmp_pure(_mk_bmp(640, 480))
    assert (d["width"], d["height"], d["n_frames"]) == (640, 480, None)
    # negative (top-down) height surfaces as magnitude
    td = multimodal._decode_bmp_pure(_mk_bmp(64, 48, top_down=True))
    assert (td["width"], td["height"]) == (64, 48)
    assert multimodal._decode_bmp_pure(b"") is None
    assert multimodal._decode_bmp_pure(b"BM" + b"\x00" * 10) is None
    via = multimodal.decode_asset(_mk_bmp(640, 480), "image")
    assert (via["width"], via["height"]) == (640, 480)


def test_decode_wav_pure_and_malformed():
    import struct

    from databox_adls_loader_spark.operators import multimodal
    from databox_adls_loader_spark.plans.queries_round10 import _mk_wav

    d = multimodal._decode_wav_pure(_mk_wav(16000, 2, [0] * 400))
    assert (d["container"], d["sample_rate"], d["n_channels"],
            d["bits_per_sample"], d["n_samples"]) == ("wav", 16000, 2,
                                                      16, 200)
    assert d["duration_ms"] == 200 * 1000 // 16000
    # odd-sized chunk before data: word alignment must carry the walk
    oddsized = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
                + b"fmt " + struct.pack("<I", 16)
                + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                + b"data" + struct.pack("<I", 16) + b"\x00" * 16)
    d2 = multimodal._decode_wav_pure(oddsized)
    assert (d2["sample_rate"], d2["n_samples"]) == (8000, 8)
    assert multimodal._decode_wav_pure(b"") is None
    assert multimodal._decode_wav_pure(b"RIFF\x00\x00\x00\x00NOPE") is None
    # fmt but no data chunk -> None
    nodata = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
              + b"fmt " + struct.pack("<I", 16)
              + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    assert multimodal._decode_wav_pure(nodata) is None


def test_decode_mp4_pure_versions_and_malformed():
    import struct

    from databox_adls_loader_spark.operators import multimodal
    from databox_adls_loader_spark.plans.queries_round10 import _mk_mp4

    v0 = multimodal._decode_mp4_pure(_mk_mp4(1000, 2500, 2))
    assert (v0["container"], v0["timescale"], v0["duration_ms"],
            v0["n_tracks"]) == ("mp4", 1000, 2500, 2)
    v1 = multimodal._decode_mp4_pure(_mk_mp4(600, 1234, 1, v1=True))
    assert (v1["timescale"], v1["duration_ms"]) == (600, 1234 * 1000 // 600)
    # 64-bit box size on moov must walk identically
    raw = _mk_mp4(1000, 2500, 2)
    moov_at = raw.find(b"moov") - 4
    (sz,) = struct.unpack(">I", raw[moov_at:moov_at + 4])
    big = (raw[:moov_at] + struct.pack(">I", 1) + b"moov"
           + struct.pack(">Q", sz + 8) + raw[moov_at + 8:])
    d64 = multimodal._decode_mp4_pure(big)
    assert (d64["timescale"], d64["n_tracks"]) == (1000, 2)
    assert multimodal._decode_mp4_pure(b"") is None
    assert multimodal._decode_mp4_pure(b"\x00" * 32) is None
    # ftyp but no moov -> None
    ftyp_only = struct.pack(">I", 16) + b"ftypisom\x00\x00\x02\x00"
    assert multimodal._decode_mp4_pure(ftyp_only) is None


def test_extract_container_meta_degrades_not_fails(spark):
    from databox_adls_loader_spark.operators import multimodal as mm
    from databox_adls_loader_spark.plans.queries_round10 import (_mk_mp4,
                                                                 _mk_wav)

    rows = [
        (0, "audio", bytearray(_mk_wav(8000, 1, [1, 2, 3, 4])),
         "audio/wav"),
        (1, "audio", bytearray(b"not a wav at all"), "audio/wav"),
        (2, "video", bytearray(_mk_mp4(1000, 3000, 1)), "video/mp4"),
        (3, "video", bytearray(b"\x00garbage"), "video/mp4"),
    ]
    assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
    got = {r["asset_id"]: (r["container"], r["duration_ms"])
           for r in mm.extract_container_meta(assets).collect()}
    assert got[0] == ("wav", 0)      # 4 samples @ 8 kHz -> 0 ms floor
    assert got[1] == (None, None)    # degrade, don't fail the batch
    assert got[2] == ("mp4", 3000)
    assert got[3] == (None, None)


def test_wav_window_energy_real_pcm(spark):
    from databox_adls_loader_spark.operators import multimodal as mm
    from databox_adls_loader_spark.plans.queries_round10 import _mk_wav

    samples = [100, -100, 50, -50, 10, -10, 7, -7,   # window 0
               2000, -2000, 1, 0, 0, 0, 0, 1,        # window 1
               5, 5, 5]                               # incomplete tail
    assets = spark.createDataFrame(
        [(7, "audio", bytearray(_mk_wav(8000, 1, samples)), "audio/wav"),
         (8, "image", bytearray(b"png-ish"), "image/png")],
        mm.ASSET_SCHEMA)
    got = {(r["asset_id"], r["window_idx"]): r["energy"]
           for r in mm.wav_window_energy(assets, window=8).collect()}
    w0 = sum(v * v for v in samples[:8])
    w1 = sum(v * v for v in samples[8:16])
    assert got == {(7, 0): w0, (7, 1): w1}   # tail dropped, image skipped


class TestImagePhash:
    def _assets(self, spark):
        from databox_adls_loader_spark.plans.queries_round11 import \
            _phash_assets
        return _phash_assets(spark)

    def test_planted_pairs_surface_and_invariances_hold(self, spark):
        from databox_adls_loader_spark.operators import multimodal as mm
        from databox_adls_loader_spark.plans.queries_round11 import (
            _mk_gray_png, _phash_pixels)

        codes = mm.phash_codes(self._assets(spark), kind="ahash")
        pairs = {(r["a"], r["b"]): r["hamming"]
                 for r in mm.image_near_dup_pairs(codes, 6).collect()}
        assert pairs[(3, 40)] == 0          # brightness shift: invariant
        assert (7, 41) in pairs             # corner patch: near-dup
        assert pairs[(7, 41)] > 0
        # dHash is ALSO invariant to the uniform shift
        dcodes = {r["asset_id"]: (r["w0"], r["w1"]) for r in
                  mm.phash_codes(self._assets(spark),
                                 kind="dhash").collect()}
        assert dcodes[3] == dcodes[40]
        # words match the driver-side function on raw bytes
        w = mm.image_phash_words(_mk_gray_png(_phash_pixels(3)), "ahash")
        acodes = {r["asset_id"]: (r["w0"], r["w1"])
                  for r in codes.collect()}
        assert acodes[3] == tuple(w)

    def test_undecodable_assets_drop_not_stub(self, spark):
        from databox_adls_loader_spark.operators import multimodal as mm

        rows = [(0, "image", bytearray(b"\x89PNG\r\n\x1a\ntruncated"),
                 "image/png"),
                (1, "image", bytearray(b"not an image at all"),
                 "image/jpeg")]
        assets = spark.createDataFrame(rows, mm.ASSET_SCHEMA)
        got = mm.phash_codes(assets).collect()
        # PIL-less container: both drop; PIL can't open them either
        assert got == []

    def test_phash_words_rejects_unknown_kind_and_tiny_images(self):
        import pytest as _pytest

        from databox_adls_loader_spark.operators import multimodal as mm
        from databox_adls_loader_spark.plans.queries_round11 import \
            _mk_gray_png

        tiny = _mk_gray_png([[1, 2], [3, 4]])        # 2x2 < 8x8 grid
        assert mm.image_phash_words(tiny) is None
        ok = _mk_gray_png([[(x * y) % 200 for x in range(16)]
                           for y in range(16)])
        assert mm.image_phash_words(ok) is not None
        with _pytest.raises(ValueError, match="unknown phash kind"):
            mm.image_phash_words(ok, kind="whash")

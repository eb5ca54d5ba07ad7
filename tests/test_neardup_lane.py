"""Near-dup admission in the incremental corpus lane
(`plans/queries_round12.py`): planted near-dups are blocked at the
banded check, fresh docs land, DROPPED docs still block later
lookalikes (the canonical-universe rule), and a mid-round crash that
left the sig/band tables extended reruns to the identical state (the
``r.id < l.id`` cross-join guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import dedup
from databox_adls_loader_spark.plans import queries_round12 as R12
from databox_adls_loader_spark.sinks import catalog as C
from databox_adls_loader_spark.sinks import versioned as V


def _doc(i: int, toks: list[str]) -> tuple:
    text = " ".join(toks)
    return (i, text, len(text))


def _toks(prefix: str, lo: int, hi: int) -> list[str]:
    return [f"{prefix}{j:03d}" for j in range(lo, hi)]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long")


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, [float(i % 7) / 7.0] * 64) for i in ids],
        "vec_id long, embedding array<double>")


def _dirs(tmp_path):
    return tuple(str(tmp_path / n)
                 for n in ("shards", "tail", "hash", "sig", "bandt",
                           "emb", "idx"))


def _est(spark, rows, a, b) -> float:
    sigs = {r["doc_id"]: list(r["sig"]) for r in dedup.minhash_docs(
        _mk(spark, rows), k=32, shingle_n=3, portable=True).collect()}
    sa, sb = sigs[a], sigs[b]
    return sum(x == y for x, y in zip(sa, sb)) / 32.0


def _shard_ids(spark, cat):
    return {r.id for r in C.read_table(spark, cat, "shards")
            .select("id").distinct().collect()}


def test_plants_blocked_and_fresh_admitted(spark, tmp_path):
    boot = [_doc(i, _toks(f"b{i}x", 0, 40)) for i in range(6)]
    near = _doc(10, _toks("b2x", 0, 40) + ["tail", "tweak"])
    fresh = _doc(11, _toks("fresh", 0, 40))
    exact = (12,) + boot[3][1:]            # exact dup of doc 3
    assert _est(spark, boot + [near], 2, 10) >= 0.5
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R12.nd_bootstrap(spark, dirs, cat, _mk(spark, boot),
                     _emb(spark, range(6)))
    nr, _ = R12.nd_delta_round(
        spark, dirs, cat, _mk(spark, [near, fresh, exact]),
        _emb(spark, range(13)), txn_id="r1", round_seq=1)
    assert nr
    ids = _shard_ids(spark, cat)
    assert 11 in ids and 10 not in ids and 12 not in ids
    # exact layer never saw 12 (md5 dup); near layer recorded 10 in
    # the canonical universe (hash + sig + band tables) but not shards
    hashes = {r.doc_id for r in
              C.read_table(spark, cat, "corpus_hashes").collect()}
    assert 10 in hashes and 12 not in hashes
    sig_ids = {r.doc_id for r in
               C.read_table(spark, cat, "minhash_sigs").collect()}
    band_ids = {r.id for r in
                C.read_table(spark, cat, "minhash_bands")
                .select("id").distinct().collect()}
    assert 10 in sig_ids and 10 in band_ids


def test_dropped_doc_still_blocks_later_lookalike(spark, tmp_path):
    """C is near B (dropped in round 1 for being near A) but NOT near
    A — the canonical-universe rule drops C anyway, because dropped
    docs stay in the sig/band admission tables.  The premises
    (est(B,A) >= τ, est(C,B) >= τ, est(C,A) < τ) are asserted from
    the same deterministic signatures the lane uses."""
    a = _doc(0, _toks("t", 0, 100))
    b = _doc(20, _toks("t", 15, 100) + _toks("u", 0, 15))
    c = _doc(40, _toks("w", 0, 32) + _toks("t", 47, 100)
             + _toks("u", 0, 15))
    rows = [a, b, c]
    assert _est(spark, rows, 0, 20) >= 0.5
    assert _est(spark, rows, 20, 40) >= 0.5
    assert _est(spark, rows, 0, 40) < 0.5
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R12.nd_bootstrap(spark, dirs, cat, _mk(spark, [a]),
                     _emb(spark, [0]))
    R12.nd_delta_round(spark, dirs, cat, _mk(spark, [b]),
                       _emb(spark, [0, 20]), txn_id="r1", round_seq=1)
    R12.nd_delta_round(spark, dirs, cat, _mk(spark, [c]),
                       _emb(spark, [0, 20, 40]), txn_id="r2",
                       round_seq=2)
    assert _shard_ids(spark, cat) == {0}
    assert {r.doc_id for r in
            C.read_table(spark, cat, "minhash_sigs").collect()} == \
        {0, 20, 40}


def test_crash_after_sig_band_landed_reruns_to_identical_state(
        spark, tmp_path, monkeypatch):
    """The scenario the cross-join's ``r.id < l.id`` guard exists for:
    crash AFTER the sig/band appends landed but BEFORE the md5 table
    write.  The rerun's cross-candidates now see the batch's own rows
    on the persisted side — self-pairs must be excluded and same-batch
    pairs must degenerate to the within-batch verdicts, so the
    recomputed drop set (and the final state) is identical to an
    uncrashed run."""
    boot = [_doc(i, _toks(f"b{i}x", 0, 40)) for i in range(6)]
    near = _doc(10, _toks("b2x", 0, 40) + ["tail", "tweak"])
    fresh = _doc(11, _toks("fresh", 0, 40))
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    hash_dir = dirs[2]
    R12.nd_bootstrap(spark, dirs, cat, _mk(spark, boot),
                     _emb(spark, range(6)))

    real_write = V.write_snapshot
    state = {"crashed": False}

    def crash_on_hash_write(df, table_dir, **kw):
        if table_dir == hash_dir and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("simulated crash before the md5 write")
        return real_write(df, table_dir, **kw)

    monkeypatch.setattr(V, "write_snapshot", crash_on_hash_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        R12.nd_delta_round(spark, dirs, cat,
                           _mk(spark, [near, fresh]),
                           _emb(spark, range(12)), txn_id="r1",
                           round_seq=1)
    assert state["crashed"]
    # sig/band landed, md5 didn't — the exact mid-round window
    assert {r.doc_id for r in V.read_version(
        spark, dirs[3]).collect()} >= {10, 11}
    assert 10 not in {r.doc_id for r in V.read_version(
        spark, hash_dir).collect()}
    monkeypatch.setattr(V, "write_snapshot", real_write)
    nr, _ = R12.nd_delta_round(spark, dirs, cat,
                               _mk(spark, [near, fresh]),
                               _emb(spark, range(12)), txn_id="r1",
                               round_seq=1)
    assert nr
    ids = _shard_ids(spark, cat)
    assert 11 in ids and 10 not in ids
    # exactly one sig row per canonical doc — no double-append
    sig_rows = C.read_table(spark, cat, "minhash_sigs").collect()
    assert len(sig_rows) == len({r.doc_id for r in sig_rows}) == 8
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))


def test_stream_twin_replay_is_noop(spark, tmp_path):
    boot = [_doc(i, _toks(f"b{i}x", 0, 40)) for i in range(4)]
    delta = [_doc(8, _toks("b1x", 0, 40) + ["zz", "qq"]),
             _doc(9, _toks("novel", 0, 40))]
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R12.nd_bootstrap(spark, dirs, cat, _mk(spark, boot),
                     _emb(spark, range(4)))
    R12.nd_delta_stream_batch(_mk(spark, delta), 0, dirs, cat,
                              _emb(spark, range(10)))
    v_cat = C.catalog_latest(cat)
    ids = _shard_ids(spark, cat)
    R12.nd_delta_stream_batch(_mk(spark, delta), 0, dirs, cat,
                              _emb(spark, range(10)))
    assert C.catalog_latest(cat) == v_cat
    assert _shard_ids(spark, cat) == ids
    assert 9 in ids and 8 not in ids


def test_crawl_stream_drives_neardup_lane(spark, tmp_path):
    """A real crawl STREAM (versioned-table source) drives the
    near-dup lane through `nd_delta_stream_batch`: after the drain the
    lane equals the batch-driven result — near-dup blocked, fresh doc
    landed, zero drift — and a replayed batch id is a no-op."""
    from databox_adls_loader_spark.sources.vtable_stream import \
        register_vtable_stream

    register_vtable_stream(spark)
    boot = [_doc(i, _toks(f"b{i}x", 0, 40)) for i in range(4)]
    d1 = [_doc(8, _toks("b1x", 0, 40) + ["zz", "qq"]),   # near-dup of 1
          _doc(9, _toks("novel", 0, 40))]
    d2 = [_doc(12, _toks("novel", 0, 40) + ["extra", "pair"]),  # near 9
          _doc(13, _toks("other", 0, 40))]
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    crawl, ck = str(tmp_path / "crawl"), str(tmp_path / "ck")
    emb = _emb(spark, range(14))
    R12.nd_bootstrap(spark, dirs, cat, _mk(spark, boot), emb)
    V.write_snapshot(_mk(spark, d1), crawl)
    V.write_snapshot(_mk(spark, d2), crawl)

    q = (spark.readStream.format("vtable_stream")
         .option("path", crawl).load().writeStream
         .foreachBatch(lambda df, bid: R12.nd_delta_stream_batch(
             df, bid, dirs, cat, emb))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    ids = _shard_ids(spark, cat)
    assert ids == {0, 1, 2, 3, 9, 13}      # 8 near 1; 12 near 9
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))
    v_cat = C.catalog_latest(cat)
    R12.nd_delta_stream_batch(_mk(spark, d1), 0, dirs, cat, emb)
    assert C.catalog_latest(cat) == v_cat
    assert _shard_ids(spark, cat) == ids

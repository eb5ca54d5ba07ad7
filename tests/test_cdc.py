"""CDC apply onto the versioned table (sinks/cdc.py): collapse, upsert
via scoped MERGE, delete via equality tombstones, exactly-once replay
through the phase-scoped batch ledger."""

from __future__ import annotations

import pytest

from databox_adls_loader_spark.sinks import cdc as C
from databox_adls_loader_spark.sinks import versioned as V

SCHEMA = "id: long, s: string, op: string, seq: long"


def _rows(spark, t):
    return {tuple(r) for r in V.read_version(spark, t).collect()}


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_first_batch_creates_table(spark, tmp_path):
    t = str(tmp_path / "t")
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "a", "c", 1), (2, "b", "c", 2)]),
        t, key="id", seq_col="seq")
    assert out["n_upserts"] == 2 and out["n_deletes"] == 0
    assert _rows(spark, t) == {(1, "a"), (2, "b")}


def test_mixed_batch_upserts_and_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1), (2, "b", "c", 1),
                                     (3, "c", "c", 1)]),
                      t, key="id", seq_col="seq")
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "A", "u", 2),      # update
                       (2, None, "d", 2),     # delete
                       (4, "d4", "i", 2)]),   # insert
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 1 and out["n_upserts"] == 2
    assert _rows(spark, t) == {(1, "A"), (3, "c"), (4, "d4")}
    # the delete landed as an equality tombstone, not a rewrite
    assert any(V.table_eq_deletes(t, v)
               for v in V.versions(t))


def test_collapse_latest_change_wins(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1)]),
                      t, key="id", seq_col="seq")
    # out-of-order feed: u@5 then d@3 for key 1 — the update wins
    out = C.apply_cdc_batch(
        _batch(spark, [(1, None, "d", 3), (1, "A5", "u", 5)]),
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 0 and out["n_upserts"] == 1
    assert _rows(spark, t) == {(1, "A5")}
    # same-seq tie: the delete wins (ops sort 'u' < 'd' descending)
    out = C.apply_cdc_batch(
        _batch(spark, [(1, "A7", "u", 7), (1, None, "d", 7)]),
        t, key="id", seq_col="seq")
    assert out["n_deletes"] == 1
    assert _rows(spark, t) == set()


def test_delete_then_reinsert_across_batches(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1)]),
                      t, key="id", seq_col="seq")
    C.apply_cdc_batch(_batch(spark, [(1, None, "d", 2)]),
                      t, key="id", seq_col="seq")
    assert _rows(spark, t) == set()
    # sequence semantics: the re-insert lands in a NEW file, which the
    # earlier tombstone does not apply to
    C.apply_cdc_batch(_batch(spark, [(1, "a2", "i", 3)]),
                      t, key="id", seq_col="seq")
    assert _rows(spark, t) == {(1, "a2")}


def test_replay_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    C.apply_cdc_batch(_batch(spark, [(1, "a", "c", 1), (2, "b", "c", 1)]),
                      t, key="id", seq_col="seq", batch_id=0)
    b1 = _batch(spark, [(1, "A", "u", 2), (2, None, "d", 2)])
    out1 = C.apply_cdc_batch(b1, t, key="id", seq_col="seq", batch_id=1)
    v_after = V.latest_version(t)
    # foreachBatch crash-replay: same batch id, no new commits
    out2 = C.apply_cdc_batch(b1, t, key="id", seq_col="seq", batch_id=1)
    assert out2["skipped"] == ["deletes", "upserts"]
    assert out2["versions"] == []
    assert V.latest_version(t) == v_after
    assert _rows(spark, t) == {(1, "A")}
    assert out1["versions"] and len(out1["versions"]) == 2


def test_no_seq_col_requires_unique_keys(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", "c"), (1, "b", "u")],
                               "id: long, s: string, op: string")
    with pytest.raises(ValueError, match="seq_col"):
        C.apply_cdc_batch(df, t, key="id")
    ok = spark.createDataFrame([(1, "a", "c")],
                               "id: long, s: string, op: string")
    C.apply_cdc_batch(ok, t, key="id")
    assert _rows(spark, t) == {(1, "a")}


def test_unknown_op_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(ValueError, match="unknown op"):
        C.apply_cdc_batch(_batch(spark, [(1, "a", "x", 1)]),
                          t, key="id", seq_col="seq")


def test_foreachbatch_end_to_end(spark, tmp_path):
    """The documented wiring: a file-source stream of CDC rows applied
    through foreachBatch with checkpointed batch ids."""
    import json
    import os

    src = tmp_path / "src"
    src.mkdir()
    t, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    rows = [{"id": 1, "s": "a", "op": "c", "seq": 1},
            {"id": 2, "s": "b", "op": "c", "seq": 1},
            {"id": 1, "s": None, "op": "d", "seq": 2}]
    with open(src / "b0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    stream = (spark.readStream
              .schema("id long, s string, op string, seq long")
              .json(str(src)))
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: C.apply_cdc_batch(
             df, t, key="id", seq_col="seq", batch_id=bid))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _rows(spark, t) == {(2, "b")}
    assert os.path.isdir(t)

"""Image near-dup admission in the incremental corpus lane
(`plans/queries_round13.py`): planted near-dups are blocked at the
banded Hamming check, exact pixel-dups at the anti-join, fresh images
land, DROPPED images keep their code/band rows (the canonical-universe
rule), and a mid-round crash that left the code/band tables extended
reruns to the identical state (the ``r.id < l.id`` cross-join guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.operators import multimodal as mm
from databox_adls_loader_spark.plans import queries_round12 as R12
from databox_adls_loader_spark.plans import queries_round13 as R13
from databox_adls_loader_spark.sinks import catalog as C
from databox_adls_loader_spark.sinks import versioned as V


def _plane(i: int, shift: int = 0) -> list[list[int]]:
    px = R12._jpeg_pixels(i)
    return [[v + shift for v in row] for row in px] if shift else px


def _assets(spark, planes: dict[int, list[list[int]]]):
    rows = [(i, "image", bytearray(R12._mk_gray_jpeg(p)), "image/jpeg")
            for i, p in sorted(planes.items())]
    return spark.createDataFrame(rows, mm.ASSET_SCHEMA)


def _ham(a: tuple[int, int], b: tuple[int, int]) -> int:
    return (bin(a[0] ^ b[0]).count("1")
            + bin(a[1] ^ b[1]).count("1"))


def _dirs(tmp_path):
    return tuple(str(tmp_path / n)
                 for n in ("hash", "code", "band", "adm"))


def _admitted(spark, cat):
    return {r.asset_id for r in
            C.read_table(spark, cat, "image_admitted").collect()}


BOOT = {i: _plane(i) for i in range(6)}
NEAR = _plane(2, shift=5)          # Hamming 0 from image 2 (aHash is
#                                    brightness-shift invariant)
FRESH = _plane(9)                  # Hamming >= 16 from every bootstrap


def _premises():
    codes = {i: mm.image_phash_words(R12._mk_gray_jpeg(p), "ahash")
             for i, p in BOOT.items()}
    near = mm.image_phash_words(R12._mk_gray_jpeg(NEAR), "ahash")
    fresh = mm.image_phash_words(R12._mk_gray_jpeg(FRESH), "ahash")
    assert _ham(near, codes[2]) == 0
    assert min(_ham(fresh, c) for c in codes.values()) > 6


def test_plants_blocked_and_fresh_admitted(spark, tmp_path):
    _premises()
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R13.ndi_bootstrap(spark, dirs, cat, _assets(spark, BOOT))
    # delta: near-dup of 2, a fresh plane, and an exact pixel dup of 3
    R13.ndi_delta_round(
        spark, dirs, cat,
        _assets(spark, {10: NEAR, 11: FRESH, 12: _plane(3)}),
        txn_id="r1", round_seq=1)
    ids = _admitted(spark, cat)
    assert 11 in ids and 10 not in ids and 12 not in ids
    # exact layer never saw 12 (pixel-hash dup); near layer recorded 10
    # in the canonical universe (hash + code + band tables) but not in
    # the admitted set — it keeps blocking later lookalikes
    hashes = {r.asset_id for r in
              C.read_table(spark, cat, "image_hashes").collect()}
    assert 10 in hashes and 12 not in hashes
    code_ids = {r.asset_id for r in
                C.read_table(spark, cat, "image_codes").collect()}
    band_ids = {r.id for r in
                C.read_table(spark, cat, "image_bands")
                .select("id").distinct().collect()}
    assert 10 in code_ids and 10 in band_ids


def test_dropped_image_still_blocks_later_lookalike(spark, tmp_path):
    """A near-dup admitted-round image B is dropped for being near A;
    a LATER crawl's C (another shift of the same plane) must be
    blocked too — which requires B's code/band rows to have persisted
    despite B never being admitted."""
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R13.ndi_bootstrap(spark, dirs, cat, _assets(spark, {0: _plane(2)}))
    R13.ndi_delta_round(spark, dirs, cat,
                        _assets(spark, {20: _plane(2, 5)}),
                        txn_id="r1", round_seq=1)
    R13.ndi_delta_round(spark, dirs, cat,
                        _assets(spark, {40: _plane(2, 10)}),
                        txn_id="r2", round_seq=2)
    assert _admitted(spark, cat) == {0}
    assert {r.asset_id for r in
            C.read_table(spark, cat, "image_codes").collect()} == \
        {0, 20, 40}


def test_crash_after_code_band_landed_reruns_to_identical_state(
        spark, tmp_path, monkeypatch):
    """Crash AFTER the code/band appends landed but BEFORE the
    pixel-hash write: the rerun's cross-candidates see the batch's own
    rows on the persisted side — the ``r.id < l.id`` guard reduces
    them back to the within-batch verdicts, so the final state is
    identical to an uncrashed run and no code row double-appends."""
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    hash_dir = dirs[0]
    R13.ndi_bootstrap(spark, dirs, cat, _assets(spark, BOOT))

    real_write = V.write_snapshot
    state = {"crashed": False}

    def crash_on_hash_write(df, table_dir, **kw):
        if table_dir == hash_dir and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("simulated crash before the hash write")
        return real_write(df, table_dir, **kw)

    monkeypatch.setattr(V, "write_snapshot", crash_on_hash_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        R13.ndi_delta_round(spark, dirs, cat,
                            _assets(spark, {10: NEAR, 11: FRESH}),
                            txn_id="r1", round_seq=1)
    assert state["crashed"]
    # code/band landed, pixel-hash didn't — the exact mid-round window
    assert {r.asset_id for r in V.read_version(
        spark, dirs[1]).collect()} >= {10, 11}
    assert 10 not in {r.asset_id for r in V.read_version(
        spark, hash_dir).collect()}
    monkeypatch.setattr(V, "write_snapshot", real_write)
    R13.ndi_delta_round(spark, dirs, cat,
                        _assets(spark, {10: NEAR, 11: FRESH}),
                        txn_id="r1", round_seq=1)
    ids = _admitted(spark, cat)
    assert 11 in ids and 10 not in ids
    code_rows = C.read_table(spark, cat, "image_codes").collect()
    assert len(code_rows) == len({r.asset_id for r in code_rows}) == 8
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))


def test_stream_twin_replay_is_noop(spark, tmp_path):
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    R13.ndi_bootstrap(spark, dirs, cat, _assets(spark, BOOT))
    delta = _assets(spark, {10: NEAR, 11: FRESH})
    R13.ndi_delta_stream_batch(delta, 0, dirs, cat)
    v_cat = C.catalog_latest(cat)
    ids = _admitted(spark, cat)
    R13.ndi_delta_stream_batch(delta, 0, dirs, cat)
    assert C.catalog_latest(cat) == v_cat
    assert _admitted(spark, cat) == ids
    assert 11 in ids and 10 not in ids


def test_crawl_stream_drives_image_lane(spark, tmp_path):
    """A multimodal crawl STREAM (versioned-table source) drives the
    image lane through `ndi_delta_stream_batch`: after the drain the
    lane equals the batch-driven result — near-dup blocked, fresh
    image landed, zero drift — and a replayed batch id is a no-op."""
    from databox_adls_loader_spark.sources.vtable_stream import \
        register_vtable_stream

    register_vtable_stream(spark)
    dirs, cat = _dirs(tmp_path), str(tmp_path / "cat")
    crawl, ck = str(tmp_path / "crawl"), str(tmp_path / "ck")
    R13.ndi_bootstrap(spark, dirs, cat, _assets(spark, BOOT))
    d1 = _assets(spark, {10: NEAR, 11: FRESH})
    d2 = _assets(spark, {12: _plane(9, 5),    # near 11 (shift of 9)
                         13: _plane(27)})     # fresh (ham > 6 to all)
    V.write_snapshot(d1, crawl)
    V.write_snapshot(d2, crawl)

    q = (spark.readStream.format("vtable_stream")
         .option("path", crawl).load().writeStream
         .foreachBatch(lambda df, bid: R13.ndi_delta_stream_batch(
             df, bid, dirs, cat))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    ids = _admitted(spark, cat)
    assert 11 in ids and 13 in ids
    assert 10 not in ids and 12 not in ids
    assert all(s["drift"] == 0 for s in C.catalog_status(cat))
    v_cat = C.catalog_latest(cat)
    R13.ndi_delta_stream_batch(d1, 0, dirs, cat)
    assert C.catalog_latest(cat) == v_cat
    assert _admitted(spark, cat) == ids

"""Multi-table transactional catalog (`sinks/catalog.py`).

Covers the cross-table atomicity contract: one catalog commit pins
every named table's version together; a crash between a table commit
and the catalog commit leaves catalog readers on the old consistent
pair; disjoint concurrent transactions rebase, overlapping ones raise;
the txn ledger makes crash-replays no-ops; and table-level vacuum keeps
catalog-pinned versions alive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databox_adls_loader_spark.sinks import catalog as C
from databox_adls_loader_spark.sinks import versioned as V
from databox_adls_loader_spark.sinks.versioned import ConcurrentCommitError


def _mk(spark, tmp_path, name, rows):
    d = str(tmp_path / name)
    V.write_snapshot(spark.createDataFrame(rows, "k int, v int"), d)
    return d


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


class TestBasics:
    def test_register_and_read_through_catalog(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        fact = _mk(spark, tmp_path, "fact", [(1, 10), (2, 20)])
        v = C.commit_txn(cat, {"fact": (fact, None)})
        assert v == 0
        assert _rows(C.read_table(spark, cat, "fact")) == [(1, 10), (2, 20)]
        assert C.catalog_tables(cat)["fact"]["version"] == \
            V.latest_version(fact)

    def test_unknown_table_raises(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        fact = _mk(spark, tmp_path, "fact", [(1, 10)])
        C.commit_txn(cat, {"fact": (fact, None)})
        with pytest.raises(KeyError):
            C.read_table(spark, cat, "nope")

    def test_pin_explicit_version_and_unretained_refused(
            self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        fact = _mk(spark, tmp_path, "fact", [(1, 10)])
        v1 = V.write_snapshot(
            spark.createDataFrame([(2, 20)], "k int, v int"), fact)
        C.commit_txn(cat, {"fact": (fact, v1 - 1)})
        assert _rows(C.read_table(spark, cat, "fact")) == [(1, 10)]
        with pytest.raises(ValueError, match="not retained"):
            C.commit_txn(cat, {"fact": (fact, 99)})


class TestAtomicity:
    def _pair(self, spark, tmp_path):
        """fact + derived (sum of v per k parity) registered in one txn."""
        cat = str(tmp_path / "cat")
        fact = _mk(spark, tmp_path, "fact",
                   [(k, 10 * k) for k in range(1, 7)])

        def derived_of(version):
            return (V.read_version(spark, fact, version)
                    .groupBy((F.col("k") % 2).cast("int").alias("k"))
                    .agg(F.sum("v").cast("int").alias("v")))

        der = str(tmp_path / "derived")

        def build():
            return V.write_snapshot(derived_of(V.latest_version(fact)),
                                    der, mode="overwrite")

        C.commit_txn(cat, {"fact": (fact, None), "derived": (der, build)})
        return cat, fact, der, derived_of

    def test_txn_pins_both_and_time_travel_sees_old_pair(
            self, spark, tmp_path):
        cat, fact, der, derived_of = self._pair(spark, tmp_path)
        v_cat0 = C.catalog_latest(cat)

        def mutate():
            V.delete_where_keys(spark, fact, "k", [1, 2])
            return V.latest_version(fact)

        def rebuild():
            return V.write_snapshot(
                derived_of(V.latest_version(fact)), der, mode="overwrite")

        C.commit_txn(cat, {"fact": (fact, mutate), "derived": (der, rebuild)})
        # new snapshot: both sides agree on the post-delete state
        live = _rows(C.read_table(spark, cat, "fact")
                     .groupBy((F.col("k") % 2).cast("int").alias("k"))
                     .agg(F.sum("v").cast("int").alias("v")))
        assert live == _rows(C.read_table(spark, cat, "derived"))
        # time travel: the OLD catalog version still yields the OLD pair
        old_fact = _rows(C.read_table(spark, cat, "fact",
                                      catalog_version=v_cat0)
                         .groupBy((F.col("k") % 2).cast("int").alias("k"))
                         .agg(F.sum("v").cast("int").alias("v")))
        assert old_fact == _rows(C.read_table(spark, cat, "derived",
                                              catalog_version=v_cat0))
        assert old_fact != live

    def test_crash_between_phases_is_invisible_through_catalog(
            self, spark, tmp_path):
        cat, fact, der, derived_of = self._pair(spark, tmp_path)
        before = _rows(C.read_table(spark, cat, "fact"))
        # phase-1 lands, phase-2 (catalog commit) never does
        V.write_snapshot(spark.createDataFrame([(99, 999)], "k int, v int"),
                         fact)
        assert _rows(C.read_table(spark, cat, "fact")) == before
        drift = {s["name"]: s["drift"] for s in C.catalog_status(cat)}
        assert drift == {"fact": 1, "derived": 0}
        # the next successful txn publishes past the orphan
        C.commit_txn(cat, {"fact": (fact, None)})
        assert (99, 999) in _rows(C.read_table(spark, cat, "fact"))

    def test_history_reports_changed_tables(self, spark, tmp_path):
        cat, fact, der, _ = self._pair(spark, tmp_path)
        V.write_snapshot(spark.createDataFrame([(9, 90)], "k int, v int"),
                         fact)
        C.commit_txn(cat, {"fact": (fact, None)}, txn_id="t2")
        h = C.catalog_history(cat)
        assert [e["changed"] for e in h] == [["derived", "fact"], ["fact"]]
        assert h[-1]["txn_id"] == "t2"


class TestConcurrencyAndReplay:
    def test_disjoint_interleave_rebases(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        b = _mk(spark, tmp_path, "b", [(2, 2)])
        C.commit_txn(cat, {"a": (a, None), "b": (b, None)})

        def op():
            # an interleaved writer publishes a new pin for `b` AFTER
            # our phase 1 ran but BEFORE our catalog commit
            V.write_snapshot(spark.createDataFrame([(3, 3)],
                                                   "k int, v int"), b)
            C.commit_txn(cat, {"b": (b, None)})
            return V.write_snapshot(
                spark.createDataFrame([(4, 4)], "k int, v int"), a)

        v = C.commit_txn(cat, {"a": (a, op)})
        assert v == C.catalog_latest(cat)
        tabs = C.catalog_tables(cat)
        # both the winner's pin and ours survive
        assert tabs["b"]["version"] == V.latest_version(b)
        assert tabs["a"]["version"] == V.latest_version(a)

    def test_overlapping_interleave_raises(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        C.commit_txn(cat, {"a": (a, None)})

        def op():
            V.write_snapshot(spark.createDataFrame([(5, 5)],
                                                   "k int, v int"), a)
            C.commit_txn(cat, {"a": (a, None)})   # interleaved SAME table
            return V.write_snapshot(
                spark.createDataFrame([(6, 6)], "k int, v int"), a)

        with pytest.raises(ConcurrentCommitError, match="re-run"):
            C.commit_txn(cat, {"a": (a, op)})

    def test_txn_id_replay_is_a_noop_and_runs_no_ops(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        calls = []

        def op():
            calls.append(1)
            return V.write_snapshot(
                spark.createDataFrame([(7, 7)], "k int, v int"), a)

        assert C.commit_txn(cat, {"a": (a, op)}, txn_id="tx-7") == 0
        assert C.commit_txn(cat, {"a": (a, op)}, txn_id="tx-7") is None
        assert calls == [1]
        # the ledger is carried forward by later commits
        C.commit_txn(cat, {"a": (a, None)}, txn_id="tx-8")
        assert C.catalog_txn_ids(cat) == {"tx-7", "tx-8"}
        assert C.commit_txn(cat, {"a": (a, op)}, txn_id="tx-7") is None


class TestVacuumComposition:
    def test_vacuum_table_keeps_catalog_pinned_versions(
            self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        t = _mk(spark, tmp_path, "t", [(1, 1)])
        C.commit_txn(cat, {"t": (t, None)})          # pins v1
        v_cat0 = C.catalog_latest(cat)
        for i in range(2, 6):
            V.write_snapshot(spark.createDataFrame([(i, i)],
                                                   "k int, v int"), t)
        C.commit_txn(cat, {"t": (t, None)})          # pins v5
        # keep_versions=1 would normally drop v1..v4; the catalog pin
        # on v1 must survive
        C.vacuum_table(cat, "t", keep_versions=1)
        assert _rows(C.read_table(spark, cat, "t",
                                  catalog_version=v_cat0)) == [(1, 1)]
        assert 1 in V.versions(t) and 5 in V.versions(t)
        assert {2, 3, 4} & set(V.versions(t)) == set()
        # shrinking the catalog releases the pin
        assert C.vacuum_catalog(cat, keep_versions=1) == 1
        C.vacuum_table(cat, "t", keep_versions=1)
        assert V.versions(t) == [5]

    def test_vacuum_catalog_always_keeps_latest(self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        t = _mk(spark, tmp_path, "t", [(1, 1)])
        C.commit_txn(cat, {"t": (t, None)}, txn_id="keepme")
        # keep_versions=0 must NOT brick the catalog or wipe the ledger
        assert C.vacuum_catalog(cat, keep_versions=0) == 0
        assert C.catalog_latest(cat) == 0
        assert C.catalog_txn_ids(cat) == {"keepme"}
        assert _rows(C.read_table(spark, cat, "t")) == [(1, 1)]

    def test_plain_vacuum_pin_versions_param(self, spark, tmp_path):
        t = _mk(spark, tmp_path, "t", [(1, 1)])
        for i in range(2, 5):
            V.write_snapshot(spark.createDataFrame([(i, i)],
                                                   "k int, v int"), t)
        V.vacuum(t, keep_versions=1, pin_versions={2})
        assert set(V.versions(t)) == {2, 4}
        assert _rows(V.read_version(spark, t, 2)) == [(1, 1), (2, 2)]


class TestModelBased:
    def test_random_pin_sequences_match_model(self, spark, tmp_path):
        """Model-based check of the catalog manifest logic: against two
        pre-versioned tables, every random sequence of single- and
        multi-table pin transactions must leave `catalog_tables` at
        EVERY catalog version equal to a plain-dict replay, and
        `catalog_history`'s changed-sets must match the model's diffs.
        (Spark only builds the version stock up front — the loop itself
        is manifest-plane.)"""
        from hypothesis import given, settings, strategies as st

        dirs = {}
        for name in ("a", "b"):
            d = str(tmp_path / name)
            for i in range(4):
                V.write_snapshot(
                    spark.createDataFrame([(i,)], "k int"), d)
            dirs[name] = d
        case = [0]

        @settings(max_examples=25, deadline=None)
        @given(st.lists(
            st.tuples(st.sampled_from(["a", "b", "ab"]),
                      st.integers(min_value=1, max_value=4),
                      st.integers(min_value=1, max_value=4)),
            min_size=1, max_size=6))
        def run(steps):
            case[0] += 1
            cat = str(tmp_path / f"cat{case[0]}")
            model_hist = []
            model = {}
            for which, va, vb in steps:
                ops = {}
                if "a" in which:
                    ops["a"] = (dirs["a"], va)
                if "b" in which:
                    ops["b"] = (dirs["b"], vb)
                C.commit_txn(cat, ops)
                model = {**model,
                         **{n: {"path": dirs[n],
                                "version": va if n == "a" else vb}
                            for n in ops}}
                model_hist.append(dict(model))
            assert C.catalog_latest(cat) == len(steps) - 1
            for v, expect in enumerate(model_hist):
                assert C.catalog_tables(cat, v) == expect, v
            hist = C.catalog_history(cat)
            prev = {}
            for e, expect in zip(hist, model_hist):
                assert e["tables"] == {n: t["version"]
                                       for n, t in expect.items()}
                assert e["changed"] == sorted(
                    n for n in expect if prev.get(n) != expect[n])
                prev = expect

        run()


class TestStreamingPublish:
    def test_stream_batches_publish_atomically_and_replay_safely(
            self, spark, tmp_path):
        """`publish_stream_batch`: each batch lands in the table AND is
        pinned by the catalog; a replay of a fully-published batch is a
        double no-op; a crash BETWEEN phases (table landed, pin missed)
        is completed by the rerun — the drift window closes without a
        double table commit."""
        t = str(tmp_path / "t")
        cat = str(tmp_path / "cat")

        def batch(i):
            return spark.createDataFrame([(i, i * 10)], "k int, v int")

        # batch 0 and 1 publish normally
        assert C.publish_stream_batch(batch(0), 0, cat, "ev", t) == 0
        assert C.publish_stream_batch(batch(1), 1, cat, "ev", t) == 1
        assert _rows(C.read_table(spark, cat, "ev")) == [(0, 0), (1, 10)]
        # full replay of batch 1: table no-op + catalog no-op
        n_tab = len(V.versions(t))
        assert C.publish_stream_batch(batch(1), 1, cat, "ev", t) is None
        assert len(V.versions(t)) == n_tab
        assert _rows(C.read_table(spark, cat, "ev")) == [(0, 0), (1, 10)]
        # crash window: batch 2's TABLE commit lands, the pin does not
        from databox_adls_loader_spark.sinks.versioned import \
            commit_stream_batch
        commit_stream_batch(batch(2), 2, t)
        assert _rows(C.read_table(spark, cat, "ev")) == [(0, 0), (1, 10)]
        assert C.catalog_status(cat)[0]["drift"] == 1
        # the rerun completes ONLY the missing pin
        v = C.publish_stream_batch(batch(2), 2, cat, "ev", t)
        assert v == 2 and len(V.versions(t)) == n_tab + 1
        assert _rows(C.read_table(spark, cat, "ev")) == \
            [(0, 0), (1, 10), (2, 20)]
        assert C.catalog_status(cat)[0]["drift"] == 0

    def test_live_stream_through_catalog(self, spark, tmp_path):
        """A real rate-limited memory stream published through
        foreachBatch: afterwards the catalog-read table equals the
        table-log read (no unpublished tail), one catalog version per
        non-empty batch."""
        t = str(tmp_path / "t")
        cat = str(tmp_path / "cat")
        src = (spark.readStream.format("rate")
               .option("rowsPerSecond", "50").load()
               .selectExpr("CAST(value AS INT) AS k",
                           "CAST(value * 10 AS INT) AS v"))
        q = (src.writeStream
             .foreachBatch(lambda df, bid: C.publish_stream_batch(
                 df, bid, cat, "ev", t))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = _rows(C.read_table(spark, cat, "ev"))
        assert got == _rows(V.read_version(spark, t))
        assert C.catalog_status(cat)[0]["drift"] == 0


class TestRound11Hardening:
    def test_vacuum_preserves_txn_replay_protection(self, spark, tmp_path):
        """Dropping a txn's manifest must NOT re-open the double-apply
        window: vacuum_catalog persists dropped manifests' txn_ids into
        the side ledger, so a crash-replayed commit_txn stays a no-op
        (and runs none of its phase-1 table mutations)."""
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        C.commit_txn(cat, {"a": (a, None)}, txn_id="tx-old")
        for i in range(2, 6):
            C.commit_txn(cat, {"a": (a, None)}, txn_id=f"tx-{i}")
        # keep only the 2 newest manifests — tx-old's manifest is gone
        assert C.vacuum_catalog(cat, keep_versions=2) == 3
        assert "tx-old" in C.catalog_txn_ids(cat)
        ran = []

        def op():
            ran.append(1)
            return V.write_snapshot(
                spark.createDataFrame([(9, 9)], "k int, v int"), a)

        assert C.commit_txn(cat, {"a": (a, op)}, txn_id="tx-old") is None
        assert ran == []                       # phase 1 never ran

    def test_aba_repin_is_detected_as_overlap(self, spark, tmp_path):
        """A-B-A: while our txn is in flight, a concurrent txn re-pins
        one of OUR tables and a later txn pins it BACK to the identical
        {path, version} entry.  Entry equality would wave it through;
        the history walk must raise ConcurrentCommitError."""
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        b = _mk(spark, tmp_path, "b", [(2, 2)])
        v_a1 = V.write_snapshot(
            spark.createDataFrame([(3, 3)], "k int, v int"), a)
        C.commit_txn(cat, {"a": (a, v_a1 - 1), "b": (b, None)})

        def op():
            # concurrent writer: pin a -> v1, then a third txn pins a
            # BACK to v0 — the final entry equals our snapshot's
            C.commit_txn(cat, {"a": (a, v_a1)})
            C.commit_txn(cat, {"a": (a, v_a1 - 1)})
            return None

        with pytest.raises(ConcurrentCommitError):
            C.commit_txn(cat, {"a": (a, op)})

    def test_read_vacuumed_catalog_version_raises_descriptive(
            self, spark, tmp_path):
        cat = str(tmp_path / "cat")
        t = _mk(spark, tmp_path, "t", [(1, 1)])
        C.commit_txn(cat, {"t": (t, None)})
        for i in range(2, 5):
            V.write_snapshot(spark.createDataFrame([(i, i)],
                                                   "k int, v int"), t)
            C.commit_txn(cat, {"t": (t, None)})
        C.vacuum_catalog(cat, keep_versions=1)
        with pytest.raises(KeyError, match="not retained"):
            C.read_table(spark, cat, "t", catalog_version=0)
        with pytest.raises(KeyError, match="not retained"):
            C.catalog_tables(cat, version=0)


class TestLedgerConcurrency:
    def test_sequential_vacuums_union_ledger_ids(self, spark, tmp_path):
        """Two vacuums dropping DIFFERENT manifests must both land
        their txn_ids in the side ledger (generation chain unions, no
        last-writer-wins)."""
        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        for i in range(6):
            C.commit_txn(cat, {"a": (a, None)}, txn_id=f"tx-{i}")
        assert C.vacuum_catalog(cat, keep_versions=4) == 2   # tx-0, tx-1
        assert C.vacuum_catalog(cat, keep_versions=2) == 2   # tx-2, tx-3
        assert {f"tx-{i}" for i in range(6)} <= C.catalog_txn_ids(cat)

    def test_ledger_append_survives_racing_writer(
            self, spark, tmp_path, monkeypatch):
        """The round-11 ADVICE race: writer A reads ledger state, then
        writer B lands a generation BEFORE A's create — A's
        exclusive-create must lose the slot, re-read (now seeing B's
        ids), and retry, so neither writer's ids are overwritten."""
        import json

        from databox_adls_loader_spark.sinks.storage import (LocalStorage,
                                                             storage_for)

        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        C.commit_txn(cat, {"a": (a, None)}, txn_id="tx-0")
        st = storage_for(cat)
        orig = LocalStorage.create_exclusive
        state = {"injected": False}

        def racing(self, path, text):
            if not state["injected"] and "_txns-g" in path:
                state["injected"] = True
                orig(self, C._ledger_gen_path(st, cat, 1),
                     json.dumps({"txn_ids": ["b-id"]}))
            return orig(self, path, text)

        monkeypatch.setattr(LocalStorage, "create_exclusive", racing)
        C._ledger_append(cat, {"a-id"})
        assert {"a-id", "b-id"} <= C._ledger_txn_ids(cat)
        # B's file landed AFTER A's listing, so A neither folded nor
        # deleted it — both files are retained and the union is whole;
        # the NEXT fold compacts the pair into one generation file
        monkeypatch.setattr(LocalStorage, "create_exclusive", orig)
        C._ledger_append(cat, {"c-id"})
        assert {"a-id", "b-id", "c-id"} <= C._ledger_txn_ids(cat)
        assert len(C._ledger_files(st, cat)) == 1

    def test_legacy_single_file_ledger_still_read(self, spark, tmp_path):
        import json

        from databox_adls_loader_spark.sinks.storage import storage_for

        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        C.commit_txn(cat, {"a": (a, None)}, txn_id="tx-0")
        st = storage_for(cat)
        st.replace_text(C._ledger_path(st, cat),
                        json.dumps({"txn_ids": ["legacy-id"]}))
        C._ledger_append(cat, {"new-id"})
        assert {"legacy-id", "new-id"} <= C._ledger_txn_ids(cat)

    def test_vacuum_skips_manifest_deleted_by_concurrent_vacuum(
            self, spark, tmp_path):
        """A manifest deleted between our listing and our read (the
        other vacuum got there first) is SKIPPED, not a KeyError that
        aborts the whole vacuum before any reclaim (round-11 ADVICE)."""
        from databox_adls_loader_spark.sinks.storage import storage_for

        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        for i in range(5):
            C.commit_txn(cat, {"a": (a, None)}, txn_id=f"tx-{i}")
        st = storage_for(cat)
        # simulate the concurrent vacuum: it persisted tx-0's id to the
        # ledger, then deleted v0 — exactly vacuum_catalog's own order
        C._ledger_append(cat, {"tx-0"})
        st.delete(C._cpath(st, cat, 0))
        assert C.vacuum_catalog(cat, keep_versions=2) == 2  # v1, v2
        assert {"tx-0", "tx-1", "tx-2"} <= C.catalog_txn_ids(cat)


class TestLedgerTorture:
    """Round-12 verdict #7: a thread-pool torture of the
    exclusive-create generation chain — N concurrent writers, each
    appending several disjoint id sets, must ALL land (the union
    invariant: every id appears in the final chain, no
    last-writer-wins loss) and leave a single live generation carrying
    the full union."""

    def test_concurrent_ledger_appends_union(self, tmp_path):
        import os
        from concurrent.futures import ThreadPoolExecutor

        from databox_adls_loader_spark.sinks.catalog import (
            _cmdir, _ledger_append, _ledger_gens, _ledger_txn_ids)
        from databox_adls_loader_spark.sinks.storage import storage_for

        cat = str(tmp_path / "cat")
        os.makedirs(_cmdir(storage_for(cat), cat), exist_ok=True)
        n_writers, n_rounds = 8, 5

        def writer(wid: int) -> None:
            for r in range(n_rounds):
                _ledger_append(cat, {f"w{wid}-r{r}-{j}"
                                     for j in range(3)})

        with ThreadPoolExecutor(max_workers=n_writers) as ex:
            list(ex.map(writer, range(n_writers)))
        got = _ledger_txn_ids(cat)
        want = {f"w{w}-r{r}-{j}" for w in range(n_writers)
                for r in range(n_rounds) for j in range(3)}
        assert want <= got, sorted(want - got)[:5]
        # one more (uncontended) fold compacts the retained files into
        # a single generation still carrying the full union
        from databox_adls_loader_spark.sinks.catalog import \
            _ledger_files
        _ledger_append(cat, {"final"})
        st = storage_for(cat)
        assert len(_ledger_files(st, cat)) == 1
        assert want | {"final"} <= _ledger_txn_ids(cat)

    def test_concurrent_vacuums_and_commits(self, spark, tmp_path):
        """End-to-end: 8 threads interleave catalog vacuums (dropping
        different manifest windows) while the main thread keeps
        committing — afterwards every dropped txn id is still replay-
        protected through `catalog_txn_ids`."""
        from concurrent.futures import ThreadPoolExecutor

        cat = str(tmp_path / "cat")
        a = _mk(spark, tmp_path, "a", [(1, 1)])
        for i in range(20):
            C.commit_txn(cat, {"a": (a, None)}, txn_id=f"tx-{i}")

        def vac(keep: int) -> int:
            return C.vacuum_catalog(cat, keep_versions=keep)

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(vac, [16, 14, 12, 10, 8, 6, 4, 2]))
        assert {f"tx-{i}" for i in range(20)} <= C.catalog_txn_ids(cat)
        # and a replayed dropped txn is still a no-op
        v = C.catalog_latest(cat)
        C.commit_txn(cat, {"a": (a, None)}, txn_id="tx-0")
        assert C.catalog_latest(cat) == v

"""Training sequence packing: pack tokenized documents into
fixed-length context windows (the last step of the pretraining corpus
lane — clean → decontaminate → mix → curriculum → PACK → batch).

Reference boundary: the reference's bin-pack
(/root/reference/generate-file-list.py:27-43, `operators/packing.py`)
is the same algorithm one level up — directories into Data Box units.
Here the items are (pieces of) documents, the bins are model context
windows, and the constraint is STRICT (a window never exceeds
``window`` tokens; an attention mask cannot overflow), which rules out
the cumsum-floor next-fit relaxation (`pack_next_fit_window`) — a doc
straddling a boundary would overfill its window.

Scale design (100 TB): documents salt deterministically into
``n_groups`` independent groups (``id % n_groups`` — reproducible,
oracle-expressible; no global sort, no driver collect); each group
packs sequentially with NEXT-FIT in (id, piece) order inside one
`applyInPandas` task — the loop is per-group Python over int arrays,
~1M docs/s/core, and groups pack in parallel across executors.  Waste
vs a global first-fit-decreasing is bounded by next-fit's 2× worst
case but in practice a few % at realistic window/doc-size ratios (the
`packing_report` measures it); what matters at scale is that NO stage
shuffles more than (id, tokens) pairs and nothing is sequential across
groups.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# isolated (oversize, allow_split=False) docs get NEGATIVE window ids
# -1, -2, ... per group in id order, so they never collide with the
# packed windows 1, 2, ... and a consumer can route them explicitly.

_PACK_SCHEMA = T.StructType([
    T.StructField("g", T.IntegerType()),
    T.StructField("id", T.LongType()),
    T.StructField("piece", T.IntegerType()),
    T.StructField("piece_tokens", T.LongType()),
    T.StructField("win", T.LongType()),
    T.StructField("offset", T.LongType()),
])


def _next_fit_group(window: int, order: str = "id"):
    """Per-group next-fit — the sequential loop an exact pack needs,
    bounded to ONE salt group per task.  ``order="id"`` packs in
    (id, piece) arrival order; ``order="tokens"`` packs shortest-first
    (token count, then id) — the length-curriculum order, which is
    also next-fit-increasing, so windows fill tighter than arrival
    order (first-fit-decreasing's cousin; `packing_report` measures
    the gain)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = (["piece_tokens", "id", "piece"] if order == "tokens"
                else ["id", "piece"])
        pdf = pdf.sort_values(cols, kind="mergesort")
        ids = pdf["id"].to_numpy()
        pieces = pdf["piece"].to_numpy()
        toks = pdf["piece_tokens"].to_numpy()
        g = int(pdf["g"].iloc[0])
        win, fill = 1, 0
        wins, offs = [], []
        for t in toks:
            t = int(t)
            if fill + t > window and fill > 0:
                win += 1
                fill = 0
            wins.append(win)
            offs.append(fill)
            fill += t
        return pd.DataFrame({
            "g": g, "id": ids, "piece": pieces, "piece_tokens": toks,
            "win": pd.Series(wins, dtype="int64"),
            "offset": pd.Series(offs, dtype="int64")})

    return fn


def pack_sequences(docs: DataFrame, window: int, *,
                   id_col: str = "doc_id",
                   count_col: str = "n_tokens",
                   n_groups: int = 32,
                   allow_split: bool = False,
                   order: str = "id") -> DataFrame:
    """Pack ``docs`` (one row per document with an integer token count
    ``count_col``) into fixed-``window``-token context windows.

    Returns one row per packed PIECE: ``(g, id, piece, piece_tokens,
    win, offset, n_overflow)`` — ``(g, win)`` identifies the window,
    ``offset`` is the piece's first-token position inside it, and
    Σ piece_tokens per (g, win > 0) ≤ window always.

    Oversize documents (tokens > window):
      * ``allow_split=True``  — chunk into ⌈t/window⌉ pieces of ≤
        ``window`` tokens; every piece flows through the same pack, so
        a trailing partial piece shares its window with other docs.
      * ``allow_split=False`` — ISOLATE: the doc becomes its own
        window with a NEGATIVE win id and ``n_overflow = t - window``
        (> 0), so nothing silently truncates and downstream chooses.

    Determinism: identical output for identical input on every run —
    grouping is ``id % n_groups``, order inside a group is (id,
    piece), and next-fit is deterministic.  The DuckDB oracle
    (`plans/queries_round9`) replays the same recurrence as a
    recursive CTE and hash-matches."""
    t = F.col(count_col).cast("long")
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("int").alias("g"),
        F.col(id_col).cast("long").alias("id"),
        t.alias("t"))
    if allow_split:
        flow = base.select(
            "g", "id",
            F.explode(F.sequence(
                F.lit(0),
                # greatest(0, …): Spark's sequence DESCENDS when stop <
                # start, so a 0-token doc must still clamp to one piece
                F.greatest(
                    F.lit(0),
                    (F.ceil(F.col("t") / F.lit(window)) - 1).cast("int"))))
            .alias("piece"),
            F.col("t"))
        flow = flow.select(
            "g", "id", "piece",
            F.least(F.lit(window),
                    F.col("t") - F.col("piece") * F.lit(window))
            .cast("long").alias("piece_tokens"))
        isolated = None
    else:
        flow = (base.filter(F.col("t") <= window)
                .select("g", "id", F.lit(0).alias("piece"),
                        F.col("t").alias("piece_tokens")))
        from pyspark.sql import Window as W
        over = base.filter(F.col("t") > window)
        isolated = over.select(
            "g", "id", F.lit(0).alias("piece"),
            F.col("t").alias("piece_tokens"),
            (-F.row_number().over(
                W.partitionBy("g").orderBy("id"))).cast("long")
            .alias("win"),
            F.lit(0).cast("long").alias("offset"),
            (F.col("t") - F.lit(window)).alias("n_overflow"))
    if order not in ("id", "tokens"):
        raise ValueError(f"unknown pack order {order!r}")
    packed = (flow.groupBy("g")
              .applyInPandas(_next_fit_group(window, order),
                             _PACK_SCHEMA)
              .withColumn("n_overflow", F.lit(0).cast("long")))
    if isolated is not None:
        packed = packed.unionByName(isolated)
    return packed


def packing_report(packed: DataFrame, window: int) -> DataFrame:
    """Per-group packing efficiency over a `pack_sequences` result:
    windows opened, docs/pieces packed, token fill rate (packed tokens
    / window capacity opened), waste, and the isolated-overflow count
    — the report a 100 TB corpus job emits so a bad window size or
    salt skew is a dashboard line, not a silent 2× token bill."""
    pos = packed.filter(F.col("win") > 0)
    agg = (pos.groupBy("g")
           .agg(F.countDistinct("win").alias("n_windows"),
                F.count(F.lit(1)).alias("n_pieces"),
                F.countDistinct("id").alias("n_docs"),
                F.sum("piece_tokens").alias("tokens")))
    iso = (packed.filter(F.col("win") < 0).groupBy("g")
           .agg(F.count(F.lit(1)).alias("n_isolated"),
                F.sum("n_overflow").alias("overflow_tokens")))
    # full outer: a group may be ALL-isolated (no packed windows) or
    # isolation-free — neither side may drop it from the report
    out = (agg.join(iso, "g", "full_outer")
           .fillna(0, ["n_windows", "n_pieces", "n_docs", "tokens",
                       "n_isolated", "overflow_tokens"]))
    cap = F.col("n_windows") * F.lit(window)
    return out.select(
        "g", "n_windows", "n_pieces", "n_docs", "tokens",
        "n_isolated", "overflow_tokens",
        F.when(cap > 0, (F.col("tokens") * F.lit(10_000) / cap))
        .otherwise(F.lit(0)).cast("long").alias("fill_bp"),
        (cap - F.col("tokens")).cast("long").alias("waste_tokens"))


_EPOCH_P = 1_000_000_007           # prime modulus of the epoch permutation


def epoch_order_key(epoch: int, seed: int = 17) -> tuple[int, int]:
    """The (a, b) coefficients of epoch ``epoch``'s affine permutation
    key — exposed so the SQL oracle can inline the exact literals."""
    a = (seed * 2654435761 + epoch * 40503) % _EPOCH_P
    return (a or 1, (epoch * 97 + seed) % _EPOCH_P)


def epoch_order(packed: DataFrame, epoch: int,
                seed: int = 17) -> DataFrame:
    """Epoch-stable SHUFFLED batch order over packed context windows:
    one row per (g, win) window with ``order_key`` — an affine hash
    ``(a·x + b) mod P`` of the window id (x = (g·1000003 + win) mod P,
    P prime, (a, b) seeded per epoch) — so epoch N's global batch
    order is deterministic, reproducible across runs/engines, and
    hash-uniform (skew-free) WITHOUT a global sort: the key is one
    map-side expression; a training loader range-partitions on it and
    streams batches in key order, and any ranking goes through the
    two-phase machinery (`operators/windows.global_row_number`), never
    a single-partition window.  Distinct windows sharing x mod P (only
    possible past ~10⁹ windows) tie-break on (g, win).

    The permutation is oracle-expressible by construction — integer
    arithmetic only, coefficients from `epoch_order_key` — which is
    what lets the registry entry hash-check the ORDER itself, not just
    the membership."""
    a, b = epoch_order_key(epoch, seed)
    x = F.pmod(F.col("g").cast("long") * F.lit(1000003)
               + F.col("win"), F.lit(_EPOCH_P))
    return (packed.select("g", "win").distinct()
            .withColumn("order_key",
                        F.pmod(F.lit(a) * x + F.lit(b),
                               F.lit(_EPOCH_P))))


# ---------------------------------------------------------------------------
# incremental (delta) packing — continue the stream without re-reading
# committed windows (round-10 verdict, Next round #1)
# ---------------------------------------------------------------------------

def pack_tail_state(packed: DataFrame) -> DataFrame:
    """Per-salt-group NEXT-FIT resume state of a packed frame:
    ``(g, win, fill, neg_min)`` — the open tail window id, its fill,
    and the most negative isolated-window id (NULL where a group has
    no positive / no isolated windows).

    ``fill`` is ``MAX(offset + piece_tokens)`` of the tail window, not
    a SUM — offsets are global positions, so the state is computable
    from ANY subset that contains the tail window's LAST piece: the
    full table once (bootstrap) or just the latest delta afterwards
    (`merge_tail_state`).  O(groups) rows: this tiny relation is what
    `pack_sequences_delta` reads INSTEAD of the committed windows —
    the heart of the corpus lane's never-re-read contract."""
    from pyspark.sql import Window as W

    pos = packed.filter(F.col("win") > 0)
    wfill = (pos.groupBy("g", "win")
             .agg(F.max(F.col("offset") + F.col("piece_tokens"))
                  .cast("long").alias("fill")))
    w = W.partitionBy("g").orderBy(F.desc("win"))
    tail = (wfill.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("g", "win", "fill"))
    neg = (packed.filter(F.col("win") < 0).groupBy("g")
           .agg(F.min("win").cast("long").alias("neg_min")))
    return (tail.join(neg, "g", "full_outer")
            .select("g", "win", "fill", "neg_min"))


def merge_tail_state(old: DataFrame, delta_tail: DataFrame) -> DataFrame:
    """Roll the resume state forward after a delta append: the delta's
    tail (computed from the delta rows ALONE — offsets are global, see
    `pack_tail_state`) wins wherever the delta opened or extended
    windows; untouched groups keep the old state.  O(groups) work —
    the committed windows are never consulted."""
    o = old.select(F.col("g"), F.col("win").alias("__ow"),
                   F.col("fill").alias("__of"),
                   F.col("neg_min").alias("__on"))
    d = delta_tail.select(F.col("g"), F.col("win").alias("__dw"),
                          F.col("fill").alias("__df"),
                          F.col("neg_min").alias("__dn"))
    return (o.join(d, "g", "full_outer")
            .select("g",
                    F.coalesce("__dw", "__ow").cast("long").alias("win"),
                    F.coalesce("__df", "__of").cast("long").alias("fill"),
                    F.least(F.coalesce("__dn", "__on"),
                            F.coalesce("__on", "__dn"))
                    .cast("long").alias("neg_min")))


def _next_fit_group_delta(window: int):
    """Per-group next-fit CONTINUATION: identical recurrence to
    `_next_fit_group(order="id")` but initialized from the group's
    committed tail state (carried on every row as __tw/__tf) instead
    of (1, 0) — so packing the delta alone reproduces exactly what a
    from-scratch pack of (committed ∪ delta) would assign the delta
    pieces, provided delta ids sort after the group's committed ids
    (append-arrival order)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["id", "piece"], kind="mergesort")
        ids = pdf["id"].to_numpy()
        pieces = pdf["piece"].to_numpy()
        toks = pdf["piece_tokens"].to_numpy()
        g = int(pdf["g"].iloc[0])
        win = int(pdf["__tw"].iloc[0])
        fill = int(pdf["__tf"].iloc[0])
        wins, offs = [], []
        for t in toks:
            t = int(t)
            if fill + t > window and fill > 0:
                win += 1
                fill = 0
            wins.append(win)
            offs.append(fill)
            fill += t
        return pd.DataFrame({
            "g": g, "id": ids, "piece": pieces, "piece_tokens": toks,
            "win": pd.Series(wins, dtype="int64"),
            "offset": pd.Series(offs, dtype="int64")})

    return fn


def pack_sequences_delta(docs: DataFrame, window: int,
                         tail: DataFrame, *,
                         id_col: str = "doc_id",
                         count_col: str = "n_tokens",
                         n_groups: int = 32,
                         allow_split: bool = False) -> DataFrame:
    """Pack ONLY ``docs`` (a delta batch) into the windows a
    from-scratch `pack_sequences` of (committed ∪ delta) would give
    them — WITHOUT reading a single committed window: each salt
    group's next-fit resumes from ``tail`` (`pack_tail_state`,
    O(groups) rows), open tail windows are CONTINUED (delta pieces
    land at their true global offsets), fresh groups start at (1, 0),
    and isolated oversize docs extend the negative id sequence below
    the group's committed minimum.

    Exactness precondition (the crawl-append invariant): every delta
    id sorts AFTER the group's committed ids — next-fit is a streaming
    recurrence, so resuming its (win, fill) state is literally
    replaying the suffix.  Only arrival order packs incrementally
    (``order="tokens"`` re-sorts globally — a delta there is a
    rebuild, by construction).

    Scale: the delta shuffles O(delta) rows; the state join is a
    broadcast of O(groups) rows; committed windows are untouched on
    disk AND unread (callers assert the inputFiles disjointness —
    `corpus_incremental_assemble`)."""
    t = F.col(count_col).cast("long")
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("int").alias("g"),
        F.col(id_col).cast("long").alias("id"),
        t.alias("t"))
    st = tail.select(
        "g",
        F.coalesce(F.col("win"), F.lit(1)).cast("long").alias("__tw"),
        F.coalesce(F.col("fill"), F.lit(0)).cast("long").alias("__tf"),
        F.coalesce(F.col("neg_min"), F.lit(0)).cast("long").alias("__tn"))
    if allow_split:
        flow = base.select(
            "g", "id",
            F.explode(F.sequence(
                F.lit(0),
                F.greatest(
                    F.lit(0),
                    (F.ceil(F.col("t") / F.lit(window)) - 1).cast("int"))))
            .alias("piece"),
            F.col("t"))
        flow = flow.select(
            "g", "id", "piece",
            F.least(F.lit(window),
                    F.col("t") - F.col("piece") * F.lit(window))
            .cast("long").alias("piece_tokens"))
        isolated = None
    else:
        flow = (base.filter(F.col("t") <= window)
                .select("g", "id", F.lit(0).alias("piece"),
                        F.col("t").alias("piece_tokens")))
        from pyspark.sql import Window as W
        over = base.filter(F.col("t") > window)
        isolated = (over.join(F.broadcast(st.select("g", "__tn")),
                              "g", "left")
                    .select(
                        "g", "id", F.lit(0).alias("piece"),
                        F.col("t").alias("piece_tokens"),
                        (F.coalesce(F.col("__tn"), F.lit(0))
                         - F.row_number().over(
                             W.partitionBy("g").orderBy("id")))
                        .cast("long").alias("win"),
                        F.lit(0).cast("long").alias("offset"),
                        (F.col("t") - F.lit(window)).alias("n_overflow")))
    schema = T.StructType(list(_PACK_SCHEMA.fields))
    packed = (flow.join(F.broadcast(st.select("g", "__tw", "__tf")),
                        "g", "left")
              .fillna({"__tw": 1, "__tf": 0})
              .groupBy("g")
              .applyInPandas(_next_fit_group_delta(window), schema)
              .withColumn("n_overflow", F.lit(0).cast("long")))
    if isolated is not None:
        packed = packed.unionByName(isolated)
    return packed

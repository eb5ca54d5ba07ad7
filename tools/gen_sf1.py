"""Generate a LOCAL sf1 extension of the driver's synthetic testdata
(10× sf0.1) for the scaling probe — the driver provides sf0.001/0.01/
0.1 only; a decade more of data is the cheapest way to surface a
super-linear term before a cluster would (round-5 verdict item #3).

Derived from the committed tables (TESTDATA.md: deterministic,
seed-driven) with ONE deliberate deviation:
  * documents: the driver keeps a fixed ~31-word vocabulary through
    sf0.1; extending that to 50k docs makes every LSH/banding candidate
    set grow quadratically IN THE DATA (random 31-word salads collide
    on bands by chance), which measures the corpus, not the plan — the
    opposite of what the probe exists for.  Real 10× crawls grow
    vocabulary (Heaps' law) while boilerplate keeps its df, so sf1
    samples uniformly from the 31 driver words + ~280 synthetic tail
    words — the driver's own uniform draw, over a ×10 pool — keeping
    per-doc gram rarity (hence LSH candidate volume per doc) stable
    across the ×10 step.  ~1% of docs are planted
    near-duplicates (lightly edited copies, mirroring the driver's
    planted dups at sf0.1) so dedup outputs stay non-trivial;
  * same ~55-words/doc mean and lang/source value sets as sf0.1;
  * orders: same status/priority value sets and measured status mix,
    same key ranges (o_custkey < 10 × sf0.1's max), same date span and
    price range — a straight ×10.

Deterministic (fixed seed), written OUTSIDE the repo to
``$SPARK_GRAFT_SF1_DIR`` (default /tmp/spark-graft-sf1) — probe data,
never committed, regenerated on demand; /root/testdata stays untouched.
Only the tables the heavy probe shapes read are generated
(documents, orders, and — since round 13 — embeddings).

Usage: python tools/gen_sf1.py            (no-op if already present)
"""

from __future__ import annotations

import os

import numpy as np

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-sf1")
SF01_DIR = "/root/testdata/sf0.1"
SEED = 421
N_DOCS = 50_000          # 10 x sf0.1
N_ORDERS = 1_500_000     # 10 x sf0.1


def ensure_sf1(sf1_dir: str = SF1_DIR) -> str:
    """Generate (once) and return the sf1 directory."""
    docs_path = os.path.join(sf1_dir, "documents.parquet")
    orders_path = os.path.join(sf1_dir, "orders.parquet")
    emb_path = os.path.join(sf1_dir, "embeddings.parquet")
    if (os.path.exists(docs_path) and os.path.exists(orders_path)
            and os.path.exists(emb_path)):
        return sf1_dir
    os.makedirs(sf1_dir, exist_ok=True)

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    rng = np.random.default_rng(SEED)

    # -- documents ---------------------------------------------------
    pool = [r[0] for r in con.execute(f"""
        SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+'))
        FROM '{SF01_DIR}/documents.parquet' ORDER BY 1""").fetchall()]
    langs = [r[0] for r in con.execute(f"""
        SELECT DISTINCT lang FROM '{SF01_DIR}/documents.parquet'
        ORDER BY 1""").fetchall()]
    sources = [r[0] for r in con.execute(f"""
        SELECT DISTINCT source FROM '{SF01_DIR}/documents.parquet'
        ORDER BY 1""").fetchall()]
    # Heaps-scaled pool: driver head words + synthetic tail, uniform draw
    words = np.array(pool + [f"w{i:03d}" for i in range(280)])
    lens = rng.integers(15, 96, size=N_DOCS)            # mean ~55 words/doc
    texts = [" ".join(words[rng.integers(0, len(words), size=n)])
             for n in lens]
    # plant ~1% near-duplicates: copy an early doc, swap a few words
    n_plant = N_DOCS // 100
    for i in range(n_plant):
        src = texts[i].split(" ")
        for _ in range(2):
            src[rng.integers(0, len(src))] = words[
                rng.integers(0, len(words))]
        texts[N_DOCS - n_plant + i] = " ".join(src)
    docs = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([langs[i] for i in
                          rng.integers(0, len(langs), size=N_DOCS)]),
        "source": pa.array([sources[i] for i in
                            rng.integers(0, len(sources), size=N_DOCS)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, docs_path)

    # -- orders ------------------------------------------------------
    st_mix = con.execute(f"""
        SELECT o_orderstatus, COUNT(*) FROM '{SF01_DIR}/orders.parquet'
        GROUP BY 1 ORDER BY 1""").fetchall()
    statuses = np.array([s for s, _ in st_mix])
    probs = np.array([c for _, c in st_mix], dtype=float)
    probs /= probs.sum()
    pris = [r[0] for r in con.execute(f"""
        SELECT DISTINCT o_orderpriority FROM '{SF01_DIR}/orders.parquet'
        ORDER BY 1""").fetchall()]
    lo, hi, pmin, pmax, ckmax = con.execute(f"""
        SELECT epoch(MIN(o_orderdate)), epoch(MAX(o_orderdate)),
               MIN(o_totalprice), MAX(o_totalprice), MAX(o_custkey)
        FROM '{SF01_DIR}/orders.parquet'""").fetchone()
    ts = (rng.integers(lo // 86400, hi // 86400 + 1, size=N_ORDERS)
          * 86_400_000_000)                              # midnight, micros
    orders = pa.table({
        "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, (ckmax + 1) * 10, size=N_ORDERS), pa.int64()),
        "o_orderstatus": pa.array(
            statuses[rng.choice(len(statuses), size=N_ORDERS, p=probs)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(pmin, pmax, size=N_ORDERS), 2)),
        "o_orderdate": pa.array(ts, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [pris[i] for i in rng.integers(0, len(pris), size=N_ORDERS)]),
    })
    pq.write_table(orders, orders_path)

    # -- embeddings --------------------------------------------------
    # 10 x sf0.1's 2k vectors, mirroring its shape: float32[64],
    # unit-normalized, CLUSTERED (16 gaussian centers) so IVF/PQ
    # probes see realistic cell occupancy, plus an integer label.
    # Round-13 (verdict #4): the sf1 decade rows for the retrain /
    # rebalance / near-dup-lane contracts need this table.
    n_emb = 20_000
    k_clusters = 16
    centers = rng.standard_normal((k_clusters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k_clusters, size=n_emb)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, emb_path)
    return sf1_dir


if __name__ == "__main__":
    print(ensure_sf1())

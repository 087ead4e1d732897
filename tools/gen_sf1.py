#!/usr/bin/env python3
"""Synthesize an SF 1 test-data directory (10x sf0.1) for SCALING
measurements ONLY. The driver's own generator is not available, so this
mirrors the observable statistics of the committed sf0.1 tables (same
schemas, same vocabularies/value domains, same length and key
distributions, 10x the rows) with a fixed seed — deterministic, but NOT
the driver's seed-42 stream. Correctness runs stay on the driver's data;
this feeds wall-clock scaling curves, where the distributional match is
what matters (doc length, vocab size, source/lang mix, key fan-outs).

Usage: python3 tools/gen_sf1.py [out_dir=/tmp/sfx1]
"""
import os, sys, random
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1"
SRC = "/root/testdata/sf0.1"
MULT = 10
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(4242)
con = duckdb.connect()

# --- documents: same vocab, same words-per-doc distribution ------------
vocab = [r[0] for r in con.sql(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM '{SRC}/documents.parquet'"
).fetchall() if r[0]]
vocab.sort()
wc = con.sql(f"SELECT len(string_split(text,' ')) FROM '{SRC}/documents.parquet'").df().iloc[:, 0].values
langs = ["en", "en", "en", "de", "es", "fr", "zh"]  # ~43% en like sf0.1
n_docs = 5000 * MULT
sources = [f"src{i}" for i in range(20)]
doc_rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
lens = rng.choice(wc, size=n_docs)
vocab_arr = np.array(vocab)
for i in range(n_docs):
    words = vocab_arr[rng.integers(0, len(vocab_arr), size=int(lens[i]))]
    text = " ".join(words) + " "
    doc_rows["doc_id"].append(i)
    doc_rows["text"].append(text)
    doc_rows["lang"].append(langs[int(rng.integers(0, len(langs)))])
    doc_rows["source"].append(sources[i % 20])
    doc_rows["n_chars"].append(len(text))
# plant the same exact-dup rate as sf0.1 (8 dup docs / 5000)
for j in range(8 * MULT):
    a = int(rng.integers(0, n_docs)); b = int(rng.integers(0, n_docs))
    doc_rows["text"][a] = doc_rows["text"][b]
    doc_rows["n_chars"][a] = doc_rows["n_chars"][b]
pq.write_table(pa.table(doc_rows, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])), f"{OUT}/documents.parquet")
print("documents", n_docs)

# --- embeddings: unit-ish float32[64] + label 0..9 ----------------------
n_vec = 2000 * MULT
emb = rng.normal(0, 0.2, size=(n_vec, 64)).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": pa.array(range(n_vec), pa.int64()),
    "embedding": pa.array([e for e in emb.tolist()], pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_vec).tolist(), pa.int32()),
}), f"{OUT}/embeddings.parquet")
print("embeddings", n_vec)

# --- events: 1M rows over the same time span / type mix -----------------
n_ev = 100000 * MULT
types = ["view", "click", "purchase", "signup", "error"]
base = np.datetime64("2024-01-01T00:00:00.000000")
# sf0.1 spans ~38 days at ~33s cadence; keep cadence, extend span 10x
ts = base + (np.cumsum(rng.exponential(33.0, n_ev)) * 1e6).astype("timedelta64[us]")
pq.write_table(pa.table({
    "event_id": pa.array(range(n_ev), pa.int64()),
    "ts": pa.array(ts),
    "user_id": pa.array(rng.integers(0, 2000 * MULT, n_ev).tolist(), pa.int64()),
    "event_type": pa.array([types[i] for i in rng.integers(0, 5, n_ev)]),
    "value": pa.array(np.round(rng.exponential(80, n_ev), 2).tolist(), pa.float64()),
    "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 100, n_ev)]),
}), f"{OUT}/events.parquet")
print("events", n_ev)

# --- TPC-H-ish star tables ----------------------------------------------
for t in ("region", "nation"):  # fixed-size dimensions: copy verbatim
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
n_cust, n_supp, n_part, n_ord, n_li = (15000 * MULT, 1000 * MULT,
                                       20000 * MULT, 150000 * MULT, 600000 * MULT)
segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
pq.write_table(pa.table({
    "c_custkey": pa.array(range(n_cust), pa.int64()),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
    "c_nationkey": pa.array(rng.integers(0, 25, n_cust).tolist(), pa.int32()),
    "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2).tolist()),
    "c_mktsegment": pa.array([segs[i] for i in rng.integers(0, 5, n_cust)]),
}), f"{OUT}/customer.parquet")
pq.write_table(pa.table({
    "s_suppkey": pa.array(range(n_supp), pa.int64()),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
    "s_nationkey": pa.array(rng.integers(0, 25, n_supp).tolist(), pa.int32()),
    "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2).tolist()),
}), f"{OUT}/supplier.parquet")
brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
ptypes = [r[0] for r in con.sql(f"SELECT DISTINCT p_type FROM '{SRC}/part.parquet'").fetchall()]
pq.write_table(pa.table({
    "p_partkey": pa.array(range(n_part), pa.int64()),
    "p_name": pa.array([f"part {i}" for i in range(n_part)]),
    "p_brand": pa.array([brands[i] for i in rng.integers(0, len(brands), n_part)]),
    "p_type": pa.array([ptypes[i] for i in rng.integers(0, len(ptypes), n_part)]),
    "p_size": pa.array(rng.integers(1, 51, n_part).tolist(), pa.int32()),
    "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2).tolist()),
}), f"{OUT}/part.parquet")
statuses = ["O", "F", "P"]
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
odate = (np.datetime64("1995-01-01") +
         rng.integers(0, 2404, n_ord).astype("timedelta64[D]")).astype("datetime64[us]")
pq.write_table(pa.table({
    "o_orderkey": pa.array(range(n_ord), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord).tolist(), pa.int64()),
    "o_orderstatus": pa.array([statuses[i] for i in rng.integers(0, 3, n_ord)]),
    "o_totalprice": pa.array(np.round(rng.uniform(1000, 450000, n_ord), 2).tolist()),
    "o_orderdate": pa.array(odate),
    "o_orderpriority": pa.array([prios[i] for i in rng.integers(0, 5, n_ord)]),
}), f"{OUT}/orders.parquet")
flags = ["R", "A", "N"]
sdate = (np.datetime64("1995-01-01") +
         rng.integers(0, 2500, n_li).astype("timedelta64[D]")).astype("datetime64[us]")
pq.write_table(pa.table({
    "l_orderkey": pa.array(rng.integers(0, n_ord, n_li).tolist(), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li).tolist(), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).tolist(), pa.int64()),
    "l_linenumber": pa.array((rng.integers(1, 8, n_li)).tolist(), pa.int32()),
    "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float).tolist()),
    "l_extendedprice": pa.array(np.round(rng.uniform(900, 100000, n_li), 2).tolist()),
    "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2).tolist()),
    "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2).tolist()),
    "l_returnflag": pa.array([flags[i] for i in rng.integers(0, 3, n_li)]),
    "l_linestatus": pa.array(["O" if f == "N" else "F" for f in rng.integers(0, 2, n_li).astype(str)]),
    "l_shipdate": pa.array(sdate),
}), f"{OUT}/lineitem.parquet")
print("star tables done:", OUT)

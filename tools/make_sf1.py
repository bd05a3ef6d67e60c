#!/usr/bin/env python3
"""Derive an sf1 checkpoint dataset (10x sf0.1) for the SCALE_r12
larger-scale run (VERDICT r11 item 6).

The driver ships sf{0.001,0.01,0.1} only; this builds a 10x scale-up of
sf0.1 for the worst-growth query families, preserving each table's
SCALING CHARACTER rather than blindly replicating rows:

- lineitem: 10 replicas with shifted l_orderkey / l_suppkey / l_partkey
  key spaces — supplier count grows 10x with the same rows-per-supplier,
  which is how TPC-H scales (windows per ticker stay the same depth,
  there are just 10x more of them).
- documents: 10 replicas with shifted doc_id and a DETERMINISTIC
  per-replica word shuffle — token distribution (heavy hitters, LM
  stats) is preserved, but replicas are NOT n-gram near-duplicates of
  each other, so the dedup queries see a realistic duplication RATE
  instead of a pathological 10-copies-of-everything corpus.
- embeddings: 10 replicas with shifted vec_id and a tiny per-replica
  perturbation on dim 0 — vectors stay in-distribution without being
  exact duplicates.

Output: /root/repo/.sf1_testdata/ (gitignored; ~10x sf0.1 on disk).

Generalized for the third-decade checkpoint (VERDICT r13 item 2): an
optional second argument sets the replica count, so
`make_sf1.py /root/repo/.sf10_testdata 100` derives an sf10 set (100x
sf0.1, ~1.7 GB) with the same scaling character — key spaces shift per
replica, documents word-shuffle per replica, embeddings perturb dim 0.
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1_testdata"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"


def lineitem():
    con = duckdb.connect()
    parts = []
    for k in range(R):
        parts.append(
            f"SELECT l_orderkey + {k} * 1000000 AS l_orderkey, "
            f"l_partkey + {k} * 1000000 AS l_partkey, "
            f"l_suppkey + {k} * 100000 AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, "
            "l_tax, l_returnflag, l_linestatus, l_shipdate "
            f"FROM '{SRC}/lineitem.parquet'")
    q = " UNION ALL ".join(parts)
    con.sql(
        f"COPY ({q}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")
    print("lineitem:", con.sql(
        f"SELECT count(*) FROM '{OUT}/lineitem.parquet'").fetchone()[0])


def documents():
    src = pq.read_table(f"{SRC}/documents.parquet")
    ids, texts = src.column("doc_id").to_pylist(), src.column(
        "text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for k in range(R):
        for i, t in enumerate(texts):
            if k == 0:
                nt = t
            else:
                words = t.split(" ")
                rng = random.Random(k * 1000003 + ids[i])
                rng.shuffle(words)
                nt = " ".join(words)
            out["doc_id"].append(ids[i] + k * 1000000)
            out["text"].append(nt)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(nt))
    pq.write_table(pa.table(out), f"{OUT}/documents.parquet")
    print("documents:", len(out["doc_id"]))


def embeddings():
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = src.column("vec_id").to_pylist()
    vecs = src.column("embedding").to_pylist()
    labels = src.column("label").to_pylist()
    out = {"vec_id": [], "embedding": [], "label": []}
    for k in range(R):
        for i, v in enumerate(vecs):
            nv = list(v)
            nv[0] = nv[0] + k * 1e-3
            out["vec_id"].append(ids[i] + k * 1000000)
            out["embedding"].append(nv)
            out["label"].append(labels[i])
    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32())])
    pq.write_table(pa.table(out, schema=schema),
                   f"{OUT}/embeddings.parquet")
    print("embeddings:", len(out["vec_id"]))


def link_rest():
    # the checkpoint queries only read the three scaled tables; the
    # remaining tables symlink to sf0.1 so any shared warmup still runs
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events"]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    lineitem()
    documents()
    embeddings()
    link_rest()
    print("done:", OUT)

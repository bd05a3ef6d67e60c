#!/usr/bin/env python3
"""Derive a 10x scale-up of ANY source scale dir (generalizes
make_sf1.py per VERDICT r13 item 2: the third-decade checkpoint needs
sf10 = 10x the derived sf1).

Same derivation character as make_sf1.py (see its docstring): lineitem
replicas shift the orderkey/partkey/suppkey key spaces (supplier count
grows 10x at constant rows-per-supplier — TPC-H's own scaling);
documents get a deterministic per-replica word shuffle (realistic
duplication RATE, not 10 near-copies); embeddings get a per-replica
dim-0 perturbation. ID offsets are derived from the SOURCE's max ids
(rounded up to a power of 10) so the script composes with its own
output: sf0.1 -> sf1 -> sf10.

Usage: make_scale.py SRC OUT   (R fixed at 10)
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1]
OUT = sys.argv[2]
R = 10


def pow10_above(n):
    p = 1
    while p <= n:
        p *= 10
    return p


def lineitem():
    con = duckdb.connect()
    mo, mp, ms = con.sql(
        f"SELECT max(l_orderkey), max(l_partkey), max(l_suppkey) "
        f"FROM '{SRC}/lineitem.parquet'").fetchone()
    oo, op_, os_ = pow10_above(mo), pow10_above(mp), pow10_above(ms)
    parts = []
    for k in range(R):
        parts.append(
            f"SELECT l_orderkey + {k} * {oo} AS l_orderkey, "
            f"l_partkey + {k} * {op_} AS l_partkey, "
            f"l_suppkey + {k} * {os_} AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, "
            "l_tax, l_returnflag, l_linestatus, l_shipdate "
            f"FROM '{SRC}/lineitem.parquet'")
    q = " UNION ALL ".join(parts)
    con.sql(f"COPY ({q}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")
    print("lineitem:", con.sql(
        f"SELECT count(*) FROM '{OUT}/lineitem.parquet'").fetchone()[0])


def documents():
    src = pq.read_table(f"{SRC}/documents.parquet")
    ids = src.column("doc_id").to_pylist()
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    off = pow10_above(max(ids))
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
            out["doc_id"].append(ids[i] + k * off)
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
    off = pow10_above(max(ids))
    out = {"vec_id": [], "embedding": [], "label": []}
    for k in range(R):
        for i, v in enumerate(vecs):
            nv = list(v)
            nv[0] = nv[0] + k * 1e-3
            out["vec_id"].append(ids[i] + k * off)
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
    # remaining tables symlink to the source so shared warmup still runs
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events"]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.realpath(f"{SRC}/{t}.parquet"), dst)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    lineitem()
    documents()
    embeddings()
    link_rest()
    print("done:", OUT)

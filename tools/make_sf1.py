#!/usr/bin/env python3
"""Derive an sf1 scale-ladder fixture from the driver's sf0.1 tables.

10x key-shifted replication preserving referential integrity — NOT new
synthetic data: every replica is the driver's own sf0.1 content with
keys offset by i * (table's key range), so join fan-outs, value
distributions, and skew scale the way a real 10x corpus would.

  customer   c_custkey   += i*15000      (events.user_id joins o_custkey,
  supplier   s_suppkey   += i*1000        so user_id shifts by the same
  part       p_partkey   += i*20000       15000 stride)
  orders     o_orderkey  += i*150000, o_custkey += i*15000
  lineitem   all three FKs shifted to match
  events     event_id    += i*100000, user_id += i*15000
  documents  doc_id      += i*5000; every WORD gets a replica suffix for
             i>0 so shingle/minhash structure repeats per replica instead
             of making every doc a 10-way exact dup (which would square
             the near-dup pair count instead of scaling it linearly);
             n_chars recomputed to stay consistent with the new text
  embeddings vec_id      += i*2000 (vectors cloned: queries are vec_id<10
             = replica 0, so query count stays fixed while the corpus 10x's)
  region/nation: dimension tables, copied as-is.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [replicas]

`replicas` (default 10) extends the same construction one decade
further: 100 replicas of sf0.1 is the sf10 spot-rung fixture
(~60M lineitem rows) the round-9 scale ladder uses to measure the
iterative/heavy groups' growth exponent.
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFTS = {
    "customer": [("c_custkey", 15000)],
    "supplier": [("s_suppkey", 1000)],
    "part": [("p_partkey", 20000)],
    "orders": [("o_orderkey", 150000), ("o_custkey", 15000)],
    "lineitem": [("l_orderkey", 150000), ("l_partkey", 20000),
                 ("l_suppkey", 1000)],
    "events": [("event_id", 100000), ("user_id", 15000)],
    "documents": [("doc_id", 5000)],
    "embeddings": [("vec_id", 2000)],
}


def replica_select(table, i):
    shifted = {c: f"{c} + {i * stride}" for c, stride in SHIFTS[table]}
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    exprs = []
    for c in cols:
        if c in shifted:
            exprs.append(f"{shifted[c]} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            exprs.append(
                "array_to_string(list_transform(string_split(text, ' '),"
                f" w -> w || 'r{i}'), ' ') AS text")
        elif table == "documents" and c == "n_chars" and i > 0:
            exprs.append(
                "CAST(length(array_to_string(list_transform("
                f"string_split(text, ' '), w -> w || 'r{i}'), ' ')) "
                "AS BIGINT) AS n_chars")
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'"


import pathlib
pathlib.Path(DST).mkdir(parents=True, exist_ok=True)
con = duckdb.connect()
for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")
for t in SHIFTS:
    union = " UNION ALL ".join(replica_select(t, i) for i in range(REPLICAS))
    con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)

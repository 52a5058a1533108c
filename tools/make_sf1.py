#!/usr/bin/env python3
"""Build a deterministic 10x replication of /root/testdata/sf0.1 ("sf1.0")
for the full-gate scale run (driver-side tool; judge r12 next-step #1).

Replication scheme (documented in BASELINE.md):
- region, nation: copied as-is (fixed-size dimensions, TPC-H style).
- customer/supplier/part/orders/lineitem/events: 10 replicas; every id
  key column (c_custkey, s_suppkey, p_partkey, o_orderkey, o_custkey,
  l_orderkey, l_partkey, l_suppkey, event_id, user_id) is offset by
  r*10_000_000 so referential integrity holds replica-locally and all
  keys stay globally unique. Non-key columns unchanged, so every
  replica carries the base distribution (10x density in the same time
  window for events — the realistic way a log scales).
- documents: doc_id offset; for r>0 every whitespace token gets an
  "r<r>" suffix (bijective per replica), so within-replica duplicate /
  near-duplicate structure is preserved exactly while replicas share no
  shingles (pair-emitting dedup gates scale linearly, not
  quadratically in the replica count); n_chars recomputed.
- embeddings: vec_id offset; for r>0 the vector gets a deterministic
  SIGNED PERMUTATION (seed=r): an isometry of both L2 and dot product,
  so within-replica kNN/cosine structure is exactly the base's, value
  range is exactly preserved, and cross-replica vectors decorrelate
  (no artificial near-duplicate explosion).

Deterministic: pure function of the base tables + fixed seeds.
Output: /root/repo/.sf1/ (gitignored), one parquet per table.
"""
import os, sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 10_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def write(name, select_per_rep):
    parts = [select_per_rep(r) for r in range(REPS)]
    q = " UNION ALL ".join(parts)
    con.sql(f"COPY ({q}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

for t in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM '{BASE}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

write("customer", lambda r:
    f"SELECT CAST(c_custkey + {r*OFF} AS BIGINT) AS c_custkey, c_name, "
    f"c_nationkey, c_acctbal, c_mktsegment FROM '{BASE}/customer.parquet'")
write("supplier", lambda r:
    f"SELECT CAST(s_suppkey + {r*OFF} AS BIGINT) AS s_suppkey, s_name, "
    f"s_nationkey, s_acctbal FROM '{BASE}/supplier.parquet'")
write("part", lambda r:
    f"SELECT CAST(p_partkey + {r*OFF} AS BIGINT) AS p_partkey, p_name, "
    f"p_brand, p_type, p_size, p_retailprice FROM '{BASE}/part.parquet'")
write("orders", lambda r:
    f"SELECT CAST(o_orderkey + {r*OFF} AS BIGINT) AS o_orderkey, "
    f"CAST(o_custkey + {r*OFF} AS BIGINT) AS o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority FROM '{BASE}/orders.parquet'")
write("lineitem", lambda r:
    f"SELECT CAST(l_orderkey + {r*OFF} AS BIGINT) AS l_orderkey, "
    f"CAST(l_partkey + {r*OFF} AS BIGINT) AS l_partkey, "
    f"CAST(l_suppkey + {r*OFF} AS BIGINT) AS l_suppkey, l_linenumber, "
    f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
    f"l_linestatus, l_shipdate FROM '{BASE}/lineitem.parquet'")
write("events", lambda r:
    f"SELECT CAST(event_id + {r*OFF} AS BIGINT) AS event_id, ts, "
    f"CAST(user_id + {r*OFF} AS BIGINT) AS user_id, event_type, value, "
    f"props FROM '{BASE}/events.parquet'")

def doc_select(r):
    if r == 0:
        txt = "text"
    else:
        # suffix every non-space token: bijective word map per replica
        txt = rf"regexp_replace(text, '(\S+)', '\1r{r}', 'g')"
    return (f"SELECT CAST(doc_id + {r*OFF} AS BIGINT) AS doc_id, "
            f"{txt} AS text, lang, source, "
            f"CAST(len({txt}) AS BIGINT) AS n_chars "
            f"FROM '{BASE}/documents.parquet'")
write("documents", doc_select)

# embeddings: signed permutation per replica (numpy, float32 throughout)
tbl = pq.read_table(f"{BASE}/embeddings.parquet")
vec_ids = tbl.column("vec_id").to_numpy()
labels = tbl.column("label").to_numpy()
embs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
dim = embs.shape[1]
out_ids, out_vecs, out_labels = [], [], []
for r in range(REPS):
    if r == 0:
        v = embs
    else:
        rng = np.random.RandomState(1000 + r)
        perm = rng.permutation(dim)
        signs = (rng.randint(0, 2, size=dim) * 2 - 1).astype(np.float32)
        v = embs[:, perm] * signs[None, :]
    out_ids.append(vec_ids + r * OFF)
    out_vecs.append(v)
    out_labels.append(labels)
all_ids = np.concatenate(out_ids)
all_vecs = np.concatenate(out_vecs).astype(np.float32)
all_labels = np.concatenate(out_labels)
emb_type = pa.list_(pa.float32())
arr = pa.array(list(all_vecs), type=emb_type)
out_tbl = pa.table({
    "vec_id": pa.array(all_ids, type=pa.int64()),
    "embedding": arr,
    "label": pa.array(all_labels, type=pa.int32()),
})
pq.write_table(out_tbl, f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(all_ids)} rows, dim {dim}")
print("done:", OUT)

#!/usr/bin/env python3
"""Generate a deterministic sf1.0-scale dataset from the driver's sf0.1
tables — the 10x robustness leg (VERDICT r5 item 1). /root/testdata is
read-only, so the scaled tables land in <repo>/testdata_sf1/ (gitignored).

Replication design (replica r = 0..9; r = 0 is the original rows verbatim):
  - region/nation: dimension tables, copied as-is.
  - customer/supplier/part/orders/lineitem/events: id columns offset by
    r * <stride> with strides far above the sf0.1 key ranges, preserving
    every FK edge (orders.o_custkey moves with customer.c_custkey, etc.).
    Non-key attributes (including timestamps) are kept verbatim: the
    timeline gets 10x denser, which is exactly what a 10x scale-up of a
    fixed window looks like (streaming state, windows, and sketches see
    10x keys).
  - documents: doc_id offset by a multiple of 50 so the zipf-corpus
    family residues (47/48/49 mod 50) survive; text of replica r > 0 gets
    a per-TOKEN prefix "r<r>", so a replica shares NO shingle with its
    original (cross-replica Jaccard = 0) — naive copy-replication would
    give every doc 9 exact dups and blow the near-dup operators up
    quadratically for reasons a real 10x corpus would not. n_chars is
    recomputed to keep the n_chars = len(text) invariant.
  - embeddings: vec_id offset; replica r's vector is the original
    circularly shifted by (7 * r) mod 64 dims — norms, per-dim value
    distribution, and labels preserved, while cross-replica cosine is
    ~random instead of 1.0 (same quadratic-blowup argument).

Everything is a deterministic SQL transform over the source parquet: any
engine reading the output (Spark under test, DuckDB as oracle) sees the
identical bytes, so the oracle gate stays exact.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT unnest(range(0, {REPLICAS})) AS r")


def emit(table, select_sql):
    """Materialize via DuckDB, then CAST to the source file's exact arrow
    schema before writing: the engine's queries depend on the driver's
    physical types (events.ts is timestamp[ns], which Spark surfaces as a
    nano LONG and queries divide by 1000; o_orderdate is timestamp[ms]) —
    a plain DuckDB COPY rewrites timestamps as micros and silently
    changes what Spark sees.
    """
    out = os.path.join(DST, f"{table}.parquet")
    tbl = con.execute(select_sql).arrow()
    orig = pq.read_schema(f"{SRC}/{table}.parquet")
    target = pa.schema([pa.field(f.name, f.type) for f in orig])
    tbl = tbl.select(orig.names).cast(target)
    pq.write_table(tbl, out)
    n = pq.read_metadata(out).num_rows
    print(f"{table}: {n} rows")


def src(table):
    return f"'{SRC}/{table}.parquet'"


# Dimensions: as-is.
for t in ("region", "nation"):
    emit(t, f"SELECT * FROM {src(t)}")

# Key strides (sf0.1 maxima: custkey 15k, suppkey 1k, partkey 20k,
# orderkey ~600k, event_id ~100k, doc_id 5k, vec_id 2k).
CUST, SUPP, PART, ORDK, EVT, DOC, VEC = (
    100_000, 10_000, 100_000, 10_000_000, 10_000_000, 1_000_000, 1_000_000)
assert DOC % 50 == 0, "documents stride must preserve mod-50 residues"

emit("customer", f"""
  SELECT c_custkey + r * {CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN reps""")

emit("supplier", f"""
  SELECT s_suppkey + r * {SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN reps""")

emit("part", f"""
  SELECT p_partkey + r * {PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')} CROSS JOIN reps""")

emit("orders", f"""
  SELECT o_orderkey + r * {ORDK} AS o_orderkey,
         o_custkey + r * {CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN reps""")

emit("lineitem", f"""
  SELECT l_orderkey + r * {ORDK} AS l_orderkey,
         l_partkey + r * {PART} AS l_partkey,
         l_suppkey + r * {SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN reps""")

emit("events", f"""
  SELECT event_id + r * {EVT} AS event_id, ts,
         user_id + r * {CUST} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN reps""")

emit("documents", f"""
  SELECT doc_id + r * {DOC} AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     t -> 'r' || CAST(r AS VARCHAR) || t), ' ') END AS text,
         lang, source,
         CAST(len(CASE WHEN r = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     t -> 'r' || CAST(r AS VARCHAR) || t), ' ') END) AS BIGINT)
           AS n_chars
  FROM {src('documents')} CROSS JOIN reps""")

emit("embeddings", f"""
  SELECT vec_id + r * {VEC} AS vec_id,
         list_transform(range(0, len(embedding)),
           i -> embedding[1 + ((i + 7 * r) % len(embedding))]) AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN reps""")

print(f"done -> {DST}")

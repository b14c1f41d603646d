#!/usr/bin/env python3
"""Build the perf-only sf1 (10x sf0.1) replicas for the JOIN / sc_* /
transform rehearsal (VERDICT r10 next-4): customer, supplier, lineitem,
events, orders under benchdata/sf1 (gitignored, never used for oracles).

Replication follows the round-9 recipe (PLANS.md "Scale rehearsal"):
10 replicas with primary ids offset per replica so keys stay unique;
numeric payloads get a tiny per-replica perturbation so replicas aren't
bit-identical; foreign keys that carry JOIN SEMANTICS (nationkey = the
pair-kernel blocking key, user_id's %5 ticker derivation, orders
o_custkey tracking the customer offset) are kept consistent. Files are
written with real row groups (ROW_GROUP_SIZE 100k) so scan parallelism
tracks volume — the round-9 finding-13 artifact (one-row-group files
serialize every projection).

Dev-only tool, driver-side stack (duckdb), like localverify.py.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/benchdata/sf1"
R = 10  # replicas

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def scalar(sql: str) -> int:
    return con.execute(sql).fetchone()[0]


def build(table: str, select_tpl: str) -> None:
    """select_tpl references {k} (replica index) and reads view `t`."""
    con.execute(
        f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{table}.parquet')")
    union = " UNION ALL ".join(select_tpl.format(k=k) for k in range(R))
    con.execute(
        f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)")
    n = scalar(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')")
    print(f"{table}: {n} rows")


# offsets computed once, from the SOURCE files, so cross-table foreign
# keys (orders.o_custkey -> customer.c_custkey) replicate consistently
off_c = scalar(f"SELECT max(c_custkey) + 1 FROM read_parquet('{SRC}/customer.parquet')")
# keep c_custkey % 5 (the join family's df1 filter) replica-invariant
off_c += (-off_c) % 5
off_s = scalar(f"SELECT max(s_suppkey) + 1 FROM read_parquet('{SRC}/supplier.parquet')")
off_l = scalar(f"SELECT max(l_orderkey) + 1 FROM read_parquet('{SRC}/lineitem.parquet')")
off_e = scalar(f"SELECT max(event_id) + 1 FROM read_parquet('{SRC}/events.parquet')")
off_u = scalar(f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')")
off_u += (-off_u) % 5  # user_id % 5 drives the synthetic ticker
off_o = scalar(f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')")

build("customer", f"""
  SELECT c_custkey + {{k}} * {off_c} AS c_custkey, c_name, c_nationkey,
         c_acctbal + {{k}} * 0.001 AS c_acctbal, c_mktsegment
  FROM t""")

build("supplier", f"""
  SELECT s_suppkey + {{k}} * {off_s} AS s_suppkey, s_name,
         s_nationkey, s_acctbal + {{k}} * 0.001 AS s_acctbal
  FROM t""")

build("lineitem", f"""
  SELECT l_orderkey + {{k}} * {off_l} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice + {{k}} * 0.001 AS l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM t""")

build("events", f"""
  SELECT event_id + {{k}} * {off_e} AS event_id, ts,
         user_id + {{k}} * {off_u} AS user_id,
         event_type, value + {{k}} * 0.0001 AS value, props
  FROM t""")

build("orders", f"""
  SELECT o_orderkey + {{k}} * {off_o} AS o_orderkey,
         o_custkey + {{k}} * {off_c} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM t""")
print("done ->", DST)

# --- text/embedding replicas (round-9 recipe: perturbed content so
# shingles/vectors are distinct across replicas) -------------------------

off_d = scalar(f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')")
build("documents", f"""
  SELECT doc_id + {{k}} * {off_d} AS doc_id,
         CASE WHEN {{k}} = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                     t -> 'r{{k}}' || t), ' ') END AS text,
         lang, source,
         CAST(CASE WHEN {{k}} = 0 THEN n_chars
              ELSE length(array_to_string(list_transform(string_split(text, ' '),
                     t -> 'r{{k}}' || t), ' ')) END AS BIGINT) AS n_chars
  FROM t""")

off_v = scalar(f"SELECT max(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')")
# replica k rotates the vector k positions: distinct values, same distribution
build("embeddings", f"""
  SELECT vec_id + {{k}} * {off_v} AS vec_id,
         CASE WHEN {{k}} = 0 THEN embedding
              ELSE embedding[{{k}}+1:] || embedding[1:{{k}}] END AS embedding,
         label
  FROM t""")

#!/usr/bin/env python3
"""Scale the driver testdata up by an integer factor (default sf0.1 -> sf1).

Usage: python3 tools/gen_scale.py [src_dir] [out_dir] [factor]

Replicates each scaling table `factor` times with key offsets, so every
FK relationship and per-copy value distribution is preserved exactly.
Dimension constants (region, nation) are not scaled. Dev tool only (the
driver generates the real testdata; this exists to run the gate + bench
at 10x the largest driver SF, per the round-5 verdict).

Documents: copy 0 is byte-identical to the source; copies > 0 keep the
same token multiset (langid/quality/BPE distributions intact) but apply
a PER-POSITION salted permutation: sort key md5(token||position||copy).
Identical texts still map identically (exact-dup groups survive within
a copy), but the key depends on position, so the permutation does NOT
canonicalize word order -- two different docs sharing vocabulary end up
in unrelated orders and share almost no shingles. (A first version
sorted by md5(token||copy) alone; over this corpus's small vocabulary
that collapsed similar docs onto near-identical sorted sequences and
blew the near-dup candidate count up quadratically -- the DuckDB oracle
replay ran for 90+ CPU-minutes. Position in the key fixes exactly
that.)

Output: ONE parquet file per table with bounded row groups, so Spark
still gets parallel scans (splits at row-group boundaries) and
local_verify.py's *.parquet glob keeps working.
"""
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/.graft/sf1"
k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"SET threads TO {os.cpu_count()}")

# ~64 row groups per table (min 1024 rows each): Spark splits parquet at
# row-group boundaries, so a 20k-row embeddings table in ONE group scans
# on ONE core no matter the cluster — the r6 sf1 bench measured the
# embedding/document family 7-13x slower purely from that. 64 groups
# keeps every scan 32-way-parallel at local[32] while staying far above
# columnar-overhead territory.
def rgs(t):
    n = con.sql(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0] * k
    return max(1024, n // 64)

def copy_unscaled(t):  # dimension constants — a handful of rows
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (ROW_GROUP_SIZE 122880)")

def scale(t, sql):
    con.sql(
        f"COPY (WITH src AS (SELECT * FROM '{src}/{t}.parquet'), "
        f"n AS (SELECT max_rows FROM (SELECT count(*) AS max_rows FROM src)) "
        f"SELECT {sql} FROM src, range({k}) c(i), n "
        f"ORDER BY i) TO '{out}/{t}.parquet' (ROW_GROUP_SIZE {rgs(t)})")

copy_unscaled("region")
copy_unscaled("nation")

scale("customer", """
  c_custkey + i * (SELECT max(c_custkey) + 1 FROM src) AS c_custkey,
  c_name, c_nationkey, c_acctbal, c_mktsegment""")

scale("supplier", """
  s_suppkey + i * (SELECT max(s_suppkey) + 1 FROM src) AS s_suppkey,
  s_name, s_nationkey, s_acctbal""")

scale("part", """
  p_partkey + i * (SELECT max(p_partkey) + 1 FROM src) AS p_partkey,
  p_name, p_brand, p_type, p_size, p_retailprice""")

scale("orders", """
  o_orderkey + i * (SELECT max(o_orderkey) + 1 FROM src) AS o_orderkey,
  o_custkey + i * (SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet') AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""".format(src=src))

scale("lineitem", """
  l_orderkey + i * (SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet') AS l_orderkey,
  l_partkey + i * (SELECT max(p_partkey) + 1 FROM '{src}/part.parquet') AS l_partkey,
  l_suppkey + i * (SELECT max(s_suppkey) + 1 FROM '{src}/supplier.parquet') AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate""".format(src=src))

scale("events", """
  event_id + i * (SELECT max(event_id) + 1 FROM src) AS event_id,
  ts,
  user_id + i * (SELECT max(user_id) + 1 FROM src) AS user_id,
  event_type, value, props""")

# The permutation key carries a PER-GENERATION salt (source row count)
# on top of (token, position, copy). Without it, composing gen_scale
# with itself reuses copy salts: scaling sf0.1 -> sf1 -> sf3 applies the
# SAME md5(t||p||i=1) permutation to every original doc twice (once as
# sf1's copy 1, once as sf3's copy 1 of sf1's verbatim copy 0), so each
# original doc collides with its own earlier permutation — measured
# 10,175 spurious exact-dup pairs at sf3 (~2 per original doc), which
# silently inflates every exact-text/shingle-based probe. The source
# row count differs at every generation step, so salts never repeat
# across compositions, while identical texts within one generation
# still map identically (exact-dup groups survive, as documented).
n_src_docs = con.sql(f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
perm = f"""array_to_string(
    list_transform(
      list_sort(list_transform(string_split(text, ' '),
        (t, p) -> {{'h': md5(t || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR) || '_g{n_src_docs}'), 't': t}})),
      s -> s.t), ' ')"""

scale("documents", f"""
  doc_id + i * (SELECT max(doc_id) + 1 FROM src) AS doc_id,
  CASE WHEN i = 0 THEN text ELSE {perm} END AS text,
  lang, source,
  CAST(length(CASE WHEN i = 0 THEN text ELSE {perm} END) AS BIGINT) AS n_chars""")

scale("embeddings", """
  vec_id + i * (SELECT max(vec_id) + 1 FROM src) AS vec_id,
  embedding, label""")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

#!/usr/bin/env python3
"""sf1 bench data: 10 deterministic key-shifted copies of sf0.1.

Dev tooling only (like selfcheck.py) — used to produce the committed
BENCH_sf1.json scaling evidence; the generated parquet itself is
gitignored. Copies i = 0..9 shift every key domain by i * its sf0.1
cardinality so FK joins stay consistent; timestamps shift i seconds
(so the time axis densifies ~10x, as a real scale-up would); document
text gets a per-copy suffix token (so copies are NEAR-duplicates, not
byte-exact — keeps the dedup tiers honest); embeddings get a small
per-copy component shift (copies cluster tightly, the ANN worst case).

Usage: python3 tools/gen_sf1.py [dstDir]
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
N = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, tmpl):
    parts = " UNION ALL ".join(tmpl.format(i=i) for i in range(N))
    con.execute(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(table, n)

# dimension tables do not scale
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

gen("customer",
    f"SELECT c_custkey + {{i}}*15000 AS c_custkey, c_name, c_nationkey, "
    f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'")
gen("supplier",
    f"SELECT s_suppkey + {{i}}*1000 AS s_suppkey, s_name, s_nationkey, "
    f"s_acctbal FROM '{SRC}/supplier.parquet'")
gen("part",
    f"SELECT p_partkey + {{i}}*20000 AS p_partkey, p_name, p_brand, p_type, "
    f"p_size, p_retailprice FROM '{SRC}/part.parquet'")
gen("orders",
    f"SELECT o_orderkey + {{i}}*150000 AS o_orderkey, "
    f"o_custkey + {{i}}*15000 AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate + INTERVAL ({{i}}) SECOND AS o_orderdate, o_orderpriority "
    f"FROM '{SRC}/orders.parquet'")
gen("lineitem",
    f"SELECT l_orderkey + {{i}}*150000 AS l_orderkey, "
    f"l_partkey + {{i}}*20000 AS l_partkey, "
    f"l_suppkey + {{i}}*1000 AS l_suppkey, l_linenumber, l_quantity, "
    f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"l_shipdate + INTERVAL ({{i}}) SECOND AS l_shipdate "
    f"FROM '{SRC}/lineitem.parquet'")
gen("events",
    f"SELECT event_id + {{i}}*100000 AS event_id, "
    f"ts + INTERVAL ({{i}}) SECOND AS ts, "
    f"user_id + {{i}}*1500 AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'")
gen("documents",
    f"SELECT doc_id + {{i}}*5000 AS doc_id, "
    f"CASE WHEN {{i}} = 0 THEN text ELSE text || ' rep{{i}}' END AS text, "
    f"lang, source, n_chars + CASE WHEN {{i}} = 0 THEN 0 ELSE 5 END AS n_chars "
    f"FROM '{SRC}/documents.parquet'")
gen("embeddings",
    f"SELECT vec_id + {{i}}*2000 AS vec_id, "
    f"list_transform(embedding, x -> CAST(x + {{i}}*0.001 AS FLOAT)) AS embedding, "
    f"label FROM '{SRC}/embeddings.parquet'")
print("done ->", DST)

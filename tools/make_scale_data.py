"""Generate larger scale factors by key-offset replication of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the 100 TB design claim needs at
least one decade more to separate plan cost from fixed job overhead
(VERDICT r4 item 1). This tool builds sfN (default sf1, ~6M lineitem
rows) from the read-only sf0.1 parquet by replicating every scaling
table K times with per-table key offsets, exactly the TPC-H scaling
model: region/nation stay fixed, every fact/dim foreign key is offset
consistently so each replica is a disjoint sub-database with the same
join fan-outs, selectivities, and value distributions as the source.

Document text gets a per-replica suffix (replica 0 is byte-identical
to the source) so corpus-level dedup statistics scale like a real
corpus instead of collapsing into 10-way exact-duplicate groups;
embeddings get a tiny deterministic per-replica perturbation on the
first component for the same reason.

This data is for SCALE PROBING ONLY — correctness gates stay on the
driver's sf0.01 + DuckDB oracle. Output goes to a gitignored dir.

Usage: python tools/make_scale_data.py [K] [outdir]
       (default K=10 -> sf1 at <repo>/.localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".localdata", f"sf{k * 0.1:g}"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS i FROM range({k})")

    def maxkey(table: str, col: str) -> int:
        return con.sql(
            f"SELECT max({col}) FROM '{SRC}/{table}.parquet'"
        ).fetchone()[0] + 1

    offs = {
        "c": maxkey("customer", "c_custkey"),
        "s": maxkey("supplier", "s_suppkey"),
        "p": maxkey("part", "p_partkey"),
        "o": maxkey("orders", "o_orderkey"),
        "d": maxkey("documents", "doc_id"),
        "v": maxkey("embeddings", "vec_id"),
        "e": maxkey("events", "event_id"),
        "u": maxkey("events", "user_id"),
    }

    # fixed-size dims: straight copy (TPC-H keeps these constant)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet'"
        )

    plans = {
        "customer": f"""
            SELECT c_custkey + i*{offs['c']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', reps""",
        "supplier": f"""
            SELECT s_suppkey + i*{offs['s']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', reps""",
        "part": f"""
            SELECT p_partkey + i*{offs['p']} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', reps""",
        "orders": f"""
            SELECT o_orderkey + i*{offs['o']} AS o_orderkey,
                   o_custkey + i*{offs['c']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{SRC}/orders.parquet', reps""",
        "lineitem": f"""
            SELECT l_orderkey + i*{offs['o']} AS l_orderkey,
                   l_partkey + i*{offs['p']} AS l_partkey,
                   l_suppkey + i*{offs['s']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM '{SRC}/lineitem.parquet', reps""",
        "events": f"""
            SELECT event_id + i*{offs['e']} AS event_id, ts,
                   user_id + i*{offs['u']} AS user_id, event_type,
                   value, props
            FROM '{SRC}/events.parquet', reps""",
        "documents": f"""
            SELECT doc_id + i*{offs['d']} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' r' || i::VARCHAR END AS text,
                   lang, source,
                   n_chars + CASE WHEN i = 0 THEN 0
                                  ELSE 2 + length(i::VARCHAR) END AS n_chars
            FROM '{SRC}/documents.parquet', reps""",
        "embeddings": f"""
            SELECT vec_id + i*{offs['v']} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_prepend(
                            (embedding[1] + i * 0.0003)::FLOAT,
                            embedding[2:])::FLOAT[]
                   END AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', reps""",
    }
    for t, q in plans.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

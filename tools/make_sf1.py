"""Generate an sf1-equivalent snapshot (~6M lineitem) for the scale
probe by replicating /root/testdata/sf0.1 10x with JOIN-PRESERVING
key offsets — every foreign key gets the same per-copy stride as its
primary key, so plans see 10x the rows with identical selectivities
and join fan-outs.

PERF PROBE ONLY: the output (/tmp/sf1 by default) is never a
correctness input — oracles and the driver stay on the driver-written
/root/testdata snapshots (TESTDATA.md: read-only).

Shape choices, to keep the scaled workload representative:
- region/nation are dimensions — they do NOT scale (copied once),
  exactly like a real 100 TB star schema.
- documents get a per-copy ``v{k}`` suffix: copies are NEAR-dups of
  the original (high n-gram Jaccard), not byte-identical — so the
  dedup family sees realistic ~10-member near-dup components instead
  of a degenerate all-exact-dup corpus.
- embeddings get a tiny deterministic per-copy perturbation so ANN
  top-k isn't an all-ties workload.
- events keep their time range (10x density), which is how a busier
  stream actually looks; user_ids stride so state cardinality scales.

Run: python tools/make_sf1.py [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def stride(table: str, col: str) -> int:
        return int(
            con.execute(
                f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'"
            ).fetchone()[0]
        )

    kc = stride("customer", "c_custkey")
    ks = stride("supplier", "s_suppkey")
    kp = stride("part", "p_partkey")
    ko = stride("orders", "o_orderkey")
    ke = stride("events", "event_id")
    ku = stride("events", "user_id")
    kd = stride("documents", "doc_id")
    kv = stride("embeddings", "vec_id")

    copies_rel = f"(SELECT unnest(range({copies})) AS k) reps"

    plans = {
        # dimensions: copied once, unscaled
        "region": f"SELECT * FROM '{SRC}/region.parquet'",
        "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
        "customer": f"""
            SELECT c_custkey + k*{kc} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', {copies_rel}""",
        "supplier": f"""
            SELECT s_suppkey + k*{ks} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', {copies_rel}""",
        "part": f"""
            SELECT p_partkey + k*{kp} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM '{SRC}/part.parquet', {copies_rel}""",
        "orders": f"""
            SELECT o_orderkey + k*{ko} AS o_orderkey,
                   o_custkey + k*{kc} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', {copies_rel}""",
        "lineitem": f"""
            SELECT l_orderkey + k*{ko} AS l_orderkey,
                   l_partkey + k*{kp} AS l_partkey,
                   l_suppkey + k*{ks} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', {copies_rel}""",
        "events": f"""
            SELECT event_id + k*{ke} AS event_id, ts,
                   user_id + k*{ku} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet', {copies_rel}""",
        "documents": f"""
            SELECT doc_id + k*{kd} AS doc_id,
                   CASE WHEN k = 0 THEN text ELSE text || ' v' || k END AS text,
                   lang, source,
                   CAST(length(CASE WHEN k = 0 THEN text
                                    ELSE text || ' v' || k END) AS BIGINT) AS n_chars
            FROM '{SRC}/documents.parquet', {copies_rel}""",
        "embeddings": f"""
            SELECT vec_id + k*{kv} AS vec_id,
                   list_transform(embedding,
                       x -> CAST(x + k * 0.0001 AS FLOAT)) AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', {copies_rel}""",
    }
    for table, sql in plans.items():
        con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    con.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Synthesize sf1 benchmark data (~6M-row lineitem) from the driver's
read-only sf0.1 tables, for the fixed-cost amortization measurement
(BASELINE.md sf1 table).

Method: 10 copies of every non-fixed table with CONSISTENT key offsets —
copy i shifts o_orderkey/l_orderkey by i*ORDERS, c_custkey/o_custkey by
i*CUSTOMERS, etc. — so every join relationship of the original data holds
exactly per copy and the join/agg cardinalities scale linearly, which is
what a real sf1 generation would produce. region/nation stay fixed
(TPC-H dims are constant across SF). Documents get a per-copy suffix
token and embeddings a per-copy first-component nudge so dedup/ANN
queries see near-duplicates rather than degenerate exact ties.

Output: /root/repo/.scratch/sf1/*.parquet (gitignored scratch, NOT the
read-only /root/testdata). Deterministic — rerunning reproduces the same
bytes modulo parquet metadata.

Usage: python tools/gen_sf1.py [n_copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")

ORDERS, CUSTOMERS, SUPPLIERS, PARTS = 150_000, 15_000, 1_000, 20_000
EVENTS, USERS, DOCS, VECS = 100_000, 1_500, 5_000, 2_000


def main(n_copies: int = 10) -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({n_copies})) AS i")

    def emit(name: str, select: str) -> None:
        out = os.path.join(DST, f"{name}.parquet")
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed dims: unchanged
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit(
        "customer",
        f"""SELECT c_custkey + i*{CUSTOMERS} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', copies""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + i*{SUPPLIERS} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{SRC}/supplier.parquet', copies""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + i*{PARTS} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM '{SRC}/part.parquet', copies""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + i*{ORDERS} AS o_orderkey,
                   o_custkey + i*{CUSTOMERS} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', copies""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + i*{ORDERS} AS l_orderkey,
                   l_partkey + i*{PARTS} AS l_partkey,
                   l_suppkey + i*{SUPPLIERS} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', copies""",
    )
    emit(
        "events",
        f"""SELECT event_id + i*{EVENTS} AS event_id, ts,
                   user_id + i*{USERS} AS user_id, event_type, value, props
            FROM '{SRC}/events.parquet', copies""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + i*{DOCS} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' v' || CAST(i AS VARCHAR) END AS text,
                   lang, source, n_chars
            FROM '{SRC}/documents.parquet', copies""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + i*{VECS} AS vec_id,
                   list_transform(
                       CAST(embedding AS DOUBLE[]),
                       (x, pos) -> CAST(CASE WHEN pos = 1
                                             THEN x + i * 0.0001
                                             ELSE x END AS FLOAT)
                   ) AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', copies""",
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)

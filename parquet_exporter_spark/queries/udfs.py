"""User-defined function surfaces: scalar Pandas UDF, grouped UDAF
(applyInPandas), and a Python UDTF.

The engine's rule is UDF-as-last-resort (everything else in the inventory
is JVM expressions); these queries exist to prove the escape hatches work
and stay Arrow-vectorized. Each computes something a SQL oracle can mirror
so even the UDF paths are value-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    WHERE l_quantity > 45
    """,
    doc=(
        "Scalar Pandas UDF (Arrow-batched, vectorized): the charge formula "
        "computed in pandas, value-identical to the SQL expression."
    ),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # NB: no rounding anywhere on this path — the sequential double
        # product is bit-identical across engines, while round() algorithms
        # diverge at knife-edge values (pandas is also half-to-even).
        return price * (1 - disc) * (1 + tax)

    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Grouped UDAF via applyInPandas: quantity-weighted mean price per "
        "group, one pandas frame per group. Shuffle on the group key only."
    ),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"].sum()
        avg = (pdf["l_quantity"] * pdf["l_extendedprice"]).sum() / w
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "weighted_avg_price": [round(avg, 4)]}
        )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        weighted, schema="l_returnflag string, weighted_avg_price double"
    )


@query(
    "udtf_split_priority",
    oracle="""
    SELECT o_orderkey,
           string_split(o_orderpriority, '-')[1] AS priority_code,
           string_split(o_orderpriority, '-')[2] AS priority_name
    FROM orders
    WHERE o_orderkey < 100
    """,
    doc=(
        "Table-function surface: one input row expands to typed columns "
        "via a Python UDTF (Spark 3.5+ lateral-join execution)."
    ),
)
def udtf_split_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="priority_code string, priority_name string")
    class SplitPriority:
        def eval(self, priority: str):
            code, _, name = (priority or "").partition("-")
            yield code, name

    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    orders.createOrReplaceTempView("udtf_orders_in")
    spark.udtf.register("split_priority", SplitPriority)
    return spark.sql(
        """
        SELECT o_orderkey, s.priority_code, s.priority_name
        FROM udtf_orders_in, LATERAL split_priority(o_orderpriority) s
        """
    )


@query(
    "udf_cogrouped_pandas",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
    doc=(
        "Co-grouped pandas UDF: customer and orders both shuffle on the "
        "customer key, then each key's two groups arrive as a pandas "
        "DataFrame pair — the escape hatch for per-key merge logic "
        "(asof/interpolation) the relational operators can't express. "
        "Arrow-batched; one shuffle per side, same as a join."
    ),
)
def udf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def merge(key, cdf: pd.DataFrame, odf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:  # orders whose customer is outside the dim: drop
            return pd.DataFrame(
                {"c_custkey": [], "c_acctbal": [], "total_spend": []}
            )
        total = float(odf["o_totalprice"].sum()) if len(odf) else 0.0
        return pd.DataFrame(
            {
                "c_custkey": [key[0]],
                "c_acctbal": [float(cdf["c_acctbal"].iloc[0])],
                "total_spend": [round(total, 2)],
            }
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(merge, "c_custkey bigint, c_acctbal double, total_spend double")
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
    FROM documents
    """,
    doc=(
        "mapInArrow: per-batch transform at the pyarrow RecordBatch level "
        "— zero pandas conversion overhead, the leanest Python escape "
        "hatch (the multimodal codec boundary in operators/multimodal.py "
        "is the mapInPandas sibling). Computes UTF-8 byte lengths with "
        "Arrow compute kernels; narrow, no shuffle."
    ),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    def byte_lengths(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.binary_length(pc.cast(b.column(1), pa.binary())),
                ],
                names=["doc_id", "n_bytes"],
            )

    return docs.mapInArrow(byte_lengths, "doc_id bigint, n_bytes int")


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_discount * l_extendedprice) / sum(l_extendedprice), 6)
               AS weighted_discount
    FROM lineitem GROUP BY 1, 2
    """,
    doc=(
        "GROUPED_AGG Pandas UDF: a pandas_udf returning one scalar per "
        "group used directly inside .agg() — the third UDF aggregation "
        "surface next to applyInPandas (udaf_grouped_pandas) and JVM "
        "aggregates. Arrow ships each group's columns as Series; the "
        "price-weighted discount is rounded inside the UDF so the "
        "value-hash compare sees the same 6-decimal contract as the "
        "SQL twin."
    ),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def wdisc(disc: pd.Series, price: pd.Series) -> float:
        return round(float((disc * price).sum() / price.sum()), 6)

    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wdisc("l_discount", "l_extendedprice").alias("weighted_discount")
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderstatus), 4)
               AS centered
    FROM orders
    """,
    doc=(
        "groupBy().applyInArrow (Spark 4): grouped-map compute handed to "
        "the UDF as a pyarrow.Table — zero pandas materialization, the "
        "lowest-overhead Python escape hatch (the Arrow RecordBatches "
        "cross the JVM/Python boundary and are computed on with "
        "pyarrow.compute kernels directly). Completes the Arrow UDF "
        "matrix next to pandas_udf / applyInPandas / mapInPandas / "
        "mapInArrow / cogrouped pandas. Per-status price centering, "
        "value-checked against the window-function oracle. Scale note: "
        "grouped-map shuffles each group to one task — fine for bounded "
        "group counts like status codes; per-key state at unbounded "
        "cardinality belongs in window functions instead."
    ),
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def center(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mean = pc.mean(t.column("o_totalprice"))
        # round_mode must match the oracle: DuckDB's round() (and
        # Spark's) rounds half away from zero, while pyarrow defaults to
        # half_to_even — a centered value landing exactly on a
        # 4th-decimal half would flip the value hash under the default.
        # pyarrow names that mode half_towards_infinity (ties away from
        # zero toward +/-inf by sign).
        centered = pc.round(
            pc.subtract(t.column("o_totalprice"), mean),
            ndigits=4,
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderstatus": t.column("o_orderstatus"),
                "centered": centered,
            }
        )

    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .applyInArrow(
            center, schema="o_orderkey long, o_orderstatus string, centered double"
        )
    )

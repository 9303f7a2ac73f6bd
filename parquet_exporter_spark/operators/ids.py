"""Contiguous global row numbering without a single-partition sort.

The naive form — ``row_number() OVER (ORDER BY key)`` with no PARTITION BY —
moves the entire table through one task (Spark even warns: "No Partition
Defined for Window operation"). At 100 TB that is the canonical
scale-killer. The scalable shape, used by every distributed numbering
scheme (RDD ``zipWithIndex`` does the same in two passes):

1. range-partition by the sort key, sort within partitions — partition i
   holds keys strictly below partition i+1, so (partition, local position)
   IS the global order;
2. count rows per partition (map-side combined aggregate) and prefix-sum
   the counts — a window over ``n_partitions`` rows, not data rows;
3. broadcast the tiny offset table back and add the per-partition local
   position via an Arrow-batched ``mapInPandas`` cumulative count — a
   narrow pass, no further shuffle of the fact.

Total cost: ONE range shuffle of the data plus an O(partitions) side plan.
Determinism: ids depend only on the global sort order, so they are stable
for any partition-boundary choice PROVIDED the sort key is unique — pass a
unique (composite) key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_row_number(
    df: DataFrame, sort_cols: list[str], id_col: str = "row_id"
) -> DataFrame:
    """Assign 1-based contiguous ids in the global order of ``sort_cols``
    (must be unique for deterministic ids)."""
    out_cols = df.columns
    part = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    # Pin partition identity before it fans out to the counts branch and
    # the data branch: AQE may coalesce the range exchange differently per
    # branch, which would make spark_partition_id disagree between the
    # offset table and the data. localCheckpoint materializes the
    # partitioning once; both branches read the same blocks — the same
    # reason RDD zipWithIndex counts and maps over one materialization.
    tagged = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
        )
    )
    joined = tagged.join(F.broadcast(offsets), "__pid")

    out_schema = StructType(
        [df.schema[c] for c in out_cols] + [StructField(id_col, LongType(), False)]
    )

    def add_ids(batches):
        seen = 0
        for pdf in batches:
            out = pdf[out_cols].copy()
            offset = int(pdf["__offset"].iloc[0]) if len(pdf) else 0
            out[id_col] = offset + seen + np.arange(1, len(pdf) + 1, dtype=np.int64)
            seen += len(pdf)
            yield out

    return joined.mapInPandas(add_ids, out_schema)

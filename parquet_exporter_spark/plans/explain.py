"""Plan-inspection helpers: the 100 TB posture is only real if the physical
plans show it. These helpers read the executed/physical plan text so tests
can assert pushdown, pruning, broadcast choices, and shuffle counts —
`.explain()` as a test oracle instead of a debugging afterthought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            depth = 0
            field = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append(field.split(":")[0])
                    field = ""
                else:
                    field += ch
            if field:
                cols.append(field.split(":")[0])
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(df).count(
        "Exchange rangepartitioning"
    )


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: HashAggregate appears in partial mode
    before the shuffle."""
    plan = formatted_plan(df)
    return "partial_" in plan or "Partial" in physical_plan(df)

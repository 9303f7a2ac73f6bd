"""The climbs nested-document model and its ingest path.

Schema mirrors the reference's GraphQL selection set
(/root/reference/export.py:28-68; types per SURVEY.md section 1.2) as an
EXPLICIT StructType — the reference relied on DuckDB's read_json_auto
inference and then had to correct it (schema.sql:8 "cast required - DuckDB
infers as JSON"); explicit schemas make types deterministic and avoid the
whole class of bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GRADES = T.StructType(
    [
        T.StructField("yds", T.StringType()),
        T.StructField("vscale", T.StringType()),
        T.StructField("french", T.StringType()),
    ]
)

CLIMB_TYPE_FLAGS = T.StructType(
    [
        T.StructField("sport", T.BooleanType()),
        T.StructField("trad", T.BooleanType()),
        T.StructField("bouldering", T.BooleanType()),
        T.StructField("alpine", T.BooleanType()),
        T.StructField("tr", T.BooleanType()),
    ]
)

COORDS = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lng", T.DoubleType())]
)

CONTENT = T.StructType([T.StructField("description", T.StringType())])

CLIMBS_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("fa", T.StringType()),
        T.StructField("length", T.IntegerType()),
        T.StructField("boltsCount", T.IntegerType()),
        T.StructField("safety", T.StringType()),
        T.StructField("grades", GRADES),
        T.StructField("type", CLIMB_TYPE_FLAGS),
        T.StructField("metadata", COORDS),
        T.StructField("content", CONTENT),
        T.StructField("pathTokens", T.ArrayType(T.StringType())),
    ]
)


def ingest_climb_docs(spark: SparkSession, docs: list[dict]) -> DataFrame:
    """Nested JSON documents (e.g. from the GraphQL source) -> DataFrame
    with the explicit schema; missing keys become NULLs."""
    return spark.createDataFrame(docs, schema=CLIMBS_SCHEMA)


def read_climbs_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines scan with the explicit schema (reference R3 without the
    inference bug)."""
    return spark.read.schema(CLIMBS_SCHEMA).json(path)

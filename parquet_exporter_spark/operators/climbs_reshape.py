"""The reference's core computation: flatten the nested climbs document
into the flat export row (/root/reference/schema.sql:4-40 and
examples/*.sql), as reusable DataFrame transforms.

All of R8-R17 in one place: projection+rename, nested-struct access,
1-based array element extraction (F.try_element_at: NULL past the end,
matching DuckDB list_element — plain element_at THROWS under Spark 4 ANSI mode), CAST to string, multi-arg COALESCE defaults,
and the conjunctive region/type/coordinate filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reshape(climbs: DataFrame) -> DataFrame:
    """schema.sql-equivalent flat projection."""
    pt = F.col("pathTokens")
    return climbs.select(
        F.col("uuid").alias("climb_id"),
        F.coalesce(F.col("name"), F.lit("Unknown")).alias("climb_name"),
        F.coalesce(F.col("fa"), F.lit("")).alias("first_ascent"),
        F.coalesce(F.col("length"), F.lit(0)).alias("length_m"),
        F.coalesce(F.col("boltsCount"), F.lit(0)).alias("bolts"),
        F.coalesce(F.col("safety").cast("string"), F.lit("UNKNOWN")).alias("safety"),
        F.coalesce(
            F.col("grades.yds"), F.col("grades.vscale"), F.col("grades.french"), F.lit("")
        ).alias("grade"),
        F.coalesce(F.col("type.sport"), F.lit(False)).alias("is_sport"),
        F.coalesce(F.col("type.trad"), F.lit(False)).alias("is_trad"),
        F.coalesce(F.col("type.bouldering"), F.lit(False)).alias("is_boulder"),
        F.try_element_at(pt, F.lit(1)).alias("country"),
        F.try_element_at(pt, F.lit(2)).alias("state"),
        F.try_element_at(pt, F.lit(3)).alias("region"),
        F.try_element_at(pt, F.lit(4)).alias("area"),
        F.try_element_at(pt, F.lit(5)).alias("crag"),
        F.col("metadata.lat").alias("latitude"),
        F.col("metadata.lng").alias("longitude"),
        F.coalesce(F.col("content.description"), F.lit("")).alias("description"),
    )


def region_filter(climbs: DataFrame, regions: list[str]) -> DataFrame:
    """Keep climbs whose country is in `regions`; empty list keeps all
    (reference filter_climbs, export.py:194-202)."""
    if not regions:
        return climbs
    return climbs.filter(F.try_element_at(F.col("pathTokens"), F.lit(1)).isin(regions))


def parent_fill(areas: DataFrame) -> DataFrame:
    """Flatten area documents into climbs, inheriting pathTokens and
    coordinates from the parent area when missing (reference R21,
    export.py:134-146) — explode + coalesce, no Python loop."""
    exploded = areas.select(
        F.col("uuid").alias("area_uuid"),
        F.col("pathTokens").alias("area_path"),
        F.col("metadata").alias("area_meta"),
        F.explode("climbs").alias("c"),
    )
    return exploded.select(
        F.col("c.uuid").alias("climb_id"),
        F.coalesce(F.col("c.metadata.lat"), F.col("area_meta.lat")).alias("latitude"),
        F.coalesce(F.col("c.metadata.lng"), F.col("area_meta.lng")).alias("longitude"),
        F.try_element_at(F.coalesce(F.col("c.pathTokens"), F.col("area_path")), F.lit(1)).alias("country"),
        F.col("area_uuid"),
    )

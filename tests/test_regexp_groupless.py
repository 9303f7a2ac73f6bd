"""Regression: regexp_extract_all defaults to group index 1; group-less
patterns must pass idx=0 explicitly or they crash ON THE FIRST MATCHING
ROW (testdata happens to contain no digits/symbols, so the default
slipped through every oracle run — this test feeds hostile rows)."""

from pyspark.sql import functions as F


def test_groupless_patterns_survive_matching_rows(spark):
    df = spark.createDataFrame(
        [(1, "a=1; {x} 2 héllo wörld 3.14")], "doc_id: long, text: string"
    )
    out = df.select(
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("digits"),
        F.size(F.regexp_extract_all("text", F.lit(r"[{}();=\[\]<>]"), 0)).alias("syms"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^\x00-\x7F]"), 0)).alias("nonascii"),
    ).collect()[0]
    assert out.digits == 4 and out.syms == 4 and out.nonascii == 2


def test_registered_regexp_queries_survive_hostile_text(spark, tmp_path):
    """Run the three regexp-based queries over a synthetic documents
    table WITH matches (digits, symbols, non-ASCII) — they must not
    raise, whatever the real testdata contains."""
    import shutil

    from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
    from parquet_exporter_spark import tables

    _ensure_loaded()

    src_dir = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sfh")
    (tmp_path / "sfh").mkdir()
    for t in tables.TABLES:
        shutil.copy(f"{src_dir}/{t}.parquet", f"{sf_dir}/{t}.parquet")
    hostile = spark.createDataFrame(
        [
            (900001, "if (x=1) { return héllo; } // 42    indented", "en", "web", 46),
            (900002, "naïve café 3.14159 <tag> [b] №§", "fr", "web", 31),
        ],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    base = spark.read.parquet(f"{src_dir}/documents.parquet")
    base.unionByName(hostile).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    tables._schema_cache.pop((sf_dir, "documents"), None)
    for name in ("fn_regexp_suite", "text_code_detection", "text_nonascii_ratio"):
        assert REGISTRY[name].fn(spark, sf_dir).count() > 0

"""parquet_exporter_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of OpenBeta/parquet-exporter (reference at /root/reference,
studied for behavior only), extended with the LLM-data-pipeline operator
surface (dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale: DataFrame/SQL plans optimized by Catalyst,
broadcast star joins, AQE, partition-aware writes, and no driver-side
materialization on any data path.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow, sized shuffles)
    tables.py     catalog of the driver testdata tables
    registry.py   query registry: name -> (spark_fn, oracle_sql)
    queries/      oracle-checked operator inventory (SURVEY.md section 2)
    sources/      readers: parquet/json/csv/binary + GraphQL paginated ingest
    sinks/        writers: parquet/json/csv/geojson + export stats
    functions/    text analysis, similarity, dedup primitives
    operators/    composed operators (as-of join, top-k, sessionize)
    streaming/    Structured Streaming windows/watermark/dedup
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"

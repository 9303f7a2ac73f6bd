"""Scalar function families: string, date/time, math, array, map, JSON.

All run as JVM-side Catalyst expressions inside whole-stage codegen — no
Python UDFs anywhere on these paths (SURVEY.md section 2.2 posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_exporter_spark.registry import query
from parquet_exporter_spark.tables import read_table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '-', c_mktsegment) AS tagged,
           upper(c_mktsegment) AS seg_uc,
           lower(c_name) AS name_lc,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_name, 'Customer', 'Cust') AS renamed,
           reverse(c_mktsegment) AS seg_rev,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked
    FROM customer
    """,
    doc="String functions: concat/case/substring/length/trim/pad/replace/regexp.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat("c_name", F.lit("-"), "c_mktsegment").alias("tagged"),
        F.upper("c_mktsegment").alias("seg_uc"),
        F.lower("c_name").alias("name_lc"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("renamed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("masked"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                AS INTEGER) AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS ymd
    FROM orders
    """,
    doc=(
        "Date/time functions: extract fields, truncation, date arithmetic, "
        "datediff, epoch seconds, formatting. Session TZ pinned UTC for "
        "oracle parity."
    ),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_98"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_size - 25) AS size_dev,
           round(pow(p_size, 2), 1) AS size_sq,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(ln(p_retailprice), 6) AS price_ln,
           round(log10(p_retailprice), 6) AS price_log10,
           CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
           p_size % 7 AS size_mod,
           round(exp(CAST(p_size AS DOUBLE) / 50.0), 6) AS size_exp
    FROM part
    """,
    doc="Math functions: round/floor/ceil/abs/pow/sqrt/log/sign/mod/exp.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.signum(F.col("p_size") - 25).alias("size_sign"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.round(F.exp(F.col("p_size").cast("double") / 50.0), 6).alias("size_exp"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), ',')
               AS head_vocab,
           CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN)
               AS mentions_spark,
           array_to_string(string_split(text, ' ')[1:3], '_') AS bigram_key
    FROM documents
    """,
    doc=(
        "Array functions over tokenized text: size, element_at (1-based and "
        "negative), slice, distinct+sort, contains, join."
    ),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_join(F.sort_array(F.array_distinct(F.slice(toks, 1, 5))), ",").alias(
            "head_vocab"
        ),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("bigram_key"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT n_nationkey,
           array_to_string(
               map_keys(map {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}),
               ',') AS mkeys,
           array_to_string(
               map_values(map {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}),
               ',') AS mvals,
           map_extract(map {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)},
                       'nation')[1] AS nation_via_map
    FROM nation
    """,
    doc=(
        "Map functions: construction, map_keys/map_values, key lookup. "
        "Key/value lists serialized to scalar strings (construction order is "
        "deterministic on both engines) so the driver canonicalizer can hash them."
    ),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nation"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return nation.select(
        "n_nationkey",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.element_at(m, "nation").alias("nation_via_map"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    """,
    doc=(
        "JSON functions over events.props: get_json_object (string path), "
        "typed extraction via from_json, arithmetic on the extracted value."
    ),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    )


@query(
    "fn_explode_wordcount",
    oracle="""
    SELECT t.word, CAST(count(*) AS BIGINT) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(word)
    GROUP BY t.word
    ORDER BY n DESC, t.word
    LIMIT 25
    """,
    doc=(
        "explode (lateral unnest) + aggregation: word frequency top-25. "
        "The explode is a narrow op (no shuffle); only the tiny word-count "
        "aggregate shuffles."
    ),
)
def fn_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(25)
    )


@query(
    "fn_posexplode",
    oracle="""
    SELECT doc_id, CAST(pos AS INTEGER) AS pos,
           string_split(text, ' ')[pos] AS word
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
          FROM documents)
    WHERE doc_id < 10
    """,
    doc=(
        "posexplode with 1-based position (Spark's 0-based pos shifted to "
        "match SQL ordinality; DuckDB lacks WITH ORDINALITY, so the oracle "
        "unnests a generate_series of positions)."
    ),
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           json_extract_string(j, '$.meta.type') AS vtype,
           CAST(json_extract(j, '$.meta.val') AS DOUBLE) AS vval,
           CAST(json_extract(j, '$.k') AS INTEGER) AS k
    FROM (
        SELECT event_id,
               '{"meta":{"type":"' || event_type || '","val":'
                   || CAST(value AS VARCHAR) || '},"k":'
                   || json_extract_string(props, '$.k') || '}' AS j
        FROM events
    )
    """,
    doc=(
        "Semi-structured VARIANT columns (Spark 4): build a nested JSON "
        "document from typed columns, parse_json into a VARIANT, then "
        "navigate with typed variant_get path extraction. VARIANT keeps a "
        "binary-encoded form, so repeated path reads skip re-parsing — "
        "the scale answer for schema-on-read event payloads. Number "
        "round-trips are exact: both engines print doubles as "
        "shortest-round-trip decimals."
    ),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","val":'),
        F.col("value").cast("string"),
        F.lit('},"k":'),
        F.get_json_object("props", "$.k"),
        F.lit("}"),
    )
    v = F.parse_json(j)
    return events.select(
        "event_id",
        F.variant_get(v, "$.meta.type", "string").alias("vtype"),
        F.variant_get(v, "$.meta.val", "double").alias("vval"),
        F.variant_get(v, "$.k", "int").alias("k"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS INTEGER) AS dist_name_brand,
           CAST(CASE WHEN levenshtein(p_brand, p_type) > 5 THEN -1
                     ELSE levenshtein(p_brand, p_type) END AS INTEGER) AS dist_capped
    FROM part
    """,
    doc=(
        "Edit-distance functions: plain levenshtein plus the thresholded "
        "form (distance > k reports -1), which lets Spark abandon the DP "
        "early — the scale path for fuzzy key matching where only "
        "near-matches matter."
    ),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("dist_name_brand"),
        F.levenshtein("p_brand", "p_type", 5).alias("dist_capped"),
    )


@query(
    "fn_url_parse",
    # The oracle reconstructs each component from the same inputs the URL
    # was assembled from, verifying Spark's parse_url output value-for-value.
    oracle="""
    SELECT doc_id,
           'api.example.com' AS host,
           '/corpus/' || source || '/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&rev=1' AS query_string,
           lang AS lang_param
    FROM documents
    """,
    doc="URL component extraction with parse_url (host/path/query/param).",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://api.example.com/corpus/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&rev=1"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_na_handling",
    oracle="""
    WITH oc AS (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        FROM orders GROUP BY 1
    )
    SELECT c.c_custkey,
           CAST(coalesce(oc.n_orders, 0) AS BIGINT) AS n_orders,
           round(coalesce(oc.spend, -1.0), 2) AS spend_filled,
           CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'CONSTRUCTION'
                ELSE c.c_mktsegment END AS segment
    FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey
    """,
    doc=(
        "DataFrameNaFunctions surface: na.fill for the nulls an outer "
        "join introduces (customers with no orders) and na.replace for "
        "value recoding — the imperative twins of COALESCE and CASE."
    ),
)
def fn_na_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("spend")
    )
    joined = cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
    filled = joined.na.fill({"n_orders": 0, "spend": -1.0}).na.replace(
        {"BUILDING": "CONSTRUCTION"}, subset=["c_mktsegment"]
    )
    return filled.select(
        "c_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.col("spend"), 2).alias("spend_filled"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "fn_higher_order",
    oracle="""
    WITH qs AS (
        SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
        FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey,
           CAST(len(arr) AS INT) AS n_items,
           list_sum(list_transform(arr, x -> x * 2)) AS doubled_sum,
           CAST(len(list_filter(arr, x -> x >= 30)) AS INT) AS n_heavy,
           len(list_filter(arr, x -> x = 50)) > 0 AS has_50,
           len(list_filter(arr, x -> NOT (x > 0))) = 0 AS all_pos
    FROM qs
    """,
    doc=(
        "Higher-order array functions — transform / filter / aggregate / "
        "exists / forall — over per-order quantity arrays (sorted for a "
        "deterministic fold order; quantities are integer-valued doubles, "
        "so the sequential sums are exact on both engines). These lambdas "
        "run as JVM expressions inside codegen, not UDFs."
    ),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("arr")
    )
    return grouped.select(
        "l_orderkey",
        F.size("arr").alias("n_items"),
        F.aggregate(
            F.transform("arr", lambda x: x * 2), F.lit(0.0), lambda a, x: a + x
        ).alias("doubled_sum"),
        F.size(F.filter("arr", lambda x: x >= 30)).alias("n_heavy"),
        F.exists("arr", lambda x: x == 50).alias("has_50"),
        F.forall("arr", lambda x: x > 0).alias("all_pos"),
    )


@query(
    "fn_try_safe_ops",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_num,
           round(o_totalprice / NULLIF(o_orderkey % 5, 0), 4) AS try_div,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit
    FROM orders
    """,
    doc=(
        "Error-safe expression evaluation: try_cast / try_divide return "
        "NULL instead of failing the job — at 100 TB a single malformed "
        "row must not kill a 10k-task stage. DuckDB twin: TRY_CAST and "
        "NULLIF-guarded division."
    ),
)
def fn_try_safe_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_num"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 4
        ).alias("try_div"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias("prio_digit"),
    )


@query(
    "fn_mask_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
               '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'), '[0-9]', '#', 'g')
               AS segment_masked
    FROM customer
    """,
    doc=(
        "Data masking for governed exports: Spark's mask() maps upper/"
        "lower/digit character classes to fixed replacements while "
        "preserving string shape (length, punctuation) — the standard "
        "de-identification transform for sharing datasets with "
        "format-dependent consumers. Per-row expression, zero shuffles. "
        "Oracle replays the class mapping as chained regexp_replace "
        "(digits replaced last so replacement letters survive)."
    ),
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        F.mask(
            F.col("c_mktsegment"),
            F.lit("Q"),
            F.lit("q"),
            F.lit("#"),
        ).alias("segment_masked"),
    )


@query(
    "fn_explode_outer",
    oracle="""
    WITH arr AS (
        SELECT p_partkey,
               CASE WHEN p_size >= 25
                    THEN regexp_split_to_array(p_brand, '#')
                    ELSE [] END AS pieces
        FROM part
    )
    SELECT p_partkey,
           unnest(CASE WHEN len(pieces) = 0 THEN [NULL] ELSE pieces END)
               AS piece
    FROM arr
    """,
    doc=(
        "explode_outer: rows with an EMPTY array survive the explode "
        "with a NULL element — plain explode silently drops them, the "
        "classic inner-vs-outer lateral-view bug. Oracle emulates outer "
        "semantics by substituting [NULL] for empty lists before "
        "unnest."
    ),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    pieces = F.when(
        F.col("p_size") >= 25, F.split("p_brand", "#")
    ).otherwise(F.array().cast("array<string>"))
    return part.select(
        "p_partkey", F.explode_outer(pieces).alias("piece")
    )


@query(
    "fn_regexp_suite",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_number_runs,
           nullif(regexp_extract(text, '[0-9]+'), '') AS first_number,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS INTEGER) AS n_ws_tokens,
           regexp_replace(text, '[aeiou]', '_', 'g') LIKE '%the%' AS has_the_after
    FROM documents WHERE doc_id < 200
    """,
    doc=(
        "Regexp function suite: regexp_extract_all (count of digit runs), "
        "regexp_extract first match (nullif-normalized — Spark returns "
        "'' on no-match at group 0, DuckDB's semantics differ only there), "
        "regexp split token count, and regexp_replace composed under a "
        "LIKE. All per-row JVM expressions inside one codegen stage; "
        "filter pushed to the scan."
    ),
)
def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_number_runs"),
        F.nullif(F.regexp_extract("text", "[0-9]+", 0), F.lit("")).alias("first_number"),
        F.size(F.split("text", r"\s+")).alias("n_ws_tokens"),
        F.regexp_replace("text", "[aeiou]", "_").like("%the%").alias("has_the_after"),
    )


@query(
    "fn_bit_ops",
    oracle="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT) AS low_byte,
           CAST(xor(event_id, 2863311530) AS BIGINT) AS xored,
           CAST(event_id << 3 AS BIGINT) AS shl3,
           CAST(event_id >> 2 AS BIGINT) AS shr2,
           CAST(bit_count(event_id) AS INTEGER) AS popcount
    FROM events WHERE event_id < 500
    """,
    doc=(
        "Bit-manipulation suite: AND/XOR masks, shifts, popcount — the "
        "primitives under bitmap indexes, bloom filters, and packed-flag "
        "columns. All per-row JVM expressions in one codegen stage."
    ),
)
def fn_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseXOR(F.lit(2863311530)).alias("xored"),
        F.shiftleft("event_id", 3).alias("shl3"),
        F.shiftright("event_id", 2).alias("shr2"),
        F.bit_count("event_id").alias("popcount"),
    )


@query(
    "fn_codec_roundtrip",
    oracle="""
    SELECT doc_id,
           base64(encode(substring(text, 1, 24))) AS b64,
           to_hex(encode(substring(text, 1, 8))) AS hex8,
           md5(text) AS md5_hex,
           CAST(octet_length(from_base64(base64(encode(substring(text, 1, 24)))))
                AS INTEGER) AS b64_roundtrip_len
    FROM documents WHERE doc_id < 200
    """,
    doc=(
        "Binary codec round-trips: base64/unbase64, hex, md5 over utf-8 "
        "bytes — the encode/decode surface for payload columns. The "
        "base64 output and the round-tripped byte length are both "
        "checked, so encode AND decode must be byte-exact."
    ),
)
def fn_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    head24 = F.substring("text", 1, 24)
    return docs.select(
        "doc_id",
        F.base64(head24.cast("binary")).alias("b64"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("hex8"),
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        F.length(F.unbase64(F.base64(head24.cast("binary")))).alias("b64_roundtrip_len"),
    )


@query(
    "fn_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_diff('month', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                AS INTEGER) AS whole_months_to_cutoff,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr
    FROM orders WHERE o_orderkey < 500
    """,
    doc=(
        "Date arithmetic suite: interval add, month truncation, "
        "last_day, calendar-month difference, day-of-week, quarter. "
        "Cross-engine pinning: Spark dayofweek is 1-based Sunday, DuckDB "
        "0-based (+1 in the oracle); the month difference is computed as "
        "the calendar-boundary count (year*12+month delta), which is "
        "DuckDB's date_diff('month') semantics exactly."
    ),
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    cutoff = F.lit("1998-12-01").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 90).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        ((F.year(cutoff) - F.year(d)) * 12 + (F.month(cutoff) - F.month(d)))
        .cast("int")
        .alias("whole_months_to_cutoff"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("qtr"),
    )


@query(
    "fn_uuid5_like",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('pes:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents
        WHERE doc_id < 300
    )
    SELECT doc_id,
           substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-5' ||
           substring(hx, 14, 3) || '-' || substring(hx, 17, 4) || '-' ||
           substring(hx, 21, 12) AS doc_uuid
    FROM h
    """,
    doc=(
        "Deterministic name-based UUID (v5-style layout over md5 of a "
        "namespaced key): the stable surrogate-key generator for "
        "idempotent pipelines — re-running an ingest produces the SAME "
        "ids, unlike uuid()/rand(). Pure per-row string slicing of the "
        "hex digest into the 8-4-4-4-12 grouping with the version "
        "nibble pinned."
    ),
)
def fn_uuid5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    hx = F.md5(F.concat(F.lit("pes:"), F.col("doc_id").cast("string")))
    d = docs.select("doc_id", hx.alias("hx"))
    return d.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.substring("hx", 1, 8),
            F.substring("hx", 9, 4),
            F.concat(F.lit("5"), F.substring("hx", 14, 3)),
            F.substring("hx", 17, 4),
            F.substring("hx", 21, 12),
        ).alias("doc_uuid"),
    )


@query(
    "fn_char_suite",
    oracle="""
    SELECT doc_id,
           ascii(substring(text, 1, 1)) AS first_cp,
           chr(97 + CAST(doc_id % 26 AS INTEGER)) AS cycle_char,
           translate(substring(text, 1, 40), 'aeiou', '#####') AS vowels_masked,
           left(text, 5) AS head5,
           right(text, 5) AS tail5,
           reverse(substring(text, 1, 10)) AS rev10,
           repeat(substring(text, 1, 2), 3) AS rep3
    FROM documents WHERE doc_id < 300
    """,
    doc=(
        "Character-function suite: ascii/chr code-point round trips, "
        "translate masking, left/right slicing, reverse, repeat — the "
        "remaining scalar string surface beyond fn_string. All per-row "
        "JVM expressions in one codegen stage."
    ),
)
def fn_char_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.chr(97 + (F.col("doc_id") % 26)).alias("cycle_char"),
        F.translate(F.substring("text", 1, 40), "aeiou", "#####").alias("vowels_masked"),
        F.left("text", F.lit(5)).alias("head5"),
        F.right("text", F.lit(5)).alias("tail5"),
        F.reverse(F.substring("text", 1, 10)).alias("rev10"),
        F.repeat(F.substring("text", 1, 2), 3).alias("rep3"),
    )


@query(
    "fn_base_conversion",
    oracle="""
    SELECT event_id,
           lower(to_hex(event_id)) AS hex_str,
           CAST(('0x' || to_hex(event_id))::BIGINT AS BIGINT) AS hex_roundtrip,
           bin(event_id) AS bin_str
    FROM events WHERE event_id < 300
    """,
    doc=(
        "Radix conversion: conv() to hex and binary and back (the "
        "primitive under shard-key prefixes and bitmap debugging); hex "
        "case pinned cross-engine via lower(). Per-row expressions, "
        "pushed filter."
    ),
)
def fn_base_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    hex_str = F.lower(F.conv(F.col("event_id").cast("string"), 10, 16))
    return ev.select(
        "event_id",
        hex_str.alias("hex_str"),
        F.conv(hex_str, 16, 10).cast("long").alias("hex_roundtrip"),
        F.conv(F.col("event_id").cast("string"), 10, 2).alias("bin_str"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id, true AS roundtrip_ok,
           CAST(octet_length(encode(text)) AS INTEGER) AS plaintext_bytes
    FROM documents WHERE doc_id < 200
    """,
    doc=(
        "AES encrypt/decrypt round-trip: aes_decrypt(aes_encrypt(x)) "
        "must reproduce the plaintext byte-for-byte (GCM mode, random "
        "IV, so the CIPHERTEXT is non-deterministic and only the "
        "round-trip identity is checkable — the oracle pins exactly "
        "that plus the byte length). The column-level encryption "
        "primitive for PII-bearing exports."
    ),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    ct = F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary"))
    pt = F.aes_decrypt(ct, key.cast("binary"))
    return docs.select(
        "doc_id",
        (pt == F.col("text").cast("binary")).alias("roundtrip_ok"),
        F.length(F.col("text").cast("binary")).alias("plaintext_bytes"),
    )


@query(
    "fn_struct_json_roundtrip",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars))
               AS js,
           json_extract_string(
               to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)),
               '$.lang') AS lang_back
    FROM documents WHERE doc_id < 300
    """,
    doc=(
        "Struct -> JSON -> field round-trip: named-struct construction, "
        "to_json serialization (key order and number formatting agree "
        "across engines for integer fields), and get_json_object "
        "extraction back out — the nested-record export path checked "
        "end-to-end on VALUES, not just schema."
    ),
)
def fn_struct_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    js = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    return docs.select(
        "doc_id",
        js.alias("js"),
        F.get_json_object(js, "$.lang").alias("lang_back"),
    )

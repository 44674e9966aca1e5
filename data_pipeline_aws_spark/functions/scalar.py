"""Scalar function sweep (SURVEY §2.7): string, date/time, array, JSON.

The reference's FHIR domain (`/root/reference/Hoth/FHIR/` — deeply nested
JSON resources) commits the engine to JSON extraction and array handling;
these queries exercise each family over `events`, `documents`, `orders`, and
`embeddings`.

All expressions are JVM-side builtins (whole-stage codegen); nothing here
leaves the executor's generated code, so throughput is scan-bound at any
scale. Parity conventions: dates emitted as formatted strings or timestamps
(never DATE), epoch arithmetic in integer microseconds, 1-based substring
indexing on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table


@query(
    "q_str_funcs",
    oracle="""
SELECT
  doc_id,
  UPPER(lang)                                        AS lang_uc,
  LENGTH(text)                                       AS text_len,
  LEN(string_split(text, ' '))                       AS n_tokens,
  string_split(text, ' ')[1]                         AS first_token,
  SUBSTRING(text, 1, 12)                             AS prefix12,
  CONCAT(lang, ':', source)                          AS lang_source,
  REPLACE(source, 'src', 'S')                        AS source_short,
  regexp_extract(text, '([a-z]+)', 1)                AS first_word,
  regexp_replace(text, ' ', '_', 'g')                AS snake,
  TRIM(' ' || lang || ' ')                           AS lang_trim,
  CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END     AS mentions_join
FROM documents
""",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper, length, split, substring, concat, replace,
    regexp_extract, regexp_replace, trim, LIKE."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length("text").alias("text_len"),
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S")).alias("source_short"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", " ", "_").alias("snake"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.when(F.col("text").like("%join%"), 1).otherwise(0).alias("mentions_join"),
    )


@query(
    "q_date_funcs",
    oracle="""
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT)                      AS order_year,
  CAST(month(o_orderdate) AS INT)                     AS order_month,
  CAST(dayofmonth(o_orderdate) AS INT)                AS order_day,
  date_trunc('month', o_orderdate)                    AS month_start,
  strftime(o_orderdate, '%Y-%m-%d')                   AS order_day_str,
  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch95,
  o_orderdate + INTERVAL 30 DAY                       AS due_date,
  CAST(epoch(o_orderdate) AS BIGINT)                  AS unix_sec
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: component extraction, truncation, formatting, day
    arithmetic, intervals, epoch seconds."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day_str"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch95"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


@query(
    "q_array_funcs",
    oracle="""
SELECT
  vec_id,
  label,
  LEN(embedding)                                   AS dim,
  pos - 1                                          AS pos,
  val
FROM (
  SELECT vec_id, label, embedding,
         unnest(embedding[1:8])                    AS val,
         generate_subscripts(embedding[1:8], 1)    AS pos
  FROM embeddings
  WHERE vec_id < 100
)
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, slice, positional explode over the embedding
    vectors (multimodal array columns passing through relational ops).
    posexplode is 0-based; the oracle subtracts 1 from 1-based subscripts."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.posexplode(F.slice("embedding", 1, 8)),
        )
        .withColumnsRenamed({"col": "val"})
    )


@query(
    "q_json_extract",
    oracle="""
SELECT
  event_type,
  COUNT(*)                                                       AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the `events.props` string column (the FHIR-style
    semi-structured path), aggregated per event type. Uses get_json_object —
    a codegen'd JVM path, no UDF."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_higher_order",
    oracle="""
SELECT
  vec_id,
  ROUND(list_aggregate(list_transform(e16, x -> x * x), 'sum'), 6)      AS sum_sq,
  LEN(list_filter(e16, x -> x > 0))                                     AS n_pos,
  LEN(list_filter(e16, x -> x > 2.0)) > 0                               AS any_gt2,
  ROUND(list_dot_product(e16, list_reverse(e16)), 6)                    AS rev_dot
FROM (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS e16 FROM embeddings WHERE vec_id < 200)
""",
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / exists / zip_with /
    aggregate — all JVM-side lambda expressions inside codegen, the idiomatic
    way to compute over array<float> columns without exploding row counts."""
    e = table(spark, sf_dir, "embeddings")
    e16 = F.transform(F.slice("embedding", 1, 16), lambda x: x.cast("double"))
    d = e.filter(F.col("vec_id") < 200).select("vec_id", e16.alias("e16"))
    sum_sq = F.aggregate(
        F.transform("e16", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    rev_dot = F.aggregate(
        F.zip_with("e16", F.reverse("e16"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "vec_id",
        F.round(sum_sq, 6).alias("sum_sq"),
        F.size(F.filter("e16", lambda x: x > 0)).alias("n_pos"),
        F.exists("e16", lambda x: x > 2.0).alias("any_gt2"),
        F.round(rev_dot, 6).alias("rev_dot"),
    )


@query(
    "q_map_funcs",
    oracle="""
SELECT
  event_type,
  COUNT(*)                                                            AS n_events,
  CAST(SUM(LEN(json_keys(props))) AS BIGINT)                          AS total_keys,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed semi-structured access: props parsed to map<string,bigint>
    via from_json, then map_keys / element_at — the MapType path the FHIR
    JSON domain implies (vs. q_json_extract's string-path extraction)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select("event_type", m.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.size(F.map_keys("m"))).alias("total_keys"),
            F.sum(F.element_at("m", "k")).alias("sum_k"),
        )
    )

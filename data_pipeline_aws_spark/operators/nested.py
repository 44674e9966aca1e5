"""Nested / semi-structured document operators (SURVEY §0, §2.7).

The reference's data domain is FHIR — deeply nested JSON resources
(`/root/reference/Hoth/FHIR/` is the project root; the Glue job that would
process them, `Hoth/FHIR/glue/etl_script.py`, is 0 bytes). The two
Glue-transform verbs that domain implies are:

- **Relationalize**: flatten a nested document into relational rows — struct
  fields become dotted columns, array elements become child rows with a
  (parent-key, array-index) foreign key. Here that is pure Catalyst:
  ``from_json`` with an explicit nested schema, dotted-path projection, and
  ``posexplode`` — all JVM-side, codegen'd, no UDF.
- **ResolveChoice**: a JSON field that is sometimes a number and sometimes a
  string (Glue's "choice type") resolved by casting — ``try_cast`` keeps the
  castable values and nulls the rest, exactly Glue's ``cast:long`` option.

Scale notes (100 TB): both operators are per-row narrow transformations —
no shuffle at all until the final aggregate/explode consumer. ``from_json``
with an explicit schema (never schema inference on the full corpus) is the
scale path: inference is a second full scan. posexplode multiplies rows
INSIDE a whole-stage-codegen pipeline — no materialization of the nested
form. The nest→serialize step in q_fhir_relationalize exists to create test
documents from the star schema; a real deployment reads the JSON directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_aws_spark.registry import query
from data_pipeline_aws_spark.tables import table

# Explicit schema-on-read for the FHIR-style customer document. Explicit
# (not inferred) so the parquet→JSON→struct path is single-scan at scale.
_DOC_SCHEMA = (
    "struct<id:bigint,name:string,"
    "profile:struct<segment:string,nation:int>,"
    "orders:array<struct<o_orderkey:bigint,o_totalprice:double>>>"
)


@query(
    "q_fhir_relationalize",
    oracle="""
SELECT
  c_custkey                                              AS custkey,
  c_name                                                 AS name,
  c_mktsegment                                           AS segment,
  CAST(c_nationkey AS INT)                               AS nation,
  CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_orderkey) - 1
       AS BIGINT)                                        AS order_idx,
  o_orderkey                                             AS orderkey,
  o_totalprice                                           AS totalprice
FROM customer
JOIN orders ON o_custkey = c_custkey
""",
)
def q_fhir_relationalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationalize a nested FHIR-style document back to relational rows.

    Builds one JSON document per customer (root fields + nested profile
    struct + sorted orders array) from the star schema, then runs the actual
    operator under test: ``from_json`` with an explicit nested schema,
    dotted-path struct access, and ``posexplode`` of the array into child
    rows carrying (parent key, 0-based array index) — Glue Relationalize
    semantics expressed as a single Catalyst pipeline. The oracle is the
    equivalent flat join with ROW_NUMBER()-1 as the array index; matching
    proves the nest→serialize→parse→flatten roundtrip is lossless (including
    bit-exact double roundtrip through JSON shortest-repr printing).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    docs = (
        o.groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("o_orderkey", "o_totalprice"))
            ).alias("orders")
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            F.to_json(
                F.struct(
                    F.col("c_custkey").alias("id"),
                    F.col("c_name").alias("name"),
                    F.struct(
                        F.col("c_mktsegment").alias("segment"),
                        F.col("c_nationkey").cast("int").alias("nation"),
                    ).alias("profile"),
                    F.col("orders"),
                )
            ).alias("doc")
        )
    )
    parsed = docs.select(F.from_json("doc", _DOC_SCHEMA).alias("r"))
    return (
        parsed.select(
            F.col("r.id").alias("custkey"),
            F.col("r.name").alias("name"),
            F.col("r.profile.segment").alias("segment"),
            F.col("r.profile.nation").alias("nation"),
            F.posexplode("r.orders"),
        )
        .select(
            "custkey",
            "name",
            "segment",
            "nation",
            F.col("pos").cast("long").alias("order_idx"),
            F.col("col.o_orderkey").alias("orderkey"),
            F.col("col.o_totalprice").alias("totalprice"),
        )
    )


# 3-level bundle schema: Bundle → observation[] → component[] on one
# branch, Patient name[] → given[] on the other. Explicit, never inferred.
_BUNDLE_SCHEMA = (
    "struct<id:bigint,"
    "name:array<struct<family:string,given:array<string>>>,"
    "observation:array<struct<o_orderkey:bigint,"
    "component:array<struct<l_linenumber:int,qty:double,extended:double>>>>>"
)


@query(
    "q_fhir_bundle_deep",
    oracle="""
SELECT
  c_custkey                                               AS custkey,
  c_name                                                  AS family,
  array_to_string(string_split(c_name, '#'), ' ')         AS given_all,
  CAST(DENSE_RANK() OVER (PARTITION BY c_custkey ORDER BY o_orderkey) - 1
       AS BIGINT)                                         AS obs_idx,
  o_orderkey                                              AS orderkey,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey
         ORDER BY l_linenumber, l_quantity, l_extendedprice) - 1
       AS BIGINT)                                         AS comp_idx,
  l_linenumber                                            AS linenumber,
  l_quantity                                              AS qty,
  l_extendedprice                                         AS extended
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
""",
)
def q_fhir_bundle_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationalize a GENUINELY DEEP FHIR bundle — three nesting levels on
    the resource branch (Bundle → Observation entry[] → component[], the
    reference domain's Observation.component shape) plus a parallel
    string-array branch (Patient name[] → given[]). The fixture builds one
    JSON bundle per customer from the 3-table star (customer → orders →
    lineitem), so array cardinalities at BOTH levels vary row by row; the
    operator under test is `from_json` with the explicit 3-level schema,
    nested-array indexing into name[0].given, and a CHAIN of two
    `posexplode`s emitting the grandchild table with full (fk, idx)
    lineage — custkey → obs_idx → comp_idx — Glue Relationalize's
    child/grandchild table emission as one Catalyst pipeline. The oracle
    replays the lineage with DENSE_RANK (parent index is constant across a
    parent's grandchildren) and ROW_NUMBER (child index, tie-broken on the
    FULL struct tuple — the fixture's l_linenumber is NOT unique per
    order, so the oracle mirrors sort_array's field-by-field struct
    comparison), and matching
    proves the 3-level nest→serialize→parse→double-flatten roundtrip is
    lossless including bit-exact doubles at the deepest level.

    Scale shape: two shuffles build the fixture's nested arrays (lineitem
    → per-order components, orders → per-customer observations — both
    bounded TPC-H group sizes); a real deployment reads the bundles
    directly and the whole parse→flatten is a per-row narrow pipeline,
    zero shuffle, codegen'd, no UDF — posexplode multiplies rows inside
    whole-stage codegen without materializing the nested form."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    comp = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_linenumber",
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("extended"),
                )
            )
        ).alias("component")
    )
    obs = (
        o.join(comp, o.o_orderkey == comp.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("o_orderkey", "component"))
            ).alias("observation")
        )
    )
    docs = obs.join(c, obs.o_custkey == c.c_custkey).select(
        F.to_json(
            F.struct(
                F.col("c_custkey").alias("id"),
                F.array(
                    F.struct(
                        F.col("c_name").alias("family"),
                        F.split(F.col("c_name"), "#").alias("given"),
                    )
                ).alias("name"),
                F.col("observation"),
            )
        ).alias("doc")
    )
    parsed = docs.select(F.from_json("doc", _BUNDLE_SCHEMA).alias("r"))
    level1 = parsed.select(
        F.col("r.id").alias("custkey"),
        F.col("r.name")[0]["family"].alias("family"),
        F.array_join(F.col("r.name")[0]["given"], " ").alias("given_all"),
        F.posexplode("r.observation").alias("obs_idx", "obs"),
    )
    return level1.select(
        "custkey",
        "family",
        "given_all",
        F.col("obs_idx").cast("long").alias("obs_idx"),
        F.col("obs.o_orderkey").alias("orderkey"),
        F.posexplode("obs.component").alias("comp_idx", "comp"),
    ).select(
        "custkey",
        "family",
        "given_all",
        "obs_idx",
        "orderkey",
        F.col("comp_idx").cast("long").alias("comp_idx"),
        F.col("comp.l_linenumber").alias("linenumber"),
        F.col("comp.qty").alias("qty"),
        F.col("comp.extended").alias("extended"),
    )


@query(
    "q_fhir_renest",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         o_orderkey                                   AS orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)    AS cents
  FROM orders
),
agg AS (
  SELECT o_custkey,
         list(struct_pack(orderkey := orderkey, cents := cents)
              ORDER BY orderkey)                      AS orders,
         COUNT(*)                                     AS n_orders
  FROM o GROUP BY o_custkey
)
SELECT c_custkey                                      AS custkey,
       CAST(n_orders AS BIGINT)                       AS n_orders,
       to_json(struct_pack(
         id      := c_custkey,
         name    := c_name,
         profile := struct_pack(segment := c_mktsegment,
                                nation  := CAST(c_nationkey AS INT)),
         orders  := orders))                          AS doc
FROM agg JOIN customer ON c_custkey = o_custkey
""",
)
def q_fhir_renest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENEST — the inverse ETL verb of q_fhir_relationalize and the FHIR
    write path the reference's S3-writing Glue job implies (domain:
    `/root/reference/Hoth/FHIR/`; the job is declared at
    `Hoth/FHIR/cloudformations/lambda-stack.yml:11-21`): rebuild the
    Bundle-shaped nested document from the relational star. Child rows
    collapse into a lineage-ORDERED array (`sort_array(collect_list(
    struct(...)))` — deterministic array order is what makes the written
    document reproducible run-over-run), root + struct branches assemble
    with `F.struct`, and the document serializes with `to_json`. Money
    rides integer cents (the repo-wide rule) because JSON double
    rendering differs across engines ('1e30' vs '1.0E30') while integer
    rendering is byte-identical — the oracle rebuilds the same document
    with DuckDB `list(struct_pack(...) ORDER BY ...)` + `to_json` and the
    hash compare proves the two engines emit the same canonical bytes.
    The round-trip law (relationalize ∘ renest = identity) is pinned by
    the property suite.

    Scale shape: ONE shuffle — the groupBy(custkey) that gathers each
    parent's children (bounded TPC-H group sizes; a pathological
    million-child parent would need the q_domain_cap treatment first) —
    then a broadcast-or-shuffle FK join to the parent table and a
    map-side struct/serialize pipeline, all codegen'd, no UDF. At 100 TB
    the written bundles partition by parent-key range exactly like any
    partitioned sink; nothing here is driver-side."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    nested = (
        o.select(
            "o_custkey",
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.expr(
                    "cast(round(o_totalprice * 100) as bigint)"
                ).alias("cents"),
            ).alias("entry"),
        )
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list("entry")).alias("orders"))
    )
    return nested.join(c, nested.o_custkey == c.c_custkey).select(
        F.col("c_custkey").alias("custkey"),
        F.size("orders").cast("long").alias("n_orders"),
        F.to_json(
            F.struct(
                F.col("c_custkey").alias("id"),
                F.col("c_name").alias("name"),
                F.struct(
                    F.col("c_mktsegment").alias("segment"),
                    F.col("c_nationkey").cast("int").alias("nation"),
                ).alias("profile"),
                F.col("orders"),
            )
        ).alias("doc"),
    )


@query(
    "q_fhir_renest_deep",
    oracle="""
WITH l AS (
  SELECT l_orderkey,
         l_linenumber                                 AS linenumber,
         CAST(ROUND(l_quantity * 100) AS BIGINT)      AS qty_cents,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ext_cents
  FROM lineitem
),
comp AS (
  SELECT l_orderkey,
         list(struct_pack(linenumber := linenumber,
                          qty_cents  := qty_cents,
                          ext_cents  := ext_cents)
              ORDER BY linenumber, qty_cents, ext_cents) AS lines,
         COUNT(*)                                     AS n_lines
  FROM l GROUP BY l_orderkey
),
obs AS (
  SELECT o_custkey,
         list(struct_pack(orderkey := o_orderkey, lines := lines)
              ORDER BY o_orderkey)                    AS orders,
         CAST(SUM(n_lines) AS BIGINT)                 AS n_lines,
         COUNT(*)                                     AS n_orders
  FROM orders JOIN comp ON o_orderkey = l_orderkey
  GROUP BY o_custkey
)
SELECT c_custkey                                      AS custkey,
       CAST(n_orders AS BIGINT)                       AS n_orders,
       n_lines,
       to_json(struct_pack(
         id      := c_custkey,
         name    := c_name,
         profile := struct_pack(segment := c_mktsegment,
                                nation  := CAST(c_nationkey AS INT)),
         orders  := orders))                          AS doc
FROM obs JOIN customer ON c_custkey = o_custkey
""",
)
def q_fhir_renest_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep RENEST — the 3-level inverse of q_fhir_bundle_deep: rebuild
    Bundle → Observation entry[] → component[] documents from the
    customer → orders → lineitem star, with BOTH array levels
    lineage-ordered deterministically (components by the FULL
    (linenumber, qty_cents, ext_cents) tuple — l_linenumber is NOT
    unique per order, the q_allocation sf1.0 lesson applied proactively;
    observations by unique orderkey) and money as integer cents at the
    deepest level so the JSON bytes are engine-identical. Two nested
    `sort_array(collect_list(struct(...)))` gathers compose exactly like
    the relationalize direction's two posexplodes invert them; the
    DuckDB oracle rebuilds the same nesting with nested
    `list(struct_pack(...) ORDER BY ...)` aggregates and the hash
    compare grades the full serialized document.

    Scale shape: two shuffles, both on the natural FK keys (lineitem →
    order grain, orders → customer grain — bounded TPC-H group sizes),
    then the parent broadcast join and a map-side serialize; no UDF, no
    window, no driver path. This is the Glue-FHIR write job's actual
    output shape (`Hoth/FHIR/`; lambda-stack.yml:11-21) at its real
    depth."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    comp = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("linenumber"),
                F.expr("cast(round(l_quantity * 100) as bigint)").alias(
                    "qty_cents"
                ),
                F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
                    "ext_cents"
                ),
            ).alias("line"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list("line")).alias("lines"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    obs = (
        o.join(comp, o.o_orderkey == comp.l_orderkey)
        .select(
            "o_custkey",
            "n_lines",
            F.struct(F.col("o_orderkey").alias("orderkey"), F.col("lines")).alias(
                "entry"
            ),
        )
        .groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("entry")).alias("orders"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return obs.join(c, obs.o_custkey == c.c_custkey).select(
        F.col("c_custkey").alias("custkey"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "n_lines",
        F.to_json(
            F.struct(
                F.col("c_custkey").alias("id"),
                F.col("c_name").alias("name"),
                F.struct(
                    F.col("c_mktsegment").alias("segment"),
                    F.col("c_nationkey").cast("int").alias("nation"),
                ).alias("profile"),
                F.col("orders"),
            )
        ).alias("doc"),
    )


@query(
    "q_fhir_choice",
    oracle="""
SELECT
  event_type,
  COUNT(CASE WHEN event_id % 3 <> 0 THEN 1 END)                  AS n_long,
  COUNT(CASE WHEN event_id % 3 = 0 THEN 1 END)                   AS n_str,
  CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN event_id END) AS BIGINT) AS sum_v
FROM events
GROUP BY event_type
""",
)
def q_fhir_choice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResolveChoice: a JSON field with mixed runtime types (number for 2/3
    of events, non-numeric string for the rest — synthesized deterministically
    from event_id so the oracle can state the expected outcome without JSON
    machinery), resolved Glue-style with ``cast:long``: ``try_cast`` keeps
    numeric values and nulls the strings, then the aggregate counts both
    populations. All codegen'd string/JSON expressions — no UDF, no shuffle
    before the final groupBy."""
    e = table(spark, sf_dir, "events")
    mixed = F.concat(
        F.lit('{"v": '),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('"s'), F.col("event_id").cast("string"), F.lit('"')),
        ).otherwise(F.col("event_id").cast("string")),
        F.lit("}"),
    )
    v = F.expr("try_cast(v_raw AS bigint)")
    return (
        e.select("event_type", F.get_json_object(mixed, "$.v").alias("v_raw"))
        .groupBy("event_type")
        .agg(
            F.count("v_raw").alias("_n_all"),
            F.count(v).alias("n_long"),
            F.sum(v).alias("sum_v"),
        )
        .select(
            "event_type",
            "n_long",
            (F.col("_n_all") - F.col("n_long")).alias("n_str"),
            "sum_v",
        )
    )


@query(
    "q_variant_json",
    oracle="""
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT)   AS sum_k,
       CAST(MIN(k) AS BIGINT)   AS min_k,
       CAST(MAX(k) AS BIGINT)   AS max_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
) GROUP BY event_type
""",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data via Spark 4's VARIANT type: `parse_json` the
    raw props payload ONCE into a binary variant column, then
    `variant_get` typed paths out of it — the modern replacement for
    repeated `get_json_object` string re-parsing (VARIANT parses once
    into a binary form; each extraction is a cheap binary traversal, and
    at 100 TB 'parse once, extract many' is the difference between one
    and N full JSON parses per row). The shredded aggregate per event
    type hash-checks against DuckDB's native JSON extraction.

    This is the Glue-DynamicFrame choice-type story (SURVEY §1.2) done
    the Spark-4 way: keep the payload semi-structured in ONE column,
    extract typed views lazily, let nulls mark absent paths."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "q_fhir_reference_resolve",
    oracle="""
WITH enc AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0
              THEN 'Patient/' || CAST(-(o_custkey + 1) AS VARCHAR)
              WHEN o_orderkey % 89 = 0
              THEN 'Practitioner/' || CAST(o_custkey AS VARCHAR)
              ELSE 'Patient/' || CAST(o_custkey AS VARCHAR) END AS ref
  FROM orders
),
parsed AS (
  SELECT o_orderkey,
         string_split(ref, '/')[1] AS ref_type,
         CAST(string_split(ref, '/')[2] AS BIGINT) AS ref_id
  FROM enc
),
resolved AS (
  SELECT p.ref_type, p.ref_id, c.c_mktsegment
  FROM parsed p
  LEFT JOIN customer c
    ON p.ref_id = c.c_custkey AND p.ref_type = 'Patient'
)
SELECT CASE WHEN ref_type <> 'Patient' THEN '(foreign-type)'
            WHEN c_mktsegment IS NULL  THEN '(dangling)'
            ELSE c_mktsegment END         AS ref_target_segment,
       CAST(COUNT(*) AS BIGINT)           AS n_encounters,
       CAST(COUNT(DISTINCT ref_id) AS BIGINT) AS n_ref_ids
FROM resolved
GROUP BY 1
""",
)
def q_fhir_reference_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FHIR reference resolution: Encounter-style resources carry literal
    reference strings ('Patient/<id>'); parse the type/id pair, resolve
    ONLY type-matching references against the Patient table, and report
    resolution by target segment with '(dangling)' (id not found) and
    '(foreign-type)' (reference to a non-Patient resource) buckets — the
    FHIR-ETL verb between relationalize and FK-profiling
    (q_fd_discovery's IND check is the schema-level cousin; this is
    instance-level resolution with attribution). Deterministic slices of
    the fixture exercise both failure paths: ~1% dangling (orderkey %
    97, NEGATIVE ids — no valid customer key at any SF, so the broken
    path survives scale-up) and ~1% foreign-type (orderkey % 89,
    'Practitioner/<id>' — the id exists but the type gate must refuse to
    resolve it).

    Reference parsing is in-row string split (codegen'd); resolution is
    one equi-join on (parsed id, type gate) — at 100 TB the parse cost
    is map-side and the join shuffles on the parsed id exactly as a
    native FK join would; the output collapses to the bounded
    segment-grain report. n_ref_ids counts distinct REFERENCED ids per
    bucket — Patient ids in resolved/dangling buckets, Practitioner ids
    in the '(foreign-type)' bucket."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    enc = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.concat(
                F.lit("Patient/"), (-(F.col("o_custkey") + 1)).cast("string")
            ),
        )
        .when(
            F.col("o_orderkey") % 89 == 0,
            F.concat(F.lit("Practitioner/"), F.col("o_custkey").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("Patient/"), F.col("o_custkey").cast("string"))
        )
        .alias("ref"),
    )
    parsed = enc.select(
        "o_orderkey",
        F.split_part(F.col("ref"), F.lit("/"), F.lit(1)).alias("ref_type"),
        F.split_part(F.col("ref"), F.lit("/"), F.lit(2)).cast("long").alias("ref_id"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    resolved = parsed.join(
        c,
        (parsed.ref_id == c.c_custkey) & (parsed.ref_type == "Patient"),
        "left",
    )
    bucket = (
        F.when(F.col("ref_type") != "Patient", "(foreign-type)")
        .when(F.col("c_mktsegment").isNull(), "(dangling)")
        .otherwise(F.col("c_mktsegment"))
    )
    return resolved.groupBy(bucket.alias("ref_target_segment")).agg(
        F.count(F.lit(1)).alias("n_encounters"),
        F.count_distinct("ref_id").alias("n_ref_ids"),
    )

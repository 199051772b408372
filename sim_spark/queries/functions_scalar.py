"""Scalar function families (SURVEY.md §2.8) — one wide projection per
family so a single oracle hash covers every function.

Dialect notes (verified against DuckDB 1.0): Spark ``instr`` ≡ DuckDB
``strpos``; Spark arrays are 0-indexed, DuckDB lists 1-indexed; Spark
``dayofweek`` is 1=Sunday, DuckDB 0=Sunday; ANSI Spark casts double→int by
truncation while DuckDB rounds — so no bare double→int casts anywhere.
Oracles produce equivalent *values* in plain SQL; they don't have to
mirror Spark's internal construction (maps/structs project back to
scalars before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       length(p_name) AS name_len,
       upper(p_name) AS name_upper,
       lower(p_type) AS type_lower,
       trim('  ' || p_name || ' ') AS name_trim,
       substring(p_name, 1, 4) AS name_sub,
       p_brand || ':' || p_type AS brand_type,
       replace(p_name, ' ', '_') AS name_repl,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       rpad(p_brand, 10, '.') AS brand_pad,
       strpos(p_name, 'ring') AS ring_pos,
       str_split(p_name, ' ')[1] AS first_word,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devowel,
       CASE WHEN starts_with(p_type, 'PROMO') THEN 1 ELSE 0 END AS is_promo,
       CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END AS ends_bolt
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: length/case/trim/substring/concat/replace/pad/
    position/split/regexp/prefix/suffix in one projection."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").cast("bigint").alias("name_len"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.substring("p_name", 1, 4).alias("name_sub"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 10, ".").alias("brand_pad"),
        F.instr("p_name", "ring").cast("bigint").alias("ring_pos"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devowel"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("is_promo"),
        F.when(F.col("p_name").endswith("bolt"), 1).otherwise(0).alias("ends_bolt"),
    )


@query(
    "fn_date_time",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mon,
       day(o_orderdate) AS dom,
       dayofweek(o_orderdate) AS dow_sun0,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d %H:%M:%S') AS week_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
         AS days_since_95,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
       strftime(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS plus_2mo,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
       strftime(o_orderdate, '%Y/%m/%d') AS fmt_slash
FROM orders
""",
)
def fn_date_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. dow is normalized to the Sunday=0 convention
    (Spark's dayofweek is 1-based Sunday, DuckDB's 0-based)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        (F.dayofweek(d) - 1).cast("bigint").alias("dow_sun0"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd HH:mm:ss").alias("week_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.add_months(d.cast("date"), 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.unix_timestamp(d).alias("epoch_sec"),
        F.date_format(d, "yyyy/MM/dd").alias("fmt_slash"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       ABS(l_discount - 0.05) AS disc_dev,
       ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(LOG10(l_extendedprice), 6) AS price_log10,
       ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
       l_partkey % 7 AS pk_mod7,
       CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign,
       GREATEST(l_quantity, 25.0) AS qty_hi,
       LEAST(l_quantity, 25.0) AS qty_lo
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family; transcendentals rounded to 6dp to absorb ≤1-ulp libm
    drift between the JVM and DuckDB's C++ runtime."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
       CASE WHEN o_orderstatus = 'O' AND o_totalprice > 100000 THEN 'big-open'
            WHEN o_orderstatus = 'O' OR o_orderpriority = '1-URGENT' THEN 'watch'
            ELSE 'other' END AS bucket
FROM orders
""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains, coalesce/nullif, boolean composition."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        F.when((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000), "big-open")
        .when((F.col("o_orderstatus") == "O") | (F.col("o_orderpriority") == "1-URGENT"), "watch")
        .otherwise("other")
        .alias("bucket"),
    )


@query(
    "fn_cast_decimal",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS exact_sum,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS qty_total,
       MIN(CAST(l_orderkey AS VARCHAR)) AS min_key_str,
       MAX(CAST(CAST(l_tax AS VARCHAR) AS DOUBLE)) AS tax_roundtrip
FROM lineitem
GROUP BY l_returnflag
""",
)
def fn_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal money arithmetic + int/string/double cast round-trips.
    double→int goes through FLOOR first: ANSI Spark truncates bare casts
    while DuckDB rounds — FLOOR makes both explicit and identical."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("exact_sum"),
            F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_total"),
            F.min(F.col("l_orderkey").cast("string")).alias("min_key_str"),
            F.max(F.col("l_tax").cast("string").cast("double")).alias("tax_roundtrip"),
        )
    )


@query(
    "fn_array",
    oracle="""
SELECT doc_id,
       len(str_split(text, ' ')) AS n_words,
       CASE WHEN list_contains(str_split(text, ' '), 'hash') THEN 1 ELSE 0 END AS has_hash,
       array_to_string(list_sort(list_distinct(str_split(substring(text,1,50), ' '))), ',')
         AS first50_vocab,
       array_to_string(str_split(text, ' ')[1:5], ' ') AS first5_words
FROM documents
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size / contains / distinct+sort /
    slice. Arrays leave the query as joined strings so the hash is
    representation-independent."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.when(F.array_contains(words, "hash"), 1).otherwise(0).alias("has_hash"),
        F.array_join(
            F.sort_array(F.array_distinct(F.split(F.substring("text", 1, 50), " "))), ","
        ).alias("first50_vocab"),
        F.array_join(F.slice(words, 1, 5), " ").alias("first5_words"),
    )


@query(
    "fn_array_hof",
    oracle="""
SELECT vec_id,
       CAST((CAST(list_sum(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             * 1000000000 + 0.5) AS BIGINT))) AS BIGINT)
             + 500) // 1000 AS DOUBLE) / 1000000 AS sq_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_component
FROM embeddings
""",
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over the embedding vector — transform /
    filter / aggregate run inside Tungsten (sim's per-voxel numpy map,
    without leaving the JVM). The squared-norm terms are snapped to
    integer nano-units before summing (associative — the stress-sweep
    hardening from text_entropy_score: DuckDB's list_sum isn't strictly
    left-to-right, so float folds can drift an ulp onto a rounding
    boundary)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq_nano = F.aggregate(
        dbl,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor(x * x * 1000000000 + 0.5).cast("long"),
    )
    # integer-space final rounding: float ROUND after quantization lands
    # on exact 6dp half-ties where the engines' ROUNDs disagree (measured)
    sq_micro = ((sq_nano + 500) / 1000).cast("long")
    return e.select(
        "vec_id",
        (sq_micro.cast("double") / 1000000).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
    )


@query(
    "fn_map_struct",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status_from_struct,
       o_totalprice AS price_from_struct,
       'priority,status' AS map_keys_sorted,
       o_orderpriority || '|' || o_orderstatus AS map_vals
FROM orders
""",
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, map construction + key/value
    extraction — values projected back to scalars before hashing (MAP
    comparison across engines is representation-brittle)."""
    o = table(spark, sf_dir, "orders")
    st = F.struct(F.col("o_orderstatus").alias("s"), F.col("o_totalprice").alias("p"))
    mp = F.map_from_arrays(
        F.array(F.lit("priority"), F.lit("status")),
        F.array(F.col("o_orderpriority"), F.col("o_orderstatus")),
    )
    return o.select(
        "o_orderkey",
        st.getField("s").alias("status_from_struct"),
        st.getField("p").alias("price_from_struct"),
        F.array_join(F.sort_array(F.map_keys(mp)), ",").alias("map_keys_sorted"),
        F.concat_ws("|", F.element_at(mp, "priority"), F.element_at(mp, "status")).alias(
            "map_vals"
        ),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_get,
       CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
       '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS back_to_json,
       json_extract_string(props, '$.k') AS k_str
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on events.props ({"k": int}): path extraction, typed
    parse via from_json, re-serialization via to_json, string extraction."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.to_json(parsed).alias("back_to_json"),
        F.json_tuple("props", "k").alias("k_str"),
    )


@query(
    "fn_map_hof",
    oracle="""
SELECT o_orderkey,
       'base=' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
         || ',dbl=' || CAST(CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS VARCHAR) AS entries,
       2 AS n_entries,
       CAST(CAST(o_totalprice AS DECIMAL(18,2))
            + CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS DOUBLE) AS total_all
FROM orders WHERE o_orderkey < 500
""",
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a map, transform_values (tax
    uplift), map_filter, aggregate over map_values, and a sorted
    entries-string render (maps hash unordered, so the oracle-facing
    form is the canonical string). DuckDB lacks Spark's map HOFs — the
    oracle states the expected RESULT arithmetic directly."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    # decimal(18,2) casts and a *2 multiplier: ROUND on doubles and even
    # double→decimal conversion diverge across engines when a derived
    # value lands exactly on a half-cent (465799.5 × 1.07 = 498405.465
    # did, at sf0.001) — doubling is exact in binary, so no value ever
    # needs a rounding decision and the hash is safe at any SF.
    m = F.create_map(
        F.lit("base"), F.col("o_totalprice").cast("decimal(18,2)"),
        F.lit("dbl"), (F.col("o_totalprice") * 2).cast("decimal(18,2)"),
    )
    # transform_keys exercised as identity-with-prefix then stripped by
    # the render; map_filter keeps everything (predicate on value > 0) —
    # both run, neither changes the canonical result.
    m2 = F.map_filter(m, lambda k, v: v > 0)
    entries = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(m2)),
            lambda e: F.concat_ws("=", e.getField("key"), e.getField("value").cast("string")),
        ),
        ",",
    )
    total = F.aggregate(
        F.map_values(m2),
        F.lit(0).cast("decimal(28,2)"),
        # re-cast: decimal + decimal widens to (29,2), which would stop
        # matching the accumulator type HOF aggregation requires
        lambda acc, v: (acc + v.cast("decimal(28,2)")).cast("decimal(28,2)"),
    )
    return o.select(
        "o_orderkey",
        entries.alias("entries"),
        F.size(m2).alias("n_entries"),
        total.cast("double").alias("total_all"),
    )

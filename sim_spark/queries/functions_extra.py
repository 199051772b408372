"""Generator variants and error-safe function family (§2.8 adjacents):
explode vs explode_outer vs posexplode, and the try_* / ANSI-safe
operations that keep 100 TB jobs from dying on one malformed row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "fn_explode_variants",
    oracle="""
WITH base AS (
  SELECT doc_id,
         str_split(text, ' ')[1:3] AS first3,
         list_filter(str_split(text, ' '), w -> w = 'zz_nonexistent') AS empty_list
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(first3) AS word,
         CAST(generate_subscripts(first3, 1) AS INTEGER) - 1 AS pos
  FROM base
),
outer_ AS (
  -- explode_outer on the (always empty) list keeps the row with NULLs
  SELECT doc_id, CAST(NULL AS VARCHAR) AS missing_word FROM base
)
SELECT p.doc_id, p.word, p.pos, o.missing_word
FROM pos p JOIN outer_ o USING (doc_id)
""",
)
def fn_explode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (0-based position) of the first 3 words joined with an
    explode_outer over a provably-empty array — the outer variant must
    keep the row and null-fill where plain explode would drop it."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.slice(F.split("text", " "), 1, 3).alias("first3"),
        F.filter(F.split("text", " "), lambda w: w == "zz_nonexistent").alias("empty_list"),
    )
    pos = base.select("doc_id", F.posexplode("first3").alias("pos", "word"))
    outer = base.select(
        "doc_id", F.explode_outer("empty_list").alias("missing_word")
    )
    return pos.join(outer, "doc_id").select("doc_id", "word", "pos", "missing_word")


@query(
    "fn_try_safe",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL
            ELSE ROUND(l_tax / l_discount, 6) END AS tax_per_disc,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip,
       COALESCE(TRY_CAST('not-a-date' AS TIMESTAMP), TIMESTAMP '1970-01-01 00:00:00')
         IS NOT NULL AS bad_ts_is_defaulted
FROM lineitem
""",
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe operations under ANSI mode: try_divide (NULL on ÷0
    instead of an ANSI error), try_cast on unparseable input (NULL, not
    job death) — the difference between one bad row and a failed 100 TB
    job."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_tax", F.nullif(F.col("l_discount"), F.lit(0.0))), 6).alias(
            "tax_per_disc"
        ),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").cast("int").alias("ln_roundtrip"),
        F.coalesce(
            F.try_to_timestamp(F.lit("not-a-date")),
            F.lit("1970-01-01").cast("timestamp"),
        )
        .isNotNull()
        .alias("bad_ts_is_defaulted"),
    )


@query("scan_sample_seeded")  # rows-only: RNG streams differ across engines
def scan_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample of lineitem (10%, seed=42): deterministic
    within Spark (same seed → same rows) but engine-specific RNG, so
    rows-only. tests/test_invariants.py pins the sampled fraction and
    repeat-run stability."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "sql_recursive_cte_spine",
    oracle="""
WITH RECURSIVE spine(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM spine
  WHERE m < TIMESTAMP '2001-07-01 00:00:00'
)
SELECT strftime(s.m, '%Y-%m-%d %H:%M:%S') AS month_start,
       COUNT(o.o_orderkey) AS n_orders
FROM spine s LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = s.m
GROUP BY s.m ORDER BY s.m
""",
)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): build a monthly calendar
    spine covering the orders date range, left-join order counts onto it
    — the standard 'no gaps in the time series' reporting pattern
    (months with zero orders still appear). Parser + recursion executor
    exercised end-to-end; DuckDB runs the identical recursion."""
    from sim_spark.io import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM spine
          WHERE m < TIMESTAMP '2001-07-01 00:00:00'
        )
        SELECT date_format(s.m, 'yyyy-MM-dd HH:mm:ss') AS month_start,
               COUNT(o.o_orderkey) AS n_orders
        FROM spine s LEFT JOIN orders o ON date_trunc('MONTH', o.o_orderdate) = s.m
        GROUP BY s.m ORDER BY s.m
        """
    )


@query(
    "fn_variant_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into a variant
    column once, extract typed fields with variant_get — the
    schema-on-read lane for ragged JSON where from_json's fixed schema
    doesn't fit. Aggregates over the extracted field match DuckDB's
    json_extract on the same strings."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "fn_regex_extract_all",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '([a-z]+ing)', 1)) AS BIGINT) AS n_ing,
       COALESCE(regexp_extract_all(text, '([a-z]+ing)', 1)[1], '') AS first_ing,
       CAST(len(list_distinct(regexp_extract_all(text, '([a-z]+ing)', 1))) AS BIGINT)
         AS n_distinct_ing,
       CAST(len(regexp_extract_all(text, '([a-z]{3})[0-9]', 1)) AS BIGINT)
         AS n_alnum_runs
FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id
""",
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-occurrence regex extraction (`regexp_extract_all`, the
    many-match sibling of the single-match key in fn_string): per doc,
    the '…ing' word occurrences — count, first hit, distinct count —
    plus a second char-class pattern. Patterns stay inside the
    Java/RE2-portable subset (character classes, groups, bounded reps —
    no lookaround, no backrefs), the same discipline text_pii_redact
    documents; evaluation is one codegen projection, no Python."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    ing = F.expr(r"regexp_extract_all(text, '([a-z]+ing)', 1)")
    runs = F.expr(r"regexp_extract_all(text, '([a-z]{3})[0-9]', 1)")
    return d.select(
        "doc_id",
        F.size(ing).cast("long").alias("n_ing"),
        F.coalesce(F.try_element_at(ing, F.lit(1)), F.lit("")).alias("first_ing"),
        F.size(F.array_distinct(ing)).cast("long").alias("n_distinct_ing"),
        F.size(runs).cast("long").alias("n_alnum_runs"),
    ).orderBy("doc_id")


@query(
    "fn_url_parse",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           || '?lang=' || lang || '&v=' || CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id,
       split_part(split_part(url, '://', 2), '/', 1) AS host,
       '/' || split_part(split_part(split_part(url, '://', 2), '?', 1), '/', 2)
           || '/' || split_part(split_part(split_part(url, '://', 2), '?', 1), '/', 3)
         AS path,
       split_part(url, '?', 2) AS query,
       split_part(split_part(url, 'lang=', 2), '&', 1) AS lang_param
FROM u ORDER BY doc_id
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with Spark's native `parse_url` (HOST / PATH /
    QUERY / per-key QUERY extraction) over deterministically synthesized
    URLs — the log-pipeline staple. DuckDB has no parse_url, so the
    oracle re-derives each component with split_part string algebra on
    the same URLs, pinning Spark's parser against an independent
    implementation rather than itself. Pure codegen projection."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v="),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@query(
    "fn_date_arith_calendar",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_1m,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_1q,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
       CAST(date_diff('month', date_trunc('month', o_orderdate),
                      date_trunc('month', TIMESTAMP '2000-01-01 00:00:00'))
            AS BIGINT) AS months_to_y2k,
       CAST(CAST(strftime(o_orderdate, '%j') AS INTEGER) AS BIGINT) AS day_of_year
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
""",
)
def fn_date_arith_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar month arithmetic — the end-of-month clamping cases that
    differ between naive day-addition and true calendar math: add_months
    (Jan 31 + 1m → Feb 29/28), last_day, quarter boundaries, signed
    whole-month differences, day-of-year. Both engines implement ISO
    proleptic-Gregorian calendars, so outputs are string-formatted dates
    (no timestamp-precision hazard). Pure codegen projection."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1m"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_1q"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
        F.months_between(
            F.lit("2000-01-01").cast("timestamp"), F.date_trunc("month", d)
        )
        .cast("long")
        .alias("months_to_y2k"),
        F.dayofyear(d).cast("long").alias("day_of_year"),
    ).orderBy("o_orderkey")


@query(
    "fn_collation_ci",
    oracle="""
WITH variants AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
              WHEN p_partkey % 3 = 0 THEN
                   upper(substr(p_name, 1, 1)) || substr(p_name, 2)
              ELSE p_name END AS name_cased
  FROM part
)
SELECT lower(name_cased) AS name_ci,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT name_cased) AS BIGINT) AS n_case_variants
FROM variants GROUP BY lower(name_cased)
HAVING count(DISTINCT name_cased) > 1
ORDER BY name_ci
""",
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive COLLATION grouping (Spark 4 UTF8_LCASE): part
    names are re-cased three ways, then grouped under the collated
    comparison — variants that differ only by case merge into one
    group, and the variant count proves the merge happened. DuckDB has
    no collations, so the oracle lower()-normalizes instead — an
    independent formulation of the same equivalence classes (the
    grouping KEY is emitted lower-cased on both sides for hashing).
    Collation-aware grouping beats lower() at scale because the
    collated column keeps its original bytes — no derived column to
    materialize through the shuffle."""
    p = table(spark, sf_dir, "part")
    cased = (
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .when(F.col("p_partkey") % 3 == 0, F.initcap("p_name"))
        .otherwise(F.col("p_name"))
    )
    v = p.select("p_partkey", cased.alias("name_cased"))
    ci = F.collate(F.col("name_cased"), "UTF8_LCASE")
    return (
        v.groupBy(ci.alias("name_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.count_distinct(F.collate(F.col("name_cased"), "UTF8_BINARY"))
            .cast("long")
            .alias("n_case_variants"),
        )
        .filter(F.col("n_case_variants") > 1)
        .select(
            F.lower(F.col("name_key").cast("string")).alias("name_ci"),
            "n_parts",
            "n_case_variants",
        )
        .orderBy("name_ci")
    )

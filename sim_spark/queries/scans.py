"""Scan / source / sink operators (SURVEY.md §2.1).

The scale story lives in what Catalyst pushes into the parquet scan:
`scan_pruned_projection` must show a 2-column ReadSchema and
`scan_filter_pushdown` a PushedFilters entry (asserted in
tests/test_plans.py) — at 100 TB those are the difference between reading
2 columns of a few row groups and reading everything.
"""

from __future__ import annotations


from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.exprs import dsum, sql_dsum, ts_str
from sim_spark.io import SCHEMAS, TABLES, table
from sim_spark.registry import query
from sim_spark.scratch import scratch_dir, sf_tag as scratch_sf_tag

_COUNT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, COUNT(*) AS n FROM {t}" for t in TABLES
)


@query("scan_parquet_count", oracle=_COUNT_ORACLE)
def scan_parquet_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count every fixture table; parquet answers from footer metadata."""
    counts = [
        table(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n")
        )
        for t in TABLES
    ]
    return reduce(DataFrame.unionAll, counts)


@query(
    "scan_pruned_projection",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_pruned_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read 2 of 11 lineitem columns — column pruning reaches the scan."""
    return table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "scan_filter_pushdown",
    oracle="""
SELECT l_orderkey, l_linenumber,
       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp range predicate pushed to parquet row-group pruning."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_linenumber", ts_str("l_shipdate").alias("shipdate"))


@query("scan_csv_roundtrip", oracle="SELECT * FROM region")
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → CSV with header → read back with the pinned explicit schema.

    Round-trips through a per-process scratch dir that outlives the
    query (the driver re-executes the returned frame), so the read-back
    stays lazy — no driver-side materialization. The read uses
    SCHEMAS['region'] rather than inference, so types survive the text
    format.
    """
    out = scratch_dir("csv_region")
    table(spark, sf_dir, "region").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return spark.read.schema(SCHEMAS["region"]).option("header", True).csv(out)


@query("scan_json_roundtrip", oracle="SELECT * FROM nation")
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → JSON lines → read back with schema INFERENCE, then cast to
    the pinned schema (JSON infers integers as bigint). Lazy read-back
    from a per-process scratch dir — no driver-side materialization."""
    out = scratch_dir("json_nation")
    table(spark, sf_dir, "nation").write.mode("overwrite").json(out)
    return spark.read.json(out).select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        F.col("n_name"),
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink (sim's image split/merge analogue): write
    lineitem partitioned by l_returnflag, read it back, aggregate per
    partition value. Static partition pruning applies on the re-read; at
    100 TB `partitionBy` on a low-cardinality key is the layout that makes
    downstream scans prune. Lazy read-back from a per-process scratch
    dir — no driver-side materialization."""
    sf_tag = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"sink_partitioned_{sf_tag}")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "scan_parquet_bloom",
    oracle="""
SELECT l_orderkey, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_orderkey IN (7, 388, 1123)
GROUP BY l_orderkey ORDER BY l_orderkey
""",
)
def scan_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom-filter data skipping (r14, verdict task 7) — the
    one first-class 100 TB scan-reduction feature beyond min/max and
    partition pruning. Writes lineitem's (l_orderkey, l_quantity) with
    a split-block bloom filter on l_orderkey (parquet.bloom.filter.
    enabled, ndv-sized) and dictionary encoding DISABLED for that
    column — the realistic high-cardinality-ID layout where neither
    row-group min/max (shuffled keys span every group), page column
    indexes (same reason), nor dictionary filtering (no dictionary)
    can skip, so the bloom filter is the ONLY structure standing
    between a point/IN lookup and a full scan. The read back filters
    an IN list that parquet-mr turns into per-row-group bloom probes.
    tests/test_plans.py::test_parquet_bloom_rowgroup_skip measures the
    skip for real: the same missing-key scan emits 0 scan-node rows
    from the bloom file and every row from the bloom-less twin.
    Oracle recomputes the aggregate from the source table (the
    round-trip is value-preserving)."""
    tag = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"bloom_lineitem_{tag}")
    (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey", "200000")
        .option("parquet.enable.dictionary", "false")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("l_orderkey").isin(7, 388, 1123))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "scan_python_datasource",
    oracle="""
SELECT CAST(range AS BIGINT) AS event_id,
       CAST(range % 97 AS BIGINT) AS user_id,
       ROUND((range * 31 % 1000) / 10.0, 1) AS amount
FROM range(5000)
""",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector through the Spark 4 Python Data Source API
    (sources/pyds.py): declared schema, option handling, and explicit
    partition planning — 8 input partitions read in parallel, the same
    machinery a connector to a sharded external system uses. The
    generator is deterministic integer arithmetic so DuckDB's range()
    reproduces it exactly."""
    from sim_spark.sources.pyds import register

    register(spark)
    return (
        spark.read.format("range_events")
        .option("n", 5000)
        .option("parts", 8)
        .load()
    )


@query(
    "stream_python_datasource",
    oracle="""
SELECT CAST(range % 97 AS BIGINT) AS user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(range AS BIGINT)) AS BIGINT) AS sum_ids
FROM range(2000) GROUP BY range % 97
""",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector's STREAMING face (Python Data Source
    SimpleDataSourceStreamReader): offset-tracked micro-batches drained
    to idle under a running trigger into a memory sink, then aggregated. Deterministic
    generator ⇒ the streaming pipeline's total output is SQL-oracle-
    checkable — same rows whether read as a batch or as 20 micro-
    batches, which is exactly the exactly-once claim."""
    from sim_spark.sources.pyds import register
    from sim_spark.streaming import mounts

    register(spark)
    stream = (
        spark.readStream.format("range_events")
        .option("n", 2000)
        .option("batch", 100)
        .load()
    )
    sink = mounts.run_streaming_until_idle(stream, "append")
    return sink.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("bigint").alias("sum_ids"),
    )


@query("scan_xml_roundtrip", oracle="SELECT * FROM supplier")
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML (Spark 4 native format) → read back with the
    pinned explicit schema (XML is text, so types only survive via the
    schema, like the CSV leg). Lazy read-back from the per-process
    scratch dir; the oracle proves a full-fidelity round trip including
    decimals and free-text comment fields (XML-escaped and restored)."""
    out = scratch_dir(f"xml_supplier_{scratch_sf_tag(sf_dir)}")
    (
        table(spark, sf_dir, "supplier")
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "supplier")
        .save(out)
    )
    return (
        spark.read.schema(SCHEMAS["supplier"])
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )


@query(
    "scan_compression_codecs",
    oracle=f"""
SELECT 'snappy' AS codec, COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
UNION ALL
SELECT 'zstd', COUNT(*), {sql_dsum('l_extendedprice')}
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
ORDER BY codec
""",
)
def scan_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet codec control: the same slice written with snappy (the
    splittable-scan default) and zstd (the colder-storage ratio pick),
    read back and aggregated — proving the engine round-trips both
    codecs bit-exactly. Codec choice is a real 100 TB lever: zstd cuts
    storage ~30% over snappy at some CPU cost; either way the scan
    stays splittable because parquet compresses PAGES, not files."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("l_extendedprice")
    )
    sf_tag = scratch_sf_tag(sf_dir)
    out = None
    for codec in ("snappy", "zstd"):
        path = scratch_dir(f"codec_{codec}_{sf_tag}")
        li.write.mode("overwrite").option("compression", codec).parquet(path)
        row = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                dsum("l_extendedprice").alias("sum_price"),
            )
            .select(F.lit(codec).alias("codec"), "n_rows", "sum_price")
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("codec")


@query(
    "scan_text_lines",
    oracle="""
WITH flat AS (
  SELECT regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS line FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(length(line)) AS BIGINT) AS sum_chars,
       CAST(SUM(length(line) - length(replace(line, ' ', '')) + 1) AS BIGINT)
         AS sum_words
FROM flat
""",
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-lines source (spark.read.text) — the format a crawl dump
    or log tail actually arrives in: document texts written one per
    line, read back as a single `value` column, profiled without any
    schema. Completes the source-format ladder (parquet/csv/json/orc/
    xml/binary/python-ds/text). The oracle recomputes the line profile
    from the original table, so a lost, split, or mangled line breaks
    the count or the char/word sums. Lazy read-back from a per-process
    scratch dir; at scale text is splittable by line so this parallels
    like any other scan."""
    sf_tag = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"text_documents_{sf_tag}")
    # one line per document: strip any stray newlines so lines == docs
    table(spark, sf_dir, "documents").select(
        F.regexp_replace(F.col("text"), "[\\r\\n]+", " ").alias("text")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    return lines.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("sum_chars"),
        F.sum(
            F.length("value") - F.length(F.regexp_replace("value", " ", "")) + 1
        ).alias("sum_words"),
    )


@query(
    "scan_binaryfile",
    oracle="""
SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS file_name,
       CAST(length(text) AS BIGINT) AS length,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 64
""",
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion via the `binaryFile` source — the way a
    multimodal pipeline lands an image/audio directory as (path, length,
    content) rows before any decode UDF runs.

    The fixture dir is produced DISTRIBUTED (foreachPartition writes one
    .bin per document — an export-sink shape, no driver collect), then
    read back lazily with binaryFile. The oracle recomputes name/length/
    md5 from the source table, so a truncated, renamed, or re-encoded
    file breaks the hash. The fixture text is ASCII, so byte length ==
    char length both sides. Bounded to 64 docs: binaryFile targets
    few-large-files layouts (images); the small-file count here is a
    fixture choice, not the scale story.
    """
    import os

    sf_t = scratch_sf_tag(sf_dir)
    out = scratch_dir(f"binfiles_{sf_t}")
    os.makedirs(out, exist_ok=True)  # scratch paths are created lazily
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)

    def write_part(rows) -> None:
        for r in rows:
            tmp = os.path.join(out, f".doc_{r['doc_id']}.tmp")
            with open(tmp, "wb") as f:
                f.write(r["text"].encode("utf-8"))
            os.replace(tmp, os.path.join(out, f"doc_{r['doc_id']}.bin"))

    docs.select("doc_id", "text").foreachPartition(write_part)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").cast("bigint").alias("length"),
            F.md5("content").alias("content_md5"),
        )
    )

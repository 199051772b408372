"""Table loading for the fixed parquet fixtures (FIXTURES.md).

Schemas are pinned explicitly rather than inferred so a scan never silently
drifts (schema inference is still exercised once, in ``scan_json_roundtrip``).
At 100 TB the same loaders work unchanged: ``spark.read.parquet`` over a
directory tree gives partition pruning + predicate pushdown + column pruning
for free; nothing here materializes data on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sim_spark.session import normalize

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Pinned schemas measured from the fixtures (FIXTURES.md). Parquet physical
# int32→IntegerType, int64→LongType, timestamp→TimestampType.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# (sf_dir, table) -> COUNT(*). The fixture dirs are immutable for a
# process lifetime, and the corpus-count ladder dials (ops/ladders.py)
# re-derive their K at every query build — without the memo each bench
# sample pays a fresh full-table count job (r9 review).
_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Memoized COUNT(*) of a fixture table — for data-deterministic
    scale dials (ladders), not for query results."""
    import os

    key = (os.path.abspath(sf_dir), name)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = table(spark, sf_dir, name).count()
    return _COUNT_CACHE[key]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy; no driver-side data).

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: parquet TIMESTAMP(MICROS) (reads directly) and
    TIMESTAMP(NANOS), which Spark 4.x rejects outright
    (PARQUET_TYPE_ILLEGAL) — for the latter we read it as a nanos long
    (legacy conf) and floor-divide to microseconds, bit-identical to
    DuckDB's own ns→µs truncation on read, so oracle comparisons of raw
    ts agree. Either way the column is normalized to session-TZ
    TimestampType (session TZ pinned UTC) so downstream queries see one
    stable type.
    """
    normalize(spark)
    if name == "events":
        return _events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    pinned = SCHEMAS.get(name)
    if pinned is not None:
        # Fail LOUD on fixture drift: a silently retyped column (int32
        # doc_id, float32 price) changes every downstream pandas dtype
        # and the driver's value hash with no local signal otherwise.
        # timestamp vs timestamp_ntz is NOT drift — fixtures ship NTZ and
        # the session pins UTC, so queries normalize it downstream.
        def _canon(schema):
            return schema.simpleString().replace("timestamp_ntz", "timestamp")

        if _canon(df.schema) != _canon(pinned):
            raise TypeError(
                f"fixture schema drift for {name!r}: expected "
                f"{pinned.simpleString()}, got {df.schema.simpleString()}"
            )
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
    except Exception as e:
        # Only the TIMESTAMP(NANOS) schema rejection should fall through to
        # the legacy nanosAsLong path; a missing/corrupt file must fail loud
        # here, not with a misleading error from the legacy branch.
        msg = str(e)
        if "PARQUET_TYPE_ILLEGAL" not in msg and "TIMESTAMP(NANOS" not in msg:
            raise
        df = None
        ts_type = None
    if df is not None and isinstance(ts_type, T.TimestampType):
        return df
    if df is not None and isinstance(ts_type, T.TimestampNTZType):
        # µs fixtures read as NTZ; session TZ is UTC, so the cast is a
        # pure relabel (identical wall-clock values, oracle-compatible).
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    # Legacy TIMESTAMP(NANOS) layout: scope the legacy conf to this one
    # read — the scan relation captures the conf at build time
    # (verified: execution after restore still decodes correctly), so
    # restoring immediately keeps later TIMESTAMP(NANOS) reads in the
    # session loud.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "true")
    try:
        # FLOOR division, not `div` (truncate-toward-zero): DuckDB floors
        # its ns->us conversion, so a pre-epoch nanosecond (negative int64)
        # must round down, not toward zero, to stay bit-identical.
        df = spark.read.parquet(path).withColumn(
            "ts",
            F.expr(
                "timestamp_micros(ts div 1000"
                " - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
            ),
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return df


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several tables at once: ``li, ord = load(spark, d, 'lineitem', 'orders')``."""
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views for the SQL entry point (SURVEY.md §3.2 EP3).

    ``names=None`` means all tables; an explicit empty list registers
    none (``names or TABLES`` would silently register all ten)."""
    for n in (TABLES if names is None else names):
        table(spark, sf_dir, n).createOrReplaceTempView(n)

"""Bit-manipulation and encoding function families (§2.8 adjacents)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query


@query(
    "fn_bits",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_partkey & 255 AS low_byte,
       l_partkey | 4096 AS with_flag,
       xor(l_partkey, l_suppkey) AS keys_xor,
       CAST(l_partkey << 2 AS BIGINT) AS shl2,
       CAST(l_partkey >> 3 AS BIGINT) AS shr3,
       CAST(bit_count(l_partkey) AS INTEGER) AS popcount
FROM lineitem
""",
)
def fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the substrate the
    SimHash/banding operators are built from."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_partkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("l_partkey").bitwiseXOR(F.col("l_suppkey")).alias("keys_xor"),
        F.shiftleft(F.col("l_partkey"), 2).alias("shl2"),
        F.shiftright(F.col("l_partkey"), 3).alias("shr3"),
        F.bit_count(F.col("l_partkey")).alias("popcount"),
    )


@query(
    "fn_encoding",
    oracle="""
SELECT p_partkey,
       to_base64(CAST(p_name AS BLOB)) AS name_b64,
       lower(hex(p_name)) AS name_hex,
       ascii(p_name) AS first_cp,
       chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS letter,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       lower(substring(p_name, 1, 1)) || substring(p_name, 2) AS uncap
FROM part
""",
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding family: base64 / hex / codepoint / chr / md5 / sha256.
    (Spark hex() of a string is uppercase, DuckDB's lowercase — lowered
    on both sides; fixture p_name is already lowercase so the initcap
    inverse is a plain identity check.)"""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.base64(F.encode("p_name", "utf-8")).alias("name_b64"),
        F.lower(F.hex(F.col("p_name"))).alias("name_hex"),
        F.ascii("p_name").alias("first_cp"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.concat(
            F.lower(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("uncap"),
    )

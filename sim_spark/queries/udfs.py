"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Python is the deliberate slow path here — every operator exists to prove
the boundary machinery (Arrow-vectorized pandas UDFs, grouped
applyInPandas, UDTF lateral expansion, and one intentionally row-at-a-time
Python UDF). Hot-path equivalents of these computations live JVM-side in
the other modules; at 100 TB you reach for these only when numpy/pandas
semantics are genuinely required, and always Arrow-batched.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from sim_spark.io import register_views, table
from sim_spark.registry import query

# --- pandas scalar UDF ------------------------------------------------------

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")


@pandas_udf(T.StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    """lower → strip punctuation → collapse whitespace → trim (vectorized;
    regexes mirrored 1:1 by the SQL oracle)."""
    return (
        s.str.lower()
        .str.replace(_PUNCT, "", regex=True)
        .str.replace(_WS, " ", regex=True)
        .str.strip()
    )


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(
            lower('  ' || upper(text) || ' .,! '),
            '[^a-zA-Z0-9_ ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
FROM documents
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized text normalization over a deliberately noised
    input (padding + case + punctuation) so the UDF does real work."""
    d = table(spark, sf_dir, "documents")
    noisy = F.concat(F.lit("  "), F.upper("text"), F.lit(" .,! "))
    return d.select("doc_id", _normalize_text(noisy).alias("norm_text"))


# --- row-at-a-time Python UDF ----------------------------------------------


def _trigrams(s: str) -> set[str]:
    return {s[i : i + 3] for i in range(len(s) - 2)}


@F.udf(T.DoubleType())
def _jaccard_trigram(a: str, b: str) -> float:
    sa, sb = _trigrams(a.lower()), _trigrams(b.lower())
    union = len(sa | sb)
    return round(len(sa & sb) / union, 6) if union else 1.0


@query(
    "udf_python_rowwise",
    oracle="""
WITH t AS (
  SELECT p_partkey,
         list_distinct([substring(lower(p_name), i, 3)
                        FOR i IN range(1, length(p_name) - 1)]) AS ga,
         list_distinct([substring(lower(p_type), i, 3)
                        FOR i IN range(1, length(p_type) - 1)]) AS gb
  FROM part
)
SELECT p_partkey,
       ROUND(len(list_filter(ga, x -> list_contains(gb, x))) * 1.0
             / (len(ga) + len(gb) - len(list_filter(ga, x -> list_contains(gb, x)))),
             6) AS name_type_jaccard
FROM t
""",
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Jaccard of p_name vs p_type as a plain Python UDF
    — the intentionally slow path (pickled rows, one Python call per row),
    kept as the contrast case for the Arrow-batched UDFs."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", _jaccard_trigram("p_name", "p_type").alias("name_type_jaccard")
    )


# --- grouped-map UDAF-style -------------------------------------------------

_GAP_SCHEMA = "user_id bigint, n_gaps bigint, median_gap_us double, p90_gap_us double"


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"])
    us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    gaps = np.diff(us).astype("float64")
    if len(gaps) == 0:
        med = p90 = float("nan")
    else:
        # method='linear' ≡ DuckDB quantile_cont interpolation. Rounded to
        # 1dp, not 6: at ~1e11 µs magnitudes the 6th decimal is beyond
        # double precision, so last-bit interpolation differences survive
        # a 6dp round but not a 1dp one (fractions are multiples of ~0.1).
        med = float(np.quantile(gaps, 0.5, method="linear"))
        p90 = float(np.quantile(gaps, 0.9, method="linear"))
    return pd.DataFrame(
        [[int(pdf["user_id"].iloc[0]), len(gaps), round(med, 1), round(p90, 1)]],
        columns=["user_id", "n_gaps", "median_gap_us", "p90_gap_us"],
    )


@query(
    "udaf_grouped_map",
    oracle="""
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS gap
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap, 0.5), 1) AS median_gap_us,
       ROUND(quantile_cont(gap, 0.9), 1) AS p90_gap_us
FROM g GROUP BY user_id
""",
)
def udaf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median/p90 inter-event gap via grouped applyInPandas —
    the UDAF shape: one Arrow batch per group, numpy math inside, linear
    interpolation matching quantile_cont exactly."""
    e = table(spark, sf_dir, "events")
    out = e.groupBy("user_id").applyInPandas(_gap_stats, _GAP_SCHEMA)
    # NaN → NULL on the way out: a single-event user yields no gaps, and
    # pandas can only say NaN where SQL says NULL — the two are distinct
    # double values to Spark/Arrow, and the oracle emits NULL.
    nn = lambda c: F.when(F.isnan(c), F.lit(None)).otherwise(F.col(c))  # noqa: E731
    return out.select(
        "user_id", "n_gaps", nn("median_gap_us").alias("median_gap_us"),
        nn("p90_gap_us").alias("p90_gap_us"),
    )


# --- UDTF -------------------------------------------------------------------


@udtf(
    returnType=T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("pos", T.IntegerType())]
    )
)
class _WordExpand:
    """Explode a document into (word, position) rows — 1-based positions
    to match SQL array indexing."""

    def eval(self, text: str):  # noqa: A002
        for i, w in enumerate(text.split(" ")):
            yield (w, i + 1)


@query(
    "udtf_expand",
    oracle="""
SELECT doc_id,
       unnest(str_split(text, ' ')) AS word,
       CAST(generate_subscripts(str_split(text, ' '), 1) AS INTEGER) AS pos
FROM documents
""",
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lateral expansion: documents × word → one row per
    (doc_id, word, pos)."""
    register_views(spark, sf_dir, ["documents"])
    spark.udtf.register("word_expand", _WordExpand)
    return spark.sql(
        "SELECT d.doc_id, we.word, we.pos FROM documents d, LATERAL word_expand(d.text) we"
    )


# --- Arrow UDF with numpy vector math --------------------------------------


# NB: module-level UDF returnTypes must be StructType objects, not DDL
# strings — workers re-import this module and DDL parsing needs a live
# SparkContext, which executors don't have.
_NORMS_TYPE = T.StructType(
    [
        T.StructField("l2_norm", T.DoubleType()),
        T.StructField("l1_norm", T.DoubleType()),
        T.StructField("n_dims", T.IntegerType()),
    ]
)


@pandas_udf(_NORMS_TYPE)
def _vector_norms(emb: pd.Series) -> pd.DataFrame:
    import numpy as np

    # Per-term integer nano-units before summing: numpy's dot/sum use
    # pairwise/BLAS orderings that need not match DuckDB's list_sum, and
    # a sum-order ulp can land on the 6dp rounding boundary (the
    # text_entropy_score failure class). Integer sums are associative.
    # l1 rounds in INTEGER space ((ab+500)//1000): the quantized sum is a
    # multiple of 1e-9, so a float round would hit exact 6dp half-ties
    # ~1e-3 of the time, where Python's exact-expansion round and
    # DuckDB's ROUND disagree. l2 passes through sqrt first (irrational),
    # so its float round has no created ties.
    l2, l1, nd = [], [], []
    for v in emb:
        a = np.asarray(v, dtype="float64")
        sq = np.floor(a * a * 1e9 + 0.5).astype(np.int64).sum()
        ab = np.floor(np.abs(a) * 1e9 + 0.5).astype(np.int64).sum()
        l2.append(round(float(np.sqrt(sq / 1e9)), 6))
        l1.append(float((ab + 500) // 1000) / 1e6)
        nd.append(len(a))
    return pd.DataFrame({"l2_norm": l2, "l1_norm": l1, "n_dims": nd})


@query(
    "udf_numpy_vector",
    oracle="""
SELECT vec_id,
       ROUND(sqrt(CAST(list_sum(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             * 1000000000 + 0.5) AS BIGINT))) AS DOUBLE)
             / 1000000000), 6) AS l2_norm,
       CAST((CAST(list_sum(list_transform(embedding,
             x -> CAST(floor(abs(CAST(x AS DOUBLE))
                             * 1000000000 + 0.5) AS BIGINT))) AS BIGINT)
             + 500) // 1000 AS DOUBLE) / 1000000 AS l1_norm,
       CAST(len(embedding) AS INTEGER) AS n_dims
FROM embeddings
""",
)
def udf_numpy_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy voxel-style math inside an Arrow-batched pandas UDF (the sim
    per-block ndarray pattern, DataFrame-native): L2/L1 norms per
    embedding. Fixture vectors are unit-norm, so l2_norm ≈ 1.0."""
    e = table(spark, sf_dir, "embeddings")
    out = e.select("vec_id", _vector_norms("embedding").alias("s"))
    return out.select("vec_id", "s.l2_norm", "s.l1_norm", "s.n_dims")


# --- polymorphic UDTF (Spark 4 analyze()) -----------------------------------


class _FirstWords:
    """Output schema decided at ANALYSIS time from the literal n —
    word_1..word_n columns. The polymorphic-UDTF contract: analyze()
    runs on the driver during planning with the argument metadata,
    eval() streams rows on executors."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.udtf import AnalyzeResult

        k = int(n.value)
        return AnalyzeResult(
            T.StructType(
                [T.StructField(f"word_{i + 1}", T.StringType()) for i in range(k)]
            )
        )

    def eval(self, text: str, n: int):
        ws = (text or "").split()
        yield tuple(ws[i] if i < len(ws) else None for i in range(n))


@query(
    "udtf_polymorphic_words",
    oracle="""
SELECT doc_id,
       str_split(text, ' ')[1] AS word_1,
       str_split(text, ' ')[2] AS word_2,
       str_split(text, ' ')[3] AS word_3
FROM documents
""",
)
def udtf_polymorphic_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: ``first_words(text, 3)`` produces 3
    word columns because analyze() computed the schema from the literal
    — change the 3 and the SCHEMA changes, which no fixed-returnType
    UDTF can express. NULL-padded beyond the word count, matching
    DuckDB's out-of-bounds list semantics."""
    register_views(spark, sf_dir, ["documents"])
    spark.udtf.register("first_words", udtf(_FirstWords))
    return spark.sql(
        "SELECT d.doc_id, fw.* FROM documents d, LATERAL first_words(d.text, 3) fw"
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*), 6)
         AS mean_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the third pandas-UDF shape (§2.10)
    alongside scalar and grouped-map: a vectorized aggregate usable
    inside .agg(), receiving each group's column as ONE pandas Series.
    The aggregation is mean over integral quantities, computed as exact
    int64 sum / count inside the UDF, so partition order can't move a
    bit and the result hash-matches plain SQL. Arrow-batched transfer;
    at scale each group's series streams through the executor like any
    partial aggregate (no driver involvement)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_qty(v: pd.Series) -> float:
        # exact: int64 sum of integral doubles, one final division
        s = int(v.astype("int64").sum())
        return round(s / len(v), 6)

    # Catalyst refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count rides the
    # same Arrow batch as a second pandas aggregate instead.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n_rows("l_quantity").alias("n"),
            mean_qty("l_quantity").alias("mean_qty"),
        )
        .orderBy("l_returnflag")
    )


class _UserGapStats:
    """UDTF over TABLE input: per PARTITION BY user_id, consume rows in
    ORDER BY ts and emit one summary row from terminate() — genuinely
    sequential per-partition state (max inter-event gap) that a scalar
    UDF cannot express and a window would need two passes for."""

    def __init__(self):
        self._user = None
        self._n = 0
        self._prev_us = None
        self._max_gap = 0

    def eval(self, row):
        self._user = row["user_id"]
        us = int(row["ts"].timestamp() * 1_000_000)
        if self._prev_us is not None and us - self._prev_us > self._max_gap:
            self._max_gap = us - self._prev_us
        self._prev_us = us
        self._n += 1

    def terminate(self):
        if self._user is not None:
            yield self._user, self._n, self._max_gap


@query(
    "udtf_table_arg",
    oracle="""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id ORDER BY user_id
""",
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF with a TABLE argument: the function receives whole
    partitions (`PARTITION BY user_id ORDER BY ts, event_id`) row by row
    in order and emits one summary per partition from terminate() — the
    API for custom per-group sequential operators without applyInPandas.
    Max inter-event gap needs exactly this ordered scan; the oracle
    re-derives it with a lag window. At scale partitions shard across
    executors on the PARTITION BY key like any grouped op."""
    from pyspark.sql.functions import udtf as udtf_fn

    register_views(spark, sf_dir, ["events"])
    spark.udtf.register(
        "user_gap_stats",
        udtf_fn(_UserGapStats, returnType="user_id long, n_events long, max_gap_us long"),
    )
    return spark.sql(
        """
        SELECT * FROM user_gap_stats(
          TABLE(SELECT user_id, ts, event_id FROM events)
          PARTITION BY user_id ORDER BY (ts, event_id)
        ) ORDER BY user_id
        """
    )


# --- mapInArrow -------------------------------------------------------------


def _arrow_sq_nano(batches):
    """Zero-copy Arrow path: flatten the fixed-64-dim list column straight
    to a numpy view, square/quantize to integer nano-units (floor(x+0.5),
    the engine-shared rounding), sum exactly in int64 — no pandas, no
    per-row Python."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("vec_id")
        emb = batch.column("embedding")
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        v = flat.reshape(len(batch), -1)
        terms = np.floor(v * v * 1e9 + 0.5).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [ids, pa.array(terms.sum(axis=1), type=pa.int64())],
            names=["vec_id", "sq_nano"],
        )


@query(
    "udf_arrow_map",
    oracle="""
SELECT vec_id,
       CAST(list_sum(list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000 + 0.5)
              AS BIGINT))) AS BIGINT) AS sq_nano
FROM embeddings ORDER BY vec_id
""",
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python boundary — RecordBatches
    cross as-is (no pandas materialization), the embedding list column is
    read as one contiguous numpy view, and the squared-norm is summed in
    exact integer nano-units so the hash matches plain SQL. Use this API
    when even pandas conversion overhead matters (wide numeric batches);
    per-row semantics stay in the vectorized kernel."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = e.mapInArrow(_arrow_sq_nano, "vec_id long, sq_nano long")
    return out.orderBy("vec_id")

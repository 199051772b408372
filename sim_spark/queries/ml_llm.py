"""ML / LLM-data-pipeline operators (SURVEY.md §2.11).

The training-data-pipeline surface: exact + near dedup, similarity
search, text analysis, multimodal joins, clustering, feature scaling,
and the sim voxel-pipeline analogues (histogram / min-max over vector
components).

Scale designs (SCALE.md has the full notes):
- dedup_exact_hash: shuffle on a 256-bit hash — perfectly uniform keys.
- dedup_jaccard_shingles: candidate generation via shingle-equi-join
  (the bucket-then-refine pattern again), never an all-pairs scan; a
  shingle shared by many docs bounds the blowup and AQE splits skew.
- sim_topk_cosine: bounded query set broadcast against the corpus —
  corpus never shuffles; at real scale swap the query broadcast for
  LSH/IVF bucketing (same refine shape).
- Determinism: every float score is rounded BEFORE ranking so both
  engines rank identical values (§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.exprs import sql_dsum
from sim_spark.io import table
from sim_spark.registry import query

# --------------------------------------------------------------------------
# multimodal + profiles
# --------------------------------------------------------------------------


@query(
    "multimodal_join",
    oracle="""
SELECT e.label,
       COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(CAST(d.n_chars AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_chars,
       COUNT(DISTINCT d.lang) AS n_langs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label
""",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ vector ("multimodal columns" in one frame): per-embedding-
    label statistics of the paired documents."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "text_lang_profile",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
""",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (the metadata aggregation every corpus
    audit starts with)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(30,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


def sliding_window_expr(w, n: int, builder):
    """Guarded n-gram window over token array ``w``: F.sequence(0, size-n)
    DESCENDS when size(w) < n (Spark auto-steps -1), sending element_at an
    out-of-bounds index that ABORTS the job under the session's pinned
    ANSI mode (a sub-n-word doc crashed all three builders before this
    guard). Returns an empty array for short docs, like every oracle's
    range()/positional-join formulation."""
    idx = F.sequence(F.lit(0), F.size(w) - n)
    return F.when(F.size(w) >= n, F.transform(idx, builder)).otherwise(
        F.array().cast("array<string>")
    )


def sliding_window_hash_expr(w, n: int, builder):
    """sliding_window_expr for builders producing LONG hashes."""
    idx = F.sequence(F.lit(0), F.size(w) - n)
    return F.when(F.size(w) >= n, F.transform(idx, builder)).otherwise(
        F.array().cast("array<bigint>")
    )


@query(
    "text_wordcount",
    oracle="""
WITH tokens AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
SELECT word, COUNT(*) AS n FROM tokens
GROUP BY word ORDER BY n DESC, word ASC LIMIT 50
""",
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount, top-50 with a total-order tie-break."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


@query(
    "text_ngrams",
    oracle="""
WITH words AS (SELECT doc_id, lang, str_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id, lang, unnest(w) AS word,
         generate_subscripts(w, 1) AS i, len(w) AS n
  FROM words
),
bi AS (
  SELECT a.lang, a.word || ' ' || b.word AS bigram
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
)
SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY lang, bigram
""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts per language. Spark builds bigrams with a zero-shuffle
    higher-order transform over the token array (no positional self-join —
    that's only the oracle's formulation)."""
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bigrams = sliding_window_expr(
        w,
        2,
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    return (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_tfidf_manual",
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tokens GROUP BY doc_id, word),
df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, word ASC) AS rn
  FROM scored
)
SELECT doc_id, word AS top_term, score FROM ranked WHERE rn = 1
""",
)
def text_tfidf_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational tf-idf (smooth idf), top term per document — manual so it
    is oracle-checkable (HashingTF buckets aren't). Scores are rounded
    BEFORE ranking so both engines rank identical values."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; fixture-sized driver value, broadcast as literal
    # No forced broadcast: df is vocabulary-sized (can be huge at 100 TB
    # with noisy tokens); AQE broadcasts it only when actually small.
    scored = tf.join(df, "word").select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_term"), "score")
    )


# --------------------------------------------------------------------------
# deduplication
# --------------------------------------------------------------------------


@query(
    "dedup_exact_hash",
    oracle="""
SELECT sha256(lower(trim(text))) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
GROUP BY 1
""",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: hash-group, keep min doc_id. The
    fixtures have no exact dups (FIXTURES.md), so the corpus is
    self-unioned to prove the halving. The sha256 shuffle key is uniform
    by construction — no skew at any scale."""
    d = table(spark, sf_dir, "documents")
    doubled = d.unionAll(d)
    return (
        doubled.withColumn("text_hash", F.sha2(F.lower(F.trim(F.col("text"))), 256))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_sets(d: DataFrame) -> DataFrame:
    """doc_id → distinct 3-word shingles (the near-dup fingerprint).

    The token array is projected to a real column FIRST: referencing the
    split() expression inside the transform lambda would re-tokenize the
    text once per element (quadratic in document length — measured 10×
    on the sf0.1 bench before this split)."""
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    shingles = F.array_distinct(
        sliding_window_expr(
            w,
            3,
            lambda i: F.concat_ws(
                " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
            ),
        )
    )
    return toks.select(
        "doc_id", shingles.alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))


@query(
    "dedup_jaccard_shingles",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        FOR i IN range(1, len(w) - 1)]) AS shingles
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
),
ex AS (
  SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh FROM sh
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         COUNT(*) AS inter, MIN(a.n_sh) AS na, MIN(b.n_sh) AS nb
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(inter * 1.0 / (na + nb - inter), 6) AS jaccard
FROM cand
WHERE inter * 1.0 / (na + nb - inter) >= 0.8
""",
)
def dedup_jaccard_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: 3-word shingles, exact Jaccard ≥ 0.8.

    Candidate pairs come from an equi-join on shared shingles (docs with
    zero common shingles are never compared — the same bucket-then-refine
    shape as the range join), then the exact Jaccard refines. This is the
    deterministic ground truth the MinHash/LSH variant is recall-tested
    against."""
    from sim_spark.ops.setsim import jaccard_join_prefix

    d = table(spark, sf_dir, "documents")
    # Shingle fingerprints are hashed IN the builder (xxhash64 over the
    # word triple) instead of materializing "w1 w2 w3" strings corpus-wide
    # and hashing those — same distinct-set semantics under the standing
    # 64-bit-collision assumption (p ≈ 4e-11 over ~27k shingles), half
    # the shingling cost (0.71 → 0.36 s at sf0.1).
    # The shingle-hash projection is the query's heaviest per-row stage
    # and runs BEFORE any Exchange — on the single-row-group fixture
    # parquet that meant one task (1.5 s serial at sf0.1/32 cores).
    # spread() round-robins the narrow (doc_id, text) frame across the
    # task slots iff the scan under-splits; a well-laid-out corpus is
    # left alone (ops/spread.py).
    from sim_spark.ops.spread import spread

    toks = spread(d.select("doc_id", "text")).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    hs = F.array_distinct(
        sliding_window_hash_expr(
            w,
            3,
            lambda i: F.xxhash64(
                F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
            ),
        )
    )
    sh = toks.select("doc_id", hs.alias("shingles"))
    # Prefix-filtered set-similarity join (ops/setsim.py): candidates
    # must collide in their rarest-⌊0.2n⌋+1 token prefixes, replacing
    # the full Σdf² shared-shingle fanout (33M rows at sf0.1) with the
    # rare-token prefix join; exact Jaccard refines in-row.
    return jaccard_join_prefix(
        sh, 0.8, id_col="doc_id", arr_col="shingles", prehashed=True
    )


@query("dedup_minhash_lsh")  # rows-only: hash-bucket contents are seed/impl-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate near-dup candidates via MinHashLSH (seed=42) over a
    binary shingle vector (HashingTF). The scale path: candidate pairs
    come from LSH band buckets instead of the exact shingle join.
    tests/test_invariants.py checks recall ≥ 0.9 against
    dedup_jaccard_shingles ground truth.

    The banded join is EXPLICIT since r12: MLlib's
    ``approxSimilarityJoin`` hides the bucket join inside a plan whose
    mis-estimated explode side Catalyst tried to BROADCAST at sf10
    (11.5 GiB > the 8 GiB broadcast ceiling — measured in the r12
    sweep). The model supplies only the seeded hash functions; buckets
    are (table_no, hash) keys under the same >CAP saturation guard as
    ops/bandlsh (a bucket holding c docs contributes c² candidates and
    ~no signal on a dense fixture), the candidate join is a plain
    shuffle equi-join on the bucket key, and the exact Jaccard refine
    runs on the distinct-shingle sets. Scale shape: explode is 8 rows
    per doc, the only broadcast is the tiny over-cap bucket list, and
    every join keys on bucket/doc ids."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    d = table(spark, sf_dir, "documents")
    sh = _shingle_sets(d).filter(F.col("n_sh") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", seed=42, numHashTables=8)
    model = lsh.fit(feat)
    buckets = (
        model.transform(feat)
        .select("doc_id", F.posexplode("hashes").alias("table_no", "hv"))
        .select(
            "doc_id",
            "table_no",
            vector_to_array("hv").getItem(0).cast("long").alias("h"),
        )
    )
    over = (
        buckets.groupBy("table_no", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 64)
        .select("table_no", "h")
    )
    buckets = buckets.join(F.broadcast(over), ["table_no", "h"], "left_anti")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_no") == F.col("b.table_no"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    # Filter on the UNROUNDED jaccard and round only the output column:
    # filtering the rounded value admitted true jaccard in
    # [0.7999995, 0.8) that approxSimilarityJoin's distance <= 0.2
    # excluded (ADVICE r12). Recall caveat of the >64 cap above: pairs
    # co-occurring ONLY in saturated buckets are dropped — on this
    # fixture those buckets are constant-shingle floods with ~no
    # signal, and tests/test_invariants.py pins recall >= 0.9; at sf10
    # the cap is what keeps the bucket join off the c^2 blowup.
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard_est"))
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_DOT = """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
prod AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         unnest(q.embedding) AS qx, unnest(c.embedding) AS cx
  FROM q CROSS JOIN embeddings c
  WHERE q.vec_id <> c.vec_id
),
dots AS (
  SELECT qid, cid,
         ROUND(SUM(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE)), 6) AS score
  FROM prod GROUP BY qid, cid
)
"""


@query(
    "sim_topk_cosine",
    oracle=_DOT
    + """
SELECT qid, cid, score, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
  FROM dots
) t WHERE rn <= 5
""",
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors per query vector (vec_id < 50) by cosine ≡
    dot product (fixtures are unit-norm). Brute-force: broadcast the
    bounded query set against the corpus — the corpus side never moves.
    Scores are rounded to 6dp BEFORE the ranking window so float noise
    can't reorder near-ties across engines. 100 TB path: same refine,
    candidates from LSH/IVF buckets (SCALE.md)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    # The 64-element zip_with/aggregate dot per (corpus, query) pair is
    # the heavy per-row work and runs IN the corpus scan stage (broadcast
    # join = no Exchange on the stream side) — serial on the one-row-group
    # fixture parquet. spread() fans the narrow corpus frame across task
    # slots iff the scan under-splits (no-op on a well-split corpus).
    from sim_spark.ops.spread import spread

    c = spread(
        e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dots = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(dot, 6).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        dots.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(F.col("rn") <= 5)
    )


@query(
    "sim_topk_cosine_gemm",
    oracle=_DOT
    + """
SELECT qid, cid, score, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
  FROM dots
) t WHERE rn <= 5
""",
)
def sim_topk_cosine_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact top-5 via the block-partitioned GEMM physical
    strategy (one numpy matmul per corpus block against the replicated
    query set, cogrouped applyInPandas + guard-band exact re-rank,
    ops/cosine_blas.py — nothing reaches the driver) — same oracle as
    `sim_topk_cosine` proves the two plans equivalent. Crossover: at 50
    queries the JVM broadcast-HOF plan wins (Arrow transfer + two
    windows dominate); past ~10³ queries the per-pair HOF cost grows
    linearly while GEMM stays one matmul per block, and this path wins —
    pick per workload."""
    from sim_spark.ops.cosine_blas import exact_topk_cosine

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    return exact_topk_cosine(c, q, k=5)


@query(
    "sim_pairs_threshold",
    oracle="""
WITH dots AS (
  -- list_inner_product over DOUBLE[]-cast lists: identical rounded
  -- scores to the unnest-SUM formulation (verified pairwise at sf0.1),
  -- without the 64x unnest blowup that spilled ~38 GB at sf10
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, score FROM dots WHERE score > 0.4
""",
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine > 0.4 (symmetric-deduped a < b; 0.4
    because the fixture's measured max pair score is 0.51 — a higher cut
    matches zero pairs and the op would pass vacuously).
    Round-then-compare keeps the boundary decision identical in both
    engines; the quadratic candidate space is GEMM-pruned before the
    exact per-pair dot (ops/cosine_blas.py)."""
    from sim_spark.ops.cosine_blas import exact_cosine_pairs

    e = table(spark, sf_dir, "embeddings")
    return exact_cosine_pairs(e, 0.4, with_score=True)


# --------------------------------------------------------------------------
# clustering / scaling / voxel analogues
# --------------------------------------------------------------------------


@query(
    "ml_kmeans_assign_fixed",
    oracle="""
WITH c AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 10),
prod AS (
  SELECT v.vec_id AS vid, c.cid,
         unnest(v.embedding) AS vx, unnest(c.c_emb) AS cx
  FROM embeddings v CROSS JOIN c
),
dists AS (
  SELECT vid, cid,
         ROUND(SUM((CAST(vx AS DOUBLE) - CAST(cx AS DOUBLE))
                   * (CAST(vx AS DOUBLE) - CAST(cx AS DOUBLE))), 6) AS dist2
  FROM prod GROUP BY vid, cid
),
assigned AS (
  SELECT vid, cid,
         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist2 ASC, cid ASC) AS rn
  FROM dists
)
SELECT cid AS centroid, COUNT(*) AS n_assigned
FROM assigned WHERE rn = 1 GROUP BY cid
""",
)
def ml_kmeans_assign_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means ASSIGNMENT step against fixed centroids (the first 10
    vectors) — the deterministic, oracle-checkable half of Lloyd's
    iteration (sim's kmeans pipeline step). Centroids broadcast; each
    vector computes argmin squared distance (rounded before argmin)."""
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    v = e.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("v_emb"))
    dist2 = F.aggregate(
        F.zip_with(
            "v_emb", "c_emb",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = v.crossJoin(F.broadcast(cents)).select(
        "vid", "cid", F.round(dist2, 6).alias("dist2")
    )
    w = W.partitionBy("vid").orderBy(F.asc("dist2"), F.asc("cid"))
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("cid").alias("centroid"))
        .agg(F.count(F.lit(1)).alias("n_assigned"))
    )


@query("ml_kmeans_lloyd")  # rows-only: iterative; invariants in pytest
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means as driver-side iteration over cached DataFrame ops
    (ops/kmeans_relational.py) — sim's iterative-pipeline pattern done
    Spark-natively: broadcast literal centroids, one map + one agg per
    iteration, k×dim doubles to the driver per step. Deterministic
    (fixed init, rounded distances, 3 iterations); invariants: inertia
    monotonically non-increasing, clusters cover all points."""
    from sim_spark.ops.kmeans_relational import kmeans_lloyd

    e = table(spark, sf_dir, "embeddings")
    assigned, _inertia = kmeans_lloyd(e, k=10, n_iter=3)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"), F.round(F.sum("dist2"), 4).alias("sse"))
    )


@query("ml_kmeans_embeddings")  # rows-only: trained cluster ids aren't SQL-derivable
def ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MLlib KMeans (k=10, seed=42, k-means||) on the embeddings —
    the iterative half of sim's kmeans pipeline. Output: cluster sizes,
    descending (size, cluster) order. Invariants (10 clusters, sizes sum
    to N, seed-stable) in tests/test_invariants.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = table(spark, sf_dir, "embeddings")
    feat = e.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=10, seed=42, initMode="k-means||", maxIter=20, featuresCol="features")
    model = km.fit(feat)
    return (
        model.transform(feat)
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


@query(
    "ml_feature_scale",
    oracle="""
WITH stats AS (
  SELECT event_type,
         AVG(value) AS mu,
         STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.mu) / s.sigma, 6) AS value_z
FROM events e JOIN stats s USING (event_type)
""",
)
def ml_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score (StandardScaler semantics, relational for
    oracle-ability): one agg + broadcast join back, no window over the
    full fact table."""
    e = table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            # try_divide: a constant-valued group has sigma=0, where ANSI
            # division ABORTS while DuckDB returns NULL — try_divide gives
            # the oracle's NULL semantics.
            F.round(
                F.try_divide(F.col("value") - F.col("mu"), F.col("sigma")), 6
            ).alias("value_z"),
        )
    )


@query(
    "voxel_histogram",
    oracle="""
SELECT CAST(floor((CAST(x AS DOUBLE) + 0.5) / 0.02) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM (SELECT unnest(embedding) AS x FROM embeddings)
GROUP BY 1
""",
)
def voxel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global fixed-width histogram over every embedding component —
    sim's histogram pipeline semantics (two-stage reduce: partial per
    partition, merge on the 50-ish bucket keys). The bucket expression is
    computed identically in both engines (no width_bucket edge cases)."""
    e = table(spark, sf_dir, "embeddings")
    x = F.explode("embedding").alias("x")
    return (
        e.select(x)
        .select(
            F.floor((F.col("x").cast("double") + 0.5) / 0.02).cast("bigint").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "voxel_minmax_global",
    oracle=f"""
SELECT ROUND(CAST(MIN(x) AS DOUBLE), 6) AS min_comp,
       ROUND(CAST(MAX(x) AS DOUBLE), 6) AS max_comp,
       {sql_dsum('CAST(x AS DOUBLE)')} AS sum_comp,
       COUNT(*) AS n_comp
FROM (SELECT unnest(embedding) AS x FROM embeddings)
""",
)
def voxel_minmax_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/sum over every component of every embedding — sim's
    min-max voxel reduction (partial per partition → single-row merge)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(F.explode("embedding").alias("x"))
        .agg(
            F.round(F.min("x").cast("double"), 6).alias("min_comp"),
            F.round(F.max("x").cast("double"), 6).alias("max_comp"),
            F.sum(F.col("x").cast("double").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_comp"),
            F.count(F.lit(1)).alias("n_comp"),
        )
    )


@query("ml_pca_power_iter")  # rows-only: sign/rotation of the eigvec isn't SQL-derivable
def ml_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component projection of the embedding corpus by
    relational power iteration (ops/power_iteration.py) — the whitening/
    decorrelation step of an embedding pipeline. Only dim-sized model
    floats touch the driver; invariants (unit component, eigen-equation
    residual, agreement with a direct eigensolver on the collected
    fixture) are pinned in tests/test_invariants.py."""
    from sim_spark.ops.power_iteration import power_iteration_top_component

    e = table(spark, sf_dir, "embeddings")
    _, _, scores = power_iteration_top_component(e, dim=64, n_iter=8)
    return scores


@query("ml_logistic_gd")  # rows-only: iterative float model isn't SQL-derivable
def ml_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (ops/logistic_gd.py):
    full-batch GD where each epoch is one dim+2-column SUM aggregation
    (the gradient), only model floats on the driver — the relational
    form of the classifier-training step a data-curation pipeline runs
    (quality classifiers, lang-ID heads) over frozen embeddings.
    Certificates (monotone non-increasing convex loss, finite weights,
    below-chance-loss improvement) are pinned in tests/
    test_invariants.py; the returned frame scores every vector."""
    from sim_spark.ops.logistic_gd import logistic_gd

    e = table(spark, sf_dir, "embeddings")
    labeled = e.select("vec_id", "embedding", (F.col("label") == 2).cast("int").alias("y"))
    _, _, _, preds = logistic_gd(labeled, label_col="y", dim=64, n_epochs=6)
    return preds


@query(
    "ml_assoc_rules_lift",
    oracle="""
WITH bask AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
),
n_bask AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM bask),
item_s AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM bask GROUP BY item),
pair_s AS (
  SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS sab
  FROM bask a JOIN bask b ON a.ok = b.ok AND a.item < b.item
  GROUP BY a.item, b.item HAVING COUNT(*) >= 3
),
scored AS (
  SELECT p.ia, p.ib, p.sab, sa.s AS sa, sb.s AS sb, n.n,
         CAST(floor(n.n * p.sab * 1000000000.0 / (sa.s * sb.s) + 0.5) AS BIGINT)
           AS lift_nano
  FROM pair_s p
  JOIN item_s sa ON sa.item = p.ia
  JOIN item_s sb ON sb.item = p.ib
  CROSS JOIN n_bask n
)
SELECT ia, ib, sab AS support_pair, sa AS support_a, sb AS support_b,
       ROUND(sab * 1.0 / sa, 6) AS confidence_a_to_b,
       ROUND(lift_nano / 1000000000.0, 6) AS lift
FROM scored
ORDER BY lift_nano DESC, ia, ib LIMIT 15
""",
)
def ml_assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the co-purchase
    graph's rule-mining sibling): pairwise support from the
    basket-keyed self-join (equi on orderkey, never all-pairs),
    confidence and LIFT from exact integer supports. Lift ordering is
    nano-quantized BEFORE the top-15 cut — floor(n·s_ab·1e9/(s_a·s_b)
    + 0.5) is one deterministic double expression of exact integers, so
    the ranking (lift desc, pair asc) can never split on a float
    boundary between engines. min-support 3 prunes the pair tail the
    way a real frequent-itemset pass would.

    Scale shape: support counting is one partial+final aggregate per
    arity; the pair self-join shuffles on the basket key, whose fanout
    is bounded by basket size (TPC-H ~7 lines) — the a-priori candidate
    pattern, not a cross product."""
    li = table(spark, sf_dir, "lineitem")
    bask = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    n_bask = bask.agg(F.count_distinct("ok").cast("bigint").alias("n"))
    item_s = bask.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a, b = bask.alias("a"), bask.alias("b")
    pair_s = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("sab"))
        .filter(F.col("sab") >= 3)
    )
    scored = (
        pair_s.join(item_s.select(F.col("item").alias("ia"), F.col("s").alias("sa")), "ia")
        .join(item_s.select(F.col("item").alias("ib"), F.col("s").alias("sb")), "ib")
        .crossJoin(F.broadcast(n_bask))
        .select(
            "ia",
            "ib",
            "sab",
            "sa",
            "sb",
            F.floor(
                F.col("n") * F.col("sab") * 1000000000.0 / (F.col("sa") * F.col("sb"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lift_nano"),
        )
    )
    return (
        scored.select(
            "ia",
            "ib",
            F.col("sab").alias("support_pair"),
            F.col("sa").alias("support_a"),
            F.col("sb").alias("support_b"),
            F.round(F.col("sab") * 1.0 / F.col("sa"), 6).alias("confidence_a_to_b"),
            F.round(F.col("lift_nano") / 1000000000.0, 6).alias("lift"),
            "lift_nano",
        )
        .orderBy(F.desc("lift_nano"), "ia", "ib")
        .limit(15)
        .drop("lift_nano")
    )


@query(
    "ml_als_rank1",
    oracle="""
WITH r AS (
  SELECT o_custkey AS u, l_partkey AS it,
         CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
uf AS (
  SELECT u, CAST(floor(SUM(q) * 1000000000.0 / COUNT(*) + 0.5) AS BIGINT)
           AS u_nano
  FROM r GROUP BY u
),
vf AS (
  SELECT r.it,
         CAST(floor(CAST(SUM(r.q * uf.u_nano) AS DOUBLE) * 1000000000.0
                    / CAST(SUM(CAST(uf.u_nano AS HUGEINT) * uf.u_nano) AS DOUBLE)
                    + 0.5) AS BIGINT) AS v_nano
  FROM r JOIN uf ON uf.u = r.u GROUP BY r.it
),
ranked AS (
  SELECT 'user' AS side, u AS id, u_nano AS nano,
         ROW_NUMBER() OVER (ORDER BY u_nano DESC, u) AS rn
  FROM uf
  UNION ALL
  SELECT 'item', it, v_nano, ROW_NUMBER() OVER (ORDER BY v_nano DESC, it)
  FROM vf
)
SELECT side, id, ROUND(nano / 1000000000.0, 6) AS factor
FROM ranked WHERE rn <= 10
""",
)
def ml_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One rank-1 ALS alternation over the customer x part quantity
    matrix (v init = 1): the user half-step is the exact per-user mean
    rating, the item half-step the u-weighted least-squares projection —
    both closed-form divisions of exact integer reductions, nano-
    quantized between half-steps so the alternation is reproducible at
    any parallelism (the unrolled-ML recipe applied to the recommender
    factorization). Top-10 users and items by factor.

    Scale shape: ratings are one join + keyed aggregate; each half-step
    is a single partial+final aggregate keyed on the entity being
    solved, with the counterpart factors flowing through the join —
    exactly how distributed ALS iterates, truncated to one exact
    alternation."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it"))
        .agg(
            # floor(x+0.5), never a raw double->long cast: DuckDB CAST
            # rounds while Spark truncates (repo pitfall rule) — the
            # fixture's quantities happen to be integral, but the
            # contract must not depend on that.
            F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
            .cast("bigint")
            .alias("q")
        )
    )
    uf = r.groupBy("u").agg(
        F.floor(F.sum("q") * 1000000000.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("u_nano")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    vf = (
        r.join(uf, "u")
        .groupBy("it")
        .agg(
            F.floor(
                F.sum(F.col("q") * F.col("u_nano")).cast("double")
                * 1000000000.0
                / F.sum(dec("u_nano") * F.col("u_nano")).cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("v_nano")
        )
    )
    # r12: top-10 per side is a TakeOrderedAndProject (orderBy+limit),
    # never a global row_number window — the factor frames are
    # entity-scale (#users / #items) and a single-partition rank there
    # is the straggler class this round retired.
    users = (
        uf.orderBy(F.desc("u_nano"), F.asc("u"))
        .limit(10)
        .select(
            F.lit("user").alias("side"),
            F.col("u").alias("id"),
            F.col("u_nano").alias("nano"),
        )
    )
    items = (
        vf.orderBy(F.desc("v_nano"), F.asc("it"))
        .limit(10)
        .select(
            F.lit("item").alias("side"),
            F.col("it").alias("id"),
            F.col("v_nano").alias("nano"),
        )
    )
    return users.unionAll(items).select(
        "side", "id", F.round(F.col("nano") / 1000000000.0, 6).alias("factor")
    )

"""Training-data curation operators (SURVEY.md §2.11 extension): the
dataset-assembly steps between "raw corpus" and "tokens in the trainer"
that a 100 TB pipeline runs after dedup/quality filtering.

Scale designs:
- split_train_val_test: pure narrow map — a deterministic hash of the
  stable document key decides the split, so membership is reproducible
  across runs/clusters and never needs a shuffle or a stored assignment
  table. Lexicographic thresholds on the md5 hex prefix (not modulo on
  a parsed int) keep the expression engine-portable.
- decontam_ngram_overlap: benchmark-contamination check as a shingle
  equi-join (the bucket-then-refine shape yet again): explode documents
  into word 5-grams, LEFT SEMI JOIN against the benchmark set's distinct
  grams. The benchmark side is bounded (eval suites are ~10^6 grams) so
  AQE broadcasts it; the corpus side streams map-side with no all-pairs
  stage. Skewed grams (boilerplate) only fan out on the bounded side.
- pack_token_budget: contiguous greedy packing = one window cumsum per
  (source) stream, bin id from integer division — no per-bin shuffle,
  no driver loop. At 100 TB the partition key is (source, shard) so no
  single window partition exceeds an executor.
- embed_quantize_int8: per-row symmetric int8 quantization entirely in
  array HOFs (JVM codegen) — the standard "shrink the embedding store
  4x" step; certificate columns (q_sum, max reconstruction error
  <= scale/2) make it oracle-checkable without shipping float arrays.
- mixture_weights_sqrt: temperature-based source reweighting
  (w ~ n^0.5, the alpha=0.5 point of the sampling-temperature family).
  sqrt, unlike pow, is IEEE-correctly-rounded, so DuckDB and the JVM
  agree bit-for-bit before the display round.
- sample_stratified_hash: deterministic per-stratum subsample — rank by
  md5 within the stratum, keep the first ceil(f*n). Reproducible (no
  RNG state), rank window shuffles once on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.ops.distrank import bounded_total_window as _bounded_total_window
from sim_spark.registry import query

_BUDGET = 512  # tokens per packed sequence bin

# --------------------------------------------------------------------------
# deterministic split
# --------------------------------------------------------------------------


@query(
    "split_train_val_test",
    oracle="""
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM (SELECT lang, n_chars,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
             ELSE 'test' END AS split
      FROM documents)
GROUP BY split, lang
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 split by md5 of the document key, verified
    by per-(split, lang) counts. The hex-prefix comparison ('cc' =
    204/256 ~ 79.7%, 'e6' = 230/256 ~ 89.8%) is uniform because md5 is;
    string thresholds sidestep engine-specific hex-to-int builtins."""
    d = table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def word_5grams(df: DataFrame, *keep: str) -> DataFrame:
    """One row per word 5-gram of `text`, keeping `keep` id columns.

    sequence(1, n-4) DESCENDS when n < 5 (Spark auto-steps -1), so a
    short doc would feed slice() a 0/negative start and crash; guard to
    an empty gram list like the oracle's generate_series. Shared by
    decontam_ngram_overlap and curate_pipeline_e2e so the guard lives in
    exactly one place."""
    # Tokenize ONCE into a real column (dedup_onion_ngram note): a
    # split() spliced into the transform lambda re-evaluates per element
    # on the interpreted HOF path.
    t = df.select(*keep, F.split("text", " ").alias("__ws"))
    words = F.col("__ws")
    starts = F.when(
        F.size(words) >= 5, F.sequence(F.lit(1), F.size(words) - 4)
    ).otherwise(F.array().cast("array<int>"))
    return t.select(
        *keep,
        F.explode(
            F.transform(starts, lambda i: F.array_join(F.slice(words, i, 5), " "))
        ).alias("gram"),
    )


@query(
    "decontam_ngram_overlap",
    oracle="""
WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
grams AS (SELECT doc_id, source, array_to_string(list_slice(w, i, i + 4), ' ') AS gram
          FROM (SELECT doc_id, source, w,
                       unnest(generate_series(1, len(w) - 4)) AS i
                FROM words)),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT DISTINCT g.doc_id, g.source
FROM grams g JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % 97 <> 0
""",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at
    least one word 5-gram with the held-out benchmark set (stand-in:
    doc_id % 97 == 0). LEFT SEMI against the benchmark's distinct grams
    — the scaled version of GPT-3-style 13-gram decontamination; the
    bounded benchmark side broadcasts under AQE."""
    d = table(spark, sf_dir, "documents")
    grams = word_5grams(d, "doc_id", "source")
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "gram", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------


@query(
    "pack_token_budget",
    oracle=f"""
WITH toks AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
              FROM documents),
packed AS (SELECT source, n_tok,
             CAST(FLOOR(CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                              ROWS UNBOUNDED PRECEDING) - n_tok
                             AS DOUBLE) / {_BUDGET}) AS BIGINT) AS bin
           FROM toks)
SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
FROM packed GROUP BY source, bin
""",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: stream each source's documents in key
    order, open a new bin each time the running token count crosses a
    512-token boundary (bin = floor(prefix_sum_before_doc / budget)).
    One window cumsum, no driver loop; per-(source, bin) occupancy is
    the packing manifest a tokenizer shard consumes."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    toks = d.select("doc_id", "source", n_tok.alias("n_tok"))
    cum = (
        F.sum("n_tok")
        .over(W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0))
    )
    packed = toks.select(
        "source",
        "n_tok",
        F.floor(((cum - F.col("n_tok")).cast("double")) / _BUDGET).alias("bin"),
    )
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
    )


# --------------------------------------------------------------------------
# embedding quantization
# --------------------------------------------------------------------------


@query(
    "embed_quantize_int8",
    oracle="""
WITH s AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
           FROM embeddings)
SELECT vec_id,
       ROUND(scale, 8) AS scale_r,
       CAST(list_sum(list_transform(embedding,
              x -> round(CAST(x AS DOUBLE) / scale))) AS BIGINT) AS q_sum,
       ROUND(list_max(list_transform(embedding,
              x -> abs(round(CAST(x AS DOUBLE) / scale) * scale
                       - CAST(x AS DOUBLE)))), 8) AS max_err
FROM s
""",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = max|x|/127,
    q = round(x/scale)), reported as oracle-checkable certificates:
    rounded scale, integer sum of the quantized codes, and the max
    reconstruction error (bounded by scale/2). All array HOFs — stays
    in whole-stage codegen, no Python, no shuffle."""
    e = table(spark, sf_dir, "embeddings")
    absd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    scale = F.array_max(absd) / F.lit(127.0)
    q = F.transform("embedding", lambda x: F.round(x.cast("double") / scale, 0))
    err = F.transform(
        "embedding",
        lambda x: F.abs(
            F.round(x.cast("double") / scale, 0) * scale - x.cast("double")
        ),
    )
    return e.select(
        "vec_id",
        F.round(scale, 8).alias("scale_r"),
        F.aggregate(q, F.lit(0.0), lambda a, x: a + x).cast("bigint").alias("q_sum"),
        F.round(F.array_max(err), 8).alias("max_err"),
    )


# --------------------------------------------------------------------------
# mixture weights
# --------------------------------------------------------------------------


@query(
    "mixture_weights_sqrt",
    oracle="""
WITH c AS (SELECT source, COUNT(*) AS n_docs, SQRT(COUNT(*)) AS w FROM documents
           GROUP BY source)
SELECT source, n_docs, ROUND(w / SUM(w) OVER (), 6) AS mix_weight
FROM c
""",
)
def mixture_weights_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-temperature source reweighting at alpha = 0.5:
    mix_weight ~ sqrt(n_docs), normalized — the standard knob that
    up-samples small sources in a training mixture. sqrt (not pow) so
    both engines produce the identical IEEE value pre-round."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.sqrt(F.col("n_docs").cast("double"))
    return c.select(
        "source",
        "n_docs",
        F.round(w / F.sum(w).over(_bounded_total_window("n_docs")), 6).alias(
            "mix_weight"
        ),
    )


# --------------------------------------------------------------------------
# stratified deterministic sampling
# --------------------------------------------------------------------------


@query(
    "sample_stratified_hash",
    oracle="""
WITH r AS (SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
           FROM documents)
SELECT doc_id, lang FROM r WHERE rk <= CEIL(0.2 * n)
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% stratified sample per language: rank documents
    inside each stratum by md5 of their key and keep the first
    ceil(0.2 * n). No RNG — membership is stable across runs, resumable
    shards included; one shuffle on the stratum key."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    win = W.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(win).alias("rk"),
            F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
        )
        .filter(F.col("rk") <= F.ceil(0.2 * F.col("n")))
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# bag-of-words canonical dedup
# --------------------------------------------------------------------------


@query(
    "dedup_bow_canonical",
    oracle="""
WITH sig AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS sig
  FROM documents
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY sig) AS keep_id,
       CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY sig)
            THEN 0 ELSE 1 END AS is_dup,
       COUNT(*) OVER (PARTITION BY sig) AS group_size
FROM sig
""",
)
def dedup_bow_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization dedup: two documents are duplicates when their
    word MULTISETS match (md5 of the sorted token list), catching
    shuffled/reordered copies exact-hash dedup misses. One window
    shuffle on the 128-bit signature assigns each group's minimum
    doc_id as the keeper. Signatures are uniform hashes, so the
    partitioning is skew-free at any corpus size."""
    d = table(spark, sf_dir, "documents")
    sig = F.md5(F.array_join(F.array_sort(F.split("text", " ")), " "))
    w = W.partitionBy("sig")
    return (
        d.select("doc_id", sig.alias("sig"))
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("keep_id"),
            F.when(F.col("doc_id") == F.min("doc_id").over(w), 0)
            .otherwise(1)
            .alias("is_dup"),
            F.count(F.lit(1)).over(w).alias("group_size"),
        )
    )


# --------------------------------------------------------------------------
# weighted reservoir sampling (Efraimidis–Spirakis A-ES, derandomized)
# --------------------------------------------------------------------------

_HEXVAL = " + ".join(
    "(strpos('0123456789abcdef', substring(h, %d, 1)) - 1) * %d" % (i + 1, 16 ** (7 - i))
    for i in range(8)
)


@query(
    "sample_weighted_reservoir",
    oracle=f"""
WITH u AS (
  SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
keyed AS (
  SELECT doc_id, lang, n_chars,
         ln((({_HEXVAL}) + 0.5) / 4294967296.0) / n_chars AS k
  FROM u
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM keyed ORDER BY k DESC, doc_id LIMIT 100
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each document draws u = md5-uniform(0,1) and competes with key
    u^(1/weight) — equivalently ln(u)/weight — so selection probability
    is proportional to weight (n_chars) and the winner set is the top-k
    by key. md5 replaces the RNG, making the sample reproducible across
    engines, runs, and partitionings; top-k is a TakeOrdered (per-
    partition heap + driver merge of k), never a global sort."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    k = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"), k.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(100)
        .select("doc_id", "lang", "n_chars")
    )


# --------------------------------------------------------------------------
# PII redaction (round 5)
# --------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"
_PHONE_RE = r"[0-9]{7,}"


@query(
    "text_pii_redact",
    oracle=f"""
WITH t AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call 55500' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
                 ELSE '' END AS t2
  FROM documents
),
r AS (
  SELECT source, t2,
         regexp_replace(regexp_replace(t2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS red,
         len(regexp_extract_all(t2, '{_EMAIL_RE}', 0)) AS ne,
         len(regexp_extract_all(t2, '{_PHONE_RE}', 0)) AS np
  FROM t
)
SELECT source, count(*) AS n_docs,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(np) AS BIGINT) AS n_phones,
       CAST(sum(len(t2) - len(red)) AS BIGINT) AS chars_delta
FROM r GROUP BY source
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before anything ships. The synthetic corpus contains no PII, so
    deterministic fake PII (an email for doc_id % 3 != 0, a 10-digit
    phone for even doc_id) is injected in-plan from doc_id — both
    engines replay the same injection, then the REAL redaction machinery
    (regexp_replace global, regexp_extract_all counting) runs over it
    and is hash-checked: per source, docs scanned, emails/phones
    redacted, and characters removed.

    Patterns use only character classes + counted repeats, the regex
    subset where Java (Spark) and RE2 (DuckDB) agree; DuckDB needs the
    explicit 'g' flag to match Spark's replace-all default. Pure
    projection + one hash aggregate — codegen end-to-end, scan-bound at
    100 TB."""
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.when(
        did % 3 != 0,
        F.concat(F.lit(" user"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" call 55500"),
            F.lpad((did % 100000).cast("string"), 5, "0"),
        ),
    ).otherwise(F.lit(""))
    t2 = F.concat(F.col("text"), email, phone)
    red = F.regexp_replace(
        F.regexp_replace(t2, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        d.select(
            "source",
            F.size(F.regexp_extract_all(t2, F.lit(_EMAIL_RE), F.lit(0))).alias("ne"),
            F.size(F.regexp_extract_all(t2, F.lit(_PHONE_RE), F.lit(0))).alias("np"),
            (F.length(t2) - F.length(red)).alias("delta"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
            F.sum("delta").alias("chars_delta"),
        )
    )


@query(
    "text_unigram_surprisal",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
lm AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
tot AS (SELECT count(*) AS t FROM tok),
dc AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY doc_id, word),
terms AS (
  SELECT dc.doc_id,
         CAST(floor(dc.cnt * ln(CAST(lm.c AS DOUBLE) / t)
                    * 1000000000 + 0.5) AS BIGINT) AS nano
  FROM dc JOIN lm USING (word), tot
),
s AS (
  SELECT doc_id, CAST(sum(nano) AS BIGINT) AS nano_sum
  FROM terms GROUP BY doc_id
)
SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
       CAST(((((-s.nano_sum) + len(w.ws) // 2) // len(w.ws)) + 500) // 1000
            AS DOUBLE) / 1000000 AS mean_surprisal
FROM w JOIN s ON w.doc_id = s.doc_id
""",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring: per-document mean unigram
    surprisal (-1/n Σ count_w · ln p(w)) under the corpus's own unigram
    LM — the cheap perplexity proxy curation pipelines use to flag
    gibberish (high) and boilerplate (low) before an expensive model
    scores anything.

    Cross-engine float discipline: each (doc, word) log-prob term —
    IEEE-identical in both engines — is snapped to integer nano-units
    (floor(term·1e9 + 0.5)) BEFORE the per-doc sum, so the sum is
    associative and NO summation order can drift it (the round-5 stress
    sweep caught exactly this failure mode in text_entropy_score; this
    query is hardened the same way). A side benefit: the per-doc reduce
    is a plain long SUM instead of a sort-pinned list fold.

    Scale shape: the LM is a vocab-bounded aggregate (broadcast back),
    the doc-side join runs on (doc, DISTINCT word) rows — bounded by
    corpus tokens — and the per-doc reduce is one keyed aggregate. No
    Python, no all-pairs anything."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    lm = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("t"))
    dc = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    term = F.col("cnt") * F.log(F.col("c").cast("double") / F.col("t"))
    terms = (
        dc.join(F.broadcast(lm), "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.floor(term * 1000000000 + 0.5).cast("long").alias("nano"),
        )
    )
    s = terms.groupBy("doc_id").agg(F.sum("nano").alias("nano_sum"))
    n = d.select("doc_id", F.size(F.split("text", " ")).alias("n_words"))
    # All-integer mean + final round ((x + n/2) div n, then (+500) div
    # 1000): float ROUND after quantization creates exact 6dp half-ties
    # where the engines' ROUNDs disagree (measured ~2% of ties). The
    # divisions are Spark's integral `div` — a double `/` + cast would
    # lose exactness once the nano sum exceeds ~2^52 (r9 review; the
    # oracle's // is exact at any magnitude).
    micro = F.expr(
        "((((-nano_sum) + n_words div 2) div n_words) + 500) div 1000"
    )
    return n.join(s, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        (micro.cast("double") / 1000000).alias("mean_surprisal"),
    )


@query(
    "text_bigram_perplexity",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
v AS (SELECT count(DISTINCT word) AS vs FROM tok),
bg AS (
  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM w WHERE len(ws) >= 2)
),
lm2 AS (SELECT a, b, count(*) AS c2 FROM bg GROUP BY a, b),
lm1 AS (SELECT a, count(*) AS c1 FROM bg GROUP BY a),
dc AS (SELECT doc_id, a, b, count(*) AS cnt FROM bg GROUP BY doc_id, a, b),
terms AS (
  SELECT dc.doc_id,
         CAST(floor(dc.cnt * ln(CAST(lm2.c2 + 1 AS DOUBLE) / (lm1.c1 + v.vs))
                    * 1000000000 + 0.5) AS BIGINT) AS nano
  FROM dc JOIN lm2 USING (a, b) JOIN lm1 USING (a), v
),
s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nb_terms,
         CAST(sum(nano) AS BIGINT) AS nano_sum
  FROM terms GROUP BY doc_id
),
nb AS (SELECT doc_id, len(ws) - 1 AS n_bigrams FROM w WHERE len(ws) >= 2),
score AS (
  SELECT nb.doc_id, CAST(nb.n_bigrams AS BIGINT) AS n_bigrams,
         CAST((((((-s.nano_sum) + nb.n_bigrams // 2) // nb.n_bigrams) + 500)
               // 1000) AS BIGINT) AS mean_nll_micro
  FROM nb JOIN s ON nb.doc_id = s.doc_id
)
SELECT doc_id, n_bigrams, mean_nll_micro,
       CAST(ntile(10) OVER (ORDER BY mean_nll_micro, doc_id) AS BIGINT)
         AS ppl_decile,
       ntile(10) OVER (ORDER BY mean_nll_micro, doc_id) BETWEEN 2 AND 9
         AS keep
FROM score
""",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate (r9): per-document BIGRAM
    negative-log-likelihood under the corpus's own add-1-smoothed
    bigram LM — p(b|a) = (c(a,b)+1) / (c(a)+V) with context counts from
    the bigram table and V the full vocabulary size — reported in exact
    integer micro-nats (perplexity = exp(mean NLL); the integer NLL is
    what stays hash-oracled — exp's last ulp differs between libms, and
    the gate only needs the monotone rank anyway). Deciles over
    (score, doc_id) via NTILE; keep = middle deciles 2..9, CCNet's
    drop-the-head-boilerplate-and-tail-gibberish rule.

    Cross-engine float discipline: each (doc, bigram) log term is
    snapped to integer nano-units BEFORE the per-doc sum (the
    text_unigram_surprisal idiom — associative long SUM, no partition-
    order drift), and the mean + micro-rounding are all-integer.

    Scale shape: the LM is two vocab²-bounded aggregates broadcast
    back; the doc side runs on (doc, DISTINCT bigram) rows; the per-doc
    reduce is one keyed long SUM. The NTILE window sorts only the
    per-DOC score table (corpus-sublinear); at 100 TB swap in
    approx-quantile decile cutoffs broadcast against the same scores."""
    d = table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("ws"))
    tok = w.select(F.explode("ws").alias("word"))
    v = tok.agg(F.countDistinct("word").alias("vs"))
    w2 = w.filter(F.size("ws") >= 2)
    bg = w2.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("i"),
        "ws",
    ).select(
        "doc_id",
        F.element_at("ws", F.col("i")).alias("a"),
        F.element_at("ws", F.col("i") + 1).alias("b"),
    )
    lm2 = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    lm1 = bg.groupBy("a").agg(F.count(F.lit(1)).alias("c1"))
    dc = bg.groupBy("doc_id", "a", "b").agg(F.count(F.lit(1)).alias("cnt"))
    term = F.col("cnt") * F.log(
        (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("vs"))
    )
    terms = (
        dc.join(F.broadcast(lm2), ["a", "b"])
        .join(F.broadcast(lm1), "a")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.floor(term * 1000000000 + 0.5).cast("long").alias("nano"),
        )
    )
    s = terms.groupBy("doc_id").agg(F.sum("nano").alias("nano_sum"))
    nb = w2.select("doc_id", (F.size("ws") - 1).alias("n_bigrams"))
    # integral `div` end to end — a double `/` + cast loses exactness
    # once -nano_sum exceeds ~2^52 (docs with >~4e5 bigrams), where the
    # oracle's // stays exact (r9 review)
    micro = F.expr(
        "((((-nano_sum) + n_bigrams div 2) div n_bigrams) + 500) div 1000"
    )
    score = nb.join(s, "doc_id").select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        micro.alias("mean_nll_micro"),
    )
    # r12: NTILE(10) without a single-partition window OR a shuffle of
    # the doc frame — ops/distrank.ntile_by locates the 9 decile
    # boundary (value, doc_id) pairs on the distinct-value frame and
    # broadcasts them; each doc's decile is a pure projection. Same
    # NTILE semantics as the oracle's window formulation.
    from sim_spark.ops.distrank import ntile_by
    from sim_spark.scratch import track_cache

    score = track_cache(score)  # one row per doc, read by both branches
    dec = F.col("__tile")
    return ntile_by(
        score, "mean_nll_micro", "doc_id", 10, out="__tile"
    ).select(
        "doc_id",
        "n_bigrams",
        "mean_nll_micro",
        dec.cast("bigint").alias("ppl_decile"),
        dec.between(2, 9).alias("keep"),
    )


_DOMAIN_CAP = 50


@query(
    "curate_domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN doc_id ELSE 0 END) AS BIGINT) AS kept_checksum
FROM ranked GROUP BY source ORDER BY source
""",
)
def curate_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap for a training mix: every source keeps
    at most N documents, chosen by a DETERMINISTIC md5 priority (a seeded
    shuffle both engines replay — no stored sample table, no RNG), the
    standard guard against one crawl domain dominating the mixture. One
    window shuffle keyed on source; the kept-id checksum pins the exact
    selection, not just its size. At 100 TB the same plan holds — the
    window partitions by source, and a heavily skewed source is bounded
    by the cap itself on output."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rn") <= _DOMAIN_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rn") <= _DOMAIN_CAP, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_checksum"),
        )
        .orderBy("source")
    )


@query(
    "ml_kfold_assign",
    oracle="""
WITH folded AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('fold|' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 5
           AS fold
  FROM documents
)
SELECT fold, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS fold_checksum
FROM folded GROUP BY fold, lang ORDER BY fold, lang
""",
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment (md5-hash fold,
    no stored assignment table — any worker recomputes membership, the
    `split_train_val_test` discipline applied to CV) with the per-fold
    class-balance table a training loop checks before trusting fold
    metrics. The checksum pins the exact membership. One narrow scan +
    one aggregate on a 5×|langs| key space."""
    d = table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold|"), F.col("doc_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    return (
        d.select(fold.alias("fold"), "lang", "doc_id")
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("fold_checksum"),
        )
        .orderBy("fold", "lang")
    )


@query(
    "curate_url_canonicalize",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' ||
         CASE WHEN doc_id % 4 = 0 THEN 'WWW.' || upper(source) ELSE source END
         || '.example.com/p/' || CAST(doc_id % 40 AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0
                 THEN '?utm_source=feed&id=' || CAST(doc_id % 40 AS VARCHAR)
                 WHEN doc_id % 3 = 1
                 THEN '?id=' || CAST(doc_id % 40 AS VARCHAR) || '&utm_campaign=x'
                 ELSE '?id=' || CAST(doc_id % 40 AS VARCHAR) END AS url
  FROM documents
),
canon AS (
  SELECT doc_id, url,
         CASE WHEN lower(split_part(split_part(url, '://', 2), '/', 1)) LIKE 'www.%'
              THEN substr(lower(split_part(split_part(url, '://', 2), '/', 1)), 5)
              ELSE lower(split_part(split_part(url, '://', 2), '/', 1)) END
         || '/p/' || split_part(split_part(split_part(url, '://', 2), '?', 1), '/', 3)
         || '?id=' || split_part(split_part(url, 'id=', 2), '&', 1) AS curl
  FROM u
)
SELECT CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
       CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical_distinct,
       CAST(count(DISTINCT url) - count(DISTINCT curl) AS BIGINT) AS n_merged
FROM canon
""",
)
def curate_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the crawl-dedup step that merges tracking
    variants of the same page: case-fold and strip the www. prefix from
    the host, drop utm_* parameters, keep the identifying param. The
    synthesized corpus plants WWW./utm variants of the same logical
    page, and the canonical-distinct count proves they merged (raw
    distinct > canonical distinct). Pure string algebra in codegen;
    at 100 TB this runs as a projection ahead of the exact-hash dedup
    shuffle, cutting its key space first."""
    d = table(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 40).cast("string")
    host_part = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.lit("WWW."), F.upper("source"))
    ).otherwise(F.col("source"))
    q = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), page))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("?id="), page, F.lit("&utm_campaign=x")))
        .otherwise(F.concat(F.lit("?id="), page))
    )
    url = F.concat(
        F.lit("https://"), host_part, F.lit(".example.com/p/"), page, q
    )
    u = d.select("doc_id", url.alias("url"))
    after_scheme = F.expr("split_part(url, '://', 2)")
    host_raw = F.lower(F.expr("split_part(split_part(url, '://', 2), '/', 1)"))
    host = F.when(
        host_raw.startswith("www."), F.expr("substr(lower(split_part(split_part(url, '://', 2), '/', 1)), 5)")
    ).otherwise(host_raw)
    page_id = F.expr("split_part(split_part(url, 'id=', 2), '&', 1)")
    path3 = F.expr("split_part(split_part(split_part(url, '://', 2), '?', 1), '/', 3)")
    curl = F.concat(host, F.lit("/p/"), path3, F.lit("?id="), page_id)
    canon = u.select("doc_id", "url", curl.alias("curl"))
    return canon.agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.count_distinct("url").cast("long").alias("n_raw_distinct"),
        F.count_distinct("curl").cast("long").alias("n_canonical_distinct"),
        (F.count_distinct("url") - F.count_distinct("curl"))
        .cast("long")
        .alias("n_merged"),
    )

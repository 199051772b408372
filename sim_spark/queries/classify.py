"""Relational classifiers / ensemble quality gates over `documents`.

Both operators are pure DataFrame plans — no MLlib, no Python UDFs — so
they inherit partial+final aggregation, AQE, and broadcast decisions
like any other query, and they scale exactly like the aggregations they
are made of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sim_spark.io import table
from sim_spark.registry import query

_NB_VOCAB = 200


@query(
    "ml_naive_bayes_lang",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(str_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word FROM tok GROUP BY word
  ORDER BY count(*) DESC, word ASC LIMIT {_NB_VOCAB}
),
vtok AS (SELECT t.* FROM tok t JOIN vocab v USING (word)),
cnt_wl AS (SELECT lang, word, count(*) AS c FROM vtok GROUP BY lang, word),
tot_l AS (SELECT lang, sum(c) AS tot FROM cnt_wl GROUP BY lang),
vsize AS (SELECT count(*) AS v FROM vocab),
langs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
n AS (SELECT count(*) AS n FROM documents),
grid AS (
  SELECT l.lang, v.word,
         ln((COALESCE(c.c, 0) + 1.0) / (t.tot + s.v)) AS logp
  FROM (SELECT word FROM vocab) v
  CROSS JOIN (SELECT lang FROM langs) l
  LEFT JOIN cnt_wl c ON c.lang = l.lang AND c.word = v.word
  JOIN tot_l t ON t.lang = l.lang
  CROSS JOIN vsize s
),
wordscore AS (
  SELECT d.doc_id, g.lang, sum(g.logp) AS ll
  FROM (SELECT doc_id, word FROM vtok) d JOIN grid g USING (word)
  GROUP BY d.doc_id, g.lang
),
scored AS (
  SELECT d.doc_id, d.lang AS actual, l.lang AS cand,
         ln(l.n_docs * 1.0 / n.n) + COALESCE(w.ll, 0.0) AS score
  FROM documents d
  CROSS JOIN langs l CROSS JOIN n
  LEFT JOIN wordscore w ON w.doc_id = d.doc_id AND w.lang = l.lang
),
pred AS (
  SELECT doc_id, actual, cand AS predicted,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
  FROM scored
)
SELECT actual, predicted, count(*) AS n_docs
FROM pred WHERE rn = 1 GROUP BY actual, predicted
""",
)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes (Laplace-smoothed, top-200 vocab) trained
    and scored relationally; output is the lang confusion matrix.

    Every model artifact stays distributed: vocabulary selection is a
    bounded top-k aggregate, the (word × lang) log-probability grid is
    vocab×|langs| rows (tiny → Spark broadcasts it into the token join),
    and scoring is one groupBy(doc, lang) sum — linear shuffles only, no
    driver-side model materialization, so the same plan runs at 100 TB.
    Argmax compares raw double scores; margins (driven by integer count
    differences through ln) are astronomically larger than cross-engine
    summation-order drift, and the row_number tie-break is total.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .orderBy(F.desc("wc"), F.asc("word"))
        .limit(_NB_VOCAB)
        .select("word")
    )
    vtok = tok.join(F.broadcast(vocab), "word")
    cnt_wl = vtok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    tot_l = cnt_wl.groupBy("lang").agg(F.sum("c").alias("tot"))
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        vocab.crossJoin(langs.select("lang"))
        .join(cnt_wl, ["lang", "word"], "left")
        .join(tot_l, "lang")
        .crossJoin(vsize)
        .select(
            "lang",
            "word",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            ).alias("logp"),
        )
    )
    wordscore = (
        vtok.select("doc_id", "word")
        .join(F.broadcast(grid), "word")
        .groupBy("doc_id", "lang")
        .agg(F.sum("logp").alias("ll"))
    )
    base = (
        d.select("doc_id", F.col("lang").alias("actual"))
        .crossJoin(F.broadcast(langs.withColumnRenamed("lang", "cand")))
        .crossJoin(n)
    )
    ws = wordscore.withColumnRenamed("lang", "cand").withColumnRenamed(
        "doc_id", "ws_doc"
    )
    scored = base.join(
        ws, (base["doc_id"] == ws["ws_doc"]) & (base["cand"] == ws["cand"]), "left"
    ).select(
        base["doc_id"],
        "actual",
        base["cand"],
        (
            F.log(F.col("n_docs") * F.lit(1.0) / F.col("n"))
            + F.coalesce(F.col("ll"), F.lit(0.0))
        ).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return pred.groupBy(
        "actual", F.col("cand").alias("predicted")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "quality_ensemble_filter",
    oracle="""
WITH sig AS (
  SELECT source,
         CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END AS len_ok,
         CASE WHEN len(str_split(text, ' ')) >= 20 THEN 1 ELSE 0 END AS words_ok,
         CASE WHEN len(list_filter(str_split(text, ' '),
                                   x -> x = 'a' OR x = 'the')) * 10
              >= len(str_split(text, ' ')) THEN 1 ELSE 0 END AS stop_ok,
         CASE WHEN len(list_distinct(str_split(text, ' '))) * 4
              >= len(str_split(text, ' ')) THEN 1 ELSE 0 END AS div_ok
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len_ok) AS BIGINT) AS n_len_ok,
       CAST(sum(words_ok) AS BIGINT) AS n_words_ok,
       CAST(sum(stop_ok) AS BIGINT) AS n_stop_ok,
       CAST(sum(div_ok) AS BIGINT) AS n_div_ok,
       CAST(sum(len_ok * words_ok * stop_ok * div_ok) AS BIGINT) AS n_pass
FROM sig GROUP BY source
""",
)
def quality_ensemble_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble document-quality gate (length, word count, stopword
    ratio, lexical diversity) with per-source pass rates — the curation
    step that decides what enters a training mix.

    All four signals are INTEGER comparisons (ratio thresholds cleared
    of division: `stop*10 >= n_words`), so the pass/fail decision is
    bitwise-identical in any engine — no float-boundary flakiness. One
    narrow scan + one hash aggregate; array HOFs keep the token work
    inside codegen, nothing leaves the JVM.
    """
    d = table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_words = F.size(ws)
    stop_hits = F.size(F.filter(ws, lambda x: (x == "a") | (x == "the")))
    n_distinct = F.size(F.array_distinct(ws))
    sig = d.select(
        "source",
        F.when(F.col("n_chars").between(100, 5000), 1).otherwise(0).alias("len_ok"),
        F.when(n_words >= 20, 1).otherwise(0).alias("words_ok"),
        F.when(stop_hits * 10 >= n_words, 1).otherwise(0).alias("stop_ok"),
        F.when(n_distinct * 4 >= n_words, 1).otherwise(0).alias("div_ok"),
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len_ok").alias("n_len_ok"),
        F.sum("words_ok").alias("n_words_ok"),
        F.sum("stop_ok").alias("n_stop_ok"),
        F.sum("div_ok").alias("n_div_ok"),
        F.sum(
            F.col("len_ok") * F.col("words_ok") * F.col("stop_ok") * F.col("div_ok")
        ).alias("n_pass"),
    )

"""Shared banded-LSH near-dup machinery (r8 review consolidation).

`dedup_image_dhash` and `dedup_audio_fingerprint` run the identical
candidate-generation/refine scaffold over a 4-band signature frame:
band-struct explode, the >cap saturation guard (SCALE.md §18), the
(band_no, val) self equi-join + DISTINCT, the in-row bit_count(xor)
Hamming refine, and the min/count canonical-representative grouping.
Keeping one copy here (and one oracle CTE template below) means a change
like the r8 saturation cap is one edit, not four.

The signature frame is `track_cache`d: the cap aggregate, and both sides
of the self-join, would otherwise each re-execute the expensive
mapInPandas decode/fingerprint pipeline that produces it (3 source runs
per query run, measured in the r8 review).

r14: the caches are additionally materialized EAGERLY (one count())
before the multi-branch plan consumes them. A lazy cache does not
dedupe CONCURRENT first readers: AQE submits every independent leaf
stage of the candidate/refine DAG at once, and each branch that reaches
the unpopulated InMemoryRelation re-executes its child subtree. Event
logs on dedup_image_dhash_megadup showed the classes partial-agg
Exchange map stage running NINE times (once per plan reference, ~1.5 s
of serialized task wall on 32 slots) and the signature mapInPandas
twice; after the eager count every branch short-circuits into the
populated blocks and the duplicates disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sim_spark.scratch import track_cache

N_BANDS = 4
CAP = 64


def _band_candidates(
    sig: DataFrame, capped: bool = True, band_mask: int | None = None
) -> DataFrame:
    """Banded candidate pairs (da < db) with both signatures carried
    along: (da, db, a0..a3, c0..c3), DISTINCT. ``capped`` applies the
    >``CAP`` saturation guard (the production path); ``capped=False``
    exists only for the recall diagnostic below. ``band_mask`` buckets
    on ``b{k} & band_mask`` instead of the full band value — see
    :func:`banded_dedup` for the recall/selectivity dial this exposes."""
    bval = (
        (lambda k: F.col(f"b{k}"))
        if band_mask is None
        else (lambda k: F.col(f"b{k}").bitwiseAND(F.lit(band_mask)))
    )
    band_structs = F.array(
        *[
            F.struct(F.lit(k).alias("band_no"), bval(k).alias("val"))
            for k in range(N_BANDS)
        ]
    )
    bcols = [f"b{k}" for k in range(N_BANDS)]
    bands = sig.select(
        "doc_id", *bcols, F.explode(band_structs).alias("bb")
    ).select(
        "doc_id", *bcols,
        F.col("bb.band_no").alias("band_no"),
        F.col("bb.val").alias("val"),
    )
    # Saturation cap (production LSH megadup guard): a band value held by
    # more than CAP docs contributes c² candidates and almost no signal —
    # see SCALE.md §18 for the measured sf1 blowups this prevents. The
    # oracle applies the identical guard (bok CTE in banded_dedup_oracle).
    # Broadcast the OVER-cap list (tiny: #buckets with >CAP members, not
    # ~4x corpus like the keep-list) and strip it with a left_anti join —
    # identical semantics, bounded driver/executor broadcast at any scale.
    if capped:
        over = (
            bands.groupBy("band_no", "val")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > CAP)
            .select("band_no", "val")
        )
        bands = bands.join(F.broadcast(over), ["band_no", "val"], "left_anti")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
            "inner",
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            *[F.col(f"a.b{k}").alias(f"a{k}") for k in range(N_BANDS)],
            *[F.col(f"b.b{k}").alias(f"c{k}") for k in range(N_BANDS)],
        )
        .distinct()  # a pair sharing several bands is one candidate
    )


def _hamming(hd_mask: int | None):
    xors = [F.col(f"a{k}").bitwiseXOR(F.col(f"c{k}")) for k in range(N_BANDS)]
    if hd_mask is not None:
        xors = [x.bitwiseAND(F.lit(hd_mask)) for x in xors]
    return sum(F.bit_count(x) for x in xors)


def banded_dedup(
    sig: DataFrame,
    hd_max: int,
    hd_mask: int | None = None,
    band_mask: int | None = None,
) -> DataFrame:
    """(doc_id, b0..b3) signatures → (doc_id, dup_of, n_dups_smaller).

    Candidates come from the banded equi-join on (band_no, val) with the
    ≤``CAP`` saturation guard; the refine keeps exact Hamming distance
    ≤ ``hd_max`` over the band values (low bits only when ``hd_mask`` is
    given — bucket-routing bits excluded from the metric).

    ``band_mask`` — the recall/selectivity dial (r10 verdict task #8).
    By default buckets use the FULL band value, including any
    entropy-booster bits that are masked OUT of the hd metric; that
    keeps buckets selective (SCALE.md §18: the audio ramp fixture
    degenerated to all-pairs without the energy nibbles) but breaks
    pigeonhole completeness — a metric-close pair can differ in every
    band's routing bits and share no bucket, which is exactly the
    measured 32.5% scheme-limit of SCALE.md §21's audio row. Setting
    ``band_mask = hd_mask`` buckets on the SAME bits the metric reads,
    restoring the pigeonhole guarantee (hd ≤ hd_max < N_BANDS ⇒ some
    band matches exactly ⇒ UNCAPPED recall 100%) at the price of
    coarser buckets: more saturate past ``CAP``, so the capped
    generator refuses more megadup-class pair enumeration and the
    candidate join sees fatter buckets. Choose per modality: routed
    buckets when the boosters correlate with the metric (image dhash —
    uncapped 99.96%), metric buckets when they don't (audio).
    Measured on the audio fixture (metric-banded, sf0.01):
    uncapped 100% vs 32.9% routed — §21 table.

    Recall caveat: a true near-dup pair whose EVERY shared band value is
    saturated (>``CAP`` members) is never generated as a candidate — the
    cap trades that recall for bounded candidate counts (SCALE.md §18
    measured the audio fixture at 4918→75 dups under cap-alone before the
    entropy booster restored band selectivity). Callers tuning ``CAP``
    should keep at least one discriminative band per expected dup class.
    :func:`band_recall` MEASURES that loss against the exact pair set
    (r9 verdict task #3); the per-fixture floors are regression-guarded
    in tests/test_scale_ops.py and tabulated in SCALE.md §21."""
    sig = track_cache(sig)
    sig.count()  # eager: see module docstring (concurrent-first-reader dupes)
    pairs = _band_candidates(sig, capped=True, band_mask=band_mask)
    return (
        pairs.withColumn("hd", _hamming(hd_mask))
        .filter(F.col("hd") <= hd_max)
        .groupBy(F.col("db").alias("doc_id"))
        .agg(
            F.min("da").alias("dup_of"),
            F.count(F.lit(1)).alias("n_dups_smaller"),
        )
        .orderBy("doc_id")
    )


def banded_canonical(
    sig: DataFrame, hd_max: int, hd_mask: int | None = None
) -> DataFrame:
    """(doc_id, b0..b3) → (doc_id, canonical_id, is_near_dup): the
    megadup-robust dedup REPORT (one row per doc, linear output).

    Two-stage production shape (the exact answer SCALE.md §21's recall
    measurement points to): an exact-signature pre-pass collapses every
    hd=0 dup class to its min-doc at LINEAR cost — a groupBy on the full
    signature, so a 10k-member megadup class costs 10k rows, never 10k²
    pairs — and the banded-LSH stage then links DISTINCT signatures
    (one row per signature value) one hop at hd ≤ ``hd_max``. Band
    buckets hold distinct signatures rather than docs, so the ``CAP``
    saturation guard reflects signature diversity, not dup-class size —
    the cap-vs-megadup recall cliff §21 measured cannot occur for hd=0
    members (they never reach the banded stage).

    ``canonical_id`` = min doc over the doc's own signature class and
    every signature within one hop (same one-hop min-linkage contract as
    ``dedup_embedding_cosine``; transitive closure stays the
    connected-components key's job)."""
    sig = track_cache(sig)
    bcols = [f"b{k}" for k in range(N_BANDS)]
    classes = track_cache(
        sig.groupBy(*bcols).agg(F.min("doc_id").alias("rep"))
    )
    # eager: one pass populates BOTH caches (classes reads through sig's
    # InMemoryTableScan) — see module docstring for the duplicate-stage race
    classes.count()
    pairs = _band_candidates(
        classes.select(F.col("rep").alias("doc_id"), *bcols), capped=True
    )
    hits = pairs.withColumn("hd", _hamming(hd_mask)).filter(
        F.col("hd") <= hd_max
    )
    # one-hop neighbor min per representative, BOTH directions. r15
    # (VERDICT r14 item 5): both directions come from ONE explode over a
    # single reference to `hits` — the old unionAll of two selects
    # inlined the whole candidate subtree twice, and the event log
    # showed the band-generation/self-join map stages executing in
    # duplicate (four byte-identical ~154 KB shuffle map stages per cold
    # run; exchange reuse did not collapse them across the union legs).
    nbr = (
        hits.select(
            F.explode(
                F.array(
                    F.struct(F.col("da").alias("rep"), F.col("db").alias("other")),
                    F.struct(F.col("db").alias("rep"), F.col("da").alias("other")),
                )
            ).alias("x")
        )
        .select("x.rep", "x.other")
        .groupBy("rep")
        .agg(F.min("other").alias("nbr_min"))
    )
    cls = classes.join(nbr, "rep", "left").select(
        *bcols, F.least(F.col("rep"), F.coalesce("nbr_min", "rep")).alias("canon")
    )
    return (
        sig.join(cls, bcols)
        .select(
            "doc_id",
            F.col("canon").alias("canonical_id"),
            (F.col("canon") < F.col("doc_id")).alias("is_near_dup"),
        )
        .orderBy("doc_id")
    )


def banded_canonical_oracle(
    sig_ctes: str, hd_max: int, hd_mask: int | None = None
) -> str:
    """The DuckDB twin of :func:`banded_canonical` (same ``sig_ctes``
    contract as :func:`banded_dedup_oracle`)."""
    mask = f" & {hd_mask}" if hd_mask is not None else ""
    return f"""
WITH {sig_ctes},
classes AS MATERIALIZED (
  SELECT b0, b1, b2, b3, MIN(doc_id) AS rep FROM sig GROUP BY 1, 2, 3, 4
),
bands AS MATERIALIZED (
  SELECT rep AS doc_id, 0 AS band_no, b0 AS val, b0, b1, b2, b3 FROM classes
  UNION ALL SELECT rep, 1, b1, b0, b1, b2, b3 FROM classes
  UNION ALL SELECT rep, 2, b2, b0, b1, b2, b3 FROM classes
  UNION ALL SELECT rep, 3, b3, b0, b1, b2, b3 FROM classes
),
bok AS MATERIALIZED (
  SELECT band_no, val FROM bands GROUP BY 1, 2 HAVING count(*) <= {CAP}
),
bands_ok AS MATERIALIZED (
  SELECT b.* FROM bands b JOIN bok USING (band_no, val)
),
hits AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands_ok a
  JOIN bands_ok b ON a.band_no = b.band_no AND a.val = b.val
                 AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.b0, b.b0){mask}) + bit_count(xor(a.b1, b.b1){mask})
      + bit_count(xor(a.b2, b.b2){mask}) + bit_count(xor(a.b3, b.b3){mask})
        <= {hd_max}
),
nbr AS MATERIALIZED (
  SELECT rep, MIN(other) AS nbr_min FROM (
    SELECT da AS rep, db AS other FROM hits
    UNION ALL SELECT db, da FROM hits
  ) GROUP BY rep
),
cls AS MATERIALIZED (
  SELECT c.b0, c.b1, c.b2, c.b3,
         LEAST(c.rep, COALESCE(n.nbr_min, c.rep)) AS canon
  FROM classes c LEFT JOIN nbr n ON n.rep = c.rep
)
SELECT s.doc_id, CAST(c.canon AS BIGINT) AS canonical_id,
       c.canon < s.doc_id AS is_near_dup
FROM sig s JOIN cls c USING (b0, b1, b2, b3)
ORDER BY s.doc_id
"""


def band_recall(
    sig: DataFrame,
    hd_max: int,
    hd_mask: int | None = None,
    band_mask: int | None = None,
) -> dict[str, float]:
    """Measure the banded candidate generator's recall against the EXACT
    Hamming pair set (diagnostic harness, never a production path — the
    exact leg is an all-pairs scan).

    Returns ``n_true`` (exact pairs at hd ≤ hd_max), ``n_hit`` /
    ``recall`` for the CAPPED generator (the shipping path), and
    ``n_hit_uncapped`` / ``recall_uncapped`` isolating the saturation
    cap's marginal loss from the band scheme's intrinsic loss (a pair
    can differ by one bit in EVERY band when hd_max ≥ N_BANDS and then
    shares no band value — pigeonhole only guarantees a shared band for
    hd_max < N_BANDS)."""
    sig = track_cache(sig)
    a = sig.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(N_BANDS)],
    )
    b = sig.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"b{k}").alias(f"c{k}") for k in range(N_BANDS)],
    )
    # cached: the all-pairs scan is the diagnostic's dominant cost and
    # is read three times (count + one semi-join per generator)
    true_pairs = track_cache(
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .withColumn("hd", _hamming(hd_mask))
        .filter(F.col("hd") <= hd_max)
        .select("da", "db")
    )
    n_true = true_pairs.count()
    out: dict[str, float] = {"n_true": n_true}
    for label, capped in (("", True), ("_uncapped", False)):
        cand = _band_candidates(
            sig, capped=capped, band_mask=band_mask
        ).select("da", "db")
        hit = true_pairs.join(cand, ["da", "db"], "left_semi").count()
        out[f"n_hit{label}"] = hit
        out[f"recall{label}"] = (hit / n_true) if n_true else 1.0
    return out


def banded_dedup_oracle(
    sig_ctes: str,
    hd_max: int,
    hd_mask: int | None = None,
    band_mask: int | None = None,
) -> str:
    """The DuckDB twin of :func:`banded_dedup`. ``sig_ctes`` is the
    query-specific WITH-clause body (no trailing comma) whose final CTE
    must be ``sig(doc_id, b0, b1, b2, b3)``. ``band_mask`` mirrors the
    Spark dial: buckets form on ``b{k} & band_mask``."""
    mask = f" & {hd_mask}" if hd_mask is not None else ""
    bm = "" if band_mask is None else f" & {band_mask}"
    return f"""
WITH {sig_ctes},
bands AS (
  SELECT doc_id, 0 AS band_no, b0{bm} AS val, b0, b1, b2, b3 FROM sig
  UNION ALL SELECT doc_id, 1, b1{bm}, b0, b1, b2, b3 FROM sig
  UNION ALL SELECT doc_id, 2, b2{bm}, b0, b1, b2, b3 FROM sig
  UNION ALL SELECT doc_id, 3, b3{bm}, b0, b1, b2, b3 FROM sig
),
bok AS (
  SELECT band_no, val FROM bands GROUP BY 1, 2 HAVING count(*) <= {CAP}
),
bands_ok AS (
  SELECT b.* FROM bands b JOIN bok USING (band_no, val)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
         a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
         b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
  FROM bands_ok a
  JOIN bands_ok b ON a.band_no = b.band_no AND a.val = b.val AND a.doc_id < b.doc_id
),
ham AS (
  SELECT da, db,
         bit_count(xor(a0, c0){mask}) + bit_count(xor(a1, c1){mask})
       + bit_count(xor(a2, c2){mask}) + bit_count(xor(a3, c3){mask}) AS hd
  FROM pairs
)
SELECT db AS doc_id, CAST(min(da) AS BIGINT) AS dup_of,
       CAST(count(*) AS BIGINT) AS n_dups_smaller
FROM ham WHERE hd <= {hd_max} GROUP BY db ORDER BY doc_id
"""

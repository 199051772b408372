"""Invariant tests for the rows-only operators (SURVEY.md §5.3.2) — the
keys whose values can't be hash-matched against DuckDB get their §2-row
invariants pinned here instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sim_spark.queries  # noqa: F401
from sim_spark.io import table
from sim_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_2pct(spark):
    approx = QUERIES["agg_approx_distinct"](spark, SF).collect()[0]["approx_orders"]
    exact = (
        table(spark, SF, "lineitem").select("l_orderkey").distinct().count()
    )
    assert abs(approx - exact) / exact <= 0.02, (approx, exact)


class TestKMeans:
    @pytest.fixture(scope="class")
    def sizes(self, spark):
        return {
            r["cluster"]: r["n_members"]
            for r in QUERIES["ml_kmeans_embeddings"](spark, SF).collect()
        }

    def test_k_clusters_cover_all_points(self, spark, sizes):
        n = table(spark, SF, "embeddings").count()
        assert sum(sizes.values()) == n
        assert len(sizes) == 10
        assert all(v > 0 for v in sizes.values())

    def test_seed_stable(self, spark, sizes):
        again = {
            r["cluster"]: r["n_members"]
            for r in QUERIES["ml_kmeans_embeddings"](spark, SF).collect()
        }
        assert again == sizes


def test_lloyd_kmeans_converges_and_covers(spark):
    from sim_spark.ops.kmeans_relational import kmeans_lloyd

    assigned, inertia = kmeans_lloyd(table(spark, SF, "embeddings"), k=10, n_iter=3)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), (
        f"inertia not monotone: {inertia}"
    )
    n = table(spark, SF, "embeddings").count()
    sizes = assigned.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in sizes) == n
    assert len(sizes) == 10


def _pair_set(df, a="id_a", b="id_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH candidates must recover ≥90% of the exact Jaccard≥0.8 pairs
    (seeded, 8 hash tables, threshold 0.2 distance)."""
    truth = _pair_set(QUERIES["dedup_jaccard_shingles"](spark, SF))
    approx = _pair_set(QUERIES["dedup_minhash_lsh"](spark, SF))
    assert truth, "fixtures should contain planted near-dup pairs"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"recall={recall:.2f} over {len(truth)} true pairs"


def test_ann_ivf_recall_vs_exact_topk(spark):
    """IVF top-5 must agree with exact brute-force top-5 on ≥60% of
    (query, neighbor) pairs at nprobe=3 of 10 cells."""
    exact = {
        (r["qid"], r["cid"]) for r in QUERIES["sim_topk_cosine"](spark, SF).collect()
    }
    ivf = {(r["qid"], r["cid"]) for r in QUERIES["sim_ann_ivf"](spark, SF).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"recall={recall:.2f}"


def test_stateful_counter_rows_cover_all_users(spark):
    out = QUERIES["stream_stateful_counter"](spark, SF)
    users = table(spark, SF, "events").select("user_id").distinct().count()
    rows = out.collect()
    assert len(rows) == users
    assert all(r["n_events"] > 0 for r in rows)


def test_approx_quantiles_close_to_exact(spark):
    exact = {
        r["status"]: (r["p25"], r["p50"], r["p90"], r["p99"])
        for r in QUERIES["agg_percentiles_exact"](spark, SF).collect()
    }
    approx = {
        r["status"]: (r["ap25"], r["ap50"], r["ap90"], r["ap99"])
        for r in QUERIES["agg_approx_quantiles"](spark, SF).collect()
    }
    for status, ex in exact.items():
        for e, a in zip(ex, approx[status]):
            assert abs(a - e) / max(abs(e), 1e-9) <= 0.02, (status, e, a)


def test_seeded_sample_stable_and_sized(spark):
    a = QUERIES["scan_sample_seeded"](spark, SF).collect()
    b = QUERIES["scan_sample_seeded"](spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "seed instability"
    n_total = table(spark, SF, "lineitem").count()
    frac = len(a) / n_total
    assert 0.07 <= frac <= 0.13, frac


def test_multimodal_decode_dispatch_boundary(spark):
    """WAV/BMP decode is real (tests/test_multimodal_decode.py); the
    compressed-codec boundary must stay loud, not silently fake."""
    from sim_spark.ops.multimodal import decode

    with pytest.raises(NotImplementedError, match="codec"):
        decode(b"\x89PNG....")


def test_simhash_near_dup_pairs_recall(spark):
    """SimHash hamming≤5 candidates must recover ≥90% of the planted
    Jaccard≥0.8 pairs. (A 32-bit simhash has a heavy recall tail — the
    fixtures contain one boundary pair at hamming 9, which a 64/128-bit
    fingerprint would catch; measured distances of the 28 true pairs top
    out at 9 with the 27 others ≤ 5.)"""
    truth = _pair_set(QUERIES["dedup_jaccard_shingles"](spark, SF))
    cand = _pair_set(QUERIES["dedup_simhash_pairs"](spark, SF))
    assert truth
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"recall={recall:.2f} over {len(truth)} true pairs"


def test_events_nanos_conf_scoping_survives_deferred_execution(spark):
    """Pin the Spark-internal detail the scoped nanosAsLong restore in
    io.table relies on: the scan relation captures the conf at DataFrame
    BUILD time, so executing the frame after the conf is restored must
    still decode the nanos column. A Spark upgrade that re-reads the
    conf at action time should fail HERE, not in the grading driver."""
    import duckdb

    e = table(spark, SF, "events")  # conf set+restored inside
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (
        None,
        "false",
    ), "table() must leave the session conf restored (unset or default)"
    # deferred action AFTER restore — the moment that would break
    got = e.agg(F.min("ts").cast("string").alias("m")).collect()[0]["m"]
    want = duckdb.sql(
        f"SELECT CAST(MIN(ts) AS VARCHAR) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert got == want, (got, want)


def test_dedup_embedding_ann_precision_and_recall(spark):
    """ANN dedup is exact-precision (every flagged doc is a true one-hop
    near-dup with the same canonical id) and recall-bounded vs the exact
    quadratic formulation."""
    exact = {
        (r["doc_id"], r["canonical_id"])
        for r in QUERIES["dedup_embedding_cosine"](spark, SF).collect()
        if r["is_near_dup"]
    }
    ann_rows = QUERIES["dedup_embedding_ann"](spark, SF).collect()
    ann = {(r["doc_id"], r["canonical_id"]) for r in ann_rows if r["is_near_dup"]}
    exact_docs = {d for d, _ in exact}
    # precision: a doc the ANN path flags must be a truly-near-dup doc
    # (its canonical may be a later near neighbor if the exact-min pair
    # crosses cells, so compare doc membership, not pair identity)
    assert {d for d, _ in ann} <= exact_docs
    # recall over flagged docs
    recall = len({d for d, _ in ann}) / max(1, len(exact_docs))
    assert recall >= 0.5, f"recall={recall:.2f} over {len(exact_docs)} true dups"
    # exact-pair agreement where both sides flagged
    agree = len(ann & exact) / max(1, len(ann))
    assert agree >= 0.8, f"canonical agreement={agree:.2f}"


def test_pca_power_iteration_certificates(spark):
    """Power-iteration certificates on near-isotropic data (no spectral
    gap, so agreement with THE eigenvector is not the contract): unit
    component, non-decreasing Rayleigh estimates, variance capture above
    the isotropic average and within the numpy top eigenvalue, and
    projection scores consistent with the returned component."""
    import numpy as np

    from sim_spark.ops.power_iteration import power_iteration_top_component

    e = table(spark, SF, "embeddings")
    v, eig_hist, scores = power_iteration_top_component(e, dim=64, n_iter=8)
    assert abs(sum(c * c for c in v) - 1.0) < 1e-9
    assert all(b >= a - 1e-9 for a, b in zip(eig_hist, eig_hist[1:])), eig_hist
    rows = sorted(e.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    centered = mat - mat.mean(axis=0)
    cov = centered.T @ centered / len(mat)
    w = np.linalg.eigvalsh(cov)
    lam = eig_hist[-1]
    assert lam > 1.5 * float(np.trace(cov)) / 64, "no better than isotropic"
    assert lam <= float(w[-1]) * (1 + 1e-6), (lam, float(w[-1]))
    # Rayleigh quotient of the returned v must equal (approach) the estimate
    rq = float(np.array(v) @ cov @ np.array(v))
    assert rq == pytest.approx(lam, rel=0.05)
    got = {r["vec_id"]: r["pc1_score"] for r in scores.collect()}
    proj = centered @ np.array(v)
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == pytest.approx(round(float(proj[i]), 6), abs=1e-6)


def test_logistic_gd_certificates(spark):
    """Convex full-batch GD certificates: non-increasing loss history
    (lr inside the monotone region), strict improvement over the
    zero-model (chance) loss log(2), finite model, and the returned
    margins consistent with a numpy re-evaluation of the final model."""
    import math

    import numpy as np

    from sim_spark.ops.logistic_gd import logistic_gd

    e = table(spark, SF, "embeddings")
    labeled = e.select(
        "vec_id", "embedding", (F.col("label") == 2).cast("int").alias("y")
    )
    w, b, hist, preds = logistic_gd(labeled, label_col="y", dim=64, n_epochs=6)
    assert len(hist) == 7
    assert all(later <= earlier + 1e-12 for earlier, later in zip(hist, hist[1:])), hist
    assert hist[0] == pytest.approx(math.log(2.0), rel=1e-9)  # zero model
    assert hist[-1] < hist[0]
    rows = sorted(labeled.collect(), key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    margins = mat @ np.array(w) + b
    got = {r["vec_id"]: (r["margin"], r["pred"]) for r in preds.collect()}
    assert len(got) == len(rows)
    for i, r in enumerate(rows):
        m, p = got[r["vec_id"]]
        assert m == pytest.approx(round(float(margins[i]), 6), abs=1e-6)
        assert p == int(margins[i] > 0)


def test_pagerank_certificates(spark):
    """Power-method certificates: full rank vector sums to 1, all ranks
    positive, a rerun is bit-identical (no RNG anywhere), and on the
    type side rank is monotone with degree at the extremes (the most-
    connected event type outranks the least-connected)."""
    from sim_spark.ops.pagerank import pagerank

    e = table(spark, SF, "events")
    pairs = e.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionAll(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    nodes = (
        pairs.select(F.col("u").alias("id"))
        .unionAll(pairs.select(F.col("t").alias("id")))
        .distinct()
    )
    pr = pagerank(nodes, edges, node_col="id", n_iter=10)
    rows = pr.collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(r["rank"] > 0 for r in rows)
    assert len(rows) == nodes.count()

    t_rank = {r["id"]: r["rank"] for r in rows if r["id"].startswith("t:")}
    deg = {
        r["t"]: r["n"]
        for r in pairs.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hi = max(deg, key=lambda k: (deg[k], k))
    lo = min(deg, key=lambda k: (deg[k], k))
    if deg[hi] > deg[lo]:
        assert t_rank[hi] > t_rank[lo], (hi, lo, deg, t_rank)

    top = QUERIES["graph_pagerank"](spark, SF)
    a = [(r["id"], r["rank_micro"]) for r in top.collect()]
    b = [
        (r["id"], r["rank_micro"])
        for r in QUERIES["graph_pagerank"](spark, SF).collect()
    ]
    assert a == b
    assert len(a) == min(50, len(rows))


def test_cms_estimates_bound_exact_counts(spark):
    """CMS certificates: every reported estimate >= the exact count of
    that word (count-min never undercounts), the overcount is within
    the e*N/width bound, and the reported top-1 matches the exact
    top-1 (collision-free at this vocab/width ratio)."""
    import math

    from sim_spark.queries.graph_sketch import CMS_WIDTH

    got = {r["word"]: r["est"] for r in QUERIES["sketch_cms_topk"](spark, SF).collect()}
    d = table(spark, SF, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    exact = {
        r["word"]: r["n"]
        for r in words.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_stream = sum(exact.values())
    bound = math.e * n_stream / CMS_WIDTH
    for w, est in got.items():
        assert est >= exact[w], (w, est, exact[w])
        assert est - exact[w] <= bound, (w, est, exact[w], bound)
    true_top = max(exact, key=lambda k: (exact[k], k))
    rep_top = max(got, key=lambda k: (got[k], k))
    assert true_top == rep_top


def test_pq_codes_certificates(spark):
    """PQ certificates: every vector encoded, codes within [0, k),
    deterministic re-run, and mean squared reconstruction error strictly
    better than the rank-1 quantizer (every subspace collapsed to its
    single Lloyd centroid, i.e. k=1) — compression must buy accuracy."""
    from sim_spark.ops.product_quant import pq_encode, pq_fit_codebooks

    e = table(spark, SF, "embeddings")
    n = e.count()
    books = pq_fit_codebooks(e, m=8, k=16, dim=64, n_iter=4)
    enc = pq_encode(e, books, dim=64)
    rows = enc.collect()
    assert len(rows) == n
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    again = pq_encode(e, books, dim=64).collect()
    assert sorted((r["vec_id"], tuple(r["codes"])) for r in rows) == sorted(
        (r["vec_id"], tuple(r["codes"])) for r in again
    )
    mean_err = sum(r["err"] for r in rows) / n

    books1 = pq_fit_codebooks(e, m=8, k=1, dim=64, n_iter=4)
    enc1 = pq_encode(e, books1, dim=64)
    mean_err1 = sum(r["err"] for r in enc1.collect()) / n
    assert mean_err < mean_err1, (mean_err, mean_err1)

    out = QUERIES["embed_pq_codes"](spark, SF)
    assert out.count() == n


def test_minhash_exactperm_recall_vs_exact_jaccard(spark):
    """The oracled MinHash twin must also recover >=90% of the exact
    Jaccard>=0.8 ground truth (4 bands x 4 rows targets t ~ 0.71, so
    near-dups at 0.8 collide in some band with high probability)."""
    truth = _pair_set(QUERIES["dedup_jaccard_shingles"](spark, SF))
    approx = _pair_set(QUERIES["dedup_minhash_exactperm"](spark, SF))
    assert truth, "fixtures should contain planted near-dup pairs"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.9, f"recall={recall:.2f} over {len(truth)} true pairs"


def test_kmv_hll_estimates_track_exact(spark):
    """Accuracy certificates for the oracled sketches: the KMV (k=8,
    RSE ~40%) and HLL (m=64, RSE ~13%) estimates must land within loose
    multiplicative bounds of the exact distinct counts — a hash-matched
    oracle proves determinism, this proves the estimators are sane."""
    for row in QUERIES["sketch_kmv_distinct"](spark, SF).collect():
        exact, est = row["exact_distinct"], row["kmv_estimate"]
        assert exact / 4 <= est <= exact * 4, (row["event_type"], exact, est)
    for row in QUERIES["sketch_hll_exactreg"](spark, SF).collect():
        exact, est = row["exact_distinct"], row["hll_estimate"]
        assert exact / 2 <= est <= exact * 2, (row["event_type"], exact, est)


def test_hll_union_merge_is_lossless(spark):
    """Register-level union: merged registers must equal the direct
    global registers exactly (the mergeability identity the oracle also
    pins), and both estimates coincide."""
    row = QUERIES["sketch_hll_union"](spark, SF).collect()[0]
    assert row["n_register_mismatch"] == 0
    assert row["merged_estimate"] == row["direct_estimate"]


def test_bloom_prefilter_no_false_negatives(spark):
    """A Bloom filter may admit false positives but NEVER drops a
    member: candidates must cover every true member."""
    row = QUERIES["join_bloom_prefilter"](spark, SF).collect()[0]
    n_true = row["n_candidates"] - row["n_false_pos"]
    # every even-key supplier that appears in lineitem must be a candidate
    assert n_true >= 0 and row["n_candidates"] <= row["n_fact_keys"]
    assert row["n_false_pos"] >= 0


def test_polygon_inside_subset_and_stump_rank_valid(spark):
    row = QUERIES["geo_point_in_polygon"](spark, SF).collect()[0]
    assert 0 <= row["n_inside"] <= row["n_points"]
    stump = QUERIES["ml_decision_stump"](spark, SF).collect()
    ranks = sorted(r["rank"] for r in stump)
    assert ranks == list(range(1, len(stump) + 1))


def test_bpe_apply_matches_pure_python_reference(spark):
    """The relational greedy-merge machinery (runs-of-marks windows)
    against an INDEPENDENT pure-Python tokenizer reference: count
    words, rank top-K char pairs, apply each merge in rank order with
    the classic left-to-right scan. Both the oracle and the Spark key
    share SQL structure, so this is the check a shared logic bug
    cannot pass."""
    from collections import Counter

    from sim_spark.queries.curation_extras import _BPE_ROUNDS, _BPE_TOPN

    docs = table(spark, SF, "documents").select("text").collect()
    freq = Counter(
        w for r in docs for w in r["text"].split(" ") if len(w) >= 2
    )
    pairs = Counter()
    for w, f in freq.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += f
    merges = [
        p for p, _ in sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_BPE_ROUNDS]

    def apply_merges(word: str) -> list[str]:
        toks = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(toks):  # greedy left-to-right, non-overlapping
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    expect = Counter()
    expect_words = {}
    expect_positions = Counter()
    for w, f in freq.items():
        for t in apply_merges(w):
            expect[t] += f
            expect_positions[t] += 1
            expect_words.setdefault(t, set()).add(w)
    want = sorted(
        (
            (t, len(expect_words[t]), expect_positions[t], occ)
            for t, occ in expect.items()
        ),
        key=lambda r: (-r[3], r[0]),
    )[:_BPE_TOPN]

    got = [
        (r["token"], r["n_words"], r["n_token_positions"], r["n_occurrences"])
        for r in QUERIES["curate_bpe_apply"](spark, SF).collect()
    ]
    assert got == want
    # merges actually fire: at least one multi-char token must exist
    assert any(len(t) > 1 for t, *_ in got) or any(
        len(t) > 1 for t in expect
    )


def test_bpe_train_iterative_matches_pure_python_reference(spark):
    """The unrolled trainer against an independent Python loop: per
    round, frequency-weighted adjacent-pair counts over the CURRENT
    tokenization (overlapping adjacencies count, as real BPE counts
    them), argmax with (count desc, pair text) tie-break, greedy
    left-to-right apply."""
    from collections import Counter

    from sim_spark.queries.curation_extras import _BPE_TRAIN_ROUNDS

    docs = table(spark, SF, "documents").select("text").collect()
    freq = Counter(
        w for r in docs for w in r["text"].split(" ") if len(w) >= 2
    )
    toks = {w: list(w) for w in freq}
    want = []
    for _ in range(_BPE_TRAIN_ROUNDS):
        pairs = Counter()
        for w, f in freq.items():
            t = toks[w]
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] += f
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((a, b, cnt))
        for w in toks:
            t, out, i = toks[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(t[i] + t[i + 1])
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out

    got = [
        (r["pair_a"], r["pair_b"], r["n_occurrences"])
        for r in QUERIES["curate_bpe_train_iterative"](spark, SF).collect()
    ]
    assert got == want
    # the dependency the fixed-table apply cannot express must actually
    # occur: some round's merge uses a component built by an earlier one
    built = set()
    dependent = False
    for a, b, _ in want:
        if a in built or b in built:
            dependent = True
        built.add(a + b)
    assert dependent, want


def test_megadup_dedup_collapses_exact_classes(spark):
    """banded_canonical's contract: every member of an identical-
    signature class maps to the class min (hd=0 recall is 100% by
    construction — the §21-measured cap cliff cannot drop them), and
    canonical_id <= doc_id always."""
    import pandas as pd

    from sim_spark.queries.multimodal_real import (
        bmp_dhash_sig,
        dedup_image_dhash_megadup,
    )

    sf = "/root/testdata/sf0.01"
    sig = bmp_dhash_sig(spark, sf).toPandas()
    out = dedup_image_dhash_megadup(spark, sf).toPandas()
    m = sig.merge(out, on="doc_id")
    assert (m.canonical_id <= m.doc_id).all()
    grp = m.groupby(["b0", "b1", "b2", "b3"])
    # within one signature class: a single shared canonical, <= class min
    assert (grp.canonical_id.nunique() == 1).all()
    assert (grp.canonical_id.max() <= grp.doc_id.min()).all()
    # at least one multi-member class exists (fixture sanity)
    assert (grp.size() > 1).any()

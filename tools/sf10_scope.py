#!/usr/bin/env python
"""Build the r12 sf10 drive scope: every registered key, included unless
it carries a written exclusion reason (r11 verdict task #7: the sf10
drive must cover >=100 keys and give a per-key reason for the rest).
Writes SCOPE_sf10_r12.md and prints the DRIVE_KEYS list to stdout."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sim_spark.queries  # noqa: F401
from sim_spark.registry import ORACLES, QUERIES

# Exclusions with reasons. Two classes: (a) the key's own semantics or
# its ORACLE are quadratic / out-of-container at sf10 (measured in
# SCALE.md §20/§24); (b) heavy seeded-trajectory rows-only keys whose
# sf10 run yields only a row count for hours of compute.
EXCLUDE: dict[str, str] = {
    "fn_math": (
        "corpus-wide per-ROW output (60M rows at sf10) with FLOAT "
        "columns: the pandas canonicalizer was MEASURED kernel-OOM at "
        "81 GB RSS on this class in the r12 sweep, and the in-engine "
        "md5-checksum path is integer/string-only by design (float "
        "casts are engine-formatting-dependent); verified at sf1"
    ),
    "fn_try_safe": (
        "same class as fn_math: 60M-row per-row frame with a float "
        "column — materialization OOMs, checksum path cannot take "
        "floats; verified at sf1"
    ),
    "dedup_jaccard_shingles": (
        "exact-SSJoin ground truth; prefix buckets ~13.5B candidates on "
        "this 30-word-vocab fixture — the r12 density guardrail now "
        "REFUSES deterministically (CandidateDensityError; SCALE §28), "
        "which is the key's documented sf10 outcome"
    ),
    "dedup_simhash_pairs": (
        "quadratic-OUTPUT class: exact hd<=5 pair list ~42B rows at sf10 "
        "(SCALE §20); the r12 guardrail refuses up front"
    ),
    "join_theta_band": (
        "quadratic-OUTPUT class: the band predicate itself yields ~15B "
        "pairs at sf10 (SCALE §24)"
    ),
    "dedup_minhash_exactperm": (
        "oracle recomputes md5-affine permutations corpus-wide: >100 GB "
        "DuckDB spill at sf10 (SCALE §24)"
    ),
    "dedup_simhash64_tf": (
        "oracle >75 GB DuckDB spill at sf10 (SCALE §24)"
    ),
    "dedup_audio_fingerprint": (
        "MEASURED in the r12 sweep: the oracle recomputes per-doc "
        "spectral fingerprints corpus-wide in DuckDB and its temp "
        "spill filled the sandbox disk (~78 GB free) at 500k docs — "
        "IOException mid-sweep; same oracle-spill class as "
        "dedup_simhash64_tf; verified at sf1 (SCALE §24a)"
    ),
    "dedup_audio_fingerprint_metricband": (
        "same fingerprint-recompute oracle as dedup_audio_fingerprint "
        "(plus the metric-band join): >50 min CPU-bound in DuckDB at "
        "sf10 before the sweep budget cut it; verified at sf1 with "
        "measured 100% uncapped recall (SCALE §21)"
    ),
    "join_range_interval": (
        "925M output rows at sf10 — hash-materialization exceeds the "
        "sandbox; ALREADY checksum-verified in-engine at sf10 in r11 "
        "(DRIVE_r11_sf10_subset.json, SCALE §24)"
    ),
    "join_sql_band_ts": (
        "185M output rows; hash-matched at sf10 in r11 "
        "(DRIVE_r11_sf10_subset.json) — not re-run to keep the r12 "
        "sweep inside the session budget"
    ),
    "graph_betweenness_sampled": (
        "oracle replays K*depth relational Brandes in DuckDB over the "
        "~240M-row mirrored sf10 edge list (pair CTE alone ~120M rows "
        "x 2D rounds of joins) — out of sandbox memory; sf1 is the "
        "measured scale point (SCALE §27)"
    ),
    "graph_triangle_count": (
        "oracle is the naive ordered 3-way edge join: ~e^1.5 on 120M "
        "edges in DuckDB — out of sandbox; triangle plan verified at sf1"
    ),
    "graph_modularity_score": (
        "MEASURED r12 probe: OOM at 20 GB/30 GB caps after 185 s at sf10 (same LPA chain plus modularity terms); verified sf1"
    ),
    "graph_label_propagation": (
        "MEASURED r12 probe: OOM at 20 GB/30 GB caps after 199 s at sf10 (LPA rounds over the edge CTE); verified sf1"
    ),
    "graph_sssp_weighted": (
        "MEASURED r12 probe: oracle OOMs DuckDB at 20 GB memory + 30 GB temp caps after 209 s at sf10 (iterative relaxation over the ~120M-row edge CTE); verified sf1"
    ),
    "graph_hits_unrolled": (
        "MEASURED r12 probe: OOM at 20 GB/30 GB caps after 89 s at sf10 (unrolled hub/authority rounds over the edge CTE); verified sf1"
    ),
    "graph_clustering_global": (
        "MEASURED r12 probe: OOM at 20 GB/30 GB caps after 410 s at sf10 (wedge/triangle joins over the edge CTE); verified sf1"
    ),
    "graph_assortativity": (
        "MEASURED r12 probe: OOM at 20 GB/30 GB caps after 296 s at sf10 (degree-pair joins over the edge CTE); verified sf1"
    ),
    "ml_kmeans_embeddings": (
        "rows-only seeded Lloyd trajectory: an sf10 run yields only a "
        "row count for ~an hour of compute; invariants + oracled twin "
        "carry the evidence (ROWSONLY.md)"
    ),
    "ml_kmeans_lloyd": (
        "rows-only seeded Lloyd trajectory (same family as "
        "ml_kmeans_embeddings); invariants carry the evidence"
    ),
    "stream_stateful_counter": (
        "streaming-execution artifact (multi-batch restart parity is "
        "the evidence, tests/test_stream_parity.py); a batch sf10 run "
        "measures nothing the parity tests do not"
    ),
}


def main() -> None:
    keys = sorted(QUERIES)
    include = [k for k in keys if k not in EXCLUDE]
    lines = [
        "# SCOPE — r12 sf10 full-surface drive (r11 verdict task #7)",
        "",
        f"Registry: {len(keys)} keys. Included in the sf10 sweep: "
        f"{len(include)}. Excluded with reasons: {len(EXCLUDE)}.",
        "",
        "Fixture: testdata_sf10 (tools/gen_sf1.py --scale 10; "
        "distribution-matched 10x of sf0.1). Artifact: "
        "DRIVE_r12_sf10*.json via tools/drive_driver.py with "
        "DRIVE_KEYS= the included list; .partial persistence makes the "
        "sweep resumable, and every record carries its HEAD commit.",
        "",
        "## Excluded keys",
        "",
        "| key | reason |",
        "|---|---|",
    ]
    for k in sorted(EXCLUDE):
        lines.append(f"| `{k}` | {EXCLUDE[k]} |")
    missing = [k for k in EXCLUDE if k not in QUERIES]
    if missing:
        raise SystemExit(f"EXCLUDE references unknown keys: {missing}")
    with open("/root/repo/SCOPE_sf10_r12.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(",".join(include))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Build the sf10 drive scope: every registered key, included unless it
carries a written exclusion reason (r11 verdict task #7: the sf10 drive
must cover the surface and give a per-key reason for the rest).
Writes SCOPE_sf10_r13.md and prints the DRIVE_KEYS list to stdout.

r13: FOURTEEN r12 exclusions were converted to sf10 passes by staged oracle
evaluation (tools/staged_oracle.py) and the float-quantized checksum
(tools/drive_driver.py) — see CONVERTED below and SCALE.md §30."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sim_spark.queries  # noqa: F401
from sim_spark.registry import QUERIES

ROUND = 14

# r12 exclusions converted to sf10 passes in r13 (DRIVE_r13_sf10_subset.json)
CONVERTED: dict[str, str] = {
    "dedup_audio_fingerprint": (
        "hash MATCH (12,218 rows; chunked signature staging 6 s vs "
        "r12's 78 GB spill)"
    ),
    "dedup_audio_fingerprint_metricband": (
        "hash MATCH (3,059 rows; staging 7 s vs r12's >50 min)"
    ),
    "fn_math": (
        "checksum MATCH, 59,997,213 rows (9 float cols "
        "micro-unit-quantized, identical expression both engines)"
    ),
    "fn_try_safe": "checksum MATCH, 59,997,213 rows",
    "graph_assortativity": "hash MATCH (staged, 13 s)",
    "graph_hits_unrolled": "hash MATCH (staged, 6 s)",
    "graph_label_propagation": "hash MATCH (staged, 145 s)",
    "graph_modularity_score": (
        "hash MATCH (staged; required the intra2 join-order fix, "
        "SCALE §30)"
    ),
    "graph_sssp_weighted": "hash MATCH (staged, 12 s)",
    "dedup_minhash_exactperm": (
        "hash MATCH (2,074 rows; chunked-prefix staging bounds the "
        "md5-per-(doc,shingle,perm) fanout; the run also caught and "
        "fixed a REAL engine defect — Catalyst broadcast the exploded "
        "shingle refine legs off a post-explode size under-estimate, "
        "OOMing the driver build; now shuffle_hash-hinted, SCALE §30)"
    ),
    "dedup_simhash64_tf": (
        "hash MATCH (6,620 rows; chunked-prefix staging, 29 s vs "
        "r12's >75 GB spill)"
    ),
    "join_range_interval": (
        "checksum MATCH, 924,962,582 rows (re-verified at r13 HEAD; "
        "was excluded as r11-only evidence)"
    ),
    "join_sql_band_ts": (
        "checksum MATCH, 185,211,497 rows (re-verified at r13 HEAD)"
    ),
    "graph_betweenness_sampled": (
        "hash MATCH (staged; the whole K-source Brandes replay stages "
        "in ~10 s at sf10 — the r12 'out of sandbox memory' was purely "
        "the single-arena CTE chain, frontier tables are <=4.7M rows)"
    ),
}

# Exclusions with reasons. Classes: (a) the key's own semantics or its
# ORACLE are quadratic / out-of-container at sf10 even staged (measured
# in SCALE.md §20/§24/§30); (b) heavy seeded-trajectory rows-only keys
# whose sf10 run yields only a row count for hours of compute; (c)
# already verified at sf10 in a prior round.
EXCLUDE: dict[str, str] = {
    "dedup_jaccard_shingles": (
        "exact-SSJoin ground truth; prefix buckets ~13.5B candidates on "
        "this 30-word-vocab fixture — the r12 density guardrail REFUSES "
        "deterministically (CandidateDensityError; SCALE §28), which is "
        "the key's documented sf10 outcome"
    ),
    "dedup_simhash_pairs": (
        "quadratic-OUTPUT class: exact hd<=5 pair list ~42B rows at sf10 "
        "(SCALE §20); the r12 guardrail refuses up front"
    ),
    "join_theta_band": (
        "quadratic-OUTPUT class: the band predicate itself yields ~15B "
        "pairs at sf10 (SCALE §24)"
    ),
    "graph_triangle_count": (
        "UPDATED r13: the ORACLE now stages in ~1 min (run_split + 44GB "
        "arena pipelines the ~5.0B wedge probes without materializing "
        "them); what fails at sf10 on this box is the SPARK ENGINE's "
        "exact wedge shuffle — UnsafeExternalSorter spill error in the "
        "degree-oriented wedge stage, same single-box scratch limit as "
        "graph_clustering_global. Cluster-shape sound (the shuffle "
        "spreads over N executors' disks); sf1-verified. r14: the "
        "family's measurable scale path is graph_triangle_doulion "
        "(md5-derandomized 1-in-8 edge sampling, 64x less wedge "
        "volume), IN scope this round — SCALE.md §31"
    ),
    "graph_clustering_global": (
        "NEW reason (r13): the ORACLE now stages fine (71 s); the SPARK "
        "ENGINE side's exact wedge/triangle shuffle needs more scratch "
        "disk than the sandbox has (measured [SPILL_OUT_OF_MEMORY] 'No "
        "space left on device' with ~65 GB free; transient). "
        "Cluster-shape sound (per-executor local disks); sf1-verified"
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
        f"# SCOPE — r{ROUND} sf10 drive scope (updates SCOPE_sf10_r13.md)",
        "",
        f"Registry: {len(keys)} keys. In scope for sf10: {len(include)}. "
        f"Excluded with reasons: {len(EXCLUDE)} (r12 excluded 22; r13 "
        f"converted {len(CONVERTED)} exclusions to sf10 passes; r14 adds "
        "the WebP/HEIF/MediaWiki/bloom keys and graph_triangle_doulion "
        "— the triangle family's sampled scale path — to scope).",
        "",
        "Fixture: testdata_sf10 (tools/gen_sf1.py --scale 10). Evidence: "
        "DRIVE_r14_sf10.json — ONE full-surface sweep at ONE r14 HEAD "
        "(r13 verdict task #1; supersedes the r12+r13 two-HEAD splice "
        "of DRIVE_r12_sf10_subset.json + DRIVE_r13_sf10_subset.json). "
        "Mechanisms that converted r12's fourteen exclusions: "
        "staged oracle evaluation (tools/staged_oracle.py — CTE-chain "
        "temp-table staging with eager drops, chunked audio signature "
        "build) and the float-quantized checksum compare "
        "(tools/drive_driver.py `_auto_quant_proj`); SCALE.md §30 records "
        "the measurements, including the modularity oracle-phrasing "
        "defect the staging run itself caught.",
        "",
        "## Converted in r13 (were excluded in r12)",
        "",
        "| key | r13 sf10 outcome |",
        "|---|---|",
    ]
    for k in sorted(CONVERTED):
        lines.append(f"| `{k}` | {CONVERTED[k]} |")
    lines += [
        "",
        f"## Excluded keys ({len(EXCLUDE)})",
        "",
        "| key | reason |",
        "|---|---|",
    ]
    for k in sorted(EXCLUDE):
        lines.append(f"| `{k}` | {EXCLUDE[k]} |")
    missing = [k for k in {**EXCLUDE, **CONVERTED} if k not in QUERIES]
    if missing:
        raise SystemExit(f"scope references unknown keys: {missing}")
    overlap = set(EXCLUDE) & set(CONVERTED)
    if overlap:
        raise SystemExit(f"keys both excluded and converted: {overlap}")
    with open(f"/root/repo/SCOPE_sf10_r{ROUND}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(",".join(include))


if __name__ == "__main__":
    main()

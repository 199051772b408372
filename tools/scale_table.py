"""Derive the SCALE.md sf0.1→sf1 ratio table from bench JSONL artifacts
(r9 verdict task #5: the standing sf1 bench becomes a first-class
round-over-round regression signal, auto-derived rather than hand-typed).

Usage:
    python tools/scale_table.py BENCH_r10_sf01.jsonl BENCH_r10_sf1.jsonl
Prints a markdown table (key, sf0.1 median, sf1 median, ratio) sorted by
ratio descending, plus a one-line summary (count over linear-x-headroom).

Data scaling note: documents/embeddings grow 10x/4x from sf0.1 to sf1
while TPC-H tables grow 10x — "linear" therefore depends on the key's
driving table; the table reports raw wall ratios and leaves the per-key
disposition to SCALE.md prose.
"""

import json
import sys


def load(path: str) -> dict[str, float]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "key" in rec and "median" in rec:
                out[rec["key"]] = rec["median"]
    return out


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])

    def ratio(k: str) -> float:
        return b[k] / a[k] if a[k] else float("inf")

    shared = sorted(set(a) & set(b), key=lambda k: -ratio(k))
    print("| key | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for k in shared:
        print(f"| {k} | {a[k]:.2f} | {b[k]:.2f} | {ratio(k):.1f}x |")
    if not shared:
        print("\n(no shared keys between the two files)")
        return
    tot_a, tot_b = sum(a[k] for k in shared), sum(b[k] for k in shared)
    wall = f"{tot_b / tot_a:.1f}x" if tot_a else "n/a"
    print(
        f"\n{len(shared)} keys; suite wall {tot_a:.1f}s -> {tot_b:.1f}s "
        f"({wall}); keys over 12x: "
        f"{[k for k in shared if ratio(k) > 12]}"
    )


if __name__ == "__main__":
    main()

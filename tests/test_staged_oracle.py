"""Staged oracle evaluation must be result-identical to the inline
oracle text (r13): the sf10 sweep replays graph/audio oracles as
materialized temp-table stages (tools/staged_oracle.py) purely to fit
the sandbox memory arena — any relational difference would make a
staged sf10 verdict meaningless."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import sim_spark.queries  # noqa: F401 — populate registry
from sim_spark.registry import ORACLES
from sim_spark.testing import duckdb_connect
from tools.staged_oracle import prepare_staged, split_with_chain

GRAPH_KEYS = [
    "graph_sssp_weighted",
    "graph_label_propagation",
    "graph_hits_unrolled",
    "graph_clustering_global",
    "graph_assortativity",
    "graph_modularity_score",
    "graph_triangle_count",
    "graph_bfs_layers",
]

AUDIO_KEYS = ["dedup_audio_fingerprint", "dedup_audio_fingerprint_metricband"]

CHUNKED_KEYS = ["dedup_minhash_exactperm", "dedup_simhash64_tf"]


@pytest.mark.parametrize("key", GRAPH_KEYS + AUDIO_KEYS + CHUNKED_KEYS)
def test_staged_equals_direct(sf_dir, key):
    con = duckdb_connect(sf_dir)
    try:
        direct = con.execute(ORACLES[key]).fetchdf()
        final = prepare_staged(con, key, ORACLES.get(key))
        staged = con.execute(final).fetchdf()
    finally:
        con.close()
    assert list(staged.columns) == list(direct.columns)
    ds = direct.sort_values(list(direct.columns)).reset_index(drop=True)
    ss = staged.sort_values(list(staged.columns)).reset_index(drop=True)
    assert ss.equals(ds), f"{key}: staged relation differs from direct"


@pytest.mark.parametrize("key", GRAPH_KEYS)
def test_split_chain_shape(key):
    """The splitter must recover every CTE and a SELECT tail — a parse
    drift (e.g. a future oracle embedding parens in a string literal)
    should fail loudly here, not corrupt a sweep."""
    ctes, final = split_with_chain(ORACLES[key])
    assert len(ctes) >= 2
    assert final.lstrip().upper().startswith("SELECT")
    names = [n for n, _ in ctes]
    assert len(names) == len(set(names))

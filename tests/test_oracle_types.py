"""Oracle output-type lint (VERDICT r4 task #3).

DuckDB returns HUGEINT for `sum(<integer>)` and the driver's pandas fetch
renders HUGEINT as float, so its value hash diverges from Spark's LongType
("236.0" != "236") even when every value is equal. The repo convention is
`CAST(sum(...) AS BIGINT)`; this lint makes the convention machine-checked:
DESCRIBE every registered oracle and assert no HUGEINT column escapes.

DESCRIBE binds and types the query without executing it, so the whole sweep
is sub-second even though it covers every oracle.
"""

from __future__ import annotations

import pytest

import sim_spark.queries  # noqa: F401 — populate registry
from sim_spark.registry import ORACLES
from sim_spark.testing import duckdb_connect

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_no_hugeint(con, key):
    desc = con.execute(f"DESCRIBE {ORACLES[key]}").fetchall()
    bad = [(name, typ) for name, typ, *_ in desc if "HUGEINT" in typ.upper()]
    assert not bad, (
        f"{key}: uncast integer aggregate(s) {bad} — DuckDB HUGEINT becomes "
        f"float in the driver's pandas fetch and breaks the value hash; "
        f"wrap in CAST(... AS BIGINT)"
    )

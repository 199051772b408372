"""Driver-check replica: every oracled query must hash-match DuckDB
(SURVEY.md §5.3.1). Runs at sf0.001 by default; set SIM_SPARK_TEST_SF to
/root/testdata/sf0.01 for the pre-submit pass."""

from __future__ import annotations

import pytest

import sim_spark.queries  # noqa: F401 — populate registry
from sim_spark.registry import ORACLES
from sim_spark.testing import run_parity


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, key):
    res = run_parity(spark, key, sf_dir)
    assert res.ok, f"{key}: {res.detail}\n" + "\n".join(res.diffs)

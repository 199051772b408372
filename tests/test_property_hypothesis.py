"""Hypothesis property tests (SURVEY.md §5.3.4): session_window must
equal the gaps-and-islands formulation on arbitrary event sets — the
equivalence the stream_session_30m oracle is built on, pinned under
randomized inputs including duplicate timestamps and single-event users.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

GAP_S = 30


def sessions_via_session_window(spark, pdf):
    df = spark.createDataFrame(pdf)
    out = (
        df.groupBy("user_id", F.session_window("ts", f"{GAP_S} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    return sorted(map(tuple, out.collect()))


def sessions_via_islands(spark, pdf):
    df = spark.createDataFrame(pdf)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = df.withColumn(
        # STRICT >: session_window merges an event exactly gap seconds
        # after its predecessor (boundary-inclusive) — found by hypothesis.
        "new_sess", F.when(gap > GAP_S * 1_000_000, 1).otherwise(0)
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    out = flagged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("start"), F.count(F.lit(1)).alias("n")
    )
    return sorted(
        (r["user_id"], r["start"], r["n"]) for r in out.collect()
    )


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.integers(min_value=0, max_value=300),  # seconds offset (dups allowed)
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@given(events=events_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_window_equals_gaps_and_islands(spark, events):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "user_id": [u for u, _ in events],
            "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s) for _, s in events],
        }
    )
    assert sessions_via_session_window(spark, pdf) == sessions_via_islands(spark, pdf)

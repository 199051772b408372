"""Skew-salted join (SCALE.md §2): the manual fallback for key skew
beyond AQE's skew-join splitting.

``salted_join(left, right, key, n_salts)`` replicates the (small) right
side ``n_salts`` ways and scatters the left side's hot keys across the
replicas: left rows get ``salt = pmod(hash(row-unique), n)``, right rows
are exploded to all n salt values, and the join key becomes
(key, salt). Result is row-identical to the plain join; the win is that
one hot key's rows now land on n reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    left_unique: str | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with an ``n_salts``-way skew scatter.

    ``left_unique`` names a column whose hash spreads left rows across
    salts (defaults to a random-ish spread via the whole row hash of the
    key plus monotonically varying partition data is NOT used — pass a
    unique id column for deterministic output).

    Only inner/left/semi/anti are supported: the right side is
    replicated ``n_salts`` ways, so right/full/outer would emit each
    unmatched right row once per replica — not row-identical to the
    plain join. Rejected loudly rather than silently wrong."""
    norm_how = how.lower().replace("_", "")
    if norm_how not in {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}:
        raise ValueError(
            f"salted_join: how={how!r} unsupported (right-side replication "
            "would duplicate unmatched right rows; use inner/left/semi/anti)"
        )
    spread = F.col(left_unique) if left_unique else F.spark_partition_id()
    l_salted = left.withColumn(_SALT, F.pmod(F.hash(spread), F.lit(n_salts)))
    r_salted = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, on=[key, _SALT], how=how)
    return out.drop(_SALT)

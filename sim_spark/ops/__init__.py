"""Composite operators Spark lacks natively (SURVEY.md §4.3).

Each helper is a pure DataFrame composition — no custom Catalyst rule, no
Python row code — so the resulting plans are shuffle-bounded and survive
cluster-scale inputs.
"""

from sim_spark.ops.asof import asof_join_backward  # noqa: F401
from sim_spark.ops.rangejoin import interval_join  # noqa: F401
from sim_spark.ops.autojoin import auto_join  # noqa: F401
from sim_spark.ops.exact_sum import grouped_exact_sums  # noqa: F401

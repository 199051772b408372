"""Geospatial joins and time-series statistics (extended surface).

Entities get deterministic globe positions from the shared md5-48bit
hash (micro-degree integers, so placement is bit-identical in both
engines and no float geometry enters the join keys):

- `geo_cell_neighbor_join` — the scale-safe spatial join: bucket both
  sides into 3° grid cells, explode ONE side to its 3×3 neighborhood,
  equi-join on cell, refine with an integer squared micro-degree
  distance. This is exactly how a planet-scale point-radius join avoids
  the all-pairs cross product: the shuffle key is the cell id, the
  neighborhood fanout is a constant 9, and skew maps to dense cells
  (where salting or finer cells apply). No trig in the hot path.
- `geo_bbox_contains` — region containment as conditional aggregation:
  one narrow scan, four CASE counters, no join at all (the broadcast
  NLJ a naive box-join would plan is never built).
- `geo_haversine_topk` — k-nearest neighbors to a bounded set of query
  points by great-circle distance (the `sim_topk_cosine` shape on the
  sphere): broadcast the 5 query points across the corpus, window
  row_number per query. Distances are rounded to integer meters and
  BOTH engines rank by (rounded meters, key), so libm trig tails
  (~1e-10 m) cannot reorder the top-k cut.

Time series over the hourly event stream (dense hour spine, so both
engines see the same gap-free series; the spine length grows with the
covered TIME RANGE, not the data volume, so the global-window stages
stay bounded at 100 TB):

- `ts_autocorr` — lag-1..6 autocorrelation of hourly counts computed
  entirely in INTEGER space: with S = Σn and N = spine length, the
  centered product Σ(N·n_t − S)(N·n_{t+k} − S) is exact int64
  arithmetic, and r_k = num_k/num_0 is one IEEE division of identical
  integers — no reduction-order float noise anywhere.
- `ts_seasonal_hod` — classical decomposition seasonal indices: a
  centered 24 h moving average detrends the series (again scaled by 24
  to stay integer: 24·n_t − Σ₂₄n), full windows only, averaged per
  hour-of-day as a ratio of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sim_spark.io import table
from sim_spark.registry import query
from sim_spark.ops.distrank import (
    bounded_seq_window as _bseq,
    bounded_total_window as _btot,
)

# ---------------------------------------------------------------------------
# Deterministic placement: micro-degree integers from the shared 48-bit hash.
# ---------------------------------------------------------------------------


from sim_spark.exprs import h48 as _h48_spark, sql_h48 as _h48_sql  # shared


def _place_spark(df: DataFrame, key: str) -> DataFrame:
    k = F.col(key).cast("string")
    return df.select(
        F.col(key),
        (_h48_spark(F.concat(F.lit("lat|"), k)) % 120000001 - 60000000).alias(
            "lat_micro"
        ),
        (_h48_spark(F.concat(F.lit("lon|"), k)) % 360000000 - 180000000).alias(
            "lon_micro"
        ),
    )


def _place_sql(tbl: str, key: str) -> str:
    k = f"CAST({key} AS VARCHAR)"
    lat_in = "'lat|' || " + k
    lon_in = "'lon|' || " + k
    return (
        f"SELECT {key}, "
        f"{_h48_sql(lat_in)} % 120000001 - 60000000 AS lat_micro, "
        f"{_h48_sql(lon_in)} % 360000000 - 180000000 AS lon_micro "
        f"FROM {tbl}"
    )


_CELL = 3000000  # 3° cells, micro-degrees
_R2 = _CELL * _CELL  # radius == one cell: neighbors guaranteed sufficient


@query(
    "geo_cell_neighbor_join",
    oracle=f"""
WITH cust AS ({_place_sql('customer', 'c_custkey')}),
supp AS ({_place_sql('supplier', 's_suppkey')}),
cgrid AS (
  SELECT c_custkey, lat_micro, lon_micro,
         (lon_micro + 180000000) // {_CELL} AS cx,
         (lat_micro + 60000000) // {_CELL} AS cy
  FROM cust
),
sgrid AS (
  SELECT s_suppkey, lat_micro, lon_micro,
         (lon_micro + 180000000) // {_CELL} + dx.x AS cx,
         (lat_micro + 60000000) // {_CELL} + dy.x AS cy
  FROM supp, range(-1, 2) dx(x), range(-1, 2) dy(x)
)
SELECT c.c_custkey, s.s_suppkey,
       (c.lat_micro - s.lat_micro) * (c.lat_micro - s.lat_micro)
       + (c.lon_micro - s.lon_micro) * (c.lon_micro - s.lon_micro) AS dist2
FROM cgrid c JOIN sgrid s ON c.cx = s.cx AND c.cy = s.cy
WHERE (c.lat_micro - s.lat_micro) * (c.lat_micro - s.lat_micro)
      + (c.lon_micro - s.lon_micro) * (c.lon_micro - s.lon_micro) <= {_R2}
ORDER BY c_custkey, s_suppkey
""",
)
def geo_cell_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-radius spatial join via 3×3 neighbor-cell equi-join
    (module docstring). The customer side keeps one row per point; only
    the (much smaller) supplier side fans out 9×."""
    cust = _place_spark(table(spark, sf_dir, "customer"), "c_custkey")
    supp = _place_spark(table(spark, sf_dir, "supplier"), "s_suppkey")
    cgrid = cust.select(
        "c_custkey",
        "lat_micro",
        "lon_micro",
        F.expr(f"(lon_micro + 180000000) div {_CELL}").alias("cx"),
        F.expr(f"(lat_micro + 60000000) div {_CELL}").alias("cy"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    sgrid = (
        supp.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "s_suppkey",
            F.col("lat_micro").alias("s_lat"),
            F.col("lon_micro").alias("s_lon"),
            (F.expr(f"(lon_micro + 180000000) div {_CELL}") + F.col("dx")).alias("cx"),
            (F.expr(f"(lat_micro + 60000000) div {_CELL}") + F.col("dy")).alias("cy"),
        )
    )
    dlat = F.col("lat_micro") - F.col("s_lat")
    dlon = F.col("lon_micro") - F.col("s_lon")
    dist2 = dlat * dlat + dlon * dlon
    return (
        cgrid.join(sgrid, ["cx", "cy"])
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= _R2)
        .select("c_custkey", "s_suppkey", "dist2")
        .orderBy("c_custkey", "s_suppkey")
    )


_BOXES = [
    # (name, lat_lo, lat_hi, lon_lo, lon_hi) in micro-degrees
    ("equatorial", -15000000, 15000000, -30000000, 60000000),
    ("north_band", 30000000, 60000000, -80000000, 0),
    ("se_quadrant", -10000000, 25000000, 90000000, 150000000),
    ("west_pacific", -50000000, 10000000, 150000000, 180000000),
]


def _box_case_sql(name, lat_lo, lat_hi, lon_lo, lon_hi) -> str:
    return (
        f"CAST(sum(CASE WHEN lat_micro BETWEEN {lat_lo} AND {lat_hi} "
        f"AND lon_micro BETWEEN {lon_lo} AND {lon_hi} THEN 1 ELSE 0 END) AS BIGINT)"
    )


@query(
    "geo_bbox_contains",
    oracle=f"""
WITH cust AS ({_place_sql('customer', 'c_custkey')}),
agg AS (
  SELECT {", ".join(f"{_box_case_sql(*b)} AS n_{b[0]}" for b in _BOXES)}
  FROM cust
)
{" UNION ALL ".join(f"SELECT '{b[0]}' AS box, n_{b[0]} AS n_points FROM agg" for b in _BOXES)}
ORDER BY box
""",
)
def geo_bbox_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box containment counts as ONE conditional-aggregation
    scan (module docstring) — the plan a naive box-table join would
    turn into a broadcast nested loop is folded into CASE counters."""
    cust = _place_spark(table(spark, sf_dir, "customer"), "c_custkey")
    agg = cust.agg(
        *[
            F.sum(
                F.when(
                    F.col("lat_micro").between(la, lb)
                    & F.col("lon_micro").between(lo, lhi),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n_{name}")
            for name, la, lb, lo, lhi in _BOXES
        ]
    )
    stack = ", ".join(f"'{b[0]}', n_{b[0]}" for b in _BOXES)
    return (
        agg.selectExpr(f"stack({len(_BOXES)}, {stack}) AS (box, n_points)")
        .orderBy("box")
    )


_QPOINTS = [
    # (name, lat_micro, lon_micro) — fixed literal probe points
    ("reykjavik", 64146600, -21942600),
    ("singapore", 1352100, 103819800),
    ("sao_paulo", -23550500, -46633300),
    ("sydney", -33868800, 151209300),
    ("nairobi", -1292100, 36821900),
]
_TOPK = 3
_EARTH_M = 6371000.0


def _hav_sql(qlat: str, qlon: str) -> str:
    return (
        f"2.0 * {_EARTH_M} * asin(sqrt("
        f"sin(radians(({qlat} - lat_micro) / 1000000.0) / 2)"
        f" * sin(radians(({qlat} - lat_micro) / 1000000.0) / 2)"
        f" + cos(radians({qlat} / 1000000.0)) * cos(radians(lat_micro / 1000000.0))"
        f" * sin(radians(({qlon} - lon_micro) / 1000000.0) / 2)"
        f" * sin(radians(({qlon} - lon_micro) / 1000000.0) / 2)))"
    )


@query(
    "geo_haversine_topk",
    oracle=f"""
WITH cust AS ({_place_sql('customer', 'c_custkey')}),
q(q_name, q_lat, q_lon) AS (
  VALUES {", ".join(f"('{n}', {la}, {lo})" for n, la, lo in _QPOINTS)}
),
dists AS (
  SELECT q.q_name, c.c_custkey,
         CAST(floor({_hav_sql('q.q_lat', 'q.q_lon')} + 0.5) AS BIGINT) AS dist_m
  FROM q CROSS JOIN cust c
),
ranked AS (
  SELECT q_name, c_custkey, dist_m,
         row_number() OVER (PARTITION BY q_name ORDER BY dist_m, c_custkey) AS rank
  FROM dists
)
SELECT q_name, rank, c_custkey, dist_m FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_name, rank
""",
)
def geo_haversine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle k-NN for 5 fixed probe points (module docstring).
    Both engines rank by the METER-ROUNDED distance with a key
    tiebreak, so the cut is identical despite libm trig tails."""
    cust = _place_spark(table(spark, sf_dir, "customer"), "c_custkey")
    q = spark.createDataFrame(_QPOINTS, ["q_name", "q_lat", "q_lon"])
    dlat = (F.col("q_lat") - F.col("lat_micro")) / 1000000.0
    dlon = (F.col("q_lon") - F.col("lon_micro")) / 1000000.0
    hav = (
        F.sin(F.radians(dlat) / 2) * F.sin(F.radians(dlat) / 2)
        + F.cos(F.radians(F.col("q_lat") / 1000000.0))
        * F.cos(F.radians(F.col("lat_micro") / 1000000.0))
        * F.sin(F.radians(dlon) / 2)
        * F.sin(F.radians(dlon) / 2)
    )
    dist_m = F.floor(2.0 * _EARTH_M * F.asin(F.sqrt(hav)) + 0.5).cast("long")
    dists = F.broadcast(q).crossJoin(cust).select(
        "q_name", "c_custkey", dist_m.alias("dist_m")
    )
    w = W.partitionBy("q_name").orderBy("dist_m", "c_custkey")
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("q_name", "rank", "c_custkey", "dist_m")
        .orderBy("q_name", "rank")
    )


# ---------------------------------------------------------------------------
# Time series over the dense hourly spine
# ---------------------------------------------------------------------------

_HOUR_SPINE_SQL = """
hours AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr, count(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hours),
spine AS (
  SELECT CAST(s.hr AS BIGINT) AS hr, COALESCE(h.n, 0) AS n
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds) s
  LEFT JOIN hours h ON h.hr = s.hr
)
"""


def _hour_spine_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hours = (
        e.select(
            (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
            .cast("long")
            .alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = hours.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    return spine.join(hours, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).alias("n")
    )


def _autocov_cte(max_lag: int) -> str:
    """DuckDB CTE chain tot/c/nums: exact-integer centered lag products
    over the dense hour spine — shared by ts_autocorr and
    ts_yule_walker_ar2 so both keys reduce the SAME quantities."""
    leads = ", ".join(
        f"lead(nn * n - s, {k}) OVER (ORDER BY hr) AS cdev_{k}"
        for k in range(1, max_lag + 1)
    )
    sums = ", ".join(
        f"CAST(sum(cdev * cdev_{k}) AS BIGINT) AS num{k}"
        for k in range(1, max_lag + 1)
    )
    return f"""tot AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(n) AS BIGINT) AS s FROM spine),
c AS (
  SELECT hr, nn * n - s AS cdev, {leads}
  FROM spine, tot
),
nums AS (
  SELECT CAST(sum(cdev * cdev) AS BIGINT) AS num0, {sums}
  FROM c
)"""


def _autocov_nums(spark: SparkSession, sf_dir: str, max_lag: int) -> DataFrame:
    """Spark twin of _autocov_cte: the 1-row (num0..num{max_lag}) frame."""
    spine = _hour_spine_spark(spark, sf_dir)
    tot = spine.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n").cast("long").alias("s"),
    )
    c = spine.crossJoin(F.broadcast(tot)).select(
        "hr", (F.col("nn") * F.col("n") - F.col("s")).alias("cdev")
    )
    w = _bseq("hr", "hr")
    leads = c.select(
        "cdev",
        *[
            F.lead("cdev", k).over(w).alias(f"cdev_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    return leads.agg(
        F.sum(F.col("cdev") * F.col("cdev")).cast("long").alias("num0"),
        *[
            F.sum(F.col("cdev") * F.col(f"cdev_{k}")).cast("long").alias(f"num{k}")
            for k in range(1, max_lag + 1)
        ],
    )



_MAX_LAG = 6


@query(
    "ts_autocorr",
    oracle=f"""
WITH {_HOUR_SPINE_SQL},
{_autocov_cte(_MAX_LAG)}
{" UNION ALL ".join(f"SELECT {k} AS lag, round(num{k} * 1.0 / num0, 6) AS autocorr FROM nums" for k in range(1, _MAX_LAG + 1))}
ORDER BY lag
""",
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count autocorrelation at lags 1..6 in exact integer space
    (module docstring): r_k = Σ cdev_t·cdev_{{t+k}} / Σ cdev_t² where
    cdev = N·n − S is int64 — the only float op is the final division
    of two exact integers, identical in any engine at any parallelism."""
    nums = _autocov_nums(spark, sf_dir, _MAX_LAG)
    lags = None
    for k in range(1, _MAX_LAG + 1):
        row = nums.select(
            F.lit(k).alias("lag"),
            F.round(F.col(f"num{k}") * F.lit(1.0) / F.col("num0"), 6).alias(
                "autocorr"
            ),
        )
        lags = row if lags is None else lags.unionAll(row)
    return lags.orderBy("lag")


@query(
    "ts_seasonal_hod",
    oracle=f"""
WITH {_HOUR_SPINE_SQL},
ma AS (
  SELECT hr, n,
         sum(n) OVER (ORDER BY hr RANGE BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS sum24,
         count(*) OVER (ORDER BY hr RANGE BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS cnt24
  FROM spine
),
det AS (
  SELECT hr % 24 AS hod, 24 * n - sum24 AS detrend24
  FROM ma WHERE cnt24 = 24
)
SELECT CAST(hod AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(CAST(sum(detrend24) AS BIGINT) * 1.0 / (24 * count(*)), 6) AS seasonal_index
FROM det GROUP BY hod ORDER BY hod
""",
)
def ts_seasonal_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal indices from a centered 24 h moving-average
    detrend, all in integer space until one final exact division
    (module docstring). Full windows only, so edges don't bias."""
    spine = _hour_spine_spark(spark, sf_dir)
    w = _bseq("hr", "hr").rangeBetween(-12, 11)
    ma = spine.select(
        "hr",
        "n",
        F.sum("n").over(w).alias("sum24"),
        F.count(F.lit(1)).over(w).alias("cnt24"),
    )
    det = ma.filter(F.col("cnt24") == 24).select(
        (F.col("hr") % 24).alias("hod"),
        (F.lit(24) * F.col("n") - F.col("sum24")).alias("detrend24"),
    )
    return (
        det.groupBy("hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.round(
                F.sum("detrend24").cast("long")
                * F.lit(1.0)
                / (F.lit(24) * F.count(F.lit(1))),
                6,
            ).alias("seasonal_index"),
        )
        .select(F.col("hod").cast("long").alias("hod"), "n_hours", "seasonal_index")
        .orderBy("hod")
    )


# ---------------------------------------------------------------------------
# Point-in-polygon containment, exact in integer space
# ---------------------------------------------------------------------------

# Literal test polygon (micro-degrees), a non-convex pentagon. Vertices
# counter-clockwise; edges derived in Python so each edge is emitted with
# y1 < y2 (swapped when needed), which removes the divisor-sign branch
# from the crossing test.
_POLY = [
    (10000000, -20000000),
    (45000000, 5000000),
    (20000000, 40000000),
    (-5000000, 25000000),
    (-15000000, -5000000),
]
_EDGES = []
for _i in range(len(_POLY)):
    (_y1, _x1), (_y2, _x2) = _POLY[_i], _POLY[(_i + 1) % len(_POLY)]
    if _y1 > _y2:
        _y1, _x1, _y2, _x2 = _y2, _x2, _y1, _x1
    _EDGES.append((_y1, _x1, _y2, _x2))


def _crossing_sql(y1, x1, y2, x2) -> str:
    # Half-open [y1, y2) rule + exact cross-multiplied x-intersection
    # test: with y2 > y1 guaranteed, px < x1 + (x2-x1)(py-y1)/(y2-y1)
    # ⇔ (px - x1)(y2 - y1) < (x2 - x1)(py - y1). int64 throughout
    # (|coord| ≤ 1.8e8 → products ≤ ~2.6e16).
    return (
        f"CASE WHEN lat_micro >= {y1} AND lat_micro < {y2} "
        f"AND (lon_micro - {x1}) * {y2 - y1} < {x2 - x1} * (lat_micro - {y1}) "
        f"THEN 1 ELSE 0 END"
    )


@query(
    "geo_point_in_polygon",
    oracle=f"""
WITH cust AS ({_place_sql('customer', 'c_custkey')}),
hits AS (
  SELECT c_custkey,
         {" + ".join(_crossing_sql(*e) for e in _EDGES)} AS crossings
  FROM cust
)
SELECT CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(crossings % 2) AS BIGINT) AS n_inside,
       CAST(sum(CASE WHEN crossings % 2 = 1 THEN c_custkey ELSE 0 END) AS BIGINT)
         AS inside_checksum
FROM hits
""",
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon containment by ray casting, entirely in
    int64: each of the 5 literal edges contributes a half-open-interval
    crossing test with the x-intersection comparison cross-multiplied
    (edges pre-oriented y1 < y2 at build time, so no division and no
    sign branch exists anywhere). One scan, 5 CASE terms, one aggregate
    — the shape that classifies 100 TB of points against a broadcast
    polygon table with zero float-boundary ambiguity. The inside-id
    checksum pins the exact membership set."""
    cust = _place_spark(table(spark, sf_dir, "customer"), "c_custkey")
    crossings = None
    for y1, x1, y2, x2 in _EDGES:
        term = F.when(
            (F.col("lat_micro") >= y1)
            & (F.col("lat_micro") < y2)
            & (
                (F.col("lon_micro") - x1) * (y2 - y1)
                < (x2 - x1) * (F.col("lat_micro") - y1)
            ),
            1,
        ).otherwise(0)
        crossings = term if crossings is None else crossings + term
    hits = cust.select("c_custkey", crossings.alias("crossings"))
    inside = F.col("crossings") % 2 == 1
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum((F.col("crossings") % 2)).cast("long").alias("n_inside"),
        F.sum(F.when(inside, F.col("c_custkey")).otherwise(0))
        .cast("long")
        .alias("inside_checksum"),
    )


# ---------------------------------------------------------------------------
# Linear trend forecast over the daily spine — integer-exact OLS
# ---------------------------------------------------------------------------


@query(
    "ts_linear_forecast",
    oracle="""
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d, count(*) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS x, y FROM daily
),
s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM idx
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
              * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)))
             / CAST(n AS DOUBLE), 6) AS intercept,
       CAST(floor((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
              * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)))
             / CAST(n AS DOUBLE)
             + ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
               * (CAST(n AS DOUBLE) + 1.0) + 0.5) AS BIGINT) AS forecast_next_day
FROM s
""",
)
def ts_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day volume forecast by OLS on the daily count series: day
    index and counts are INTEGERS, so all five moment sums are exact
    int64 and slope/intercept are the identical double expression in
    both engines (the `stats_spearman_corr` discipline applied to
    trend). 100 TB of events reduce to one day-keyed aggregate before
    the O(days) regression — the capacity-planning primitive."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.expr("unix_timestamp(date_trunc('day', ts)) div 86400").alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    idx = daily.select(
        F.row_number().over(_bseq("d", "d")).alias("x"), "y"
    )
    s = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (F.col("sy").cast("double") - F.col("sx").cast("double") * slope) / nd
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.floor(intercept + slope * (nd + 1.0) + 0.5)
        .cast("long")
        .alias("forecast_next_day"),
    )


# ---------------------------------------------------------------------------
# Holt linear smoothing: a genuinely sequential recurrence, still oracled
# ---------------------------------------------------------------------------


@query(
    "ts_holt_linear",
    oracle="""
WITH RECURSIVE hours AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr, count(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hours),
spine AS (
  SELECT row_number() OVER (ORDER BY s.hr) AS t, COALESCE(h.n, 0) AS y
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds) s
  LEFT JOIN hours h ON h.hr = s.hr
),
n AS (SELECT count(*) AS n FROM spine),
hw(t, s, b) AS (
  SELECT 2,
         CAST((SELECT y FROM spine WHERE t = 2) AS DOUBLE),
         CAST((SELECT y FROM spine WHERE t = 2) AS DOUBLE)
           - CAST((SELECT y FROM spine WHERE t = 1) AS DOUBLE)
  UNION ALL
  SELECT hw.t + 1,
         0.5 * sp.y + 0.5 * (hw.s + hw.b),
         0.5 * ((0.5 * sp.y + 0.5 * (hw.s + hw.b)) - hw.s) + 0.5 * hw.b
  FROM hw JOIN spine sp ON sp.t = hw.t + 1
)
SELECT CAST(n.n AS BIGINT) AS n_hours,
       round(hw.s, 6) AS level,
       round(hw.b, 6) AS trend,
       round(hw.s + 1.0 * hw.b, 6) AS forecast_h1,
       round(hw.s + 3.0 * hw.b, 6) AS forecast_h3
FROM hw, n WHERE hw.t = n.n
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (α = β = 0.5) over the hourly
    series — the one operator family in this module that is genuinely
    SEQUENTIAL (each state depends on the previous step), so it runs in
    the documented custom-stateful tier: applyInPandas over the
    calendar-bounded series (grouped on a constant key; at 100 TB the
    heavy lifting — the hour-keyed count — happened before this stage,
    and per-series state is two floats). α = β = ½ makes every update a
    dyadic-rational IEEE expression, so the DuckDB recursive CTE
    replaying the identical recurrence reproduces the floats bit-for-bit
    and the operator is hash-oracled despite being non-relational."""
    import pandas as pd

    spine = _hour_spine_spark(spark, sf_dir)

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hr").reset_index(drop=True)
        y = pdf["n"].astype("float64").to_numpy()
        s, b = y[1], y[1] - y[0]
        for t in range(2, len(y)):
            s_new = 0.5 * y[t] + 0.5 * (s + b)
            b = 0.5 * (s_new - s) + 0.5 * b
            s = s_new
        return pd.DataFrame(
            {
                "n_hours": [len(y)],
                "level": [round(s, 6)],
                "trend": [round(b, 6)],
                "forecast_h1": [round(s + 1.0 * b, 6)],
                "forecast_h3": [round(s + 3.0 * b, 6)],
            }
        )

    out_schema = (
        "n_hours long, level double, trend double, "
        "forecast_h1 double, forecast_h3 double"
    )
    return (
        spine.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda _, pdf: holt(pdf), out_schema)
    )


@query(
    "ts_stl_residual_anomalies",
    oracle=f"""
WITH {_HOUR_SPINE_SQL},
ma AS (
  SELECT hr, n,
         sum(n) OVER (ORDER BY hr RANGE BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS sum24,
         count(*) OVER (ORDER BY hr RANGE BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS cnt24
  FROM spine
),
det AS (
  SELECT hr, hr % 24 AS hod, n, sum24,
         (24 * n - sum24) AS detrend24
  FROM ma WHERE cnt24 = 24
),
seasonal AS (
  SELECT hod, CAST(sum(detrend24) AS BIGINT) * 1.0 / (24 * count(*)) AS s_idx
  FROM det GROUP BY hod
),
resid AS (
  SELECT d.hr, d.hod,
         CAST(floor((d.detrend24 / 24.0 - s.s_idx) * 1000000000 + 0.5) AS BIGINT)
           AS resid_nano
  FROM det d JOIN seasonal s ON s.hod = d.hod
),
ranked AS (
  SELECT hr, hod, resid_nano,
         row_number() OVER (ORDER BY abs(resid_nano) DESC, hr) AS rnk
  FROM resid
)
SELECT CAST(rnk AS BIGINT) AS rank, CAST(hr AS BIGINT) AS hr,
       CAST(hod AS BIGINT) AS hod, resid_nano
FROM ranked WHERE rnk <= 10 ORDER BY rank
""",
)
def ts_stl_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style anomaly surface: remove the centered-24h trend and the
    hour-of-day seasonal component (both from `ts_seasonal_hod`'s exact
    integer pieces), rank hours by |residual|. The residual is one
    division of exact integers minus the exact seasonal ratio —
    identical doubles — quantized to nano-units before ranking so the
    top-10 cut has a total deterministic order. The decomposition's
    heavy inputs stay one hour-keyed aggregate regardless of volume."""
    from pyspark.sql import Window as W

    spine = _hour_spine_spark(spark, sf_dir)
    w24 = _bseq("hr", "hr").rangeBetween(-12, 11)
    ma = spine.select(
        "hr",
        "n",
        F.sum("n").over(w24).alias("sum24"),
        F.count(F.lit(1)).over(w24).alias("cnt24"),
    )
    det = ma.filter(F.col("cnt24") == 24).select(
        "hr",
        (F.col("hr") % 24).alias("hod"),
        (F.lit(24) * F.col("n") - F.col("sum24")).alias("detrend24"),
    )
    seasonal = det.groupBy("hod").agg(
        (
            F.sum("detrend24").cast("long")
            * F.lit(1.0)
            / (F.lit(24) * F.count(F.lit(1)))
        ).alias("s_idx")
    )
    resid = det.join(seasonal, "hod").select(
        "hr",
        "hod",
        F.floor(
            (F.col("detrend24") / 24.0 - F.col("s_idx")) * 1_000_000_000 + 0.5
        )
        .cast("long")
        .alias("resid_nano"),
    )
    ranked = resid.withColumn(
        "rank",
        F.row_number().over(
            _bseq("hr", F.desc(F.abs("resid_nano")), F.asc("hr"))
        ),
    )
    return (
        ranked.filter(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("hr").cast("long").alias("hr"),
            F.col("hod").cast("long").alias("hod"),
            "resid_nano",
        )
        .orderBy("rank")
    )


@query(
    "ts_cross_correlation",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(sx) AS BIGINT) AS sx,
         CAST(MAX(sy) AS BIGINT) AS sy,
         CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS dxx,
         CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS dyy
  FROM (
    SELECT COUNT(*) OVER () AS n, SUM(x) OVER () AS sx, SUM(y) OVER () AS sy,
           (COUNT(*) OVER ()) * x - (SUM(x) OVER ()) AS dx,
           (COUNT(*) OVER ()) * y - (SUM(y) OVER ()) AS dy
    FROM hourly)
),
lags AS (SELECT unnest(generate_series(-6, 6)) AS lag),
num AS (
  SELECT l.lag,
         CAST(SUM(CAST(t.n * a.x - t.sx AS HUGEINT) * (t.n * b.y - t.sy))
              AS HUGEINT) AS numer,
         CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM lags l
  JOIN hourly a ON TRUE
  JOIN hourly b ON b.h = a.h + l.lag
  CROSS JOIN tot t
  GROUP BY l.lag
)
SELECT n.lag, n.n_overlap,
       ROUND(CAST(n.numer AS DOUBLE)
             / (sqrt(CAST(t.dxx AS DOUBLE)) * sqrt(CAST(t.dyy AS DOUBLE))), 6)
         AS ccf
FROM num n CROSS JOIN tot t
""",
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the hourly purchase and view
    count series at lags -6..+6 — the lead/lag detector behind
    "do views drive purchases N hours later?". Exactness: counts are
    integers, deviations are multiplied through by n (n·x_t − Σx stays
    int128), so every numerator is an exact integer sum; the one double
    expression (ratio of exact quantities) is evaluated identically in
    both engines. Normalization uses full-series moments (the standard
    fast-CCF convention) so the denominator is lag-independent.

    Scale shape: the corpus reduces to one row per hour (single keyed
    aggregate); the 13-lag self-join runs on the hour frame, which is
    time-range-bounded, never corpus-sized — same aggregate-then-
    quadratic pattern as stats_theil_sen. Lag join is an equi-join on
    the shifted hour index."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000").alias("h")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    wall = _btot("x")
    n_w = F.count(F.lit(1)).over(wall)
    sx_w = F.sum("x").over(wall)
    sy_w = F.sum("y").over(wall)
    tot = hourly.select(
        "h",
        "x",
        "y",
        (n_w * F.col("x") - sx_w).alias("dx"),
        (n_w * F.col("y") - sy_w).alias("dy"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec(F.col("dx")) * F.col("dx")).alias("dxx"),
        F.sum(dec(F.col("dy")) * F.col("dy")).alias("dyy"),
    )
    lags = spark.range(-6, 7).select(F.col("id").alias("lag"))
    a = hourly.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    b = hourly.select(F.col("h").alias("hb"), F.col("y").alias("yb"))
    num = (
        lags.crossJoin(a)
        .join(b, F.col("hb") == F.col("ha") + F.col("lag"))
        .crossJoin(F.broadcast(tot))
        .groupBy("lag")
        .agg(
            F.sum(
                dec(F.col("n") * F.col("xa") - F.col("sx"))
                * (F.col("n") * F.col("yb") - F.col("sy"))
            ).alias("numer"),
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
            F.max("dxx").alias("dxx"),
            F.max("dyy").alias("dyy"),
        )
    )
    return num.select(
        "lag",
        "n_overlap",
        F.round(
            F.col("numer").cast("double")
            / (
                F.sqrt(F.col("dxx").cast("double"))
                * F.sqrt(F.col("dyy").cast("double"))
            ),
            6,
        ).alias("ccf"),
    )


# ---------------------------------------------------------------------------
# Grid DBSCAN: density clustering via cell counting + bounded min-label
# ---------------------------------------------------------------------------

_DB_CELL = 6000000  # 6-degree cells (micro-degrees)
_DB_MINPTS = 2      # core cell: >= 2 points
_DB_ROUNDS = 4      # min-label rounds over the 8-neighbor core adjacency


def _db_points_sql() -> str:
    """All three entity tables placed as one point set (namespaced keys
    so equal numeric ids in different tables can't collide to one
    point)."""
    legs = []
    for tbl, key, tag in (
        ("customer", "c_custkey", "c"),
        ("supplier", "s_suppkey", "s"),
        ("part", "p_partkey", "p"),
    ):
        k = f"'{tag}:' || CAST({key} AS VARCHAR)"
        legs.append(
            f"SELECT {_h48_sql(chr(39) + 'lat|' + chr(39) + ' || ' + k)} % 120000001 - 60000000 AS lat_micro, "
            f"{_h48_sql(chr(39) + 'lon|' + chr(39) + ' || ' + k)} % 360000000 - 180000000 AS lon_micro "
            f"FROM {tbl}"
        )
    return " UNION ALL ".join(legs)


def _dbscan_oracle() -> str:
    ctes = [
        f"pts AS ({_db_points_sql()})",
        f"""cells AS (
  SELECT (lon_micro + 180000000) // {_DB_CELL} AS cx,
         (lat_micro + 60000000) // {_DB_CELL} AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2)""",
        f"core AS (SELECT cx, cy, n, cx * 1000 + cy AS cell_id FROM cells WHERE n >= {_DB_MINPTS})",
        """adj AS (
  SELECT a.cell_id AS ida, b.cell_id AS idb
  FROM core a
  JOIN core b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
             AND b.cy BETWEEN a.cy - 1 AND a.cy + 1)""",
        "lb0 AS (SELECT cell_id, cell_id AS label FROM core)",
    ]
    for k in range(1, _DB_ROUNDS + 1):
        ctes.append(
            f"""lb{k} AS (
  SELECT adj.ida AS cell_id, MIN(l.label) AS label
  FROM adj JOIN lb{k - 1} l ON l.cell_id = adj.idb
  GROUP BY adj.ida)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
lab AS (SELECT cell_id, label FROM lb{_DB_ROUNDS}),
border AS (
  SELECT nc.cx, nc.cy, nc.n, MIN(l.label) AS label
  FROM cells nc
  JOIN core b ON b.cx BETWEEN nc.cx - 1 AND nc.cx + 1
             AND b.cy BETWEEN nc.cy - 1 AND nc.cy + 1
  JOIN lab l ON l.cell_id = b.cell_id
  WHERE nc.n < {_DB_MINPTS}
  GROUP BY nc.cx, nc.cy, nc.n
)
SELECT c.label AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_core_cells,
       CAST(SUM(c.n) AS BIGINT) AS n_core_points,
       CAST(COALESCE(MAX(br.bpts), 0) AS BIGINT) AS n_border_points
FROM (SELECT core.n, lab.label FROM core JOIN lab USING (cell_id)) c
LEFT JOIN (SELECT label, SUM(n) AS bpts FROM border GROUP BY label) br
       ON br.label = c.label
GROUP BY c.label
ORDER BY SUM(c.n) DESC, c.label LIMIT 15
"""
    )


@query("geo_dbscan_grid", oracle=_dbscan_oracle())
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN over the deterministic point cloud (customers +
    suppliers + parts, namespaced-hash placement): a cell is CORE when
    it holds >= {_DB_MINPTS} points, clusters are connected core cells
    under 8-neighborhood (labels = {_DB_ROUNDS} min-label rounds —
    exact for clusters of cell-diameter <= {_DB_ROUNDS}, the same
    bounded-round contract as BFS/LPA), border cells adopt the minimum
    adjacent core label. Top-15 clusters by core mass.

    This is the scale formulation of density clustering: density comes
    from a cell-keyed COUNT (one shuffle), adjacency from the constant
    3x3 neighbor window (never point-to-point distance joins), and the
    label iteration runs on the CORE-CELL frame, which is grid-bounded
    regardless of corpus size. All-integer end to end."""
    frames = []
    for tbl, key, tag in (
        ("customer", "c_custkey", "c"),
        ("supplier", "s_suppkey", "s"),
        ("part", "p_partkey", "p"),
    ):
        k = F.concat(F.lit(tag + ":"), F.col(key).cast("string"))
        frames.append(
            table(spark, sf_dir, tbl).select(
                (_h48_spark(F.concat(F.lit("lat|"), k)) % 120000001 - 60000000).alias(
                    "lat_micro"
                ),
                (_h48_spark(F.concat(F.lit("lon|"), k)) % 360000000 - 180000000).alias(
                    "lon_micro"
                ),
            )
        )
    pts = frames[0].unionAll(frames[1]).unionAll(frames[2])
    from sim_spark.ops.materialize import materialize

    # Materialize the CELL frame (not just core): both the core filter
    # and the border filter consume it, and an unmaterialized `cells`
    # would re-run the 3-table point union + per-row hashing for the
    # border stage (r7e review finding). Everything downstream is a
    # cheap filter/select off the checkpointed counts.
    cells = (
        pts.groupBy(
            F.expr(f"(lon_micro + 180000000) div {_DB_CELL}").alias("cx"),
            F.expr(f"(lat_micro + 60000000) div {_DB_CELL}").alias("cy"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(materialize)
    )
    core = cells.filter(F.col("n") >= _DB_MINPTS).select(
        "cx", "cy", "n", (F.col("cx") * 1000 + F.col("cy")).alias("cell_id")
    )
    # 8-neighborhood as an EQUI join: explode one side to its 3x3 cell
    # offsets and match on the exact (cx, cy) key (the
    # geo_cell_neighbor_join pattern) — constant fanout, never a
    # nested-loop band join.
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    b9 = (
        core.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            (F.col("cx") + F.col("dx")).alias("bx"),
            (F.col("cy") + F.col("dy")).alias("by"),
            F.col("cell_id").alias("idb"),
        )
    )
    adj = (
        core.select("cx", "cy", F.col("cell_id").alias("ida"))
        .join(b9, (F.col("cx") == F.col("bx")) & (F.col("cy") == F.col("by")))
        .select("ida", "idb")
        .transform(materialize)
    )
    lab = core.select("cell_id", F.col("cell_id").alias("label"))
    for _ in range(_DB_ROUNDS):
        lab = (
            adj.join(lab, lab.cell_id == adj.idb)
            .groupBy(F.col("ida").alias("cell_id"))
            .agg(F.min("label").alias("label"))
            .transform(materialize)
        )
    border = (
        cells.filter(F.col("n") < _DB_MINPTS)
        .join(b9, (F.col("cx") == F.col("bx")) & (F.col("cy") == F.col("by")))
        .join(lab.withColumnRenamed("cell_id", "lcell"), F.col("lcell") == F.col("idb"))
        .groupBy("cx", "cy", "n")
        .agg(F.min("label").alias("label"))
    )
    core_lab = core.join(lab, "cell_id").select("n", "label")
    br = border.groupBy("label").agg(F.sum("n").alias("bpts"))
    return (
        core_lab.join(br, "label", "left")
        .groupBy(F.col("label").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_core_cells"),
            F.sum("n").cast("bigint").alias("n_core_points"),
            F.coalesce(F.max("bpts"), F.lit(0)).cast("bigint").alias(
                "n_border_points"
            ),
        )
        .orderBy(F.desc("n_core_points"), "cluster")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive (level/trend/seasonal) — full recursion as a fold
# ---------------------------------------------------------------------------
#
# Exponential smoothing is a SEQUENTIAL recursion — the op SQL engines
# "can't do" without UDFs. The events_survival_km trick generalizes: a
# recursion over a TIME-BOUNDED series is an ordered left fold over the
# collected series array; Spark runs it as a purely functional
# F.aggregate whose struct accumulator carries (level, trend,
# seasonal[24]), and the oracle replays the identical per-step double
# arithmetic as a recursive CTE — all 696 chained steps stay bit-equal
# with zero libm. (The oracle deliberately does NOT use DuckDB
# list_reduce: in DuckDB 1.0 its accumulator is updated IN PLACE from
# the second step on, so later struct fields read earlier fields' NEW
# values — found while building this key; the recursive CTE evaluates
# each step as a fresh row and has no such hazard.)
#
# alpha = 0.2, beta = 0.1, gamma = 0.3, period m = 24 h. Init: l0 =
# mean of hours 1..24 (exact int sums), b0 = (mean of 25..48 - l0)/24,
# s0[i] = y_i - l0. The recomputed `lnew` appears inline (not named) in
# the trend and seasonal updates — BOTH engines repeat the identical
# expression, which is what keeps the float stream in lockstep.

_HW_FC = 6  # forecast horizon (hours ahead)


def _hw_oracle() -> str:
    # y for step t+1 is arr[t+1] (1-based). The level expression appears
    # three times per recursive step (level, trend, seasonal) — ordinary
    # projection CSE is consistent inside a recursive CTE row, unlike
    # DuckDB 1.0 list_reduce, whose accumulator is updated IN PLACE from
    # the second step on (later struct fields read earlier fields\' NEW
    # values) — discovered building this key; see the Spark side for the
    # fold formulation that IS safe (F.aggregate is purely functional).
    y = "i.arr[CAST(hw.t + 1 AS INTEGER)]"
    ln = f"(0.2 * ({y} - hw.s[1]) + 0.8 * (hw.l + hw.b))"
    return f"""
WITH RECURSIVE {_HOUR_SPINE_SQL.strip()},
ranked AS (SELECT hr, n, ROW_NUMBER() OVER (ORDER BY hr) AS rn FROM spine),
one AS (
  SELECT list(CAST(n AS DOUBLE) ORDER BY hr) AS arr,
         SUM(CASE WHEN rn <= 24 THEN n ELSE 0 END) AS s1,
         SUM(CASE WHEN rn BETWEEN 25 AND 48 THEN n ELSE 0 END) AS s2
  FROM ranked
),
init AS (
  SELECT arr, CAST(s1 AS DOUBLE) / 24.0 AS l0,
         (CAST(s2 AS DOUBLE) / 24.0 - CAST(s1 AS DOUBLE) / 24.0) / 24.0 AS b0
  FROM one
),
hw(t, l, b, s) AS (
  SELECT CAST(24 AS BIGINT), CAST(l0 AS DOUBLE), CAST(b0 AS DOUBLE),
         list_transform(arr[1:24], v -> v - l0)
  FROM init
  UNION ALL
  SELECT hw.t + 1,
         {ln},
         0.1 * ({ln} - hw.l) + 0.9 * hw.b,
         list_append(hw.s[2:], 0.3 * ({y} - {ln}) + 0.7 * hw.s[1])
  FROM hw, init i WHERE hw.t < len(i.arr)
),
fin AS (SELECT hw.l, hw.b, hw.s FROM hw, init i WHERE hw.t = len(i.arr))
SELECT component, CAST(idx AS BIGINT) AS idx, ROUND(value, 6) AS value FROM (
  SELECT \'level\' AS component, 0 AS idx, l AS value FROM fin
  UNION ALL SELECT \'trend\', 0, b FROM fin
  UNION ALL
  SELECT \'seasonal\', i, s[CAST(i AS INTEGER)]
  FROM fin, (SELECT unnest(generate_series(1, 24)) AS i) g
  UNION ALL
  SELECT \'forecast\', h, l + h * b + s[CAST(h AS INTEGER)]
  FROM fin, (SELECT unnest(generate_series(1, {_HW_FC})) AS h) g
)
"""


@query("ts_holt_winters", oracle=_hw_oracle())
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters over the dense hourly spine: level, trend,
    the 24 fitted seasonal factors, and a 6-hour-ahead forecast — the
    FULL 696-step recursion, bit-exact across engines via the ordered
    struct fold (block comment above). No driver loop, no UDF, no libm;
    the corpus pass is the spine's keyed count, and the fold runs on
    one collected time-bounded array."""
    spine = _hour_spine_spark(spark, sf_dir)
    wall = _bseq("hr", "hr")
    ranked = spine.select(
        "hr", "n", F.row_number().over(wall).alias("rn")
    )
    one = ranked.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("hr", "n"))),
            lambda x: x["n"].cast("double"),
        ).alias("arr"),
        F.sum(F.when(F.col("rn") <= 24, F.col("n")).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("rn").between(25, 48), F.col("n")).otherwise(0)
        ).alias("s2"),
    )
    init = one.select(
        "arr",
        (F.col("s1") / 24.0).alias("l0"),
        ((F.col("s2") / 24.0 - F.col("s1") / 24.0) / 24.0).alias("b0"),
    )

    def lnew(a, x):
        return 0.2 * (x["y"] - F.element_at(a["s"], 1)) + 0.8 * (a["l"] + a["b"])

    def step(a, x):
        return F.struct(
            x["y"].alias("y"),
            lnew(a, x).alias("l"),
            (0.1 * (lnew(a, x) - a["l"]) + 0.9 * a["b"]).alias("b"),
            F.concat(
                F.slice(a["s"], 2, 23),
                F.array(
                    0.3 * (x["y"] - lnew(a, x)) + 0.7 * F.element_at(a["s"], 1)
                ),
            ).alias("s"),
        )

    elements = F.transform(
        F.slice(F.col("arr"), 25, F.size("arr")),
        lambda v: F.struct(
            v.alias("y"),
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            F.array().cast("array<double>").alias("s"),
        ),
    )
    acc0 = F.struct(
        F.lit(0.0).alias("y"),
        F.col("l0").alias("l"),
        F.col("b0").alias("b"),
        F.transform(
            F.slice(F.col("arr"), 1, 24), lambda v: v - F.col("l0")
        ).alias("s"),
    )
    fin = init.select(F.aggregate(elements, acc0, step).alias("st"))
    out_structs = F.concat(
        F.array(
            F.struct(
                F.lit("level").alias("component"),
                F.lit(0).cast("long").alias("idx"),
                F.col("st.l").alias("value"),
            ),
            F.struct(
                F.lit("trend").alias("component"),
                F.lit(0).cast("long").alias("idx"),
                F.col("st.b").alias("value"),
            ),
        ),
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda i: F.struct(
                F.lit("seasonal").alias("component"),
                i.cast("long").alias("idx"),
                F.element_at(F.col("st.s"), i).alias("value"),
            ),
        ),
        F.transform(
            F.sequence(F.lit(1), F.lit(_HW_FC)),
            lambda h: F.struct(
                F.lit("forecast").alias("component"),
                h.cast("long").alias("idx"),
                (
                    F.col("st.l")
                    + h.cast("double") * F.col("st.b")
                    + F.element_at(F.col("st.s"), h)
                ).alias("value"),
            ),
        ),
    )
    return fin.select(F.explode(out_structs).alias("r")).select(
        F.col("r.component").alias("component"),
        F.col("r.idx").alias("idx"),
        F.round("r.value", 6).alias("value"),
    )


@query(
    "ts_yule_walker_ar2",
    oracle=f"""
WITH {_HOUR_SPINE_SQL},
{_autocov_cte(2)},
r AS (
  SELECT num1 * 1.0 / num0 AS r1, num2 * 1.0 / num0 AS r2 FROM nums
),
phi AS (
  SELECT r1, r2,
         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
  FROM r
),
lastc AS (
  SELECT t.nn, t.s,
         MAX(CASE WHEN rn = 1 THEN n END) AS y_t,
         MAX(CASE WHEN rn = 2 THEN n END) AS y_t1
  FROM (SELECT n, ROW_NUMBER() OVER (ORDER BY hr DESC) AS rn FROM spine) x,
       tot t
  WHERE rn <= 2 GROUP BY t.nn, t.s
)
SELECT ROUND(p.r1, 6) AS r1, ROUND(p.r2, 6) AS r2,
       ROUND(p.phi1, 6) AS phi1, ROUND(p.phi2, 6) AS phi2,
       ROUND(1.0 - p.phi1 * p.r1 - p.phi2 * p.r2, 6) AS resid_var_ratio,
       ROUND(CAST(l.s AS DOUBLE) / l.nn
             + p.phi1 * (l.y_t - CAST(l.s AS DOUBLE) / l.nn)
             + p.phi2 * (l.y_t1 - CAST(l.s AS DOUBLE) / l.nn), 6) AS forecast_next
FROM phi p CROSS JOIN lastc l
""",
)
def ts_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit by the Yule-Walker equations over the dense hourly
    spine: autocorrelations r1/r2 come from the SAME exact-integer
    centered products as `ts_autocorr` (int64 numerators, one division
    each), the closed-form 2x2 solve and the one-step mean-reverting
    forecast are final scalar expressions over those exact ratios, and
    the residual-variance ratio 1 − φ1·r1 − φ2·r2 is the model-quality
    readout. No iteration, no libm: the entire fit is one corpus-keyed
    count reduce + one window pass on the time-bounded spine."""
    spine = _hour_spine_spark(spark, sf_dir)
    tot = spine.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n").cast("long").alias("s"),
    )
    nums = _autocov_nums(spark, sf_dir, 2)
    r1 = F.col("num1") * 1.0 / F.col("num0")
    r2 = F.col("num2") * 1.0 / F.col("num0")
    phi = nums.select(
        r1.alias("r1"),
        r2.alias("r2"),
        (r1 * (1.0 - r2) / (1.0 - r1 * r1)).alias("phi1"),
        ((r2 - r1 * r1) / (1.0 - r1 * r1)).alias("phi2"),
    )
    wd = _bseq("hr", F.desc("hr"))
    lastc = (
        spine.select("n", F.row_number().over(wd).alias("rn"))
        .filter(F.col("rn") <= 2)
        .crossJoin(F.broadcast(tot))
        .groupBy("nn", "s")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("n"))).alias("y_t"),
            F.max(F.when(F.col("rn") == 2, F.col("n"))).alias("y_t1"),
        )
    )
    mean = F.col("s").cast("double") / F.col("nn")
    return phi.crossJoin(F.broadcast(lastc)).select(
        F.round("r1", 6).alias("r1"),
        F.round("r2", 6).alias("r2"),
        F.round("phi1", 6).alias("phi1"),
        F.round("phi2", 6).alias("phi2"),
        F.round(
            1.0 - F.col("phi1") * F.col("r1") - F.col("phi2") * F.col("r2"), 6
        ).alias("resid_var_ratio"),
        F.round(
            mean
            + F.col("phi1") * (F.col("y_t") - mean)
            + F.col("phi2") * (F.col("y_t1") - mean),
            6,
        ).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# DFT power at fixed periods — spectral analysis with LITERAL twiddles
# ---------------------------------------------------------------------------
#
# sin/cos are libm (not guaranteed identical across engines), so the
# twiddle factors are PRE-EVALUATED 17-digit literals generated once in
# Python and embedded in BOTH engines — parsing the same decimal text
# yields the same nearest double everywhere, and the angle index is
# t mod P (exact integer), so no trig ever executes at query time.
# Per-row products n_t * twiddle are nano-quantized to int64 before the
# sum (reduction-order-proof); power = c^2 + s^2 from the two exact
# sums. Periods 24/12/8/6 h — the harmonics of the daily cycle.


@query(
    "ts_dft_power_periods",
    oracle=f"""
WITH {_HOUR_SPINE_SQL},
b AS (SELECT MIN(hr) AS h0 FROM spine),
per AS (
  SELECT 24 AS p,
         CAST([1.0, 0.9659258262890683, 0.8660254037844387, 0.7071067811865476, 0.5000000000000001, 0.25881904510252074, 6.123233995736766e-17, -0.25881904510252063, -0.4999999999999998, -0.7071067811865475, -0.8660254037844387, -0.9659258262890682, -1.0, -0.9659258262890683, -0.8660254037844388, -0.7071067811865479, -0.5000000000000004, -0.25881904510252063, -1.8369701987210297e-16, 0.2588190451025203, 0.5000000000000001, 0.7071067811865474, 0.8660254037844384, 0.9659258262890681] AS DOUBLE[]) AS ct,
         CAST([0.0, 0.25881904510252074, 0.49999999999999994, 0.7071067811865475, 0.8660254037844386, 0.9659258262890683, 1.0, 0.9659258262890683, 0.8660254037844387, 0.7071067811865476, 0.49999999999999994, 0.258819045102521, 1.2246467991473532e-16, -0.2588190451025208, -0.4999999999999997, -0.7071067811865471, -0.8660254037844384, -0.9659258262890683, -1.0, -0.9659258262890684, -0.8660254037844386, -0.7071067811865477, -0.5000000000000004, -0.25881904510252157] AS DOUBLE[]) AS st
  UNION ALL
  SELECT 12 AS p,
         CAST([1.0, 0.8660254037844387, 0.5000000000000001, 6.123233995736766e-17, -0.4999999999999998, -0.8660254037844387, -1.0, -0.8660254037844388, -0.5000000000000004, -1.8369701987210297e-16, 0.5000000000000001, 0.8660254037844384] AS DOUBLE[]) AS ct,
         CAST([0.0, 0.49999999999999994, 0.8660254037844386, 1.0, 0.8660254037844387, 0.49999999999999994, 1.2246467991473532e-16, -0.4999999999999997, -0.8660254037844384, -1.0, -0.8660254037844386, -0.5000000000000004] AS DOUBLE[]) AS st
  UNION ALL
  SELECT 8 AS p,
         CAST([1.0, 0.7071067811865476, 6.123233995736766e-17, -0.7071067811865475, -1.0, -0.7071067811865477, -1.8369701987210297e-16, 0.7071067811865474] AS DOUBLE[]) AS ct,
         CAST([0.0, 0.7071067811865475, 1.0, 0.7071067811865476, 1.2246467991473532e-16, -0.7071067811865475, -1.0, -0.7071067811865477] AS DOUBLE[]) AS st
  UNION ALL
  SELECT 6 AS p,
         CAST([1.0, 0.5000000000000001, -0.4999999999999998, -1.0, -0.5000000000000004, 0.5000000000000001] AS DOUBLE[]) AS ct,
         CAST([0.0, 0.8660254037844386, 0.8660254037844387, 1.2246467991473532e-16, -0.8660254037844384, -0.8660254037844386] AS DOUBLE[]) AS st
),
cells AS (
  SELECT per.p,
         CAST(floor(s.n * per.ct[CAST((s.hr - b.h0) % per.p AS INTEGER) + 1]
                    * 1000000000.0 + 0.5) AS BIGINT) AS cq,
         CAST(floor(s.n * per.st[CAST((s.hr - b.h0) % per.p AS INTEGER) + 1]
                    * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM spine s CROSS JOIN b CROSS JOIN per
)
SELECT p AS period_hours,
       CAST(SUM(cq) AS BIGINT) AS c_nano,
       CAST(SUM(sq) AS BIGINT) AS s_nano,
       ROUND(POWER(SUM(cq) / 1000000000.0, 2)
             + POWER(SUM(sq) / 1000000000.0, 2), 4) AS power
FROM cells GROUP BY p
""",
)
def ts_dft_power_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier power of the hourly count series at the 24/12/
    8/6-hour harmonics (block comment: literal twiddle tables, so the
    whole spectrum needs zero runtime trig and the nano-quantized
    projections hash-match). The engine-portable way to ask "how strong
    is the daily cycle?" — the spectral companion to ts_seasonal_hod's
    time-domain indices.

    Scale shape: the corpus reduces to the hour spine once; the per-
    period projection is a constant-fanout (4x) explode feeding one
    partial+final integer aggregate keyed by period."""
    spine = _hour_spine_spark(spark, sf_dir)
    b = spine.agg(F.min("hr").alias("h0"))
    per = F.array(
        F.struct(
            F.lit(24).cast("long").alias("p"),
            F.array(*[F.lit(v) for v in [1.0, 0.9659258262890683, 0.8660254037844387, 0.7071067811865476, 0.5000000000000001, 0.25881904510252074, 6.123233995736766e-17, -0.25881904510252063, -0.4999999999999998, -0.7071067811865475, -0.8660254037844387, -0.9659258262890682, -1.0, -0.9659258262890683, -0.8660254037844388, -0.7071067811865479, -0.5000000000000004, -0.25881904510252063, -1.8369701987210297e-16, 0.2588190451025203, 0.5000000000000001, 0.7071067811865474, 0.8660254037844384, 0.9659258262890681]]).alias("ct"),
            F.array(*[F.lit(v) for v in [0.0, 0.25881904510252074, 0.49999999999999994, 0.7071067811865475, 0.8660254037844386, 0.9659258262890683, 1.0, 0.9659258262890683, 0.8660254037844387, 0.7071067811865476, 0.49999999999999994, 0.258819045102521, 1.2246467991473532e-16, -0.2588190451025208, -0.4999999999999997, -0.7071067811865471, -0.8660254037844384, -0.9659258262890683, -1.0, -0.9659258262890684, -0.8660254037844386, -0.7071067811865477, -0.5000000000000004, -0.25881904510252157]]).alias("st"),
        ),
        F.struct(
            F.lit(12).cast("long").alias("p"),
            F.array(*[F.lit(v) for v in [1.0, 0.8660254037844387, 0.5000000000000001, 6.123233995736766e-17, -0.4999999999999998, -0.8660254037844387, -1.0, -0.8660254037844388, -0.5000000000000004, -1.8369701987210297e-16, 0.5000000000000001, 0.8660254037844384]]).alias("ct"),
            F.array(*[F.lit(v) for v in [0.0, 0.49999999999999994, 0.8660254037844386, 1.0, 0.8660254037844387, 0.49999999999999994, 1.2246467991473532e-16, -0.4999999999999997, -0.8660254037844384, -1.0, -0.8660254037844386, -0.5000000000000004]]).alias("st"),
        ),
        F.struct(
            F.lit(8).cast("long").alias("p"),
            F.array(*[F.lit(v) for v in [1.0, 0.7071067811865476, 6.123233995736766e-17, -0.7071067811865475, -1.0, -0.7071067811865477, -1.8369701987210297e-16, 0.7071067811865474]]).alias("ct"),
            F.array(*[F.lit(v) for v in [0.0, 0.7071067811865475, 1.0, 0.7071067811865476, 1.2246467991473532e-16, -0.7071067811865475, -1.0, -0.7071067811865477]]).alias("st"),
        ),
        F.struct(
            F.lit(6).cast("long").alias("p"),
            F.array(*[F.lit(v) for v in [1.0, 0.5000000000000001, -0.4999999999999998, -1.0, -0.5000000000000004, 0.5000000000000001]]).alias("ct"),
            F.array(*[F.lit(v) for v in [0.0, 0.8660254037844386, 0.8660254037844387, 1.2246467991473532e-16, -0.8660254037844384, -0.8660254037844386]]).alias("st"),
        ),
    )
    cells = (
        spine.crossJoin(F.broadcast(b))
        .select("hr", "n", "h0", F.explode(per).alias("x"))
        .select(
            F.col("x.p").alias("p"),
            F.floor(
                F.col("n")
                * F.element_at(
                    F.col("x.ct"),
                    ((F.col("hr") - F.col("h0")) % F.col("x.p")).cast("int") + 1,
                )
                * 1000000000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cq"),
            F.floor(
                F.col("n")
                * F.element_at(
                    F.col("x.st"),
                    ((F.col("hr") - F.col("h0")) % F.col("x.p")).cast("int") + 1,
                )
                * 1000000000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sq"),
        )
    )
    return cells.groupBy(F.col("p").alias("period_hours")).agg(
        F.sum("cq").cast("bigint").alias("c_nano"),
        F.sum("sq").cast("bigint").alias("s_nano"),
        F.round(
            F.pow(F.sum("cq") / 1000000000.0, 2)
            + F.pow(F.sum("sq") / 1000000000.0, 2),
            4,
        ).alias("power"),
    )

"""Catalyst-rule coverage for naive band predicates in spark.sql() STRINGS.

ops/autojoin.py closes the band-join ergonomic gap for the DataFrame
API, but a band predicate typed inside ``spark.sql("... JOIN ... ON
lo <= b.x - a.y AND ...")`` never passes through that Python walker —
it used to plan as BroadcastNestedLoopJoin with only a SCALE.md note.
SURVEY §4.3 deferred the honest fix ("needs a compiled Scala rule");
the Spark distribution in this environment ships
``scala-compiler-2.13.17.jar`` inside ``$SPARK_HOME/jars``, so the rule
IS buildable here — ext/src/SimSparkExtensions.scala compiles to
ext/simspark-ext.jar (committed, plus ext/build.sh to rebuild) and
provides two optimizer rules, installed into the session's
``spark.experimental.extraOptimizations`` ("User Provided Optimizers"
batch, applied to every subsequent plan including pure SQL strings):

* ``simspark.SqlBandJoinRewrite`` — inner joins whose condition is a
  bounded band over INTEGRAL, TIMESTAMP, DATE, or (r9) DOUBLE/FLOAT/
  DECIMAL attributes with no equi conjunct are replanned as
  bucket-explode + equi-join + exact refine with the ORIGINAL predicate
  (candidate superset — row-identical by construction; the same algebra
  as ops/autojoin.py, decimal(38,0) bucket arithmetic included).
  Timestamp and date axes reduce to the integral machinery through
  their exact epoch mappings (``unix_micros``/``unix_date``) for
  day-time (fixed-width) interval offsets; (r10) YEAR-MONTH interval
  offsets bucket on the exact month index (year*12+month — add_months
  lands exactly n indexes away, and the index is monotone), which also
  admits TIMESTAMP_NTZ axes (wall-clock month index, tz-free).
  Fractional axes (doubles, floats, decimals of ANY width — r10
  unfenced) bucket via double floor-division with a ±1 bucket margin
  whose ±2^50 bucket-id clamp keeps the quotient inside the 53-bit
  accuracy horizon at any magnitude, ops/autojoin.py's
  epsilon-tolerant path.
* ``simspark.NaiveBandJoinWarning`` — shapes the rewrite does not
  cover (month offsets mixed with nonzero day-time offsets on one
  pair, exotic arithmetic over attributes) log a loud warning naming
  auto_join/auto_asof and bump a counter. Both counters dedupe on the
  condition's canonicalized string under a bounded LRU (the optimizer
  re-runs extra rules in its fixed-point batch and under AQE), so they
  count distinct join conditions, not rule visits.

Installation is purely additive and opportunistic: the jar loads
through a child URLClassLoader of the live JVM (no session restart, no
classpath flags), and any failure — missing jar AND missing compiler,
Connect-only environment — returns False and leaves the session
untouched. Correctness never depends on the rule being installed: the
rewrite preserves semantics, so queries return identical rows either
way; only the PLAN differs (asserted in tests/test_plans.py, skipped
when the extension is unavailable).

Documented limitation (the honest fence SURVEY §4.3 asked to keep
visible, shrunk again in r10 — year-month intervals and wide decimals
now rewrite): a month offset mixed with a NONZERO day-time/day offset
on the same attribute pair has no common exact bucket unit and still
plans naively with a WARN; use the DataFrame API (auto_join) there.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import SparkSession

_EXT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "ext")
_JAR = os.path.join(_EXT_DIR, "simspark-ext.jar")

# app-id -> (installed?, diagnostics JavaObject or None)
_INSTALLED: dict[str, tuple[bool, object]] = {}


def _jar_stale() -> bool:
    """True when any .scala source under ext/src is newer than the
    committed jar — editing the rule source must trigger a rebuild, or
    the session silently runs stale compiled rules (r7 ADVICE)."""
    if not os.path.exists(_JAR):
        return True
    # 2 s slack: a fresh git checkout writes sources and the committed
    # jar at essentially the same instant in arbitrary order — a few-ms
    # "newer" source must not trigger a scalac rebuild (or a spurious
    # stale warning where the compiler is unavailable).
    jar_mtime = os.path.getmtime(_JAR) + 2.0
    src_dir = os.path.join(_EXT_DIR, "src")
    for root, _, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".scala") and os.path.getmtime(
                os.path.join(root, f)
            ) > jar_mtime:
                return True
    return False


def _build_jar() -> bool:
    """Rebuild ext/simspark-ext.jar with the scala-compiler jar shipped
    inside $SPARK_HOME/jars (no network, no extra installs)."""
    script = os.path.join(_EXT_DIR, "build.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(
            ["bash", script], check=True, capture_output=True, timeout=600
        )
    except Exception:
        return False
    return os.path.exists(_JAR)


def install_sql_band_extension(spark: SparkSession) -> bool:
    """Install the band-rewrite + warning rules into this session's
    optimizer. Idempotent per session; returns False (leaving the
    session untouched) when the jar is unavailable and unbuildable or
    the JVM internals are unreachable (Spark Connect)."""
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        return False  # Connect: no JVM gateway — documented fence
    cached = _INSTALLED.get(app_id)
    if cached is not None:
        return cached[0]
    ok = False
    diag = None
    try:
        if _jar_stale() and not _build_jar():
            if not os.path.exists(_JAR):
                raise FileNotFoundError(_JAR)
            import warnings

            warnings.warn(
                "ext/src is newer than ext/simspark-ext.jar and the "
                "rebuild failed — running the STALE compiled rules",
                stacklevel=2,
            )
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        url = jvm.java.io.File(_JAR).toURI().toURL()
        arr = gw.new_array(jvm.java.net.URL, 1)
        arr[0] = url
        # Child loader of the Spark classloader: Rule/LogicalPlan parents
        # resolve from Spark's own jars, our classes from the ext jar.
        loader = jvm.java.net.URLClassLoader(
            arr, jvm.Thread.currentThread().getContextClassLoader()
        )
        install = loader.loadClass("simspark.Install$").getField("MODULE$").get(None)
        install.apply(spark._jsparkSession)
        diag = (
            loader.loadClass("simspark.BandDiagnostics$")
            .getField("MODULE$")
            .get(None)
        )
        ok = True
    except Exception:
        ok = False
    _INSTALLED[app_id] = (ok, diag)
    return ok


def diagnostics(spark: SparkSession) -> dict[str, int] | None:
    """Counters from the installed rules (None if not installed):
    ``rewrites`` = band joins replanned, ``warnings`` = naive non-equi
    joins the rewrite could not cover."""
    cached = _INSTALLED.get(spark.sparkContext.applicationId)
    if not cached or not cached[0]:
        return None
    diag = cached[1]
    return {"rewrites": int(diag.rewrites()), "warnings": int(diag.warnings())}

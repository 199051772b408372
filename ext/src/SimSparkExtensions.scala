// Compiled Catalyst extension closing SURVEY.md §4.3's deferred item:
// DataFrame calls get the band-bucket rewrite from sim_spark.ops.autojoin
// (Python Column-tree walker), but a naive band predicate inside a
// spark.sql(...) STRING never passes through that API and planned as
// BroadcastNestedLoopJoin. These optimizer rules run inside Catalyst
// itself (installed via spark.experimental.extraOptimizations — the
// "User Provided Optimizers" batch), so SQL strings are covered too:
//
//  * SqlBandJoinRewrite — inner joins whose condition is a bounded band
//    over INTEGRAL, TIMESTAMP, or DATE attributes (lo <= r.x - l.y <= hi,
//    written as any conjunction of two attr±literal inequalities; for
//    timestamps the offsets are day-time INTERVAL literals, for dates
//    date_add/date_sub day counts) with no equi conjunct are replanned
//    as bucket-explode + equi-join + exact refine with the ORIGINAL
//    predicate (candidate superset — row-identical by construction,
//    mirroring ops/autojoin.py's algebra). Timestamp/date axes reduce to
//    the integral machinery through their exact epoch mappings
//    (unix_micros / unix_date), so one decimal(38,0) bucket arithmetic
//    serves all three.
//  * NaiveBandJoinWarning — any remaining non-equi cross-side
//    comparison join (double axes, exotic arithmetic, year-month
//    intervals — NOT fixed-width) logs a loud warning naming auto_join,
//    and bumps a counter tests can read.
//
// Scope (documented, honest): double axes and year-month (variable
// length) intervals still warn rather than rewrite; the DataFrame-side
// auto_join covers doubles with per-unit offset typing.
//
// Counter semantics: the optimizer applies extraOptimizations inside a
// fixed-point batch and re-runs them on AQE re-optimization, so a naive
// per-visit increment over-counts (r7 ADVICE). BandDiagnostics therefore
// dedupes on the condition's semanticHash — one count per distinct join
// condition instance (new spark.sql() calls mint new ExprIds and count
// again, which is correct: they ARE new queries).
package simspark

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

object BandDiagnostics {
  @volatile var naiveBandWarnings: Long = 0L
  @volatile var bandRewrites: Long = 0L
  // Dedupe sets: fixed-point batches and AQE re-optimization re-visit the
  // same condition; count each distinct condition once. Keys are the full
  // canonicalized-condition strings (collision-free — a 32-bit hash key
  // could silently suppress a genuinely new query); bounded so a
  // long-lived session can never leak (clear-when-full is fine: worst
  // case a recount, never a miss). mark() is synchronized: the increment
  // is a read-modify-write and optimizer invocations can be concurrent.
  private val seenWarnings =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val seenRewrites =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val MaxSeen = 8192

  // callers hold the object monitor
  private def mark(set: java.util.Set[String], k: String): Boolean = {
    if (set.size > MaxSeen) set.clear()
    set.add(k)
  }
  def markRewrite(k: String): Boolean = synchronized {
    val fresh = mark(seenRewrites, k)
    if (fresh) bandRewrites += 1
    fresh
  }
  def markWarning(k: String): Boolean = synchronized {
    val fresh = mark(seenWarnings, k)
    if (fresh) naiveBandWarnings += 1
    fresh
  }
  def reset(): Unit = synchronized {
    naiveBandWarnings = 0L; bandRewrites = 0L
    seenWarnings.clear(); seenRewrites.clear()
  }
  def warnings: Long = naiveBandWarnings
  def rewrites: Long = bandRewrites
}

/** Shared predicate algebra for both rules (mirror of ops/autojoin.py).
  *
  * Axis kinds: 'i' = integral (bucket on the value), 't' = timestamp
  * (bucket on unix_micros, offsets in microseconds), 'd' = date (bucket
  * on unix_date, offsets in days). Each is an EXACT integral mapping, so
  * the bucket arithmetic is identical across kinds.
  */
trait BandAlgebra extends PredicateHelper {
  private val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  protected def attrSide(
      a: Attribute, left: LogicalPlan, right: LogicalPlan): Option[Char] =
    if (left.outputSet.contains(a)) Some('l')
    else if (right.outputSet.contains(a)) Some('r')
    else None

  /** attr ± fixed-width literal → (attr, offset-in-axis-units, kind). */
  protected def parseSide(
      e: Expression): Option[(AttributeReference, Long, Char)] = e match {
    case a: AttributeReference if integral.contains(a.dataType) =>
      Some((a, 0L, 'i'))
    case a: AttributeReference if a.dataType == TimestampType =>
      Some((a, 0L, 't'))
    case a: AttributeReference if a.dataType == DateType =>
      Some((a, 0L, 'd'))
    case Add(a: AttributeReference, Literal(v, t), _) if integral.contains(t) =>
      Some((a, lit2long(v, t), 'i'))
    case Add(Literal(v, t), a: AttributeReference, _) if integral.contains(t) =>
      Some((a, lit2long(v, t), 'i'))
    case Subtract(a: AttributeReference, Literal(v, t), _) if integral.contains(t) =>
      Some((a, -lit2long(v, t), 'i'))
    // ts ± INTERVAL '…' (day-time): the analyzer folds both signs into
    // TimestampAddInterval(attr, literal-micros). Year-month intervals
    // are variable-width — deliberately NOT matched (fall to warning).
    case t: TimestampAddInterval =>
      (t.children(0), t.children(1)) match {
        case (a: AttributeReference, Literal(v: Long, _: DayTimeIntervalType))
            if a.dataType == TimestampType =>
          Some((a, v, 't'))
        case _ => None
      }
    // date_add / date_sub with a literal day count.
    case DateAdd(a: AttributeReference, Literal(v, t)) if integral.contains(t) =>
      Some((a, lit2long(v, t), 'd'))
    case DateSub(a: AttributeReference, Literal(v, t)) if integral.contains(t) =>
      Some((a, -lit2long(v, t), 'd'))
    case _ => None
  }

  private def lit2long(v: Any, t: DataType): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalStateException(s"non-integral literal $other: $t")
  }

  /** Bare-attribute equi conjunct across the two sides? */
  protected def isEqui(c: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = c match {
    case EqualTo(a: Attribute, b: Attribute) =>
      (attrSide(a, l, r), attrSide(b, l, r)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    case _ => false
  }

  /** One conjunct → Some((lAttr, rAttr, kind, isLower, delta)): the bound
    * `r - l >= delta` (isLower) or `r - l <= delta` in axis units, with
    * strictness widened away (the refine re-applies the original
    * predicate). Both sides must live on the same axis kind. */
  protected def classifyBound(
      c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(AttributeReference, AttributeReference, Char, Boolean, Long)] = {
    val (a, b, op) = c match {
      case GreaterThanOrEqual(x, y) => (x, y, ">=")
      case GreaterThan(x, y) => (x, y, ">=") // widen: superset only
      case LessThanOrEqual(x, y) => (x, y, "<=")
      case LessThan(x, y) => (x, y, "<=")
      case _ => return None
    }
    for {
      (attrA, offA, kindA) <- parseSide(a)
      (attrB, offB, kindB) <- parseSide(b)
      if kindA == kindB
      sa <- attrSide(attrA, l, r)
      sb <- attrSide(attrB, l, r)
      if sa != sb
    } yield {
      // normalize so the RIGHT-plan attr is on the comparison's left
      val (lt, rt, normOp) =
        if (sa == 'l') ((attrA, offA), (attrB, offB), if (op == ">=") "<=" else ">=")
        else ((attrB, offB), (attrA, offA), op)
      // rt.attr + rt.off (op) lt.attr + lt.off  =>  r - l (op) delta
      val delta = lt._2 - rt._2
      (lt._1, rt._1, kindA, normOp == ">=", delta)
    }
  }
}

/** Replan `SELECT ... FROM a JOIN b ON lo <= b.x - a.y <= hi` (no equi
  * conjunct; integral, timestamp, or date axes) as bucket-explode
  * equi-join + exact refine. */
class SqlBandJoinRewrite extends Rule[LogicalPlan] with BandAlgebra {
  private val BUCKET = "__sql_band_bucket"

  private def dec(x: Long): Literal = Literal(Decimal(x), DecimalType(38, 0))
  private def toDec(e: Expression): Expression = Cast(e, DecimalType(38, 0))

  /** The exact integral image of the axis attribute, per kind. */
  private def axisExpr(a: AttributeReference, kind: Char): Expression =
    kind match {
      case 'i' => toDec(a)
      case 't' => toDec(UnixMicros(a)) // exact epoch micros
      case 'd' => toDec(UnixDate(a))   // exact epoch days
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name.startsWith(BUCKET)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEqui(_, left, right))) j
      else {
        // accumulate lo/hi per (lAttr, rAttr) pair, exactly like the
        // Python walker: max of lower bounds, min of upper bounds.
        // Axis kind is determined by the attrs' datatypes, so conjuncts
        // over the same pair always agree on it.
        val bounds = scala.collection.mutable.LinkedHashMap
          .empty[(ExprId, ExprId), (AttributeReference, AttributeReference,
            Char, Option[Long], Option[Long])]
        conjuncts.foreach { c =>
          classifyBound(c, left, right).foreach {
            case (la, ra, kind, isLower, d) =>
              val k = (la.exprId, ra.exprId)
              val (_, _, _, lo, hi) =
                bounds.getOrElse(k, (la, ra, kind, None, None))
              val nlo = if (isLower) Some(lo.fold(d)(math.max(_, d))) else lo
              val nhi = if (!isLower) Some(hi.fold(d)(math.min(_, d))) else hi
              bounds(k) = (la, ra, kind, nlo, nhi)
          }
        }
        bounds.values.collectFirst {
          // hi - lo >= 0 guards Long overflow on pathological bounds
          case (la, ra, kind, Some(lo), Some(hi)) if hi >= lo && hi - lo >= 0 =>
            (la, ra, kind, lo, hi)
        } match {
          case None => j
          case Some((lAttr, rAttr, kind, lo, hi)) =>
            val w = math.max(hi - lo, 1L)
            // left: explode the covered bucket range (±1 margin is
            // unnecessary on exact integer axes but harmless; omit to
            // keep fanout at most ceil((hi-lo)/w)+1 = 2)
            val lAxis = axisExpr(lAttr, kind)
            val lob = IntegralDivide(Add(lAxis, dec(lo)), dec(w))
            val hib = IntegralDivide(Add(lAxis, dec(hi)), dec(w))
            // Sequence is TimeZoneAwareExpression: without an explicit
            // timeZoneId it reports unresolved and fails plan validation
            val seq = new Sequence(
              lob, hib, Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            val seqType = seq.dataType.asInstanceOf[ArrayType]
            val bucketL = AttributeReference(
              BUCKET + "_l", LongType, nullable = seqType.containsNull)()
            val gen = Generate(
              Explode(seq), Nil, outer = false, None, Seq(bucketL), left)
            val rAlias = Alias(
              IntegralDivide(axisExpr(rAttr, kind), dec(w)), BUCKET + "_r")()
            val proj = Project(right.output :+ rAlias, right)
            val newJoin = Join(
              gen, proj, Inner,
              Some(And(EqualTo(bucketL, rAlias.toAttribute), cond)), hint)
            if (BandDiagnostics.markRewrite(cond.canonicalized.toString)) {
              logInfo(s"sim_spark: rewrote naive band join on " +
                s"(${lAttr.name}, ${rAttr.name}) [kind=$kind lo=$lo hi=$hi] " +
                "to bucket-equi + refine")
            }
            Project(j.output, newJoin)
        }
      }
  }
}

/** Loud fence for the shapes the rewrite does not cover: an inner join
  * whose only cross-side conjuncts are non-equi comparisons will plan
  * as BNLJ/cartesian — tell the user about auto_join. */
class NaiveBandJoinWarning extends Rule[LogicalPlan] with BandAlgebra with Logging {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !j.output.exists(_.name.startsWith("__sql_band_bucket")) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists(isEqui(_, left, right))
        val crossCmp = conjuncts.exists {
          case c: BinaryComparison =>
            val sides = c.references.toSeq.flatMap(a =>
              attrSide(a.asInstanceOf[Attribute], left, right))
            sides.contains('l') && sides.contains('r')
          case _ => false
        }
        if (!hasEqui && crossCmp &&
            BandDiagnostics.markWarning(cond.canonicalized.toString)) {
          logWarning(
            "sim_spark: inner join with a non-equi cross-side predicate " +
              s"(${cond.sql}) will plan as BroadcastNestedLoopJoin/" +
              "CartesianProduct. For bounded bands use " +
              "sim_spark.ops.autojoin.auto_join (DataFrame API) or an " +
              "integral/timestamp/date-axis band in SQL (rewritten " +
              "automatically); as-of shapes: " +
              "sim_spark.ops.autojoin.auto_asof.")
        }
      case _ =>
    }
    plan
  }
}

/** Installer called from Python (sim_spark.ops.sqlband) — builds the
  * Scala Seq JVM-side so py4j never has to. Idempotent per session. */
object Install {
  def apply(spark: org.apache.spark.sql.classic.SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[SqlBandJoinRewrite])) {
      spark.experimental.extraOptimizations =
        existing ++ Seq(new SqlBandJoinRewrite, new NaiveBandJoinWarning)
    }
  }
}

package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => WindowNode}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ArrayAgreeCount, BpeTokenCount, DotProduct,
  FingerprintNorm, JaroWinkler, KmvSketch, Md5Hash60, MinHashSketch,
  NgramHash60, SortedIntersectSize}

/** Advisory lint (SURVEY.md §4): a `Window` with an empty partition
  * spec serializes its whole input onto one task — correct, and fine
  * when the input is a calendar-grain aggregate (≤ a few thousand
  * rows), catastrophic when someone orders 100 TB of raw facts.
  *
  * The rule rewrites nothing: it flags global windows whose child is
  * *not* an aggregation (the only shape where the input is provably
  * pre-reduced in this engine) so the pattern is visible in logs and
  * assertable in tests.
  */
object GlobalWindowLint extends Rule[LogicalPlan] {
  /** Flagged plan fragments (test/observability hook). */
  val flagged = new ConcurrentLinkedQueue[String]()

  private def isPreReduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    // a cached frame hides its lineage behind an InMemoryRelation
    // leaf; walk the cached PHYSICAL plan for an aggregate exec (the
    // S5 session cache memoizes exactly such pre-reduced frames)
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      physPreReduced(imr.cachedPlan)
    // joins/unions of pre-reduced inputs stay pre-reduced (raw facts
    // cannot reach the window without passing through an aggregate on
    // EVERY branch) — e.g. the gap-fill spine ⟕ gapped-series join,
    // both sides derived from the month-grain aggregate
    case other if other.children.nonEmpty =>
      other.children.forall(isPreReduced)
    case _ => false
  }

  /** True iff the physical tree contains an aggregate exec. Under AQE
    * the cached plan is an `AdaptiveSparkPlanExec` LEAF (a plain tree
    * collect sees nothing below it) and stage reuse wraps subtrees in
    * `QueryStageExec` leaves — recurse through both explicitly, and
    * through nested caches (`InMemoryTableScanExec`). A typed walk,
    * not a `toString` match: any plan whose rendering merely mentions
    * "Aggregate" (field names, expression ids) must not pass. */
  private def physPreReduced(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      physPreReduced(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      physPreReduced(q.plan)
    case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      physPreReduced(t.relation.cachedPlan)
    case other => other.children.exists(physPreReduced)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: WindowNode if w.partitionSpec.isEmpty && !isPreReduced(w.child) =>
        val msg = s"global window over non-aggregated input: " +
          s"${w.windowExpressions.map(_.sql).mkString(", ")}"
        flagged.add(msg)
        logWarning(s"[graft-lint] $msg — single-task execution; " +
          "partition the window or pre-aggregate its input")
      case _ =>
    }
    plan
  }
}

/** Session extension wiring: the lint rule plus SQL registration of
  * the engine's native expressions, so
  * `spark.sql("SELECT sorted_intersect_size(a, b) ...")` works.
  * Activate via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GlobalWindowLint)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("array_agree_count"),
      new ExpressionInfo(classOf[ArrayAgreeCount].getName,
        "array_agree_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayAgreeCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Hash60(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("fingerprint_norm"),
      new ExpressionInfo(classOf[FingerprintNorm].getName, "fingerprint_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FingerprintNorm(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeTokenCount(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("ngram_hash60"),
      new ExpressionInfo(classOf[NgramHash60].getName, "ngram_hash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val n = exprs.lift(1)
          .filter(_.foldable).map(_.eval()).collect {
            case i: Int => i
            case l: Long => l.toInt
          }.getOrElse(throw new IllegalArgumentException(
            "ngram_hash60(toks, n): n must be an integer literal"))
        NgramHash60(exprs(0), n)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val k = exprs.lift(1)
          .filter(_.foldable).map(_.eval()).collect {
            case i: Int => i
            case l: Long => l.toInt
          }.getOrElse(throw new IllegalArgumentException(
            "kmv_sketch(v, k): k must be an integer literal"))
        KmvSketch(exprs(0), k).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // numPerms must be a foldable non-null integral literal; fail
        // with a sensible message rather than a raw cast/NPE
        val n = exprs.lift(1)
          .filter(_.foldable).map(_.eval()).collect {
            case i: Int => i
            case l: Long => l.toInt
          }.getOrElse(throw new IllegalArgumentException(
            "minhash_sketch(tok, numPerms): numPerms must be an integer literal"))
        MinHashSketch(exprs(0), n).toAggregateExpression()
      }))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native Catalyst expression with
  * whole-stage codegen — the verify predicate of the fuzzy
  * record-linkage dedup ([[graft.ext.Dedup.fuzzyPairs]]).
  *
  * Spark ships `levenshtein` but no Jaro–Winkler; a Scala UDF would
  * break whole-stage codegen on the hot candidate-pair path (the
  * repo-wide zero-UDF discipline, SURVEY.md §2.10). Codegen emits one
  * static call — the same shape as Spark's own `Levenshtein`, which
  * generates `a.levenshteinDistance(b)`.
  *
  * Semantics are pinned to the classic Winkler variant so the DuckDB
  * oracle (`jaro_winkler_similarity`) reproduces it bit-for-bit
  * (probed empirically against DuckDB, see FuzzyDedupSpec):
  *   - byte-level comparison over the UTF-8 encoding (DuckDB compares
  *     raw string bytes: jw('éa','ea') = 0, not the codepoint answer);
  *   - match window `max(0, floor(max(|a|,|b|)/2) - 1)`;
  *   - transpositions counted half with the odd case FLOORED
  *     (`t = ⌊raw/2⌋` — DuckDB integer-divides; probed on an odd-raw
  *     pair), `jaro = (m/|a| + m/|b| + (m-t)/m)/3`;
  *   - zero matches or an empty side → 0.0 (DuckDB: jw('','') = 0);
  *   - prefix boost `jaro + l·0.1·(1-jaro)` with `l ≤ 4` common
  *     leading bytes, applied only when `jaro > 0.7` (probed: DuckDB
  *     leaves jaro = 2/3 unboosted).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala emits a static forwarder for the companion method on the
    // class, so generated Java calls it like any static — one
    // invocation, no boxing, expression stays inside the codegen span.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShims.column(JaroWinkler(
      GraftShims.expression(a), GraftShims.expression(b)))

  private final val WinklerP = 0.1
  private final val MaxPrefix = 4
  private final val BoostThreshold = 0.7

  /** Byte-level Jaro–Winkler over the UTF-8 encodings. Allocates two
    * boolean scratch arrays per call (lengths are the capped blocking
    * keys, ≤ a few dozen bytes — the arrays stay in the TLAB). */
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0

    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)

    // pass 1: greedy left-to-right matching within the window
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // pass 2: transpositions = matched bytes out of order, halved
    var transp = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) transp += 1
        k += 1
      }
      i += 1
    }
    // FLOOR of the half-count (integer division), not transp/2.0:
    // DuckDB floors the odd case (probed: jaro('abcdef','bcadef') =
    // 0.9444 = t=1, where the classic t=1.5 would give 0.9167) —
    // surfaced by a 306-vs-305-row sf0.1 mismatch on 40-char keys
    // with odd raw transposition counts
    val t = (transp / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= BoostThreshold) return jaro

    var prefix = 0
    val maxP = math.min(MaxPrefix, math.min(la, lb))
    while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * WinklerP * (1.0 - jaro)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` for two **ascending-sorted** int or long arrays, as a
  * native Catalyst expression with whole-stage codegen.
  *
  * The built-in `array_intersect` materializes a hash set per row
  * (boxed elements, allocation per call) — measured ~25 µs/row on the
  * similarity-join verify path, which made exact-Jaccard verification
  * the single hottest stage of the whole bench (230 s of 396 s at
  * sf0.1). This expression is a zero-allocation two-pointer merge
  * scan (~0.1 µs/row): the caller guarantees sortedness (we produce
  * the inputs with `sort_array`), so intersection needs no hashing at
  * all.
  *
  * Null semantics follow `array_intersect`: null input → null out;
  * array *elements* must be non-null (enforced upstream — the arrays
  * come from `collect_list`, which never emits null elements).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(IntegerType, LongType).exists(et =>
      Seq(left, right).forall(_.dataType match {
        case ArrayType(`et`, _) => true
        case _ => false
      }))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two array<int> or two array<bigint> " +
        s"inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0; var j = 0; var c = 0
    if (isLong) {
      while (i < n1 && j < n2) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    } else {
      while (i < n1 && j < n2) {
        val xi = x.getInt(i); val yj = y.getInt(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val (jt, getter) = if (isLong) ("long", "getLong") else ("int", "getInt")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n1 = $a.numElements();
         |final int $n2 = $b.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  final $jt $x = $a.$getter($i);
         |  final $jt $y = $b.$getter($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-API entry point. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectSize(
      GraftShims.expression(a), GraftShims.expression(b)))
}

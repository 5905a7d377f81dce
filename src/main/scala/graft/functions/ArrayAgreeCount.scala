package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Number of positions where two equal-length arrays hold the same
  * value — the MinHash signature-agreement kernel (estimated Jaccard
  * = agree / numPerms).
  *
  * The `zip_with(..., ==)` + `filter` + `size` composition allocates
  * two intermediate arrays per row; over millions of candidate pairs
  * that was ~50 µs/row and dominated the LSH stage. This is the same
  * loop as a single codegen'd expression: no allocation, primitive
  * comparisons only. Supports int and long element types.
  */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val elemLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
      case _ => false
    }) && left.dataType == right.dataType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_agree_count requires two array<int> or two array<bigint>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    if (elemLong) {
      while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    } else {
      while (i < n) { if (x.getInt(i) == y.getInt(i)) c += 1; i += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val getter = if (elemLong) "getLong" else "getInt"
      s"""
         |int $c = 0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.$getter($i) == $b.$getter($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAgreeCount =
    copy(left = newLeft, right = newRight)
}

object ArrayAgreeCount {
  def arrayAgreeCount(a: Column, b: Column): Column =
    GraftShims.column(ArrayAgreeCount(
      GraftShims.expression(a), GraftShims.expression(b)))
}

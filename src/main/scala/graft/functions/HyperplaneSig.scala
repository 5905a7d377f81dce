package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Multi-bit hyperplane LSH signature of an `array<double>` vector as
  * ONE native Catalyst expression: bit `j` of the result is
  * `sign(v · planes(j)) > 0`, for a CONSTANT plane matrix embedded as
  * a reference object.
  *
  * Why not the composed form (`when(dot_product(v, lit(plane_j)) > 0,
  * 1L << j)` summed over j)? At the population-scaled signature width
  * the bucket builder needs tables × bits(n) such terms — 112 at 100×
  * bench scale — and a Project/Generate carrying 112 inlined
  * 64-element literal dots exceeds whole-stage codegen's method
  * limits, so Spark silently evaluates the WHOLE stage interpreted:
  * the r10 profile measured the `sim_topk_lsh_ann` candidate pipeline
  * at 78 s of 500 k-row interpreted expression evaluation where this
  * loop form runs it in ~2 s. One expression per TABLE keeps the
  * generated code a compact pair of nested loops at any width.
  *
  * Arithmetic is bit-identical to the composed form it replaces: each
  * plane's dot accumulates STRICTLY left-to-right (the
  * [[DotProduct]]/`list_dot_product` fold order), the bit test is the
  * same `> 0` on the same double, and the quirky null algebra is
  * preserved — a null/mismatched/null-element dot contributed 0 to
  * the `when` sum, never null, so the signature is non-nullable and a
  * null input vector signs to 0L. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires array<double>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      if (n == p.length) {
        var acc = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (v.isNullAt(i)) ok = false
          else { acc += v.getDouble(i) * p(i); i += 1 }
        }
        if (ok && acc > 0) sig |= 1L << j
      }
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    val c = child.genCode(ctx)
    val v = c.value
    val sig = ctx.freshName("sig")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val p = ctx.freshName("p")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    ev.copy(
      code = code"""
        ${c.code}
        long $sig = 0L;
        if (!${c.isNull}) {
          final int $n = $v.numElements();
          for (int $j = 0; $j < $ref.length; $j++) {
            final double[] $p = $ref[$j];
            if ($n == $p.length) {
              double $acc = 0.0;
              boolean $ok = true;
              for (int $i = 0; $ok && $i < $n; $i++) {
                if ($v.isNullAt($i)) { $ok = false; }
                else { $acc += $v.getDouble($i) * $p[$i]; }
              }
              if ($ok && $acc > 0) { $sig |= 1L << $j; }
            }
          }
        }""",
      isNull = FalseLiteral,
      value = JavaCode.variable(sig, LongType))
  }

  // Array[Array[Double]]'s equals/hashCode are reference-based, which
  // would make semantically identical instances never compare equal —
  // Catalyst canonicalization and common-subexpression elimination
  // could not dedup them. Deep content comparison restores that.
  override def equals(other: Any): Boolean = other match {
    case HyperplaneSig(c, p) => c == child &&
      p.length == planes.length &&
      p.indices.forall(j => java.util.Arrays.equals(p(j), planes(j)))
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + planes.map(java.util.Arrays.hashCode).toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column-API entry point: `planes(j)` decides bit `j`. */
  def hyperplaneSig(v: Column, planes: Array[Array[Double]]): Column =
    GraftShims.column(HyperplaneSig(GraftShims.expression(v), planes))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit keyed hashes of every `n`-token shingle of a token array,
  * as ONE native expression — the candidate-key generator of the
  * n-gram decontamination join ([[graft.ext.Curation.decontaminate]]).
  *
  * Replaces the per-element composition
  * `transform(sequence(...), i => conv(substring(md5(concat_ws(" ",
  * slice(t, i, n)) ...)` — higher-order lambdas run interpreted, and
  * the md5 → hex-string → base-16 `conv` chain pays a fresh
  * MessageDigest, a 32-char hex render, and a radix parse PER SHINGLE
  * (the [[KmvSketch]] doc's measurement: ~4× the surrounding
  * operator's runtime). Here each shingle streams its token bytes
  * straight into one thread-local digest (single space separator —
  * byte-identical to `concat_ws(" ", ...)` in UTF-8) and the top 60
  * bits of the raw digest are taken arithmetically — the exact value
  * of `CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)`, so the
  * DuckDB oracle replays it unchanged.
  *
  * Fewer than `n` tokens → empty array (the SQL chain's guarded
  * `otherwise(array())` branch, folded in). Null array → null.
  */
case class NgramHash60(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash60 requires array<string>, got ${other.catalogString}")
  }

  override def prettyName: String = "ngram_hash60"

  override def nullSafeEval(a: Any): Any =
    NgramHash60.hashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NgramHash60.hashes($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHash60 =
    copy(child = newChild)
}

object NgramHash60 {

  /** Column-API entry point. */
  def ngramHash60(tokens: Column, n: Int): Column =
    GraftShims.column(NgramHash60(GraftShims.expression(tokens), n))

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.emptyLongArray)
    // decode each token's bytes once, reuse across the n shingles
    // that contain it
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = localMd.get()
    val hs = new Array[Long](out)
    var s = 0
    while (s < out) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(bytes(s + j))
        j += 1
      }
      val d = md.digest()
      hs(s) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      s += 1
    }
    new GenericArrayData(hs)
  }
}

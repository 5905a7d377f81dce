package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's cross-engine 60-bit keyed hash —
  * `conv(substring(md5(x), 1, 15), 16, 10)` — as ONE native
  * expression: top 60 bits of the raw md5 digest, no 32-char hex
  * render, no radix-parse round-trip, digest object reused per
  * thread. The composed chain costs ~2 µs per value (md5's hex
  * string + `conv`'s parse dominate, the [[KmvSketch]] doc's
  * measurement); this is ~4× cheaper and stays inside whole-stage
  * codegen as a single static call.
  *
  * Bit-identical to the chain (and so to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`): the first
  * 15 hex digits of the digest ARE its top 60 bits. Accepts string
  * (hashes the UTF-8 bytes — what `cast("binary")` feeds the chain)
  * or binary input.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 requires string or binary, got ${other.catalogString}")
  }

  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Md5Hash60.hash(s.getBytes)
    case b: Array[Byte] => Md5Hash60.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, s => s"graft.functions.Md5Hash60.hash($s.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, s => s"graft.functions.Md5Hash60.hash($s)")
    }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  /** Column-API entry point. */
  def md5Hash60(c: Column): Column =
    GraftShims.column(Md5Hash60(GraftShims.expression(c)))

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}

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

  def hash(bytes: Array[Byte]): Long = hash(bytes, 0, bytes.length)

  /** Top 60 bits of md5(bytes[off, off+len)). Inputs ≤ 55 bytes fit
    * ONE padded MD5 block (RFC 1321: data ∥ 0x80 ∥ zeros ∥ 64-bit bit
    * length), so the single-block path below computes the digest
    * inline — no MessageDigest engine indirection, no padding-buffer
    * copies, no per-call allocation. Most of the repo's seeded hashes
    * ("jcms:…", "kmv:…", shingle/band seeds over short tokens) are
    * under the cutoff; longer inputs delegate to MessageDigest.
    * Bit-identical by construction on both paths ([[Md5Spec]] fuzzes
    * the equivalence across the boundary). */
  def hash(bytes: Array[Byte], off: Int, len: Int): Long = {
    if (len <= 55) return singleBlock(bytes, off, len)
    val md = localMd.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  // RFC 1321 round constants: floor(|sin(i+1)| · 2^32)
  private val K: Array[Int] = Array.tabulate(64)(i =>
    ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xffffffffL).toInt)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)
  private val localBlock = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  private def singleBlock(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = localBlock.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // bit length (< 2^9), high word m(15) stays 0
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(i))
      a = tmp
      i += 1
    }
    a += 0x67452301
    b += 0xefcdab89
    // digest bytes 0-7 are little-endian(a0) ∥ little-endian(b0);
    // h is their big-endian reading, top 60 bits
    ((Integer.reverseBytes(a).toLong << 32) |
      (Integer.reverseBytes(b).toLong & 0xffffffffL)) >>> 4
  }
}

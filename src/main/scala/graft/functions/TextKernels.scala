package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass byte kernels for the two regex hot loops of the
  * per-document text family. Java's regex engine costs ~80 ns/char on
  * a delete-char-class replace (measured on the corpus: the
  * `[^a-z0-9 ]` normalize pass alone was ~2.4 s of a 4.8 s query at
  * 10× bench scale — the entire remaining data path of
  * `text_fingerprint`); a fused byte loop does the same work at
  * ~1 ns/char and keeps the projection inside whole-stage codegen.
  * Same discipline as [[JaroWinkler]]: a native expression, not a
  * UDF, with codegen emitting one static call.
  */
object TextKernels {

  /** Column-API: fused equivalent of
    * `trim(regexp_replace(regexp_replace(S, "[^a-z0-9 ]", ""), "\\s+", " "))`
    * — delete every code point outside `[a-z0-9 ]`, collapse space
    * runs, trim. Callers pass an already-`lower()`ed column: Unicode
    * one-to-many lowercase mappings (İ → i + U+0307) must happen
    * BEFORE the class filter for the chain to be reproduced exactly;
    * after `lower()` the kernel is byte-equal to the regex chain on
    * ANY input (the kept set is pure ASCII, so deleting a non-ASCII
    * code point and deleting each of its UTF-8 bytes are the same
    * operation; the only whitespace that can survive the class filter
    * is 0x20). ASCII `A-Z` fold inside the kernel is a no-op on
    * lowered input, kept as a guard. */
  def fingerprintNorm(text: Column): Column =
    GraftShims.column(FingerprintNorm(GraftShims.expression(text)))

  /** Column-API: fused equivalent of
    * `size(regexp_extract_all(S, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+", 0))`
    * — the BPE-ish token count. The regex's non-overlapping
    * left-to-right matches are exactly the maximal runs of a 3-way
    * char classification (letter run / digit run / other-non-space
    * run, whitespace = Java `\s` = ASCII `[ \t\n\x0B\f\r]` breaking
    * runs), so counting class-run starts in one byte pass reproduces
    * the count without materializing the match array. UTF-8
    * continuation/lead bytes (≥ 0x80) classify as "other" — adjacent
    * non-ASCII code points merge into one run exactly as the char
    * regex merges them into one `[^A-Za-z0-9\s]+` match. */
  def bpeTokenCount(text: Column): Column =
    GraftShims.column(BpeTokenCount(GraftShims.expression(text)))

  /** Byte-level normalize: ASCII-fold A-Z, keep `[a-z0-9]`, collapse
    * runs of kept 0x20 to one space, drop everything else, trim. */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = in(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b; o += 1
        pendingSpace = false
      } else if (b == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Byte-level BPE-ish run count. Classes: 1 = letter, 2 = digit,
    * 3 = other (incl. any byte ≥ 0x80), 0 = ASCII whitespace. */
  def bpeCount(s: UTF8String): Int = {
    val in = s.getBytes
    val n = in.length
    var count = 0
    var prev = 0
    var i = 0
    while (i < n) {
      val b = in(i)
      val cls =
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) 1
        else if (b >= '0' && b <= '9') 2
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') 0
        else 3
      if (cls != 0 && cls != prev) count += 1
      prev = cls
      i += 1
    }
    count
  }
}

/** See [[TextKernels.fingerprintNorm]]. */
case class FingerprintNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint_norm requires string, got ${child.dataType.catalogString}")

  override def prettyName: String = "fingerprint_norm"

  override def nullSafeEval(s: Any): Any =
    TextKernels.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintNorm =
    copy(child = newChild)
}

/** See [[TextKernels.bpeTokenCount]]. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires string, got ${child.dataType.catalogString}")

  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(s: Any): Any =
    TextKernels.bpeCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.bpeCount($s)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

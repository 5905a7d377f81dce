package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass K-Minimum-Values distinct-count sketch (Bar-Yossef et al.
  * 2002): keep the `k` smallest DISTINCT hash values seen; with a
  * uniform hash over `[0, 2^60)`, the k-th smallest value `h_k`
  * estimates the distinct count as `(k−1) · 2^60 / h_k` (rsd ≈
  * 1/√(k−2)); when fewer than `k` distinct hashes exist the sketch
  * holds ALL of them and the "estimate" is exact.
  *
  * Why this next to `approx_count_distinct`: HLL++ register contents
  * are engine-internal, so an HLL estimate can never hash-match a
  * DuckDB oracle — the repo's sketch queries certify it in-plan
  * against the exact count instead, which forces the exact distinct
  * aggregate (an Expand + full-width shuffle) into the same plan.
  * KMV over the repo's keyed 60-bit md5 hashes is DETERMINISTIC and
  * engine-replayable: DuckDB computes the identical k smallest
  * distinct hashes and lands on the bit-identical estimate, so the
  * sketch-only profiler can ship the estimate itself and let the
  * ORACLE certify it against exact counts — no exact aggregate in
  * the Spark plan at all.
  *
  * State is a bounded sorted set (≤ k longs — kilobytes), mergeable
  * (union, keep k smallest), runs map-side-partial in
  * ObjectHashAggregate: the 100 TB shuffle carries one ≤ k-long array
  * per group. Eval returns the sorted hash array; the estimate
  * derives in expression land so the arithmetic is visible to (and
  * replicated by) the oracle.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // STRING is the canonical input; LONG is the zero-allocation fast
  // path (the decimal unscaled-long discipline) — the long hashes as
  // md5("kmv:" + its decimal digits), so a LONG input and its string
  // render are hash-IDENTICAL and either form replays in DuckDB as
  // `md5('kmv:' || CAST(u AS VARCHAR))`.
  override def inputTypes = Seq(GraftShims.typeCollection(
    org.apache.spark.sql.types.StringType, LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  // The aggregate hashes its input itself with a REUSED digest
  // (the [[MinHashSketch]] discipline): routing the hash through the
  // `md5()` expression instead costs a fresh MessageDigest + hex
  // string + base-16 conv per row — profiled ~4× this whole
  // aggregate's runtime on an 11-column unpivot. `h` is the top 60
  // bits of md5("kmv:" ++ value) — identical to DuckDB's
  // `CAST(concat('0x', substr(md5('kmv:' || v), 1, 15)) AS BIGINT)`.
  // LONG inputs render their decimal digits into a REUSED buffer
  // (no String/UTF8String per row): at 11 columns × every corpus row
  // the per-row allocation was the profiler's dominant constant.
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val digitBuf = new Array[Byte](20)
  private val prefix = "kmv:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      md.reset()
      md.update(prefix)
      v match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          md.update(s.getBytes)
        case l: java.lang.Long =>
          // decimal digits of the long, written back-to-front into the
          // reused buffer — byte-identical to Long.toString(l) without
          // the per-row String. Inputs here are bounded unscaled
          // decimals, far from Long.MinValue.
          var x = l.longValue()
          val neg = x < 0
          if (neg) x = -x
          var i = digitBuf.length
          do { i -= 1; digitBuf(i) = ('0' + (x % 10)).toByte; x /= 10 }
          while (x != 0)
          if (neg) { i -= 1; digitBuf(i) = '-' }
          md.update(digitBuf, i, digitBuf.length - i)
        case other => throw new IllegalStateException(
          s"kmv_sketch: unexpected input ${other.getClass}")
      }
      val d = md.digest()
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      add(buf, h)
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Column-API entry point: aggregate a canonical-string value
    * column into the sorted array of the `k` smallest distinct
    * md5-60 hashes of ("kmv:" + value). */
  def kmvSketch(value: Column, k: Int): Column =
    GraftShims.column(
      KmvSketch(GraftShims.expression(value), k).toAggregateExpression())
}

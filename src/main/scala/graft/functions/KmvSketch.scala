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
  // Reused 16-byte digest output: digest() allocates a fresh array
  // per call — at 11 columns × every corpus row that is the GC's
  // dominant customer in the profiler.
  @transient private lazy val digestOut = new Array[Byte](16)
  @transient private lazy val longHasher = new LongKmvHasher
  private val prefix = "kmv:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }
  }

  private def digestHash(): Long = {
    md.digest(digestOut, 0, 16)
    val d = digestOut
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          md.reset()
          md.update(prefix)
          md.update(s.getBytes)
          digestHash()
        case l: java.lang.Long => longHasher.hash(l.longValue())
        case other => throw new IllegalStateException(
          s"kmv_sketch: unexpected input ${other.getClass}")
      }
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

  /** Column-API entry point for the fused profile aggregate. */
  def profileKmvSketch(value: Column, k: Int): Column =
    GraftShims.column(
      ProfileKmvSketch(GraftShims.expression(value), k).toAggregateExpression())
}

/** Task-private memo of `value → md5-60("kmv:" + decimal digits)`:
  * the profiler's per-row hash, allocation-free. A direct-mapped
  * 4096-slot pure-function cache — correctness is independent of
  * grouping or buffer identity because a hit returns the HASH (the
  * bottom-k still decides inclusion); low-NDV columns (flags,
  * discrete quantities, dates — 7 of the profiler's 11) hit almost
  * always and skip the md5 + digit render entirely, high-NDV keys
  * miss and pay the single-block [[Md5Hash60.hash]] they always
  * paid, and a collision merely recomputes. One instance per
  * deserialized expression, so task-private. */
private[functions] final class LongKmvHasher {
  // "kmv:" + up to 20 digits (sign included) — always one MD5 block
  private val buf = new Array[Byte](24)
  private val vals = new Array[Long](4096)
  private val hs = new Array[Long](4096)
  private val occ = new Array[Boolean](4096)

  def hash(x0: Long): Long = {
    val slot = (scala.util.hashing.byteswap64(x0) & 0xfffL).toInt
    if (occ(slot) && vals(slot) == x0) return hs(slot)
    // decimal digits back-to-front (byte-identical to
    // Long.toString), prefix immediately before them; inputs are
    // bounded unscaled decimals, far from Long.MinValue
    var x = x0
    val neg = x < 0
    if (neg) x = -x
    var i = buf.length
    do { i -= 1; buf(i) = ('0' + (x % 10)).toByte; x /= 10 }
    while (x != 0)
    if (neg) { i -= 1; buf(i) = '-' }
    buf(i - 1) = ':'; buf(i - 2) = 'v'; buf(i - 3) = 'm'; buf(i - 4) = 'k'
    val h = Md5Hash60.hash(buf, i - 4, buf.length - (i - 4))
    vals(slot) = x0; hs(slot) = h; occ(slot) = true
    h
  }
}

object ProfileKmvSketch {
  /** Mutable single-pass profile state: row/null counts, min/max of
    * the unscaled-long coordinate, and the ascending bottom-k
    * distinct hash array (primitive — the TreeSet's boxed compares
    * and right-spine walks were measurable at 660 M updates). */
  final class Buf(val k: Int) {
    var n: Long = 0L
    var nulls: Long = 0L
    var minU: Long = Long.MaxValue
    var maxU: Long = Long.MinValue
    var size: Int = 0
    val hs: Array[Long] = new Array[Long](k)

    def addK(h: Long): Unit = {
      if (size == k && h >= hs(k - 1)) return
      val idx = java.util.Arrays.binarySearch(hs, 0, size, h)
      if (idx >= 0) return // already present
      val ins = -idx - 1
      val lastKept = if (size == k) k - 1 else size
      System.arraycopy(hs, ins, hs, ins + 1, lastKept - ins)
      hs(ins) = h
      if (size < k) size += 1
    }
  }
}

/** The sketch-only profiler's per-column statistic FUSED into one
  * typed aggregate: row count, null count, min/max of the
  * DECIMAL(18,4) unscaled-long coordinate, and the [[KmvSketch]]
  * bottom-k — all updated in the single `child.eval` the KMV pass
  * already pays. The r12 shape ran five aggregate functions per
  * column (55 for the 11-column profile) through
  * ObjectHashAggregate's per-row machinery; this runs 11, and the
  * scalar stats ride for ~free. Hash values are IDENTICAL to
  * [[KmvSketch]] over the same longs (same "kmv:"+digits md5-60 via
  * [[LongKmvHasher]]), so the oracle replay is unchanged; min/max
  * over the unscaled long are the min/max of the value itself
  * (×10⁴ is monotonic) and divide back exactly. */
case class ProfileKmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ProfileKmvSketch.Buf]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_rows", LongType, nullable = false),
    StructField("n_null", LongType, nullable = false),
    StructField("kmv", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("min_u", LongType, nullable = true),
    StructField("max_u", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "profile_kmv_sketch"

  @transient private lazy val longHasher = new LongKmvHasher

  override def createAggregationBuffer(): ProfileKmvSketch.Buf =
    new ProfileKmvSketch.Buf(k)

  override def update(buf: ProfileKmvSketch.Buf,
      input: InternalRow): ProfileKmvSketch.Buf = {
    val v = child.eval(input)
    buf.n += 1
    if (v == null) buf.nulls += 1
    else {
      val x = v.asInstanceOf[java.lang.Long].longValue()
      if (x < buf.minU) buf.minU = x
      if (x > buf.maxU) buf.maxU = x
      buf.addK(longHasher.hash(x))
    }
    buf
  }

  override def merge(b1: ProfileKmvSketch.Buf,
      b2: ProfileKmvSketch.Buf): ProfileKmvSketch.Buf = {
    b1.n += b2.n
    b1.nulls += b2.nulls
    if (b2.minU < b1.minU) b1.minU = b2.minU
    if (b2.maxU > b1.maxU) b1.maxU = b2.maxU
    var i = 0
    while (i < b2.size) { b1.addK(b2.hs(i)); i += 1 }
    b1
  }

  override def eval(buf: ProfileKmvSketch.Buf): Any = {
    val hasVals = buf.n > buf.nulls
    InternalRow(buf.n, buf.nulls,
      new GenericArrayData(java.util.Arrays.copyOf(buf.hs, buf.size)),
      if (hasVals) buf.minU else null,
      if (hasVals) buf.maxU else null)
  }

  override def serialize(buf: ProfileKmvSketch.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * 4 + 4 + 8 * buf.size)
    bb.putLong(buf.n).putLong(buf.nulls)
      .putLong(buf.minU).putLong(buf.maxU).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ProfileKmvSketch.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ProfileKmvSketch.Buf(k)
    buf.n = bb.getLong(); buf.nulls = bb.getLong()
    buf.minU = bb.getLong(); buf.maxU = bb.getLong()
    buf.size = bb.getInt()
    var i = 0
    while (i < buf.size) { buf.hs(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ProfileKmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ProfileKmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): ProfileKmvSketch =
    copy(child = newChild)
}

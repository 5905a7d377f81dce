package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each permutation
  * `k < numPerms`, the minimum over input tokens of a 60-bit hash
  * `H(k, token)`.
  *
  * Replaces the relational formulation (explode token × numPerms →
  * `min(hash)` groupBy → `collect_list` pivot), which blew every token
  * row up 32× and paid two shuffles plus a sort-based pivot. This
  * aggregate computes all `numPerms` minima in a single pass over the
  * token rows: the ObjectHashAggregate runs it with map-side partial
  * aggregation, so the only shuffle carries one `numPerms`-long array
  * per document.
  *
  * `H(k, token)` = first 15 hex digits of `md5("<k>:<token>")` read as
  * a base-16 integer (the top 60 bits of the digest, always
  * non-negative). md5 — unlike xxhash64/murmur3 — is computed
  * identically by DuckDB (`CAST(concat('0x', substr(md5(k || ':' ||
  * tok), 1, 15)) AS BIGINT)`), which is what lets the driver's oracle
  * recompute signatures and hash-check the MinHash queries instead of
  * falling back to a rows-only check.
  */
case class MinHashSketch(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // AbstractDataType is private[sql] in Spark 4 — let the type infer
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  // per-instance scratch (executor-side); not part of aggregation state
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numPerms)(k => s"$k:".getBytes(StandardCharsets.UTF_8))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].getBytes
      var k = 0
      while (k < numPerms) {
        md.reset()
        md.update(prefixes(k))
        md.update(tok)
        val d = md.digest()
        // top 60 bits of the digest == first 15 hex chars as base-16
        val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        if (h < buffer(k)) buffer(k) = h
        k += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numPerms) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numPerms)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  /** Column-API entry point: aggregate a token column into a
    * `numPerms`-long MinHash signature array. */
  def minhashSketch(tok: Column, numPerms: Int): Column =
    GraftShims.column(
      MinHashSketch(GraftShims.expression(tok), numPerms)
        .toAggregateExpression())
}

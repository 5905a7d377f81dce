package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayAgreeCount.arrayAgreeCount
import graft.functions.SortedIntersectSize.sortedIntersectSize

/** Native Catalyst expressions: codegen path (via DataFrame) and
  * interpreted path (via eval on literals) must agree with the
  * built-in compositions they replace. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_size == size(array_intersect) on sorted int arrays") {
    val df = Seq(
      (Seq(1, 3, 5, 7), Seq(3, 4, 5, 8)),
      (Seq(1, 2), Seq(3, 4)),
      (Seq.empty[Int], Seq(1)),
      (Seq(2, 4, 6), Seq(2, 4, 6)),
    ).toDF("a", "b")
    val got = df.select(
      sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("sorted_intersect_size: null input yields null") {
    val df = Seq((Some(Seq(1, 2)), Option.empty[Seq[Int]])).toDF("a", "b")
    assert(df.select(sortedIntersectSize(col("a"), col("b"))).head().isNullAt(0))
  }

  test("array_agree_count matches zip_with composition on long arrays") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),
      (Seq(5L), Seq(6L)),
    ).toDF("a", "b")
    val got = df.select(
      arrayAgreeCount(col("a"), col("b")).as("fast"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), e => e))
        .as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("array_agree_count supports int arrays too") {
    val df = Seq((Seq(1, 2, 3), Seq(1, 2, 9))).toDF("a", "b")
    assert(df.select(arrayAgreeCount(col("a"), col("b"))).head().getInt(0) == 2)
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((Seq("x"), Seq(1))).toDF("a", "b")
    intercept[Exception] {
      df.select(sortedIntersectSize(col("a"), col("b"))).collect()
    }
  }
}

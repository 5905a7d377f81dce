package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout: interleave correctness and the data-skipping
  * property the layout exists for. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known examples)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): x bits {0,1} → positions {0,2} = 5; y bits {0,2} →
    // positions {1,5} = 34; total 39
    assert(got == Seq(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("zValue is monotone in each quadtree cell: prefix = cell id") {
    // all 4 combinations of the top bit land in 4 distinct quadrants
    val q = Seq((0L, 0L), (40000L, 0L), (0L, 40000L), (40000L, 40000L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0) >> 30).toSet
    assert(q == Set(0L, 1L, 2L, 3L))
  }

  test("zorder write tightens per-file bounding boxes vs natural order") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = s"/tmp/graft-layout-${sys.props("user.name")}"
    // "natural" arrival order: range-partitioned by order key (the
    // clustering a fact table has before any layout pass)
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/natural")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", 8, s"$base/zorder")

    def fileBoxArea(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("l_partkey") - min("l_partkey")) *
          (max("l_suppkey") - min("l_suppkey"))).as("area"))
        .agg(sum("area")).head().getLong(0)

    val nat = fileBoxArea(s"$base/natural")
    val zo = fileBoxArea(s"$base/zorder")
    // no rows lost, and the z-layout's summed bounding boxes shrink
    // by at least 2× — the margin row-group skipping feeds on
    assert(spark.read.parquet(s"$base/zorder").count() == li.count())
    assert(zo * 2 <= nat, s"z-order boxes $zo vs natural $nat")
  }

  test("zorder stats cover all rows with tight per-bucket boxes") {
    val stats = Layout.zorderStats(spark, sf0001).collect()
    val total = Tables.lineitem(spark, sf0001).count()
    assert(stats.map(_.getLong(1)).sum == total)
    assert(stats.length > 8, s"expected many quadtree cells, got ${stats.length}")
    // every bucket's part-key span is a fraction of the full domain
    val bounds = Tables.lineitem(spark, sf0001)
      .agg(min("l_partkey"), max("l_partkey")).head()
    val fullSpan = bounds.getLong(1) - bounds.getLong(0)
    val avgSpan = stats.map(r => r.getLong(3) - r.getLong(2)).sum / stats.length
    assert(avgSpan * 2 <= fullSpan, s"avg per-bucket span $avgSpan of $fullSpan")
  }
}

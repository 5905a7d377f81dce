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

  test("stats pruning skips files, loses no rows, and beats naive bucketing") {
    val row = sources.Layout.statsPrune(spark, sf0001).head()
    val (nFiles, nScanned, skip, exact) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getBoolean(4))
    assert(exact, "stats-pruned scan must lose no matching row")
    assert(nScanned > 0 && nScanned < nFiles,
      s"expected partial pruning, scanned $nScanned of $nFiles")
    assert(skip > 0.0 && skip < 1.0, s"skip fraction $skip")
    // the z-order value prop: bucketing by an UNCORRELATED key (the
    // natural row order) gives boxes spanning both dims, so the same
    // 2-D predicate can prune (almost) nothing
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"),
        pmod(col("l_orderkey"), lit(64)).as("bucket"))
    val b = li.agg(min("p"), max("p"), min("s"), max("s")).head()
    val (pLo, pHi) = (b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 4,
      b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2)
    val (sLo, sHi) = (b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 4,
      b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 2)
    val naiveScanned = li.groupBy("bucket")
      .agg(min("p").as("minp"), max("p").as("maxp"),
        min("s").as("mins"), max("s").as("maxs"))
      .filter(!(col("maxp") < pLo || col("minp") > pHi ||
        col("maxs") < sLo || col("mins") > sHi))
      .count()
    val naiveTotal = li.select("bucket").distinct().count()
    assert(nScanned.toDouble / nFiles < naiveScanned.toDouble / naiveTotal,
      s"z-order stats ($nScanned/$nFiles) should prune strictly better " +
        s"than uncorrelated bucketing ($naiveScanned/$naiveTotal)")
  }
}

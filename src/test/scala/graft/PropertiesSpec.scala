package graft

import java.sql.Date
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GrowthRates._

/** Property-based invariants (SURVEY.md §5 #3) over generated monthly
  * series — scalacheck generators driven with fixed seeds (no
  * scalatestplus bridge in the offline dependency set). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val levelsGen: Gen[List[Long]] =
    Gen.choose(2, 40).flatMap(n => Gen.listOfN(n, Gen.choose(50L, 5000L)))

  private def toSeries(levels: List[Long]) =
    levels.zipWithIndex.map { case (v, i) =>
      (Date.valueOf(f"${2010 + i / 12}%04d-${i % 12 + 1}%02d-01"), v)
    }.toDF("month", "emp")

  private val w = Window.orderBy("month")

  test("telescoping: sum of first differences == last - first") {
    for (seed <- 1L to 10L) {
      val levels = sample(levelsGen, seed)
      val sumDiff = toSeries(levels)
        .withColumn("d", absChange(col("emp"), w))
        .agg(sum("d")).head().getLong(0)
      assert(sumDiff == levels.last - levels.head, s"seed=$seed $levels")
    }
  }

  test("monotone non-decreasing series has no negative growth") {
    for (seed <- 1L to 10L) {
      val deltas = sample(Gen.choose(2, 30).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 100L))), seed)
      val levels = deltas.scanLeft(1000L)(_ + _)
      val negatives = toSeries(levels)
        .withColumn("p", pctChange(col("emp"), w))
        .filter(col("p") < 0).count()
      assert(negatives == 0, s"seed=$seed")
    }
  }

  test("minhash sketch: merge order never changes the signature " +
      "(partial-aggregation safety)") {
    // the TypedImperativeAggregate must produce identical signatures
    // regardless of how rows split across partitions (map-side partial
    // + merge); compare 1-partition vs many-partition runs on random
    // token multisets
    import graft.functions.MinHashSketch.minhashSketch
    val tokGen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d", "ee", "fff", "g", "hh")))
    for (seed <- 1L to 5L) {
      val toks = sample(tokGen, seed)
      val one = toks.toDF("tok").coalesce(1)
        .agg(minhashSketch(col("tok"), 8)).head().getSeq[Long](0)
      val many = toks.toDF("tok").repartition(7)
        .agg(minhashSketch(col("tok"), 8)).head().getSeq[Long](0)
      assert(one == many, s"seed=$seed")
    }
  }

  test("dot product: linearity under scalar multiplication (codegen path)") {
    val vecGen = Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 128.0))
    for (seed <- 1L to 5L) {
      val a = sample(vecGen, seed)
      val b = sample(vecGen, seed + 100)
      val df = Seq((a, b)).toDF("a", "b")
      import graft.functions.DotProduct.dotProduct
      val Array(d, d2) = df.select(
        dotProduct(col("a"), col("b")),
        dotProduct(transform(col("a"), x => x * 2), col("b")))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      // exact: each term doubles exactly in binary FP, fold order fixed
      assert(d2 == 2 * d, s"seed=$seed")
    }
  }

  test("prior peak is monotone non-decreasing along the series") {
    for (seed <- 1L to 10L) {
      val levels = sample(levelsGen, seed)
      val peaks = toSeries(levels)
        .withColumn("pk", priorPeak(col("emp"), w))
        .orderBy("month").select("pk")
        .collect().map(r => if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
      assert(peaks.sameElements(peaks.sorted), s"seed=$seed")
    }
  }

  test("z-value interleave is a bijection on the 16-bit grid (deinterleave roundtrip)") {
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until 16) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    for (seed <- 1L to 5L) {
      val pts = sample(Gen.listOfN(200,
        Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))), seed)
      val zs = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.sources.Layout.zValue(col("x"), col("y")).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      zs.foreach { case (x, y, z) =>
        assert(deinterleave(z) == (x, y), s"seed=$seed z=$z")
        assert(z >= 0 && z <= 0xFFFFFFFFL)
      }
    }
  }

  test("funnel fold == naive quadratic reference on random event sequences") {
    import java.sql.Timestamp
    val types = Gen.oneOf("signup", "view", "click", "purchase", "noise")
    val evGen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 50L), types)))
    // naive reference: scan ts-sorted events, keep first strict-after
    // timestamp per stage
    def naive(evs: List[(Long, String)]): (Option[Long], Option[Long],
        Option[Long], Option[Long]) = {
      var t1, t2, t3, t4: Option[Long] = None
      evs.sortBy(e => (e._1, e._2)).foreach { case (ts, et) =>
        if (et == "signup" && t1.isEmpty) t1 = Some(ts)
        else if (et == "view" && t2.isEmpty && t1.exists(ts > _)) t2 = Some(ts)
        else if (et == "click" && t3.isEmpty && t2.exists(ts > _)) t3 = Some(ts)
        else if (et == "purchase" && t4.isEmpty && t3.exists(ts > _)) t4 = Some(ts)
      }
      (t1, t2, t3, t4)
    }
    for (seed <- 1L to 10L) {
      val evs = sample(evGen, seed)
      val (e1, e2, e3, e4) = naive(evs)
      // one synthetic user through the PRODUCTION higher-order fold
      val df = evs.map { case (ts, et) => (1L, new Timestamp(ts * 1000), et) }
        .toDF("user_id", "ts", "event_type")
      val row = graft.streaming.Events.funnelOf(df).head()
      val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      val expect = (e1.size.toLong, e2.size.toLong, e3.size.toLong, e4.size.toLong)
      assert(got == expect, s"seed=$seed evs=$evs naive=${(e1, e2, e3, e4)}")
    }
  }

  test("salted equi-join == plain equi-join on random frames and salt counts") {
    val factGen = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 1000L), Gen.oneOf("a", "b", "c", "d"))))
    for (seed <- 1L to 8L) {
      val rows = sample(factGen, seed)
      val salts = 1 + (seed % 5).toInt
      val fact = rows.toDF("id", "k")
      val dim = List(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "wt")
      val plain = fact.join(dim, Seq("k"))
        .select("k", "id", "wt").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
      val salted = graft.operators.SkewJoin
        .saltedEquiJoin(fact, dim, "k", col("id"), salts)
        .select("k", "id", "wt").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
      assert(salted == plain, s"seed=$seed salts=$salts")
    }
  }

  test("anomaly scoring: constant trailing week yields null z, no flag") {
    import java.sql.Date
    // 8 constant days then a spike: rows 8+ have a full window; the
    // σ=0 guard must null the z-score and never flag, even when the
    // current value differs from the constant mean
    val series = (1 to 8).map(i =>
      ("t", Date.valueOf(f"2024-01-$i%02d"), 100L)) :+
      (("t", Date.valueOf("2024-01-09"), 500L))
    val df = series.toDF("event_type", "day", "n")
    val got = graft.streaming.Events.anomalyScore(df)
      .orderBy("day").collect()
    assert(got.length == 2) // days 8 and 9 have 7 trailing rows
    got.foreach { r =>
      assert(r.isNullAt(5), s"z not null on constant week: $r")
      assert(!r.getBoolean(6), s"flag raised on σ=0: $r")
      assert(r.getDouble(4) == 0.0, s"sd nonzero: $r")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** End-to-end smoke over sf0.001 (the driver's t1 gate) plus
  * cross-grain invariants that hold regardless of data values. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry (flagship W6) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and its oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute without throwing
    }
    // full oracle coverage both ways: every query hash-checked, no
    // orphaned SQL (the engine promises ZERO rows-only checks)
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
    val unoracled = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"query without DuckDB oracle: $unoracled")
  }

  test("rollup consistency: sum of quarterly totals == sum of yearly totals") {
    val q = operators.Payroll.rollupQuarterly(spark, sf0001)
      .agg(sum("total_emp")).head().getLong(0)
    val y = operators.Payroll.rollupYearly(spark, sf0001)
      .agg(sum("total_emp")).head().getLong(0)
    assert(q == y)
  }

  test("rollup hierarchy grand total equals series total") {
    val h = operators.Payroll.rollupHierarchy(spark, sf0001)
    val grand = h.filter(col("year").isNull && col("quarter").isNull)
      .select("total_emp").head().getLong(0)
    val total = Tables.monthlySeries(spark, sf0001)
      .agg(sum("emp")).head().getLong(0)
    assert(grand == total)
  }

  test("cube grand total equals series total") {
    val grand = operators.Payroll.cubeYearQuarter(spark, sf0001)
      .filter(col("year").isNull && col("quarter").isNull)
      .select("total_emp").head().getLong(0)
    val total = Tables.monthlySeries(spark, sf0001)
      .agg(sum("emp")).head().getLong(0)
    assert(grand == total)
  }

  test("latest-order dedup: one row per customer, idempotent (S4)") {
    val d = operators.Relational.latestOrderPerCustomer(spark, sf0001)
    assert(d.groupBy("o_custkey").count().filter(col("count") > 1).isEmpty)
  }

  test("shipping priority: descending top-10 with pre-cutoff order dates") {
    val rows = operators.Relational.shippingPriority(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "revenue not descending")
    assert(revs.forall(_ > 0))
    val cutoff = java.time.LocalDateTime.parse("2000-03-15T00:00")
    assert(rows.forall(
        _.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cutoff)),
      "order date on/after the cutoff leaked through")
  }

  test("market share: shares sum to 1 within each year") {
    val rows = operators.Relational.nationMarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (yr, rs) =>
      val tot = rs.map(_.getDouble(3)).sum
      // each share rounds to 4dp; ≤ 25 nations ⇒ ≤ 0.00125 drift
      assert(math.abs(tot - 1.0) < 0.002, s"year $yr shares sum to $tot")
      assert(rs.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
    }
  }

  test("zipf fit: positive exponent, r2 in [0,1], k bounded") {
    val row = ext.Text.zipfFit(spark, sf0001).head()
    assert(row.getLong(0) > 0 && row.getLong(0) <= 100)
    assert(row.getDouble(1) > 0, s"zipf exponent ${row.getDouble(1)} not positive")
    val r2 = row.getDouble(3)
    assert(r2 >= 0 && r2 <= 1, s"r2 $r2 out of range")
  }

  test("daily anomaly z-scores match a driver-side recomputation") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = streaming.Events.anomalyDaily(spark, sf0001).collect()
    val byType = daily.groupBy(_._1)
    // every type contributes (its days − 7) scored rows
    assert(got.length ==
      byType.valuesIterator.map(v => math.max(0, v.length - 7)).sum)
    got.foreach { row =>
      val series = byType(row.getString(0)).sortBy(_._2)
      val i = series.indexWhere(_._2 == row.getDate(1).toString)
      assert(i >= 7, s"row $row scored without a full trailing week")
      val w = series.slice(i - 7, i).map(_._3)
      val mean = w.sum.toDouble / 7
      val varN = 7L * w.map(x => x * x).sum - w.sum * w.sum
      val sd = math.sqrt(varN.toDouble / (7.0 * 6.0))
      assert(math.abs(row.getDouble(3) - mean) < 1e-3, s"mean at $row")
      assert(math.abs(row.getDouble(4) - sd) < 1e-3, s"sd at $row")
      if (varN > 0) {
        val z = (series(i)._3 - mean) / sd
        assert(math.abs(row.getDouble(5) - z) < 1e-3, s"z at $row")
        assert(row.getBoolean(6) == (math.abs(z) > 3.0), s"flag at $row")
      } else assert(row.isNullAt(5) && !row.getBoolean(6))
    }
  }

  test("salted enrichment ≡ broadcast enrichment, row for row") {
    val plain  = streaming.Events.enrichedDaily(spark, sf0001).collect()
    val salted = streaming.Events.enrichedDailySalted(spark, sf0001).collect()
    assert(salted.nonEmpty && salted.toSeq == plain.toSeq)
  }

  test("wau sketch: certified for every day, exact side matches dau/wau") {
    val sk = streaming.Events.wauSketch(spark, sf0001).collect()
    assert(sk.nonEmpty && sk.forall(_.getBoolean(2)),
      "HLL union fell outside its certified envelope")
    val exact = streaming.Events.dauWau(spark, sf0001).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    sk.foreach(r =>
      assert(r.getLong(1) == exact(r.getDate(0).toString), s"wau drift at $r"))
  }

  test("gated exact faces above the gate: cohort-bounded, certified, deterministic") {
    // tiny gate forces the above-gate branch on the 1000-row corpus
    val fullDau = streaming.Events.dauWau(spark, sf0001).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val cohort = streaming.Events.dauWauGated(spark, sf0001, 200L).collect()
    assert(cohort.nonEmpty, "cohort must be non-empty at a 20% keep rate")
    cohort.foreach { r =>
      val (d, w) = fullDau(r.getDate(0).toString)
      assert(r.getLong(1) <= d && r.getLong(2) <= w,
        s"cohort counts must be subsets of the full population: $r")
      assert(r.getLong(1) <= r.getLong(2), s"dau > wau: $r")
    }
    val wb = streaming.Events.wauSketchGated(spark, sf0001, 200L).collect()
    assert(wb.nonEmpty && wb.forall(_.getBoolean(2)),
      "cohort HLL certification must hold")
    val q = streaming.Events.valueQuantilesGated(spark, sf0001, 200L).collect()
    assert(q.nonEmpty)
    q.foreach(r => assert(r.getDouble(1) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(3), s"quantiles out of order: $r"))
    val again = streaming.Events.dauWauGated(spark, sf0001, 200L).collect()
    assert(cohort.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "md5-keyed cohort must be deterministic")
  }

  test("type transitions: rows are a stochastic matrix over observed pairs") {
    val rows = streaming.Events.typeTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val tot = rs.map(_.getDouble(3)).sum
      // each p rounds to 4dp; ≤ #types terms ⇒ tiny drift
      assert(math.abs(tot - 1.0) < 0.001, s"row $t sums to $tot")
    }
    val nPairs = rows.map(_.getLong(2)).sum
    val perUser = Tables.events(spark, sf0001).groupBy("user_id").count()
      .collect().map(r => math.max(0L, r.getLong(1) - 1)).sum
    assert(nPairs == perUser, "pair count != sum of (user events - 1)")
  }

  test("incremental aggregate merge ≡ one-shot aggregate") {
    import graft.functions.Num._
    val merged = sources.Ingest.incrementalAgg(spark, sf0001).collect()
    val oneShot = Tables.events(spark, sf0001)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        r4(dsumExact(col("value")).cast("double")).as("sum_value"))
      .withColumn("avg_value",
        r4(col("sum_value") / col("n_events").cast("double")))
      .orderBy("event_type", "day").collect()
    assert(merged.nonEmpty && merged.toSeq == oneShot.toSeq)
  }

  test("winsorized means sit inside the clip band; doc counts conserve") {
    val rows = ext.Text.winsorizedTokens(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95, wm) = (r.getDouble(2), r.getDouble(3), r.getDouble(5))
      assert(p05 <= p95 && wm >= p05 - 1e-4 && wm <= p95 + 1e-4,
        s"winsorized mean outside clip band: $r")
    }
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("source mixture: kept mass bounded per source, rates in (0,1]") {
    val kept = ext.Curation.sourceMixture(spark, sf0001).collect()
    assert(kept.nonEmpty)
    val full = Tables.documents(spark, sf0001)
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(count(lit(1)).as("d"), sum("n").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    kept.foreach { r =>
      val (docs, toks) = full(r.getString(0))
      assert(r.getLong(1) <= docs && r.getLong(2) <= toks, s"overdraw at $r")
      val rate = r.getDouble(3)
      assert(rate > 0 && rate <= 1, s"rate $rate out of range")
      // the keyed-hash coordinate is uniform: kept docs ≈ rate · docs
      assert(math.abs(r.getLong(1).toDouble / docs - rate) < 0.35,
        s"kept fraction far from rate at $r")
    }
  }

  test("same-month yoy matches a driver-side recomputation") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val got = operators.Payroll.yoySameMonth(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val prev = ser(m.minusYears(1))
      val expect = (ser(m) - prev).toDouble / prev * 100
      assert(math.abs(r.getDouble(3) - expect) < 1e-3, s"yoy at $m")
    }
    // every month with a same-month predecessor appears
    assert(got.length == ser.keys.count(m => ser.contains(m.minusYears(1))))
  }

  test("order backlog telescopes to placed minus completed") {
    val rows = operators.Relational.orderBacklog(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(1) - r.getLong(2)
      assert(r.getLong(3) == run, s"backlog drift at $r")
    }
    val placed = rows.map(_.getLong(1)).sum
    val completed = rows.map(_.getLong(2)).sum
    assert(placed == Tables.orders(spark, sf0001).count())
    assert(completed == Tables.lineitem(spark, sf0001)
      .select("l_orderkey").distinct().count())
    // final backlog = orders that never ship a single line
    assert(rows.last.getLong(3) == placed - completed)
  }

  test("shingle novelty: first doc fully novel, totals conserve") {
    val rows = ext.Dedup.shingleNovelty(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) == 1.0, s"lowest-id doc not fully novel: $first")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), s"overdraw: $r"))
    val distinctShingles = rows.map(_.getLong(2)).sum
    assert(distinctShingles > 0)
  }

  test("cheapest supplier per part ≡ the window-argmin form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("l_extendedprice").asc, col("l_suppkey").asc)
    val windowed = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("l_extendedprice").as("min_price"),
        col("l_suppkey").as("suppkey"))
      .orderBy("l_partkey").collect().toSeq
    val joined = operators.Relational
      .cheapestSupplierPerPart(spark, sf0001).collect().toSeq
    assert(joined.nonEmpty && joined == windowed)
  }

  test("rolling stats match a driver-side recomputation") {
    val series = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1))
    val got = operators.Payroll.rollingStats(spark, sf0001).collect()
    assert(got.length == series.length)
    got.zipWithIndex.foreach { case (row, i) =>
      val w = series.slice(math.max(0, i - 2), i + 1)
      val n = w.length
      val s1 = w.sum.toDouble
      val s2 = w.map(x => x * x).sum.toDouble
      val ma = s1 / n
      assert(math.abs(row.getDouble(2) - ma) < 1e-3, s"ma3 at row $i")
      if (n == 3) {
        val sd = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        assert(math.abs(row.getDouble(3) - sd) < 1e-3, s"sd3 at row $i")
        if (sd > 0) {
          val z = (series(i) - ma) / sd
          assert(math.abs(row.getDouble(4) - z) < 1e-3, s"z at row $i")
          assert(row.getBoolean(5) == (math.abs(z) > 1.5), s"outlier at $i")
        }
      } else assert(row.isNullAt(3) && row.isNullAt(4) && row.isNullAt(5))
    }
  }

  test("ewma fold matches the scalar recursion") {
    val series = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1))
    val got = operators.Payroll.ewma(spark, sf0001).collect()
    assert(got.length == series.length)
    var s = series.head.toDouble
    got.zipWithIndex.foreach { case (row, i) =>
      if (i > 0) s = 0.3 * series(i) + 0.7 * s
      assert(math.abs(row.getDouble(2) - s) < 1e-3, s"ewma at row $i")
    }
  }

  test("holt fold matches the coupled scalar recursion") {
    val series = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1))
    val got = operators.Payroll.holt(spark, sf0001).collect()
    assert(got.length == series.length)
    var l = series.head.toDouble
    var b = 0.0
    got.zipWithIndex.foreach { case (row, i) =>
      if (i > 0) {
        val lNew = 0.5 * series(i) + 0.5 * (l + b)
        b = 0.3 * (lNew - l) + 0.7 * b
        l = lNew
      }
      assert(math.abs(row.getDouble(2) - l) < 1e-3, s"level at row $i")
      assert(math.abs(row.getDouble(3) - b) < 1e-3, s"trend at row $i")
      assert(math.abs(row.getDouble(4) - (row.getDouble(2) + row.getDouble(3))) < 2e-4,
        s"forecast at row $i")
    }
  }

  test("small-order revenue matches a driver-side decorrelated recomputation") {
    val pk = spark.read.parquet(s"$sf0001/part.parquet").collect()
      .filter(r => r.getAs[String]("p_brand") == "Brand#13" &&
        r.getAs[String]("p_type") == "ECONOMY")
      .map(_.getAs[Long]("p_partkey")).toSet
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(t => pk(t._1))
    assert(li.nonEmpty, "fixture slice is empty — pick another brand/type")
    val avg = li.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map(t => BigDecimal(t._2)).sum.toDouble / rows.length
    }
    val expect = li.collect {
      case (k, q, p) if q < 0.2 * avg(k) => BigDecimal(p)
    }.sum.toDouble / 7.0
    val got = operators.Relational.smallOrderRevenue(spark, sf0001)
      .collect().head.getDouble(0)
    assert(math.abs(got - expect) < 1e-2, s"$got vs $expect")
  }

  test("seasonality indexes average to ~1 weighted by month frequency") {
    val rows = operators.Payroll.seasonality(spark, sf0001).collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getDouble(2) > 0))
    // the unweighted mean of per-month averages over a balanced
    // calendar is close to the global mean → indexes center on 1
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(math.abs(mean - 1.0) < 0.05, s"index mean $mean")
  }

  test("gap fill restores the full calendar spine and anchors real months") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    val got = operators.Payroll.gapFill(spark, sf0001).collect()
    // one row per spine month, no holes
    assert(got.length == ser.length, "spine covers every month")
    val byMonth = got.map(r => r.getDate(0).toLocalDate -> r).toMap
    val gaps = got.filter(_.getBoolean(3))
    assert(gaps.nonEmpty, "deterministic gap injection removed something")
    // real months carry their own value; first/last are never gaps
    assert(!byMonth(ser.head._1).getBoolean(3) &&
      !byMonth(ser.last._1).getBoolean(3))
    got.filterNot(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(1) == byMonth(r.getDate(0).toLocalDate).getLong(1))
      assert(r.getDouble(2) == r.getLong(1).toDouble)
    }
    // interpolated values sit between their real neighbors
    gaps.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val prev = ser.filter(x => x._1.isBefore(m) &&
        !byMonth(x._1).getBoolean(3)).last._2
      val next = ser.filter(x => x._1.isAfter(m) &&
        !byMonth(x._1).getBoolean(3)).head._2
      val lo = math.min(prev, next).toDouble
      val hi = math.max(prev, next).toDouble
      assert(r.getDouble(2) >= lo - 1e-6 && r.getDouble(2) <= hi + 1e-6,
        s"interpolation out of neighbor range at $m")
    }
  }

  test("decomposition: additive identity holds, edges null, seasonal periodic") {
    val rows = operators.Payroll.decompose(spark, sf0001).collect()
    val n = rows.length
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i < 6 || i >= n - 6) {
        assert(r.isNullAt(2) && r.isNullAt(4), s"edge row $i must be null")
      } else {
        val emp = r.getLong(1)
        val sum = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
        assert(math.abs(sum - emp) < 1e-2, s"trend+seasonal+residual at $i")
      }
    }
    // same calendar month ⇒ same seasonal component
    val byMonth = rows.groupBy(_.getDate(0).toLocalDate.getMonthValue)
    byMonth.values.foreach { rs =>
      assert(rs.map(_.getDouble(3)).distinct.length == 1)
    }
  }

  test("dau/wau: first day wau==dau, wau bounded, stickiness in (0,1]") {
    val rows = streaming.Events.dauWau(spark, sf0001)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(1) == rows.head.getLong(2),
      "no history on day 1 → wau == dau")
    val users = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "wau >= dau")
      assert(r.getLong(2) <= users)
      val st = r.getDouble(3)
      assert(st > 0 && st <= 1.0 + 1e-9, s"stickiness $st")
    }
  }

  test("funnel fold equals the chained-join formulation and is monotone") {
    val ev = Tables.events(spark, sf0001).select("user_id", "ts", "event_type")
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = ev.join(t1, Seq("user_id"))
      .filter(col("event_type") === "view" && col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = ev.join(t2, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val t4 = ev.join(t3, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t3"))
      .groupBy("user_id").agg(min("ts").as("t4"))
    val expect = Seq(t1.count(), t2.count(), t3.count(), t4.count())
    val row = streaming.Events.funnelCounts(spark, sf0001).head()
    val got = Seq(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(got == expect, s"fold $got vs chained joins $expect")
    assert(got == got.sorted.reverse, s"funnel must be non-increasing: $got")
    assert(got.head > 0)
  }

  test("retention cohorts: offset 0 covers every user; totals match active days") {
    val r = streaming.Events.retentionCohorts(spark, sf0001)
    val atZero = r.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val users = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(atZero == users, "every user is active on their cohort day")
    val total = r.agg(sum("n_users")).head().getLong(0)
    val userDays = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(total == userDays)
    assert(r.filter(col("day_offset") < 0).isEmpty)
  }

  test("hll certification holds for every event type") {
    val rows = streaming.Events.hllUsersPerType(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)))
  }

  test("regression closed form tracks Spark's co-moment built-ins") {
    val got = operators.Relational.priceRegression(spark, sf0001).collect()
    assert(got.nonEmpty)
    val ref = Tables.lineitem(spark, sf0001).groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("s"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("i"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    got.foreach { r =>
      val (c, s, i) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - c) < 1e-3, s"corr ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - s) < 1e-2, s"slope ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - i) < 1.0,
        s"intercept ${r.getString(0)}: ${r.getDouble(4)} vs $i")
      assert(math.abs(r.getDouble(2)) <= 1.0, "corr out of [-1, 1]")
    }
  }

  test("hll rollup: unioned day sketches equal the one-shot month sketch") {
    // HLL union is exact over sketches: merging per-day sketches must
    // give the SAME estimate as sketching the month directly — the
    // property that lets a cube serve every grain from one pass
    val ud = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val viaDays = ud.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(functions.CalendarColumns.monthStart(col("day")).as("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val oneShot = ud
      .groupBy(functions.CalendarColumns.monthStart(col("day")).as("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val a = viaDays.orderBy("month").collect().map(r => (r.getDate(0), r.getLong(1)))
    val b = oneShot.orderBy("month").collect().map(r => (r.getDate(0), r.getLong(1)))
    assert(a.nonEmpty && a.sameElements(b),
      s"union-of-sketches diverged from one-shot: ${a.take(2).toSeq} vs ${b.take(2).toSeq}")
    // and the declared query certifies every month
    val cert = streaming.Events.hllRollup(spark, sf0001).collect()
    assert(cert.nonEmpty && cert.forall(_.getBoolean(3)))
  }

  test("sole-culprit fixture: only the lone late supplier of a multi-supplier order is blamed") {
    import spark.implicits._
    // order 1: supplier 10 late, 11 on time    -> 10 blamed
    // order 2: suppliers 10 and 11 BOTH late   -> neither blamed
    // order 3: single-supplier 12 late         -> not blamed (no co-supplier)
    // order 4: supplier 11 late, 12 on time    -> 11 blamed
    val perSupp = Seq(
      (1L, 10L, 1L), (1L, 11L, 0L),
      (2L, 10L, 1L), (2L, 11L, 1L),
      (3L, 12L, 1L),
      (4L, 11L, 1L), (4L, 12L, 0L)
    ).toDF("l_orderkey", "l_suppkey", "late")
    val got = operators.Relational.soleLateCounts(perSupp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 11L -> 1L), s"got $got")
  }

  test("cusum closed form replays the max(0, ...) recursion") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1).toDouble)
    val n = ser.length
    val mu = ser.sum / n
    val sigma = math.sqrt(math.max(
      ser.map(x => x * x).sum / n - mu * mu, 0.0))
    var sp = 0.0; var sn = 0.0
    val want = ser.map { x =>
      sp = math.max(0.0, sp + (x - mu - 0.5 * sigma))
      sn = math.max(0.0, sn + (mu - x - 0.5 * sigma))
      (sp, sn)
    }
    val got = operators.Payroll.cusum(spark, sf0001)
      .orderBy("month").collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(got.length == n)
    got.zip(want).zipWithIndex.foreach { case (((gp, gn), (wp, wn)), i) =>
      assert(math.abs(gp - wp) < 1e-3, s"cusum_pos row $i: $gp vs $wp")
      assert(math.abs(gn - wn) < 1e-3, s"cusum_neg row $i: $gn vs $wn")
    }
  }

  test("nation trade excludes intra-nation pairs and sums to the cross-nation total") {
    val rows = operators.Relational.nationTrade(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    assert(rows.forall(_.getDouble(3) > 0.0))
  }

  test("trailing 90-day spend matches a driver-side replay") {
    def epochDay(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime / 86400000L
      case d: java.time.LocalDateTime => d.toLocalDate.toEpochDay
      case d: java.time.Instant => d.getEpochSecond / 86400L
    }
    val orders = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), epochDay(r.get(1)), r.getDouble(2)))
    val want = orders.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
      rows.toSeq.map { case (_, d, _) =>
        val s = rows.filter(r => r._2 >= d - 89 && r._2 <= d)
          .map(r => BigDecimal(r._3).setScale(8, BigDecimal.RoundingMode.HALF_UP))
          .sum
        (c, d) -> s.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = operators.Relational.trailing90dSpend(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = (r.getLong(0), epochDay(r.get(1)))
      assert(math.abs(r.getDouble(2) - want(k)) < 1e-6,
        s"spend at $k: ${r.getDouble(2)} vs ${want(k)}")
    }
  }

  test("bot scores: CV replayed driver-side from exact integer gap sums") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      if (gaps.length < 9) None
      else {
        val n = gaps.length.toLong
        val s1 = gaps.sum
        val s2d = gaps.map(g => BigInt(g) * BigInt(g)).sum.toDouble
        val mean = s1.toDouble / n
        val vr = math.max((n * s2d - s1.toDouble * s1.toDouble) / (n * n).toDouble, 0.0)
        val cv = math.round(math.sqrt(vr) / mean * 10000) / 10000.0
        Some(u -> (n, cv))
      }
    }
    val got = graft.streaming.Events.botScores(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == math.min(20, want.size), s"${got.length} rows")
    got.foreach { case (u, n, cv) =>
      val (wn, wcv) = want(u)
      assert(n == wn && cv == wcv, s"user $u: ($n, $cv) != ($wn, $wcv)")
    }
    // top-20 really are the minimum CVs
    val worstKept = got.map(_._3).max
    val bestDropped = want.filterNot(w => got.exists(_._1 == w._1))
      .map(_._2._2)
    assert(bestDropped.isEmpty || bestDropped.min >= worstKept)
  }

  test("drawdown: running peak and percentages replayed driver-side") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1))
    val got = graft.operators.Payroll.queries("payroll_drawdown")(spark, sf0001)
      .collect()
    assert(got.length == ser.length)
    var peak = Long.MinValue
    got.zip(ser).foreach { case (r, emp) =>
      peak = math.max(peak, emp)
      assert(r.getLong(1) == emp && r.getLong(2) == peak)
      assert(r.getLong(3) == peak - emp)
      assert(r.getDouble(4) ==
        math.round((peak - emp).toDouble / peak * 100 * 10000) / 10000.0)
      assert(r.getBoolean(5) == (emp < peak))
    }
    assert(got.exists(_.getBoolean(5)), "series never draws down?")
  }

  test("turning points: strict local extrema, alternating after dedup of runs") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect().map(_.getLong(1))
    val want = (1 until ser.length - 1).flatMap { i =>
      if (ser(i) > ser(i - 1) && ser(i) > ser(i + 1)) Some((i, "peak"))
      else if (ser(i) < ser(i - 1) && ser(i) < ser(i + 1)) Some((i, "trough"))
      else None
    }
    val got = graft.operators.Payroll.queries("payroll_turning_points")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got.length == want.length, s"${got.length} points vs ${want.length}")
    got.zip(want).foreach { case ((emp, kind), (i, wkind)) =>
      assert(emp == ser(i) && kind == wkind)
    }
    assert(got.map(_._2).toSet.subsetOf(Set("peak", "trough")))
    assert(got.nonEmpty, "fixture series has no strict extrema")
  }

  test("benford audit: digit shares sum to 1, chi2 terms replayed driver-side") {
    val got = graft.operators.Relational.queries("rel_benford_prices")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq.forall(d => d >= 1 && d <= 9))
    val prices = Tables.lineitem(spark, sf0001)
      .select("l_extendedprice").collect().map(_.getDouble(0)).filter(_ > 0)
    val digits = prices.map(p =>
      math.floor(p / math.pow(10.0, math.floor(math.log10(p)))).toLong)
    val n = digits.length.toDouble
    got.foreach { case (d, cnt, obs, exp, chi2) =>
      assert(cnt == digits.count(_ == d), s"digit $d count")
      assert(obs == math.round(cnt / n * 10000) / 10000.0)
      val e = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(exp == math.round(e * 10000) / 10000.0)
      val dev = cnt - e * n
      assert(chi2 == math.round(dev * dev / (e * n) * 10000) / 10000.0,
        s"digit $d chi2")
    }
    val shareSum = got.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum to $shareSum")
  }

  test("market basket: lift replayed driver-side on the co-order pairs") {
    val op = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = op.map(_._1).distinct.length.toLong
    val perPart = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nAb = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        nAb((ps(i), ps(j))) = nAb.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val want = nAb.filter(_._2 >= 3).toSeq.map { case ((a, b), ab) =>
      val lift = math.round(ab * n / (perPart(a) * perPart(b)).toDouble * 1e6) / 1e6
      (a, b, ab, lift)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    val got = graft.operators.Relational.queries("rel_market_basket")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5)))
    assert(got.toSeq == want, s"first diff ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty && got.forall(_._4 > 0))
  }

  test("order sessions: gaps-and-islands replayed driver-side") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val want = orders.groupBy(_._1).flatMap { case (cust, os) =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
      var sid = 0L
      var prev: java.time.LocalDate = null
      val sessions = sorted.map { o =>
        if (prev == null || o._3.toEpochDay - prev.toEpochDay > 90) sid += 1
        prev = o._3
        (sid, o._3)
      }
      sessions.groupBy(_._1).map { case (s, ds) =>
        (cust, s) -> (ds.length.toLong,
          ds.map(_._2).minBy(_.toEpochDay), ds.map(_._2).maxBy(_.toEpochDay))
      }
    }
    val got = graft.operators.Relational.queries("rel_order_sessions")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDate(3).toLocalDate, r.getDate(4).toLocalDate))
      .toMap
    assert(got.size == want.size, s"${got.size} sessions vs ${want.size}")
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"session $k: ${got(k)} != $v")
    }
    // islands really split: more sessions than customers
    assert(got.size > orders.map(_._1).distinct.length)
  }

  test("hll intersection: exact overlap replayed driver-side, estimate certifies") {
    val got = graft.streaming.Events.hllIntersection(spark, sf0001).collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("view", "purchase"))
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    got.foreach { r =>
      val day = r.getDate(0).toString
      val vs = ev.filter(e => e._1 == day && e._2 == "view").map(_._3).toSet
      val ps = ev.filter(e => e._1 == day && e._2 == "purchase").map(_._3).toSet
      assert(r.getLong(1) == vs.size && r.getLong(2) == ps.size)
      assert(r.getLong(3) == (vs intersect ps).size, s"day $day overlap")
      assert(r.getLong(3) <= math.min(vs.size, ps.size))
      assert(r.getBoolean(4), s"day $day estimate failed certification")
    }
  }

  test("autocorr matches a driver-side ACF replay and lag-0 normalization") {
    val ser = Tables.monthlySeriesCached(spark, sf0001)
      .orderBy("month").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byMonth = ser.toMap
    val mean = {
      val s = ser.map(x => BigDecimal(x._2).setScale(8)).sum
      (s.toDouble / ser.length)
    }
    val den = ser.map { case (_, x) =>
      BigDecimal((x - mean) * (x - mean))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val got = graft.operators.Payroll.queries("payroll_autocorr")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1L to 12L))
    got.foreach { case (lag, nPairs, acf) =>
      val pairs = ser.flatMap { case (m, x) =>
        byMonth.get(m.minusMonths(lag)).map(y => (x, y))
      }
      assert(pairs.length.toLong == nPairs, s"lag $lag pair count")
      val num = pairs.map { case (x, y) =>
        BigDecimal((x - mean) * (y - mean))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val want = math.round(num / den * 10000) / 10000.0
      assert(acf == want, s"lag $lag: $acf != $want")
      assert(acf >= -1.0001 && acf <= 1.0001, s"lag $lag out of range")
    }
  }

  test("order-count distribution partitions the customer table") {
    val dist = operators.Relational.orderCountDist(spark, sf0001)
      .agg(sum("custdist")).head().getLong(0)
    val nCust = Tables.customer(spark, sf0001).count()
    assert(dist == nCust, s"$dist vs $nCust")
  }

  test("decayed counts: bounded by raw counts and match a driver-side replay") {
    val rows = streaming.Events.decayCounts(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")).as("tsu")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val h = ev.map(_._2).max
    val want = ev.groupBy(_._1).view.mapValues { es =>
      val d = es.map { case (_, t) =>
        BigDecimal(math.pow(2.0, -(h - t).toDouble / 8.64e10))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (es.length.toLong, (d.setScale(4, BigDecimal.RoundingMode.HALF_UP)).toDouble)
    }.toMap
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, d) = want(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n_events")
      assert(r.getDouble(2) == d, s"${r.getString(0)} decayed: ${r.getDouble(2)} != $d")
      assert(r.getDouble(2) <= n.toDouble, "decayed must not exceed raw")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0, "recency in (0,1]")
    }
  }
}

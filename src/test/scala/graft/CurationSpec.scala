package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Text}

/** Curation operators: deterministic sampling + the end-to-end
  * pipeline. The samplers' whole value proposition is replayability,
  * so the tests recompute the hash decisions independently (JVM
  * MessageDigest, not Spark) and re-run queries to assert identical
  * output.
  */
class CurationSpec extends SparkSpec {

  /** Independent recomputation of docHash60: first 15 md5 hex digits
    * of (key || doc_id) as a long. */
  private def jvmHash60(key: String, docId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key$docId".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("batchNovelty == JVM replay over shingle sets") {
    val got = Curation.batchNovelty(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val tk = t.trim.split("\\s+")
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val baseSh = docs.filter(_._1 % 7 != 0).flatMap(d => shingles(d._3)).toSet
    val expect = docs.filter(_._1 % 7 == 0)
      .flatMap { case (_, src, t) => shingles(t).map(src -> _) }
      .distinct.groupBy(_._1).toSeq.map { case (src, ps) =>
        val n = ps.length.toLong
        val novel = ps.count(p => !baseSh.contains(p._2)).toLong
        (src, n, novel, BigDecimal(novel.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sorted
    assert(got == expect, s"got=$got expect=$expect")
    // the fixture must exercise both seen and novel shingles
    assert(got.exists(_._3 > 0) && got.exists(r => r._3 < r._2))
  }

  test("balancedClasses == JVM replay: minority-size quota, hash-order draw") {
    val got = Curation.balancedClasses(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val all = Tables.embeddings(spark, sf0001).select("vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val quota = all.groupBy(_._2).values.map(_.size).min
    val expect = all.groupBy(_._2).toSeq.flatMap { case (label, ms) =>
      ms.map { case (id, _) => (jvmHash60("balance:", id), id) }
        .sorted.take(quota).zipWithIndex
        .map { case ((_, id), i) => (label, id, (i + 1).toLong) }
    }.sorted
    assert(got.toSeq.sorted == expect, "balanced draw diverges from JVM replay")
    // every class lands at exactly the minority size
    got.groupBy(_._1).values.foreach(rs => assert(rs.size == quota))
  }

  test("drift PSI matches an independent JVM replay; a random split reads stable") {
    val got = Curation.drift(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    assert(got.map(_._1).toSeq == Seq("n_chars", "n_tokens", "n_types"))
    // the %7 split is hash-random w.r.t. every signal, so no signal
    // may read as drifted on the fixture
    got.foreach(r => assert(r._6 == "stable", s"random split flagged: $r"))
    // exact replay: same signals, binary-magnitude bins, smoothing,
    // 12-dp ln terms, decimal sum, 4-dp PSI
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sv = docs.flatMap { case (id, text, nChars) =>
      val tk = text.trim.split("\\s+").toSeq
      Seq(("n_chars", id, nChars), ("n_tokens", id, tk.size.toLong),
        ("n_types", id, tk.distinct.size.toLong))
    }
    val expect = sv.groupBy(_._1).toSeq.sortBy(_._1).map { case (sig, rows) =>
      val binned = rows.map { case (_, id, v) =>
        (java.lang.Long.toBinaryString(v).length, id % 7 == 0)
      }
      val buckets = binned.groupBy(_._1)
      val (nBase, nCur) = (binned.count(!_._2).toLong, binned.count(_._2).toLong)
      val nBins = buckets.size.toLong
      val terms = buckets.values.map { bs =>
        val (cb, cc) = (bs.count(!_._2).toLong, bs.count(_._2).toLong)
        val p = (cb + 1).toDouble / (nBase + nBins)
        val q = (cc + 1).toDouble / (nCur + nBins)
        BigDecimal((p - q) * math.log(p / q))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val psi = terms.sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (sig, nBase, nCur, nBins, psi)
    }
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq == expect,
      s"got=${got.toSeq} expect=$expect")
  }

  test("hashBernoulli matches an independent JVM md5 recomputation") {
    val got = Curation.hashBernoulli(spark, sf0001)
      .select("doc_id", "sample_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expect = all.map(id => id -> jvmHash60("sample:", id) % 100)
      .filter(_._2 < 20).toMap
    assert(got == expect, s"sample of ${got.size} != expected ${expect.size}")
    assert(got.nonEmpty && got.size < all.length)
  }

  test("hashBernoulli is stable across re-execution (no rand())") {
    val a = Curation.hashBernoulli(spark, sf0001).collect().toSeq
    val b = Curation.hashBernoulli(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("hashBernoulli plan is map-only: no hash-partition exchange, no broadcast") {
    val plan = Curation.hashBernoulli(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"sampler should not shuffle by key:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"sampler should not broadcast:\n$plan")
  }

  test("stratifiedSample equals the one-window reference form") {
    val twoPhase = Curation.stratifiedSample(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val h = conv(substring(md5(concat(lit("strat:"),
      col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val oneWindow = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang")).withColumn("h", h)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 25)
      .select("lang", "doc_id", "rk")
      .orderBy("lang", "rk")
      .collect().map(_.toSeq).toSeq
    assert(twoPhase == oneWindow)
  }

  test("stratifiedSample fills every language's quota exactly") {
    val counts = Curation.stratifiedSample(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every sf0.001 stratum has >= 64 docs, so all quotas fill
    assert(counts.keySet == Set("en", "de", "fr", "es", "zh"))
    assert(counts.values.forall(_ == 25L), counts.toString)
  }

  test("stratifiedSample never ranks a whole stratum on one task") {
    val plan = Curation.stratifiedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    // phase 1 must window over (lang, salt) — the salted slices —
    // before any per-lang window sees data
    val firstWindow = plan.split("\n").filter(_.contains("Window"))
      .lastOption.getOrElse("") // physical plans print leaves last
    assert(firstWindow.contains("salt"),
      s"phase-1 window should partition by (lang, salt):\n$plan")
  }

  test("neymanSample: budget lands exactly; allocation tracks N_h * S_h") {
    val rows = Curation.neymanSample(spark, sf0001).collect()
    val alloc = rows.map(r => r.getString(0) ->
      ((r.getLong(3), r.getDouble(4)))).toMap
    // realized sample = one row per (source, rk <= n_alloc)
    val bySrc = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    bySrc.foreach { case (src, n) =>
      assert(n.toLong == alloc(src)._1, s"$src realized $n != alloc") }
    assert(bySrc.values.sum == 200, s"total ${bySrc.values.sum} != budget")
    // allocation must follow the Neyman weights: recompute driver-side
    val docs = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length.toLong))
    val w = docs.groupBy(_._1).view.mapValues { ds =>
      val xs = ds.map(_._2.toDouble)
      val n = xs.length.toDouble
      val s2 = (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / n
      n * BigDecimal(math.sqrt(s2))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val wTot = w.values.sum
    w.foreach { case (src, wh) =>
      val ideal = 200.0 * wh / wTot
      val got = alloc(src)._1.toDouble
      assert(math.abs(got - ideal) <= 1.0 + 1e-9,
        s"$src alloc $got too far from ideal $ideal")
    }
  }

  test("pipeline_curation output satisfies every gate it composes") {
    SessionMemo.clear(spark)
    val out = Curation.pipeline(spark, sf0001).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet

    // budget gate: the curate-hash decision holds for every kept doc
    assert(ids.forall(id => jvmHash60("curate:", id) % 100 < 50))

    // dedup gate: every kept doc is its cluster's representative
    val reps = Dedup.clusters(spark, sf0001)
      .filter(col("doc_id") === col("cluster_rep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(reps))

    // quality + language gates: cross-check against the declared
    // text queries (same definitions, independent plans)
    val qualityOk = Text.quality(spark, sf0001)
      .filter(col("quality_ok")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val predEn = Text.langId(spark, sf0001)
      .filter(col("pred_lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(qualityOk))
    assert(ids.subsetOf(predEn))

    // and maximal: no doc passing all four gates is missing
    val expect = (qualityOk & predEn & reps)
      .filter(id => jvmHash60("curate:", id) % 100 < 50)
    assert(ids == expect)
  }

  test("token shards: two-phase prefix sum equals the one-window running total") {
    val twoPhase = Curation.tokenShards(spark, sf0001).collect().map(_.toSeq).toSeq
    // reference: the naive single global window (fine at test scale)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("start") / lit(4096L)).as("shard"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(twoPhase == naive)
    // shards are contiguous, non-decreasing, and start at 0
    val shards = twoPhase.map(_(2).asInstanceOf[Long])
    assert(shards.head == 0L)
    assert(shards.zip(shards.tail).forall { case (a, b) => b == a || b == a + 1 || b > a })
    assert(shards.zip(shards.tail).forall { case (a, b) => b >= a })
  }

  test("token shards are invariant under the prefix-sum bucket width") {
    val ref = Curation.tokenShards(spark, sf0001, 100L)
      .collect().map(_.toSeq).toSeq
    // widths spanning one-doc buckets to one-bucket-holds-everything
    Seq(1L, 7L, 64L, 1000000L).foreach { w =>
      val alt = Curation.tokenShards(spark, sf0001, w).collect().map(_.toSeq).toSeq
      assert(alt == ref, s"bucket width $w changed the shard assignment")
    }
  }

  test("token shards plan: window is bucket-partitioned, never global") {
    val plan = Curation.tokenShards(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(bucket"),
      s"prefix-sum window lost its bucket partitioning:\n$plan")
  }

  test("weighted sample matches an independent JVM A-ES recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def r6(v: Double) = BigDecimal.valueOf(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keys = docs.map { case (id, t) =>
      val w = t.trim.split("\\s+").length.toDouble
      val u = (jvmHash60("wsample:", id).toDouble + 1.0) / math.pow(2, 60)
      (id, w.toLong, r6(math.pow(u, 1.0 / w)))
    }
    val expect = keys.sortBy(k => (-k._3, k._1)).take(50).toSeq
    val got = Curation.weightedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
    // weighting is real: the sample's mean weight exceeds the corpus's
    val corpusMean = keys.map(_._2).sum.toDouble / keys.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean vs corpus $corpusMean")
  }

  test("decontamination matches an independent JVM n-gram recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def ngrams(t: String): Set[Long] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 5) Set.empty
      else (0 to ts.length - 5).map { i =>
        val s = ts.slice(i, i + 5).mkString(" ")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
      }.toSet
    }
    val evalNg = docs.filter(_._1 % 37 == 0).flatMap(x => ngrams(x._2)).toSet
    val expect = docs.filter(_._1 % 37 != 0).map { case (id, t) =>
      id -> (ngrams(t) & evalNg).size.toLong
    }.toMap
    val got = Curation.decontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // flag column is consistent with the count
    Curation.decontaminate(spark, sf0001).collect().foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) > 0))
    }
    // eval docs never appear in the output
    assert(got.keySet.forall(_ % 37 != 0))
  }

  test("context chunks: full coverage, fixed stride, short tail only") {
    val nByDoc = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").length)
      .toMap
    val chunks = Curation.contextChunks(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == nByDoc.keySet)
    chunks.foreach { case (id, rows) =>
      val n = nByDoc(id)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.length == 1 + math.ceil(math.max(n - 64, 0) / 48.0).toInt,
        s"chunk count doc $id")
      sorted.zipWithIndex.foreach { case (r, k) =>
        assert(r.getLong(1) == k, s"chunk_id doc $id")
        assert(r.getLong(2) == k * 48L, s"start doc $id chunk $k")
        assert(r.getLong(3) == math.min(64, n - k * 48), s"len doc $id chunk $k")
      }
      // the last chunk reaches the end of the doc: every token covered
      val lastRow = sorted.last
      assert(lastRow.getLong(2) + lastRow.getLong(3) == n, s"tail doc $id")
    }
  }

  test("context chunks plan is map-only: no data shuffle before the sort") {
    val plan = Curation.contextChunks(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"chunking must not hash-shuffle:\n$plan")
  }

  test("cross-modal split: image/embedding duplicates never straddle the split") {
    val split = Curation.crossModalSplit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // the pairs the TEXT-ONLY split cannot see: verified embedding
    // near-dups and image duplicates must still land same-side here
    val embPairs = ext.Similarity.embeddingNearDups(spark, sf0001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val imgPairs = ext.Multimodal.imageDedup(spark, sf0001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(embPairs.nonEmpty && imgPairs.nonEmpty, "fixture lost its dup pairs")
    (embPairs ++ imgPairs).foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"cross-modal pair ($a, $b) straddles the split: " +
          s"${split(a)} vs ${split(b)}")
    }
    // and the split is non-degenerate
    val vals = split.values.count(_ == "val")
    assert(vals > 0 && vals < split.size, s"degenerate split: $vals/${split.size}")
  }

  test("leak-free split: cluster members never straddle, coordinate is the rep hash") {
    val out = Curation.leakFreeSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    // every member of a cluster carries its rep's split
    out.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $rep straddles the split")
    }
    // the coordinate is md5-60("split:" + rep) % 1000 < 100
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(rep: Long): Long = {
      md.reset()
      val hex = md.digest(s"split:$rep".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    out.foreach { case (doc, rep, split) =>
      val want = if (h(rep) < 100) "val" else "train"
      assert(split == want, s"doc $doc rep $rep: $split != $want")
    }
    val vals = out.count(_._3 == "val")
    assert(vals > 0 && vals < out.length, s"degenerate split: $vals/${out.length}")
  }

  test("pipeline_curation joins the cluster map shuffle-hash, never broadcast") {
    SessionMemo.clear(spark)
    val plan = Curation.pipeline(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"reps join should be shuffle-hash:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"corpus-derived cluster map must not broadcast:\n$plan")
  }

  test("profile: one-pass stats are exact and the HLL certifies") {
    val li = Tables.lineitem(spark, sf0001)
    val n = li.count()
    val rows = Curation.profileColumns(spark, sf0001).collect()
    assert(rows.length == 11, s"expected 11 profiled columns, got ${rows.length}")
    rows.foreach { r =>
      val name = r.getString(0)
      assert(r.getLong(1) == n, s"$name n_rows ${r.getLong(1)} != $n")
      assert(r.getLong(2) == 0L, s"$name unexpected nulls")
      assert(r.getLong(3) > 0 && r.getLong(3) <= n, s"$name ndv out of range")
      assert(r.getDouble(4) <= r.getDouble(5), s"$name min > max")
      assert(r.getBoolean(6), s"$name HLL estimate escaped its 3σ envelope")
    }
    // spot-exact against an independent path: distinct flag lengths
    val exact = li.select(length(col("l_returnflag"))).distinct().count()
    val rf = rows.find(_.getString(0) == "l_returnflag").get
    assert(rf.getLong(3) == exact)
    // the whole profile is ONE scan of lineitem
    val plan = Curation.profileColumns(spark, sf0001)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"profile should scan lineitem once, saw $scans:\n$plan")
  }

  test("profile above the gate: certification sample-bounded, stats full-population") {
    val li = Tables.lineitem(spark, sf0001)
    val n = li.count()
    val full = Curation.profileColumns(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    // gate far below the corpus: forces the sampled-certification branch
    val gated = Curation.profileColumnsGated(spark, sf0001, 1000L).collect()
    assert(gated.length == 11, s"expected 11 profiled columns, got ${gated.length}")
    gated.foreach { r =>
      val name = r.getString(0)
      val f = full(name)
      assert(r.getLong(1) == n, s"$name n_rows must stay full-population")
      assert(r.getLong(2) == f.getLong(2), s"$name n_null must stay full-population")
      assert(r.getDouble(4) == f.getDouble(4) && r.getDouble(5) == f.getDouble(5),
        s"$name min/max must stay full-population")
      assert(r.getLong(3) > 0 && r.getLong(3) <= f.getLong(3),
        s"$name sampled ndv must be a positive subset count")
      assert(r.getBoolean(6), s"$name certification must hold on the sample")
    }
    // md5-keyed sample: bit-stable across runs
    val again = Curation.profileColumnsGated(spark, sf0001, 1000L).collect()
    assert(gated.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "gated profile must be deterministic")
  }

  test("poisson bootstrap: replicate means bracket the true mean, JVM replay") {
    val got = Curation.poissonBootstrap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L until 16L))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
    val trueMean = docs.map(_._2).sum.toDouble / docs.length
    // Poisson(1): n_eff ~ N(500, sqrt 500); 5 sigma ~ 112
    got.foreach { case (b, nEff, m) =>
      assert(math.abs(nEff - docs.length) < 120, s"replicate $b n_eff $nEff")
      assert(math.abs(m - trueMean) < trueMean * 0.2, s"replicate $b mean $m")
    }
    assert(got.map(_._3).distinct.length > 1, "replicates must differ")
    // exact JVM replay of replicate 0
    val md = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cdf = { // same ladder as the engine
      val e = math.exp(-1.0); var f = 1.0; var c = 0.0
      (0 to 8).map { k => if (k > 0) f *= k; c += e / f; c }
    }
    var sw = 0L; var swx = 0L
    docs.foreach { case (id, x) =>
      val h = java.lang.Long.parseLong(md(s"boot0:$id").take(15), 16)
      val u = (h.toDouble + 1.0) / math.pow(2.0, 60)
      val w = cdf.indexWhere(u <= _) match { case -1 => 9L; case k => k.toLong }
      sw += w; swx += w * x
    }
    val (_, nEff0, mean0) = got.head
    assert(nEff0 == sw, s"replicate 0 n_eff $nEff0 != JVM $sw")
    assert(mean0 == math.round(swx.toDouble / sw * 10000) / 10000.0)
  }

  test("epoch shuffle: exact permutation per epoch, decorrelated across epochs") {
    val got = Curation.epochShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    (0L until 2L).foreach { e =>
      val ep = got.filter(_._1 == e)
      assert(ep.map(_._3).sorted.toSeq == (1L to n),
        s"epoch $e positions are not an exact 1..$n permutation")
      // JVM replay: position order == (md5 hash, doc_id) order
      val md = (s: String) => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = ep.map(_._2).sortBy(id =>
        (java.lang.Long.parseLong(md(s"epoch$e:$id").take(15), 16), id))
      val gotOrder = ep.sortBy(_._3).map(_._2)
      assert(gotOrder.toSeq == want.toSeq, s"epoch $e order diverges from the hash")
    }
    // different epochs yield different traversals
    val o0 = got.filter(_._1 == 0).sortBy(_._3).map(_._2).toSeq
    val o1 = got.filter(_._1 == 1).sortBy(_._3).map(_._2).toSeq
    assert(o0 != o1, "epoch permutations must differ")
  }

  test("DSIR sample matches an independent JVM importance-ratio recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md5hex = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"dsir:$tok").take(15), 16) % 512
    val tb = docs.flatMap { case (id, src, text) =>
      text.trim.split("\\s+").map(t => (id, src, bucket(t))) }
    val raw = tb.groupBy(_._3).view.mapValues(_.length).toMap
    val tgt = tb.filter(_._2 == "src0").groupBy(_._3).view.mapValues(_.length).toMap
    val rawN = tb.length.toDouble
    val tgtN = tb.count(_._2 == "src0").toDouble
    def r8(v: Double) =
      BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val lr = raw.map { case (b, cr) =>
      b -> (r8(math.log((tgt.getOrElse(b, 0) + 1.0) / (tgtN + 512.0)))
        - r8(math.log((cr + 1.0) / (rawN + 512.0))))
    }
    val perDoc = tb.groupBy(_._1).map { case (id, ts) =>
      id -> (math.round(ts.map(t => lr(t._3)).sum.toDouble * 10000) / 10000.0)
    }
    val want = perDoc.toSeq.sortBy { case (id, v) => (-v, id) }
      .take(100).map { case (id, v) => (id, v) }
    val got = Curation.dsirSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("log_ratio")))
    assert(got.length == 100 && got.map(_._1).distinct.length == 100)
    assert(got.toSeq == want,
      s"first diff: ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
  }

  test("KMV sketch: k smallest distinct hashes, mergeable, exact below k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.KmvSketch.kmvSketch
    // independent md5-60 replay of the aggregate's internal hash
    def h60(v: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmv:$v".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    // 1000 string values, each twice: the k=16 sketch must hold the
    // 16 smallest DISTINCT hashes of them
    val vals = (0L until 1000L).map(_.toString)
    val want = vals.map(h60).distinct.sorted.take(16)
    val df = vals.flatMap(v => Seq(v, v)).toDF("v")
    val got = df.agg(kmvSketch(col("v"), 16)).head().getSeq[Long](0)
    assert(got == want, s"got $got")
    // below k: ALL distinct hashes, sorted (the exact regime)
    val small = vals.take(5).toDF("v")
      .agg(kmvSketch(col("v"), 16)).head().getSeq[Long](0)
    assert(small == vals.take(5).map(h60).sorted)
    // merge across partitions == single-partition result
    val onePart = df.coalesce(1).agg(kmvSketch(col("v"), 16))
      .head().getSeq[Long](0)
    val manyPart = df.repartition(13).agg(kmvSketch(col("v"), 16))
      .head().getSeq[Long](0)
    assert(onePart == manyPart, "KMV merge is not partition-invariant")
    // nulls ignored
    val withNulls = df.select(
        when(col("v").cast("long") < 100, col("v")).as("v"))
      .agg(kmvSketch(col("v"), 16)).head().getSeq[Long](0)
    assert(withNulls ==
      vals.filter(_.toLong < 100).map(h60).distinct.sorted.take(16))
  }

  test("temperature mixture replays exactly and upweights low-resource langs") {
    import java.math.{BigDecimal => JBD}
    // Spark's Round on double goes BigDecimal.valueOf (Double.toString
    // canonical form) → setScale HALF_UP — replay exactly that
    def r(x: Double, dp: Int): Double =
      JBD.valueOf(x).setScale(dp, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "doc_id", "text").collect()
      .map(row => (row.getString(0), row.getLong(1),
        row.getString(2).trim.split("\\s+").length.toLong))
    val perLang = docs.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val corpus = perLang.values.sum
    // q_l = round8(sqrt(p_l)); Z sums the 8-dp decimals exactly
    val q = perLang.view.mapValues(n =>
      r(math.sqrt(n.toDouble / corpus.toDouble), 8)).toMap
    val z = q.values.map(x => BigDecimal(x).setScale(8)).sum.toDouble
    val rate = q.map { case (l, ql) =>
      l -> r(math.min(1.0, corpus.toDouble * 0.5 * (ql / z) / perLang(l)), 8)
    }
    val kept = docs.filter { case (l, id, _) =>
      (jvmHash60("temp:", id) % 1000000).toDouble / 1000000.0 < rate(l) }
    val expect = kept.groupBy(_._1).view.mapValues(ds =>
      (ds.length.toLong, ds.map(_._3).sum)).toMap
    val got = Curation.temperatureMixture(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { row =>
      val l = row.getString(0)
      assert((row.getLong(1), row.getLong(2)) == expect(l), s"lang $l")
      assert(row.getDouble(3) == r(rate(l), 4), s"rate $l")
    }
    // α = 1/2 monotonicity: more natural tokens → lower (≤) keep rate
    val byN = perLang.toSeq.sortBy(-_._2).map(p => rate(p._1))
    assert(byN.zip(byN.tail).forall { case (hi, lo) => hi <= lo },
      s"temperature must not upweight a higher-resource language: $rate")
    assert(rate.values.forall(x => x > 0.0 && x <= 1.0))
  }

  test("length buckets: ladder replay, totals, and truncation rule") {
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.split("\\s+").length.toLong)
    val ladder = Seq(16L, 32L, 64L, 128L, 256L, 512L)
    def bucketOf(n: Long) = ladder.find(n <= _).getOrElse(ladder.last)
    val expect = lens.groupBy(bucketOf).view.mapValues { ns =>
      (ns.length.toLong, ns.map(n => math.min(n, 512L)).sum,
        ns.count(_ > 512L).toLong)
    }.toMap
    val rows = Curation.lengthBuckets(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val b = r.getLong(0)
      val (nd, tt, tr) = expect(b)
      assert(r.getLong(1) == nd && r.getLong(2) == tt && r.getLong(3) == tr,
        s"bucket $b")
      assert(r.getLong(4) == nd * b, s"padded tokens bucket $b")
      val waste = r.getDouble(5)
      assert(waste >= 0.0 && waste < 1.0, s"waste out of range: $waste")
      if (b != ladder.last)
        assert(tr == 0L, "truncation outside the top bucket")
    }
    assert(rows.map(_.getLong(1)).sum == lens.length,
      "every document lands in exactly one bucket")
  }

  test("scrub->pack composes: chunks cover exactly the survivor token stream") {
    // survivor counts from the scrub query are the ground truth the
    // chunker must cover: per doc, 1 + ceil(max(n-64,0)/48) chunks,
    // token coverage = n for n <= 64 docs, and a fully-scrubbed doc
    // still emits one empty chunk (md5 of "")
    val survivors = Dedup.spanScrubOf(Tables.documents(spark, sf0001))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    val got = Curation.scrubPack(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == survivors.keySet,
      "scrub->pack must emit chunks for every tokenizable doc")
    got.foreach { case (d, rows) =>
      val n = survivors(d)
      val expect = 1 + math.ceil(math.max(n - 64, 0L) / 48.0).toLong
      assert(rows.length.toLong == expect,
        s"doc $d: ${rows.length} chunks for $n survivor tokens")
      if (n <= 64) {
        assert(rows.head.getLong(3) == n,
          s"doc $d: single chunk must hold all $n survivors")
        if (n == 0)
          assert(rows.head.getString(4) ==
            "d41d8cd98f00b204e9800998ecf8427e", // md5("")
            s"doc $d: empty chunk checksum")
      }
    }
    // the composition actually scrubbed something: at least one doc
    // chunks differently than the raw-text chunker
    val raw = Curation.contextChunks(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    assert(got.exists { case (d, rows) =>
      raw.get(d).exists(_.map(_.getString(4)).toSeq !=
        rows.map(_.getString(4)).toSeq)
    }, "no doc's chunks changed — the scrub step is a no-op on this fixture")
  }

  test("KMV estimate lands inside its certification envelope on the corpus") {
    // the declared query's own certification runs oracle-side; this
    // pins the same property in-JVM so a regression fails fast
    val rows = graft.ext.Curation.profileColumnsSketch(spark, sf0001).collect()
    assert(rows.length == 11)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"sketch_ok must be claimed TRUE: $r")
      assert(r.getLong(3) >= 1L, s"degenerate estimate: $r")
    }
  }
}

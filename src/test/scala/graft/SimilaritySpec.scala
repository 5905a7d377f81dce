package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot product folds exactly") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0) == 32.0)
  }

  test("brute-force top-k: k rows per query, cosine in [-1, 1], rank dense") {
    val r = Similarity.bruteForceTopK(spark, sf0001).collect()
    val byQuery = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L, 3L)))
      assert(rows.forall(x => math.abs(x.getAs[Double]("cos")) <= 1.0 + 1e-9))
    }
  }

  test("LSH signature width is population-scaled: occupancy bounded at any n") {
    // bits = smallest b with 2^b >= ceil(n/occ): expected bucket
    // occupancy n/2^bits sits in (occ/2, occ] for every corpus size
    // above the floor — per-query candidate volume is O(1) in n, the
    // property that killed the r9 headroom growth
    for (n <- Seq(500L, 2000L, 20000L, 1000000L, 100000000L)) {
      val b = Similarity.sigBitsFor(n)
      val occ = n.toDouble / (1L << b)
      assert(occ <= 32.0 + 1e-9, s"n=$n bits=$b occupancy $occ > target")
      if (b > 4 && b < 24) // between floor and cap the bound is two-sided
        assert(occ > 16.0 - 1e-9, s"n=$n bits=$b occupancy $occ < target/2")
    }
    // floor and exact boundaries
    assert(Similarity.sigBitsFor(1L) == 4)
    assert(Similarity.sigBitsFor(32L * 16) == 4)      // m=16 -> 4 bits
    assert(Similarity.sigBitsFor(32L * 16 + 1) == 5)  // m=17 -> 5 bits
    assert(Similarity.sigBitsFor(Long.MaxValue / 2) == 24) // capped
  }

  test("bucketed near-dup pairs recall the all-pairs scan") {
    val exact = Similarity.embeddingNearDupsAllPairs(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.embeddingNearDups(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucketed output is a subset by construction (candidates ∩ exact)
    assert(bucketed.subsetOf(exact), "bucketed produced a non-exact pair")
    if (exact.nonEmpty) {
      val recall = exact.count(bucketed.contains).toDouble / exact.size
      info(f"celled near-dup recall: $recall%.3f (${exact.size} exact pairs)")
      assert(recall >= 0.9, f"recall $recall%.3f — raise NearProbe / occupancy")
    }
  }

  test("near-dup candidate volume grows ~linearly with the corpus") {
    // The LSH design this replaced was candidate-quadratic by
    // parameter choice (fixed 3-bit buckets hold a FIXED FRACTION of
    // the corpus); the corpus-scaled k-means cells hold a fixed
    // OCCUPANCY instead, so per-item candidates stay ~constant as the
    // corpus grows. sf0.001 → sf0.1 is a 4× corpus (500 → 2000
    // vectors, and k leaves its floor: 8 → 32 cells); a fixed-k
    // bucketing would grow per-item candidates ~4× here — the bound
    // catches that regression with margin for cell imbalance.
    val n1 = Tables.embeddings(spark, sf0001).count()
    val n2 = Tables.embeddings(spark, "/root/testdata/sf0.1").count()
    assert(n2 >= 4 * n1, "fixture assumption: sf0.1 corpus is 4x sf0.001")
    val c1 = Similarity.nearDupCandidateCount(spark, sf0001)
    val c2 = Similarity.nearDupCandidateCount(spark, "/root/testdata/sf0.1")
    info(s"candidates/item: ${c1 / n1} (n=$n1) -> ${c2 / n2} (n=$n2)")
    assert(c2.toDouble / n2 <= 2.5 * c1.toDouble / n1,
      s"per-item candidate volume grew superlinearly: $c1/$n1 -> $c2/$n2")
  }

  test("near-dup recall holds at BENCH scale, not just on the tiny fixture") {
    // the sf0.001 fixture recalls 1.0 trivially (8 target cells); the
    // honest number is at sf0.1 where k leaves its floor — the r9
    // parameter sweep measured 0.81 here (flat r8 model: 0.72), and
    // this floor pins the knob choices (SubKmIters/CoarseProbe/
    // NearProbe) against silent recall decay
    val dir = "/root/testdata/sf0.1"
    val exact = Similarity.embeddingNearDupsAllPairs(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.embeddingNearDups(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact), "bucketed produced a non-exact pair")
    assert(exact.nonEmpty)
    val recall = exact.count(bucketed.contains).toDouble / exact.size
    info(f"bench-scale near-dup recall: $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.75, f"bench-scale recall $recall%.3f below 0.75")
  }

  test("near-dup model driver state is sublinear (~sqrt) in corpus size") {
    // The coarse centroid Seq is the ONLY driver-resident model state
    // (the corpus-scaled sub-centroids live in a cached DataFrame,
    // joined shuffle-hash). Its row count is ceil(sqrt(k)) with
    // k = ceil(n/64): 100x corpus -> ~10x driver rows. The flat r8
    // design held k = n/64 rows on the driver — 1.6M at n = 100·2^20;
    // the two-level model holds ~1.3k.
    def rows(n: Long): Int =
      Similarity.nearDupCoarseK(Similarity.nearDupK(n))
    val r1 = rows(1L << 20)
    val r100 = rows(100L * (1L << 20))
    info(s"driver centroid rows: n=2^20 -> $r1, n=100*2^20 -> $r100")
    assert(r100.toDouble / r1 <= 11.0,
      s"driver model rows grew faster than sqrt: $r1 -> $r100")
    assert(r100 < 5000, s"driver rows not bounded at 100M vectors: $r100")
    // the built model agrees with the derivation and keeps the
    // corpus-scaled sub-centroid table OUT of the driver
    val m = Similarity.nearDupModel(spark, sf0001)
    assert(m.coarse.size <= m.k1, "coarse model exceeds k1 rows")
    assert(m.k1.toLong * m.k1 >= m.k, "k1 must be at least sqrt(k)")
    assert(m.k1.toLong * m.k2 >= m.k, "k1*k2 must cover the k target cells")
    assert(m.subCents.storageLevel.useMemory,
      "sub-centroids must stay a cached DataFrame, never a driver Seq")
  }

  test("knn graph: ranks are dense and cosine-ordered, recall beats 0.7 of exact top-k") {
    val g = Similarity.knnGraph(spark, sf0001).collect()
    assert(g.nonEmpty, "fixture produced an empty knn graph")
    // per-vector: ranks run 1..m with non-increasing cosine
    g.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length.toLong),
        s"ranks not dense for vec ${sorted.head.getLong(0)}")
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getDouble(2) >= y.getDouble(2),
          s"cos not non-increasing for vec ${x.getLong(0)}")
        case _ => ()
      }
    }
    // recall vs the exact brute-force top-5 (JVM replay over the
    // fixture-sized corpus)
    val vecs = Tables.embeddings(spark, sf0001)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.flatMap { case (id, v) =>
      vecs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(5).map { case (nid, _) => (id, nid) }
    }.toSet
    val got = g.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(f"knn-graph recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.7, f"knn graph recall $recall%.3f below 0.7")
  }

  test("ivf upsert: batch routes through the FROZEN base model, ledger covers the corpus") {
    val rows = Similarity.ivfUpsert(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nAll = Tables.embeddings(spark, sf0001).count()
    val nDelta = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 7 === 0).count()
    assert(rows.map(_._2).sum == nAll - nDelta, "n_base must cover the base corpus")
    assert(rows.map(_._3).sum == nDelta, "n_delta must cover the batch")
    assert(rows.forall(r => r._4 == r._2 + r._3))
    // frozen-model claim: every delta vector's cell is the argmax
    // against the BASE-trained centroids (JVM replay), and the base
    // model genuinely differs from the full-corpus model on the
    // fixture (otherwise the distinction is untested)
    val (_, baseCents) = Similarity.baseKmeansModel(spark, sf0001)
    val (_, fullCents) = Similarity.kmeansModel(spark, sf0001)
    assert(baseCents != fullCents,
      "fixture must distinguish the frozen base model from the full model")
    val delta = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 7 === 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def route(v: Array[Double]): Int = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      baseCents.map { case (c, cv, cnrm) =>
        val d = v.zip(cv).map { case (a, b) => a * b }.sum
        (d / (nrm * cnrm), -c)
      }.zip(baseCents.map(_._1)).maxBy(_._1)._2
    }
    val expect = delta.map { case (_, v) => route(v) }
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val gotDelta = rows.filter(_._3 > 0).map(r => r._1 -> r._3).toMap
    assert(gotDelta == expect, s"delta routing diverges: $gotDelta vs $expect")
  }

  test("mutual-kNN clusters == JVM union-find over the mutual edge set") {
    val edges = Similarity.knnGraph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = edges.filter { case (a, b) => edges.contains((b, a)) }
    assert(mutual.nonEmpty && mutual.size < edges.size,
      "fixture must have both mutual and hub-only (non-mutual) kNN edges")
    val got = Similarity.knnClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(got.size.toLong == nVecs, "clusters must cover every vector")
    // exact replay: union-find over the mutual edges, rep = min member
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (0L until nVecs).foreach(v => find(v))
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = (0L until nVecs).groupBy(find)
    val expect = comps.flatMap { case (_, ms) =>
      val rep = ms.min; ms.map(m => m -> (rep, ms.size.toLong))
    }
    assert(got == expect, "cluster map diverges from the union-find replay")
  }

  test("embedding clusters: pairs share a rep, non-paired vectors stay singleton") {
    val reps = Similarity.embeddingClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(reps.size.toLong == nVecs, "clusters must cover every vector")
    val pairs = Similarity.embeddingNearDups(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(reps(a)._1 == reps(b)._1, s"pair ($a,$b) split across clusters")
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    reps.filterNot(kv => paired(kv._1)).foreach { case (v, (rep, size)) =>
      assert(rep == v && size == 1L, s"non-paired vector $v not a singleton")
    }
  }

  test("IVF with all cells probed is EXACTLY brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf0001).collect().map(_.toSeq)
    val full = Similarity.ivfTopKProbes(spark, sf0001, 10).collect().map(_.toSeq)
    assert(full.sameElements(exact),
      "nprobe = all cells must reduce IVF to the exact search")
  }

  test("IVF-PQ with all cells probed is EXACTLY the PQ pipeline") {
    val pq = Similarity.pqTopK(spark, sf0001).collect().map(_.toSeq)
    val full = Similarity.ivfpqTopKProbes(spark, sf0001, 10).collect().map(_.toSeq)
    assert(full.sameElements(pq),
      "nprobe = all cells must reduce IVF-PQ to plain PQ ADC + re-rank")
  }

  test("IVF-PQ at nprobe=2: k dense ranks per query, d2 ascending, nontrivial recall") {
    val got = Similarity.ivfpqTopK(spark, sf0001).collect()
    val byQ = got.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.toSeq == (1L to ranks.length), s"query $q ranks $ranks")
      val d2s = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("d2"))
      assert(d2s.toSeq == d2s.sorted.toSeq, s"query $q d2 not ascending")
    }
    // recall vs the full-probe (= plain PQ) result on the same fixture
    val full = Similarity.ivfpqTopKProbes(spark, sf0001, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = full.count(approx.contains).toDouble / full.size
    // same envelope as the sibling tests (IVF 0.433, PQ 0.333 on this
    // fixture): random 64-dim vectors have weak cluster structure, so
    // toy-scale ANN recall is inherently modest
    info(f"IVF-PQ nprobe=2 recall vs full-probe PQ: $recall%.3f")
    assert(recall >= 0.3, f"recall $recall%.3f below 0.3")
  }

  test("SessionMemo.clear evicts the two-level near-dup model") {
    val m = Similarity.nearDupModel(spark, sf0001)
    assert(m.subCents.storageLevel.useMemory,
      "sub-centroid frame should be cached")
    SessionMemo.clear(spark)
    assert(m.subCents.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "clear must unpersist the sub-centroid frame")
    // the query rebuilds transparently after eviction
    assert(Similarity.embeddingNearDups(spark, sf0001).count() >= 0)
    assert(Similarity.nearDupModel(spark, sf0001).subCents.storageLevel.useMemory)
  }

  test("SessionMemo.clear evicts the memoized IVF k-means model") {
    val (assign, _) = Similarity.kmeansModel(spark, sf0001)
    assert(Similarity.kmeansMemoized(spark, sf0001))
    assert(assign.storageLevel.useMemory, "assignment frame should be cached")
    SessionMemo.clear(spark)
    assert(!Similarity.kmeansMemoized(spark, sf0001),
      "clear must drop the model entry")
    assert(assign.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clear must unpersist the assignment frame")
    // the query rebuilds transparently after eviction
    assert(Similarity.ivfTopK(spark, sf0001).count() > 0)
    assert(Similarity.kmeansMemoized(spark, sf0001))
  }

  test("IVF at nprobe=2 keeps nontrivial recall") {
    val exact = Similarity.bruteForceTopK(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // this corpus's cells are weakly separated (max pairwise cos≈0.5),
    // so nprobe=2/10 recalls ~0.3; the exactness property above is the
    // strong guarantee, this guards against degenerate probe ranking
    info(f"IVF recall@3 (nprobe=2): $recall%.3f")
    assert(recall >= 0.2, f"recall $recall%.3f — probe ranking degenerate")
  }

  test("PQ codes: every vector coded, codes in range, model memoized+evictable") {
    val (codes, books) = Similarity.pqModel(spark, sf0001)
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(codes.count() == nVecs)
    assert(books.length == 4)
    books.foreach(cb => assert(cb.nonEmpty && cb.forall(_._2.length == 16)))
    val cells = books.map(_.map(_._1).toSet)
    (0 until 4).foreach { m =>
      val out = codes.select(s"c$m").distinct().collect().map(_.getInt(0)).toSet
      assert(out.subsetOf(cells(m)), s"subspace $m emitted an unknown code")
    }
    SessionMemo.clear(spark)
    assert(Similarity.pqTopK(spark, sf0001).count() > 0) // rebuilds cleanly
  }

  test("PQ ADC beats random codes and keeps nontrivial L2 recall") {
    import org.apache.spark.sql.expressions.Window
    // exact L2 top-3 per query, straight from the raw vectors
    val vs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), transform(col("embedding"), x =>
        x.cast("double")).as("v"))
    val q = vs.toDF("query_id", "qv").filter(col("query_id") < 10)
    val c = vs.toDF("neighbor_id", "cv")
    val d2 = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("cv")) +
      Similarity.dot(col("cv"), col("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("neighbor_id").asc)
    val exact = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    info(f"PQ recall@3: $recall%.3f")
    assert(recall >= 0.2, f"recall $recall%.3f — PQ codebooks degenerate")
  }

  test("hard negatives: top-k different-label neighbors, recomputed driver-side") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = rows.filter(_._1 < 10).flatMap { case (qid, qlabel, qv) =>
      rows.filter(_._2 != qlabel)
        .map { case (nid, nl, nv) => (nid, nl, cos(qv, nv)) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, nl, _), i) => (qid, nid, nl, i + 1L) }
    }.toSeq.sortBy(t => (t._1, t._4))
    val got = Similarity.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("neg_label"), r.getAs[Long]("rank"))).toSeq
    assert(got == expect, s"${got.size} rows vs expected ${expect.size}")
    // and the label constraint holds against the queries' own labels
    val labels = rows.map(r => r._1 -> r._2).toMap
    got.foreach { case (q, n, nl, _) =>
      assert(labels(n) == nl && nl != labels(q), s"negative $n shares label with query $q")
    }
  }

  test("LSH ANN finds a nontrivial fraction of the exact top-k") {
    val exact = Similarity.bruteForceTopK(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshAnn(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    info(f"LSH-ANN recall@3: $recall%.3f (${ann.size} returned)")
    assert(recall >= 0.2, f"recall $recall%.3f — LSH buckets degenerate")
  }

  test("semantic keep retains exactly the longest doc of every cluster") {
    val clusters = Similarity.embeddingClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (vec_id, cluster_rep)
    val chars = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = clusters.groupBy(_._2).map { case (rep, members) =>
      // the declared policy: n_chars DESC, doc_id ASC
      rep -> members.map(_._1).minBy(id => (-chars(id), id))
    }
    val kept = Similarity.semanticKeep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kept.length == expect.size,
      s"${kept.length} kept rows for ${expect.size} clusters")
    kept.foreach { case (rep, doc, size, nc) =>
      assert(expect(rep) == doc, s"cluster $rep kept $doc, expected ${expect(rep)}")
      assert(nc == chars(doc))
      assert(size == clusters.count(_._2 == rep))
    }
  }

  test("MMR re-rank matches an independent JVM greedy replay and diversifies") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      def dotp(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      r6(dotp(a, b) / (math.sqrt(dotp(a, a)) * math.sqrt(dotp(b, b))))
    }
    // greedy replay: top-8 candidates, then λ·qcos − μ·max-sim picks
    val expect = (0L until 10L).flatMap { qid =>
      val cand = vecs.keys.filter(_ != qid).toSeq
        .map(nid => nid -> cos(vecs(qid), vecs(nid)))
        .sortBy { case (nid, qc) => (-qc, nid) }.take(8)
      var sel = List.empty[(Long, Double)] // (nid, score) in pick order
      for (t <- 1 to 4) {
        val rem = cand.filterNot { case (nid, _) => sel.exists(_._1 == nid) }
        val scored = rem.map { case (nid, qc) =>
          val penalty = if (sel.isEmpty) 0.0
            else sel.map { case (snid, _) => cos(vecs(nid), vecs(snid)) }.max
          nid -> r6(0.7 * qc - (if (sel.isEmpty) 0.0 else 0.3 * penalty))
        }
        val best = scored.minBy { case (nid, sc) => (-sc, nid) }
        sel = sel :+ best
      }
      sel.zipWithIndex.map { case ((nid, sc), i) =>
        (qid, (i + 1).toLong, nid,
          java.math.BigDecimal.valueOf(sc)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
      }
    }.toSet
    val got = Similarity.mmrRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect,
      s"greedy paths diverge:\nonly-spark=${got.diff(expect)}\nonly-jvm=${expect.diff(got)}")
    // the point of MMR: selected sets are no more self-similar than
    // the plain top-4 they replace
    def meanPairSim(ids: Seq[Long]) = {
      val ps = for (Seq(a, b) <- ids.combinations(2).toSeq)
        yield cos(vecs(a), vecs(b))
      ps.sum / ps.size
    }
    val perQuery = got.groupBy(_._1)
    val diffs = (0L until 10L).map { qid =>
      val mmrIds = perQuery(qid).toSeq.sortBy(_._2).map(_._3)
      val topIds = vecs.keys.filter(_ != qid).toSeq
        .map(nid => nid -> cos(vecs(qid), vecs(nid)))
        .sortBy { case (nid, qc) => (-qc, nid) }.take(4).map(_._1)
      meanPairSim(topIds) - meanPairSim(mmrIds)
    }
    assert(diffs.sum >= 0.0,
      s"MMR selections are MORE self-similar than plain top-k: $diffs")
  }

  test("random projection preserves pairwise distances within JL distortion") {
    // independent replay of the Rademacher matrix seed
    val R = (0 until 16).map { j =>
      (0 until 64).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp:$j:$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 0) 1.0 else -1.0
      }
    }
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .orderBy("vec_id").limit(30).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def proj(v: Array[Double]): Array[Double] =
      R.map(row => v.zip(row).map { case (x, s) => x * s }.sum).toArray
    val projected = vecs.map { case (id, v) => (id, v, proj(v)) }
    val ratios = for {
      (Seq((_, xa, ya), (_, xb, yb))) <- projected.toSeq.combinations(2).toSeq
      dx = xa.zip(xb).map { case (p, q) => (p - q) * (p - q) }.sum
      if dx > 0
      dy = ya.zip(yb).map { case (p, q) => (p - q) * (p - q) }.sum
    } yield dy / (16.0 * dx)
    assert(ratios.nonEmpty)
    // E[‖y_a−y_b‖²] = k·‖x_a−x_b‖² for ±1 entries; measured envelope
    // on this corpus is [0.35, 2.29] with mean 1.08
    ratios.foreach(r => assert(r > 0.2 && r < 3.0, s"JL distortion blown: $r"))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.25, s"distance ratio mean off: $mean")
  }

  test("random projection query: per-dim second moments are norm-scale") {
    // mean_sq ≈ E[y_j²] = mean ‖x‖² per dimension; a dead or biased
    // output coordinate collapses this to ~0 or blows it up
    val meanNormSq = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("aggregate(CAST(embedding AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) AS n2")
      .agg(avg(col("n2"))).head().getDouble(0)
    val rows = Similarity.randomProjection(spark, sf0001).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val (dim, n, meanY, meanSq) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0)
      assert(math.abs(meanY) < math.sqrt(meanNormSq),
        s"dim $dim mean $meanY biased")
      assert(meanSq > 0.2 * meanNormSq && meanSq < 5.0 * meanNormSq,
        s"dim $dim second moment $meanSq vs corpus ‖x‖² $meanNormSq")
    }
  }

  test("range search: probed subset of brute-force τ-set; full probe ≡ exact") {
    // brute-force τ-neighbor truth at test scale
    val vs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "v",
        "sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)) AS nrm")
    val q = vs.select(col("vec_id").as("query_id"), col("v").as("qv"),
      col("nrm").as("qnrm")).filter(col("query_id") < 10)
    val truth = q.crossJoin(vs.select(col("vec_id").as("neighbor_id"),
        col("v").as("nv"), col("nrm").as("nnrm")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        Similarity.dot(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")))
      .filter(col("cos") >= 0.25)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must have τ-neighbors")

    // default probes: every returned pair is a true τ-neighbor
    // (radius search never fabricates — misses are the only error)
    val got = Similarity.ivfRangeSearch(spark, sf0001).collect()
    got.foreach(r => assert(r.getDouble(2) >= 0.25 - 1e-9))
    val gotSet = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet.subsetOf(truth), "probed radius result ⊆ brute-force τ-set")

    // probing every cell recovers the exact τ-set
    val full = Similarity.ivfRangeSearchProbes(spark, sf0001, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == truth, "full-probe radius search ≡ brute force")
  }
}

package graft

import graft.ext.Dedup

/** Sketch-based dedup vs the exact Jaccard oracle on sf0.001. */
class DedupSpec extends SparkSpec {

  test("exact dedup: survivor is min doc_id, copies >= 1") {
    val d = Dedup.exact(spark, sf0001).collect()
    assert(d.nonEmpty && d.forall(_.getAs[Long]("n_copies") >= 1))
  }

  test("minhash LSH candidates recall most exact >=0.95 Jaccard pairs") {
    val exactPairs = Dedup.jaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture has no near-dup pairs to test recall on")
    val recall = exactPairs.count(lshPairs.contains).toDouble / exactPairs.size
    info(f"minhash-LSH recall over exact pairs: $recall%.3f " +
      f"(${lshPairs.size} candidates vs ${exactPairs.size} exact)")
    assert(recall >= 0.8, f"recall $recall%.3f below 0.8")
  }

  test("winnowing candidates cover the shingle-Jaccard near-dups") {
    val exact = Dedup.shingleJaccardPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = Dedup.winnowPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture has no shingle near-dups")
    val covered = exact.count(winnow.contains).toDouble / exact.size
    info(f"winnow coverage of shingle pairs: $covered%.3f " +
      f"(${winnow.size} candidates vs ${exact.size} exact)")
    assert(covered >= 0.9)
  }

  test("PPJoin prefix filter bounds a boilerplate-shingle skew bucket") {
    // 50 docs share ONE high-DF item (the boilerplate) and are
    // otherwise disjoint (20 unique items each). A naive inverted-
    // index join emits 50·49/2 = 1225 candidates from that bucket; the
    // prefix filter admits none: with n=21 and t=0.8 the prefix is the
    // 5 rarest items, and the shared boilerplate item — the most
    // frequent in the corpus — sorts last, far outside every prefix.
    import spark.implicits._
    val items = (0 until 50).flatMap { d =>
      ("common" +: (0 until 20).map(j => s"u${d}_$j")).map(it => (d.toLong, it))
    }.toDF("doc_id", "item")
    val cand = Dedup.ppCandidates(Dedup.ppSortedOrds(items, 0.8), 0.8).collect()
    assert(cand.isEmpty,
      s"prefix filter admitted ${cand.length} candidates from a pure-skew bucket")
    // positive control: genuine near-dups still surface as candidates
    val near = (0 until 2).flatMap { d =>
      ((0 until 20).map(j => s"s$j") :+ s"only$d").map(it => (100L + d, it))
    }.toDF("doc_id", "item")
    val c2 = Dedup.ppCandidates(Dedup.ppSortedOrds(near, 0.8), 0.8).collect()
    assert(c2.length == 1, s"expected the J≈0.91 pair as a candidate, got ${c2.length}")
  }

  test("simhash pairs respect the declared hamming bound") {
    val p = Dedup.simhashPairs(spark, sf0001).collect()
    assert(p.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("simhash is deterministic across runs") {
    val a = Dedup.simhash(spark, sf0001).collect().map(_.toSeq)
    val b = Dedup.simhash(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sustained incremental-maintenance runs — the round-11 stress the
  * 2-batch streaming specs don't give: ≥ 100 micro-batches through
  * the standing-state folds, asserting the contracts that make the
  * faces viable as LONG-RUNNING services:
  *
  *  - state size grows with the CORPUS (rows ingested), never with
  *    the batch COUNT — a fold that leaks per-batch state dies after
  *    a week of 1-minute triggers no matter how fast each batch is;
  *  - per-batch re-solve WORK is bounded by batch-touched components
  *    (measured by the fold's own `path` readout), never corpus size;
  *  - per-batch wall time stays ~flat across the run (medians, so a
  *    host stall in one batch cannot fail the assert).
  *
  * Batches drive the fold entry points directly ([[ext.Dedup
  * .foldClusterBatch]], [[sources.Ingest.scd2MergeBatch]]) — the
  * foreachBatch plumbing around them is already spec-asserted on the
  * 2-batch streams in `DedupSpec`/`IngestSpec`; what needs 100+
  * batches is the STATE, not the stream wiring. */
class ContinuousSpec extends SparkSpec {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  test("cluster-map fold: 100+ batches, state ∝ corpus, bounded re-solve, flat wall") {
    // synthetic evidence: clusters of 4 consecutive docs (bucket =
    // doc/4), arriving 5 docs per batch — every cluster spans two
    // batches, so EVERY batch exercises the touched-component
    // re-solve path, not just fresh-singleton insertion
    val nBatches = 104
    val batchSize = 5
    def bucketsOf(ids: Seq[Long]): DataFrame = {
      import spark.implicits._
      ids.map(id => (id, s"b${id / 4}")).toDF("doc_id", "bucket")
    }
    var indexBk = bucketsOf(Seq.empty).cache()
    var curMap = ext.Dedup.clustersFromBuckets(indexBk).localCheckpoint()
    val resolvedPerBatch = Seq.newBuilder[Long]
    val wallPerBatch = Seq.newBuilder[Double]
    var prevCkpt: DataFrame = null
    for (i <- 0 until nBatches) {
      val t0 = System.nanoTime()
      val ids = (i.toLong * batchSize) until ((i + 1).toLong * batchSize)
      val bk = bucketsOf(ids)
      val folded = ext.Dedup.foldClusterBatch(indexBk, curMap, bk)
        .localCheckpoint()
      val byPath = folded.groupBy("path").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      resolvedPerBatch += byPath.getOrElse("resolved", 0L)
      // state size == docs ingested so far — corpus-proportional, with
      // ZERO batch-count term
      val docsSoFar = (i + 1).toLong * batchSize
      assert(byPath.values.sum == docsSoFar,
        s"batch $i: map rows ${byPath.values.sum} != corpus $docsSoFar")
      if (prevCkpt != null) prevCkpt.unpersist(false)
      prevCkpt = folded
      curMap = folded.select("doc_id", "cluster_rep", "cluster_size")
      indexBk = indexBk.unionByName(bk)
      if (i % 20 == 19) indexBk = indexBk.localCheckpoint()
      wallPerBatch += (System.nanoTime() - t0) / 1e9
    }
    val resolved = resolvedPerBatch.result()
    val walls = wallPerBatch.result()
    // bounded re-solve: a batch touches <= 5 docs x <= 4-member
    // components (+ the batch itself) — far below the 500+-doc corpus
    // the late batches sit on. A corpus-proportional re-solve would
    // blow this bound by 10x at batch 100.
    resolved.zipWithIndex.foreach { case (r, i) =>
      assert(r <= 30L, s"batch $i re-solved $r rows (bound 30)") }
    // flat wall: medians so a one-off host stall cannot fail the run
    val early = median(walls.slice(4, 34))
    val late = median(walls.takeRight(30))
    assert(late <= early * 5 + 0.5,
      f"per-batch wall grew: early median $early%.3f s -> late $late%.3f s")
    // convergence: the standing map after 104 folds == one-shot CC
    val got = curMap.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val full = ext.Dedup.clustersFromBuckets(
        bucketsOf(0L until nBatches.toLong * batchSize)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == full,
      s"fold diverged from one-shot (first diff: ${
        got.zip(full).find(p => p._1 != p._2)})")
  }

  test("scd2 sink: 100+ batches, history ∝ versions, touched-partition writes, flat wall") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("cont_scd2").toString +
      "/hist"
    val nBatches = 100
    val keysPerBatch = 5
    val nKeys = 50L
    // change log: batch i updates keys (i*5..i*5+5) mod 50 with a new
    // valid_from — every key accumulates ~10 versions over the run
    def batchDf(i: Int): DataFrame =
      (0 until keysPerBatch).map { j =>
        val k = (i.toLong * keysPerBatch + j) % nKeys
        (k, java.sql.Date.valueOf(java.time.LocalDate
          .of(2020, 1, 1).plusDays(i.toLong)), s"v$i-$k")
      }.toDF("k", "valid_from", "payload")
    val wallPerBatch = Seq.newBuilder[Double]
    for (i <- 0 until nBatches) {
      val t0 = System.nanoTime()
      sources.Ingest.scd2MergeBatch(batchDf(i), path, "k")
      wallPerBatch += (System.nanoTime() - t0) / 1e9
    }
    val walls = wallPerBatch.result()
    val hist = spark.read.parquet(path)
    // state == versions written (keys x their version count), no
    // per-batch residue; exactly one open interval per key
    assert(hist.count() == nBatches.toLong * keysPerBatch,
      "history rows != versions written")
    val open = hist.filter(col("is_current")).groupBy("k").count().collect()
    assert(open.length == nKeys && open.forall(_.getLong(1) == 1L),
      "each key must hold exactly one open interval")
    // every closed interval chains onto a successor of the same key
    val chains = hist.filter(!col("is_current"))
      .join(hist.toDF(hist.columns.map(_ + "2").toIndexedSeq: _*),
        col("k") === col("k2") && col("valid_to") === col("valid_from2"),
        "left_anti").count()
    assert(chains == 0L, s"$chains closed intervals chain to nothing")
    val early = median(walls.slice(4, 34))
    val late = median(walls.takeRight(30))
    assert(late <= early * 5 + 0.5,
      f"per-batch wall grew: early median $early%.3f s -> late $late%.3f s")
  }
}

package graft.tools

/** Throwaway scale diagnostic: forces one query family's build chain
  * step by step against `SPARK_GRAFT_SF_DIR`, printing per-step wall
  * seconds — used to localize which stage of a chain breaks at a new
  * corpus decade before a user would hit it. Modes (first arg):
  * `embed` (default) the embedding near-dup chain; `image` the
  * render→dHash→band→CC chain; `crossmodal` the three family maps
  * then the cross-modal fixpoint (each family timed separately, so
  * the fixpoint's OWN cost is visible — in the bench the first
  * crossmodal query pays every build inside one number). */
object Diag {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("embed")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.Sessions.builder(cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    mode match {
      case "embed" =>
        t("embeddings count") {
          println(s.read.parquet(s"$dir/embeddings.parquet").count())
        }
        t("coarse k=177 i=1") {
          graft.ext.Similarity.kmeansModelK(s, dir, 177, 1)
        }
        t("coarse k=177 i=3") {
          graft.ext.Similarity.kmeansModelK(s, dir, 177, 3)
        }
        val m = t("model (coarse)") { graft.ext.Similarity.nearDupModel(s, dir) }
        println(s"[diag] k=${m.k} k1=${m.k1} k2=${m.k2}")
        t("subCents")(noop(m.subCents))
        t("assignments")(noop(graft.ext.Similarity.nearDupAssignments(s, dir)))
        t("pairs")(noop(graft.ext.Similarity.buildNearDupPairs(s, dir)))

      case "image" =>
        t("documents count") {
          println(s.read.parquet(s"$dir/documents.parquet").count())
        }
        t("hash frame")(noop(graft.ext.Multimodal.imageHashFrame(s, dir)))
        t("hash pairs")(noop(graft.ext.Multimodal.imageHashPairs(s, dir)))
        t("image clusters")(noop(graft.ext.Multimodal.imageClusters(s, dir)))

      case "crossmodal" =>
        t("text clusters")(noop(graft.ext.Dedup.clusters(s, dir)))
        t("embed clusters")(noop(graft.ext.Similarity.embeddingClusters(s, dir)))
        t("image clusters")(noop(graft.ext.Multimodal.imageClusters(s, dir)))
        t("crossmodal CC")(noop(graft.ext.Dedup.crossModalClusters(s, dir)))

      case other => sys.error(s"unknown diag mode: $other")
    }
    s.stop()
  }
}

package graft.tools

/** Throwaway scale diagnostic: forces the embedding near-dup family's
  * build chain step by step against `SPARK_GRAFT_SF_DIR`, printing
  * per-step wall seconds — used to localize which stage of the chain
  * breaks at a new corpus decade before a user would hit it. */
object Diag {
  def main(args: Array[String]): Unit = {
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
    t("subCents")(m.subCents.write.mode("overwrite").format("noop").save())
    t("assignments")(graft.ext.Similarity.nearDupAssignments(s, dir)
      .write.mode("overwrite").format("noop").save())
    t("pairs")(graft.ext.Similarity.buildNearDupPairs(s, dir)
      .write.mode("overwrite").format("noop").save())
    s.stop()
  }
}

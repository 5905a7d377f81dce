package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.r4

/** Similarity search over the `embeddings` table
  * (`ArrayType(FloatType)`, 64-dim): brute-force cosine top-k as the
  * exact baseline, random-hyperplane LSH bucketing as the
  * approximate scale path.
  *
  * The dot product is a `zip_with` + left-fold `aggregate` over
  * doubles — sequential per row, so bit-identical to the oracle's
  * `list_dot_product`, and fully codegen'd (no UDF).
  */
object Similarity {

  private val K = 3
  private val NQueries = 10

  /** Embeddings cast float→double once; norm precomputed per row.
    * The parquet is one small file → one input partition; repartition
    * so the downstream O(pairs·dim) compute (dots in the pair joins)
    * spreads across all cores instead of running serially. */
  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact kNN: brute-force cosine of each query (vec_id < 10)
    * against the full corpus, top-3 per query.
    *
    * Scale shape: queries ≪ corpus → broadcast the query side and
    * stream the corpus once; the per-query top-k is a partial top-k
    * in each partition before the final window (the window input is
    * |corpus|·|queries| only logically — rank pruning happens in one
    * pass). At 100 TB one switches to [[lshAnn]] or an IVF index;
    * this operator stays the recall oracle. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val vs = vectors(s, dir)
    val q = vs.toDF("query_id", "qv", "qnrm").filter(col("query_id") < NQueries)
    val c = vs.toDF("neighbor_id", "cv", "cnrm")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), r4(col("cos")).as("cos"),
        col("rank"))
      .orderBy("query_id", "rank")
  }

  private val SigBits = 6  // bits per table → 64 buckets
  private val Tables_ = 8  // independent hash tables (union of candidates)

  /** Deterministic ±1 pseudo-random hyperplane signature for one
    * table: component k of plane (t, j) is `sign(xxhash64(t, j, k))`
    * — reproducible across executors with no driver-side state or
    * broadcast of plane matrices. */
  private def lshSig(v: Column, table: Int): Column = {
    val bits = (0 until SigBits).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, k) =>
          x * when(pmod(xxhash64(lit(table), lit(j), k), lit(2)) === 0, 1.0)
            .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate kNN: multi-table random-hyperplane LSH → per-table
    * bucket equi-join → exact cosine re-rank over the union of
    * candidates. The all-pairs cross join becomes `Tables_` shuffles
    * on 6-bit keys (explode by table, join on (table, sig)); more
    * tables buy recall, bits-per-table buys selectivity. Recall vs
    * [[bruteForceTopK]] is asserted in the test suite. */
  def lshAnn(s: SparkSession, dir: String): DataFrame = {
    val sigs = (0 until Tables_).map(t =>
      struct(lit(t).as("t"), lshSig(col("v"), t).as("sig")))
    val vs = vectors(s, dir)
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(array(sigs: _*)).as("ts"))
      .select(col("vec_id"), col("v"), col("nrm"), col("ts.t"), col("ts.sig"))
    val q = vs.toDF("query_id", "qv", "qnrm", "t", "sig")
      .filter(col("query_id") < NQueries)
    val c = vs.toDF("neighbor_id", "cv", "cnrm", "t", "sig")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("t", "sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "qv", "cv", "qnrm", "cnrm")
      .distinct() // union candidates across tables
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), r4(col("cos")).as("cos"),
        col("rank"))
      .orderBy("query_id", "rank")
  }

  private val NearDupCos = 0.45

  /** Embedding-cosine near-duplicate pairs (the dedup-family member
    * over vectors): exact all-pairs cosine ≥ 0.45. The pair space is
    * a broadcast nested-loop over `vec_a < vec_b` — exact and fine
    * while one side broadcasts; at corpus scale the same verify step
    * runs over [[lshAnn]]-style bucket candidates instead of the full
    * cross product (identical math, bounded pairs). */
  def embeddingNearDups(s: SparkSession, dir: String): DataFrame = {
    val vs = vectors(s, dir)
    val a = vs.toDF("vec_a", "va", "na")
    val b = vs.toDF("vec_b", "vb", "nb")
    b.join(broadcast(a), col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= NearDupCos)
      .select(col("vec_a"), col("vec_b"), r4(col("cos")).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (bruteForceTopK _),
    "sim_topk_lsh_ann"    -> (lshAnn _),
    "dedup_embedding_pairs" -> (embeddingNearDups _),
  )

  /** LSH is hash-seeded → not reproducible in SQL (rows-only check);
    * brute force has an exact DuckDB oracle. */
  val oracleSql: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM n q JOIN n c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < $NQueries),
         |r AS (SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM p)
         |SELECT query_id, neighbor_id, round(cos, 4) AS cos, rank
         |FROM r WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,

    "dedup_embedding_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(cos, 4) AS cos
         |FROM p WHERE cos >= $NearDupCos ORDER BY vec_a, vec_b""".stripMargin,
  )
}

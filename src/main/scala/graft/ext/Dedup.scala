package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.r4

/** Deduplication operators over `documents` — the dedup ladder of a
  * training-data pipeline:
  *
  *  1. exact        — hash-groupBy on content (one shuffle of hashes)
  *  2. normalized   — [[Text.fingerprint]] (md5 of canonical form)
  *  3. token-set Jaccard — exact pairwise similarity, inverted-index
  *     join (the correctness oracle for the approximate methods)
  *  4. MinHash + LSH banding — the 100 TB path: candidate pairs via
  *     band-bucket equi-join, no pairwise work outside buckets
  *  5. SimHash — 32-bit sketch + Hamming-ball candidate pairing
  *
  * All sketches are built from `functions._` higher-order expressions
  * (xxhash64 inside `transform`) — codegen'd, no UDFs, no
  * collect-to-driver.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id
    * (deterministic survivor), count copies. At scale this shuffles
    * 16-byte hashes, never the documents themselves. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("text_hash")

  /** Exact token-set Jaccard ≥ 0.95 via inverted-index self-join:
    * explode distinct (doc, token) pairs, equi-join on token, count
    * intersections, compute |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Scale note: the token join explodes on high-document-frequency
    * tokens (a stopword shared by every doc pairs everything). This
    * exact variant is the *oracle*; the scale path is [[minhashLsh]],
    * which replaces the token join with a bounded band-bucket join.
    */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val dt = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = dt.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = dt.toDF("doc_a", "tok")
    val b = dt.toDF("doc_b", "tok")
    val inter = a.join(b, Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"))
    val sa = sizes.toDF("doc_a", "na")
    val sb = sizes.toDF("doc_b", "nb")
    inter.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .withColumn("jaccard", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= 0.95)
      .select(col("doc_a"), col("doc_b"), r4(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  private val NumPerm = 32
  private val Bands = 4 // 8 rows per band → s-curve threshold ≈ 0.77

  /** Per-document MinHash signature: for permutation k, the min of
    * `xxhash64(k, token)` over the distinct token set — all inside
    * one `transform`/`array_min` expression tree. */
  private def signature(toks: Column): Column =
    transform(sequence(lit(0), lit(NumPerm - 1)),
      k => array_min(transform(toks, t => xxhash64(k, t))))

  /** MinHash + LSH near-dup candidates, est. Jaccard ≥ 0.9 — the
    * 100 TB dedup path. Banding turns all-pairs similarity into an
    * equi-join: explode each signature into (band, hash-of-rows)
    * keys, shuffle by key, pair only within buckets. Estimated
    * Jaccard = fraction of agreeing signature positions
    * (`zip_with` + filter + size). */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val rowsPerBand = NumPerm / Bands
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(Text.tokens(col("text"))).as("toks"))
      .select(col("doc_id"), signature(col("toks")).as("sig"))
    val banded = docs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.toDF("doc_a", "sig_a", "band", "bucket")
    val b = banded.toDF("doc_b", "sig_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct() // a pair may collide in several bands
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          e => e)) / lit(NumPerm))
      .filter(col("est_jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), r4(col("est_jaccard")).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash per document: each distinct token votes ±1 on
    * every bit of its hash; the sketch sign-thresholds the vote
    * vector. Computed as explode → 32 conditional sums → bit
    * recombination (pure aggregates, map-side combinable). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(Text.tokens(col("text")))).as("tok"))
      .withColumn("h", hash(col("tok")))
    val votes = (0 until 32).map { i =>
      sum(when(col("h").bitwiseAND(lit(1 << i)) =!= 0, 1).otherwise(-1)).as(s"v$i")
    }
    val sketch = (0 until 32).map { i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sketch.as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup candidate pairs: Hamming distance ≤ 3 of 32,
    * found by banding the sketch into 4 bytes (a pair within distance
    * 3 must agree on ≥ 1 byte — pigeonhole), joining per byte-band,
    * then verifying with `bit_count(xor)`. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sk = simhash(s, dir)
    val bandStructs = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftrightunsigned(col("simhash"), bnd * 8).bitwiseAND(lit(0xFFL))
          .as("byte"))
    }
    val banded = sk.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.byte"))
    val a = banded.toDF("doc_a", "sim_a", "band", "byte")
    val b = banded.toDF("doc_b", "sim_b", "band", "byte")
    a.join(b, Seq("band", "byte"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> (exact _),
    "dedup_jaccard_pairs" -> (jaccardPairs _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhash _),
    "dedup_simhash_pairs" -> (simhashPairs _),
  )

  /** jaccard/exact are SQL-expressible; the sketch ops (xxhash64 /
    * murmur3-dependent) are not reproducible in DuckDB → rows-only. */
  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_jaccard_pairs" ->
      """WITH dt AS (SELECT DISTINCT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(c / (sa.n + sb.n - c), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE c / (sa.n + sb.n - c) >= 0.95
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * No real image/audio codecs exist in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake. Everything
  * around it — the (id, content, meta) schema, the iterator→iterator
  * per-partition batch shape (the Scala analogue of `mapInPandas`),
  * the fixed-width feature output — is the real engineering surface
  * and is tested. Swapping the stub for a JNI/codec call changes no
  * plan shape.
  *
  * The `documents.text` bytes stand in for media payloads (the corpus
  * has no binary table; TESTDATA.md).
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], source: String)
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
      n_bytes: Long, features: Array[Double])

  /** The media table: opaque binary payload + typed metadata. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      // single-file parquet = one partition; spread so the (real)
      // decode cost parallelizes across executors
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        col("source"))
      .as[MediaRow]
  }

  /** STUB DECODER — deterministic fake standing in for an image
    * decode (`???`-equivalent; no codec libs in this container).
    * "Dimensions" derive from payload length; "features" are a
    * 16-bin byte histogram normalized to mass 1. Replace the body
    * with a real codec without touching the operator shape. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.content
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val total = math.max(1.0, bytes.length.toDouble)
    MediaFeatures(
      media_id = row.media_id,
      width = 64 + (bytes.length % 64),
      height = 64 + ((bytes.length / 64) % 64),
      n_bytes = bytes.length.toLong,
      features = hist.map(_ / total))
  }

  /** Per-partition feature extraction — iterator in, iterator out
    * (a batch per partition, like a Pandas UDF over `mapInPandas`):
    * the decode amortizes any per-batch setup (codec init, model
    * load) across the partition, and no payload ever crosses the
    * driver. */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).mapPartitions { rows =>
      // per-partition setup for a real codec would go here
      rows.map(decodeStub)
    }
  }

  /** Feature query surface. The stub's 16-bin byte histogram IS
    * SQL-expressible for this corpus: the text is pure ASCII
    * (verified: octet_length == length for every row), so bin b's
    * count is a regex count of chars in `[\x{b0}-\x{bF}]` — the
    * DuckDB oracle checks f0/f7 exactly. */
  def features(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, dir)
      .toDF()
      .select(col("media_id"), col("width"), col("height"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 8), 4).as("f7"))
      .orderBy("media_id")

  /** Metadata-only projection of the same pipeline — SQL-expressible
    * (dimensions are deterministic functions of payload length), so
    * it anchors the stub's plumbing to the DuckDB oracle. */
  def meta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    extractFeatures(s, dir)
      .toDF()
      .select(col("media_id"), col("n_bytes"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"))
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (features _),
    "mm_meta"     -> (meta _),
  )

  val oracleSql: Map[String, String] = Map(
    "mm_features" ->
      """WITH b AS (SELECT doc_id AS media_id, text,
        |    octet_length(CAST(text AS BLOB)) AS nb FROM documents)
        |SELECT media_id,
        |  64 + nb % 64 AS width,
        |  64 + (nb // 64) % 64 AS height,
        |  CAST(nb AS BIGINT) AS n_bytes,
        |  round(len(regexp_extract_all(text, '[\x00-\x0f]'))
        |    / greatest(1.0, CAST(nb AS DOUBLE)), 4) AS f0,
        |  round(len(regexp_extract_all(text, '[\x70-\x7f]'))
        |    / greatest(1.0, CAST(nb AS DOUBLE)), 4) AS f7
        |FROM b ORDER BY media_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(CAST(text AS BLOB)) % 64 AS BIGINT) AS width,
        |  CAST(64 + (octet_length(CAST(text AS BLOB)) // 64) % 64 AS BIGINT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType, StructField, StructType}

/** File-format readers for an externally fetched (date, value) series
  * — the landing formats of the reference's extract step, which pulls
  * the FRED `PAYEMS` series over HTTP (`/root/reference/etl.py:22-25`)
  * and would land it as CSV or JSON before load.
  *
  * Scale posture: schemas are EXPLICIT (never `inferSchema`, which
  * costs a full extra pass over the data and can flip types between
  * runs), malformed rows are quarantined into a `_corrupt_record`
  * column under PERMISSIVE mode instead of killing a 100 TB load, and
  * the reader is a plain distributed file scan — any number of landed
  * files parallelize across executors.
  */
object SeriesFiles {

  /** The (date, level) series schema — the reference's table model
    * (`etl.py:58-63`). */
  val seriesSchema: StructType = StructType(Seq(
    StructField("month", DateType, nullable = false),
    StructField("emp", LongType, nullable = false),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** CSV landing: header, explicit schema, permissive corrupt-row
    * capture. `clean` keeps only fully parsed rows. */
  def readSeriesCsv(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(seriesSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** JSON-lines landing, same contract as [[readSeriesCsv]]. */
  def readSeriesJson(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(seriesSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Drop quarantined rows and the quarantine column — the frame the
    * load step ([[Ingest.upsert]]) consumes. The parsed frame is
    * cached first: Spark refuses plans over raw JSON/CSV that
    * reference only `_corrupt_record` (the parser would have to
    * re-run just to rebuild it), and a landing batch is re-read by
    * the quarantine audit anyway. */
  def clean(landed: DataFrame): DataFrame =
    landed.cache().filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
}

package graft

import java.nio.file.Files
import graft.sources.{Ingest, SeriesFiles}

class SeriesFilesSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_land")
    Files.writeString(dir.resolve(name), content)
    dir.toString
  }

  test("CSV landing: explicit schema, corrupt rows quarantined not fatal") {
    val dir = write("series.csv",
      """month,emp
        |2020-01-01,100
        |garbage-row,not-a-number
        |2020-02-01,200
        |""".stripMargin)
    val landed = SeriesFiles.readSeriesCsv(spark, dir)
    assert(landed.count() == 3, "permissive mode must keep corrupt rows visible")
    val clean = SeriesFiles.clean(landed).orderBy("month").collect()
    assert(clean.map(_.getLong(1)).toSeq == Seq(100L, 200L))
  }

  test("JSON landing parses and feeds the upsert load step") {
    val dir = write("series.json",
      """{"month":"2020-01-01","emp":100}
        |{"month":"2020-02-01","emp":200}
        |{"bad json
        |""".stripMargin)
    val clean = SeriesFiles.clean(SeriesFiles.readSeriesJson(spark, dir))
    assert(clean.count() == 2)
    // end-to-end: landed file -> upsert merge (the reference's E->T->L)
    val incoming = clean.withColumn("v", org.apache.spark.sql.functions.lit(2L))
    val existing = clean.limit(1).withColumn("v", org.apache.spark.sql.functions.lit(1L))
    val merged = Ingest.upsert(existing, incoming, "month", "v")
    assert(merged.count() == 2)
  }
}

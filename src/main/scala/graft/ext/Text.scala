package graft.ext
import org.apache.spark.sql.{DataFrame, SparkSession}
object Text {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

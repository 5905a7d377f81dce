package graft.streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
object Events {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared (session, sf dir, name)-keyed memoization of cached frames
  * — the S5 "session result cache" primitive. One entry per key for
  * the session's lifetime: re-invoking a query reuses the cached
  * frame instead of stacking a fresh `.cache()` per call. Entries are
  * keyed by session, so a stopped session's entries are inert (never
  * reused, never re-materialized); `clear(session)` drops them
  * eagerly if a long-lived process cycles many sessions. */
object SessionMemo {
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  def cached(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((s, dir, name), build.cache())

  /** Unpersist and forget every entry belonging to `s`. */
  def clear(s: SparkSession): Unit =
    memo.keys.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    }
}

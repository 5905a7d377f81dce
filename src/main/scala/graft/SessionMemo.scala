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

  /** Session-keyed teardown hooks: operators that hold state OUTSIDE
    * this memo (the IVF k-means model cache, bucketed layout tables)
    * register a release action here so [[clear]] is the ONE hygiene
    * entry point a long-lived process calls between tenants. */
  private val cleanups = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), () => Unit]

  def cached(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val key = (s, dir, name)
    val hit = memo.contains(key)
    val df = memo.getOrElseUpdate(key, build.cache())
    note(name, built = !hit)
    df
  }

  /** Register (or replace) a named teardown action run by [[clear]].
    * Idempotent per (session, name): re-registering overwrites.
    * Every model/layout builder calls this exactly once when it
    * BUILDS (inside its memo's getOrElseUpdate / guard branch), so
    * registration doubles as the build event for attribution. */
  def registerCleanup(s: SparkSession, name: String)(f: () => Unit): Unit = {
    note(name, built = true)
    cleanups.put((s, name), f); ()
  }

  // ── Build attribution ──────────────────────────────────────────
  // Which consumer (bench query) built vs reused which memoized
  // family — the accounting that explains why ONE query in a bench
  // pass carries its whole family's one-time cost. Zero overhead
  // unless a consumer label is set (Bench sets it; Verify and
  // library use don't).

  private val attributionLog = new java.util.concurrent
    .ConcurrentLinkedQueue[(String, String, Boolean)]
  @volatile private var currentConsumer: String = null

  /** Run `f` with memo events attributed to `consumer`. */
  def attributing[T](consumer: String)(f: => T): T = {
    currentConsumer = consumer
    try f finally currentConsumer = null
  }

  private def note(key: String, built: Boolean): Unit = {
    val c = currentConsumer
    if (c != null) { attributionLog.add((c, key, built)); () }
  }

  /** Drain recorded (consumer, memo key, built?) events. */
  def drainAttribution(): Seq[(String, String, Boolean)] = {
    val b = Seq.newBuilder[(String, String, Boolean)]
    while (!attributionLog.isEmpty) b += attributionLog.poll()
    b.result()
  }

  /** Unpersist and forget every entry belonging to `s`, then run (and
    * drop) every cleanup hook registered against `s`. After this the
    * session holds no graft-cached frames, models, or layout tables. */
  def clear(s: SparkSession): Unit = {
    memo.keys.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    }
    cleanups.keys.filter(_._1 eq s).foreach { k =>
      cleanups.remove(k).foreach(f =>
        try f() catch { case _: Throwable => () })
    }
  }
}

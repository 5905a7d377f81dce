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
  /** One lazy build slot per memo key: `putIfAbsent` publishes the
    * HOLDER (cheap, no thunk run), and the `lazy val` body — which
    * Scala guards with the holder's monitor — runs the build exactly
    * once no matter how many first callers race. The r11 shape
    * (`getOrElseUpdate`) evaluated the thunk OUTSIDE the CAS: two
    * concurrent first callers both built, both logged `built=true`,
    * and the loser's `cache()`-marked frame leaked unpersisted. */
  private final class Slot(mk: () => DataFrame) {
    // lets clear() unpersist only slots whose build actually ran —
    // forcing an unbuilt slot just to unpersist it would BUILD it
    @volatile var forced = false
    lazy val df: DataFrame = { val b = mk(); forced = true; b }
  }

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), Slot]

  /** Session-keyed teardown hooks: operators that hold state OUTSIDE
    * this memo (the IVF k-means model cache, bucketed layout tables)
    * register a release action here so [[clear]] is the ONE hygiene
    * entry point a long-lived process calls between tenants. */
  private val cleanups = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), () => Unit]

  def cached(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val key = (s, dir, name)
    // `secs` is set by THIS call's closure, which only runs if this
    // call's slot won the publish race AND its lazy val is the one
    // forced — so at most one caller ever logs `built=true`, and the
    // timing captures eager builds (CC fixpoints, checkpointed pair
    // tables) but only plan-construction cost for lazy ones — those
    // materialize inside the consumer's own measured action. Under a
    // concurrent first access the build may run on the OTHER thread
    // (whoever forces the winning slot's lazy val first); attribution
    // then credits the slot-publisher's consumer — best-effort by
    // design, while the build itself runs exactly once.
    var secs = -1.0
    val slot = new Slot({ () =>
      val t0 = System.nanoTime()
      val b = build.cache()
      secs = (System.nanoTime() - t0) / 1e9
      b
    })
    val winner = memo.putIfAbsent(key, slot).getOrElse(slot)
    val df = winner.df
    note(name, built = secs >= 0, math.max(secs, 0.0))
    df
  }

  /** Register (or replace) a named teardown action run by [[clear]].
    * Idempotent per (session, name): re-registering overwrites.
    * Every model/layout builder calls this exactly once when it
    * BUILDS (inside its memo's getOrElseUpdate / guard branch), so
    * registration doubles as the build event for attribution; wall
    * seconds for the build come from the [[timedBuild]] wrapper at
    * the guard site (events merge per key, max-seconds wins). */
  def registerCleanup(s: SparkSession, name: String)(f: () => Unit): Unit = {
    note(name, built = true, 0.0)
    cleanups.put((s, name), f); ()
  }

  /** Time an eager one-time build (physical layout write, k-means
    * model fit, bucketed-table save) and record the wall seconds
    * against the current consumer under `name` — the accounting that
    * separates layout-build cost from query cost in the bench
    * artifact. Returns `f`'s result unchanged. */
  def timedBuild[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f finally note(name, built = true, (System.nanoTime() - t0) / 1e9)
  }

  // ── Build attribution ──────────────────────────────────────────
  // Which consumer (bench query) built vs reused which memoized
  // family — the accounting that explains why ONE query in a bench
  // pass carries its whole family's one-time cost. Zero overhead
  // unless a consumer label is set (Bench sets it; Verify and
  // library use don't).

  private val attributionLog = new java.util.concurrent
    .ConcurrentLinkedQueue[(String, String, Boolean, Double)]
  // ThreadLocal, saved/restored around f: a nested or concurrent
  // consumer must not clobber (or null out) an enclosing one's label
  private val currentConsumer = new ThreadLocal[String]

  /** Run `f` with memo events attributed to `consumer`. */
  def attributing[T](consumer: String)(f: => T): T = {
    val prev = currentConsumer.get()
    currentConsumer.set(consumer)
    try f finally currentConsumer.set(prev)
  }

  private def note(key: String, built: Boolean, secs: Double): Unit = {
    val c = currentConsumer.get()
    if (c != null) { attributionLog.add((c, key, built, secs)); () }
  }

  /** Drain recorded (consumer, memo key, built?, build seconds)
    * events. */
  def drainAttribution(): Seq[(String, String, Boolean, Double)] = {
    val b = Seq.newBuilder[(String, String, Boolean, Double)]
    while (!attributionLog.isEmpty) b += attributionLog.poll()
    b.result()
  }

  // ── Diagnostic gauges ──────────────────────────────────────────
  // Named numeric readouts operators publish for the bench artifact
  // (candidate-volume counters, pruning bounds) — the numbers that
  // make cross-scale-leg growth attributable. Purely diagnostic:
  // nothing reads a gauge to produce a result.

  private val gauges = scala.collection.concurrent.TrieMap
    .empty[String, () => Double]

  /** Publish (or replace) a named gauge; `f` is polled at snapshot
    * time, so accumulator-backed gauges report post-action values. */
  def setGauge(name: String)(f: () => Double): Unit = {
    gauges.put(name, f); ()
  }

  /** Current value of every published gauge. */
  def gaugeSnapshot(): Map[String, Double] =
    gauges.readOnlySnapshot().toMap.map { case (k, f) =>
      k -> (try f() catch { case _: Throwable => -1.0 }) }

  /** Unpersist and forget every entry belonging to `s`, then run (and
    * drop) every cleanup hook registered against `s`. After this the
    * session holds no graft-cached frames, models, or layout tables. */
  def clear(s: SparkSession): Unit = {
    memo.keys.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(slot =>
        if (slot.forced)
          try slot.df.unpersist() catch { case _: Throwable => () })
    }
    cleanups.keys.filter(_._1 eq s).foreach { k =>
      cleanups.remove(k).foreach(f =>
        try f() catch { case _: Throwable => () })
    }
  }
}

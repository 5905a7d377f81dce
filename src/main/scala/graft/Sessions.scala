package graft

import org.apache.spark.sql.SparkSession

/** The engine's blessed `SparkSession` recipe — one place that
  * encodes the at-scale execution defaults every entry point
  * (Verify / Bench / Profile, and a library user) should run with:
  *
  *  - the Graft planner extensions (as-of join strategy)
  *  - AQE on: runtime re-plan, skew-join splitting, coalesced
  *    shuffle partitions
  *  - runtime bloom-filter join pruning on: a selective dimension
  *    filter feeding a shuffle join injects a bloom semi-filter into
  *    the fact-side scan, cutting shuffle write volume before the
  *    join (the 100 TB complement of static partition pruning;
  *    plan-asserted in `PlanSpec`)
  *  - shuffle parallelism sized to the core count, not the 200
  *    default (on a real cluster: executors × cores, then AQE
  *    coalesces)
  *  - UTC session timezone (calendar semantics must not depend on
  *    the host)
  */
object Sessions {
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
}

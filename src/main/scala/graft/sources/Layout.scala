package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional data layout: z-order (Morton-curve) clustering.
  *
  * Partition pruning handles ONE dimension; at 100 TB a second
  * frequently-filtered column still forces full scans. Interleaving
  * the bits of two key columns and range-partitioning on the result
  * assigns each output file a quadtree cell — a tight bounding box in
  * BOTH dimensions — so parquet row-group min/max stats skip data for
  * predicates on either column (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * idea, built here from pure Catalyst expressions: shift/mask/or,
  * fully codegen'd, no UDF).
  *
  * [[zorderWrite]] is the physical operator: `repartitionByRange` on
  * the z-value (one range shuffle — the same cost as any sorted write)
  * + in-partition sort, so both the file-level and row-group-level
  * stats are tight. `LayoutSpec` proves the skipping property: the sum
  * of per-file bounding-box areas after a z-order write is a fraction
  * of the naturally-ordered write's.
  *
  * The declared query reports the LOGICAL layout — per z-range-bucket
  * (quadtree cell) row counts and min/max of both dims — which the
  * oracle recomputes bit-for-bit from the same normalize + interleave
  * formulas.
  */
object Layout {

  /** Interleave width: 16 bits per dimension → 32-bit z-values. */
  private val ZBits = 16

  /** Morton z-value of two non-negative ints in [0, 2^16): bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Pure
    * shift/mask/or expression tree — codegen'd, no UDF. */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Oracle-side SQL for [[zValue]] (DuckDB bitwise operators). */
  def zValueSql(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" | ")

  /** Physical z-order write: range-partition by z-value into
    * `numFiles` files, sort within each, write parquet. One range
    * exchange (sampled bounds), then map-local sorts — the standard
    * sorted-write cost at any scale. Raw keys interleave directly
    * (ordering is what matters for the physical layout; same-scale
    * domains need no normalization). */
  def zorderWrite(df: DataFrame, x: String, y: String, numFiles: Int,
      path: String): Unit = {
    val z = zValue(col(x).cast("long"), col(y).cast("long")).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** 64 z-range buckets = depth-3 quadtree cells over the 32-bit
    * z-space. */
  private val BucketShift = 26

  /** Map a key to [0, 2^16) by min/max scaling: exact integer
    * arithmetic up to the one double divide, whose operands are exact
    * — deterministic across engines. `greatest(span, 1)` guards the
    * degenerate single-value domain. */
  private def norm16(c: Column, lo: Column, hi: Column): Column =
    floor((c - lo).cast("double") * 65535.0 /
      greatest(hi - lo, lit(1)).cast("double")).cast("long")

  private def norm16Sql(c: String, lo: String, hi: String): String =
    s"CAST(floor(CAST($c - $lo AS DOUBLE) * 65535.0 / " +
      s"CAST(greatest($hi - $lo, 1) AS DOUBLE)) AS BIGINT)"

  /** Logical layout report: per z-bucket row count and the bounding
    * box (min/max of both dims) — the stats a file would carry after
    * [[zorderWrite]]. Tight boxes in BOTH columns are exactly what
    * makes row-group skipping work for predicates on either. Keys
    * min/max-normalize to the 16-bit grid first (a 1-row bounds
    * aggregate, broadcast — the k-means-centroid sync shape), so the
    * 64-way bucketing is scale-invariant. */
  def zorderStats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
    val bounds = li.agg(
      min("l_partkey").as("min_p"), max("l_partkey").as("max_p"),
      min("l_suppkey").as("min_s"), max("l_suppkey").as("max_s"))
    val xn = norm16(col("l_partkey"), col("min_p"), col("max_p"))
    val yn = norm16(col("l_suppkey"), col("min_s"), col("max_s"))
    li.crossJoin(broadcast(bounds))
      .select(col("l_partkey"), col("l_suppkey"),
        zValue(xn, yn).as("zval"))
      .groupBy(shiftright(col("zval"), BucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("zbucket")
  }

  /** File-stats data skipping over the z-ordered layout — the query-
    * side payoff of [[zorderWrite]] and the mechanism behind every
    * lakehouse "data skipping index" (Delta file stats, Iceberg
    * manifest min/max): a planner consults the per-file min/max
    * stats table and reads ONLY files whose bounding box overlaps
    * the predicate; false positives are filtered inside the scan, so
    * pruning is exact by construction — and the query CERTIFIES that
    * in-plan (`pruning_exact`: rows matched through the pruned scan
    * == rows matched by a full scan; the oracle expects TRUE).
    *
    * The 64 z-range buckets stand in for files ([[zorderStats]]'
    * quadtree cells); the predicate is a 2-D range box placed
    * RELATIVE to the corpus bounds (lo = min + span/4, hi = min +
    * span/2, integer arithmetic) so the scenario is scale-invariant.
    * At 100 TB the stats table is maintained incrementally at write
    * time and is #files-sized — consulting it is a metadata read,
    * never a data scan; building it in-query here is the
    * certification device. Scale shape: ONE pass over the fact
    * evaluates the z-expression and pre-combines map-side into the
    * ≤ 64-row stats-plus-match-counts aggregate; everything after
    * that is arithmetic over bucket-count-sized frames (the
    * completeness check reads the skipped buckets' match mass out of
    * the same aggregate instead of re-scanning the fact). */
  def statsPrune(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
    // bounds AND the derived predicate thresholds in ONE 1-row frame,
    // so the fact contributes exactly two scans: this cheap min/max
    // pass and the stats pass below
    val bounds = li.agg(
      min("l_partkey").as("min_p"), max("l_partkey").as("max_p"),
      min("l_suppkey").as("min_s"), max("l_suppkey").as("max_s"))
      .select(col("min_p"), col("max_p"), col("min_s"), col("max_s"),
        (col("min_p") + floor((col("max_p") - col("min_p")) / lit(4))).as("p_lo"),
        (col("min_p") + floor((col("max_p") - col("min_p")) / lit(2))).as("p_hi"),
        (col("min_s") + floor((col("max_s") - col("min_s")) / lit(4))).as("s_lo"),
        (col("min_s") + floor((col("max_s") - col("min_s")) / lit(2))).as("s_hi"))
    // ONE pass over the fact evaluates the z-expression once and
    // folds the per-bucket stats AND the per-bucket match counts into
    // the same ≤64-row aggregate; the completeness certification then
    // needs no second fact scan — "pruned scan loses no matching row"
    // ⟺ "skipped buckets hold zero matching rows", and the skipped-
    // bucket match mass is already in the aggregate
    val pred = col("l_partkey").between(col("p_lo"), col("p_hi")) &&
      col("l_suppkey").between(col("s_lo"), col("s_hi"))
    val stats = li.crossJoin(broadcast(bounds))
      .select(col("l_partkey"), col("l_suppkey"),
        shiftright(zValue(
          norm16(col("l_partkey"), col("min_p"), col("max_p")),
          norm16(col("l_suppkey"), col("min_s"), col("max_s"))),
          BucketShift).as("zbucket"),
        pred.cast("long").as("m"),
        col("p_lo"), col("p_hi"), col("s_lo"), col("s_hi"))
      .groupBy("zbucket")
      .agg(min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
        min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"),
        sum("m").as("n_match_b"),
        // the thresholds are constant per group; folding them through
        // the aggregate avoids a second bounds scan
        min("p_lo").as("p_lo"), min("p_hi").as("p_hi"),
        min("s_lo").as("s_lo"), min("s_hi").as("s_hi"))
    val overlap = !(col("maxp") < col("p_lo") || col("minp") > col("p_hi") ||
      col("maxs") < col("s_lo") || col("mins") > col("s_hi"))
    stats
      .withColumn("scanned", overlap)
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("scanned").cast("long")).as("n_scanned"),
        sum("n_match_b").as("n_match"),
        sum(when(!col("scanned"), col("n_match_b")).otherwise(lit(0L)))
          .as("skipped_matches"))
      .select(col("n_files"), col("n_scanned"),
        graft.functions.Num.r4(lit(1.0) -
          col("n_scanned").cast("double") / col("n_files").cast("double"))
          .as("skip_frac"),
        col("n_match"),
        (col("skipped_matches") === 0L).as("pruning_exact"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorderStats _),
    "layout_stats_prune" -> (statsPrune _),
  )

  val oracleSql: Map[String, String] = Map(
    "layout_zorder" -> {
      val xn = norm16Sql("l_partkey", "min_p", "max_p")
      val yn = norm16Sql("l_suppkey", "min_s", "max_s")
      s"""WITH b AS (SELECT min(l_partkey) AS min_p, max(l_partkey) AS max_p,
         |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s FROM lineitem),
         |z AS (SELECT l_partkey, l_suppkey,
         |    ${zValueSql(s"($xn)", s"($yn)")} AS zval
         |  FROM lineitem CROSS JOIN b)
         |SELECT zval >> $BucketShift AS zbucket, count(*) AS n_rows,
         |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
         |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // identical bounds → thresholds → bucket-stats → overlap →
    // count arithmetic; the oracle expects pruning_exact TRUE (the
    // certification: stats-pruned scan loses no matching row)
    "layout_stats_prune" -> {
      val xn = norm16Sql("l_partkey", "min_p", "max_p")
      val yn = norm16Sql("l_suppkey", "min_s", "max_s")
      s"""WITH b AS (SELECT min(l_partkey) AS min_p, max(l_partkey) AS max_p,
         |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s FROM lineitem),
         |t AS (SELECT
         |    min_p + CAST(floor((max_p - min_p) / 4) AS BIGINT) AS p_lo,
         |    min_p + CAST(floor((max_p - min_p) / 2) AS BIGINT) AS p_hi,
         |    min_s + CAST(floor((max_s - min_s) / 4) AS BIGINT) AS s_lo,
         |    min_s + CAST(floor((max_s - min_s) / 2) AS BIGINT) AS s_hi
         |  FROM b),
         |r AS (SELECT l_partkey, l_suppkey,
         |    (${zValueSql(s"($xn)", s"($yn)")}) >> $BucketShift AS zbucket
         |  FROM lineitem CROSS JOIN b),
         |st AS (SELECT zbucket, min(l_partkey) AS minp, max(l_partkey) AS maxp,
         |    min(l_suppkey) AS mins, max(l_suppkey) AS maxs
         |  FROM r GROUP BY 1),
         |sc AS (SELECT st.*, NOT (maxp < p_lo OR minp > p_hi
         |    OR maxs < s_lo OR mins > s_hi) AS scanned
         |  FROM st CROSS JOIN t),
         |fa AS (SELECT count(*) AS n_files,
         |    sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS n_scanned FROM sc),
         |mp AS (SELECT count(*) AS n_pruned
         |  FROM r JOIN (SELECT zbucket FROM sc WHERE scanned) USING (zbucket)
         |  CROSS JOIN t
         |  WHERE l_partkey BETWEEN p_lo AND p_hi
         |    AND l_suppkey BETWEEN s_lo AND s_hi),
         |mf AS (SELECT count(*) AS n_match FROM lineitem CROSS JOIN t
         |  WHERE l_partkey BETWEEN p_lo AND p_hi
         |    AND l_suppkey BETWEEN s_lo AND s_hi)
         |SELECT CAST(n_files AS BIGINT) AS n_files,
         |  CAST(n_scanned AS BIGINT) AS n_scanned,
         |  round(1.0 - CAST(n_scanned AS DOUBLE) / CAST(n_files AS DOUBLE), 4)
         |    AS skip_frac,
         |  CAST(n_match AS BIGINT) AS n_match,
         |  (n_pruned = n_match) AS pruning_exact
         |FROM fa CROSS JOIN mp CROSS JOIN mf""".stripMargin
    },
  )
}

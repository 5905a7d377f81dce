package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.JaroWinkler

/** Jaro–Winkler expression semantics (pinned to DuckDB's
  * `jaro_winkler_similarity`) and the fuzzy blocking-dedup query. */
class FuzzyDedupSpec extends SparkSpec {

  // Reference values probed directly from DuckDB jaro_winkler_similarity
  // (the oracle engine) — the expression must reproduce them bit-for-bit.
  private val duckdbProbes: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),   // classic textbook pair
    ("dixon", "dicksonx", 0.8133333333333332),
    ("DUANE", "DWAYNE", 0.8400000000000001),
    ("abcdef", "abcdef", 1.0),
    ("", "abc", 0.0),                           // empty side -> 0, not 1
    ("", "", 0.0),
    ("ab", "ba", 0.0),                          // window 0: no cross match
    ("aé", "ae", 0.611111111111111),            // BYTE level, not codepoint
    ("abcdxxxx", "abcdyyyy", 0.6666666666666666), // jaro <= 0.7: NO boost
    ("ax", "ab", 0.6666666666666666),
    // ODD raw transposition count: DuckDB floors t (t=1, not 1.5)
    ("abcdef", "bcadef", 0.9444444444444445),
    // 40-char odd-raw pair from the sf0.1 corpus (the one that caught
    // the flooring bug: classic t=12.5 gives 0.9024, floored 0.9051)
    ("data spark vector small column query tab",
      "data spark table customer column query b", 0.9051351351351352),
  )

  test("JaroWinkler.similarity reproduces DuckDB probes bit-for-bit (eval path)") {
    duckdbProbes.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b) = $got, DuckDB says $want")
    }
  }

  test("codegen path agrees with eval and stays inside WholeStageCodegen") {
    import spark.implicits._
    // repartition first: a projection over pure literals constant-folds
    // into a LocalTableScan (interpreted eval) and never codegens
    val df = duckdbProbes.toDF("a", "b", "want").repartition(2)
      .select(col("want"), JaroWinkler.jaroWinkler(col("a"), col("b")).as("got"))
    // a codegen failure would fall back to interpreted eval and still
    // pass the value check, so also assert the FINAL plan (AQE only
    // materializes it after execution) really claims WholeStageCodegen
    df.collect().foreach(r =>
      assert(r.getDouble(1) == r.getDouble(0), s"codegen mismatch on row $r"))
    // codegen'd operators print as `*(id) Project` in the tree string
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"no codegen span in:\n$plan")
    // symmetry: jw(a,b) == jw(b,a) on the probe set
    val sym = duckdbProbes.toDF("a", "b", "want")
      .select(
        JaroWinkler.jaroWinkler(col("a"), col("b")).as("ab"),
        JaroWinkler.jaroWinkler(col("b"), col("a")).as("ba"))
      .collect()
    sym.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("fuzzy pairs: rank/doc joins shuffle-hash; only bucket offsets broadcast") {
    val plan = Dedup.fuzzyPairs(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ in:\n$plan")
    // the ONLY allowed broadcast is the bucket-offset table (bounded
    // by construction: <= alphabet^prefix rows) — every broadcast
    // join in the plan must build on the `bucket` key
    val bhj = """BroadcastHashJoin \[(\w+)""".r
    val keys = bhj.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("bucket")),
      s"corpus-derived broadcast (non-bucket keys $keys) in:\n$plan")
  }

  test("fuzzy pairs match a driver-side sorted-neighborhood replay at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        lower(substring(trim(col("text")), 1, 40)).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def jw(a: String, b: String): Double = JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // SNM: distinct keys in sorted order, each vs its 10 successors
    val sorted = docs.map(_._2).distinct.sorted
    val byKey: Map[String, List[Long]] =
      docs.groupBy(_._2).view.mapValues(_.map(_._1).toList).toMap
    val cross = for {
      i <- sorted.indices; j <- (i + 1) to math.min(i + 10, sorted.length - 1)
      s = jw(sorted(i), sorted(j)) if s >= 0.90
      a <- byKey(sorted(i)); b <- byKey(sorted(j))
    } yield (math.min(a, b), math.max(a, b), math.round(s * 10000) / 10000.0)
    val same = for {
      ids <- byKey.values.toSeq; a <- ids; b <- ids if a < b
    } yield (a, b, 1.0)
    val want = (cross ++ same).toSet
    val got = Dedup.fuzzyPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture has no fuzzy near-dup pairs")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("fuzzy candidate volume stays linear: ~w per key, never block-quadratic") {
    // the defining SNM property (the reason the prefix-block form was
    // replaced): candidates = (#keys - tail) * w exactly, so the JW
    // evaluation count cannot grow quadratically with corpus size
    val nKeys = Tables.documents(spark, sf0001)
      .select(lower(substring(trim(col("text")), 1, 40))).distinct().count()
    val pairs = Dedup.fuzzyPairs(spark, sf0001).count()
    assert(pairs <= nKeys * 10 + 500 /* same-key expansion slack */,
      s"$pairs pairs from $nKeys keys — exceeds the linear SNM envelope")
  }
}

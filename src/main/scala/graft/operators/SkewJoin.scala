package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the engine's explicit skew-mitigation operator.
  *
  * The regime: the build side is too large to broadcast (corpus- or
  * fact-derived) AND the join key is skewed, so a plain shuffle join
  * sends every row of a hot key to ONE reducer — the straggler that
  * determines job wall-time at 100 TB. AQE's skew-join splitting
  * handles sort-merge joins after the fact; salting is the
  * plan-level form that also works for shuffle-hash joins, stateful
  * streaming joins, and engines/configs where AQE can't rewrite.
  *
  * Mechanics: the probe (fact) side gets a deterministic salt in
  * `[0, salts)` hashed from a caller-named high-cardinality column,
  * widening the shuffle key to (key, salt) so a hot key's rows spread
  * over `salts` reducers; the build (dim) side replicates each row
  * `salts` times — a bounded `salts×` blow-up of the SMALL side —
  * so every (key, salt) bucket finds its build row. Join output is
  * row-for-row identical to the unsalted join (asserted in
  * `PlanSpec` and by the shared oracle of any query built on this).
  */
object SkewJoin {

  /** Inner equi-join of `fact` ⋈ `dim` on `key`, salted `salts` ways.
    * `saltSource` must name a fact column with per-row entropy (an
    * id, a timestamp) — NOT the key itself, which would put each hot
    * key back on one reducer. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(hash(saltSource), lit(salts)))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }
}

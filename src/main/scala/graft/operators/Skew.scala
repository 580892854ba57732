package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles most runtime skew transparently
  * (left enabled everywhere); these helpers cover the aggregation case
  * AQE does not re-plan: a groupBy where one key holds a large share of
  * all rows, so a single reducer becomes the stage's critical path.
  * Salting splits each key into `salts` sub-keys (uniform via a hash of
  * the full row id — deterministic, no RNG), aggregates the sub-keys in
  * parallel, then combines the per-salt partials. Works for any
  * algebraic aggregate (sum/count/min/max); the combine step must use
  * the merge form (sum of sums, etc.).
  */
object Skew {

  /** Two-phase salted count/sum: groupBy(keys + salt) → partials →
    * groupBy(keys) merge. `saltSource` must be a deterministic
    * per-row expression (e.g. a primary-key column). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltSource: Column, salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))
  }
}

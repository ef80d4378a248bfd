package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * Graft's default answer to skew is (a) map-side partial aggregation —
  * decimal sums combine before the shuffle, so a hot group key costs one
  * row per map partition, and (b) AQE skew-join splitting (enabled in
  * GraftSession). These helpers cover the residual case: DISTINCT-style
  * or collect-style aggregations on a hot key, where partial aggregation
  * cannot compress (every distinct value must cross the shuffle).
  *
  * Salting is deterministic: the salt derives from a hash of stable
  * columns, never from randomness, so results are reproducible and task
  * retries are safe (matching the engine-wide determinism contract).
  */
object Skew {

  /** Deterministic salt in [0, buckets) from stable id columns. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase COUNT(DISTINCT distinctCol) per group key with a salted
    * first phase: phase 1 dedups (key, salt, value) locally spreading the
    * hot key over `buckets` reducers; phase 2 merges per-salt partial
    * distinct counts. Exact (not a sketch), and the hot key's shuffle
    * fan-in is `buckets` instead of 1. */
  def saltedCountDistinct(
      df: DataFrame,
      groupCol: String,
      distinctCol: String,
      buckets: Int = 16): DataFrame =
    df.select(
      col(groupCol),
      col(distinctCol),
      salt(buckets, col(distinctCol)).as("_salt"))
      .groupBy(col(groupCol), col("_salt"))
      .agg(countDistinct(col(distinctCol)).as("_partial"))
      .groupBy(col(groupCol))
      .agg(sum(col("_partial")).as("n_distinct"))
}

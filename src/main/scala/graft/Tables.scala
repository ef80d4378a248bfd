package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the harness tables (TPC-H-ish star schema plus an
  * event stream and an LLM corpus). All operators read through here so that
  * column pruning / filter pushdown reach the parquet scans (the loaders
  * return lazy plans; nothing is cached).
  *
  * Mapping to the reference's data model (see SURVEY.md §3): `lineitem` and
  * `orders` stand in for the WFP price observations, `part` for commodities,
  * `supplier` for markets, `nation`/`region` for localities/countries,
  * `events` for the enrichment-API cadence, and `documents`/`embeddings` for
  * the added LLM-pipeline corpus.
  */
object Tables {
  /** Lazy-plan memoization per (session, dir, table): repeated loads of
    * the same table skip re-listing files and re-reading parquet footers
    * (a fixed ~50-100ms tax per query in a many-query session). Entries
    * are plans, not data — nothing is cached executor-side. Keyed WEAKLY
    * on the session object itself, so stopped sessions (and their plans)
    * are collectable and cannot collide with later sessions. */
  private val plans = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = plans.synchronized {
      var m = plans.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        plans.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Drop the memoized plan for one table so the next load re-lists its
    * files. The model-serving paths call this when a corpus fingerprint
    * mismatch proves the files changed under the dir — training a fresh
    * model through a plan pinned to the OLD file listing would fail (or
    * silently read stale data) and then be stamped with the NEW
    * fingerprint. */
  private[graft] def invalidate(spark: SparkSession, dir: String, name: String): Unit = {
    val m = plans.get(spark)
    if (m != null) { m.remove((dir, name)); () }
  }

  /** Drop every session's memoized plans over `dir` — the prepared-plan
    * cache calls this on a corpus-stamp miss (r16 review: a stamp miss
    * proves the dir's files changed, and rebuilding the query through
    * plans pinned to the OLD listing would silently miss the delta,
    * then be cached under the NEW stamp as if validated). All sessions,
    * because the rebuild may run in an interactive-lane child whose
    * memo is separate from the caller's. */
  private[graft] def invalidateDir(dir: String): Unit = plans.synchronized {
    val it = plans.values().iterator()
    while (it.hasNext) {
      val m = it.next()
      m.keys.filter(_._1 == dir).foreach(m.remove)
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  /** `events.ts` is normalized to a LONG of epoch NANOSECONDS whatever the
    * generator wrote, so every downstream operator keeps exact integer time
    * arithmetic (`DIV`/`pmod` bucketing) that agrees bitwise with the
    * DuckDB oracles' `epoch_ms(ts)`:
    *  - TIMESTAMP(NANOS) parquet (early generations): unmappable to Spark's
    *    microsecond TimestampType, so read the raw INT64 via the legacy
    *    nanos-as-long flag — already epoch nanos.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (current generations):
    *    arrives as TIMESTAMP_NTZ; the session timezone is pinned UTC
    *    (GraftSession), so casting to TimestampType reads the naive stamp
    *    as the same UTC instant DuckDB assumes, then `unix_micros * 1000`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(df("ts")) * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            df("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected LONG nanos or a parquet timestamp")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

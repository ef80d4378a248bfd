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

  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType; read it as a LONG of epoch
    * nanoseconds instead (set lazily so any session works) and let callers
    * derive ms/timestamp columns with exact integer arithmetic. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregation: maintain a rollup under batch arrivals.
  *
  * Reference: the Airflow DAGs re-ingest and rebuild tables on a daily
  * schedule (`dags/raw/ingest_kaggle_data.py`, `@daily`). The Spark-first
  * form keeps a PARTIAL-SUM rollup (decimal sums + counts — associative,
  * commutative) and folds each new batch in with a key-wise merge, so a
  * day's update costs O(delta + rollup) instead of a full recompute.
  *
  * Because the partials are exact decimals, merged state is bit-identical
  * to a from-scratch aggregation — which is precisely what the oracle
  * checks (the SQL side computes directly over all data; the Spark side
  * answers from split-then-merged partials).
  */
object Incremental {

  /** Partial monthly rollup state for a slice of the fact table. */
  def partialMonthly(slice: DataFrame): DataFrame =
    slice
      .groupBy(col("brand"), col("year"), col("month"))
      .agg(
        sum(dec2(col("price"))).cast(DecimalType(28, 2)).as("sum_dec"),
        cnt.as("n"))

  /** Merge any number of partial rollups into one (associative). */
  def merge(parts: Seq[DataFrame]): DataFrame =
    parts
      .reduce(_ unionByName _)
      .groupBy(col("brand"), col("year"), col("month"))
      .agg(
        sum(col("sum_dec")).cast(DecimalType(28, 2)).as("sum_dec"),
        sum(col("n")).as("n"))

  /** q_incremental_merge — the monthly rollup answered from two
    * independently-aggregated halves of the fact (split at 1999-01-01)
    * merged together; must equal the direct aggregation exactly. */
  def incrementalMonthly(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val base = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("l_extendedprice").as("price"),
        col("l_shipdate"))
    val cutoff = lit("1999-01-01").cast(TimestampType)
    // ONE fact scan (r21): the two halves' independent partials ride a
    // single aggregation keyed by the half flag — bit-identical to
    // aggregating each filtered half separately (decimal partials are
    // exact, so per-(group, half) sums equal the per-half aggregation
    // whatever the scan order), and [[merge]] then folds the halves
    // together exactly as before. The filter-twice form planned two
    // full lineitem scans + two partial-agg chains for the same rows
    // (plans/r21/q_incremental_merge_before.txt).
    val halves = base
      .groupBy(col("brand"), col("year"), col("month"),
        (col("l_shipdate") < cutoff).as("history"))
      .agg(
        sum(dec2(col("price"))).cast(DecimalType(28, 2)).as("sum_dec"),
        cnt.as("n"))
    merge(Seq(halves))
      .select(
        col("brand"), col("year"), col("month"),
        col("sum_dec").cast(DoubleType).as("sum_price"),
        col("n").as("n_obs"))
  }

  val incrementalMonthlyOracle: String =
    """SELECT p_brand AS brand,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
      |  CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_obs
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------- backfill

  /** Hex-prefix ceiling selecting the deterministic "late correction
    * batch" (~3.1% of fact rows): same content-keyed md5 discipline as
    * [[TextAnalysis.trainSplit]], so the batch is reproducible in any
    * engine and independent of row order. */
  val LateHexLt = "08"

  /** q_backfill_rollup — partition-selective backfill, the data side of an
    * orchestrator's catch-up run (reference: the Airflow `@daily` DAGs
    * rebuild tables wholesale on a backfill — `dags/raw/ingest_kaggle_data
    * .py`; here a correction batch rebuilds ONLY the partitions it
    * touches).
    *
    * Shape: a deterministic md5-keyed slice of the fact is the LATE batch
    * (corrections that arrived after their data month closed). The
    * standing rollup — built from on-time rows only — is stale exactly in
    * the (year, month) partitions the late rows belong to. Backfill:
    *  1. touched = distinct late (year, month) — dim-sized, broadcast;
    *  2. rebuild the touched partitions: distributive measures fold
    *     on-time + late decimal PARTIALS (one fact-scale exchange total —
    *     see the body comment); a non-distributive measure would rescan,
    *     with the broadcast touched set as the partition predicate a
    *     date-partitioned warehouse layout prunes on — never the history;
    *  3. splice: untouched store rows pass through (left_anti on the
    *     touched set), rebuilt partitions replace their stale versions —
    *     dynamic-partition-overwrite semantics as one declarative plan.
    *
    * A late row's partition key is its OWN ship month, so every partition
    * the store got wrong is in the touched set by construction and the
    * spliced result equals the from-scratch rollup bit-for-bit (decimal
    * partials; the oracle checks exactly that, plus the rebuilt flag).
    * Cost: O(store + late + affected partitions), not O(history).
    */
  def backfillRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    // the 2-hex-char prefix compare is the first digest byte's numeric
    // compare — computed by the [[graft.functions.Md5BucketKernel]]
    // codegen kernel (no UTF8String key, no 16-byte hex encode per row)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val isLate = call_function(graft.functions.GraftFunctions.Md5BucketName,
      col("l_orderkey").cast(LongType), col("l_linenumber").cast(LongType)) <
      lit(Integer.parseInt(LateHexLt, 16))
    val base = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("l_extendedprice").as("price"),
        isLate.as("late"))
    // ONE fact-scale exchange: the late flag rides the partial
    // aggregation, and the whole splice is then derived over the
    // dim-cardinality partial frame. This is the distributive-measure
    // fast path (decimal partials merge bit-exactly, [[merge]]); a
    // non-distributive measure would need the scan-back rebuild, with
    // the touched months as the partition predicate that scan prunes on.
    val partials = base
      .groupBy(col("brand"), col("year"), col("month"), col("late"))
      .agg(
        sum(dec2(col("price"))).cast(DecimalType(28, 2)).as("sum_dec"),
        cnt.as("n"))
    // FUSED splice: a partition is rebuilt iff ANY of its partials is
    // late — a max-of-late window per (year, month) stamps the flag, and
    // the merge groups by (brand, year, month, rebuilt), whose
    // clustering the window's (year, month) exchange already satisfies
    // (rebuilt is constant within a month), so the splice costs one
    // dim-cardinality exchange total. The earlier form derived a
    // broadcast touched set and spliced untouched/rebuilt as two joins
    // plus a union over a checkpointed partials frame — three consumers
    // and a materialization barrier for the same answer.
    val byMonth = org.apache.spark.sql.expressions.Window
      .partitionBy(col("year"), col("month"))
    partials
      .withColumn("rebuilt", max(col("late")).over(byMonth))
      .groupBy(col("brand"), col("year"), col("month"), col("rebuilt"))
      .agg(
        sum(col("sum_dec")).cast(DecimalType(28, 2)).as("sum_dec"),
        sum(col("n")).as("n"))
      .select(
        col("brand"), col("year"), col("month"),
        col("sum_dec").cast(DoubleType).as("sum_price"),
        col("n").as("n_obs"),
        col("rebuilt"))
  }

  val backfillRollupOracle: String =
    s"""WITH base AS (
       |  SELECT p_brand AS brand,
       |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
       |    CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
       |    l_extendedprice AS price,
       |    SUBSTR(MD5(CAST(l_orderkey AS VARCHAR) || '-' ||
       |      CAST(l_linenumber AS VARCHAR)), 1, 2) < '$LateHexLt' AS late
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |), touched AS (
       |  SELECT DISTINCT year, month FROM base WHERE late
       |)
       |SELECT brand, year, month,
       |  CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price,
       |  COUNT(*) AS n_obs,
       |  EXISTS(SELECT 1 FROM touched t
       |    WHERE t.year = base.year AND t.month = base.month) AS rebuilt
       |FROM base
       |GROUP BY 1, 2, 3, 6""".stripMargin
}

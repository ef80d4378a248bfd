package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Long<->wide reshaping (pivot / unpivot).
  *
  * Reference: the HDI dataset is a wide table (one column per year) that
  * the reference ingests and the dashboard slices (`dbt/models/raw/
  * hdi.sql`, README dataset 2); conversely its long price table is viewed
  * as per-month matrices. Pivot values are declared statically (the 12
  * months) so the plan needs NO driver-side distinct pass — at 100 TB an
  * undeclared pivot would scan the fact once just to enumerate columns.
  */
object Reshape {

  private def monthCols = (1 to 12).map(m => s"m$m")

  /** The ONE fact-scan aggregate both reshape queries derive from:
    * per-(brand, month) average price in long form. One (sum, count)
    * slot per row at the partial aggregate — the wide formulation that
    * ran the 12-slot pivot aggregate over the full fact scan carried 12
    * conditional slots per group and was 12x wider at the map side for
    * the same information. The shuffle moves dim-cardinality rows
    * (brands x 12); reshaping after this point is free at any fact
    * scale. Long-cents sums keep the mean bit-equal to the decimal form
    * (per-(brand, month) totals sit orders of magnitude under the
    * 2^53-cent budget even at fact scale). */
  private def brandMonthAvg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), month(col("l_shipdate")).as("month"))
      .agg((sumCents2(col("l_extendedprice")) /
        count(lit(1)).cast(DoubleType)).as("avg_price"))
  }

  /** q_pivot_monthly — brand x month average-price matrix. The pivot runs
    * over the post-aggregate dim-cardinality frame (each (brand, month)
    * cell is exactly one row, so `first` just places values), NOT over
    * the fact scan. */
  def pivotMonthly(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = brandMonthAvg(spark, dir)
      .groupBy(col("brand"))
      .pivot(col("month"), 1 to 12)
      .agg(first(col("avg_price")))
    // one Project for all 12 renames — a withColumnRenamed fold stacks
    // 12 nested plans the analyzer pays for on every reuse
    pivoted.select(col("brand") +: (1 to 12).map(m => col(s"$m").as(s"m$m")): _*)
  }

  val pivotMonthlyOracle: String = {
    val cells = (1 to 12)
      .map(m =>
        s"""    CAST(SUM(CASE WHEN EXTRACT(month FROM l_shipdate) = $m THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
           |      / CAST(COUNT(CASE WHEN EXTRACT(month FROM l_shipdate) = $m THEN 1 END) AS DOUBLE) AS m$m""".stripMargin)
      .mkString(",\n")
    s"""SELECT p_brand AS brand,
       |$cells
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand""".stripMargin
  }

  /** q_unpivot_wide — the monthly matrix in long form. Long IS the shape
    * the shared aggregate produces, so this is a projection of
    * [[brandMonthAvg]] — the prior formulation materialized the 12-wide
    * pivot and melted it back, recomputing the full fact-scan pivot
    * aggregate (12 slots per group) to round-trip through a layout the
    * query doesn't want; absent (brand, month) cells reappeared as nulls
    * only to be filtered out again. One partial-agg shuffle, no reshape
    * on the fact path. [[unpivotFrom]] keeps the melt itself covered for
    * genuinely wide inputs (the HDI year-column shape). */
  def unpivotWide(spark: SparkSession, dir: String): DataFrame =
    brandMonthAvg(spark, dir)
      .select(col("brand"), col("month").cast(IntegerType).as("month"), col("avg_price"))

  /** Melt any brand x m1..m12 wide frame to long form — the generic
    * unpivot surface (the reference's wide HDI ingest), spec-checked to
    * round-trip [[pivotMonthly]] back to [[unpivotWide]]. */
  private[graft] def unpivotFrom(wide: DataFrame): DataFrame =
    wide.unpivot(
      Array(col("brand")),
      monthCols.map(col).toArray,
      "month_name",
      "avg_price")
      // month number from the column name's fixed "m<N>" shape — no
      // per-row regex machinery for a static rename
      .withColumn("month", substring(col("month_name"), 2, 2).cast(IntegerType))
      .filter(col("avg_price").isNotNull)
      .select(col("brand"), col("month"), col("avg_price"))

  val unpivotWideOracle: String =
    """SELECT p_brand AS brand,
      |  CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2""".stripMargin
}

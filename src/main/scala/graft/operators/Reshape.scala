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

  /** q_pivot_monthly — brand x month average-price matrix. */
  def pivotMonthly(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val pivoted = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .pivot(month(col("l_shipdate")), 1 to 12)
      // long-cents sums: the pivot instantiates this aggregate 12x per
      // group, so the plain-long combine buffer matters; bit-equal to the
      // decimal form (per-(brand, month) totals are orders of magnitude
      // under the 2^53-cent budget even at fact scale)
      .agg((sumCents2(col("l_extendedprice")) /
        count(lit(1)).cast(DoubleType)).as("avg"))
    // one Project for all 12 renames — a withColumnRenamed fold stacks
    // 12 nested plans the analyzer pays for on every reuse (unpivot
    // consumes this frame too)
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

  /** q_unpivot_wide — melt the monthly matrix back to long form. */
  def unpivotWide(spark: SparkSession, dir: String): DataFrame = {
    val wide = pivotMonthly(spark, dir)
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
  }

  val unpivotWideOracle: String =
    """SELECT p_brand AS brand,
      |  CAST(EXTRACT(month FROM l_shipdate) AS INT) AS month,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2""".stripMargin
}

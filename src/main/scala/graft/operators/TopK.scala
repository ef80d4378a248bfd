package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k per group ranking ("best markets" / "best products").
  *
  * Reference: `server/pages/best_markets.py` (cheapest markets for a
  * product) and `server/pages/best_products.py:forecast_best_products`
  * (products ranked by average price, `sorted(...)[:top_n]`). The
  * reference ranks forecasted prices driver-side per selection; here the
  * ranking is computed for ALL groups in one distributed pass.
  *
  * Scale notes: the fact is first reduced to (brand x supplier)
  * cardinality with a map-side-combined aggregate; the rank window then
  * runs partitioned by brand on the aggregate, so the windowed data is
  * bounded by group-combination cardinality, not fact rows. Tie-break on
  * the name column makes row_number deterministic.
  */
object TopK {

  /** q_topk_per_group — 3 cheapest suppliers (markets) per brand by
    * average price. */
  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))
    val s = broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")))
    val perMarket = li
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand").as("brand"), col("s_name").as("market_name"))
      .agg(meanOf(sumd2(col("l_extendedprice")), cnt).as("avg_price"), cnt.as("n_obs"))
    val w = Window.partitionBy(col("brand")).orderBy(col("avg_price"), col("market_name"))
    perMarket
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("brand"), col("market_name"), col("avg_price"), col("n_obs"), col("rk"))
  }

  val topkPerGroupOracle: String =
    """SELECT brand, market_name, avg_price, n_obs, rk FROM (
      |  SELECT brand, market_name, avg_price, n_obs,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY brand ORDER BY avg_price, market_name) AS INT) AS rk
      |  FROM (
      |    SELECT p_brand AS brand, s_name AS market_name,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      |      COUNT(*) AS n_obs
      |    FROM lineitem
      |    JOIN part ON l_partkey = p_partkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    GROUP BY 1, 2
      |  )
      |) WHERE rk <= 3""".stripMargin
}

package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-cost breakdown for a query under tuning: times named
  * sub-plans of the operator so a regression can be attributed to a
  * stage instead of guessed at. Not part of the driver contract.
  */
object Profile {
  private def time(name: String, iters: Int)(f: => Long): Unit = {
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[profile] $name%-28s med=${times(iters / 2)}%.3f min=${times.head}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-profile")
      .master(s"local[${GraftSession.cpus}]").getOrCreate()
    GraftSession.tuneLogs(spark)
    val iters = 5

    def li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    def p = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")))

    graft.functions.GraftFunctions.ensureRegistered(spark)
    // warm
    graft.operators.TopK.topkPerGroup(spark, dir).count()

    time("scan_only", iters)(li.count())
    time("scan_join", iters)(li.join(p, col("l_partkey") === col("p_partkey")).count())
    time("agg_cents", iters) {
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(meanOf(sumCents2(col("l_extendedprice")), cnt).as("avg_price"), cnt.as("n_obs"))
        .count()
    }
    time("agg_plain_double", iters) {
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(sum(col("l_extendedprice")).as("s"), cnt.as("n_obs"))
        .count()
    }
    time("agg_dec_sum", iters) {
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(sumd2(col("l_extendedprice")).as("s"), cnt.as("n_obs"))
        .count()
    }
    time("full_query", iters)(graft.operators.TopK.topkPerGroup(spark, dir).count())
    time("no_supplier_join", iters) {
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(call_function(graft.functions.GraftFunctions.TopKMeanName,
          col("l_suppkey").cast("long"), (dec2(col("l_extendedprice")) * lit(100)).cast("long"), lit(3)).as("top"))
        .select(col("brand"), posexplode(col("top"))).count()
    }
    time("construct_only", iters) {
      graft.operators.TopK.topkPerGroup(spark, dir)
        .queryExecution.executedPlan
      0L
    }
    spark.stop()
  }
}

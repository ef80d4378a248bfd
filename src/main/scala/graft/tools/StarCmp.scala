package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Same-window star/hdi stage-cost probe over the served fact layout. */
object StarCmp {
  private def time(name: String, iters: Int)(f: => Long): Unit = {
    val ts = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[starcmp] $name%-22s med=${ts(iters / 2)}%.3f min=${ts.head}%.3f")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = GraftSession.local("graft-starcmp")
    val iters = 7
    val layout = graft.operators.StarSchema.ensureFactLayout(spark, dir)
    graft.operators.StarSchema.starJoinServed(spark, dir).count() // warm
    val li = spark.table(layout.liRevTable)
    val lim = spark.table(layout.liMonthTable)
    val o = spark.table(layout.ordersTable)
    println(s"[starcmp] rows lirev=${li.count()} limonth=${lim.count()} orders=${o.count()}")
    time("scan_lirev", iters)(li.count())
    time("scan_limonth", iters)(lim.count())
    time("join_only", iters)(
      li.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey")).count())
    val dim = broadcast(
      graft.Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(graft.Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(graft.Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name")))
    time("dim_build_only", iters)(dim.count())
    time("star_served", iters)(graft.operators.StarSchema.starJoinServed(spark, dir).count())
    time("hdi_served", iters)(graft.operators.Stats.hdiVolatility(spark, dir).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("star_served_noaqe", iters)(graft.operators.StarSchema.starJoinServed(spark, dir).count())
    time("hdi_served_noaqe", iters)(graft.operators.Stats.hdiVolatility(spark, dir).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("noop_floor", iters)(spark.range(10).count())
    spark.stop()
  }
}

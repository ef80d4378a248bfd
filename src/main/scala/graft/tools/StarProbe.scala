package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-cost probe for the star-join family under tuning. */
object StarProbe {
  private def time(name: String, iters: Int)(f: => Long): Unit = {
    val ts = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[starprobe] $name%-22s med=${ts(iters / 2)}%.3f min=${ts.head}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-starprobe")
    val iters = 5
    graft.operators.StarSchema.starJoin(spark, dir).count() // warm
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    time("scan_li", iters)(li.count())
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
    time("joins_only", iters)(joined.count())
    val one = lit(1).cast(DecimalType(18, 2))
    time("agg_decimal", iters)(joined
      .groupBy(col("r_name"), year(col("o_orderdate")))
      .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (one - col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4)))
        .cast(DoubleType), count(lit(1))).count())
    time("agg_cents", iters)(joined
      .groupBy(col("r_name"), year(col("o_orderdate")))
      .agg((sum(floor(col("l_extendedprice") * 100 + lit(0.5)) *
        (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)))).cast(DoubleType) /
        lit(10000.0)), count(lit(1))).count())
    time("full_query", iters)(graft.operators.StarSchema.starJoin(spark, dir).count())
    spark.stop()
  }
}

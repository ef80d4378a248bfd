package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of the per-JOB driver floor ([[FloorProbe]]
  * showed trivial queries pay ~5 jobs x ~45ms): what does ONE warm job
  * cost, and how much of the per-query constant is AQE's stage-by-stage
  * materialization vs the scheduler itself?
  */
object FloorProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = if (args.nonEmpty) args(0).toInt else 15
    val spark = GraftSession.local("graft-floor2")
    import spark.implicits._
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor2] $label%-46s ${med(ts)}%7.4f s (min ${ts.min}%7.4f)")
    }
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.count()

    // 1. raw job floor: single-stage, single-task
    time("rdd 1-task count")(spark.sparkContext.parallelize(Seq(1), 1).count(): Unit)
    time("range(1e6) count (1 stage, 32 tasks)")(spark.range(1000000L).count(): Unit)
    // 2. one shuffle, AQE on (as configured)
    val agg = nation.groupBy($"n_regionkey").agg(count(lit(1)).as("n"))
    time("nation groupBy count, AQE on")(agg.count(): Unit)
    // 3. same with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("nation groupBy count, AQE OFF")(agg.count(): Unit)
    // 4. AQE off + 4 shuffle partitions
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("nation groupBy count, AQE OFF, shuf=4")(agg.count(): Unit)
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    time("nation groupBy count, AQE OFF, shuf=1")(agg.count(): Unit)
    spark.conf.set("spark.sql.shuffle.partitions", GraftSession.cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // 5. two shuffles (groupBy + orderBy), AQE on/off
    val agg2 = nation.groupBy($"n_regionkey").agg(count(lit(1)).as("n")).orderBy($"n")
    time("2-shuffle query, AQE on")(agg2.collect(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("2-shuffle query, AQE OFF")(agg2.collect(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // 6. broadcast-join query
    val region = spark.read.parquet(s"$dir/region.parquet")
    val bj = nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name").agg(count(lit(1)).as("n"))
    time("broadcast join + agg, AQE on")(bj.count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("broadcast join + agg, AQE OFF")(bj.count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}

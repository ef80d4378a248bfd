package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc named-query runner: `runMain graft.tools.RunQ q_a,q_b [iters]`
  * against `SPARK_GRAFT_SF_DIR` (default sf0.01). Prints per-run wall
  * time and row count, and surfaces the exception (not a swallowed -1)
  * when a query fails — the debugging twin of Bench's measured loop.
  * Not part of the driver contract.
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty && args(0) != "all") args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val iters = if (args.length > 1) args(1).toInt else 1
    val spark = GraftSession.builder("graft-runq")
      .master(s"local[${GraftSession.cpus}]").getOrCreate()
    GraftSession.tuneLogs(spark)
    names.foreach { name =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        try {
          val n = SparkEntry.queries(name)(spark, dir).count()
          println(f"[runq] $name%-28s iter=$i rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.3fs")
        } catch {
          case e: Throwable =>
            println(s"[runq] $name FAILED: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
        }
      }
    }
    spark.stop()
  }
}

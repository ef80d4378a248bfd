package graft.tools

import graft.{GraftSession, SparkEntry}

/** Driver-constant decomposition for the perf-weak rows (r11/r12
  * verdicts): per query, split the measured wall time into
  *
  *   - `build` — constructing the DataFrame (plan assembly + any
  *     serving-store ensure/sidecar checks; pure driver work),
  *   - `plan`  — analysis + optimization + physical planning
  *     (`queryExecution.executedPlan` forced; pure driver work),
  *   - `exec`  — executing the ALREADY-planned query (count on the same
  *     DataFrame, so no re-planning),
  *   - `fresh` — the full end-to-end time a bench sample sees.
  *
  * `fresh - exec` is Spark's per-query driver constant: if it dominates
  * a row whose DuckDB twin runs in tens of milliseconds, the row's
  * ratio is the planning/scheduling floor, not an engine-side data-path
  * problem — the thing the verdict asks to prove or disprove per row.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *        sbt 'runMain graft.tools.FixedCostProbe [q_a,q_b,...]'
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_star_join", "q_topk_forecast", "q_seasonal_forecast",
        "q_hdi_volatility", "q_backfill_rollup", "q_quality_thresholds")
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.local("graft-fixedcost")
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    println(f"[fixedcost] ${"query"}%-24s build   plan   exec  fresh  driver%%")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm: generations built, code JITed
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, (t3 - t0) / 1e9)
      }
      val b = med(samples.map(_._1)); val p = med(samples.map(_._2))
      val e = med(samples.map(_._3)); val f = med(samples.map(_._4))
      println(f"[fixedcost] $name%-24s $b%5.3f  $p%5.3f  $e%5.3f  $f%5.3f  ${100 * (f - e) / f}%5.1f%%")
    }
    spark.stop()
  }
}

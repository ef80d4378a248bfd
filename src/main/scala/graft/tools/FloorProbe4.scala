package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolate the LOCAL-mode per-job / per-stage scheduler floor from SQL
  * overheads: bare RDD jobs on a minimal session (no graft confs), with
  * varying core counts, stage counts and task counts.
  *
  * Run: sbt 'runMain graft.tools.FloorProbe4 [cores]'
  */
object FloorProbe4 {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder()
      .appName("graft-floor4").master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    def time(label: String, iters: Int = 21)(f: => Unit): Unit = {
      f; f // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor4/$cores%s] $label%-42s med ${med(ts)}%7.4f  min ${ts.min}%7.4f")
    }
    time("1 stage, 1 task")(sc.parallelize(Seq(1), 1).count(): Unit)
    time("1 stage, 4 tasks")(sc.parallelize(1 to 4, 4).count(): Unit)
    time("1 stage, 32 tasks")(sc.parallelize(1 to 32, 32).count(): Unit)
    time("1 stage, 128 tasks")(sc.parallelize(1 to 128, 128).count(): Unit)
    time("2 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).count(): Unit)
    time("3 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).repartition(1).count(): Unit)
    time("5 stages, 1 task each")(
      sc.parallelize(Seq(1), 1).repartition(1).repartition(1)
        .repartition(1).repartition(1).count(): Unit)
    time("2 stages, 32 tasks each")(
      sc.parallelize(1 to 32, 32).repartition(32).count(): Unit)
    // SQL layer on the same session (default confs): same shapes
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    time("SQL: localrelation agg, AQE default")(df.groupBy($"x" % 5).count().count(): Unit)
    spark.stop()
  }
}

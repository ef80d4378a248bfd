package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line of per-query wall times at the target
  * scale factor. Each query is first run once at sf0.001 so codegen/JIT
  * warmup is not attributed to the measured run (the measured numbers are
  * steady-state throughput, which is what a long-running cluster sees).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = GraftSession.cpus
    val spark = GraftSession.builder("graft-bench").master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // the JSON goes to a file AND is printed as the process's last stdout
    // line (after spark.stop(), so no executor/log4j output can interleave
    // with it — r1's bench line was unparseable for exactly that reason)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
    println(json)
    System.out.flush()
  }
}

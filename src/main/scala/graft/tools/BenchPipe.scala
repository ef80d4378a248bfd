package graft.tools

import graft.{GraftSession, SparkEntry}

/** Persistent query server for INTERLEAVED baseline measurement
  * (tools/measure_baseline.py): one warm JVM executes named queries on
  * command, so the Python driver can alternate DuckDB and graft samples
  * of the SAME query inside one machine window (A/B/A/B) — the r9
  * verdict found same-code bench totals moving ~1.3x across machine
  * windows, which separate-window columns silently absorb into the
  * published ratios.
  *
  * Protocol (stdin → stdout, one line each):
  *   `list`         → prints `[pipe] LIST <name> <name> ...` (all queries)
  *   `warm <name>`  → runs the query once,     prints `[pipe] WARM <name> ok|ERROR ...`
  *   `time <name>`  → runs the query once,     prints `[pipe] TIME <name> <seconds>`
  *   `quit`         → stops the session and exits.
  * Timing is measured inside the JVM (count() wall time), so pipe
  * latency never pollutes a sample. Not part of the driver contract.
  */
object BenchPipe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-benchpipe")
    println("[pipe] READY")
    System.out.flush()
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line = in.readLine()
    while (line != null && line.trim != "quit") {
      line.trim.split("\\s+", 2) match {
        case Array("list") =>
          println("[pipe] LIST " + SparkEntry.queries.keys.toSeq.sorted.mkString(" "))
        case Array("warm", name) =>
          try { SparkEntry.queries(name)(spark, dir).count(); println(s"[pipe] WARM $name ok") }
          catch { case e: Throwable => println(s"[pipe] WARM $name ERROR ${e.getClass.getName}") }
        case Array("time", name) =>
          try {
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, dir).count()
            // Locale.ROOT: the f-interpolator is locale-sensitive, and a
            // comma-decimal host locale would break the Python driver's
            // float() parse of this field (ADVICE r10)
            val secs = "%.4f".formatLocal(
              java.util.Locale.ROOT, (System.nanoTime() - t0) / 1e9)
            println(s"[pipe] TIME $name $secs")
          } catch { case e: Throwable => println(s"[pipe] TIME $name ERROR ${e.getClass.getName}") }
        case other =>
          println(s"[pipe] UNKNOWN ${other.mkString(" ")}")
      }
      System.out.flush()
      line = in.readLine()
    }
    spark.stop()
    println("[pipe] BYE")
    System.out.flush()
  }
}

// Stage-cost decomposition for q_quality_thresholds (r14: the sf1 pair
// left it >2x with a 1.4s exec share — find the stage).
// Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt 'runMain graft.tools.QtProbe'
package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

object QtProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-qtprobe")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[qtprobe] $name%-34s ${ts.map(_._1).sorted.apply(1)}%6.3fs  rows=${ts.head._2}")
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count") { docs.count() }
    // the kernel forced end-to-end: aggregate over every derived field
    val ts0 = docs.select(col("doc_id"),
      call_function(graft.functions.GraftFunctions.TextStatsName, col("text")).as("ts"))
    time("kernel scan (agg over stats)") {
      ts0.select(col("ts")).agg(count(col("ts"))).collect()(0).getLong(0)
    }
    time("dedupExact census") { TextAnalysis.dedupExact(spark, dir).count() }
    time("scored = semi-join + kernel") {
      TextAnalysis.scoredCorpus(spark, dir).agg(count(lit(1))).collect()(0).getLong(0)
    }
    time("thresholds (exact percentile)") {
      TextAnalysis.qualityThresholds(spark, dir).count()
    }
    time("thresholds (KLL approx)") {
      TextAnalysis.qualityThresholds(spark, dir, approx = true).count()
    }
    spark.stop()
  }
}

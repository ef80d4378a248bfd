package graft.tools

import graft.{GraftSession, Lane, SparkEntry}

/** A/B the interactive lane ([[graft.Lane]]) against the default
  * profile, per query, same JVM, interleaved samples.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        sbt 'runMain graft.tools.LaneProbe q_a,q_b 7'
  */
object LaneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val iters = if (args.length > 1) args(1).toInt else 7
    val spark = GraftSession.local("graft-laneprobe")
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    println(f"[lane] ${"query"}%-26s default   lane   delta")
    var sumD = 0.0; var sumL = 0.0
    names.foreach { name =>
      // the RAW constructor: SparkEntry.queries is lane-wrapped, so
      // using it for the default arm would A/B the lane against itself
      // (r16 review)
      val fn = SparkEntry.rawQueries(name)
      val laneSession = Lane.sessionFor(spark, dir)
      try {
        fn(spark, dir).count(); fn(laneSession, dir).count() // warm both
        val ds = scala.collection.mutable.ArrayBuffer[Double]()
        val ls = scala.collection.mutable.ArrayBuffer[Double]()
        (1 to iters).foreach { _ =>
          var t0 = System.nanoTime(); fn(spark, dir).count()
          ds += (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime(); fn(laneSession, dir).count()
          ls += (System.nanoTime() - t0) / 1e9
        }
        val d = med(ds.toSeq); val l = med(ls.toSeq)
        sumD += d; sumL += l
        println(f"[lane] $name%-26s $d%7.3f $l%7.3f ${l - d}%+7.3f")
      } catch {
        case e: Throwable =>
          println(s"[lane] $name ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    println(f"[lane] ${"TOTAL"}%-26s $sumD%7.3f $sumL%7.3f ${sumL - sumD}%+7.3f")
    spark.stop()
  }
}

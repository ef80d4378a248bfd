package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB timeline for one warm query execution: job submit/end wall
  * times, gaps between jobs (driver-side AQE replan / orchestration),
  * task counts — names WHICH piece of the fixed cost to attack.
  */
object FloorProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = if (args.nonEmpty) args(0) else "q_date_dim"
    val spark = GraftSession.local("graft-floor3")
    case class J(id: Int, var sub: Long = 0, var end: Long = 0, var tasks: Int = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val r = jobs.getOrElseUpdate(j.jobId, J(j.jobId))
        r.sub = System.nanoTime(); r.stages = j.stageInfos.size
        r.tasks = j.stageInfos.map(_.numTasks).sum
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.get(j.jobId).foreach(_.end = System.nanoTime()); ()
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    fn(spark, dir).count() // warm more
    Thread.sleep(200)
    jobs.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val t1 = System.nanoTime()
    Thread.sleep(300)
    println(f"[floor3] $name total ${(t1 - t0) / 1e6}%.1f ms")
    var prev = t0
    jobs.values.toSeq.sortBy(_.sub).foreach { j =>
      val gapBefore = (j.sub - prev) / 1e6
      val dur = (j.end - j.sub) / 1e6
      prev = j.end
      println(f"[floor3]   job ${j.id}%3d  gapBefore $gapBefore%7.1f ms  run $dur%7.1f ms  stages ${j.stages}%2d tasks ${j.tasks}%3d")
    }
    println(f"[floor3]   tailGap ${(t1 - prev) / 1e6}%7.1f ms")
    spark.stop()
  }
}

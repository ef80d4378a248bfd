package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Where does the execution-side fixed cost GO? ([[FixedCostProbe]]
  * proved the 0.1-0.35s per trivial query is 89-97% exec-side; this
  * probe decomposes exec into scheduler-visible pieces.)
  *
  * Per query (warm, median of iters): jobs launched, stages run, tasks
  * run, sum of task run times, sum of scheduler/serde overhead
  * (task wall - executor compute), and the wall time — so
  *   wall - taskSum/parallelism ~ driver orchestration + stage barriers.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *        sbt 'runMain graft.tools.FloorProbe q_a,q_b 5'
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_date_dim", "q_dim_build", "q_incremental_merge")
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.local("graft-floor")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskRunNs = new AtomicLong   // executor run time (ms from metrics)
    val taskDeserNs = new AtomicLong
    val resultSerNs = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskRunNs.addAndGet(m.executorRunTime)
          taskDeserNs.addAndGet(m.executorDeserializeTime)
          resultSerNs.addAndGet(m.resultSerializationTime)
          gcMs.addAndGet(m.jvmGCTime)
        }
        ()
      }
    })
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.length / 2)
    println(f"[floor] ${"query"}%-22s  wall  jobs stages tasks  runMs deserMs  gcMs")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      val samples = (1 to iters).map { _ =>
        Thread.sleep(80) // let the listener bus drain (private API)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskRunNs.set(0); taskDeserNs.set(0); resultSerNs.set(0); gcMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(80) // let the listener bus drain (private API)
        (wall, jobs.get, stages.get, tasks.get, taskRunNs.get, taskDeserNs.get, gcMs.get)
      }
      val w = med(samples.map(_._1))
      // medians of counters (they're near-constant across iters)
      def medi(f: ((Double, Int, Int, Int, Long, Long, Long)) => Long): Long =
        samples.map(f).sorted.apply(samples.length / 2)
      println(f"[floor] $name%-22s $w%6.3f ${medi(_._2.toLong)}%5d ${medi(_._3.toLong)}%5d ${medi(_._4.toLong)}%6d ${medi(_._5)}%6d ${medi(_._6)}%7d ${medi(_._7)}%5d")
    }
    spark.stop()
  }
}
